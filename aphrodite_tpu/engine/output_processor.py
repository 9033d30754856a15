"""Output processing: EngineCoreOutput -> detokenized RequestOutput deltas,
stop-string enforcement, n>1 aggregation.
(reference: aphrodite/v1/engine/output_processor.py:223)
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from aphrodite_tpu.core.request import Request
from aphrodite_tpu.core.scheduler import EngineCoreOutput
from aphrodite_tpu.outputs import (CompletionOutput, Logprob, RequestOutput)
from aphrodite_tpu.sampling_params import SamplingParams
from aphrodite_tpu.tokenizer_utils import (IncrementalDetokenizer,
                                           StopStringTracker)


@dataclass
class RequestOutputState:
    request_id: str
    prompt: Optional[str]
    prompt_token_ids: list[int]
    params: SamplingParams
    detok: Optional[IncrementalDetokenizer]
    stop_tracker: StopStringTracker
    parent_id: Optional[str] = None  # for n>1 fan-out
    index: int = 0
    text: str = ""
    token_ids: list[int] = field(default_factory=list)
    logprobs: Optional[list[dict]] = None
    cumulative_logprob: Optional[float] = None
    num_cached_tokens: int = 0
    finished: bool = False
    finish_reason: Optional[str] = None
    stop_reason: Optional[object] = None


class OutputProcessor:

    def __init__(self, tokenizer) -> None:
        self.tokenizer = tokenizer
        self.states: dict[str, RequestOutputState] = {}

    def add_request(self, request: Request, parent_id: Optional[str] = None,
                    index: int = 0) -> None:
        params = request.sampling_params
        detok = None
        if params.detokenize and self.tokenizer is not None:
            detok = IncrementalDetokenizer(
                self.tokenizer, request.prompt_token_ids,
                skip_special_tokens=params.skip_special_tokens,
                spaces_between_special_tokens=(
                    params.spaces_between_special_tokens))
        self.states[request.request_id] = RequestOutputState(
            request_id=request.request_id,
            prompt=request.prompt,
            prompt_token_ids=request.prompt_token_ids,
            params=params,
            detok=detok,
            stop_tracker=StopStringTracker(
                list(params.stop or []), params.include_stop_str_in_output),
            parent_id=parent_id,
            index=index,
            logprobs=[] if params.logprobs is not None else None,
        )

    def abort_request(self, request_id: str) -> None:
        self.states.pop(request_id, None)

    def process_outputs(self, core_outputs: list[EngineCoreOutput]
                        ) -> tuple[list[RequestOutput], list[str]]:
        """Returns (request outputs [deltas], req_ids to abort due to stop
        strings)."""
        outputs: list[RequestOutput] = []
        to_abort: list[str] = []
        for eco in core_outputs:
            st = self.states.get(eco.req_id)
            if st is None:
                continue
            new_tokens = list(eco.new_token_ids)
            st.token_ids.extend(new_tokens)
            delta_text = ""
            if st.detok is not None and new_tokens:
                delta_text = st.detok.update(new_tokens)
            st.text += delta_text
            st.num_cached_tokens = eco.num_cached_tokens
            if st.logprobs is not None and eco.logprobs:
                for d in eco.logprobs:
                    lpd = {t: Logprob(logprob=v) for t, v in d.items()}
                    st.logprobs.append(lpd)
                    chosen = new_tokens[len(st.logprobs) - 1] \
                        if len(st.logprobs) <= len(new_tokens) else None
                    if st.cumulative_logprob is None:
                        st.cumulative_logprob = 0.0
                    if chosen is not None and chosen in d:
                        st.cumulative_logprob += d[chosen]

            finished = eco.finished
            finish_reason = eco.finish_reason
            stop_reason = eco.stop_reason

            hit = st.stop_tracker.check(st.text, len(delta_text))
            if hit is not None:
                # A stop string occurs at an earlier text position than any
                # core-side finish (length/EOS), so it wins even when the
                # core already finished the request — multi-step / fused
                # windows can overshoot a stop string in-graph and report
                # "length" for the same batch of tokens.
                stop_str, cut = hit
                delta_trim = len(st.text) - cut
                st.text = st.text[:cut]
                if delta_trim > 0:
                    delta_text = delta_text[:-delta_trim] \
                        if delta_trim <= len(delta_text) else ""
                if not finished:
                    to_abort.append(eco.req_id)
                finished = True
                finish_reason = "stop"
                stop_reason = stop_str

            st.finished = finished
            st.finish_reason = finish_reason
            st.stop_reason = stop_reason
            if finished:
                self.states.pop(eco.req_id, None)

            plp_out = None
            if getattr(eco, "prompt_logprobs", None):
                plp_out = [None if d is None else
                           {t: Logprob(logprob=v) for t, v in d.items()}
                           for d in eco.prompt_logprobs]
            rid = st.parent_id or st.request_id
            outputs.append(RequestOutput(
                request_id=rid,
                prompt=st.prompt,
                prompt_token_ids=st.prompt_token_ids,
                prompt_logprobs=plp_out,
                outputs=[CompletionOutput(
                    index=st.index,
                    text=delta_text,
                    token_ids=new_tokens,
                    cumulative_logprob=st.cumulative_logprob,
                    logprobs=(st.logprobs[-len(new_tokens):]
                              if st.logprobs and new_tokens else None),
                    finish_reason=finish_reason if finished else None,
                    stop_reason=stop_reason if finished else None)],
                finished=finished,
                num_cached_tokens=st.num_cached_tokens))
        return outputs, to_abort

    def has_requests(self) -> bool:
        return bool(self.states)
