"""Scheduler <-> model-runner interchange types
(reference: aphrodite/v1/core/sched/output.py)."""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from aphrodite_tpu.sampling_params import SamplingParams


@dataclass
class NewRequestData:
    """A request entering the runner's persistent batch for the first time."""
    req_id: str
    prompt_token_ids: list[int]
    sampling_params: SamplingParams
    block_ids: list[int]
    num_computed_tokens: int  # prefix-cache hit length
    lora_name: Optional[str] = None
    # MMInputs (multimodal.py): pixel tensors + placeholder spans.
    mm_inputs: Optional[object] = None


@dataclass
class CachedRequestData:
    """Delta updates for requests the runner already tracks."""
    req_ids: list[str] = field(default_factory=list)
    new_block_ids: list[list[int]] = field(default_factory=list)
    resumed_from_preemption: list[bool] = field(default_factory=list)
    # For resumed requests the runner must resync the full token list.
    all_token_ids: list[Optional[list[int]]] = field(default_factory=list)
    num_computed_tokens: list[int] = field(default_factory=list)


@dataclass
class SchedulerOutput:
    scheduled_new_reqs: list[NewRequestData]
    scheduled_cached_reqs: CachedRequestData
    # req_id -> number of tokens to run through the model this step.
    num_scheduled_tokens: dict[str, int]
    total_num_scheduled_tokens: int
    # req_id -> speculative draft tokens being verified this step.
    scheduled_spec_decode_tokens: dict[str, list[int]]
    # Requests that finished/aborted since last step (purge from runner).
    finished_req_ids: set[str]
    # req_id -> grammar bitmask row (structured output), filled by engine.
    structured_output_request_ids: dict[str, int] = field(default_factory=dict)
    grammar_bitmask: Optional[object] = None
    # Continuation-window wave: every scheduled request gets ONE virtual
    # token whose value is still in flight on device (or realized, for
    # joiner rows); the runner chains a decode window off the previous one
    # (worker/runner.py _execute_continuation).
    is_continuation: bool = False

    @property
    def is_empty(self) -> bool:
        return self.total_num_scheduled_tokens == 0


@dataclass
class ModelRunnerOutput:
    """What the runner hands back after one step."""
    # Order matches the runner's persistent batch, restricted to scheduled reqs.
    req_ids: list[str]
    # Per request: sampled token ids (>1 with spec decode, [] if this step only
    # advanced a prefill chunk).
    sampled_token_ids: list[list[int]]
    # Per request: drafted spec tokens for the NEXT step ([] if none).
    spec_token_ids: Optional[list[list[int]]] = None
    # Per request per sampled token: {token_id: logprob} dicts (optional).
    logprobs: Optional[list[Optional[list[dict[int, float]]]]] = None
    prompt_logprobs: Optional[dict[str, object]] = None


EMPTY_MODEL_RUNNER_OUTPUT = ModelRunnerOutput(req_ids=[],
                                              sampled_token_ids=[])


@dataclass
class PendingStep:
    """An in-flight async step (reference: v1 --async-scheduling).

    The runner dispatched the device work but has not fetched results: the
    scheduler advances optimistically using ``expected_counts`` (the exact
    number of tokens each request WILL produce — multi-step windows are
    deterministic in shape) and calls ``realize`` when the values are
    needed. Host scheduling and the next dispatch overlap device compute;
    the d2h sync happens once per realize instead of once per step."""
    req_ids: list[str]
    # rid -> number of sampled tokens this step will return for it.
    expected_counts: dict
    # () -> ModelRunnerOutput: d2h fetch + host-side result processing.
    realize: object = None
