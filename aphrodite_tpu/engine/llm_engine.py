"""Synchronous engine frontend: processor -> core -> output processor.
(reference: aphrodite/v1/engine/llm_engine.py:34)
"""
from __future__ import annotations

import time
from typing import Optional, Union

from aphrodite_tpu.config import EngineConfig
from aphrodite_tpu.engine.core import EngineCore
from aphrodite_tpu.engine.output_processor import OutputProcessor
from aphrodite_tpu.engine.processor import Processor, PromptType
from aphrodite_tpu.outputs import RequestOutput
from aphrodite_tpu.sampling_params import SamplingParams
from aphrodite_tpu.tokenizer_utils import get_tokenizer
from aphrodite_tpu.utils import Counter, logger


class LLMEngine:

    def __init__(self, config: EngineConfig, tokenizer=None) -> None:
        self.config = config
        mc = config.model_config
        if tokenizer is None and mc.tokenizer != "unused":
            tokenizer = get_tokenizer(
                mc.tokenizer, trust_remote_code=mc.trust_remote_code,
                tokenizer_mode=getattr(mc, "tokenizer_mode", "auto"))
        self.tokenizer = tokenizer
        self.processor = Processor(config, tokenizer)
        self.core = EngineCore(config, tokenizer=tokenizer)
        self.output_processor = OutputProcessor(tokenizer)
        # parent request id -> expected child count (n>1 fan-out).
        self._fanout: dict[str, int] = {}

    # ------------------------------------------------------------------ intake
    def add_request(self, request_id: str, prompt: PromptType,
                    params: Optional[SamplingParams] = None,
                    arrival_time: Optional[float] = None,
                    lora_name: Optional[str] = None,
                    priority: int = 0) -> None:
        params = params or SamplingParams()
        if lora_name is not None:
            # Validate at admission — a bad adapter name must reject THIS
            # request, not poison the engine loop at dispatch time.
            self.core.worker.lora_manager and \
                self.core.worker.lora_manager.slot_of(lora_name)
            if self.core.worker.lora_manager is None:
                raise ValueError("LoRA is not enabled on this engine")
        n = params.n
        if n == 1:
            req = self.processor.process(request_id, prompt, params,
                                         arrival_time, lora_name=lora_name,
                                         priority=priority)
            self.core.add_request(req)
            self.output_processor.add_request(req)
            return
        # n>1: fan out into child requests sharing the prompt (prefix cache
        # makes the extra prefills nearly free).
        self._fanout[request_id] = n
        for i in range(n):
            child = params.clone()
            child.n = 1
            if params.seed is not None:
                child.seed = params.seed + i
            req = self.processor.process(f"{request_id}-cld-{i}", prompt,
                                         child, arrival_time,
                                         lora_name=lora_name,
                                         priority=priority)
            self.core.add_request(req)
            self.output_processor.add_request(req, parent_id=request_id,
                                              index=i)

    def abort_request(self, request_ids: Union[str, list[str]]) -> None:
        if isinstance(request_ids, str):
            request_ids = [request_ids]
        expanded = []
        for rid in request_ids:
            n = self._fanout.pop(rid, None)
            if n is not None:
                expanded.extend(f"{rid}-cld-{i}" for i in range(n))
            else:
                expanded.append(rid)
        self.core.abort_requests(expanded)
        for rid in expanded:
            self.output_processor.abort_request(rid)

    # -------------------------------------------------------------------- step
    def step(self) -> list[RequestOutput]:
        core_outputs = self.core.step()
        outputs, to_abort = self.output_processor.process_outputs(
            core_outputs)
        if to_abort:
            self.core.abort_requests(to_abort)
        return outputs

    def has_unfinished_requests(self) -> bool:
        return (self.core.has_unfinished_requests()
                or self.output_processor.has_requests())

    def reset_prefix_cache(self) -> bool:
        return self.core.reset_prefix_cache()

    def sleep(self, level: int = 1) -> None:
        if self.core.has_unfinished_requests():
            raise ValueError("cannot sleep with unfinished requests")
        self.core.worker.sleep(level)

    def wake_up(self) -> None:
        self.core.worker.wake_up()

    @property
    def is_sleeping(self) -> bool:
        return self.core.worker.is_sleeping
