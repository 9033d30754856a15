"""Async engine frontend for serving.

Analog of the reference v1 AsyncLLM (aphrodite/v1/engine/async_llm.py:41):
per-request output streams fed by a background engine loop. The engine step
(device-bound) runs in a thread executor so the event loop stays responsive;
the process-separated ZMQ core can be swapped in behind the same interface.
"""
from __future__ import annotations

import asyncio
from typing import AsyncGenerator, Optional

from aphrodite_tpu.config import EngineConfig
from aphrodite_tpu.engine.llm_engine import LLMEngine
from aphrodite_tpu.engine.processor import PromptType
from aphrodite_tpu.outputs import RequestOutput
from aphrodite_tpu.sampling_params import SamplingParams
from aphrodite_tpu.utils import logger


class EngineDeadError(RuntimeError):
    pass


class AsyncLLM:

    def __init__(self, config: EngineConfig) -> None:
        self.engine = LLMEngine(config)
        self.config = config
        self._streams: dict[str, asyncio.Queue] = {}
        self._loop_task: Optional[asyncio.Task] = None
        self._wakeup = asyncio.Event()
        self._dead: Optional[BaseException] = None

    @property
    def tokenizer(self):
        return self.engine.tokenizer

    # ------------------------------------------------------------------ loop
    def _ensure_loop(self) -> None:
        if self._loop_task is None or self._loop_task.done():
            self._loop_task = asyncio.get_running_loop().create_task(
                self._run_loop())

    async def _run_loop(self) -> None:
        loop = asyncio.get_running_loop()
        try:
            while True:
                if not self.engine.has_unfinished_requests():
                    self._wakeup.clear()
                    await self._wakeup.wait()
                outputs = await loop.run_in_executor(None, self.engine.step)
                for out in outputs:
                    q = self._streams.get(out.request_id)
                    if q is not None:
                        q.put_nowait(out)
        except Exception as e:  # engine death: fail all pending streams
            logger.exception("engine loop died")
            self._dead = e
            for q in self._streams.values():
                q.put_nowait(e)

    # --------------------------------------------------------------- requests
    async def generate(
        self,
        prompt: PromptType,
        sampling_params: SamplingParams,
        request_id: str,
        lora_name: Optional[str] = None,
    ) -> AsyncGenerator[RequestOutput, None]:
        """Yields incremental RequestOutputs (delta text/tokens) until
        finished."""
        if self._dead:
            raise EngineDeadError() from self._dead
        self._ensure_loop()
        q: asyncio.Queue = asyncio.Queue()
        self._streams[request_id] = q
        try:
            self.engine.add_request(request_id, prompt, sampling_params,
                                    lora_name=lora_name)
            self._wakeup.set()
            n_expect = sampling_params.n
            finished = 0
            while finished < n_expect:
                item = await q.get()
                if isinstance(item, BaseException):
                    raise EngineDeadError() from item
                if item.finished:
                    finished += len(item.outputs)
                yield item
        finally:
            self._streams.pop(request_id, None)
            try:
                self.engine.abort_request(request_id)
            except Exception:
                pass

    async def abort(self, request_id: str) -> None:
        self.engine.abort_request(request_id)
        self._streams.pop(request_id, None)

    async def check_health(self) -> None:
        if self._dead:
            raise EngineDeadError() from self._dead

    def reset_prefix_cache(self) -> bool:
        return self.engine.reset_prefix_cache()

    @property
    def stats(self):
        core = self.engine.core
        sched = core.scheduler
        return {
            "num_running": len(sched.running),
            "num_waiting": len(sched.waiting),
            "kv_usage": sched.kv.usage,
            "prefix_cache_hit_rate": sched.kv.prefix_cache_hit_rate,
        }
