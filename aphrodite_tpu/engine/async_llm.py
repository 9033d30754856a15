"""Async engine frontend for serving.

Analog of the reference v1 AsyncLLM (aphrodite/v1/engine/async_llm.py:41):
per-request output streams fed by a background engine loop. Two backends:

- in-process (default): wraps the synchronous LLMEngine; the device-bound
  step runs in a thread executor.
- multiprocess: the scheduler+worker live in an isolated EngineCoreProc and
  requests/outputs cross a ZMQ boundary (reference v1 architecture,
  v1/engine/core.py:419); tokenization/detokenization stay in the frontend.
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

    def __init__(self, config: EngineConfig,
                 multiprocess: bool = False) -> None:
        self.config = config
        self.multiprocess = multiprocess
        self._streams: dict[str, asyncio.Queue] = {}
        self._fanout: dict[str, int] = {}
        self._loop_task: Optional[asyncio.Task] = None
        self._wakeup = asyncio.Event()
        self._dead: Optional[BaseException] = None

        if multiprocess:
            from aphrodite_tpu.engine.core_proc import (DPEngineCoreClient,
                                                        MPEngineCoreClient)
            from aphrodite_tpu.engine.output_processor import OutputProcessor
            from aphrodite_tpu.engine.processor import Processor
            from aphrodite_tpu.tokenizer_utils import get_tokenizer
            mc = config.model_config
            tokenizer = (get_tokenizer(
                mc.tokenizer, trust_remote_code=mc.trust_remote_code,
                tokenizer_mode=getattr(mc, "tokenizer_mode", "auto"))
                         if mc.tokenizer != "unused" else None)
            self._tokenizer = tokenizer
            dp = config.parallel_config.data_parallel_size
            self.client = (DPEngineCoreClient(config) if dp > 1
                           else MPEngineCoreClient(config))
            self.processor = Processor(config, tokenizer)
            self.output_processor = OutputProcessor(tokenizer)
            self.engine = None
        else:
            self.engine = LLMEngine(config)
            self._tokenizer = self.engine.tokenizer

    @property
    def tokenizer(self):
        return self._tokenizer

    # ------------------------------------------------------------------ loop
    def _ensure_loop(self) -> None:
        if self._loop_task is None or self._loop_task.done():
            target = (self._run_loop_mp if self.multiprocess
                      else self._run_loop_inproc)
            self._loop_task = asyncio.get_running_loop().create_task(
                target())

    def _route(self, outputs) -> None:
        for out in outputs:
            q = self._streams.get(out.request_id)
            if q is not None:
                q.put_nowait(out)

    async def _run_loop_inproc(self) -> None:
        loop = asyncio.get_running_loop()
        try:
            while True:
                if not self.engine.has_unfinished_requests():
                    self._wakeup.clear()
                    await self._wakeup.wait()
                outputs = await loop.run_in_executor(None, self.engine.step)
                self._route(outputs)
        except Exception as e:
            logger.exception("engine loop died")
            self._die(e)

    async def _run_loop_mp(self) -> None:
        # Outputs are pumped by a dedicated *daemon* thread, never the default
        # asyncio executor: run_in_executor(None, get_outputs) parks an
        # executor thread in an unbounded queue.get, and asyncio.run teardown
        # then blocks in shutdown_default_executor joining it (Python's
        # 300 s THREAD_JOIN_TIMEOUT per loop close). A daemon thread is not
        # joined at loop teardown, so asyncio.run exits instantly.
        import queue as _queue
        loop = asyncio.get_running_loop()
        aq: asyncio.Queue = asyncio.Queue()
        self._pump_stop = stop = __import__("threading").Event()

        def _pump() -> None:
            while not stop.is_set():
                try:
                    eco = self.client.get_outputs(timeout=0.2)
                except _queue.Empty:
                    continue
                except BaseException as e:  # engine dead
                    try:
                        loop.call_soon_threadsafe(aq.put_nowait, e)
                    except RuntimeError:
                        pass  # loop already closed
                    return
                try:
                    loop.call_soon_threadsafe(aq.put_nowait, eco)
                except RuntimeError:
                    return

        t = __import__("threading").Thread(target=_pump, daemon=True,
                                           name="asyncllm-mp-pump")
        t.start()
        try:
            while True:
                item = await aq.get()
                if isinstance(item, BaseException):
                    raise item
                outputs, to_abort = self.output_processor.process_outputs(
                    item)
                if to_abort:
                    self.client.abort_requests(to_abort)
                self._route(outputs)
        except Exception as e:
            logger.exception("engine core output loop died")
            self._die(e)
        finally:
            stop.set()

    def _die(self, e: BaseException) -> None:
        self._dead = e
        for q in self._streams.values():
            q.put_nowait(e)

    # --------------------------------------------------------------- requests
    def _add_request(self, request_id, prompt, params, lora_name,
                     priority=0) -> None:
        if not self.multiprocess:
            self.engine.add_request(request_id, prompt, params,
                                    lora_name=lora_name, priority=priority)
            self._wakeup.set()
            return
        n = params.n
        if n == 1:
            req = self.processor.process(request_id, prompt, params,
                                         lora_name=lora_name,
                                         priority=priority)
            self.client.add_request(req)
            self.output_processor.add_request(req)
            return
        self._fanout[request_id] = n
        for i in range(n):
            child = params.clone()
            child.n = 1
            if params.seed is not None:
                child.seed = params.seed + i
            req = self.processor.process(f"{request_id}-cld-{i}", prompt,
                                         child, lora_name=lora_name,
                                         priority=priority)
            self.client.add_request(req)
            self.output_processor.add_request(req, parent_id=request_id,
                                              index=i)

    def _abort(self, request_id: str) -> None:
        if not self.multiprocess:
            self.engine.abort_request(request_id)
            return
        n = self._fanout.pop(request_id, None)
        ids = ([f"{request_id}-cld-{i}" for i in range(n)]
               if n else [request_id])
        self.client.abort_requests(ids)
        for rid in ids:
            self.output_processor.abort_request(rid)

    async def generate(
        self,
        prompt: PromptType,
        sampling_params: SamplingParams,
        request_id: str,
        lora_name: Optional[str] = None,
        priority: int = 0,
    ) -> AsyncGenerator[RequestOutput, None]:
        """Yields incremental RequestOutputs (delta text/tokens) until
        finished."""
        if self._dead:
            raise EngineDeadError() from self._dead
        self._ensure_loop()
        q: asyncio.Queue = asyncio.Queue()
        self._streams[request_id] = q
        try:
            self._add_request(request_id, prompt, sampling_params, lora_name,
                              priority)
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
                self._abort(request_id)
            except Exception:
                pass

    async def abort(self, request_id: str) -> None:
        self._abort(request_id)
        self._streams.pop(request_id, None)

    async def check_health(self) -> None:
        if self._dead:
            raise EngineDeadError() from self._dead
        if self.multiprocess and self.client.dead is not None:
            raise EngineDeadError(self.client.dead)

    def reset_prefix_cache(self) -> bool:
        if self.multiprocess:
            return self.client.call_utility("reset_prefix_cache")
        return self.engine.reset_prefix_cache()

    def shutdown(self) -> None:
        stop = getattr(self, "_pump_stop", None)
        if stop is not None:
            stop.set()
        if self._loop_task is not None and not self._loop_task.done():
            self._loop_task.cancel()
        if self.multiprocess:
            self.client.shutdown()

    def metrics_text(self) -> str:
        if self.multiprocess:
            return self.client.call_utility("metrics_text")
        return self.engine.core.metrics_text()

    def worker_call(self, method: str, *args, **kwargs):
        """Invoke a worker/core method across the process boundary when
        running multiprocess (LoRA management, sleep/wake, profiling,
        embeddings)."""
        if self.multiprocess:
            return self.client.call_utility(method, *args, **kwargs)
        target = self.engine.core
        if not hasattr(target, method):
            target = self.engine.core.worker
        return getattr(target, method)(*args, **kwargs)

    @property
    def stats(self):
        if self.multiprocess:
            try:
                return self.client.call_utility("engine_stats", timeout=30)
            except Exception:
                return {"num_running": -1, "num_waiting": -1,
                        "kv_usage": 0.0, "prefix_cache_hit_rate": 0.0}
        core = self.engine.core
        sched = core.scheduler
        return {
            "num_running": len(sched.running),
            "num_waiting": len(sched.waiting),
            "kv_usage": sched.kv.usage,
            "prefix_cache_hit_rate": sched.kv.prefix_cache_hit_rate,
        }
