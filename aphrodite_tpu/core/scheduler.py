"""Token-budget continuous-batching scheduler.

Re-design of the reference v1 scheduler
(aphrodite/v1/core/sched/scheduler.py:144-176): one unified loop with no
prefill/decode phase distinction — every request asks for
``num_tokens_with_spec - num_computed_tokens`` tokens each step, capped by the
shared token budget (chunked prefill falls out naturally). Preemption is
recompute-only (``:230``). FCFS within each of running/waiting.
"""
from __future__ import annotations

from collections import deque
from typing import Iterable, Optional

from aphrodite_tpu.config import CacheConfig, SchedulerConfig
from aphrodite_tpu.core.kv_cache_manager import KVCacheManager
from aphrodite_tpu.core.request import Request, RequestStatus
from aphrodite_tpu.core.sched_output import (CachedRequestData,
                                             ModelRunnerOutput,
                                             NewRequestData, SchedulerOutput)
from aphrodite_tpu.utils import logger


class EngineCoreOutput:
    """Per-request result of one engine step (token deltas + finish state)."""

    __slots__ = ("req_id", "new_token_ids", "finished", "finish_reason",
                 "stop_reason", "logprobs", "num_cached_tokens",
                 "prompt_logprobs")

    def __init__(self, req_id, new_token_ids, finished, finish_reason=None,
                 stop_reason=None, logprobs=None, num_cached_tokens=0,
                 prompt_logprobs=None):
        self.req_id = req_id
        self.new_token_ids = new_token_ids
        self.finished = finished
        self.finish_reason = finish_reason
        self.stop_reason = stop_reason
        self.logprobs = logprobs
        self.num_cached_tokens = num_cached_tokens
        self.prompt_logprobs = prompt_logprobs


class Scheduler:

    def __init__(self, scheduler_config: SchedulerConfig,
                 cache_config: CacheConfig,
                 num_lookahead_tokens: int = 0,
                 kv_event_publisher=None) -> None:
        self.config = scheduler_config
        self.cache_config = cache_config
        assert cache_config.num_blocks is not None, \
            "cache_config.num_blocks must be set before scheduler creation"
        self.kv = KVCacheManager(cache_config.num_blocks,
                                 cache_config.block_size,
                                 cache_config.enable_prefix_caching,
                                 event_publisher=kv_event_publisher)
        self.block_size = cache_config.block_size
        # Extra empty slots to allocate per request per step (spec decode).
        self.num_lookahead_tokens = num_lookahead_tokens

        self.waiting: deque[Request] = deque()
        self.running: list[Request] = []
        self.num_preemptions = 0
        self.requests: dict[str, Request] = {}
        # Finished/aborted since the last schedule() — runner purge list.
        self._finished_req_ids: set[str] = set()
        # Async steps: requests optimistically freed by note_async, awaiting
        # value emission at realize_update.
        self._async_finishing: dict[str, Request] = {}

    # ------------------------------------------------------------------ intake
    def add_request(self, request: Request) -> None:
        if len(request.prompt_token_ids) > self.config.max_model_len:
            request.status = RequestStatus.FINISHED_IGNORED
            self._finished_req_ids.add(request.request_id)
            return
        self.requests[request.request_id] = request
        self.waiting.append(request)

    def finish_requests(self, request_ids: Iterable[str],
                        status: RequestStatus =
                        RequestStatus.FINISHED_ABORTED) -> None:
        for rid in request_ids:
            req = self.requests.get(rid)
            if req is None or req.is_finished:
                continue
            req.status = status
            self._free_request(req)

    # Optional hook(request, block_ids) invoked before a finished request's
    # pages are released (disaggregated-prefill producer ships KV here).
    finish_callback = None
    # Async scheduling (engine-set): () -> bool, realizes in-flight steps
    # (possibly freeing pages); called before preempting under pressure.
    realize_hook = None
    # Continuation windows (engine-set): (request) -> "chain" | "join" |
    # None. When any running request is chainable, schedule() emits a
    # continuation wave: one virtual token per request, executed by the
    # runner as a decode window chained off the in-flight one — the device
    # pipeline never drains between windows (worker/runner.py
    # _execute_continuation).
    continuation_hook = None
    # () -> bool: a window chain is live (group with in-flight rows).
    # While true, join-eligible decode rows are held OUT of normal waves:
    # they ride the next continuation wave instead of spawning a rival
    # window group that would strand the chain.
    chain_active_hook = None

    def _free_request(self, request: Request) -> None:
        if self.finish_callback is not None:
            self.finish_callback(
                request, self.kv.get_block_ids(request.request_id))
        self.kv.free(request)
        if request in self.running:
            self.running.remove(request)
        elif request in self.waiting:
            self.waiting.remove(request)
        self._finished_req_ids.add(request.request_id)
        del self.requests[request.request_id]

    # --------------------------------------------------------------- priority
    @staticmethod
    def _prio(req: Request) -> tuple:
        """LOWER sorts first = scheduled first / preempted last (reference
        processing/scheduler.py:954 _get_priority)."""
        return (req.priority, req.metrics.arrival_time)

    def _priority_preemption(self, preempted: set) -> None:
        """Force-preempt running requests with WORSE priority than the best
        waiting request when it could not otherwise be admitted (reference
        processing/scheduler.py:965 _schedule_priority_preemption;
        recompute-style, like all preemption here)."""
        if not self.waiting:
            return
        head = self.waiting[0]
        need_blocks = -(-(
            (head.num_tokens - head.num_computed_tokens)
            + self.num_lookahead_tokens) // self.block_size)
        while (self.running
               and self._prio(self.running[-1]) > self._prio(head)):
            have_seat = len(self.running) < self.config.max_num_seqs
            have_pages = self.kv.pool.get_num_free_blocks() >= need_blocks
            if have_seat and have_pages:
                break
            victim = self.running[-1]
            if victim.num_async_pending and self.realize_hook is not None:
                # In-flight async step: realize before recompute-preempting
                # (a preempted in-flight request corrupts at realize).
                self.realize_hook()
                if victim not in self.running:
                    continue
            self._preempt(victim)
            preempted.add(victim.request_id)
        # _preempt appendlefts its victims: restore priority order so the
        # waiting loop admits the best-priority request first.
        self.waiting = deque(sorted(self.waiting, key=self._prio))

    # ---------------------------------------------------------------- schedule
    def schedule(self) -> SchedulerOutput:
        budget = self.config.max_num_batched_tokens
        chunk_cap = self.config.long_prefill_token_threshold or budget
        # Wave-level prefill quantum (see SchedulerConfig.max_prefill_tokens)
        prefill_budget = self.config.max_prefill_tokens or budget

        num_scheduled: dict[str, int] = {}
        spec_tokens: dict[str, list[int]] = {}
        new_reqs: list[NewRequestData] = []
        cached = CachedRequestData()
        preempted: set[str] = set()

        if self.config.policy == "priority":
            # Order both queues by (priority, arrival): the running loop
            # gives budget to high-priority requests first, and memory
            # pressure preempts self.running[-1] = the worst priority.
            self.waiting = deque(sorted(self.waiting, key=self._prio))
            self.running.sort(key=self._prio)
            self._priority_preemption(preempted)

        # -- 0. continuation windows --------------------------------------
        # (A "suppress continuation while prefill waits and the batch is
        # small" policy was tried and measured WORSE on both axes — the
        # fused-skip then leaves ramping decode rows at 1 token/wave.
        # Always interleaving windows with prefill quanta wins: burst 282
        # vs 265 tok/s, poisson-8rps p50 TTFT 650 vs 853 ms.)
        if self.continuation_hook is not None and self.running:
            out = self._schedule_continuation(preempted)
            if out is not None:
                return out

        # -- 1. running requests (FCFS) -----------------------------------
        chain_live = (self.chain_active_hook is not None
                      and self.chain_active_hook())
        idx = 0
        while idx < len(self.running) and budget > 0:
            req = self.running[idx]
            if req.num_async_pending:
                # An in-flight async step is already producing this
                # request's next tokens; nothing to schedule until it
                # realizes.
                idx += 1
                continue
            if chain_live and self.continuation_hook is not None \
                    and self.continuation_hook(req) == "join":
                # Hold for the next continuation wave (see
                # chain_active_hook).
                idx += 1
                continue
            num_new = req.num_tokens_with_spec - req.num_computed_tokens
            num_new = min(num_new, budget, chunk_cap)
            in_prefill = req.num_computed_tokens < req.num_prompt_tokens
            if in_prefill:
                num_new = min(num_new, prefill_budget)
            # Keep within model length (spec tokens may overshoot).
            num_new = min(num_new,
                          self.config.max_model_len - req.num_computed_tokens)
            if num_new <= 0:
                idx += 1
                continue
            while True:
                new_blocks = self.kv.allocate_slots(
                    req, num_new,
                    num_lookahead_tokens=self.num_lookahead_tokens)
                if new_blocks is not None:
                    break
                if self.realize_hook is not None and self.realize_hook():
                    # Realizing in-flight async steps may have freed pages
                    # (and must happen before preempting: a preempted
                    # in-flight request would be corrupted at realize).
                    continue
                # Preempt the newest running request (recompute-only).
                victim = self.running[-1]
                if victim is req:
                    # Can't even fit ourselves: preempt self and stop.
                    self._preempt(victim)
                    preempted.add(victim.request_id)
                    new_blocks = None
                    break
                self._preempt(victim)
                preempted.add(victim.request_id)
            if new_blocks is None:
                break
            num_scheduled[req.request_id] = num_new
            budget -= num_new
            if in_prefill:
                prefill_budget -= num_new
            if req.spec_token_ids:
                n_spec = min(len(req.spec_token_ids),
                             num_new - 1 if num_new > 0 else 0)
                if req.num_computed_tokens + num_new >= req.num_tokens:
                    spec_tokens[req.request_id] = req.spec_token_ids[:n_spec]
            cached.req_ids.append(req.request_id)
            cached.new_block_ids.append([b.block_id for b in new_blocks])
            cached.resumed_from_preemption.append(False)
            cached.all_token_ids.append(None)
            cached.num_computed_tokens.append(req.num_computed_tokens)
            idx += 1

        # -- 2. waiting requests ------------------------------------------
        while (self.waiting and budget > 0
               and len(self.running) < self.config.max_num_seqs):
            req = self.waiting[0]
            if req.request_id in preempted:
                # Don't resume a request we just preempted this same step.
                break
            if prefill_budget <= 0:
                break  # this wave's prefill quantum is spent
            computed_blocks, num_computed = self.kv.get_computed_blocks(req)
            num_new = req.num_tokens - num_computed
            num_new = min(num_new, budget, chunk_cap, prefill_budget)
            if num_new <= 0:
                break
            new_blocks = self.kv.allocate_slots(
                req, num_new, new_computed_blocks=computed_blocks,
                num_lookahead_tokens=self.num_lookahead_tokens)
            if new_blocks is None:
                if self.realize_hook is not None and self.realize_hook():
                    continue  # async realize freed pages: retry
                break  # out of pages: leave in waiting
            self.waiting.popleft()
            resumed = req.status == RequestStatus.PREEMPTED
            req.status = RequestStatus.RUNNING
            req.num_computed_tokens = num_computed
            if req.num_cached_tokens == 0:
                req.num_cached_tokens = num_computed
                req.metrics.num_cached_tokens = num_computed
            self.running.append(req)
            num_scheduled[req.request_id] = num_new
            budget -= num_new
            prefill_budget -= num_new
            all_block_ids = self.kv.get_block_ids(req.request_id)
            if resumed:
                cached.req_ids.append(req.request_id)
                cached.new_block_ids.append(all_block_ids)
                cached.resumed_from_preemption.append(True)
                cached.all_token_ids.append(list(req.all_token_ids))
                cached.num_computed_tokens.append(num_computed)
            else:
                new_reqs.append(
                    NewRequestData(
                        req_id=req.request_id,
                        prompt_token_ids=req.prompt_token_ids,
                        sampling_params=req.sampling_params,
                        block_ids=all_block_ids,
                        num_computed_tokens=num_computed,
                        lora_name=req.lora_name,
                        mm_inputs=req.mm_inputs))

        finished_ids = self._finished_req_ids
        self._finished_req_ids = set()
        return SchedulerOutput(
            scheduled_new_reqs=new_reqs,
            scheduled_cached_reqs=cached,
            num_scheduled_tokens=num_scheduled,
            total_num_scheduled_tokens=sum(num_scheduled.values()),
            scheduled_spec_decode_tokens=spec_tokens,
            finished_req_ids=finished_ids)

    def _schedule_continuation(self, preempted: set
                               ) -> Optional[SchedulerOutput]:
        """Build a continuation-window wave: one virtual token per
        chainable (in-flight) running request, plus decode-ready joiner
        rows. Emitted INSTEAD of a normal wave; the depth cap inside the
        hook makes continuation alternate with normal waves, so waiting
        prefills are admitted every other step (time-multiplexing the
        device between decode windows and prefill chunks)."""
        chain, join = [], []
        for req in self.running:
            if req.request_id in preempted:
                continue
            mode = self.continuation_hook(req)
            if mode == "chain":
                chain.append(req)
            elif mode == "join":
                join.append(req)
        if not chain or len(chain) + len(join) > self.config.max_num_seqs:
            return None
        num_scheduled: dict[str, int] = {}
        cached = CachedRequestData()
        for req in chain + join:
            # No realize_hook / preemption here: a row that cannot get its
            # lookahead pages simply sits this wave out (the normal path
            # picks it up later under real pressure handling).
            new_blocks = self.kv.allocate_slots(
                req, 1, num_lookahead_tokens=self.num_lookahead_tokens)
            if new_blocks is None:
                continue
            num_scheduled[req.request_id] = 1
            cached.req_ids.append(req.request_id)
            cached.new_block_ids.append([b.block_id for b in new_blocks])
            cached.resumed_from_preemption.append(False)
            cached.all_token_ids.append(None)
            cached.num_computed_tokens.append(req.num_computed_tokens)
        if not num_scheduled:
            return None
        finished_ids = self._finished_req_ids
        self._finished_req_ids = set()
        return SchedulerOutput(
            scheduled_new_reqs=[],
            scheduled_cached_reqs=cached,
            num_scheduled_tokens=num_scheduled,
            total_num_scheduled_tokens=len(num_scheduled),
            scheduled_spec_decode_tokens={},
            finished_req_ids=finished_ids,
            is_continuation=True)

    def _preempt(self, req: Request) -> None:
        self.num_preemptions += 1
        self.running.remove(req)
        self.kv.free(req)
        req.status = RequestStatus.PREEMPTED
        req.num_computed_tokens = 0
        req.spec_token_ids = []
        self.waiting.appendleft(req)
        logger.debug("preempted request %s", req.request_id)

    # ---------------------------------------------------------------- async
    def note_async(self, sched_out: SchedulerOutput,
                   expected_counts: dict) -> None:
        """Advance bookkeeping for an in-flight step whose token VALUES are
        not known yet (multi-step windows produce a deterministic COUNT per
        request). Requests that will certainly finish by length are freed
        now — their pages return to the pool while the device still
        computes (writes land before any reuse: device execution is
        serial). Values arrive via realize_update."""
        for rid, n_sched in sched_out.num_scheduled_tokens.items():
            req = self.requests.get(rid)
            if req is None:
                continue
            k = expected_counts.get(rid, 0)
            req.num_computed_tokens += n_sched + max(0, k - 1)
            # Cumulative: continuation windows stack a second in-flight
            # step on an already-pending request.
            pending_before = req.num_async_pending
            req.num_async_pending += k
            params = req.sampling_params
            out_after = req.num_output_tokens + pending_before + k
            len_after = req.num_tokens + pending_before + k
            will_finish = (
                (params.max_tokens is not None
                 and out_after >= params.max_tokens)
                or len_after >= self.config.max_model_len)
            if will_finish:
                # Emission and stop-condition truncation happen at realize;
                # only the KV pages and the running slot are released now.
                self._async_finishing[rid] = req
                self.kv.free(req)
                if req in self.running:
                    self.running.remove(req)

    def realize_update(self, sched_out: SchedulerOutput,
                       runner_out) -> list[EngineCoreOutput]:
        """update_from_output for an async step: num_computed was already
        advanced by note_async — only append values, run stop conditions,
        and emit."""
        outputs: list[EngineCoreOutput] = []
        seen = {rid: i for i, rid in enumerate(runner_out.req_ids)}
        for rid in sched_out.num_scheduled_tokens:
            req = self.requests.get(rid)
            stashed = self._async_finishing.get(rid)
            if req is None:
                # Aborted while in flight, or finished by an earlier
                # realize (a later chained window still held tokens for
                # it — they are dropped here).
                self._async_finishing.pop(rid, None)
                continue
            i = seen.get(rid)
            sampled = (runner_out.sampled_token_ids[i]
                       if i is not None else [])
            # Decrement, not reset: continuation windows stack multiple
            # in-flight steps per request.
            req.num_async_pending = max(
                0, req.num_async_pending - len(sampled))
            if not sampled:
                continue
            new_tokens, finish = self._append_and_check_stop(req, sampled)
            if stashed is not None:
                if finish or req.num_async_pending == 0:
                    # Pages already freed by note_async; just mark
                    # finished once the last in-flight step realized (or
                    # a stop condition cut it short).
                    self._async_finishing.pop(rid, None)
                    if not req.is_finished:
                        req.status = RequestStatus.FINISHED_LENGTH_CAPPED
                    self._finished_req_ids.add(rid)
                    self.requests.pop(rid, None)
            elif finish:
                self._free_request(req)
            lp = None
            if runner_out.logprobs is not None and i is not None:
                lp = runner_out.logprobs[i]
                if lp is not None:
                    lp = lp[:len(new_tokens)]
            plp = (runner_out.prompt_logprobs.get(rid)
                   if runner_out.prompt_logprobs else None)
            outputs.append(
                EngineCoreOutput(
                    req_id=rid,
                    new_token_ids=new_tokens,
                    finished=req.is_finished,
                    finish_reason=req.get_finish_reason(),
                    stop_reason=req.stop_reason,
                    logprobs=lp,
                    num_cached_tokens=req.num_cached_tokens,
                    prompt_logprobs=plp))
        return outputs

    # ------------------------------------------------------------ post-process
    def update_from_output(self, sched_out: SchedulerOutput,
                           runner_out: ModelRunnerOutput
                           ) -> list[EngineCoreOutput]:
        outputs: list[EngineCoreOutput] = []
        seen = {rid: i for i, rid in enumerate(runner_out.req_ids)}

        for rid, n_sched in sched_out.num_scheduled_tokens.items():
            req = self.requests.get(rid)
            if req is None or req.is_finished:
                continue
            spec = sched_out.scheduled_spec_decode_tokens.get(rid, [])
            i = seen.get(rid)
            sampled = (runner_out.sampled_token_ids[i]
                       if i is not None else [])
            # Advance computed count; with spec decode, rejected draft tokens
            # roll back (num accepted = len(sampled) covers the bonus token).
            if spec:
                num_rejected = len(spec) + 1 - len(sampled)
                req.num_computed_tokens += n_sched - num_rejected
            else:
                # Multi-step decode returns >1 sampled tokens per scheduled
                # token: each extra token's KV was computed in-graph.
                req.num_computed_tokens += n_sched + max(
                    0, len(sampled) - 1)
            req.spec_token_ids = (
                runner_out.spec_token_ids[i]
                if runner_out.spec_token_ids and i is not None else [])

            if not sampled:
                continue  # mid-prefill chunk: nothing emitted
            new_tokens, finish = self._append_and_check_stop(req, sampled)
            if finish:
                self._free_request(req)
            lp = None
            if runner_out.logprobs is not None and i is not None:
                lp = runner_out.logprobs[i]
                if lp is not None:
                    lp = lp[:len(new_tokens)]
            plp = (runner_out.prompt_logprobs.get(rid)
                   if runner_out.prompt_logprobs else None)
            outputs.append(
                EngineCoreOutput(
                    req_id=rid,
                    new_token_ids=new_tokens,
                    finished=req.is_finished,
                    finish_reason=req.get_finish_reason(),
                    stop_reason=req.stop_reason,
                    logprobs=lp,
                    num_cached_tokens=req.num_cached_tokens,
                    prompt_logprobs=plp))
        return outputs

    def _append_and_check_stop(self, req: Request,
                               sampled: list[int]) -> tuple[list[int], bool]:
        """Append sampled tokens, truncating at any stop condition.
        Returns (emitted tokens, finished)."""
        params = req.sampling_params
        stop_ids = params.all_stop_token_ids
        emitted: list[int] = []
        for tok in sampled:
            emitted.append(tok)
            req.append_output_token_ids([tok])
            n_out = req.num_output_tokens
            if n_out < params.min_tokens:
                continue
            if not params.ignore_eos and req.eos_token_id is not None \
                    and tok == req.eos_token_id:
                # EOS stays in token_ids; skip_special_tokens drops it from
                # text at detokenization (reference stop-checker semantics).
                req.status = RequestStatus.FINISHED_STOPPED
                return emitted, True
            if tok in stop_ids:
                req.status = RequestStatus.FINISHED_STOPPED
                req.stop_reason = tok
                if not params.include_stop_str_in_output:
                    emitted.pop()
                return emitted, True
            if n_out >= req.max_tokens or \
                    req.num_tokens >= self.config.max_model_len:
                req.status = RequestStatus.FINISHED_LENGTH_CAPPED
                return emitted, True
        return emitted, False

    # ------------------------------------------------------------------- state
    def has_unfinished_requests(self) -> bool:
        return bool(self.waiting or self.running)

    def get_num_unfinished_requests(self) -> int:
        return len(self.waiting) + len(self.running)
