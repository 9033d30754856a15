"""EngineCore: the scheduler + worker inner loop.

Analog of the reference v1 EngineCore (aphrodite/v1/engine/core.py:48,
step :204) minus the process boundary — the ZMQ-fronted multiprocess variant
lives in engine/core_proc.py; this class is the shared inner logic.
"""
from __future__ import annotations

from typing import Optional

from aphrodite_tpu.config import EngineConfig
from aphrodite_tpu.core.request import Request, RequestStatus
from aphrodite_tpu.core.scheduler import EngineCoreOutput, Scheduler
from aphrodite_tpu.metrics import StatsAggregator
from aphrodite_tpu.utils import logger
from aphrodite_tpu.worker.worker import Worker


class EngineCore:

    def __init__(self, config: EngineConfig, tokenizer=None) -> None:
        self.config = config
        # OOT plugins first: they may register model architectures the
        # worker is about to resolve (reference plugins/__init__.py).
        from aphrodite_tpu.plugins import load_general_plugins
        load_general_plugins()
        self.worker = Worker(config)
        from aphrodite_tpu.usage import report_usage
        report_usage(config.model_config.architecture or "?", "ENGINE",
                     {"dtype": config.model_config.dtype,
                      "tp": config.parallel_config.tensor_parallel_size,
                      "quantization": config.model_config.quantization})
        self.structured = None
        if tokenizer is not None:
            from aphrodite_tpu.structured_output import (
                StructuredOutputManager)
            self.structured = StructuredOutputManager(
                tokenizer, self.worker.model.vocab_size,
                tokenizer.eos_token_id)
        # Lookahead KV slots cover both speculative drafts and the in-graph
        # multi-step decode window (0 when the runner disables multi-step:
        # SSM and encoder-decoder models).
        lookahead = config.max_lookahead_tokens
        if getattr(self.worker.model, "is_ssm", False) or \
                getattr(self.worker.model, "is_encoder_decoder", False):
            lookahead = (config.speculative_config.num_speculative_tokens
                         if config.speculative_config else 0)
        kv_events = None
        ep = config.observability_config.kv_events_endpoint
        if ep:
            from aphrodite_tpu.kv_events import KVEventPublisher
            kv_events = KVEventPublisher(ep)
        self.scheduler = Scheduler(config.scheduler_config,
                                   config.cache_config,
                                   num_lookahead_tokens=lookahead,
                                   kv_event_publisher=kv_events)
        self.stats = StatsAggregator()
        otlp = config.observability_config.otlp_traces_endpoint
        if otlp:
            from aphrodite_tpu.tracing import RequestTracer
            self.stats.tracer = RequestTracer(
                None if otlp == "memory" else otlp)
        self.proposer = None
        sc = config.speculative_config
        if sc is not None and sc.num_speculative_tokens > 0:
            if sc.method == "ngram":
                from aphrodite_tpu.spec_decode import NgramProposer
                self.proposer = NgramProposer(
                    min_n=sc.prompt_lookup_min, max_n=sc.prompt_lookup_max,
                    num_speculative_tokens=sc.num_speculative_tokens)
            elif sc.method in ("draft_model", "eagle", "medusa",
                               "mlp_speculator"):
                # Drafts come from the runner's lockstep draft model; the
                # sentinel routes the propose loop to runner.pending_drafts.
                self.proposer = "draft"
            if self.proposer is not None:
                self.worker.runner.spec_k = sc.num_speculative_tokens
            if sc.method == "ngram":
                # Host-side proposer: in-graph decode windows keep requests
                # async-pending across steps, so the propose loop would
                # never see a decode-ready request — speculation would be
                # silently inert. Window decode and host speculation are
                # alternative latency optimizations; spec was explicitly
                # configured, so it wins.
                self.worker.runner.use_graph_multi_step = False

        # Disaggregated prefill (reference: distributed/kv_transfer/):
        # producer ships finished requests' prompt pages into a ZMQ lookup
        # buffer; consumer seeds fetched pages into its prefix cache so
        # scheduling treats them as ordinary cache hits.
        self.kv_connector = None
        self._kv_role = None
        ktc = config.kv_transfer_config
        if ktc is not None and ktc.kv_role:
            from aphrodite_tpu.distributed.kv_transfer import (
                ConsumerClient, ProducerBuffer)
            bs = config.cache_config.block_size
            self._kv_role = ktc.kv_role
            if ktc.kv_role == "kv_producer":
                self.kv_connector = ProducerBuffer(ktc)

                def _ship(request, block_ids, _bs=bs):
                    n_full = request.num_prompt_tokens // _bs
                    if n_full == 0 or len(block_ids) < n_full:
                        return
                    kv = self.worker.runner.extract_pages(
                        block_ids[:n_full])
                    self.kv_connector.put(request.prompt_token_ids, _bs, kv)

                self.scheduler.finish_callback = _ship
            elif ktc.kv_role == "kv_consumer":
                self.kv_connector = ConsumerClient(ktc)
            else:
                raise ValueError(f"unknown kv_role: {ktc.kv_role}")

        # ---- multi-host control plane (parallel/control_plane.py) -------
        # Host 0 broadcasts each step's SchedulerOutput so peer hosts
        # enter the same jitted SPMD step; peers run run_follower().
        self.broadcaster = None
        import os as _os
        if _os.environ.get("APHRODITE_CP_PEERS"):
            from aphrodite_tpu.parallel.control_plane import StepBroadcaster
            self.broadcaster = StepBroadcaster()
            if self.broadcaster.health is not None:
                # Followers must be alive before the first SPMD step; a
                # bounded wait turns a dead launch into a clean error.
                self.broadcaster.health.wait_for_followers(timeout_s=600)

        # ---- async scheduling (reference: v1 --async-scheduling) --------
        # In-flight PendingSteps: host scheduling + the next dispatch
        # overlap device compute; results realize lazily.
        self._pending: list = []
        self._pending_outputs: list[EngineCoreOutput] = []
        if self._kv_role == "kv_producer":
            # The finish callback reads pages synchronously at free time.
            self.worker.runner.async_mode = False
        self.scheduler.realize_hook = self._realize_all_hook
        # Continuation windows: chain decode window w+1 off the in-flight
        # window w on device so the pipeline never drains between windows
        # (the core of online==offline decode throughput). Incompatible
        # with host-side speculation (the proposer must see every token).
        runner = self.worker.runner
        if (getattr(runner, "use_window_decode", False) and runner.async_mode
                and self.proposer is None):
            self.scheduler.continuation_hook = self._continuation_mode
            self.scheduler.chain_active_hook = lambda: (
                runner._window_group is not None
                and runner._chain_depth > 0)

    def _continuation_mode(self, req):
        """Scheduler continuation hook: grammar-constrained requests must
        realize every token on host (FSM advance), so they never chain."""
        if self.structured is not None and \
                self.structured.has(req.request_id):
            return None
        return self.worker.runner.continuation_mode(req)

    def precompile(self) -> None:
        """Warm the hot jitted programs at init by running synthetic
        requests through the REAL engine loop: one full-budget prefill
        wave (biggest token/req bucket) plus a decode window, so a server
        is compiled before it accepts traffic (reference
        tpu_model_runner.py:1018-1124 precompile; here the dummy run IS
        the precompile since bucketing replaces the shape zoo)."""
        import time as _time
        from aphrodite_tpu.sampling_params import SamplingParams
        t0 = _time.time()
        sc = self.config.scheduler_config
        vocab = max(self.worker.model.vocab_size - 2, 2)
        R = sc.max_num_seqs
        plen = max(min(sc.max_num_batched_tokens // max(R, 1),
                       sc.max_model_len - 66), 1)
        # 2 windows + 2 so the warm loop exercises the continuation-window
        # program (window w+1 chained off in-flight window w), not just
        # the fused prefill+window.
        dec = min(2 * self.config.tpu_config.multi_step_decode + 2,
                  max(sc.max_model_len - plen - 1, 1))
        params = SamplingParams(temperature=0.0, max_tokens=dec,
                                ignore_eos=True)
        import numpy as np
        rng = np.random.RandomState(0)
        prompts = [rng.randint(1, vocab, size=plen).tolist()
                   for _ in range(R)]
        for i in range(R):
            self.scheduler.add_request(Request(
                request_id=f"__warmup_{i}",
                prompt_token_ids=prompts[i],
                sampling_params=params))
        while self.has_unfinished_requests():
            self.step()
        # Second pass over the SAME prompts: cache-hit admission waves
        # (R one-token rows) have their own shape signatures, and an
        # unwarmed variant costs a 10-70 s mid-traffic compile on a
        # fresh machine (round-5 serve-bench forensics).
        if self.scheduler.kv.enable_caching:
            for i in range(R):
                self.scheduler.add_request(Request(
                    request_id=f"__warmup_hit_{i}",
                    prompt_token_ids=prompts[i],
                    sampling_params=params))
            while self.has_unfinished_requests():
                self.step()
        self.scheduler.kv.reset_prefix_cache()
        logger.info("precompile: warmed hot buckets in %.1fs "
                    "(%d reqs x %d prompt + %d decode, cold+cache-hit)",
                    _time.time() - t0, R, plen, dec)

    def add_request(self, request: Request) -> None:
        self.stats.on_request_arrival(request.request_id,
                                      request.num_prompt_tokens,
                                      request.metrics.arrival_time)
        gd = request.sampling_params.guided_decoding
        if gd is not None and gd.num_constraints():
            if self.structured is None:
                raise ValueError(
                    "guided decoding requires a tokenizer-backed engine")
            self.structured.add_request(request.request_id, gd)
        if self._kv_role == "kv_consumer" and request.mm_inputs is None:
            self._try_kv_fetch(request)
        self.scheduler.add_request(request)

    def _try_kv_fetch(self, request: Request) -> None:
        """Consumer-side disaggregated prefill: fetch remote prompt pages
        and seed them as cached prefix blocks (only the hashes missing
        locally, so no duplicate cache entries are created)."""
        bs = self.config.cache_config.block_size
        mgr = self.scheduler.kv
        if not mgr.enable_caching:
            return
        data = self.kv_connector.lookup(request.prompt_token_ids, bs)
        if data is None:
            return
        from aphrodite_tpu.core.block_pool import hash_request_tokens
        n = int(data["kv"].shape[1])
        hashes = hash_request_tokens(
            bs, request.prompt_token_ids[:data["n_tokens"]],
            extra_key=request.mm_hash)[:n]
        missing = [i for i, h in enumerate(hashes)
                   if mgr.pool.get_cached_block(h) is None]
        if not missing or mgr.pool.get_num_free_blocks() <= len(missing):
            return
        blocks = mgr.pool.get_new_blocks(len(missing))
        self.worker.runner.seed_pages(
            [b.block_id for b in blocks], data["kv"][:, missing])
        mgr.pool.cache_full_blocks(blocks, [hashes[i] for i in missing],
                                   0, len(missing))
        mgr.pool.free_blocks(blocks)
        self.stats.kv_transfer_pages = getattr(
            self.stats, "kv_transfer_pages", 0) + len(missing)

    def abort_requests(self, request_ids: list[str]) -> None:
        self.scheduler.finish_requests(request_ids,
                                       RequestStatus.FINISHED_ABORTED)

    def _realize_one(self) -> list[EngineCoreOutput]:
        sched_out, ps = self._pending.pop(0)
        runner_out = ps.realize()
        outputs = self.scheduler.realize_update(sched_out, runner_out)
        if self.structured is not None and self.structured.requests:
            # Grammar rows ride async steps single-step (expected count 1,
            # per-row window eligibility): their FSM advances here, before
            # the next schedule() computes their bitmask — an async-pending
            # request is never rescheduled until its step realizes, so the
            # mask is never computed from a stale state.
            for i, rid in enumerate(runner_out.req_ids):
                if self.structured.has(rid):
                    self.structured.advance(
                        rid, runner_out.sampled_token_ids[i])
            for eco in outputs:
                if eco.finished:
                    self.structured.remove_request(eco.req_id)
        for eco in outputs:
            self.stats.on_tokens(eco.req_id, len(eco.new_token_ids))
            if eco.finished:
                self.stats.on_finished(eco.req_id)
        return outputs

    def _realize_all_hook(self) -> bool:
        """Scheduler pressure hook: realize every in-flight step (may free
        pages). Outputs are buffered for the next step() return."""
        if not self._pending:
            return False
        while self._pending:
            self._pending_outputs.extend(self._realize_one())
        return True

    def step(self) -> list[EngineCoreOutput]:
        outputs0: list[EngineCoreOutput] = []
        if self._pending_outputs:
            outputs0 = self._pending_outputs
            self._pending_outputs = []
        if not self.scheduler.has_unfinished_requests():
            if self._pending:
                return outputs0 + self._realize_one()
            return outputs0
        sched_out = self.scheduler.schedule()
        if sched_out.total_num_scheduled_tokens == 0 and self._pending:
            # Nothing schedulable without in-flight results: sync now.
            # Re-queue the purge list this (discarded) schedule drained so
            # the runner still sees it next step.
            self.scheduler._finished_req_ids |= sched_out.finished_req_ids
            return outputs0 + self._realize_one()
        for rid in sched_out.num_scheduled_tokens:
            self.stats.on_scheduled(rid)
        if self.structured is not None and self.structured.requests:
            import numpy as np
            rows = {}
            masks = []
            for rid in sched_out.num_scheduled_tokens:
                if self.structured.has(rid):
                    req = self.scheduler.requests.get(rid)
                    if req is None:
                        continue
                    n = sched_out.num_scheduled_tokens[rid]
                    if req.num_computed_tokens + n >= req.num_tokens:
                        rows[rid] = len(masks)
                        masks.append(self.structured.bitmask_row(rid))
            if masks:
                sched_out.structured_output_request_ids = rows
                sched_out.grammar_bitmask = np.stack(masks)
        if self.broadcaster is not None:
            self.broadcaster.broadcast_step(sched_out)
        from aphrodite_tpu.utils import PerRequestError
        try:
            runner_out = self.worker.execute_model(sched_out)
        except PerRequestError as e:
            if self.broadcaster is not None:
                # Multi-host SPMD: followers already received (and ran or
                # died on) this step — a host-0-local abort would desync
                # the collectives. Fail-stop consistently instead; the
                # health channel surfaces follower-side failures the same
                # way.
                raise
            # Isolate: abort only the offending request; everything else
            # in the batch reschedules next step (their computed counts
            # were not advanced). Reference:
            # engine/aphrodite_engine.py:1430-1442.
            from aphrodite_tpu.core.request import RequestStatus
            logger.warning("aborting request %s: %s", e.req_id, e)
            self.scheduler.finish_requests(
                [e.req_id], RequestStatus.FINISHED_ABORTED)
            outputs0.append(EngineCoreOutput(
                req_id=e.req_id, new_token_ids=[], finished=True,
                finish_reason="error", stop_reason=str(e)))
            return outputs0
        from aphrodite_tpu.core.sched_output import PendingStep
        if isinstance(runner_out, PendingStep):
            self.scheduler.note_async(sched_out,
                                      runner_out.expected_counts)
            self._pending.append((sched_out, runner_out))
            if len(self._pending) > 2:
                outputs0 += self._realize_one()
            return outputs0
        outputs = self.scheduler.update_from_output(sched_out, runner_out)
        for rid, drafts in sched_out.scheduled_spec_decode_tokens.items():
            self.stats.spec_drafted += len(drafts)
        if sched_out.scheduled_spec_decode_tokens:
            for i, rid in enumerate(runner_out.req_ids):
                if rid in sched_out.scheduled_spec_decode_tokens:
                    self.stats.spec_accepted += max(
                        0, len(runner_out.sampled_token_ids[i]) - 1)
        for eco in outputs:
            self.stats.on_tokens(eco.req_id, len(eco.new_token_ids))
            if eco.finished:
                self.stats.on_finished(eco.req_id)
        self.stats.num_preemptions = self.scheduler.num_preemptions
        if self.structured is not None and self.structured.requests:
            for i, rid in enumerate(runner_out.req_ids):
                if self.structured.has(rid):
                    self.structured.advance(
                        rid, runner_out.sampled_token_ids[i])
            for eco in outputs:
                if eco.finished:
                    self.structured.remove_request(eco.req_id)
            for rid in sched_out.finished_req_ids:
                self.structured.remove_request(rid)
        if self.proposer is not None:
            dbs = (self.config.speculative_config.disable_by_batch_size
                   if self.config.speculative_config else None)
            if dbs is not None and len(self.scheduler.running) > dbs:
                # Queue too deep: decode is batch-efficient already; drafts
                # would only add verify FLOPs (reference
                # spec_decode_worker.py:553 _maybe_disable_speculative_tokens)
                for req in self.scheduler.running:
                    req.spec_token_ids = []
                return outputs0 + outputs
            drafts_map = (self.worker.runner.pending_drafts_map()
                          if self.proposer == "draft" else None)
            for req in self.scheduler.running:
                # Draft only for decode-ready requests (prompt fully done).
                # Token-history samplers (penalties/DRY/ngram-ban) need fresh
                # context at every position — skip drafting for those.
                p = req.sampling_params
                if (not req.num_async_pending
                        and req.num_computed_tokens + 1 == req.num_tokens
                        and p.guided_decoding is None
                        and p.repetition_penalty == 1.0
                        and p.presence_penalty == 0.0
                        and p.frequency_penalty == 0.0
                        and p.dry_multiplier == 0.0
                        and p.no_repeat_ngram_size == 0):
                    if drafts_map is not None:
                        req.spec_token_ids = drafts_map.get(
                            req.request_id, [])
                    else:
                        req.spec_token_ids = self.proposer.propose(
                            req.all_token_ids)
        return outputs0 + outputs

    def fork_request(self, parent_id: str, child_id: str,
                     next_token: int):
        """Engine-native beam fork (reference block_manager fork / CoW
        semantics, TPU form): the child shares the parent's fully-written
        KV blocks by refcount, clones a mid-block tail page on device, and
        diverges only in the last not-yet-fed token. The child enters
        RUNNING directly — no admission, no re-prefill. Returns the child
        Request, or None when the pool cannot supply the tail page."""
        from aphrodite_tpu.core.request import Request, RequestStatus
        parent = self.scheduler.requests[parent_id]
        assert not parent.num_async_pending, \
            "realize in-flight steps before forking"
        forked = self.scheduler.kv.fork(parent_id, child_id,
                                        parent.num_computed_tokens)
        if forked is None:
            return None
        block_ids, tail_copy = forked
        child = Request(
            request_id=child_id,
            prompt_token_ids=parent.prompt_token_ids,
            sampling_params=parent.sampling_params.clone(),
            eos_token_id=parent.eos_token_id,
            prompt=parent.prompt,
            lora_name=parent.lora_name,
            mm_inputs=parent.mm_inputs,
            priority=parent.priority)
        child.append_output_token_ids(
            parent.output_token_ids[:-1] + [int(next_token)])
        child.num_computed_tokens = parent.num_computed_tokens
        child.num_cached_tokens = parent.num_cached_tokens
        child.status = RequestStatus.RUNNING
        self.scheduler.requests[child_id] = child
        self.scheduler.running.append(child)
        self.worker.runner.fork_request_state(
            parent_id, child_id, block_ids, int(next_token), tail_copy)
        self.stats.on_request_arrival(child_id, len(parent.prompt_token_ids))
        return child

    def has_unfinished_requests(self) -> bool:
        return (self.scheduler.has_unfinished_requests()
                or bool(self._pending) or bool(self._pending_outputs))

    def reset_prefix_cache(self) -> bool:
        # Prefix-cache bookkeeping lives on host 0 only; no broadcast.
        return self.scheduler.kv.reset_prefix_cache()

    def worker_utility(self, method: str, *args, **kwargs):
        """Invoke a worker method on ALL hosts (sleep/wake, LoRA tensor
        management): broadcast first so peers mutate device state in the
        same order relative to steps."""
        if self.broadcaster is not None:
            self.broadcaster.broadcast_utility(method, *args, **kwargs)
        return getattr(self.worker, method)(*args, **kwargs)

    def shutdown(self) -> None:
        if self.broadcaster is not None:
            self.broadcaster.shutdown()

    def engine_stats(self) -> dict:
        sched = self.scheduler
        return {
            "num_running": len(sched.running),
            "num_waiting": len(sched.waiting),
            "kv_usage": sched.kv.usage,
            "prefix_cache_hit_rate": sched.kv.prefix_cache_hit_rate,
        }

    def metrics_text(self) -> str:
        runner = getattr(self.worker, "runner", None)
        if runner is not None:
            self.stats.encoder_cache = getattr(runner, "encoder_cache",
                                               None)
        return "\n".join(
            self.stats.prometheus_lines(self.scheduler)) + "\n" 
