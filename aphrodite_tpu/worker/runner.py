"""Model runner: turns SchedulerOutput into one jitted device step.

TPU-native redesign of the reference's TPUModelRunner
(aphrodite/v1/worker/tpu_model_runner.py:94): the entire forward —
embed -> scan(layers w/ paged attention + KV write) -> last-token gather ->
logits — is ONE jitted function over bucketed static shapes; the sampler is a
second jitted function bucketed on request count. The KV cache is donated
through the step so XLA updates it in place. No CUDA-graph machinery, no
input builders: padding + bucketing replaces all of it
(reference `_get_padded_*` tpu_model_runner.py:50-90, precompile `:1018-1124`).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aphrodite_tpu.attention.metadata import AttentionMetadata
from aphrodite_tpu.config import EngineConfig
from aphrodite_tpu.core.sched_output import (ModelRunnerOutput,
                                             SchedulerOutput)
from aphrodite_tpu.sample.metadata import build_sampling_metadata
from aphrodite_tpu.sample.sampler import sample_tokens
from aphrodite_tpu.sampling_params import SamplingParams
from aphrodite_tpu.utils import (bucket_schedule, cdiv, jax_dtype, logger,
                                 next_power_of_2, pad_to_bucket, pick_bucket,
                                 round_up)


@dataclass
class RequestState:
    req_id: str
    token_ids: list[int]
    prompt_len: int
    num_computed: int
    block_ids: list[int]
    sampling_params: SamplingParams
    lora_name: Optional[str] = None
    in_graph_sample_count: int = 0
    # Tokens produced by in-flight (unrealized) device steps: the request's
    # EFFECTIVE length is num_tokens + inflight. Continuation windows chain
    # off these on device (see _execute_continuation).
    inflight: int = 0
    # Accumulated prompt logprobs ([{token: (lp, rank?)}...], pos 0 = None).
    prompt_lp: Optional[list] = None
    # Multimodal: MMInputs payload + the per-request encoder cache (flat
    # [n_image_tokens, hidden] device array, computed lazily on first use,
    # dropped once the prompt is fully prefilled).
    mm: Optional[object] = None
    mm_embeds: Optional[object] = None
    # mrope (Qwen2-VL): [3, prompt_len] positions + decode delta, computed
    # lazily on first schedule (models/qwen2_vl.py mrope_positions).
    mrope_table: Optional[object] = None
    mrope_delta: int = 0

    @property
    def num_tokens(self) -> int:
        return len(self.token_ids)

    @property
    def output_len(self) -> int:
        return len(self.token_ids) - self.prompt_len


class ModelRunner:

    def __init__(self, config: EngineConfig, model, params,
                 mesh: Optional[jax.sharding.Mesh] = None,
                 use_pallas: Optional[bool] = None,
                 lora_manager=None) -> None:
        self.lora_manager = lora_manager
        self.config = config
        self.model = model
        self.params = params
        self.mesh = mesh
        cc = config.cache_config
        dev = config.device_config.resolve()
        if use_pallas is None:
            use_pallas = config.tpu_config.use_pallas_attention
        if use_pallas is None:
            use_pallas = dev == "tpu"
        self.use_pallas = use_pallas
        self.block_size = cc.block_size
        self.max_pages_per_req = config.max_blocks_per_req
        self.requests: dict[str, RequestState] = {}

        # --- KV cache -----------------------------------------------------
        kv_dtype = (jax_dtype(config.model_config.dtype)
                    if cc.cache_dtype == "auto" else
                    jax_dtype("float8_e5m2" if cc.cache_dtype == "fp8_e5m2"
                              else "float8_e4m3"))
        self.kv_dtype = kv_dtype
        assert cc.num_blocks is not None
        # SSM (Mamba) models: a slot-indexed recurrent-state pytree replaces
        # the paged KV cache; the scheduler's page accounting still runs but
        # the model never touches pages.
        self.is_ssm = getattr(model, "is_ssm", False)
        if self.is_ssm:
            sc0 = config.scheduler_config
            tc0 = config.tpu_config
            self.num_state_slots = next_power_of_2(sc0.max_num_seqs)
            self._free_slots = list(range(self.num_state_slots))
            self._slot_of: dict[str, int] = {}
        from aphrodite_tpu.attention.backend import kv_cache_shape
        kv_shape = (model.num_layers,) + kv_cache_shape(
            cc.num_blocks, cc.block_size, model.num_kv_heads, model.head_dim,
            pad_head_dim=self.use_pallas)
        if self.is_ssm:
            self.kv_cache = model.init_cache(
                self.num_state_slots, cache_config=cc, kv_dtype=kv_dtype,
                use_pallas=self.use_pallas)
            if mesh is not None:
                from jax.sharding import NamedSharding
                specs = model.cache_specs()
                self.kv_cache = {
                    k: jax.device_put(v, NamedSharding(mesh, specs[k]))
                    for k, v in self.kv_cache.items()}
        elif mesh is not None:
            from jax.sharding import NamedSharding
            from aphrodite_tpu.parallel.mesh import kv_cache_pspec
            tp_size = dict(zip(mesh.axis_names, mesh.devices.shape)
                           ).get("tp", 1)
            sharding = NamedSharding(
                mesh, kv_cache_pspec(pp=getattr(model, "pp_size", 1) > 1,
                                     shard_kv=model.num_kv_heads % tp_size
                                     == 0))
            self.kv_cache = jax.device_put(
                jnp.zeros(kv_shape, kv_dtype), sharding)
        else:
            self.kv_cache = jnp.zeros(kv_shape, kv_dtype)
        logger.info("KV cache: %s %s (%.2f GiB)", kv_shape, kv_dtype.__name__,
                    np.prod(kv_shape) * jnp.dtype(kv_dtype).itemsize / 2**30)

        # --- shape buckets ------------------------------------------------
        sc = config.scheduler_config
        tc = config.tpu_config
        # Budget + per-request segment-alignment slack (see execute_model).
        max_tokens_padded = round_up(
            sc.max_num_batched_tokens + 8 * sc.max_num_seqs, 512)
        self.token_buckets = bucket_schedule(tc.min_token_bucket,
                                             max_tokens_padded)
        self.req_buckets = bucket_schedule(
            tc.min_req_bucket, next_power_of_2(sc.max_num_seqs))
        self._rng_counter = 0
        self._base_seed = config.model_config.seed
        self.use_graph_multi_step = True
        # >0 when an ngram/draft proposer is active (set by the engine core):
        # verification gathers spec_k+1 sample rows per request.
        self.spec_k = 0
        sc_spec = config.speculative_config
        self.spec_accept_method = (sc_spec.acceptance_method if sc_spec
                                   else "rejection_sampler")
        self.spec_posterior_threshold = (sc_spec.posterior_threshold
                                         if sc_spec else 0.09)
        self.spec_posterior_alpha = (sc_spec.posterior_alpha
                                     if sc_spec else 0.3)
        # Draft-model proposer (spec_decode/draft_model.py), set by the
        # worker. Runs in lockstep with the target step.
        self.draft = None
        from aphrodite_tpu.worker.encoder_cache import EncoderCache
        self.encoder_cache = EncoderCache(
            budget_bytes=tc.encoder_cache_budget_mb * 1024 * 1024)

        # Pin the jitted programs' INPUT formats for int4-resident params:
        # XLA's per-program layout assignment may otherwise pick a
        # different sub-byte layout for an S4 operand than the realized
        # arrays carry, and the resulting relayout device_put cannot run
        # through the tunnel (recursion error — CLAUDE.md int4 notes).
        # in_shardings forbids kwargs, so these jits take every argument
        # POSITIONALLY (static_argnums, not argnames).
        self._params_formats = None
        try:
            if any(getattr(leaf, "dtype", None) == jnp.dtype(jnp.int4)
                   for leaf in jax.tree.leaves(params)):
                self._params_formats = jax.tree.map(
                    lambda x: (x.format
                               if x.dtype == jnp.dtype(jnp.int4)
                               else x.sharding), params)
        except Exception:
            self._params_formats = None
        fmt = self._params_formats
        self._step_fn = jax.jit(
            self._step, donate_argnums=(1,),
            static_argnums=(3, 4, 5, 6, 7, 8, 9, 10),
            in_shardings=((fmt, None, None, None, None)
                          if fmt is not None else None))
        self._multi_step_fn = jax.jit(
            self._multi_step, donate_argnums=(1,),
            static_argnums=(3, 4, 5, 6),
            in_shardings=((fmt, None, None, None)
                          if fmt is not None else None))
        self._multi_step_window_fn = jax.jit(
            self._multi_step_window, donate_argnums=(1,),
            static_argnums=(3, 4, 5, 6, 11),
            in_shardings=((fmt, None, None, None, None, None, None)
                          if fmt is not None else None))
        self.use_window_decode = getattr(model, "supports_window_decode",
                                         False) and not self.is_ssm
        # Continuation-window chain state: after any decode-window dispatch
        # the group records WHERE each row's in-flight tokens live on device
        # (packed2 buffer + row index + the carried token-history buffers),
        # so the NEXT window can chain off it without a host round trip.
        # _chain_depth counts unrealized window dispatches (pipeline depth).
        self._window_group = None
        self._chain_depth = 0
        self._block_q_cap = self._compute_block_q_cap()
        # Async (pending-step) mode: the engine core may disable this when
        # a synchronous consumer of step results exists (KV-transfer
        # producer callbacks).
        self.async_mode = config.scheduler_config.async_scheduling

    def _compute_block_q_cap(self) -> int:
        """Geometry-aware q-block size for the ragged Pallas kernel: the
        fp32 softmax scratch is block_q*group*head_dim, which at MLA
        geometry (DeepSeek-V3 absorbed MQA: group=128, head_dim 576->640)
        would be ~42 MB at block_q=128 — several times VMEM. Shrink
        block_q so the kernel's whole scratch set fits the ~12 MB budget
        (ordinary GQA models keep 128). Ref: the reference solves this
        with MLA-specific kernels (v1/attention/backends/mla/common.py,
        kernels/flash_mla/); here one geometry knob reuses the generic
        ragged kernel."""
        model = self.model
        if self.is_ssm:
            return 128
        kvh = max(getattr(model, "num_kv_heads", 1), 1)
        nq = max(getattr(model, "num_heads", kvh), kvh)
        group = max(nq // kvh, 1)
        hd = int(self.kv_cache.shape[-1]) if not isinstance(
            self.kv_cache, dict) else 128
        page = self.block_size
        chunk_pages = 8
        chunk_kv = chunk_pages * page
        kv_bytes = 2 * chunk_pages * 2 * kvh * page * hd * 2
        budget = 10 * 2 ** 20 - kv_bytes
        # Per q row: double-buffered q (bf16) + fp32 acc + double-buffered
        # out window + m/l, PLUS the in-kernel VPU temporaries
        # (s/p/mask, ~4 live [rows, chunk_kv] f32 arrays) — omitting the
        # temporaries under-counted and OOM'd scoped VMEM at 8B geometry.
        per_row = kvh * (hd * (2 * 2 + 4 + 2 * 2) + 8) + 16 * chunk_kv
        rows = max(budget // max(per_row, 1), 8)
        return int(max(8, min(128, (rows // group) // 8 * 8)))

    # -------------------------------------------------------------- jit step
    def _unpack(self, flat_meta, layout, block_q=None, decode_mode=False):
        """(md, smd, extras) from the single packed metadata transfer.
        All per-step host metadata crosses the tunnel as ONE int32 buffer
        (worker/meta_pack.py): each separate h2d costs ~1-6 ms of RPC, so
        ~50 arrays/step (sampling params + attention metadata + work items)
        would dominate the step wall time."""
        from aphrodite_tpu.sample.metadata import SamplingMetadata
        from aphrodite_tpu.worker.meta_pack import unpack_meta
        d = unpack_meta(flat_meta, layout)
        md_kwargs = {k[3:]: v for k, v in d.items() if k.startswith("md_")}
        md = AttentionMetadata(block_q=block_q, decode_mode=decode_mode,
                               **md_kwargs) if md_kwargs else None
        smd = SamplingMetadata(
            **{k[2:]: v for k, v in d.items() if k.startswith("s_")})
        extras = {k: v for k, v in d.items()
                  if not k.startswith(("md_", "s_"))}
        return md, smd, extras

    @staticmethod
    def _head_lora(logits, rows_h, lora, slots):
        """lm_head LoRA delta on the gathered sample rows (lora/models.py
        boundary adapters)."""
        if lora is None or "lora_A_lm_head" not in lora or slots is None:
            return logits
        from aphrodite_tpu.lora.models import lora_apply
        d = lora_apply(rows_h, lora["lora_A_lm_head"],
                       lora["lora_B_lm_head"], slots)
        return logits + d.astype(logits.dtype)

    def _step(self, params, kv_cache, flat_meta, layout, flags,
              max_logprobs, spec_k=0, plp_k=0, need_sample=True,
              need_hidden=False, block_q=None, lora=None, mm=None):
        """Fused forward + sample: ONE dispatch, ONE h2d (packed metadata)
        and one small d2h per engine step (device round trips dominate
        latency on a tunneled chip; see bench notes). With spec_k>0,
        gathers spec_k+1 rows per request (the draft positions + bonus)
        for sample-and-match verification."""
        md, smd, ex = self._unpack(flat_meta, layout, block_q=block_q)
        input_ids = ex["input_ids"]
        grammar_mask = ex.get("grammar_mask")
        plp_targets = ex.get("plp_targets")
        spec_draft = ex.get("spec_draft")
        if "mm_idx" in ex and mm is not None:
            mm = (mm, ex["mm_idx"])
        hidden, kv_cache = self.model.apply(params, input_ids, kv_cache, md,
                                            use_pallas=self.use_pallas,
                                            lora=lora, mm=mm)
        h_out = hidden if need_hidden else None
        if not need_sample:
            # Pure mid-prefill step: nothing to sample or fetch — the engine
            # continues without a device round trip (the next step's inputs
            # don't depend on this one's outputs).
            return None, None, None, kv_cache, None, h_out
        ends = jnp.clip(md.query_start_loc[1:] - 1, 0)
        if spec_k > 0:
            offs = jnp.arange(spec_k + 1, dtype=jnp.int32) - spec_k
            row_idx = jnp.clip(ends[:, None] + offs[None, :], 0).reshape(-1)
            rows = jnp.take(hidden, row_idx, axis=0)
            row_src = row_idx
        else:
            rows = jnp.take(hidden, ends, axis=0)
            row_src = ends
        logits = self.model.compute_logits(params, rows)
        if lora is not None and md.lora_slots is not None:
            logits = self._head_lora(logits, rows, lora,
                                     jnp.take(md.lora_slots, row_src))
        if grammar_mask is not None:
            # Packed uint32 bitmask per row (structured output): unpack and
            # mask in-graph (reference TPU structured_decode pattern).
            R2, W = grammar_mask.shape
            shifts = jnp.arange(32, dtype=jnp.uint32)
            bits = (grammar_mask[:, :, None] >> shifts[None, None, :]) & 1
            bits = bits.reshape(R2, W * 32)[:, :logits.shape[-1]]
            logits = jnp.where(bits.astype(bool), logits, -jnp.inf)
        out = sample_tokens(
            logits, smd, flags, max_logprobs,
            spec_draft=spec_draft,
            spec_method=(self.spec_accept_method if spec_k else None),
            posterior_threshold=self.spec_posterior_threshold,
            posterior_alpha=self.spec_posterior_alpha)
        plp = None
        if plp_targets is not None:
            # Prompt logprobs: full-vocab log-softmax over every scheduled
            # row; chosen = the actual next prompt token.
            all_logits = self.model.compute_logits(params, hidden)
            lsm = jax.nn.log_softmax(all_logits, axis=-1)
            chosen = jnp.take_along_axis(
                lsm, plp_targets[:, None], axis=1)[:, 0]
            if plp_k:
                tv, ti = jax.lax.top_k(lsm, plp_k)
                plp = (chosen, tv, ti)
            else:
                plp = (chosen, None, None)
        # Pack (tokens, logprob) into one [2, R] f32 array -> single d2h.
        packed = jnp.stack([
            jax.lax.bitcast_convert_type(out["tokens"], jnp.float32),
            out["logprob"],
        ])
        if max_logprobs:
            return packed, out["topk_values"], out["topk_indices"], \
                kv_cache, plp, h_out
        return packed, None, None, kv_cache, plp, h_out

    # ------------------------------------------------- multi-step decode scan
    def _multi_step(self, params, kv_cache, flat_meta, layout, flags,
                    num_steps, max_logprobs, lora=None):
        """K decode steps in one dispatch: sampled token feeds the next step
        in-graph (scan carry); KV slots come from the block tables; RNG/
        min-tokens counters advance via step_offset.

        ``step_budget`` [R] caps each request's live steps: rows past their
        budget freeze (no KV write, no seq_len advance, token held) so K can
        be sized for the LONGEST remaining budget in the batch — a ragged
        tail costs idle lanes instead of extra dispatches (each dispatch
        carries ~25 ms of tunnel RPC).

        Token-history samplers (penalties/DRY/no-repeat-ngram) run EVERY
        sub-step: the history buffer (token_seq/total_len) rides the scan
        carry and each sampled token is appended in-graph, so the window
        sees exactly the context single-step execution would (reference:
        the multi-step runner pythonizes + reruns the full sampler per
        sub-step, aphrodite/worker/multi_step_model_runner.py:482-520)."""
        import dataclasses as _dc
        _, smd, ex = self._unpack(flat_meta, layout)
        track_tokens = flags.do_penalties or flags.do_dry or flags.do_ngram
        cur_tokens = ex["cur_tokens"]
        seq_lens0 = ex["seq_lens0"]
        block_tables = ex["block_tables"]
        step_budget = ex.get("step_budget")
        lora_row_slots = ex.get("lora_rows")
        mrope_deltas = ex.get("mrope_deltas")
        # Runtime step count (<= the static buffer cap num_steps): ONE
        # compiled program serves every window length, and the window runs
        # exactly max(budget) sub-steps — no idle whole-batch sub-steps, no
        # expensive K=1 remainder dispatch.
        n_live = ex["num_live_steps"].reshape(())
        R = cur_tokens.shape[0]
        ps = self.block_size
        arange_r = jnp.arange(R, dtype=jnp.int32)

        tok_buf = jnp.zeros((num_steps, R), jnp.int32)
        lp_buf = jnp.zeros((num_steps, R), jnp.float32)
        if max_logprobs:
            tv_buf = jnp.zeros((num_steps, R, max_logprobs), jnp.float32)
            ti_buf = jnp.zeros((num_steps, R, max_logprobs), jnp.int32)
        else:
            tv_buf = ti_buf = jnp.zeros((0,), jnp.float32)

        def body(i, carry):
            (kv, toks, seqlens, hist, hlen, tok_buf, lp_buf, tv_buf,
             ti_buf) = carry
            live = seqlens > 0
            if step_budget is not None:
                live &= i < step_budget
            pos = jnp.maximum(seqlens - 1, 0)
            pages = jnp.take_along_axis(
                block_tables, (pos // ps)[:, None], axis=1)[:, 0]
            slots = jnp.where(live, pages * ps + pos % ps, -1)
            md = AttentionMetadata(
                token_req_idx=arange_r,
                token_pos=pos,
                slot_mapping=slots,
                query_start_loc=jnp.arange(R + 1, dtype=jnp.int32),
                # SSM: budget-frozen rows must not touch their recurrent
                # state (the mixer gates its state writes on seq_lens>0;
                # a frozen row re-feeding its held token would corrupt it)
                seq_lens=jnp.where(live, seqlens, 0)
                if self.is_ssm else seqlens,
                block_tables=block_tables,
                num_reqs=jnp.asarray(R, jnp.int32),
                num_tokens=jnp.asarray(R, jnp.int32),
                lora_slots=lora_row_slots,
                mrope_deltas=mrope_deltas,
                seg_starts=arange_r if self.is_ssm else None,
                state_slots=ex.get("state_slots"),
                decode_mode=True)
            hidden, kv = self.model.apply(params, toks, kv, md,
                                          use_pallas=self.use_pallas,
                                          lora=lora)
            logits = self.model.compute_logits(params, hidden)
            logits = self._head_lora(logits, hidden, lora, lora_row_slots)
            smd_i = (_dc.replace(smd, token_seq=hist, total_len=hlen)
                     if track_tokens else smd)
            out = sample_tokens(logits, smd_i, flags, max_logprobs,
                                step_offset=i)
            new_tok = jnp.where(live, out["tokens"], toks)
            if track_tokens:
                wpos = jnp.where(live, hlen, hist.shape[1])
                hist = hist.at[arange_r, wpos].set(new_tok, mode="drop")
                hlen = hlen + live.astype(jnp.int32)
            tok_buf = tok_buf.at[i].set(new_tok)
            lp_buf = lp_buf.at[i].set(out["logprob"])
            if max_logprobs:
                tv_buf = tv_buf.at[i].set(out["topk_values"])
                ti_buf = ti_buf.at[i].set(out["topk_indices"])
            return (kv, new_tok, seqlens + live.astype(jnp.int32),
                    hist, hlen, tok_buf, lp_buf, tv_buf, ti_buf)

        (kv_cache, _, _, _, _, tok_buf, lp_buf, tv_buf,
         ti_buf) = jax.lax.fori_loop(
            0, n_live, body,
            (kv_cache, cur_tokens, seq_lens0, smd.token_seq, smd.total_len,
             tok_buf, lp_buf, tv_buf, ti_buf))
        packed = jnp.stack([
            jax.lax.bitcast_convert_type(tok_buf, jnp.float32), lp_buf])
        if not max_logprobs:
            tv_buf = ti_buf = None
        return packed, tv_buf, ti_buf, kv_cache

    # ---------------------------------------------- window multi-step decode
    def _multi_step_window(self, params, kv_cache, flat_meta, layout, flags,
                           num_steps, max_logprobs, lora=None,
                           chain_packed=None, chain_hist=None,
                           chain_hlen=None, chain_mode=None):
        """K decode steps with a FROZEN paged cache: each step's K/V rows go
        into per-layer tail buffers updated in place in the scan carry; one
        batched scatter flushes the window into the pages at the end. This
        removes the per-step whole-cache copy the v1 path paid for scanning
        the cache through xs/ys (see ops/window_decode_attention.py).

        ``chain_packed``: the [2, R] packed output of a just-dispatched
        prefill step — the window chains off it ON DEVICE (bitcast row 0 =
        the sampled tokens), so a prefill + its whole decode window run
        back-to-back with no host round trip between them. ``chain_idx``
        (in the packed metadata) remaps chained rows when the window runs
        a SUBSET of the originating batch (per-row eligibility: grammar /
        mid-prefill rows stay single-step while the rest window).

        Token-history samplers (penalties/DRY/no-repeat-ngram) run every
        sub-step off an in-graph-appended history carry — see _multi_step."""
        import dataclasses as _dc
        _, smd, ex = self._unpack(flat_meta, layout)
        track_tokens = flags.do_penalties or flags.do_dry or flags.do_ngram
        is_chain = None
        if chain_mode == "window":
            # Continuation: feed tokens come from the PREVIOUS window's
            # last live sub-step (chain_packed = prev packed2[:, W-1, :]);
            # chain_idx maps each row to its row in the previous window
            # batch, with -1 marking host-fed joiner rows (their last
            # token is already realized on host -> cur_tokens).
            feed = jax.lax.bitcast_convert_type(chain_packed[0], jnp.int32)
            chain_idx = ex["chain_idx"]
            is_chain = chain_idx >= 0
            safe_idx = jnp.clip(chain_idx, 0)
            cur_tokens = jnp.where(is_chain, jnp.take(feed, safe_idx),
                                   ex["cur_tokens"])
        elif chain_packed is not None:
            cur_tokens = jax.lax.bitcast_convert_type(chain_packed[0],
                                                      jnp.int32)
            chain_idx = ex.get("chain_idx")
            if chain_idx is not None:
                cur_tokens = jnp.take(cur_tokens, chain_idx)
        else:
            cur_tokens = ex["cur_tokens"]
        seq_lens0 = ex["seq_lens0"]
        block_tables = ex["block_tables"]
        step_budget = ex.get("step_budget")
        lora_row_slots = ex.get("lora_rows")
        mrope_deltas = ex.get("mrope_deltas")
        # Runtime step count (see _multi_step): one program, zero idle
        # whole-batch sub-steps.
        n_live = ex["num_live_steps"].reshape(())
        model = self.model
        R = cur_tokens.shape[0]
        ps = self.block_size
        L = model.num_layers
        kvh = model.num_kv_heads
        hd_c = kv_cache.shape[-1]
        arange_r = jnp.arange(R, dtype=jnp.int32)
        paged_lens = jnp.maximum(seq_lens0 - 1, 0)
        live0 = seq_lens0 > 0
        tail_dtype = (jnp.bfloat16 if self.kv_dtype in
                      (jnp.float8_e4m3, jnp.float8_e5m2) else self.kv_dtype)
        tk0 = jnp.zeros((L, R, kvh, num_steps, hd_c), tail_dtype)
        tv0 = jnp.zeros((L, R, kvh, num_steps, hd_c), tail_dtype)
        tok_buf = jnp.zeros((num_steps, R), jnp.int32)
        lp_buf = jnp.zeros((num_steps, R), jnp.float32)
        if max_logprobs:
            tv_buf = jnp.zeros((num_steps, R, max_logprobs), jnp.float32)
            ti_buf = jnp.zeros((num_steps, R, max_logprobs), jnp.int32)
        else:
            tv_buf = ti_buf = jnp.zeros((0,), jnp.float32)

        hist0, hlen0 = smd.token_seq, smd.total_len
        if track_tokens and chain_mode == "window":
            # Continuation: chain rows' host-built history is stale by the
            # in-flight tokens, but the previous window RETURNED its final
            # history carry — merge it in-graph (rows remapped by
            # chain_idx; joiner rows keep their fresh host history, which
            # already contains their last token). The feed token is NOT
            # re-appended: the previous window appended it at its last
            # sub-step.
            if chain_hist is not None:
                L_new = hist0.shape[1]
                L_prev = chain_hist.shape[1]
                prev = chain_hist
                if L_prev < L_new:
                    prev = jnp.concatenate(
                        [prev, jnp.full((prev.shape[0], L_new - L_prev),
                                        self.model.vocab_size, jnp.int32)],
                        axis=1)
                elif L_prev > L_new:
                    prev = prev[:, :L_new]
                safe_idx = jnp.clip(ex["chain_idx"], 0)
                hist0 = jnp.where(is_chain[:, None],
                                  jnp.take(prev, safe_idx, axis=0), hist0)
                hlen0 = jnp.where(is_chain,
                                  jnp.take(chain_hlen, safe_idx), hlen0)
        elif track_tokens and chain_packed is not None:
            # The chained (prefill-sampled) token is not in the host-built
            # history — append it in-graph before the first window step.
            wpos0 = jnp.where(live0, hlen0, hist0.shape[1])
            hist0 = hist0.at[arange_r, wpos0].set(cur_tokens, mode="drop")
            hlen0 = hlen0 + live0.astype(jnp.int32)

        def body(i, carry):
            tk, tv, toks, hist, hlen, tok_buf, lp_buf, tv_buf, ti_buf = carry
            live = live0
            if step_budget is not None:
                live = live & (i < step_budget)
            pos = paged_lens + i
            md = AttentionMetadata(
                token_req_idx=arange_r,
                token_pos=pos,
                slot_mapping=jnp.full((R,), -1, jnp.int32),
                query_start_loc=jnp.arange(R + 1, dtype=jnp.int32),
                seq_lens=jnp.where(live0, pos + 1, 0),
                block_tables=block_tables,
                num_reqs=jnp.asarray(R, jnp.int32),
                num_tokens=jnp.asarray(R, jnp.int32),
                lora_slots=lora_row_slots,
                mrope_deltas=mrope_deltas,
                decode_mode=True,
                window_step=i,
                paged_lens=paged_lens,
                shared_pages=ex.get("shared_pages"),
                shared_len=ex.get("shared_len"))
            hidden, (_, tk, tv) = model.apply(
                params, toks, (kv_cache, tk, tv), md,
                use_pallas=self.use_pallas, lora=lora)
            logits = model.compute_logits(params, hidden)
            logits = self._head_lora(logits, hidden, lora, lora_row_slots)
            smd_i = (_dc.replace(smd, token_seq=hist, total_len=hlen)
                     if track_tokens else smd)
            out = sample_tokens(logits, smd_i, flags, max_logprobs,
                                step_offset=i)
            new_tok = jnp.where(live, out["tokens"], toks)
            if track_tokens:
                wpos = jnp.where(live, hlen, hist.shape[1])
                hist = hist.at[arange_r, wpos].set(new_tok, mode="drop")
                hlen = hlen + live.astype(jnp.int32)
            tok_buf = tok_buf.at[i].set(new_tok)
            lp_buf = lp_buf.at[i].set(out["logprob"])
            if max_logprobs:
                tv_buf = tv_buf.at[i].set(out["topk_values"])
                ti_buf = ti_buf.at[i].set(out["topk_indices"])
            return (tk, tv, new_tok, hist, hlen, tok_buf, lp_buf, tv_buf,
                    ti_buf)

        (tk, tv, _, hist_f, hlen_f, tok_buf, lp_buf, tv_buf,
         ti_buf) = jax.lax.fori_loop(
            0, n_live, body,
            (tk0, tv0, cur_tokens, hist0, hlen0, tok_buf, lp_buf, tv_buf,
             ti_buf))

        # ---- flush the window tails into the paged cache -----------------
        # Element-indexed scatter, deliberately: the window's (page, off)
        # indices are affine per request, and XLA lowers this scatter to
        # an efficient form — measured 1.86 ms per 64-step window at 8B
        # geometry (0.03 ms/sub-step; benchmarks/step_lab.py flush A/B).
        # A page-granular gather/merge/scatter variant (write_kv_staged
        # style) was benched 15x SLOWER here (28.6 ms/window): with only
        # K rows changed per page, re-writing whole pages moves ~17x the
        # bytes. The staged-write design wins at prefill (every row of
        # every touched page is new), not at window flush.
        j = jnp.arange(num_steps, dtype=jnp.int32)
        abs_pos = paged_lens[:, None] + j[None, :]            # [R, K]
        valid = live0[:, None] & (j[None, :] < n_live)
        if step_budget is not None:
            valid = valid & (j[None, :] < step_budget[:, None])
        pages = jnp.take_along_axis(block_tables, abs_pos // ps, axis=1)
        num_pages = kv_cache.shape[1]
        pf = jnp.where(valid, pages, num_pages).reshape(-1)    # drop sentinel
        of = (abs_pos % ps).reshape(-1)
        # tails [L, R, kvh, K, hd] -> values [R*K, L, kvh, hd] (advanced
        # indices on non-adjacent dims broadcast to the front).
        val_k = tk.transpose(1, 3, 0, 2, 4).reshape(R * num_steps, L, kvh,
                                                    hd_c)
        val_v = tv.transpose(1, 3, 0, 2, 4).reshape(R * num_steps, L, kvh,
                                                    hd_c)
        kv_cache = kv_cache.at[:, pf, 0, :, of, :].set(
            val_k.astype(kv_cache.dtype), mode="drop")
        kv_cache = kv_cache.at[:, pf, 1, :, of, :].set(
            val_v.astype(kv_cache.dtype), mode="drop")

        packed = jnp.stack([
            jax.lax.bitcast_convert_type(tok_buf, jnp.float32), lp_buf])
        if not max_logprobs:
            tv_buf = ti_buf = None
        if not track_tokens:
            hist_f = hlen_f = None
        return packed, tv_buf, ti_buf, kv_cache, hist_f, hlen_f

    # ------------------------------------------------------- KV page transfer
    def extract_pages(self, page_ids: list[int]) -> np.ndarray:
        """Gather KV pages to host (disaggregated-prefill producer side):
        -> [L, n, 2, kvh, page, hd] in the cache dtype's bit pattern
        (fp8 ships as raw uint8)."""
        if self.is_ssm:
            raise ValueError("KV transfer is not supported for recurrent/"
                             "hybrid-state models")
        pages = self.kv_cache[:, np.asarray(page_ids, np.int32)]
        if self.kv_dtype in (jnp.float8_e4m3, jnp.float8_e5m2):
            pages = jax.lax.bitcast_convert_type(pages, jnp.uint8)
        elif self.kv_dtype == jnp.bfloat16:
            pages = jax.lax.bitcast_convert_type(pages, jnp.uint16)
        return np.asarray(pages)

    def seed_pages(self, page_ids: list[int], data: np.ndarray) -> None:
        """Write received KV pages into the local cache (consumer side)."""
        pages = jnp.asarray(data)
        if pages.dtype != jnp.dtype(self.kv_dtype):
            pages = jax.lax.bitcast_convert_type(pages, self.kv_dtype)
        self.kv_cache = self.kv_cache.at[
            :, np.asarray(page_ids, np.int32)].set(pages)

    # ------------------------------------------------------------- multimodal
    def _mrope_state(self, st: RequestState):
        if st.mrope_table is None:
            from aphrodite_tpu.models.qwen2_vl import mrope_positions
            spans = st.mm.spans if st.mm is not None else []
            grids = None
            if st.mm is not None and getattr(st.mm, "extra", None):
                grids = st.mm.extra.get("grid_thw")
            st.mrope_table, st.mrope_delta = mrope_positions(
                st.prompt_len, spans, grids,
                getattr(self.model, "mrope_merge_size", 2))
        return st.mrope_table, st.mrope_delta

    def _mm_embeds(self, st: RequestState):
        """Encoder outputs: shared budgeted cross-request cache keyed by
        MMInputs.content_hash() — the same image in two requests encodes
        once, and preemption does not force a re-encode (reference:
        aphrodite/v1/core/encoder_cache_manager.py). Falls back to the
        per-request slot for uncacheable payloads."""
        if st.mm_embeds is not None:
            return st.mm_embeds
        key = st.mm.content_hash() if st.mm is not None else None
        cached = self.encoder_cache.get(key)
        if cached is not None:
            st.mm_embeds = cached
            return cached
        try:
            return self._mm_embeds_compute(st, key)
        except Exception as e:
            from aphrodite_tpu.utils import PerRequestError
            if isinstance(e, PerRequestError):
                raise
            raise PerRequestError(
                st.req_id,
                f"multimodal encoder failed for request {st.req_id}: "
                f"{type(e).__name__}: {e}") from e

    def _mm_embeds_compute(self, st: RequestState, key):
        pv = np.asarray(st.mm.pixel_values)
        if getattr(self.model, "mm_needs_extra", False):
            # Variable-token encoders (Qwen2-VL, BART-style text
            # encoders): the model jits per static signature;
            # embeddings come back as the flat concat in span order.
            enc = getattr(self.model, "encode_media", None) \
                or self.model.encode_images
            st.mm_embeds = enc(self.params, jnp.asarray(pv),
                               **(st.mm.extra or {}))
        elif getattr(st.mm, "is_embeddings", False):
            # Soft prompts: the payload already IS the embedding rows.
            st.mm_embeds = jnp.asarray(
                pv, self.params["embed"].dtype).reshape(
                    -1, self.model.hidden_size)
        else:
            N = pv.shape[0]
            N_pad = next_power_of_2(N)
            if N_pad != N:
                pv = np.concatenate(
                    [pv, np.zeros((N_pad - N,) + pv.shape[1:], pv.dtype)])
            if not hasattr(self, "_encode_fn"):
                enc = getattr(self.model, "encode_audio", None) \
                    or self.model.encode_images
                self._encode_fn = jax.jit(enc)
            flat = self._encode_fn(self.params, jnp.asarray(pv))
            per_img = flat.shape[0] // N_pad
            st.mm_embeds = flat[:N * per_img]
        self.encoder_cache.put(key, st.mm_embeds)
        return st.mm_embeds

    def _build_mm_arg(self, so: SchedulerOutput, order, seg_starts, T_pad):
        """Gather the image-embedding rows covered by this step's scheduled
        token ranges + their scatter targets in the padded batch (pad rows
        scatter to T_pad and drop)."""
        if not getattr(self.model, "is_multimodal", False) and \
                not any(self.requests[rid].mm is not None for rid in order):
            return None
        if getattr(self.model, "mm_kind", "scatter") == "cross_attn":
            # Encoder-decoder: every step cross-attends, so ship the whole
            # batch's encoder states [R_pad, S, D] + per-request valid
            # lengths (Whisper states are full-length; BART-style text
            # encoders vary, padded up to a pow2 bucket).
            S_fixed = getattr(self.model, "mm_rows_per_item", None)
            R_pad = len(seg_starts)
            lens = np.zeros((R_pad,), np.int32)
            rows = {}
            for r, rid in enumerate(order):
                st = self.requests[rid]
                if st.mm is not None:
                    emb = self._mm_embeds(st)
                    if S_fixed is not None:
                        emb = emb[:S_fixed]
                    rows[r] = emb
                    lens[r] = int(emb.shape[0])
            if not rows:
                return None
            S = S_fixed if S_fixed is not None else \
                next_power_of_2(max(int(m) for m in lens))
            D = self.model.hidden_size
            dtype = self.params["embed"].dtype
            zero = None
            stack = []
            for r in range(R_pad):
                emb = rows.get(r)
                if emb is None:
                    if zero is None:
                        zero = jnp.zeros((S, D), dtype)
                    stack.append(zero)
                elif emb.shape[0] != S:
                    stack.append(jnp.concatenate(
                        [emb, jnp.zeros((S - emb.shape[0], D), emb.dtype)]))
                else:
                    stack.append(emb)
            return jnp.stack(stack), lens
        pieces, idx_parts = [], []
        for r, rid in enumerate(order):
            st = self.requests[rid]
            if st.mm is None or st.num_computed >= st.prompt_len:
                continue
            start = st.num_computed
            n = so.num_scheduled_tokens[rid]
            base = 0
            for off, ln in st.mm.spans:
                lo, hi = max(off, start), min(off + ln, start + n)
                if lo < hi:
                    emb = self._mm_embeds(st)
                    pieces.append(emb[base + lo - off:base + hi - off])
                    t0 = int(seg_starts[r]) + (lo - start)
                    idx_parts.append(np.arange(t0, t0 + hi - lo, dtype=np.int32))
                base += ln
        if not pieces:
            return None
        M = sum(int(p.shape[0]) for p in pieces)
        M_pad = next_power_of_2(max(M, 8))
        embeds = jnp.concatenate(pieces) if len(pieces) > 1 else pieces[0]
        if M_pad != M:
            embeds = jnp.concatenate(
                [embeds, jnp.zeros((M_pad - M, embeds.shape[1]),
                                   embeds.dtype)])
        idx = np.full((M_pad,), T_pad, np.int32)
        if M:
            idx[:M] = np.concatenate(idx_parts)
        return embeds, idx

    def pending_drafts_map(self) -> dict[str, list[int]]:
        """Draft-model proposals from the last step ({} without a draft)."""
        return self.draft.pending_drafts if self.draft is not None else {}

    # --------------------------------------------------------- state updates
    def update_states(self, so: SchedulerOutput) -> None:
        for rid in so.finished_req_ids:
            self.requests.pop(rid, None)
            if self.is_ssm:
                slot = self._slot_of.pop(rid, None)
                if slot is not None:
                    self._free_slots.append(slot)
        cr = so.scheduled_cached_reqs
        for i, rid in enumerate(cr.req_ids):
            st = self.requests.get(rid)
            if cr.resumed_from_preemption[i] or st is None:
                assert cr.all_token_ids[i] is not None
                self.requests[rid] = RequestState(
                    req_id=rid,
                    token_ids=list(cr.all_token_ids[i]),
                    prompt_len=(st.prompt_len if st else
                                len(cr.all_token_ids[i])),
                    num_computed=cr.num_computed_tokens[i],
                    block_ids=list(cr.new_block_ids[i]),
                    sampling_params=st.sampling_params if st else None,
                    mm=st.mm if st else None)
            else:
                st.block_ids.extend(cr.new_block_ids[i])
                st.num_computed = cr.num_computed_tokens[i]
        for nr in so.scheduled_new_reqs:
            self.requests[nr.req_id] = RequestState(
                req_id=nr.req_id,
                token_ids=list(nr.prompt_token_ids),
                prompt_len=len(nr.prompt_token_ids),
                num_computed=nr.num_computed_tokens,
                block_ids=list(nr.block_ids),
                sampling_params=nr.sampling_params,
                lora_name=nr.lora_name,
                mm=getattr(nr, "mm_inputs", None))

    # ------------------------------------------------------------------ fork
    def fork_request_state(self, parent_id: str, child_id: str,
                           block_ids: list[int], last_token: int,
                           tail_copy=None) -> None:
        """Beam fork: clone the parent's runner state with the diverging
        last (not-yet-fed) token and the child's block table; device-copy
        the partially-written tail KV page when the fork happened
        mid-block."""
        p = self.requests[parent_id]
        self.requests[child_id] = RequestState(
            req_id=child_id,
            token_ids=p.token_ids[:-1] + [int(last_token)],
            prompt_len=p.prompt_len,
            num_computed=p.num_computed,
            block_ids=list(block_ids),
            sampling_params=p.sampling_params,
            lora_name=p.lora_name,
            mm=p.mm, mm_embeds=p.mm_embeds)
        if tail_copy is not None:
            src, dst = tail_copy
            if not hasattr(self, "_copy_page_fn"):
                def _copy(kv, src, dst):
                    return jax.tree.map(
                        lambda c: c.at[:, dst].set(c[:, src]), kv)
                self._copy_page_fn = jax.jit(_copy, donate_argnums=(0,))
            self.kv_cache = self._copy_page_fn(
                self.kv_cache, jnp.asarray(src, jnp.int32),
                jnp.asarray(dst, jnp.int32))

    # ------------------------------------------------------------- execution
    def execute_model(self, so: SchedulerOutput) -> ModelRunnerOutput:
        self.update_states(so)
        if so.total_num_scheduled_tokens == 0:
            return ModelRunnerOutput(req_ids=[], sampled_token_ids=[])
        if getattr(so, "is_continuation", False):
            return self._execute_continuation(
                so, list(so.num_scheduled_tokens.keys()))

        from aphrodite_tpu.attention.metadata import Q_SEGMENT_ALIGN

        order = list(so.num_scheduled_tokens.keys())
        R = len(order)
        R_pad = pick_bucket(self.req_buckets, R)

        # ---- sampling metadata (host-side packing, shared by both paths) --
        from aphrodite_tpu.sample.metadata import build_sampling_arrays
        reqs_meta = []
        max_logprobs = 0
        for rid in order:
            st = self.requests[rid]
            p = st.sampling_params
            reqs_meta.append((p, st.token_ids, st.prompt_len, st.output_len))
            if p.logprobs:
                max_logprobs = max(max_logprobs, p.logprobs)
        # +1 slack so a decode window (up to multi_step_decode appends,
        # plus the chained prefill token) fits in the token history.
        smd_arrays, flags = build_sampling_arrays(
            reqs_meta, self.model.vocab_size, R_pad,
            base_seed=self._base_seed,
            extra_len=self.config.tpu_config.multi_step_decode + 1)
        max_lp = next_power_of_2(max_logprobs) if max_logprobs else 0

        num_steps, step_budgets = self._multi_step_eligibility(
            so, order, flags)
        if num_steps > 1:
            return self._execute_multi_step(so, order, R, R_pad, smd_arrays,
                                            flags, max_lp, num_steps,
                                            step_budgets)

        # Each request's q segment is aligned so the Pallas kernel's dynamic
        # q DMA offsets satisfy Mosaic's sublane alignment.
        align = Q_SEGMENT_ALIGN if self.use_pallas else 1
        T = 0
        for rid in order:
            T = round_up(T, align) + so.num_scheduled_tokens[rid]
        T_pad = pick_bucket(self.token_buckets, T)

        input_ids = np.zeros((T_pad,), np.int32)
        token_req = np.zeros((T_pad,), np.int32)
        token_pos = np.zeros((T_pad,), np.int32)
        slots = np.full((T_pad,), -1, np.int32)
        qsl = np.zeros((R_pad + 1,), np.int32)
        seq_lens = np.zeros((R_pad,), np.int32)
        block_tables = np.zeros((R_pad, self.max_pages_per_req), np.int32)

        seg_starts = np.zeros((R_pad,), np.int32)
        t = 0
        samples_expected: list[bool] = []
        for r, rid in enumerate(order):
            st = self.requests[rid]
            n = so.num_scheduled_tokens[rid]
            start = st.num_computed
            t = round_up(t, align)
            seg_starts[r] = t
            drafts = so.scheduled_spec_decode_tokens.get(rid)
            all_toks = (st.token_ids + list(drafts)) if drafts \
                else st.token_ids
            toks = all_toks[start:start + n]
            input_ids[t:t + len(toks)] = toks
            token_req[t:t + n] = r
            token_pos[t:t + n] = np.arange(start, start + n)
            from aphrodite_tpu._native import fill_slots
            fill_slots(slots, t, start, n,
                       np.asarray(st.block_ids, np.int32), self.block_size)
            t += n
            # qsl[r+1] marks the END of request r's segment (the last-token
            # gather reads qsl[1:]-1); segments may have alignment gaps.
            qsl[r + 1] = t
            seq_lens[r] = start + n
            nb = len(st.block_ids)
            block_tables[r, :nb] = st.block_ids
            samples_expected.append(start + n >= st.num_tokens)
        qsl[R + 1:] = t

        fields = {
            "input_ids": input_ids,
            "md_token_req_idx": token_req,
            "md_token_pos": token_pos,
            "md_slot_mapping": slots,
            "md_query_start_loc": qsl,
            "md_seq_lens": seq_lens,
            "md_block_tables": block_tables,
            "md_num_reqs": np.asarray(R, np.int32),
            "md_num_tokens": np.asarray(T, np.int32),
        }
        block_q = None
        if self.use_pallas:
            from aphrodite_tpu.attention.metadata import build_work_items
            block_q = min(self._block_q_cap, T_pad)
            seg_counts = qsl[1:R + 1] - seg_starts[:R]
            items = build_work_items(seg_starts, seg_counts, seq_lens, R,
                                     T_pad, block_q, R_pad)
            fields.update({"md_" + k: v for k, v in items.items()})
            pp = getattr(self.model, "pp_size", 1)
            if pp > 1:
                # Per-microbatch work items so attention inside the
                # pipeline shard_map takes the Pallas kernel too.
                from aphrodite_tpu.attention.metadata import (
                    build_pp_work_items)
                M = min(getattr(self.model, "pp_microbatches", 4), T_pad)
                while T_pad % M:
                    M -= 1
                block_q = min(self._block_q_cap, T_pad // M)
                pos0s = seq_lens[:R] - seg_counts[:R]
                fields.update({
                    "md_" + k: v for k, v in build_pp_work_items(
                        seg_starts, seg_counts, pos0s, R, T_pad, M,
                        block_q, R_pad).items()})
        if not self.is_ssm and getattr(self.model, "supports_staged_kv_write",
                                       False):
            from aphrodite_tpu.attention.metadata import build_kv_stage
            sp, ss = build_kv_stage(slots, T_pad, R_pad, self.block_size,
                                    self.config.cache_config.num_blocks)
            fields["md_stage_pages"] = sp
            fields["md_stage_src"] = ss

        spec_k = self.spec_k if so.scheduled_spec_decode_tokens else 0
        if spec_k:
            # Per-verification-row sampling metadata: row j of request r
            # samples output position out_len + j - (k - m_r).
            reqs2 = []
            for rid in order:
                st = self.requests[rid]
                m = len(so.scheduled_spec_decode_tokens.get(rid, ()))
                for j in range(spec_k + 1):
                    reqs2.append((st.sampling_params, st.token_ids,
                                  st.prompt_len,
                                  max(st.output_len + j - (spec_k - m), 0)))
            smd_arrays, flags = build_sampling_arrays(
                reqs2, self.model.vocab_size, R_pad * (spec_k + 1),
                base_seed=self._base_seed)
            max_lp = 0
            # Per-row draft token for in-graph rejection/typical acceptance
            # (sample/sampler.py spec_draft): row (k-m)+i verifies draft i.
            draft_rows = np.full((R_pad * (spec_k + 1),), -1, np.int32)
            for r, rid in enumerate(order):
                drafts = so.scheduled_spec_decode_tokens.get(rid, ())
                m = len(drafts)
                for i, dt in enumerate(drafts):
                    draft_rows[r * (spec_k + 1) + (spec_k - m) + i] = dt
            fields["spec_draft"] = draft_rows

        lora_arg = None
        if self.lora_manager is not None and self.lora_manager.slots:
            lora_slots = np.zeros((T_pad,), np.int32)
            for r, rid in enumerate(order):
                st = self.requests[rid]
                if st.lora_name:
                    slot = self.lora_manager.slot_of(st.lora_name)
                    a, b = seg_starts[r], qsl[r + 1]
                    lora_slots[a:b] = slot
            fields["md_lora_slots"] = lora_slots
            lora_arg = self.lora_manager.device_tensors

        if self.is_ssm:
            fields["md_state_slots"] = self._ssm_state_slots(order, R_pad)
            fields["md_seg_starts"] = seg_starts

        if getattr(self.model, "needs_bidir_mm", False):
            span_lists = []
            for rid in order:
                st = self.requests[rid]
                span_lists.append(st.mm.spans if st.mm is not None else [])
            maxM = max((len(s) for s in span_lists), default=0)
            if maxM:
                M = next_power_of_2(max(maxM, 2))
                arr = np.full((R_pad, M, 2), -1, np.int32)
                for r, spans in enumerate(span_lists):
                    for j, (off, ln) in enumerate(spans):
                        arr[r, j] = (off, off + ln)
                fields["md_mm_bidir_spans"] = arr

        if getattr(self.model, "uses_mrope", False):
            mpos = np.zeros((3, T_pad), np.int32)
            for r, rid in enumerate(order):
                st = self.requests[rid]
                n = so.num_scheduled_tokens[rid]
                start = st.num_computed
                a = int(seg_starts[r])
                table, delta = self._mrope_state(st)
                p_end = min(st.prompt_len, start + n)
                if start < p_end:
                    mpos[:, a:a + p_end - start] = table[:, start:p_end]
                if start + n > p_end:
                    # Decode positions resume at start (>= p_end once the
                    # prompt is fully computed).
                    k0 = max(p_end - start, 0)
                    dec = np.arange(start + k0, start + n,
                                    dtype=np.int32) + delta
                    mpos[:, a + k0:a + n] = dec
            fields["md_mrope_pos"] = mpos

        mm_arg = self._build_mm_arg(so, order, seg_starts, T_pad)
        if mm_arg is not None:
            # (device embeddings, host index/lens): the index rides the
            # packed transfer, the embeddings stay a device arg.
            mm_dev, mm_second = mm_arg
            fields["mm_idx"] = np.asarray(mm_second, np.int32)
            mm_arg = mm_dev

        if so.grammar_bitmask is not None:
            W = so.grammar_bitmask.shape[1]
            full = np.full((R_pad, W), 0xFFFFFFFF, np.uint32)
            for rid, row in so.structured_output_request_ids.items():
                r = order.index(rid)
                full[r] = so.grammar_bitmask[row]
            fields["grammar_mask"] = full

        # ---- prompt logprobs targets -------------------------------------
        has_plp = False
        plp_k = 0
        plp_reqs = [rid for rid in order
                    if self.requests[rid].sampling_params.prompt_logprobs
                    is not None
                    and self.requests[rid].num_computed
                    < self.requests[rid].prompt_len]
        if plp_reqs and not spec_k:
            targets = np.zeros((T_pad,), np.int32)
            for r, rid in enumerate(order):
                st = self.requests[rid]
                n = so.num_scheduled_tokens[rid]
                a = seg_starts[r]
                for j in range(n):
                    pos = st.num_computed + j + 1
                    if pos < st.num_tokens:
                        targets[a + j] = st.token_ids[pos]
                plp_k = max(plp_k, st.sampling_params.prompt_logprobs or 0)
            fields["plp_targets"] = targets
            has_plp = True
            plp_k = next_power_of_2(plp_k) if plp_k else 0

        fields.update({"s_" + k: v for k, v in smd_arrays.items()})
        from aphrodite_tpu.worker.meta_pack import pack_meta
        flat, layout = pack_meta(fields)

        need_sample = (any(samples_expected) or has_plp
                       or so.grammar_bitmask is not None)
        need_hidden = self.draft is not None and self.draft.needs_hidden
        packed, topk_v_d, topk_i_d, self.kv_cache, plp_d, hidden_d = \
            self._step_fn(
                self.params, self.kv_cache, jnp.asarray(flat),
                layout, flags, max_lp, spec_k, plp_k, need_sample,
                need_hidden, block_q, lora_arg, mm_arg)

        def _host_md():
            # Device-side AttentionMetadata for the draft proposer (runs a
            # second forward outside the packed step).
            extra = {}
            if self.use_pallas:
                extra = {k: jnp.asarray(v) for k, v in items.items()}
                extra["block_q"] = block_q
            return AttentionMetadata(
                token_req_idx=jnp.asarray(token_req),
                token_pos=jnp.asarray(token_pos),
                slot_mapping=jnp.asarray(slots),
                query_start_loc=jnp.asarray(qsl),
                seq_lens=jnp.asarray(seq_lens),
                block_tables=jnp.asarray(block_tables),
                num_reqs=jnp.asarray(R, jnp.int32),
                num_tokens=jnp.asarray(T, jnp.int32), **extra)

        # Encoder-cache eviction: scatter-merged embeddings are only
        # consumed during prefill; drop them once every prompt token is
        # computed (pixel values stay in the state for preemption-
        # recompute). Cross-attn models keep states until the request ends.
        if mm_arg is not None and \
                getattr(self.model, "mm_kind", "scatter") == "scatter":
            for rid in order:
                st = self.requests[rid]
                if st.mm_embeds is not None and st.num_computed \
                        + so.num_scheduled_tokens[rid] >= st.prompt_len:
                    st.mm_embeds = None

        if not need_sample:
            if self.draft is not None:
                # Keep the draft KV in lockstep through chunked prefill.
                self.draft.ingest_only(input_ids, _host_md(), hidden=hidden_d,
                                       host_qsl=qsl,
                                       host_seg_starts=seg_starts,
                                       num_reqs=R)
            return ModelRunnerOutput(req_ids=order,
                                     sampled_token_ids=[[] for _ in order])

        if not spec_k and not has_plp and need_sample:
            fused = self._maybe_fused_window(
                so, order, R, R_pad, flags, samples_expected, packed,
                topk_v_d, topk_i_d, max_lp)
            if fused is not None:
                return fused

        if has_plp:
            chosen_h = np.asarray(plp_d[0])
            tv_h = np.asarray(plp_d[1]) if plp_d[1] is not None else None
            ti_h = np.asarray(plp_d[2]) if plp_d[2] is not None else None
            for r, rid in enumerate(order):
                st = self.requests[rid]
                if st.sampling_params.prompt_logprobs is None:
                    continue
                if st.prompt_lp is None:
                    st.prompt_lp = [None]  # first prompt token
                n = so.num_scheduled_tokens[rid]
                a = seg_starts[r]
                k_req = st.sampling_params.prompt_logprobs
                for j in range(n):
                    pos = st.num_computed + j + 1
                    if pos >= st.prompt_len:
                        break
                    d = {int(st.token_ids[pos]): float(chosen_h[a + j])}
                    if k_req and tv_h is not None:
                        for v, i in zip(tv_h[a + j][:k_req],
                                        ti_h[a + j][:k_req]):
                            d[int(i)] = float(v)
                    st.prompt_lp.append(d)

        if (self.async_mode and not spec_k and not has_plp
                and self.draft is None and self.use_graph_multi_step):
            # (use_graph_multi_step is cleared when a host-side ngram
            # proposer is active: it must see realized tokens every step,
            # so those waves stay synchronous.)
            # Async single-step: defer the d2h sync into a PendingStep so
            # the engine keeps dispatching (a prefill wave finishing while
            # a decode-window chain is live must not stall the pipeline —
            # its rows host-join the chain after this realizes).
            states2 = [self.requests[rid] for rid in order]
            ec = {rid: (1 if samples_expected[r] else 0)
                  for r, rid in enumerate(order)}
            for r in range(len(order)):
                states2[r].inflight += ec[order[r]]
            packed_d = packed

            def realize_single() -> ModelRunnerOutput:
                for r in range(len(order)):
                    states2[r].inflight -= ec[order[r]]
                return self._finish_single_step(
                    order, states2, samples_expected, packed_d, max_lp,
                    topk_v_d, topk_i_d)

            from aphrodite_tpu.core.sched_output import PendingStep
            return PendingStep(req_ids=list(order), expected_counts=ec,
                               realize=realize_single)

        packed = np.asarray(packed)  # single d2h

        if spec_k:
            tok2 = packed[0].view(np.int32)[:R * (spec_k + 1)].reshape(
                R, spec_k + 1)
            sampled = []
            for r, rid in enumerate(order):
                st = self.requests[rid]
                if not samples_expected[r]:
                    sampled.append([])
                    continue
                drafts = list(so.scheduled_spec_decode_tokens.get(rid, ()))
                m = len(drafts)
                cand = tok2[r, spec_k - m:]
                emitted = []
                for j in range(m):
                    emitted.append(int(cand[j]))
                    if int(cand[j]) != drafts[j]:
                        break
                else:
                    emitted.append(int(cand[m]))  # all accepted: bonus token
                sampled.append(emitted)
                st.token_ids.extend(emitted)
            if self.draft is not None:
                self.draft.observe_and_propose(order, R_pad, input_ids, _host_md(),
                                               samples_expected,
                                               hidden=hidden_d,
                                               host_qsl=qsl,
                                               host_seg_starts=seg_starts,
                                               host_slots=slots)
            return ModelRunnerOutput(req_ids=order,
                                     sampled_token_ids=sampled)
        out = self._finish_single_step(
            order, [self.requests[rid] for rid in order], samples_expected,
            packed, max_lp, topk_v_d, topk_i_d)
        if self.draft is not None:
            self.draft.observe_and_propose(order, R_pad, input_ids, _host_md(),
                                           samples_expected, hidden=hidden_d,
                                           host_qsl=qsl,
                                           host_seg_starts=seg_starts,
                                           host_slots=slots)
        return out

    def _finish_single_step(self, order, states, samples_expected,
                            packed_dev, max_lp, topk_v_d, topk_i_d
                            ) -> ModelRunnerOutput:
        """Host-side tail of a single-sample step: d2h fetch + per-request
        token/logprob assembly. ``states`` is captured at dispatch time —
        by (async) realize time the scheduler may have purged finished
        requests from self.requests."""
        R = len(order)
        packed = np.asarray(packed_dev)
        tokens_host = packed[0, :R].view(np.int32)
        lp_host = packed[1, :R]
        topk_v = (np.asarray(topk_v_d[:R]) if max_lp else None)
        topk_i = (np.asarray(topk_i_d[:R]) if max_lp else None)

        sampled: list[list[int]] = []
        logprobs_out: list[Optional[list[dict[int, float]]]] = []
        any_lp = False
        for r, rid in enumerate(order):
            st = states[r]
            if samples_expected[r]:
                tok = int(tokens_host[r])
                sampled.append([tok])
                st.token_ids.append(tok)
                p = st.sampling_params
                if p.logprobs is not None:
                    d = {tok: float(lp_host[r])}
                    if p.logprobs and topk_v is not None:
                        for v, i in zip(topk_v[r][:p.logprobs],
                                        topk_i[r][:p.logprobs]):
                            d[int(i)] = float(v)
                    logprobs_out.append([d])
                    any_lp = True
                else:
                    logprobs_out.append(None)
            else:
                sampled.append([])
                logprobs_out.append(None)

        prompt_lps = {}
        for r, rid in enumerate(order):
            if samples_expected[r] and states[r].prompt_lp is not None:
                prompt_lps[rid] = states[r].prompt_lp
        return ModelRunnerOutput(
            req_ids=list(order),
            sampled_token_ids=sampled,
            logprobs=logprobs_out if any_lp else None,
            prompt_logprobs=prompt_lps or None)

    # ---------------------------------------------------------------- pooling
    def embed(self, token_lists: list[list[int]], pooling: str = "last"):
        """One-shot pooled forward for embedding requests (no persistent
        paged KV needed). pooling: "last" | "mean"."""
        from aphrodite_tpu.attention.backend import kv_cache_shape
        from aphrodite_tpu.attention.metadata import (Q_SEGMENT_ALIGN,
                                                      build_work_items)
        model = self.model
        outs = []
        align = Q_SEGMENT_ALIGN if self.use_pallas else 1
        max_b = 8
        for start in range(0, len(token_lists), max_b):
            chunk = token_lists[start:start + max_b]
            R = len(chunk)
            R_pad = pick_bucket(self.req_buckets, R)
            total = sum(round_up(len(tl), align) for tl in chunk)
            T_pad = pick_bucket(self.token_buckets, total)
            ids = np.zeros((T_pad,), np.int32)
            token_req = np.zeros((T_pad,), np.int32)
            token_pos = np.zeros((T_pad,), np.int32)
            slots = np.full((T_pad,), -1, np.int32)
            qsl = np.zeros((R_pad + 1,), np.int32)
            seq_lens = np.zeros((R_pad,), np.int32)
            seg_starts = np.zeros((R_pad,), np.int32)
            npages = cdiv(max((len(tl) for tl in chunk), default=1),
                          self.block_size)
            bt = np.zeros((R_pad, npages + 1), np.int32)
            t = 0
            page = 1
            for r, tl in enumerate(chunk):
                t = round_up(t, align)
                seg_starts[r] = t
                pg = list(range(page, page + cdiv(len(tl),
                                                  self.block_size)))
                page += len(pg)
                bt[r, :len(pg)] = pg
                for i, tokid in enumerate(tl):
                    ids[t] = tokid
                    token_req[t] = r
                    token_pos[t] = i
                    slots[t] = pg[i // self.block_size] * self.block_size \
                        + i % self.block_size
                    t += 1
                qsl[r + 1] = t
                seq_lens[r] = len(tl)
            qsl[R + 1:] = t
            extra = {}
            if self.use_pallas:
                blk_q = min(self._block_q_cap, T_pad)
                items = build_work_items(
                    seg_starts, qsl[1:R_pad + 1] - seg_starts[:R_pad],
                    seq_lens, R, T_pad, blk_q, R_pad)
                extra = {k: jnp.asarray(v) for k, v in items.items()}
                extra["block_q"] = blk_q
            md = AttentionMetadata(
                token_req_idx=jnp.asarray(token_req),
                token_pos=jnp.asarray(token_pos),
                slot_mapping=jnp.asarray(slots),
                query_start_loc=jnp.asarray(qsl),
                seq_lens=jnp.asarray(seq_lens),
                block_tables=jnp.asarray(bt),
                num_reqs=jnp.asarray(R, jnp.int32),
                num_tokens=jnp.asarray(t, jnp.int32),
                **extra)
            kv = jnp.zeros(
                kv_cache_shape(page + 1, self.block_size,
                               model.num_kv_heads, model.head_dim,
                               pad_head_dim=self.use_pallas)[0:5],
                self.kv_dtype)
            kv = jnp.broadcast_to(kv, (model.num_layers,) + kv.shape).copy()
            hidden, _ = jax.jit(model.apply, static_argnames=("use_pallas",)
                                )(self.params, jnp.asarray(ids), kv, md,
                                  use_pallas=self.use_pallas)
            hidden = np.asarray(hidden.astype(jnp.float32))
            for r, tl in enumerate(chunk):
                seg = hidden[seg_starts[r]:seg_starts[r] + len(tl)]
                outs.append(seg.mean(0) if pooling == "mean" else seg[-1])
        return outs

    def _detect_shared_prefix(self, order, min_plen: int):
        """(shared page ids, shared token count) when EVERY request in the
        batch has the same leading block ids (prefix caching dedups them
        physically) — the cascade path then attends those pages once per
        sub-step for the whole batch. None when not worthwhile."""
        if len(order) < 2:
            return None
        tables = [self.requests[rid].block_ids for rid in order]
        first = tables[0]
        k = min(len(t) for t in tables)
        k = min(k, min_plen // self.block_size)
        n = 0
        while n < k and all(t[n] == first[n] for t in tables):
            n += 1
        if n < 4:  # a short shared prefix is not worth the extra pass
            return None
        pages = list(first[:n])
        pad = next_power_of_2(len(pages))  # stable jit layouts
        pages += [0] * (pad - len(pages))
        return pages, n * self.block_size

    # ------------------------------------------------ fused prefill + window
    def _maybe_fused_window(self, so, order, R, R_pad, flags,
                            samples_expected, packed_dev, topk_v_d,
                            topk_i_d, max_lp):
        """After a step, chain a decode window off the still-in-flight
        step ON DEVICE (chain_packed) for every ELIGIBLE row: one wave =
        one combined dispatch + one window dispatch + ONE sync.
        Eligibility is PER-ROW: grammar rows (their FSM advances on host
        per token) and mid-prefill chunked rows keep their single-step
        result while every other row windows — one guided-decoding
        request no longer reverts the whole engine to ~35 ms/step
        single-step decode, and a wave that mixes prefill chunks with
        decodes windows its decode rows (the online-serving hot case).
        Penalty/DRY/no-repeat-ngram rows DO window: the token history
        rides the window's scan carry (see _multi_step_window; reference
        bar: the full sampler runs every sub-step,
        aphrodite/worker/multi_step_model_runner.py:482-520). The
        scheduler needs no changes — lookahead slots already cover the
        window's KV, and update_from_output already advances num_computed
        for multi-token results. Returns None when no row is eligible
        (the caller falls through to the normal tail)."""
        if (self.draft is not None or self.is_ssm
                or not self.use_window_decode
                or not self.use_graph_multi_step
                or so.scheduled_spec_decode_tokens):
            return None
        K_cap = self.config.tpu_config.multi_step_decode
        if K_cap <= 1:
            return None
        group = self._window_group
        if (group is not None and self._chain_depth > 0
                and not any(rid in group["rows"] for rid in order)):
            # A live window chain exists for OTHER rows (this wave is a
            # prefill finishing while the batch decodes). Don't chain a
            # tiny window for just these rows — that would REPLACE the
            # group and strand the chain. The wave realizes async
            # (single-step PendingStep) and its rows host-join the big
            # group's next continuation wave instead.
            return None
        grammar_ids = (set(so.structured_output_request_ids)
                       if so.grammar_bitmask is not None else set())
        win_rows = [r for r, rid in enumerate(order)
                    if samples_expected[r] and rid not in grammar_ids]
        if not win_rows:
            return None
        max_len = self.config.scheduler_config.max_model_len
        W_cap = K_cap
        budgets = []
        for r in win_rows:
            st = self.requests[order[r]]
            b = max_len - (st.num_tokens + 1)
            mt = st.sampling_params.max_tokens
            if mt is not None:
                b = min(b, mt - (st.output_len + 1))
            if not st.sampling_params.ignore_eos:
                W_cap = min(W_cap, 16)
            budgets.append(max(b, 0))
        # Lookahead slots cover positions up to prompt+lookahead-1; the
        # window writes up to prompt+W-1, so W may not exceed lookahead.
        W = min(W_cap, max(budgets), self.config.max_lookahead_tokens)
        if W < 1:
            return None
        order_w = [order[r] for r in win_rows]
        win_map = {r: w for w, r in enumerate(win_rows)}
        Rw = len(order_w)
        Rw_pad = pick_bucket(self.req_buckets, Rw)

        from aphrodite_tpu.sample.metadata import build_sampling_arrays
        from aphrodite_tpu.worker.meta_pack import pack_meta
        reqs_meta = [(self.requests[rid].sampling_params,
                      self.requests[rid].token_ids,
                      self.requests[rid].prompt_len,
                      self.requests[rid].output_len + 1) for rid in order_w]
        wmax_lp = 0
        for rid in order_w:
            lp = self.requests[rid].sampling_params.logprobs
            if lp:
                wmax_lp = max(wmax_lp, lp)
        wmax_lp = next_power_of_2(wmax_lp) if wmax_lp else 0
        smd_arrays, wflags = build_sampling_arrays(
            reqs_meta, self.model.vocab_size, Rw_pad,
            base_seed=self._base_seed, extra_len=K_cap + 1)
        seq_lens0 = np.zeros((Rw_pad,), np.int32)
        block_tables = np.zeros((Rw_pad, self.max_pages_per_req), np.int32)
        budget_arr = np.zeros((Rw_pad,), np.int32)
        for w, rid in enumerate(order_w):
            st = self.requests[rid]
            seq_lens0[w] = st.num_tokens + 1
            block_tables[w, :len(st.block_ids)] = st.block_ids
            budget_arr[w] = min(budgets[w], W)
        fields = {"seq_lens0": seq_lens0, "block_tables": block_tables,
                  "step_budget": budget_arr,
                  "num_live_steps": np.asarray(W, np.int32)}
        # Always emit chain_idx (identity when the window covers the whole
        # batch): a present/absent key changes the packed layout, which is
        # a STATIC jit arg — wave-composition noise would otherwise compile
        # a fresh program variant per (subset?, bucket) combination.
        chain_idx = np.zeros((Rw_pad,), np.int32)
        chain_idx[:Rw] = win_rows
        fields["chain_idx"] = chain_idx
        shared = self._detect_shared_prefix(
            order_w, int(seq_lens0[:Rw].min()) - 1)
        if shared is not None:
            fields["shared_pages"] = np.asarray(shared[0], np.int32)
            fields["shared_len"] = np.asarray(shared[1], np.int32)
        lora_arg = None
        if self.lora_manager is not None and self.lora_manager.slots:
            rows = np.zeros((Rw_pad,), np.int32)
            for w, rid in enumerate(order_w):
                nm = self.requests[rid].lora_name
                if nm:
                    rows[w] = self.lora_manager.slot_of(nm)
            fields["lora_rows"] = rows
            lora_arg = self.lora_manager.device_tensors
        if getattr(self.model, "uses_mrope", False):
            deltas = np.zeros((Rw_pad,), np.int32)
            for w, rid in enumerate(order_w):
                deltas[w] = self._mrope_state(self.requests[rid])[1]
            fields["mrope_deltas"] = deltas
        fields.update({"s_" + k: v for k, v in smd_arrays.items()})
        flat, layout = pack_meta(fields)
        packed2, topk_v2, topk_i2, self.kv_cache, hist_f, hlen_f = \
            self._multi_step_window_fn(
                self.params, self.kv_cache, jnp.asarray(flat),
                layout, wflags, K_cap, wmax_lp, lora_arg, packed_dev,
                None, None, None)

        # Capture the request-state objects now: by realize time the
        # scheduler may have (optimistically) finished these requests and
        # update_states may have popped them from self.requests.
        states = [self.requests[rid] for rid in order]
        self._register_window_group(order_w, packed2, W, hist_f, hlen_f)

        def realize() -> ModelRunnerOutput:
            p1 = np.asarray(packed_dev)          # [2, R_pad]
            p2 = np.asarray(packed2)             # [2, K_cap, Rw_pad]
            tok1 = p1[0, :R].view(np.int32)
            lp1 = p1[1, :R]
            tok_k = p2[0].view(np.int32)         # [K_cap, Rw_pad]
            lp_k = p2[1]
            tv1 = np.asarray(topk_v_d[:R]) if max_lp else None
            ti1 = np.asarray(topk_i_d[:R]) if max_lp else None
            tv2 = np.asarray(topk_v2) if wmax_lp else None
            ti2 = np.asarray(topk_i2) if wmax_lp else None

            sampled: list[list[int]] = []
            logprobs_out: list[Optional[list[dict[int, float]]]] = []
            any_lp = False
            for r, rid in enumerate(order):
                st = states[r]
                if not samples_expected[r]:
                    sampled.append([])
                    logprobs_out.append(None)
                    continue
                w = win_map.get(r)
                w_r = int(budget_arr[w]) if w is not None else 0
                toks = [int(tok1[r])]
                if w is not None:
                    toks += [int(t) for t in tok_k[:w_r, w]]
                sampled.append(toks)
                st.token_ids.extend(toks)
                p = st.sampling_params
                if p.logprobs is not None:
                    lps = []
                    d = {toks[0]: float(lp1[r])}
                    if p.logprobs and tv1 is not None:
                        for v, i2 in zip(tv1[r][:p.logprobs],
                                         ti1[r][:p.logprobs]):
                            d[int(i2)] = float(v)
                    lps.append(d)
                    for k in range(w_r):
                        d = {toks[k + 1]: float(lp_k[k, w])}
                        if p.logprobs and tv2 is not None:
                            for v, i2 in zip(tv2[k, w][:p.logprobs],
                                             ti2[k, w][:p.logprobs]):
                                d[int(i2)] = float(v)
                        lps.append(d)
                    logprobs_out.append(lps)
                    any_lp = True
                else:
                    logprobs_out.append(None)
            prompt_lps = {}
            for r, rid in enumerate(order):
                if states[r].prompt_lp is not None:
                    prompt_lps[rid] = states[r].prompt_lp
            return ModelRunnerOutput(
                req_ids=order,
                sampled_token_ids=sampled,
                logprobs=logprobs_out if any_lp else None,
                prompt_logprobs=prompt_lps or None)

        if self.async_mode:
            from aphrodite_tpu.core.sched_output import PendingStep
            ec = {}
            for r, rid in enumerate(order):
                if not samples_expected[r]:
                    ec[rid] = 0
                elif r in win_map:
                    ec[rid] = 1 + int(budget_arr[win_map[r]])
                else:
                    ec[rid] = 1
                states[r].inflight += ec[rid]
            self._chain_depth += 1

            def realize_async() -> ModelRunnerOutput:
                out = realize()
                self._chain_depth -= 1
                for r, rid in enumerate(order):
                    states[r].inflight -= ec[rid]
                return out

            return PendingStep(req_ids=list(order), expected_counts=ec,
                               realize=realize_async)
        return realize()

    def _register_window_group(self, order_w, packed2, W, hist_f,
                               hlen_f) -> None:
        """Record where the just-dispatched window's results live on device
        so the next decode window can chain off them without realizing
        (see _execute_continuation)."""
        self._window_group = {
            "rows": {rid: w for w, rid in enumerate(order_w)},
            "packed2": packed2, "W": int(W),
            "hist": hist_f, "hlen": hlen_f,
        }

    def continuation_mode(self, req) -> Optional[str]:
        """Scheduler hook (wired through EngineCore): can this RUNNING
        request be scheduled into a continuation-window wave right now?

        - "chain": its next feed token is in flight on device in the
          current window group — a new window can chain off it in-graph.
        - "join": it is decode-ready with its last token realized on host
          and can ride the same wave host-fed.
        - None: not eligible (the normal scheduling path applies).

        This is what lets online decode run at offline throughput: window
        w+1 dispatches while window w still computes, so the device never
        drains between windows (reference bar: the v1 async scheduler +
        multi-step runner overlap, aphrodite/v1/core/sched/scheduler.py
        async_scheduling)."""
        K_cap = self.config.tpu_config.multi_step_decode
        if (not self.use_window_decode or not self.async_mode
                or not self.use_graph_multi_step or K_cap <= 1
                or self.draft is not None or self.spec_k or self.is_ssm):
            return None
        st = self.requests.get(req.request_id)
        if st is None:
            return None
        p = req.sampling_params
        eff = req.num_tokens + req.num_async_pending
        if eff >= self.config.scheduler_config.max_model_len:
            return None
        if p.max_tokens is not None and \
                req.num_output_tokens + req.num_async_pending >= p.max_tokens:
            return None
        if req.num_async_pending > 0:
            group = self._window_group
            if group is None or req.request_id not in group["rows"]:
                return None
            if st.inflight != req.num_async_pending:
                # A non-window pending step is also in flight for this
                # request (shouldn't happen, but never chain off it).
                return None
            if self._chain_depth > 1:
                return None  # pipeline already 2 deep: realize first
            return "chain"
        if req.num_computed_tokens + 1 != req.num_tokens:
            return None  # mid-prefill
        if req.spec_token_ids:
            return None
        return "join"

    def _execute_continuation(self, so, order) -> "PendingStep":
        """Dispatch a decode window whose feed tokens are still in flight:
        chain rows read their first input from the previous window's device
        output (and, for token-history samplers, from its returned history
        carry); joiner rows are host-fed. One dispatch, zero host syncs —
        realize of the PREVIOUS window overlaps this window's device
        compute."""
        from aphrodite_tpu.sample.metadata import build_sampling_arrays
        from aphrodite_tpu.worker.meta_pack import pack_meta
        group = self._window_group
        assert group is not None, "continuation wave without a window group"
        K_cap = self.config.tpu_config.multi_step_decode
        max_len = self.config.scheduler_config.max_model_len
        R = len(order)
        Rw_pad = pick_bucket(self.req_buckets, R)

        chain_idx = np.full((Rw_pad,), -1, np.int32)
        cur_tokens = np.zeros((Rw_pad,), np.int32)
        seq_lens0 = np.zeros((Rw_pad,), np.int32)
        block_tables = np.zeros((Rw_pad, self.max_pages_per_req), np.int32)
        budgets = np.zeros((Rw_pad,), np.int32)
        reqs_meta = []
        W_cap = K_cap
        wmax_lp = 0
        max_eff = 1
        for w, rid in enumerate(order):
            st = self.requests[rid]
            eff = st.num_tokens + st.inflight
            eff_out = st.output_len + st.inflight
            max_eff = max(max_eff, eff)
            gi = group["rows"].get(rid)
            if gi is not None and st.inflight > 0:
                chain_idx[w] = gi
            else:
                cur_tokens[w] = st.token_ids[-1]
            seq_lens0[w] = eff
            block_tables[w, :len(st.block_ids)] = st.block_ids
            p = st.sampling_params
            b = max_len - eff
            if p.max_tokens is not None:
                b = min(b, p.max_tokens - eff_out)
            if not p.ignore_eos:
                W_cap = min(W_cap, 16)
            budgets[w] = max(b, 0)
            if p.logprobs:
                wmax_lp = max(wmax_lp, p.logprobs)
            reqs_meta.append((p, st.token_ids, st.prompt_len, eff_out))
        W = int(min(W_cap, budgets[:R].max(),
                    self.config.max_lookahead_tokens))
        assert W >= 1, "scheduler admitted a budget-0 continuation row"
        np.minimum(budgets, W, out=budgets)
        wmax_lp = next_power_of_2(wmax_lp) if wmax_lp else 0

        # history_len drives the token_seq bucket from EFFECTIVE lengths,
        # which host 0 (stale host lists + inflight) and followers
        # (realized lists) compute identically — the jitted shapes must
        # match across hosts in multi-host SPMD.
        smd_arrays, wflags = build_sampling_arrays(
            reqs_meta, self.model.vocab_size, Rw_pad,
            base_seed=self._base_seed, history_len=max_eff + K_cap + 1)
        fields = {"cur_tokens": cur_tokens, "seq_lens0": seq_lens0,
                  "block_tables": block_tables, "step_budget": budgets,
                  "num_live_steps": np.asarray(W, np.int32),
                  "chain_idx": chain_idx}
        shared = self._detect_shared_prefix(
            order, int(seq_lens0[:R].min()) - 1)
        if shared is not None:
            fields["shared_pages"] = np.asarray(shared[0], np.int32)
            fields["shared_len"] = np.asarray(shared[1], np.int32)
        lora_arg = None
        if self.lora_manager is not None and self.lora_manager.slots:
            rows = np.zeros((Rw_pad,), np.int32)
            for w, rid in enumerate(order):
                nm = self.requests[rid].lora_name
                if nm:
                    rows[w] = self.lora_manager.slot_of(nm)
            fields["lora_rows"] = rows
            lora_arg = self.lora_manager.device_tensors
        if getattr(self.model, "uses_mrope", False):
            deltas = np.zeros((Rw_pad,), np.int32)
            for w, rid in enumerate(order):
                deltas[w] = self._mrope_state(self.requests[rid])[1]
            fields["mrope_deltas"] = deltas
        fields.update({"s_" + k: v for k, v in smd_arrays.items()})
        flat, layout = pack_meta(fields)

        track = wflags.do_penalties or wflags.do_dry or wflags.do_ngram
        feed = group["packed2"][:, group["W"] - 1, :]
        chain_hist = group["hist"] if track else None
        chain_hlen = group["hlen"] if track else None
        packed2, topk_v2, topk_i2, self.kv_cache, hist_f, hlen_f = \
            self._multi_step_window_fn(
                self.params, self.kv_cache, jnp.asarray(flat),
                layout, wflags, K_cap, wmax_lp, lora_arg, feed,
                chain_hist, chain_hlen, "window")

        states = [self.requests[rid] for rid in order]
        counts = [int(budgets[w]) for w in range(R)]
        self._register_window_group(order, packed2, W, hist_f, hlen_f)
        for w in range(R):
            states[w].inflight += counts[w]
        self._chain_depth += 1

        def realize() -> ModelRunnerOutput:
            p2 = np.asarray(packed2)             # [2, K_cap, Rw_pad]
            self._chain_depth -= 1
            tok_k = p2[0].view(np.int32)
            lp_k = p2[1]
            tv2 = np.asarray(topk_v2) if wmax_lp else None
            ti2 = np.asarray(topk_i2) if wmax_lp else None
            sampled: list[list[int]] = []
            logprobs_out: list[Optional[list[dict[int, float]]]] = []
            any_lp = False
            for w, rid in enumerate(order):
                st = states[w]
                toks = [int(t) for t in tok_k[:counts[w], w]]
                sampled.append(toks)
                st.token_ids.extend(toks)
                st.inflight -= counts[w]
                p = st.sampling_params
                if p.logprobs is not None:
                    lps = []
                    for k, tok in enumerate(toks):
                        d = {tok: float(lp_k[k, w])}
                        if p.logprobs and tv2 is not None:
                            for v, i2 in zip(tv2[k, w][:p.logprobs],
                                             ti2[k, w][:p.logprobs]):
                                d[int(i2)] = float(v)
                        lps.append(d)
                    logprobs_out.append(lps)
                    any_lp = True
                else:
                    logprobs_out.append(None)
            return ModelRunnerOutput(
                req_ids=list(order),
                sampled_token_ids=sampled,
                logprobs=logprobs_out if any_lp else None)

        from aphrodite_tpu.core.sched_output import PendingStep
        if self.async_mode:
            return PendingStep(
                req_ids=list(order),
                expected_counts={rid: counts[w]
                                 for w, rid in enumerate(order)},
                realize=realize)
        return realize()

    def _ssm_state_slots(self, order, R_pad) -> np.ndarray:
        """Assign/reuse a recurrent-state slot per request (stealing from
        preempted requests under pressure: they recompute on resume)."""
        state_slots = np.zeros((R_pad,), np.int32)
        for r, rid in enumerate(order):
            slot = self._slot_of.get(rid)
            if slot is None:
                if not self._free_slots:
                    sched = set(order)
                    victim = next(r2 for r2 in self._slot_of
                                  if r2 not in sched)
                    self._free_slots.append(self._slot_of.pop(victim))
                slot = self._free_slots.pop()
                self._slot_of[rid] = slot
            state_slots[r] = slot
        return state_slots

    # --------------------------------------------------- multi-step machinery
    def _multi_step_eligibility(self, so: SchedulerOutput, order, flags
                                ) -> int:
        """(K, budgets): K>1 when the whole batch is plain single-token
        decode. Token-history samplers (penalties/DRY/ngram) no longer
        gate this path: the scan carries the token history and reruns
        them every sub-step (see _multi_step). Grammar still falls back
        to K=1 here — its FSM advances on host — but the single-step path
        then windows the NON-grammar rows via _maybe_fused_window's
        per-row eligibility. K is sized for the LARGEST per-request
        remaining decode budget (max_tokens / max_model_len); requests
        with less budget idle in the scan past their own limit
        (step_budget masking) — idle lanes are far cheaper than extra
        ~25 ms dispatches. One jit specialization per distinct K actually
        used."""
        K_cap = self.config.tpu_config.multi_step_decode
        if K_cap <= 1 or not self.use_graph_multi_step \
                or getattr(self.model, "is_encoder_decoder", False):
            return 1, None
        if self.draft is not None:
            # The draft must ingest every token to stay in lockstep; the
            # multi-step scan samples K tokens without a draft ingest.
            return 1, None
        if so.scheduled_spec_decode_tokens or so.grammar_bitmask is not None:
            return 1, None
        max_len = self.config.scheduler_config.max_model_len
        budgets = []
        for rid in order:
            st = self.requests[rid]
            if so.num_scheduled_tokens[rid] != 1:
                return 1, None
            if st.num_computed + 1 != st.num_tokens:
                return 1, None
            b = max_len - st.num_tokens
            mt = st.sampling_params.max_tokens
            if mt is not None:
                # This step's token counts toward max_tokens too.
                b = min(b, mt - st.output_len)
            if not st.sampling_params.ignore_eos:
                # EOS can cut generation anywhere: bound the whole-batch
                # speculation depth so post-EOS waste stays moderate.
                K_cap = min(K_cap, 16)
            budgets.append(max(b, 1))
        # Exact K: the loop bound is a RUNTIME scalar (fori_loop in
        # _multi_step/_multi_step_window), so one compiled program (buffer
        # cap = tpu_config.multi_step_decode) serves every window length —
        # a 49-step budget runs as ONE 49-sub-step dispatch with zero idle
        # whole-batch sub-steps and no K=1 remainder dispatch.
        K = min(K_cap, max(budgets))
        if K < 2:
            return 1, None
        return K, budgets

    def _execute_multi_step(self, so: SchedulerOutput, order, R, R_pad,
                            smd_arrays, flags, max_lp, num_steps,
                            step_budgets=None) -> ModelRunnerOutput:
        from aphrodite_tpu.worker.meta_pack import pack_meta
        cur_tokens = np.zeros((R_pad,), np.int32)
        seq_lens0 = np.zeros((R_pad,), np.int32)
        block_tables = np.zeros((R_pad, self.max_pages_per_req), np.int32)
        for r, rid in enumerate(order):
            st = self.requests[rid]
            cur_tokens[r] = st.token_ids[-1]
            seq_lens0[r] = st.num_tokens
            block_tables[r, :len(st.block_ids)] = st.block_ids
        # Static buffer cap (one jit program); actual sub-step count rides
        # the packed metadata as a runtime scalar.
        K_cap = self.config.tpu_config.multi_step_decode
        fields = {"cur_tokens": cur_tokens, "seq_lens0": seq_lens0,
                  "block_tables": block_tables,
                  "num_live_steps": np.asarray(num_steps, np.int32)}
        if self.use_window_decode:
            shared = self._detect_shared_prefix(
                order, int(seq_lens0[:R].min()) - 1)
            if shared is not None:
                fields["shared_pages"] = np.asarray(shared[0], np.int32)
                fields["shared_len"] = np.asarray(shared[1], np.int32)
        if step_budgets is not None:
            budgets = np.full((R_pad,), num_steps, np.int32)
            budgets[:R] = np.minimum(step_budgets, num_steps)
            fields["step_budget"] = budgets
        if self.is_ssm:
            fields["state_slots"] = self._ssm_state_slots(order, R_pad)

        lora_arg = None
        if self.lora_manager is not None and self.lora_manager.slots:
            rows = np.zeros((R_pad,), np.int32)
            for r, rid in enumerate(order):
                nm = self.requests[rid].lora_name
                if nm:
                    rows[r] = self.lora_manager.slot_of(nm)
            fields["lora_rows"] = rows
            lora_arg = self.lora_manager.device_tensors
        if getattr(self.model, "uses_mrope", False):
            deltas = np.zeros((R_pad,), np.int32)
            for r, rid in enumerate(order):
                deltas[r] = self._mrope_state(self.requests[rid])[1]
            fields["mrope_deltas"] = deltas
        fields.update({"s_" + k: v for k, v in smd_arrays.items()})
        flat, layout = pack_meta(fields)
        if self.use_window_decode:
            packed_dev, topk_v_d, topk_i_d, self.kv_cache, hist_f, hlen_f = \
                self._multi_step_window_fn(
                    self.params, self.kv_cache, jnp.asarray(flat),
                    layout, flags, K_cap, max_lp, lora_arg, None,
                    None, None, None)
            self._register_window_group(order, packed_dev, num_steps,
                                        hist_f, hlen_f)
        else:
            packed_dev, topk_v_d, topk_i_d, self.kv_cache = \
                self._multi_step_fn(
                    self.params, self.kv_cache, jnp.asarray(flat),
                    layout, flags, K_cap, max_lp, lora_arg)

        states = [self.requests[rid] for rid in order]
        counts = [num_steps if step_budgets is None
                  else min(step_budgets[r], num_steps)
                  for r in range(len(order))]

        def realize() -> ModelRunnerOutput:
            packed = np.asarray(packed_dev)  # [2, K, R_pad], single d2h
            tokens_k = packed[0, :, :R].view(np.int32)  # [K, R]
            lp_k = packed[1, :, :R]
            topk_v = np.asarray(topk_v_d[:, :R]) if max_lp else None
            topk_i = np.asarray(topk_i_d[:, :R]) if max_lp else None

            sampled: list[list[int]] = []
            logprobs_out: list[Optional[list[dict[int, float]]]] = []
            any_lp = False
            for r, rid in enumerate(order):
                st = states[r]
                toks = [int(t) for t in tokens_k[:counts[r], r]]
                sampled.append(toks)
                st.token_ids.extend(toks)
                p = st.sampling_params
                if p.logprobs is not None:
                    lps = []
                    for k, tok in enumerate(toks):
                        d = {tok: float(lp_k[k, r])}
                        if p.logprobs and topk_v is not None:
                            for v, i in zip(topk_v[k, r][:p.logprobs],
                                            topk_i[k, r][:p.logprobs]):
                                d[int(i)] = float(v)
                        lps.append(d)
                    logprobs_out.append(lps)
                    any_lp = True
                else:
                    logprobs_out.append(None)
            return ModelRunnerOutput(
                req_ids=order,
                sampled_token_ids=sampled,
                logprobs=logprobs_out if any_lp else None)

        if self.async_mode and self.use_window_decode:
            from aphrodite_tpu.core.sched_output import PendingStep
            ec = {rid: counts[r] for r, rid in enumerate(order)}
            for r, rid in enumerate(order):
                states[r].inflight += counts[r]
            self._chain_depth += 1

            def realize_async() -> ModelRunnerOutput:
                out = realize()
                self._chain_depth -= 1
                for r, rid in enumerate(order):
                    states[r].inflight -= counts[r]
                return out

            return PendingStep(req_ids=list(order), expected_counts=ec,
                               realize=realize_async)
        return realize()
