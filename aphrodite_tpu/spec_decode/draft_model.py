"""Draft-model speculative decoding: a small target-vocabulary model runs in
lockstep with the target and proposes K greedy tokens per decode step.

Parity: the reference's v0 draft-model `MultiStepWorker`
(aphrodite/spec_decode/multi_step_worker.py) + `SpecDecodeWorker` proposer
machinery, redesigned for the TPU runner: instead of a separate worker
process with its own scheduler interactions, the draft is a second pure
model owned by the ModelRunner with its own paged KV buffer that SHARES the
scheduler's block tables (same block_size / page indices, draft-sized pages).
Each engine step the draft (1) ingests exactly the tokens the target was
scheduled (keeping its KV in sync, including chunked prefill), and (2) runs
a K-step greedy `lax.scan` from the freshly sampled target token — one
device dispatch producing [K, R] proposals.

Greedy (deterministic) proposals make sample-and-match verification exactly
equivalent to rejection sampling with a one-hot draft distribution: each
emitted token is an exact sample from the target distribution, so the
output distribution is unbiased for any sampler mix.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from aphrodite_tpu.attention.metadata import AttentionMetadata
from aphrodite_tpu.utils import logger


class DraftModelRunner:
    """Owns the draft model, its params and its paged KV cache."""

    # Eagle-style proposers set True: the runner then returns the target's
    # hidden states (on device) alongside the sampled tokens.
    needs_hidden = False

    def __init__(self, config, draft_model, draft_params, runner) -> None:
        self.model = draft_model
        self.params = draft_params
        self.runner = runner
        self.k = config.speculative_config.num_speculative_tokens
        self.max_model_len = config.scheduler_config.max_model_len
        self.block_size = config.cache_config.block_size
        cc = config.cache_config
        from aphrodite_tpu.attention.backend import kv_cache_shape
        shape = (draft_model.num_layers,) + kv_cache_shape(
            cc.num_blocks, cc.block_size, draft_model.num_kv_heads,
            draft_model.head_dim, pad_head_dim=runner.use_pallas)
        self.kv = jnp.zeros(shape, runner.kv_dtype)
        logger.info("draft KV cache: %s (%.2f GiB)", shape,
                    np.prod(shape) * jnp.dtype(runner.kv_dtype).itemsize
                    / 2**30)
        self._fn = jax.jit(self._ingest_and_propose, donate_argnums=(1,),
                           static_argnames=("num_steps",))
        self._ingest_fn = jax.jit(
            lambda params, kv, ids, md: self.model.apply(
                params, ids, kv, md, use_pallas=runner.use_pallas)[1],
            donate_argnums=(1,))
        # rid -> proposed tokens, refreshed every step; read by the engine.
        self.pending_drafts: dict[str, list[int]] = {}

    def ingest_only(self, input_ids, md, hidden=None, **ctx) -> None:
        """Pure-prefill step: sync the draft KV, nothing to propose."""
        self.kv = self._ingest_fn(self.params, self.kv,
                                  jnp.asarray(input_ids), md)
        self.pending_drafts = {}

    # ------------------------------------------------------------- jitted fn
    def _ingest_and_propose(self, params, kv, input_ids, md, cur_tokens,
                            seq_lens0, block_tables, num_steps):
        """Ingest this step's scheduled tokens (same metadata as the target
        step), then scan K greedy decode steps from cur_tokens."""
        _, kv = self.model.apply(params, input_ids, kv, md,
                                 use_pallas=self.runner.use_pallas)
        R = cur_tokens.shape[0]
        ps = self.block_size
        arange_r = jnp.arange(R, dtype=jnp.int32)

        def sub(carry, _):
            kvc, toks, seqlens = carry
            live = seqlens > 0
            pos = jnp.maximum(seqlens - 1, 0)
            pages = jnp.take_along_axis(
                block_tables, (pos // ps)[:, None], axis=1)[:, 0]
            slots = jnp.where(live, pages * ps + pos % ps, -1)
            md2 = AttentionMetadata(
                token_req_idx=arange_r,
                token_pos=pos,
                slot_mapping=slots,
                query_start_loc=jnp.arange(R + 1, dtype=jnp.int32),
                seq_lens=seqlens,
                block_tables=block_tables,
                num_reqs=jnp.asarray(R, jnp.int32),
                num_tokens=jnp.asarray(R, jnp.int32),
                decode_mode=True)
            hidden, kvc = self.model.apply(params, toks, kvc, md2,
                                           use_pallas=self.runner.use_pallas)
            logits = self.model.compute_logits(params, hidden)
            new = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (kvc, new, seqlens + live.astype(jnp.int32)), new

        (kv, _, _), toks_k = jax.lax.scan(
            sub, (kv, cur_tokens, seq_lens0), None, length=num_steps)
        return toks_k, kv  # [K, R]

    # ------------------------------------------------------------- host side
    def observe_and_propose(self, order, R_pad, input_ids, md,
                            samples_expected, hidden=None, **ctx) -> None:
        """Called by the runner after the target step (token_ids already
        extended with accepted tokens). Proposals land in pending_drafts."""
        requests = self.runner.requests
        cur = np.zeros((R_pad,), np.int32)
        seq0 = np.zeros((R_pad,), np.int32)
        bt = np.zeros((R_pad, self.runner.max_pages_per_req), np.int32)
        eligible = []
        for r, rid in enumerate(order):
            st = requests[rid]
            bt[r, :len(st.block_ids)] = st.block_ids
            ok = (samples_expected[r]
                  and st.num_tokens + self.k <= self.max_model_len
                  and len(st.block_ids) * self.block_size
                  >= st.num_tokens + self.k)
            eligible.append(ok)
            if ok:
                cur[r] = st.token_ids[-1]
                seq0[r] = st.num_tokens
        if not any(eligible):
            self.ingest_only(input_ids, md)
            return
        toks_k, self.kv = self._fn(
            self.params, self.kv, jnp.asarray(input_ids), md,
            jnp.asarray(cur), jnp.asarray(seq0), jnp.asarray(bt),
            num_steps=self.k)
        toks_k = np.asarray(toks_k)  # [K, R_pad]
        self.pending_drafts = {
            rid: [int(t) for t in toks_k[:, r]]
            for r, rid in enumerate(order) if eligible[r]}
