"""EAGLE speculative decoding: a one-layer draft head that extrapolates the
target model's feature stream.

Parity: aphrodite/v1/spec_decode/eagle.py:20 (EagleProposer) + the EAGLE
speculative-head model family (SURVEY.md §2.9/appendix). The draft input at
feature position j is ``fc(concat(embed(t_{j+1}), f_j))`` where f_j is the
target's post-final-norm hidden at position j; one llama-style decoder layer
produces o_j, and target-lm-head(o_j) predicts t_{j+2}. During drafting the
head feeds its own output hidden back as the next feature (EAGLE-1
recursion). Draft logits reuse the TARGET's final norm + lm head.

TPU design: the head runs in lockstep with the target step — an ingest pass
over the scheduled tokens (shifted by one inside each request segment, so
each position stores the (feature, next-token) pair) keeps its paged KV in
sync, then a K-step greedy `lax.scan` proposes tokens. Proposals are
deterministic, so sample-and-match verification stays unbiased.

One approximation: at a chunked-prefill seam the last position of a
mid-prompt chunk pairs its feature with its OWN token (the true next token
arrives only with the next chunk). This can only lower acceptance on the
first draft after such a seam — never correctness.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from aphrodite_tpu.attention import (AttentionMetadata, paged_attention,
                                     write_kv)
from aphrodite_tpu.attention.backend import kv_cache_shape
from aphrodite_tpu.layers.common import ACT2MUL, rms_norm
from aphrodite_tpu.layers.linear import apply_linear
from aphrodite_tpu.layers.rotary import apply_rope, compute_cos_sin
from aphrodite_tpu.utils import logger


class EagleDraftHead:
    """One llama-style decoder layer over fc-fused (embed, feature) inputs.

    HF EAGLE checkpoints ship `fc.weight` ([H, 2H]), `embed_tokens.weight`
    and `layers.0.*` llama tensor names; `load_weights` maps those."""

    def __init__(self, target_model):
        t = target_model
        self.t = t
        self.hidden_size = t.hidden_size
        self.num_heads = t.num_heads
        self.num_kv_heads = t.num_kv_heads
        self.head_dim = t.head_dim
        self.num_layers = 1
        self.intermediate_size = t.intermediate_size
        self.vocab_size = t.vocab_size
        self.rms_eps = t.rms_eps
        self.scale = t.scale
        self.act = t.act
        self.dtype = t.dtype
        self._inv_freq = t._inv_freq
        self._rope_mscale = t._rope_mscale

    # ------------------------------------------------------------------ params
    def init_dummy_params(self, rng: jax.Array) -> dict:
        H, I = self.hidden_size, self.intermediate_size
        nq, nkv, hd = self.num_heads, self.num_kv_heads, self.head_dim
        keys = jax.random.split(rng, 9)

        def mk(k, shape, scale=0.02):
            return (jax.random.normal(k, shape, jnp.float32) * scale
                    ).astype(self.dtype)

        return {
            "embed": mk(keys[0], (self.vocab_size, H)),
            "fc": mk(keys[1], (2 * H, H)),
            "input_norm": jnp.ones((H,), self.dtype),
            "post_norm": jnp.ones((H,), self.dtype),
            "wq": mk(keys[2], (H, nq * hd)),
            "wk": mk(keys[3], (H, nkv * hd)),
            "wv": mk(keys[4], (H, nkv * hd)),
            "wo": mk(keys[5], (nq * hd, H)),
            "w_gate": mk(keys[6], (H, I)),
            "w_up": mk(keys[7], (H, I)),
            "w_down": mk(keys[8], (I, H)),
        }

    _NAME_MAP = {
        "embed_tokens.weight": "embed",
        "fc.weight": "fc",
        "layers.0.input_layernorm.weight": "input_norm",
        "layers.0.post_attention_layernorm.weight": "post_norm",
        "layers.0.self_attn.q_proj.weight": "wq",
        "layers.0.self_attn.k_proj.weight": "wk",
        "layers.0.self_attn.v_proj.weight": "wv",
        "layers.0.self_attn.o_proj.weight": "wo",
        "layers.0.mlp.gate_proj.weight": "w_gate",
        "layers.0.mlp.up_proj.weight": "w_up",
        "layers.0.mlp.down_proj.weight": "w_down",
    }

    def load_weights(self, weights) -> dict:
        params = {}
        for name, w in weights:
            name = name.removeprefix("model.")
            key = self._NAME_MAP.get(name)
            if key is None:
                logger.debug("eagle: skipping weight %s", name)
                continue
            w = np.asarray(w)
            if key.startswith("w") or key in ("fc",):
                w = w.T  # HF stores [out, in]
            params[key] = jnp.asarray(w, self.dtype)
        missing = set(self._NAME_MAP.values()) - set(params)
        if missing:
            raise ValueError(f"eagle checkpoint missing tensors: {missing}")
        return params

    # ----------------------------------------------------------------- forward
    def apply(self, params, input_ids, prev_hidden, kv, md,
              use_pallas=False):
        """kv: [1, pages, 2, kvh, page, hd]; returns (hidden, kv)."""
        e = jnp.take(params["embed"], input_ids, axis=0)
        x = jnp.dot(jnp.concatenate([e, prev_hidden.astype(e.dtype)], -1),
                    params["fc"], preferred_element_type=jnp.float32
                    ).astype(e.dtype)
        cos, sin = compute_cos_sin(md.token_pos, self._inv_freq,
                                   self._rope_mscale)
        nq, nkv, hd = self.num_heads, self.num_kv_heads, self.head_dim
        lp, kvc = params, kv[0]
        h = rms_norm(x, lp["input_norm"], self.rms_eps)
        T = h.shape[0]
        q = apply_linear(h, lp["wq"]).reshape(T, nq, hd)
        k = apply_linear(h, lp["wk"]).reshape(T, nkv, hd)
        v = apply_linear(h, lp["wv"]).reshape(T, nkv, hd)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        kvc = write_kv(kvc, k, v, md.slot_mapping)
        o = paged_attention(q, kvc, md, self.scale, use_pallas=use_pallas)
        x = x + apply_linear(o.reshape(T, nq * hd), lp["wo"])
        h = rms_norm(x, lp["post_norm"], self.rms_eps)
        gate = apply_linear(h, lp["w_gate"])
        up = apply_linear(h, lp["w_up"])
        x = x + apply_linear(self.act(gate, up), lp["w_down"])
        return x, kvc[None]

    def logits(self, target_params, hidden):
        """Target final-norm + lm head over the draft hidden."""
        h = rms_norm(hidden, target_params["final_norm"], self.t.rms_eps)
        return self.t.compute_logits(target_params, h)


class EagleProposer:
    """Lockstep EAGLE runner owned by the ModelRunner (same interface as
    DraftModelRunner)."""

    needs_hidden = True

    def __init__(self, config, head: EagleDraftHead, params, runner,
                 target_params) -> None:
        self.head = head
        self.params = params
        self.target_params = target_params
        self.runner = runner
        self.k = config.speculative_config.num_speculative_tokens
        self.max_model_len = config.scheduler_config.max_model_len
        self.block_size = config.cache_config.block_size
        cc = config.cache_config
        shape = (1,) + kv_cache_shape(cc.num_blocks, cc.block_size,
                                      head.num_kv_heads, head.head_dim,
                                      pad_head_dim=runner.use_pallas)
        self.kv = jnp.zeros(shape, runner.kv_dtype)
        self._ingest_fn = jax.jit(
            lambda p, kv, ids, hid, md: head.apply(
                p, ids, hid, kv, md, use_pallas=runner.use_pallas)[1],
            donate_argnums=(1,))
        self._fn = jax.jit(self._propose, donate_argnums=(1,),
                           static_argnames=("num_steps",))
        self.pending_drafts: dict[str, list[int]] = {}

    # ------------------------------------------------------------- jitted fns
    def _propose(self, params, kv, target_params, ids_shift, hidden, md,
                 cur_tokens, feat_idx, seq_lens0, block_tables, num_steps):
        """Ingest shifted (feature, next-token) pairs, then scan K greedy
        draft steps feeding the head's own hidden back as the feature."""
        _, kv = self.head.apply(params, ids_shift, hidden, kv, md,
                                use_pallas=self.runner.use_pallas)
        R = cur_tokens.shape[0]
        ps = self.block_size
        arange_r = jnp.arange(R, dtype=jnp.int32)
        feat = jnp.take(hidden, feat_idx, axis=0)  # [R, H] target features

        def sub(carry, j):
            kvc, toks, fs, seqlens = carry
            live = seqlens > 0
            # Feature position q+j pairs f with token t_{q+j+1}=toks.
            pos = jnp.maximum(seqlens - 2, 0) + j
            pages = jnp.take_along_axis(
                block_tables, (pos // ps)[:, None], axis=1)[:, 0]
            slots = jnp.where(live, pages * ps + pos % ps, -1)
            md2 = AttentionMetadata(
                token_req_idx=arange_r,
                token_pos=pos,
                slot_mapping=slots,
                query_start_loc=jnp.arange(R + 1, dtype=jnp.int32),
                seq_lens=jnp.where(live, pos + 1, 0),
                block_tables=block_tables,
                num_reqs=jnp.asarray(R, jnp.int32),
                num_tokens=jnp.asarray(R, jnp.int32),
                decode_mode=True)
            o, kvc = self.head.apply(params, toks, fs, kvc, md2,
                                     use_pallas=self.runner.use_pallas)
            logits = self.head.logits(target_params, o)
            new = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (kvc, new, o, seqlens), new

        (kv, _, _, _), toks_k = jax.lax.scan(
            sub, (kv, cur_tokens, feat, seq_lens0),
            jnp.arange(num_steps, dtype=jnp.int32))
        return toks_k, kv  # [K, R]

    # -------------------------------------------------------------- host side
    def _shift_ids(self, input_ids, host_qsl, host_seg_starts, num_reqs,
                   last_tokens=None, drop_last=None):
        """Within each request segment, ids[i] <- ids[i+1]; the final
        position takes last_tokens[r] (the fresh sample) when given, else
        its own token (chunk-seam approximation). drop_last[r] masks the
        final position's KV write instead (verified segments)."""
        ids = np.array(input_ids, copy=True)
        slot_mask = None
        for r in range(num_reqs):
            a, b = int(host_seg_starts[r]), int(host_qsl[r + 1])
            if b - a <= 0:
                continue
            ids[a:b - 1] = input_ids[a + 1:b]
            if drop_last is not None and drop_last[r]:
                if slot_mask is None:
                    slot_mask = np.zeros(len(ids), bool)
                slot_mask[b - 1] = True
            elif last_tokens is not None:
                ids[b - 1] = last_tokens[r]
        return ids, slot_mask

    def ingest_only(self, input_ids, md, hidden=None, host_qsl=None,
                    host_seg_starts=None, num_reqs=0, **ctx) -> None:
        ids, _ = self._shift_ids(input_ids, host_qsl, host_seg_starts,
                                 num_reqs)
        self.kv = self._ingest_fn(self.params, self.kv, jnp.asarray(ids),
                                  hidden, md)
        self.pending_drafts = {}

    def observe_and_propose(self, order, R_pad, input_ids, md,
                            samples_expected, hidden=None, host_qsl=None,
                            host_seg_starts=None, **ctx) -> None:
        requests = self.runner.requests
        R = len(order)
        cur = np.zeros((R_pad,), np.int32)
        seq0 = np.zeros((R_pad,), np.int32)
        feat_idx = np.zeros((R_pad,), np.int32)
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
                feat_idx[r] = host_qsl[r + 1] - 1  # target feature row q
        # Verified segments exclude their last pair from the ingest (the
        # propose scan recomputes it with the fresh sample); unsampled
        # segments keep the seam-approximated pair.
        ids, slot_mask = self._shift_ids(
            input_ids, host_qsl, host_seg_starts, R,
            drop_last=[samples_expected[r] for r in range(R)])
        md2 = md
        if slot_mask is not None:
            import dataclasses
            host_slots = ctx.get("host_slots")
            slots = (np.array(host_slots, copy=True)
                     if host_slots is not None
                     else np.asarray(md.slot_mapping))
            slots = np.where(slot_mask, -1, slots)
            md2 = dataclasses.replace(md, slot_mapping=jnp.asarray(slots))
        if not any(eligible):
            self.kv = self._ingest_fn(self.params, self.kv,
                                      jnp.asarray(ids), hidden, md2)
            self.pending_drafts = {}
            return
        toks_k, self.kv = self._fn(
            self.params, self.kv, self.target_params, jnp.asarray(ids),
            hidden, md2, jnp.asarray(cur), jnp.asarray(feat_idx),
            jnp.asarray(seq0), jnp.asarray(bt), num_steps=self.k)
        toks_k = np.asarray(toks_k)
        self.pending_drafts = {
            rid: [int(t) for t in toks_k[:, r]]
            for r, rid in enumerate(order) if eligible[r]}
