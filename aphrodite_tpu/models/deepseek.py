"""DeepSeek V2/V3: multi-head latent attention (MLA) + DeepSeek-MoE.

Behavioral parity: aphrodite/modeling/models/deepseek_v2.py (attention
:185-320, MoE gate/experts :120-178) and the MLA backend idea of
aphrodite/v1/attention/backends/mla/common.py — redesigned for the TPU
paged-KV layout instead of ported.

TPU-native MLA design: the decode-time "matrix absorption" trick is the
*only* path (prefill included). Queries are projected into the KV latent
space once per layer (``q_latent = q_nope @ W_UK``), so attention runs as
**MQA with a single 576-wide latent head**:

    K = concat(c_kv, k_pe)        (what MLA caches anyway)
    V = concat(c_kv, 0)           (value IS the latent; rope lanes zero)
    scores = q_latent . c_kv + q_pe . k_pe   == full MLA scores

which drops straight onto the existing paged cache layout
``[P, 2, kvh=1, page, R+rope]`` and both Pallas attention kernels with no
kernel changes — per-token cache cost is 2*(512+64) entries instead of the
reference GPU path's per-head K/V. The attention output is the latent
context; ``W_UV`` and ``o_proj`` unproject it after the kernel.

Layer heterogeneity (first_k_dense_replace dense layers, then MoE) is
handled as contiguous scan *runs*: one ``lax.scan`` per run of same-kind
layers, with the KV cache segment written back via dynamic_update_slice so
the donated buffer stays in place.
"""
from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.attention import (AttentionMetadata, paged_attention,
                                     write_kv)
from aphrodite_tpu.layers.common import rms_norm
from aphrodite_tpu.layers.linear import apply_linear
from aphrodite_tpu.layers.rotary import (RopeConfig, apply_rope,
                                         apply_rope_interleaved,
                                         compute_cos_sin, compute_inv_freq,
                                         deepseek_yarn_mscale,
                                         longrope_orig_max)
from aphrodite_tpu.models.llama import LlamaForCausalLM


class DeepseekV2ForCausalLM(LlamaForCausalLM):
    """Also DeepSeek-V2-Lite (q_lora_rank=None, greedy routing)."""

    router_style = "v2"  # softmax scores, greedy/group_limited_greedy
    rope_interleaved = True     # DeepSeek ropes the pe dims pair-interleaved

    @property
    def _window_forward_ok(self) -> bool:
        """MLA takes the window-decode path: latent K/V rows ride the tail
        buffers, attention runs the frozen-cache window kernel as 1-head
        MQA (VERDICT r2 #6)."""
        return type(self).apply is DeepseekV2ForCausalLM.apply
    embedding_multiplier = 1.0  # muP knobs (MiniCPM3)
    residual_multiplier = 1.0
    logits_multiplier = 1.0
    _longrope_orig_max = None

    def __init__(self, config):
        hf = config.text_config
        # The base init builds a rope for the latent head_dim; mask the
        # scaling dict while it runs (its factor vectors are sized for
        # qk_rope_head_dim — we rebuild the real rope below).
        saved_scaling = getattr(hf, "rope_scaling", None)
        hf.rope_scaling = None
        try:
            super().__init__(config)
        finally:
            hf.rope_scaling = saved_scaling
        self.q_lora_rank = getattr(hf, "q_lora_rank", None)
        self.kv_lora_rank = hf.kv_lora_rank
        self.qk_nope_head_dim = hf.qk_nope_head_dim
        self.qk_rope_head_dim = hf.qk_rope_head_dim
        self.qk_head_dim = self.qk_nope_head_dim + self.qk_rope_head_dim
        self.v_head_dim = hf.v_head_dim
        # Latent-MQA cache geometry (config.py mirrors this for sizing).
        self.num_kv_heads = 1
        self.head_dim = self.kv_lora_rank + self.qk_rope_head_dim

        # Softmax scale: qk_head_dim^-0.5, times the deepseek-yarn
        # mscale_all_dim^2 correction (reference deepseek_v2.py:264-277).
        self.scale = self.qk_head_dim ** -0.5
        scaling = getattr(hf, "rope_scaling", None)
        if scaling:
            scaling = dict(scaling)
            scaling["rope_type"] = "deepseek_yarn"
            m = deepseek_yarn_mscale(scaling.get("factor", 1.0),
                                     float(scaling.get("mscale_all_dim", 0.)))
            self.scale = self.scale * m * m
        self.rope = RopeConfig(
            head_dim=self.qk_rope_head_dim,
            rotary_dim=self.qk_rope_head_dim,
            base=getattr(hf, "rope_theta", 10000.0),
            max_position=getattr(hf, "max_position_embeddings", 2048),
            scaling=scaling,
        )
        inv_freq, mscale = compute_inv_freq(self.rope)
        self._inv_freq = jnp.asarray(inv_freq)
        self._rope_mscale = mscale

        # MoE geometry.
        self.num_experts = getattr(hf, "n_routed_experts", None)
        self.top_k = getattr(hf, "num_experts_per_tok", None)
        self.moe_intermediate_size = getattr(hf, "moe_intermediate_size",
                                             None)
        self.n_shared = getattr(hf, "n_shared_experts", None) or 0
        self.n_group = getattr(hf, "n_group", None)
        self.topk_group = getattr(hf, "topk_group", None)
        self.topk_method = getattr(hf, "topk_method", "noaux_tc"
                                   if self.router_style == "v3" else "greedy")
        self.norm_topk = getattr(hf, "norm_topk_prob", False)
        self.routed_scaling = getattr(hf, "routed_scaling_factor", 1.0)
        first_dense = getattr(hf, "first_k_dense_replace", self.num_layers
                              if self.num_experts is None else 0)
        freq = getattr(hf, "moe_layer_freq", None) or 1
        self.layer_kinds = [
            "moe" if (self.num_experts is not None and i >= first_dense
                      and i % freq == 0) else "dense"
            for i in range(self.num_layers)
        ]
        # Contiguous (kind, layer_start, layer_end, kind_start) runs.
        self.runs: list[tuple[str, int, int, int]] = []
        off = {"dense": 0, "moe": 0}
        for i, kind in enumerate(self.layer_kinds):
            if self.runs and self.runs[-1][0] == kind:
                k, s, _, ks = self.runs[-1]
                self.runs[-1] = (k, s, i + 1, ks)
            else:
                self.runs.append((kind, i, i + 1, off[kind]))
            off[kind] += 1
        self.num_dense = off["dense"]
        self.num_moe = off["moe"]

    def set_quant_config(self, qcfg) -> None:
        if qcfg.method not in ("int8", "w8a16", "fp8"):
            raise NotImplementedError(
                "DeepSeek supports int8/w8a16/fp8 quantization; packed "
                "w4a16 checkpoints (grouped scales on MLA projections) are "
                "a follow-up")
        self.quant_fmt = {"int8": "int8", "w8a16": "w8a16",
                          "fp8": "fp8"}[qcfg.method]

    def quant_targets(self) -> list[tuple[str, str]]:
        """Everything matmul-shaped except the absorbed w_uk/w_uv einsums
        (small, [R, nq, d]), norms, and routers."""
        attn = ["wkv_a", "wo"]
        attn += ["wq_a", "wq_b"] if self.q_lora_rank is not None else ["wq"]
        targets = [("layers", k) for k in attn]
        targets += [("dense_mlp", k) for k in ("w_gate", "w_up", "w_down")]
        targets += [("moe", k) for k in ("we_gate", "we_up", "we_down",
                                         "ws_gate", "ws_up", "ws_down")]
        return targets

    # ------------------------------------------------------------------ params
    def _common_shapes(self) -> dict[str, tuple]:
        H, nq = self.hidden_size, self.num_heads
        L, R = self.num_layers, self.kv_lora_rank
        rope = self.qk_rope_head_dim
        shapes = {
            "input_norm": (L, H),
            "post_norm": (L, H),
            "wkv_a": (L, H, R + rope),
            "kv_a_norm": (L, R),
            "w_uk": (L, R, nq, self.qk_nope_head_dim),
            "w_uv": (L, R, nq, self.v_head_dim),
            "wo": (L, nq * self.v_head_dim, H),
        }
        if self.q_lora_rank is not None:
            shapes.update({
                "wq_a": (L, H, self.q_lora_rank),
                "q_a_norm": (L, self.q_lora_rank),
                "wq_b": (L, self.q_lora_rank, nq * self.qk_head_dim),
            })
        else:
            shapes["wq"] = (L, H, nq * self.qk_head_dim)
        return shapes

    def _dense_shapes(self) -> dict[str, tuple]:
        H, I, Ld = self.hidden_size, self.intermediate_size, self.num_dense
        return {"w_gate": (Ld, H, I), "w_up": (Ld, H, I),
                "w_down": (Ld, I, H)}

    def _moe_shapes(self) -> dict[str, tuple]:
        H, Lm, E = self.hidden_size, self.num_moe, self.num_experts
        Im = self.moe_intermediate_size
        shapes = {
            "router": (Lm, H, E),
            "we_gate": (Lm, E, H, Im),
            "we_up": (Lm, E, H, Im),
            "we_down": (Lm, E, Im, H),
        }
        if self.router_style == "v3":
            shapes["router_bias"] = (Lm, E)
        if self.n_shared:
            Is = Im * self.n_shared
            shapes.update({"ws_gate": (Lm, H, Is), "ws_up": (Lm, H, Is),
                           "ws_down": (Lm, Is, H)})
        return shapes

    def init_dummy_params(self, rng: jax.Array) -> dict:
        def mk(key, shape, scale=0.02):
            return (scale * jax.random.normal(key, shape, jnp.float32)
                    ).astype(self.dtype)

        keys = iter(jax.random.split(rng, 128))

        def fill(shapes):
            out = {}
            for name, shape in shapes.items():
                if "norm" in name:
                    out[name] = jnp.ones(shape, self.dtype)
                elif name == "router_bias":
                    out[name] = jnp.zeros(shape, jnp.float32)
                else:
                    out[name] = mk(next(keys), shape)
            return out

        params = {
            "embed": mk(next(keys), (self.vocab_size, self.hidden_size)),
            "layers": fill(self._common_shapes()),
            "final_norm": jnp.ones((self.hidden_size,), self.dtype),
        }
        if self.num_dense:
            params["dense_mlp"] = fill(self._dense_shapes())
        if self.num_moe:
            params["moe"] = fill(self._moe_shapes())
        if not self.tie_embeddings:
            params["lm_head"] = mk(next(keys),
                                   (self.hidden_size, self.vocab_size))
        return params

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        import ml_dtypes  # noqa: F401  (registers bfloat16 with numpy)
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        common = {k: np.zeros(s, target)
                  for k, s in self._common_shapes().items()}
        dense = {k: np.zeros(s, target)
                 for k, s in self._dense_shapes().items()} \
            if self.num_dense else None
        moe = None
        if self.num_moe:
            moe = {k: np.zeros(s, np.float32 if k == "router_bias"
                               else target)
                   for k, s in self._moe_shapes().items()}
        # layer index -> position within its kind's stack
        kind_pos, off = [], {"dense": 0, "moe": 0}
        for kind in self.layer_kinds:
            kind_pos.append(off[kind])
            off[kind] += 1

        nq, R = self.num_heads, self.kv_lora_rank
        params: dict = {}
        attn_map = {  # HF suffix -> (key, transpose)
            "q_proj.weight": ("wq", True),
            "q_a_proj.weight": ("wq_a", True),
            "q_a_layernorm.weight": ("q_a_norm", False),
            "q_b_proj.weight": ("wq_b", True),
            "kv_a_proj_with_mqa.weight": ("wkv_a", True),
            "kv_a_layernorm.weight": ("kv_a_norm", False),
            "o_proj.weight": ("wo", True),
        }
        mlp_map = {"gate_proj": "gate", "up_proj": "up", "down_proj": "down"}
        for name, w in weights:
            w = np.asarray(w)
            if name == "model.embed_tokens.weight":
                params["embed"] = w.astype(target)
            elif name == "model.norm.weight":
                params["final_norm"] = w.astype(target)
            elif name == "lm_head.weight":
                if not self.tie_embeddings:
                    params["lm_head"] = w.T.astype(target)
            elif name.startswith("model.layers."):
                rest = name[len("model.layers."):]
                idx_s, sub = rest.split(".", 1)
                li = int(idx_s)
                if sub == "input_layernorm.weight":
                    common["input_norm"][li] = w.astype(target)
                elif sub == "post_attention_layernorm.weight":
                    common["post_norm"][li] = w.astype(target)
                elif sub.startswith("self_attn."):
                    suff = sub[len("self_attn."):]
                    if suff == "kv_b_proj.weight":
                        # [nq*(nope+v), R] -> [R, nq, nope+v] -> W_UK | W_UV
                        kv_b = w.T.reshape(
                            R, nq, self.qk_nope_head_dim + self.v_head_dim)
                        common["w_uk"][li] = \
                            kv_b[..., :self.qk_nope_head_dim].astype(target)
                        common["w_uv"][li] = \
                            kv_b[..., self.qk_nope_head_dim:].astype(target)
                        continue
                    mapped = attn_map.get(suff)
                    if mapped and mapped[0] in common:
                        key, tr = mapped
                        common[key][li] = (w.T if tr else w).astype(target)
                elif sub.startswith("mlp."):
                    suff = sub[len("mlp."):]
                    ki = kind_pos[li]
                    if self.layer_kinds[li] == "dense":
                        proj = suff.split(".")[0]
                        if proj in mlp_map:
                            dense["w_" + mlp_map[proj]][ki] = \
                                w.T.astype(target)
                    elif suff == "gate.weight":
                        moe["router"][ki] = w.T.astype(target)
                    elif suff == "gate.e_score_correction_bias":
                        if "router_bias" in moe:
                            moe["router_bias"][ki] = w.astype(np.float32)
                    elif suff.startswith("experts."):
                        _, ei, proj, _ = suff.split(".")
                        moe["we_" + mlp_map[proj]][ki, int(ei)] = \
                            w.T.astype(target)
                    elif suff.startswith("shared_experts."):
                        proj = suff.split(".")[1]
                        if "ws_" + mlp_map[proj] in moe:
                            moe["ws_" + mlp_map[proj]][ki] = \
                                w.T.astype(target)
        if "embed" not in params:
            raise ValueError("checkpoint missing model.embed_tokens.weight")
        params["layers"] = common
        if dense is not None:
            params["dense_mlp"] = dense
        if moe is not None:
            params["moe"] = moe
        return params

    def param_specs(self) -> dict:
        common = {
            "input_norm": P(), "post_norm": P(),
            "wkv_a": P(), "kv_a_norm": P(),
            "w_uk": P(None, None, "tp", None),
            "w_uv": P(None, None, "tp", None),
            "wo": P(None, "tp", None),
        }
        if self.q_lora_rank is not None:
            common.update({"wq_a": P(), "q_a_norm": P(),
                           "wq_b": P(None, None, "tp")})
        else:
            common["wq"] = P(None, None, "tp")
        specs = {
            "embed": P("tp", None),
            "layers": common,
            "final_norm": P(),
        }
        if self.num_dense:
            specs["dense_mlp"] = {"w_gate": P(None, None, "tp"),
                                  "w_up": P(None, None, "tp"),
                                  "w_down": P(None, "tp", None)}
        if self.num_moe:
            moe = {
                "router": P(),
                "we_gate": P(None, None, None, "tp"),
                "we_up": P(None, None, None, "tp"),
                "we_down": P(None, None, "tp", None),
            }
            if self.router_style == "v3":
                moe["router_bias"] = P()
            if self.n_shared:
                moe.update({"ws_gate": P(None, None, "tp"),
                            "ws_up": P(None, None, "tp"),
                            "ws_down": P(None, "tp", None)})
            specs["moe"] = moe
        if not self.tie_embeddings:
            specs["lm_head"] = P(None, "tp")
        return specs

    # ----------------------------------------------------------------- forward
    def _attention(self, x, lp, kvc, cos, sin, md, use_pallas,
                   window=None):
        """``window``: (frozen cache, tail_k, tail_v, layer_idx) for the
        multi-step window-decode path — the latent K/V rows go into the
        tail buffers and attention runs the frozen-cache window kernel."""
        T = x.shape[0]
        nq, R = self.num_heads, self.kv_lora_rank
        h = rms_norm(x, lp["input_norm"], self.rms_eps)
        fmt = self.quant_fmt
        if self.q_lora_rank is not None:
            q = apply_linear(h, lp["wq_a"], fmt=fmt)
            q = rms_norm(q, lp["q_a_norm"], self.rms_eps)
            q = apply_linear(q, lp["wq_b"], fmt=fmt)
        else:
            q = apply_linear(h, lp["wq"], fmt=fmt)
        q = q.reshape(T, nq, self.qk_head_dim)
        q_nope = q[..., :self.qk_nope_head_dim]
        rope_fn = apply_rope_interleaved if self.rope_interleaved \
            else apply_rope
        q_pe = rope_fn(q[..., self.qk_nope_head_dim:], cos, sin)
        kv_a = apply_linear(h, lp["wkv_a"], fmt=fmt)  # [T, R+rope]
        ckv = rms_norm(kv_a[:, :R], lp["kv_a_norm"], self.rms_eps)
        k_pe = rope_fn(kv_a[:, None, R:], cos, sin)
        # Absorb W_UK: q into the latent space.
        q_lat = jnp.einsum("thd,rhd->thr", q_nope, lp["w_uk"],
                           preferred_element_type=jnp.float32).astype(x.dtype)
        q_cat = jnp.concatenate([q_lat, q_pe], axis=-1)  # [T, nq, R+rope]
        k_cat = jnp.concatenate([ckv[:, None, :], k_pe], axis=-1)
        v_cat = jnp.concatenate(
            [ckv[:, None, :],
             jnp.zeros((T, 1, self.qk_rope_head_dim), ckv.dtype)], axis=-1)
        if window is not None:
            from aphrodite_tpu.attention.backend import (window_attention,
                                                         write_tail)
            cache, tk, tv, lidx = window
            tk = write_tail(tk, k_cat, lidx, md.window_step)
            tv = write_tail(tv, v_cat, lidx, md.window_step)
            o = window_attention(q_cat, cache, tk, tv, lidx, md,
                                 self.scale, use_pallas=use_pallas)
            kvc = (tk, tv)
        else:
            kvc = write_kv(kvc, k_cat, v_cat, md.slot_mapping)
            o = paged_attention(q_cat, kvc, md, self.scale,
                                use_pallas=use_pallas)
        o = jnp.einsum("thr,rhd->thd", o[..., :R], lp["w_uv"],
                       preferred_element_type=jnp.float32).astype(x.dtype)
        o = apply_linear(o.reshape(T, nq * self.v_head_dim), lp["wo"],
                         fmt=fmt)
        return self._sp(x + o * self.residual_multiplier), kvc

    def _route(self, h: jax.Array, mp: dict):
        """Router: HF-exact top-k expert selection (f32 score math)."""
        E, k = self.num_experts, self.top_k
        logits = jnp.dot(h.astype(jnp.float32), mp["router"]
                         .astype(jnp.float32))  # [T, E]
        if self.router_style == "v3":
            scores = jax.nn.sigmoid(logits)
            choice = scores + mp["router_bias"][None, :]
        else:
            scores = jax.nn.softmax(logits, axis=-1)
            choice = scores
        if self.n_group and self.topk_group and self.topk_group < self.n_group:
            G = self.n_group
            grouped = choice.reshape(-1, G, E // G)
            if self.router_style == "v3":  # sum of top-2 per group
                g_scores = jnp.sum(jax.lax.top_k(grouped, 2)[0], axis=-1)
            else:  # max per group
                g_scores = jnp.max(grouped, axis=-1)
            _, g_idx = jax.lax.top_k(g_scores, self.topk_group)
            g_mask = jnp.sum(
                jax.nn.one_hot(g_idx, G, dtype=jnp.float32), axis=1)  # [T, G]
            mask = jnp.repeat(g_mask, E // G, axis=-1)
            choice = jnp.where(mask > 0, choice, 0.0)
        topc, topi = jax.lax.top_k(choice, k)
        if self.router_style == "v3":
            topw = jnp.take_along_axis(scores, topi, axis=-1)
            if self.norm_topk:
                topw = topw / (jnp.sum(topw, axis=-1, keepdims=True) + 1e-20)
        else:
            topw = topc
        return topw * self.routed_scaling, topi

    def _moe_mlp(self, x: jax.Array, mp: dict) -> jax.Array:
        h = x
        topw, topi = self._route(h, mp)
        topw = topw.astype(h.dtype)

        def expert(acc, xs):
            wg, wu, wd, e = xs
            y = self.act(apply_linear(h, wg, fmt=self.quant_fmt),
                         apply_linear(h, wu, fmt=self.quant_fmt))
            y = apply_linear(y, wd, fmt=self.quant_fmt)
            gate = jnp.sum(jnp.where(topi == e, topw, 0.0), axis=-1)
            return acc + gate[:, None] * y, None

        acc, _ = jax.lax.scan(
            expert, jnp.zeros_like(h),
            (mp["we_gate"], mp["we_up"], mp["we_down"],
             jnp.arange(self.num_experts, dtype=jnp.int32)))
        if self.n_shared:
            shared = apply_linear(
                self.act(apply_linear(h, mp["ws_gate"], fmt=self.quant_fmt),
                         apply_linear(h, mp["ws_up"], fmt=self.quant_fmt)),
                mp["ws_down"], fmt=self.quant_fmt)
            acc = acc + shared
        return acc

    def apply(self, params: dict, input_ids: jax.Array, kv_cache: jax.Array,
              md: AttentionMetadata, *, use_pallas: bool = False,
              lora: dict | None = None, mm=None):
        if lora is not None:
            raise NotImplementedError("LoRA on DeepSeek: follow-up")
        if self.pp_size > 1:
            raise NotImplementedError(
                "pipeline parallelism for heterogeneous dense/MoE stacks: "
                "follow-up")
        x = jnp.take(params["embed"], input_ids, axis=0)
        if mm is not None:
            mm_embeds, mm_idx = mm
            x = x.at[mm_idx].set(mm_embeds.astype(x.dtype), mode="drop")
        if self.embedding_multiplier != 1.0:
            x = x * self.embedding_multiplier
        cos, sin = compute_cos_sin(md.token_pos, self._inv_freq,
                                   self._rope_mscale,
                                   self._longrope_orig_max)
        sl = jax.tree.map  # alias

        if isinstance(kv_cache, tuple):
            # Multi-step window decode: frozen latent cache + tails.
            cache, tail_k, tail_v = kv_cache

            def body_w(kind):
                def layer(carry, xs):
                    x, tk, tv = carry
                    (lp, mp), lidx = xs
                    x, (tk, tv) = self._attention(
                        x, lp, None, cos, sin, md, use_pallas,
                        window=(cache, tk, tv, lidx))
                    h = rms_norm(x, lp["post_norm"], self.rms_eps)
                    y = (self._moe_mlp(h, mp) if kind == "moe"
                         else self._mlp(h, mp))
                    x = self._sp(x + y * self.residual_multiplier)
                    return (x, tk, tv), None
                return layer

            carry = (x, tail_k, tail_v)
            for kind, s, e, ks in self.runs:
                ke = ks + (e - s)
                common = sl(lambda a: a[s:e], params["layers"])
                stack = sl(lambda a: a[ks:ke],
                           params["moe" if kind == "moe" else "dense_mlp"])
                carry, _ = jax.lax.scan(
                    body_w(kind), carry,
                    ((common, stack), jnp.arange(s, e)))
            x, tail_k, tail_v = carry
            x = rms_norm(x, params["final_norm"], self.rms_eps)
            return x, (cache, tail_k, tail_v)

        def body(kind):
            def layer(x, xs):
                (lp, mp), kvc = xs
                x, kvc = self._attention(x, lp, kvc, cos, sin, md,
                                         use_pallas)
                h = rms_norm(x, lp["post_norm"], self.rms_eps)
                if kind == "moe":
                    y = self._moe_mlp(h, mp)
                else:
                    y = self._mlp(h, mp)
                return self._sp(x + y * self.residual_multiplier), kvc
            return layer

        for kind, s, e, ks in self.runs:
            ke = ks + (e - s)
            common = sl(lambda a: a[s:e], params["layers"])
            stack = sl(lambda a: a[ks:ke],
                       params["moe" if kind == "moe" else "dense_mlp"])
            x, seg = jax.lax.scan(body(kind), x,
                                  ((common, stack), kv_cache[s:e]))
            kv_cache = jax.lax.dynamic_update_slice_in_dim(
                kv_cache, seg, s, axis=0)
        x = rms_norm(x, params["final_norm"], self.rms_eps)
        return x, kv_cache


class DeepseekV3ForCausalLM(DeepseekV2ForCausalLM):
    """Sigmoid router with expert-score correction bias (noaux_tc)."""

    router_style = "v3"


class MiniCPM3ForCausalLM(DeepseekV2ForCausalLM):
    """HF 'MiniCPM3ForCausalLM' (reference modeling/models/minicpm3.py):
    MLA attention (deepseek-shaped q/kv LoRA projections, minicpm3.py:46-150)
    over a dense llama MLP stack, with MiniCPM's muP scales
    (minicpm.py:340-347 residual scale_depth/sqrt(L), :397 scale_emb,
    :550 logits / (hidden_size/dim_model_base)) and neox-style rope on the
    pe dims (minicpm3.py:111-116 get_rope default), typically
    longrope-scaled."""

    rope_interleaved = False

    def __init__(self, config):
        hf = config.text_config
        super().__init__(config)
        # Undo the deepseek_yarn forcing: MiniCPM3 ropes with the config's
        # own scaling (longrope) and the plain qk_head_dim^-0.5 scale.
        self.scale = self.qk_head_dim ** -0.5
        scaling = getattr(hf, "rope_scaling", None)
        self.rope = RopeConfig(
            head_dim=self.qk_rope_head_dim,
            rotary_dim=self.qk_rope_head_dim,
            base=getattr(hf, "rope_theta", 10000.0),
            max_position=getattr(hf, "max_position_embeddings", 2048),
            scaling=dict(scaling) if scaling else None,
        )
        inv_freq, mscale = compute_inv_freq(self.rope)
        self._inv_freq = jnp.asarray(inv_freq)
        self._rope_mscale = mscale
        self._longrope_orig_max = longrope_orig_max(self.rope)
        self.embedding_multiplier = float(getattr(hf, "scale_emb", 1.0))
        depth = getattr(hf, "scale_depth", None)
        if depth:
            self.residual_multiplier = float(depth) / \
                (self.num_layers ** 0.5)
        base = getattr(hf, "dim_model_base", None)
        if base:
            self.logits_multiplier = 1.0 / (self.hidden_size / base)

    def compute_logits(self, params: dict, hidden: jax.Array) -> jax.Array:
        logits = super().compute_logits(params, hidden)
        if self.logits_multiplier != 1.0:
            logits = logits * self.logits_multiplier
        return logits
