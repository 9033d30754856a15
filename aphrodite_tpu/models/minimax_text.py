"""MiniMax-Text-01: lightning (linear) attention hybrid + MoE.

Parity: aphrodite/modeling/models/minimax_text_01.py (+
modeling/layers/lightning_attn.py). ``attn_type_list`` marks each layer 0
(lightning) or 1 (softmax). Lightning attention is an unnormalized linear
attention with per-head ALiBi-style exponential decay:

    S_t = e^{-s_h} S_{t-1} + k_t v_t^T        (state [hd, hd] per head)
    o_t = q_t S_t

with q/k/v = silu(qkv_proj(x)) computed in fp32, a flat RMSNorm over the
head outputs, a sigmoid output gate from the residual stream, and out_proj.
Softmax layers are rotary GQA over the paged cache (partial rotary_dim).
Every layer's FFN is a Mixtral-style renormalized top-k MoE, optionally
mixed with a shared expert through a learned coefficient (softmax/sigmoid
``shared_moe_mode``). Residuals use the alpha/beta layernorm scaling knobs
(+ optional postnorm residual source).

State cache: lightning layers keep a per-slot [nh, hd, hd] fp32 state (the
SSM slot machinery); softmax layers use paged KV. Decode steps update all
requests' states in one vectorized einsum; ragged prefill runs a
sequential-scan fallback (a chunked Pallas lightning kernel is the
documented perf follow-up).
"""
from __future__ import annotations

import math
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.attention import (AttentionMetadata, paged_attention,
                                     write_kv)
from aphrodite_tpu.attention.backend import kv_cache_shape
from aphrodite_tpu.config import ModelConfig
from aphrodite_tpu.layers.common import rms_norm, silu_and_mul
from aphrodite_tpu.layers.rotary import apply_rope


def _alibi_slopes(n: int) -> np.ndarray:
    def pow2(k):
        start = 2.0 ** (-(2.0 ** -(math.log2(k) - 3)))
        return [start * (start ** i) for i in range(k)]
    if math.log2(n).is_integer():
        s = pow2(n)
    else:
        k = 2 ** math.floor(math.log2(n))
        s = pow2(k) + pow2(2 * k)[0::2][: n - k]
    return np.asarray(s, np.float64)


class MiniMaxText01ForCausalLM:

    is_ssm = True
    is_hybrid = True
    pp_size = 1
    mesh = None
    sequence_parallel = False
    quant_fmt = None
    expert_parallel = False

    def __init__(self, config: ModelConfig):
        self.config = config
        hf = config.text_config
        from aphrodite_tpu.utils import jax_dtype
        self.dtype = jax_dtype(config.dtype)
        self.hidden_size = hf.hidden_size
        self.num_layers = hf.num_hidden_layers
        self.vocab_size = hf.vocab_size
        self.intermediate_size = hf.intermediate_size
        self.rms_eps = getattr(hf, "rms_norm_eps", 1e-5)
        self.tie_embeddings = getattr(hf, "tie_word_embeddings", False)
        self.num_heads = hf.num_attention_heads
        self.num_kv_heads = getattr(hf, "num_key_value_heads",
                                    hf.num_attention_heads)
        self.head_dim = getattr(hf, "head_dim",
                                hf.hidden_size // hf.num_attention_heads)
        self.inner = self.num_heads * self.head_dim
        self.scale = self.head_dim ** -0.5
        self.sliding_window = getattr(hf, "sliding_window", None)
        rotary_dim = getattr(hf, "rotary_dim", self.head_dim)
        base = getattr(hf, "rope_theta", 10000.0)
        self._inv_freq = jnp.asarray(
            base ** -(np.arange(0, rotary_dim, 2, dtype=np.float64)
                      / rotary_dim), jnp.float32)
        self.rotary_dim = rotary_dim
        # MoE.
        self.num_experts = getattr(hf, "num_local_experts", 1)
        self.top_k = getattr(hf, "num_experts_per_tok", 2)
        self.shared_inter = getattr(hf, "shared_intermediate_size", 0) or 0
        self.shared_mode = getattr(hf, "shared_moe_mode", "softmax")
        self.postnorm = bool(getattr(hf, "postnorm", False))
        self.attn_alpha = {
            0: float(getattr(hf, "layernorm_linear_attention_alpha", 1)),
            1: float(getattr(hf, "layernorm_full_attention_alpha", 1))}
        self.attn_beta = {
            0: float(getattr(hf, "layernorm_linear_attention_beta", 1)),
            1: float(getattr(hf, "layernorm_full_attention_beta", 1))}
        self.mlp_alpha = float(getattr(hf, "layernorm_mlp_alpha", 1))
        self.mlp_beta = float(getattr(hf, "layernorm_mlp_beta", 1))

        self.attn_types = list(getattr(hf, "attn_type_list", None)
                               or [0] * self.num_layers)
        # Per-head decay slopes; lightning layers scale them by depth
        # (reference minimax_text_01.py:389-396).
        slopes = _alibi_slopes(self.num_heads)
        self._slopes = {}
        lin_ord = full_ord = 0
        self.runs, self.kind_ord = [], []
        for i, t in enumerate(self.attn_types):
            ord_ = lin_ord if t == 0 else full_ord
            self.kind_ord.append(ord_)
            if t == 0:
                self._slopes[lin_ord] = slopes * (
                    1 - i / (self.num_layers - 1 + 1e-5) + 1e-5)
                lin_ord += 1
            else:
                full_ord += 1
            if self.runs and self.runs[-1][0] == t:
                k, s, _, ks = self.runs[-1]
                self.runs[-1] = (k, s, i + 1, ks)
            else:
                self.runs.append((t, i, i + 1, ord_))
        self.num_lin = lin_ord
        self.num_full = full_ord
        self.num_attn = full_ord  # paged-KV layer count (jamba convention)

    def set_quant_config(self, qcfg) -> None:
        raise NotImplementedError("quantized MiniMax-Text-01: follow-up")

    # ------------------------------------------------------------- state cache
    def init_cache(self, num_slots: int, cache_config=None, kv_dtype=None,
                   use_pallas: bool = False) -> dict:
        nh, hd = self.num_heads, self.head_dim
        cache = {
            "la_state": jnp.zeros((self.num_lin, num_slots, nh, hd, hd),
                                  jnp.float32),
        }
        if self.num_full and cache_config is not None:
            shape = (self.num_full,) + kv_cache_shape(
                cache_config.num_blocks, cache_config.block_size,
                self.num_kv_heads, self.head_dim, pad_head_dim=use_pallas)
            cache["pages"] = jnp.zeros(shape, kv_dtype or self.dtype)
        return cache

    def cache_specs(self) -> dict:
        return {"la_state": P(),
                "pages": P(None, None, None, "tp", None, None)}

    # ------------------------------------------------------------------ params
    def _ffn_shapes(self, L) -> dict[str, tuple]:
        H, I, E = self.hidden_size, self.intermediate_size, self.num_experts
        shapes = {
            "router": (L, H, E),
            "we_gate": (L, E, H, I),
            "we_up": (L, E, H, I),
            "we_down": (L, E, I, H),
        }
        if self.shared_inter:
            Is = self.shared_inter
            shapes.update(ws_gate=(L, H, Is), ws_up=(L, H, Is),
                          ws_down=(L, Is, H), coef_w=(L, H, 1))
        return shapes

    def _lin_shapes(self) -> dict[str, tuple]:
        H, A, L = self.hidden_size, self.inner, self.num_lin
        shapes = {
            "input_norm": (L, H), "post_norm": (L, H),
            "wqkv": (L, H, 3 * A),
            "la_norm": (L, A),
            "gate_w": (L, H, A),
            "wo": (L, A, H),
            "slope": (L, self.num_heads),
        }
        shapes.update(self._ffn_shapes(L))
        return shapes

    def _full_shapes(self) -> dict[str, tuple]:
        H, L = self.hidden_size, self.num_full
        nq, nkv, hd = self.num_heads, self.num_kv_heads, self.head_dim
        shapes = {
            "input_norm": (L, H), "post_norm": (L, H),
            "wq": (L, H, nq * hd), "wk": (L, H, nkv * hd),
            "wv": (L, H, nkv * hd), "wo": (L, nq * hd, H),
        }
        shapes.update(self._ffn_shapes(L))
        return shapes

    def init_dummy_params(self, rng: jax.Array) -> dict:
        keys = iter(jax.random.split(rng, 160))

        def fill(shapes, kind):
            out = {}
            for k, s in shapes.items():
                if "norm" in k:
                    out[k] = jnp.ones(s, self.dtype)
                elif k == "slope":
                    out[k] = jnp.asarray(np.stack(
                        [self._slopes[j] for j in range(s[0])])
                        if s[0] else np.zeros(s), jnp.float32)
                else:
                    out[k] = (0.02 * jax.random.normal(
                        next(keys), s, jnp.float32)).astype(self.dtype)
            return out

        params = {
            "embed": (0.02 * jax.random.normal(
                next(keys), (self.vocab_size, self.hidden_size),
                jnp.float32)).astype(self.dtype),
            "final_norm": jnp.ones((self.hidden_size,), self.dtype),
        }
        if self.num_lin:
            params["lin"] = fill(self._lin_shapes(), 0)
        if self.num_full:
            params["full"] = fill(self._full_shapes(), 1)
        if not self.tie_embeddings:
            params["lm_head"] = (0.02 * jax.random.normal(
                next(keys), (self.hidden_size, self.vocab_size),
                jnp.float32)).astype(self.dtype)
        return params

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        lin = {k: np.zeros(s, np.float32 if k == "slope" else target)
               for k, s in self._lin_shapes().items()} if self.num_lin \
            else None
        full = {k: np.zeros(s, target)
                for k, s in self._full_shapes().items()} if self.num_full \
            else None
        if lin is not None:
            lin["slope"] = np.stack([self._slopes[j]
                                     for j in range(self.num_lin)]
                                    ).astype(np.float32)
        params: dict = {}
        lmap = {
            "input_layernorm.weight": ("input_norm", False),
            "post_attention_layernorm.weight": ("post_norm", False),
            "self_attn.qkv_proj.weight": ("wqkv", True),
            "self_attn.norm.weight": ("la_norm", False),
            "self_attn.output_gate.weight": ("gate_w", True),
            "self_attn.out_proj.weight": ("wo", True),
        }
        fmap = {
            "input_layernorm.weight": ("input_norm", False),
            "post_attention_layernorm.weight": ("post_norm", False),
            "self_attn.q_proj.weight": ("wq", True),
            "self_attn.k_proj.weight": ("wk", True),
            "self_attn.v_proj.weight": ("wv", True),
            "self_attn.o_proj.weight": ("wo", True),
        }
        emap = {"w1": "we_gate", "w3": "we_up", "w2": "we_down",
                "gate_proj": "we_gate", "up_proj": "we_up",
                "down_proj": "we_down"}
        smap = {"gate_proj": "ws_gate", "up_proj": "ws_up",
                "down_proj": "ws_down"}
        for name, w in weights:
            w = np.asarray(w)
            name = name.removeprefix("model.")
            if name == "embed_tokens.weight":
                params["embed"] = w.astype(target)
            elif name in ("norm.weight", "final_layernorm.weight"):
                params["final_norm"] = w.astype(target)
            elif name == "lm_head.weight":
                if not self.tie_embeddings:
                    params["lm_head"] = w.T.astype(target)
            elif name.startswith("layers."):
                idx_s, sub = name[len("layers."):].split(".", 1)
                li = int(idx_s)
                kind = self.attn_types[li]
                bufs = lin if kind == 0 else full
                ki = self.kind_ord[li]
                table = lmap if kind == 0 else fmap
                m = table.get(sub)
                if m is not None:
                    key, tr = m
                    bufs[key][ki] = (w.T if tr else w).astype(target)
                    continue
                if sub.startswith("block_sparse_moe.gate."):
                    bufs["router"][ki] = w.T.astype(target)
                elif sub.startswith("block_sparse_moe.experts."):
                    parts = sub.split(".")
                    ei, proj = int(parts[2]), parts[3]
                    if proj in emap:
                        bufs[emap[proj]][ki, ei] = w.T.astype(target)
                elif sub.startswith("shared_mlp.") and "ws_gate" in bufs:
                    proj = sub.split(".")[1]
                    if proj in smap:
                        bufs[smap[proj]][ki] = w.T.astype(target)
                elif sub == "coefficient.weight" and "coef_w" in bufs:
                    bufs["coef_w"][ki] = w.T.astype(target)
                elif sub.startswith("mlp.") and sub.split(".")[1] in emap:
                    # dense-MLP fallback (num_local_experts == 1 configs)
                    bufs[emap[sub.split(".")[1]]][ki, 0] = w.T.astype(target)
        if "embed" not in params:
            raise ValueError("checkpoint missing model.embed_tokens.weight")
        if lin is not None:
            params["lin"] = lin
        if full is not None:
            params["full"] = full
        return params

    def param_specs(self) -> dict:
        def st(shapes):
            out = {}
            for k in shapes:
                if k in ("wq", "wk", "wv", "wqkv", "gate_w"):
                    out[k] = P(None, None, "tp")
                elif k in ("wo",):
                    out[k] = P(None, "tp", None)
                elif k in ("we_gate", "we_up"):
                    out[k] = P(None, None, None, "tp")
                elif k == "we_down":
                    out[k] = P(None, None, "tp", None)
                elif k in ("ws_gate", "ws_up"):
                    out[k] = P(None, None, "tp")
                elif k == "ws_down":
                    out[k] = P(None, "tp", None)
                else:
                    out[k] = P()
            return out
        specs = {"embed": P("tp", None), "final_norm": P()}
        if self.num_lin:
            specs["lin"] = st(self._lin_shapes())
        if self.num_full:
            specs["full"] = st(self._full_shapes())
        if not self.tie_embeddings:
            specs["lm_head"] = P(None, "tp")
        return specs

    # ----------------------------------------------------------------- forward
    def _moe(self, h, lp):
        logits = jnp.dot(h.astype(jnp.float32),
                         lp["router"].astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)
        topw, topi = jax.lax.top_k(probs, self.top_k)
        topw = (topw / jnp.sum(topw, axis=-1, keepdims=True)).astype(h.dtype)

        def expert(acc, xs):
            wg, wu, wd, e = xs
            y = silu_and_mul(jnp.dot(h, wg), jnp.dot(h, wu))
            y = jnp.dot(y, wd)
            g = jnp.sum(jnp.where(topi == e, topw, 0.0), axis=-1)
            return acc + g[:, None] * y, None

        acc, _ = jax.lax.scan(
            expert, jnp.zeros_like(h),
            (lp["we_gate"], lp["we_up"], lp["we_down"],
             jnp.arange(self.num_experts, dtype=jnp.int32)))
        if self.shared_inter:
            shared = jnp.dot(
                silu_and_mul(jnp.dot(h, lp["ws_gate"]),
                             jnp.dot(h, lp["ws_up"])), lp["ws_down"]
            ).astype(jnp.float32)
            coef = jnp.dot(h.astype(jnp.float32),
                           lp["coef_w"].astype(jnp.float32))
            coef = (jax.nn.softmax(coef, axis=-1) if
                    self.shared_mode == "softmax"
                    else jax.nn.sigmoid(coef))
            acc = (acc.astype(jnp.float32) * (1 - coef)
                   + shared * coef).astype(h.dtype)
        return acc

    def _lightning(self, h, lp, state, md, decode_mode):
        """Lightning attention over the flat token batch; state
        [slots, nh, hd, hd] fp32 updated in place."""
        T = h.shape[0]
        nh, hd = self.num_heads, self.head_dim
        qkv = jnp.dot(h, lp["wqkv"],
                      preferred_element_type=jnp.float32)  # fp32
        qkv = jax.nn.silu(qkv).reshape(T, nh, 3 * hd)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # [T, nh, hd] fp32
        decay = jnp.exp(-lp["slope"].astype(jnp.float32))  # [nh]
        valid = md.slot_mapping >= 0
        slot_t = md.state_slots[md.token_req_idx]
        pos0_t = md.token_pos[md.seg_starts[md.token_req_idx]]
        is_first = jnp.arange(T, dtype=jnp.int32) == \
            md.seg_starts[md.token_req_idx]
        live = md.seq_lens > 0

        if decode_mode:
            # One token per request: fully vectorized state update; pad
            # tokens (slot_mapping < 0) scatter out of range and drop.
            s0 = state[slot_t]  # [T, nh, hd, hd]
            s0 = jnp.where((md.token_pos > 0)[:, None, None, None], s0, 0.0)
            kv = k[:, :, :, None] * v[:, :, None, :]
            s1 = decay[None, :, None, None] * s0 + kv
            o = jnp.einsum("thd,thde->the", q, s1)
            state = state.at[jnp.where(valid, slot_t,
                                       state.shape[0])].set(
                s1, mode="drop")
        else:
            # Ragged prefill: sequential scan carrying (slot states,
            # running state). Correct but unfused — the chunked lightning
            # kernel is the perf follow-up.
            def step(carry, xs):
                states, run = carry
                qt, kt, vt, first, slot, p0, vld, t = xs
                init = jnp.where(p0 > 0, states[slot], 0.0)
                run = jnp.where(first, init, run)
                kv = kt[:, :, None] * vt[:, None, :]
                run_new = decay[:, None, None] * run + kv
                run = jnp.where(vld, run_new, run)
                o = jnp.einsum("hd,hde->he", qt, run)
                seg_end = md.query_start_loc[md.token_req_idx[t] + 1] - 1
                write = (t == seg_end) & vld
                states = jax.lax.cond(
                    write,
                    lambda s: s.at[slot].set(run),
                    lambda s: s, states)
                return (states, run), o

            (state, _), o = jax.lax.scan(
                step, (state, jnp.zeros((nh, hd, hd), jnp.float32)),
                (q, k, v, is_first, slot_t, pos0_t, valid,
                 jnp.arange(T, dtype=jnp.int32)))

        o = o.reshape(T, nh * hd)
        o = o * jax.lax.rsqrt(
            jnp.mean(o * o, axis=-1, keepdims=True) + self.rms_eps)
        o = o * lp["la_norm"].astype(jnp.float32)
        gate = jax.nn.sigmoid(jnp.dot(h, lp["gate_w"],
                                      preferred_element_type=jnp.float32))
        o = (gate * o).astype(h.dtype)
        return jnp.dot(o, lp["wo"],
                       preferred_element_type=jnp.float32).astype(h.dtype), \
            state

    def apply(self, params: dict, input_ids: jax.Array, kv_cache: dict,
              md: AttentionMetadata, *, use_pallas: bool = False,
              lora: dict | None = None, mm=None):
        if lora is not None:
            raise NotImplementedError("LoRA on MiniMax: follow-up")
        x = jnp.take(params["embed"], input_ids, axis=0)
        if mm is not None:
            mm_embeds, mm_idx = mm
            x = x.at[mm_idx].set(mm_embeds.astype(x.dtype), mode="drop")
        T = x.shape[0]
        nq, nkv, hd = self.num_heads, self.num_kv_heads, self.head_dim
        la_state = kv_cache["la_state"]
        pages = kv_cache.get("pages")
        ang = (md.token_pos.astype(jnp.float32)[:, None]
               * self._inv_freq[None, :])
        cos, sin = jnp.cos(ang), jnp.sin(ang)
        decode_mode = bool(getattr(md, "decode_mode", False))

        def residual_mix(x, out, alpha, beta, norm_out):
            res = norm_out if self.postnorm else x
            return res * alpha + out * beta

        def lin_body(carry, xs):
            x = carry
            lp, st = xs
            h = rms_norm(x, lp["input_norm"], self.rms_eps)
            out, st = self._lightning(h, lp, st, md, decode_mode)
            x = residual_mix(x, out, self.attn_alpha[0], self.attn_beta[0],
                             h)
            h = rms_norm(x, lp["post_norm"], self.rms_eps)
            x = residual_mix(x, self._moe(h, lp), self.mlp_alpha,
                             self.mlp_beta, h)
            return x, st

        def full_body(carry, xs):
            x = carry
            lp, pg = xs
            h = rms_norm(x, lp["input_norm"], self.rms_eps)
            q = jnp.dot(h, lp["wq"]).reshape(T, nq, hd)
            k = jnp.dot(h, lp["wk"]).reshape(T, nkv, hd)
            v = jnp.dot(h, lp["wv"]).reshape(T, nkv, hd)

            def rope(t):
                rot = self.rotary_dim
                out = apply_rope(t[..., :rot], cos, sin)
                if rot != hd:
                    out = jnp.concatenate([out, t[..., rot:]], -1)
                return out
            q, k = rope(q), rope(k)
            pg = write_kv(pg, k, v, md.slot_mapping)
            o = paged_attention(q, pg, md, self.scale,
                                sliding_window=self.sliding_window,
                                use_pallas=use_pallas)
            out = jnp.dot(o.reshape(T, nq * hd), lp["wo"])
            x = residual_mix(x, out, self.attn_alpha[1], self.attn_beta[1],
                             h)
            h = rms_norm(x, lp["post_norm"], self.rms_eps)
            x = residual_mix(x, self._moe(h, lp), self.mlp_alpha,
                             self.mlp_beta, h)
            return x, pg

        sl = jax.tree.map
        for kind, s, e, ks in self.runs:
            n = e - s
            if kind == 0:
                stack = sl(lambda a: a[ks:ks + n], params["lin"])
                x, sseg = jax.lax.scan(lin_body, x,
                                       (stack, la_state[ks:ks + n]))
                la_state = jax.lax.dynamic_update_slice_in_dim(
                    la_state, sseg, ks, axis=0)
            else:
                stack = sl(lambda a: a[ks:ks + n], params["full"])
                x, pseg = jax.lax.scan(full_body, x,
                                       (stack, pages[ks:ks + n]))
                pages = jax.lax.dynamic_update_slice_in_dim(
                    pages, pseg, ks, axis=0)
        x = rms_norm(x, params["final_norm"], self.rms_eps)
        out = {"la_state": la_state}
        if pages is not None:
            out["pages"] = pages
        return x, out

    def compute_logits(self, params: dict, hidden: jax.Array) -> jax.Array:
        head = params["embed"].T if self.tie_embeddings \
            else params["lm_head"]
        return jnp.dot(hidden, head, preferred_element_type=jnp.float32)


def MiniMaxVL01ForConditionalGeneration(config):
    """MiniMax-VL-01: LLaVA-shaped CLIP tower + 2-layer MLP projector over
    the MiniMax-Text-01 decoder (reference minimax_vl_01.py)."""
    from aphrodite_tpu.models.llava import _LlavaMixin

    cls = type("MiniMaxVL01", (_LlavaMixin, MiniMaxText01ForCausalLM), {})
    model = cls(config)
    model._mm_init(config)
    return model
