"""PLaMo-2: Mamba-1-style selective-scan mixers + rotary attention hybrid.

Parity: aphrodite/modeling/models/plamo2.py. Layer i is attention iff
``i % mamba_step == mamba_step // 2`` (all-mamba for very shallow stacks);
every layer is sandwich-normed (pre/post mixer + pre/post MLP RMSNorms)
with a dense swiglu MLP. The mamba mixer is mamba-1 with per-HEAD dt
(dt_proj [rank -> num_heads], broadcast across head channels — expanded to
per-channel at load so the shared Jamba mixer runs it unchanged), RMS
norms on dt/B/C, and a per-head-interleaved [gate|x] in_proj
(de-interleaved at load). Attention uses per-head-distinct RMS q/k scales
and full-width rotary.
"""
from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.attention import (AttentionMetadata, paged_attention,
                                     write_kv)
from aphrodite_tpu.config import ModelConfig
from aphrodite_tpu.layers.common import ACT2MUL, rms_norm
from aphrodite_tpu.layers.rotary import apply_rope
from aphrodite_tpu.models.jamba import JambaForCausalLM


class Plamo2ForCausalLM(JambaForCausalLM):

    def __init__(self, config: ModelConfig):
        self.config = config
        hf = config.text_config
        from aphrodite_tpu.utils import jax_dtype
        self.dtype = jax_dtype(config.dtype)
        self.hidden_size = hf.hidden_size
        self.num_layers = hf.num_hidden_layers
        self.vocab_size = hf.vocab_size
        self.intermediate_size = hf.intermediate_size
        self.rms_eps = getattr(hf, "rms_norm_eps", 1e-6)
        self.act = ACT2MUL["silu"]
        self.tie_embeddings = getattr(hf, "tie_word_embeddings", False)
        # Attention geometry.
        self.num_heads = hf.num_attention_heads
        self.num_kv_heads = getattr(hf, "num_key_value_heads",
                                    hf.num_attention_heads)
        self.head_dim = getattr(hf, "hidden_size_per_head",
                                hf.hidden_size // hf.num_attention_heads)
        self.scale = self.head_dim ** -0.5
        self.sliding_window = None
        base = getattr(hf, "rope_theta", 10000.0)
        hd = self.head_dim
        self._inv_freq = jnp.asarray(
            base ** -(np.arange(0, hd, 2, dtype=np.float64) / hd),
            jnp.float32)
        # Mamba-1 geometry (Jamba mixer attribute names).
        self.mamba_heads = getattr(hf, "mamba_num_heads", 8)
        self.d_inner = self.mamba_heads * self.head_dim
        self.d_state = getattr(hf, "mamba_d_state", 64)
        self.d_conv = getattr(hf, "mamba_d_conv", 4)
        self.dt_rank = max(64, self.hidden_size // 16)
        self.use_conv_bias = False
        self.use_bias = False
        self.bcdt_rms_eps = None
        self.num_experts = 1
        self.top_k = 1

        step = getattr(hf, "mamba_step", 2)

        def is_mamba(i):
            if self.num_layers <= step // 2:
                return i != self.num_layers - 1  # attention in last layer
            return (i % step) != (step // 2)

        self.layer_kinds = [("mamba" if is_mamba(i) else "attn", "dense")
                            for i in range(self.num_layers)]
        self.runs, counts = [], {}
        self.attn_ordinal, self.mamba_ordinal = [], []
        na = nm = 0
        for i, kind in enumerate(self.layer_kinds):
            self.attn_ordinal.append(na)
            self.mamba_ordinal.append(nm)
            if kind[0] == "attn":
                na += 1
            else:
                nm += 1
            if self.runs and self.runs[-1][0] == kind \
                    and self.runs[-1][2] == i:
                k, s, _, ks = self.runs[-1]
                self.runs[-1] = (k, s, i + 1, ks)
            else:
                self.runs.append((kind, i, i + 1, counts.get(kind, 0)))
            counts[kind] = counts.get(kind, 0) + 1
        self.num_attn = na
        self.num_mamba = nm

    # ------------------------------------------------------------------ params
    def _attn_mixer_shapes(self, L):
        shapes = super()._attn_mixer_shapes(L)
        nq, nkv, hd = self.num_heads, self.num_kv_heads, self.head_dim
        shapes.update(q_rms=(L, nq, hd), k_rms=(L, nkv, hd))
        return shapes

    def _stack_shapes(self, kind) -> dict:
        shapes = super()._stack_shapes(kind)
        L = sum(1 for k in self.layer_kinds if k == kind)
        shapes.update(post_mixer_norm=(L, self.hidden_size),
                      post_mlp_norm=(L, self.hidden_size))
        return shapes

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        stacks = {}
        kind_pos, counts = [], {}
        for kind in self.layer_kinds:
            kind_pos.append(counts.get(kind, 0))
            counts[kind] = counts.get(kind, 0) + 1
        for kind in dict.fromkeys(self.layer_kinds):
            stacks[self._stack_name(kind)] = {
                k: np.zeros(s, np.float32 if k == "A_log" else target)
                for k, s in self._stack_shapes(kind).items()}
        params: dict = {}
        nh_m, hd = self.mamba_heads, self.head_dim
        Di, Ds, R = self.d_inner, self.d_state, self.dt_rank
        nq, nkv = self.num_heads, self.num_kv_heads
        # PLaMo2's RMSNorm stores weight - offset; fold the offset in
        # (reference plamo2.py load_weights: +1.0 pre norms / final norm,
        # +1/5 post_mixer, +5**-1.5 post_mlp).
        norm_map = {
            "pre_mixer_norm.weight": ("input_norm", 1.0),
            "post_mixer_norm.weight": ("post_mixer_norm", 1.0 / 5),
            "pre_mlp_norm.weight": ("pre_ff_norm", 1.0),
            "post_mlp_norm.weight": ("post_mlp_norm", 1.0 / 5 ** 1.5),
        }
        for name, w in weights:
            w = np.asarray(w)
            name = name.removeprefix("model.")
            name = name.replace("layers.layers.", "layers.")
            if name == "embed_tokens.weight":
                params["embed"] = w.astype(target)
            elif name == "norm.weight":
                params["final_norm"] = (w + 1.0).astype(target)
            elif name == "lm_head.weight":
                if not self.tie_embeddings:
                    params["lm_head"] = w.T.astype(target)
            elif name.startswith("layers."):
                idx_s, sub = name[len("layers."):].split(".", 1)
                li = int(idx_s)
                kind = self.layer_kinds[li]
                bufs = stacks[self._stack_name(kind)]
                ki = kind_pos[li]
                if sub in norm_map:
                    key, off = norm_map[sub]
                    bufs[key][ki] = (w + off).astype(target)
                elif sub == "mlp.gate_up_proj.weight":
                    I = self.intermediate_size
                    bufs["w_gate"][ki] = w[:I].T.astype(target)
                    bufs["w_up"][ki] = w[I:].T.astype(target)
                elif sub == "mlp.down_proj.weight":
                    bufs["w_down"][ki] = w.T.astype(target)
                elif sub.startswith("mixer."):
                    m = sub[len("mixer."):]
                    if kind[0] == "attn":
                        if m == "qkv_proj.weight":
                            q = w[:nq * hd]
                            k = w[nq * hd:(nq + nkv) * hd]
                            v = w[(nq + nkv) * hd:]
                            bufs["wq"][ki] = q.T.astype(target)
                            bufs["wk"][ki] = k.T.astype(target)
                            bufs["wv"][ki] = v.T.astype(target)
                        elif m == "q_proj.weight":
                            bufs["wq"][ki] = w.T.astype(target)
                        elif m == "k_proj.weight":
                            bufs["wk"][ki] = w.T.astype(target)
                        elif m == "v_proj.weight":
                            bufs["wv"][ki] = w.T.astype(target)
                        elif m == "o_proj.weight":
                            bufs["wo"][ki] = w.T.astype(target)
                        elif m == "q_weight":
                            bufs["q_rms"][ki] = w.reshape(nq, hd
                                                          ).astype(target)
                        elif m == "k_weight":
                            bufs["k_rms"][ki] = w.reshape(nkv, hd
                                                          ).astype(target)
                        continue
                    # mamba mixer
                    if m == "in_proj.weight":
                        # per-head interleaved [gate_h | x_h] rows
                        wr = w.reshape(nh_m, 2, hd, self.hidden_size)
                        x_part = wr[:, 1].reshape(Di, -1)
                        g_part = wr[:, 0].reshape(Di, -1)
                        bufs["in_proj"][ki] = np.concatenate(
                            [x_part, g_part], axis=0).T.astype(target)
                    elif m == "conv1d.weight":
                        bufs["conv_w"][ki] = w.reshape(Di, -1
                                                       ).T.astype(target)
                    elif m == "bcdt_proj.weight":
                        # rows [B | C | dt] -> our x_proj order [dt | B | C]
                        B_r = w[:Ds]
                        C_r = w[Ds:2 * Ds]
                        dt_r = w[2 * Ds:]
                        bufs["x_proj"][ki] = np.concatenate(
                            [dt_r, B_r, C_r], axis=0).T.astype(target)
                    elif m == "dt_proj.weight":
                        # [nh, R] -> broadcast per head channel [R, Di]
                        bufs["dt_w"][ki] = np.repeat(w, hd, axis=0
                                                     ).T.astype(target)
                    elif m == "dt_bias":
                        bufs["dt_b"][ki] = np.repeat(w, hd).astype(target)
                    elif m == "A_log":
                        # per-head [nh]; broadcast over head channels + Ds —
                        # mixer computes A = -exp(A_log).
                        full = np.repeat(w.astype(np.float32), hd)
                        bufs["A_log"][ki] = np.broadcast_to(
                            full[:, None], (Di, Ds))
                    elif m == "D":
                        bufs["D"][ki] = np.repeat(w, hd).astype(target)
                    elif m == "out_proj.weight":
                        bufs["out_proj"][ki] = w.T.astype(target)
                    elif m == "dt_norm_weight":
                        bufs["dt_norm_w"][ki] = w.astype(target)
                    elif m == "B_norm_weight":
                        bufs["b_norm_w"][ki] = w.astype(target)
                    elif m == "C_norm_weight":
                        bufs["c_norm_w"][ki] = w.astype(target)
                    elif m.startswith(("dt_norm.", "B_norm.", "C_norm.")):
                        key = {"dt_norm.weight": "dt_norm_w",
                               "B_norm.weight": "b_norm_w",
                               "C_norm.weight": "c_norm_w"}.get(m)
                        if key:
                            bufs[key][ki] = w.astype(target)
        if "embed" not in params:
            raise ValueError("checkpoint missing model.embed_tokens.weight")
        params.update(stacks)
        return params

    # ----------------------------------------------------------------- forward
    def apply(self, params: dict, input_ids: jax.Array, kv_cache: dict,
              md: AttentionMetadata, *, use_pallas: bool = False,
              lora: dict | None = None, mm=None):
        if lora is not None:
            raise NotImplementedError("LoRA on PLaMo-2: follow-up")
        x = jnp.take(params["embed"], input_ids, axis=0)
        if mm is not None:
            mm_embeds, mm_idx = mm
            x = x.at[mm_idx].set(mm_embeds.astype(x.dtype), mode="drop")
        T = x.shape[0]
        nq, nkv, hd = self.num_heads, self.num_kv_heads, self.head_dim
        pages = kv_cache.get("pages")
        conv, ssm = kv_cache["conv"], kv_cache["ssm"]
        ang = (md.token_pos.astype(jnp.float32)[:, None]
               * self._inv_freq[None, :])
        cos, sin = jnp.cos(ang), jnp.sin(ang)

        def phrms(v, w):
            vf = v.astype(jnp.float32)
            return (vf * jax.lax.rsqrt(
                jnp.mean(vf * vf, -1, keepdims=True) + 1e-6) * w
                    ).astype(v.dtype)

        def attn_body(x, xs):
            lp, pg = xs
            h = rms_norm(x, lp["input_norm"], self.rms_eps)
            q = jnp.dot(h, lp["wq"]).reshape(T, nq, hd)
            k = jnp.dot(h, lp["wk"]).reshape(T, nkv, hd)
            v = jnp.dot(h, lp["wv"]).reshape(T, nkv, hd)
            q = phrms(q, lp["q_rms"])
            k = phrms(k, lp["k_rms"])
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            pg = write_kv(pg, k, v, md.slot_mapping)
            o = paged_attention(q, pg, md, self.scale,
                                use_pallas=use_pallas)
            o = jnp.dot(o.reshape(T, nq * hd), lp["wo"])
            x = x + rms_norm(o, lp["post_mixer_norm"], self.rms_eps)
            h = rms_norm(x, lp["pre_ff_norm"], self.rms_eps)
            y = self._ffn(h, lp, False)
            x = x + rms_norm(y, lp["post_mlp_norm"], self.rms_eps)
            return x, pg

        def mamba_body(x, xs):
            lp, conv_l, ssm_l = xs
            h = rms_norm(x, lp["input_norm"], self.rms_eps)
            out, (conv_l, ssm_l) = self._mixer(h, lp, (conv_l, ssm_l), md)
            x = x + rms_norm(out, lp["post_mixer_norm"], self.rms_eps)
            h = rms_norm(x, lp["pre_ff_norm"], self.rms_eps)
            y = self._ffn(h, lp, False)
            x = x + rms_norm(y, lp["post_mlp_norm"], self.rms_eps)
            return x, (conv_l, ssm_l)

        sl = jax.tree.map
        for kind, s, e, ks in self.runs:
            n = e - s
            stack = sl(lambda a: a[ks:ks + n],
                       params[self._stack_name(kind)])
            if kind[0] == "attn":
                a0 = self.attn_ordinal[s]
                x, seg = jax.lax.scan(attn_body, x,
                                      (stack, pages[a0:a0 + n]))
                pages = jax.lax.dynamic_update_slice_in_dim(
                    pages, seg, a0, axis=0)
            else:
                m0 = self.mamba_ordinal[s]
                x, (cseg, sseg) = jax.lax.scan(
                    mamba_body, x, (stack, conv[m0:m0 + n],
                                    ssm[m0:m0 + n]))
                conv = jax.lax.dynamic_update_slice_in_dim(
                    conv, cseg, m0, axis=0)
                ssm = jax.lax.dynamic_update_slice_in_dim(
                    ssm, sseg, m0, axis=0)
        x = rms_norm(x, params["final_norm"], self.rms_eps)
        out_cache = {"conv": conv, "ssm": ssm}
        if pages is not None:
            out_cache["pages"] = pages
        return x, out_cache
