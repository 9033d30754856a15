"""Jamba: hybrid attention + Mamba + MoE decoder.

Parity: aphrodite/modeling/models/jamba.py (SURVEY.md §2.4 SSM/hybrid
family). Layers alternate by config pattern (attn_layer_period/offset);
each layer's FFN is dense or sparse-MoE (expert_layer_period/offset,
softmax top-k with NO renormalization — Jamba's convention). Attention is
rope-free GQA over the paged cache; mamba layers reuse the ragged
associative-scan mixer (models/mamba.py) with Jamba's learned dt/B/C
RMSNorms. The hybrid cache pytree holds BOTH kinds of state —
{"pages": [La, ...], "conv"/"ssm": [Lm, slots, ...]} — donated through
the step; contiguous same-kind layer runs scan with their cache segment
and write back via dynamic_update_slice (deepseek.py's run scheme).
"""
from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.attention import (AttentionMetadata, paged_attention,
                                     write_kv)
from aphrodite_tpu.attention.backend import kv_cache_shape
from aphrodite_tpu.config import ModelConfig
from aphrodite_tpu.layers.common import ACT2MUL, rms_norm
from aphrodite_tpu.models.mamba import MambaForCausalLM


class JambaForCausalLM(MambaForCausalLM):

    is_ssm = True          # runner: state slots + seg_starts routing
    is_hybrid = True

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
        self.act = ACT2MUL[getattr(hf, "hidden_act", "silu")]
        self.tie_embeddings = getattr(hf, "tie_word_embeddings", False)
        self.bcdt_rms_eps = None
        # Attention geometry (paged KV over the attention layers only).
        self.num_heads = hf.num_attention_heads
        self.num_kv_heads = hf.num_key_value_heads
        self.head_dim = self.hidden_size // self.num_heads
        self.scale = self.head_dim ** -0.5
        self.sliding_window = None
        # Mamba geometry (models/mamba.py mixer attribute names).
        self.d_inner = hf.mamba_expand * hf.hidden_size
        self.d_state = hf.mamba_d_state
        self.d_conv = hf.mamba_d_conv
        self.dt_rank = hf.mamba_dt_rank
        self.use_conv_bias = getattr(hf, "mamba_conv_bias", True)
        self.use_bias = getattr(hf, "mamba_proj_bias", False)
        # MoE geometry.
        self.num_experts = getattr(hf, "num_experts", 1)
        self.top_k = getattr(hf, "num_experts_per_tok", 1)

        def is_attn(i):
            return i % hf.attn_layer_period == hf.attn_layer_offset
        def is_moe(i):
            return self.num_experts > 1 and \
                i % hf.expert_layer_period == hf.expert_layer_offset
        self.layer_kinds = [("attn" if is_attn(i) else "mamba",
                             "moe" if is_moe(i) else "dense")
                            for i in range(self.num_layers)]
        # Contiguous same-kind runs: (kind, start, end, kind_ordinal_start).
        self.runs: list[tuple[tuple[str, str], int, int, int]] = []
        counts: dict[tuple[str, str], int] = {}
        # Per-cache ordinals (pages index attn layers; conv/ssm mamba ones).
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

    # ------------------------------------------------------------- state cache
    def init_cache(self, num_slots: int, cache_config=None,
                   kv_dtype=None, use_pallas: bool = False) -> dict:
        cache = {
            "conv": jnp.zeros((self.num_mamba, num_slots, self.d_conv - 1,
                               self.d_inner), self.dtype),
            "ssm": jnp.zeros((self.num_mamba, num_slots, self.d_inner,
                              self.d_state), jnp.float32),
        }
        if self.num_attn and cache_config is not None:
            shape = (self.num_attn,) + kv_cache_shape(
                cache_config.num_blocks, cache_config.block_size,
                self.num_kv_heads, self.head_dim, pad_head_dim=use_pallas)
            cache["pages"] = jnp.zeros(shape, kv_dtype or self.dtype)
        return cache

    def cache_specs(self) -> dict:
        return {"conv": P(), "ssm": P(),
                "pages": P(None, None, None, "tp", None, None)}

    # ------------------------------------------------------------------ params
    def _mamba_mixer_shapes(self, L):
        H, Di, Ds, R = (self.hidden_size, self.d_inner, self.d_state,
                        self.dt_rank)
        K = self.d_conv
        shapes = {
            "in_proj": (L, H, 2 * Di),
            "conv_w": (L, K, Di),
            "x_proj": (L, Di, R + 2 * self.d_state),
            "dt_norm_w": (L, R), "b_norm_w": (L, Ds), "c_norm_w": (L, Ds),
            "dt_w": (L, R, Di), "dt_b": (L, Di),
            "A_log": (L, Di, Ds), "D": (L, Di),
            "out_proj": (L, Di, H),
        }
        if self.use_conv_bias:
            shapes["conv_b"] = (L, Di)
        return shapes

    def _attn_mixer_shapes(self, L):
        H, nq, nkv, hd = (self.hidden_size, self.num_heads,
                          self.num_kv_heads, self.head_dim)
        return {"wq": (L, H, nq * hd), "wk": (L, H, nkv * hd),
                "wv": (L, H, nkv * hd), "wo": (L, nq * hd, H)}

    def _ffn_shapes(self, L, moe: bool):
        H, I = self.hidden_size, self.intermediate_size
        if not moe:
            return {"w_gate": (L, H, I), "w_up": (L, H, I),
                    "w_down": (L, I, H)}
        E = self.num_experts
        return {"router": (L, H, E), "we_gate": (L, E, H, I),
                "we_up": (L, E, H, I), "we_down": (L, E, I, H)}

    def _stack_shapes(self, kind) -> dict:
        mixer, ffn = kind
        L = sum(1 for k in self.layer_kinds if k == kind)
        shapes = {"input_norm": (L, self.hidden_size),
                  "pre_ff_norm": (L, self.hidden_size)}
        shapes.update(self._attn_mixer_shapes(L) if mixer == "attn"
                      else self._mamba_mixer_shapes(L))
        shapes.update(self._ffn_shapes(L, ffn == "moe"))
        return shapes

    @staticmethod
    def _stack_name(kind) -> str:
        return f"{kind[0]}_{kind[1]}"

    def init_dummy_params(self, rng: jax.Array) -> dict:
        keys = iter(jax.random.split(rng, 256))

        def fill(shapes):
            out = {}
            for name, shape in shapes.items():
                if "norm" in name:
                    out[name] = jnp.ones(shape, self.dtype)
                elif name == "A_log":
                    out[name] = jnp.log(jnp.broadcast_to(
                        jnp.arange(1, shape[-1] + 1, dtype=jnp.float32),
                        shape))
                elif name == "D":
                    out[name] = jnp.ones(shape, self.dtype)
                elif name.endswith("_b"):
                    out[name] = jnp.zeros(shape, self.dtype)
                else:
                    out[name] = (0.02 * jax.random.normal(
                        next(keys), shape, jnp.float32)).astype(self.dtype)
            return out

        params = {
            "embed": (0.02 * jax.random.normal(
                next(keys), (self.vocab_size, self.hidden_size),
                jnp.float32)).astype(self.dtype),
            "final_norm": jnp.ones((self.hidden_size,), self.dtype),
        }
        for kind in dict.fromkeys(self.layer_kinds):
            params[self._stack_name(kind)] = fill(self._stack_shapes(kind))
        if not self.tie_embeddings:
            params["lm_head"] = (0.02 * jax.random.normal(
                next(keys), (self.hidden_size, self.vocab_size),
                jnp.float32)).astype(self.dtype)
        return params

    _MAMBA_MAP = {"mamba.in_proj.weight": ("in_proj", True),
                  "mamba.x_proj.weight": ("x_proj", True),
                  "mamba.dt_proj.weight": ("dt_w", True),
                  "mamba.dt_proj.bias": ("dt_b", False),
                  "mamba.conv1d.bias": ("conv_b", False),
                  "mamba.A_log": ("A_log", False),
                  "mamba.D": ("D", False),
                  "mamba.out_proj.weight": ("out_proj", True),
                  "mamba.dt_layernorm.weight": ("dt_norm_w", False),
                  "mamba.b_layernorm.weight": ("b_norm_w", False),
                  "mamba.c_layernorm.weight": ("c_norm_w", False)}

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        stacks = {}
        kind_pos: list[int] = []
        counts: dict[tuple, int] = {}
        for kind in self.layer_kinds:
            kind_pos.append(counts.get(kind, 0))
            counts[kind] = counts.get(kind, 0) + 1
        for kind in dict.fromkeys(self.layer_kinds):
            stacks[self._stack_name(kind)] = {
                k: np.zeros(s, np.float32 if k == "A_log" else target)
                for k, s in self._stack_shapes(kind).items()}
        params: dict = {}

        attn_map = {"self_attn.q_proj.weight": ("wq", True),
                    "self_attn.k_proj.weight": ("wk", True),
                    "self_attn.v_proj.weight": ("wv", True),
                    "self_attn.o_proj.weight": ("wo", True)}
        mamba_map = self._MAMBA_MAP
        dense_map = {"feed_forward.gate_proj.weight": ("w_gate", True),
                     "feed_forward.up_proj.weight": ("w_up", True),
                     "feed_forward.down_proj.weight": ("w_down", True)}
        mlp_part = {"gate_proj": "we_gate", "up_proj": "we_up",
                    "down_proj": "we_down"}
        for name, w in weights:
            w = np.asarray(w)
            name = name.removeprefix("model.")
            if name == "embed_tokens.weight":
                params["embed"] = w.astype(target)
            elif name == "final_layernorm.weight":
                params["final_norm"] = w.astype(target)
            elif name == "lm_head.weight":
                if not self.tie_embeddings:
                    params["lm_head"] = w.T.astype(target)
            elif name.startswith("layers."):
                idx_s, sub = name[len("layers."):].split(".", 1)
                li = int(idx_s)
                kind = self.layer_kinds[li]
                bufs = stacks[self._stack_name(kind)]
                ki = kind_pos[li]
                if sub == "input_layernorm.weight":
                    bufs["input_norm"][ki] = w.astype(target)
                elif sub == "pre_ff_layernorm.weight":
                    bufs["pre_ff_norm"][ki] = w.astype(target)
                elif sub == "mamba.conv1d.weight":
                    bufs["conv_w"][ki] = w[:, 0, :].T.astype(target)
                elif sub == "feed_forward.router.weight":
                    bufs["router"][ki] = w.T.astype(target)
                elif sub.startswith("feed_forward.experts."):
                    parts = sub.split(".")
                    ei, proj = int(parts[2]), parts[3]
                    bufs[mlp_part[proj]][ki, ei] = w.T.astype(target)
                else:
                    m = attn_map.get(sub) or mamba_map.get(sub) \
                        or dense_map.get(sub)
                    if m and m[0] in bufs:
                        key, tr = m
                        bufs[key][ki] = (w.T if tr else w).astype(
                            bufs[key].dtype)
        if "embed" not in params:
            raise ValueError("checkpoint missing model.embed_tokens.weight")
        params.update(stacks)
        return params

    def param_specs(self) -> dict:
        specs = {"embed": P("tp", None), "final_norm": P()}
        for kind in dict.fromkeys(self.layer_kinds):
            st = {}
            for k in self._stack_shapes(kind):
                if k in ("wq", "wk", "wv", "w_gate", "w_up"):
                    st[k] = P(None, None, "tp")
                elif k in ("wo", "w_down"):
                    st[k] = P(None, "tp", None)
                elif k in ("we_gate", "we_up"):
                    st[k] = P(None, None, None, "tp")
                elif k == "we_down":
                    st[k] = P(None, None, "tp", None)
                else:
                    st[k] = P()
            specs[self._stack_name(kind)] = st
        if not self.tie_embeddings:
            specs["lm_head"] = P(None, "tp")
        return specs

    # ----------------------------------------------------------------- forward
    def _ffn(self, h, lp, moe: bool):
        if not moe:
            gate = jnp.dot(h, lp["w_gate"],
                           preferred_element_type=jnp.float32).astype(h.dtype)
            up = jnp.dot(h, lp["w_up"],
                         preferred_element_type=jnp.float32).astype(h.dtype)
            return jnp.dot(self.act(gate, up), lp["w_down"],
                           preferred_element_type=jnp.float32).astype(h.dtype)
        logits = jnp.dot(h.astype(jnp.float32),
                         lp["router"].astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)
        topw, topi = jax.lax.top_k(probs, self.top_k)
        topw = topw.astype(h.dtype)  # Jamba: NO top-k renormalization

        def expert(acc, xs):
            wg, wu, wd, e = xs
            y = self.act(
                jnp.dot(h, wg, preferred_element_type=jnp.float32
                        ).astype(h.dtype),
                jnp.dot(h, wu, preferred_element_type=jnp.float32
                        ).astype(h.dtype))
            y = jnp.dot(y, wd, preferred_element_type=jnp.float32
                        ).astype(h.dtype)
            g = jnp.sum(jnp.where(topi == e, topw, 0.0), axis=-1)
            return acc + g[:, None] * y, None

        acc, _ = jax.lax.scan(
            expert, jnp.zeros_like(h),
            (lp["we_gate"], lp["we_up"], lp["we_down"],
             jnp.arange(self.num_experts, dtype=jnp.int32)))
        return acc

    def apply(self, params: dict, input_ids: jax.Array, kv_cache: dict,
              md: AttentionMetadata, *, use_pallas: bool = False,
              lora: dict | None = None, mm=None):
        if lora is not None:
            raise NotImplementedError("LoRA on Jamba: follow-up")
        x = jnp.take(params["embed"], input_ids, axis=0)
        T = x.shape[0]
        nq, nkv, hd = self.num_heads, self.num_kv_heads, self.head_dim
        pages = kv_cache.get("pages")
        conv, ssm = kv_cache["conv"], kv_cache["ssm"]

        cos = sin = None
        if getattr(self, "rope", None) is not None:
            from aphrodite_tpu.layers.rotary import compute_cos_sin
            cos, sin = compute_cos_sin(md.token_pos, self._inv_freq,
                                       self._rope_mscale, None)

        def attn_body(moe):
            def layer(x, xs):
                lp, pg = xs
                h = rms_norm(x, lp["input_norm"], self.rms_eps)
                q = jnp.dot(h, lp["wq"]).reshape(T, nq, hd)
                k = jnp.dot(h, lp["wk"]).reshape(T, nkv, hd)
                v = jnp.dot(h, lp["wv"]).reshape(T, nkv, hd)
                if cos is not None:  # Bamba: (partial) rotary attention
                    from aphrodite_tpu.layers.rotary import apply_rope
                    rot = cos.shape[-1] * 2

                    def rope(t):
                        out = apply_rope(t[..., :rot], cos, sin)
                        if rot != t.shape[-1]:
                            out = jnp.concatenate([out, t[..., rot:]], -1)
                        return out
                    q, k = rope(q), rope(k)
                pg = write_kv(pg, k, v, md.slot_mapping)
                o = paged_attention(q, pg, md, self.scale,
                                    use_pallas=use_pallas)
                x = x + jnp.dot(o.reshape(T, nq * hd), lp["wo"])
                h = rms_norm(x, lp["pre_ff_norm"], self.rms_eps)
                return x + self._ffn(h, lp, moe), pg
            return layer

        def mamba_body(moe):
            def layer(x, xs):
                lp, conv_l, ssm_l = xs
                h = rms_norm(x, lp["input_norm"], self.rms_eps)
                out, (conv_l, ssm_l) = self._mixer(h, lp, (conv_l, ssm_l),
                                                   md)
                x = x + out
                h = rms_norm(x, lp["pre_ff_norm"], self.rms_eps)
                return x + self._ffn(h, lp, moe), (conv_l, ssm_l)
            return layer

        sl = jax.tree.map
        for kind, s, e, ks in self.runs:
            n = e - s
            stack = sl(lambda a: a[ks:ks + n], params[self._stack_name(kind)])
            if kind[0] == "attn":
                a0 = self.attn_ordinal[s]
                x, seg = jax.lax.scan(attn_body(kind[1] == "moe"), x,
                                      (stack, pages[a0:a0 + n]))
                pages = jax.lax.dynamic_update_slice_in_dim(
                    pages, seg, a0, axis=0)
            else:
                m0 = self.mamba_ordinal[s]
                x, (cseg, sseg) = jax.lax.scan(
                    mamba_body(kind[1] == "moe"), x,
                    (stack, conv[m0:m0 + n], ssm[m0:m0 + n]))
                conv = jax.lax.dynamic_update_slice_in_dim(
                    conv, cseg, m0, axis=0)
                ssm = jax.lax.dynamic_update_slice_in_dim(
                    ssm, sseg, m0, axis=0)
        x = rms_norm(x, params["final_norm"], self.rms_eps)
        out_cache = {"conv": conv, "ssm": ssm}
        if pages is not None:
            out_cache["pages"] = pages
        return x, out_cache


class BambaForCausalLM(JambaForCausalLM):
    """Bamba (IBM): Mamba-2 (SSD) mixers with a few interleaved rotary GQA
    attention layers (``attn_layer_indices``), a gated MLP on every layer.
    Reference: aphrodite/modeling/models/bamba.py. Reuses Jamba's hybrid
    run-segmented scan + cache pytree with the Mamba-2 mixer
    (models/mamba.py Mamba2ForCausalLM) and partial-rotary attention."""

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
        self.act = ACT2MUL[getattr(hf, "hidden_act", "silu")]
        self.tie_embeddings = getattr(hf, "tie_word_embeddings", False)
        # Attention geometry (+ partial rotary).
        self.num_heads = hf.num_attention_heads
        self.num_kv_heads = hf.num_key_value_heads
        self.head_dim = self.hidden_size // self.num_heads
        self.scale = self.head_dim ** -0.5
        self.sliding_window = None
        from aphrodite_tpu.layers.rotary import (RopeConfig,
                                                 compute_inv_freq)
        pct = getattr(hf, "partial_rotary_factor", 0.5)
        self.rope = RopeConfig(
            head_dim=self.head_dim,
            rotary_dim=int(self.head_dim * pct),
            base=getattr(hf, "rope_theta", 10000.0),
            max_position=getattr(hf, "max_position_embeddings", 2048),
            scaling=getattr(hf, "rope_scaling", None))
        inv_freq, mscale = compute_inv_freq(self.rope)
        self._inv_freq = jnp.asarray(inv_freq)
        self._rope_mscale = mscale
        # Mamba-2 geometry (Mamba2ForCausalLM mixer attribute names).
        self.d_inner = getattr(hf, "mamba_expand", 2) * hf.hidden_size
        self.d_state = hf.mamba_d_state
        self.d_conv = hf.mamba_d_conv
        self.n_heads = hf.mamba_n_heads
        self.head_dim_m2 = hf.mamba_d_head
        self.n_groups = getattr(hf, "mamba_n_groups", 1)
        self.conv_dim = self.d_inner + 2 * self.n_groups * self.d_state
        self.dt_limit = tuple(getattr(hf, "time_step_limit", None)
                              or (0.0, float("inf")))
        self.use_conv_bias = getattr(hf, "mamba_conv_bias", True)
        self.num_experts = 1
        self.top_k = 1

        attn_idx = set(getattr(hf, "attn_layer_indices", None) or [])
        self.layer_kinds = [("attn" if i in attn_idx else "mamba", "dense")
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

    def init_cache(self, num_slots: int, cache_config=None, kv_dtype=None,
                   use_pallas: bool = False) -> dict:
        cache = {
            "conv": jnp.zeros((self.num_mamba, num_slots, self.d_conv - 1,
                               self.conv_dim), self.dtype),
            "ssm": jnp.zeros((self.num_mamba, num_slots, self.n_heads,
                              self.head_dim_m2, self.d_state), jnp.float32),
        }
        if self.num_attn and cache_config is not None:
            shape = (self.num_attn,) + kv_cache_shape(
                cache_config.num_blocks, cache_config.block_size,
                self.num_kv_heads, self.head_dim, pad_head_dim=use_pallas)
            cache["pages"] = jnp.zeros(shape, kv_dtype or self.dtype)
        return cache

    def _mamba_mixer_shapes(self, L):
        H, Di = self.hidden_size, self.d_inner
        nh, K = self.n_heads, self.d_conv
        shapes = {
            "in_proj": (L, H, Di + self.conv_dim + nh),
            "conv_w": (L, K, self.conv_dim),
            "dt_bias": (L, nh),
            "A_log": (L, nh),
            "D": (L, nh),
            "gated_norm_w": (L, Di),
            "out_proj": (L, Di, H),
        }
        if self.use_conv_bias:
            shapes["conv_b"] = (L, self.conv_dim)
        return shapes

    _MAMBA_MAP = {"mamba.in_proj.weight": ("in_proj", True),
                  "mamba.conv1d.bias": ("conv_b", False),
                  "mamba.dt_bias": ("dt_bias", False),
                  "mamba.A_log": ("A_log", False),
                  "mamba.D": ("D", False),
                  "mamba.norm.weight": ("gated_norm_w", False),
                  "mamba.out_proj.weight": ("out_proj", True)}

    # Mamba-2 SSD mixer (scalar-decay multihead scan).
    from aphrodite_tpu.models.mamba import Mamba2ForCausalLM as _M2
    _mixer = _M2._mixer
    del _M2
