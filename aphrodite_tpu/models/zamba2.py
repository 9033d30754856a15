"""Zamba2: Mamba-2 backbone + cycled SHARED transformer blocks.

Parity: aphrodite/modeling/models/zamba2.py (HF Zamba2). Every layer is a
Mamba-2 mixer layer; the layers in ``hybrid_layer_ids`` additionally run a
shared attention+MLP block on ``concat(hidden, embeddings)`` (2H wide),
project it back with a per-layer untied linear, and ADD it to the mixer
input: ``x <- x + mamba(norm(x + linear(shared(cat(x, emb)))))``. The
shared blocks are cycled (``num_mem_blocks``) and specialized per use by
small LoRA adapters on q/k/v and the fused gate_up (HF stores the tied
block under every hybrid layer, so loading each layer's own copy is
value-identical — replication costs a few percent of the weights and keeps
the stacked-scan layout).

Hybrid cache: conv/ssm state slots for EVERY layer + paged KV for the
hybrid layers' shared attention (rotary when ``use_mem_rope``).
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
from aphrodite_tpu.layers.rotary import apply_rope
from aphrodite_tpu.models.mamba import Mamba2ForCausalLM


class Zamba2ForCausalLM:

    is_ssm = True
    is_hybrid = True
    pp_size = 1
    mesh = None
    sequence_parallel = False
    quant_fmt = None
    expert_parallel = False

    # Mamba-2 SSD mixer (models/mamba.py).
    _mixer = Mamba2ForCausalLM._mixer

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
        self.act = ACT2MUL[getattr(hf, "hidden_act", "gelu")]
        self.tie_embeddings = getattr(hf, "tie_word_embeddings", True)
        # Shared attention geometry (input is 2H wide).
        self.num_heads = hf.num_attention_heads
        self.num_kv_heads = getattr(hf, "num_key_value_heads",
                                    hf.num_attention_heads)
        self.head_dim = getattr(hf, "attention_head_dim",
                                2 * self.hidden_size
                                // hf.num_attention_heads)
        self.attn_hidden = 2 * self.hidden_size
        self.scale = (self.head_dim / 2) ** -0.5  # HF Zamba2Attention
        self.sliding_window = None
        self.use_mem_rope = getattr(hf, "use_mem_rope", False)
        self.adapter_rank = getattr(hf, "adapter_rank", 128)
        self.use_attn_adapter = getattr(hf, "use_shared_attention_adapter",
                                        False)
        if self.use_mem_rope:
            base = getattr(hf, "rope_theta", 10000.0)
            hd = self.head_dim
            self._inv_freq = jnp.asarray(
                base ** -(np.arange(0, hd, 2, dtype=np.float64) / hd),
                jnp.float32)
        # Mamba-2 geometry (Mamba2ForCausalLM mixer attribute names).
        self.d_inner = getattr(hf, "mamba_expand", 2) * hf.hidden_size
        self.d_state = getattr(hf, "mamba_d_state", 64)
        self.d_conv = getattr(hf, "mamba_d_conv", 4)
        self.head_dim_m2 = getattr(hf, "mamba_headdim", 64)
        self.n_heads = self.d_inner // self.head_dim_m2
        self.n_groups = getattr(hf, "mamba_ngroups", 1)
        self.conv_dim = self.d_inner + 2 * self.n_groups * self.d_state
        self.dt_limit = (0.0, float("inf"))
        self.use_conv_bias = getattr(hf, "use_conv_bias", True)

        self.hybrid_ids = list(getattr(hf, "hybrid_layer_ids", None) or [])
        if not self.hybrid_ids:
            lbt = getattr(hf, "layers_block_type", None) or []
            self.hybrid_ids = [i for i, t in enumerate(lbt)
                               if t == "hybrid"]
        self.is_hybrid_layer = [i in set(self.hybrid_ids)
                                for i in range(self.num_layers)]
        self.num_hybrid = len(self.hybrid_ids)
        # Contiguous runs of (has_shared_block?) segments; every layer has
        # a mamba mixer so conv/ssm ordinals == layer index.
        self.runs: list[tuple[bool, int, int, int]] = []
        self.hyb_ordinal = []
        nh = 0
        for i in range(self.num_layers):
            hyb = self.is_hybrid_layer[i]
            self.hyb_ordinal.append(nh)
            if hyb:
                nh += 1
            if self.runs and self.runs[-1][0] == hyb:
                k, s, _, ks = self.runs[-1]
                self.runs[-1] = (k, s, i + 1, ks)
            else:
                self.runs.append((hyb, i, i + 1, self.hyb_ordinal[i]))

    def set_quant_config(self, qcfg) -> None:
        raise NotImplementedError("quantized Zamba2: follow-up")

    # ------------------------------------------------------------- state cache
    def init_cache(self, num_slots: int, cache_config=None, kv_dtype=None,
                   use_pallas: bool = False) -> dict:
        cache = {
            "conv": jnp.zeros((self.num_layers, num_slots, self.d_conv - 1,
                               self.conv_dim), self.dtype),
            "ssm": jnp.zeros((self.num_layers, num_slots, self.n_heads,
                              self.head_dim_m2, self.d_state), jnp.float32),
        }
        if self.num_hybrid and cache_config is not None:
            shape = (self.num_hybrid,) + kv_cache_shape(
                cache_config.num_blocks, cache_config.block_size,
                self.num_kv_heads, self.head_dim, pad_head_dim=use_pallas)
            cache["pages"] = jnp.zeros(shape, kv_dtype or self.dtype)
        return cache

    def cache_specs(self) -> dict:
        return {"conv": P(), "ssm": P(),
                "pages": P(None, None, None, "tp", None, None)}

    # ------------------------------------------------------------------ params
    def _mamba_shapes(self) -> dict[str, tuple]:
        H, Di, L = self.hidden_size, self.d_inner, self.num_layers
        nh, K = self.n_heads, self.d_conv
        shapes = {
            "input_norm": (L, H),
            "in_proj": (L, H, Di + self.conv_dim + nh),
            "conv_w": (L, K, self.conv_dim),
            "conv_b": (L, self.conv_dim),
            "dt_bias": (L, nh),
            "A_log": (L, nh),
            "D": (L, nh),
            "gated_norm_w": (L, Di),
            "out_proj": (L, Di, H),
        }
        return shapes

    def _hybrid_shapes(self) -> dict[str, tuple]:
        H, A, I = self.hidden_size, self.attn_hidden, self.intermediate_size
        Hh = self.num_hybrid
        nq, nkv, hd, r = (self.num_heads, self.num_kv_heads, self.head_dim,
                          self.adapter_rank)
        shapes = {
            "in_ln": (Hh, A),
            "wq": (Hh, A, nq * hd), "wk": (Hh, A, nkv * hd),
            "wv": (Hh, A, nkv * hd), "wo": (Hh, nq * hd, H),
            "pre_ff_ln": (Hh, H),
            "gate_up": (Hh, H, 2 * I),
            "gu_A": (Hh, H, r), "gu_B": (Hh, r, 2 * I),
            "down": (Hh, I, H),
            "out_linear": (Hh, H, H),
        }
        if self.use_attn_adapter:
            shapes.update(qa_A=(Hh, A, r), qa_B=(Hh, r, nq * hd),
                          ka_A=(Hh, A, r), ka_B=(Hh, r, nkv * hd),
                          va_A=(Hh, A, r), va_B=(Hh, r, nkv * hd))
        return shapes

    def init_dummy_params(self, rng: jax.Array) -> dict:
        keys = iter(jax.random.split(rng, 128))

        def fill(shapes):
            out = {}
            for k, s in shapes.items():
                if "norm" in k or k.endswith("_ln"):
                    out[k] = jnp.ones(s, self.dtype)
                elif k == "A_log":
                    out[k] = jnp.log(jnp.broadcast_to(
                        jnp.arange(1, s[-1] + 1, dtype=jnp.float32), s))
                elif k in ("D",):
                    out[k] = jnp.ones(s, self.dtype)
                elif k.endswith("_b") or k == "dt_bias":
                    out[k] = jnp.zeros(s, self.dtype)
                else:
                    out[k] = (0.02 * jax.random.normal(
                        next(keys), s, jnp.float32)).astype(self.dtype)
            return out

        params = {
            "embed": (0.02 * jax.random.normal(
                next(keys), (self.vocab_size, self.hidden_size),
                jnp.float32)).astype(self.dtype),
            "layers": fill(self._mamba_shapes()),
            "final_norm": jnp.ones((self.hidden_size,), self.dtype),
        }
        if self.num_hybrid:
            params["hybrid"] = fill(self._hybrid_shapes())
        if not self.tie_embeddings:
            params["lm_head"] = (0.02 * jax.random.normal(
                next(keys), (self.hidden_size, self.vocab_size),
                jnp.float32)).astype(self.dtype)
        return params

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        mam = {k: np.zeros(s, np.float32 if k == "A_log" else target)
               for k, s in self._mamba_shapes().items()}
        hyb = {k: np.zeros(s, target)
               for k, s in self._hybrid_shapes().items()} \
            if self.num_hybrid else None
        params: dict = {"layers": mam}
        num_blocks = max(1, len(set(
            j % max(1, getattr(self.config.text_config, "num_mem_blocks",
                               1)) for j in range(self.num_hybrid))))
        mmap = {
            "input_layernorm.weight": ("input_norm", False),
            "mamba.in_proj.weight": ("in_proj", True),
            "mamba.conv1d.bias": ("conv_b", False),
            "mamba.dt_bias": ("dt_bias", False),
            "mamba.A_log": ("A_log", False),
            "mamba.D": ("D", False),
            "mamba.norm.weight": ("gated_norm_w", False),
            "mamba.out_proj.weight": ("out_proj", True),
        }
        smap = {
            "input_layernorm.weight": ("in_ln", False),
            "self_attn.q_proj.weight": ("wq", True),
            "self_attn.k_proj.weight": ("wk", True),
            "self_attn.v_proj.weight": ("wv", True),
            "self_attn.o_proj.weight": ("wo", True),
            "pre_ff_layernorm.weight": ("pre_ff_ln", False),
            "feed_forward.gate_up_proj.weight": ("gate_up", True),
            "feed_forward.down_proj.weight": ("down", True),
        }
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
                if self.is_hybrid_layer[li]:
                    hi = self.hyb_ordinal[li]
                    if sub == "linear.weight":
                        hyb["out_linear"][hi] = w.T.astype(target)
                        continue
                    if sub.startswith("mamba_decoder."):
                        m = mmap.get(sub[len("mamba_decoder."):])
                        if m is None and sub.endswith("conv1d.weight"):
                            mam["conv_w"][li] = w[:, 0, :].T.astype(target)
                            continue
                        if m is not None:
                            key, tr = m
                            mam[key][li] = (w.T if tr else w).astype(
                                mam[key].dtype)
                        continue
                    if sub.startswith("shared_transformer."):
                        rest = sub[len("shared_transformer."):]
                        B = max(1, getattr(self.config.text_config,
                                           "num_mem_blocks", 1))
                        # Per-use adapters: *_adapter_list.<j>.{0,1}.weight
                        # — the LIST INDEX is the consuming hybrid ordinal
                        # (hub checkpoints dedup tied blocks, so the layer
                        # name the adapter appears under is arbitrary).
                        if "_adapter_list." in rest:
                            head, tail = rest.split("_adapter_list.", 1)
                            j_s, which, _ = tail.split(".", 2)
                            j = int(j_s)
                            pre = {"self_attn.linear_q": "qa",
                                   "self_attn.linear_k": "ka",
                                   "self_attn.linear_v": "va",
                                   "feed_forward.gate_up_proj": "gu"}.get(
                                       head)
                            if pre is None or hyb is None or \
                                    f"{pre}_A" not in hyb or \
                                    j >= self.num_hybrid:
                                continue
                            key = f"{pre}_{'A' if which == '0' else 'B'}"
                            hyb[key][j] = w.T.astype(target)
                            continue
                        m = smap.get(rest)
                        if m is not None:
                            key, tr = m
                            wv = (w.T if tr else w).astype(target)
                            # Block-tied: broadcast to every hybrid ordinal
                            # cycled onto this block.
                            for j in range(self.num_hybrid):
                                if j % B == hi % B:
                                    hyb[key][j] = wv
                        continue
                else:
                    if sub.endswith("mamba.conv1d.weight"):
                        mam["conv_w"][li] = w[:, 0, :].T.astype(target)
                        continue
                    m = mmap.get(sub)
                    if m is not None:
                        key, tr = m
                        mam[key][li] = (w.T if tr else w).astype(
                            mam[key].dtype)
        if "embed" not in params:
            raise ValueError("checkpoint missing model.embed_tokens.weight")
        if hyb is not None:
            params["hybrid"] = hyb
        _ = num_blocks
        return params

    def param_specs(self) -> dict:
        specs = {
            "embed": P("tp", None),
            "layers": {k: P() for k in self._mamba_shapes()},
            "final_norm": P(),
        }
        if self.num_hybrid:
            specs["hybrid"] = {k: P() for k in self._hybrid_shapes()}
        if not self.tie_embeddings:
            specs["lm_head"] = P(None, "tp")
        return specs

    # ----------------------------------------------------------------- forward
    def _shared_block(self, x, emb0, lp, pg, md, cos, sin, use_pallas):
        T = x.shape[0]
        nq, nkv, hd = self.num_heads, self.num_kv_heads, self.head_dim
        t = jnp.concatenate([x, emb0], axis=-1)
        t = rms_norm(t, lp["in_ln"], self.rms_eps)

        def proj(w, a, b):
            y = jnp.dot(t, w, preferred_element_type=jnp.float32
                        ).astype(t.dtype)
            if a is not None:
                y = y + jnp.dot(jnp.dot(t, a), b,
                                preferred_element_type=jnp.float32
                                ).astype(t.dtype)
            return y

        q = proj(lp["wq"], lp.get("qa_A"), lp.get("qa_B")).reshape(T, nq, hd)
        k = proj(lp["wk"], lp.get("ka_A"), lp.get("ka_B")).reshape(T, nkv,
                                                                   hd)
        v = proj(lp["wv"], lp.get("va_A"), lp.get("va_B")).reshape(T, nkv,
                                                                   hd)
        if cos is not None:
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
        pg = write_kv(pg, k, v, md.slot_mapping)
        o = paged_attention(q, pg, md, self.scale, use_pallas=use_pallas)
        h = jnp.dot(o.reshape(T, nq * hd), lp["wo"],
                    preferred_element_type=jnp.float32).astype(x.dtype)
        h = rms_norm(h, lp["pre_ff_ln"], self.rms_eps)
        gu = jnp.dot(h, lp["gate_up"],
                     preferred_element_type=jnp.float32).astype(x.dtype)
        gu = gu + jnp.dot(jnp.dot(h, lp["gu_A"]), lp["gu_B"],
                          preferred_element_type=jnp.float32
                          ).astype(x.dtype)
        gate, up = jnp.split(gu, 2, axis=-1)
        h = self.act(gate, up)
        h = jnp.dot(h, lp["down"],
                    preferred_element_type=jnp.float32).astype(x.dtype)
        t_out = jnp.dot(h, lp["out_linear"],
                        preferred_element_type=jnp.float32).astype(x.dtype)
        return t_out, pg

    def apply(self, params: dict, input_ids: jax.Array, kv_cache: dict,
              md: AttentionMetadata, *, use_pallas: bool = False,
              lora: dict | None = None, mm=None):
        if lora is not None:
            raise NotImplementedError("LoRA on Zamba2: follow-up")
        x = jnp.take(params["embed"], input_ids, axis=0)
        if mm is not None:
            mm_embeds, mm_idx = mm
            x = x.at[mm_idx].set(mm_embeds.astype(x.dtype), mode="drop")
        emb0 = x
        conv, ssm = kv_cache["conv"], kv_cache["ssm"]
        pages = kv_cache.get("pages")
        cos = sin = None
        if self.use_mem_rope:
            ang = (md.token_pos.astype(jnp.float32)[:, None]
                   * self._inv_freq[None, :])
            cos, sin = jnp.cos(ang), jnp.sin(ang)

        def mamba_step(x, lp, conv_l, ssm_l, t=None):
            h = x + t if t is not None else x
            h = rms_norm(h, lp["input_norm"], self.rms_eps)
            out, (conv_l, ssm_l) = self._mixer(h, lp, (conv_l, ssm_l), md)
            return x + out, conv_l, ssm_l

        def plain_body(x, xs):
            lp, conv_l, ssm_l = xs
            x, conv_l, ssm_l = mamba_step(x, lp, conv_l, ssm_l)
            return x, (conv_l, ssm_l)

        def hybrid_body(x, xs):
            (lp, hp), (conv_l, ssm_l, pg) = xs
            t, pg = self._shared_block(x, emb0, hp, pg, md, cos, sin,
                                       use_pallas)
            x, conv_l, ssm_l = mamba_step(x, lp, conv_l, ssm_l, t)
            return x, (conv_l, ssm_l, pg)

        sl = jax.tree.map
        for hyb, s, e, hs in self.runs:
            n = e - s
            mstack = sl(lambda a: a[s:e], params["layers"])
            if hyb:
                hstack = sl(lambda a: a[hs:hs + n], params["hybrid"])
                x, (cseg, sseg, pseg) = jax.lax.scan(
                    hybrid_body, x,
                    ((mstack, hstack),
                     (conv[s:e], ssm[s:e], pages[hs:hs + n])))
                pages = jax.lax.dynamic_update_slice_in_dim(
                    pages, pseg, hs, axis=0)
            else:
                x, (cseg, sseg) = jax.lax.scan(
                    plain_body, x, (mstack, conv[s:e], ssm[s:e]))
            conv = jax.lax.dynamic_update_slice_in_dim(conv, cseg, s,
                                                       axis=0)
            ssm = jax.lax.dynamic_update_slice_in_dim(ssm, sseg, s, axis=0)
        x = rms_norm(x, params["final_norm"], self.rms_eps)
        out = {"conv": conv, "ssm": ssm}
        if pages is not None:
            out["pages"] = pages
        return x, out

    def compute_logits(self, params: dict, hidden: jax.Array) -> jax.Array:
        head = params["embed"].T if self.tie_embeddings \
            else params["lm_head"]
        return jnp.dot(hidden, head, preferred_element_type=jnp.float32)
