"""Gemma 1/2: Google decoder family.

Parity: aphrodite/modeling/models/gemma.py, gemma2.py. Differences from
Llama handled here: embeddings scaled by sqrt(hidden), RMSNorm stored as
(w - 1), GELU-tanh MLP, tied embeddings; Gemma-2 adds sandwich norms
(post-attention/pre+post-feedforward), attention & final-logit soft caps,
query_pre_attn_scalar, and alternating sliding-window layers (expressed as
lax.cond over a per-layer flag so one scan body serves both window types).
"""
from __future__ import annotations

import math
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from aphrodite_tpu.attention import paged_attention, write_kv
from aphrodite_tpu.layers.common import rms_norm
from aphrodite_tpu.layers.linear import apply_linear
from aphrodite_tpu.layers.rotary import apply_rope, compute_cos_sin
from aphrodite_tpu.models.llama import LlamaForCausalLM


class GemmaForCausalLM(LlamaForCausalLM):
    tie_embeddings_default = True

    def __init__(self, config):
        super().__init__(config)
        hf = config.text_config
        self.embed_scale = math.sqrt(self.hidden_size)
        self.norm_offset = 1.0  # weight stored as w-1
        self.act_name = getattr(hf, "hidden_activation",
                                getattr(hf, "hidden_act",
                                        "gelu_pytorch_tanh"))
        from aphrodite_tpu.layers.common import ACT2MUL
        self.act = ACT2MUL.get(self.act_name, ACT2MUL["gelu_pytorch_tanh"])
        qpre = getattr(hf, "query_pre_attn_scalar", None)
        if qpre is not None:
            self.scale = qpre ** -0.5
        self.attn_soft_cap = getattr(hf, "attn_logit_softcapping", None)
        self.final_soft_cap = getattr(hf, "final_logit_softcapping", None)

    def _norm(self, x, w):
        return rms_norm(x, w, self.rms_eps, offset=self.norm_offset)

    def apply(self, params, input_ids, kv_cache, md, *, use_pallas=False,
              lora=None, mm=None):
        if lora is not None:
            raise NotImplementedError(
                "LoRA is not wired into the Gemma forward yet")
        x = jnp.take(params["embed"], input_ids, axis=0)
        if mm is not None:
            mm_embeds, mm_idx = mm
            x = x.at[mm_idx].set(mm_embeds.astype(x.dtype), mode="drop")
        x = (x.astype(jnp.float32) * self.embed_scale).astype(x.dtype)
        cos, sin = compute_cos_sin(md.token_pos, self._inv_freq,
                                   self._rope_mscale)
        # Gemma-3: sliding layers rotate with the *local* frequency base.
        inv_local = getattr(self, "_inv_freq_local", None)
        if inv_local is not None:
            cos_l, sin_l = compute_cos_sin(md.token_pos, inv_local, 1.0)
        nq, nkv, hd = self.num_heads, self.num_kv_heads, self.head_dim

        def layer(x, xs, slots=None):
            lp, kvc = xs
            if slots is None:
                slots = md.slot_mapping
            fmt = self.quant_fmt
            h = self._norm(x, lp["input_norm"])
            q = apply_linear(h, lp["wq"], fmt=fmt)
            k = apply_linear(h, lp["wk"], fmt=fmt)
            v = apply_linear(h, lp["wv"], fmt=fmt)
            T = q.shape[0]
            q = q.reshape(T, nq, hd)
            k = k.reshape(T, nkv, hd)
            if "q_norm" in lp:  # Gemma-3 per-head QK-norm (before rope)
                q = self._norm(q, lp["q_norm"])
                k = self._norm(k, lp["k_norm"])
            if inv_local is not None and "is_sliding" in lp:
                ccos, ssin = jax.lax.cond(
                    lp["is_sliding"] > 0,
                    lambda: (cos_l, sin_l), lambda: (cos, sin))
            else:
                ccos, ssin = cos, sin
            q = apply_rope(q, ccos, ssin)
            k = apply_rope(k, ccos, ssin)
            v = v.reshape(T, nkv, hd)
            kvc = write_kv(kvc, k, v, slots)

            def attn(window):
                return paged_attention(
                    q, kvc, md, self.scale, sliding_window=window,
                    logits_soft_cap=self.attn_soft_cap,
                    use_pallas=use_pallas)

            if self.sliding_window is not None and "is_sliding" in lp:
                o = jax.lax.cond(lp["is_sliding"] > 0,
                                 lambda: attn(self.sliding_window),
                                 lambda: attn(None))
            elif self.sliding_window is not None:
                o = attn(self.sliding_window)
            else:
                o = attn(None)
            o = apply_linear(o.reshape(T, nq * hd), lp["wo"], fmt=fmt)
            if "post_attn_norm" in lp:  # gemma2 sandwich
                o = self._norm(o, lp["post_attn_norm"])
            x = x + o

            if "pre_ffw_norm" in lp:
                h = self._norm(x, lp["pre_ffw_norm"])
            else:
                h = self._norm(x, lp["post_norm"])
            m = self._mlp(h, lp)
            if "post_ffw_norm" in lp:
                m = self._norm(m, lp["post_ffw_norm"])
            x = x + m
            return x, kvc

        if self.pp_size > 1:
            x, new_cache = self._pipeline(layer, x, params["layers"],
                                          kv_cache, md)
        else:
            x, new_cache = jax.lax.scan(layer, x,
                                        (params["layers"], kv_cache))
        x = self._norm(x, params["final_norm"])
        return x, new_cache

    def compute_logits(self, params, hidden):
        logits = super().compute_logits(params, hidden)
        if self.final_soft_cap:
            logits = self.final_soft_cap * jnp.tanh(
                logits / self.final_soft_cap)
        return logits


class Gemma2ForCausalLM(GemmaForCausalLM):

    def _layer_shapes(self):
        shapes = super()._layer_shapes()
        L, H = self.num_layers, self.hidden_size
        shapes.update({
            "post_attn_norm": (L, H),
            "pre_ffw_norm": (L, H),
            "post_ffw_norm": (L, H),
            "is_sliding": (L,),
        })
        return shapes

    _HF_LAYER_MAP = dict(LlamaForCausalLM._HF_LAYER_MAP)
    _HF_LAYER_MAP.update({
        "post_attention_layernorm.weight": ("post_attn_norm", False),
        "pre_feedforward_layernorm.weight": ("pre_ffw_norm", False),
        "post_feedforward_layernorm.weight": ("post_ffw_norm", False),
    })

    def _finish_params(self, params: dict) -> dict:
        # Gemma2 alternates sliding (even) / global (odd) attention layers
        # (HF layer_types or the historical even-sliding convention).
        hf = self.config.text_config
        L = self.num_layers
        layer_types = getattr(hf, "layer_types", None)
        if layer_types:
            flags = np.array(
                [1 if t == "sliding_attention" else 0 for t in layer_types],
                np.int32)
        else:
            flags = np.array([1 if i % 2 == 0 else 0 for i in range(L)],
                             np.int32)
        params["layers"]["is_sliding"] = flags
        return params

    def load_weights(self, weights):
        params = super().load_weights(weights)
        return self._finish_params(params)

    def init_dummy_params(self, rng):
        import jax.numpy as jnp_
        params = super().init_dummy_params(rng)
        params = dict(params)
        params["layers"] = dict(params["layers"])
        self._finish_params(params)
        params["layers"]["is_sliding"] = jnp_.asarray(
            np.asarray(params["layers"]["is_sliding"]))
        return params

    def param_specs(self):
        from jax.sharding import PartitionSpec as P
        specs = super().param_specs()
        specs["layers"].update({
            "post_attn_norm": P(), "pre_ffw_norm": P(),
            "post_ffw_norm": P(), "is_sliding": P(),
        })
        return specs


class Gemma3ForCausalLM(Gemma2ForCausalLM):
    """Gemma-3 text (reference modeling/models/gemma3.py): Gemma-2 sandwich
    norms plus per-head QK-RMSNorm (zero-centered weights, applied before
    rope), a 5-sliding:1-global layer pattern, and *dual rope bases* —
    sliding layers rotate at rope_local_base_freq while global layers use
    the scaled long-context rope. Soft caps are gone."""

    def __init__(self, config):
        super().__init__(config)
        hf = config.text_config
        from aphrodite_tpu.layers.rotary import RopeConfig, compute_inv_freq
        local = RopeConfig(
            head_dim=self.head_dim, rotary_dim=self.head_dim,
            base=getattr(hf, "rope_local_base_freq", 10000.0),
            max_position=getattr(hf, "max_position_embeddings", 8192),
            scaling=None)
        inv_freq_l, _ = compute_inv_freq(local)
        self._inv_freq_local = jnp.asarray(inv_freq_l)

    def _layer_shapes(self):
        shapes = super()._layer_shapes()
        L, hd = self.num_layers, self.head_dim
        shapes.update(q_norm=(L, hd), k_norm=(L, hd))
        return shapes

    _HF_LAYER_MAP = dict(Gemma2ForCausalLM._HF_LAYER_MAP)
    _HF_LAYER_MAP.update({
        "self_attn.q_norm.weight": ("q_norm", False),
        "self_attn.k_norm.weight": ("k_norm", False),
    })

    def param_specs(self):
        from jax.sharding import PartitionSpec as P
        specs = super().param_specs()
        specs["layers"].update(q_norm=P(), k_norm=P())
        return specs
