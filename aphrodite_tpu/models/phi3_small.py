"""Phi-3-Small (reference: aphrodite/modeling/models/phi3_small.py).

Mechanisms beyond the FlexibleDecoder base:
- blocksparse attention (local blocks + per-head vertical stride,
  reference aphrodite/attention/ops/blocksparse_attention/utils.py:94-218)
  with every ``dense_attention_every_n_layers``-th layer dense — expressed
  as a per-layer ``is_dense`` flag in the scanned stack;
- head-major fused QKV checkpoint rows grouped (kv_head, q_per_kv+2, hd)
  (reference phi3_small.py:236-238), de-interleaved at load;
- gegelu MLP: up_proj output interleaves [gelu|linear] lanes elementwise,
  clamped by ``gegelu_limit`` (reference phi3_small.py:63-75);
- muP scaling: embedding multiplier, attention scale
  ``mup_attn_multiplier / head_dim``, logits divided by
  ``mup_width_multiplier`` (reference phi3_small.py:154-159,437);
- ``dummy_token_indices`` masked to -inf in the logits
  (reference phi3_small.py:435-436).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from aphrodite_tpu.models.llama_variants import _LN_MAP, FlexibleDecoder


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class Phi3SmallForCausalLM(FlexibleDecoder):

    _TOP_MAP = {
        "model.embed_tokens.weight": ("embed", False),
        "model.final_layernorm.weight": ("final_norm_w", False),
        "model.final_layernorm.bias": ("final_norm_b", False),
        "lm_head.weight": ("lm_head", True),
    }
    _LAYER_MAP = {
        **_LN_MAP,
        "self_attn.dense.weight": ("wo", True),
        "self_attn.dense.bias": ("bo", False),
        "mlp.up_proj.weight": ("fc1_w", True),
        "mlp.up_proj.bias": ("fc1_b", False),
        "mlp.down_proj.weight": ("fc2_w", True),
        "mlp.down_proj.bias": ("fc2_b", False),
    }

    def _setup(self, hf):
        self.norm_kind = "ln"
        self.norm_eps = getattr(hf, "layer_norm_epsilon", 1e-5)
        self.mlp_kind = "dense"
        self.mlp_bias = True
        self.attn_bias = True
        self.attn_out_bias = True
        limit = getattr(hf, "gegelu_limit", None)

        def gegelu(x):
            a_gelu, a_lin = x[..., ::2], x[..., 1::2]
            if limit is not None:
                a_gelu = jnp.minimum(a_gelu, limit)
                a_lin = jnp.clip(a_lin, -limit, limit)
            return _quick_gelu(a_gelu) * (a_lin + 1.0)

        self.act = gegelu
        # muP (phi3_small.py:154-159,385-386,437)
        if getattr(hf, "mup_use_scaling", False):
            self.scale = getattr(hf, "mup_attn_multiplier", 1.0) \
                / self.head_dim
        self.embedding_multiplier = getattr(hf, "mup_embedding_multiplier",
                                            0.0) or 1.0
        self.logits_multiplier = 1.0 / getattr(hf, "mup_width_multiplier",
                                               1.0)
        # Rope spelling normalization for the base-class RopeConfig.
        if not hasattr(hf, "rope_theta"):
            hf.rope_theta = getattr(hf, "rope_embedding_base", 10000.0)
        pos_scale = getattr(hf, "rope_position_scale", 1.0)
        scaling = getattr(hf, "rope_scaling", None)
        if scaling is None and pos_scale != 1.0:
            hf.rope_scaling = {"rope_type": "linear", "factor": pos_scale}
        elif scaling is not None and "factor" not in scaling:
            scaling["factor"] = pos_scale
        # Blocksparse pattern.
        bs_sz = getattr(hf, "blocksparse_block_size", None)
        if bs_sz:
            vert = hf.blocksparse_vert_stride
            homo = getattr(hf, "blocksparse_homo_head_pattern", False)
            head_step = 0 if homo else max(1, vert // self.num_heads)
            self.blocksparse = (bs_sz, hf.blocksparse_num_local_blocks,
                                vert, head_step)
        every_n = getattr(hf, "dense_attention_every_n_layers", None)
        self._dense_flags = np.asarray(
            [1.0 if (every_n and (i + 1) % every_n == 0) else 0.0
             for i in range(hf.num_hidden_layers)], np.float32)
        self._dummy_tokens = getattr(hf, "dummy_token_indices", None)

    def _layer_shapes(self):
        shapes = super()._layer_shapes()
        # gegelu halves the up_proj width: fc1 emits 2*I interleaved lanes.
        L, H, I = self.num_layers, self.hidden_size, self.intermediate_size
        shapes["fc1_w"] = (L, H, 2 * I)
        shapes["fc1_b"] = (L, 2 * I)
        if self.blocksparse is not None:
            shapes["is_dense"] = (L,)
        return shapes

    def _special_weight(self, sub, li, w, bufs, target):
        if sub not in ("self_attn.query_key_value.weight",
                       "self_attn.query_key_value.bias"):
            return False
        nq, nkv, hd = self.num_heads, self.num_kv_heads, self.head_dim
        g = nq // nkv
        if sub.endswith("weight"):  # [(g+2)*nkv*hd, H] head-major rows
            qkv = w.reshape(nkv, g + 2, hd, self.hidden_size)
            bufs["wq"][li] = qkv[:, :g].reshape(nq * hd, -1).T.astype(target)
            bufs["wk"][li] = qkv[:, g].reshape(nkv * hd, -1).T.astype(target)
            bufs["wv"][li] = qkv[:, g + 1].reshape(nkv * hd,
                                                   -1).T.astype(target)
        else:
            qkv = w.reshape(nkv, g + 2, hd)
            bufs["bq"][li] = qkv[:, :g].reshape(nq * hd).astype(target)
            bufs["bk"][li] = qkv[:, g].reshape(nkv * hd).astype(target)
            bufs["bv"][li] = qkv[:, g + 1].reshape(nkv * hd).astype(target)
        return True

    def load_weights(self, weights):
        params = super().load_weights(weights)
        if self.blocksparse is not None:
            params["layers"]["is_dense"] = self._dense_flags.astype(
                params["layers"]["is_dense"].dtype)
        return params

    def init_dummy_params(self, rng):
        params = super().init_dummy_params(rng)
        if self.blocksparse is not None:
            params["layers"]["is_dense"] = jnp.asarray(
                self._dense_flags, self.dtype)
        return params

    def compute_logits(self, params, hidden):
        logits = super().compute_logits(params, hidden)
        if self._dummy_tokens:
            idx = jnp.asarray(self._dummy_tokens, jnp.int32)
            logits = logits.at[..., idx].set(-jnp.inf)
        return logits
