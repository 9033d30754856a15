"""Phi-3 (fused qkv/gate_up projections) and Qwen3 (per-head QK-norm).

Parity: aphrodite/modeling/models/phi3.py (a llama variant with fused
checkpoint tensors) and qwen3.py (q_norm/k_norm RMS over head_dim).
"""
from __future__ import annotations

from typing import Iterable

import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.llama import LlamaForCausalLM


class Phi3ForCausalLM(LlamaForCausalLM):
    """Phi-3-mini/medium: llama-shaped with fused qkv_proj / gate_up_proj
    checkpoint tensors (split at load) and partial-rotary support via
    RopeConfig."""

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        nq, nkv, hd = self.num_heads, self.num_kv_heads, self.head_dim
        I = self.intermediate_size

        def split(ws):
            for name, w in ws:
                if name.endswith("self_attn.qkv_proj.weight"):
                    w = np.asarray(w)  # [(nq+2nkv)*hd, H]
                    q_rows = nq * hd
                    kv_rows = nkv * hd
                    base = name[:-len("qkv_proj.weight")]
                    yield base + "q_proj.weight", w[:q_rows]
                    yield base + "k_proj.weight", w[q_rows:q_rows + kv_rows]
                    yield base + "v_proj.weight", w[q_rows + kv_rows:]
                elif name.endswith("mlp.gate_up_proj.weight"):
                    w = np.asarray(w)  # [2I, H]
                    base = name[:-len("gate_up_proj.weight")]
                    yield base + "gate_proj.weight", w[:I]
                    yield base + "up_proj.weight", w[I:]
                else:
                    yield name, w

        return super().load_weights(split(weights))


class Qwen3ForCausalLM(LlamaForCausalLM):
    """Qwen3: no qkv bias, per-head RMS q/k norms."""
    qkv_bias = False

    def _layer_shapes(self):
        shapes = super()._layer_shapes()
        shapes["q_norm"] = (self.num_layers, self.head_dim)
        shapes["k_norm"] = (self.num_layers, self.head_dim)
        return shapes

    _HF_LAYER_MAP = dict(LlamaForCausalLM._HF_LAYER_MAP)
    _HF_LAYER_MAP.update({
        "self_attn.q_norm.weight": ("q_norm", False),
        "self_attn.k_norm.weight": ("k_norm", False),
    })

    def param_specs(self):
        specs = super().param_specs()
        specs["layers"]["q_norm"] = P()
        specs["layers"]["k_norm"] = P()
        return specs
