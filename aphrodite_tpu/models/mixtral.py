"""Mixtral / Qwen2-MoE: sparse mixture-of-experts decoder.

Parity: aphrodite/modeling/models/mixtral.py + layers/fused_moe (SURVEY.md
§2.4 MoE row). The MoE block is computed as a scan over experts with a
weighted dense combine — each expert's weights stream from HBM exactly once
per step (bandwidth-optimal for decode, where most experts are hit anyway);
a grouped-GEMM Pallas kernel for prefill FLOP-optimality is the documented
follow-up. Expert tensors keep their intermediate dim sharded across `tp`
like the dense MLP; expert-parallel placement (experts sharded across the
mesh + all-to-all) is expressed by swapping the PartitionSpec on the
expert dim.
"""
from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.layers.common import rms_norm
from aphrodite_tpu.models.llama import LlamaForCausalLM


class MixtralForCausalLM(LlamaForCausalLM):

    # Set by the worker when ParallelConfig.enable_expert_parallel: experts
    # are sharded across the `tp` mesh axis instead of each expert's
    # intermediate dim, and the MoE math switches from scan-over-experts to
    # a dense einsum over the (sharded) expert dim.
    expert_parallel = False

    def __init__(self, config):
        hf = config.text_config
        self.num_experts = getattr(hf, "num_local_experts",
                                   getattr(hf, "num_experts", 8))
        self.top_k = getattr(hf, "num_experts_per_tok", 2)
        self.norm_topk = getattr(hf, "norm_topk_prob", True)
        # Qwen2-MoE always-on shared expert (+ sigmoid gate).
        self.shared_intermediate = getattr(
            hf, "shared_expert_intermediate_size", 0) or 0
        super().__init__(config)
        # MoE expert width (Qwen2-MoE uses a distinct moe_intermediate_size).
        self.intermediate_size = getattr(hf, "moe_intermediate_size",
                                         hf.intermediate_size)

    # ------------------------------------------------------------------ params
    def _layer_shapes(self) -> dict[str, tuple]:
        shapes = super()._layer_shapes()
        H, I, L, E = (self.hidden_size, self.intermediate_size,
                      self.num_layers, self.num_experts)
        for k in ("w_gate", "w_up", "w_down"):
            del shapes[k]
        shapes.update({
            "router": (L, H, E),
            "we_gate": (L, E, H, I),
            "we_up": (L, E, H, I),
            "we_down": (L, E, I, H),
        })
        if self.shared_intermediate:
            Is = self.shared_intermediate
            shapes.update({
                "ws_gate": (L, H, Is),
                "ws_up": (L, H, Is),
                "ws_down": (L, Is, H),
                "ws_route": (L, H, 1),
            })
        return shapes

    _HF_LAYER_MAP = dict(LlamaForCausalLM._HF_LAYER_MAP)
    for _k in ("mlp.gate_proj.weight", "mlp.up_proj.weight",
               "mlp.down_proj.weight"):
        _HF_LAYER_MAP.pop(_k)

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        """Route expert tensors into [L, E, ...] buffers; delegate the rest."""
        expert_parts: list[tuple[str, np.ndarray]] = []

        def split(ws):
            for name, w in ws:
                if ".block_sparse_moe." in name or ".mlp.experts." in name \
                        or name.endswith("mlp.gate.weight") \
                        or ".shared_expert" in name:
                    expert_parts.append((name, np.asarray(w)))
                else:
                    yield name, w

        params = super().load_weights(split(weights))
        import ml_dtypes
        target = params["embed"].dtype
        L, E = self.num_layers, self.num_experts
        H, I = self.hidden_size, self.intermediate_size
        bufs = {
            "router": np.zeros((L, H, E), target),
            "we_gate": np.zeros((L, E, H, I), target),
            "we_up": np.zeros((L, E, H, I), target),
            "we_down": np.zeros((L, E, I, H), target),
        }
        if self.shared_intermediate:
            Is = self.shared_intermediate
            bufs.update(ws_gate=np.zeros((L, H, Is), target),
                        ws_up=np.zeros((L, H, Is), target),
                        ws_down=np.zeros((L, Is, H), target),
                        ws_route=np.zeros((L, H, 1), target))
        # Mixtral: block_sparse_moe.gate / experts.N.w{1,2,3};
        # Qwen2-MoE: mlp.gate / mlp.experts.N.{gate,up,down}_proj
        #            + mlp.shared_expert.* / mlp.shared_expert_gate.
        wmap = {"w1": "we_gate", "w3": "we_up", "w2": "we_down",
                "gate_proj": "we_gate", "up_proj": "we_up",
                "down_proj": "we_down"}
        smap = {"gate_proj": "ws_gate", "up_proj": "ws_up",
                "down_proj": "ws_down"}
        for name, w in expert_parts:
            parts = name.split(".")
            li = int(parts[2])
            if name.endswith("shared_expert_gate.weight"):
                bufs["ws_route"][li] = w.T.astype(target)
                continue
            if ".shared_expert." in name:
                key = smap.get(parts[-2])
                if key in bufs:
                    bufs[key][li] = w.T.astype(target)
                continue
            if name.endswith("gate.weight") and "experts" not in name:
                bufs["router"][li] = w.T.astype(target)
                continue
            try:
                ei = int(parts[parts.index("experts") + 1])
            except ValueError:
                continue
            pkey = parts[-2]
            key = wmap.get(pkey)
            if key is not None:
                bufs[key][li, ei] = w.T.astype(target)
        params["layers"].update(bufs)
        return params

    def init_dummy_params(self, rng: jax.Array) -> dict:
        params = super().init_dummy_params(rng)
        return params

    def quant_targets(self) -> list[tuple[str, str]]:
        """Attention mats + per-expert stacks (reference experts_int8,
        quantization/experts_int8.py); the router stays full precision."""
        keys = ["wq", "wk", "wv", "wo", "we_gate", "we_up", "we_down"]
        return [("layers", k) for k in keys]

    def param_specs(self) -> dict:
        specs = super().param_specs()
        for k in ("w_gate", "w_up", "w_down"):
            specs["layers"].pop(k, None)
        if self.expert_parallel:
            # EP: shard the expert dim E across tp; each device holds E/tp
            # whole experts, computes their contribution locally, and GSPMD
            # all-reduces the weighted combine (one psum per MoE block).
            specs["layers"].update({
                "router": P(),
                "we_gate": P(None, "tp", None, None),
                "we_up": P(None, "tp", None, None),
                "we_down": P(None, "tp", None, None),
            })
        else:
            expert_specs = {
                "we_gate": P(None, None, None, "tp"),
                "we_up": P(None, None, None, "tp"),
                "we_down": P(None, None, "tp", None),
            }
            if self.quant_fmt in ("int8", "w8a16", "fp8"):
                skey = "weight_scale" if self.quant_fmt == "fp8" \
                    else "scales"
                expert_specs = {
                    k: {"qweight": s, skey: P(None, None, s[3])}
                    for k, s in expert_specs.items()}
            specs["layers"].update({"router": P(), **expert_specs})
        if self.shared_intermediate:
            specs["layers"].update({
                "ws_gate": P(None, None, "tp"),
                "ws_up": P(None, None, "tp"),
                "ws_down": P(None, "tp", None),
                "ws_route": P(),
            })
        return specs

    # ----------------------------------------------------------------- forward
    def _mlp(self, h: jax.Array, lp: dict, lin=None) -> jax.Array:
        from aphrodite_tpu.models.moe_common import (moe_combine,
                                                     softmax_topk_routing)
        topi, topw = softmax_topk_routing(h, lp["router"], self.top_k,
                                          self.norm_topk)
        out = moe_combine(h, lp, self.act, topi, topw,
                          quant_fmt=self.quant_fmt,
                          expert_parallel=self.expert_parallel,
                          num_experts=self.num_experts)
        if self.shared_intermediate:
            from aphrodite_tpu.layers.linear import apply_linear
            s = self.act(apply_linear(h, lp["ws_gate"]),
                         apply_linear(h, lp["ws_up"]))
            s = apply_linear(s, lp["ws_down"])
            gate = jax.nn.sigmoid(
                jnp.dot(h, lp["ws_route"],
                        preferred_element_type=jnp.float32)).astype(h.dtype)
            out = out + gate * s
        return out


class Qwen2MoeForCausalLM(MixtralForCausalLM):
    qkv_bias = True

    def __init__(self, config):
        super().__init__(config)
        hf = config.text_config
        if getattr(hf, "mlp_only_layers", None) or \
                getattr(hf, "decoder_sparse_step", 1) != 1:
            raise NotImplementedError(
                "mixed dense/MoE layer stacks (mlp_only_layers / "
                "decoder_sparse_step != 1) break the uniform layer scan")


class Qwen3MoeForCausalLM(Qwen2MoeForCausalLM):
    """Qwen3-MoE: Qwen2-MoE routing (norm_topk_prob) + Qwen3 attention
    (no qkv bias, per-head RMS q/k norm). Reference:
    aphrodite/modeling/models/qwen3_moe.py."""
    qkv_bias = False

    def _layer_shapes(self):
        shapes = super()._layer_shapes()
        shapes["q_norm"] = (self.num_layers, self.head_dim)
        shapes["k_norm"] = (self.num_layers, self.head_dim)
        return shapes

    _HF_LAYER_MAP = dict(MixtralForCausalLM._HF_LAYER_MAP)
    _HF_LAYER_MAP.update({
        "self_attn.q_norm.weight": ("q_norm", False),
        "self_attn.k_norm.weight": ("k_norm", False),
    })

    def param_specs(self):
        specs = super().param_specs()
        specs["layers"]["q_norm"] = P()
        specs["layers"]["k_norm"] = P()
        return specs


class OlmoeForCausalLM(MixtralForCausalLM):
    """OLMoE: Mixtral-style MoE (64 experts, top-8, norm_topk_prob=False)
    with *flat* RMS q/k-norm over the whole projection. Reference:
    aphrodite/modeling/models/olmoe.py."""

    def _layer_shapes(self):
        shapes = super()._layer_shapes()
        nq, nkv, hd = self.num_heads, self.num_kv_heads, self.head_dim
        shapes["q_norm_flat"] = (self.num_layers, nq * hd)
        shapes["k_norm_flat"] = (self.num_layers, nkv * hd)
        return shapes

    _HF_LAYER_MAP = dict(MixtralForCausalLM._HF_LAYER_MAP)
    _HF_LAYER_MAP.update({
        "self_attn.q_norm.weight": ("q_norm_flat", False),
        "self_attn.k_norm.weight": ("k_norm_flat", False),
    })

    def param_specs(self):
        specs = super().param_specs()
        specs["layers"]["q_norm_flat"] = P()
        specs["layers"]["k_norm_flat"] = P()
        return specs
