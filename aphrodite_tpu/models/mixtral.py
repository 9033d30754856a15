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
        # Mixtral: block_sparse_moe.gate / experts.N.w{1,2,3};
        # Qwen2-MoE: mlp.gate / mlp.experts.N.{gate,up,down}_proj.
        wmap = {"w1": "we_gate", "w3": "we_up", "w2": "we_down",
                "gate_proj": "we_gate", "up_proj": "we_up",
                "down_proj": "we_down"}
        for name, w in expert_parts:
            parts = name.split(".")
            li = int(parts[2])
            if name.endswith("gate.weight") and "experts" not in name:
                bufs["router"][li] = w.T.astype(target)
                continue
            try:
                ei = int(parts[parts.index("experts") + 1])
            except ValueError:
                continue  # shared experts: not supported yet
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
        return specs

    # ----------------------------------------------------------------- forward
    def _mlp(self, h: jax.Array, lp: dict, lin=None) -> jax.Array:
        T = h.shape[0]
        logits = jnp.dot(h, lp["router"],
                         preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)  # [T, E]
        topw, topi = jax.lax.top_k(probs, self.top_k)  # [T, k]
        if self.norm_topk:
            topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
        topw = topw.astype(h.dtype)

        from aphrodite_tpu.layers.linear import apply_linear

        def expert(acc, xs):
            wg, wu, wd, e = xs
            y = self.act(apply_linear(h, wg, fmt=self.quant_fmt),
                         apply_linear(h, wu, fmt=self.quant_fmt))
            y = apply_linear(y, wd, fmt=self.quant_fmt)
            gate = jnp.sum(jnp.where(topi == e, topw, 0.0), axis=-1)  # [T]
            return acc + gate[:, None] * y, None

        E = self.num_experts
        if self.expert_parallel and self.quant_fmt is not None:
            raise NotImplementedError(
                "expert parallelism with quantized experts: follow-up")
        if self.expert_parallel:
            # Dense einsum over the expert dim: with we_* sharded P("tp")
            # on E, each device computes only its local experts and the
            # token-expert combine all-reduces across the ep(=tp) axis.
            # [T,E] dense gates (zero for unrouted experts).
            gates = jnp.sum(
                topw[:, :, None] * jax.nn.one_hot(topi, E, dtype=h.dtype),
                axis=1)
            g = jnp.einsum("th,ehi->eti", h, lp["we_gate"],
                           preferred_element_type=jnp.float32).astype(h.dtype)
            u = jnp.einsum("th,ehi->eti", h, lp["we_up"],
                           preferred_element_type=jnp.float32).astype(h.dtype)
            y = jnp.einsum("eti,eio->eto", self.act(g, u), lp["we_down"],
                           preferred_element_type=jnp.float32).astype(h.dtype)
            return jnp.einsum("te,eto->to", gates, y)
        acc0 = jnp.zeros_like(h)
        acc, _ = jax.lax.scan(
            expert, acc0,
            (lp["we_gate"], lp["we_up"], lp["we_down"],
             jnp.arange(E, dtype=jnp.int32)))
        return acc


class Qwen2MoeForCausalLM(MixtralForCausalLM):
    qkv_bias = True
