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

    # Shared expert combine uses a sigmoid router gate (Qwen2-MoE). DeepSeek
    # V1 adds the shared expert unconditionally (no gate).
    shared_gate = True

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
        self.dense_intermediate = hf.intermediate_size
        self.intermediate_size = getattr(hf, "moe_intermediate_size",
                                         hf.intermediate_size)
        self._init_layer_kinds(hf)

    def _init_layer_kinds(self, hf) -> None:
        """Mixed dense/MoE stacks: DeepSeek V1's first_k_dense_replace /
        moe_layer_freq and Qwen2-MoE's decoder_sparse_step / mlp_only_layers
        (reference deepseek.py:380, qwen2_moe.py:270). Contiguous runs of
        same-kind layers each get their own lax.scan (deepseek.py pattern)."""
        first_dense = getattr(hf, "first_k_dense_replace", 0) or 0
        freq = getattr(hf, "moe_layer_freq", None) or 1
        step = getattr(hf, "decoder_sparse_step", 1) or 1
        mlp_only = set(getattr(hf, "mlp_only_layers", None) or [])
        self.layer_kinds = [
            "moe" if (i >= first_dense and i % freq == 0
                      and i not in mlp_only and (i + 1) % step == 0)
            else "dense"
            for i in range(self.num_layers)
        ]
        self.mixed = "dense" in self.layer_kinds
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
        # layer index -> position within its kind's stack
        self.kind_pos, off2 = [], {"dense": 0, "moe": 0}
        for kind in self.layer_kinds:
            self.kind_pos.append(off2[kind])
            off2[kind] += 1

    # ------------------------------------------------------------------ params
    def _moe_bufs_shapes(self, Lm: int) -> dict[str, tuple]:
        H, I, E = self.hidden_size, self.intermediate_size, self.num_experts
        shapes = {
            "router": (Lm, H, E),
            "we_gate": (Lm, E, H, I),
            "we_up": (Lm, E, H, I),
            "we_down": (Lm, E, I, H),
        }
        if self.shared_intermediate:
            Is = self.shared_intermediate
            shapes.update({
                "ws_gate": (Lm, H, Is),
                "ws_up": (Lm, H, Is),
                "ws_down": (Lm, Is, H),
            })
            if self.shared_gate:
                shapes["ws_route"] = (Lm, H, 1)
        return shapes

    def _dense_mlp_shapes(self) -> dict[str, tuple]:
        H, Id, Ld = self.hidden_size, self.dense_intermediate, self.num_dense
        return {"w_gate": (Ld, H, Id), "w_up": (Ld, H, Id),
                "w_down": (Ld, Id, H)}

    def _layer_shapes(self) -> dict[str, tuple]:
        shapes = super()._layer_shapes()
        for k in ("w_gate", "w_up", "w_down"):
            del shapes[k]
        if not self.mixed:
            shapes.update(self._moe_bufs_shapes(self.num_layers))
        return shapes

    _HF_LAYER_MAP = dict(LlamaForCausalLM._HF_LAYER_MAP)
    for _k in ("mlp.gate_proj.weight", "mlp.up_proj.weight",
               "mlp.down_proj.weight"):
        _HF_LAYER_MAP.pop(_k)

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        """Route expert tensors into [Lm, E, ...] buffers (and, on mixed
        stacks, dense-layer MLP tensors into a [Ld, ...] stack); delegate
        the rest."""
        expert_parts: list[tuple[str, np.ndarray]] = []

        def split(ws):
            for name, w in ws:
                if ".block_sparse_moe." in name or ".mlp." in name:
                    expert_parts.append((name, np.asarray(w)))
                else:
                    yield name, w

        params = super().load_weights(split(weights))
        import ml_dtypes  # noqa: F401
        target = params["embed"].dtype
        Lm = self.num_moe if self.mixed else self.num_layers
        bufs = {k: np.zeros(s, target)
                for k, s in self._moe_bufs_shapes(Lm).items()}
        dense = {k: np.zeros(s, target)
                 for k, s in self._dense_mlp_shapes().items()} \
            if self.mixed else None
        # Mixtral: block_sparse_moe.gate / experts.N.w{1,2,3};
        # Qwen2-MoE: mlp.gate / mlp.experts.N.{gate,up,down}_proj
        #            + mlp.shared_expert.* / mlp.shared_expert_gate;
        # DeepSeek V1: mlp.gate / mlp.experts.N.* / mlp.shared_experts.*
        #              + dense-layer mlp.{gate,up,down}_proj.
        wmap = {"w1": "we_gate", "w3": "we_up", "w2": "we_down",
                "gate_proj": "we_gate", "up_proj": "we_up",
                "down_proj": "we_down"}
        smap = {"gate_proj": "ws_gate", "up_proj": "ws_up",
                "down_proj": "ws_down"}
        dmap = {"gate_proj": "w_gate", "up_proj": "w_up",
                "down_proj": "w_down"}
        for name, w in expert_parts:
            parts = name.split(".")
            li = int(parts[2])
            ki = self.kind_pos[li]
            if self.mixed and self.layer_kinds[li] == "dense":
                key = dmap.get(parts[-2])
                if key is not None:
                    dense[key][ki] = w.T.astype(target)
                continue
            if name.endswith("shared_expert_gate.weight"):
                if "ws_route" in bufs:
                    bufs["ws_route"][ki] = w.T.astype(target)
                continue
            if ".shared_expert" in name:
                key = smap.get(parts[-2])
                if key in bufs:
                    bufs[key][ki] = w.T.astype(target)
                continue
            if name.endswith("gate.weight") and "experts" not in name:
                bufs["router"][ki] = w.T.astype(target)
                continue
            try:
                ei = int(parts[parts.index("experts") + 1])
            except ValueError:
                continue
            pkey = parts[-2]
            key = wmap.get(pkey)
            if key is not None:
                bufs[key][ki, ei] = w.T.astype(target)
        if self.mixed:
            params["moe"] = bufs
            params["dense_mlp"] = dense
        else:
            params["layers"].update(bufs)
        return params

    def init_dummy_params(self, rng: jax.Array) -> dict:
        params = super().init_dummy_params(rng)
        if self.mixed:
            keys = iter(jax.random.split(jax.random.fold_in(rng, 7), 16))

            def mk(shape):
                return (0.02 * jax.random.normal(next(keys), shape,
                                                 jnp.float32)
                        ).astype(self.dtype)

            params["moe"] = {k: mk(s) for k, s in
                             self._moe_bufs_shapes(self.num_moe).items()}
            params["dense_mlp"] = {k: mk(s) for k, s in
                                   self._dense_mlp_shapes().items()}
        return params

    def quant_targets(self) -> list[tuple[str, str]]:
        """Attention mats + per-expert stacks (reference experts_int8,
        quantization/experts_int8.py); the router stays full precision."""
        attn = [("layers", k) for k in ("wq", "wk", "wv", "wo")]
        moe_keys = ("we_gate", "we_up", "we_down")
        if self.mixed:
            return attn + [("moe", k) for k in moe_keys] + \
                [("dense_mlp", k) for k in ("w_gate", "w_up", "w_down")]
        return attn + [("layers", k) for k in moe_keys]

    def _moe_specs(self) -> dict:
        if self.expert_parallel:
            # EP: shard the expert dim E across tp; each device holds E/tp
            # whole experts, runs the sorted-token grouped GEMM over its
            # local range (moe_common._ep_moe), one psum per MoE block.
            # Quantized expert dicts shard every leaf on the expert dim.
            ep = P(None, "tp", None, None)
            if self.quant_fmt is not None:
                skey = "weight_scale" if self.quant_fmt == "fp8" \
                    else "scales"
                espec = {"qweight": ep, skey: P(None, "tp", None)}
            else:
                espec = ep
            moe = {
                "router": P(),
                "we_gate": espec,
                "we_up": espec,
                "we_down": espec,
            }
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
            moe = {"router": P(), **expert_specs}
        if self.shared_intermediate:
            moe.update({
                "ws_gate": P(None, None, "tp"),
                "ws_up": P(None, None, "tp"),
                "ws_down": P(None, "tp", None),
            })
            if self.shared_gate:
                moe["ws_route"] = P()
        return moe

    def param_specs(self) -> dict:
        specs = super().param_specs()
        dense = {k: specs["layers"].pop(k)
                 for k in ("w_gate", "w_up", "w_down")}
        if self.mixed:
            specs["dense_mlp"] = dense
            specs["moe"] = self._moe_specs()
        else:
            specs["layers"].update(self._moe_specs())
        return specs

    # ----------------------------------------------------------------- forward
    @property
    def _window_forward_ok(self) -> bool:
        """MoE models take the window-decode path too (VERDICT r2 #6): the
        base window branch already routes the MLP through self._mlp, and
        mixed stacks get the segmented _scan_stack_window below. Excluded
        only when a subclass replaced apply/_scan_stack wholesale
        (e.g. Llama4's own forward)."""
        return (type(self).apply is MixtralForCausalLM.apply
                and type(self)._scan_stack is MixtralForCausalLM._scan_stack)

    def apply(self, *args, **kwargs):
        if self.mixed and self.pp_size > 1:
            raise NotImplementedError(
                "pipeline parallelism for mixed dense/MoE stacks: follow-up")
        return super().apply(*args, **kwargs)

    def _scan_stack_window(self, layer_w, carry, scan_layers, params):
        """Mixed dense/MoE window scan: one lax.scan per same-kind run with
        the run's MLP stack merged in; the tail buffers ride the carry
        whole (layer-id indexed writes)."""
        if not self.mixed:
            return super()._scan_stack_window(layer_w, carry, scan_layers,
                                              params)
        for kind, s, e, ks in self.runs:
            ke = ks + (e - s)
            common = jax.tree.map(lambda a: a[s:e], scan_layers)
            stack = jax.tree.map(
                lambda a: a[ks:ke],
                params["moe" if kind == "moe" else "dense_mlp"])
            carry, _ = jax.lax.scan(
                layer_w, carry,
                ({**common, **stack}, jnp.arange(s, e)))
        return carry

    def _scan_stack(self, layer, x, scan_layers, kv_cache, params):
        """Mixed stacks: one lax.scan per contiguous run of same-kind layers,
        merging the run's MLP stack slice into the common attention slice;
        the KV segment is written back in place (deepseek.py pattern)."""
        if not self.mixed:
            return super()._scan_stack(layer, x, scan_layers, kv_cache,
                                       params)
        for kind, s, e, ks in self.runs:
            ke = ks + (e - s)
            common = jax.tree.map(lambda a: a[s:e], scan_layers)
            stack = jax.tree.map(
                lambda a: a[ks:ke],
                params["moe" if kind == "moe" else "dense_mlp"])
            x, seg = jax.lax.scan(layer, x,
                                  ({**common, **stack}, kv_cache[s:e]))
            kv_cache = jax.lax.dynamic_update_slice_in_dim(
                kv_cache, seg, s, axis=0)
        return x, kv_cache

    def _mlp(self, h: jax.Array, lp: dict, lin=None) -> jax.Array:
        if "router" not in lp:  # dense layer of a mixed stack
            return super()._mlp(h, lp, lin=lin)
        from aphrodite_tpu.models.moe_common import (moe_combine,
                                                     softmax_topk_routing)
        topi, topw = softmax_topk_routing(h, lp["router"], self.top_k,
                                          self.norm_topk)
        out = moe_combine(h, lp, self.act, topi, topw,
                          quant_fmt=self.quant_fmt,
                          expert_parallel=self.expert_parallel,
                          mesh=self.mesh,
                          num_experts=self.num_experts)
        if self.shared_intermediate:
            from aphrodite_tpu.layers.linear import apply_linear
            s = self.act(apply_linear(h, lp["ws_gate"]),
                         apply_linear(h, lp["ws_up"]))
            s = apply_linear(s, lp["ws_down"])
            if self.shared_gate:
                gate = jax.nn.sigmoid(
                    jnp.dot(h, lp["ws_route"],
                            preferred_element_type=jnp.float32)
                ).astype(h.dtype)
                s = gate * s
            out = out + s
        return out


class Qwen2MoeForCausalLM(MixtralForCausalLM):
    qkv_bias = True


class DeepseekForCausalLM(MixtralForCausalLM):
    """DeepSeek V1 MoE (deepseek-moe-16b; reference
    aphrodite/modeling/models/deepseek.py): llama attention + softmax top-k
    routing (norm_topk_prob=False), first_k_dense_replace dense layers /
    moe_layer_freq, and n_shared_experts always-on shared MLP with NO
    sigmoid gate (deepseek.py DeepseekMoE shared_experts)."""

    shared_gate = False

    def __init__(self, config):
        super().__init__(config)
        hf = config.text_config
        self.num_experts = getattr(hf, "n_routed_experts", self.num_experts)
        self.top_k = getattr(hf, "num_experts_per_tok", self.top_k)
        n_shared = getattr(hf, "n_shared_experts", 0) or 0
        self.shared_intermediate = n_shared * self.intermediate_size


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
