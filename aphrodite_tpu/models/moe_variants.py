"""MoE decoders outside the Llama lineage: GraniteMoE, PhiMoE, DBRX.

Built on FlexibleDecoder (mlp_kind="moe") + the shared expert combine in
moe_common. Per-family mechanisms:

- GraniteMoE (reference modeling/models/granitemoe.py): Granite's four
  static multipliers + per-expert packed input_linear [E, 2I, H]
  (gate‖up on the output dim) and output_linear [E, H, I]; top-k routing is
  softmax over the selected logits (algebraically Mixtral's renormalized
  softmax-then-top-k).
- PhiMoE (reference modeling/models/phimoe.py): LayerNorm residual stream,
  sparsemixer routing — two argmax rounds over threshold-masked logits with
  unnormalized softmax multipliers.
- DBRX (reference modeling/models/dbrx.py): bias-free LayerNorm, fused
  straight-split Wqkv with clamp, experts packed as w1/v1/w2 [E*I, H] (w2
  consumed untransposed), p-norm weight normalization.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from aphrodite_tpu.layers.common import ACT2MUL
from aphrodite_tpu.models.llama_variants import (_DENSE_ACTS,  # noqa: F401
                                                 _LLAMA_ATTN_MAP, _LLAMA_TOP,
                                                 _LN_MAP, FlexibleDecoder)
from aphrodite_tpu.models.moe_common import (moe_combine,
                                             softmax_topk_routing,
                                             sparsemixer_routing)


class GraniteMoeForCausalLM(FlexibleDecoder):

    mlp_kind = "moe"
    tie_default = True

    _TOP_MAP = _LLAMA_TOP
    _LAYER_MAP = {**_LLAMA_ATTN_MAP, **_LN_MAP}

    def _setup(self, hf):
        self.norm_kind = "rms"
        self.norm_bias = False
        self.norm_eps = getattr(hf, "rms_norm_eps", 1e-6)
        self.act = ACT2MUL[getattr(hf, "hidden_act", "silu")]
        self.attn_bias = getattr(hf, "attention_bias", False)
        self.embedding_multiplier = getattr(hf, "embedding_multiplier", 1.0)
        self.residual_multiplier = getattr(hf, "residual_multiplier", 1.0)
        self.scale = getattr(hf, "attention_multiplier",
                             self.head_dim ** -0.5)
        self.logits_multiplier = 1.0 / getattr(hf, "logits_scaling", 1.0)
        self.num_experts = getattr(hf, "num_local_experts", 8)
        self.top_k = getattr(hf, "num_experts_per_tok", 2)

    def _special_weight(self, sub, li, w, bufs, target):
        I = self.intermediate_size
        if sub == "block_sparse_moe.router.layer.weight":
            bufs["router"][li] = w.T.astype(target)  # [E,H] -> [H,E]
            return True
        if sub == "block_sparse_moe.input_linear.weight":  # [E, 2I, H]
            bufs["we_gate"][li] = np.swapaxes(w[:, :I], 1, 2).astype(target)
            bufs["we_up"][li] = np.swapaxes(w[:, I:], 1, 2).astype(target)
            return True
        if sub == "block_sparse_moe.output_linear.weight":  # [E, H, I]
            bufs["we_down"][li] = np.swapaxes(w, 1, 2).astype(target)
            return True
        return False

    def _moe_mlp(self, h, lp):
        # HF GraniteMoeTopKGating: top-k logits -> softmax over the k ==
        # softmax-then-top-k renormalized.
        topi, topw = softmax_topk_routing(h, lp["router"], self.top_k,
                                          norm_topk=True)
        return moe_combine(h, lp, self.act, topi, topw,
                           quant_fmt=self.quant_fmt,
                           expert_parallel=self.expert_parallel,
                          mesh=self.mesh,
                           num_experts=self.num_experts)


class GraniteMoeSharedForCausalLM(GraniteMoeForCausalLM):
    """GraniteMoeShared: GraniteMoE plus an always-on dense shared MLP
    (shared_mlp.input_linear packs gate‖up) added to every MoE output."""

    def _setup(self, hf):
        super()._setup(hf)
        self.shared_intermediate = getattr(hf, "shared_intermediate_size", 0)

    def _layer_shapes(self):
        shapes = super()._layer_shapes()
        if self.shared_intermediate:
            L, H = self.num_layers, self.hidden_size
            Is = self.shared_intermediate
            shapes.update(ws_gate=(L, H, Is), ws_up=(L, H, Is),
                          ws_down=(L, Is, H))
        return shapes

    def _special_weight(self, sub, li, w, bufs, target):
        if sub == "shared_mlp.input_linear.weight":  # [2Is, H]
            Is = self.shared_intermediate
            bufs["ws_gate"][li] = w[:Is].T.astype(target)
            bufs["ws_up"][li] = w[Is:].T.astype(target)
            return True
        if sub == "shared_mlp.output_linear.weight":  # [H, Is]
            bufs["ws_down"][li] = w.T.astype(target)
            return True
        return super()._special_weight(sub, li, w, bufs, target)

    def _moe_mlp(self, h, lp):
        out = super()._moe_mlp(h, lp)
        if self.shared_intermediate:
            from aphrodite_tpu.layers.linear import apply_linear
            s = self.act(apply_linear(h, lp["ws_gate"]),
                         apply_linear(h, lp["ws_up"]))
            out = out + apply_linear(s, lp["ws_down"])
        return out


class PhiMoEForCausalLM(FlexibleDecoder):

    mlp_kind = "moe"

    _TOP_MAP = {
        "model.embed_tokens.weight": ("embed", False),
        "model.norm.weight": ("final_norm_w", False),
        "model.norm.bias": ("final_norm_b", False),
        "lm_head.weight": ("lm_head", True),
        "lm_head.bias": ("lm_head_b", False),
    }
    _LAYER_MAP = {**_LLAMA_ATTN_MAP, **_LN_MAP}

    def _setup(self, hf):
        self.norm_kind = "ln"
        self.norm_bias = True
        self.norm_eps = getattr(hf, "rms_norm_eps", 1e-5)
        self.act = ACT2MUL[getattr(hf, "hidden_act", "silu")]
        self.attn_bias = getattr(hf, "attention_bias", False)
        self.lm_head_bias = getattr(hf, "lm_head_bias", False)
        self.num_experts = getattr(hf, "num_local_experts", 16)
        self.top_k = getattr(hf, "num_experts_per_tok", 2)
        self.jitter_eps = getattr(hf, "router_jitter_noise", 0.01)

    def _special_weight(self, sub, li, w, bufs, target):
        if sub == "block_sparse_moe.gate.weight":
            bufs["router"][li] = w.T.astype(target)
            return True
        pref = "block_sparse_moe.experts."
        if sub.startswith(pref):
            rest = sub[len(pref):]
            ei_s, tail = rest.split(".", 1)
            key = {"w1.weight": "we_gate", "w3.weight": "we_up",
                   "w2.weight": "we_down"}.get(tail)
            if key:
                bufs[key][li, int(ei_s)] = w.T.astype(target)
            return True
        return False

    def _moe_mlp(self, h, lp):
        topi, topw = sparsemixer_routing(h, lp["router"], self.jitter_eps)
        return moe_combine(h, lp, self.act, topi, topw,
                           quant_fmt=self.quant_fmt,
                           expert_parallel=self.expert_parallel,
                          mesh=self.mesh,
                           num_experts=self.num_experts)


class DbrxForCausalLM(FlexibleDecoder):

    mlp_kind = "moe"

    _TOP_MAP = {
        "transformer.wte.weight": ("embed", False),
        "transformer.norm_f.weight": ("final_norm_w", False),
        "lm_head.weight": ("lm_head", True),
    }
    _LAYER_PREFIX = "transformer.blocks."
    _LAYER_MAP = {
        "norm_attn_norm.norm_1.weight": ("ln1_w", False),
        "norm_attn_norm.norm_2.weight": ("ln2_w", False),
        "norm_attn_norm.attn.out_proj.weight": ("wo", True),
    }

    def _setup(self, hf):
        self.norm_kind = "ln"
        self.norm_bias = False
        self.norm_eps = 1e-5
        ac = getattr(hf, "attn_config", None)
        fc = getattr(hf, "ffn_config", None)
        aget = (lambda k, d=None: getattr(ac, k, d)) if ac is not None \
            else (lambda k, d=None: d)
        fget = (lambda k, d=None: getattr(fc, k, d)) if fc is not None \
            else (lambda k, d=None: d)
        self.clip_qkv = aget("clip_qkv", None)
        self.intermediate_size = fget("ffn_hidden_size", 4 * self.hidden_size)
        act_cfg = fget("ffn_act_fn", None) or {}
        name = act_cfg.get("name", "silu") if isinstance(act_cfg, dict) \
            else "silu"
        self.act = ACT2MUL[name]
        self.num_experts = fget("moe_num_experts", 4)
        self.top_k = fget("moe_top_k", 1)
        self.norm_p = fget("moe_normalize_expert_weights", None)
        # rope_theta lives in attn_config; surface it for the rope setup.
        hf.rope_theta = aget("rope_theta", 10000.0)

    def _special_weight(self, sub, li, w, bufs, target):
        E, I, H = self.num_experts, self.intermediate_size, self.hidden_size
        if sub == "ffn.router.layer.weight":
            bufs["router"][li] = w.T.astype(target)
            return True
        if sub in ("ffn.experts.mlp.w1", "ffn.experts.mlp.v1"):
            key = "we_gate" if sub.endswith("w1") else "we_up"
            bufs[key][li] = np.swapaxes(
                w.reshape(E, I, H), 1, 2).astype(target)  # -> [E, H, I]
            return True
        if sub == "ffn.experts.mlp.w2":
            # HF consumes w2 untransposed: [E, I, H] is already down-proj.
            bufs["we_down"][li] = w.reshape(E, I, H).astype(target)
            return True
        if sub == "norm_attn_norm.attn.Wqkv.weight":
            nq, nkv, hd = self.num_heads, self.num_kv_heads, self.head_dim
            qr, kr = nq * hd, nkv * hd
            bufs["wq"][li] = w[:qr].T.astype(target)
            bufs["wk"][li] = w[qr:qr + kr].T.astype(target)
            bufs["wv"][li] = w[qr + kr:].T.astype(target)
            return True
        return False

    def _moe_mlp(self, h, lp):
        topi, topw = softmax_topk_routing(h, lp["router"], self.top_k,
                                          norm_topk=False)
        if self.norm_p is not None:
            denom = jnp.linalg.norm(topw, ord=self.norm_p, axis=-1,
                                    keepdims=True)
            topw = topw / denom
        return moe_combine(h, lp, self.act, topi, topw,
                           quant_fmt=self.quant_fmt,
                           expert_parallel=self.expert_parallel,
                          mesh=self.mesh,
                           num_experts=self.num_experts)
