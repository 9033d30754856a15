"""Wave-3 decoder variants: fused-QKV remote-code families + Grok-1.

Covers (reference files under aphrodite/modeling/models/):
- QWenLMHeadModel    (qwen.py)      — Qwen v1: RMSNorm + rope, fused c_attn
  with bias, gated silu MLP stored as w1/w2 with intermediate_size//2.
- JAISLMHeadModel    (jais.py)      — GPT2-conv1d weight layout, ALiBi or
  learned positions, muP scales (embeddings_scale / width_scale /
  scale_qk_dot_by_d => 1/d attention scale), swiglu or dense-gelu MLP.
- ChatGLMModel       (chatglm.py)   — GLM-2/3 lineage: fused query_key_value
  with bias, interleaved half-rotary (rotary_dim=head_dim//2,
  is_neox_style=False when original_rope), merged dense_h_to_4h=[gate|up],
  RMSNorm-or-LayerNorm switch.
- TeleChat2ForCausalLM (telechat2.py) — llama geometry, per-head interleaved
  fused key_value, biases only on o_proj/down_proj.
- TeleFLMForCausalLM (teleflm.py)   — llama + muP input/output multipliers.
- Fairseq2LlamaForCausalLM (fairseq2_llama.py) — llama under fairseq2 naming
  with interleaved-rotary q/k storage (un-permuted at load).
- Grok1ModelForCausalLM (grok1.py)  — Mixtral-shaped MoE with sandwich norms,
  30*tanh(x/30) router and attention-logit softcaps, attention-output /
  embedding / final-logit multipliers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from aphrodite_tpu.layers.common import ACT2MUL
from aphrodite_tpu.models.llama_variants import (_DENSE_ACTS, _LLAMA_ATTN_MAP,
                                                 _LLAMA_GATED_MLP_MAP,
                                                 _LLAMA_TOP, _LN_MAP,
                                                 FlexibleDecoder)
from aphrodite_tpu.models.moe_common import moe_combine


class QWenLMHeadModel(FlexibleDecoder):
    """HF 'QWenLMHeadModel' (reference modeling/models/qwen.py): Qwen v1.

    RMSNorm, full rotary, fused ``c_attn`` (straight q|k|v concat, bias),
    gated-silu MLP stored as w1(up)/w2(gate) with half the declared
    ``intermediate_size`` (qwen.py:160 passes intermediate_size // 2)."""

    norm_kind = "rms"
    norm_bias = False
    attn_bias = True
    attn_out_bias = False

    _TOP_MAP = {
        "transformer.wte.weight": ("embed", False),
        "transformer.ln_f.weight": ("final_norm_w", False),
        "lm_head.weight": ("lm_head", True),
    }
    _LAYER_PREFIX = "transformer.h."
    _LAYER_MAP = {
        "ln_1.weight": ("ln1_w", False),
        "ln_2.weight": ("ln2_w", False),
        "attn.c_proj.weight": ("wo", True),
        # reference qwen.py:290-291: gate_up = [w2, w1] => w2 is the gate.
        "mlp.w2.weight": ("w_gate", True),
        "mlp.w1.weight": ("w_up", True),
        "mlp.c_proj.weight": ("w_down", True),
    }

    def _setup(self, hf):
        self.norm_eps = getattr(hf, "layer_norm_epsilon", 1e-6)
        self.mlp_kind = "gated"
        self.act = ACT2MUL["silu"]
        self.intermediate_size = hf.intermediate_size // 2

    def _special_weight(self, sub, li, w, bufs, target):
        if sub not in ("attn.c_attn.weight", "attn.c_attn.bias"):
            return False
        D = self.num_heads * self.head_dim
        if sub.endswith("weight"):
            bufs["wq"][li] = w[:D].T.astype(target)
            bufs["wk"][li] = w[D:2 * D].T.astype(target)
            bufs["wv"][li] = w[2 * D:].T.astype(target)
        else:
            bufs["bq"][li] = w[:D].astype(target)
            bufs["bk"][li] = w[D:2 * D].astype(target)
            bufs["bv"][li] = w[2 * D:].astype(target)
        return True


class JAISLMHeadModel(FlexibleDecoder):
    """HF 'JAISLMHeadModel' (reference modeling/models/jais.py).

    GPT-2 lineage with Conv1D weight storage ([in, out] — loaded without
    transpose), ALiBi (or learned) positions, LayerNorm+bias, and muP:
    embeddings are scaled by ``embeddings_scale``, logits by ``width_scale``,
    and ``scale_qk_dot_by_d`` switches the attention scale from d^-0.5 to
    d^-1 (jais.py:89-92). MLP is swiglu (c_fc2 = gate) or dense."""

    norm_kind = "ln"
    attn_bias = True
    attn_out_bias = True
    mlp_bias = True
    tie_default = True

    _TOP_MAP = {
        "transformer.wte.weight": ("embed", False),
        "transformer.wpe.weight": ("pos_embed", False),
        "transformer.ln_f.weight": ("final_norm_w", False),
        "transformer.ln_f.bias": ("final_norm_b", False),
        "lm_head.weight": ("lm_head", True),
    }
    _LAYER_PREFIX = "transformer.h."

    def _setup(self, hf):
        self.norm_eps = getattr(hf, "layer_norm_epsilon", 1e-5)
        self.intermediate_size = getattr(hf, "n_inner", None) or \
            4 * self.hidden_size
        self.swiglu = getattr(hf, "activation_function",
                              "gelu_new") == "swiglu"
        lmap = {
            "ln_1.weight": ("ln1_w", False),
            "ln_1.bias": ("ln1_b", False),
            "ln_2.weight": ("ln2_w", False),
            "ln_2.bias": ("ln2_b", False),
            # Conv1D: stored [in, out]; our layout wants [in, out] too.
            "attn.c_proj.weight": ("wo", False),
            "attn.c_proj.bias": ("bo", False),
        }
        if self.swiglu:
            self.mlp_kind = "gated"
            self.act = ACT2MUL["silu"]
            lmap.update({
                # SwiGLUActivation(x1, x2) = x1 * silu(x2); x2 = c_fc2 out.
                "mlp.c_fc2.weight": ("w_gate", False),
                "mlp.c_fc2.bias": ("b_gate", False),
                "mlp.c_fc.weight": ("w_up", False),
                "mlp.c_fc.bias": ("b_up", False),
                "mlp.c_proj.weight": ("w_down", False),
                "mlp.c_proj.bias": ("b_down", False),
            })
        else:
            self.mlp_kind = "dense"
            self.act = _DENSE_ACTS[getattr(hf, "activation_function",
                                           "gelu_new")]
            lmap.update({
                "mlp.c_fc.weight": ("fc1_w", False),
                "mlp.c_fc.bias": ("fc1_b", False),
                "mlp.c_proj.weight": ("fc2_w", False),
                "mlp.c_proj.bias": ("fc2_b", False),
            })
        self._LAYER_MAP = lmap
        if getattr(hf, "position_embedding_type", "learned") == "alibi":
            self.positions = "alibi"
        else:
            self.positions = "learned"
            self.max_positions = getattr(hf, "max_position_embeddings", 2048)
        # muP scaling knobs (jais.py:233-236, :89-92).
        self.embedding_multiplier = float(
            getattr(hf, "embeddings_scale", None)
            or getattr(hf, "mup_embeddings_scale", 1.0))
        self.logits_multiplier = float(
            getattr(hf, "width_scale", None)
            or getattr(hf, "mup_output_alpha", 1.0)
            * getattr(hf, "mup_width_scale", 1.0))
        scale_by_d = getattr(hf, "scale_qk_dot_by_d", None)
        if scale_by_d is None:
            scale_by_d = getattr(hf, "mup_scale_qk_dot_by_d", False)
        if scale_by_d:
            self.scale = 1.0 / self.head_dim

    def _special_weight(self, sub, li, w, bufs, target):
        if sub not in ("attn.c_attn.weight", "attn.c_attn.bias"):
            return False
        D = self.num_heads * self.head_dim
        if sub.endswith("weight"):  # Conv1D [in, 3*out]
            bufs["wq"][li] = w[:, :D].astype(target)
            bufs["wk"][li] = w[:, D:2 * D].astype(target)
            bufs["wv"][li] = w[:, 2 * D:].astype(target)
        else:
            bufs["bq"][li] = w[:D].astype(target)
            bufs["bk"][li] = w[D:2 * D].astype(target)
            bufs["bv"][li] = w[2 * D:].astype(target)
        return True


class ChatGLMModel(FlexibleDecoder):
    """HF 'ChatGLMModel'/'ChatGLMForConditionalGeneration' (reference
    modeling/models/chatglm.py): GLM-2/3 text stack.

    Fused ``query_key_value`` (straight q|k|v concat, bias on QKV only),
    half-dim interleaved rotary (rotary_dim = head_dim // 2, interleaved
    unless ``original_rope`` is false, chatglm.py:90-98), base scaled by
    ``rope_ratio``, merged ``dense_h_to_4h`` = [gate | up] swiglu, RMSNorm
    or LayerNorm per ``config.rmsnorm``."""

    attn_bias = True
    attn_out_bias = False

    _TOP_MAP = {
        "transformer.embedding.word_embeddings.weight": ("embed", False),
        "transformer.encoder.final_layernorm.weight": ("final_norm_w", False),
        "transformer.encoder.final_layernorm.bias": ("final_norm_b", False),
        "transformer.output_layer.weight": ("lm_head", True),
    }
    _LAYER_PREFIX = "transformer.encoder.layers."
    _LAYER_MAP = {
        "input_layernorm.weight": ("ln1_w", False),
        "input_layernorm.bias": ("ln1_b", False),
        "post_attention_layernorm.weight": ("ln2_w", False),
        "post_attention_layernorm.bias": ("ln2_b", False),
        "self_attention.dense.weight": ("wo", True),
        "mlp.dense_4h_to_h.weight": ("w_down", True),
    }

    def _setup(self, hf):
        rmsnorm = getattr(hf, "rmsnorm", True)
        self.norm_kind = "rms" if rmsnorm else "ln"
        self.norm_bias = not rmsnorm
        self.norm_eps = getattr(hf, "layernorm_epsilon", 1e-5)
        self.final_norm = getattr(hf, "post_layer_norm", True)
        self.mlp_kind = "gated"
        self.act = ACT2MUL["silu"]
        self.intermediate_size = getattr(hf, "ffn_hidden_size",
                                         4 * self.hidden_size)
        if getattr(hf, "multi_query_attention", False):
            self.num_kv_heads = getattr(hf, "multi_query_group_num", 2)
        self.attn_bias = getattr(hf, "add_qkv_bias",
                                 getattr(hf, "add_bias_linear", False))
        self.attn_out_bias = getattr(hf, "add_bias_linear", False)
        self.rope_interleaved = getattr(hf, "original_rope", True)
        hf.rotary_dim = self.head_dim // 2
        hf.rope_theta = 10000.0 * getattr(hf, "rope_ratio", 1.0)
        self.tie_embeddings = getattr(hf, "tie_word_embeddings", False)

    def _special_weight(self, sub, li, w, bufs, target):
        if sub in ("self_attention.query_key_value.weight",
                   "self_attention.query_key_value.bias"):
            Dq = self.num_heads * self.head_dim
            Dkv = self.num_kv_heads * self.head_dim
            if sub.endswith("weight"):
                bufs["wq"][li] = w[:Dq].T.astype(target)
                bufs["wk"][li] = w[Dq:Dq + Dkv].T.astype(target)
                bufs["wv"][li] = w[Dq + Dkv:].T.astype(target)
            else:
                bufs["bq"][li] = w[:Dq].astype(target)
                bufs["bk"][li] = w[Dq:Dq + Dkv].astype(target)
                bufs["bv"][li] = w[Dq + Dkv:].astype(target)
            return True
        if sub == "mlp.dense_h_to_4h.weight":
            I = self.intermediate_size
            bufs["w_gate"][li] = w[:I].T.astype(target)
            bufs["w_up"][li] = w[I:].T.astype(target)
            return True
        return False


class TeleChat2ForCausalLM(FlexibleDecoder):
    """HF 'TeleChat2ForCausalLM' (reference modeling/models/telechat2.py):
    llama geometry; ``key_value`` is fused per-head [k_i|v_i] interleaved
    (telechat2.py:62-72); biases only on the attention output and MLP down
    projections."""

    norm_kind = "rms"
    norm_bias = False
    attn_out_bias = True
    mlp_bias = True

    _TOP_MAP = {
        "transformer.word_embeddings.weight": ("embed", False),
        "transformer.ln_f.weight": ("final_norm_w", False),
        "lm_head.weight": ("lm_head", True),
    }
    _LAYER_PREFIX = "transformer.h."
    _LAYER_MAP = {
        "input_layernorm.weight": ("ln1_w", False),
        "post_attention_layernorm.weight": ("ln2_w", False),
        "self_attention.query.weight": ("wq", True),
        "self_attention.dense.weight": ("wo", True),
        "self_attention.dense.bias": ("bo", False),
        "mlp.gate_proj.weight": ("w_gate", True),
        "mlp.up_proj.weight": ("w_up", True),
        "mlp.down_proj.weight": ("w_down", True),
        "mlp.down_proj.bias": ("b_down", False),
    }

    def _setup(self, hf):
        self.norm_eps = getattr(hf, "rms_norm_eps",
                                getattr(hf, "layer_norm_epsilon", 1e-5))
        self.mlp_kind = "gated"
        self.act = ACT2MUL["silu"]

    def _layer_shapes(self):
        shapes = super()._layer_shapes()
        # gate/up carry no bias; only down does.
        shapes.pop("b_gate", None)
        shapes.pop("b_up", None)
        return shapes

    def _special_weight(self, sub, li, w, bufs, target):
        if sub != "self_attention.key_value.weight":
            return False
        nkv, hd = self.num_kv_heads, self.head_dim
        kv = w.reshape(nkv, 2, hd, self.hidden_size)
        bufs["wk"][li] = kv[:, 0].reshape(nkv * hd, -1).T.astype(target)
        bufs["wv"][li] = kv[:, 1].reshape(nkv * hd, -1).T.astype(target)
        return True


class TeleFLMForCausalLM(FlexibleDecoder):
    """HF 'TeleFLMForCausalLM' (reference modeling/models/teleflm.py): llama
    with muP — embeddings scaled by ``input_mult``, logits by
    ``output_mult / mup_scale_factor`` when ``use_mup``."""

    norm_kind = "rms"
    norm_bias = False

    _TOP_MAP = _LLAMA_TOP
    _LAYER_MAP = {**_LLAMA_ATTN_MAP, **_LLAMA_GATED_MLP_MAP, **_LN_MAP}

    def _setup(self, hf):
        self.norm_eps = getattr(hf, "rms_norm_eps", 1e-6)
        self.mlp_kind = "gated"
        self.act = ACT2MUL[getattr(hf, "hidden_act", "silu")]
        if getattr(hf, "use_mup", False):
            self.embedding_multiplier = float(getattr(hf, "input_mult", 1.0))
            self.logits_multiplier = float(
                getattr(hf, "output_mult", 1.0)) / float(
                    getattr(hf, "mup_scale_factor", 1.0))


class Fairseq2LlamaForCausalLM(FlexibleDecoder):
    """HF 'Fairseq2LlamaForCausalLM' (reference
    modeling/models/fairseq2_llama.py): llama under fairseq2 naming; q/k
    projections are stored in interleaved-rotary row order and un-permuted
    to rotate-half order at load (fairseq2_llama.py:106-115)."""

    norm_kind = "rms"
    norm_bias = False

    _TOP_MAP = {
        "decoder_frontend.embed.weight": ("embed", False),
        "decoder.layer_norm.weight": ("final_norm_w", False),
        "final_proj.weight": ("lm_head", True),
    }
    _LAYER_PREFIX = "decoder.layers."
    _LAYER_MAP = {
        "self_attn.v_proj.weight": ("wv", True),
        "self_attn.output_proj.weight": ("wo", True),
        "self_attn_layer_norm.weight": ("ln1_w", False),
        "ffn.gate_proj.weight": ("w_gate", True),
        "ffn.inner_proj.weight": ("w_up", True),
        "ffn.output_proj.weight": ("w_down", True),
        "ffn_layer_norm.weight": ("ln2_w", False),
    }

    def _setup(self, hf):
        self.norm_eps = getattr(hf, "rms_norm_eps", 1e-6)
        self.mlp_kind = "gated"
        self.act = ACT2MUL["silu"]

    def _special_weight(self, sub, li, w, bufs, target):
        if sub not in ("self_attn.q_proj.weight", "self_attn.k_proj.weight"):
            return False
        n = self.num_heads if sub.startswith("self_attn.q") \
            else self.num_kv_heads
        hd, H = self.head_dim, self.hidden_size
        w = w.reshape(n, hd // 2, 2, H).transpose(0, 2, 1, 3).reshape(
            n * hd, H)
        bufs["wq" if sub.startswith("self_attn.q") else "wk"][li] = \
            w.T.astype(target)
        return True


class Grok1ModelForCausalLM(FlexibleDecoder):
    """HF 'Grok1ModelForCausalLM' (reference modeling/models/grok1.py):
    Mixtral-shaped MoE with Grok-specific scaling:

    - sandwich norms (pre/post_attn_norm + pre/post_moe_norm, :251-289),
    - attention-logit softcap (default 30.0, :174-183) and router-logit
      30*tanh(x/30) squash (:108),
    - attention-output / embedding / final-logit multipliers
      (:200-204, :312-337, :518-522).
    Expert checkpoints use linear (gate) / linear_v (up) / linear_1 (down)
    under ``moe_block.experts.{e}`` (:388-390)."""

    norm_kind = "rms"
    norm_bias = False
    sandwich_norm = True
    mlp_kind = "moe"

    _TOP_MAP = {
        "model.embed_tokens.weight": ("embed", False),
        "model.norm.scale": ("final_norm_w", False),
        "model.norm.weight": ("final_norm_w", False),
        "lm_head.weight": ("lm_head", True),
    }
    _LAYER_PREFIX = "model.layers."
    _LAYER_MAP = {
        "self_attn.q_proj.weight": ("wq", True),
        "self_attn.k_proj.weight": ("wk", True),
        "self_attn.v_proj.weight": ("wv", True),
        "self_attn.o_proj.weight": ("wo", True),
        "pre_attn_norm.scale": ("ln1_w", False),
        "post_attn_norm.scale": ("ln1_post_w", False),
        "pre_moe_norm.scale": ("ln2_w", False),
        "post_moe_norm.scale": ("ln2_post_w", False),
        "pre_attn_norm.weight": ("ln1_w", False),
        "post_attn_norm.weight": ("ln1_post_w", False),
        "pre_moe_norm.weight": ("ln2_w", False),
        "post_moe_norm.weight": ("ln2_post_w", False),
        "moe_block.gate.weight": ("router", True),
    }

    def _setup(self, hf):
        self.norm_eps = getattr(hf, "rms_norm_eps", 1e-5)
        self.act = ACT2MUL["silu"]
        self.num_experts = getattr(hf, "num_experts", 8)
        self.top_k = getattr(hf, "num_experts_per_tok", 2)
        self.intermediate_size = getattr(hf, "intermediate_size", None) or \
            getattr(hf, "moe_intermediate_size", 4 * self.hidden_size)
        self.attn_soft_cap = max(
            getattr(hf, "attn_logit_softcapping", 30.0) or 0.0, 0.0) or None
        self.router_soft_cap = 30.0
        self.attn_output_multiplier = float(
            getattr(hf, "attn_output_multiplier", 1.0) or 1.0)
        self.embedding_multiplier = float(
            getattr(hf, "embedding_multiplier_scale", 1.0) or 1.0)
        self.logits_multiplier = float(
            getattr(hf, "output_multiplier_scale", 1.0) or 1.0)
        self.tie_embeddings = getattr(hf, "tie_word_embeddings", True)

    def _special_weight(self, sub, li, w, bufs, target):
        if not sub.startswith("moe_block.experts."):
            return False
        parts = sub.split(".")
        e = int(parts[2])
        which = {"linear": "we_gate", "linear_v": "we_up",
                 "linear_1": "we_down"}.get(parts[3])
        if which is None:
            return False
        bufs[which][li, e] = w.T.astype(target)
        return True

    def _moe_mlp(self, h, lp):
        logits = jnp.dot(h, lp["router"],
                         preferred_element_type=jnp.float32)
        c = self.router_soft_cap
        logits = c * jnp.tanh(logits / c)
        probs = jax.nn.softmax(logits, axis=-1)
        topw, topi = jax.lax.top_k(probs, self.top_k)
        topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
        return moe_combine(h, lp, self.act, topi.astype(jnp.int32), topw,
                           quant_fmt=self.quant_fmt,
                           expert_parallel=self.expert_parallel,
                          mesh=self.mesh,
                           num_experts=self.num_experts)
