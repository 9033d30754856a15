"""Modern-decoder variants: one configurable class, many architectures.

Covers the wide middle of the reference's registry
(aphrodite/modeling/models/{stablelm,starcoder2,phi,gptj,gpt_bigcode,
persimmon,commandr,olmo,olmo2,granite,nemotron}.py) with a single
knob-driven decoder. Mechanisms beyond the Llama family:

- LayerNorm residual streams (with/without bias, affine-free OLMo,
  Nemotron's weight+1 "LayerNorm1P"),
- partial rotary (``partial_rotary_factor`` / ``rotary_dim``) in both the
  NeoX rotate-half and GPT-J/Cohere interleaved conventions,
- parallel attention+MLP residuals sharing one pre-norm (Phi, GPT-J,
  Command-R),
- post-block norm placement (OLMo-2: ``x + norm(attn(x))``),
- QK normalization in three shapes (flat RMS over the whole projection,
  per-head distinct weights, per-head shared weights),
- dense (non-gated) MLPs with relu^2 / gelu_new activations,
- fused QKV checkpoint layouts (per-head interleaved and BigCode MQA rows),
- logit/embedding/residual multipliers (Granite, Command-R) and QKV
  clamping (OLMo).

Everything else — paged KV, continuous batching, sampler, TP specs,
quantize-on-load — is the shared infrastructure. Weights load into stacked
``[L, ...]`` arrays and the forward is one ``lax.scan``, like llama.py.
"""
from __future__ import annotations

from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.attention import (AttentionMetadata, paged_attention,
                                     write_kv)
from aphrodite_tpu.config import ModelConfig
from aphrodite_tpu.layers.common import ACT2MUL, rms_norm
from aphrodite_tpu.layers.linear import apply_linear
from aphrodite_tpu.layers.rotary import (RopeConfig, apply_rope,
                                         apply_rope_interleaved,
                                         compute_cos_sin, compute_inv_freq,
                                         longrope_orig_max)
from aphrodite_tpu.models.vision import layer_norm
from aphrodite_tpu.utils import jax_dtype

_DENSE_ACTS = {
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu_fast": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "relu": jax.nn.relu,
    "relu2": lambda x: jnp.square(jax.nn.relu(x)),
}


class FlexibleDecoder:
    """Knob-driven decoder; subclasses set flags + HF weight maps."""

    # --- residual/norm structure
    norm_kind: str = "ln"          # rms | ln | ln1p | noaffine
    norm_bias: bool = True         # ln/ln1p carry a bias term
    block_norm: str = "pre"        # pre | post (OLMo-2)
    parallel_residual: bool = False
    shared_ln: bool = True         # parallel branches read the same norm
    final_norm: bool = True
    # --- attention
    qk_norm: Optional[str] = None  # flat_rms|per_head_rms|per_head_ln|
    #                                per_head_ln_shared
    qk_norm_bias: bool = False
    rope_interleaved: bool = False
    positions: str = "rope"        # rope | learned | alibi
    pos_offset: int = 0
    attn_bias: bool = False
    attn_out_bias: Optional[bool] = None   # None -> attn_bias
    clip_qkv: Optional[float] = None
    attn_soft_cap: Optional[float] = None  # logit softcap (Grok-1)
    attn_output_multiplier: float = 1.0    # post-o_proj scale (Grok-1)
    # Phi-3-Small blocksparse: (block_size, local_blocks, vert_stride,
    # head_step); layers with a per-layer "is_dense" flag > 0 run dense.
    blocksparse: Optional[tuple] = None
    # --- MLP
    mlp_kind: str = "gated"        # gated | dense
    mlp_bias: bool = False
    # --- extra norm placements
    embed_norm: bool = False       # LayerNorm right after the embedding
    sandwich_norm: bool = False    # extra norm on each branch output (GLM-4)
    # --- head / scaling
    lm_head_bias: bool = False
    tie_default: bool = False
    embedding_multiplier: float = 1.0
    residual_multiplier: float = 1.0
    logits_multiplier: float = 1.0
    # --- interface parity with the worker
    pp_size = 1
    mesh = None
    sequence_parallel = False
    quant_fmt = None
    is_ssm = False
    expert_parallel = False
    # MoE knobs (mlp_kind == "moe"; set by subclass _setup)
    num_experts = 0
    top_k = 2

    # Weight-map hooks (subclass-declared).
    _TOP_MAP: dict = {}            # full ckpt name -> (param key, transpose)
    _LAYER_PREFIX: str = "model.layers."
    _LAYER_MAP: dict = {}          # per-layer suffix -> (key, transpose)

    def __init__(self, config: ModelConfig):
        self.config = config
        hf = config.text_config
        self.dtype = jax_dtype(config.dtype)
        self.hidden_size = config.hidden_size
        self.num_layers = config.num_layers
        self.num_heads = config.num_attention_heads
        self.num_kv_heads = config.num_kv_heads
        self.head_dim = config.head_dim
        self.vocab_size = config.vocab_size
        self.sliding_window = config.sliding_window
        self.scale = self.head_dim ** -0.5
        self.intermediate_size = getattr(hf, "intermediate_size", None) or \
            getattr(hf, "ffn_dim", None) or 4 * self.hidden_size
        self.tie_embeddings = getattr(hf, "tie_word_embeddings",
                                      self.tie_default)
        self._setup(hf)
        if self.attn_out_bias is None:
            self.attn_out_bias = self.attn_bias
        if self.positions == "alibi":
            from aphrodite_tpu.attention.backend import alibi_slopes
            if getattr(self, "_alibi", None) is None:
                self._alibi = alibi_slopes(self.num_heads)
        elif self.positions == "rope":
            pct = getattr(hf, "partial_rotary_factor",
                          getattr(hf, "rotary_pct", 1.0))
            rotary_dim = getattr(hf, "rotary_dim", None) or \
                int(self.head_dim * pct)
            self.rope = RopeConfig(
                head_dim=self.head_dim, rotary_dim=rotary_dim,
                base=getattr(hf, "rope_theta",
                             getattr(hf, "rotary_emb_base", 10000.0)),
                max_position=getattr(hf, "max_position_embeddings", 2048),
                scaling=getattr(hf, "rope_scaling", None))
            inv_freq, mscale = compute_inv_freq(self.rope)
            self._inv_freq = jnp.asarray(inv_freq)
            self._rope_mscale = mscale
            self._longrope_orig_max = longrope_orig_max(self.rope)

    def _setup(self, hf) -> None:  # pragma: no cover - subclass hook
        raise NotImplementedError

    def set_quant_config(self, qcfg) -> None:
        from aphrodite_tpu.quantization.base import runtime_format
        self.quant_fmt = runtime_format(qcfg)

    # ------------------------------------------------------------- geometry
    def _weight_keys(self) -> list[str]:
        keys = ["wq", "wk", "wv", "wo"]
        if self.mlp_kind == "gated":
            keys += ["w_gate", "w_up", "w_down"]
        elif self.mlp_kind == "moe":
            keys += ["we_gate", "we_up", "we_down"]
        else:
            keys += ["fc1_w", "fc2_w"]
        return keys

    def quant_targets(self) -> list[tuple[str, str]]:
        return [("layers", k) for k in self._weight_keys()]

    def _layer_shapes(self) -> dict[str, tuple]:
        H, L = self.hidden_size, self.num_layers
        nq, nkv, hd, I = (self.num_heads, self.num_kv_heads, self.head_dim,
                          self.intermediate_size)
        shapes: dict[str, tuple] = {}
        affine = self.norm_kind != "noaffine"
        if affine:
            shapes["ln1_w"] = (L, H)
            if self.norm_bias:
                shapes["ln1_b"] = (L, H)
        if not (self.parallel_residual and self.shared_ln):
            if affine:
                shapes["ln2_w"] = (L, H)
                if self.norm_bias:
                    shapes["ln2_b"] = (L, H)
        if self.sandwich_norm and affine:
            shapes["ln1_post_w"] = (L, H)
            shapes["ln2_post_w"] = (L, H)
            if self.norm_bias:
                shapes["ln1_post_b"] = (L, H)
                shapes["ln2_post_b"] = (L, H)
        shapes.update(wq=(L, H, nq * hd), wk=(L, H, nkv * hd),
                      wv=(L, H, nkv * hd), wo=(L, nq * hd, H))
        if self.attn_bias:
            shapes.update(bq=(L, nq * hd), bk=(L, nkv * hd),
                          bv=(L, nkv * hd))
        if self.attn_out_bias:
            shapes["bo"] = (L, H)
        if self.qk_norm == "flat_rms":
            shapes.update(q_norm=(L, nq * hd), k_norm=(L, nkv * hd))
        elif self.qk_norm in ("per_head_rms", "per_head_ln_shared"):
            shapes.update(q_norm=(L, hd), k_norm=(L, hd))
            if self.qk_norm_bias:
                shapes.update(q_norm_b=(L, hd), k_norm_b=(L, hd))
        elif self.qk_norm == "per_head_ln":
            shapes.update(q_norm=(L, nq, hd), k_norm=(L, nkv, hd))
            if self.qk_norm_bias:
                shapes.update(q_norm_b=(L, nq, hd), k_norm_b=(L, nkv, hd))
        if self.mlp_kind == "gated":
            shapes.update(w_gate=(L, H, I), w_up=(L, H, I), w_down=(L, I, H))
            if self.mlp_bias:
                shapes.update(b_gate=(L, I), b_up=(L, I), b_down=(L, H))
        elif self.mlp_kind == "moe":
            E = self.num_experts
            shapes.update(router=(L, H, E), we_gate=(L, E, H, I),
                          we_up=(L, E, H, I), we_down=(L, E, I, H))
        else:
            shapes.update(fc1_w=(L, H, I), fc2_w=(L, I, H))
            if self.mlp_bias:
                shapes.update(fc1_b=(L, I), fc2_b=(L, H))
        return shapes

    # --------------------------------------------------------------- params
    def init_dummy_params(self, rng: jax.Array) -> dict:
        keys = iter(jax.random.split(rng, 96))

        def mk(shape):
            return (0.02 * jax.random.normal(next(keys), shape, jnp.float32)
                    ).astype(self.dtype)
        layers = {}
        for k, s in self._layer_shapes().items():
            if "norm" in k and not k.endswith("_b") or k.startswith("ln") \
                    and k.endswith("_w"):
                layers[k] = jnp.ones(s, self.dtype)
            elif k.startswith(("b", "ln")) or k.endswith("_b"):
                layers[k] = jnp.zeros(s, self.dtype)
            else:
                layers[k] = mk(s)
        params: dict = {"embed": mk((self.vocab_size, self.hidden_size)),
                        "layers": layers}
        if self.positions == "learned":
            params["pos_embed"] = mk((self.max_positions, self.hidden_size))
        if self.embed_norm:
            params["embed_ln_w"] = jnp.ones((self.hidden_size,), self.dtype)
            if self.norm_bias:
                params["embed_ln_b"] = jnp.zeros((self.hidden_size,),
                                                 self.dtype)
        if self.final_norm and self.norm_kind != "noaffine":
            params["final_norm_w"] = jnp.ones((self.hidden_size,), self.dtype)
            if self.norm_bias:
                params["final_norm_b"] = jnp.zeros((self.hidden_size,),
                                                   self.dtype)
        if not self.tie_embeddings:
            params["lm_head"] = mk((self.hidden_size, self.vocab_size))
        if self.lm_head_bias:
            params["lm_head_b"] = jnp.zeros((self.vocab_size,), self.dtype)
        return params

    def param_specs(self) -> dict:
        layers = {}
        for k in self._layer_shapes():
            if k in ("wq", "wk", "wv", "w_gate", "w_up", "fc1_w"):
                spec = P(None, None, "tp")
            elif k in ("wo", "w_down", "fc2_w"):
                spec = P(None, "tp", None)
            elif k in ("bq", "bk", "bv", "b_gate", "b_up", "fc1_b"):
                spec = P(None, "tp")
            elif k in ("we_gate", "we_up"):
                spec = P(None, "tp", None, None) if self.expert_parallel \
                    else P(None, None, None, "tp")
            elif k == "we_down":
                spec = P(None, "tp", None, None) if self.expert_parallel \
                    else P(None, None, "tp", None)
            else:
                spec = P()
            layers[k] = spec
        if self.quant_fmt is not None:
            def qspec(wspec):
                out_axis = wspec[2]
                d = {"qweight": wspec}
                if self.quant_fmt == "w4a16":
                    d["scales"] = P(None, None, out_axis)
                    d["zeros"] = P(None, None, out_axis)
                elif self.quant_fmt == "fp8":
                    d["weight_scale"] = P(None, out_axis)
                else:
                    d["scales"] = P(None, out_axis)
                return d
            for k in self._weight_keys():
                layers[k] = qspec(layers[k])
        specs: dict = {"embed": P("tp", None), "layers": layers}
        if self.positions == "learned":
            specs["pos_embed"] = P()
        if self.embed_norm:
            specs["embed_ln_w"] = P()
            if self.norm_bias:
                specs["embed_ln_b"] = P()
        if self.final_norm and self.norm_kind != "noaffine":
            specs["final_norm_w"] = P()
            if self.norm_bias:
                specs["final_norm_b"] = P()
        if not self.tie_embeddings:
            specs["lm_head"] = P(None, "tp")
        if self.lm_head_bias:
            specs["lm_head_b"] = P("tp")
        return specs

    # -------------------------------------------------------------- loading
    def _special_weight(self, sub: str, li: int, w: np.ndarray, bufs: dict,
                        target) -> bool:
        """Subclass hook for fused layouts. Returns True when consumed."""
        return False

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        bufs = {k: np.zeros(s, target)
                for k, s in self._layer_shapes().items()}
        params: dict = {"layers": bufs}
        for name, w in weights:
            if name.endswith(("rotary_emb.inv_freq", ".attn.bias",
                              ".attn.masked_bias")):
                continue
            w = np.asarray(w)
            top = self._TOP_MAP.get(name)
            if top is not None:
                key, tr = top
                if key == "lm_head" and self.tie_embeddings:
                    continue
                params[key] = (w.T if tr else w).astype(target)
                continue
            if name.startswith(self._LAYER_PREFIX):
                rest = name[len(self._LAYER_PREFIX):]
                idx_s, sub = rest.split(".", 1)
                li = int(idx_s)
                if self._special_weight(sub, li, w, bufs, target):
                    continue
                m = self._LAYER_MAP.get(sub)
                if m is not None:
                    key, tr = m
                    if key in bufs:
                        bufs[key][li] = (w.T if tr else w).astype(target)
        if "embed" not in params:
            raise ValueError(f"{type(self).__name__}: checkpoint missing "
                             "token-embedding weight")
        return params

    # -------------------------------------------------------------- forward
    def _norm(self, x, w, b=None):
        if self.norm_kind == "rms":
            return rms_norm(x, w, self.norm_eps)
        if self.norm_kind == "noaffine":
            return layer_norm(x, 1.0, 0.0, self.norm_eps)
        if self.norm_kind == "ln1p":
            return layer_norm(x, w.astype(jnp.float32) + 1.0,
                              0.0 if b is None else b, self.norm_eps)
        return layer_norm(x, w, 0.0 if b is None else b, self.norm_eps)

    def _apply_qk_norm(self, q, k, lp):
        if self.qk_norm is None:
            return q, k
        if self.qk_norm == "flat_rms":
            # Normalize the flat projection (OLMo-2): caller passes [T, n*hd]
            return (rms_norm(q, lp["q_norm"], self.norm_eps),
                    rms_norm(k, lp["k_norm"], self.norm_eps))
        if self.qk_norm == "per_head_rms":
            return (rms_norm(q, lp["q_norm"], self.norm_eps),
                    rms_norm(k, lp["k_norm"], self.norm_eps))
        qb = lp.get("q_norm_b", 0.0) if self.qk_norm_bias else 0.0
        kb = lp.get("k_norm_b", 0.0) if self.qk_norm_bias else 0.0
        return (layer_norm(q, lp["q_norm"], qb, self.qk_norm_eps),
                layer_norm(k, lp["k_norm"], kb, self.qk_norm_eps))

    def _rope(self, x, cos, sin):
        rot = cos.shape[-1] * 2
        if not self.rope_interleaved:
            return apply_rope(x, cos, sin)
        xr, xt = x[..., :rot], x[..., rot:]
        out = apply_rope_interleaved(xr, cos, sin)
        if xt.shape[-1]:
            out = jnp.concatenate([out, xt], axis=-1)
        return out

    def apply(self, params: dict, input_ids: jax.Array, kv_cache: jax.Array,
              md: AttentionMetadata, *, use_pallas: bool = False,
              lora: dict | None = None, mm=None):
        if lora is not None:
            raise NotImplementedError(
                f"LoRA on {type(self).__name__}: follow-up")
        T = input_ids.shape[0]
        nq, nkv, hd = self.num_heads, self.num_kv_heads, self.head_dim
        x = jnp.take(params["embed"], input_ids, axis=0)
        if mm is not None:
            mm_embeds, mm_idx = mm
            x = x.at[mm_idx].set(mm_embeds.astype(x.dtype), mode="drop")
        if self.embedding_multiplier != 1.0:
            x = x * self.embedding_multiplier
        if self.embed_norm:
            x = self._norm(x, params.get("embed_ln_w"),
                           params.get("embed_ln_b"))
        if self.positions == "learned":
            x = x + jnp.take(params["pos_embed"],
                             md.token_pos + self.pos_offset, axis=0)
            cos = sin = None
        elif self.positions == "alibi":
            cos = sin = None
        else:
            cos, sin = compute_cos_sin(md.token_pos, self._inv_freq,
                                       self._rope_mscale,
                                       self._longrope_orig_max)
        alibi = getattr(self, "_alibi", None)

        def lin(h, lp, key, bkey=None):
            bias = lp.get(bkey) if bkey else None
            return apply_linear(h, lp[key], bias, fmt=self.quant_fmt)

        def attn(h, lp, kvc):
            q = lin(h, lp, "wq", "bq" if self.attn_bias else None)
            k = lin(h, lp, "wk", "bk" if self.attn_bias else None)
            v = lin(h, lp, "wv", "bv" if self.attn_bias else None)
            if self.clip_qkv is not None:
                c = self.clip_qkv
                q, k, v = (jnp.clip(t, -c, c) for t in (q, k, v))
            if self.qk_norm == "flat_rms":
                q, k = self._apply_qk_norm(q, k, lp)
            q = q.reshape(T, nq, hd)
            k = k.reshape(T, nkv, hd)
            v = v.reshape(T, nkv, hd)
            if self.qk_norm not in (None, "flat_rms"):
                q, k = self._apply_qk_norm(q, k, lp)
            if cos is not None:
                if "is_sliding" in lp:
                    # Cohere2-style: global layers carry NO positional
                    # encoding — rope degenerates to identity (cos=1,sin=0).
                    c = jnp.where(lp["is_sliding"] > 0, cos,
                                  jnp.ones_like(cos))
                    s = jnp.where(lp["is_sliding"] > 0, sin,
                                  jnp.zeros_like(sin))
                else:
                    c, s = cos, sin
                q = self._rope(q, c, s)
                k = self._rope(k, c, s)
            kvc = write_kv(kvc, k, v, md.slot_mapping)
            if self.blocksparse is not None:
                bsp = self.blocksparse
                sparse = lambda: paged_attention(  # noqa: E731
                    q, kvc, md, self.scale, use_pallas=use_pallas,
                    blocksparse=bsp)
                dense = lambda: paged_attention(  # noqa: E731
                    q, kvc, md, self.scale, use_pallas=use_pallas)
                o = jax.lax.cond(lp["is_dense"] > 0, dense, sparse) \
                    if "is_dense" in lp else sparse()
            elif self.sliding_window is not None and "is_sliding" in lp:
                o = jax.lax.cond(
                    lp["is_sliding"] > 0,
                    lambda: paged_attention(
                        q, kvc, md, self.scale,
                        sliding_window=self.sliding_window,
                        logits_soft_cap=self.attn_soft_cap,
                        use_pallas=use_pallas, alibi=alibi),
                    lambda: paged_attention(
                        q, kvc, md, self.scale,
                        logits_soft_cap=self.attn_soft_cap,
                        use_pallas=use_pallas, alibi=alibi))
            else:
                o = paged_attention(q, kvc, md, self.scale,
                                    sliding_window=self.sliding_window,
                                    logits_soft_cap=self.attn_soft_cap,
                                    use_pallas=use_pallas, alibi=alibi)
            o = lin(o.reshape(T, nq * hd), lp, "wo",
                    "bo" if self.attn_out_bias else None)
            if self.attn_output_multiplier != 1.0:
                o = o * self.attn_output_multiplier
            return o, kvc

        def mlp(h, lp):
            if self.mlp_kind == "moe":
                return self._moe_mlp(h, lp)
            if self.mlp_kind == "gated":
                gate = lin(h, lp, "w_gate", "b_gate" if self.mlp_bias
                           else None)
                up = lin(h, lp, "w_up", "b_up" if self.mlp_bias else None)
                return lin(self.act(gate, up), lp, "w_down",
                           "b_down" if self.mlp_bias else None)
            h = self.act(lin(h, lp, "fc1_w", "fc1_b" if self.mlp_bias
                             else None))
            return lin(h, lp, "fc2_w", "fc2_b" if self.mlp_bias else None)

        rm = self.residual_multiplier

        def layer(x, xs):
            lp, kvc = xs
            if self.block_norm == "post":
                a, kvc = attn(x, lp, kvc)
                x = x + self._norm(a, lp.get("ln1_w"), lp.get("ln1_b")) * rm
                m = mlp(x, lp)
                x = x + self._norm(m, lp.get("ln2_w"), lp.get("ln2_b")) * rm
                return x, kvc
            h1 = self._norm(x, lp.get("ln1_w"), lp.get("ln1_b"))
            if self.parallel_residual:
                a, kvc = attn(h1, lp, kvc)
                h2 = h1 if self.shared_ln else \
                    self._norm(x, lp.get("ln2_w"), lp.get("ln2_b"))
                return x + a + mlp(h2, lp), kvc
            a, kvc = attn(h1, lp, kvc)
            if self.sandwich_norm:
                a = self._norm(a, lp.get("ln1_post_w"), lp.get("ln1_post_b"))
            x = x + a * rm
            h2 = self._norm(x, lp.get("ln2_w"), lp.get("ln2_b"))
            m = mlp(h2, lp)
            if self.sandwich_norm:
                m = self._norm(m, lp.get("ln2_post_w"), lp.get("ln2_post_b"))
            x = x + m * rm
            return x, kvc

        x, kv_cache = jax.lax.scan(layer, x, (params["layers"], kv_cache))
        if self.final_norm:
            x = self._norm(x, params.get("final_norm_w"),
                           params.get("final_norm_b"))
        return x, kv_cache

    def compute_logits(self, params: dict, hidden: jax.Array) -> jax.Array:
        head = params["embed"].T if self.tie_embeddings else params["lm_head"]
        logits = jnp.dot(hidden, head, preferred_element_type=jnp.float32)
        if self.lm_head_bias:
            logits = logits + params["lm_head_b"].astype(jnp.float32)
        if self.logits_multiplier != 1.0:
            logits = logits * self.logits_multiplier
        return logits


# --------------------------------------------------------------------------
# Llama-naming helpers shared by the model.layers.* family.
_LLAMA_ATTN_MAP = {
    "self_attn.q_proj.weight": ("wq", True),
    "self_attn.k_proj.weight": ("wk", True),
    "self_attn.v_proj.weight": ("wv", True),
    "self_attn.o_proj.weight": ("wo", True),
    "self_attn.q_proj.bias": ("bq", False),
    "self_attn.k_proj.bias": ("bk", False),
    "self_attn.v_proj.bias": ("bv", False),
    "self_attn.o_proj.bias": ("bo", False),
}
_LLAMA_GATED_MLP_MAP = {
    "mlp.gate_proj.weight": ("w_gate", True),
    "mlp.up_proj.weight": ("w_up", True),
    "mlp.down_proj.weight": ("w_down", True),
}
_LLAMA_TOP = {
    "model.embed_tokens.weight": ("embed", False),
    "model.norm.weight": ("final_norm_w", False),
    "model.norm.bias": ("final_norm_b", False),
    "lm_head.weight": ("lm_head", True),
    "lm_head.bias": ("lm_head_b", False),
}
_LN_MAP = {
    "input_layernorm.weight": ("ln1_w", False),
    "input_layernorm.bias": ("ln1_b", False),
    "post_attention_layernorm.weight": ("ln2_w", False),
    "post_attention_layernorm.bias": ("ln2_b", False),
}


class StableLmForCausalLM(FlexibleDecoder):
    """HF 'StableLmForCausalLM' (reference modeling/models/stablelm.py):
    LayerNorm+bias, partial rotary, optional QKV bias / parallel residual /
    per-head QK-LayerNorm (distinct weights, no bias)."""

    _TOP_MAP = _LLAMA_TOP
    _LAYER_MAP = {**_LLAMA_ATTN_MAP, **_LLAMA_GATED_MLP_MAP, **_LN_MAP}

    def _setup(self, hf):
        self.norm_kind = "ln"
        self.norm_eps = getattr(hf, "layer_norm_eps", 1e-5)
        self.act = ACT2MUL[getattr(hf, "hidden_act", "silu")]
        self.attn_bias = getattr(hf, "use_qkv_bias", False)
        self.attn_out_bias = False
        self.parallel_residual = getattr(hf, "use_parallel_residual", False)
        self.shared_ln = True
        if getattr(hf, "qk_layernorm", False):
            self.qk_norm = "per_head_ln"
            self.qk_norm_bias = False
            self.qk_norm_eps = 1e-5

    def _special_weight(self, sub, li, w, bufs, target):
        # StableLmLayerNormPerHead: one LayerNorm per head.
        for side, n in (("q", self.num_heads), ("k", self.num_kv_heads)):
            pref = f"self_attn.{side}_layernorm.norms."
            if sub.startswith(pref) and sub.endswith(".weight"):
                head = int(sub[len(pref):].split(".")[0])
                bufs[f"{side}_norm"][li, head] = w.astype(target)
                return True
        return False


class Starcoder2ForCausalLM(FlexibleDecoder):
    """HF 'Starcoder2ForCausalLM': LN+bias, full rope, dense gelu MLP
    (c_fc/c_proj), bias on every linear, GQA, tied embeddings."""

    tie_default = True

    _TOP_MAP = _LLAMA_TOP
    _LAYER_MAP = {
        **_LLAMA_ATTN_MAP, **_LN_MAP,
        "mlp.c_fc.weight": ("fc1_w", True),
        "mlp.c_fc.bias": ("fc1_b", False),
        "mlp.c_proj.weight": ("fc2_w", True),
        "mlp.c_proj.bias": ("fc2_b", False),
    }

    def _setup(self, hf):
        self.norm_kind = "ln"
        self.norm_eps = getattr(hf, "norm_epsilon", 1e-5)
        self.mlp_kind = "dense"
        self.act = _DENSE_ACTS[getattr(hf, "hidden_act",
                                       "gelu_pytorch_tanh")]
        bias = getattr(hf, "use_bias", True)
        self.attn_bias = bias
        self.attn_out_bias = bias
        self.mlp_bias = bias


class PhiForCausalLM(FlexibleDecoder):
    """HF 'PhiForCausalLM' (phi-1/1.5/2): parallel residual off one shared
    LayerNorm, partial rotary, dense gelu_new MLP, biases everywhere
    including the LM head, model-level final_layernorm."""

    _TOP_MAP = {
        "model.embed_tokens.weight": ("embed", False),
        "model.final_layernorm.weight": ("final_norm_w", False),
        "model.final_layernorm.bias": ("final_norm_b", False),
        "lm_head.weight": ("lm_head", True),
        "lm_head.bias": ("lm_head_b", False),
    }
    _LAYER_MAP = {
        **_LLAMA_ATTN_MAP,
        "self_attn.dense.weight": ("wo", True),
        "self_attn.dense.bias": ("bo", False),
        "input_layernorm.weight": ("ln1_w", False),
        "input_layernorm.bias": ("ln1_b", False),
        "mlp.fc1.weight": ("fc1_w", True),
        "mlp.fc1.bias": ("fc1_b", False),
        "mlp.fc2.weight": ("fc2_w", True),
        "mlp.fc2.bias": ("fc2_b", False),
    }

    def _setup(self, hf):
        self.norm_kind = "ln"
        self.norm_eps = getattr(hf, "layer_norm_eps", 1e-5)
        self.parallel_residual = True
        self.shared_ln = True
        self.mlp_kind = "dense"
        self.act = _DENSE_ACTS[getattr(hf, "hidden_act", "gelu_new")]
        self.attn_bias = True
        self.attn_out_bias = True
        self.mlp_bias = True
        self.lm_head_bias = True


class GPTJForCausalLM(FlexibleDecoder):
    """HF 'GPTJForCausalLM': interleaved partial rotary, parallel residual
    off one LayerNorm, dense gelu_new MLP (fc_in/fc_out), biased LM head."""

    rope_interleaved = True

    _TOP_MAP = {
        "transformer.wte.weight": ("embed", False),
        "transformer.ln_f.weight": ("final_norm_w", False),
        "transformer.ln_f.bias": ("final_norm_b", False),
        "lm_head.weight": ("lm_head", True),
        "lm_head.bias": ("lm_head_b", False),
    }
    _LAYER_PREFIX = "transformer.h."
    _LAYER_MAP = {
        "attn.q_proj.weight": ("wq", True),
        "attn.k_proj.weight": ("wk", True),
        "attn.v_proj.weight": ("wv", True),
        "attn.out_proj.weight": ("wo", True),
        "ln_1.weight": ("ln1_w", False),
        "ln_1.bias": ("ln1_b", False),
        "mlp.fc_in.weight": ("fc1_w", True),
        "mlp.fc_in.bias": ("fc1_b", False),
        "mlp.fc_out.weight": ("fc2_w", True),
        "mlp.fc_out.bias": ("fc2_b", False),
    }

    def _setup(self, hf):
        self.norm_kind = "ln"
        self.norm_eps = getattr(hf, "layer_norm_epsilon", 1e-5)
        self.parallel_residual = True
        self.shared_ln = True
        self.mlp_kind = "dense"
        self.act = _DENSE_ACTS[getattr(hf, "activation_function",
                                       "gelu_new")]
        self.mlp_bias = True
        self.lm_head_bias = True
        self.intermediate_size = getattr(hf, "n_inner", None) or \
            4 * self.hidden_size


class GPTBigCodeForCausalLM(FlexibleDecoder):
    """HF 'GPTBigCodeForCausalLM' (SantaCoder/StarCoder): learned absolute
    positions, MQA (multi_query -> 1 KV head), fused c_attn rows, dense
    gelu MLP, tied embeddings."""

    positions = "learned"
    tie_default = True

    _TOP_MAP = {
        "transformer.wte.weight": ("embed", False),
        "transformer.wpe.weight": ("pos_embed", False),
        "transformer.ln_f.weight": ("final_norm_w", False),
        "transformer.ln_f.bias": ("final_norm_b", False),
        "lm_head.weight": ("lm_head", True),
    }
    _LAYER_PREFIX = "transformer.h."
    _LAYER_MAP = {
        "ln_1.weight": ("ln1_w", False),
        "ln_1.bias": ("ln1_b", False),
        "ln_2.weight": ("ln2_w", False),
        "ln_2.bias": ("ln2_b", False),
        "attn.c_proj.weight": ("wo", True),
        "attn.c_proj.bias": ("bo", False),
        "mlp.c_fc.weight": ("fc1_w", True),
        "mlp.c_fc.bias": ("fc1_b", False),
        "mlp.c_proj.weight": ("fc2_w", True),
        "mlp.c_proj.bias": ("fc2_b", False),
    }

    def _setup(self, hf):
        if getattr(hf, "multi_query", True):
            self.num_kv_heads = 1
        self.norm_kind = "ln"
        self.norm_eps = getattr(hf, "layer_norm_epsilon", 1e-5)
        self.mlp_kind = "dense"
        self.act = _DENSE_ACTS[getattr(hf, "activation_function",
                                       "gelu_pytorch_tanh")]
        self.attn_bias = True
        self.attn_out_bias = True
        self.mlp_bias = True
        self.max_positions = hf.max_position_embeddings
        self.intermediate_size = getattr(hf, "n_inner", None) or \
            4 * self.hidden_size

    def _special_weight(self, sub, li, w, bufs, target):
        if sub not in ("attn.c_attn.weight", "attn.c_attn.bias"):
            return False
        D = self.hidden_size
        kv = self.num_kv_heads * self.head_dim
        if sub.endswith("weight"):  # [D + 2*kv, D] rows
            bufs["wq"][li] = w[:D].T.astype(target)
            bufs["wk"][li] = w[D:D + kv].T.astype(target)
            bufs["wv"][li] = w[D + kv:].T.astype(target)
        else:
            bufs["bq"][li] = w[:D].astype(target)
            bufs["bk"][li] = w[D:D + kv].astype(target)
            bufs["bv"][li] = w[D + kv:].astype(target)
        return True


class PersimmonForCausalLM(FlexibleDecoder):
    """HF 'PersimmonForCausalLM' (also the Fuyu language tower): fused
    per-head-interleaved QKV, per-head shared QK-LayerNorm (+bias), partial
    rotary, relu^2 dense MLP, LN+bias everywhere."""

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
        "self_attn.q_layernorm.weight": ("q_norm", False),
        "self_attn.q_layernorm.bias": ("q_norm_b", False),
        "self_attn.k_layernorm.weight": ("k_norm", False),
        "self_attn.k_layernorm.bias": ("k_norm_b", False),
        "mlp.dense_h_to_4h.weight": ("fc1_w", True),
        "mlp.dense_h_to_4h.bias": ("fc1_b", False),
        "mlp.dense_4h_to_h.weight": ("fc2_w", True),
        "mlp.dense_4h_to_h.bias": ("fc2_b", False),
    }

    def _setup(self, hf):
        self.norm_kind = "ln"
        self.norm_eps = getattr(hf, "layer_norm_eps", 1e-5)
        self.mlp_kind = "dense"
        self.act = _DENSE_ACTS[getattr(hf, "hidden_act", "relu2")]
        self.attn_bias = True
        self.attn_out_bias = True
        self.mlp_bias = True
        if getattr(hf, "qk_layernorm", True):
            self.qk_norm = "per_head_ln_shared"
            self.qk_norm_bias = True
            self.qk_norm_eps = getattr(hf, "layer_norm_eps", 1e-5)

    def _special_weight(self, sub, li, w, bufs, target):
        if sub not in ("self_attn.query_key_value.weight",
                       "self_attn.query_key_value.bias"):
            return False
        nh, hd, D = self.num_heads, self.head_dim, self.hidden_size
        if sub.endswith("weight"):  # [3D, D], rows (head, (q,k,v), hd)
            qkv = w.reshape(nh, 3, hd, D)
            bufs["wq"][li] = qkv[:, 0].reshape(D, D).T.astype(target)
            bufs["wk"][li] = qkv[:, 1].reshape(D, D).T.astype(target)
            bufs["wv"][li] = qkv[:, 2].reshape(D, D).T.astype(target)
        else:
            qkv = w.reshape(nh, 3, hd)
            bufs["bq"][li] = qkv[:, 0].reshape(D).astype(target)
            bufs["bk"][li] = qkv[:, 1].reshape(D).astype(target)
            bufs["bv"][li] = qkv[:, 2].reshape(D).astype(target)
        return True


class CohereForCausalLM(FlexibleDecoder):
    """HF 'CohereForCausalLM' (Command-R): bias-free LayerNorm, parallel
    residual off one shared norm, interleaved full rotary, logit_scale,
    always-tied embeddings, optional per-head distinct QK-LayerNorm."""

    rope_interleaved = True
    tie_default = True

    _TOP_MAP = _LLAMA_TOP
    _LAYER_MAP = {
        **_LLAMA_ATTN_MAP, **_LLAMA_GATED_MLP_MAP,
        "input_layernorm.weight": ("ln1_w", False),
        "self_attn.q_norm.weight": ("q_norm", False),
        "self_attn.k_norm.weight": ("k_norm", False),
    }

    def _setup(self, hf):
        self.norm_kind = "ln"
        self.norm_bias = False
        self.norm_eps = getattr(hf, "layer_norm_eps", 1e-5)
        self.act = ACT2MUL[getattr(hf, "hidden_act", "silu")]
        self.parallel_residual = True
        self.shared_ln = True
        self.attn_bias = getattr(hf, "attention_bias", False)
        self.logits_multiplier = getattr(hf, "logit_scale", 1.0)
        if getattr(hf, "use_qk_norm", False):
            self.qk_norm = "per_head_ln"
            self.qk_norm_bias = False
            self.qk_norm_eps = self.norm_eps


class Cohere2ForCausalLM(CohereForCausalLM):
    """HF 'Cohere2ForCausalLM' (Command-R7B; reference commandr.py handles
    both generations): Cohere parallel-residual body where layers follow a
    sliding/global pattern — sliding layers use rotary + sliding-window
    attention, and every ``sliding_window_pattern``-th layer is GLOBAL with
    no positional encoding at all (rope skipped). Expressed as a per-layer
    ``is_sliding`` flag in the scanned stack (gemma.py idiom)."""

    def _setup(self, hf):
        super()._setup(hf)
        self.sliding_window = getattr(hf, "sliding_window", 4096)
        pattern = getattr(hf, "sliding_window_pattern", 4)
        lt = getattr(hf, "layer_types", None)
        n = hf.num_hidden_layers
        self._sliding_flags = np.asarray(
            [1.0 if (lt[i] == "sliding_attention" if lt
                     else (i + 1) % pattern != 0) else 0.0
             for i in range(n)], np.float32)

    def _layer_shapes(self):
        shapes = super()._layer_shapes()
        shapes["is_sliding"] = (self.num_layers,)
        return shapes

    def load_weights(self, weights):
        params = super().load_weights(weights)
        params["layers"]["is_sliding"] = self._sliding_flags.astype(
            params["layers"]["is_sliding"].dtype)
        return params

    def init_dummy_params(self, rng):
        params = super().init_dummy_params(rng)
        params["layers"]["is_sliding"] = jnp.asarray(
            self._sliding_flags, self.dtype)
        return params


class OlmoForCausalLM(FlexibleDecoder):
    """HF 'OlmoForCausalLM': affine-free LayerNorm, QKV clamping, gated
    SiLU MLP, full rotary."""

    _TOP_MAP = _LLAMA_TOP
    _LAYER_MAP = {**_LLAMA_ATTN_MAP, **_LLAMA_GATED_MLP_MAP}

    def _setup(self, hf):
        self.norm_kind = "noaffine"
        self.norm_eps = 1e-5
        self.act = ACT2MUL[getattr(hf, "hidden_act", "silu")]
        self.clip_qkv = getattr(hf, "clip_qkv", None)


class Olmo2ForCausalLM(FlexibleDecoder):
    """HF 'Olmo2ForCausalLM': post-block RMSNorm placement
    (``x + norm(attn(x))``), flat RMS QK-norm over the whole projection."""

    _TOP_MAP = _LLAMA_TOP
    _LAYER_MAP = {
        **_LLAMA_ATTN_MAP, **_LLAMA_GATED_MLP_MAP,
        "post_attention_layernorm.weight": ("ln1_w", False),
        "post_feedforward_layernorm.weight": ("ln2_w", False),
        "self_attn.q_norm.weight": ("q_norm", False),
        "self_attn.k_norm.weight": ("k_norm", False),
    }

    def _setup(self, hf):
        self.norm_kind = "rms"
        self.norm_bias = False
        self.norm_eps = getattr(hf, "rms_norm_eps", 1e-5)
        self.act = ACT2MUL[getattr(hf, "hidden_act", "silu")]
        self.block_norm = "post"
        self.qk_norm = "flat_rms"


class GraniteForCausalLM(FlexibleDecoder):
    """HF 'GraniteForCausalLM': Llama structure with four static
    multipliers (embedding/residual/attention/logits scaling)."""

    tie_default = True

    _TOP_MAP = _LLAMA_TOP
    _LAYER_MAP = {**_LLAMA_ATTN_MAP, **_LLAMA_GATED_MLP_MAP, **_LN_MAP}

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


class NemotronForCausalLM(FlexibleDecoder):
    """HF 'NemotronForCausalLM': LayerNorm1P (weight+1, bias), partial
    rotary, dense relu^2 MLP (up/down only)."""

    _TOP_MAP = _LLAMA_TOP
    _LAYER_MAP = {
        **_LLAMA_ATTN_MAP, **_LN_MAP,
        "mlp.up_proj.weight": ("fc1_w", True),
        "mlp.up_proj.bias": ("fc1_b", False),
        "mlp.down_proj.weight": ("fc2_w", True),
        "mlp.down_proj.bias": ("fc2_b", False),
    }

    def _setup(self, hf):
        self.norm_kind = "ln1p"
        self.norm_eps = getattr(hf, "norm_eps", 1e-5)
        self.mlp_kind = "dense"
        self.act = _DENSE_ACTS[getattr(hf, "hidden_act", "relu2")]
        self.attn_bias = getattr(hf, "attention_bias", False)
        self.mlp_bias = getattr(hf, "mlp_bias", False)


class BloomForCausalLM(FlexibleDecoder):
    """HF 'BloomForCausalLM' (reference modeling/models/bloom.py): ALiBi
    positions (no rotary), LayerNorm after the embedding, per-head
    interleaved fused QKV, dense gelu-tanh MLP, tied embeddings."""

    positions = "alibi"
    embed_norm = True
    tie_default = True

    _TOP_MAP = {
        "transformer.word_embeddings.weight": ("embed", False),
        "transformer.word_embeddings_layernorm.weight": ("embed_ln_w", False),
        "transformer.word_embeddings_layernorm.bias": ("embed_ln_b", False),
        "transformer.ln_f.weight": ("final_norm_w", False),
        "transformer.ln_f.bias": ("final_norm_b", False),
        "lm_head.weight": ("lm_head", True),
    }
    _LAYER_PREFIX = "transformer.h."
    _LAYER_MAP = {
        "input_layernorm.weight": ("ln1_w", False),
        "input_layernorm.bias": ("ln1_b", False),
        "post_attention_layernorm.weight": ("ln2_w", False),
        "post_attention_layernorm.bias": ("ln2_b", False),
        "self_attention.dense.weight": ("wo", True),
        "self_attention.dense.bias": ("bo", False),
        "mlp.dense_h_to_4h.weight": ("fc1_w", True),
        "mlp.dense_h_to_4h.bias": ("fc1_b", False),
        "mlp.dense_4h_to_h.weight": ("fc2_w", True),
        "mlp.dense_4h_to_h.bias": ("fc2_b", False),
    }

    def _setup(self, hf):
        self.norm_kind = "ln"
        self.norm_eps = getattr(hf, "layer_norm_epsilon", 1e-5)
        self.mlp_kind = "dense"
        self.act = _DENSE_ACTS["gelu_pytorch_tanh"]  # BloomGelu
        self.attn_bias = True
        self.attn_out_bias = True
        self.mlp_bias = True

    def _special_weight(self, sub, li, w, bufs, target):
        if sub not in ("self_attention.query_key_value.weight",
                       "self_attention.query_key_value.bias"):
            return False
        nh, hd, D = self.num_heads, self.head_dim, self.hidden_size
        if sub.endswith("weight"):  # [3D, D] rows grouped (head, (q,k,v), hd)
            qkv = w.reshape(nh, 3, hd, D)
            bufs["wq"][li] = qkv[:, 0].reshape(D, D).T.astype(target)
            bufs["wk"][li] = qkv[:, 1].reshape(D, D).T.astype(target)
            bufs["wv"][li] = qkv[:, 2].reshape(D, D).T.astype(target)
        else:
            qkv = w.reshape(nh, 3, hd)
            bufs["bq"][li] = qkv[:, 0].reshape(D).astype(target)
            bufs["bk"][li] = qkv[:, 1].reshape(D).astype(target)
            bufs["bv"][li] = qkv[:, 2].reshape(D).astype(target)
        return True


class MPTForCausalLM(FlexibleDecoder):
    """HF 'MPTForCausalLM' / 'MptForCausalLM': ALiBi with MPT's own slope
    interpolation (HF build_mpt_alibi_tensor), bias-free LayerNorms and
    Linears, straight-concat fused Wqkv, optional QKV clamp, dense exact
    gelu MLP (expansion_ratio), tied embeddings."""

    positions = "alibi"
    tie_default = True

    _TOP_MAP = {
        "transformer.wte.weight": ("embed", False),
        "transformer.norm_f.weight": ("final_norm_w", False),
        "lm_head.weight": ("lm_head", True),
    }
    _LAYER_PREFIX = "transformer.blocks."
    _LAYER_MAP = {
        "norm_1.weight": ("ln1_w", False),
        "norm_2.weight": ("ln2_w", False),
        "attn.out_proj.weight": ("wo", True),
        "ffn.up_proj.weight": ("fc1_w", True),
        "ffn.down_proj.weight": ("fc2_w", True),
    }

    def _setup(self, hf):
        self.norm_kind = "ln"
        self.norm_bias = False  # HF MPT nulls LN biases unconditionally
        self.norm_eps = getattr(hf, "layer_norm_epsilon", 1e-5)
        self.mlp_kind = "dense"
        self.act = _DENSE_ACTS["gelu"]
        self.intermediate_size = int(
            getattr(hf, "expansion_ratio", 4) * self.hidden_size)
        ac = getattr(hf, "attn_config", None)
        get = (ac.get if isinstance(ac, dict)
               else (lambda k, d=None: getattr(ac, k, d))) if ac is not None \
            else (lambda k, d=None: d)
        self.clip_qkv = get("clip_qkv", None)
        sm = get("softmax_scale", None)
        if sm:
            self.scale = sm
        self._alibi = self._mpt_slopes(self.num_heads,
                                       get("alibi_bias_max", 8))

    @staticmethod
    def _mpt_slopes(n: int, bias_max: float):
        import math
        np2 = 2 ** math.ceil(math.log2(n))
        base = np.arange(1, np2 + 1, dtype=np.float64) * (bias_max / np2)
        slopes = 1.0 / np.power(2.0, base)
        if np2 != n:
            slopes = np.concatenate([slopes[1::2], slopes[::2]])[:n]
        return jnp.asarray(slopes, jnp.float32)

    def _special_weight(self, sub, li, w, bufs, target):
        if sub != "attn.Wqkv.weight":
            return False
        D = self.hidden_size
        bufs["wq"][li] = w[:D].T.astype(target)
        bufs["wk"][li] = w[D:2 * D].T.astype(target)
        bufs["wv"][li] = w[2 * D:].T.astype(target)
        return True


class FalconForCausalLM(FlexibleDecoder):
    """HF 'FalconForCausalLM'/'RWForCausalLM' (reference
    modeling/models/falcon.py). Three decoder-layer generations, selected
    from the config like HF FalconDecoderLayer:563-633:

    - new_decoder_architecture (+2 LNs): parallel residual with separate
      ln_attn/ln_mlp; GQA with per-kv-group fused QKV rows.
    - parallel_attn (falcon-7b): parallel residual off one shared LN; MQA.
    - neither (falcon-rw): sequential pre-norm; per-head fused QKV; ALiBi.
    """

    _TOP_MAP = {
        "transformer.word_embeddings.weight": ("embed", False),
        "transformer.ln_f.weight": ("final_norm_w", False),
        "transformer.ln_f.bias": ("final_norm_b", False),
        "lm_head.weight": ("lm_head", True),
    }
    _LAYER_PREFIX = "transformer.h."

    def _setup(self, hf):
        self.norm_kind = "ln"
        self.norm_eps = getattr(hf, "layer_norm_epsilon", 1e-5)
        self.mlp_kind = "dense"
        self.act = _DENSE_ACTS[getattr(hf, "activation", "gelu")]
        self.intermediate_size = getattr(hf, "ffn_hidden_size", None) or \
            4 * self.hidden_size
        bias = getattr(hf, "bias", False)
        self.attn_bias = bias
        self.attn_out_bias = bias
        self.mlp_bias = bias
        if getattr(hf, "alibi", False):
            self.positions = "alibi"
        self._new_arch = getattr(hf, "new_decoder_architecture", False)
        self._multi_query = getattr(hf, "multi_query", False)
        num_ln = getattr(hf, "num_ln_in_parallel_attn", None)
        if num_ln is None and self._new_arch:
            num_ln = 2
        lmap = {
            "self_attention.dense.weight": ("wo", True),
            "self_attention.dense.bias": ("bo", False),
            "mlp.dense_h_to_4h.weight": ("fc1_w", True),
            "mlp.dense_h_to_4h.bias": ("fc1_b", False),
            "mlp.dense_4h_to_h.weight": ("fc2_w", True),
            "mlp.dense_4h_to_h.bias": ("fc2_b", False),
        }
        if self._new_arch and num_ln == 2:
            self.parallel_residual = True
            self.shared_ln = False
            lmap.update({
                "ln_attn.weight": ("ln1_w", False),
                "ln_attn.bias": ("ln1_b", False),
                "ln_mlp.weight": ("ln2_w", False),
                "ln_mlp.bias": ("ln2_b", False),
            })
        elif getattr(hf, "parallel_attn", True):
            self.parallel_residual = True
            self.shared_ln = True
            lmap.update({
                "input_layernorm.weight": ("ln1_w", False),
                "input_layernorm.bias": ("ln1_b", False),
            })
        else:
            lmap.update({
                "input_layernorm.weight": ("ln1_w", False),
                "input_layernorm.bias": ("ln1_b", False),
                "post_attention_layernorm.weight": ("ln2_w", False),
                "post_attention_layernorm.bias": ("ln2_b", False),
            })
        self._LAYER_MAP = lmap

    def _split_fused(self, w, is_bias):
        """Mirror HF FalconAttention._split_heads on checkpoint rows."""
        nh, nkv, hd = self.num_heads, self.num_kv_heads, self.head_dim
        shape = (-1,) if is_bias else (-1, self.hidden_size)
        if self._new_arch:
            g = nh // nkv
            qkv = w.reshape((nkv, g + 2, hd) + shape[1:])
            return (qkv[:, :g].reshape((nh * hd,) + shape[1:]),
                    qkv[:, g].reshape((nkv * hd,) + shape[1:]),
                    qkv[:, g + 1].reshape((nkv * hd,) + shape[1:]))
        if self._multi_query:
            return w[:nh * hd], w[nh * hd:nh * hd + hd], w[nh * hd + hd:]
        qkv = w.reshape((nh, 3, hd) + shape[1:])
        return (qkv[:, 0].reshape((nh * hd,) + shape[1:]),
                qkv[:, 1].reshape((nh * hd,) + shape[1:]),
                qkv[:, 2].reshape((nh * hd,) + shape[1:]))

    def _special_weight(self, sub, li, w, bufs, target):
        if sub == "self_attention.query_key_value.weight":
            q, k, v = self._split_fused(w, is_bias=False)
            bufs["wq"][li] = q.T.astype(target)
            bufs["wk"][li] = k.T.astype(target)
            bufs["wv"][li] = v.T.astype(target)
            return True
        if sub == "self_attention.query_key_value.bias":
            q, k, v = self._split_fused(w, is_bias=True)
            bufs["bq"][li] = q.astype(target)
            bufs["bk"][li] = k.astype(target)
            bufs["bv"][li] = v.astype(target)
            return True
        return False


class BaichuanForCausalLM(FlexibleDecoder):
    """'BaichuanForCausalLM' (Baichuan/Baichuan2; reference
    modeling/models/baichuan.py): Llama body with fused W_pack QKV.
    The 7B variants (hidden 4096) use RoPE; 13B uses ALiBi. Baichuan2
    checkpoints (vocab 125696) L2-normalize the lm_head at load (NormHead).
    Config parses without remote code via the generic-config fallback."""

    rope_when_hidden = 4096

    _TOP_MAP = _LLAMA_TOP
    _LAYER_MAP = {
        "self_attn.o_proj.weight": ("wo", True),
        **_LLAMA_GATED_MLP_MAP,
        "input_layernorm.weight": ("ln1_w", False),
        "post_attention_layernorm.weight": ("ln2_w", False),
    }

    def _setup(self, hf):
        self.norm_kind = "rms"
        self.norm_bias = False
        self.norm_eps = getattr(hf, "rms_norm_eps", 1e-6)
        self.act = ACT2MUL[getattr(hf, "hidden_act", "silu")]
        if self.rope_when_hidden is not None and \
                self.hidden_size != self.rope_when_hidden:
            self.positions = "alibi"
        self._normhead = getattr(hf, "vocab_size", 0) == 125696

    def _special_weight(self, sub, li, w, bufs, target):
        if sub != "self_attn.W_pack.weight":
            return False
        D = self.hidden_size
        bufs["wq"][li] = w[:D].T.astype(target)
        bufs["wk"][li] = w[D:2 * D].T.astype(target)
        bufs["wv"][li] = w[2 * D:].T.astype(target)
        return True

    def load_weights(self, weights):
        params = super().load_weights(weights)
        if self._normhead and "lm_head" in params:
            head = params["lm_head"].astype(np.float32)  # [H, V]
            norm = np.linalg.norm(head, axis=0, keepdims=True)
            params["lm_head"] = (head / np.maximum(norm, 1e-7)).astype(
                params["embed"].dtype)
        return params


class BaiChuanForCausalLM(BaichuanForCausalLM):
    """'BaiChuanForCausalLM' (capital C): the original baichuan-7B export —
    always RoPE regardless of width."""

    def _setup(self, hf):
        super()._setup(hf)
        self.positions = "rope"


class GlmForCausalLM(FlexibleDecoder):
    """HF 'GlmForCausalLM' (GLM-4 -hf exports): RMSNorm, partial (0.5)
    *interleaved* rotary, QKV bias without output bias, fused gate_up_proj
    gated-SiLU MLP."""

    rope_interleaved = True

    _TOP_MAP = _LLAMA_TOP
    _LAYER_MAP = {
        **_LLAMA_ATTN_MAP,
        "mlp.down_proj.weight": ("w_down", True),
        "input_layernorm.weight": ("ln1_w", False),
        "post_attention_layernorm.weight": ("ln2_w", False),
    }

    def _setup(self, hf):
        self.norm_kind = "rms"
        self.norm_bias = False
        self.norm_eps = getattr(hf, "rms_norm_eps", 1e-5)
        self.act = ACT2MUL[getattr(hf, "hidden_act", "silu")]
        self.attn_bias = getattr(hf, "attention_bias", True)
        self.attn_out_bias = False

    def _special_weight(self, sub, li, w, bufs, target):
        if sub != "mlp.gate_up_proj.weight":
            return False
        II = self.intermediate_size
        bufs["w_gate"][li] = w[:II].T.astype(target)
        bufs["w_up"][li] = w[II:].T.astype(target)
        return True


class Glm4ForCausalLM(GlmForCausalLM):
    """HF 'Glm4ForCausalLM': GLM body plus sandwich norms — extra RMSNorm
    on each branch output (post_self_attn / post_mlp layernorm)."""

    sandwich_norm = True

    _LAYER_MAP = {
        **GlmForCausalLM._LAYER_MAP,
        "post_self_attn_layernorm.weight": ("ln1_post_w", False),
        "post_mlp_layernorm.weight": ("ln2_post_w", False),
    }


class InternLMForCausalLM(FlexibleDecoder):
    """'InternLMForCausalLM' (InternLM-1, remote-code config): Llama body
    with optional bias on *all four* attention projections (config.bias)."""

    _TOP_MAP = _LLAMA_TOP
    _LAYER_MAP = {**_LLAMA_ATTN_MAP, **_LLAMA_GATED_MLP_MAP,
                  "input_layernorm.weight": ("ln1_w", False),
                  "post_attention_layernorm.weight": ("ln2_w", False)}

    def _setup(self, hf):
        self.norm_kind = "rms"
        self.norm_bias = False
        self.norm_eps = getattr(hf, "rms_norm_eps", 1e-6)
        self.act = ACT2MUL[getattr(hf, "hidden_act", "silu")]
        bias = getattr(hf, "bias", True)
        self.attn_bias = bias
        self.attn_out_bias = bias


class InternLM2ForCausalLM(FlexibleDecoder):
    """'InternLM2ForCausalLM' (remote-code config; reference
    modeling/models/internlm2.py): Llama math under InternLM2's own
    checkpoint schema — tok_embeddings/wqkv (fused per-kv-group rows like
    Falcon's new arch)/wo/w1/w3/w2/attention_norm/ffn_norm/output."""

    _TOP_MAP = {
        "model.tok_embeddings.weight": ("embed", False),
        "model.norm.weight": ("final_norm_w", False),
        "output.weight": ("lm_head", True),
    }
    _LAYER_MAP = {
        "attention.wo.weight": ("wo", True),
        "feed_forward.w1.weight": ("w_gate", True),
        "feed_forward.w3.weight": ("w_up", True),
        "feed_forward.w2.weight": ("w_down", True),
        "attention_norm.weight": ("ln1_w", False),
        "ffn_norm.weight": ("ln2_w", False),
    }

    def _setup(self, hf):
        self.norm_kind = "rms"
        self.norm_bias = False
        self.norm_eps = getattr(hf, "rms_norm_eps", 1e-6)
        self.act = ACT2MUL[getattr(hf, "hidden_act", "silu")]
        self.attn_bias = getattr(hf, "bias", False)

    def _special_weight(self, sub, li, w, bufs, target):
        if sub != "attention.wqkv.weight":
            return False
        nh, nkv, hd = self.num_heads, self.num_kv_heads, self.head_dim
        g = nh // nkv
        qkv = w.reshape(nkv, g + 2, hd, self.hidden_size)
        bufs["wq"][li] = qkv[:, :g].reshape(nh * hd, -1).T.astype(target)
        bufs["wk"][li] = qkv[:, g].reshape(nkv * hd, -1).T.astype(target)
        bufs["wv"][li] = qkv[:, g + 1].reshape(nkv * hd, -1).T.astype(target)
        return True


class ExaoneForCausalLM(FlexibleDecoder):
    """'ExaoneForCausalLM' (EXAONE-3.x, remote-code config): Llama math,
    GPT-style checkpoint schema (transformer.h / ln_1 / attn.attention /
    c_fc_0,c_fc_1,c_proj)."""

    _TOP_MAP = {
        "transformer.wte.weight": ("embed", False),
        "transformer.ln_f.weight": ("final_norm_w", False),
        "lm_head.weight": ("lm_head", True),
    }
    _LAYER_PREFIX = "transformer.h."
    _LAYER_MAP = {
        "attn.attention.q_proj.weight": ("wq", True),
        "attn.attention.k_proj.weight": ("wk", True),
        "attn.attention.v_proj.weight": ("wv", True),
        "attn.attention.out_proj.weight": ("wo", True),
        "mlp.c_fc_0.weight": ("w_gate", True),
        "mlp.c_fc_1.weight": ("w_up", True),
        "mlp.c_proj.weight": ("w_down", True),
        "ln_1.weight": ("ln1_w", False),
        "ln_2.weight": ("ln2_w", False),
    }

    def _setup(self, hf):
        self.norm_kind = "rms"
        self.norm_bias = False
        self.norm_eps = getattr(hf, "layer_norm_epsilon", 1e-5)
        self.act = ACT2MUL[getattr(hf, "activation_function", "silu")]


class Exaone4ForCausalLM(FlexibleDecoder):
    """HF 'Exaone4ForCausalLM': post-block RMSNorm placement (like OLMo-2)
    plus per-head QK-RMSNorm before rope. Hybrid sliding/NoPE layer stacks
    (sliding_window set) are a follow-up — global-attention checkpoints
    (EXAONE-4.0-1.2B style) are fully supported."""

    _TOP_MAP = _LLAMA_TOP
    _LAYER_MAP = {
        **_LLAMA_ATTN_MAP, **_LLAMA_GATED_MLP_MAP,
        "post_attention_layernorm.weight": ("ln1_w", False),
        "post_feedforward_layernorm.weight": ("ln2_w", False),
        "self_attn.q_norm.weight": ("q_norm", False),
        "self_attn.k_norm.weight": ("k_norm", False),
    }

    def _setup(self, hf):
        if getattr(hf, "sliding_window", None):
            raise NotImplementedError(
                "Exaone4 hybrid sliding/NoPE layer pattern: follow-up")
        self.norm_kind = "rms"
        self.norm_bias = False
        self.norm_eps = getattr(hf, "rms_norm_eps", 1e-5)
        self.act = ACT2MUL[getattr(hf, "hidden_act", "silu")]
        self.block_norm = "post"
        self.qk_norm = "per_head_rms"


class OrionForCausalLM(FlexibleDecoder):
    """'OrionForCausalLM' (remote-code config): Llama body with LayerNorm
    (+bias) residual norms instead of RMSNorm."""

    _TOP_MAP = _LLAMA_TOP
    _LAYER_MAP = {**_LLAMA_ATTN_MAP, **_LLAMA_GATED_MLP_MAP, **_LN_MAP}

    def _setup(self, hf):
        self.norm_kind = "ln"
        self.norm_eps = getattr(hf, "rms_norm_eps", 1e-5)
        self.act = ACT2MUL[getattr(hf, "hidden_act", "silu")]


class MiniCPMForCausalLM(FlexibleDecoder):
    """'MiniCPMForCausalLM' (remote-code config): Llama body with muP-style
    static scales — embeddings x scale_emb, residual branches x
    scale_depth/sqrt(L), logits / (hidden_size/dim_model_base)."""

    tie_default = True

    _TOP_MAP = _LLAMA_TOP
    _LAYER_MAP = {**_LLAMA_ATTN_MAP, **_LLAMA_GATED_MLP_MAP,
                  "input_layernorm.weight": ("ln1_w", False),
                  "post_attention_layernorm.weight": ("ln2_w", False)}

    def _setup(self, hf):
        self.norm_kind = "rms"
        self.norm_bias = False
        self.norm_eps = getattr(hf, "rms_norm_eps", 1e-5)
        self.act = ACT2MUL[getattr(hf, "hidden_act", "silu")]
        self.embedding_multiplier = getattr(hf, "scale_emb", 1.0)
        depth = getattr(hf, "scale_depth", None)
        if depth:
            self.residual_multiplier = depth / (self.num_layers ** 0.5)
        base = getattr(hf, "dim_model_base", None)
        if base:
            self.logits_multiplier = 1.0 / (self.hidden_size / base)
