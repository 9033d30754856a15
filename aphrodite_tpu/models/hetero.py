"""Heterogeneous-layer decoders: per-layer geometry varies, so the forward
is a Python loop over per-layer parameter dicts instead of one `lax.scan`
over stacked weights (compile time grows with depth — these architectures
are rare, correctness over compile speed).

- DeciLMForCausalLM (reference modeling/models/nemotron_nas.py): NAS llama
  where each layer's block_config chooses attention no-op / per-layer GQA
  group size and FFN no-op / per-layer intermediate size.
- ArcticForCausalLM (reference modeling/models/arctic.py): dense MLP layers
  interleaved with 128-expert MoE layers (moe_layer_frequency), and on MoE
  layers an extra parallel residual MLP branch (use_residual,
  arctic.py:330-357).

Variable per-layer KV-head counts share one uniform paged cache sized for
the widest layer: narrower layers write their K/V repeated to the padded
head count, which preserves grouped-attention semantics because q-head h
reads padded head floor(h*kvh_max/nq) == its true kv head when
kvh_max % nkv_layer == 0.
"""
from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.attention import (AttentionMetadata, paged_attention,
                                     write_kv)
from aphrodite_tpu.config import ModelConfig
from aphrodite_tpu.layers.common import rms_norm, silu_and_mul
from aphrodite_tpu.layers.linear import apply_linear
from aphrodite_tpu.layers.rotary import (RopeConfig, apply_rope,
                                         compute_cos_sin, compute_inv_freq,
                                         longrope_orig_max)
from aphrodite_tpu.utils import jax_dtype


def _bc_get(block, *path, default=None):
    """block_configs entries arrive as dicts (generic remote-code config)
    or attribute objects."""
    cur = block
    for key in path:
        if cur is None:
            return default
        cur = cur.get(key) if isinstance(cur, dict) else getattr(cur, key,
                                                                 None)
    return default if cur is None else cur


class HeteroDecoder:
    """Shared protocol plumbing for python-loop models."""

    pp_size = 1
    mesh = None
    sequence_parallel = False
    quant_fmt = None
    is_ssm = False
    expert_parallel = False

    def __init__(self, config: ModelConfig):
        self.config = config
        hf = config.text_config
        self.hf = hf
        self.dtype = jax_dtype(config.dtype)
        self.hidden_size = config.hidden_size
        self.num_layers = config.num_layers
        self.num_heads = config.num_attention_heads
        self.num_kv_heads = config.num_kv_heads  # cache width (max)
        self.head_dim = config.head_dim
        self.vocab_size = config.vocab_size
        self.sliding_window = config.sliding_window
        self.scale = self.head_dim ** -0.5
        self.norm_eps = getattr(hf, "rms_norm_eps", 1e-5)
        self.tie_embeddings = getattr(hf, "tie_word_embeddings", False)
        self.rope = RopeConfig.from_hf_config(hf, self.head_dim)
        inv_freq, mscale = compute_inv_freq(self.rope)
        self._inv_freq = jnp.asarray(inv_freq)
        self._rope_mscale = mscale
        self._longrope_orig_max = longrope_orig_max(self.rope)

    def set_quant_config(self, qcfg) -> None:
        raise NotImplementedError(
            f"quantize-on-load for {type(self).__name__}: follow-up")

    # Per-layer shape dicts, defined by subclasses.
    def _layer_shapes(self, i: int) -> dict[str, tuple]:
        raise NotImplementedError

    def _top_shapes(self) -> dict[str, tuple]:
        H, V = self.hidden_size, self.vocab_size
        shapes = {"embed": (V, H), "final_norm_w": (H,)}
        if not self.tie_embeddings:
            shapes["lm_head"] = (H, V)
        return shapes

    def init_dummy_params(self, rng: jax.Array) -> dict:
        keys = iter(jax.random.split(rng, 4096))

        def mk(shape):
            return (0.02 * jax.random.normal(next(keys), shape, jnp.float32)
                    ).astype(self.dtype)

        def fill(shapes):
            out = {}
            for k, s in shapes.items():
                out[k] = jnp.ones(s, self.dtype) if "norm" in k else mk(s)
            return out

        params = fill(self._top_shapes())
        params["layers"] = [fill(self._layer_shapes(i))
                            for i in range(self.num_layers)]
        return params

    def param_specs(self) -> dict:
        def spec_of(k, shape):
            if "norm" in k or k.endswith("_b") or len(shape) < 2:
                return P()
            if k in ("wq", "wk", "wv", "w_gate", "w_up", "w1", "w3",
                     "router"):
                return P(None, "tp")
            if k in ("wo", "w_down", "w2"):
                return P("tp", None)
            if k in ("we_gate", "we_up"):
                return P(None, None, "tp")
            if k == "we_down":
                return P(None, "tp", None)
            if k == "embed":
                return P("tp", None)
            if k == "lm_head":
                return P(None, "tp")
            return P()

        specs = {k: spec_of(k, s) for k, s in self._top_shapes().items()}
        specs["layers"] = [
            {k: spec_of(k, s) for k, s in self._layer_shapes(i).items()}
            for i in range(self.num_layers)]
        return specs

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        layers = [{k: np.zeros(s, target)
                   for k, s in self._layer_shapes(i).items()}
                  for i in range(self.num_layers)]
        params: dict = {"layers": layers}
        for name, w in weights:
            if name.endswith("rotary_emb.inv_freq"):
                continue
            w = np.asarray(w)
            top = self._TOP_MAP.get(name)
            if top is not None:
                key, tr = top
                if key == "lm_head" and self.tie_embeddings:
                    continue
                params[key] = (w.T if tr else w).astype(target)
                continue
            if name.startswith("model.layers."):
                rest = name[len("model.layers."):]
                idx_s, sub = rest.split(".", 1)
                self._load_layer(int(idx_s), sub, w, layers, target)
        return params

    _TOP_MAP = {
        "model.embed_tokens.weight": ("embed", False),
        "model.norm.weight": ("final_norm_w", False),
        "lm_head.weight": ("lm_head", True),
    }

    def _load_layer(self, li, sub, w, layers, target):
        raise NotImplementedError

    def compute_logits(self, params: dict, hidden: jax.Array) -> jax.Array:
        head = params["embed"].T if self.tie_embeddings else params["lm_head"]
        return jnp.dot(hidden, head, preferred_element_type=jnp.float32)

    # -- shared attention with per-layer kv width --------------------------
    def _attn(self, x, lp, kvc, cos, sin, md, use_pallas, nkv,
              attn_bias=False):
        T = x.shape[0]
        nq, hd = self.num_heads, self.head_dim
        q = apply_linear(x, lp["wq"]).reshape(T, nq, hd)
        k = apply_linear(x, lp["wk"]).reshape(T, nkv, hd)
        v = apply_linear(x, lp["wv"]).reshape(T, nkv, hd)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if nkv != self.num_kv_heads:
            rep = self.num_kv_heads // nkv
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)
        kvc = write_kv(kvc, k, v, md.slot_mapping)
        o = paged_attention(q, kvc, md, self.scale,
                            sliding_window=self.sliding_window,
                            use_pallas=use_pallas)
        return apply_linear(o.reshape(T, nq * hd), lp["wo"]), kvc


class DeciLMForCausalLM(HeteroDecoder):
    """HF 'DeciLMForCausalLM' (reference modeling/models/nemotron_nas.py):
    per-layer block_configs select attention no-op / GQA group size
    (n_heads_in_group) and FFN no-op / ffn_mult-derived intermediate size
    (nemotron_nas.py:49-60,73-160)."""

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = self.hf
        H = self.hidden_size
        self.layer_attn_kv: list = []  # None = no-op
        self.layer_ffn_I: list = []    # None = no-op
        for i, block in enumerate(getattr(hf, "block_configs")):
            if _bc_get(block, "attention", "no_op", default=False):
                self.layer_attn_kv.append(None)
            elif _bc_get(block, "attention", "replace_with_linear",
                         default=False):
                raise NotImplementedError(
                    "DeciLM replace_with_linear attention: follow-up")
            else:
                g = _bc_get(block, "attention", "n_heads_in_group",
                            default=1)
                self.layer_attn_kv.append(self.num_heads // g)
            if _bc_get(block, "ffn", "no_op", default=False):
                self.layer_ffn_I.append(None)
            elif _bc_get(block, "ffn", "replace_with_linear", default=False):
                raise NotImplementedError(
                    "DeciLM replace_with_linear FFN: follow-up")
            else:
                mult = _bc_get(block, "ffn", "ffn_mult", default=4.0)
                I = int(2 * mult * H / 3)
                if I % 256:
                    I = I + 256 - (I % 256)
                self.layer_ffn_I.append(I)

    def _layer_shapes(self, i: int) -> dict[str, tuple]:
        H, nq, hd = self.hidden_size, self.num_heads, self.head_dim
        shapes: dict[str, tuple] = {}
        nkv = self.layer_attn_kv[i]
        if nkv is not None:
            shapes.update(ln1=(H,), wq=(H, nq * hd), wk=(H, nkv * hd),
                          wv=(H, nkv * hd), wo=(nq * hd, H))
        I = self.layer_ffn_I[i]
        if I is not None:
            shapes.update(ln2=(H,), w_gate=(H, I), w_up=(H, I),
                          w_down=(I, H))
        return shapes

    _SUB_MAP = {
        "input_layernorm.weight": ("ln1", False),
        "post_attention_layernorm.weight": ("ln2", False),
        "self_attn.q_proj.weight": ("wq", True),
        "self_attn.k_proj.weight": ("wk", True),
        "self_attn.v_proj.weight": ("wv", True),
        "self_attn.o_proj.weight": ("wo", True),
        "mlp.gate_proj.weight": ("w_gate", True),
        "mlp.up_proj.weight": ("w_up", True),
        "mlp.down_proj.weight": ("w_down", True),
    }

    def _load_layer(self, li, sub, w, layers, target):
        m = self._SUB_MAP.get(sub)
        if m is not None and m[0] in layers[li]:
            key, tr = m
            layers[li][key] = (w.T if tr else w).astype(target)

    def apply(self, params: dict, input_ids: jax.Array, kv_cache: jax.Array,
              md: AttentionMetadata, *, use_pallas: bool = False,
              lora: dict | None = None, mm=None):
        if lora is not None:
            raise NotImplementedError("LoRA on DeciLM: follow-up")
        x = jnp.take(params["embed"], input_ids, axis=0)
        if mm is not None:
            mm_embeds, mm_idx = mm
            x = x.at[mm_idx].set(mm_embeds.astype(x.dtype), mode="drop")
        cos, sin = compute_cos_sin(md.token_pos, self._inv_freq,
                                   self._rope_mscale,
                                   self._longrope_orig_max)
        for i, lp in enumerate(params["layers"]):
            nkv = self.layer_attn_kv[i]
            if nkv is not None:
                h = rms_norm(x, lp["ln1"], self.norm_eps)
                a, kvc = self._attn(h, lp, kv_cache[i], cos, sin, md,
                                    use_pallas, nkv)
                kv_cache = kv_cache.at[i].set(kvc)
                x = x + a
            if self.layer_ffn_I[i] is not None:
                h = rms_norm(x, lp["ln2"], self.norm_eps)
                y = apply_linear(
                    silu_and_mul(apply_linear(h, lp["w_gate"]),
                                 apply_linear(h, lp["w_up"])), lp["w_down"])
                x = x + y
        x = rms_norm(x, params["final_norm_w"], self.norm_eps)
        return x, kv_cache


class ArcticForCausalLM(HeteroDecoder):
    """HF 'ArcticForCausalLM' (reference modeling/models/arctic.py):
    every (moe_layer_frequency)-th layer is a top-2 softmax-renormalized
    MoE; with use_residual those layers add a parallel dense residual-MLP
    branch whose post-attention norm reads the PRE-attention activations
    (arctic.py:336-357). Checkpoint MLPs are w1(gate)/w3(up)/w2(down)."""

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = self.hf
        self.num_experts = getattr(hf, "num_local_experts", 8)
        self.top_k = getattr(hf, "num_experts_per_tok", 2)
        freq = getattr(hf, "moe_layer_frequency", 2)
        self.use_residual = getattr(hf, "use_residual", True)
        self.intermediate_size = hf.intermediate_size
        self.layer_is_moe = [(i + 1) % freq == 0
                             for i in range(self.num_layers)]

    def _layer_shapes(self, i: int) -> dict[str, tuple]:
        H, nq, nkv, hd = (self.hidden_size, self.num_heads,
                          self.num_kv_heads, self.head_dim)
        I, E = self.intermediate_size, self.num_experts
        shapes = dict(ln1=(H,), ln2=(H,), wq=(H, nq * hd), wk=(H, nkv * hd),
                      wv=(H, nkv * hd), wo=(nq * hd, H))
        if self.layer_is_moe[i]:
            shapes.update(router=(H, E), we_gate=(E, H, I),
                          we_up=(E, H, I), we_down=(E, I, H))
            if self.use_residual:
                shapes.update(res_norm=(H,), w_gate=(H, H), w_up=(H, H),
                              w_down=(H, H))
        else:
            shapes.update(w_gate=(H, I), w_up=(H, I), w_down=(I, H))
        return shapes

    def _load_layer(self, li, sub, w, layers, target):
        direct = {
            "input_layernorm.weight": ("ln1", False),
            "post_attention_layernorm.weight": ("ln2", False),
            "residual_layernorm.weight": ("res_norm", False),
            "self_attn.q_proj.weight": ("wq", True),
            "self_attn.k_proj.weight": ("wk", True),
            "self_attn.v_proj.weight": ("wv", True),
            "self_attn.o_proj.weight": ("wo", True),
            "block_sparse_moe.gate.weight": ("router", True),
            "block_sparse_moe.mlp.w1.weight": ("w_gate", True),
            "block_sparse_moe.mlp.w3.weight": ("w_up", True),
            "block_sparse_moe.mlp.w2.weight": ("w_down", True),
            "residual_mlp.w1.weight": ("w_gate", True),
            "residual_mlp.w3.weight": ("w_up", True),
            "residual_mlp.w2.weight": ("w_down", True),
        }.get(sub)
        if direct is not None:
            key, tr = direct
            if key in layers[li]:
                layers[li][key] = (w.T if tr else w).astype(target)
            return
        if sub.startswith("block_sparse_moe.experts."):
            parts = sub.split(".")
            e = int(parts[2])
            which = {"w1": "we_gate", "w3": "we_up",
                     "w2": "we_down"}.get(parts[3])
            if which is not None and which in layers[li]:
                layers[li][which][e] = w.T.astype(target)

    def _moe(self, h, lp):
        logits = jnp.dot(h, lp["router"], preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        topw, topi = jax.lax.top_k(probs, self.top_k)
        if self.top_k > 1:
            topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
        topw = topw.astype(h.dtype)

        def expert(acc, xs):
            wg, wu, wd, e = xs
            y = apply_linear(
                silu_and_mul(apply_linear(h, wg), apply_linear(h, wu)), wd)
            gate = jnp.sum(jnp.where(topi == e, topw, 0.0), axis=-1)
            return acc + gate[:, None] * y, None

        acc, _ = jax.lax.scan(
            expert, jnp.zeros_like(h),
            (lp["we_gate"], lp["we_up"], lp["we_down"],
             jnp.arange(self.num_experts, dtype=jnp.int32)))
        return acc

    def apply(self, params: dict, input_ids: jax.Array, kv_cache: jax.Array,
              md: AttentionMetadata, *, use_pallas: bool = False,
              lora: dict | None = None, mm=None):
        if lora is not None:
            raise NotImplementedError("LoRA on Arctic: follow-up")
        x = jnp.take(params["embed"], input_ids, axis=0)
        if mm is not None:
            mm_embeds, mm_idx = mm
            x = x.at[mm_idx].set(mm_embeds.astype(x.dtype), mode="drop")
        cos, sin = compute_cos_sin(md.token_pos, self._inv_freq,
                                   self._rope_mscale,
                                   self._longrope_orig_max)

        def dense_mlp(h, lp):
            return apply_linear(
                silu_and_mul(apply_linear(h, lp["w_gate"]),
                             apply_linear(h, lp["w_up"])), lp["w_down"])

        for i, lp in enumerate(params["layers"]):
            x_in = x
            h = rms_norm(x, lp["ln1"], self.norm_eps)
            a, kvc = self._attn(h, lp, kv_cache[i], cos, sin, md,
                                use_pallas, self.num_kv_heads)
            kv_cache = kv_cache.at[i].set(kvc)
            x1 = x_in + a
            if self.layer_is_moe[i] and self.use_residual:
                r = dense_mlp(rms_norm(x1, lp["res_norm"], self.norm_eps),
                              lp)
                # post-attention norm reads the PRE-attention activations
                # (arctic.py:348-357).
                moe_out = self._moe(rms_norm(x_in, lp["ln2"], self.norm_eps),
                                    lp)
                x = x1 + r + moe_out
            elif self.layer_is_moe[i]:
                x = x1 + self._moe(rms_norm(x1, lp["ln2"], self.norm_eps),
                                   lp)
            else:
                x = x1 + dense_mlp(rms_norm(x1, lp["ln2"], self.norm_eps),
                                   lp)
        x = rms_norm(x, params["final_norm_w"], self.norm_eps)
        return x, kv_cache
