"""ModernBERT encoder (embeddings + sequence classification).

Parity: aphrodite/modeling/models/modernbert.py. Pre-norm encoder with
rotary positions, a GeGLU MLP (Wi -> chunk2 -> act(input)*gate -> Wo), and
alternating attention: every ``global_attn_every_n_layers``-th layer is
global (its own rope theta), the rest attend inside a bidirectional
``local_attention`` window (local theta). Layer 0's attention norm is the
identity (the embedding norm directly feeds it). No linear biases;
LayerNorm bias per ``norm_bias``.
"""
from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.config import ModelConfig
from aphrodite_tpu.models.bert import layer_norm
from aphrodite_tpu.utils import jax_dtype


class ModernBertModel:

    is_encoder = True

    def __init__(self, config: ModelConfig):
        self.config = config
        hf = config.text_config
        self.dtype = jax_dtype(config.dtype)
        self.hidden_size = hf.hidden_size
        self.num_layers = hf.num_hidden_layers
        self.num_heads = hf.num_attention_heads
        self.head_dim = self.hidden_size // self.num_heads
        self.intermediate_size = hf.intermediate_size
        self.vocab_size = hf.vocab_size
        self.eps = getattr(hf, "norm_eps", 1e-5)
        self.norm_bias = getattr(hf, "norm_bias", False)
        self.global_every = getattr(hf, "global_attn_every_n_layers", 3)
        self.local_window = getattr(hf, "local_attention", 128)
        self.num_kv_heads = self.num_heads

        def inv(theta):
            hd = self.head_dim
            return theta ** -(np.arange(0, hd, 2, dtype=np.float64) / hd)

        self._inv_global = jnp.asarray(
            inv(getattr(hf, "global_rope_theta", 160000.0)), jnp.float32)
        self._inv_local = jnp.asarray(
            inv(getattr(hf, "local_rope_theta", 10000.0)), jnp.float32)
        self._is_global = np.asarray(
            [1.0 if i % self.global_every == 0 else 0.0
             for i in range(self.num_layers)], np.float32)

    # ------------------------------------------------------------------ params
    def _layer_shapes(self):
        H, I, L = self.hidden_size, self.intermediate_size, self.num_layers
        shapes = {
            "attn_norm_w": (L, H),
            "wqkv": (L, H, 3 * H),
            "wo": (L, H, H),
            "mlp_norm_w": (L, H),
            "wi": (L, H, 2 * I),
            "w_out": (L, I, H),
            "is_global": (L,),
        }
        if self.norm_bias:
            shapes.update(attn_norm_b=(L, H), mlp_norm_b=(L, H))
        return shapes

    def init_dummy_params(self, rng):
        keys = iter(jax.random.split(rng, 32))

        def mk(shape):
            return (0.02 * jax.random.normal(next(keys), shape, jnp.float32)
                    ).astype(self.dtype)

        layers = {}
        for k, s in self._layer_shapes().items():
            if k.endswith("_w") and "norm" in k:
                layers[k] = jnp.ones(s, self.dtype)
            elif k.endswith("_b") or k == "is_global":
                layers[k] = jnp.zeros(s, self.dtype)
            else:
                layers[k] = mk(s)
        layers["is_global"] = jnp.asarray(self._is_global, self.dtype)
        params = {
            "embed": mk((self.vocab_size, self.hidden_size)),
            "embed_ln_w": jnp.ones((self.hidden_size,), self.dtype),
            "final_ln_w": jnp.ones((self.hidden_size,), self.dtype),
            "layers": layers,
        }
        if self.norm_bias:
            params["embed_ln_b"] = jnp.zeros((self.hidden_size,),
                                             self.dtype)
            params["final_ln_b"] = jnp.zeros((self.hidden_size,),
                                             self.dtype)
        return params

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        import ml_dtypes  # noqa: F401
        target = (np.dtype("bfloat16") if self.dtype == jnp.bfloat16
                  else np.dtype(jnp.dtype(self.dtype).name))
        bufs = {k: np.zeros(s, target)
                for k, s in self._layer_shapes().items()}
        bufs["is_global"] = self._is_global.astype(target)
        params = {"layers": bufs}
        top = {
            "embeddings.tok_embeddings.weight": "embed",
            "embeddings.norm.weight": "embed_ln_w",
            "embeddings.norm.bias": "embed_ln_b",
            "final_norm.weight": "final_ln_w",
            "final_norm.bias": "final_ln_b",
        }
        lm = {
            "attn_norm.weight": ("attn_norm_w", False),
            "attn_norm.bias": ("attn_norm_b", False),
            "attn.Wqkv.weight": ("wqkv", True),
            "attn.Wo.weight": ("wo", True),
            "mlp_norm.weight": ("mlp_norm_w", False),
            "mlp_norm.bias": ("mlp_norm_b", False),
            "mlp.Wi.weight": ("wi", True),
            "mlp.Wo.weight": ("w_out", True),
        }
        extra = {}
        for name, w in weights:
            w = np.asarray(w)
            name = name.removeprefix("model.")
            if name in top:
                params[top[name]] = w.astype(target)
            elif name.startswith("layers."):
                rest = name[len("layers."):]
                idx_s, sub = rest.split(".", 1)
                m = lm.get(sub)
                if m is not None and m[0] in bufs:
                    key, tr = m
                    bufs[key][int(idx_s)] = (w.T if tr else w).astype(target)
            else:
                extra[name] = w
        # Head/classifier weights for the classification subclass (layer 0's
        # identity attention norm is special-cased in encode()).
        self._extra_weights = extra
        if "embed" not in params:
            raise ValueError("missing tok_embeddings")
        return params

    def param_specs(self):
        layers = {k: P() for k in self._layer_shapes()}
        layers["wqkv"] = P(None, None, "tp")
        layers["wi"] = P(None, None, "tp")
        layers["wo"] = P(None, "tp", None)
        layers["w_out"] = P(None, "tp", None)
        specs = {"embed": P(), "embed_ln_w": P(), "final_ln_w": P(),
                 "layers": layers}
        if self.norm_bias:
            specs.update(embed_ln_b=P(), final_ln_b=P())
        return specs

    # ----------------------------------------------------------------- forward
    def encode(self, params, input_ids, attn_mask, type_ids=None):
        B, S = input_ids.shape
        x = jnp.take(params["embed"], input_ids, axis=0)
        x = layer_norm(x, params["embed_ln_w"],
                       params.get("embed_ln_b", 0.0), self.eps)
        nh, hd = self.num_heads, self.head_dim
        pad_bias = jnp.where(attn_mask[:, None, None, :] > 0, 0.0, -1e9)
        dist = jnp.abs(jnp.arange(S)[:, None] - jnp.arange(S)[None, :])
        local_bias = jnp.where(dist[None, None] <= self.local_window // 2,
                               0.0, -1e9)
        pos = jnp.arange(S, dtype=jnp.float32)
        angs = {
            k: pos[:, None] * f[None, :]
            for k, f in (("g", self._inv_global), ("l", self._inv_local))
        }

        def attn(x, lp, first):
            h = x if first else layer_norm(
                x, lp["attn_norm_w"], lp.get("attn_norm_b", 0.0), self.eps)
            qkv = jnp.einsum("bsh,hd->bsd", h, lp["wqkv"])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(B, S, nh, hd)
            k = k.reshape(B, S, nh, hd)
            v = v.reshape(B, S, nh, hd)
            g = lp["is_global"] > 0
            ang = jnp.where(g, angs["g"], angs["l"])
            cos, sin = jnp.cos(ang), jnp.sin(ang)

            def rope(t):
                t1, t2 = jnp.split(t, 2, axis=-1)
                c, s_ = cos[None, :, None], sin[None, :, None]
                return jnp.concatenate(
                    [t1 * c - t2 * s_, t2 * c + t1 * s_], axis=-1
                ).astype(t.dtype)

            q, k = rope(q), rope(k)
            s = jnp.einsum("bqnd,bknd->bnqk", q, k) * (hd ** -0.5)
            s = s.astype(jnp.float32) + pad_bias
            s = s + jnp.where(g, 0.0, 1.0) * local_bias
            p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
            o = jnp.einsum("bnqk,bknd->bqnd", p, v).reshape(B, S, nh * hd)
            return jnp.einsum("bsh,hd->bsd", o, lp["wo"])

        def mlp(x, lp):
            h = layer_norm(x, lp["mlp_norm_w"], lp.get("mlp_norm_b", 0.0),
                           self.eps)
            iu = jnp.einsum("bsh,hi->bsi", h, lp["wi"])
            inp, gate = jnp.split(iu, 2, axis=-1)
            act = jax.nn.gelu(inp, approximate=False) * gate
            return jnp.einsum("bsi,ih->bsh", act, lp["w_out"])

        # Layer 0: identity attention norm (HF ModernBertAttention layer 0).
        lp0 = jax.tree.map(lambda a: a[0], params["layers"])
        x = x + attn(x, lp0, True)
        x = x + mlp(x, lp0)

        def layer(x, lp):
            x = x + attn(x, lp, False)
            x = x + mlp(x, lp)
            return x, None

        rest = jax.tree.map(lambda a: a[1:], params["layers"])
        x, _ = jax.lax.scan(layer, x, rest)
        return layer_norm(x, params["final_ln_w"],
                          params.get("final_ln_b", 0.0), self.eps)


class ModernBertEmbeddingModel(ModernBertModel):
    pass


class ModernBertForSequenceClassification(ModernBertModel):
    """Cross-encoder: prediction head (dense + act + norm) + classifier
    over the pooled ([CLS] or mean) final hidden state."""

    is_cross_encoder = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.text_config
        self.num_labels = getattr(hf, "num_labels", None) or 1
        self.pooling = getattr(hf, "classifier_pooling", "cls")

    def init_dummy_params(self, rng):
        params = super().init_dummy_params(rng)
        H = self.hidden_size
        k1, k2 = jax.random.split(rng)
        params["head_w"] = (0.02 * jax.random.normal(
            k1, (H, H), jnp.float32)).astype(self.dtype)
        params["head_ln_w"] = jnp.ones((H,), self.dtype)
        if self.norm_bias:
            params["head_ln_b"] = jnp.zeros((H,), self.dtype)
        params["cls_w"] = (0.02 * jax.random.normal(
            k2, (H, self.num_labels), jnp.float32)).astype(self.dtype)
        params["cls_b"] = jnp.zeros((self.num_labels,), self.dtype)
        return params

    def load_weights(self, weights):
        params = super().load_weights(weights)
        extra = self._extra_weights
        target = np.asarray(params["embed"]).dtype
        m = {"head.dense.weight": ("head_w", True),
             "head.norm.weight": ("head_ln_w", False),
             "head.norm.bias": ("head_ln_b", False),
             "classifier.weight": ("cls_w", True),
             "classifier.bias": ("cls_b", False)}
        for name, w in extra.items():
            got = m.get(name)
            if got is not None:
                key, tr = got
                params[key] = (w.T if tr else w).astype(target)
        if "cls_w" not in params:
            raise ValueError("checkpoint missing classifier head")
        return params

    def param_specs(self):
        specs = super().param_specs()
        specs.update(head_w=P(), head_ln_w=P(), cls_w=P(), cls_b=P())
        if self.norm_bias:
            specs["head_ln_b"] = P()
        return specs

    def classify(self, params, input_ids, attn_mask, type_ids=None):
        hidden = self.encode(params, input_ids, attn_mask)
        if self.pooling == "mean":
            m = attn_mask.astype(hidden.dtype)[:, :, None]
            pooled = jnp.sum(hidden * m, axis=1) / jnp.maximum(
                jnp.sum(m, axis=1), 1.0)
        else:
            pooled = hidden[:, 0]
        h = jnp.dot(pooled, params["head_w"])
        h = jax.nn.gelu(h, approximate=False)
        h = layer_norm(h, params["head_ln_w"],
                       params.get("head_ln_b", 0.0), self.eps)
        return (jnp.dot(h, params["cls_w"],
                        preferred_element_type=jnp.float32)
                + params["cls_b"].astype(jnp.float32))
