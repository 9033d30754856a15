"""BERT-family encoder for embedding/pooling serving.

Parity: the reference's embedding-model category (BERT/RoBERTa/...,
modeling/models/registry.py:119). Encoders are single-shot (no KV cache, no
paging): one padded bidirectional forward, then pooling. Served through
`LLM.embed` / the /v1/embeddings route.
"""
from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.config import ModelConfig
from aphrodite_tpu.utils import jax_dtype


def layer_norm(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


class BertModel:
    """Encoder: params as stacked per-layer arrays, scan over layers."""

    is_encoder = True
    # Position-embedding index of the first token. RoBERTa starts at
    # padding_idx + 1 (HF create_position_ids_from_input_ids).
    pos_offset = 0
    _PREFIXES = ("bert.",)

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
        self.max_pos = hf.max_position_embeddings
        self.type_vocab = getattr(hf, "type_vocab_size", 2)
        self.eps = getattr(hf, "layer_norm_eps", 1e-12)
        if getattr(hf, "model_type", "") in ("roberta", "xlm-roberta"):
            self.pos_offset = getattr(hf, "pad_token_id", 1) + 1
        # For interface parity with decoder models.
        self.num_kv_heads = self.num_heads

    def _layer_shapes(self):
        H, I, L = self.hidden_size, self.intermediate_size, self.num_layers
        return {
            "wq": (L, H, H), "bq2": (L, H),
            "wk": (L, H, H), "bk2": (L, H),
            "wv": (L, H, H), "bv2": (L, H),
            "wo": (L, H, H), "bo": (L, H),
            "attn_ln_w": (L, H), "attn_ln_b": (L, H),
            "w_in": (L, H, I), "b_in": (L, I),
            "w_out": (L, I, H), "b_out": (L, H),
            "out_ln_w": (L, H), "out_ln_b": (L, H),
        }

    def init_dummy_params(self, rng):
        keys = iter(jax.random.split(rng, 64))

        def mk(shape):
            return (0.02 * jax.random.normal(next(keys), shape, jnp.float32)
                    ).astype(self.dtype)

        layers = {}
        for name, shape in self._layer_shapes().items():
            if name.endswith(("ln_w",)):
                layers[name] = jnp.ones(shape, self.dtype)
            elif name.startswith("b") or name.endswith("ln_b"):
                layers[name] = jnp.zeros(shape, self.dtype)
            else:
                layers[name] = mk(shape)
        return {
            "embed": mk((self.vocab_size, self.hidden_size)),
            "pos_embed": mk((self.max_pos, self.hidden_size)),
            "type_embed": mk((self.type_vocab, self.hidden_size)),
            "embed_ln_w": jnp.ones((self.hidden_size,), self.dtype),
            "embed_ln_b": jnp.zeros((self.hidden_size,), self.dtype),
            "layers": layers,
        }

    _HF_MAP = {
        "attention.self.query.weight": ("wq", True),
        "attention.self.query.bias": ("bq2", False),
        "attention.self.key.weight": ("wk", True),
        "attention.self.key.bias": ("bk2", False),
        "attention.self.value.weight": ("wv", True),
        "attention.self.value.bias": ("bv2", False),
        "attention.output.dense.weight": ("wo", True),
        "attention.output.dense.bias": ("bo", False),
        "attention.output.LayerNorm.weight": ("attn_ln_w", False),
        "attention.output.LayerNorm.bias": ("attn_ln_b", False),
        "intermediate.dense.weight": ("w_in", True),
        "intermediate.dense.bias": ("b_in", False),
        "output.dense.weight": ("w_out", True),
        "output.dense.bias": ("b_out", False),
        "output.LayerNorm.weight": ("out_ln_w", False),
        "output.LayerNorm.bias": ("out_ln_b", False),
    }

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        import ml_dtypes
        target = (np.dtype("bfloat16") if self.dtype == jnp.bfloat16
                  else np.dtype(jnp.dtype(self.dtype).name))
        bufs = {k: np.zeros(s, target)
                for k, s in self._layer_shapes().items()}
        params = {"layers": bufs}
        top = {
            "embeddings.word_embeddings.weight": "embed",
            "embeddings.position_embeddings.weight": "pos_embed",
            "embeddings.token_type_embeddings.weight": "type_embed",
            "embeddings.LayerNorm.weight": "embed_ln_w",
            "embeddings.LayerNorm.bias": "embed_ln_b",
        }
        for name, w in weights:
            for pref in ("bert.", "roberta.", "xlm_roberta."):
                name = name.removeprefix(pref)
            if name in top:
                params[top[name]] = np.asarray(w).astype(target)
                continue
            if name.startswith("encoder.layer."):
                rest = name[len("encoder.layer."):]
                idx, sub = rest.split(".", 1)
                mapped = self._HF_MAP.get(sub)
                if mapped:
                    key, t = mapped
                    arr = np.asarray(w)
                    bufs[key][int(idx)] = (arr.T if t else arr).astype(target)
        if "embed" not in params:
            raise ValueError("missing word embeddings")
        return params

    def param_specs(self):
        layers = {k: P() for k in self._layer_shapes()}
        for k in ("wq", "wk", "wv", "w_in"):
            layers[k] = P(None, None, "tp")
        for k in ("wo", "w_out"):
            layers[k] = P(None, "tp", None)
        return {"embed": P(), "pos_embed": P(), "type_embed": P(),
                "embed_ln_w": P(), "embed_ln_b": P(), "layers": layers}

    def encode(self, params, input_ids, attn_mask, type_ids=None):
        """input_ids [B, S], attn_mask [B, S] (1 = real) -> hidden [B, S, H].
        type_ids [B, S] segment ids for sentence pairs (cross-encoders);
        None = all segment 0."""
        B, S = input_ids.shape
        x = jnp.take(params["embed"], input_ids, axis=0)
        off = self.pos_offset
        if "pos_embed" in params:
            x = x + jax.lax.dynamic_slice_in_dim(params["pos_embed"], off,
                                                 S, axis=0)[None]
        if "type_embed" in params:
            if type_ids is None:
                x = x + params["type_embed"][0][None, None, :]
            else:
                x = x + jnp.take(params["type_embed"], type_ids, axis=0)
        x = layer_norm(x, params["embed_ln_w"], params["embed_ln_b"],
                       self.eps)
        nh, hd = self.num_heads, self.head_dim
        bias = jnp.where(attn_mask[:, None, None, :] > 0, 0.0, -1e9)
        cos_sin = self._rope_cos_sin(S)

        def layer(x, lp):
            q = (jnp.einsum("bsh,hd->bsd", x, lp["wq"]) + lp["bq2"]) \
                .reshape(B, S, nh, hd)
            k = (jnp.einsum("bsh,hd->bsd", x, lp["wk"]) + lp["bk2"]) \
                .reshape(B, S, nh, hd)
            v = (jnp.einsum("bsh,hd->bsd", x, lp["wv"]) + lp["bv2"]) \
                .reshape(B, S, nh, hd)
            if cos_sin is not None:
                q = self._rope(q, *cos_sin)
                k = self._rope(k, *cos_sin)
            s = jnp.einsum("bqnd,bknd->bnqk", q, k) / jnp.sqrt(
                jnp.float32(hd)).astype(x.dtype)
            s = s.astype(jnp.float32) + bias
            p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
            o = jnp.einsum("bnqk,bknd->bqnd", p, v).reshape(B, S, nh * hd)
            o = jnp.einsum("bsh,hd->bsd", o, lp["wo"]) + lp["bo"]
            x = layer_norm(x + o, lp["attn_ln_w"], lp["attn_ln_b"], self.eps)
            h = self._mlp(x, lp)
            x = layer_norm(x + h, lp["out_ln_w"], lp["out_ln_b"], self.eps)
            return x, None

        x, _ = jax.lax.scan(layer, x, params["layers"])
        return x

    def _rope_cos_sin(self, S):
        """Hook: rotary-position variants (GTE / NomicBERT) return (cos,
        sin) [S, rot/2]; classic BERT uses learned positions (None)."""
        return None

    def _rope(self, x, cos, sin):
        from aphrodite_tpu.layers.rotary import apply_rope
        B, S, nh, hd = x.shape
        out = apply_rope(x.reshape(B * S, nh, hd),
                         jnp.tile(cos, (B, 1)), jnp.tile(sin, (B, 1)))
        return out.reshape(B, S, nh, hd)

    def _mlp(self, x, lp):
        h = jax.nn.gelu(
            jnp.einsum("bsh,hi->bsi", x, lp["w_in"]) + lp["b_in"],
            approximate=False)
        return jnp.einsum("bsi,ih->bsh", h, lp["w_out"]) + lp["b_out"]


class BertEmbeddingModel(BertModel):
    """Registered arch entry (BertModel / BertForMaskedLM checkpoints)."""


class _RotaryGatedBert(BertModel):
    """Post-norm BERT body with rotary positions, fused QKV and a gated
    (GLU) MLP — the shared shape of GTE-new and NomicBERT (reference
    bert.py GteEmbeddingModel / NomicBertEmbeddingModel)."""

    act = staticmethod(jax.nn.silu)
    linear_bias = False

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.text_config
        base = getattr(hf, "rope_theta",
                       getattr(hf, "rotary_emb_base", 10000.0))
        frac = getattr(hf, "rotary_emb_fraction", 1.0)
        self.rot_dim = getattr(hf, "rotary_emb_dim", None) or \
            int(self.head_dim * frac)
        self._inv_freq = jnp.asarray(
            base ** -(np.arange(0, self.rot_dim, 2, dtype=np.float64)
                      / self.rot_dim), jnp.float32)

    def _layer_shapes(self):
        shapes = super()._layer_shapes()
        H, I, L = self.hidden_size, self.intermediate_size, self.num_layers
        del shapes["w_in"], shapes["b_in"]
        # Bias buffers stay allocated (zeros) — rows are filled only when
        # the checkpoint carries them (GTE has biases, NomicBERT doesn't).
        shapes.update(w_gate=(L, H, I), w_up=(L, H, I))
        return shapes

    def _rope_cos_sin(self, S):
        pos = jnp.arange(S, dtype=jnp.float32)
        ang = pos[:, None] * self._inv_freq[None, :]
        return jnp.cos(ang), jnp.sin(ang)

    def _rope(self, x, cos, sin):
        from aphrodite_tpu.layers.rotary import apply_rope
        B, S, nh, hd = x.shape
        rot = self.rot_dim
        xr = x[..., :rot].reshape(B * S, nh, rot)
        out = apply_rope(xr, jnp.tile(cos, (B, 1)), jnp.tile(sin, (B, 1)))
        out = out.reshape(B, S, nh, rot)
        if rot != hd:
            out = jnp.concatenate([out, x[..., rot:]], axis=-1)
        return out

    def _mlp(self, x, lp):
        g = jnp.einsum("bsh,hi->bsi", x, lp["w_gate"])
        u = jnp.einsum("bsh,hi->bsi", x, lp["w_up"])
        return jnp.einsum("bsi,ih->bsh", self.act(g) * u, lp["w_out"]) \
            + lp["b_out"]


class NomicBertEmbeddingModel(_RotaryGatedBert):
    """HF remote-code 'NomicBertModel' (nomic-embed-text): GPT2-style
    config names, fused Wqkv, swiglu MLP (fc12 = gate, fc11 = up), emb_ln,
    post-norm (norm1/norm2). Reference bert.py:613."""

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        import ml_dtypes  # noqa: F401
        target = (np.dtype("bfloat16") if self.dtype == jnp.bfloat16
                  else np.dtype(jnp.dtype(self.dtype).name))
        bufs = {k: np.zeros(s, target)
                for k, s in self._layer_shapes().items()}
        params = {"layers": bufs}
        H = self.hidden_size
        for name, w in weights:
            w = np.asarray(w)
            name = name.removeprefix("bert.")
            if name == "embeddings.word_embeddings.weight":
                params["embed"] = w.astype(target)
            elif name == "embeddings.token_type_embeddings.weight":
                params["type_embed"] = w.astype(target)
            elif name == "emb_ln.weight":
                params["embed_ln_w"] = w.astype(target)
            elif name == "emb_ln.bias":
                params["embed_ln_b"] = w.astype(target)
            elif name.startswith("encoder.layers."):
                rest = name[len("encoder.layers."):]
                idx_s, sub = rest.split(".", 1)
                li = int(idx_s)
                if sub == "attn.Wqkv.weight":
                    q, k, v = np.split(w, 3, axis=0)
                    bufs["wq"][li] = q.T.astype(target)
                    bufs["wk"][li] = k.T.astype(target)
                    bufs["wv"][li] = v.T.astype(target)
                elif sub == "attn.Wqkv.bias":
                    q, k, v = np.split(w, 3, axis=0)
                    bufs["bq2"][li] = q.astype(target)
                    bufs["bk2"][li] = k.astype(target)
                    bufs["bv2"][li] = v.astype(target)
                else:
                    m = {
                        "attn.out_proj.weight": ("wo", True),
                        "attn.out_proj.bias": ("bo", False),
                        "norm1.weight": ("attn_ln_w", False),
                        "norm1.bias": ("attn_ln_b", False),
                        "mlp.fc11.weight": ("w_up", True),
                        "mlp.fc12.weight": ("w_gate", True),
                        "mlp.fc2.weight": ("w_out", True),
                        "mlp.fc2.bias": ("b_out", False),
                        "norm2.weight": ("out_ln_w", False),
                        "norm2.bias": ("out_ln_b", False),
                    }.get(sub)
                    if m is not None:
                        key, tr = m
                        bufs[key][li] = (w.T if tr else w).astype(target)
        if "embed" not in params:
            raise ValueError("missing word embeddings")
        return params


class GteEmbeddingModel(_RotaryGatedBert):
    """'GteModel' / 'NewModel' (Alibaba gte-*-v1.5): rope BERT with fused
    qkv_proj and a fused up_gate_proj ([gate | up] rows) gelu GLU.
    Reference bert.py:667."""

    act = staticmethod(lambda x: jax.nn.gelu(x, approximate=False))

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        import ml_dtypes  # noqa: F401
        target = (np.dtype("bfloat16") if self.dtype == jnp.bfloat16
                  else np.dtype(jnp.dtype(self.dtype).name))
        bufs = {k: np.zeros(s, target)
                for k, s in self._layer_shapes().items()}
        params = {"layers": bufs}
        I = self.intermediate_size
        for name, w in weights:
            w = np.asarray(w)
            for pref in ("new.", "model."):
                name = name.removeprefix(pref)
            if name == "embeddings.word_embeddings.weight":
                params["embed"] = w.astype(target)
            elif name == "embeddings.token_type_embeddings.weight":
                params["type_embed"] = w.astype(target)
            elif name == "embeddings.LayerNorm.weight":
                params["embed_ln_w"] = w.astype(target)
            elif name == "embeddings.LayerNorm.bias":
                params["embed_ln_b"] = w.astype(target)
            elif name.startswith("encoder.layer."):
                rest = name[len("encoder.layer."):]
                idx_s, sub = rest.split(".", 1)
                li = int(idx_s)
                if sub == "attention.qkv_proj.weight":
                    q, k, v = np.split(w, 3, axis=0)
                    bufs["wq"][li] = q.T.astype(target)
                    bufs["wk"][li] = k.T.astype(target)
                    bufs["wv"][li] = v.T.astype(target)
                elif sub == "attention.qkv_proj.bias":
                    q, k, v = np.split(w, 3, axis=0)
                    bufs["bq2"][li] = q.astype(target)
                    bufs["bk2"][li] = k.astype(target)
                    bufs["bv2"][li] = v.astype(target)
                elif sub == "mlp.up_gate_proj.weight":
                    bufs["w_gate"][li] = w[:I].T.astype(target)
                    bufs["w_up"][li] = w[I:].T.astype(target)
                else:
                    m = {
                        "attention.o_proj.weight": ("wo", True),
                        "attention.o_proj.bias": ("bo", False),
                        "attn_ln.weight": ("attn_ln_w", False),
                        "attn_ln.bias": ("attn_ln_b", False),
                        "mlp.down_proj.weight": ("w_out", True),
                        "mlp.down_proj.bias": ("b_out", False),
                        "mlp_ln.weight": ("out_ln_w", False),
                        "mlp_ln.bias": ("out_ln_b", False),
                    }.get(sub)
                    if m is not None:
                        key, tr = m
                        bufs[key][li] = (w.T if tr else w).astype(target)
        if "embed" not in params:
            raise ValueError("missing word embeddings")
        return params


class BertForSequenceClassification(BertModel):
    """Cross-encoder scoring/reranking: pooler (dense+tanh over [CLS]) +
    classifier head. Reference: cross-encoder registry entries
    (aphrodite/modeling/models/registry.py:158) + bert.py scoring path;
    served through LLM.score and the /score + /rerank routes."""

    is_cross_encoder = True

    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.text_config
        self.num_labels = getattr(hf, "num_labels", None) or 1

    def init_dummy_params(self, rng):
        params = super().init_dummy_params(rng)
        H = self.hidden_size
        k1, k2 = jax.random.split(rng)
        params["pooler_w"] = (0.02 * jax.random.normal(
            k1, (H, H), jnp.float32)).astype(self.dtype)
        params["pooler_b"] = jnp.zeros((H,), self.dtype)
        params["cls_w"] = (0.02 * jax.random.normal(
            k2, (H, self.num_labels), jnp.float32)).astype(self.dtype)
        params["cls_b"] = jnp.zeros((self.num_labels,), self.dtype)
        return params

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        import ml_dtypes  # noqa: F401
        target = (np.dtype("bfloat16") if self.dtype == jnp.bfloat16
                  else np.dtype(jnp.dtype(self.dtype).name))
        extra = {}

        def route(ws):
            for name, w in ws:
                short = name.removeprefix("bert.")
                if short == "pooler.dense.weight":
                    extra["pooler_w"] = np.asarray(w).T.astype(target)
                elif short == "pooler.dense.bias":
                    extra["pooler_b"] = np.asarray(w).astype(target)
                elif name == "classifier.weight":
                    extra["cls_w"] = np.asarray(w).T.astype(target)
                elif name == "classifier.bias":
                    extra["cls_b"] = np.asarray(w).astype(target)
                # Roberta classification head (HF RobertaClassificationHead:
                # dense+tanh then out_proj over [CLS]) — isomorphic to
                # BERT's pooler+classifier.
                elif name == "classifier.dense.weight":
                    extra["pooler_w"] = np.asarray(w).T.astype(target)
                elif name == "classifier.dense.bias":
                    extra["pooler_b"] = np.asarray(w).astype(target)
                elif name == "classifier.out_proj.weight":
                    extra["cls_w"] = np.asarray(w).T.astype(target)
                elif name == "classifier.out_proj.bias":
                    extra["cls_b"] = np.asarray(w).astype(target)
                else:
                    yield name, w

        params = super().load_weights(route(weights))
        if "cls_w" not in extra:
            raise ValueError("checkpoint missing classifier head")
        params.update(extra)
        return params

    def param_specs(self):
        specs = super().param_specs()
        specs.update(pooler_w=P(), pooler_b=P(), cls_w=P(), cls_b=P())
        return specs

    def classify(self, params, input_ids, attn_mask, type_ids):
        """-> logits [B, num_labels] (pooler tanh over [CLS], classifier)."""
        hidden = self.encode(params, input_ids, attn_mask, type_ids)
        cls = hidden[:, 0]
        pooled = jnp.tanh(jnp.dot(cls, params["pooler_w"])
                          + params["pooler_b"])
        return (jnp.dot(pooled, params["cls_w"],
                        preferred_element_type=jnp.float32)
                + params["cls_b"].astype(jnp.float32))
