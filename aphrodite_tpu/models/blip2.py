"""BLIP-2: ViT tower + Q-Former + OPT language model.

Parity: aphrodite/modeling/models/blip2.py (+ blip.py). The vision tower is
a pre-norm ViT with fused QKV; the Q-Former runs ``num_query_tokens``
learned queries through post-norm BERT blocks with cross-attention to the
vision states every ``cross_attention_frequency`` layers (query-path MLPs
— the serving Q-Former never sees text). ``language_projection`` maps the
queries into the LM width; each image contributes exactly
``num_query_tokens`` rows at the placeholder positions (prompts without a
placeholder get the image block prepended — BLIP-2's original layout).
"""
from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


class Blip2VisionTower:

    def __init__(self, vc, dtype) -> None:
        self.dtype = dtype
        self.hidden = vc.hidden_size
        self.layers = vc.num_hidden_layers
        self.heads = vc.num_attention_heads
        self.head_dim = self.hidden // self.heads
        self.intermediate = vc.intermediate_size
        self.patch = vc.patch_size
        self.image_size = vc.image_size
        self.grid = vc.image_size // vc.patch_size
        self.eps = getattr(vc, "layer_norm_eps", 1e-6)

    def shapes(self) -> dict:
        D, I, L = self.hidden, self.intermediate, self.layers
        P_ = self.grid * self.grid
        return {
            "cls": (D,),
            "patch_w": (3 * self.patch * self.patch, D),
            "patch_b": (D,),
            "pos": (P_ + 1, D),
            "post_ln_w": (D,), "post_ln_b": (D,),
            "layers": {
                "ln1_w": (L, D), "ln1_b": (L, D),
                "wqkv": (L, D, 3 * D), "bqkv": (L, 3 * D),
                "wo": (L, D, D), "bo": (L, D),
                "ln2_w": (L, D), "ln2_b": (L, D),
                "fc1_w": (L, D, I), "fc1_b": (L, I),
                "fc2_w": (L, I, D), "fc2_b": (L, D),
            },
        }

    def make_bufs(self, target) -> dict:
        def mk(shapes):
            return {k: mk(v) if isinstance(v, dict) else np.zeros(v, target)
                    for k, v in shapes.items()}
        return mk(self.shapes())

    def init_dummy(self, rng: jax.Array) -> dict:
        keys = iter(jax.random.split(rng, 32))

        def fill(shapes):
            out = {}
            for k, s in shapes.items():
                if isinstance(s, dict):
                    out[k] = fill(s)
                elif "ln" in k and k.endswith("_w"):
                    out[k] = jnp.ones(s, self.dtype)
                elif k.endswith("_b") or k.startswith("b"):
                    out[k] = jnp.zeros(s, self.dtype)
                else:
                    out[k] = (0.02 * jax.random.normal(
                        next(keys), s, jnp.float32)).astype(self.dtype)
            return out
        return fill(self.shapes())

    def load_hf(self, name: str, w: np.ndarray, bufs: dict, target) -> bool:
        """Route one ``vision_model.``-relative HF tensor."""
        if name == "embeddings.class_embedding":
            bufs["cls"][...] = w.reshape(-1).astype(target)
        elif name == "embeddings.patch_embedding.weight":
            bufs["patch_w"][...] = w.reshape(w.shape[0], -1).T.astype(target)
        elif name == "embeddings.patch_embedding.bias":
            bufs["patch_b"][...] = w.astype(target)
        elif name == "embeddings.position_embedding":
            bufs["pos"][...] = w.reshape(-1, w.shape[-1]).astype(target)
        elif name == "post_layernorm.weight":
            bufs["post_ln_w"][...] = w.astype(target)
        elif name == "post_layernorm.bias":
            bufs["post_ln_b"][...] = w.astype(target)
        elif name.startswith("encoder.layers."):
            rest = name[len("encoder.layers."):]
            idx_s, sub = rest.split(".", 1)
            li = int(idx_s)
            m = {
                "layer_norm1.weight": ("ln1_w", False),
                "layer_norm1.bias": ("ln1_b", False),
                "self_attn.qkv.weight": ("wqkv", True),
                "self_attn.qkv.bias": ("bqkv", False),
                "self_attn.projection.weight": ("wo", True),
                "self_attn.projection.bias": ("bo", False),
                "layer_norm2.weight": ("ln2_w", False),
                "layer_norm2.bias": ("ln2_b", False),
                "mlp.fc1.weight": ("fc1_w", True),
                "mlp.fc1.bias": ("fc1_b", False),
                "mlp.fc2.weight": ("fc2_w", True),
                "mlp.fc2.bias": ("fc2_b", False),
            }.get(sub)
            if m is None:
                return False
            key, tr = m
            bufs["layers"][key][li] = (w.T if tr else w).astype(target)
        else:
            return False
        return True

    def encode(self, vp: dict, pixel_values: jax.Array) -> jax.Array:
        """[N,3,S,S] -> post-LN states [N, 1+P, D]."""
        N, ps, g, D = pixel_values.shape[0], self.patch, self.grid, \
            self.hidden
        x = pixel_values.astype(self.dtype)
        x = x.reshape(N, 3, g, ps, g, ps).transpose(0, 2, 4, 1, 3, 5)
        x = x.reshape(N, g * g, 3 * ps * ps)
        x = jnp.einsum("npc,cd->npd", x, vp["patch_w"],
                       preferred_element_type=jnp.float32
                       ).astype(self.dtype) + vp["patch_b"]
        cls = jnp.broadcast_to(vp["cls"], (N, 1, D)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        x = x + vp["pos"][None].astype(x.dtype)
        nh, hd = self.heads, self.head_dim
        T = x.shape[1]

        def layer(x, lp):
            h = _ln(x, lp["ln1_w"], lp["ln1_b"], self.eps)
            qkv = jnp.dot(h, lp["wqkv"]) + lp["bqkv"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(N, T, nh, hd)
            k = k.reshape(N, T, nh, hd)
            v = v.reshape(N, T, nh, hd)
            logits = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                                preferred_element_type=jnp.float32)
            p = jax.nn.softmax(logits * (hd ** -0.5), -1).astype(x.dtype)
            o = jnp.einsum("nhqk,nkhd->nqhd", p, v).reshape(N, T, D)
            x = x + jnp.dot(o, lp["wo"]) + lp["bo"]
            h = _ln(x, lp["ln2_w"], lp["ln2_b"], self.eps)
            h = jax.nn.gelu(jnp.dot(h, lp["fc1_w"]) + lp["fc1_b"],
                            approximate=False)
            x = x + jnp.dot(h, lp["fc2_w"]) + lp["fc2_b"]
            return x, None

        x, _ = jax.lax.scan(layer, x, vp["layers"])
        return _ln(x, vp["post_ln_w"], vp["post_ln_b"], self.eps)


class Blip2QFormer:

    def __init__(self, qc, vision_dim, dtype) -> None:
        self.dtype = dtype
        self.hidden = qc.hidden_size
        self.layers = qc.num_hidden_layers
        self.heads = qc.num_attention_heads
        self.head_dim = self.hidden // self.heads
        self.intermediate = qc.intermediate_size
        self.cross_freq = getattr(qc, "cross_attention_frequency", 2)
        self.vision_dim = vision_dim
        self.eps = getattr(qc, "layer_norm_eps", 1e-12)

    def shapes(self) -> dict:
        D, I, L, Dv = (self.hidden, self.intermediate, self.layers,
                       self.vision_dim)
        shapes = {
            "ln_w": (D,), "ln_b": (D,),
            "layers": {
                "wq": (L, D, D), "bq": (L, D),
                "wk": (L, D, D), "bk": (L, D),
                "wv": (L, D, D), "bv": (L, D),
                "wo": (L, D, D), "bo": (L, D),
                "sa_ln_w": (L, D), "sa_ln_b": (L, D),
                "cwq": (L, D, D), "cbq": (L, D),
                "cwk": (L, Dv, D), "cbk": (L, D),
                "cwv": (L, Dv, D), "cbv": (L, D),
                "cwo": (L, D, D), "cbo": (L, D),
                "ca_ln_w": (L, D), "ca_ln_b": (L, D),
                "has_cross": (L,),
                "fc1_w": (L, D, I), "fc1_b": (L, I),
                "fc2_w": (L, I, D), "fc2_b": (L, D),
                "ff_ln_w": (L, D), "ff_ln_b": (L, D),
            },
        }
        return shapes

    def make_bufs(self, target) -> dict:
        def mk(shapes):
            return {k: mk(v) if isinstance(v, dict) else np.zeros(v, target)
                    for k, v in shapes.items()}
        bufs = mk(self.shapes())
        bufs["layers"]["has_cross"] = np.asarray(
            [1.0 if i % self.cross_freq == 0 else 0.0
             for i in range(self.layers)], target)
        # Identity-init the cross norms so skipped layers stay well-formed.
        bufs["layers"]["ca_ln_w"][...] = 1.0
        return bufs

    _MAP = {
        "attention.attention.query.weight": ("wq", True),
        "attention.attention.query.bias": ("bq", False),
        "attention.attention.key.weight": ("wk", True),
        "attention.attention.key.bias": ("bk", False),
        "attention.attention.value.weight": ("wv", True),
        "attention.attention.value.bias": ("bv", False),
        "attention.output.dense.weight": ("wo", True),
        "attention.output.dense.bias": ("bo", False),
        "attention.output.LayerNorm.weight": ("sa_ln_w", False),
        "attention.output.LayerNorm.bias": ("sa_ln_b", False),
        "crossattention.attention.query.weight": ("cwq", True),
        "crossattention.attention.query.bias": ("cbq", False),
        "crossattention.attention.key.weight": ("cwk", True),
        "crossattention.attention.key.bias": ("cbk", False),
        "crossattention.attention.value.weight": ("cwv", True),
        "crossattention.attention.value.bias": ("cbv", False),
        "crossattention.output.dense.weight": ("cwo", True),
        "crossattention.output.dense.bias": ("cbo", False),
        "crossattention.output.LayerNorm.weight": ("ca_ln_w", False),
        "crossattention.output.LayerNorm.bias": ("ca_ln_b", False),
        "intermediate_query.dense.weight": ("fc1_w", True),
        "intermediate_query.dense.bias": ("fc1_b", False),
        "output_query.dense.weight": ("fc2_w", True),
        "output_query.dense.bias": ("fc2_b", False),
        "output_query.LayerNorm.weight": ("ff_ln_w", False),
        "output_query.LayerNorm.bias": ("ff_ln_b", False),
    }

    def load_hf(self, name: str, w: np.ndarray, bufs: dict, target) -> bool:
        """Route one ``qformer.``-relative tensor."""
        if name == "layernorm.weight":
            bufs["ln_w"][...] = w.astype(target)
        elif name == "layernorm.bias":
            bufs["ln_b"][...] = w.astype(target)
        elif name.startswith("encoder.layer."):
            rest = name[len("encoder.layer."):]
            idx_s, sub = rest.split(".", 1)
            m = self._MAP.get(sub)
            if m is None:
                return False
            key, tr = m
            bufs["layers"][key][int(idx_s)] = (w.T if tr else w
                                               ).astype(target)
        else:
            return False
        return True

    def run(self, qp: dict, queries: jax.Array, enc: jax.Array
            ) -> jax.Array:
        """queries [N, Q, D]; enc [N, Tv, Dv] -> [N, Q, D]."""
        N, Q, D = queries.shape
        nh, hd = self.heads, self.head_dim
        x = _ln(queries, qp["ln_w"], qp["ln_b"], self.eps)

        def attn(h, kv, wq, bq, wk, bk, wv, bv, wo, bo):
            Tk = kv.shape[1]
            q = (jnp.dot(h, wq) + bq).reshape(N, Q, nh, hd)
            k = (jnp.dot(kv, wk) + bk).reshape(N, Tk, nh, hd)
            v = (jnp.dot(kv, wv) + bv).reshape(N, Tk, nh, hd)
            logits = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                                preferred_element_type=jnp.float32)
            p = jax.nn.softmax(logits * (hd ** -0.5), -1).astype(h.dtype)
            o = jnp.einsum("nhqk,nkhd->nqhd", p, v).reshape(N, Q, D)
            return jnp.dot(o, wo) + bo

        def layer(x, lp):
            a = attn(x, x, lp["wq"], lp["bq"], lp["wk"], lp["bk"],
                     lp["wv"], lp["bv"], lp["wo"], lp["bo"])
            x = _ln(x + a, lp["sa_ln_w"], lp["sa_ln_b"], self.eps)

            def with_cross():
                c = attn(x, enc, lp["cwq"], lp["cbq"], lp["cwk"],
                         lp["cbk"], lp["cwv"], lp["cbv"], lp["cwo"],
                         lp["cbo"])
                return _ln(x + c, lp["ca_ln_w"], lp["ca_ln_b"], self.eps)

            x2 = jax.lax.cond(lp["has_cross"] > 0, with_cross, lambda: x)
            h = jax.nn.gelu(jnp.dot(x2, lp["fc1_w"]) + lp["fc1_b"],
                            approximate=False)
            h = jnp.dot(h, lp["fc2_w"]) + lp["fc2_b"]
            return _ln(x2 + h, lp["ff_ln_w"], lp["ff_ln_b"], self.eps), None

        x, _ = jax.lax.scan(layer, x, qp["layers"])
        return x


def Blip2ForConditionalGeneration(config):
    hf = config.hf_config
    lm_type = getattr(config.text_config, "model_type", "opt")
    if lm_type != "opt":
        raise NotImplementedError(
            f"BLIP-2 language model {lm_type!r}: OPT is supported; the "
            "Flan-T5 variant (encoder-decoder LM) is a follow-up")
    from aphrodite_tpu.models.gpt_family import OPTForCausalLM

    class _Blip2(OPTForCausalLM):
        is_multimodal = True

        def _mm_init(self, config):
            hf = config.hf_config
            self.vision = Blip2VisionTower(hf.vision_config, self.dtype)
            self.qformer = Blip2QFormer(hf.qformer_config,
                                        hf.vision_config.hidden_size,
                                        self.dtype)
            self.num_query_tokens = getattr(hf, "num_query_tokens", 32)
            self.image_token_id = getattr(hf, "image_token_index", None)

        def init_dummy_params(self, rng):
            params = super().init_dummy_params(rng)
            r1, r2, r3 = jax.random.split(jax.random.fold_in(rng, 5), 3)
            params["vision"] = self.vision.init_dummy(r1)
            qf = self.qformer.make_bufs(np.float32)
            params["qformer"] = jax.tree.map(
                lambda a: jnp.asarray(a, self.dtype), qf)
            Dq = self.qformer.hidden
            params["query_tokens"] = (0.02 * jax.random.normal(
                r2, (self.num_query_tokens, Dq), jnp.float32)
            ).astype(self.dtype)
            params["lang_proj_w"] = (0.02 * jax.random.normal(
                r3, (Dq, self.hidden_size), jnp.float32)
            ).astype(self.dtype)
            params["lang_proj_b"] = jnp.zeros((self.hidden_size,),
                                              self.dtype)
            return params

        def load_weights(self, weights):
            import ml_dtypes  # noqa: F401
            target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
                else np.dtype(jnp.dtype(self.dtype).name)
            vision_bufs = self.vision.make_bufs(target)
            qf_bufs = self.qformer.make_bufs(target)
            extra = {}

            def route(ws):
                for name, w in ws:
                    w = np.asarray(w)
                    if name.startswith("vision_model."):
                        self.vision.load_hf(name[len("vision_model."):], w,
                                            vision_bufs, target)
                    elif name.startswith("qformer."):
                        self.qformer.load_hf(name[len("qformer."):], w,
                                             qf_bufs, target)
                    elif name == "query_tokens":
                        extra["query_tokens"] = w.reshape(
                            self.num_query_tokens, -1).astype(target)
                    elif name == "language_projection.weight":
                        extra["lang_proj_w"] = w.T.astype(target)
                    elif name == "language_projection.bias":
                        extra["lang_proj_b"] = w.astype(target)
                    elif name.startswith("language_model."):
                        yield name[len("language_model."):], w
                    else:
                        yield name, w

            params = super().load_weights(route(weights))
            params["vision"] = vision_bufs
            params["qformer"] = qf_bufs
            params.update(extra)
            return params

        def param_specs(self):
            specs = super().param_specs()
            specs["vision"] = jax.tree.map(
                lambda _: P(), self.vision.shapes(),
                is_leaf=lambda x: isinstance(x, tuple))
            specs["qformer"] = jax.tree.map(
                lambda _: P(), self.qformer.shapes(),
                is_leaf=lambda x: isinstance(x, tuple))
            specs.update(query_tokens=P(), lang_proj_w=P(),
                         lang_proj_b=P())
            return specs

        def encode_images(self, params, pixel_values):
            enc = self.vision.encode(params["vision"], pixel_values)
            N = enc.shape[0]
            queries = jnp.broadcast_to(
                params["query_tokens"],
                (N,) + params["query_tokens"].shape)
            q = self.qformer.run(params["qformer"], queries, enc)
            out = jnp.dot(q, params["lang_proj_w"],
                          preferred_element_type=jnp.float32
                          ).astype(q.dtype) + params["lang_proj_b"]
            return out.reshape(-1, self.hidden_size)

    model = _Blip2(config)
    model._mm_init(config)
    return model
