"""ViT vision encoders (CLIP / SigLIP style) for multimodal models.

Parity: aphrodite/modeling/models/clip.py + siglip.py — re-expressed as a
pure-functional stacked-parameter transformer, same idiom as the text
models: one ``lax.scan`` over [Lv, ...] layer weights. Patchification is a
single big matmul (patches x flattened conv kernel) rather than a conv —
identical math, and an MXU-shaped [N*P, 3*ps^2] x [3*ps^2, D] contraction.
Bidirectional attention (no mask, no KV cache).
"""
from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np


def layer_norm(x: jax.Array, w: jax.Array, b: jax.Array,
               eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


_ACTS = {
    "quick_gelu": quick_gelu,
    "gelu": jax.nn.gelu,
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
}


class VisionTower:
    """CLIP-style ViT (class token + pre-LN) with knobs for SigLIP
    (``cls_token=False``, no pre-LN). Consumes/produces plain dicts so VLM
    wrappers can nest it under their param tree."""

    def __init__(self, vision_config, dtype, *, cls_token: bool = True,
                 feature_layer: int = -2, post_ln: bool = False) -> None:
        self.post_ln = post_ln
        vc = vision_config
        self.dtype = dtype
        self.hidden = vc.hidden_size
        self.layers = vc.num_hidden_layers
        self.heads = vc.num_attention_heads
        self.head_dim = self.hidden // self.heads
        self.intermediate = vc.intermediate_size
        self.patch = vc.patch_size
        self.image_size = vc.image_size
        self.grid = vc.image_size // vc.patch_size
        self.eps = getattr(vc, "layer_norm_eps", 1e-5)
        self.act = _ACTS[getattr(vc, "hidden_act", "quick_gelu")]
        self.cls_token = cls_token
        # hidden_states[feature_layer] in HF terms: -1 = all layers,
        # -2 = stop one short (LLaVA default), etc.
        self.use_layers = self.layers + 1 + feature_layer

    # ------------------------------------------------------------------ params
    def shapes(self) -> dict:
        D, I, Lv = self.hidden, self.intermediate, self.layers
        num_pos = self.grid * self.grid + (1 if self.cls_token else 0)
        shapes = {
            "patch_w": (3 * self.patch * self.patch, D),
            "pos": (num_pos, D),
            "layers": {
                "ln1_w": (Lv, D), "ln1_b": (Lv, D),
                "wq": (Lv, D, D), "bq": (Lv, D),
                "wk": (Lv, D, D), "bk": (Lv, D),
                "wv": (Lv, D, D), "bv": (Lv, D),
                "wo": (Lv, D, D), "bo": (Lv, D),
                "ln2_w": (Lv, D), "ln2_b": (Lv, D),
                "fc1_w": (Lv, D, I), "fc1_b": (Lv, I),
                "fc2_w": (Lv, I, D), "fc2_b": (Lv, D),
            },
        }
        if self.cls_token:
            shapes["cls"] = (D,)
            shapes["pre_ln_w"] = (D,)
            shapes["pre_ln_b"] = (D,)
        else:
            shapes["patch_b"] = (D,)
        if self.post_ln:
            shapes["post_ln_w"] = (D,)
            shapes["post_ln_b"] = (D,)
        return shapes

    def init_dummy(self, rng: jax.Array) -> dict:
        def fill(shapes, keys):
            out = {}
            for name, shape in shapes.items():
                if isinstance(shape, dict):
                    out[name] = fill(shape, keys)
                elif name.endswith("_b") or name.startswith("b") \
                        or "ln" in name:
                    init = jnp.ones if name.endswith("w") else jnp.zeros
                    out[name] = init(shape, self.dtype)
                else:
                    out[name] = (0.02 * jax.random.normal(
                        next(keys), shape, jnp.float32)).astype(self.dtype)
            return out
        keys = iter(jax.random.split(rng, 64))
        return fill(self.shapes(), keys)

    def load_hf(self, name: str, w: np.ndarray, bufs: dict,
                target) -> bool:
        """Route one ``vision_model.``-relative HF tensor into bufs
        (layout from shapes()). Returns True if consumed."""
        if name == "embeddings.class_embedding":
            bufs["cls"][...] = w.reshape(-1).astype(target)
        elif name == "embeddings.patch_embedding.weight":
            # [D, 3, ps, ps] -> [3*ps*ps, D] matmul layout
            bufs["patch_w"][...] = w.reshape(w.shape[0], -1).T.astype(target)
        elif name == "embeddings.patch_embedding.bias":
            bufs["patch_b"][...] = w.astype(target)
        elif name == "embeddings.position_embedding.weight":
            bufs["pos"][...] = w.astype(target)
        elif name in ("pre_layrnorm.weight", "pre_layernorm.weight"):
            bufs["pre_ln_w"][...] = w.astype(target)
        elif name in ("pre_layrnorm.bias", "pre_layernorm.bias"):
            bufs["pre_ln_b"][...] = w.astype(target)
        elif name == "post_layernorm.weight" and "post_ln_w" in bufs:
            bufs["post_ln_w"][...] = w.astype(target)
        elif name == "post_layernorm.bias" and "post_ln_b" in bufs:
            bufs["post_ln_b"][...] = w.astype(target)
        elif name.startswith("encoder.layers."):
            rest = name[len("encoder.layers."):]
            idx_s, sub = rest.split(".", 1)
            li = int(idx_s)
            m = {
                "layer_norm1.weight": ("ln1_w", False),
                "layer_norm1.bias": ("ln1_b", False),
                "self_attn.q_proj.weight": ("wq", True),
                "self_attn.q_proj.bias": ("bq", False),
                "self_attn.k_proj.weight": ("wk", True),
                "self_attn.k_proj.bias": ("bk", False),
                "self_attn.v_proj.weight": ("wv", True),
                "self_attn.v_proj.bias": ("bv", False),
                "self_attn.out_proj.weight": ("wo", True),
                "self_attn.out_proj.bias": ("bo", False),
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

    def make_bufs(self, target) -> dict:
        def mk(shapes):
            return {k: mk(v) if isinstance(v, dict) else np.zeros(v, target)
                    for k, v in shapes.items()}
        return mk(self.shapes())

    # ----------------------------------------------------------------- forward
    def encode(self, vp: dict, pixel_values: jax.Array,
               grid_hw: tuple[int, int] | None = None,
               pos_ids=None) -> jax.Array:
        """pixel_values [N, 3, S, S] -> features [N, P(+cls), D] at the
        configured feature layer (pre-final-LN hidden state, HF
        hidden_states[k] semantics). ``grid_hw`` overrides the square
        default for variable-resolution towers (MiniCPM-V navit slices);
        ``pos_ids`` selects bucketized position rows."""
        N = pixel_values.shape[0]
        ps = self.patch
        gh, gw = grid_hw if grid_hw is not None else (self.grid, self.grid)
        x = pixel_values.astype(self.dtype)
        # [N,3,gh,ps,gw,ps] -> [N, gh*gw, 3*ps*ps]: patchify, one matmul.
        x = x.reshape(N, 3, gh, ps, gw, ps).transpose(0, 2, 4, 1, 3, 5)
        x = x.reshape(N, gh * gw, 3 * ps * ps)
        x = jnp.einsum("npc,cd->npd", x, vp["patch_w"],
                       preferred_element_type=jnp.float32).astype(self.dtype)
        if self.cls_token:
            cls = jnp.broadcast_to(vp["cls"], (N, 1, self.hidden)
                                   ).astype(x.dtype)
            x = jnp.concatenate([cls, x], axis=1)
        else:
            x = x + vp["patch_b"]
        pos = vp["pos"]
        use_ids = pos_ids if pos_ids is not None \
            else getattr(self, "pos_ids", None)
        if use_ids is not None:
            # Idefics3/navit-style bucketized position selection. A 2D id
            # array selects per-image rows (Phi-4-MM crops share one call
            # but carry different masks).
            ids = jnp.asarray(use_ids)
            pos = pos[ids]
            x = x + (pos if ids.ndim == 2 else pos[None]).astype(x.dtype)
        else:
            x = x + pos[None].astype(x.dtype)
        if self.cls_token:
            x = layer_norm(x, vp["pre_ln_w"], vp["pre_ln_b"], self.eps)

        nh, hd = self.heads, self.head_dim
        P = x.shape[1]

        def layer(x, lp):
            h = layer_norm(x, lp["ln1_w"], lp["ln1_b"], self.eps)
            q = (jnp.dot(h, lp["wq"]) + lp["bq"]).reshape(N, P, nh, hd)
            k = (jnp.dot(h, lp["wk"]) + lp["bk"]).reshape(N, P, nh, hd)
            v = (jnp.dot(h, lp["wv"]) + lp["bv"]).reshape(N, P, nh, hd)
            logits = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                                preferred_element_type=jnp.float32)
            probs = jax.nn.softmax(logits * (hd ** -0.5), axis=-1
                                   ).astype(x.dtype)
            o = jnp.einsum("nhqk,nkhd->nqhd", probs, v)
            o = jnp.dot(o.reshape(N, P, nh * hd), lp["wo"]) + lp["bo"]
            x = x + o
            h = layer_norm(x, lp["ln2_w"], lp["ln2_b"], self.eps)
            h = self.act(jnp.dot(h, lp["fc1_w"]) + lp["fc1_b"])
            x = x + jnp.dot(h, lp["fc2_w"]) + lp["fc2_b"]
            return x, None

        used = jax.tree.map(lambda a: a[:self.use_layers], vp["layers"])
        x, _ = jax.lax.scan(layer, x, used)
        if self.post_ln:  # SigLIP last_hidden_state semantics
            x = layer_norm(x, vp["post_ln_w"], vp["post_ln_b"], self.eps)
        return x
