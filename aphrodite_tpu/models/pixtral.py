"""Pixtral vision tower + Llava-Pixtral / Mistral-3 VLMs.

Parity: aphrodite/modeling/models/pixtral.py (PixtralHFVisionModel) and
mistral3.py — re-expressed functionally. The tower is a RMSNorm/SiLU ViT
over variable-resolution images with 2-D rotary positions (row frequencies
on even dims, column frequencies on odd dims, HF PixtralRotaryEmbedding
layout). Each image is encoded separately (jit per patch-grid signature)
instead of HF's packed-sequence + block-diagonal mask — identical math
without the mask materialization.

Prompt structure: rows of image tokens separated by [IMG_BREAK] with a
trailing [IMG_END] (tokens stay in the prompt; only image-token positions
receive feature rows), so the scatter spans are per-row — the same shape
Fuyu uses.

Mistral-3 projector: RMSNorm over vision width -> spatial_merge_size^2
patch merging (unfold + linear) -> 2-layer MLP into the text width.
"""
from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.llama import (LlamaForCausalLM,
                                        MistralForCausalLM,
                                        Qwen2ForCausalLM)


def _rms(x, w, eps=1e-5):
    xf = x.astype(jnp.float32)
    return (xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
            * w).astype(x.dtype)


class PixtralVisionTower:
    """Functional pixtral ViT; params are plain dicts with [L, ...] stacks."""

    def __init__(self, vision_config, dtype) -> None:
        vc = vision_config
        self.dtype = dtype
        self.hidden = vc.hidden_size
        self.layers = vc.num_hidden_layers
        self.heads = vc.num_attention_heads
        self.head_dim = getattr(vc, "head_dim",
                                self.hidden // self.heads)
        self.intermediate = vc.intermediate_size
        self.patch = vc.patch_size
        self.image_size = vc.image_size
        self.max_side = vc.image_size // vc.patch_size
        self.base = getattr(vc, "rope_theta", 10000.0)
        # 2-D rope table [side^2, head_dim] (HF PixtralRotaryEmbedding).
        d = self.head_dim
        freqs = self.base ** -(np.arange(0, d, 2, dtype=np.float64) / d)
        h = np.arange(self.max_side)
        fh = np.outer(h, freqs[0::2])  # [side, d/4]
        fw = np.outer(h, freqs[1::2])
        inv = np.concatenate(
            [np.repeat(fh[:, None, :], self.max_side, axis=1),
             np.repeat(fw[None, :, :], self.max_side, axis=0)], axis=-1
        ).reshape(-1, d // 2)
        self._freq_table = np.concatenate([inv, inv], axis=-1)  # [S^2, d]

    def shapes(self) -> dict:
        D, I, L, ps = self.hidden, self.intermediate, self.layers, self.patch
        return {
            "patch_w": (3 * ps * ps, D),
            "ln_pre": (D,),
            "layers": {
                "attn_norm": (L, D), "ffn_norm": (L, D),
                "wq": (L, D, self.heads * self.head_dim),
                "wk": (L, D, self.heads * self.head_dim),
                "wv": (L, D, self.heads * self.head_dim),
                "wo": (L, self.heads * self.head_dim, D),
                "w_gate": (L, D, I), "w_up": (L, D, I), "w_down": (L, I, D),
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
                elif "norm" in k or k == "ln_pre":
                    out[k] = jnp.ones(s, self.dtype)
                else:
                    out[k] = (0.02 * jax.random.normal(
                        next(keys), s, jnp.float32)).astype(self.dtype)
            return out
        return fill(self.shapes())

    def load_hf(self, name: str, w: np.ndarray, bufs: dict, target) -> bool:
        """Route one ``vision_tower.``-relative HF tensor."""
        if name == "patch_conv.weight":
            bufs["patch_w"][...] = w.reshape(w.shape[0], -1).T.astype(target)
        elif name == "ln_pre.weight":
            bufs["ln_pre"][...] = w.astype(target)
        elif name.startswith("transformer.layers."):
            rest = name[len("transformer.layers."):]
            idx_s, sub = rest.split(".", 1)
            li = int(idx_s)
            m = {
                "attention_norm.weight": ("attn_norm", False),
                "ffn_norm.weight": ("ffn_norm", False),
                "attention.q_proj.weight": ("wq", True),
                "attention.k_proj.weight": ("wk", True),
                "attention.v_proj.weight": ("wv", True),
                "attention.o_proj.weight": ("wo", True),
                "feed_forward.gate_proj.weight": ("w_gate", True),
                "feed_forward.up_proj.weight": ("w_up", True),
                "feed_forward.down_proj.weight": ("w_down", True),
            }.get(sub)
            if m is None:
                return False
            key, tr = m
            bufs["layers"][key][li] = (w.T if tr else w).astype(target)
        else:
            return False
        return True

    def encode_one(self, vp: dict, pixels: jax.Array, hp: int, wp: int
                   ) -> jax.Array:
        """One image [3, hp*ps, wp*ps] -> [hp*wp, D] (static grid)."""
        ps, D = self.patch, self.hidden
        x = pixels.astype(self.dtype)
        x = x.reshape(3, hp, ps, wp, ps).transpose(1, 3, 0, 2, 4)
        x = x.reshape(hp * wp, 3 * ps * ps)
        x = jnp.dot(x, vp["patch_w"],
                    preferred_element_type=jnp.float32).astype(self.dtype)
        x = _rms(x, vp["ln_pre"])
        # 2-D rope angles for this grid.
        pos = (np.arange(hp)[:, None] * self.max_side
               + np.arange(wp)[None, :]).reshape(-1)
        ang = jnp.asarray(self._freq_table[pos], jnp.float32)
        cos, sin = jnp.cos(ang), jnp.sin(ang)
        nh, hd = self.heads, self.head_dim
        T = hp * wp

        def rot(v):
            v1, v2 = v[..., :hd // 2], v[..., hd // 2:]
            rh = jnp.concatenate([-v2, v1], axis=-1)
            return (v.astype(jnp.float32) * cos[:, None]
                    + rh.astype(jnp.float32) * sin[:, None]
                    ).astype(self.dtype)

        def layer(x, lp):
            h = _rms(x, lp["attn_norm"])
            q = jnp.dot(h, lp["wq"]).reshape(T, nh, hd)
            k = jnp.dot(h, lp["wk"]).reshape(T, nh, hd)
            v = jnp.dot(h, lp["wv"]).reshape(T, nh, hd)
            q, k = rot(q), rot(k)
            logits = jnp.einsum("qhd,khd->hqk", q, k,
                                preferred_element_type=jnp.float32)
            probs = jax.nn.softmax(logits * (hd ** -0.5), -1
                                   ).astype(x.dtype)
            o = jnp.einsum("hqk,khd->qhd", probs, v).reshape(T, nh * hd)
            x = x + jnp.dot(o, lp["wo"])
            h = _rms(x, lp["ffn_norm"])
            g = jnp.dot(h, lp["w_gate"])
            u = jnp.dot(h, lp["w_up"])
            x = x + jnp.dot(jax.nn.silu(g) * u, lp["w_down"])
            return x, None

        x, _ = jax.lax.scan(layer, x, vp["layers"])
        return x


class _PixtralMixin:
    """Llava-with-pixtral-tower (pixtral-hf checkpoints)."""

    is_multimodal = True
    mm_needs_extra = True

    def _mm_init(self, config) -> None:
        hf = config.hf_config
        self.vision = PixtralVisionTower(hf.vision_config, self.dtype)
        self.image_token_id = hf.image_token_index
        from aphrodite_tpu.models.llava import _ACTS
        self.proj_act = _ACTS[getattr(hf, "projector_hidden_act", "gelu")]
        self.proj_bias = getattr(hf, "multimodal_projector_bias", True)
        self._encode_cache: dict = {}

    # ------------------------------------------------------------------ params
    def _projector_shapes(self) -> dict:
        D, H = self.vision.hidden, self.hidden_size
        shapes = {"w1": (D, H), "w2": (H, H)}
        if self.proj_bias:
            shapes.update({"b1": (H,), "b2": (H,)})
        return shapes

    def init_dummy_params(self, rng: jax.Array) -> dict:
        r1, r2, r3 = jax.random.split(rng, 3)
        params = super().init_dummy_params(r1)
        params["vision"] = self.vision.init_dummy(r2)
        keys = iter(jax.random.split(r3, 8))
        proj = {}
        for k, s in self._projector_shapes().items():
            proj[k] = jnp.zeros(s, self.dtype) if k.startswith("b") else \
                (0.02 * jax.random.normal(next(keys), s, jnp.float32)
                 ).astype(self.dtype)
        params["projector"] = proj
        return params

    _PROJ_MAP = {"linear_1.weight": ("w1", True), "linear_1.bias":
                 ("b1", False), "linear_2.weight": ("w2", True),
                 "linear_2.bias": ("b2", False)}

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        vision_bufs = self.vision.make_bufs(target)
        proj_bufs = {k: np.zeros(s, target)
                     for k, s in self._projector_shapes().items()}

        def route(ws):
            for name, w in ws:
                if name.startswith("model.language_model."):
                    name = "model." + name[len("model.language_model."):]
                elif name.startswith("language_model."):
                    name = name[len("language_model."):]
                elif name.startswith(("model.vision_tower.",
                                      "model.multi_modal_projector.")):
                    name = name[len("model."):]
                if name.startswith("vision_tower."):
                    self.vision.load_hf(name[len("vision_tower."):],
                                        np.asarray(w), vision_bufs, target)
                    continue
                if name.startswith("multi_modal_projector."):
                    self._load_proj(name[len("multi_modal_projector."):],
                                    np.asarray(w), proj_bufs, target)
                    continue
                yield name, w

        params = super().load_weights(route(weights))
        params["vision"] = vision_bufs
        params["projector"] = proj_bufs
        return params

    def _load_proj(self, sub: str, w: np.ndarray, bufs: dict,
                   target) -> None:
        m = self._PROJ_MAP.get(sub)
        if m is not None and m[0] in bufs:
            key, tr = m
            bufs[key][...] = (w.T if tr else w).astype(target)

    def param_specs(self) -> dict:
        specs = super().param_specs()
        specs["vision"] = jax.tree.map(lambda _: P(), self.vision.shapes(),
                                       is_leaf=lambda x: isinstance(x, tuple))
        specs["projector"] = {k: P() for k in self._projector_shapes()}
        return specs

    # ----------------------------------------------------------------- encode
    def _project(self, params, feats: jax.Array, hp: int, wp: int
                 ) -> jax.Array:
        pp = params["projector"]
        h = jnp.dot(feats, pp["w1"],
                    preferred_element_type=jnp.float32).astype(feats.dtype)
        if "b1" in pp:
            h = h + pp["b1"]
        h = self.proj_act(h)
        h = jnp.dot(h, pp["w2"],
                    preferred_element_type=jnp.float32).astype(feats.dtype)
        if "b2" in pp:
            h = h + pp["b2"]
        return h

    def encode_images(self, params, pixel_values, sizes=None, **_):
        """pixel_values: [N, 3, Hmax, Wmax] (images zero-padded to the
        request max); sizes: per-image (patch_rows, patch_cols). Each image
        is cropped back out and encoded under a per-grid-signature jit;
        returns the flat [tokens, D] feature rows in prompt order."""
        pieces = []
        pv = pixel_values
        for i, (hp, wp) in enumerate(sizes):
            hp, wp = int(hp), int(wp)
            ps = self.vision.patch
            img = pv[i][:, :hp * ps, :wp * ps]
            key = (hp, wp)
            fn = self._encode_cache.get(key)
            if fn is None:
                def enc(params, img, hp=hp, wp=wp):
                    feats = self.vision.encode_one(params["vision"], img,
                                                   hp, wp)
                    return self._project(params, feats, hp, wp)
                fn = jax.jit(enc)
                self._encode_cache[key] = fn
            pieces.append(fn(params, img))
        out = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces)
        return out.reshape(-1, self.hidden_size)


class _Mistral3Mixin(_PixtralMixin):
    """Mistral-3: pixtral tower + RMSNorm/patch-merger projector."""

    def _mm_init(self, config) -> None:
        super()._mm_init(config)
        hf = config.hf_config
        self.spatial_merge = getattr(hf, "spatial_merge_size", 2)
        self.proj_bias = getattr(hf, "multimodal_projector_bias", False)

    def _projector_shapes(self) -> dict:
        D, H, s = self.vision.hidden, self.hidden_size, self.spatial_merge
        shapes = {"norm": (D,), "merge_w": (D * s * s, D),
                  "w1": (D, H), "w2": (H, H)}
        if self.proj_bias:
            shapes.update({"b1": (H,), "b2": (H,)})
        return shapes

    _PROJ_MAP = dict(_PixtralMixin._PROJ_MAP)
    _PROJ_MAP.update({
        "norm.weight": ("norm", False),
        "patch_merger.merging_layer.weight": ("merge_w", True),
    })

    def _project(self, params, feats: jax.Array, hp: int, wp: int
                 ) -> jax.Array:
        pp = params["projector"]
        s = self.spatial_merge
        x = _rms(feats, pp["norm"], getattr(self, "rms_eps", 1e-5))
        D = x.shape[-1]
        # unfold(kernel=stride=s): blocks ordered (channel, kh, kw).
        x = x.reshape(hp // s, s, wp // s, s, D)
        x = jnp.transpose(x, (0, 2, 4, 1, 3)).reshape(-1, D * s * s)
        x = jnp.dot(x, pp["merge_w"],
                    preferred_element_type=jnp.float32).astype(feats.dtype)
        return super()._project(params, x, hp, wp)


_TEXT_BACKBONES = {
    "llama": LlamaForCausalLM,
    "mistral": MistralForCausalLM,
    "qwen2": Qwen2ForCausalLM,
}
_CLS_CACHE: dict[tuple, type] = {}


def _factory(mixin, name, config):
    base = _TEXT_BACKBONES.get(
        getattr(config.text_config, "model_type", "mistral"),
        MistralForCausalLM)
    key = (name, base)
    cls = _CLS_CACHE.get(key)
    if cls is None:
        cls = type(name + base.__name__, (mixin, base), {})
        _CLS_CACHE[key] = cls
    model = cls(config)
    model._mm_init(config)
    return model


def PixtralLlavaForConditionalGeneration(config):
    return _factory(_PixtralMixin, "PixtralLlava", config)


def Mistral3ForConditionalGeneration(config):
    return _factory(_Mistral3Mixin, "Mistral3", config)
