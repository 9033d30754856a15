"""LLaVA-Next / LLaVA-Next-Video / LLaVA-OneVision: anyres tiled vision.

Parity: aphrodite/modeling/models/llava_next.py, llava_next_video.py,
llava_onevision.py (+ HF pack_image_features semantics). An image is encoded
as a base tile plus an anyres grid of high-res tiles selected from
``image_grid_pinpoints``; tile features are re-assembled spatially, unpadded
back to the original aspect ratio, and an ``image_newline`` embedding is
appended to each feature row (OneVision additionally bilinear-downscales
grids past ``anyres_max_N``). Videos: per-frame features are 2x2-pooled
(Next-Video: avg-pool in vision width before the projector; OneVision:
bilinear after the projector, plus one trailing newline per video).

TPU mapping: all tiles/frames of a request run through the ViT in one
padded-batch jitted pass (encoder cache, once per request); the packing
(reshape/unpad/newline) is eager jnp on the tiny [tokens, D] features, so
dynamic per-image geometry never enters the serving jit.
"""
from __future__ import annotations

import math
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.llama import (LlamaForCausalLM,
                                        MistralForCausalLM,
                                        Qwen2ForCausalLM)
from aphrodite_tpu.models.llava import _LlavaMixin


def select_best_resolution(original_size, possible_resolutions):
    """HF select_best_resolution: max effective resolution, then min waste.
    Sizes are (height, width)."""
    oh, ow = original_size
    best, best_eff, best_waste = None, 0, float("inf")
    for h, w in possible_resolutions:
        scale = min(w / ow, h / oh)
        dw, dh = int(ow * scale), int(oh * scale)
        eff = min(dw * dh, ow * oh)
        waste = w * h - eff
        if eff > best_eff or (eff == best_eff and waste < best_waste):
            best_eff, best_waste, best = eff, waste, (h, w)
    return best


def unpad_dims(ch: int, cw: int, oh: int, ow: int) -> tuple[int, int, int,
                                                            int]:
    """HF unpad_image index math on a [.., ch, cw] feature grid for an
    original (oh, ow) image -> (row_start, row_end, col_start, col_end)."""
    if ow / oh > cw / ch:
        new_h = int(round(oh * (cw / ow), 7))
        pad = (ch - new_h) // 2
        return pad, ch - pad, 0, cw
    new_w = int(round(ow * (ch / oh), 7))
    pad = (cw - new_w) // 2
    return 0, ch, pad, cw - pad


def _bilinear(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """torch F.interpolate(mode='bilinear', align_corners=False) equivalent
    on [D, H, W]."""
    return jax.image.resize(x, (x.shape[0],) + tuple(out_hw),
                            method="linear")


class _AnyresMixin(_LlavaMixin):
    mm_needs_extra = True
    has_video = False

    def _mm_init(self, config) -> None:
        hf = config.hf_config
        from aphrodite_tpu.models.llava import _ACTS
        from aphrodite_tpu.models.vision import VisionTower
        vt = getattr(hf.vision_config, "model_type", "clip_vision_model")
        siglip = "siglip" in vt
        self.vision = VisionTower(
            hf.vision_config, self.dtype, cls_token=not siglip,
            feature_layer=getattr(hf, "vision_feature_layer", -2))
        self.select_strategy = getattr(hf, "vision_feature_select_strategy",
                                       "default")
        self.image_token_id = hf.image_token_index
        self.proj_act = _ACTS[getattr(hf, "projector_hidden_act", "gelu")]
        self.grid_pinpoints = [tuple(p) for p in hf.image_grid_pinpoints]
        self.vision_aspect_ratio = getattr(hf, "vision_aspect_ratio", None)
        self.video_token_id = getattr(hf, "video_token_index", None)
        self.spatial_pool_mode = getattr(hf, "spatial_pool_mode", None)
        self.spatial_pool_stride = getattr(hf, "spatial_pool_stride", 2)
        self._tile_cache: dict = {}
        self._video_cache: dict = {}

    # ------------------------------------------------------------------ params
    def init_dummy_params(self, rng: jax.Array) -> dict:
        params = super().init_dummy_params(rng)
        params["image_newline"] = (0.02 * jax.random.normal(
            jax.random.fold_in(rng, 11), (self.hidden_size,), jnp.float32)
        ).astype(self.dtype)
        return params

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        newline = {}

        def route(ws):
            for name, w in ws:
                if name in ("image_newline", "model.image_newline"):
                    newline["v"] = np.asarray(w)
                    continue
                if "vision_resampler" in name:
                    # average/max pooling resampler has no weights; conv
                    # mode is unsupported (raise below at use).
                    continue
                yield name, w

        params = super().load_weights(route(weights))
        target = params["embed"].dtype
        params["image_newline"] = newline.get(
            "v", np.zeros((self.hidden_size,))).astype(target)
        return params

    def param_specs(self) -> dict:
        specs = super().param_specs()
        specs["image_newline"] = P()
        return specs

    # ----------------------------------------------------------------- encode
    def _tile_fn(self, n_pad: int):
        fn = self._tile_cache.get(n_pad)
        if fn is None:
            def encode(params, pv):
                feats = self.vision.encode(params["vision"], pv)
                if self.select_strategy == "default":
                    feats = feats[:, 1:]
                pp = params["projector"]
                h = jnp.dot(feats, pp["w1"],
                            preferred_element_type=jnp.float32
                            ).astype(feats.dtype) + pp["b1"]
                h = self.proj_act(h)
                return jnp.dot(h, pp["w2"],
                               preferred_element_type=jnp.float32
                               ).astype(feats.dtype) + pp["b2"]
            fn = jax.jit(encode)
            self._tile_cache[n_pad] = fn
        return fn

    def _encode_all(self, params, pixel_values: jax.Array) -> jax.Array:
        """[N,3,S,S] -> projected per-tile features [N, P, D] (padded-batch
        jit, one compile per pow2 tile count)."""
        N = int(pixel_values.shape[0])
        n_pad = max(1, 1 << (N - 1).bit_length())
        if n_pad != N:
            pixel_values = jnp.concatenate(
                [pixel_values,
                 jnp.zeros((n_pad - N,) + pixel_values.shape[1:],
                           pixel_values.dtype)])
        return self._tile_fn(n_pad)(params, pixel_values)[:N]

    def _pack_image(self, params, feats: jax.Array, orig_hw) -> jax.Array:
        """Anyres packing of one image's [tiles, P, D] projected features
        (HF pack_image_features semantics)."""
        newline = params["image_newline"].astype(feats.dtype)
        g, D = self.vision.grid, feats.shape[-1]
        if feats.shape[0] == 1:
            return jnp.concatenate([feats[0], newline[None]], axis=0)
        base, tiles = feats[0], feats[1:]
        bh, bw = select_best_resolution(orig_hw, self.grid_pinpoints)
        nph, npw = bh // self.vision.image_size, bw // self.vision.image_size
        x = tiles.reshape(nph, npw, g, g, D)
        x = jnp.transpose(x, (4, 0, 2, 1, 3)).reshape(D, nph * g, npw * g)
        r0, r1, c0, c1 = unpad_dims(nph * g, npw * g, *orig_hw)
        x = x[:, r0:r1, c0:c1]
        if self.vision_aspect_ratio:  # OneVision anyres_max_N downscale
            max_p = int(self.vision_aspect_ratio.removeprefix("anyres_max_"))
            ch, cw = x.shape[1], x.shape[2]
            ratio = math.sqrt(ch * cw / (max_p * g * g))
            if ratio > 1.1:
                x = _bilinear(x, (int(ch // ratio), int(cw // ratio)))
        col = jnp.broadcast_to(newline[:, None, None],
                               (D, x.shape[1], 1))
        x = jnp.concatenate([x, col], axis=2)
        x = x.reshape(D, -1).T
        return jnp.concatenate([base, x], axis=0)

    def _video_fn(self, n_pad: int):
        """Cached jit: [n_pad,3,S,S] frames -> pooled rows [n_pad, Pp, D]."""
        fn = self._video_cache.get(n_pad)
        if fn is not None:
            return fn
        g = self.vision.grid

        def encode(params, frames):
            if self.spatial_pool_mode is not None:
                # LLaVA-Next-Video: pool in vision width BEFORE projecting.
                if self.spatial_pool_mode not in ("average", "max"):
                    raise NotImplementedError(
                        f"spatial_pool_mode={self.spatial_pool_mode}")
                feats = self.vision.encode(params["vision"], frames)
                if self.select_strategy == "default":
                    feats = feats[:, 1:]
                F_, Dv = feats.shape[0], feats.shape[-1]
                s = self.spatial_pool_stride
                go = g // s
                x = feats.reshape(F_, g, g, Dv)
                x = x[:, :go * s, :go * s].reshape(F_, go, s, go, s, Dv)
                x = (jnp.max(x, axis=(2, 4))
                     if self.spatial_pool_mode == "max"
                     else jnp.mean(x, axis=(2, 4)))
                x = x.reshape(F_, go * go, Dv)
                pp = params["projector"]
                h = jnp.dot(x, pp["w1"], preferred_element_type=jnp.float32
                            ).astype(x.dtype) + pp["b1"]
                h = self.proj_act(h)
                return jnp.dot(h, pp["w2"],
                               preferred_element_type=jnp.float32
                               ).astype(x.dtype) + pp["b2"]
            # OneVision: project, then bilinear-pool to ceil(g/2).
            feats = self._tile_fn(frames.shape[0])(params, frames)
            F_, _, D = feats.shape
            go = math.ceil(g / 2)
            x = jnp.transpose(feats.reshape(F_, g, g, D), (0, 3, 1, 2))
            x = jax.vmap(lambda a: _bilinear(a, (go, go)))(x)
            return jnp.transpose(x, (0, 2, 3, 1)).reshape(F_, go * go, D)

        fn = jax.jit(encode)
        self._video_cache[n_pad] = fn
        return fn

    def _video_feats(self, params, frames: jax.Array) -> jax.Array:
        """[F,3,S,S] -> pooled per-video feature rows [F*pooled(+1), D]."""
        F_ = int(frames.shape[0])
        n_pad = max(1, 1 << (F_ - 1).bit_length())
        if n_pad != F_:
            frames = jnp.concatenate(
                [frames, jnp.zeros((n_pad - F_,) + frames.shape[1:],
                                   frames.dtype)])
        x = self._video_fn(n_pad)(params, frames)[:F_]
        x = x.reshape(-1, self.hidden_size)
        if self.spatial_pool_mode is not None:
            return x
        # OneVision: one trailing newline per video.
        newline = params["image_newline"].astype(x.dtype)
        return jnp.concatenate([x, newline[None]], axis=0)

    def encode_images(self, params, pixel_values, items=None,
                      **_) -> jax.Array:
        """pixel_values: flat [total_tiles+frames, 3, S, S] in prompt order;
        items: tuple of ("img", n_tiles, (H, W)) / ("vid", n_frames) per
        media item in prompt order. Returns flat [tokens, D]."""
        pieces, off = [], 0
        for it in items:
            if it[0] == "img":
                n, hw = int(it[1]), it[2]
                feats = self._encode_all(params, pixel_values[off:off + n])
                pieces.append(self._pack_image(params, feats, hw))
            else:
                n = int(it[1])
                pieces.append(self._video_feats(
                    params, pixel_values[off:off + n]))
            off += n
        out = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces)
        return out.reshape(-1, self.hidden_size)


_TEXT_BACKBONES = {
    "llama": LlamaForCausalLM,
    "mistral": MistralForCausalLM,
    "qwen2": Qwen2ForCausalLM,
}
_CLS_CACHE: dict[tuple, type] = {}


def _factory(name: str, config):
    base = _TEXT_BACKBONES.get(
        getattr(config.text_config, "model_type", "llama"), LlamaForCausalLM)
    key = (name, base)
    cls = _CLS_CACHE.get(key)
    if cls is None:
        cls = type(name + base.__name__, (_AnyresMixin, base), {})
        _CLS_CACHE[key] = cls
    model = cls(config)
    model._mm_init(config)
    return model


def LlavaNextForConditionalGeneration(config):
    return _factory("LlavaNext", config)


def LlavaNextVideoForConditionalGeneration(config):
    return _factory("LlavaNextVideo", config)


def LlavaOnevisionForConditionalGeneration(config):
    return _factory("LlavaOnevision", config)
