"""Phi-3-Vision / Phi-3.5-Vision: CLIP tower + HD transform.

Parity: aphrodite/modeling/models/phi3v.py — a CLIP ViT-L/14-336 tower
(penultimate layer, CLS dropped) whose 24x24 patch grids are 2x2-merged to
12x12x4C, arranged into the image's h_crop x w_crop tile grid, given a
``sub_GN`` newline embedding per row, and emitted as
``[sub tiles, glb_GN, global tile]`` ('sub_glb' order) before a 2-layer MLP
projector (``img_projection``). Placeholder id 32044 (negative ids in raw
prompts are mapped to it by the adapter).

The ViT geometry is the hardcoded CLIP-L/14-336 of the reference
(phi3v.py:58) unless the checkpoint's ``img_processor`` dict carries a
``vit_config`` override (used by tiny tests).
"""
from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.phi3_qwen3 import Phi3ForCausalLM
from aphrodite_tpu.models.vision import VisionTower

_CLIP_L_336 = dict(hidden_size=1024, num_hidden_layers=24,
                   num_attention_heads=16, intermediate_size=4096,
                   image_size=336, patch_size=14, hidden_act="quick_gelu")

_IMAGE_TOKEN_ID = 32044  # reference phi3v.py:56


class _DictCfg:
    def __init__(self, d):
        self.__dict__.update(d)


class Phi3VForCausalLM(Phi3ForCausalLM):

    is_multimodal = True
    mm_needs_extra = True

    def __init__(self, config):
        super().__init__(config)
        hf = config.hf_config
        imgp = getattr(hf, "img_processor", None) or {}
        vit_cfg = dict(_CLIP_L_336)
        vit_cfg.update(imgp.get("vit_config") or {})
        layer_idx = imgp.get("layer_idx", -2)
        self.vision = VisionTower(_DictCfg(vit_cfg), self.dtype,
                                  cls_token=True, feature_layer=layer_idx)
        self.image_token_id = getattr(hf, "image_token_id",
                                      _IMAGE_TOKEN_ID)
        self._tile_cache: dict = {}

    # ------------------------------------------------------------------ params
    def _projector_shapes(self) -> dict:
        D4, H = self.vision.hidden * 4, self.hidden_size
        return {"glb_GN": (D4,), "sub_GN": (D4,),
                "w1": (D4, H), "b1": (H,), "w2": (H, H), "b2": (H,)}

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

    _PROJ_MAP = {"img_projection.0.weight": ("w1", True),
                 "img_projection.0.bias": ("b1", False),
                 "img_projection.2.weight": ("w2", True),
                 "img_projection.2.bias": ("b2", False),
                 "glb_GN": ("glb_GN", False), "sub_GN": ("sub_GN", False)}

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        vision_bufs = self.vision.make_bufs(target)
        proj_bufs = {k: np.zeros(s, target)
                     for k, s in self._projector_shapes().items()}
        VE = "model.vision_embed_tokens."

        def route(ws):
            for name, w in ws:
                if name.startswith(VE):
                    sub = name[len(VE):]
                    if sub.startswith("img_processor.vision_model."):
                        self.vision.load_hf(
                            sub[len("img_processor.vision_model."):],
                            np.asarray(w), vision_bufs, target)
                        continue
                    m = self._PROJ_MAP.get(sub)
                    if m is not None:
                        key, tr = m
                        wv = np.asarray(w)
                        wv = wv.T if tr else wv.reshape(
                            proj_bufs[key].shape)
                        proj_bufs[key][...] = wv.astype(target)
                    continue
                yield name, w

        params = super().load_weights(route(weights))
        params["vision"] = vision_bufs
        params["projector"] = proj_bufs
        return params

    def param_specs(self) -> dict:
        specs = super().param_specs()
        specs["vision"] = jax.tree.map(lambda _: P(), self.vision.shapes(),
                                       is_leaf=lambda x: isinstance(x, tuple))
        specs["projector"] = {k: P() for k in self._projector_shapes()}
        return specs

    # ----------------------------------------------------------------- encode
    def _tile_fn(self, n_pad: int):
        fn = self._tile_cache.get(n_pad)
        if fn is None:
            def enc(params, pv):
                feats = self.vision.encode(params["vision"], pv)
                return feats[:, 1:]  # drop CLS ('patch' feature selection)
            fn = jax.jit(enc)
            self._tile_cache[n_pad] = fn
        return fn

    def _merge_2x2(self, feats: jax.Array, hc: int, wc: int) -> jax.Array:
        """[hc*wc, g*g, C] -> [hc*g2, wc*g2, 4C] (reference
        reshape_hd_patches_2x2merge)."""
        g = self.vision.grid
        g2, C = g // 2, feats.shape[-1]
        n = hc * wc
        x = feats.reshape(n, g, g, C)
        x = x.reshape(n, g2, 2, g2, 2, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(hc, wc, g2, g2, 4 * C).transpose(0, 2, 1, 3, 4)
        return x.reshape(hc * g2, wc * g2, 4 * C)

    def _newline(self, x: jax.Array, sub_gn: jax.Array) -> jax.Array:
        h = x.shape[0]
        col = jnp.broadcast_to(sub_gn, (h, 1, x.shape[-1])).astype(x.dtype)
        return jnp.concatenate([x, col], axis=1).reshape(-1, x.shape[-1])

    def encode_images(self, params, pixel_values, crops=None, **_):
        """pixel_values: flat [sum(1 + hc*wc), 3, S, S] per image (global
        tile first); crops: per-image (h_crop, w_crop). Returns flat
        [tokens, H] in 'sub_glb' order per image."""
        N = int(pixel_values.shape[0])
        n_pad = max(1, 1 << (N - 1).bit_length())
        pv = pixel_values
        if n_pad != N:
            pv = jnp.concatenate(
                [pv, jnp.zeros((n_pad - N,) + pv.shape[1:], pv.dtype)])
        feats = self._tile_fn(n_pad)(params, pv)[:N]
        pp = params["projector"]
        pieces, off = [], 0
        for hc, wc in crops:
            hc, wc = int(hc), int(wc)
            glb = self._merge_2x2(feats[off:off + 1], 1, 1)
            glb = self._newline(glb, pp["sub_GN"])
            sub = self._merge_2x2(feats[off + 1:off + 1 + hc * wc], hc, wc)
            sub = self._newline(sub, pp["sub_GN"])
            emb = jnp.concatenate(
                [sub, pp["glb_GN"][None].astype(sub.dtype), glb], axis=0)
            pieces.append(emb)
            off += 1 + hc * wc
        x = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces)
        x = jnp.dot(x, pp["w1"],
                    preferred_element_type=jnp.float32).astype(x.dtype) \
            + pp["b1"]
        x = jax.nn.gelu(x, approximate=False)
        x = jnp.dot(x, pp["w2"],
                    preferred_element_type=jnp.float32).astype(x.dtype) \
            + pp["b2"]
        return x.reshape(-1, self.hidden_size)
