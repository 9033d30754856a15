"""Aya Vision (Cohere): SigLIP tower + SwiGLU pixel-shuffle projector.

Parity: aphrodite/modeling/models/aya_vision.py. GotOCR-style tiles each
contribute ``(grid / downsample_factor)^2`` tokens; the projector
pixel-shuffles (space-to-depth), LayerNorms at the widened dim, then a
SwiGLU alignment MLP (chunk -> silu(gate) * x) into the Cohere width.
"""
from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.llama_variants import CohereForCausalLM
from aphrodite_tpu.models.vision import VisionTower, layer_norm


class AyaVisionForConditionalGeneration(CohereForCausalLM):

    is_multimodal = True

    def __init__(self, config):
        super().__init__(config)
        hf = config.hf_config
        self.vision = VisionTower(
            hf.vision_config, self.dtype, cls_token=False,
            feature_layer=getattr(hf, "vision_feature_layer", -1))
        self.downsample = int(getattr(hf, "downsample_factor", 2))
        self.align_dim = getattr(hf, "alignment_intermediate_size",
                                 self.hidden_size)
        self.adapter_eps = getattr(hf, "adapter_layer_norm_eps", 1e-6)
        self.image_token_id = getattr(hf, "image_token_index", None) or \
            getattr(hf, "image_token_id", None)

    def _proj_shapes(self) -> dict:
        Dv = self.vision.hidden * self.downsample ** 2
        return {"ln_w": (Dv,), "ln_b": (Dv,),
                "w1": (Dv, self.align_dim), "b1": (self.align_dim,),
                "w2": (self.align_dim // 2, self.hidden_size),
                "b2": (self.hidden_size,)}

    def init_dummy_params(self, rng):
        params = super().init_dummy_params(rng)
        r1, r2 = jax.random.split(jax.random.fold_in(rng, 9))
        params["vision"] = self.vision.init_dummy(r1)
        keys = iter(jax.random.split(r2, 8))
        proj = {}
        for k, s in self._proj_shapes().items():
            if k == "ln_w":
                proj[k] = jnp.ones(s, self.dtype)
            elif k.startswith("b") or k == "ln_b":
                proj[k] = jnp.zeros(s, self.dtype)
            else:
                proj[k] = (0.02 * jax.random.normal(
                    next(keys), s, jnp.float32)).astype(self.dtype)
        params["projector"] = proj
        return params

    _PROJ_MAP = {"layernorm.weight": ("ln_w", False),
                 "layernorm.bias": ("ln_b", False),
                 "linear_1.weight": ("w1", True),
                 "linear_1.bias": ("b1", False),
                 "linear_2.weight": ("w2", True),
                 "linear_2.bias": ("b2", False)}

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        vision_bufs = self.vision.make_bufs(target)
        proj = {k: np.zeros(s, target)
                for k, s in self._proj_shapes().items()}

        def route(ws):
            for name, w in ws:
                if name.startswith("model."):
                    name_s = name[len("model."):]
                    if name_s.startswith(("vision_tower.",
                                          "multi_modal_projector.")):
                        name = name_s
                if name.startswith("vision_tower.vision_model."):
                    self.vision.load_hf(
                        name[len("vision_tower.vision_model."):],
                        np.asarray(w), vision_bufs, target)
                elif name.startswith("multi_modal_projector."):
                    m = self._PROJ_MAP.get(
                        name[len("multi_modal_projector."):])
                    if m is not None:
                        key, tr = m
                        proj[key][...] = (np.asarray(w).T if tr
                                          else np.asarray(w)).astype(target)
                elif name.startswith("language_model."):
                    yield name[len("language_model."):], w
                else:
                    yield name, w

        params = super().load_weights(route(weights))
        params["vision"] = vision_bufs
        params["projector"] = proj
        return params

    def param_specs(self):
        specs = super().param_specs()
        specs["vision"] = jax.tree.map(lambda _: P(), self.vision.shapes(),
                                       is_leaf=lambda x: isinstance(x, tuple))
        specs["projector"] = {k: P() for k in self._proj_shapes()}
        return specs

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        """[N_tiles, 3, S, S] -> [N * (g/ds)^2, H]."""
        feats = self.vision.encode(params["vision"], pixel_values)
        N, _, Dv = feats.shape
        g, ds = self.vision.grid, self.downsample
        # pixel shuffle (HF AyaVisionMultiModalProjector.pixel_shuffle)
        x = feats.reshape(N, g, g, Dv)
        x = x.reshape(N, g, g // ds, Dv * ds)
        x = jnp.transpose(x, (0, 2, 1, 3))
        x = x.reshape(N, g // ds, g // ds, Dv * ds * ds)
        x = jnp.transpose(x, (0, 2, 1, 3))
        pp = params["projector"]
        x = layer_norm(x, pp["ln_w"], pp["ln_b"], self.adapter_eps)
        h = jnp.dot(x, pp["w1"],
                    preferred_element_type=jnp.float32).astype(x.dtype) \
            + pp["b1"]
        a, gate = jnp.split(h, 2, axis=-1)
        h = jax.nn.silu(gate) * a
        h = jnp.dot(h, pp["w2"],
                    preferred_element_type=jnp.float32).astype(x.dtype) \
            + pp["b2"]
        return h.reshape(-1, self.hidden_size)
