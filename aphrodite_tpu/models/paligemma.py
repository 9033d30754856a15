"""PaliGemma 1/2: SigLIP vision tower + linear projector + Gemma 1/2 LM.

Parity: aphrodite/modeling/models/paligemma.py (+ siglip.py). The projected
image features are pre-divided by sqrt(text_hidden) exactly as HF does —
the Gemma embedding normalizer (x sqrt(H), applied after the scatter in
gemma.apply) then cancels it, so image features enter the residual stream
unscaled. Attention is causal over the whole sequence, matching the
reference engine's serving behavior for this family.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.gemma import Gemma2ForCausalLM, GemmaForCausalLM
from aphrodite_tpu.models.vision import VisionTower


class _PaliGemmaMixin:
    is_multimodal = True

    def _mm_init(self, config) -> None:
        hf = config.hf_config
        self.vision = VisionTower(hf.vision_config, self.dtype,
                                  cls_token=False, feature_layer=-1,
                                  post_ln=True)
        self.image_token_id = hf.image_token_index
        self._proj_dim = getattr(hf, "projection_dim", self.hidden_size)

    def _projector_shapes(self) -> dict:
        return {"w": (self.vision.hidden, self._proj_dim),
                "b": (self._proj_dim,)}

    def init_dummy_params(self, rng):
        r1, r2, r3 = jax.random.split(rng, 3)
        params = super().init_dummy_params(r1)
        params["vision"] = self.vision.init_dummy(r2)
        params["projector"] = {
            "w": (0.02 * jax.random.normal(
                r3, self._projector_shapes()["w"], jnp.float32)
                ).astype(self.dtype),
            "b": jnp.zeros(self._projector_shapes()["b"], self.dtype),
        }
        return params

    def load_weights(self, weights):
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        vision_bufs = self.vision.make_bufs(target)
        proj = {k: np.zeros(s, target)
                for k, s in self._projector_shapes().items()}

        def route(ws):
            for name, w in ws:
                # new HF layout nests under model.*
                if name.startswith("model.language_model."):
                    name = "model." + name[len("model.language_model."):]
                elif name.startswith("language_model."):
                    name = name[len("language_model."):]
                elif name.startswith(("model.vision_tower.",
                                      "model.multi_modal_projector.")):
                    name = name[len("model."):]
                if name.startswith("vision_tower.vision_model."):
                    self.vision.load_hf(
                        name[len("vision_tower.vision_model."):],
                        np.asarray(w), vision_bufs, target)
                    continue
                if name == "multi_modal_projector.linear.weight":
                    proj["w"] = np.asarray(w).T.astype(target)
                    continue
                if name == "multi_modal_projector.linear.bias":
                    proj["b"] = np.asarray(w).astype(target)
                    continue
                yield name, w

        params = super().load_weights(route(weights))
        params["vision"] = vision_bufs
        params["projector"] = proj
        return params

    def param_specs(self):
        specs = super().param_specs()
        specs["vision"] = jax.tree.map(lambda _: P(), self.vision.shapes(),
                                       is_leaf=lambda x: isinstance(x, tuple))
        specs["projector"] = {k: P() for k in self._projector_shapes()}
        return specs

    def encode_images(self, params, pixel_values):
        feats = self.vision.encode(params["vision"], pixel_values)
        h = jnp.dot(feats, params["projector"]["w"],
                    preferred_element_type=jnp.float32).astype(feats.dtype) \
            + params["projector"]["b"]
        # HF divides by sqrt(text hidden); the Gemma embed normalizer
        # multiplies it back after the scatter.
        h = h / jnp.asarray(self.hidden_size ** 0.5, h.dtype)
        return h.reshape(-1, self._proj_dim)


_CLS_CACHE: dict[type, type] = {}


def PaliGemmaForConditionalGeneration(config):
    base = Gemma2ForCausalLM \
        if getattr(config.text_config, "model_type", "gemma") == "gemma2" \
        else GemmaForCausalLM
    cls = _CLS_CACHE.get(base)
    if cls is None:
        cls = type("PaliGemma" + base.__name__, (_PaliGemmaMixin, base), {})
        _CLS_CACHE[base] = cls
    model = cls(config)
    model._mm_init(config)
    return model
