"""LLaVA-family VLMs: ViT vision tower + MLP projector + any llama-family
language backbone.

Parity: aphrodite/modeling/models/llava.py (+ clip.py). The language model
is chosen by ``text_config.model_type`` and the multimodal machinery is a
mixin over it, so LLaVA-1.5 (llama), -mistral and -onevision-style (qwen2)
checkpoints all resolve through one factory. Image feature merge happens
in the language model's ``apply`` via a device-side scatter (see
models/llama.py `mm=` and worker/runner.py); this module owns the vision
tower weights, the projector, and ``encode_images``.
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
from aphrodite_tpu.models.vision import VisionTower, _ACTS


class _LlavaMixin:
    is_multimodal = True

    def _mm_init(self, config) -> None:
        hf = config.hf_config
        self.vision = VisionTower(
            hf.vision_config, self.dtype,
            cls_token=True,
            feature_layer=getattr(hf, "vision_feature_layer", -2))
        self.select_strategy = getattr(hf, "vision_feature_select_strategy",
                                       "default")
        self.image_token_id = hf.image_token_index
        self.proj_act = _ACTS[getattr(hf, "projector_hidden_act", "gelu")]

    # ------------------------------------------------------------------ params
    def _projector_shapes(self) -> dict:
        D, H = self.vision.hidden, self.hidden_size
        return {"w1": (D, H), "b1": (H,), "w2": (H, H), "b2": (H,)}

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

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        vision_bufs = self.vision.make_bufs(target)
        proj_bufs = {k: np.zeros(s, target)
                     for k, s in self._projector_shapes().items()}
        proj_map = {"linear_1.weight": ("w1", True), "linear_1.bias":
                    ("b1", False), "linear_2.weight": ("w2", True),
                    "linear_2.bias": ("b2", False)}

        def route(ws):
            for name, w in ws:
                # Normalize both HF llava layouts: old
                # (language_model.model.*, vision_tower.*) and new
                # (model.language_model.*, model.vision_tower.*).
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
                if name.startswith("multi_modal_projector."):
                    m = proj_map.get(name[len("multi_modal_projector."):])
                    if m is not None:
                        key, tr = m
                        proj_bufs[key] = (np.asarray(w).T if tr
                                          else np.asarray(w)).astype(target)
                    continue
                yield name, w

        params = super().load_weights(route(weights))
        params["vision"] = vision_bufs
        params["projector"] = proj_bufs
        return params

    def param_specs(self) -> dict:
        specs = super().param_specs()
        # The vision tower is small relative to the LM: replicate it.
        specs["vision"] = jax.tree.map(lambda _: P(), self.vision.shapes(),
                                       is_leaf=lambda x: isinstance(x, tuple))
        specs["projector"] = {k: P() for k in self._projector_shapes()}
        return specs

    # ----------------------------------------------------------------- forward
    def encode_images(self, params: dict, pixel_values: jax.Array
                      ) -> jax.Array:
        """[N, 3, S, S] -> flat image-token embeddings
        [N * tokens_per_image, hidden_size] in prompt order."""
        feats = self.vision.encode(params["vision"], pixel_values)
        if self.select_strategy == "default":
            feats = feats[:, 1:]  # drop CLS
        pp = params["projector"]
        h = jnp.dot(feats, pp["w1"],
                    preferred_element_type=jnp.float32).astype(feats.dtype) \
            + pp["b1"]
        h = self.proj_act(h)
        h = jnp.dot(h, pp["w2"],
                    preferred_element_type=jnp.float32).astype(feats.dtype) \
            + pp["b2"]
        return h.reshape(-1, self.hidden_size)


_TEXT_BACKBONES = {
    "llama": LlamaForCausalLM,
    "mistral": MistralForCausalLM,
    "qwen2": Qwen2ForCausalLM,
}
_CLS_CACHE: dict[type, type] = {}


def LlavaForConditionalGeneration(config):
    """Factory: compose the multimodal mixin over the text backbone class
    selected by the checkpoint's text_config."""
    if getattr(config.hf_config.vision_config, "model_type",
               "clip_vision_model") == "pixtral":
        from aphrodite_tpu.models.pixtral import (
            PixtralLlavaForConditionalGeneration)
        return PixtralLlavaForConditionalGeneration(config)
    base = _TEXT_BACKBONES.get(
        getattr(config.text_config, "model_type", "llama"),
        LlamaForCausalLM)
    cls = _CLS_CACHE.get(base)
    if cls is None:
        cls = type("Llava" + base.__name__, (_LlavaMixin, base), {})
        _CLS_CACHE[base] = cls
    model = cls(config)
    model._mm_init(config)
    return model
