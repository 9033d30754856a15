"""Fuyu-8B: linear patch projection straight into a Persimmon decoder.

Parity: aphrodite/modeling/models/fuyu.py. No vision transformer at all —
raw (patch, patch, C) channel-last pixel patches are linearly projected
into the text width and scattered over the per-row placeholder runs
(|SPEAKER| tokens, one run per image row, |NEWLINE| tokens between rows).
"""
from __future__ import annotations

from functools import partial
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.llama_variants import PersimmonForCausalLM


class FuyuForCausalLM(PersimmonForCausalLM):
    is_multimodal = True
    mm_needs_extra = True

    def __init__(self, config):
        super().__init__(config)
        hf = config.hf_config
        self.patch_size = getattr(hf, "patch_size", 30)
        self.image_token_id = getattr(hf, "image_token_id", 71011)
        self.patch_in = 3 * self.patch_size ** 2
        self._encode_cache: dict = {}

    def _proj_shapes(self):
        return {"w": (self.patch_in, self.hidden_size),
                "b": (self.hidden_size,)}

    def init_dummy_params(self, rng):
        r1, r2 = jax.random.split(rng)
        params = super().init_dummy_params(r1)
        params["vision_embed"] = {
            "w": (0.02 * jax.random.normal(
                r2, self._proj_shapes()["w"], jnp.float32)
                ).astype(self.dtype),
            "b": jnp.zeros(self._proj_shapes()["b"], self.dtype)}
        return params

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        proj = {k: np.zeros(s, target)
                for k, s in self._proj_shapes().items()}

        def route(ws):
            for name, w in ws:
                if name.startswith("language_model."):
                    name = name[len("language_model."):]
                if name == "vision_embed_tokens.weight":
                    proj["w"] = np.asarray(w).T.astype(target)
                    continue
                if name == "vision_embed_tokens.bias":
                    proj["b"] = np.asarray(w).astype(target)
                    continue
                yield name, w

        params = super().load_weights(route(weights))
        params["vision_embed"] = proj
        return params

    def param_specs(self):
        specs = super().param_specs()
        specs["vision_embed"] = {k: P() for k in self._proj_shapes()}
        return specs

    def _encode(self, params, patches):
        h = jnp.dot(patches.astype(self.dtype),
                    params["vision_embed"]["w"],
                    preferred_element_type=jnp.float32)
        return h.astype(self.dtype) + params["vision_embed"]["b"]

    def encode_images(self, params, pixel_values, patch_counts=None):
        """pixel_values: packed channel-last patches [total, 3*p*p]."""
        key = int(pixel_values.shape[0])
        fn = self._encode_cache.get(key)
        if fn is None:
            fn = jax.jit(self._encode)
            self._encode_cache[key] = fn
        return fn(params, pixel_values)
