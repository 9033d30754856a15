"""Idefics3 / SmolVLM: SigLIP-style tower + pixel-shuffle connector over a
llama backbone.

Parity: aphrodite/modeling/models/idefics3.py and smolvlm.py. The
connector pixel-shuffles the patch grid by ``scale_factor`` (sequence
/ s^2, channels * s^2) and projects with a bias-free linear into the text
width; each image contributes (grid/scale)^2 placeholder tokens. Images
are served unsplit (``do_image_splitting=False`` semantics — one resized
square per image); HF-processor pre-split inputs also work when the
prompt arrives pre-expanded (every sub-image is just another image)."""
from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.llama import LlamaForCausalLM
from aphrodite_tpu.models.vision import VisionTower


class Idefics3ForConditionalGeneration(LlamaForCausalLM):
    is_multimodal = True

    def __init__(self, config):
        super().__init__(config)
        hf = config.hf_config
        self.vision = VisionTower(hf.vision_config, self.dtype,
                                  cls_token=False, feature_layer=-1,
                                  post_ln=True)
        # HF Idefics3VisionEmbeddings bucketizes fractional patch coords
        # (right=False), which maps square-grid index k to bucket
        # max(k-1, 0) — replicate exactly.
        g = self.vision.grid
        b = np.maximum(np.arange(g) - 1, 0)
        self.vision.pos_ids = (b[:, None] * g + b[None, :]).reshape(-1)
        self.image_token_id = hf.image_token_id
        self.scale_factor = getattr(hf, "scale_factor", 2)

    def _proj_shapes(self):
        din = self.vision.hidden * self.scale_factor ** 2
        return {"w": (din, self.hidden_size)}

    def init_dummy_params(self, rng):
        r1, r2, r3 = jax.random.split(rng, 3)
        params = super().init_dummy_params(r1)
        params["vision"] = self.vision.init_dummy(r2)
        params["projector"] = {"w": (0.02 * jax.random.normal(
            r3, self._proj_shapes()["w"], jnp.float32)).astype(self.dtype)}
        return params

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        vbufs = self.vision.make_bufs(target)
        proj = {k: np.zeros(s, target)
                for k, s in self._proj_shapes().items()}

        def route(ws):
            for name, w in ws:
                if name.startswith("model.text_model."):
                    name = "model." + name[len("model.text_model."):]
                if name.startswith("model.vision_model."):
                    self.vision.load_hf(
                        name[len("model.vision_model."):], np.asarray(w),
                        vbufs, target)
                    continue
                if name == "model.connector.modality_projection." \
                           "proj.weight":
                    proj["w"] = np.asarray(w).T.astype(target)
                    continue
                yield name, w

        params = super().load_weights(route(weights))
        params["vision"] = vbufs
        params["projector"] = proj
        return params

    def param_specs(self):
        specs = super().param_specs()
        specs["vision"] = jax.tree.map(
            lambda _: P(), self.vision.shapes(),
            is_leaf=lambda x: isinstance(x, tuple))
        specs["projector"] = {k: P() for k in self._proj_shapes()}
        return specs

    def encode_images(self, params, pixel_values):
        """[N, 3, S, S] -> [N * (grid/scale)^2, text_hidden]."""
        feats = self.vision.encode(params["vision"], pixel_values)
        N, seq, D = feats.shape
        s = self.scale_factor
        hw = int(seq ** 0.5)
        # HF Idefics3Connector.pixel_shuffle
        x = feats.reshape(N, hw, hw // s, D * s)
        x = jnp.transpose(x, (0, 2, 1, 3))
        x = x.reshape(N, hw // s, hw // s, D * s * s)
        x = jnp.transpose(x, (0, 2, 1, 3))
        x = x.reshape(N * (seq // (s * s)), D * s * s)
        return jnp.dot(x, params["projector"]["w"],
                       preferred_element_type=jnp.float32
                       ).astype(feats.dtype)


class SmolVLMForConditionalGeneration(Idefics3ForConditionalGeneration):
    """HF 'SmolVLMForConditionalGeneration' (reference smolvlm.py): same
    stack; SmolVLM2 checkpoints use the Idefics3 geometry."""
