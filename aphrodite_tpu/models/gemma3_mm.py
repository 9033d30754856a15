"""Gemma-3 multimodal: SigLIP tower + avg-pool projector over Gemma3 text.

Parity: aphrodite/modeling/models/gemma3_mm.py. The projector
(gemma3_mm.py:419-456) average-pools the P x P patch grid down to
mm_tokens_per_image, Gemma-RMS-normalizes, and matmuls into the text
width. Image tokens attend bidirectionally to ALL image tokens of the
same request (gemma3_mm.py:679-685); that mask rides
``AttentionMetadata.mm_bidir_spans`` and currently routes attention
through the XLA path (the Pallas kernel learns span masks as a follow-up).
Bidirectional semantics assume the image span is prefillled in one chunk —
size max_num_batched_tokens accordingly (the reference's v0 path has the
same constraint).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.layers.common import rms_norm
from aphrodite_tpu.models.gemma import Gemma3ForCausalLM
from aphrodite_tpu.models.vision import VisionTower


class Gemma3ForConditionalGeneration(Gemma3ForCausalLM):
    is_multimodal = True
    needs_bidir_mm = True

    def __init__(self, config):
        super().__init__(config)
        hf = config.hf_config
        vc = hf.vision_config
        self.vision = VisionTower(vc, self.dtype, cls_token=False,
                                  feature_layer=-1, post_ln=True)
        self.image_token_id = hf.image_token_index
        self.patches_per_image = vc.image_size // vc.patch_size
        self.tokens_per_side = int(
            getattr(hf, "mm_tokens_per_image", 256) ** 0.5)
        self.vision_eps = getattr(vc, "layer_norm_eps", 1e-6)

    def _projector_shapes(self) -> dict:
        return {"proj": (self.vision.hidden, self.hidden_size),
                "soft_emb_norm": (self.vision.hidden,)}

    def init_dummy_params(self, rng):
        r1, r2, r3 = jax.random.split(rng, 3)
        params = super().init_dummy_params(r1)
        params["vision"] = self.vision.init_dummy(r2)
        params["projector"] = {
            "proj": (0.02 * jax.random.normal(
                r3, self._projector_shapes()["proj"], jnp.float32)
                ).astype(self.dtype),
            "soft_emb_norm": jnp.ones(
                self._projector_shapes()["soft_emb_norm"], self.dtype),
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
                if name == "multi_modal_projector." \
                           "mm_input_projection_weight":
                    proj["proj"] = np.asarray(w).astype(target)  # [Dv, Dt]
                    continue
                if name == "multi_modal_projector.mm_soft_emb_norm.weight":
                    proj["soft_emb_norm"] = np.asarray(w).astype(target)
                    continue
                yield name, w

        params = super().load_weights(route(weights))
        params["vision"] = vision_bufs
        params["projector"] = proj
        return params

    def param_specs(self):
        specs = super().param_specs()
        specs["vision"] = jax.tree.map(
            lambda _: P(), self.vision.shapes(),
            is_leaf=lambda x: isinstance(x, tuple))
        specs["projector"] = {k: P() for k in self._projector_shapes()}
        return specs

    def encode_images(self, params, pixel_values):
        """[N, 3, S, S] -> [N * tokens_per_image, text_hidden]."""
        feats = self.vision.encode(params["vision"], pixel_values)
        N, Psq, D = feats.shape
        p = self.patches_per_image
        ts = self.tokens_per_side
        k = p // ts
        # average-pool the p x p grid to ts x ts (gemma3_mm.py:439-450)
        x = feats.reshape(N, p // k, k, p // k, k, D).mean(axis=(2, 4))
        x = x.reshape(N, ts * ts, D)
        x = rms_norm(x, params["projector"]["soft_emb_norm"],
                     self.vision_eps, offset=1.0)
        h = jnp.einsum("ntd,dh->nth", x, params["projector"]["proj"],
                       preferred_element_type=jnp.float32
                       ).astype(feats.dtype)
        # gemma.apply multiplies the whole row stream by embed_scale after
        # the scatter; HF leaves image features unscaled — pre-divide.
        h = h / jnp.asarray(self.embed_scale, jnp.float32).astype(h.dtype)
        return h.reshape(N * ts * ts, self.hidden_size)
