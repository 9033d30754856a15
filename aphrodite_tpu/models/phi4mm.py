"""Phi-4-multimodal: SigLIP-navit vision with dynamic-HD crop assembly +
nemo-conformer audio, over the Phi-3 (fused-qkv) decoder.

Parity: aphrodite/modeling/models/phi4mm.py (+ phi4mm_audio.py). Mechanisms:
- vision (phi4mm.py:100-392): Idefics2-style SigLIP truncated at layer -2,
  bucketized fractional position ids per crop from the patch attention
  mask (attention itself is full, idefics2_vision_model.py:331-336), 2x2
  average-pool token compression, then the HD transform with reduction 1:
  sub-crop grid rows cropped to the mask's useful height/width with a
  ``sub_GN`` column per row, ``glb_GN`` separator, global 16x17 rows
  (order sub_glb), projected by Linear-GELU-Linear;
- audio (phi4mm_audio.py): models/phi4mm_audio.py here; the projection is
  a Linear-GELU-Linear pair with SEPARATE weights for speech-only and
  vision+speech prompts (mode 'vision' when images are present,
  phi4mm.py:1146-1160);
- the checkpoint wraps LM projections in LoRA ``base_layer.`` modules and
  ships vision/speech LoRA adapters: base weights are unwrapped and the
  adapters skipped (phi4mm.py:1248-1251), matching the reference (serve
  the LoRAs through the LoRA subsystem).
"""
from __future__ import annotations

from functools import partial
from types import SimpleNamespace
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.phi3_qwen3 import Phi3ForCausalLM
from aphrodite_tpu.models.phi4mm_audio import Phi4ConformerEncoder
from aphrodite_tpu.models.vision import VisionTower

IMAGE_TOKEN_ID = 200010   # <|endoftext10|>
AUDIO_TOKEN_ID = 200011   # <|endoftext11|>


def navit_pos_ids_masked(mask: np.ndarray, side: int) -> np.ndarray:
    """Bucketized fractional position ids for one crop's patch mask
    [side, side] (reference idefics2_vision_model.py:79-105). Padded
    patch positions keep id 0."""
    ids = np.zeros((side * side,), np.int32)
    nb_h = int(mask[:, 0].sum())
    nb_w = int(mask[0].sum())
    if nb_h == 0 or nb_w == 0:
        return ids
    boundaries = np.arange(1 / side, 1.0, 1 / side)
    fr_h = np.arange(0, 1 - 1e-6, 1 / nb_h)
    fr_w = np.arange(0, 1 - 1e-6, 1 / nb_w)
    b_h = np.searchsorted(boundaries, fr_h, side="right")
    b_w = np.searchsorted(boundaries, fr_w, side="right")
    pos = (b_h[:, None] * side + b_w[None]).reshape(-1)
    ids[mask.reshape(-1).astype(bool)] = pos.astype(np.int32)
    return ids


class Phi4MMForCausalLM(Phi3ForCausalLM):

    is_multimodal = True
    mm_needs_extra = True

    def __init__(self, config):
        super().__init__(config)
        hf = config.hf_config
        # The reference hardcodes the SigLIP-navit geometry
        # (phi4mm.py:73-98); a vision_config on the checkpoint overrides it
        # (used by tiny tests).
        vc = getattr(hf, "vision_config", None)
        if vc is None:
            vc = {"hidden_size": 1152, "image_size": 448,
                  "intermediate_size": 4304, "num_attention_heads": 16,
                  "num_hidden_layers": 27, "patch_size": 14}
        if isinstance(vc, dict):
            vc = SimpleNamespace(**vc)
        if not hasattr(vc, "hidden_act"):
            vc.hidden_act = "gelu_pytorch_tanh"
        img_proc = getattr(hf, "img_processor", None) or {}
        layer_idx = img_proc.get("layer_idx", -2) if isinstance(
            img_proc, dict) else -2
        self.vision = VisionTower(vc, self.dtype, cls_token=False,
                                  feature_layer=layer_idx, post_ln=False)
        self.vit_grid = self.vision.grid               # 32
        self.comp_grid = self.vit_grid // 2            # 16 after avg pool
        self.vis_dim = self.vision.hidden
        ap = getattr(hf, "audio_processor", None) or {}
        aconf = ap.get("config", ap) if isinstance(ap, dict) else ap
        self.audio = Phi4ConformerEncoder(aconf, self.dtype)
        self._enc_cache: dict = {}

    def _proj_shapes(self) -> dict:
        C, H, A = self.vis_dim, self.hidden_size, self.audio.hidden
        return {
            "glb_GN": (C,), "sub_GN": (C,),
            "img_proj0_w": (C, H), "img_proj0_b": (H,),
            "img_proj2_w": (H, H), "img_proj2_b": (H,),
            "aud_s0_w": (A, H), "aud_s0_b": (H,),
            "aud_s2_w": (H, H), "aud_s2_b": (H,),
            "aud_v0_w": (A, H), "aud_v0_b": (H,),
            "aud_v2_w": (H, H), "aud_v2_b": (H,),
        }

    def init_dummy_params(self, rng):
        params = super().init_dummy_params(rng)
        params["vision"] = self.vision.init_dummy(jax.random.fold_in(rng, 41))
        params["audio_enc"] = self.audio.init_dummy(
            jax.random.fold_in(rng, 42))
        keys = iter(jax.random.split(jax.random.fold_in(rng, 43), 16))
        proj = {}
        for k, s in self._proj_shapes().items():
            proj[k] = jnp.zeros(s, self.dtype) if k.endswith("_b") or \
                k.endswith("GN") else (0.02 * jax.random.normal(
                    next(keys), s, jnp.float32)).astype(self.dtype)
        params["mm_proj"] = proj
        return params

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        vis = self.vision.make_bufs(target)
        aud = self.audio.make_bufs(target)
        proj = {k: np.zeros(s, target)
                for k, s in self._proj_shapes().items()}
        IMG = "model.embed_tokens_extend.image_embed."
        AUD = "model.embed_tokens_extend.audio_embed."
        pmap = {IMG + "glb_GN": "glb_GN", IMG + "sub_GN": "sub_GN",
                IMG + "img_projection.0.weight": "img_proj0_w",
                IMG + "img_projection.0.bias": "img_proj0_b",
                IMG + "img_projection.2.weight": "img_proj2_w",
                IMG + "img_projection.2.bias": "img_proj2_b"}
        for tag, key in (("speech", "s"), ("vision", "v")):
            for i, slot in (("0", "0"), ("2", "2")):
                pmap[AUD + f"audio_projection.{tag}.{i}.weight"] = \
                    f"aud_{key}{slot}_w"
                pmap[AUD + f"audio_projection.{tag}.{i}.bias"] = \
                    f"aud_{key}{slot}_b"

        def route(ws):
            for name, w in ws:
                if "lora" in name:  # vision/speech LoRA adapters
                    continue
                name = name.replace("base_layer.", "")
                w = np.asarray(w)
                key = pmap.get(name)
                if key is not None:
                    if name.endswith("weight") and w.ndim == 2:
                        w = w.T
                    proj[key][...] = w.reshape(proj[key].shape
                                               ).astype(target)
                elif name.startswith(IMG + "img_processor."):
                    self.vision.load_hf(name[len(IMG + "img_processor."):],
                                        w, vis, target)
                elif name.startswith(AUD + "encoder."):
                    self.audio.load_hf(name[len(AUD + "encoder."):], w,
                                       aud, target)
                elif name.startswith("model.embed_tokens_extend."):
                    continue
                else:
                    yield name, w

        params = super().load_weights(route(weights))
        params["vision"] = vis
        params["audio_enc"] = aud
        params["mm_proj"] = proj
        return params

    def param_specs(self):
        specs = super().param_specs()
        for sub, mod in (("vision", self.vision), ("audio_enc", self.audio)):
            specs[sub] = jax.tree.map(lambda _: P(), mod.shapes(),
                                      is_leaf=lambda x: isinstance(x, tuple))
        specs["mm_proj"] = {k: P() for k in self._proj_shapes()}
        return specs

    # ---------------------------------------------------------------- encode
    def _image_rows(self, params, crops, pos_ids, layouts):
        """crops [N_total, 3, S, S] (all images' crops flattened);
        layouts: per image (crop_offset, h, w, useful_h, useful_w).
        Returns concatenated projected rows for all images."""
        pp = params["mm_proj"]
        feats = self.vision.encode(params["vision"], crops,
                                   pos_ids=pos_ids)  # [N, grid^2, C]
        N = feats.shape[0]
        g, cg, C = self.vit_grid, self.comp_grid, self.vis_dim
        # 2x2 average-pool token compression (phi4mm.py:148-153).
        f = feats.reshape(N, g, g, C).reshape(N, cg, 2, cg, 2, C)
        f = jnp.mean(f, axis=(2, 4))  # [N, cg, cg, C]
        sub_GN = pp["sub_GN"].astype(f.dtype)
        glb_GN = pp["glb_GN"].astype(f.dtype)
        pieces = []
        for off, h, w, uh, uw in layouts:
            glb = f[off]  # [cg, cg, C]
            glb = jnp.concatenate(
                [glb, jnp.broadcast_to(sub_GN, (cg, 1, C))], axis=1
            ).reshape(-1, C)
            sub = f[off + 1: off + 1 + h * w]  # [h*w, cg, cg, C]
            sub = sub.reshape(h, w, cg, cg, C)
            sub = jnp.transpose(sub, (0, 2, 1, 3, 4)).reshape(
                h * cg, w * cg, C)[:uh, :uw]
            sub = jnp.concatenate(
                [sub, jnp.broadcast_to(sub_GN, (uh, 1, C))], axis=1
            ).reshape(-1, C)
            pieces.append(jnp.concatenate([sub, glb_GN[None], glb]))
        x = jnp.concatenate(pieces) if len(pieces) > 1 else pieces[0]
        x = jax.nn.gelu(jnp.dot(x, pp["img_proj0_w"],
                                preferred_element_type=jnp.float32
                                ).astype(x.dtype) + pp["img_proj0_b"],
                        approximate=False)
        return jnp.dot(x, pp["img_proj2_w"],
                       preferred_element_type=jnp.float32
                       ).astype(x.dtype) + pp["img_proj2_b"]

    def _audio_rows(self, params, mel, n_rows, mode):
        pp = params["mm_proj"]
        feats = self.audio.encode(params["audio_enc"], mel)[0, :n_rows]
        k = "v" if mode == "vision" else "s"
        x = jax.nn.gelu(jnp.dot(feats, pp[f"aud_{k}0_w"],
                                preferred_element_type=jnp.float32
                                ).astype(feats.dtype) + pp[f"aud_{k}0_b"],
                        approximate=False)
        return jnp.dot(x, pp[f"aud_{k}2_w"],
                       preferred_element_type=jnp.float32
                       ).astype(x.dtype) + pp[f"aud_{k}2_b"]

    def _encode(self, params, crops, mel, pos_ids, layouts, n_audio_rows,
                mode, order):
        img = self._image_rows(params, crops, pos_ids, layouts) \
            if crops is not None else None
        aud = self._audio_rows(params, mel, n_audio_rows, mode) \
            if mel is not None else None
        rows = [img if kind == "image" else aud for kind in order]
        return jnp.concatenate(rows) if len(rows) > 1 else rows[0]

    def encode_media(self, params, pixel_values, image_sizes=None,
                     image_attention_mask=None, audio_features=None,
                     audio_embed_sizes=None, mm_order=("image",), **_):
        """pixel_values: image crops [N_img, max_crops, 3, S, S] (or the
        audio mel [1, T, n_mels] for audio-only requests);
        image_attention_mask [N_img, max_crops, vit_grid, vit_grid];
        mm_order: modality kinds in prompt-span order (one 'image' entry
        covering all images, one 'audio' covering all audios)."""
        crops = pos_ids = layouts = mel = None
        n_audio_rows = 0
        mode = "speech"
        if image_sizes is not None:
            pv = np.asarray(pixel_values)
            mask = np.asarray(image_attention_mask)
            n_img, max_crops = pv.shape[0], pv.shape[1]
            g, cg = self.vit_grid, self.comp_grid
            crops_np = pv.reshape((-1,) + tuple(pv.shape[2:]))
            mask = mask.reshape(-1, g, g)
            pos_ids = tuple(tuple(navit_pos_ids_masked(m, g).tolist())
                            for m in mask)
            layouts = []
            sizes = np.asarray(image_sizes).reshape(-1, 2)
            S = self.vision.image_size
            for i in range(n_img):
                h, w = int(sizes[i, 0]) // S, int(sizes[i, 1]) // S
                m = mask[i * max_crops + 1: i * max_crops + 1 + h * w]
                m = m[:, ::2, ::2].reshape(h, w, cg, cg)
                m = np.transpose(m, (0, 2, 1, 3)).reshape(h * cg, w * cg)
                uh = int(m[:, 0].sum())
                uw = int(m[0, :].sum())
                layouts.append((i * max_crops, h, w, uh, uw))
            layouts = tuple(layouts)
            crops = jnp.asarray(crops_np)
            mode = "vision"
        if audio_features is not None or image_sizes is None:
            mel_np = np.asarray(audio_features if audio_features is not None
                                else pixel_values, np.float32)
            mel_np = mel_np.reshape(1, -1, self.audio.n_mels)
            mel = jnp.asarray(mel_np)
            if audio_embed_sizes is not None:
                n_audio_rows = int(np.asarray(audio_embed_sizes
                                              ).reshape(-1)[0])
            else:
                t = mel_np.shape[1]
                for _ in range(self.audio.n_sample):
                    t = (t - 1) // 2 + 1
                n_audio_rows = t
        key = (None if crops is None else crops.shape, pos_ids, layouts,
               None if mel is None else mel.shape, n_audio_rows, mode,
               tuple(mm_order))
        fn = self._enc_cache.get(key)
        if fn is None:
            fn = jax.jit(partial(self._encode, pos_ids=pos_ids,
                                 layouts=layouts,
                                 n_audio_rows=n_audio_rows, mode=mode,
                                 order=tuple(mm_order)))
            self._enc_cache[key] = fn
        return fn(params, crops, mel)
