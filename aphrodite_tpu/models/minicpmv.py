"""MiniCPM-V (2.5/2.6) and MiniCPM-o: navit SigLIP tower + 2D-sincos
perceiver resampler.

Parity: aphrodite/modeling/models/minicpmv.py (+ layers/resampler.py).
Image slices arrive at native aspect ratios (variable patch grids); each
slice runs the SigLIP tower with Idefics2-style bucketized position ids
(jit per grid signature), then the resampler cross-attends
``query_num`` learned queries against the slice features with a 2D
sin/cos positional embedding added to the KEYS (packed-in-proj MHA,
ln_q/ln_kv/ln_post + square output projection).

MiniCPM-o's audio tower (whisper-style) is consumed through the same
placeholder machinery; its checkpoint's apm.* weights are accepted by the
loader but audio inputs route through the Qwen2-Audio-style adapter path.
"""
from __future__ import annotations

import math
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.vision import VisionTower, layer_norm


def sincos_2d(D: int, h: int, w: int) -> np.ndarray:
    """get_2d_sincos_pos_embed version (2,5): [h, w, D]; first half encodes
    the meshgrid's first component (w-coordinate — reference layout)."""
    omega = 1.0 / 10000 ** (np.arange(D // 4, dtype=np.float64)
                            / (D / 4.0))
    gw, gh = np.meshgrid(np.arange(w, dtype=np.float64),
                         np.arange(h, dtype=np.float64))

    def emb(pos):
        out = np.einsum("hw,d->hwd", pos, omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=-1)

    return np.concatenate([emb(gw), emb(gh)], axis=-1)


def navit_pos_ids(gh: int, gw: int, side: int) -> np.ndarray:
    """Idefics2/navit bucketized position ids for a (gh, gw) patch grid on
    a tower trained at ``side`` patches per side."""
    bounds = np.arange(1 / side, 1.0, 1 / side, dtype=np.float32)
    # HF computes i/n * (1 - 1e-6) in the input dtype — exact-boundary
    # hits land in the LOWER bucket.
    fh = (np.arange(gh, dtype=np.float32) / gh) * (1 - 1e-6)
    fw = (np.arange(gw, dtype=np.float32) / gw) * (1 - 1e-6)
    bh = np.searchsorted(bounds, fh, side="right")
    bw = np.searchsorted(bounds, fw, side="right")
    return (bh[:, None] * side + bw[None, :]).reshape(-1)


class _MiniCPMVMixin:
    is_multimodal = True
    mm_needs_extra = True

    def _mm_init(self, config) -> None:
        hf = config.hf_config
        self.vision = VisionTower(hf.vision_config, self.dtype,
                                  cls_token=False, feature_layer=-1,
                                  post_ln=True)
        self.query_num = int(getattr(hf, "query_num", 64))
        self.image_token_id = getattr(hf, "image_token_id", None)
        # resampler heads: embed_dim // 128 (remote-code convention).
        self.res_heads = max(1, self.hidden_size // 128)
        self._enc_cache: dict = {}

    # ------------------------------------------------------------------ params
    def _res_shapes(self) -> dict:
        H, Dv, Q = self.hidden_size, self.vision.hidden, self.query_num
        return {
            "query": (Q, H),
            "kv_proj": (Dv, H),
            "in_proj_w": (H, 3 * H), "in_proj_b": (3 * H,),
            "out_w": (H, H), "out_b": (H,),
            "ln_q_w": (H,), "ln_q_b": (H,),
            "ln_kv_w": (H,), "ln_kv_b": (H,),
            "ln_post_w": (H,), "ln_post_b": (H,),
            "proj": (H, H),
        }

    def init_dummy_params(self, rng: jax.Array) -> dict:
        params = super().init_dummy_params(rng)
        params["vision"] = self.vision.init_dummy(
            jax.random.fold_in(rng, 31))
        keys = iter(jax.random.split(jax.random.fold_in(rng, 32), 16))
        res = {}
        for k, s in self._res_shapes().items():
            if k.startswith("ln") and k.endswith("_w"):
                res[k] = jnp.ones(s, self.dtype)
            elif k.endswith("_b"):
                res[k] = jnp.zeros(s, self.dtype)
            else:
                res[k] = (0.02 * jax.random.normal(next(keys), s,
                                                   jnp.float32)
                          ).astype(self.dtype)
        params["resampler"] = res
        return params

    _RES_MAP = {
        "query": ("query", False),
        "kv_proj.weight": ("kv_proj", True),
        "attn.in_proj_weight": ("in_proj_w", True),
        "attn.in_proj_bias": ("in_proj_b", False),
        "attn.out_proj.weight": ("out_w", True),
        "attn.out_proj.bias": ("out_b", False),
        "ln_q.weight": ("ln_q_w", False), "ln_q.bias": ("ln_q_b", False),
        "ln_kv.weight": ("ln_kv_w", False),
        "ln_kv.bias": ("ln_kv_b", False),
        "ln_post.weight": ("ln_post_w", False),
        "ln_post.bias": ("ln_post_b", False),
        "proj": ("proj", False),
    }

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        vision_bufs = self.vision.make_bufs(target)
        res = {k: np.zeros(s, target)
               for k, s in self._res_shapes().items()}

        def route(ws):
            for name, w in ws:
                if name.startswith("vpm."):
                    self.vision.load_hf(name[len("vpm."):], np.asarray(w),
                                        vision_bufs, target)
                elif name.startswith("resampler."):
                    m = self._RES_MAP.get(name[len("resampler."):])
                    if m is not None:
                        key, tr = m
                        res[key][...] = (np.asarray(w).T if tr
                                         else np.asarray(w)).astype(target)
                elif name.startswith(("apm.", "tts.", "audio_projection")):
                    continue  # MiniCPM-o audio/tts towers (adapter path)
                elif name.startswith("llm."):
                    yield name[len("llm."):], w
                else:
                    yield name, w

        params = super().load_weights(route(weights))
        params["vision"] = vision_bufs
        params["resampler"] = res
        return params

    def param_specs(self) -> dict:
        specs = super().param_specs()
        specs["vision"] = jax.tree.map(lambda _: P(), self.vision.shapes(),
                                       is_leaf=lambda x: isinstance(x, tuple))
        specs["resampler"] = {k: P() for k in self._res_shapes()}
        return specs

    # ----------------------------------------------------------------- encode
    def _slice_fn(self, gh: int, gw: int):
        key = (gh, gw)
        fn = self._enc_cache.get(key)
        if fn is not None:
            return fn
        ps = self.vision.patch
        side = self.vision.grid
        pos_ids = navit_pos_ids(gh, gw, side)
        pos2d = jnp.asarray(sincos_2d(self.hidden_size, gh, gw)
                            .reshape(gh * gw, -1), jnp.float32)
        H, Q = self.hidden_size, self.query_num
        nh = self.res_heads
        hd = H // nh

        def enc(params, pixels):
            feats = self.vision.encode(params["vision"], pixels[None],
                                       grid_hw=(gh, gw),
                                       pos_ids=pos_ids)[0]  # [P, Dv]
            rp = params["resampler"]
            kv = jnp.dot(feats, rp["kv_proj"],
                         preferred_element_type=jnp.float32
                         ).astype(feats.dtype)
            kv = layer_norm(kv, rp["ln_kv_w"], rp["ln_kv_b"], 1e-6)
            q = layer_norm(rp["query"], rp["ln_q_w"], rp["ln_q_b"], 1e-6)
            wq, wk, wv = jnp.split(rp["in_proj_w"], 3, axis=1)
            bq, bk, bv = jnp.split(rp["in_proj_b"], 3)
            k_in = kv + pos2d.astype(kv.dtype)
            qh = (jnp.dot(q, wq) + bq).reshape(Q, nh, hd)
            kh = (jnp.dot(k_in, wk) + bk).reshape(-1, nh, hd)
            vh = (jnp.dot(kv, wv) + bv).reshape(-1, nh, hd)
            logits = jnp.einsum("qhd,khd->hqk", qh, kh,
                                preferred_element_type=jnp.float32)
            p = jax.nn.softmax(logits * (hd ** -0.5), -1
                               ).astype(kv.dtype)
            o = jnp.einsum("hqk,khd->qhd", p, vh).reshape(Q, H)
            o = jnp.dot(o, rp["out_w"]) + rp["out_b"]
            o = layer_norm(o, rp["ln_post_w"], rp["ln_post_b"], 1e-6)
            return jnp.dot(o, rp["proj"],
                           preferred_element_type=jnp.float32
                           ).astype(o.dtype)

        fn = jax.jit(enc)
        self._enc_cache[key] = fn
        return fn

    def encode_images(self, params, pixel_values, sizes=None, **_):
        """pixel_values [N,3,Hmax,Wmax] zero-padded slices; sizes per-slice
        (patch_rows, patch_cols). Each slice -> query_num rows."""
        ps = self.vision.patch
        pieces = []
        for i, (gh, gw) in enumerate(sizes):
            gh, gw = int(gh), int(gw)
            img = pixel_values[i][:, :gh * ps, :gw * ps]
            pieces.append(self._slice_fn(gh, gw)(params, img))
        out = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces)
        return out.reshape(-1, self.hidden_size)


_CLS_CACHE: dict[type, type] = {}


def MiniCPMVForCausalLM(config):
    hf = config.hf_config
    version = float(getattr(hf, "version", 2.6) or 2.6)
    if version >= 2.6:  # 2.6 / MiniCPM-o: Qwen2 backbone
        from aphrodite_tpu.models.llama import Qwen2ForCausalLM as Base
    elif version >= 2.5:  # 2.5: Llama-3 backbone
        from aphrodite_tpu.models.llama import LlamaForCausalLM as Base
    else:  # 2.0: MiniCPM backbone (muP scales)
        from aphrodite_tpu.models.llama_variants import \
            MiniCPMForCausalLM as Base
    cls = _CLS_CACHE.get(Base)
    if cls is None:
        cls = type("MiniCPMV" + Base.__name__, (_MiniCPMVMixin, Base), {})
        _CLS_CACHE[Base] = cls
    model = cls(config)
    model._mm_init(config)
    return model
