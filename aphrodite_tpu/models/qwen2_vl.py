"""Qwen2-VL / Qwen2.5-VL: mrope language backbone + windowed ViT tower.

Parity: aphrodite/modeling/models/qwen2_vl.py and qwen2_5_vl.py, plus the
mrope machinery in aphrodite/modeling/layers/rotary_embedding.py:942-1037
(MRotaryEmbedding.get_input_positions).

TPU-first redesign notes:
- mrope: positions are a [3, T] array in AttentionMetadata; each rotary
  frequency picks its position channel via a static section-id gather, so
  one fused cos/sin computation serves text and vision tokens alike.
  Decode positions are text_pos + delta on all three channels, which lets
  the in-graph multi-step decode scan rebuild them from the advancing
  seq_lens (md.mrope_deltas).
- The vision tower keeps patches in the HF processor's merged-group order
  and expresses Qwen2.5-VL's window attention as a same-window mask
  (attention is permutation-invariant within a window, so HF's
  window_index permute + reverse is a no-op on the output).
- Frame/window masks and the per-patch 2D rope table are computed with
  numpy at trace time: the image grid is static per compiled shape.
"""
from __future__ import annotations

from functools import partial
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.llama import Qwen2ForCausalLM
from aphrodite_tpu.models.vision import layer_norm
from aphrodite_tpu.layers.common import rms_norm


# --------------------------------------------------------------------------
# mrope position computation (host side, reference
# MRotaryEmbedding.get_input_positions_tensor rotary_embedding.py:1040-1113)
def mrope_positions(prompt_len: int, spans, grids, merge: int
                    ) -> tuple[np.ndarray, int]:
    """-> ([3, prompt_len] int32 positions, decode delta).

    spans: per-image (token_offset, num_tokens) in the prompt; grids: per
    image (t, h, w) raw patch grid. Text runs advance all three channels
    together; an image span advances by max(t, h/merge, w/merge)."""
    pos = np.zeros((3, prompt_len), np.int32)
    st = 0   # next position index
    idx = 0  # next prompt token
    if grids is None:
        grids = []
    for (off, ln), g in zip(spans or [], grids):
        t, h, w = (int(x) for x in g)
        hh, ww = h // merge, w // merge
        if off > idx:
            n = off - idx
            pos[:, idx:off] = st + np.arange(n, dtype=np.int32)
            st += n
        t_idx = np.repeat(np.arange(t, dtype=np.int32), hh * ww)
        h_idx = np.tile(np.repeat(np.arange(hh, dtype=np.int32), ww), t)
        w_idx = np.tile(np.arange(ww, dtype=np.int32), t * hh)
        pos[0, off:off + ln] = st + t_idx
        pos[1, off:off + ln] = st + h_idx
        pos[2, off:off + ln] = st + w_idx
        st += max(t, hh, ww)
        idx = off + ln
    if idx < prompt_len:
        n = prompt_len - idx
        pos[:, idx:] = st + np.arange(n, dtype=np.int32)
        st += n
    return pos, st - prompt_len


# --------------------------------------------------------------------------
# Vision tower
class QwenVisionTower:
    """Qwen2-VL (LayerNorm + dense quick-gelu MLP, per-frame full
    attention) and Qwen2.5-VL (RMSNorm + swiglu, window attention with
    full-attention layers at fullatt_block_indexes) ViT over packed patch
    rows [N, C*Tp*P*P]."""

    def __init__(self, vc, dtype, v25: bool) -> None:
        self.vc = vc
        self.dtype = dtype
        self.v25 = v25
        self.depth = vc.depth
        self.num_heads = vc.num_heads
        if v25:
            self.hidden = vc.hidden_size
            self.out_dim = vc.out_hidden_size
            self.mlp_hidden = vc.intermediate_size
            self.window = getattr(vc, "window_size", 112)
            self.fullatt = set(getattr(vc, "fullatt_block_indexes", []))
        else:
            self.hidden = vc.embed_dim
            self.out_dim = vc.hidden_size
            self.mlp_hidden = int(vc.embed_dim * vc.mlp_ratio)
            self.window = None
            self.fullatt = set(range(self.depth))
        self.head_dim = self.hidden // self.num_heads
        self.patch = vc.patch_size
        self.tpatch = vc.temporal_patch_size
        self.merge = vc.spatial_merge_size
        self.in_dim = vc.in_channels * self.tpatch * self.patch ** 2
        self.scale = self.head_dim ** -0.5

    # -------------------------------------------------------------- params
    def _shapes(self) -> dict:
        D, I, O = self.hidden, self.mlp_hidden, self.out_dim
        M = D * self.merge ** 2
        shapes = {"patch_w": (self.in_dim, D),
                  "ln_q_w": (D,),
                  "m0_w": (M, M), "m0_b": (M,),
                  "m2_w": (M, O), "m2_b": (O,)}
        if not self.v25:
            shapes["ln_q_b"] = (D,)
        blocks = {}
        for k, s in (("qkv_w", (D, 3 * D)), ("qkv_b", (3 * D,)),
                     ("proj_w", (D, D)), ("proj_b", (D,)),
                     ("n1_w", (D,)), ("n2_w", (D,))):
            blocks[k] = (self.depth,) + s
        if not self.v25:
            blocks["n1_b"] = (self.depth, D)
            blocks["n2_b"] = (self.depth, D)
            blocks["fc1_w"] = (self.depth, D, I)
            blocks["fc1_b"] = (self.depth, I)
            blocks["fc2_w"] = (self.depth, I, D)
            blocks["fc2_b"] = (self.depth, D)
        else:
            blocks["gate_w"] = (self.depth, D, I)
            blocks["gate_b"] = (self.depth, I)
            blocks["up_w"] = (self.depth, D, I)
            blocks["up_b"] = (self.depth, I)
            blocks["down_w"] = (self.depth, I, D)
            blocks["down_b"] = (self.depth, D)
        shapes.update({f"blk_{k}": v for k, v in blocks.items()})
        return shapes

    def make_bufs(self, target) -> dict:
        return {k: np.zeros(s, target) for k, s in self._shapes().items()}

    def init_dummy(self, rng) -> dict:
        keys = iter(jax.random.split(rng, 64))
        out = {}
        for k, s in self._shapes().items():
            if k.endswith("_b"):
                out[k] = jnp.zeros(s, self.dtype)
            elif "n1_w" in k or "n2_w" in k or k == "ln_q_w":
                out[k] = jnp.ones(s, self.dtype)
            else:
                out[k] = (0.02 * jax.random.normal(next(keys), s,
                                                   jnp.float32)
                          ).astype(self.dtype)
        return out

    def specs(self) -> dict:
        return {k: P() for k in self._shapes()}

    def load(self, name: str, w: np.ndarray, bufs: dict, target) -> bool:
        """Consume a ``visual.``-stripped tensor name."""
        top = {"patch_embed.proj.weight": "patch_w",
               "merger.ln_q.weight": "ln_q_w",
               "merger.ln_q.bias": "ln_q_b",
               "merger.mlp.0.weight": "m0_w", "merger.mlp.0.bias": "m0_b",
               "merger.mlp.2.weight": "m2_w", "merger.mlp.2.bias": "m2_b"}
        key = top.get(name)
        if key is not None:
            if key not in bufs:
                return True
            if name == "patch_embed.proj.weight":
                w = w.reshape(self.hidden, -1).T  # Conv3d -> linear
            elif name.endswith("weight") and w.ndim == 2:
                w = w.T
            bufs[key] = w.astype(target)
            return True
        if not name.startswith("blocks."):
            return False
        _, li, rest = name.split(".", 2)
        li = int(li)
        m = {"attn.qkv.weight": ("qkv_w", True),
             "attn.qkv.bias": ("qkv_b", False),
             "attn.proj.weight": ("proj_w", True),
             "attn.proj.bias": ("proj_b", False),
             "norm1.weight": ("n1_w", False), "norm1.bias": ("n1_b", False),
             "norm2.weight": ("n2_w", False), "norm2.bias": ("n2_b", False),
             "mlp.fc1.weight": ("fc1_w", True), "mlp.fc1.bias":
             ("fc1_b", False),
             "mlp.fc2.weight": ("fc2_w", True), "mlp.fc2.bias":
             ("fc2_b", False),
             "mlp.gate_proj.weight": ("gate_w", True),
             "mlp.gate_proj.bias": ("gate_b", False),
             "mlp.up_proj.weight": ("up_w", True),
             "mlp.up_proj.bias": ("up_b", False),
             "mlp.down_proj.weight": ("down_w", True),
             "mlp.down_proj.bias": ("down_b", False)}.get(rest)
        if m is None:
            return False
        key, tr = m
        key = f"blk_{key}"
        if key in bufs:
            bufs[key][li] = (w.T if tr else w).astype(target)
        return True

    # ------------------------------------------------------------- tables
    def _tables(self, grid_thw) -> tuple[np.ndarray, np.ndarray,
                                         Optional[np.ndarray]]:
        """Per-patch rope freq table [N, head_dim//2] plus same-frame and
        same-window boolean masks [N, N] (numpy; grid is static)."""
        half = self.head_dim // 2
        quarter = half // 2
        inv = 10000.0 ** -(np.arange(quarter, dtype=np.float64) * 2
                           / half)
        freq_rows = []
        frame_ids = []
        window_ids = []
        fid = 0
        m = self.merge
        for t, h, w in grid_thw:
            t, h, w = int(t), int(h), int(w)
            hh, ww = h // m, w // m
            # merged-group order: (hh, ww, m, m)
            hpos = (np.arange(h)[:, None] * np.ones((1, w), np.int64)) \
                .reshape(hh, m, ww, m).transpose(0, 2, 1, 3).reshape(-1)
            wpos = (np.ones((h, 1), np.int64) * np.arange(w)[None, :]) \
                .reshape(hh, m, ww, m).transpose(0, 2, 1, 3).reshape(-1)
            fr = np.concatenate([hpos[:, None] * inv[None, :],
                                 wpos[:, None] * inv[None, :]], axis=1)
            for _ in range(t):
                freq_rows.append(fr)
                frame_ids.append(np.full((h * w,), fid, np.int32))
                fid += 1
            if self.window is not None:
                win = max(self.window // (m * self.patch), 1)
                gh = (np.arange(hh)[:, None] // win) * 10_000 + \
                    (np.arange(ww)[None, :] // win)
                # merged-group window ids, expanded to the m*m patches
                wid = np.repeat(gh.reshape(-1), m * m)
                for ti in range(t):
                    window_ids.append(wid + (fid - t + ti) * 100_000_000)
        freqs = np.concatenate(freq_rows, axis=0)  # [N, half]
        frame = np.concatenate(frame_ids)
        frame_mask = frame[:, None] == frame[None, :]
        win_mask = None
        if self.window is not None:
            wids = np.concatenate(window_ids)
            win_mask = wids[:, None] == wids[None, :]
        return freqs, frame_mask, win_mask

    # ------------------------------------------------------------ forward
    def encode(self, params: dict, pixels: jax.Array, grid_thw) -> jax.Array:
        """pixels [N, in_dim] packed patches -> [N/merge^2, out_dim]."""
        vp = params
        N = pixels.shape[0]
        freqs_np, frame_mask, win_mask = self._tables(grid_thw)
        cos = jnp.asarray(np.cos(freqs_np), jnp.float32)  # [N, half]
        sin = jnp.asarray(np.sin(freqs_np), jnp.float32)
        x = jnp.dot(pixels.astype(self.dtype), vp["patch_w"])

        def norm(h, w, b):
            if self.v25:
                return rms_norm(h, w, 1e-6)
            return layer_norm(h, w, b, 1e-6)

        def rope(t):  # [N, heads, hd], rotate-half with per-token freqs
            tf = t.astype(jnp.float32)
            half = self.head_dim // 2
            t1, t2 = tf[..., :half], tf[..., half:]
            c, s = cos[:, None, :], sin[:, None, :]
            return jnp.concatenate([t1 * c - t2 * s, t2 * c + t1 * s],
                                   axis=-1).astype(t.dtype)

        nh, hd = self.num_heads, self.head_dim
        for i in range(self.depth):
            lp = {k[4:]: v[i] for k, v in vp.items()
                  if k.startswith("blk_")}
            h = norm(x, lp["n1_w"], lp.get("n1_b"))
            qkv = jnp.dot(h, lp["qkv_w"]) + lp["qkv_b"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = rope(q.reshape(N, nh, hd))
            k = rope(k.reshape(N, nh, hd))
            v = v.reshape(N, nh, hd)
            mask = frame_mask if (i in self.fullatt or win_mask is None) \
                else win_mask
            s = jnp.einsum("qhd,khd->hqk", q, k,
                           preferred_element_type=jnp.float32) * self.scale
            s = jnp.where(jnp.asarray(mask)[None], s, -jnp.inf)
            a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
            o = jnp.einsum("hqk,khd->qhd", a, v,
                           preferred_element_type=jnp.float32
                           ).astype(x.dtype).reshape(N, nh * hd)
            x = x + jnp.dot(o, lp["proj_w"]) + lp["proj_b"]
            h = norm(x, lp["n2_w"], lp.get("n2_b"))
            if self.v25:
                y = jnp.dot(jax.nn.silu(jnp.dot(h, lp["gate_w"])
                                        + lp["gate_b"])
                            * (jnp.dot(h, lp["up_w"]) + lp["up_b"]),
                            lp["down_w"]) + lp["down_b"]
            else:
                y = jnp.dot(
                    quick_gelu(jnp.dot(h, lp["fc1_w"]) + lp["fc1_b"]),
                    lp["fc2_w"]) + lp["fc2_b"]
            x = x + y
        # merger: ln_q then group merge^2 consecutive rows
        x = norm(x, vp["ln_q_w"], vp.get("ln_q_b"))
        x = x.reshape(-1, self.hidden * self.merge ** 2)
        x = jax.nn.gelu(jnp.dot(x, vp["m0_w"]) + vp["m0_b"],
                        approximate=False)
        return jnp.dot(x, vp["m2_w"]) + vp["m2_b"]


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


# --------------------------------------------------------------------------
# Language model with mrope + vision integration
class Qwen2VLForConditionalGeneration(Qwen2ForCausalLM):
    """HF 'Qwen2VLForConditionalGeneration' (reference qwen2_vl.py):
    Qwen2 backbone (qkv bias) with mrope and the Qwen2 ViT."""

    is_multimodal = True
    uses_mrope = True
    _v25 = False

    def __init__(self, config):
        super().__init__(config)
        hf = config.hf_config
        tc = config.text_config
        scaling = getattr(tc, "rope_scaling", None) or {}
        section = scaling.get("mrope_section")
        half = self.rope.rotary_dim // 2
        if section is None:
            section = [half, 0, 0]
        assert sum(section) == half, (section, half)
        self._section_ids = jnp.asarray(
            np.repeat(np.arange(3, dtype=np.int32), np.asarray(section)))
        self.vision = QwenVisionTower(hf.vision_config, self.dtype,
                                      self._v25)
        self.image_token_id = getattr(hf, "image_token_id", None)
        self.mrope_merge_size = hf.vision_config.spatial_merge_size
        self._encode_cache: dict = {}

    # mrope cos/sin (hook consumed by LlamaForCausalLM.apply)
    def _cos_sin(self, md):
        if md.mrope_pos is not None:
            mpos = md.mrope_pos  # [3, T]
        else:
            p = md.token_pos
            if md.mrope_deltas is not None:
                p = p + md.mrope_deltas[md.token_req_idx]
            mpos = jnp.stack([p, p, p])
        pos_per_freq = mpos[self._section_ids].T  # [T, half]
        freqs = pos_per_freq.astype(jnp.float32) * self._inv_freq[None, :]
        return (jnp.cos(freqs) * self._rope_mscale,
                jnp.sin(freqs) * self._rope_mscale)

    # --------------------------------------------------------------- params
    def init_dummy_params(self, rng: jax.Array) -> dict:
        r1, r2 = jax.random.split(rng)
        params = super().init_dummy_params(r1)
        params["vision"] = self.vision.init_dummy(r2)
        return params

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        vbufs = self.vision.make_bufs(target)

        def route(ws):
            for name, w in ws:
                # old layout: visual.* + model.*; new: model.visual.* +
                # model.language_model.*
                if name.startswith("model.visual."):
                    name = name[len("model."):]
                elif name.startswith("model.language_model."):
                    name = "model." + name[len("model.language_model."):]
                if name.startswith("visual."):
                    self.vision.load(name[len("visual."):], np.asarray(w),
                                     vbufs, target)
                    continue
                yield name, w

        params = super().load_weights(route(weights))
        params["vision"] = vbufs
        return params

    def param_specs(self) -> dict:
        specs = super().param_specs()
        specs["vision"] = self.vision.specs()
        return specs

    # --------------------------------------------------------------- vision
    mm_needs_extra = True

    def encode_images(self, params, pixel_values, grid_thw) -> jax.Array:
        """pixel_values [N_patches, in_dim]; grid_thw [N_img, 3] numpy.
        Jitted per static grid signature."""
        key = tuple(tuple(int(x) for x in g) for g in grid_thw)
        fn = self._encode_cache.get(key)
        if fn is None:
            fn = jax.jit(partial(self.vision.encode, grid_thw=key))
            self._encode_cache[key] = fn
        return fn(params["vision"], pixel_values)


class Qwen2_5_VLForConditionalGeneration(Qwen2VLForConditionalGeneration):
    """HF 'Qwen2_5_VLForConditionalGeneration' (reference qwen2_5_vl.py):
    RMSNorm/swiglu ViT with window attention (full attention only at
    fullatt_block_indexes)."""

    _v25 = True
