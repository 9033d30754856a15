"""Kimi-VL: MoonViT tower + patch-merge MLP projector over the
DeepSeek-V2 (MLA + MoE) decoder.

Parity: aphrodite/modeling/models/kimi_vl.py + moonvit.py. Mechanisms:
- packed variable-resolution ViT: per-image full attention (block-diagonal
  over the flat patch axis), patch rows arrive pre-patchified
  ``[N, 3, ps, ps]`` (moonvit.py:218-259);
- learnable 2D position embedding, bicubically interpolated per image grid
  (moonvit.py:184-214) — expressed as a host-precomputed separable
  interpolation matrix so the resize is two small matmuls on device;
- 2D rope on interleaved pairs: pair 2i carries the column angle, pair
  2i+1 the row angle, freq ``theta^(-4i/dim)`` (moonvit.py:262-329);
- MLP2 blocks with tanh-approximated GELU (moonvit.py:371-394);
- patch merger groups kernel_h*kernel_w patches per merged token
  (moonvit.py:523-549); the projector LayerNorms per patch then flattens
  the group through a 2-layer exact-GELU MLP (kimi_vl.py:94-120);
- decoder weights live under ``language_model.`` in the checkpoint;
  trailing MTP layers (num_nextn_predict_layers) are skipped
  (kimi_vl.py:569-578).
"""
from __future__ import annotations

from functools import partial
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.deepseek import DeepseekV2ForCausalLM


def _ln(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def _bicubic_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] row-stochastic torch-exact bicubic resize weights
    (F.interpolate mode='bicubic', align_corners=False, A=-0.75,
    border-clamped taps)."""
    A = -0.75
    W = np.zeros((n_out, n_in), np.float64)
    scale = n_in / n_out
    for i in range(n_out):
        src = (i + 0.5) * scale - 0.5
        f = int(np.floor(src))
        t = src - f
        ws = [
            ((A * (t + 1) - 5 * A) * (t + 1) + 8 * A) * (t + 1) - 4 * A,
            ((A + 2) * t - (A + 3)) * t * t + 1,
            ((A + 2) * (1 - t) - (A + 3)) * (1 - t) ** 2 + 1,
            ((A * (2 - t) - 5 * A) * (2 - t) + 8 * A) * (2 - t) - 4 * A,
        ]
        for k, wk in enumerate(ws):
            W[i, min(max(f - 1 + k, 0), n_in - 1)] += wk
    return W


class MoonViTTower:
    """MoonViT over packed patches [N, 3, ps, ps] with static per-call
    image grids (reference moonvit.py:MoonVitPretrainedModel)."""

    def __init__(self, vc, dtype) -> None:
        self.dtype = dtype
        self.hidden = vc.hidden_size
        self.depth = vc.num_hidden_layers
        self.heads = vc.num_attention_heads
        self.head_dim = self.hidden // self.heads
        self.inter = vc.intermediate_size
        self.patch = getattr(vc, "patch_size", 14)
        self.pe_h = getattr(vc, "init_pos_emb_height", 64)
        self.pe_w = getattr(vc, "init_pos_emb_width", 64)
        self.merge = tuple(getattr(vc, "merge_kernel_size", (2, 2)))
        self.scale = self.head_dim ** -0.5

    def shapes(self) -> dict:
        D, I, L = self.hidden, self.inter, self.depth
        return {
            "patch_w": (3 * self.patch * self.patch, D), "patch_b": (D,),
            "pos_emb": (self.pe_h, self.pe_w, D),
            "final_w": (D,), "final_b": (D,),
            "layers": {
                "n0_w": (L, D), "n0_b": (L, D),
                "wqkv": (L, D, 3 * D), "bqkv": (L, 3 * D),
                "wo": (L, D, D), "bo": (L, D),
                "n1_w": (L, D), "n1_b": (L, D),
                "fc0_w": (L, D, I), "fc0_b": (L, I),
                "fc1_w": (L, I, D), "fc1_b": (L, D),
            },
        }

    def make_bufs(self, target) -> dict:
        def mk(shapes):
            return {k: mk(v) if isinstance(v, dict) else np.zeros(v, target)
                    for k, v in shapes.items()}
        return mk(self.shapes())

    def init_dummy(self, rng: jax.Array) -> dict:
        keys = iter(jax.random.split(rng, 32))

        def fill(shapes):
            out = {}
            for k, s in shapes.items():
                if isinstance(s, dict):
                    out[k] = fill(s)
                elif k.startswith("n") and k.endswith("_w") or \
                        k == "final_w":
                    out[k] = jnp.ones(s, self.dtype)
                elif k.endswith("_b") or k.startswith("b"):
                    out[k] = jnp.zeros(s, self.dtype)
                else:
                    out[k] = (0.02 * jax.random.normal(
                        next(keys), s, jnp.float32)).astype(self.dtype)
            return out
        return fill(self.shapes())

    def load_hf(self, name: str, w: np.ndarray, bufs: dict, target) -> bool:
        """Consume a ``vision_tower.``-stripped tensor name."""
        top = {"patch_embed.proj.weight": "patch_w",
               "patch_embed.proj.bias": "patch_b",
               "patch_embed.pos_emb.weight": "pos_emb",
               "encoder.final_layernorm.weight": "final_w",
               "encoder.final_layernorm.bias": "final_b"}
        key = top.get(name)
        if key is not None:
            if name == "patch_embed.proj.weight":
                w = w.reshape(self.hidden, -1).T  # Conv2d -> linear
            bufs[key][...] = w.astype(target)
            return True
        if not name.startswith("encoder.blocks."):
            return False
        _, _, li, rest = name.split(".", 3)
        li = int(li)
        m = {"norm0.weight": ("n0_w", False), "norm0.bias": ("n0_b", False),
             "norm1.weight": ("n1_w", False), "norm1.bias": ("n1_b", False),
             "wqkv.weight": ("wqkv", True), "wqkv.bias": ("bqkv", False),
             "wo.weight": ("wo", True), "wo.bias": ("bo", False),
             "mlp.fc0.weight": ("fc0_w", True),
             "mlp.fc0.bias": ("fc0_b", False),
             "mlp.fc1.weight": ("fc1_w", True),
             "mlp.fc1.bias": ("fc1_b", False)}.get(rest)
        if m is None:
            return False
        key, tr = m
        bufs["layers"][key][li] = (w.T if tr else w).astype(target)
        return True

    # ------------------------------------------------------------- tables
    def _tables(self, grid_hws):
        """Host tables for a static grid list: per-image bicubic matrices,
        rope angle table [N, hd/2] (col angle at even pairs, row at odd),
        and the block-diagonal same-image mask [N, N]."""
        quarter = self.head_dim // 4
        inv = 10000.0 ** -(np.arange(quarter, dtype=np.float64) * 4
                           / self.head_dim)
        ang_rows, img_ids, interps = [], [], []
        for n, (h, w) in enumerate(grid_hws):
            h, w = int(h), int(w)
            y = np.repeat(np.arange(h), w).astype(np.float64)
            x = np.tile(np.arange(w), h).astype(np.float64)
            ang = np.empty((h * w, 2 * quarter), np.float64)
            ang[:, 0::2] = x[:, None] * inv[None]
            ang[:, 1::2] = y[:, None] * inv[None]
            ang_rows.append(ang)
            img_ids.append(np.full((h * w,), n, np.int32))
            if (h, w) == (self.pe_h, self.pe_w):
                interps.append(None)
            else:
                interps.append((
                    _bicubic_matrix(self.pe_h, h).astype(np.float32),
                    _bicubic_matrix(self.pe_w, w).astype(np.float32)))
        ang = np.concatenate(ang_rows)
        ids = np.concatenate(img_ids)
        return (np.cos(ang).astype(np.float32),
                np.sin(ang).astype(np.float32),
                ids[:, None] == ids[None, :], interps)

    # ------------------------------------------------------------ forward
    def encode(self, vp: dict, pixels: jax.Array, grid_hws) -> jax.Array:
        """pixels [N, 3, ps, ps] packed patches -> [M, kh*kw, hidden]
        merged groups in image order (patch_merger output)."""
        cos_np, sin_np, mask_np, interps = self._tables(grid_hws)
        N = pixels.shape[0]
        x = jnp.dot(pixels.reshape(N, -1).astype(self.dtype),
                    vp["patch_w"]) + vp["patch_b"]
        # Learnable 2D position embedding, per-image interpolation.
        pos_rows, off = [], 0
        pe = vp["pos_emb"].astype(jnp.float32)
        for itp, (h, w) in zip(interps, grid_hws):
            h, w = int(h), int(w)
            if itp is None:
                pos_rows.append(pe.reshape(-1, self.hidden))
            else:
                wh, ww = itp
                pos_rows.append(jnp.einsum(
                    "hH,wW,HWd->hwd", jnp.asarray(wh), jnp.asarray(ww),
                    pe).reshape(-1, self.hidden))
            off += h * w
        x = x + jnp.concatenate(pos_rows).astype(x.dtype)

        cos = jnp.asarray(cos_np)[:, None, :]  # [N, 1, hd/2]
        sin = jnp.asarray(sin_np)[:, None, :]
        mask = jnp.asarray(mask_np)

        def rope(t):  # [N, heads, hd], interleaved-pair rotation
            tf = t.astype(jnp.float32)
            t0, t1 = tf[..., 0::2], tf[..., 1::2]
            out = jnp.stack([t0 * cos - t1 * sin, t1 * cos + t0 * sin],
                            axis=-1)
            return out.reshape(t.shape).astype(t.dtype)

        nh, hd = self.heads, self.head_dim
        lp_all = vp["layers"]
        for i in range(self.depth):
            lp = {k: v[i] for k, v in lp_all.items()}
            h = _ln(x, lp["n0_w"], lp["n0_b"])
            qkv = jnp.dot(h, lp["wqkv"]) + lp["bqkv"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = rope(q.reshape(N, nh, hd))
            k = rope(k.reshape(N, nh, hd))
            v = v.reshape(N, nh, hd)
            s = jnp.einsum("qhd,khd->hqk", q, k,
                           preferred_element_type=jnp.float32) * self.scale
            s = jnp.where(mask[None], s, -jnp.inf)
            a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
            o = jnp.einsum("hqk,khd->qhd", a, v,
                           preferred_element_type=jnp.float32
                           ).astype(x.dtype).reshape(N, nh * hd)
            x = x + jnp.dot(o, lp["wo"]) + lp["bo"]
            h = _ln(x, lp["n1_w"], lp["n1_b"])
            y = jax.nn.gelu(jnp.dot(h, lp["fc0_w"]) + lp["fc0_b"],
                            approximate=True)
            x = x + jnp.dot(y, lp["fc1_w"]) + lp["fc1_b"]
        x = _ln(x, vp["final_w"], vp["final_b"])
        # patch_merger: per image (h, w, D) -> (h/kh * w/kw, kh*kw, D)
        kh, kw = self.merge
        groups, off = [], 0
        for h, w in grid_hws:
            h, w = int(h), int(w)
            seq = x[off:off + h * w].reshape(h // kh, kh, w // kw, kw, -1)
            groups.append(jnp.transpose(seq, (0, 2, 1, 3, 4)).reshape(
                -1, kh * kw, self.hidden))
            off += h * w
        return groups[0] if len(groups) == 1 else jnp.concatenate(groups)


class KimiVLForConditionalGeneration(DeepseekV2ForCausalLM):
    """Reference kimi_vl.py:266 — DeepseekV2 decoder + MoonViT tower +
    patch-group MLP projector, placeholder media_placeholder_token_id."""

    is_multimodal = True
    mm_needs_extra = True

    def __init__(self, config):
        super().__init__(config)
        hf = config.hf_config
        self.vision = MoonViTTower(hf.vision_config, self.dtype)
        self.image_token_id = getattr(hf, "media_placeholder_token_id", None)
        self._enc_cache: dict = {}

    def _proj_shapes(self) -> dict:
        Dv = self.vision.hidden
        M = Dv * self.vision.merge[0] * self.vision.merge[1]
        return {"pre_w": (Dv,), "pre_b": (Dv,),
                "l1_w": (M, M), "l1_b": (M,),
                "l2_w": (M, self.hidden_size), "l2_b": (self.hidden_size,)}

    def init_dummy_params(self, rng):
        params = super().init_dummy_params(rng)
        params["vision"] = self.vision.init_dummy(jax.random.fold_in(rng, 41))
        keys = iter(jax.random.split(jax.random.fold_in(rng, 42), 8))
        proj = {}
        for k, s in self._proj_shapes().items():
            if k == "pre_w":
                proj[k] = jnp.ones(s, self.dtype)
            elif k.endswith("_b"):
                proj[k] = jnp.zeros(s, self.dtype)
            else:
                proj[k] = (0.02 * jax.random.normal(next(keys), s,
                                                    jnp.float32)
                           ).astype(self.dtype)
        params["projector"] = proj
        return params

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        vision_bufs = self.vision.make_bufs(target)
        proj = {k: np.zeros(s, target)
                for k, s in self._proj_shapes().items()}
        pmap = {"pre_norm.weight": "pre_w", "pre_norm.bias": "pre_b",
                "linear_1.weight": "l1_w", "linear_1.bias": "l1_b",
                "linear_2.weight": "l2_w", "linear_2.bias": "l2_b"}
        L = self.num_layers

        def route(ws):
            for name, w in ws:
                w = np.asarray(w)
                if name.startswith("vision_tower."):
                    self.vision.load_hf(name[len("vision_tower."):], w,
                                        vision_bufs, target)
                elif name.startswith("multi_modal_projector."):
                    key = pmap.get(name[len("multi_modal_projector."):])
                    if key is not None:
                        proj[key][...] = (w.T if key.endswith("_w")
                                          and w.ndim == 2 else w
                                          ).astype(target)
                elif name.startswith("language_model."):
                    rest = name[len("language_model."):]
                    if rest.startswith("model.layers."):
                        # Skip MTP draft layers (kimi_vl.py:569-578);
                        # they load via spec_decode/mtp.py instead.
                        li = int(rest.split(".")[2])
                        if li >= L:
                            continue
                    yield rest, w
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

    # ---------------------------------------------------------------- encode
    def _encode(self, params, pv, grid_hws):
        feats = self.vision.encode(params["vision"], pv, grid_hws)
        pp = params["projector"]
        x = _ln(feats, pp["pre_w"].astype(jnp.float32),
                pp["pre_b"].astype(jnp.float32))
        x = x.reshape(feats.shape[0], -1)
        x = jnp.dot(x, pp["l1_w"], preferred_element_type=jnp.float32
                    ).astype(x.dtype) + pp["l1_b"]
        x = jax.nn.gelu(x, approximate=False)
        x = jnp.dot(x, pp["l2_w"], preferred_element_type=jnp.float32
                    ).astype(x.dtype) + pp["l2_b"]
        return x  # [M_tokens, hidden]

    def encode_images(self, params, pixel_values, image_grid_hws):
        """pixel_values [N, 3, ps, ps]; image_grid_hws [N_img, 2] numpy."""
        key = tuple((int(h), int(w)) for h, w in image_grid_hws)
        fn = self._enc_cache.get(key)
        if fn is None:
            fn = jax.jit(partial(self._encode, grid_hws=key))
            self._enc_cache[key] = fn
        return fn(params, pixel_values)
