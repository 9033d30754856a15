"""Florence-2: DaViT vision tower + learned-2D/cosine-temporal position
embeds + linear projection, feeding image rows into the BART encoder at
pad-token positions.

Parity: aphrodite/modeling/models/florence2.py. Mechanisms:
- DaViT (florence2.py:149-560): staged ConvEmbed downsampling (optional
  pre/post LN), each stage alternating SpatialBlock (depthwise-conv
  residual, windowed MHA with pad-to-window, GELU MLP) and ChannelBlock
  (depthwise-conv residual, grouped channel-mixing attention where
  softmax runs over the CHANNEL axis with an N^-0.5 query scale);
- feature assembly (florence2.py:975-1023): learned 2D positions (column
  embeds first), cosine temporal embedding row 0 (single frame),
  feature sources gathered from {spatial_avg_pool, temporal_avg_pool,
  last_frame}, projected by ``image_projection`` and LayerNormed;
- the projected rows replace the SCALED token embeddings at pad-token
  positions of the BART encoder input (florence2.py:1040-1051), before
  positional embeds; the decoder starts from eos (florence2.py:928-933).
"""
from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.bart import BartForConditionalGeneration
from aphrodite_tpu.models.bert import layer_norm


def _cfg_get(cfg, key, default=None):
    if isinstance(cfg, dict):
        return cfg.get(key, default)
    return getattr(cfg, key, default)


def _conv2d(x, w, b, stride, padding, groups=1):
    """x [B, C, H, W], w [O, I/g, kh, kw] (torch layout)."""
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups)
    if b is not None:
        out = out + b.astype(jnp.float32)[None, :, None, None]
    return out


class DaViTTower:
    """DaViT over fixed-size square images [B, 3, H, W]."""

    def __init__(self, vc, dtype) -> None:
        self.dtype = dtype
        self.depths = list(_cfg_get(vc, "depths"))
        self.dims = list(_cfg_get(vc, "dim_embed"))
        self.heads = list(_cfg_get(vc, "num_heads"))
        self.groups = list(_cfg_get(vc, "num_groups"))
        self.patch_size = list(_cfg_get(vc, "patch_size"))
        self.patch_stride = list(_cfg_get(vc, "patch_stride"))
        self.patch_padding = list(_cfg_get(vc, "patch_padding"))
        self.patch_prenorm = list(_cfg_get(vc, "patch_prenorm"))
        self.window = _cfg_get(vc, "window_size", 7)
        self.mlp_ratio = _cfg_get(vc, "mlp_ratio", 4.0)
        self.stages = len(self.dims)

    def shapes(self) -> dict:
        shapes: dict = {}
        for i in range(self.stages):
            cin = 3 if i == 0 else self.dims[i - 1]
            D = self.dims[i]
            k = self.patch_size[i]
            ndim = cin if self.patch_prenorm[i] else D
            shapes[f"conv{i}_w"] = (D, cin, k, k)
            shapes[f"conv{i}_b"] = (D,)
            shapes[f"conv{i}_ln_w"] = (ndim,)
            shapes[f"conv{i}_ln_b"] = (ndim,)
            I = int(D * self.mlp_ratio)
            for j in range(self.depths[i]):
                for blk in ("sp", "ch"):
                    p = f"s{i}b{j}{blk}_"
                    shapes[p + "dw1_w"] = (D, 1, 3, 3)
                    shapes[p + "dw1_b"] = (D,)
                    shapes[p + "dw2_w"] = (D, 1, 3, 3)
                    shapes[p + "dw2_b"] = (D,)
                    shapes[p + "attn_ln_w"] = (D,)
                    shapes[p + "attn_ln_b"] = (D,)
                    shapes[p + "qkv_w"] = (D, 3 * D)
                    shapes[p + "qkv_b"] = (3 * D,)
                    shapes[p + "proj_w"] = (D, D)
                    shapes[p + "proj_b"] = (D,)
                    shapes[p + "ffn_ln_w"] = (D,)
                    shapes[p + "ffn_ln_b"] = (D,)
                    shapes[p + "fc1_w"] = (D, I)
                    shapes[p + "fc1_b"] = (I,)
                    shapes[p + "fc2_w"] = (I, D)
                    shapes[p + "fc2_b"] = (D,)
        return shapes

    def make_bufs(self, target) -> dict:
        return {k: np.zeros(s, target) for k, s in self.shapes().items()}

    def init_dummy(self, rng: jax.Array) -> dict:
        keys = iter(jax.random.split(rng, 256))
        out = {}
        for k, s in self.shapes().items():
            if k.endswith("ln_w"):
                out[k] = jnp.ones(s, self.dtype)
            elif k.endswith("_b"):
                out[k] = jnp.zeros(s, self.dtype)
            else:
                out[k] = (0.02 * jax.random.normal(next(keys), s,
                                                   jnp.float32)
                          ).astype(self.dtype)
        return out

    def load_hf(self, name: str, w: np.ndarray, bufs: dict, target) -> bool:
        """Consume a ``vision_tower.``-stripped tensor name."""
        parts = name.split(".")
        if parts[0] == "convs":
            i = parts[1]
            sub = ".".join(parts[2:])
            key = {"proj.weight": f"conv{i}_w", "proj.bias": f"conv{i}_b",
                   "norm.weight": f"conv{i}_ln_w",
                   "norm.bias": f"conv{i}_ln_b"}.get(sub)
            if key is None:
                return False
            bufs[key][...] = w.astype(target)
            return True
        if parts[0] != "blocks":
            return False
        i, j = parts[1], parts[2]
        blk = "sp" if parts[3] == "spatial_block" else "ch"
        sub = ".".join(parts[4:])
        attn = "window_attn" if blk == "sp" else "channel_attn"
        m = {
            "conv1.fn.dw.weight": ("dw1_w", False),
            "conv1.fn.dw.bias": ("dw1_b", False),
            "conv2.fn.dw.weight": ("dw2_w", False),
            "conv2.fn.dw.bias": ("dw2_b", False),
            f"{attn}.norm.weight": ("attn_ln_w", False),
            f"{attn}.norm.bias": ("attn_ln_b", False),
            f"{attn}.fn.qkv.weight": ("qkv_w", True),
            f"{attn}.fn.qkv.bias": ("qkv_b", False),
            f"{attn}.fn.proj.weight": ("proj_w", True),
            f"{attn}.fn.proj.bias": ("proj_b", False),
            "ffn.norm.weight": ("ffn_ln_w", False),
            "ffn.norm.bias": ("ffn_ln_b", False),
            "ffn.fn.net.fc1.weight": ("fc1_w", True),
            "ffn.fn.net.fc1.bias": ("fc1_b", False),
            "ffn.fn.net.fc2.weight": ("fc2_w", True),
            "ffn.fn.net.fc2.bias": ("fc2_b", False),
        }.get(sub)
        if m is None:
            return False
        key, tr = m
        bufs[f"s{i}b{j}{blk}_{key}"][...] = (w.T if tr else w).astype(target)
        return True

    def _dw(self, x, H, W, w, b):
        B, N, C = x.shape
        img = x.transpose(0, 2, 1).reshape(B, C, H, W)
        out = _conv2d(img, w, b, 1, 1, groups=C).astype(x.dtype)
        return out.reshape(B, C, N).transpose(0, 2, 1)

    def _window_attn(self, x, H, W, p, nh):
        B, N, C = x.shape
        ws = self.window
        hd = C // nh
        h = layer_norm(x, p["attn_ln_w"], p["attn_ln_b"], 1e-5)
        h = h.reshape(B, H, W, C)
        pad_b = (ws - H % ws) % ws
        pad_r = (ws - W % ws) % ws
        if pad_b or pad_r:
            h = jnp.pad(h, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r
        h = h.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
        h = jnp.transpose(h, (0, 1, 3, 2, 4, 5)).reshape(-1, ws * ws, C)
        qkv = jnp.dot(h, p["qkv_w"]) + p["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        Bw, Nw = q.shape[:2]
        q = q.reshape(Bw, Nw, nh, hd)
        k = k.reshape(Bw, Nw, nh, hd)
        v = v.reshape(Bw, Nw, nh, hd)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * (hd ** -0.5)
        a = jax.nn.softmax(s, -1).astype(x.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, v,
                       preferred_element_type=jnp.float32
                       ).astype(x.dtype).reshape(Bw, Nw, C)
        o = jnp.dot(o, p["proj_w"]) + p["proj_b"]
        o = o.reshape(B, Hp // ws, Wp // ws, ws, ws, C)
        o = jnp.transpose(o, (0, 1, 3, 2, 4, 5)).reshape(B, Hp, Wp, C)
        return o[:, :H, :W].reshape(B, N, C)

    def _channel_attn(self, x, p, g):
        B, N, C = x.shape
        cg = C // g
        h = layer_norm(x, p["attn_ln_w"], p["attn_ln_b"], 1e-5)
        qkv = jnp.dot(h, p["qkv_w"]) + p["qkv_b"]
        qkv = qkv.reshape(B, N, 3, g, cg)
        q, k, v = (qkv[:, :, m].transpose(0, 2, 1, 3) for m in range(3))
        q = q * (float(N) ** -0.5)
        # Channel-mixing attention: softmax over channel pairs
        # (florence2.py:262-285).
        att = jnp.einsum("bgnc,bgnd->bgcd", q, k,
                         preferred_element_type=jnp.float32)
        att = jax.nn.softmax(att, -1).astype(x.dtype)
        o = jnp.einsum("bgcd,bgnd->bgnc", att, v)
        return jnp.dot(o.transpose(0, 2, 1, 3).reshape(B, N, C),
                       p["proj_w"]) + p["proj_b"]

    def _ffn(self, x, p):
        h = layer_norm(x, p["ffn_ln_w"], p["ffn_ln_b"], 1e-5)
        h = jax.nn.gelu(jnp.dot(h, p["fc1_w"]) + p["fc1_b"],
                        approximate=False)
        return jnp.dot(h, p["fc2_w"]) + p["fc2_b"]

    def encode(self, vp: dict, pixels: jax.Array) -> tuple[jax.Array, int]:
        """[B, 3, H, W] -> ([B, h*w, dims[-1]], final grid side)."""
        x = pixels
        H, W = int(x.shape[2]), int(x.shape[3])
        tokens = None
        for i in range(self.stages):
            if i > 0:
                C = self.dims[i - 1]
                x = tokens.transpose(0, 2, 1).reshape(-1, C, H, W)
                if self.patch_prenorm[i]:
                    t = layer_norm(tokens, vp[f"conv{i}_ln_w"],
                                   vp[f"conv{i}_ln_b"], 1e-5)
                    x = t.transpose(0, 2, 1).reshape(-1, C, H, W)
            x = _conv2d(x, vp[f"conv{i}_w"], vp[f"conv{i}_b"],
                        self.patch_stride[i], self.patch_padding[i]
                        ).astype(self.dtype)
            H, W = int(x.shape[2]), int(x.shape[3])
            tokens = x.reshape(x.shape[0], self.dims[i], H * W
                               ).transpose(0, 2, 1)
            if not self.patch_prenorm[i]:
                tokens = layer_norm(tokens, vp[f"conv{i}_ln_w"],
                                    vp[f"conv{i}_ln_b"], 1e-5)
            for j in range(self.depths[i]):
                for blk in ("sp", "ch"):
                    p = {k[len(f"s{i}b{j}{blk}_"):]: v
                         for k, v in vp.items()
                         if k.startswith(f"s{i}b{j}{blk}_")}
                    tokens = tokens + self._dw(tokens, H, W, p["dw1_w"],
                                               p["dw1_b"])
                    if blk == "sp":
                        tokens = tokens + self._window_attn(
                            tokens, H, W, p, self.heads[i])
                    else:
                        tokens = tokens + self._channel_attn(
                            tokens, p, self.groups[i])
                    tokens = tokens + self._dw(tokens, H, W, p["dw2_w"],
                                               p["dw2_b"])
                    tokens = tokens + self._ffn(tokens, p)
        return tokens, H


class Florence2ForConditionalGeneration(BartForConditionalGeneration):
    """Reference florence2.py:872 — DaViT + position/temporal embeds +
    projection, image rows merged into the BART encoder at pad tokens."""

    def __init__(self, config):
        hf = config.hf_config
        super().__init__(config)
        vc = hf.vision_config
        self.vision = DaViTTower(vc, self.dtype)
        self.vis_dim = self.vision.dims[-1]
        self.proj_dim = _cfg_get(vc, "projection_dim", self.d_model)
        self.pos_max = _cfg_get(vc, "image_pos_embed",
                                {"max_pos_embeddings": 50})
        self.pos_max = _cfg_get(self.pos_max, "max_pos_embeddings", 50)
        tmax = _cfg_get(vc, "visual_temporal_embedding",
                        {"max_temporal_embeddings": 100})
        self.temporal_max = _cfg_get(tmax, "max_temporal_embeddings", 100)
        self.feature_source = list(_cfg_get(
            vc, "image_feature_source",
            ["spatial_avg_pool", "temporal_avg_pool"]))
        self.pad_token_id = getattr(hf, "pad_token_id", 1)
        self._vis_cache: dict = {}

    def _proj_shapes(self) -> dict:
        D = self.vis_dim
        return {
            "image_projection": (D, self.proj_dim),
            "proj_ln_w": (self.proj_dim,), "proj_ln_b": (self.proj_dim,),
            "pos_row": (self.pos_max, D // 2),
            "pos_col": (self.pos_max, D - D // 2),
            "temporal": (self.temporal_max, D),
        }

    def init_dummy_params(self, rng):
        params = super().init_dummy_params(rng)
        params["vision"] = self.vision.init_dummy(jax.random.fold_in(rng, 41))
        keys = iter(jax.random.split(jax.random.fold_in(rng, 42), 8))
        proj = {}
        for k, s in self._proj_shapes().items():
            if k == "proj_ln_w":
                proj[k] = jnp.ones(s, self.dtype)
            elif k == "proj_ln_b":
                proj[k] = jnp.zeros(s, self.dtype)
            else:
                proj[k] = (0.02 * jax.random.normal(next(keys), s,
                                                    jnp.float32)
                           ).astype(self.dtype)
        params["vis_proj"] = proj
        return params

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        vis = self.vision.make_bufs(target)
        proj = {k: np.zeros(s, target)
                for k, s in self._proj_shapes().items()}
        pmap = {"image_projection": ("image_projection", False),
                "image_proj_norm.weight": ("proj_ln_w", False),
                "image_proj_norm.bias": ("proj_ln_b", False),
                "image_pos_embed.row_embeddings.weight": ("pos_row", False),
                "image_pos_embed.column_embeddings.weight":
                    ("pos_col", False),
                "visual_temporal_embed.pos_idx_to_embed":
                    ("temporal", False)}

        def route(ws):
            for name, w in ws:
                w = np.asarray(w)
                if name.startswith("vision_tower."):
                    self.vision.load_hf(name[len("vision_tower."):], w, vis,
                                        target)
                elif name in pmap:
                    proj[pmap[name][0]][...] = w.astype(target)
                elif name.startswith("language_model."):
                    yield name[len("language_model."):], w
                else:
                    yield name, w

        params = super().load_weights(route(weights))
        params["vision"] = vis
        params["vis_proj"] = proj
        return params

    def param_specs(self):
        specs = super().param_specs()
        specs["vision"] = {k: P() for k in self.vision.shapes()}
        specs["vis_proj"] = {k: P() for k in self._proj_shapes()}
        return specs

    # --------------------------------------------------------------- encoder
    def _image_rows(self, params, pixels):
        feats, side = self.vision.encode(params["vision"], pixels)  # [1,N,D]
        pp = params["vis_proj"]
        # Learned 2D positions: column embeds first (florence2.py:56-79).
        col = pp["pos_col"][:side]
        row = pp["pos_row"][:side]
        pos = jnp.concatenate([
            jnp.broadcast_to(col[None], (side, side, col.shape[-1])),
            jnp.broadcast_to(row[:, None], (side, side, row.shape[-1]))],
            axis=-1).reshape(1, side * side, -1)
        x = feats + pos.astype(feats.dtype)
        x = x + pp["temporal"][0].astype(x.dtype)  # single frame (T=1)
        sources = {"spatial_avg_pool": jnp.mean(x, 1, keepdims=True),
                   "temporal_avg_pool": x, "last_frame": x}
        x = jnp.concatenate([sources[s] for s in self.feature_source],
                            axis=1)
        x = jnp.dot(x, pp["image_projection"],
                    preferred_element_type=jnp.float32).astype(x.dtype)
        return layer_norm(x, pp["proj_ln_w"], pp["proj_ln_b"], 1e-5)[0]

    def encode_media(self, params, pixel_values, images=None):
        """pixel_values: encoder prompt ids [1, S]; ``images`` (extra):
        [1, 3, H, W] pixels whose projected rows replace the scaled token
        embeds at pad positions."""
        ids_np = np.asarray(pixel_values).reshape(-1)
        if images is None:
            return super().encode_media(params, pixel_values)
        img_pos = tuple(np.nonzero(ids_np == self.pad_token_id)[0].tolist())
        S = int(ids_np.shape[0])
        S_pad = max(8, 1 << (S - 1).bit_length())
        ids = jnp.pad(jnp.asarray(ids_np, jnp.int32), (0, S_pad - S))
        key = (S_pad, img_pos, tuple(np.shape(images)))
        fn = self._vis_cache.get(key)
        if fn is None:
            def run(params, ids, n_valid, pixels):
                rows = self._image_rows(params, pixels)
                emb = jnp.take(params["embed"], ids, axis=0) \
                    * self.embed_scale
                emb = emb.at[jnp.asarray(img_pos)].set(
                    rows.astype(emb.dtype))
                return self._encode(params, ids, n_valid,
                                    inputs_embeds=emb)
            fn = jax.jit(run)
            self._vis_cache[key] = fn
        return fn(params, ids, jnp.asarray(S, jnp.int32),
                  jnp.asarray(images, self.dtype))[:S]
