"""DeepSeek-VL2: timm-SigLIP tower + downsample-MLP projector over the
DeepSeek-V2 (MLA) decoder.

Parity: aphrodite/modeling/models/deepseek_vl2.py. Images arrive as one
global tile + a grid of local tiles; tile features are 2x2 space-to-depth
downsampled through a GELU MLP, then assembled as
``[global rows + newline each, view_seperator, local grid rows + newline
each]`` (tile_tag='2D', global_view_pos='head') with the learned
``image_newline`` / ``view_seperator`` embeddings.
"""
from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.deepseek import DeepseekV2ForCausalLM


def _ln(x, w, b, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


class TimmViTTower:
    """timm VisionTransformer (SigLIP so400m layout): fused-qkv pre-norm
    blocks, learnable positions, no class token, final norm
    (forward_features semantics)."""

    def __init__(self, vc, dtype) -> None:
        self.dtype = dtype
        self.hidden = vc.width
        self.layers = vc.layers
        self.heads = vc.heads
        self.head_dim = self.hidden // self.heads
        self.intermediate = int(vc.width * vc.mlp_ratio)
        self.patch = vc.patch_size
        self.image_size = vc.image_size
        self.grid = vc.image_size // vc.patch_size

    def shapes(self) -> dict:
        D, I, L = self.hidden, self.intermediate, self.layers
        P_ = self.grid * self.grid
        return {
            "patch_w": (3 * self.patch * self.patch, D),
            "patch_b": (D,),
            "pos": (P_, D),
            "norm_w": (D,), "norm_b": (D,),
            "layers": {
                "ln1_w": (L, D), "ln1_b": (L, D),
                "wqkv": (L, D, 3 * D), "bqkv": (L, 3 * D),
                "wo": (L, D, D), "bo": (L, D),
                "ln2_w": (L, D), "ln2_b": (L, D),
                "fc1_w": (L, D, I), "fc1_b": (L, I),
                "fc2_w": (L, I, D), "fc2_b": (L, D),
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
                elif ("ln" in k or k == "norm_w") and k.endswith("_w"):
                    out[k] = jnp.ones(s, self.dtype)
                elif k.endswith("_b") or k.startswith("b"):
                    out[k] = jnp.zeros(s, self.dtype)
                else:
                    out[k] = (0.02 * jax.random.normal(
                        next(keys), s, jnp.float32)).astype(self.dtype)
            return out
        return fill(self.shapes())

    def load_hf(self, name: str, w: np.ndarray, bufs: dict, target) -> bool:
        if name == "patch_embed.proj.weight":
            bufs["patch_w"][...] = w.reshape(w.shape[0], -1).T.astype(target)
        elif name == "patch_embed.proj.bias":
            bufs["patch_b"][...] = w.astype(target)
        elif name == "pos_embed":
            bufs["pos"][...] = w.reshape(-1, w.shape[-1]).astype(target)
        elif name == "norm.weight":
            bufs["norm_w"][...] = w.astype(target)
        elif name == "norm.bias":
            bufs["norm_b"][...] = w.astype(target)
        elif name.startswith("blocks."):
            idx_s, sub = name[len("blocks."):].split(".", 1)
            li = int(idx_s)
            m = {
                "norm1.weight": ("ln1_w", False),
                "norm1.bias": ("ln1_b", False),
                "attn.qkv.weight": ("wqkv", True),
                "attn.qkv.bias": ("bqkv", False),
                "attn.proj.weight": ("wo", True),
                "attn.proj.bias": ("bo", False),
                "norm2.weight": ("ln2_w", False),
                "norm2.bias": ("ln2_b", False),
                "mlp.fc1.weight": ("fc1_w", True),
                "mlp.fc1.bias": ("fc1_b", False),
                "mlp.fc2.weight": ("fc2_w", True),
                "mlp.fc2.bias": ("fc2_b", False),
            }.get(sub)
            if m is None:
                return False
            key, tr = m
            bufs["layers"][key][li] = (w.T if tr else w).astype(target)
        else:
            return False
        return True

    def encode(self, vp: dict, pixel_values: jax.Array) -> jax.Array:
        """[N,3,S,S] -> post-norm features [N, P, D]."""
        N, ps, g, D = pixel_values.shape[0], self.patch, self.grid, \
            self.hidden
        x = pixel_values.astype(self.dtype)
        x = x.reshape(N, 3, g, ps, g, ps).transpose(0, 2, 4, 1, 3, 5)
        x = x.reshape(N, g * g, 3 * ps * ps)
        x = jnp.einsum("npc,cd->npd", x, vp["patch_w"],
                       preferred_element_type=jnp.float32
                       ).astype(self.dtype) + vp["patch_b"]
        x = x + vp["pos"][None].astype(x.dtype)
        nh, hd, T = self.heads, self.head_dim, g * g

        def layer(x, lp):
            h = _ln(x, lp["ln1_w"], lp["ln1_b"])
            qkv = jnp.dot(h, lp["wqkv"]) + lp["bqkv"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(N, T, nh, hd)
            k = k.reshape(N, T, nh, hd)
            v = v.reshape(N, T, nh, hd)
            logits = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                                preferred_element_type=jnp.float32)
            p = jax.nn.softmax(logits * (hd ** -0.5), -1).astype(x.dtype)
            o = jnp.einsum("nhqk,nkhd->nqhd", p, v).reshape(N, T, D)
            x = x + jnp.dot(o, lp["wo"]) + lp["bo"]
            h = _ln(x, lp["ln2_w"], lp["ln2_b"])
            h = jax.nn.gelu(jnp.dot(h, lp["fc1_w"]) + lp["fc1_b"],
                            approximate=True)
            x = x + jnp.dot(h, lp["fc2_w"]) + lp["fc2_b"]
            return x, None

        x, _ = jax.lax.scan(layer, x, vp["layers"])
        return _ln(x, vp["norm_w"], vp["norm_b"])


class DeepseekVLV2ForCausalLM(DeepseekV2ForCausalLM):

    is_multimodal = True
    mm_needs_extra = True

    def __init__(self, config):
        super().__init__(config)
        hf = config.hf_config
        self.vision = TimmViTTower(hf.vision_config, self.dtype)
        pc = hf.projector_config
        self.proj_ratio = int(getattr(pc, "downsample_ratio", 2))
        self.proj_depth = int(getattr(pc, "depth", 2))
        self.proj_mlp_ratio = int(getattr(pc, "mlp_ratio", 1))
        self.proj_in = int(getattr(pc, "input_dim", self.vision.hidden))
        self.n_embed = int(getattr(pc, "n_embed", self.hidden_size))
        self.image_token_id = getattr(hf, "image_token_id", None)
        self._enc_cache: dict = {}

    def _proj_shapes(self) -> dict:
        r, d = self.proj_ratio, self.proj_depth
        din = self.proj_in * r * r
        mid = self.n_embed * self.proj_mlp_ratio
        shapes = {"w0": (din, mid), "b0": (mid,)}
        for i in range(1, d):
            dout = self.n_embed if i == d - 1 else mid
            shapes[f"w{i}"] = (mid, dout)
            shapes[f"b{i}"] = (dout,)
        shapes["image_newline"] = (self.n_embed,)
        shapes["view_seperator"] = (self.n_embed,)
        return shapes

    def init_dummy_params(self, rng):
        params = super().init_dummy_params(rng)
        params["vision"] = self.vision.init_dummy(
            jax.random.fold_in(rng, 41))
        keys = iter(jax.random.split(jax.random.fold_in(rng, 42), 16))
        proj = {}
        for k, s in self._proj_shapes().items():
            proj[k] = jnp.zeros(s, self.dtype) if k.startswith("b") else \
                (0.02 * jax.random.normal(next(keys), s, jnp.float32)
                 ).astype(self.dtype)
        params["projector"] = proj
        return params

    def load_weights(self, weights):
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        vision_bufs = self.vision.make_bufs(target)
        proj = {k: np.zeros(s, target)
                for k, s in self._proj_shapes().items()}

        def route(ws):
            for name, w in ws:
                w = np.asarray(w)
                if name.startswith("vision."):
                    self.vision.load_hf(name[len("vision."):], w,
                                        vision_bufs, target)
                elif name.startswith("projector.layers."):
                    parts = name.split(".")
                    idx = int(parts[2]) // 2  # Sequential: linear,gelu,...
                    key = ("w" if parts[-1] == "weight" else "b") + str(idx)
                    if key in proj:
                        proj[key][...] = (w.T if parts[-1] == "weight"
                                          else w).astype(target)
                elif name in ("image_newline", "view_seperator"):
                    proj[name][...] = w.reshape(-1).astype(target)
                elif name.startswith("language."):
                    yield name[len("language."):], w
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

    # ----------------------------------------------------------------- encode
    def _tile_fn(self, n_pad: int):
        fn = self._enc_cache.get(n_pad)
        if fn is not None:
            return fn
        r = self.proj_ratio
        g = self.vision.grid

        def enc(params, pv):
            feats = self.vision.encode(params["vision"], pv)  # [N, P, Dv]
            N, _, Dv = feats.shape
            # downsample_mlp_gelu: 2D space-to-depth (channel-major blocks)
            x = feats.reshape(N, g, g, Dv)
            go = -(-g // r)
            if go * r != g:
                x = jnp.pad(x, ((0, 0), (0, go * r - g), (0, go * r - g),
                                (0, 0)))
            x = x.reshape(N, go, r, go, r, Dv)
            x = jnp.transpose(x, (0, 1, 3, 5, 2, 4)).reshape(
                N, go * go, Dv * r * r)
            pp = params["projector"]
            for i in range(self.proj_depth):
                x = jnp.dot(x, pp[f"w{i}"],
                            preferred_element_type=jnp.float32
                            ).astype(x.dtype) + pp[f"b{i}"]
                if i != self.proj_depth - 1:
                    x = jax.nn.gelu(x, approximate=False)
            return x  # [N, go*go, n_embed]

        fn = jax.jit(enc)
        self._enc_cache[n_pad] = fn
        return fn

    def encode_images(self, params, pixel_values, crops=None, **_):
        """pixel_values: flat [sum(1 + tw*th), 3, S, S] per image (global
        tile first); crops: per-image (width_tiles, height_tiles)."""
        N = int(pixel_values.shape[0])
        n_pad = max(1, 1 << (N - 1).bit_length())
        pv = pixel_values
        if n_pad != N:
            pv = jnp.concatenate(
                [pv, jnp.zeros((n_pad - N,) + pv.shape[1:], pv.dtype)])
        embeds = self._tile_fn(n_pad)(params, pv)[:N]  # [N, hw, D]
        hw, D = embeds.shape[1], embeds.shape[2]
        h = w = int(round(hw ** 0.5))
        pp = params["projector"]
        nl = pp["image_newline"].astype(embeds.dtype)
        sep = pp["view_seperator"].astype(embeds.dtype)
        pieces, idx = [], 0
        for tw, th in crops:
            tw, th = int(tw), int(th)
            n_tiles = tw * th
            glob = embeds[idx].reshape(h, w, D)
            glob = jnp.concatenate(
                [glob, jnp.broadcast_to(nl, (h, 1, D))], axis=1
            ).reshape(-1, D)
            loc = embeds[idx + 1: idx + 1 + n_tiles]
            loc = loc.reshape(th, tw, h, w, D)
            loc = jnp.transpose(loc, (0, 2, 1, 3, 4)).reshape(
                th * h, tw * w, D)
            loc = jnp.concatenate(
                [loc, jnp.broadcast_to(nl, (th * h, 1, D))], axis=1
            ).reshape(-1, D)
            pieces.append(jnp.concatenate([glob, sep[None], loc], axis=0))
            idx += 1 + n_tiles
        out = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces)
        return out.reshape(-1, self.hidden_size)
