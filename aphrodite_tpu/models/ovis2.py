"""Ovis2: AIMv2 backbone + probabilistic visual tokenizer + visual token
embedding (VTE) over the Qwen2 decoder.

Parity: aphrodite/modeling/models/ovis2.py + aimv2.py. Mechanisms:
- AIMv2 ViT: conv patch embed + RMSNorm, learnable positions, pre-RMSNorm
  blocks with un-gated bidirectional attention and a SwiGLU FFN, and NO
  trailing trunk norm (aimv2.py:292-296 keeps post_trunk_norm unused);
- visual tokenizer (aimv2.py:29-127): hidden_stride^2 space-to-depth merge
  (zero-padded to a stride multiple), a bias-free head to
  ``vocab_size - 5`` logits + LayerNorm, softmax into soft token
  probabilities, zero-padded for the 5 indicator slots;
- VTE: soft tokens matmul the embedding table; indicator tokens
  (image_start/prefix/col_sep/row_sep/image_end at vocab-1..vocab-5)
  are integer rows interleaved per crop: indicator_i precedes crop_i,
  leftovers trail (ovis2.py:289-312);
- every image position in the prompt is the image-pad token (151655 for
  the Qwen2 tokenizer), ovis2.py:49-50.
"""
from __future__ import annotations

from functools import partial
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.llama import Qwen2ForCausalLM

IMAGE_PAD_TOKEN_ID = 151655


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    return (xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
            * w).astype(x.dtype)


def _cfg_get(cfg, key, default=None):
    if isinstance(cfg, dict):
        return cfg.get(key, default)
    return getattr(cfg, key, default)


def indicator_ids(grid: tuple[int, int], vocab: int) -> list[int]:
    """Non-atom indicator rows of construct_image_indicators
    (processors/ovis2.py:232-245) mapped into the visual vocab:
    -301..-305 -> vocab-1..vocab-5."""
    start, prefix, col, row, end = (vocab - 1, vocab - 2, vocab - 3,
                                    vocab - 4, vocab - 5)
    r, c = int(grid[0]), int(grid[1])
    out = [start, prefix]
    if r * c > 1:
        for ri in range(r):
            out.extend([col] * (c - 1))
            if ri < r - 1:
                out.append(row)
    out.append(end)
    return out


class Aimv2Tower:
    """AIMv2 trunk over per-crop square images [N, 3, S, S]."""

    def __init__(self, bc, dtype) -> None:
        self.dtype = dtype
        self.hidden = _cfg_get(bc, "hidden_size", 1024)
        self.inter = _cfg_get(bc, "intermediate_size", 2816)
        self.depth = _cfg_get(bc, "num_hidden_layers", 24)
        self.heads = _cfg_get(bc, "num_attention_heads", 8)
        self.head_dim = self.hidden // self.heads
        self.patch = _cfg_get(bc, "patch_size", 14)
        self.image_size = _cfg_get(bc, "image_size", 224)
        self.eps = _cfg_get(bc, "rms_norm_eps", 1e-5)
        self.qkv_bias = bool(_cfg_get(bc, "qkv_bias", False))
        self.use_bias = bool(_cfg_get(bc, "use_bias", False))
        self.grid = self.image_size // self.patch
        self.scale = self.head_dim ** -0.5

    def shapes(self) -> dict:
        D, I, L = self.hidden, self.inter, self.depth
        shapes = {
            "patch_w": (3 * self.patch * self.patch, D), "patch_b": (D,),
            "patch_norm": (D,),
            "pos": (self.grid * self.grid, D),
            "layers": {
                "n1_w": (L, D), "n2_w": (L, D),
                "wqkv": (L, D, 3 * D), "wo": (L, D, D),
                "fc1_w": (L, D, I), "fc3_w": (L, D, I),
                "fc2_w": (L, I, D),
            },
        }
        lay = shapes["layers"]
        if self.qkv_bias:
            lay["bqkv"] = (L, 3 * D)
        if self.use_bias:
            lay["bo"] = (L, D)
            lay["fc1_b"] = (L, I)
            lay["fc3_b"] = (L, I)
            lay["fc2_b"] = (L, D)
        return shapes

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
                elif k in ("patch_norm",) or k.startswith("n"):
                    out[k] = jnp.ones(s, self.dtype)
                elif k.endswith("_b") or k.startswith("b") or k == "pos":
                    out[k] = jnp.zeros(s, self.dtype)
                else:
                    out[k] = (0.02 * jax.random.normal(
                        next(keys), s, jnp.float32)).astype(self.dtype)
            return out
        return fill(self.shapes())

    def load_hf(self, name: str, w: np.ndarray, bufs: dict, target) -> bool:
        """Consume a ``visual_tokenizer.backbone.``-stripped name."""
        top = {"preprocessor.patchifier.proj.weight": "patch_w",
               "preprocessor.patchifier.proj.bias": "patch_b",
               "preprocessor.patchifier.norm.weight": "patch_norm",
               "preprocessor.pos_embed": "pos"}
        key = top.get(name)
        if key is not None:
            if name.endswith("proj.weight"):
                w = w.reshape(self.hidden, -1).T
            elif name.endswith("pos_embed"):
                w = w.reshape(-1, self.hidden)
            bufs[key][...] = w.astype(target)
            return True
        if name == "trunk.post_trunk_norm.weight":
            return True  # loaded but unused in the reference (aimv2.py:292)
        if not name.startswith("trunk.blocks."):
            return False
        _, _, li, rest = name.split(".", 3)
        li = int(li)
        m = {"attn.qkv.weight": ("wqkv", True),
             "attn.qkv.bias": ("bqkv", False),
             "attn.proj.weight": ("wo", True),
             "attn.proj.bias": ("bo", False),
             "norm_1.weight": ("n1_w", False),
             "norm_2.weight": ("n2_w", False),
             "mlp.fc1.weight": ("fc1_w", True),
             "mlp.fc1.bias": ("fc1_b", False),
             "mlp.fc2.weight": ("fc2_w", True),
             "mlp.fc2.bias": ("fc2_b", False),
             "mlp.fc3.weight": ("fc3_w", True),
             "mlp.fc3.bias": ("fc3_b", False)}.get(rest)
        if m is None:
            return False
        key, tr = m
        if key in bufs["layers"]:
            bufs["layers"][key][li] = (w.T if tr else w).astype(target)
        return True

    def encode(self, vp: dict, pixels: jax.Array) -> jax.Array:
        """[N, 3, S, S] -> [N, grid*grid, hidden] (no trailing norm)."""
        N = pixels.shape[0]
        g, ps = self.grid, self.patch
        # Conv2d as linear over patch blocks (row-major patch order).
        x = pixels.reshape(N, 3, g, ps, g, ps).transpose(0, 2, 4, 1, 3, 5)
        x = x.reshape(N, g * g, 3 * ps * ps).astype(self.dtype)
        x = jnp.dot(x, vp["patch_w"]) + vp["patch_b"]
        x = _rms(x, vp["patch_norm"], self.eps)
        x = x + vp["pos"][None]
        nh, hd = self.heads, self.head_dim
        lp_all = vp["layers"]
        for i in range(self.depth):
            lp = {k: v[i] for k, v in lp_all.items()}
            h = _rms(x, lp["n1_w"], self.eps)
            qkv = jnp.dot(h, lp["wqkv"])
            if "bqkv" in lp:
                qkv = qkv + lp["bqkv"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            T = q.shape[1]
            q = q.reshape(N, T, nh, hd)
            k = k.reshape(N, T, nh, hd)
            v = v.reshape(N, T, nh, hd)
            s = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                           preferred_element_type=jnp.float32) * self.scale
            a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
            o = jnp.einsum("nhqk,nkhd->nqhd", a, v,
                           preferred_element_type=jnp.float32
                           ).astype(x.dtype).reshape(N, T, nh * hd)
            o = jnp.dot(o, lp["wo"])
            if "bo" in lp:
                o = o + lp["bo"]
            x = x + o
            h = _rms(x, lp["n2_w"], self.eps)
            a1 = jnp.dot(h, lp["fc1_w"])
            a3 = jnp.dot(h, lp["fc3_w"])
            if "fc1_b" in lp:
                a1, a3 = a1 + lp["fc1_b"], a3 + lp["fc3_b"]
            y = jnp.dot(jax.nn.silu(a1) * a3, lp["fc2_w"])
            if "fc2_b" in lp:
                y = y + lp["fc2_b"]
            x = x + y
        return x


class Ovis2ForConditionalGeneration(Qwen2ForCausalLM):
    """Reference ovis2.py:231 — Qwen2 decoder + AIMv2 visual tokenizer +
    soft visual-token embedding, placeholder IMAGE_PAD_TOKEN_ID."""

    is_multimodal = True
    mm_needs_extra = True

    def __init__(self, config):
        super().__init__(config)
        hf = config.hf_config
        vt = hf.visual_tokenizer_config
        self.vt_vocab = _cfg_get(vt, "vocab_size", 16384)
        self.hidden_stride = int(_cfg_get(vt, "hidden_stride", 1))
        self.tokenize_fn = _cfg_get(vt, "tokenize_function", "softmax")
        self.drop_cls = bool(_cfg_get(vt, "drop_cls_token", False))
        bc = _cfg_get(vt, "backbone_config")
        self.vision = Aimv2Tower(bc, self.dtype)
        self.image_token_id = getattr(hf, "image_pad_token_id",
                                      IMAGE_PAD_TOKEN_ID)
        self._enc_cache: dict = {}

    def _vt_shapes(self) -> dict:
        hs2 = self.hidden_stride ** 2
        hv = self.vt_vocab - 5
        return {"head_w": (self.vision.hidden * hs2, hv),
                "head_ln_w": (hv,), "head_ln_b": (hv,),
                "vte": (self.vt_vocab, self.hidden_size)}

    def init_dummy_params(self, rng):
        params = super().init_dummy_params(rng)
        params["vision"] = self.vision.init_dummy(jax.random.fold_in(rng, 41))
        keys = iter(jax.random.split(jax.random.fold_in(rng, 42), 8))
        vt = {}
        for k, s in self._vt_shapes().items():
            if k == "head_ln_w":
                vt[k] = jnp.ones(s, self.dtype)
            elif k == "head_ln_b":
                vt[k] = jnp.zeros(s, self.dtype)
            else:
                vt[k] = (0.02 * jax.random.normal(next(keys), s, jnp.float32)
                         ).astype(self.dtype)
        params["vt"] = vt
        return params

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        vision_bufs = self.vision.make_bufs(target)
        vt = {k: np.zeros(s, target) for k, s in self._vt_shapes().items()}

        def route(ws):
            for name, w in ws:
                w = np.asarray(w)
                if name.startswith("visual_tokenizer.backbone."):
                    self.vision.load_hf(
                        name[len("visual_tokenizer.backbone."):], w,
                        vision_bufs, target)
                elif name == "visual_tokenizer.head.0.weight":
                    vt["head_w"][...] = w.T.astype(target)
                elif name == "visual_tokenizer.head.1.weight":
                    vt["head_ln_w"][...] = w.astype(target)
                elif name == "visual_tokenizer.head.1.bias":
                    vt["head_ln_b"][...] = w.astype(target)
                elif name == "vte.weight":
                    vt["vte"][...] = w.astype(target)
                elif name.startswith("llm."):
                    yield name[len("llm."):], w
                else:
                    yield name, w

        params = super().load_weights(route(weights))
        params["vision"] = vision_bufs
        params["vt"] = vt
        return params

    def param_specs(self):
        specs = super().param_specs()
        specs["vision"] = jax.tree.map(lambda _: P(), self.vision.shapes(),
                                       is_leaf=lambda x: isinstance(x, tuple))
        specs["vt"] = {k: P() for k in self._vt_shapes()}
        return specs

    # ---------------------------------------------------------------- encode
    def _soft_tokens(self, params, pv):
        """[N, 3, S, S] crops -> [N, T, vt_vocab] soft token probs."""
        feats = self.vision.encode(params["vision"], pv)
        if self.drop_cls:
            feats = feats[:, 1:]
        hs = self.hidden_stride
        if hs > 1:
            N, L, D = feats.shape
            side = int(round(L ** 0.5))
            pad = (-side) % hs
            x = feats.reshape(N, side, side, D)
            if pad:
                x = jnp.pad(x, ((0, 0), (0, pad), (0, pad), (0, 0)))
            side += pad
            x = x.reshape(N, side // hs, hs, side // hs, hs, D)
            x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
                N, (side // hs) ** 2, hs * hs * D)
            feats = x
        vt = params["vt"]
        logits = jnp.dot(feats, vt["head_w"],
                         preferred_element_type=jnp.float32)
        wf = vt["head_ln_w"].astype(jnp.float32)
        bf = vt["head_ln_b"].astype(jnp.float32)
        mu = jnp.mean(logits, -1, keepdims=True)
        var = jnp.var(logits, -1, keepdims=True)
        logits = (logits - mu) * jax.lax.rsqrt(var + 1e-5) * wf + bf
        if self.tokenize_fn == "st_argmax":
            toks = jax.nn.one_hot(jnp.argmax(logits, -1), logits.shape[-1],
                                  dtype=jnp.float32)
        else:  # softmax (gumbel_argmax is training-only noise)
            toks = jax.nn.softmax(logits, axis=-1)
        pad5 = jnp.zeros(toks.shape[:-1] + (5,), toks.dtype)
        return jnp.concatenate([toks, pad5], axis=-1)

    def _encode(self, params, pv, grids):
        toks = self._soft_tokens(params, pv)  # [N, T, V]
        vte = params["vt"]["vte"].astype(jnp.float32)
        vis = jnp.dot(toks, vte).astype(self.dtype)  # [N, T, H]
        pieces, ci = [], 0
        for grid in grids:
            inds = indicator_ids(grid, self.vt_vocab)
            ind_emb = params["vt"]["vte"][jnp.asarray(inds)].astype(
                self.dtype)  # [n_ind, H]
            patches = 1 if grid[0] * grid[1] <= 1 else 1 + grid[0] * grid[1]
            for i in range(patches):
                pieces.append(ind_emb[i:i + 1])
                pieces.append(vis[ci + i])
            pieces.append(ind_emb[patches:])
            ci += patches
        return jnp.concatenate(pieces).reshape(-1, self.hidden_size)

    def encode_images(self, params, pixel_values, grids):
        """pixel_values [N_crops, 3, S, S]; grids: per-image (rows, cols)."""
        key = tuple((int(r), int(c)) for r, c in grids)
        fn = self._enc_cache.get(key)
        if fn is None:
            fn = jax.jit(partial(self._encode, grids=key))
            self._enc_cache[key] = fn
        return fn(params, pixel_values)
