"""Molmo (AllenAI): OpenAI-CLIP-style ViT with two-layer feature concat +
2x2 attention pooling + SwiGLU projector over a Qwen2-like decoder with a
merged additional vocab.

Parity: aphrodite/modeling/models/molmo.py. Mechanisms:
- decoder (molmo.py:360-618): fused ``att_proj`` qkv, flat RMS q/k norms
  over the full projection width when ``attention_layer_norm``, fused
  ``ff_proj`` with MulAndSilu ordering (value rows first, gate rows
  second; ``intermediate_size`` is the FUSED width, halved per branch),
  optional ``norm_after`` post-norm blocks;
- the word embedding is ``wte.embedding`` + ``wte.new_embedding`` (128
  prompt-special rows) concatenated at load (molmo.py:1551-1568); the LM
  head has only ``embedding_size`` rows;
- vision backbone (molmo.py:283-744): CLIP ViT (class token, learned
  positions, pre-LN, quick-gelu MLP, per-projection biases), features
  taken from ``vit_layers`` [-2, -9] and concatenated, class token
  dropped, pad_embed rows added by per-patch mask fraction, 2x2
  mean-query attention pooling, SwiGLU image projector;
- features at ``feat_is_patch`` positions scatter onto <im_patch> tokens
  (molmo.py:1449-1471); other im_* markers stay ordinary tokens.
"""
from __future__ import annotations

from functools import partial
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.layers.common import ACT2MUL
from aphrodite_tpu.models.llama_variants import FlexibleDecoder
from aphrodite_tpu.models.vision import layer_norm


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _cfg_get(cfg, key, default=None):
    if cfg is None:
        return default
    if isinstance(cfg, dict):
        return cfg.get(key, default)
    return getattr(cfg, key, default)


class MolmoVisionTower:
    """CLIP-style ViT + pooling/projector over crops
    [T, num_patches, 3*ps*ps] (reference molmo.py VisionTransformer +
    MolmoVisionBackbone). Vision geometry comes from the reference's
    hardcoded VisionBackboneConfig defaults (molmo.py:93-113) unless the
    checkpoint config carries a vision_config override."""

    def __init__(self, hf, dtype) -> None:
        vc = getattr(hf, "vision_config", None)
        self.dtype = dtype
        self.hidden = _cfg_get(vc, "image_emb_dim", 1024)
        self.heads = _cfg_get(vc, "image_num_heads", 16)
        self.kv_heads = _cfg_get(vc, "image_num_key_value_heads", 16)
        self.depth = _cfg_get(vc, "image_num_layers", 23)
        self.mlp_dim = _cfg_get(vc, "image_mlp_dim", 4096)
        self.patch = _cfg_get(vc, "image_patch_size", 14)
        size = _cfg_get(vc, "image_default_input_size", (336, 336))
        self.grid = int(size[0]) // self.patch
        self.num_pos = _cfg_get(vc, "image_num_pos",
                                self.grid * self.grid + 1)
        self.eps = _cfg_get(vc, "image_norm_eps", 1e-5)
        self.head_dim = self.hidden // self.heads
        self.scale = self.head_dim ** -0.5
        self.vit_layers = list(getattr(hf, "vit_layers", None) or [-2, -9])
        self.pool = 2  # POOLING_SIZE
        self.pooled_grid = (self.grid + 1) // self.pool
        self.feat_dim = self.hidden * len(self.vit_layers)
        self.llm_hidden = hf.hidden_size
        self.proj_inter = hf.intermediate_size // 2

    def tokens_per_crop(self) -> int:
        return self.pooled_grid * self.pooled_grid

    def shapes(self) -> dict:
        D, I, L, F = self.hidden, self.mlp_dim, self.depth, self.feat_dim
        nq, nkv, hd = self.heads, self.kv_heads, self.head_dim
        return {
            "patch_w": (3 * self.patch * self.patch, D),
            "cls": (D,), "pos": (self.num_pos, D),
            "pre_ln_w": (D,), "pre_ln_b": (D,),
            "pad_embed": (2, F),
            "layers": {
                "n1_w": (L, D), "n1_b": (L, D),
                "n2_w": (L, D), "n2_b": (L, D),
                "wq": (L, D, nq * hd), "bq": (L, nq * hd),
                "wk": (L, D, nkv * hd), "bk": (L, nkv * hd),
                "wv": (L, D, nkv * hd), "bv": (L, nkv * hd),
                "wo": (L, nq * hd, D), "bo": (L, D),
                "fc1_w": (L, D, I), "fc1_b": (L, I),
                "fc2_w": (L, I, D), "fc2_b": (L, D),
            },
            "pool_wq": (F, nq * hd), "pool_bq": (nq * hd,),
            "pool_wk": (F, nkv * hd), "pool_bk": (nkv * hd),
            "pool_wv": (F, nkv * hd), "pool_bv": (nkv * hd),
            "pool_wo": (nq * hd, D), "pool_bo": (D,),
            "proj_gate": (D, self.proj_inter),
            "proj_up": (D, self.proj_inter),
            "proj_down": (self.proj_inter, self.llm_hidden),
        }

    def make_bufs(self, target) -> dict:
        def mk(shapes):
            return {k: mk(v) if isinstance(v, dict)
                    else np.zeros(v if isinstance(v, tuple) else (v,),
                                  target)
                    for k, v in shapes.items()}
        return mk(self.shapes())

    def init_dummy(self, rng: jax.Array) -> dict:
        keys = iter(jax.random.split(rng, 64))

        def fill(shapes):
            out = {}
            for k, s in shapes.items():
                if isinstance(s, dict):
                    out[k] = fill(s)
                    continue
                s = s if isinstance(s, tuple) else (s,)
                if k.startswith("n") and k.endswith("_w") or k == "pre_ln_w":
                    out[k] = jnp.ones(s, self.dtype)
                elif k.endswith("_b") or k.startswith("b") or \
                        k.startswith("pool_b") or k == "pad_embed":
                    out[k] = jnp.zeros(s, self.dtype)
                else:
                    out[k] = (0.02 * jax.random.normal(
                        next(keys), s, jnp.float32)).astype(self.dtype)
            return out
        return fill(self.shapes())

    def load_hf(self, name: str, w: np.ndarray, bufs: dict, target) -> bool:
        """Consume a ``vision_backbone.``-stripped tensor name."""
        top = {"image_vit.patch_embedding.weight": ("patch_w", True),
               "image_vit.class_embedding": ("cls", False),
               "image_vit.positional_embedding": ("pos", False),
               "image_vit.pre_ln.weight": ("pre_ln_w", False),
               "image_vit.pre_ln.bias": ("pre_ln_b", False),
               "pad_embed": ("pad_embed", False),
               "image_projector.w1.weight": ("proj_gate", True),
               "image_projector.w3.weight": ("proj_up", True),
               "image_projector.w2.weight": ("proj_down", True)}
        for pk in ("wq", "wk", "wv", "wo"):
            top[f"image_pooling_2d.{pk}.weight"] = (f"pool_{pk}", True)
            top[f"image_pooling_2d.{pk}.bias"] = (f"pool_b{pk[1]}", False)
        m = top.get(name)
        if m is not None:
            key, tr = m
            bufs[key][...] = (w.T if tr else w).astype(target)
            return True
        if not name.startswith("image_vit.transformer.resblocks."):
            return False
        _, _, _, li, rest = name.split(".", 4)
        li = int(li)
        m = {"attention.wq.weight": ("wq", True),
             "attention.wq.bias": ("bq", False),
             "attention.wk.weight": ("wk", True),
             "attention.wk.bias": ("bk", False),
             "attention.wv.weight": ("wv", True),
             "attention.wv.bias": ("bv", False),
             "attention.wo.weight": ("wo", True),
             "attention.wo.bias": ("bo", False),
             "attention_norm.weight": ("n1_w", False),
             "attention_norm.bias": ("n1_b", False),
             "ffn_norm.weight": ("n2_w", False),
             "ffn_norm.bias": ("n2_b", False),
             "feed_forward.w1.weight": ("fc1_w", True),
             "feed_forward.w1.bias": ("fc1_b", False),
             "feed_forward.w2.weight": ("fc2_w", True),
             "feed_forward.w2.bias": ("fc2_b", False)}.get(rest)
        if m is None:
            return False
        key, tr = m
        bufs["layers"][key][li] = (w.T if tr else w).astype(target)
        return True

    def _mha(self, q, k, v, nq, nkv):
        """[B, Tq, nq*hd] x [B, Tk, nkv*hd] -> [B, Tq, nq*hd]."""
        B, Tq, _ = q.shape
        Tk = k.shape[1]
        hd = self.head_dim
        q = q.reshape(B, Tq, nq, hd)
        k = k.reshape(B, Tk, nkv, hd)
        v = v.reshape(B, Tk, nkv, hd)
        if nkv != nq:
            rep = nq // nkv
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * self.scale
        a = jax.nn.softmax(s, axis=-1).astype(self.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, v,
                       preferred_element_type=jnp.float32)
        return o.astype(self.dtype).reshape(B, Tq, nq * hd)

    def encode(self, vp: dict, crops: jax.Array,
               image_masks: jax.Array) -> jax.Array:
        """crops [T, P, 3*ps*ps], image_masks [T, P] (valid-pixel
        fraction) -> pooled projected features [T, tokens_per_crop,
        llm_hidden]."""
        T = crops.shape[0]
        x = jnp.dot(crops.astype(self.dtype), vp["patch_w"])
        cls = jnp.broadcast_to(vp["cls"][None, None], (T, 1, self.hidden))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + vp["pos"][None].astype(x.dtype)
        x = layer_norm(x, vp["pre_ln_w"], vp["pre_ln_b"], self.eps)
        keep = {ly % self.depth for ly in self.vit_layers}
        feats = {}
        lp_all = vp["layers"]
        for i in range(max(keep) + 1):
            lp = {k: v[i] for k, v in lp_all.items()}
            h = layer_norm(x, lp["n1_w"], lp["n1_b"], self.eps)
            o = self._mha(jnp.dot(h, lp["wq"]) + lp["bq"],
                          jnp.dot(h, lp["wk"]) + lp["bk"],
                          jnp.dot(h, lp["wv"]) + lp["bv"],
                          self.heads, self.kv_heads)
            x = x + jnp.dot(o, lp["wo"]) + lp["bo"]
            h = layer_norm(x, lp["n2_w"], lp["n2_b"], self.eps)
            y = jnp.dot(_quick_gelu(jnp.dot(h, lp["fc1_w"]) + lp["fc1_b"]),
                        lp["fc2_w"]) + lp["fc2_b"]
            x = x + y
            if i in keep:
                feats[i] = x
        f = jnp.concatenate([feats[ly % self.depth]
                             for ly in self.vit_layers], axis=-1)
        f = f[:, 1:]  # drop the class token
        # pad_embed by mask fraction (molmo.py:699-712)
        all_pad = (image_masks == 0).astype(jnp.float32)
        partial_pad = ((image_masks < 1).astype(jnp.float32)
                       * (1.0 - all_pad))
        f = f + vp["pad_embed"][0][None, None] * all_pad[..., None] \
            + vp["pad_embed"][1][None, None] * partial_pad[..., None]
        f = f.astype(self.dtype)
        # 2x2 window pooling with a mean query.
        g, p = self.grid, self.pool
        pg = self.pooled_grid
        f = f.reshape(T, g, g, self.feat_dim)
        if g % p:
            f = jnp.pad(f, ((0, 0), (0, pg * p - g), (0, pg * p - g),
                            (0, 0)))
        f = f.reshape(T, pg, p, pg, p, self.feat_dim)
        f = jnp.transpose(f, (0, 1, 3, 2, 4, 5)).reshape(
            T * pg * pg, p * p, self.feat_dim)
        query = jnp.mean(f, axis=1, keepdims=True)
        o = self._mha(jnp.dot(query, vp["pool_wq"]) + vp["pool_bq"],
                      jnp.dot(f, vp["pool_wk"]) + vp["pool_bk"],
                      jnp.dot(f, vp["pool_wv"]) + vp["pool_bv"],
                      self.heads, self.kv_heads)
        o = jnp.dot(o, vp["pool_wo"]) + vp["pool_bo"]
        o = o.reshape(T, pg * pg, self.hidden)
        # SwiGLU image projector.
        y = jax.nn.silu(jnp.dot(o, vp["proj_gate"])) \
            * jnp.dot(o, vp["proj_up"])
        return jnp.dot(y, vp["proj_down"])


class MolmoForCausalLM(FlexibleDecoder):

    is_multimodal = True
    mm_needs_extra = True

    _LAYER_PREFIX = "model.transformer.blocks."
    _TOP_MAP = {
        "model.transformer.ln_f.weight": ("final_norm_w", False),
        "model.transformer.ff_out.weight": ("lm_head", True),
        "model.embed_tokens.weight": ("embed", False),
    }
    _LAYER_MAP = {
        "attn_norm.weight": ("ln1_w", False),
        "ff_norm.weight": ("ln2_w", False),
        "attn_out.weight": ("wo", True),
        "ff_out.weight": ("w_down", True),
        "q_norm.weight": ("q_norm", False),
        "k_norm.weight": ("k_norm", False),
    }

    def __init__(self, config):
        super().__init__(config)
        self.vision = MolmoVisionTower(config.text_config, self.dtype)
        self._enc_cache: dict = {}

    def _setup(self, hf):
        self.norm_kind = "rms"
        self.norm_bias = False
        self.norm_eps = getattr(hf, "layer_norm_eps", 1e-5)
        self.act = ACT2MUL["silu"]
        self.attn_bias = getattr(hf, "qkv_bias", False)
        self.attn_out_bias = False
        # intermediate_size is the fused ff_proj width (molmo.py:475).
        self.intermediate_size = hf.intermediate_size // 2
        if getattr(hf, "norm_after", False):
            self.block_norm = "post"
        if getattr(hf, "attention_layer_norm", False):
            self.qk_norm = "flat_rms"
        self.tie_embeddings = getattr(hf, "weight_tying", False)
        # The embedding carries 128 extra prompt-special rows; the LM head
        # (and logits) stay at embedding_size (molmo.py:792-795,1390-1397).
        self.base_vocab = getattr(hf, "embedding_size", None) \
            or hf.vocab_size
        self.vocab_size = self.base_vocab
        self.embed_rows = self.base_vocab + 128

    def init_dummy_params(self, rng):
        params = super().init_dummy_params(rng)
        extra = jnp.zeros((128, self.hidden_size), self.dtype)
        params["embed"] = jnp.concatenate([params["embed"], extra])
        params["vision"] = self.vision.init_dummy(jax.random.fold_in(rng, 41))
        return params

    def compute_logits(self, params, hidden):
        if self.tie_embeddings:
            head = params["embed"][:self.base_vocab].T
            return jnp.dot(hidden, head,
                           preferred_element_type=jnp.float32)
        return super().compute_logits(params, hidden)

    def _special_weight(self, sub, li, w, bufs, target):
        nq, nkv, hd = self.num_heads, self.num_kv_heads, self.head_dim
        if sub in ("att_proj.weight", "att_proj.bias"):
            qn, kn = nq * hd, nkv * hd
            if sub.endswith("weight"):
                bufs["wq"][li] = w[:qn].T.astype(target)
                bufs["wk"][li] = w[qn:qn + kn].T.astype(target)
                bufs["wv"][li] = w[qn + kn:].T.astype(target)
            else:
                bufs["bq"][li] = w[:qn].astype(target)
                bufs["bk"][li] = w[qn:qn + kn].astype(target)
                bufs["bv"][li] = w[qn + kn:].astype(target)
            return True
        if sub == "ff_proj.weight":
            # MulAndSilu: value rows first, gate rows second
            # (molmo.py:466-501 + layers/activation.py MulAndSilu).
            I = self.intermediate_size
            bufs["w_up"][li] = w[:I].T.astype(target)
            bufs["w_gate"][li] = w[I:].T.astype(target)
            return True
        return False

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        vision_bufs = self.vision.make_bufs(target)
        wte = {}

        def route(ws):
            for name, w in ws:
                w = np.asarray(w)
                if name.startswith("model.vision_backbone."):
                    self.vision.load_hf(name[len("model.vision_backbone."):],
                                        w, vision_bufs, target)
                elif name.endswith("wte.embedding"):
                    wte["base"] = w
                elif name.endswith("wte.new_embedding"):
                    wte["new"] = w
                else:
                    yield name, w
                if len(wte) == 2:
                    yield ("model.embed_tokens.weight",
                           np.concatenate([wte.pop("base"),
                                           wte.pop("new")]))

        params = super().load_weights(route(weights))
        params["vision"] = vision_bufs
        return params

    def param_specs(self):
        specs = super().param_specs()
        specs["vision"] = jax.tree.map(
            lambda _: P(), self.vision.shapes(),
            is_leaf=lambda x: isinstance(x, (tuple, int)))
        return specs

    # ---------------------------------------------------------------- encode
    def _encode(self, params, crops, image_masks, patch_idx):
        feats = self.vision.encode(params["vision"], crops, image_masks)
        flat = feats.reshape(-1, self.hidden_size)
        return flat[jnp.asarray(patch_idx)]

    def encode_images(self, params, pixel_values, image_masks,
                      feat_is_patch, **_):
        """pixel_values [T_crops, P, 3*ps*ps]; image_masks [T_crops, P];
        feat_is_patch [T_crops, tokens_per_crop] bool — rows kept (in crop
        order) scatter onto the prompt's <im_patch> positions."""
        fis = np.asarray(feat_is_patch).reshape(-1).astype(bool)
        patch_idx = tuple(np.nonzero(fis)[0].tolist())
        key = (pixel_values.shape, patch_idx)
        fn = self._enc_cache.get(key)
        if fn is None:
            fn = jax.jit(partial(self._encode, patch_idx=patch_idx))
            self._enc_cache[key] = fn
        return fn(params, pixel_values, jnp.asarray(image_masks))
