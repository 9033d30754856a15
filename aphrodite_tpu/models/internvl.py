"""InternVL family: InternViT tower + pixel-shuffle + MLP projector.

Parity: aphrodite/modeling/models/internvl.py (+ intern_vit.py). Covers
InternVLChatModel (InternVL 1.5/2/2.5, qwen2/internlm2/llama backbones) and
the derived checkpoints NVLM-D, H2OVL, and Skywork-R1V, which share the
tower + ``pixel_shuffle`` + ``mlp1`` connector and differ in prompt
formatting (handled by the adapter) and tiling policy.

InternViT: CLS + learnable positions, fused-QKV attention with optional
flat RMS qk-normalization (6B tower), layer-scale (ls1/ls2) residuals, and
LayerNorm or RMSNorm per ``norm_type``. Tiles are a fixed square (448), so
each tile encodes under one jitted signature; the pixel shuffle
(space-to-depth at ``downsample_ratio``) and the 4x-width LayerNorm MLP
projector run in the same jit.
"""
from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    return (xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
            * w).astype(x.dtype)


class InternViTTower:

    def __init__(self, vision_config, dtype) -> None:
        vc = vision_config
        self.dtype = dtype
        self.hidden = vc.hidden_size
        self.layers = vc.num_hidden_layers
        self.heads = vc.num_attention_heads
        self.head_dim = self.hidden // self.heads
        self.intermediate = vc.intermediate_size
        self.patch = vc.patch_size
        self.image_size = vc.image_size
        self.grid = vc.image_size // vc.patch_size
        self.eps = getattr(vc, "layer_norm_eps", 1e-6)
        self.norm_type = getattr(vc, "norm_type", "layer_norm")
        self.qk_norm = getattr(vc, "qk_normalization", False)
        self.qkv_bias = getattr(vc, "qkv_bias", True)
        act = getattr(vc, "hidden_act", "gelu")
        self.act = (lambda x: jax.nn.gelu(x, approximate=False)) \
            if act == "gelu" else jax.nn.gelu

    def shapes(self) -> dict:
        D, I, L = self.hidden, self.intermediate, self.layers
        P_ = self.grid * self.grid
        layers = {
            "norm1_w": (L, D), "norm2_w": (L, D),
            "wqkv": (L, D, 3 * D), "wo": (L, D, D), "bo": (L, D),
            "ls1": (L, D), "ls2": (L, D),
            "fc1_w": (L, D, I), "fc1_b": (L, I),
            "fc2_w": (L, I, D), "fc2_b": (L, D),
        }
        if self.norm_type == "layer_norm":
            layers.update(norm1_b=(L, D), norm2_b=(L, D))
        if self.qkv_bias:
            layers["bqkv"] = (L, 3 * D)
        if self.qk_norm:
            layers.update(q_norm=(L, D), k_norm=(L, D))
        return {
            "cls": (D,),
            "patch_w": (3 * self.patch * self.patch, D),
            "patch_b": (D,),
            "pos": (P_ + 1, D),
            "layers": layers,
        }

    def make_bufs(self, target) -> dict:
        def mk(shapes):
            return {k: mk(v) if isinstance(v, dict) else np.zeros(v, target)
                    for k, v in shapes.items()}
        return mk(self.shapes())

    def init_dummy(self, rng: jax.Array) -> dict:
        keys = iter(jax.random.split(rng, 48))

        def fill(shapes):
            out = {}
            for k, s in shapes.items():
                if isinstance(s, dict):
                    out[k] = fill(s)
                elif "norm" in k or k.startswith("ls"):
                    out[k] = jnp.ones(s, self.dtype)
                elif k.endswith("_b") or k.startswith("b"):
                    out[k] = jnp.zeros(s, self.dtype)
                else:
                    out[k] = (0.02 * jax.random.normal(
                        next(keys), s, jnp.float32)).astype(self.dtype)
            return out
        return fill(self.shapes())

    def load_hf(self, name: str, w: np.ndarray, bufs: dict, target) -> bool:
        """Route one ``vision_model.``-relative tensor."""
        if name == "embeddings.class_embedding":
            bufs["cls"][...] = w.reshape(-1).astype(target)
        elif name == "embeddings.patch_embedding.weight":
            bufs["patch_w"][...] = w.reshape(w.shape[0], -1).T.astype(target)
        elif name == "embeddings.patch_embedding.bias":
            bufs["patch_b"][...] = w.astype(target)
        elif name == "embeddings.position_embedding":
            bufs["pos"][...] = w.reshape(-1, w.shape[-1]).astype(target)
        elif name.startswith("encoder.layers."):
            rest = name[len("encoder.layers."):]
            idx_s, sub = rest.split(".", 1)
            li = int(idx_s)
            m = {
                "norm1.weight": ("norm1_w", False),
                "norm1.bias": ("norm1_b", False),
                "norm2.weight": ("norm2_w", False),
                "norm2.bias": ("norm2_b", False),
                "attn.qkv.weight": ("wqkv", True),
                "attn.qkv.bias": ("bqkv", False),
                "attn.proj.weight": ("wo", True),
                "attn.proj.bias": ("bo", False),
                "attn.q_norm.weight": ("q_norm", False),
                "attn.k_norm.weight": ("k_norm", False),
                "ls1": ("ls1", False),
                "ls2": ("ls2", False),
                "mlp.fc1.weight": ("fc1_w", True),
                "mlp.fc1.bias": ("fc1_b", False),
                "mlp.fc2.weight": ("fc2_w", True),
                "mlp.fc2.bias": ("fc2_b", False),
            }.get(sub)
            if m is None or m[0] not in bufs["layers"]:
                return False
            key, tr = m
            bufs["layers"][key][li] = (w.T if tr else w).astype(target)
        else:
            return False
        return True

    def encode(self, vp: dict, pixel_values: jax.Array,
               use_layers: int) -> jax.Array:
        """[N,3,S,S] -> [N, 1+P, D] hidden states at layer ``use_layers``."""
        N, ps, g, D = pixel_values.shape[0], self.patch, self.grid, \
            self.hidden
        x = pixel_values.astype(self.dtype)
        x = x.reshape(N, 3, g, ps, g, ps).transpose(0, 2, 4, 1, 3, 5)
        x = x.reshape(N, g * g, 3 * ps * ps)
        x = jnp.einsum("npc,cd->npd", x, vp["patch_w"],
                       preferred_element_type=jnp.float32
                       ).astype(self.dtype) + vp["patch_b"]
        cls = jnp.broadcast_to(vp["cls"], (N, 1, D)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1) + vp["pos"][None].astype(
            x.dtype)

        nh, hd = self.heads, self.head_dim
        T = x.shape[1]
        norm = _ln if self.norm_type == "layer_norm" else \
            (lambda xx, w, b, eps: _rms(xx, w, eps))

        def layer(x, lp):
            h = norm(x, lp["norm1_w"], lp.get("norm1_b"), self.eps)
            qkv = jnp.dot(h, lp["wqkv"],
                          preferred_element_type=jnp.float32
                          ).astype(x.dtype)
            if "bqkv" in lp:
                qkv = qkv + lp["bqkv"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            if self.qk_norm:
                q = _rms(q, lp["q_norm"], self.eps)
                k = _rms(k, lp["k_norm"], self.eps)
            q = q.reshape(N, T, nh, hd)
            k = k.reshape(N, T, nh, hd)
            v = v.reshape(N, T, nh, hd)
            logits = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                                preferred_element_type=jnp.float32)
            probs = jax.nn.softmax(logits * (hd ** -0.5), -1
                                   ).astype(x.dtype)
            o = jnp.einsum("nhqk,nkhd->nqhd", probs, v).reshape(N, T, D)
            o = jnp.dot(o, lp["wo"]) + lp["bo"]
            x = x + o * lp["ls1"]
            h = norm(x, lp["norm2_w"], lp.get("norm2_b"), self.eps)
            h = self.act(jnp.dot(h, lp["fc1_w"]) + lp["fc1_b"])
            x = x + (jnp.dot(h, lp["fc2_w"]) + lp["fc2_b"]) * lp["ls2"]
            return x, None

        used = jax.tree.map(lambda a: a[:use_layers], vp["layers"])
        x, _ = jax.lax.scan(layer, x, used)
        return x


class _InternVLMixin:
    is_multimodal = True

    def _mm_init(self, config) -> None:
        hf = config.hf_config
        self.vision = InternViTTower(hf.vision_config, self.dtype)
        self.downsample = float(getattr(hf, "downsample_ratio", 0.5))
        self.ps_version = getattr(hf, "ps_version", "v2")
        select = getattr(hf, "select_layer", -1)
        self.vit_layers = self.vision.layers + 1 + select \
            if select < 0 else select
        self.image_token_id = getattr(hf, "img_context_token_id", None) or \
            getattr(hf, "image_token_index", None)
        self._encode_fn = None

    # ------------------------------------------------------------------ params
    def _projector_shapes(self) -> dict:
        Dv = self.vision.hidden
        r = int(1 / self.downsample)
        D4, H = Dv * r * r, self.hidden_size
        return {"ln_w": (D4,), "ln_b": (D4,), "w1": (D4, H), "b1": (H,),
                "w2": (H, H), "b2": (H,)}

    def init_dummy_params(self, rng: jax.Array) -> dict:
        r1, r2, r3 = jax.random.split(rng, 3)
        params = super().init_dummy_params(r1)
        params["vision"] = self.vision.init_dummy(r2)
        keys = iter(jax.random.split(r3, 8))
        proj = {}
        for k, s in self._projector_shapes().items():
            if k == "ln_w":
                proj[k] = jnp.ones(s, self.dtype)
            elif k.startswith("b") or k == "ln_b":
                proj[k] = jnp.zeros(s, self.dtype)
            else:
                proj[k] = (0.02 * jax.random.normal(next(keys), s,
                                                    jnp.float32)
                           ).astype(self.dtype)
        params["projector"] = proj
        return params

    # mlp1: [0] LayerNorm, [1] Linear, [2] GELU, [3] Linear
    _PROJ_MAP = {"0.weight": ("ln_w", False), "0.bias": ("ln_b", False),
                 "1.weight": ("w1", True), "1.bias": ("b1", False),
                 "3.weight": ("w2", True), "3.bias": ("b2", False)}

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        vision_bufs = self.vision.make_bufs(target)
        proj_bufs = {k: np.zeros(s, target)
                     for k, s in self._projector_shapes().items()}

        def route(ws):
            for name, w in ws:
                if name.startswith("language_model."):
                    yield name[len("language_model."):], w
                elif name.startswith("vision_model."):
                    self.vision.load_hf(name[len("vision_model."):],
                                        np.asarray(w), vision_bufs, target)
                elif name.startswith("mlp1."):
                    m = self._PROJ_MAP.get(name[len("mlp1."):])
                    if m is not None:
                        key, tr = m
                        proj_bufs[key][...] = (np.asarray(w).T if tr
                                               else np.asarray(w)
                                               ).astype(target)
                else:
                    yield name, w

        params = super().load_weights(route(weights))
        params["vision"] = vision_bufs
        params["projector"] = proj_bufs
        return params

    def param_specs(self) -> dict:
        specs = super().param_specs()
        specs["vision"] = jax.tree.map(lambda _: P(), self.vision.shapes(),
                                       is_leaf=lambda x: isinstance(x, tuple))
        specs["projector"] = {k: P() for k in self._projector_shapes()}
        return specs

    # ----------------------------------------------------------------- encode
    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        """[N_tiles, 3, S, S] -> flat [N*tokens_per_tile, H]; pixel shuffle
        + mlp1 (reference internvl.py extract_feature)."""
        if self._encode_fn is None:
            g = self.vision.grid
            r = self.downsample

            def enc(params, pv):
                x = self.vision.encode(params["vision"], pv,
                                       self.vit_layers)
                x = x[:, 1:, :]  # drop CLS
                N, D = x.shape[0], x.shape[-1]
                # pixel_shuffle (space-to-depth), ps_version v2 transpose.
                h2, r_inv = int(g * r), int(1 / r)
                x = x.reshape(N, g, h2, D * r_inv)
                x = jnp.transpose(x, (0, 2, 1, 3))
                x = x.reshape(N, h2, h2, D * r_inv * r_inv)
                if self.ps_version != "v1":
                    x = jnp.transpose(x, (0, 2, 1, 3))
                pp = params["projector"]
                x = _ln(x, pp["ln_w"], pp["ln_b"], 1e-5)
                x = jnp.dot(x, pp["w1"],
                            preferred_element_type=jnp.float32
                            ).astype(x.dtype) + pp["b1"]
                x = jax.nn.gelu(x, approximate=False)
                x = jnp.dot(x, pp["w2"],
                            preferred_element_type=jnp.float32
                            ).astype(x.dtype) + pp["b2"]
                return x.reshape(-1, self.hidden_size)
            self._encode_fn = enc
        return self._encode_fn(params, pixel_values)


_CLS_CACHE: dict[tuple, type] = {}


def _backbone(text_cfg):
    mt = getattr(text_cfg, "model_type", "llama")
    if mt == "qwen2":
        from aphrodite_tpu.models.llama import Qwen2ForCausalLM
        return Qwen2ForCausalLM
    if mt == "internlm2":
        from aphrodite_tpu.models.llama_variants import InternLM2ForCausalLM
        return InternLM2ForCausalLM
    from aphrodite_tpu.models.llama import LlamaForCausalLM
    return LlamaForCausalLM


def InternVLChatModel(config):
    base = _backbone(config.text_config)
    key = ("InternVL", base)
    cls = _CLS_CACHE.get(key)
    if cls is None:
        cls = type("InternVL" + base.__name__, (_InternVLMixin, base), {})
        _CLS_CACHE[key] = cls
    model = cls(config)
    model._mm_init(config)
    return model
