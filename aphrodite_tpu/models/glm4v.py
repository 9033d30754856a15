"""GLM-4V: EVA2CLIP tower + conv-downsample GLU projector over ChatGLM.

Parity: aphrodite/modeling/models/glm4v.py. The EVA tower is post-norm on
the BRANCH (x = x + LN(attn(x)); x = x + LN(mlp(x))) with fused-QKV
attention; after dropping CLS the patch grid is 2x2 conv-downsampled into
the text width, pushed through the GLU adapter
(linear -> LN -> gelu -> [gate|up] swiglu -> down), wrapped with the
learned boi/eoi embeddings and divided by ``scaling_factor``. Each image
contributes (grid/2)^2 + 2 rows at the placeholder positions.
"""
from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.misc_decoders import ChatGLMModel


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


class GLM4VForCausalLM(ChatGLMModel):

    is_multimodal = True

    def __init__(self, config):
        super().__init__(config)
        hf = config.text_config
        vc = getattr(hf, "vision_config", None)
        if vc is None:
            vc = getattr(config.hf_config, "vision_config", None)
        if vc is not None and not isinstance(vc, dict):
            vc = vc.to_dict() if hasattr(vc, "to_dict") else vars(vc)
        vc = vc or {}
        self.v_hidden = vc.get("hidden_size", 1792)
        self.v_layers = vc.get("num_hidden_layers", 63)
        self.v_heads = vc.get("num_heads", 16)
        self.v_inter = vc.get("intermediate_size", 15360)
        self.v_patch = vc.get("patch_size", 14)
        self.v_image = vc.get("image_size", 1120)
        self.v_grid = self.v_image // self.v_patch
        self.v_eps = vc.get("layer_norm_eps", 1e-6)
        self.scaling_factor = float(vc.get("scaling_factor", 8.0))
        self.image_token_id = getattr(hf, "image_token_id", None) or \
            getattr(hf, "boi_token_id", None)
        self._enc_fn = None

    # ------------------------------------------------------------------ params
    def _vision_shapes(self) -> dict:
        Dv, I, L = self.v_hidden, self.v_inter, self.v_layers
        H = self.hidden_size
        P_ = self.v_grid * self.v_grid
        return {
            "patch_w": (3 * self.v_patch * self.v_patch, Dv),
            "patch_b": (Dv,),
            "cls": (Dv,),
            "pos": (P_ + 1, Dv),
            "layers": {
                "ln1_w": (L, Dv), "ln1_b": (L, Dv),
                "wqkv": (L, Dv, 3 * Dv), "bqkv": (L, 3 * Dv),
                "wo": (L, Dv, Dv), "bo": (L, Dv),
                "ln2_w": (L, Dv), "ln2_b": (L, Dv),
                "fc1_w": (L, Dv, I), "fc1_b": (L, I),
                "fc2_w": (L, I, Dv), "fc2_b": (L, Dv),
            },
            "conv_w": (H, Dv, 2, 2), "conv_b": (H,),
            "glu_in": (H, H),
            "glu_ln_w": (H,), "glu_ln_b": (H,),
            "glu_gate": (H, self.glu_ffn), "glu_up": (H, self.glu_ffn),
            "glu_down": (self.glu_ffn, H),
            "boi": (H,), "eoi": (H,),
        }

    @property
    def glu_ffn(self) -> int:
        return getattr(self.config.text_config, "ffn_hidden_size",
                       4 * self.hidden_size)

    def init_dummy_params(self, rng):
        params = super().init_dummy_params(rng)
        keys = iter(jax.random.split(jax.random.fold_in(rng, 51), 32))

        def fill(shapes):
            out = {}
            for k, s in shapes.items():
                if isinstance(s, dict):
                    out[k] = fill(s)
                elif "ln" in k and k.endswith("_w"):
                    out[k] = jnp.ones(s, self.dtype)
                elif k.endswith("_b") or k.startswith("b") or \
                        k in ("boi", "eoi"):
                    out[k] = jnp.zeros(s, self.dtype)
                else:
                    out[k] = (0.02 * jax.random.normal(
                        next(keys), s, jnp.float32)).astype(self.dtype)
            return out
        params["vision"] = fill(self._vision_shapes())
        return params

    _V_TOP = {
        "patch_embedding.proj.weight": ("patch_w", "conv"),
        "patch_embedding.proj.bias": ("patch_b", None),
        "patch_embedding.cls_embedding": ("cls", None),
        "patch_embedding.position_embedding.weight": ("pos", None),
        "conv.weight": ("conv_w", "raw"),
        "conv.bias": ("conv_b", None),
        "linear_proj.linear_proj.weight": ("glu_in", "T"),
        "linear_proj.norm1.weight": ("glu_ln_w", None),
        "linear_proj.norm1.bias": ("glu_ln_b", None),
        "linear_proj.gate_proj.weight": ("glu_gate", "T"),
        "linear_proj.dense_h_to_4h.weight": ("glu_up", "T"),
        "linear_proj.dense_4h_to_h.weight": ("glu_down", "T"),
        "boi": ("boi", None),
        "eoi": ("eoi", None),
    }
    _V_LAYER = {
        "input_layernorm.weight": ("ln1_w", False),
        "input_layernorm.bias": ("ln1_b", False),
        "attention.query_key_value.weight": ("wqkv", True),
        "attention.query_key_value.bias": ("bqkv", False),
        "attention.dense.weight": ("wo", True),
        "attention.dense.bias": ("bo", False),
        "post_attention_layernorm.weight": ("ln2_w", False),
        "post_attention_layernorm.bias": ("ln2_b", False),
        "mlp.fc1.weight": ("fc1_w", True),
        "mlp.fc1.bias": ("fc1_b", False),
        "mlp.fc2.weight": ("fc2_w", True),
        "mlp.fc2.bias": ("fc2_b", False),
    }

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)

        def mk(shapes):
            return {k: mk(v) if isinstance(v, dict) else np.zeros(v, target)
                    for k, v in shapes.items()}
        vb = mk(self._vision_shapes())

        def route(ws):
            for name, w in ws:
                if not name.startswith("transformer.vision."):
                    yield name, w
                    continue
                sub = name[len("transformer.vision."):]
                w = np.asarray(w)
                m = self._V_TOP.get(sub)
                if m is not None:
                    key, kind = m
                    if kind == "conv":
                        w = w.reshape(w.shape[0], -1).T
                    elif kind == "T":
                        w = w.T
                    vb[key][...] = w.reshape(vb[key].shape).astype(target)
                    continue
                if sub.startswith("transformer.layers."):
                    idx_s, rest = sub[len("transformer.layers."):].split(
                        ".", 1)
                    mm = self._V_LAYER.get(rest)
                    if mm is not None:
                        key, tr = mm
                        vb["layers"][key][int(idx_s)] = \
                            (w.T if tr else w).astype(target)

        params = super().load_weights(route(weights))
        params["vision"] = vb
        return params

    def param_specs(self):
        specs = super().param_specs()
        specs["vision"] = jax.tree.map(
            lambda _: P(), self._vision_shapes(),
            is_leaf=lambda x: isinstance(x, tuple))
        return specs

    # ----------------------------------------------------------------- encode
    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        vp = params["vision"]
        N, ps, g = pixel_values.shape[0], self.v_patch, self.v_grid
        Dv, H = self.v_hidden, self.hidden_size
        x = pixel_values.astype(self.dtype)
        x = x.reshape(N, 3, g, ps, g, ps).transpose(0, 2, 4, 1, 3, 5)
        x = x.reshape(N, g * g, 3 * ps * ps)
        x = jnp.einsum("npc,cd->npd", x, vp["patch_w"],
                       preferred_element_type=jnp.float32
                       ).astype(self.dtype) + vp["patch_b"]
        cls = jnp.broadcast_to(vp["cls"], (N, 1, Dv)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1) + vp["pos"][None].astype(
            x.dtype)
        nh, hd = self.v_heads, Dv // self.v_heads
        T = x.shape[1]

        def layer(x, lp):
            qkv = jnp.dot(x, lp["wqkv"]) + lp["bqkv"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(N, T, nh, hd)
            k = k.reshape(N, T, nh, hd)
            v = v.reshape(N, T, nh, hd)
            logits = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                                preferred_element_type=jnp.float32)
            p = jax.nn.softmax(logits * (hd ** -0.5), -1).astype(x.dtype)
            o = jnp.einsum("nhqk,nkhd->nqhd", p, v).reshape(N, T, Dv)
            o = jnp.dot(o, lp["wo"]) + lp["bo"]
            x = x + _ln(o, lp["ln1_w"], lp["ln1_b"], self.v_eps)
            h = jax.nn.gelu(jnp.dot(x, lp["fc1_w"]) + lp["fc1_b"],
                            approximate=False)
            h = jnp.dot(h, lp["fc2_w"]) + lp["fc2_b"]
            return x + _ln(h, lp["ln2_w"], lp["ln2_b"], self.v_eps), None

        x, _ = jax.lax.scan(layer, x, vp["layers"])
        x = x[:, 1:]  # drop CLS
        x = x.reshape(N, g, g, Dv)
        # 2x2 stride-2 conv into the text width
        x = jax.lax.conv_general_dilated(
            jnp.transpose(x, (0, 3, 1, 2)), vp["conv_w"],
            window_strides=(2, 2), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = x + vp["conv_b"][None, :, None, None]
        x = jnp.transpose(x, (0, 2, 3, 1)).reshape(N, -1, H)
        # GLU adapter
        x = jnp.dot(x, vp["glu_in"],
                    preferred_element_type=jnp.float32).astype(x.dtype)
        x = jax.nn.gelu(_ln(x, vp["glu_ln_w"], vp["glu_ln_b"], 1e-5),
                        approximate=False)
        gate = jnp.dot(x, vp["glu_gate"])
        up = jnp.dot(x, vp["glu_up"])
        x = jnp.dot(jax.nn.silu(gate) * up, vp["glu_down"],
                    preferred_element_type=jnp.float32).astype(x.dtype)
        boi = jnp.broadcast_to(vp["boi"], (N, 1, H)).astype(x.dtype)
        eoi = jnp.broadcast_to(vp["eoi"], (N, 1, H)).astype(x.dtype)
        x = jnp.concatenate([boi, x, eoi], axis=1) / self.scaling_factor
        return x.reshape(-1, H)
