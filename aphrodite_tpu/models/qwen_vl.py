"""Qwen-VL (v1): OpenCLIP ViT-bigG tower + attention-pool resampler over
the QWen v1 decoder.

Parity: aphrodite/modeling/models/qwen_vl.py (+ layers/resampler.py
Resampler2). Tower: bias-free patch conv, interpolated absolute positions,
pre-norm blocks whose fused in_proj is PER-HEAD interleaved [q_h|k_h|v_h]
(VisualAttention layout — de-interleaved at load), gelu MLP. The attention
pool cross-attends n_queries learned queries (2D sincos positions added to
BOTH queries and keys) through a packed-in-proj MHA; ln_post + a square
output projection map into the LM width.
"""
from __future__ import annotations

import math
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.misc_decoders import QWenLMHeadModel
from aphrodite_tpu.models.vision import layer_norm


def sincos_2d_v20(D: int, g: int) -> np.ndarray:
    """get_2d_sincos_pos_embed version (2,0): [g*g, D]."""
    omega = 1.0 / 10000 ** (np.arange(D // 4, dtype=np.float64)
                            / (D / 4.0))
    gw, gh = np.meshgrid(np.arange(g, dtype=np.float64),
                         np.arange(g, dtype=np.float64))

    def emb(pos):
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    return np.concatenate([emb(gw), emb(gh)], axis=-1)


def QWenLMHeadModelDispatch(config):
    """QWen v1 checkpoints share one architecture string; the `visual`
    config section selects the VL variant (reference qwen.py dispatch)."""
    if getattr(config.text_config, "visual", None):
        return QwenVLForConditionalGeneration(config)
    return QWenLMHeadModel(config)


class QwenVLForConditionalGeneration(QWenLMHeadModel):

    is_multimodal = True

    def __init__(self, config):
        super().__init__(config)
        hf = config.text_config
        vc = getattr(hf, "visual", None) or {}
        if not isinstance(vc, dict):
            vc = vc.to_dict() if hasattr(vc, "to_dict") else vars(vc)
        self.v_width = vc.get("width", 1664)
        self.v_layers = vc.get("layers", 48)
        self.v_heads = vc.get("heads", 16)
        self.v_mlp = int(self.v_width * vc.get("mlp_ratio", 4.9231))
        self.v_patch = vc.get("patch_size", 14)
        self.v_image = vc.get("image_size", 448)
        self.v_grid = self.v_image // self.v_patch
        self.v_out = vc.get("output_dim", self.hidden_size)
        self.n_queries = int(vc.get("n_queries", 256))
        self.q_grid = int(math.sqrt(self.n_queries))
        self.pool_heads = max(1, self.v_out // 128)
        self.image_token_id = getattr(hf, "image_token_id", None) or \
            vc.get("image_start_id", 151857) + 2  # <imgpad> after start/end
        self._enc_fn = None

    # ------------------------------------------------------------------ params
    def _vision_shapes(self) -> dict:
        Dv, I, L, Do = self.v_width, self.v_mlp, self.v_layers, self.v_out
        return {
            "conv_w": (3 * self.v_patch * self.v_patch, Dv),
            "pos": (256, Dv),
            "ln_pre_w": (Dv,), "ln_pre_b": (Dv,),
            "layers": {
                "ln1_w": (L, Dv), "ln1_b": (L, Dv),
                "wq": (L, Dv, Dv), "bq": (L, Dv),
                "wk": (L, Dv, Dv), "bk": (L, Dv),
                "wv": (L, Dv, Dv), "bv": (L, Dv),
                "wo": (L, Dv, Dv), "bo": (L, Dv),
                "ln2_w": (L, Dv), "ln2_b": (L, Dv),
                "fc1_w": (L, Dv, I), "fc1_b": (L, I),
                "fc2_w": (L, I, Dv), "fc2_b": (L, Dv),
            },
            # attention pool (Resampler2, do_post_projection=False)
            "query": (self.n_queries, Do),
            "kv_proj": (Dv, Do),
            "in_proj_w": (Do, 3 * Do), "in_proj_b": (3 * Do,),
            "out_w": (Do, Do), "out_b": (Do,),
            "ln_q_w": (Do,), "ln_q_b": (Do,),
            "ln_kv_w": (Do,), "ln_kv_b": (Do,),
            "pool_pos": (self.n_queries, Do),
            "ln_post_w": (Do,), "ln_post_b": (Do,),
            "proj": (Do, Do),
        }

    def init_dummy_params(self, rng):
        params = super().init_dummy_params(rng)
        keys = iter(jax.random.split(jax.random.fold_in(rng, 61), 48))

        def fill(shapes):
            out = {}
            for k, s in shapes.items():
                if isinstance(s, dict):
                    out[k] = fill(s)
                elif "ln" in k and k.endswith("_w"):
                    out[k] = jnp.ones(s, self.dtype)
                elif k.endswith("_b") or k.startswith("b"):
                    out[k] = jnp.zeros(s, self.dtype)
                else:
                    out[k] = (0.02 * jax.random.normal(
                        next(keys), s, jnp.float32)).astype(self.dtype)
            return out
        params["vision"] = fill(self._vision_shapes())
        return params

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)

        def mk(shapes):
            return {k: mk(v) if isinstance(v, dict) else np.zeros(v, target)
                    for k, v in shapes.items()}
        vb = mk(self._vision_shapes())
        nh, hd = self.v_heads, self.v_width // self.v_heads
        top = {
            "positional_embedding": "pos",
            "ln_pre.weight": "ln_pre_w", "ln_pre.bias": "ln_pre_b",
            "attn_pool.query": "query",
            "attn_pool.kv_proj.weight": "kv_proj",
            "attn_pool.attn.in_proj_weight": "in_proj_w",
            "attn_pool.attn.in_proj_bias": "in_proj_b",
            "attn_pool.attn.out_proj.weight": "out_w",
            "attn_pool.attn.out_proj.bias": "out_b",
            "attn_pool.ln_q.weight": "ln_q_w",
            "attn_pool.ln_q.bias": "ln_q_b",
            "attn_pool.ln_kv.weight": "ln_kv_w",
            "attn_pool.ln_kv.bias": "ln_kv_b",
            "attn_pool.pos_embed": "pool_pos",
            "ln_post.weight": "ln_post_w", "ln_post.bias": "ln_post_b",
            "proj": "proj",
        }
        lmap = {
            "ln_1.weight": ("ln1_w", False), "ln_1.bias": ("ln1_b", False),
            "attn.out_proj.weight": ("wo", True),
            "attn.out_proj.bias": ("bo", False),
            "ln_2.weight": ("ln2_w", False), "ln_2.bias": ("ln2_b", False),
            "mlp.c_fc.weight": ("fc1_w", True),
            "mlp.c_fc.bias": ("fc1_b", False),
            "mlp.c_proj.weight": ("fc2_w", True),
            "mlp.c_proj.bias": ("fc2_b", False),
        }

        def route(ws):
            for name, w in ws:
                if not name.startswith("transformer.visual."):
                    yield name, w
                    continue
                sub = name[len("transformer.visual."):]
                w = np.asarray(w)
                if sub == "conv1.weight":
                    vb["conv_w"][...] = w.reshape(w.shape[0], -1
                                                  ).T.astype(target)
                elif sub in top:
                    key = top[sub]
                    tr = key in ("kv_proj", "in_proj_w", "out_w")
                    vb[key][...] = (w.T if tr else
                                    w.reshape(vb[key].shape)).astype(target)
                elif sub.startswith("transformer.resblocks."):
                    idx_s, rest = sub[len("transformer.resblocks."):].split(
                        ".", 1)
                    li = int(idx_s)
                    if rest == "attn.in_proj.weight":
                        # Per-head interleaved [nh, 3, hd] rows.
                        wr = w.reshape(nh, 3, hd, self.v_width)
                        vb["layers"]["wq"][li] = wr[:, 0].reshape(
                            nh * hd, -1).T.astype(target)
                        vb["layers"]["wk"][li] = wr[:, 1].reshape(
                            nh * hd, -1).T.astype(target)
                        vb["layers"]["wv"][li] = wr[:, 2].reshape(
                            nh * hd, -1).T.astype(target)
                    elif rest == "attn.in_proj.bias":
                        br = w.reshape(nh, 3, hd)
                        vb["layers"]["bq"][li] = br[:, 0].reshape(-1
                                                                  ).astype(target)
                        vb["layers"]["bk"][li] = br[:, 1].reshape(-1
                                                                  ).astype(target)
                        vb["layers"]["bv"][li] = br[:, 2].reshape(-1
                                                                  ).astype(target)
                    else:
                        m = lmap.get(rest)
                        if m is not None:
                            key, tr = m
                            vb["layers"][key][li] = (w.T if tr else w
                                                     ).astype(target)

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
        Dv, Do = self.v_width, self.v_out
        x = pixel_values.astype(self.dtype)
        x = x.reshape(N, 3, g, ps, g, ps).transpose(0, 2, 4, 1, 3, 5)
        x = x.reshape(N, g * g, 3 * ps * ps)
        x = jnp.einsum("npc,cd->npd", x, vp["conv_w"],
                       preferred_element_type=jnp.float32
                       ).astype(self.dtype)
        pos = vp["pos"].astype(jnp.float32)
        src = int(math.sqrt(pos.shape[0]))
        if src != g:  # bicubic interpolation of absolute positions
            pos = jax.image.resize(pos.reshape(src, src, Dv), (g, g, Dv),
                                   method="cubic").reshape(g * g, Dv)
        x = x + pos[None].astype(x.dtype)
        x = layer_norm(x, vp["ln_pre_w"], vp["ln_pre_b"], 1e-6)
        nh, hd = self.v_heads, Dv // self.v_heads
        T = g * g

        def layer(x, lp):
            h = layer_norm(x, lp["ln1_w"], lp["ln1_b"], 1e-6)
            q = (jnp.dot(h, lp["wq"]) + lp["bq"]).reshape(N, T, nh, hd)
            k = (jnp.dot(h, lp["wk"]) + lp["bk"]).reshape(N, T, nh, hd)
            v = (jnp.dot(h, lp["wv"]) + lp["bv"]).reshape(N, T, nh, hd)
            logits = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                                preferred_element_type=jnp.float32)
            p = jax.nn.softmax(logits * (hd ** -0.5), -1).astype(x.dtype)
            o = jnp.einsum("nhqk,nkhd->nqhd", p, v).reshape(N, T, Dv)
            x = x + jnp.dot(o, lp["wo"]) + lp["bo"]
            h = layer_norm(x, lp["ln2_w"], lp["ln2_b"], 1e-6)
            h = jax.nn.gelu(jnp.dot(h, lp["fc1_w"]) + lp["fc1_b"],
                            approximate=False)
            x = x + jnp.dot(h, lp["fc2_w"]) + lp["fc2_b"]
            return x, None

        x, _ = jax.lax.scan(layer, x, vp["layers"])
        # attention pool: queries+pos vs keys+sincos(grid of patches)
        Q = self.n_queries
        kv = jnp.dot(x, vp["kv_proj"],
                     preferred_element_type=jnp.float32).astype(x.dtype)
        kv = layer_norm(kv, vp["ln_kv_w"], vp["ln_kv_b"], 1e-6)
        q0 = layer_norm(vp["query"], vp["ln_q_w"], vp["ln_q_b"], 1e-6)
        # key positions: pool_pos interpolated to the patch grid (version
        # 2.0 sincos table stored as a buffer).
        kpos = vp["pool_pos"].astype(jnp.float32)
        qg = self.q_grid
        if qg != g:
            kpos = jax.image.resize(kpos.reshape(qg, qg, Do), (g, g, Do),
                                    method="cubic").reshape(g * g, Do)
        wq, wk, wv = jnp.split(vp["in_proj_w"], 3, axis=1)
        bq, bk, bv = jnp.split(vp["in_proj_b"], 3)
        ph = self.pool_heads
        phd = Do // ph
        qh = (jnp.dot(q0 + vp["pool_pos"].astype(q0.dtype), wq) + bq)
        qh = jnp.broadcast_to(qh[None], (N, Q, Do)).reshape(N, Q, ph, phd)
        kh = (jnp.dot(kv + kpos[None].astype(kv.dtype), wk) + bk
              ).reshape(N, T, ph, phd)
        vh = (jnp.dot(kv, wv) + bv).reshape(N, T, ph, phd)
        logits = jnp.einsum("nqhd,nkhd->nhqk", qh, kh,
                            preferred_element_type=jnp.float32)
        p = jax.nn.softmax(logits * (phd ** -0.5), -1).astype(x.dtype)
        o = jnp.einsum("nhqk,nkhd->nqhd", p, vh).reshape(N, Q, Do)
        o = jnp.dot(o, vp["out_w"]) + vp["out_b"]
        o = layer_norm(o, vp["ln_post_w"], vp["ln_post_b"], 1e-6)
        o = jnp.dot(o, vp["proj"],
                    preferred_element_type=jnp.float32).astype(o.dtype)
        return o.reshape(-1, self.hidden_size)
