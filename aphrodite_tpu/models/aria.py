"""Aria (Rhymes AI): Idefics3 vision tower + cross-attention resampler
projector + grouped-MoE llama decoder.

Parity: aphrodite/modeling/models/aria.py. The projector cross-attends
``patch_to_query_dict[num_patches]`` learned queries to the vision states
(separate q/k/v pre-projections feeding a packed-in-proj multi-head
attention, then linear + LayerNorm + gelu MLP into the text width). Text
MoE: top-k logits softmaxed (over the k selected only), grouped experts
with fused fc1 = [gate | up] silu-GLU, plus ungated shared experts.
"""
from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.mixtral import MixtralForCausalLM
from aphrodite_tpu.models.vision import VisionTower, layer_norm


class AriaTextForCausalLM(MixtralForCausalLM):

    shared_gate = False

    def __init__(self, config):
        hf = config.text_config
        super().__init__(config)
        self.num_experts = getattr(hf, "moe_num_experts", 8)
        self.top_k = getattr(hf, "moe_topk", 2)
        n_shared = getattr(hf, "moe_num_shared_experts", 0) or 0
        self.shared_intermediate = n_shared * hf.intermediate_size

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        """Aria experts ship as dense [E, H, 2I]/[E, I, H] tensors."""
        fused: dict[tuple, np.ndarray] = {}

        def split(ws):
            for name, w in ws:
                if name.startswith("model.language_model."):
                    name = name[len("model.language_model."):]
                    name = "model." + name
                elif name.startswith("language_model."):
                    name = name[len("language_model."):]
                    if not name.startswith(("model.", "lm_head.")):
                        name = "model." + name
                if name.endswith(".mlp.experts.fc1.weight") \
                        or name.endswith(".mlp.experts.fc2.weight") \
                        or name.endswith(".mlp.router.weight"):
                    li = int(name.split(".")[2])
                    fused[(li, name.rsplit(".", 2)[-2]
                           if "router" not in name else "router")] = \
                        np.asarray(w)
                    continue
                name = name.replace(".mlp.shared_experts.",
                                    ".mlp.shared_expert.")
                yield name, w

        params = super().load_weights(split(weights))
        target = params["embed"].dtype
        I = self.intermediate_size
        layers = params["layers"]
        for (li, key), w in fused.items():
            if key == "fc1":  # [E, H, 2I] -> gate | up
                layers["we_gate"][li] = w[:, :, :I].astype(target)
                layers["we_up"][li] = w[:, :, I:].astype(target)
            elif key == "fc2":  # [E, I, H]
                layers["we_down"][li] = w.astype(target)
            elif key == "router":
                layers["router"][li] = w.T.astype(target)
        return params

    def _mlp(self, h: jax.Array, lp: dict, lin=None) -> jax.Array:
        if "router" not in lp:
            from aphrodite_tpu.models.llama import LlamaForCausalLM
            return LlamaForCausalLM._mlp(self, h, lp, lin=lin)
        from aphrodite_tpu.layers.linear import apply_linear
        from aphrodite_tpu.models.moe_common import moe_combine
        logits = jnp.dot(h.astype(jnp.float32),
                         lp["router"].astype(jnp.float32))
        topv, topi = jax.lax.top_k(logits, self.top_k)
        topw = jax.nn.softmax(topv, axis=-1)  # softmax over the k selected
        out = moe_combine(h, lp, self.act, topi, topw,
                          quant_fmt=self.quant_fmt,
                          expert_parallel=self.expert_parallel,
                          mesh=self.mesh,
                          num_experts=self.num_experts)
        if self.shared_intermediate:
            s = self.act(apply_linear(h, lp["ws_gate"]),
                         apply_linear(h, lp["ws_up"]))
            out = out + apply_linear(s, lp["ws_down"])
        return out


class AriaForConditionalGeneration(AriaTextForCausalLM):

    is_multimodal = True

    def __init__(self, config):
        super().__init__(config)
        hf = config.hf_config
        self.vision = VisionTower(hf.vision_config, self.dtype,
                                  cls_token=False, feature_layer=-1,
                                  post_ln=True)
        self.image_token_id = getattr(hf, "image_token_index", 9)
        self.p2q = {int(k): int(v) for k, v in
                    dict(getattr(hf, "projector_patch_to_query_dict",
                                 {1225: 128, 4900: 256})).items()}
        self.max_queries = max(self.p2q.values())
        self.proj_heads = hf.vision_config.num_attention_heads

    # ------------------------------------------------------------------ params
    def _proj_shapes(self) -> dict:
        Dv, H = self.vision.hidden, self.hidden_size
        # feed_forward hidden width from the checkpoint geometry: HF uses
        # in_features -> hidden_features(=text hidden) -> output_dim(text).
        return {
            "query": (self.max_queries, Dv),
            "q_w": (Dv, Dv), "k_w": (Dv, Dv), "v_w": (Dv, Dv),
            "in_proj_w": (Dv, 3 * Dv), "in_proj_b": (3 * Dv,),
            "attn_out_w": (Dv, Dv), "attn_out_b": (Dv,),
            "lin_w": (Dv, Dv), "lin_b": (Dv,),
            "ca_ln_w": (Dv,), "ca_ln_b": (Dv,),
            "kv_ln_w": (Dv,), "kv_ln_b": (Dv,),
            "ff_ln_w": (Dv,), "ff_ln_b": (Dv,),
            "ff_in": (Dv, H), "ff_out": (H, H),
        }

    def init_dummy_params(self, rng):
        params = super().init_dummy_params(rng)
        r = jax.random.fold_in(rng, 21)
        params["vision"] = self.vision.init_dummy(r)
        keys = iter(jax.random.split(jax.random.fold_in(rng, 22), 16))
        proj = {}
        for k, s in self._proj_shapes().items():
            if k.endswith("ln_w"):
                proj[k] = jnp.ones(s, self.dtype)
            elif k.endswith("_b"):
                proj[k] = jnp.zeros(s, self.dtype)
            else:
                proj[k] = (0.02 * jax.random.normal(next(keys), s,
                                                    jnp.float32)
                           ).astype(self.dtype)
        params["projector"] = proj
        return params

    _PROJ_MAP = {
        "query": ("query", False),
        "cross_attn.q_proj.weight": ("q_w", True),
        "cross_attn.k_proj.weight": ("k_w", True),
        "cross_attn.v_proj.weight": ("v_w", True),
        "cross_attn.multihead_attn.in_proj_weight": ("in_proj_w", True),
        "cross_attn.multihead_attn.in_proj_bias": ("in_proj_b", False),
        "cross_attn.multihead_attn.out_proj.weight": ("attn_out_w", True),
        "cross_attn.multihead_attn.out_proj.bias": ("attn_out_b", False),
        "cross_attn.linear.weight": ("lin_w", True),
        "cross_attn.linear.bias": ("lin_b", False),
        "cross_attn.layer_norm.weight": ("ca_ln_w", False),
        "cross_attn.layer_norm.bias": ("ca_ln_b", False),
        "cross_attn.layer_norm_kv.weight": ("kv_ln_w", False),
        "cross_attn.layer_norm_kv.bias": ("kv_ln_b", False),
        "layer_norm.weight": ("ff_ln_w", False),
        "layer_norm.bias": ("ff_ln_b", False),
        "feed_forward.linear_in.weight": ("ff_in", True),
        "feed_forward.linear_out.weight": ("ff_out", True),
    }

    def load_weights(self, weights):
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        vision_bufs = self.vision.make_bufs(target)
        proj = {k: np.zeros(s, target)
                for k, s in self._proj_shapes().items()}

        def route(ws):
            for name, w in ws:
                name = name.removeprefix("model.") \
                    if name.startswith("model.vision_tower.") or \
                    name.startswith("model.multi_modal_projector.") \
                    else name
                if name.startswith("vision_tower."):
                    sub = name[len("vision_tower."):]
                    sub = sub.removeprefix("vision_model.")
                    self.vision.load_hf(sub, np.asarray(w), vision_bufs,
                                        target)
                    continue
                if name.startswith("multi_modal_projector."):
                    m = self._PROJ_MAP.get(
                        name[len("multi_modal_projector."):])
                    if m is not None:
                        key, tr = m
                        proj[key][...] = (np.asarray(w).T if tr
                                          else np.asarray(w)
                                          ).astype(target)
                    continue
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
    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision.encode(params["vision"], pixel_values)
        N, Pn, Dv = feats.shape
        Q = self.p2q[Pn]
        pp = params["projector"]
        queries = jnp.broadcast_to(pp["query"][None, :Q], (N, Q, Dv))
        q = jnp.dot(layer_norm(queries, pp["ca_ln_w"], pp["ca_ln_b"], 1e-5),
                    pp["q_w"])
        kvs = layer_norm(feats, pp["kv_ln_w"], pp["kv_ln_b"], 1e-5)
        k = jnp.dot(kvs, pp["k_w"])
        v = jnp.dot(kvs, pp["v_w"])
        # nn.MultiheadAttention packed in-proj on top of the q/k/v pre-proj.
        wq, wk, wv = jnp.split(pp["in_proj_w"], 3, axis=1)
        bq, bk, bv = jnp.split(pp["in_proj_b"], 3)
        q = jnp.dot(q, wq) + bq
        k = jnp.dot(k, wk) + bk
        v = jnp.dot(v, wv) + bv
        nh = self.proj_heads
        hd = Dv // nh
        q = q.reshape(N, Q, nh, hd)
        k = k.reshape(N, Pn, nh, hd)
        v = v.reshape(N, Pn, nh, hd)
        logits = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                            preferred_element_type=jnp.float32)
        p = jax.nn.softmax(logits * (hd ** -0.5), -1).astype(feats.dtype)
        o = jnp.einsum("nhqk,nkhd->nqhd", p, v).reshape(N, Q, Dv)
        o = jnp.dot(o, pp["attn_out_w"]) + pp["attn_out_b"]
        o = jnp.dot(o, pp["lin_w"]) + pp["lin_b"]
        o = layer_norm(o, pp["ff_ln_w"], pp["ff_ln_b"], 1e-5)
        h = jax.nn.gelu(jnp.dot(o, pp["ff_in"],
                                preferred_element_type=jnp.float32
                                ).astype(o.dtype), approximate=True)
        h = jnp.dot(h, pp["ff_out"],
                    preferred_element_type=jnp.float32).astype(o.dtype)
        return h.reshape(-1, self.hidden_size)
