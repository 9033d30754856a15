"""Llama 4 (Scout/Maverick) text decoder.

Parity: aphrodite/modeling/models/llama4.py. Per-layer attention pattern:
``no_rope_layers[i] == 1`` layers use rotary + L2 qk-norm + CHUNKED local
attention (``attention_chunk_size`` — tokens attend only within their
chunk); the NoPE layers are positional-encoding-free, globally causal, and
scale queries by the attention-temperature tuning term
``log(floor(pos/floor_scale)+1)*attn_scale + 1``. FFN pattern: every
``interleave_moe_layer_step``-th layer is MoE — top-1 sigmoid routing that
scales the expert INPUT (HF Llama4TextMoe), plus an always-on shared
expert; other layers are dense with ``intermediate_size_mlp``.

Built on the mixed dense/MoE run-segmented scan (mixtral.py); the
rope/chunk vs nope/global attention split rides a per-layer flag with
``lax.cond`` between two statically-masked attention calls (gemma.py
idiom), using the kernels' ``chunk_attn`` masking.
"""
from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.attention import (AttentionMetadata, paged_attention,
                                     write_kv)
from aphrodite_tpu.layers.common import rms_norm
from aphrodite_tpu.layers.linear import apply_linear
from aphrodite_tpu.layers.rotary import apply_rope_interleaved
from aphrodite_tpu.models.mixtral import MixtralForCausalLM


def _l2norm(x, eps=1e-6):
    xf = x.astype(jnp.float32)
    return (xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps)
            ).astype(x.dtype)


class Llama4ForCausalLM(MixtralForCausalLM):

    shared_gate = False

    def __init__(self, config):
        hf = config.text_config
        super().__init__(config)
        self.top_k = getattr(hf, "num_experts_per_tok", 1)
        self.norm_topk = False
        # Shared expert (no router gate) at the experts' width.
        self.shared_intermediate = self.intermediate_size
        self.dense_intermediate = getattr(hf, "intermediate_size_mlp",
                                          hf.intermediate_size)
        self.chunk_attn = getattr(hf, "attention_chunk_size", None)
        self.use_qk_norm = getattr(hf, "use_qk_norm", True)
        self.temp_tuning = getattr(hf, "attn_temperature_tuning", True)
        self.floor_scale = float(getattr(hf, "floor_scale", 8192))
        self.attn_scale = float(getattr(hf, "attn_scale", 0.1))
        # no_rope_layers: 1 = rope (chunked local), 0 = NoPE (global).
        nrl = getattr(hf, "no_rope_layers", None)
        if not nrl:
            nrl = [0 if (i + 1) % 4 == 0 else 1
                   for i in range(self.num_layers)]
        self._rope_flags = np.asarray(nrl, np.float32)

    def _init_layer_kinds(self, hf) -> None:
        step = getattr(hf, "interleave_moe_layer_step", 1) or 1
        self.layer_kinds = ["moe" if (i + 1) % step == 0 else "dense"
                            for i in range(self.num_layers)]
        self.mixed = "dense" in self.layer_kinds
        self.runs, off = [], {"dense": 0, "moe": 0}
        for i, kind in enumerate(self.layer_kinds):
            if self.runs and self.runs[-1][0] == kind:
                k, s, _, ks = self.runs[-1]
                self.runs[-1] = (k, s, i + 1, ks)
            else:
                self.runs.append((kind, i, i + 1, off[kind]))
            off[kind] += 1
        self.num_dense = off["dense"]
        self.num_moe = off["moe"]
        self.kind_pos, off2 = [], {"dense": 0, "moe": 0}
        for kind in self.layer_kinds:
            self.kind_pos.append(off2[kind])
            off2[kind] += 1

    # ------------------------------------------------------------------ params
    def _layer_shapes(self) -> dict[str, tuple]:
        shapes = super()._layer_shapes()
        shapes["use_rope"] = (self.num_layers,)
        return shapes

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        """Llama4 expert weights ship as dense [E, ...] tensors
        (experts.gate_up_proj / experts.down_proj) — route them directly;
        everything else follows the mixtral/llama path."""
        fused: dict[tuple, np.ndarray] = {}

        def split(ws):
            for name, w in ws:
                if name.startswith("language_model."):
                    name = name[len("language_model."):]
                key = None
                if name.endswith(".experts.gate_up_proj"):
                    key = "gate_up_proj"
                elif name.endswith(".experts.down_proj"):
                    key = "down_proj"
                elif name.endswith(".router.weight"):
                    key = "router"
                elif ".shared_expert." in name:
                    key = name.split(".")[-2] + "_s"
                if key is not None:
                    li = int(name.split(".")[2])
                    fused[(li, key)] = np.asarray(w)
                    continue
                # Dense-layer MLP lives under feed_forward.*
                name = name.replace(".feed_forward.gate_proj.",
                                    ".mlp.gate_proj.")
                name = name.replace(".feed_forward.up_proj.",
                                    ".mlp.up_proj.")
                name = name.replace(".feed_forward.down_proj.",
                                    ".mlp.down_proj.")
                yield name, w

        params = super().load_weights(split(weights))
        target = params["embed"].dtype
        Lm = self.num_moe if self.mixed else self.num_layers
        moe_grp = params["moe"] if self.mixed else params["layers"]
        I = self.intermediate_size
        for (li, key), w in fused.items():
            ki = self.kind_pos[li] if self.mixed else li
            if key == "gate_up_proj":       # [E, H, 2I] dense tensor
                moe_grp["we_gate"][ki] = w[:, :, :I].astype(target)
                moe_grp["we_up"][ki] = w[:, :, I:].astype(target)
            elif key == "down_proj" and w.ndim == 3:  # [E, I, H]
                moe_grp["we_down"][ki] = w.astype(target)
            elif key == "router":
                moe_grp["router"][ki] = w.T.astype(target)
            elif key == "gate_proj_s":
                moe_grp["ws_gate"][ki] = w.T.astype(target)
            elif key == "up_proj_s":
                moe_grp["ws_up"][ki] = w.T.astype(target)
            elif key == "down_proj_s":
                moe_grp["ws_down"][ki] = w.T.astype(target)
        params["layers"]["use_rope"] = self._rope_flags.astype(target)
        return params

    def init_dummy_params(self, rng: jax.Array) -> dict:
        params = super().init_dummy_params(rng)
        params["layers"]["use_rope"] = jnp.asarray(self._rope_flags,
                                                   self.dtype)
        return params

    def param_specs(self) -> dict:
        specs = super().param_specs()
        specs["layers"]["use_rope"] = P()
        return specs

    # ----------------------------------------------------------------- forward
    def apply(self, params: dict, input_ids: jax.Array, kv_cache: jax.Array,
              md: AttentionMetadata, *, use_pallas: bool = False,
              lora: dict | None = None, mm=None):
        if lora is not None:
            raise NotImplementedError("LoRA on Llama4: follow-up")
        if self.pp_size > 1:
            raise NotImplementedError("PP on Llama4: follow-up")
        x = jnp.take(params["embed"], input_ids, axis=0)
        if mm is not None:
            mm_embeds, mm_idx = mm
            x = x.at[mm_idx].set(mm_embeds.astype(x.dtype), mode="drop")
        T = x.shape[0]
        nq, nkv, hd = self.num_heads, self.num_kv_heads, self.head_dim
        # Llama3-scaled rope, applied pair-interleaved (HF Llama4 uses
        # complex rotation == interleaved layout).
        from aphrodite_tpu.layers.rotary import compute_cos_sin
        cos, sin = compute_cos_sin(md.token_pos, self._inv_freq,
                                   self._rope_mscale, None)
        # NoPE attention-temperature tuning term (per token).
        attn_temp = jnp.log(
            jnp.floor(md.token_pos.astype(jnp.float32)
                      / self.floor_scale) + 1.0) * self.attn_scale + 1.0

        def layer(x, xs):
            lp, kvc = xs
            h = rms_norm(x, lp["input_norm"], self.rms_eps)
            q = apply_linear(h, lp["wq"]).reshape(T, nq, hd)
            k = apply_linear(h, lp["wk"]).reshape(T, nkv, hd)
            v = apply_linear(h, lp["wv"]).reshape(T, nkv, hd)
            use_rope = lp["use_rope"] > 0

            def rope_branch(q, k):
                qr = apply_rope_interleaved(q, cos, sin)
                kr = apply_rope_interleaved(k, cos, sin)
                if self.use_qk_norm:
                    qr, kr = _l2norm(qr), _l2norm(kr)
                return qr, kr

            def nope_branch(q, k):
                if self.temp_tuning:
                    q = (q.astype(jnp.float32)
                         * attn_temp[:, None, None]).astype(q.dtype)
                return q, k

            q, k = jax.lax.cond(use_rope, rope_branch, nope_branch, q, k)
            kvc = write_kv(kvc, k, v, md.slot_mapping)
            if self.chunk_attn is not None:
                o = jax.lax.cond(
                    use_rope,
                    lambda: paged_attention(q, kvc, md, self.scale,
                                            chunk_attn=self.chunk_attn,
                                            use_pallas=use_pallas),
                    lambda: paged_attention(q, kvc, md, self.scale,
                                            use_pallas=use_pallas))
            else:
                o = paged_attention(q, kvc, md, self.scale,
                                    use_pallas=use_pallas)
            x = self._sp(x + apply_linear(o.reshape(T, nq * hd), lp["wo"]))
            h = rms_norm(x, lp["post_norm"], self.rms_eps)
            x = self._sp(x + self._mlp(h, lp))
            return x, kvc

        x, kv_cache = self._scan_stack(layer, x, params["layers"], kv_cache,
                                       params)
        x = rms_norm(x, params["final_norm"], self.rms_eps)
        return x, kv_cache

    def _mlp(self, h: jax.Array, lp: dict, lin=None) -> jax.Array:
        if "router" not in lp:  # dense layer
            from aphrodite_tpu.models.llama import LlamaForCausalLM
            return LlamaForCausalLM._mlp(self, h, lp, lin=lin)
        # Llama4 MoE: top-1 sigmoid routing scaling the expert INPUT.
        logits = jnp.dot(h.astype(jnp.float32),
                         lp["router"].astype(jnp.float32))  # [T, E]
        topv, topi = jax.lax.top_k(logits, self.top_k)
        sel = jnp.sum(jax.nn.one_hot(topi, self.num_experts,
                                     dtype=jnp.float32), axis=1)  # [T, E]
        gates = jax.nn.sigmoid(logits) * sel  # [T, E]

        def expert(acc, xs):
            wg, wu, wd, e = xs
            hin = h * jnp.take(gates, e, axis=1)[:, None].astype(h.dtype)
            y = self.act(apply_linear(hin, wg), apply_linear(hin, wu))
            return acc + apply_linear(y, wd), None

        acc, _ = jax.lax.scan(
            expert, jnp.zeros_like(h),
            (lp["we_gate"], lp["we_up"], lp["we_down"],
             jnp.arange(self.num_experts, dtype=jnp.int32)))
        s = self.act(apply_linear(h, lp["ws_gate"]),
                     apply_linear(h, lp["ws_up"]))
        return acc + apply_linear(s, lp["ws_down"])


class Llama4VisionTower:
    """Functional Llama4VisionModel: unfold-conv patches, CLS appended
    LAST, learned positions, 2-D complex rope (CLS rope-free), LN
    attention blocks, pixel shuffle + 2-layer GELU adapter."""

    def __init__(self, vc, dtype) -> None:
        self.dtype = dtype
        self.hidden = vc.hidden_size
        self.layers = vc.num_hidden_layers
        self.heads = vc.num_attention_heads
        self.head_dim = self.hidden // self.heads
        self.intermediate = vc.intermediate_size
        self.patch = vc.patch_size
        self.image_size = vc.image_size
        self.grid = vc.image_size // vc.patch_size
        self.ratio = float(getattr(vc, "pixel_shuffle_ratio", 0.5))
        self.proj_in = getattr(vc, "projector_input_dim", 4096)
        self.proj_out = getattr(vc, "projector_output_dim", 4096)
        self.eps = getattr(vc, "norm_eps", 1e-5)
        g = self.grid
        # 2-D rope table (HF Llama4VisionRotaryEmbedding): complex angles
        # [P+1, head_dim/2]; the CLS row is masked to angle 0.
        idx = np.arange(g * g)
        fx, fy = (idx % g).astype(np.float64), (idx // g).astype(np.float64)
        fd = self.head_dim // 2
        rf = 1.0 / (getattr(vc, "rope_theta", 10000.0)
                    ** (np.arange(0, fd, 2)[: fd // 2] / fd))
        ax = np.repeat((fx[:, None] + 1) * rf[None, :], 2, axis=-1)
        ay = np.repeat((fy[:, None] + 1) * rf[None, :], 2, axis=-1)
        ang = np.concatenate([ax, ay], axis=-1)[:, ::2]  # [P, hd/2]
        ang = np.concatenate([ang, np.zeros((1, ang.shape[1]))], axis=0)
        self._cos = np.cos(ang)
        self._sin = np.sin(ang)

    def shapes(self) -> dict:
        D, I, L, ps = self.hidden, self.intermediate, self.layers, self.patch
        P_ = self.grid * self.grid
        r2 = int(1 / self.ratio) ** 2
        return {
            "patch_w": (3 * ps * ps, D),
            "cls": (D,),
            "pos": (P_ + 1, D),
            "ln_pre_w": (D,), "ln_pre_b": (D,),
            "ln_post_w": (D,), "ln_post_b": (D,),
            "layers": {
                "ln1_w": (L, D), "ln1_b": (L, D),
                "wq": (L, D, D), "bq": (L, D),
                "wk": (L, D, D), "bk": (L, D),
                "wv": (L, D, D), "bv": (L, D),
                "wo": (L, D, D), "bo": (L, D),
                "ln2_w": (L, D), "ln2_b": (L, D),
                "fc1_w": (L, D, I), "fc1_b": (L, I),
                "fc2_w": (L, I, D), "fc2_b": (L, D),
            },
            # vision_adapter: pixel shuffle -> mlp (fc1, fc2; gelu after
            # both), then the multi-modal projector handles text width.
            "ad_fc1": (D * r2, self.proj_in),
            "ad_fc2": (self.proj_out, self.proj_out),
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
                elif k.startswith("ln") and k.endswith("_w"):
                    out[k] = jnp.ones(s, self.dtype)
                elif k.endswith("_b") or k.startswith("b"):
                    out[k] = jnp.zeros(s, self.dtype)
                else:
                    out[k] = (0.02 * jax.random.normal(
                        next(keys), s, jnp.float32)).astype(self.dtype)
            return out
        return fill(self.shapes())

    _TOP = {
        "patch_embedding.linear.weight": ("patch_w", True),
        "class_embedding": ("cls", False),
        "positional_embedding_vlm": ("pos", False),
        "layernorm_pre.weight": ("ln_pre_w", False),
        "layernorm_pre.bias": ("ln_pre_b", False),
        "layernorm_post.weight": ("ln_post_w", False),
        "layernorm_post.bias": ("ln_post_b", False),
        "vision_adapter.mlp.fc1.weight": ("ad_fc1", True),
        "vision_adapter.mlp.fc2.weight": ("ad_fc2", True),
    }
    _LAYER = {
        "input_layernorm.weight": ("ln1_w", False),
        "input_layernorm.bias": ("ln1_b", False),
        "self_attn.q_proj.weight": ("wq", True),
        "self_attn.q_proj.bias": ("bq", False),
        "self_attn.k_proj.weight": ("wk", True),
        "self_attn.k_proj.bias": ("bk", False),
        "self_attn.v_proj.weight": ("wv", True),
        "self_attn.v_proj.bias": ("bv", False),
        "self_attn.o_proj.weight": ("wo", True),
        "self_attn.o_proj.bias": ("bo", False),
        "post_attention_layernorm.weight": ("ln2_w", False),
        "post_attention_layernorm.bias": ("ln2_b", False),
        "mlp.fc1.weight": ("fc1_w", True),
        "mlp.fc1.bias": ("fc1_b", False),
        "mlp.fc2.weight": ("fc2_w", True),
        "mlp.fc2.bias": ("fc2_b", False),
    }

    def load_hf(self, name: str, w: np.ndarray, bufs: dict, target) -> bool:
        m = self._TOP.get(name)
        if m is not None:
            key, tr = m
            dst = bufs[key]
            dst[...] = (w.T if tr else w.reshape(dst.shape)).astype(target)
            return True
        if name.startswith("model.layers."):
            rest = name[len("model.layers."):]
            idx_s, sub = rest.split(".", 1)
            mm = self._LAYER.get(sub)
            if mm is None:
                return False
            key, tr = mm
            bufs["layers"][key][int(idx_s)] = (w.T if tr else w
                                               ).astype(target)
            return True
        return False

    def encode(self, vp: dict, pixel_values: jax.Array) -> jax.Array:
        """[N,3,S,S] tiles -> adapter features [N, P*ratio^2, proj_out]."""
        N, ps, g, D = pixel_values.shape[0], self.patch, self.grid, \
            self.hidden
        x = pixel_values.astype(self.dtype)
        # Unfold: channel-major patch vectors (torch nn.Unfold layout).
        x = x.reshape(N, 3, g, ps, g, ps).transpose(0, 2, 4, 1, 3, 5)
        x = x.reshape(N, g * g, 3 * ps * ps)
        x = jnp.einsum("npc,cd->npd", x, vp["patch_w"],
                       preferred_element_type=jnp.float32
                       ).astype(self.dtype)
        cls = jnp.broadcast_to(vp["cls"], (N, 1, D)).astype(x.dtype)
        x = jnp.concatenate([x, cls], axis=1)  # CLS appended LAST
        x = x + vp["pos"][None].astype(x.dtype)

        def _ln(v, w, b):
            vf = v.astype(jnp.float32)
            mu = jnp.mean(vf, -1, keepdims=True)
            var = jnp.var(vf, -1, keepdims=True)
            return ((vf - mu) * jax.lax.rsqrt(var + self.eps) * w + b
                    ).astype(v.dtype)

        x = _ln(x, vp["ln_pre_w"], vp["ln_pre_b"])
        nh, hd = self.heads, self.head_dim
        T = x.shape[1]
        cos = jnp.asarray(self._cos, jnp.float32)  # [T, hd/2]
        sin = jnp.asarray(self._sin, jnp.float32)

        def rope(t):  # [N, T, nh, hd] complex pair rotation
            tr = t.astype(jnp.float32).reshape(N, T, nh, hd // 2, 2)
            re, im = tr[..., 0], tr[..., 1]
            c = cos[None, :, None, :]
            s = sin[None, :, None, :]
            out = jnp.stack([re * c - im * s, re * s + im * c], axis=-1)
            return out.reshape(N, T, nh, hd).astype(t.dtype)

        def layer(x, lp):
            h = _ln(x, lp["ln1_w"], lp["ln1_b"])
            q = (jnp.dot(h, lp["wq"]) + lp["bq"]).reshape(N, T, nh, hd)
            k = (jnp.dot(h, lp["wk"]) + lp["bk"]).reshape(N, T, nh, hd)
            v = (jnp.dot(h, lp["wv"]) + lp["bv"]).reshape(N, T, nh, hd)
            q, k = rope(q), rope(k)
            logits = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                                preferred_element_type=jnp.float32)
            p = jax.nn.softmax(logits * (hd ** -0.5), -1).astype(x.dtype)
            o = jnp.einsum("nhqk,nkhd->nqhd", p, v).reshape(N, T, D)
            x = x + jnp.dot(o, lp["wo"]) + lp["bo"]
            h = _ln(x, lp["ln2_w"], lp["ln2_b"])
            h = jax.nn.gelu(jnp.dot(h, lp["fc1_w"]) + lp["fc1_b"],
                            approximate=False)
            x = x + jnp.dot(h, lp["fc2_w"]) + lp["fc2_b"]
            return x, None

        x, _ = jax.lax.scan(layer, x, vp["layers"])
        x = _ln(x, vp["ln_post_w"], vp["ln_post_b"])
        x = x[:, :-1]  # drop CLS
        # pixel shuffle (HF pixel_shuffle with ratio r)
        r = self.ratio
        gh = g
        x = x.reshape(N, gh, gh, D)
        x = x.reshape(N, gh, int(gh * r), int(D / r))
        x = jnp.transpose(x, (0, 2, 1, 3))
        x = x.reshape(N, int(gh * r), int(gh * r), int(D / (r * r)))
        x = jnp.transpose(x, (0, 2, 1, 3))
        x = x.reshape(N, -1, int(D / (r * r)))
        # adapter MLP (gelu after BOTH layers)
        x = jax.nn.gelu(jnp.dot(x, vp["ad_fc1"],
                                preferred_element_type=jnp.float32
                                ).astype(x.dtype), approximate=False)
        x = jax.nn.gelu(jnp.dot(x, vp["ad_fc2"],
                                preferred_element_type=jnp.float32
                                ).astype(x.dtype), approximate=False)
        return x  # [N, P*r^2, proj_out]


class Llama4ForConditionalGeneration(Llama4ForCausalLM):
    """Llama 4 multimodal: vision tower + linear projector over the text
    decoder; image features replace placeholder tokens (scatter path)."""

    is_multimodal = True

    def __init__(self, config):
        super().__init__(config)
        hf = config.hf_config
        self.vision = Llama4VisionTower(hf.vision_config, self.dtype)
        self.image_token_id = getattr(hf, "image_token_index", 200092)

    def _proj_shapes(self):
        return {"w": (getattr(self.config.hf_config.vision_config,
                              "vision_output_dim", self.vision.proj_out),
                      self.hidden_size)}

    def init_dummy_params(self, rng):
        params = super().init_dummy_params(rng)
        params["vision"] = self.vision.init_dummy(
            jax.random.fold_in(rng, 13))
        params["projector"] = {
            "w": (0.02 * jax.random.normal(
                jax.random.fold_in(rng, 14), self._proj_shapes()["w"],
                jnp.float32)).astype(self.dtype)}
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
                if name.startswith("vision_model."):
                    self.vision.load_hf(name[len("vision_model."):],
                                        np.asarray(w), vision_bufs, target)
                elif name == "multi_modal_projector.linear_1.weight":
                    proj["w"][...] = np.asarray(w).T.astype(target)
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
        specs["projector"] = {"w": P()}
        return specs

    def encode_images(self, params, pixel_values: jax.Array) -> jax.Array:
        feats = self.vision.encode(params["vision"], pixel_values)
        out = jnp.dot(feats, params["projector"]["w"],
                      preferred_element_type=jnp.float32).astype(feats.dtype)
        return out.reshape(-1, self.hidden_size)
