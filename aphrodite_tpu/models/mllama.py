"""MLlama (Llama 3.2 Vision): gated-tile ViT + cross-attention decoder.

Parity: aphrodite/modeling/models/mllama.py. The vision model encodes up to
``max_num_tiles`` image tiles jointly (precomputed gated tile/position
embeddings selected by aspect-ratio id, a local transformer whose
intermediate states are concatenated into ``vision_output_dim``, then a
gated global transformer); a linear projector maps tile features into the
text width. The text model is a llama stack where the layers listed in
``cross_attention_layers`` REPLACE self-attention with gated cross-attention
over the image features (per-head RMS q/k norm, tanh gates on both the
attention and MLP branches).

TPU mapping: self-attention layers scan over the paged KV cache exactly
like llama (the cache holds only the self layers); cross layers scan as
their own run segments and consume the per-request encoder-cache rows
([R, S, D] + valid lengths) shipped by the runner's cross_attn channel —
the encoder runs once per request. Requests without an image skip cross
layers entirely (HF's full_text_row_masked_out_mask semantics: both the
cross-attention output and the layer's MLP are zeroed).

Serving caveat (documented divergence): every text token cross-attends to
all of its request's image tiles, which matches HF's mask for the standard
leading-<|image|> prompt layout; per-image positional cross-masks for
images placed mid-prompt are a follow-up.
"""
from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.attention import (AttentionMetadata, paged_attention,
                                     write_kv)
from aphrodite_tpu.config import ModelConfig
from aphrodite_tpu.layers.common import ACT2MUL, rms_norm
from aphrodite_tpu.layers.linear import apply_linear
from aphrodite_tpu.layers.rotary import (RopeConfig, apply_rope,
                                         compute_cos_sin, compute_inv_freq)
from aphrodite_tpu.utils import jax_dtype


def _ln(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


class MllamaVisionTower:
    """Functional MllamaVisionModel."""

    def __init__(self, vc, dtype) -> None:
        self.dtype = dtype
        self.hidden = vc.hidden_size
        self.layers = vc.num_hidden_layers
        self.global_layers = getattr(vc, "num_global_layers", 8)
        self.heads = vc.attention_heads
        self.head_dim = self.hidden // self.heads
        self.intermediate = vc.intermediate_size
        self.patch = vc.patch_size
        self.image_size = vc.image_size
        self.grid = vc.image_size // vc.patch_size
        self.max_tiles = getattr(vc, "max_num_tiles", 4)
        self.max_ar_id = getattr(vc, "max_aspect_ratio_id", 8)
        self.inter_idx = tuple(getattr(vc, "intermediate_layers_indices",
                                       (3, 7, 15, 23, 30)))
        self.eps = getattr(vc, "norm_eps", 1e-5)
        self.num_patches = self.grid * self.grid + 1
        # Pad the per-tile sequence to a multiple of 8 (HF forward).
        self.pad_patches = (8 - self.num_patches % 8) % 8
        self.out_dim = self.hidden * (1 + len(self.inter_idx))

    def _enc_shapes(self, L, gated: bool):
        D, I = self.hidden, self.intermediate
        shapes = {
            "ln1_w": (L, D), "ln1_b": (L, D),
            "wq": (L, D, D), "wk": (L, D, D), "wv": (L, D, D),
            "wo": (L, D, D),
            "ln2_w": (L, D), "ln2_b": (L, D),
            "fc1_w": (L, D, I), "fc1_b": (L, I),
            "fc2_w": (L, I, D), "fc2_b": (L, D),
        }
        if gated:
            shapes.update(gate_attn=(L,), gate_ffn=(L,))
        return shapes

    def shapes(self) -> dict:
        D, P_, MT = self.hidden, self.num_patches, self.max_tiles
        A = self.max_ar_id + 1
        return {
            "patch_w": (3 * self.patch * self.patch, D),
            "cls": (D,),
            "pos_embed": (P_, D),
            "pos_gate": (1,),
            "tile_pos_embed": (A, MT * P_ * D),
            "pre_tile_embed": (A, MT * D),
            "pre_tile_gate": (1,),
            "post_tile_embed": (A, MT * D),
            "post_tile_gate": (1,),
            "ln_pre_w": (D,), "ln_pre_b": (D,),
            "ln_post_w": (D,), "ln_post_b": (D,),
            "layers": self._enc_shapes(self.layers, False),
            "global_layers": self._enc_shapes(self.global_layers, True),
        }

    def make_bufs(self, target) -> dict:
        def mk(shapes):
            return {k: mk(v) if isinstance(v, dict) else np.zeros(v, target)
                    for k, v in shapes.items()}
        return mk(self.shapes())

    def init_dummy(self, rng: jax.Array) -> dict:
        keys = iter(jax.random.split(rng, 64))

        def fill(shapes):
            out = {}
            for k, s in shapes.items():
                if isinstance(s, dict):
                    out[k] = fill(s)
                elif k.startswith("ln") and k.endswith("_w"):
                    out[k] = jnp.ones(s, self.dtype)
                elif k.endswith("_b") or "gate" in k:
                    out[k] = jnp.zeros(s, self.dtype)
                else:
                    out[k] = (0.02 * jax.random.normal(
                        next(keys), s, jnp.float32)).astype(self.dtype)
            return out
        return fill(self.shapes())

    _TOP = {
        "patch_embedding.weight": ("patch_w", "conv"),
        "class_embedding": ("cls", None),
        "gated_positional_embedding.embedding": ("pos_embed", None),
        "gated_positional_embedding.gate": ("pos_gate", None),
        "gated_positional_embedding.tile_embedding.weight":
            ("tile_pos_embed", None),
        "pre_tile_positional_embedding.embedding.weight":
            ("pre_tile_embed", None),
        "pre_tile_positional_embedding.gate": ("pre_tile_gate", None),
        "post_tile_positional_embedding.embedding.weight":
            ("post_tile_embed", None),
        "post_tile_positional_embedding.gate": ("post_tile_gate", None),
        "layernorm_pre.weight": ("ln_pre_w", None),
        "layernorm_pre.bias": ("ln_pre_b", None),
        "layernorm_post.weight": ("ln_post_w", None),
        "layernorm_post.bias": ("ln_post_b", None),
    }
    _LAYER = {
        "input_layernorm.weight": ("ln1_w", False),
        "input_layernorm.bias": ("ln1_b", False),
        "self_attn.q_proj.weight": ("wq", True),
        "self_attn.k_proj.weight": ("wk", True),
        "self_attn.v_proj.weight": ("wv", True),
        "self_attn.o_proj.weight": ("wo", True),
        "post_attention_layernorm.weight": ("ln2_w", False),
        "post_attention_layernorm.bias": ("ln2_b", False),
        "mlp.fc1.weight": ("fc1_w", True),
        "mlp.fc1.bias": ("fc1_b", False),
        "mlp.fc2.weight": ("fc2_w", True),
        "mlp.fc2.bias": ("fc2_b", False),
        "gate_attn": ("gate_attn", False),
        "gate_ffn": ("gate_ffn", False),
    }

    def load_hf(self, name: str, w: np.ndarray, bufs: dict, target) -> bool:
        m = self._TOP.get(name)
        if m is not None:
            key, kind = m
            if kind == "conv":
                w = w.reshape(w.shape[0], -1).T
            bufs[key][...] = w.reshape(bufs[key].shape).astype(target)
            return True
        for prefix, grp in (("transformer.layers.", "layers"),
                            ("global_transformer.layers.",
                             "global_layers")):
            if name.startswith(prefix):
                rest = name[len(prefix):]
                idx_s, sub = rest.split(".", 1)
                mm = self._LAYER.get(sub)
                if mm is None or mm[0] not in bufs[grp]:
                    return False
                key, tr = mm
                dst = bufs[grp][key]
                dst[int(idx_s)] = (w.T if tr else
                                   w.reshape(dst.shape[1:])).astype(target)
                return True
        return False

    def _encoder(self, x, mask_bias, stack, gated: bool, collect=()):
        """x [B, T, D]; returns (x, {idx: hidden_state_before_layer_idx+1})."""
        nh, hd = self.heads, self.head_dim
        B, T, D = x.shape
        inter = {}
        idx = 0

        # Python loop (not scan) so intermediate layer outputs can be
        # collected; vision towers are shallow relative to the LM.
        L = (stack["ln1_w"]).shape[0]
        for i in range(L):
            lp = jax.tree.map(lambda a: a[i], stack)
            h = _ln(x, lp["ln1_w"], lp["ln1_b"], self.eps)
            q = jnp.dot(h, lp["wq"]).reshape(B, T, nh, hd)
            k = jnp.dot(h, lp["wk"]).reshape(B, T, nh, hd)
            v = jnp.dot(h, lp["wv"]).reshape(B, T, nh, hd)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            logits = logits * (hd ** -0.5) + mask_bias
            p = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, T, D)
            o = jnp.dot(o, lp["wo"])
            if gated:
                o = jnp.tanh(lp["gate_attn"]) * o
            x = x + o
            h = _ln(x, lp["ln2_w"], lp["ln2_b"], self.eps)
            h = jax.nn.gelu(jnp.dot(h, lp["fc1_w"]) + lp["fc1_b"],
                            approximate=False)
            h = jnp.dot(h, lp["fc2_w"]) + lp["fc2_b"]
            if gated:
                h = jnp.tanh(lp["gate_ffn"]) * h
            x = x + h
            idx += 1
            if idx in collect:
                inter[idx] = x
        return x, inter

    def encode(self, vp: dict, pixel_values: jax.Array,
               aspect_ratio_ids: jax.Array, tile_mask: jax.Array
               ) -> jax.Array:
        """pixel_values [N, MT, 3, S, S]; aspect_ratio_ids [N];
        tile_mask [N, MT] (1 = real tile) -> [N, MT, P, out_dim]."""
        N, MT = pixel_values.shape[0], self.max_tiles
        ps, g, D = self.patch, self.grid, self.hidden
        P_ = self.num_patches
        x = pixel_values.astype(self.dtype)
        x = x.reshape(N * MT, 3, g, ps, g, ps).transpose(0, 2, 4, 1, 3, 5)
        x = x.reshape(N * MT, g * g, 3 * ps * ps)
        x = jnp.einsum("npc,cd->npd", x, vp["patch_w"],
                       preferred_element_type=jnp.float32
                       ).astype(self.dtype)
        # pre-tile positional embedding (gated, per aspect-ratio id)
        x = x.reshape(N, MT, g * g, D)
        pre = jnp.take(vp["pre_tile_embed"], aspect_ratio_ids, axis=0
                       ).reshape(N, MT, 1, D)
        x = x + jnp.tanh(vp["pre_tile_gate"]) * pre.astype(x.dtype)
        # class token
        cls = jnp.broadcast_to(vp["cls"], (N, MT, 1, D)).astype(x.dtype)
        x = jnp.concatenate([cls, x.reshape(N, MT, g * g, D)], axis=2)
        # gated position embeddings
        gate = jnp.tanh(vp["pos_gate"])
        x = x + ((1 - gate) * vp["pos_embed"]).astype(x.dtype)[None, None]
        tile_pos = jnp.take(vp["tile_pos_embed"], aspect_ratio_ids, axis=0
                            ).reshape(N, MT, P_, D)
        x = x + (gate * tile_pos).astype(x.dtype)
        x = _ln(x, vp["ln_pre_w"], vp["ln_pre_b"], self.eps)
        # pad patches to a multiple of 8
        pad = self.pad_patches
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        T_tile = P_ + pad
        # HF mask: position invalid if pad tile or pad patch; bias[q,k] =
        # min iff BOTH are invalid (_prepare_aspect_ratio_attention_mask).
        valid = jnp.broadcast_to(tile_mask[:, :, None].astype(jnp.float32),
                                 (N, MT, T_tile))
        if pad:
            valid = valid.at[:, :, -pad:].set(0.0)
        inv = (1.0 - valid).reshape(N, MT * T_tile)
        bias = (inv[:, :, None] * inv[:, None, :]) * -1e9
        bias = bias[:, None]  # [N, 1, T, T]

        x = x.reshape(N, MT * T_tile, D)
        x, inter = self._encoder(
            x, bias, vp["layers"], False,
            collect={i + 1 for i in self.inter_idx})
        inter = [inter[i + 1] for i in self.inter_idx]
        x = _ln(x, vp["ln_post_w"], vp["ln_post_b"], self.eps)
        # post-tile embedding + global transformer
        x = x.reshape(N, MT, T_tile, D)
        post = jnp.take(vp["post_tile_embed"], aspect_ratio_ids, axis=0
                        ).reshape(N, MT, 1, D)
        x = x + jnp.tanh(vp["post_tile_gate"]) * post.astype(x.dtype)
        x = x.reshape(N, MT * T_tile, D)
        x, _ = self._encoder(x, bias, vp["global_layers"], True)
        x = x.reshape(N, MT, T_tile, D)[:, :, :P_]
        inter = jnp.concatenate(
            [h.reshape(N, MT, T_tile, D)[:, :, :P_] for h in inter],
            axis=-1)
        return jnp.concatenate([x, inter], axis=-1)  # [N, MT, P, out_dim]


class MllamaForConditionalGeneration:

    is_multimodal = True
    mm_kind = "cross_attn"
    mm_rows_per_item = None
    mm_needs_extra = True
    pp_size = 1
    mesh = None
    sequence_parallel = False
    quant_fmt = None
    is_ssm = False

    def __init__(self, config: ModelConfig):
        self.config = config
        hf = config.hf_config
        tc = config.text_config
        self.dtype = jax_dtype(config.dtype)
        self.hidden_size = tc.hidden_size
        self.total_layers = tc.num_hidden_layers
        self.cross_idx = set(tc.cross_attention_layers)
        self.num_heads = tc.num_attention_heads
        self.num_kv_heads = tc.num_key_value_heads
        self.head_dim = self.hidden_size // self.num_heads
        self.intermediate_size = tc.intermediate_size
        self.vocab_size = tc.vocab_size
        self.rms_eps = getattr(tc, "rms_norm_eps", 1e-5)
        self.act = ACT2MUL[getattr(tc, "hidden_act", "silu")]
        self.tie_embeddings = getattr(tc, "tie_word_embeddings", False)
        self.scale = self.head_dim ** -0.5
        self.sliding_window = None
        self.rope = RopeConfig.from_hf_config(tc, self.head_dim)
        inv_freq, mscale = compute_inv_freq(self.rope)
        self._inv_freq = jnp.asarray(inv_freq)
        self._rope_mscale = mscale
        self.vision = MllamaVisionTower(hf.vision_config, self.dtype)
        self.image_token_id = getattr(hf, "image_token_index", 128256)
        # Layer layout: self layers hold the paged KV cache.
        self.layer_kinds = ["cross" if i in self.cross_idx else "self"
                            for i in range(self.total_layers)]
        self.runs, counts = [], {"self": 0, "cross": 0}
        self.kind_pos = []
        for i, kind in enumerate(self.layer_kinds):
            self.kind_pos.append(counts[kind])
            if self.runs and self.runs[-1][0] == kind:
                k, s, _, ks = self.runs[-1]
                self.runs[-1] = (k, s, i + 1, ks)
            else:
                self.runs.append((kind, i, i + 1, counts[kind]))
            counts[kind] += 1
        self.num_self = counts["self"]
        self.num_cross = counts["cross"]
        # The runner sizes the paged cache as [num_layers, ...]: only the
        # self-attention layers cache KV.
        self.num_layers = self.num_self
        self._encode_cache: dict = {}

    def set_quant_config(self, qcfg) -> None:
        raise NotImplementedError("quantized MLlama: follow-up")

    # ------------------------------------------------------------------ params
    def _self_shapes(self):
        H, nq, nkv, hd = (self.hidden_size, self.num_heads,
                          self.num_kv_heads, self.head_dim)
        L, I = self.num_self, self.intermediate_size
        return {
            "input_norm": (L, H), "post_norm": (L, H),
            "wq": (L, H, nq * hd), "wk": (L, H, nkv * hd),
            "wv": (L, H, nkv * hd), "wo": (L, nq * hd, H),
            "w_gate": (L, H, I), "w_up": (L, H, I), "w_down": (L, I, H),
        }

    def _cross_shapes(self):
        H, nq, nkv, hd = (self.hidden_size, self.num_heads,
                          self.num_kv_heads, self.head_dim)
        L, I = self.num_cross, self.intermediate_size
        return {
            "input_norm": (L, H), "post_norm": (L, H),
            "wq": (L, H, nq * hd), "wk": (L, H, nkv * hd),
            "wv": (L, H, nkv * hd), "wo": (L, nq * hd, H),
            "q_norm": (L, hd), "k_norm": (L, hd),
            "attn_gate": (L,), "mlp_gate": (L,),
            "w_gate": (L, H, I), "w_up": (L, H, I), "w_down": (L, I, H),
        }

    def _proj_shapes(self):
        return {"w": (self.vision.out_dim, self.hidden_size),
                "b": (self.hidden_size,)}

    def init_dummy_params(self, rng: jax.Array) -> dict:
        keys = iter(jax.random.split(rng, 128))

        def mk(shape):
            return (0.02 * jax.random.normal(next(keys), shape, jnp.float32)
                    ).astype(self.dtype)

        def fill(shapes):
            out = {}
            for k, s in shapes.items():
                if "norm" in k:
                    out[k] = jnp.ones(s, self.dtype)
                elif "gate" in k and len(s) == 1:
                    out[k] = jnp.zeros(s, self.dtype)
                else:
                    out[k] = mk(s)
            return out

        params = {
            "embed": mk((self.vocab_size + 8, self.hidden_size)),
            "layers": fill(self._self_shapes()),
            "cross_layers": fill(self._cross_shapes()),
            "final_norm": jnp.ones((self.hidden_size,), self.dtype),
            "vision": self.vision.init_dummy(next(keys)),
            "projector": {"w": mk(self._proj_shapes()["w"]),
                          "b": jnp.zeros((self.hidden_size,), self.dtype)},
        }
        if not self.tie_embeddings:
            params["lm_head"] = mk((self.hidden_size, self.vocab_size))
        return params

    _SELF_MAP = {
        "self_attn.q_proj.weight": ("wq", True),
        "self_attn.k_proj.weight": ("wk", True),
        "self_attn.v_proj.weight": ("wv", True),
        "self_attn.o_proj.weight": ("wo", True),
        "mlp.gate_proj.weight": ("w_gate", True),
        "mlp.up_proj.weight": ("w_up", True),
        "mlp.down_proj.weight": ("w_down", True),
        "input_layernorm.weight": ("input_norm", False),
        "post_attention_layernorm.weight": ("post_norm", False),
    }
    _CROSS_MAP = {
        "cross_attn.q_proj.weight": ("wq", True),
        "cross_attn.k_proj.weight": ("wk", True),
        "cross_attn.v_proj.weight": ("wv", True),
        "cross_attn.o_proj.weight": ("wo", True),
        "cross_attn.q_norm.weight": ("q_norm", False),
        "cross_attn.k_norm.weight": ("k_norm", False),
        "cross_attn_attn_gate": ("attn_gate", False),
        "cross_attn_mlp_gate": ("mlp_gate", False),
        "mlp.gate_proj.weight": ("w_gate", True),
        "mlp.up_proj.weight": ("w_up", True),
        "mlp.down_proj.weight": ("w_down", True),
        "input_layernorm.weight": ("input_norm", False),
        "post_attention_layernorm.weight": ("post_norm", False),
    }

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        self_bufs = {k: np.zeros(s, target)
                     for k, s in self._self_shapes().items()}
        cross_bufs = {k: np.zeros(s, target)
                      for k, s in self._cross_shapes().items()}
        vision_bufs = self.vision.make_bufs(target)
        proj = {k: np.zeros(s, target)
                for k, s in self._proj_shapes().items()}
        params: dict = {"layers": self_bufs, "cross_layers": cross_bufs,
                        "vision": vision_bufs, "projector": proj}
        for name, w in weights:
            w = np.asarray(w)
            if name.startswith("model."):
                name = name[len("model."):]
            if name.startswith("vision_model."):
                self.vision.load_hf(name[len("vision_model."):], w,
                                    vision_bufs, target)
                continue
            if name == "multi_modal_projector.weight":
                proj["w"][...] = w.T.astype(target)
                continue
            if name == "multi_modal_projector.bias":
                proj["b"][...] = w.astype(target)
                continue
            if name.startswith("language_model."):
                name = name[len("language_model."):]
            if name.startswith("model."):
                name = name[len("model."):]
            if name == "embed_tokens.weight":
                params["embed"] = w.astype(target)
            elif name == "norm.weight":
                params["final_norm"] = w.astype(target)
            elif name == "lm_head.weight":
                if not self.tie_embeddings:
                    params["lm_head"] = w.T.astype(target)
            elif name.startswith("layers."):
                idx_s, sub = name[len("layers."):].split(".", 1)
                li = int(idx_s)
                ki = self.kind_pos[li]
                if self.layer_kinds[li] == "cross":
                    m = self._CROSS_MAP.get(sub)
                    bufs = cross_bufs
                else:
                    m = self._SELF_MAP.get(sub)
                    bufs = self_bufs
                if m is not None and m[0] in bufs:
                    key, tr = m
                    dst = bufs[key]
                    dst[ki] = (w.T if tr else
                               w.reshape(dst.shape[1:])).astype(target)
        if "embed" not in params:
            raise ValueError("checkpoint missing embed_tokens.weight")
        return params

    def param_specs(self) -> dict:
        def stack(shapes):
            out = {}
            for k in shapes:
                if k in ("wq", "wk", "wv", "w_gate", "w_up"):
                    out[k] = P(None, None, "tp")
                elif k in ("wo", "w_down"):
                    out[k] = P(None, "tp", None)
                else:
                    out[k] = P()
            return out
        specs = {
            "embed": P("tp", None),
            "layers": stack(self._self_shapes()),
            "cross_layers": stack(self._cross_shapes()),
            "final_norm": P(),
            "vision": jax.tree.map(lambda _: P(), self.vision.shapes(),
                                   is_leaf=lambda x: isinstance(x, tuple)),
            "projector": {"w": P(), "b": P()},
        }
        if not self.tie_embeddings:
            specs["lm_head"] = P(None, "tp")
        return specs

    # ----------------------------------------------------------------- encoder
    def encode_media(self, params, pixel_values, aspect_ratio_ids=None,
                     num_tiles=None, **_) -> jax.Array:
        """pixel_values [N_img, MT, 3, S, S] -> flat [rows, H] projected
        tile features (valid tiles only, images in prompt order)."""
        N = int(pixel_values.shape[0])
        key = N
        fn = self._encode_cache.get(key)
        if fn is None:
            def enc(params, pv, ar_ids, tile_mask):
                feats = self.vision.encode(params["vision"], pv, ar_ids,
                                           tile_mask)
                pp = params["projector"]
                return jnp.dot(feats, pp["w"],
                               preferred_element_type=jnp.float32
                               ).astype(feats.dtype) + pp["b"]
            fn = jax.jit(enc)
            self._encode_cache[key] = fn
        MT = self.vision.max_tiles
        nt = np.asarray(num_tiles, np.int32)
        tile_mask = (np.arange(MT)[None] < nt[:, None]).astype(np.float32)
        feats = fn(params, pixel_values, jnp.asarray(aspect_ratio_ids),
                   jnp.asarray(tile_mask))  # [N, MT, P, H]
        rows = []
        P_ = self.vision.num_patches
        for i in range(N):
            rows.append(feats[i, :int(nt[i])].reshape(-1,
                                                      self.hidden_size))
        return rows[0] if N == 1 else jnp.concatenate(rows)

    # ----------------------------------------------------------------- forward
    def apply(self, params: dict, input_ids: jax.Array, kv_cache: jax.Array,
              md: AttentionMetadata, *, use_pallas: bool = False,
              lora: dict | None = None, mm=None):
        if lora is not None:
            raise NotImplementedError("LoRA on MLlama: follow-up")
        T = input_ids.shape[0]
        nq, nkv, hd = self.num_heads, self.num_kv_heads, self.head_dim
        x = jnp.take(params["embed"], input_ids, axis=0)
        cos, sin = compute_cos_sin(md.token_pos, self._inv_freq,
                                   self._rope_mscale, None)
        if mm is not None:
            enc, enc_lens = mm  # [R, S, H], [R]
            lens_t = jnp.take(enc_lens, md.token_req_idx, axis=0)  # [T]
            S = enc.shape[1]
        else:
            enc = None

        def self_layer(x, xs):
            lp, kvc = xs
            h = rms_norm(x, lp["input_norm"], self.rms_eps)
            q = apply_linear(h, lp["wq"]).reshape(T, nq, hd)
            k = apply_linear(h, lp["wk"]).reshape(T, nkv, hd)
            v = apply_linear(h, lp["wv"]).reshape(T, nkv, hd)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            kvc = write_kv(kvc, k, v, md.slot_mapping)
            o = paged_attention(q, kvc, md, self.scale,
                                use_pallas=use_pallas)
            x = x + apply_linear(o.reshape(T, nq * hd), lp["wo"])
            h = rms_norm(x, lp["post_norm"], self.rms_eps)
            gate = apply_linear(h, lp["w_gate"])
            up = apply_linear(h, lp["w_up"])
            return x + apply_linear(self.act(gate, up), lp["w_down"]), kvc

        def cross_layer(x, lp):
            if enc is None:
                return x, None
            has_img = (lens_t > 0).astype(x.dtype)[:, None]
            h = rms_norm(x, lp["input_norm"], self.rms_eps)
            q = apply_linear(h, lp["wq"]).reshape(T, nq, hd)
            q = rms_norm(q, lp["q_norm"], self.rms_eps)
            ek = apply_linear(enc, lp["wk"])  # [R, S, nkv*hd]
            ev = apply_linear(enc, lp["wv"])
            ek = rms_norm(ek.reshape(enc.shape[0], S, nkv, hd),
                          lp["k_norm"], self.rms_eps)
            ev = ev.reshape(enc.shape[0], S, nkv, hd)
            ek = jnp.take(ek, md.token_req_idx, axis=0)  # [T, S, nkv, hd]
            ev = jnp.take(ev, md.token_req_idx, axis=0)
            group = nq // nkv
            qg = q.reshape(T, nkv, group, hd)
            logits = jnp.einsum("tkgd,tskd->tkgs", qg, ek,
                                preferred_element_type=jnp.float32)
            logits = logits * self.scale
            mask = jnp.arange(S)[None, None, None, :] < \
                lens_t[:, None, None, None]
            logits = jnp.where(mask, logits, -1e9)
            p = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            o = jnp.einsum("tkgs,tskd->tkgd", p, ev).reshape(T, nq * hd)
            o = apply_linear(o, lp["wo"])
            x = x + jnp.tanh(lp["attn_gate"]) * o * has_img
            h = rms_norm(x, lp["post_norm"], self.rms_eps)
            gate = apply_linear(h, lp["w_gate"])
            up = apply_linear(h, lp["w_up"])
            m = apply_linear(self.act(gate, up), lp["w_down"])
            # full_text_row_masked_out_mask: image-less rows skip the MLP.
            return x + jnp.tanh(lp["mlp_gate"]) * m * has_img, None

        for kind, s, e, ks in self.runs:
            n = e - s
            if kind == "self":
                stack = jax.tree.map(lambda a: a[ks:ks + n],
                                     params["layers"])
                x, seg = jax.lax.scan(self_layer, x,
                                      (stack, kv_cache[ks:ks + n]))
                kv_cache = jax.lax.dynamic_update_slice_in_dim(
                    kv_cache, seg, ks, axis=0)
            else:
                stack = jax.tree.map(lambda a: a[ks:ks + n],
                                     params["cross_layers"])
                x, _ = jax.lax.scan(cross_layer, x, stack)
        x = rms_norm(x, params["final_norm"], self.rms_eps)
        return x, kv_cache

    def compute_logits(self, params: dict, hidden: jax.Array) -> jax.Array:
        head = params["embed"][:self.vocab_size].T if self.tie_embeddings \
            else params["lm_head"]
        return jnp.dot(hidden, head, preferred_element_type=jnp.float32)
