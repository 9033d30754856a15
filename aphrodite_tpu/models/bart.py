"""BART: text encoder-decoder (summarization-style conditional generation).

Parity: aphrodite/modeling/models/bart.py. Post-norm transformer on both
sides, learned positions with the +2 offset (HF BartLearnedPositionalEmbedding),
shared embeddings + tied lm_head (+ final_logits_bias). The encoder runs
ONCE per request over the encoder prompt tokens (per-request encoder cache,
``mm_kind="cross_attn"`` — the same slot Whisper's audio encoder uses, with
variable encoder lengths padded to a pow2 bucket and masked via the
per-request length channel). The decoder is an ordinary paged-KV causal
stack with per-layer cross-attention.
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
from aphrodite_tpu.models.bert import layer_norm
from aphrodite_tpu.utils import jax_dtype


class BartForConditionalGeneration:

    is_encoder_decoder = True
    is_multimodal = True  # encoder states ride the encoder-cache path
    mm_kind = "cross_attn"
    mm_rows_per_item = None  # variable encoder length (padded per batch)
    mm_needs_extra = True
    pp_size = 1
    mesh = None
    sequence_parallel = False
    quant_fmt = None
    is_ssm = False

    POS_OFFSET = 2  # HF BartLearnedPositionalEmbedding

    def __init__(self, config: ModelConfig):
        self.config = config
        hf = config.text_config
        self.dtype = jax_dtype(config.dtype)
        self.d_model = hf.d_model
        self.hidden_size = hf.d_model
        self.enc_layers = hf.encoder_layers
        self.num_layers = hf.decoder_layers
        self.enc_heads = hf.encoder_attention_heads
        self.num_heads = hf.decoder_attention_heads
        self.num_kv_heads = self.num_heads
        self.head_dim = self.d_model // self.num_heads
        self.enc_ffn = hf.encoder_ffn_dim
        self.dec_ffn = hf.decoder_ffn_dim
        self.vocab_size = hf.vocab_size
        self.max_pos = hf.max_position_embeddings
        self.scale = self.head_dim ** -0.5
        self.embed_scale = (self.d_model ** 0.5
                            if getattr(hf, "scale_embedding", False) else 1.0)
        self.eps = 1e-5
        self._enc_cache: dict = {}

    # ------------------------------------------------------------------ params
    @staticmethod
    def _block_shapes(L, D, F, pre=""):
        qkv = {f"{pre}w{n}": (L, D, D) for n in ("q", "k", "v", "o")}
        qkv.update({f"{pre}b{n}": (L, D) for n in ("q", "k", "v", "o")})
        shapes = {**qkv, f"{pre}ln_w": (L, D), f"{pre}ln_b": (L, D)}
        if not pre.startswith("ca"):
            shapes.update({
                f"{pre}fc1_w": (L, D, F), f"{pre}fc1_b": (L, F),
                f"{pre}fc2_w": (L, F, D), f"{pre}fc2_b": (L, D),
                f"{pre}fln_w": (L, D), f"{pre}fln_b": (L, D),
            })
        return shapes

    def _enc_shapes(self):
        return self._block_shapes(self.enc_layers, self.d_model,
                                  self.enc_ffn)

    def _dec_shapes(self):
        shapes = self._block_shapes(self.num_layers, self.d_model,
                                    self.dec_ffn, pre="sa_")
        shapes.update(self._block_shapes(self.num_layers, self.d_model,
                                         self.dec_ffn, pre="ca_"))
        return shapes

    def init_dummy_params(self, rng: jax.Array) -> dict:
        keys = iter(jax.random.split(rng, 96))

        def mk(shape):
            return (0.02 * jax.random.normal(next(keys), shape, jnp.float32)
                    ).astype(self.dtype)

        def fill(shapes):
            out = {}
            for k, s in shapes.items():
                if k.endswith("ln_w"):
                    out[k] = jnp.ones(s, self.dtype)
                elif k.endswith(("_b",)) or k.startswith(("b", "sa_b",
                                                          "ca_b")):
                    out[k] = jnp.zeros(s, self.dtype)
                else:
                    out[k] = mk(s)
            return out

        D = self.d_model
        return {
            "embed": mk((self.vocab_size, D)),
            "enc_pos": mk((self.max_pos + self.POS_OFFSET, D)),
            "dec_pos": mk((self.max_pos + self.POS_OFFSET, D)),
            "enc_emb_ln_w": jnp.ones((D,), self.dtype),
            "enc_emb_ln_b": jnp.zeros((D,), self.dtype),
            "dec_emb_ln_w": jnp.ones((D,), self.dtype),
            "dec_emb_ln_b": jnp.zeros((D,), self.dtype),
            "enc": fill(self._enc_shapes()),
            "layers": fill(self._dec_shapes()),
            "logits_bias": jnp.zeros((self.vocab_size,), jnp.float32),
        }

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        enc_bufs = {k: np.zeros(s, target)
                    for k, s in self._enc_shapes().items()}
        dec_bufs = {k: np.zeros(s, target)
                    for k, s in self._dec_shapes().items()}
        params: dict = {"enc": enc_bufs, "layers": dec_bufs}
        top = {
            "model.shared.weight": "embed",
            "model.encoder.embed_tokens.weight": "embed",
            "model.decoder.embed_tokens.weight": "embed",
            "model.encoder.embed_positions.weight": "enc_pos",
            "model.decoder.embed_positions.weight": "dec_pos",
            "model.encoder.layernorm_embedding.weight": "enc_emb_ln_w",
            "model.encoder.layernorm_embedding.bias": "enc_emb_ln_b",
            "model.decoder.layernorm_embedding.weight": "dec_emb_ln_w",
            "model.decoder.layernorm_embedding.bias": "dec_emb_ln_b",
            "final_logits_bias": "logits_bias",
        }
        attn = {
            "self_attn.q_proj.weight": ("wq", True),
            "self_attn.q_proj.bias": ("bq", False),
            "self_attn.k_proj.weight": ("wk", True),
            "self_attn.k_proj.bias": ("bk", False),
            "self_attn.v_proj.weight": ("wv", True),
            "self_attn.v_proj.bias": ("bv", False),
            "self_attn.out_proj.weight": ("wo", True),
            "self_attn.out_proj.bias": ("bo", False),
            "self_attn_layer_norm.weight": ("ln_w", False),
            "self_attn_layer_norm.bias": ("ln_b", False),
            "fc1.weight": ("fc1_w", True),
            "fc1.bias": ("fc1_b", False),
            "fc2.weight": ("fc2_w", True),
            "fc2.bias": ("fc2_b", False),
            "final_layer_norm.weight": ("fln_w", False),
            "final_layer_norm.bias": ("fln_b", False),
        }
        cross = {
            "encoder_attn.q_proj.weight": ("ca_wq", True),
            "encoder_attn.q_proj.bias": ("ca_bq", False),
            "encoder_attn.k_proj.weight": ("ca_wk", True),
            "encoder_attn.k_proj.bias": ("ca_bk", False),
            "encoder_attn.v_proj.weight": ("ca_wv", True),
            "encoder_attn.v_proj.bias": ("ca_bv", False),
            "encoder_attn.out_proj.weight": ("ca_wo", True),
            "encoder_attn.out_proj.bias": ("ca_bo", False),
            "encoder_attn_layer_norm.weight": ("ca_ln_w", False),
            "encoder_attn_layer_norm.bias": ("ca_ln_b", False),
        }
        for name, w in weights:
            w = np.asarray(w)
            if name.startswith("lm_head."):
                continue  # tied to shared embedding
            if name in top:
                key = top[name]
                if key in params and key == "embed":
                    continue  # first writer wins (all three are tied)
                params[key] = (w[0] if key == "logits_bias" and w.ndim == 2
                               else w).astype(
                    np.float32 if key == "logits_bias" else target)
                continue
            for prefix, bufs, table, pre in (
                    ("model.encoder.layers.", enc_bufs, attn, ""),
                    ("model.decoder.layers.", dec_bufs, attn, "sa_"),
                    ("model.decoder.layers.", dec_bufs, cross, "")):
                if not name.startswith(prefix):
                    continue
                rest = name[len(prefix):]
                idx_s, sub = rest.split(".", 1)
                m = table.get(sub)
                if m is None:
                    continue
                key = (pre + m[0]) if table is attn else m[0]
                if key in bufs:
                    bufs[key][int(idx_s)] = (w.T if m[1] else w
                                             ).astype(target)
                    break
        if "embed" not in params:
            raise ValueError("missing BART shared embedding")
        if "logits_bias" not in params:
            params["logits_bias"] = np.zeros((self.vocab_size,), np.float32)
        return params

    def param_specs(self) -> dict:
        enc = {k: P() for k in self._enc_shapes()}
        dec = {k: P() for k in self._dec_shapes()}
        return {"embed": P(), "enc_pos": P(), "dec_pos": P(),
                "enc_emb_ln_w": P(), "enc_emb_ln_b": P(),
                "dec_emb_ln_w": P(), "dec_emb_ln_b": P(),
                "enc": enc, "layers": dec, "logits_bias": P()}

    # ----------------------------------------------------------------- encoder
    def encode_media(self, params: dict, enc_ids: jax.Array) -> jax.Array:
        """Encoder prompt ids [1, S] -> encoder states [S, D] (jitted per
        pow2-padded length; pad rows are dropped before return)."""
        ids = enc_ids.reshape(-1)
        S = int(ids.shape[0])
        S_pad = max(8, 1 << (S - 1).bit_length())
        ids = jnp.pad(ids.astype(jnp.int32), (0, S_pad - S))
        fn = self._enc_cache.get(S_pad)
        if fn is None:
            fn = jax.jit(self._encode)
            self._enc_cache[S_pad] = fn
        return fn(params, ids, jnp.asarray(S, jnp.int32))[:S]

    def _encode(self, params, ids, n_valid, inputs_embeds=None):
        D = self.d_model
        nh, hd = self.enc_heads, self.d_model // self.enc_heads
        S = ids.shape[0]
        x = inputs_embeds if inputs_embeds is not None else \
            jnp.take(params["embed"], ids, axis=0) * self.embed_scale
        pos = jnp.arange(S) + self.POS_OFFSET
        x = x + jnp.take(params["enc_pos"], pos, axis=0).astype(x.dtype)
        x = layer_norm(x, params["enc_emb_ln_w"], params["enc_emb_ln_b"],
                       self.eps)
        mask = (jnp.arange(S) < n_valid)[None, None, :]  # [1, 1, S]

        def layer(x, lp):
            q = (jnp.dot(x, lp["wq"]) + lp["bq"]).reshape(S, nh, hd)
            k = (jnp.dot(x, lp["wk"]) + lp["bk"]).reshape(S, nh, hd)
            v = (jnp.dot(x, lp["wv"]) + lp["bv"]).reshape(S, nh, hd)
            logits = jnp.einsum("qhd,khd->hqk", q, k,
                                preferred_element_type=jnp.float32)
            logits = jnp.where(mask, logits * self.scale, -1e9)
            p = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            o = jnp.einsum("hqk,khd->qhd", p, v).reshape(S, D)
            x = layer_norm(x + jnp.dot(o, lp["wo"]) + lp["bo"],
                           lp["ln_w"], lp["ln_b"], self.eps)
            h = jax.nn.gelu(jnp.dot(x, lp["fc1_w"]) + lp["fc1_b"],
                            approximate=False)
            h = jnp.dot(h, lp["fc2_w"]) + lp["fc2_b"]
            x = layer_norm(x + h, lp["fln_w"], lp["fln_b"], self.eps)
            return x, None

        x, _ = jax.lax.scan(layer, x, params["enc"])
        return x

    # ----------------------------------------------------------------- decoder
    def apply(self, params: dict, input_ids: jax.Array, kv_cache: jax.Array,
              md: AttentionMetadata, *, use_pallas: bool = False,
              lora: dict | None = None, mm=None):
        if lora is not None:
            raise NotImplementedError("LoRA on BART: follow-up")
        T = input_ids.shape[0]
        D, nh, hd = self.d_model, self.num_heads, self.head_dim
        x = jnp.take(params["embed"], input_ids, axis=0) * self.embed_scale
        pos = jnp.clip(md.token_pos, 0, self.max_pos - 1) + self.POS_OFFSET
        x = x + jnp.take(params["dec_pos"], pos, axis=0).astype(x.dtype)
        x = layer_norm(x, params["dec_emb_ln_w"], params["dec_emb_ln_b"],
                       self.eps)
        if mm is not None:
            enc, enc_lens = mm
        else:
            enc = enc_lens = None

        def layer(x, xs):
            lp, kvc = xs
            q = (jnp.dot(x, lp["sa_wq"]) + lp["sa_bq"]).reshape(T, nh, hd)
            k = (jnp.dot(x, lp["sa_wk"]) + lp["sa_bk"]).reshape(T, nh, hd)
            v = (jnp.dot(x, lp["sa_wv"]) + lp["sa_bv"]).reshape(T, nh, hd)
            kvc = write_kv(kvc, k, v, md.slot_mapping)
            o = paged_attention(q, kvc, md, self.scale,
                                use_pallas=use_pallas)
            x = layer_norm(x + jnp.dot(o.reshape(T, D), lp["sa_wo"])
                           + lp["sa_bo"], lp["sa_ln_w"], lp["sa_ln_b"],
                           self.eps)
            if enc is not None:
                q = (jnp.dot(x, lp["ca_wq"]) + lp["ca_bq"]
                     ).reshape(T, nh, hd)
                ek = (jnp.dot(enc, lp["ca_wk"]) + lp["ca_bk"])
                ev = (jnp.dot(enc, lp["ca_wv"]) + lp["ca_bv"])
                S = ek.shape[1]
                ek = jnp.take(ek, md.token_req_idx, axis=0
                              ).reshape(T, S, nh, hd)
                ev = jnp.take(ev, md.token_req_idx, axis=0
                              ).reshape(T, S, nh, hd)
                logits = jnp.einsum("tnd,tsnd->tns", q, ek,
                                    preferred_element_type=jnp.float32)
                logits = logits * self.scale
                lens = jnp.take(enc_lens, md.token_req_idx, axis=0)
                logits = jnp.where(
                    jnp.arange(S)[None, None, :] < lens[:, None, None],
                    logits, -1e9)
                p = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
                o = jnp.einsum("tns,tsnd->tnd", p, ev).reshape(T, D)
                x = layer_norm(x + jnp.dot(o, lp["ca_wo"]) + lp["ca_bo"],
                               lp["ca_ln_w"], lp["ca_ln_b"], self.eps)
            h = jax.nn.gelu(jnp.dot(x, lp["sa_fc1_w"]) + lp["sa_fc1_b"],
                            approximate=False)
            h = jnp.dot(h, lp["sa_fc2_w"]) + lp["sa_fc2_b"]
            x = layer_norm(x + h, lp["sa_fln_w"], lp["sa_fln_b"], self.eps)
            return x, kvc

        x, kv_cache = jax.lax.scan(layer, x, (params["layers"], kv_cache))
        return x, kv_cache

    def compute_logits(self, params: dict, hidden: jax.Array) -> jax.Array:
        return jnp.dot(hidden, params["embed"].T,
                       preferred_element_type=jnp.float32) \
            + params["logits_bias"]


class BartModel(BartForConditionalGeneration):
    pass
