"""Whisper: encoder-decoder speech recognition.

Parity: aphrodite/modeling/models/whisper.py + the /v1/audio/transcriptions
route (endpoints/openai/api_server.py:650). TPU-native design: the audio
encoder runs ONCE per request (per-request encoder cache in the runner,
same slot as VLM image embeddings but consumed through *cross-attention*:
``mm_kind = "cross_attn"``); the decoder is an ordinary paged-KV causal
stack, so continuous batching / chunked prefill / sampling all apply
unchanged. Each step receives the batch's encoder states as
``mm = (enc [R, S, D], enc_valid [R])`` and every decoder layer
cross-attends its tokens to their request's row.
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
from aphrodite_tpu.models.vision import layer_norm
from aphrodite_tpu.utils import jax_dtype


class WhisperForConditionalGeneration:

    is_encoder_decoder = True
    is_multimodal = True
    mm_kind = "cross_attn"
    # Interface parity.
    pp_size = 1
    mesh = None
    sequence_parallel = False
    quant_fmt = None
    sliding_window = None

    def __init__(self, config: ModelConfig):
        self.config = config
        hf = config.text_config
        self.dtype = jax_dtype(config.dtype)
        self.d_model = hf.d_model
        self.enc_layers = hf.encoder_layers
        self.dec_layers = hf.decoder_layers
        self.enc_heads = hf.encoder_attention_heads
        self.dec_heads = hf.decoder_attention_heads
        self.enc_ffn = hf.encoder_ffn_dim
        self.dec_ffn = hf.decoder_ffn_dim
        self.n_mels = hf.num_mel_bins
        self.max_source = hf.max_source_positions
        self.max_target = hf.max_target_positions
        self.vocab_size = hf.vocab_size
        self.embed_scale = (self.d_model ** 0.5
                            if getattr(hf, "scale_embedding", False) else 1.0)
        # Decoder geometry for the paged KV cache.
        self.num_layers = self.dec_layers
        self.num_heads = self.dec_heads
        self.num_kv_heads = self.dec_heads
        self.head_dim = self.d_model // self.dec_heads
        self.hidden_size = self.d_model
        self.scale = self.head_dim ** -0.5

    # ------------------------------------------------------------------ params
    def _enc_layer_shapes(self):
        D, F, L = self.d_model, self.enc_ffn, self.enc_layers
        return self._attn_block_shapes(L, D, F, cross=False)

    def _dec_layer_shapes(self):
        D, F, L = self.d_model, self.dec_ffn, self.dec_layers
        shapes = self._attn_block_shapes(L, D, F, cross=False, pre="sa_")
        shapes.update(self._attn_block_shapes(L, D, F, cross=True,
                                              pre="ca_"))
        return shapes

    @staticmethod
    def _attn_block_shapes(L, D, F, cross: bool, pre: str = ""):
        shapes = {
            pre + "ln_w": (L, D), pre + "ln_b": (L, D),
            pre + "wq": (L, D, D), pre + "bq": (L, D),
            pre + "wk": (L, D, D),  # k_proj has no bias in whisper
            pre + "wv": (L, D, D), pre + "bv": (L, D),
            pre + "wo": (L, D, D), pre + "bo": (L, D),
        }
        if not cross:  # the MLP + its norm live with the non-cross block
            shapes.update({
                pre + "fln_w": (L, D), pre + "fln_b": (L, D),
                pre + "fc1_w": (L, D, F), pre + "fc1_b": (L, F),
                pre + "fc2_w": (L, F, D), pre + "fc2_b": (L, D),
            })
        return shapes

    def init_dummy_params(self, rng: jax.Array) -> dict:
        keys = iter(jax.random.split(rng, 96))

        def mk(shape, scale=0.02):
            return (scale * jax.random.normal(next(keys), shape,
                                              jnp.float32)
                    ).astype(self.dtype)

        def fill(shapes):
            out = {}
            for k, s in shapes.items():
                if "ln_w" in k:
                    out[k] = jnp.ones(s, self.dtype)
                elif k.endswith(("_b", "bq", "bv", "bo")):
                    out[k] = jnp.zeros(s, self.dtype)
                else:
                    out[k] = mk(s)
            return out

        D = self.d_model
        return {
            "enc": {
                "conv1_w": mk((D, self.n_mels, 3)),
                "conv1_b": jnp.zeros((D,), self.dtype),
                "conv2_w": mk((D, D, 3)),
                "conv2_b": jnp.zeros((D,), self.dtype),
                "pos": mk((self.max_source, D)),
                "layers": fill(self._enc_layer_shapes()),
                "ln_w": jnp.ones((D,), self.dtype),
                "ln_b": jnp.zeros((D,), self.dtype),
            },
            "embed": mk((self.vocab_size, D)),
            "dec_pos": mk((self.max_target, D)),
            "layers": fill(self._dec_layer_shapes()),
            "final_norm_w": jnp.ones((D,), self.dtype),
            "final_norm_b": jnp.zeros((D,), self.dtype),
        }

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> dict:
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)
        enc_bufs = {k: np.zeros(s, target)
                    for k, s in self._enc_layer_shapes().items()}
        dec_bufs = {k: np.zeros(s, target)
                    for k, s in self._dec_layer_shapes().items()}
        params: dict = {"enc": {"layers": enc_bufs}, "layers": dec_bufs}

        attn = {  # HF suffix -> (key, transpose)
            "self_attn_layer_norm.weight": ("ln_w", False),
            "self_attn_layer_norm.bias": ("ln_b", False),
            "self_attn.q_proj.weight": ("wq", True),
            "self_attn.q_proj.bias": ("bq", False),
            "self_attn.k_proj.weight": ("wk", True),
            "self_attn.v_proj.weight": ("wv", True),
            "self_attn.v_proj.bias": ("bv", False),
            "self_attn.out_proj.weight": ("wo", True),
            "self_attn.out_proj.bias": ("bo", False),
            "final_layer_norm.weight": ("fln_w", False),
            "final_layer_norm.bias": ("fln_b", False),
            "fc1.weight": ("fc1_w", True), "fc1.bias": ("fc1_b", False),
            "fc2.weight": ("fc2_w", True), "fc2.bias": ("fc2_b", False),
        }
        cross = {
            "encoder_attn_layer_norm.weight": ("ca_ln_w", False),
            "encoder_attn_layer_norm.bias": ("ca_ln_b", False),
            "encoder_attn.q_proj.weight": ("ca_wq", True),
            "encoder_attn.q_proj.bias": ("ca_bq", False),
            "encoder_attn.k_proj.weight": ("ca_wk", True),
            "encoder_attn.v_proj.weight": ("ca_wv", True),
            "encoder_attn.v_proj.bias": ("ca_bv", False),
            "encoder_attn.out_proj.weight": ("ca_wo", True),
            "encoder_attn.out_proj.bias": ("ca_bo", False),
        }
        top = {
            "model.encoder.conv1.weight": ("enc", "conv1_w", False),
            "model.encoder.conv1.bias": ("enc", "conv1_b", False),
            "model.encoder.conv2.weight": ("enc", "conv2_w", False),
            "model.encoder.conv2.bias": ("enc", "conv2_b", False),
            "model.encoder.embed_positions.weight": ("enc", "pos", False),
            "model.encoder.layer_norm.weight": ("enc", "ln_w", False),
            "model.encoder.layer_norm.bias": ("enc", "ln_b", False),
            "model.decoder.embed_tokens.weight": (None, "embed", False),
            "model.decoder.embed_positions.weight": (None, "dec_pos",
                                                     False),
            "model.decoder.layer_norm.weight": (None, "final_norm_w",
                                                False),
            "model.decoder.layer_norm.bias": (None, "final_norm_b", False),
        }
        for name, w in weights:
            w = np.asarray(w)
            if name.startswith("proj_out."):
                continue  # tied with embed_tokens
            if name in top:
                grp, key, _ = top[name]
                dst = params["enc"] if grp == "enc" else params
                dst[key] = w.astype(target)
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
                    bufs[key][int(idx_s)] = (w.T if m[1] else w).astype(
                        target)
                    break
        if "embed" not in params:
            raise ValueError("missing model.decoder.embed_tokens.weight")
        return params

    def param_specs(self) -> dict:
        # Replicated: whisper checkpoints are small relative to LLMs; TP
        # sharding of D is a follow-up.
        enc = {k: P() for k in self._enc_layer_shapes()}
        dec = {k: P() for k in self._dec_layer_shapes()}
        return {
            "enc": {"conv1_w": P(), "conv1_b": P(), "conv2_w": P(),
                    "conv2_b": P(), "pos": P(), "layers": enc,
                    "ln_w": P(), "ln_b": P()},
            "embed": P(), "dec_pos": P(), "layers": dec,
            "final_norm_w": P(), "final_norm_b": P(),
        }

    # ----------------------------------------------------------------- encoder
    def encode_audio(self, params: dict, features: jax.Array) -> jax.Array:
        """[N, n_mels, 3000] log-mel -> [N * max_source, D] flat encoder
        states (runner encoder-cache convention: rows per request)."""
        ep = params["enc"]
        x = features.astype(self.dtype)

        def conv1d(x, w, b, stride):
            # x [N, C, T], w [D, C, 3] -> [N, D, T/stride] (padding=1)
            out = jax.lax.conv_general_dilated(
                x, w, window_strides=(stride,), padding=((1, 1),),
                dimension_numbers=("NCH", "OIH", "NCH"))
            return out + b[None, :, None]

        x = jax.nn.gelu(conv1d(x, ep["conv1_w"], ep["conv1_b"], 1),
                        approximate=False)
        x = jax.nn.gelu(conv1d(x, ep["conv2_w"], ep["conv2_b"], 2),
                        approximate=False)
        x = jnp.transpose(x, (0, 2, 1))  # [N, S, D]
        x = x + ep["pos"][None].astype(x.dtype)
        N, S, D = x.shape
        nh, hd = self.enc_heads, self.d_model // self.enc_heads
        eps = 1e-5

        def layer(x, lp):
            h = layer_norm(x, lp["ln_w"], lp["ln_b"], eps)
            q = (jnp.dot(h, lp["wq"]) + lp["bq"]).reshape(N, S, nh, hd)
            k = jnp.dot(h, lp["wk"]).reshape(N, S, nh, hd)
            v = (jnp.dot(h, lp["wv"]) + lp["bv"]).reshape(N, S, nh, hd)
            logits = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                                preferred_element_type=jnp.float32)
            p = jax.nn.softmax(logits * (hd ** -0.5), axis=-1
                               ).astype(x.dtype)
            o = jnp.einsum("nhqk,nkhd->nqhd", p, v).reshape(N, S, D)
            x = x + jnp.dot(o, lp["wo"]) + lp["bo"]
            h = layer_norm(x, lp["fln_w"], lp["fln_b"], eps)
            h = jax.nn.gelu(jnp.dot(h, lp["fc1_w"]) + lp["fc1_b"],
                            approximate=False)
            x = x + jnp.dot(h, lp["fc2_w"]) + lp["fc2_b"]
            return x, None

        x, _ = jax.lax.scan(layer, x, ep["layers"])
        x = layer_norm(x, ep["ln_w"], ep["ln_b"], eps)
        return x.reshape(N * S, D)

    # For the runner's generic encoder cache: rows per media item.
    @property
    def mm_rows_per_item(self) -> int:
        return self.max_source

    # ----------------------------------------------------------------- decoder
    def apply(self, params: dict, input_ids: jax.Array, kv_cache: jax.Array,
              md: AttentionMetadata, *, use_pallas: bool = False,
              lora: dict | None = None, mm=None):
        if lora is not None:
            raise NotImplementedError("LoRA on Whisper: follow-up")
        T = input_ids.shape[0]
        D, nh, hd = self.d_model, self.dec_heads, self.head_dim
        eps = 1e-5
        x = jnp.take(params["embed"], input_ids, axis=0) * self.embed_scale
        x = x + jnp.take(params["dec_pos"],
                         jnp.clip(md.token_pos, 0, self.max_target - 1),
                         axis=0).astype(x.dtype)
        if mm is not None:
            enc, enc_lens = mm  # [R, S, D], [R] valid-row counts
        else:
            enc = enc_lens = None

        def layer(x, xs):
            lp, kvc = xs
            # -- causal self-attention over the paged KV cache
            h = layer_norm(x, lp["sa_ln_w"], lp["sa_ln_b"], eps)
            q = (jnp.dot(h, lp["sa_wq"]) + lp["sa_bq"]).reshape(T, nh, hd)
            k = jnp.dot(h, lp["sa_wk"]).reshape(T, nh, hd)
            v = (jnp.dot(h, lp["sa_wv"]) + lp["sa_bv"]).reshape(T, nh, hd)
            kvc = write_kv(kvc, k, v, md.slot_mapping)
            o = paged_attention(q, kvc, md, self.scale,
                                use_pallas=use_pallas)
            x = x + jnp.dot(o.reshape(T, D), lp["sa_wo"]) + lp["sa_bo"]
            # -- cross-attention over this request's encoder states
            if enc is not None:
                h = layer_norm(x, lp["ca_ln_w"], lp["ca_ln_b"], eps)
                q = (jnp.dot(h, lp["ca_wq"]) + lp["ca_bq"]
                     ).reshape(T, nh, hd)
                ek = jnp.dot(enc, lp["ca_wk"])          # [R, S, D]
                ev = jnp.dot(enc, lp["ca_wv"]) + lp["ca_bv"]
                R, S = ek.shape[0], ek.shape[1]
                ek = jnp.take(ek, md.token_req_idx, axis=0  # [T, S, D]
                              ).reshape(T, S, nh, hd)
                ev = jnp.take(ev, md.token_req_idx, axis=0
                              ).reshape(T, S, nh, hd)
                logits = jnp.einsum("tnd,tsnd->tns", q, ek,
                                    preferred_element_type=jnp.float32)
                logits = logits * self.scale
                lens = jnp.take(enc_lens, md.token_req_idx, axis=0)  # [T]
                logits = jnp.where(
                    jnp.arange(S)[None, None, :] < lens[:, None, None],
                    logits, -1e9)
                p = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
                o = jnp.einsum("tns,tsnd->tnd", p, ev).reshape(T, D)
                x = x + jnp.dot(o, lp["ca_wo"]) + lp["ca_bo"]
            # -- MLP
            h = layer_norm(x, lp["sa_fln_w"], lp["sa_fln_b"], eps)
            h = jax.nn.gelu(jnp.dot(h, lp["sa_fc1_w"]) + lp["sa_fc1_b"],
                            approximate=False)
            x = x + jnp.dot(h, lp["sa_fc2_w"]) + lp["sa_fc2_b"]
            return x, kvc

        x, kv_cache = jax.lax.scan(layer, x, (params["layers"], kv_cache))
        x = layer_norm(x, params["final_norm_w"], params["final_norm_b"],
                       eps)
        return x, kv_cache

    def compute_logits(self, params: dict, hidden: jax.Array) -> jax.Array:
        return jnp.dot(hidden, params["embed"].T,
                       preferred_element_type=jnp.float32)
