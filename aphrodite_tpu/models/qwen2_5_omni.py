"""Qwen2.5-Omni (thinker): Qwen2.5-VL vision + windowed audio tower.

Parity: aphrodite/modeling/models/qwen2_5_omni_thinker.py — the reference
serves only the THINKER (text out); talker/token2wav (speech synthesis) are
out of scope there too. The vision tower, mrope and text stack are exactly
Qwen2.5-VL (models/qwen2_vl.py); this module adds the audio tower: log-mel
features split into 2*n_window-frame chunks, two gelu convs (stride 2),
per-chunk sinusoidal positions, whisper-style pre-norm blocks attending
WITHIN each chunk only, then avg-pool(k=2) + ln_post + proj into the text
width. Audio placeholder spans take sequential (text-like) mrope positions.
"""
from __future__ import annotations

import math
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from aphrodite_tpu.models.qwen2_vl import Qwen2_5_VLForConditionalGeneration


def _ln(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def _sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper sinusoidal positions [length, channels]."""
    log_timescale = math.log(10000) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1)


class Qwen2_5OmniThinkerForConditionalGeneration(
        Qwen2_5_VLForConditionalGeneration):

    def __init__(self, config):
        super().__init__(config)
        hf = config.hf_config
        ac = hf.audio_config
        self.a_mels = ac.num_mel_bins
        self.a_d = ac.d_model
        self.a_layers = ac.encoder_layers
        self.a_heads = ac.encoder_attention_heads
        self.a_ffn = ac.encoder_ffn_dim
        self.a_window = getattr(ac, "n_window", 100)
        self.a_out = getattr(ac, "output_dim", self.hidden_size)
        self.audio_token_id = getattr(hf, "audio_token_index", None)
        self._audio_cache: dict = {}

    # ------------------------------------------------------------------ params
    def _audio_shapes(self) -> dict:
        D, F_, L = self.a_d, self.a_ffn, self.a_layers
        return {
            "conv1_w": (D, self.a_mels, 3), "conv1_b": (D,),
            "conv2_w": (D, D, 3), "conv2_b": (D,),
            "layers": {
                "ln1_w": (L, D), "ln1_b": (L, D),
                "wq": (L, D, D), "bq": (L, D),
                "wk": (L, D, D),
                "wv": (L, D, D), "bv": (L, D),
                "wo": (L, D, D), "bo": (L, D),
                "ln2_w": (L, D), "ln2_b": (L, D),
                "fc1_w": (L, D, F_), "fc1_b": (L, F_),
                "fc2_w": (L, F_, D), "fc2_b": (L, D),
            },
            "ln_post_w": (D,), "ln_post_b": (D,),
            "proj_w": (D, self.a_out), "proj_b": (self.a_out,),
        }

    def init_dummy_params(self, rng):
        params = super().init_dummy_params(rng)
        keys = iter(jax.random.split(jax.random.fold_in(rng, 71), 32))

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
        params["audio"] = fill(self._audio_shapes())
        return params

    _A_TOP = {
        "conv1.weight": ("conv1_w", False), "conv1.bias": ("conv1_b", False),
        "conv2.weight": ("conv2_w", False), "conv2.bias": ("conv2_b", False),
        "ln_post.weight": ("ln_post_w", False),
        "ln_post.bias": ("ln_post_b", False),
        "proj.weight": ("proj_w", True), "proj.bias": ("proj_b", False),
    }
    _A_LAYER = {
        "self_attn_layer_norm.weight": ("ln1_w", False),
        "self_attn_layer_norm.bias": ("ln1_b", False),
        "self_attn.q_proj.weight": ("wq", True),
        "self_attn.q_proj.bias": ("bq", False),
        "self_attn.k_proj.weight": ("wk", True),
        "self_attn.v_proj.weight": ("wv", True),
        "self_attn.v_proj.bias": ("bv", False),
        "self_attn.out_proj.weight": ("wo", True),
        "self_attn.out_proj.bias": ("bo", False),
        "final_layer_norm.weight": ("ln2_w", False),
        "final_layer_norm.bias": ("ln2_b", False),
        "fc1.weight": ("fc1_w", True), "fc1.bias": ("fc1_b", False),
        "fc2.weight": ("fc2_w", True), "fc2.bias": ("fc2_b", False),
    }

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]):
        import ml_dtypes  # noqa: F401
        target = np.dtype("bfloat16") if self.dtype == jnp.bfloat16 \
            else np.dtype(jnp.dtype(self.dtype).name)

        def mk(shapes):
            return {k: mk(v) if isinstance(v, dict) else np.zeros(v, target)
                    for k, v in shapes.items()}
        ab = mk(self._audio_shapes())

        def route(ws):
            for name, w in ws:
                name = name.removeprefix("thinker.")
                if name.startswith("audio_tower."):
                    sub = name[len("audio_tower."):]
                    w = np.asarray(w)
                    m = self._A_TOP.get(sub)
                    if m is not None:
                        key, tr = m
                        ab[key][...] = (w.T if tr else w).astype(target)
                        continue
                    if sub.startswith("layers."):
                        idx_s, rest = sub[len("layers."):].split(".", 1)
                        mm = self._A_LAYER.get(rest)
                        if mm is not None:
                            key, tr = mm
                            ab["layers"][key][int(idx_s)] = \
                                (w.T if tr else w).astype(target)
                    continue
                yield name, w

        params = super().load_weights(route(weights))
        params["audio"] = ab
        return params

    def param_specs(self):
        specs = super().param_specs()
        specs["audio"] = jax.tree.map(
            lambda _: P(), self._audio_shapes(),
            is_leaf=lambda x: isinstance(x, tuple))
        return specs

    # ------------------------------------------------------------------ audio
    def encode_audio(self, params, feats: jax.Array, feat_len: int
                     ) -> jax.Array:
        """feats [n_mels, L] (single audio) -> [tokens, H]."""
        ap = params["audio"]
        win = 2 * self.a_window
        L = int(feat_len)
        n_chunks = -(-L // win)
        pos = jnp.asarray(_sinusoids(self.a_window,
                                     self.a_d), jnp.float32)
        pieces = []
        for c in range(n_chunks):
            lo = c * win
            ln = min(win, L - lo)
            chunk = feats[:, lo:lo + ln]
            if ln < win:
                chunk = jnp.pad(chunk, ((0, 0), (0, win - ln)))
            mask = (jnp.arange(win) < ln).astype(jnp.float32)
            x = jax.lax.conv_general_dilated(
                chunk[None].astype(jnp.float32), ap["conv1_w"],
                window_strides=(1,), padding=((1, 1),),
                dimension_numbers=("NCH", "OIH", "NCH"))
            x = jax.nn.gelu(x + ap["conv1_b"][None, :, None],
                            approximate=False) * mask[None, None, :]
            x = jax.lax.conv_general_dilated(
                x, ap["conv2_w"], window_strides=(2,), padding=((1, 1),),
                dimension_numbers=("NCH", "OIH", "NCH"))
            x = jax.nn.gelu(x + ap["conv2_b"][None, :, None],
                            approximate=False)
            x = jnp.transpose(x[0], (1, 0))  # [win/2, D]
            x = x + pos[: x.shape[0]].astype(x.dtype)
            n_valid = -(-ln // 2)
            pieces.append((x, n_valid))

        D = self.a_d
        nh, hd = self.a_heads, D // self.a_heads

        def block(x, n_valid):
            # per-chunk full attention over the valid rows
            T = x.shape[0]
            kmask = (jnp.arange(T) < n_valid)[None, None, :]

            def layer(x, lp):
                h = _ln(x, lp["ln1_w"], lp["ln1_b"])
                q = (jnp.dot(h, lp["wq"]) + lp["bq"]).reshape(T, nh, hd)
                k = jnp.dot(h, lp["wk"]).reshape(T, nh, hd)
                v = (jnp.dot(h, lp["wv"]) + lp["bv"]).reshape(T, nh, hd)
                logits = jnp.einsum("qhd,khd->hqk", q, k,
                                    preferred_element_type=jnp.float32)
                logits = jnp.where(kmask, logits * (hd ** -0.5), -1e9)
                p = jax.nn.softmax(logits, -1).astype(x.dtype)
                o = jnp.einsum("hqk,khd->qhd", p, v).reshape(T, D)
                x = x + jnp.dot(o, lp["wo"]) + lp["bo"]
                h = _ln(x, lp["ln2_w"], lp["ln2_b"])
                h = jax.nn.gelu(jnp.dot(h, lp["fc1_w"]) + lp["fc1_b"],
                                approximate=False)
                x = x + jnp.dot(h, lp["fc2_w"]) + lp["fc2_b"]
                return x, None

            x, _ = jax.lax.scan(layer, x, ap["layers"])
            return x

        outs = [block(x, n)[:n] for x, n in pieces]
        x = jnp.concatenate(outs, axis=0)  # [aftercnn, D]
        n2 = (x.shape[0] // 2) * 2
        x = x[:n2].reshape(-1, 2, D).mean(axis=1)  # AvgPool1d(k=2, s=2)
        x = _ln(x, ap["ln_post_w"], ap["ln_post_b"])
        x = jnp.dot(x, ap["proj_w"],
                    preferred_element_type=jnp.float32).astype(x.dtype) \
            + ap["proj_b"]
        return x.reshape(-1, self.hidden_size)

    def encode_images(self, params, pixel_values, grid_thw=None,
                      audio_lens=None, items=None, **kw):
        """Omni media: either qwen2.5-VL image patches (grid_thw) or audio
        features ([n_mels, L] with audio_lens)."""
        if grid_thw is not None:
            return super().encode_images(params, pixel_values,
                                         grid_thw=grid_thw)
        # audio: pixel_values [N, n_mels, Lmax]
        pieces = [self.encode_audio(params, pixel_values[i], int(l))
                  for i, l in enumerate(audio_lens)]
        return pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces)
