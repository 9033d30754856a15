"""Phi-4-multimodal audio encoder: nemo-subsampled causal conformer with
T5 relative attention bias.

Parity: aphrodite/modeling/models/phi4mm_audio.py + phi4mm_utils.py,
restricted to the branches the shipped Phi-4-MM config exercises:
- MeanVarianceNormLayer input normalization (phi4mm_utils.py:858-884);
- NemoConvSubsampling ``dw_striding`` (non-causal, symmetric padding):
  full conv2d + (sampling_num-1) x (depthwise conv2d + pointwise conv2d),
  stride 2 each, ReLU, then a Linear over channelxfreq
  (phi4mm_utils.py:1028-1405);
- conformer blocks (phi4mm_audio.py:28-247): half-step GLULinear
  feedforwards (swish GLU), MHA with the T5 asymmetric relative logit
  bias (clip to [-max_d, max_d-1] + offset, phi4mm_utils.py:664-795), and
  a CAUSAL conv module: swish-GLU pointwise conv (k=1), depthwise conv
  k=3 left-padded and right-trimmed, swish, pointwise conv, final LN;
- sequences longer than 500 subsampled frames are unfolded into
  independent 500-frame chunks (phi4mm_audio.py:900-961);
- chunk_size=-1 + left_chunk in the shipped config produce a FULL
  bidirectional attention mask (adaptive_enc_mask with no chunk starts).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from aphrodite_tpu.models.vision import layer_norm

MAX_UNFOLD = 500  # maximum frames per attention segment (phi4mm_audio.py:906)


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _cfg(c, k, d=None):
    return c.get(k, d) if isinstance(c, dict) else getattr(c, k, d)


class Phi4ConformerEncoder:
    """Audio conformer over mel features [1, T, n_mels] (static T)."""

    def __init__(self, ec, dtype) -> None:
        self.dtype = dtype
        self.n_mels = _cfg(ec, "input_size", 80)
        self.hidden = _cfg(ec, "attention_dim", 1024)
        self.heads = _cfg(ec, "attention_heads", 16)
        self.head_dim = self.hidden // self.heads
        self.depth = _cfg(ec, "num_blocks", 24)
        self.ffn = _cfg(ec, "linear_units", 1536)
        self.kernel = _cfg(ec, "kernel_size", 3)
        self.ext_pw = _cfg(ec, "ext_pw_out_channel", self.hidden)
        self.dw_out = _cfg(ec, "depthwise_seperable_out_channel", self.hidden)
        self.time_reduction = _cfg(ec, "time_reduction", 8)
        nemo = _cfg(ec, "nemo_conv_settings", None) or {}
        self.conv_ch = _cfg(nemo, "conv_channels", 256)
        rel = _cfg(ec, "relative_attention_bias_args", None) or {}
        self.t5_max = _cfg(rel, "t5_bias_max_distance", 1000)
        self.t5_symmetric = bool(_cfg(rel, "t5_bias_symmetric", False))
        self.n_sample = int(round(np.log2(self.time_reduction)))
        # Linear-in width after conv stack: freq axis strided like time.
        f = self.n_mels
        for _ in range(self.n_sample):
            f = (f - 1) // 2 + 1
        self.out_freq = f
        self.scale = self.head_dim ** -0.5

    def shapes(self) -> dict:
        D, F, L, ch = self.hidden, self.ffn, self.depth, self.conv_ch
        k = self.kernel
        n_bias = self.t5_max if self.t5_symmetric else 2 * self.t5_max
        shapes: dict = {
            "mean": (self.n_mels,), "invstd": (self.n_mels,),
            "sub_conv0_w": (ch, 1, 3, 3), "sub_conv0_b": (ch,),
            "sub_out_w": (ch * self.out_freq, D), "sub_out_b": (D,),
            "t5_bias": (n_bias, self.heads),
        }
        for i in range(1, self.n_sample):
            shapes[f"sub_dw{i}_w"] = (ch, 1, 3, 3)
            shapes[f"sub_dw{i}_b"] = (ch,)
            shapes[f"sub_pw{i}_w"] = (ch, ch, 1, 1)
            shapes[f"sub_pw{i}_b"] = (ch,)
        layers = {}
        for ff in ("ff_in", "ff_out"):
            layers.update({
                f"{ff}_ln_w": (L, D), f"{ff}_ln_b": (L, D),
                f"{ff}_glu_w": (L, D, 2 * F), f"{ff}_glu_b": (L, 2 * F),
                f"{ff}_out_w": (L, F, D), f"{ff}_out_b": (L, D)})
        layers.update({
            "att_ln_w": (L, D), "att_ln_b": (L, D),
            "wq": (L, D, D), "bq": (L, D),
            "wk": (L, D, D), "bk": (L, D),
            "wv": (L, D, D), "bv": (L, D),
            "wo": (L, D, D), "bo": (L, D),
            "conv_ln_w": (L, D), "conv_ln_b": (L, D),
            "glu_pw_w": (L, 2 * self.ext_pw, D), "glu_pw_b":
                (L, 2 * self.ext_pw),
            "glu_b1": (L, self.ext_pw), "glu_b2": (L, self.ext_pw),
            "dw_w": (L, D, k), "dw_b": (L, D),
            "pw_w": (L, D, self.dw_out), "pw_b": (L, self.dw_out),
            "ext_pw_w": (L, self.ext_pw, self.ext_pw), "ext_pw_b":
                (L, self.ext_pw),
            "post_ln_w": (L, D), "post_ln_b": (L, D),
        })
        shapes["layers"] = layers
        return shapes

    def make_bufs(self, target) -> dict:
        def mk(shapes):
            return {k: mk(v) if isinstance(v, dict) else np.zeros(v, target)
                    for k, v in shapes.items()}
        bufs = mk(self.shapes())
        bufs["invstd"][...] = 1.0
        return bufs

    def init_dummy(self, rng: jax.Array) -> dict:
        keys = iter(jax.random.split(rng, 64))

        def fill(shapes):
            out = {}
            for k, s in shapes.items():
                if isinstance(s, dict):
                    out[k] = fill(s)
                elif "ln_w" in k or k == "invstd":
                    out[k] = jnp.ones(s, self.dtype)
                elif k.endswith("_b") or k in ("mean", "glu_b1", "glu_b2",
                                               "t5_bias"):
                    out[k] = jnp.zeros(s, self.dtype)
                else:
                    out[k] = (0.02 * jax.random.normal(
                        next(keys), s, jnp.float32)).astype(self.dtype)
            return out
        return fill(self.shapes())

    _TOP = {
        "encoder_embedding.global_mean": ("mean", 0),
        "encoder_embedding.global_invstd": ("invstd", 0),
        "embed.conv.0.weight": ("sub_conv0_w", 0),
        "embed.conv.0.bias": ("sub_conv0_b", 0),
        "embed.out.weight": ("sub_out_w", 1),
        "embed.out.bias": ("sub_out_b", 0),
        "relative_attention_bias_layer.bias_values.weight": ("t5_bias", 0),
    }
    _LAYER = {
        "feed_forward_in.layer_norm.weight": ("ff_in_ln_w", 0),
        "feed_forward_in.layer_norm.bias": ("ff_in_ln_b", 0),
        "feed_forward_in.net.0.linear.weight": ("ff_in_glu_w", 1),
        "feed_forward_in.net.0.linear.bias": ("ff_in_glu_b", 0),
        "feed_forward_in.net.2.weight": ("ff_in_out_w", 1),
        "feed_forward_in.net.2.bias": ("ff_in_out_b", 0),
        "feed_forward_out.layer_norm.weight": ("ff_out_ln_w", 0),
        "feed_forward_out.layer_norm.bias": ("ff_out_ln_b", 0),
        "feed_forward_out.net.0.linear.weight": ("ff_out_glu_w", 1),
        "feed_forward_out.net.0.linear.bias": ("ff_out_glu_b", 0),
        "feed_forward_out.net.2.weight": ("ff_out_out_w", 1),
        "feed_forward_out.net.2.bias": ("ff_out_out_b", 0),
        "layer_norm_att.weight": ("att_ln_w", 0),
        "layer_norm_att.bias": ("att_ln_b", 0),
        "self_attn.linear_q.weight": ("wq", 1),
        "self_attn.linear_q.bias": ("bq", 0),
        "self_attn.linear_k.weight": ("wk", 1),
        "self_attn.linear_k.bias": ("bk", 0),
        "self_attn.linear_v.weight": ("wv", 1),
        "self_attn.linear_v.bias": ("bv", 0),
        "self_attn.linear_out.weight": ("wo", 1),
        "self_attn.linear_out.bias": ("bo", 0),
        "conv.layer_norm.weight": ("conv_ln_w", 0),
        "conv.layer_norm.bias": ("conv_ln_b", 0),
        "conv.glu.ext_pw_conv_1d.weight": ("glu_pw_w", 2),
        "conv.glu.ext_pw_conv_1d.bias": ("glu_pw_b", 0),
        "conv.glu.b1": ("glu_b1", 3),
        "conv.glu.b2": ("glu_b2", 3),
        "conv.dw_sep_conv_1d.dw_conv.weight": ("dw_w", 4),
        "conv.dw_sep_conv_1d.dw_conv.bias": ("dw_b", 0),
        "conv.dw_sep_conv_1d.pw_conv.weight": ("pw_w", 5),
        "conv.dw_sep_conv_1d.pw_conv.bias": ("pw_b", 0),
        "conv.ext_pw_conv_1d.weight": ("ext_pw_w", 5),
        "conv.ext_pw_conv_1d.bias": ("ext_pw_b", 0),
        "layer_norm.weight": ("post_ln_w", 0),
        "layer_norm.bias": ("post_ln_b", 0),
    }

    def load_hf(self, name: str, w: np.ndarray, bufs: dict, target) -> bool:
        """Consume an ``encoder.``-stripped tensor name."""
        m = self._TOP.get(name)
        if m is not None:
            key, mode = m
            bufs[key][...] = (w.T if mode == 1 else w).astype(target)
            return True
        if name.startswith("embed.conv."):
            parts = name.split(".")
            idx = int(parts[2])
            # layers: 0 conv, 1 act, then per stage (dw, pw, act)
            stage = (idx - 2) // 3 + 1
            kind = "dw" if (idx - 2) % 3 == 0 else "pw"
            key = f"sub_{kind}{stage}_{'w' if parts[-1] == 'weight' else 'b'}"
            if key in bufs:
                bufs[key][...] = w.astype(target)
            return True
        if not name.startswith("encoders."):
            return False
        _, li, rest = name.split(".", 2)
        m = self._LAYER.get(rest)
        if m is None:
            return False
        key, mode = m
        if mode == 1:
            w = w.T
        elif mode == 2:     # Conv1d k=1 [2*ext, D, 1] -> [2*ext, D]
            w = w[:, :, 0]
        elif mode == 3:     # [1, ext, 1] -> [ext]
            w = w.reshape(-1)
        elif mode == 4:     # depthwise Conv1d [D, 1, k] -> [D, k]
            w = w[:, 0, :]
        elif mode == 5:     # pointwise Conv1d [out, in, 1] -> [in, out]
            w = w[:, :, 0].T
        bufs["layers"][key][int(li)] = w.astype(target)
        return True

    # ------------------------------------------------------------ pieces
    def _subsample(self, ep, mel):
        """[B, T, n_mels] -> [B, T', hidden] (dw_striding, symmetric pad,
        ReLU; Linear over channels x freq)."""
        x = mel[:, None]  # [B, 1, T, F]
        x = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), ep["sub_conv0_w"].astype(jnp.float32),
            (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = jax.nn.relu(x + ep["sub_conv0_b"][None, :, None, None])
        for i in range(1, self.n_sample):
            x = jax.lax.conv_general_dilated(
                x, ep[f"sub_dw{i}_w"].astype(jnp.float32), (2, 2),
                [(1, 1), (1, 1)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                feature_group_count=self.conv_ch)
            x = x + ep[f"sub_dw{i}_b"][None, :, None, None]
            x = jax.lax.conv_general_dilated(
                x, ep[f"sub_pw{i}_w"].astype(jnp.float32), (1, 1),
                [(0, 0), (0, 0)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            x = jax.nn.relu(x + ep[f"sub_pw{i}_b"][None, :, None, None])
        B, C, T, F = x.shape
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(B, T, C * F)
        x = x.astype(self.dtype)
        return jnp.dot(x, ep["sub_out_w"]) + ep["sub_out_b"]

    def _t5_bias(self, ep, T):
        pos = np.arange(T)
        rel = np.clip(pos[None, :] - pos[:, None], -self.t5_max,
                      self.t5_max - 1)
        idx = np.abs(rel) if self.t5_symmetric else rel + self.t5_max
        bias = ep["t5_bias"][jnp.asarray(idx)]        # [T, T, H]
        return jnp.transpose(bias, (2, 0, 1))[None]   # [1, H, T, T]

    def _ff(self, x, lp, pre):
        h = layer_norm(x, lp[f"{pre}_ln_w"], lp[f"{pre}_ln_b"], 1e-5)
        g = jnp.dot(h, lp[f"{pre}_glu_w"]) + lp[f"{pre}_glu_b"]
        a, gate = jnp.split(g, 2, axis=-1)
        h = a * _swish(gate)
        return jnp.dot(h, lp[f"{pre}_out_w"]) + lp[f"{pre}_out_b"]

    def _attn(self, x, lp, bias):
        B, T, D = x.shape
        nh, hd = self.heads, self.head_dim
        h = layer_norm(x, lp["att_ln_w"], lp["att_ln_b"], 1e-5)
        q = (jnp.dot(h, lp["wq"]) + lp["bq"]).reshape(B, T, nh, hd)
        k = (jnp.dot(h, lp["wk"]) + lp["bk"]).reshape(B, T, nh, hd)
        v = (jnp.dot(h, lp["wv"]) + lp["bv"]).reshape(B, T, nh, hd)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * self.scale
        s = s + bias.astype(jnp.float32)
        a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", a, v,
                       preferred_element_type=jnp.float32
                       ).astype(x.dtype).reshape(B, T, D)
        return jnp.dot(o, lp["wo"]) + lp["bo"]

    def _conv(self, x, lp):
        h = layer_norm(x, lp["conv_ln_w"], lp["conv_ln_b"], 1e-5)
        # GLUPointWiseConv, k=1 causal (no trim needed), swish GLU with
        # additive biases (phi4mm_utils.py:145-247).
        g = jnp.dot(h, lp["glu_pw_w"].T)
        a, gate = jnp.split(g, 2, axis=-1)
        h = (a + lp["glu_b1"]) * _swish(gate + lp["glu_b2"])
        # Causal depthwise conv: left pad k-1, trim handled by VALID.
        k = self.kernel
        hp = jnp.pad(h, ((0, 0), (k - 1, 0), (0, 0)))
        h = jax.lax.conv_general_dilated(
            hp.astype(jnp.float32),
            lp["dw_w"].astype(jnp.float32).T[:, None, :],  # [k, 1, D]
            (1,), "VALID", dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.hidden).astype(x.dtype)
        h = h + lp["dw_b"]
        h = jnp.dot(h, lp["pw_w"]) + lp["pw_b"]
        h = _swish(h)
        h = jnp.dot(h, lp["ext_pw_w"].T) + lp["ext_pw_b"]
        return h

    def encode(self, ep: dict, mel: jax.Array) -> jax.Array:
        """[1, T, n_mels] -> [1, T', hidden]."""
        x = (mel.astype(self.dtype) - ep["mean"]) * ep["invstd"]
        x = self._subsample(ep, x)
        B, T, D = x.shape
        # Unfold long sequences into independent MAX_UNFOLD-frame chunks.
        unfolded = T > MAX_UNFOLD
        pad = 0
        if unfolded:
            pad = (-T) % MAX_UNFOLD
            if pad:
                x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            x = x.reshape(B * ((T + pad) // MAX_UNFOLD), MAX_UNFOLD, D)
        bias = self._t5_bias(ep, x.shape[1])
        lp_all = ep["layers"]
        for i in range(self.depth):
            lp = {k: v[i] for k, v in lp_all.items()}
            x = x + 0.5 * self._ff(x, lp, "ff_in")
            x = x + self._attn(x, lp, bias)
            x = x + self._conv(x, lp)
            x = x + 0.5 * self._ff(x, lp, "ff_out")
            x = layer_norm(x, lp["post_ln_w"], lp["post_ln_b"], 1e-5)
        if unfolded:
            x = x.reshape(B, -1, D)
            if pad:
                x = x[:, :-pad]
        return x
