"""Rotary position embeddings with scaling variants.

Parity target: aphrodite/modeling/layers/rotary_embedding.py (13 variants).
Implemented here: default, linear, dynamic-NTK, YaRN, Llama3, partial rotary.
HF "rotate_half" (non-interleaved) convention, matching HF checkpoints.

TPU note: cos/sin are computed per step from the position vector and fused by
XLA into the surrounding elementwise graph — no cached cos/sin table and no
gather needed (the reference's CUDA kernel kernels/pos_encoding_kernels.cu
collapses to a few VPU ops).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class RopeConfig:
    head_dim: int
    rotary_dim: int
    base: float = 10000.0
    max_position: int = 2048
    scaling: Optional[dict] = None  # HF rope_scaling dict
    # YaRN-style attention scaling factor applied to cos/sin.
    mscale: float = 1.0

    @staticmethod
    def from_hf_config(hf_config, head_dim: int) -> "RopeConfig":
        partial = getattr(hf_config, "partial_rotary_factor", 1.0)
        scaling = getattr(hf_config, "rope_scaling", None)
        if scaling is not None and not isinstance(scaling, dict):
            scaling = dict(scaling)
        return RopeConfig(
            head_dim=head_dim,
            rotary_dim=int(head_dim * partial),
            base=getattr(hf_config, "rope_theta", 10000.0),
            max_position=getattr(hf_config, "max_position_embeddings", 2048),
            scaling=scaling,
        )


def _yarn_find_dim(num_rot: float, dim: int, base: float,
                   max_pos: int) -> float:
    return (dim * math.log(max_pos / (num_rot * 2 * math.pi))) / \
        (2 * math.log(base))


def _yarn_ramp(low: float, high: float, dim: int) -> np.ndarray:
    if low == high:
        high += 0.001
    ramp = (np.arange(dim, dtype=np.float32) - low) / (high - low)
    return np.clip(ramp, 0, 1)


def compute_inv_freq(cfg: RopeConfig) -> tuple[np.ndarray, float]:
    """Returns (inv_freq [rotary_dim//2], mscale)."""
    dim = cfg.rotary_dim
    base = cfg.base
    pos_scale = 1.0
    mscale = 1.0
    s = cfg.scaling or {}
    rope_type = s.get("rope_type", s.get("type", "default"))

    if rope_type == "dynamic":
        # Static approximation at max_model_len (standard serving practice).
        factor = s.get("factor", 1.0)
        base = base * factor ** (dim / (dim - 2))
    inv_freq = 1.0 / (base ** (np.arange(0, dim, 2, dtype=np.float64) / dim))

    if rope_type == "linear":
        pos_scale = 1.0 / s.get("factor", 1.0)
        inv_freq = inv_freq * pos_scale
    elif rope_type == "llama3":
        factor = s.get("factor", 8.0)
        low_f = s.get("low_freq_factor", 1.0)
        high_f = s.get("high_freq_factor", 4.0)
        orig_max = s.get("original_max_position_embeddings", 8192)
        wavelen = 2 * math.pi / inv_freq
        low_wl = orig_max / low_f
        high_wl = orig_max / high_f
        smooth = (orig_max / wavelen - low_f) / (high_f - low_f)
        smooth = np.clip(smooth, 0, 1)
        interp = (1 - smooth) * inv_freq / factor + smooth * inv_freq
        inv_freq = np.where(wavelen > low_wl, inv_freq / factor,
                            np.where(wavelen < high_wl, inv_freq, interp))
    elif rope_type == "yarn":
        factor = s.get("factor", 1.0)
        orig_max = s.get("original_max_position_embeddings", cfg.max_position)
        beta_fast = s.get("beta_fast", 32)
        beta_slow = s.get("beta_slow", 1)
        low = math.floor(_yarn_find_dim(beta_fast, dim, base, orig_max))
        high = math.ceil(_yarn_find_dim(beta_slow, dim, base, orig_max))
        low, high = max(low, 0), min(high, dim - 1)
        mask = 1 - _yarn_ramp(low / 2, high / 2, dim // 2)
        inv_freq = inv_freq / factor * mask + inv_freq * (1 - mask)
        attn_factor = s.get("attn_factor", 1.0)
        if factor > 1.0:
            mscale = (0.1 * math.log(factor) + 1.0) * attn_factor
    elif rope_type == "deepseek_yarn":
        # DeepSeek V2/V3 YaRN (reference: DeepseekScalingRotaryEmbedding,
        # aphrodite/modeling/layers/rotary_embedding.py:711-767): same
        # frequency interpolation as plain YaRN but the cos/sin magnitude
        # correction is the *ratio* of the mscale computed with the
        # checkpoint's `mscale` vs `mscale_all_dim` knobs; the remaining
        # mscale_all_dim^2 factor is folded into the attention softmax
        # scale by the model (models/deepseek.py).
        factor = s.get("factor", 1.0)
        orig_max = s.get("original_max_position_embeddings", cfg.max_position)
        beta_fast = s.get("beta_fast", 32)
        beta_slow = s.get("beta_slow", 1)
        low = math.floor(_yarn_find_dim(beta_fast, dim, base, orig_max))
        high = math.ceil(_yarn_find_dim(beta_slow, dim, base, orig_max))
        low, high = max(low, 0), min(high, dim - 1)
        mask = 1 - _yarn_ramp(low / 2, high / 2, dim // 2)
        inv_freq = inv_freq / factor * mask + inv_freq * (1 - mask)
        attn_factor = s.get("attn_factor", 1.0)
        mscale = float(
            deepseek_yarn_mscale(factor, float(s.get("mscale", 1.0))) /
            deepseek_yarn_mscale(factor, float(s.get("mscale_all_dim", 0.0)))
            * attn_factor)
    elif rope_type in ("longrope", "su"):
        # Phi-3 / MiniCPM3 LongRoPE (reference
        # Phi3LongRoPEScaledRotaryEmbedding, rotary_embedding.py:586-645):
        # two per-dim rescale vectors; positions below
        # original_max_position_embeddings use short_factor, the rest
        # long_factor. Selection happens in compute_cos_sin via
        # `longrope_orig_max`. Both branches share the default
        # sqrt(1 + ln(scale)/ln(orig_max)) magnitude correction unless the
        # checkpoint overrides short/long mscale.
        orig_max = s.get("original_max_position_embeddings",
                         cfg.max_position)
        short = np.asarray(s["short_factor"], np.float64)
        long_ = np.asarray(s["long_factor"], np.float64)
        scale = cfg.max_position / orig_max
        default_m = 1.0 if scale <= 1.0 else math.sqrt(
            1 + math.log(scale) / math.log(orig_max))
        short_m = float(s.get("short_mscale") or default_m)
        long_m = float(s.get("long_mscale") or default_m)
        inv_freq = np.stack([inv_freq / short, inv_freq / long_])
        mscale = np.array([short_m, long_m], np.float32)
    if isinstance(mscale, np.ndarray):
        return inv_freq.astype(np.float32), mscale
    return inv_freq.astype(np.float32), float(mscale)


def longrope_orig_max(cfg: RopeConfig) -> Optional[int]:
    """Position threshold between LongRoPE's short/long factor sets, or
    None when the config is not longrope-scaled."""
    s = cfg.scaling or {}
    if s.get("rope_type", s.get("type", "default")) in ("longrope", "su"):
        return int(s.get("original_max_position_embeddings",
                         cfg.max_position))
    return None


def deepseek_yarn_mscale(scale: float, mscale: float) -> float:
    """yarn_get_mscale (reference deepseek_v2.py:179-183)."""
    if scale <= 1.0:
        return 1.0
    return 0.1 * mscale * math.log(scale) + 1.0


def compute_cos_sin(positions: jax.Array, inv_freq: jax.Array,
                    mscale=1.0, longrope_orig_max: Optional[int] = None
                    ) -> tuple[jax.Array, jax.Array]:
    """positions [T] int32 -> (cos, sin) each [T, rotary_dim//2] float32.

    For LongRoPE, ``inv_freq`` is [2, rotary_dim//2] (short/long factor
    sets), ``mscale`` is [2], and each position picks its row by comparing
    against ``longrope_orig_max``."""
    if inv_freq.ndim == 2:
        sel = (positions >= longrope_orig_max).astype(jnp.int32)
        inv = inv_freq[sel]                      # [T, rot//2]
        ms = jnp.asarray(mscale)[sel][:, None]   # [T, 1]
        freqs = positions.astype(jnp.float32)[:, None] * inv
        return jnp.cos(freqs) * ms, jnp.sin(freqs) * ms
    freqs = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    return jnp.cos(freqs) * mscale, jnp.sin(freqs) * mscale


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [T, heads, head_dim]; cos/sin: [T, rotary_dim//2].

    HF rotate-half convention on the leading ``rotary_dim`` dims; the tail
    (head_dim - rotary_dim) passes through untouched.
    """
    rot = cos.shape[-1] * 2
    xr, xt = x[..., :rot], x[..., rot:]
    xf = xr.astype(jnp.float32)
    half = rot // 2
    x1, x2 = xf[..., :half], xf[..., half:]
    c, s = cos[:, None, :], sin[:, None, :]
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    out = out.astype(x.dtype)
    if xt.shape[-1]:
        out = jnp.concatenate([out, xt], axis=-1)
    return out


def apply_rope_interleaved(x: jax.Array, cos: jax.Array,
                           sin: jax.Array) -> jax.Array:
    """GPT-J / DeepSeek rotary convention (``is_neox_style=False`` in the
    reference, rotary_embedding.py:99-107): pairs ``(x[2i], x[2i+1])`` rotate
    by frequency ``i``. x: [T, heads, rot]; cos/sin: [T, rot//2]."""
    T, heads, rot = x.shape
    xf = x.astype(jnp.float32).reshape(T, heads, rot // 2, 2)
    x1, x2 = xf[..., 0], xf[..., 1]
    c, s = cos[:, None, :], sin[:, None, :]
    out = jnp.stack([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.reshape(T, heads, rot).astype(x.dtype)
