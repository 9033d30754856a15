"""Shared functional layers: norms and activations.

The reference fuses these as CUDA kernels (kernels/layernorm_kernels.cu,
activation_kernels.cu); on TPU, XLA fuses elementwise chains into adjacent
matmuls, so these stay as plain jnp expressions (SURVEY.md §2.7).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6,
             offset: float = 0.0) -> jax.Array:
    """RMSNorm in fp32, cast back to input dtype. ``offset=1.0`` gives the
    Gemma convention (weight stored as w-1)."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return (xf * (weight.astype(jnp.float32) + offset)).astype(orig_dtype)


def silu_and_mul(gate: jax.Array, up: jax.Array) -> jax.Array:
    return jax.nn.silu(gate) * up


def gelu_and_mul(gate: jax.Array, up: jax.Array,
                 approximate: str = "tanh") -> jax.Array:
    return jax.nn.gelu(gate, approximate=(approximate == "tanh")) * up


ACT2MUL = {
    "silu": silu_and_mul,
    "gelu": gelu_and_mul,
    "gelu_pytorch_tanh": gelu_and_mul,
}
