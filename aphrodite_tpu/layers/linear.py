"""Linear application with pluggable quantized-weight formats.

Where the reference has nn.Module linear classes with LinearMethodBase
plug-ins (aphrodite/modeling/layers/linear.py:143), here a *weight* is either
a plain jnp array ``[in, out]`` or a small dict describing a quantized format;
``apply_linear`` dispatches on the format. Tensor parallelism is expressed by
the sharding annotation on the weight leaves, not by the layer code
(SURVEY.md §2.8 TP row).
"""
from __future__ import annotations

from typing import Any, Optional, Union

import jax
import jax.numpy as jnp

# A weight is a plain array or {"format": str, ...tensors...}.
Weight = Union[jax.Array, dict]


def apply_linear(x: jax.Array, w: Weight,
                 bias: Optional[jax.Array] = None) -> jax.Array:
    if isinstance(w, dict):
        fmt = w["format"]
        if fmt == "w8a16":
            from aphrodite_tpu.ops.quant_gemm import w8a16_matmul
            out = w8a16_matmul(x, w["qweight"], w["scales"])
        elif fmt == "w4a16":
            from aphrodite_tpu.ops.quant_gemm import w4a16_matmul
            out = w4a16_matmul(x, w["qweight"], w["scales"], w.get("zeros"),
                               w["group_size"])
        elif fmt == "fp8":
            from aphrodite_tpu.ops.quant_gemm import fp8_matmul
            out = fp8_matmul(x, w["qweight"], w["weight_scale"],
                             w.get("input_scale"))
        elif fmt == "int8":
            from aphrodite_tpu.ops.quant_gemm import int8_matmul
            out = int8_matmul(x, w["qweight"], w["scales"])
        else:
            raise ValueError(f"unknown weight format {fmt!r}")
    else:
        out = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def weight_out_features(w: Weight) -> int:
    if isinstance(w, dict):
        return w["out_features"]
    return w.shape[-1]
