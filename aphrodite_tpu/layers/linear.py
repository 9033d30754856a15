"""Linear application with pluggable quantized-weight formats.

Where the reference has nn.Module linear classes with LinearMethodBase
plug-ins (aphrodite/modeling/layers/linear.py:143), here a *weight* is either
a plain jnp array ``[in, out]`` or a dict of arrays in a quantized layout
(array-only so it can ride through lax.scan as stacked per-layer leaves);
the format tag is static model state, passed by the caller. Tensor
parallelism is expressed by the sharding annotations on the weight leaves,
not by the layer code (SURVEY.md §2.8 TP row).
"""
from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

Weight = Union[jax.Array, dict]


def apply_linear(x: jax.Array, w: Weight,
                 bias: Optional[jax.Array] = None,
                 fmt: Optional[str] = None,
                 group_size: Optional[int] = None) -> jax.Array:
    if isinstance(w, dict):
        if fmt == "w8a16":
            from aphrodite_tpu.ops.quant_gemm import w8a16_matmul
            out = w8a16_matmul(x, w["qweight"], w["scales"])
        elif fmt == "int8":
            from aphrodite_tpu.ops.quant_gemm import int8_matmul
            out = int8_matmul(x, w["qweight"], w["scales"])
        elif fmt == "fp8":
            from aphrodite_tpu.ops.quant_gemm import fp8_matmul
            out = fp8_matmul(x, w["qweight"],
                             w.get("weight_scale_block",
                                   w.get("weight_scale")))
        elif fmt == "fp8_w8a8":
            from aphrodite_tpu.ops.quant_gemm import fp8_matmul
            out = fp8_matmul(x, w["qweight"],
                             w.get("weight_scale_block",
                                   w.get("weight_scale")),
                             input_scale=w.get("input_scale"),
                             act_quant=True)
        elif fmt == "w4a16":
            from aphrodite_tpu.ops.quant_gemm import w4a16_matmul
            out = w4a16_matmul(x, w.get("qweight"), w["scales"],
                               w.get("zeros"),
                               input_perm=w.get("input_perm"),
                               qpacked=w.get("qweight_packed"),
                               qweight4=w.get("qweight4"))
        elif fmt is not None and fmt.startswith("fpx_e"):
            from aphrodite_tpu.ops.quant_gemm import fpx_matmul
            ebits, mbits = (int(s) for s in fmt[5:].split("m"))
            out = fpx_matmul(x, w["qweight"], w["scales"], ebits, mbits)
        else:
            raise ValueError(f"unknown quant format {fmt!r}")
    else:
        # preferred=x.dtype: the MXU still accumulates fp32 internally; this
        # only sets the OUTPUT dtype, avoiding an f32 [T, N] intermediate
        # that XLA may otherwise materialize in HBM between dot and cast.
        out = jnp.dot(x, w, preferred_element_type=x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
