"""Quantized matmuls (W4A16 / W8A16 / int8 W8A8 / FP8).

TPU replacement for the reference's 40k-LoC CUDA quant-GEMM zoo
(kernels/quantization/ — marlin/machete/gptq/awq/...; SURVEY.md §2.7): the
dequant is expressed as an elementwise producer of the dot operand so XLA
fuses it into the MXU pipeline and weights stream from HBM in their packed
dtype. The group-wise W4A16 zero-point term is algebraically split out:

    y = x @ ((q - z) * s) = x @ (q * s)  -  xsum_g @ (z_g * s_g)

so the main contraction stays a single dot. Activation quantization for
W8A8 is dynamic per-token (reference: quantization/tpu_int8.py semantics).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp


def _use_pallas(w4_packed: bool = False) -> bool:
    """Pallas-vs-XLA dequant GEMM policy, settled by measurement
    (r3: benchmarks/quant_microbench_v5e.json; r4:
    benchmarks/w4_kernel_lab.py + profile_8b_w4a16.json):

    - W4A16 decode: XLA's NATIVE-int4 dot is the round-4 default at
      M<=64 (fused upcast, no bf16 materialization, ~351 GB/s effective
      vs ~280 for the best Pallas nibble kernel, which is VPU-dequant-
      bound); the int4 Pallas kernel covers 64<M<=256. This policy gate
      only selects Pallas for the legacy packed-int8 leaves and the
      64-256 band.
    - XLA's PLAIN W4 path (int8 nibbles) materializes the dequantized
      bf16 weights (HLO-verified, r3) — never used at decode.
    - W8A16: a tie within noise at decode M; XLA stays the default.

    Override with APHRODITE_QUANT_PALLAS=1/0; interpret-mode tests force
    the kernels."""
    env = os.environ.get("APHRODITE_QUANT_PALLAS")
    if env is not None:
        return env == "1"
    if os.environ.get("APHRODITE_PALLAS_INTERPRET", "0") == "1":
        return True
    from aphrodite_tpu.platforms import current_platform
    return w4_packed and current_platform().is_tpu


def w8a16_matmul(x: jax.Array, qweight: jax.Array,
                 scales: jax.Array) -> jax.Array:
    """Weight-only int8: per-output-channel symmetric scales."""
    if _use_pallas() and x.shape[0] <= 256:  # M kept whole in VMEM
        from aphrodite_tpu.ops.quant_matmul_pallas import w8a16_matmul_pallas
        return w8a16_matmul_pallas(x, qweight, scales)
    acc = jnp.dot(x, qweight.astype(x.dtype),
                  preferred_element_type=jnp.float32)
    return (acc * scales.astype(jnp.float32)[None, :]).astype(x.dtype)


def int8_matmul(x: jax.Array, qweight: jax.Array,
                scales: jax.Array) -> jax.Array:
    """W8A8 on the int8 MXU: dynamic per-token activation scales."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    x_scale = jnp.maximum(amax / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / x_scale), -128,
                  127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, qweight, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * x_scale * \
        scales.astype(jnp.float32)[None, :]
    return out.astype(x.dtype)


def fp8_matmul(x: jax.Array, qweight: jax.Array, weight_scale: jax.Array,
               input_scale: Optional[jax.Array] = None,
               act_quant: bool = False) -> jax.Array:
    """FP8-e4m3 weights, optionally with FP8 activation quantization
    (reference quantization/fp8.py:47-80 + kernels/scaled_mm). On MXU
    generations without native fp8 the compute upcasts to the act dtype,
    but W8A8 numerics are preserved: both operands are genuinely rounded
    to e4m3 before the dot.

    weight_scale: [N] per-output-channel, or 2-D blockwise [K/b0, N/b1]
    (DeepSeek weight_block_size); input_scale: static per-tensor scalar
    (None + act_quant => dynamic per-token scales in-graph)."""
    K, N = qweight.shape[-2:]
    blockwise = weight_scale.ndim == 2 and weight_scale.shape != (1, N)
    wf = qweight.astype(x.dtype)
    if blockwise:
        Kb, Nb = weight_scale.shape
        if K % Kb or N % Nb:
            # Ragged grids are ambiguous at runtime (96 rows over 2 blocks
            # could be 48+48 or 64+32); the loader normalizes checkpoint
            # grids to exact division (_normalize_block_scales).
            raise ValueError(
                f"blockwise scale grid {weight_scale.shape} does not divide "
                f"weight {qweight.shape}; load via "
                "quantization.loader._normalize_block_scales")
        b0, b1 = K // Kb, N // Nb
        wf = (wf.reshape(Kb, b0, Nb, b1)
              * weight_scale.astype(x.dtype)[:, None, :, None]
              ).reshape(K, N)
    if act_quant:
        import ml_dtypes
        f8 = jnp.dtype(ml_dtypes.float8_e4m3fn)
        if input_scale is None:  # dynamic per-token
            xs = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                         keepdims=True) / 448.0
            xs = jnp.maximum(xs, 1e-10)
        else:
            xs = input_scale.astype(jnp.float32).reshape(1, 1)
        x8 = (x.astype(jnp.float32) / xs).astype(f8)
        acc = jnp.dot(x8.astype(x.dtype), wf,
                      preferred_element_type=jnp.float32) * xs
    else:
        acc = jnp.dot(x, wf, preferred_element_type=jnp.float32)
    if not blockwise:
        acc = acc * weight_scale.astype(jnp.float32)[None, :]
    return acc.astype(x.dtype)


def fpx_matmul(x: jax.Array, codes: jax.Array, scales: jax.Array,
               ebits: int, mbits: int) -> jax.Array:
    """QuantLLM FPx (fp4/fp5/fp6/fp7) weight-only matmul: uint8
    sign|exp|mantissa codes decode elementwise (an XLA producer fused into
    the dot operand stream — the TPU analog of the reference's
    kernels/quantization/fp6/ dequant-GEMM), per-output-channel scales
    applied on the accumulator. exp==0 rows are denormals; the full
    exponent range is finite (no inf/nan), reference fp6_utils.py:185-200."""
    bias = (1 << (ebits - 1)) - 1
    emask = (1 << ebits) - 1
    mmask = (1 << mbits) - 1
    c = codes.astype(jnp.int32)
    e = (c >> mbits) & emask
    man = c & mmask
    sign = jnp.where((c >> (ebits + mbits)) & 1, -1.0, 1.0)
    mag = jnp.where(
        e == 0,
        man.astype(jnp.float32) * (2.0 ** (1 - bias - mbits)),
        ((1 << mbits) + man).astype(jnp.float32)
        * jnp.exp2((e - (bias + mbits)).astype(jnp.float32)))
    w = (sign * mag).astype(x.dtype)
    acc = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return (acc * scales.astype(jnp.float32)[None, :]).astype(x.dtype)


def w4a16_int4_grouped(x: jax.Array, q4: jax.Array, scales: jax.Array,
                       zeros: Optional[jax.Array]) -> jax.Array:
    """Decode-M W4A16 on XLA's native-int4 dot: the int4 upcast is fused
    into the MXU pipeline (no bf16 weight materialization), measured
    ~380-600 GB/s effective weight stream on v5e vs ~280 for the best
    Pallas dequant kernel (benchmarks/w4_kernel_lab.py v7-v9). Exact
    group-quant semantics via a G-batched dot whose scale contraction XLA
    fuses — valid only at small M (the fusion materializes the [G, M, N]
    intermediate above M~64, w4_kernel_lab v9)."""
    M, K = x.shape
    G, N = scales.shape[-2:]
    group = K // G
    xg = x.reshape(M, G, group).transpose(1, 0, 2)          # [G, M, group]
    wg = q4.reshape(G, group, N)
    dg = jax.lax.dot_general(
        xg, wg.astype(x.dtype), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # [G, M, N]
    y = jnp.einsum('gmn,gn->mn', dg, scales.astype(jnp.float32))
    if zeros is not None:
        xs = xg.sum(axis=2, dtype=jnp.float32).T             # [M, G]
        y = y - jnp.dot(xs, zeros.astype(jnp.float32) *
                        scales.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def w4a16_matmul(x: jax.Array, qweight: Optional[jax.Array],
                 scales: jax.Array,
                 zeros: Optional[jax.Array],
                 group_size: Optional[int] = None,
                 input_perm: Optional[jax.Array] = None,
                 qpacked: Optional[jax.Array] = None,
                 qweight4: Optional[jax.Array] = None) -> jax.Array:
    """Group-quantized 4-bit weights (GPTQ/AWQ after load-time repack).

    qweight: int8 [in, out] holding uint4 values 0..15, OR qpacked:
    uint8 [in/2, out] global-half nibble packing (true 4-bit HBM storage,
    loader._pack_w4_leaves), OR qweight4: native jnp.int4 [in, out]
    (TPU resident format, loader.realize_int4_leaves);
    scales/zeros: [in/group, out] float; y = x @ ((q - z) * s).
    """
    if input_perm is not None:
        x = jnp.take(x, input_perm, axis=-1)  # desc_act reorder
    if qweight4 is not None:
        if x.shape[0] <= 64:
            return w4a16_int4_grouped(x, qweight4, scales, zeros)
        if x.shape[0] <= 256 and _use_pallas(w4_packed=True):
            from aphrodite_tpu.ops.quant_matmul_pallas import (
                w4a16_int4_matmul_pallas)
            return w4a16_int4_matmul_pallas(x, qweight4, scales, zeros)
        # prefill: MXU-bound; XLA's dequant materialization amortizes
        qweight = qweight4.astype(jnp.int8)
    # Pallas for decode-sized M only: the kernel keeps the M dim whole in
    # VMEM (fine at M<=256; OOM at prefill M~16k), and at prefill the
    # GEMM is MXU-bound so XLA's dequant materialization amortizes anyway.
    if qpacked is not None and zeros is not None and x.shape[0] <= 256 \
            and _use_pallas(w4_packed=True):
        from aphrodite_tpu.ops.quant_matmul_pallas import (
            w4a16_packed_matmul_pallas)
        return w4a16_packed_matmul_pallas(x, qpacked, scales, zeros)
    if qpacked is not None and qweight is None:
        # XLA/CPU fallback: unpack the halves (fused into the dot consumer).
        b32 = qpacked.astype(jnp.int32) & 0xFF
        qweight = jnp.concatenate(
            [(b32 & 0xF).astype(jnp.int8),
             ((b32 >> 4) & 0xF).astype(jnp.int8)], axis=-2)
    if zeros is not None and _use_pallas():
        from aphrodite_tpu.ops.quant_matmul_pallas import w4a16_matmul_pallas
        return w4a16_matmul_pallas(x, qweight, scales, zeros)
    k, n = qweight.shape
    G = scales.shape[-2]
    g = k // G
    # Scale folded into the quantized operand: fused by XLA into the dot.
    w_scaled = (qweight.reshape(G, g, n).astype(x.dtype) *
                scales.reshape(G, 1, n).astype(x.dtype)).reshape(k, n)
    acc = jnp.dot(x, w_scaled, preferred_element_type=jnp.float32)
    if zeros is not None:
        xsum = jnp.sum(x.astype(jnp.float32).reshape(*x.shape[:-1], G, g),
                       axis=-1)  # [T, G]
        zcorr = (zeros.astype(jnp.float32) *
                 scales.astype(jnp.float32))  # [G, n]
        acc = acc - jnp.dot(xsum, zcorr, preferred_element_type=jnp.float32)
    return acc.astype(x.dtype)
