"""Pallas TPU kernel: fused dequant matmul (W8A16 / W4A16).

The XLA W4 path materializes a bf16 copy of the weights in HBM (HLO
verified + microbenched, benchmarks/quant_microbench_v5e.json) — worse
than not quantizing at decode. Here the packed block is converted in VMEM
on the way into the MXU, so HBM traffic is the packed weights only; the
W4-packed kernel is the TPU default (ops/quant_gemm._use_pallas). W8A16
measured a tie with XLA's fused upcast and stays opt-in.
This is the TPU replacement for the reference's marlin/machete dequant GEMMs
(kernels/quantization/, SURVEY.md §2.7 "Quant GEMMs" row).

Grid (N/bn, K/bk) with K innermost; fp32 accumulator in VMEM scratch; the
per-output-channel (or per-group) scale and the W4 zero-point correction are
applied in the epilogue at the final K step. Pallas pipelines the weight
block DMAs automatically via the BlockSpecs.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aphrodite_tpu.utils import cdiv


def _w8_kernel(x_ref, w_ref, s_ref, o_ref, acc, *, nk: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    w = w_ref[...].astype(x_ref.dtype)  # int8 -> act dtype, VMEM-local
    acc[...] += jax.lax.dot(x_ref[...], w,
                            preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[...] = (acc[...] *
                      s_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "block_k",
                                             "interpret"))
def w8a16_matmul_pallas(x: jax.Array, qweight: jax.Array, scales: jax.Array,
                        block_n: int = 512, block_k: int = 512,
                        interpret: Optional[bool] = None) -> jax.Array:
    """x [M, K] (bf16/f32) @ int8 [K, N] * scales [N] -> [M, N]."""
    if interpret is None:
        interpret = os.environ.get("APHRODITE_PALLAS_INTERPRET", "0") == "1"
    M, K = x.shape
    K2, N = qweight.shape
    bn = min(block_n, N)
    bk = min(block_k, K)
    nk = cdiv(K, bk)
    grid = (cdiv(N, bn), nk)

    out = pl.pallas_call(
        functools.partial(_w8_kernel, nk=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, bk), lambda n, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda n, k: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda n, k: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x, qweight, scales.reshape(1, N))
    return out


def _w4_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc, xsum, *, nk: int,
               groups_per_bk: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
        xsum[...] = jnp.zeros_like(xsum)

    # Scale folded per-group into the weight block before the dot: the block
    # spans `groups_per_bk` whole groups, so s/z rows broadcast per group.
    xb = x_ref[...]
    w = w_ref[...].astype(x_ref.dtype)  # uint4-in-int8 -> act dtype
    bk, bn = w.shape
    g = bk // groups_per_bk
    sblk = s_ref[...].astype(x_ref.dtype)  # [groups_per_bk, bn]
    wg = w.reshape(groups_per_bk, g, bn) * sblk[:, None, :]
    acc[...] += jax.lax.dot(xb, wg.reshape(bk, bn),
                            preferred_element_type=jnp.float32)
    # Zero-point correction needs per-group x sums: accumulate
    # sum_g x[t, g] * (z[g, n] * s[g, n]) as a small dot.
    xg = jnp.sum(xb.reshape(xb.shape[0], groups_per_bk, g).astype(
        jnp.float32), axis=2)  # [M, groups_per_bk]
    zs = (z_ref[...] * s_ref[...]).astype(jnp.float32)  # [gpb, bn]
    xsum[...] += jax.lax.dot(xg.astype(x_ref.dtype), zs.astype(x_ref.dtype),
                             preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[...] = (acc[...] - xsum[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "block_k",
                                             "interpret"))
def w4a16_matmul_pallas(x: jax.Array, qweight: jax.Array, scales: jax.Array,
                        zeros: jax.Array, block_n: int = 512,
                        block_k: int = 512,
                        interpret: Optional[bool] = None) -> jax.Array:
    """x [M, K] @ ((uint4 [K, N] - z) * s), group-quantized.
    scales/zeros: [G, N], G = K // group_size. block_k is rounded to a
    multiple of the group size."""
    if interpret is None:
        interpret = os.environ.get("APHRODITE_PALLAS_INTERPRET", "0") == "1"
    M, K = x.shape
    _, N = qweight.shape
    G = scales.shape[0]
    group = K // G
    bn = min(block_n, N)
    bk = min(block_k, K)
    bk = max((bk // group) * group, group)  # whole groups per block
    nk = cdiv(K, bk)
    gpb = bk // group

    out = pl.pallas_call(
        functools.partial(_w4_kernel, nk=nk, groups_per_bk=gpb),
        grid=(cdiv(N, bn), nk),
        in_specs=[
            pl.BlockSpec((M, bk), lambda n, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb, bn), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb, bn), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda n, k: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32),
                        pltpu.VMEM((M, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x, qweight, scales, zeros)
    return out


def _w4p_kernel(x1_ref, x2_ref, w_ref, s1_ref, z1_ref, s2_ref, z2_ref,
                o_ref, acc, xsum, *, nk: int, groups_per_bk: int):
    """True-4-bit W4A16: w_ref is uint8 [bkp, bn] carrying original rows
    [r0, r0+bkp) in the low nibbles and rows [K/2+r0, ...) in the high
    nibbles (global-half packing, loader._pack_w4_leaves). The two
    contributions use two x/scale block views — no sublane interleave."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
        xsum[...] = jnp.zeros_like(xsum)

    # Packed bytes ride as int8 bit patterns; Mosaic legalizes int32
    # shifts/masks (uint8 ops it does not) — widen, split nibbles, cast.
    b32 = w_ref[...].astype(jnp.int32) & 0xFF
    lo = (b32 & 0xF).astype(x1_ref.dtype)
    hi = ((b32 >> 4) & 0xF).astype(x1_ref.dtype)
    bkp, bn = lo.shape
    g = bkp // groups_per_bk

    def half(x_ref, w, s_ref, z_ref):
        sblk = s_ref[...].astype(x_ref.dtype)  # [gpb, bn]
        wg = w.reshape(groups_per_bk, g, bn) * sblk[:, None, :]
        acc[...] += jax.lax.dot(x_ref[...], wg.reshape(bkp, bn),
                                preferred_element_type=jnp.float32)
        xg = jnp.sum(x_ref[...].reshape(x_ref.shape[0], groups_per_bk, g)
                     .astype(jnp.float32), axis=2)
        zs = (z_ref[...] * s_ref[...]).astype(jnp.float32)
        xsum[...] += jax.lax.dot(xg.astype(x_ref.dtype),
                                 zs.astype(x_ref.dtype),
                                 preferred_element_type=jnp.float32)

    half(x1_ref, lo, s1_ref, z1_ref)
    half(x2_ref, hi, s2_ref, z2_ref)

    @pl.when(k == nk - 1)
    def _():
        o_ref[...] = (acc[...] - xsum[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "block_k",
                                             "interpret"))
def w4a16_packed_matmul_pallas(x: jax.Array, qpacked: jax.Array,
                               scales: jax.Array, zeros: jax.Array,
                               block_n: int = 512, block_k: int = 1024,
                               interpret: Optional[bool] = None
                               ) -> jax.Array:
    """x [M, K] @ dequant(nibble-packed 4-bit int8 [K/2, N]); scales/zeros
    [G, N] with (K/2) % (8*group) == 0 (guaranteed by the loader)."""
    if interpret is None:
        interpret = os.environ.get("APHRODITE_PALLAS_INTERPRET", "0") == "1"
    M, K = x.shape
    Kp, N = qpacked.shape
    assert K == 2 * Kp, (K, Kp)
    G = scales.shape[0]
    group = K // G
    Gh = G // 2
    bn = min(block_n, N)
    # Scale blocks need >= 8 sublanes (Mosaic min tile): bkp is a multiple
    # of 8*group that divides Kp (the loader only packs such shapes).
    unit = 8 * group
    assert Kp % unit == 0, (Kp, unit)
    bkp = max((min(block_k, Kp) // unit) * unit, unit)
    while Kp % bkp:
        bkp -= unit
    nk = Kp // bkp
    gpb = bkp // group

    out = pl.pallas_call(
        functools.partial(_w4p_kernel, nk=nk, groups_per_bk=gpb),
        grid=(cdiv(N, bn), nk),
        in_specs=[
            pl.BlockSpec((M, bkp), lambda n, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, bkp), lambda n, k, _kp=nk: (0, k + _kp),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bkp, bn), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb, bn), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb, bn), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb, bn), lambda n, k, _gh=nk: (k + _gh, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb, bn), lambda n, k, _gh=nk: (k + _gh, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda n, k: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32),
                        pltpu.VMEM((M, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x, x, qpacked, scales, zeros, scales, zeros)
    return out


def _w4i4_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc, *, nk: int,
                 gpb: int, group: int):
    """Native-int4 W4A16: w_ref is jnp.int4 [bk, bn] (hardware sub-byte
    tiling, no nibble arithmetic); per-group dots with the scale and
    zero-point applied to the [M, bn] group result (the VPU-cheapest
    dequant found in benchmarks/w4_kernel_lab.py v2/v5)."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    for gi in range(gpb):
        wg = w_ref[gi * group:(gi + 1) * group, :].astype(x_ref.dtype)
        xg = x_ref[:, gi * group:(gi + 1) * group]
        d = jax.lax.dot(xg, wg, preferred_element_type=jnp.float32)
        xs = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        acc[...] += (d - xs * z_ref[gi][None, :].astype(jnp.float32)) \
            * s_ref[gi][None, :].astype(jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[...] = acc[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "block_k",
                                             "interpret"))
def w4a16_int4_matmul_pallas(x: jax.Array, q4: jax.Array, scales: jax.Array,
                             zeros: jax.Array, block_n: int = 512,
                             block_k: int = 2048,
                             interpret: Optional[bool] = None) -> jax.Array:
    """x [M, K] @ ((int4 [K, N] - z) * s), group-quantized; q4 is a native
    jnp.int4 array (loader.realize_int4_leaves)."""
    if interpret is None:
        interpret = os.environ.get("APHRODITE_PALLAS_INTERPRET", "0") == "1"
    M, K = x.shape
    _, N = q4.shape
    G = scales.shape[0]
    group = K // G
    bn = min(block_n, N)
    bk = max((min(block_k, K) // group) * group, group)
    while K % bk:
        bk -= group
    nk = K // bk
    gpb = bk // group

    return pl.pallas_call(
        functools.partial(_w4i4_kernel, nk=nk, gpb=gpb, group=group),
        grid=(cdiv(N, bn), nk),
        in_specs=[
            pl.BlockSpec((M, bk), lambda n, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb, bn), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb, bn), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda n, k: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x, q4, scales, zeros)
