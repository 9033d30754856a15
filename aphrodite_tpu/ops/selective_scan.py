"""Pallas TPU selective-scan: the Mamba first-order linear recurrence

    h[t] = dA[t] * h[t-1] + dBx[t]        (elementwise per column)

over the flat ragged token layout. Replaces ``jax.lax.associative_scan``
for prefill-sized T: XLA's scan runs log2(T) full passes over HBM (~40x
off roofline at Mamba-2.8B geometry — measured 43-61 ms/layer at T=4096,
benchmarks/ssm_bench.json), while this kernel streams each element once
and runs the log-scan VMEM-local per [bt, bc] block, carrying the running
state across T-chunks in scratch.

Segment isolation (multi-request ragged batches) is inherited from the
caller: models/mamba.py zeroes dA at each segment's first token and folds
the resumed state into dBx, so the recurrence itself needs no segment
awareness. Reference kernels: kernels/mamba/selective_scan/ (1,801 LoC
CUDA); SURVEY.md §2.7 Mamba ops row.
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


def _scan_kernel(dA_ref, dBx_ref, o_ref, carry, *, bt: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    a = dA_ref[...]            # [bt, bc] f32
    b = dBx_ref[...]
    # Hillis-Steele inclusive scan, VMEM-local: after the pass at stride d,
    # (a, b)[t] represents the combine of rows (t-2d, t] — log2(bt) passes
    # of elementwise work, no HBM traffic.
    d = 1
    while d < bt:
        a_sh = jnp.pad(a, ((d, 0), (0, 0)))[:bt]          # rows < d -> 0
        b_sh = jnp.pad(b, ((d, 0), (0, 0)))[:bt]
        # identity element for rows < d: (A=1, B=0)
        ident = jax.lax.broadcasted_iota(jnp.int32, (bt, 1), 0) < d
        a_prev = jnp.where(ident, 1.0, a_sh)
        b_prev = jnp.where(ident, 0.0, b_sh)
        b = b_prev * a + b
        a = a_prev * a
        d *= 2
    # fold in the carried state from previous T-chunks:
    # h[t] = B[t] + cumA[t] * h_in
    h_in = carry[0:1, :]                                   # [1, bc]
    o_ref[...] = b + a * h_in
    carry[0:1, :] = o_ref[bt - 1:bt, :]


@functools.partial(jax.jit, static_argnames=("block_t", "block_c",
                                             "interpret"))
def selective_scan(dA: jax.Array, dBx: jax.Array, block_t: int = 128,
                   block_c: int = 2048,
                   interpret: Optional[bool] = None) -> jax.Array:
    """h[t] = dA[t]*h[t-1] + dBx[t] over axis 0, h[-1] = 0.

    dA/dBx: [T, ...] same shape, any trailing dims (flattened to columns
    internally); returns hs with the input shape, f32."""
    if interpret is None:
        interpret = os.environ.get("APHRODITE_PALLAS_INTERPRET", "0") == "1"
    orig_shape = dA.shape
    T = orig_shape[0]
    C = 1
    for s in orig_shape[1:]:
        C *= s
    a = dA.astype(jnp.float32).reshape(T, C)
    b = dBx.astype(jnp.float32).reshape(T, C)
    bt = min(block_t, max(8, 1 << (T - 1).bit_length()))
    bc = min(block_c, max(128, C))
    Tp = cdiv(T, bt) * bt
    Cp = cdiv(C, bc) * bc
    if Tp != T or Cp != C:
        # end-padding: dA=0 resets, so padded rows/cols never contaminate
        a = jnp.pad(a, ((0, Tp - T), (0, Cp - C)))
        b = jnp.pad(b, ((0, Tp - T), (0, Cp - C)))

    hs = pl.pallas_call(
        functools.partial(_scan_kernel, bt=bt),
        grid=(Cp // bc, Tp // bt),
        in_specs=[
            pl.BlockSpec((bt, bc), lambda c, t: (t, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, bc), lambda c, t: (t, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, bc), lambda c, t: (t, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, Cp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, bc), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(a, b)
    return hs[:T, :C].reshape(orig_shape)


def ssm_scan(dA: jax.Array, dBx: jax.Array) -> jax.Array:
    """Dispatch: Pallas chunked scan on TPU at prefill-sized T, XLA
    associative_scan otherwise (tiny T / CPU oracle path)."""
    from aphrodite_tpu.platforms import current_platform
    interpret = os.environ.get("APHRODITE_PALLAS_INTERPRET", "0") == "1"
    if dA.shape[0] >= 64 and (interpret or current_platform().is_tpu):
        return selective_scan(dA, dBx)

    def combine(a, b):
        return a[0] * b[0], a[1] * b[0] + b[1]
    _, hs = jax.lax.associative_scan(
        combine, (dA.astype(jnp.float32), dBx.astype(jnp.float32)), axis=0)
    return hs
