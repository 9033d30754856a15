"""W4A16 kernel experiments: why does the packed kernel stream at ~208 GB/s
when XLA's bf16 GEMM streams 380-423 GB/s on the same chip?

Hypothesis: the VPU dequant path (int8->int32 relayout, nibble masks, casts,
per-element scale multiply) bounds throughput, not the DMA. Variants:

  v0  current packed kernel (ops/quant_matmul_pallas)
  v1  w8a16 kernel, same byte count (no nibble work, epilogue scale)
  v2  packed kernel, scale applied to the [M,bn] dot result per group
      (moves the multiply off the [bk,bn] weight elements)
  v3  v2 with block_n=1024
  v4  v2 with the zero-correction folded into the per-group epilogue

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/w4_kernel_lab.py
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aphrodite_tpu.utils import cdiv

M = 32
GROUP = 128
L = 12  # chain layers per pass


def _sync(x):
    float(np.asarray(x).reshape(-1)[0])


def slope(fn, x0, w, chains=(4, 24)):
    ts = []
    for c in chains:
        _sync(fn(x0, w, c))
        ts.append(min(_timed(fn, x0, w, c) for _ in range(3)))
    dt = (ts[1] - ts[0]) / (chains[1] - chains[0])
    return dt


def _timed(fn, x0, w, c):
    t0 = time.perf_counter()
    _sync(fn(x0, w, c))
    return time.perf_counter() - t0


# ---------------------------------------------------------------- variants
def _v2_kernel(x1_ref, x2_ref, w_ref, s1_ref, z1_ref, s2_ref, z2_ref,
               o_ref, acc, *, nk: int, gpb: int):
    """Per-group dots, scale+zero applied to the [M,bn] group result:
    VPU work per weight element = shift+and+cvt only."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    b32 = w_ref[...].astype(jnp.int32) & 0xFF
    lo = (b32 & 0xF).astype(x1_ref.dtype)
    hi = ((b32 >> 4) & 0xF).astype(x1_ref.dtype)
    bkp, bn = lo.shape
    g = bkp // gpb

    def half(x_ref, w, s_ref, z_ref):
        sall = s_ref[...].astype(jnp.float32)   # [gpb, bn]
        zall = z_ref[...].astype(jnp.float32)
        for gi in range(gpb):
            xg = x_ref[:, gi * g:(gi + 1) * g]
            wg = w[gi * g:(gi + 1) * g, :]
            d = jax.lax.dot(xg, wg, preferred_element_type=jnp.float32)
            xs = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
            acc[...] += (d - xs * zall[gi][None, :]) * sall[gi][None, :]

    half(x1_ref, lo, s1_ref, z1_ref)
    half(x2_ref, hi, s2_ref, z2_ref)

    @pl.when(k == nk - 1)
    def _():
        o_ref[...] = acc[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "block_k"))
def w4p_v2(x, qpacked, scales, zeros, block_n=512, block_k=1024):
    M, K = x.shape
    Kp, N = qpacked.shape
    G = scales.shape[0]
    group = K // G
    bn = min(block_n, N)
    unit = 8 * group
    bkp = max((min(block_k, Kp) // unit) * unit, unit)
    while Kp % bkp:
        bkp -= unit
    nk = Kp // bkp
    gpb = bkp // group
    return pl.pallas_call(
        functools.partial(_v2_kernel, nk=nk, gpb=gpb),
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
        scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x, x, qpacked, scales, zeros, scales, zeros)


def bench_chain(mm, K, N, wmaker, label, bytes_per_layer, prep=None, **kw):
    """Chain L layer calls inside one dispatch; slope-time. `prep` maps the
    weight pytree once per call inside the jit (fixed cost, slope-cancels):
    used to create int4 arrays on device (the tunnel cannot device_put
    int4 layouts)."""
    import gc
    gc.collect()
    print(f"... {label}", flush=True)
    w = wmaker(K, N)

    @functools.partial(jax.jit, static_argnames=("chain",))
    def chained(x, w, chain):
        if prep is not None:
            w = prep(w)
        def body(xc, l):
            y = mm(xc, *[a[l] for a in w], **kw).astype(jnp.bfloat16)
            if y.shape[1] >= K:
                return y[:, :K], None
            return jnp.pad(y, ((0, 0), (0, K - y.shape[1]))), None
        def rep(xc, _):
            out, _ = jax.lax.scan(body, xc, jnp.arange(L, dtype=jnp.int32))
            return out, None
        out, _ = jax.lax.scan(rep, x, None, length=chain)
        return out

    x0 = jnp.ones((M, K), jnp.bfloat16)
    dt = slope(chained, x0, w)
    gbps = bytes_per_layer * L / dt / 1e9
    print(f"{label:<34} {dt*1e3/L:7.3f} ms/layer  {gbps:7.1f} GB/s",
          flush=True)
    return gbps


def packed_w(K, N):
    key = jax.random.PRNGKey(0)
    qp = jax.random.randint(key, (L, K // 2, N), -128, 128,
                            dtype=jnp.int8)
    sc = jnp.ones((L, K // GROUP, N), jnp.float32)
    zr = jnp.full((L, K // GROUP, N), 8.0, jnp.float32)
    return (qp, sc, zr)


def int8_w(K, N):
    key = jax.random.PRNGKey(0)
    qw = jax.random.randint(key, (L, K, N), -128, 128, dtype=jnp.int8)
    sc = jnp.ones((L, N), jnp.float32)
    return (qw, sc)


def main():
    from aphrodite_tpu.ops.quant_matmul_pallas import (
        w4a16_packed_matmul_pallas, w8a16_matmul_pallas)

    K, N = 4096, 28672  # the dominant gate_up projection
    w4_bytes = K // 2 * N + 2 * (K // GROUP) * N * 4
    w8_bytes = K * N + N * 4
    print(f"shape [{K}x{N}] x{L} layers, M={M}", flush=True)

    bench_chain(w4a16_packed_matmul_pallas, K, N, packed_w,
                "v0 current packed", w4_bytes)
    bench_chain(w8a16_matmul_pallas, K, N, int8_w,
                "v1 w8a16 (2x bytes, no nibbles)", w8_bytes)
    bench_chain(w4p_v2, K, N, packed_w,
                "v2 per-group dots, post-scale", w4_bytes)
    bench_chain(w4p_v2, K, N, packed_w,
                "v3 = v2 + bn=1024", w4_bytes, block_n=1024)
    bench_chain(w4p_v2, K, N, packed_w,
                "v3b = v2 + bn=2048", w4_bytes, block_n=2048)
    bench_chain(w4p_v2, K, N, packed_w,
                "v3c = v2 + bn=1024, bk=2048", w4_bytes,
                block_n=1024, block_k=2048)


if __name__ == "__main__":
    main()


# -------------------------------------------------- v4: int32-plane packing
def pack_planes(q4, group):
    """int4 values [L, K, N] (uint4 in int8) -> int32 [L, K/8, N]: word row
    r holds nibble-planes i = original rows i*K/8 + r. No int8->int32
    relayout in the kernel: the block loads in native 32-bit tiling."""
    Lc, K, N = q4.shape
    Kw = K // 8
    w = jnp.zeros((Lc, Kw, N), jnp.int32)
    for i in range(8):
        w = w | (q4[:, i * Kw:(i + 1) * Kw, :].astype(jnp.int32) << (4 * i))
    return w


def _v4_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, *, Kw, group, post_scale):
    b = w_ref[...]                      # [Kw, bn] int32, native tiling
    gpbp = Kw // group                  # groups per plane
    bn = b.shape[1]
    acc = jnp.zeros((x_ref.shape[0], bn), jnp.float32)
    for i in range(8):
        wi = ((b >> (4 * i)) & 0xF).astype(x_ref.dtype)   # [Kw, bn]
        xi = x_ref[:, i * Kw:(i + 1) * Kw]
        si = s_ref[i * gpbp:(i + 1) * gpbp, :]
        zi = z_ref[i * gpbp:(i + 1) * gpbp, :]
        if post_scale:
            for gi in range(gpbp):
                xg = xi[:, gi * group:(gi + 1) * group]
                d = jax.lax.dot(xg, wi[gi * group:(gi + 1) * group, :],
                                preferred_element_type=jnp.float32)
                xs = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
                acc += (d - xs * zi[gi][None, :].astype(jnp.float32)) \
                    * si[gi][None, :].astype(jnp.float32)
        else:
            sb = si.astype(x_ref.dtype)
            wg = wi.reshape(gpbp, group, bn) * sb[:, None, :]
            acc += jax.lax.dot(xi, wg.reshape(Kw, bn),
                               preferred_element_type=jnp.float32)
            xg = jnp.sum(xi.reshape(xi.shape[0], gpbp, group)
                         .astype(jnp.float32), axis=2)
            zs = (zi * si).astype(x_ref.dtype)
            acc -= jax.lax.dot(xg.astype(x_ref.dtype), zs,
                               preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "post_scale"))
def w4p_v4(x, wplanes, scales, zeros, block_n=512, post_scale=True):
    M, K = x.shape
    Kw, N = wplanes.shape
    G = scales.shape[0]
    group = K // G
    bn = min(block_n, N)
    return pl.pallas_call(
        functools.partial(_v4_kernel, Kw=Kw, group=group,
                          post_scale=post_scale),
        grid=(cdiv(N, bn),),
        in_specs=[
            pl.BlockSpec((M, K), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kw, bn), lambda n: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bn), lambda n: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bn), lambda n: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda n: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x, wplanes, scales, zeros)


def plane_w(K, N):
    key = jax.random.PRNGKey(0)
    q4 = jax.random.randint(key, (L, K, N), 0, 16, dtype=jnp.int8)
    wp = jax.jit(pack_planes, static_argnames=("group",))(q4, GROUP)
    sc = jnp.ones((L, K // GROUP, N), jnp.float32)
    zr = jnp.full((L, K // GROUP, N), 8.0, jnp.float32)
    return (wp, sc, zr)


def main_v4():
    K, N = 4096, 28672
    w4_bytes = K // 2 * N + 2 * (K // GROUP) * N * 4
    bench_chain(w4p_v4, K, N, plane_w,
                "v4a planes, post-scale dots", w4_bytes, post_scale=True)
    bench_chain(w4p_v4, K, N, plane_w,
                "v4b planes, weight-scale mul", w4_bytes, post_scale=False)
    bench_chain(w4p_v4, K, N, plane_w,
                "v4c planes, post, bn=1024", w4_bytes, post_scale=True,
                block_n=1024)
    bench_chain(w4p_v4, K, N, plane_w,
                "v4d planes, post, bn=2048", w4_bytes, post_scale=True,
                block_n=2048)


if __name__ == "__main__" and "--v4" in __import__("sys").argv:
    main_v4()


# ------------------------------------------- v5/v6/v7: int4 dtype + probes
def _v5_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, *, group):
    """w_ref is native jnp.int4 [K, bn]: Mosaic hardware unpack on load."""
    w = w_ref[...].astype(x_ref.dtype)          # int4 -> bf16
    K, bn = w.shape
    G = K // group
    acc = jnp.zeros((x_ref.shape[0], bn), jnp.float32)
    for gi in range(G):
        xg = x_ref[:, gi * group:(gi + 1) * group]
        d = jax.lax.dot(xg, w[gi * group:(gi + 1) * group, :],
                        preferred_element_type=jnp.float32)
        xs = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        acc += (d - xs * z_ref[gi][None, :].astype(jnp.float32)) \
            * s_ref[gi][None, :].astype(jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n",))
def w4p_v5(x, w4, scales, zeros, block_n=512):
    M, K = x.shape
    _, N = w4.shape
    G = scales.shape[0]
    group = K // G
    bn = min(block_n, N)
    return pl.pallas_call(
        functools.partial(_v5_kernel, group=group),
        grid=(cdiv(N, bn),),
        in_specs=[
            pl.BlockSpec((M, K), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda n: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bn), lambda n: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bn), lambda n: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda n: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x, w4, scales, zeros)


def int4_w(K, N):
    key = jax.random.PRNGKey(0)
    q4 = jax.random.randint(key, (L, K, N), 0, 16, dtype=jnp.int8)
    sc = jnp.ones((L, K // GROUP, N), jnp.float32)
    zr = jnp.full((L, K // GROUP, N), 8.0, jnp.float32)
    return (q4, sc, zr)


def _to_int4(w):
    q8, sc, zr = w
    return (q8.astype(jnp.int4), sc, zr)


def _v6_kernel(x_ref, w_ref, o_ref, *, Kw):
    """Ceiling probe: planes, shift+and+cvt + one big dot per plane,
    NO scales/zeros."""
    b = w_ref[...]
    acc = jnp.zeros((x_ref.shape[0], b.shape[1]), jnp.float32)
    for i in range(8):
        wi = ((b >> (4 * i)) & 0xF).astype(x_ref.dtype)
        acc += jax.lax.dot(x_ref[:, i * Kw:(i + 1) * Kw], wi,
                           preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n",))
def w4p_v6(x, wplanes, scales, zeros, block_n=512):
    M, K = x.shape
    Kw, N = wplanes.shape
    bn = min(block_n, N)
    del scales, zeros
    return pl.pallas_call(
        functools.partial(_v6_kernel, Kw=Kw),
        grid=(cdiv(N, bn),),
        in_specs=[
            pl.BlockSpec((M, K), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Kw, bn), lambda n: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda n: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x, wplanes)


@jax.jit
def w4_xla(x, w4, scales, zeros):
    """Plain XLA int4 dot probe: does XLA fuse the dequant or
    materialize?"""
    return jnp.dot(x, w4.astype(x.dtype), preferred_element_type=jnp.float32
                   ).astype(x.dtype)


def main_v5():
    K, N = 4096, 28672
    w4_bytes = K // 2 * N + 2 * (K // GROUP) * N * 4
    w4_pure = K // 2 * N
    bench_chain(w4p_v5, K, N, int4_w,
                "v5 native int4, post-scale", w4_bytes, prep=_to_int4)
    bench_chain(w4p_v6, K, N, plane_w,
                "v6 planes CEILING (no scales)", w4_pure)
    bench_chain(w4_xla, K, N, int4_w,
                "v7 plain XLA int4 dot", w4_pure, prep=_to_int4)


if __name__ == "__main__" and "--v5" in __import__("sys").argv:
    main_v5()


# ---------------------------------- v8: can XLA fuse scale into int4 dot?
@jax.jit
def w4_xla_scaled(x, w4, scales, zeros):
    """Group scales via broadcast multiply on the int4 upcast: fused or
    materialized?"""
    K = x.shape[1]
    G = scales.shape[0]
    group = K // G
    s_rep = jnp.repeat(scales.astype(x.dtype), group, axis=0)   # [K, N]
    return jnp.dot(x, w4.astype(x.dtype) * s_rep,
                   preferred_element_type=jnp.float32).astype(x.dtype)


@jax.jit
def w4_xla_full(x, w4, scales, zeros):
    """Full dequant expression on the rhs."""
    K = x.shape[1]
    G = scales.shape[0]
    group = K // G
    s_rep = jnp.repeat(scales.astype(x.dtype), group, axis=0)
    z_rep = jnp.repeat(zeros.astype(x.dtype), group, axis=0)
    return jnp.dot(x, (w4.astype(x.dtype) - z_rep) * s_rep,
                   preferred_element_type=jnp.float32).astype(x.dtype)


@jax.jit
def w4_xla_grouped(x, w4, scales, zeros):
    """Exact group-quant W4A16 with the int4 operand kept pure: batched
    per-group dot + scale contraction + zero correction."""
    M, K = x.shape
    G, N = scales.shape
    group = K // G
    xg = x.reshape(M, G, group).transpose(1, 0, 2)         # [G, M, group]
    wg = w4.reshape(G, group, N)                           # int4
    dg = jax.lax.dot_general(
        xg, wg.astype(x.dtype), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                # [G, M, N]
    y = jnp.einsum('gmn,gn->mn', dg, scales)
    xs = xg.sum(axis=2).T                                   # [M, G]
    y = y - jnp.dot(xs, (zeros * scales),
                    preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def main_v8():
    K, N = 4096, 28672
    w4_pure = K // 2 * N
    bench_chain(w4_xla_scaled, K, N, int4_w,
                "v8 XLA int4 dot * s_rep", w4_pure, prep=_to_int4)
    bench_chain(w4_xla_full, K, N, int4_w,
                "v8b XLA int4 (w-z)*s full", w4_pure, prep=_to_int4)
    bench_chain(w4_xla_grouped, K, N, int4_w,
                "v8c XLA batched-group exact", w4_pure, prep=_to_int4)


if __name__ == "__main__" and "--v8" in __import__("sys").argv:
    main_v8()


def make_int4_on_device(q8):
    """int4 leaf produced on device with the consumer-expected Format
    (sub_byte_element_size_in_bits=4): the tunnel cannot device_put int4,
    and an unpinned producer emits sub_byte=0, which forces a relayout
    device_put at the next jit boundary -> axon recursion bug."""
    probe = jax.jit(lambda w: w[0, 0, 0].astype(jnp.int32))
    aval = jax.ShapeDtypeStruct(q8.shape, jnp.int4)
    fmt = probe.lower(aval).compile().input_formats[0][0]
    return jax.jit(lambda w: w.astype(jnp.int4), out_shardings=fmt)(q8)


def main_v9():
    import sys
    K, N = 4096, 28672
    w4_pure = K // 2 * N
    # int4 produced on device by a separate jit, then passed as a normal
    # arg (the engine's load path): does arg passing survive the tunnel?
    key = jax.random.PRNGKey(0)
    q8 = jax.random.randint(key, (L, K, N), 0, 16, dtype=jnp.int8)
    q4 = make_int4_on_device(q8)
    sc = jnp.ones((L, K // GROUP, N), jnp.float32)
    zr = jnp.full((L, K // GROUP, N), 8.0, jnp.float32)
    del q8
    bench_chain(w4_xla_grouped, K, N, lambda K, N: (q4, sc, zr),
                "v9 int4 from prior jit (no prep)", w4_pure)
    # M sensitivity of the batched-group path
    global M
    for m in (8, 64, 128, 256):
        M_old, M = M, m
        try:
            bench_chain(w4_xla_grouped, K, N, lambda K, N: (q4, sc, zr),
                        f"v9 M={m}", w4_pure)
        finally:
            M = M_old


def main_prefill():
    """Prefill-M behavior: batched-group int4 dot vs dequant+bf16 GEMM."""
    global M, L
    M_old, L_old = M, L
    M, L = 8192, 4
    try:
        K, N = 4096, 28672
        w4_pure = K // 2 * N
        key = jax.random.PRNGKey(0)
        q8 = jax.random.randint(key, (L, K, N), 0, 16, dtype=jnp.int8)
        q4 = make_int4_on_device(q8)
        sc = jnp.ones((L, K // GROUP, N), jnp.float32)
        zr = jnp.full((L, K // GROUP, N), 8.0, jnp.float32)
        del q8
        flops = 2 * M * K * N
        for label, fn in [("prefill v8c batched-group", w4_xla_grouped),
                          ("prefill materialize (w-z)*s", w4_xla_full)]:
            g = bench_chain(fn, K, N, lambda K, N: (q4, sc, zr),
                            label, w4_pure)
            ms = w4_pure * L / (g * 1e9) / L * 1e3
            print(f"   -> {flops / (w4_pure / (g*1e9)) / 1e12:.1f} "
                  f"TFLOP/s effective", flush=True)
    finally:
        M, L = M_old, L_old


if __name__ == "__main__":
    import sys
    if "--v9" in sys.argv:
        main_v9()
    if "--prefill" in sys.argv:
        main_prefill()


def main_v15():
    """Contraction-precision variants of the grouped int4 path."""
    import jax.numpy as jnp
    K, N = 4096, 28672
    w4_pure = K // 2 * N

    @jax.jit
    def grouped_bf16_contract(x, w4, scales, zeros):
        M, K = x.shape
        G, N = scales.shape
        group = K // G
        xg = x.reshape(M, G, group).transpose(1, 0, 2)
        dg = jax.lax.dot_general(
            xg, w4.reshape(G, group, N).astype(x.dtype),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.bfloat16)         # bf16 dg
        y = jnp.einsum('gmn,gn->mn', dg, scales.astype(jnp.bfloat16))
        xs = xg.sum(axis=2, dtype=jnp.float32).T
        y = y.astype(jnp.float32) - jnp.dot(
            xs, zeros * scales, preferred_element_type=jnp.float32)
        return y.astype(x.dtype)

    @jax.jit
    def grouped_noz(x, w4, scales, zeros):
        M, K = x.shape
        G, N = scales.shape
        group = K // G
        xg = x.reshape(M, G, group).transpose(1, 0, 2)
        dg = jax.lax.dot_general(
            xg, w4.reshape(G, group, N).astype(x.dtype),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return jnp.einsum('gmn,gn->mn', dg,
                          scales.astype(jnp.float32)).astype(x.dtype)

    key = jax.random.PRNGKey(0)
    q8 = jax.random.randint(key, (L, K, N), -8, 8, dtype=jnp.int8)
    q4 = make_int4_on_device(q8)
    sc = jnp.ones((L, K // GROUP, N), jnp.float32)
    zr = jnp.zeros((L, K // GROUP, N), jnp.float32)
    del q8
    from aphrodite_tpu.ops.quant_gemm import w4a16_int4_grouped
    bench_chain(w4a16_int4_grouped, K, N, lambda K, N: (q4, sc, zr),
                "v9 production grouped", w4_pure)
    bench_chain(grouped_bf16_contract, K, N, lambda K, N: (q4, sc, zr),
                "v15 bf16 dg contraction", w4_pure)
    bench_chain(grouped_noz, K, N, lambda K, N: (q4, sc, zr),
                "v15b no zero-correction", w4_pure)


if __name__ == "__main__" and "--v15" in __import__("sys").argv:
    main_v15()
