"""Round-5 step-wall lab: close the non-GEMM gaps found by
profile_8b.py's component decomposition.

Experiments (each prints one line; run on the real chip):
  1. window-attention chunk_pages sweep at config-2 geometry — the
     kernel ran 311 GB/s with 8-page chunks; bigger chunks = fewer,
     larger DMAs.
  2. GEMM stream ceilings at the gate_up shape: bf16 dot vs native-int4
     grouped dot. The lm_head measurement showed a plain bf16 dot
     streams ~700 GB/s, so the int4 path's 338 GB/s is NOT near the
     chip ceiling (the old 380 GB/s "best stream" figure was itself a
     DCE artifact).

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/step_lab.py
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

R, KVH, GROUP, HD, PAGE = 32, 8, 4, 128, 64
CTX = 544
H, I, L, GQ = 4096, 14336, 32, 128


def _sync(x):
    float(np.asarray(x).reshape(-1)[0])


def attn_sweep():
    from aphrodite_tpu.ops.window_decode_attention import (
        window_decode_attention)
    pages_per_req = -(-CTX // PAGE)
    P = R * pages_per_req + 8
    Lc = 4
    key = jax.random.PRNGKey(0)
    kv = jax.random.normal(key, (Lc, P, 2, KVH, PAGE, HD), jnp.bfloat16)
    q = jax.random.normal(key, (R, KVH * GROUP, HD), jnp.bfloat16)
    tails = jax.random.normal(key, (Lc, R, KVH, 64, HD), jnp.bfloat16)
    paged_lens = jnp.full((R,), CTX, jnp.int32)
    bt = jnp.arange(R * pages_per_req, dtype=jnp.int32).reshape(
        R, pages_per_req)
    lidx = jnp.zeros((1,), jnp.int32)
    step = jnp.zeros((1,), jnp.int32)
    kv_bytes = R * pages_per_req * PAGE * 2 * KVH * HD * 2

    for cp in (4, 8, 16):  # 32: 16.8 MB double-buffer > 16 MB scoped VMEM
        fn = functools.partial(window_decode_attention, scale=HD ** -0.5,
                               chunk_pages=cp)

        @functools.partial(jax.jit, static_argnames=("chain",))
        def many(q, kv, tails, paged_lens, bt, chain):
            def body(qc, _):
                o = fn(qc, kv, tails, tails, lidx, step, paged_lens, bt)
                return o.astype(qc.dtype), None
            out, _ = jax.lax.scan(body, q, None, length=chain)
            return out

        def timed(chain):
            out = many(q, kv, tails, paged_lens, bt, chain=chain)
            float(out[0, 0, 0])
            t0 = time.perf_counter()
            out = many(q, kv, tails, paged_lens, bt, chain=chain)
            float(out[0, 0, 0])
            return time.perf_counter() - t0

        C = max(16, -(-2 ** 30 // kv_bytes))
        t1 = min(timed(C) for _ in range(3))
        t2 = min(timed(2 * C) for _ in range(3))
        dt = max((t2 - t1) / C, 1e-9)
        print(f"attn chunk_pages={cp:2d}: {dt*1e3:6.3f} ms/call "
              f"({kv_bytes/dt/1e9:5.0f} GB/s, x32L = {dt*32*1e3:.2f} ms)",
              flush=True)


def gemm_ceilings():
    M, K, N = 32, H, 2 * I   # gate_up, the biggest decode GEMM
    key = jax.random.PRNGKey(1)

    def consume(y, keep):
        ix = jnp.argmax(y, axis=1, keepdims=True).astype(jnp.bfloat16)
        out = y[:, :keep].astype(jnp.bfloat16) + ix * jnp.bfloat16(1e-9)
        if out.shape[1] < keep:
            out = jnp.pad(out, ((0, 0), (0, keep - out.shape[1])))
        return out

    def bench(name, mk_weights, apply, bytes_per_layer, Lb=8):
        ws = mk_weights(Lb)

        @functools.partial(jax.jit, static_argnames=("chain",))
        def chained(x, ws, chain):
            def layer(xc, l):
                return consume(apply(xc, l, ws), K), None
            def rep(xc, _):
                out, _ = jax.lax.scan(layer, xc,
                                      jnp.arange(Lb, dtype=jnp.int32))
                return out, None
            out, _ = jax.lax.scan(rep, x, None, length=chain)
            return out

        x0 = jnp.ones((M, K), jnp.bfloat16)

        def timed(c):
            t0 = time.perf_counter()
            _sync(chained(x0, ws, c))
            return time.perf_counter() - t0

        ts = []
        for c in (4, 12):
            _sync(chained(x0, ws, c))  # compile
            ts.append(min(timed(c) for _ in range(3)))
        dt = (ts[1] - ts[0]) / 8 / Lb
        print(f"gemm {name:16s}: {dt*1e3:6.3f} ms/layer "
              f"({bytes_per_layer/dt/1e9:5.0f} GB/s)", flush=True)

    # bf16 ceiling
    def mk_bf16(Lb):
        return jax.random.normal(key, (Lb, K, N), jnp.bfloat16)

    bench("bf16", mk_bf16, lambda x, l, w: jnp.dot(
        x, w[l], preferred_element_type=jnp.float32), K * N * 2)

    # int8 weight-only (per-channel scale)
    def mk_int8(Lb):
        w = jax.random.randint(key, (Lb, K, N), -127, 127, jnp.int8)
        return w, jnp.full((Lb, N), 0.01, jnp.float32)

    def int8_apply(x, l, ws):
        w, sc = ws
        y = jnp.dot(x, w[l].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        return y * sc[l][None, :]

    bench("int8-upcast", mk_int8, int8_apply, K * N + N * 4)

    # native int4 grouped (the production W4A16 decode path)
    from aphrodite_tpu.ops.quant_gemm import w4a16_int4_grouped

    def mk_int4(Lb):
        w8 = jax.lax.broadcasted_iota(jnp.int8, (Lb, K, N), 2)
        q4 = jax.jit(lambda w: w.astype(jnp.int4))(w8)
        sc = jnp.ones((Lb, K // GQ, N), jnp.float32)
        zr = jnp.zeros((Lb, K // GQ, N), jnp.float32)
        return q4, sc, zr

    def int4_apply(x, l, ws):
        q4, sc, zr = ws
        return w4a16_int4_grouped(x, q4[l], sc[l], zr[l])

    bench("int4-grouped", mk_int4, int4_apply,
          K * N // 2 + 2 * (K // GQ) * N * 4)

    # native int4, ONE scale (isolates the per-group contraction cost)
    def mk_int4_flat(Lb):
        w8 = jax.lax.broadcasted_iota(jnp.int8, (Lb, K, N), 2)
        return jax.jit(lambda w: w.astype(jnp.int4))(w8)

    def int4_flat_apply(x, l, w):
        y = jax.lax.dot_general(x, w[l], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return y * 0.01

    bench("int4-flat", mk_int4_flat, int4_flat_apply, K * N // 2)


def flush_ab():
    """A/B the window-tail flush: per-element scatter (round-4) vs
    page-granular gather/merge/scatter (round-5), slope-timed inside one
    dispatch so the tunnel RPC cancels. Full config-2 shape: 32 layers."""
    K = 64
    Lf = 32
    pages_per_req = (CTX + K) // PAGE + 2
    P = R * pages_per_req + 8
    kv0 = jnp.zeros((Lf, P, 2, KVH, PAGE, HD), jnp.bfloat16)
    tk0 = jnp.ones((Lf, R, KVH, K, HD), jnp.bfloat16)
    paged_lens = jnp.full((R,), CTX, jnp.int32)
    bt = jnp.arange(R * pages_per_req, dtype=jnp.int32).reshape(R, -1)

    def elem_flush(kv, tk, tv):
        j = jnp.arange(K, dtype=jnp.int32)
        abs_pos = paged_lens[:, None] + j[None, :]
        pages = jnp.take_along_axis(bt, abs_pos // PAGE, axis=1)
        pf = pages.reshape(-1)
        of = (abs_pos % PAGE).reshape(-1)
        val_k = tk.transpose(1, 3, 0, 2, 4).reshape(R * K, Lf, KVH, HD)
        val_v = tv.transpose(1, 3, 0, 2, 4).reshape(R * K, Lf, KVH, HD)
        kv = kv.at[:, pf, 0, :, of, :].set(val_k, mode="drop")
        kv = kv.at[:, pf, 1, :, of, :].set(val_v, mode="drop")
        return kv

    def page_flush(kv, tk, tv):
        num_pages = kv.shape[1]
        NP = (K - 1) // PAGE + 2
        jp = jnp.arange(NP, dtype=jnp.int32)
        first_pg = paged_lens // PAGE
        pg_idx = jnp.clip(first_pg[:, None] + jp[None, :], 0,
                          bt.shape[1] - 1)
        pages = jnp.take_along_axis(bt, pg_idx, axis=1)
        offs = jnp.arange(PAGE, dtype=jnp.int32)
        abs_pos = ((first_pg[:, None] + jp[None, :])[:, :, None] * PAGE
                   + offs[None, None, :])
        step_idx = abs_pos - paged_lens[:, None, None]
        valid = (step_idx >= 0) & (step_idx < K)
        si = jnp.clip(step_idx, 0, K - 1).reshape(R, NP * PAGE)
        si_b = si[None, :, None, :, None]

        def merge(tail, half):
            new = jnp.take_along_axis(
                tail, jnp.broadcast_to(si_b, (Lf, R, KVH, NP * PAGE, 1)),
                axis=3)
            new = new.reshape(Lf, R, KVH, NP, PAGE, HD).transpose(
                0, 1, 3, 2, 4, 5).reshape(Lf, R * NP, KVH, PAGE, HD)
            vm = valid.reshape(R * NP, 1, PAGE, 1)
            return jnp.where(vm, new, half)

        pages_flat = pages.reshape(R * NP)
        old = jnp.take(kv, jnp.clip(pages_flat, 0, num_pages - 1), axis=1)
        merged = jnp.stack([merge(tk, old[:, :, 0]),
                            merge(tv, old[:, :, 1])], axis=2)
        row_any = valid.any(axis=2).reshape(R * NP)
        pf = jnp.where(row_any, pages_flat, num_pages)
        return kv.at[:, pf].set(merged, mode="drop")

    for name, impl in (("element-scatter", elem_flush),
                       ("page-granular", page_flush)):
        @functools.partial(jax.jit, static_argnames=("chain",),
                           donate_argnums=(0,))
        def chained(kv, tk, chain, impl=impl):
            def body(carry, _):
                kvc, t = carry
                kvc = impl(kvc, t, t)
                # data-depend the next flush on this one
                t = t + kvc[0, 0, 0, 0, 0, 0].astype(t.dtype) * \
                    jnp.bfloat16(1e-9)
                return (kvc, t), None
            (kvc, _), _ = jax.lax.scan(body, (kv, tk), None, length=chain)
            return kvc

        def timed(c):
            kv = jnp.zeros_like(kv0)
            out = chained(kv, tk0, chain=c)
            float(out[0, 0, 0, 0, 0, 0])
            kv = jnp.zeros_like(kv0)
            t0 = time.perf_counter()
            out = chained(kv, tk0, chain=c)
            float(out[0, 0, 0, 0, 0, 0])
            return time.perf_counter() - t0

        t1 = min(timed(4) for _ in range(3))
        t2 = min(timed(12) for _ in range(3))
        dt = (t2 - t1) / 8
        print(f"flush {name:16s}: {dt*1e3:7.2f} ms/window "
              f"({dt/K*1e3:6.3f} ms/substep amortized)", flush=True)


if __name__ == "__main__":
    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("flush", "all"):
        print("== window-tail flush A/B (32L, K=64) ==", flush=True)
        flush_ab()
    if which in ("attn", "all"):
        print("== attention window chunk sweep ==", flush=True)
        attn_sweep()
    if which in ("gemm", "all"):
        print("== decode GEMM stream ceilings (gate_up shape) ==",
              flush=True)
        gemm_ceilings()
