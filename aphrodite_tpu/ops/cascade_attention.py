"""Cascade (shared-prefix) attention for the decode window.

Reference: the flash-attn cascade path
(aphrodite/v1/attention/backends/flash_attn.py cascade_attention) and the
partial-state merge kernel (kernels/attention/merge_attn_states.cu),
redesigned for the TPU paged layout:

- When every request in a decode batch shares the same leading KV pages
  (prefix caching dedups them physically), the shared prefix is attended
  ONCE for the whole batch per sub-step — one pass of q_all
  [R*group rows] over the shared pages — instead of once per request.
  Per-sub-step KV traffic drops from R*(S + tail) to S + R*tail.
- No separate merge kernel: the pass returns the UNNORMALIZED online-
  softmax state (acc, m, l), and the window decode kernel initializes its
  per-request state from it (mathematically identical to one fused pass;
  causality is free because every query position >= S).

The shared pass runs as one Pallas program (grid=(1,)) with the usual
double-buffered chunk DMA; q_all is tiny ([kvh, R*group, hd]).
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_CHUNK_PAGES = 8


def _spa_kernel(
    # scalar prefetch
    lidx, shared_pages, shared_len,
    # inputs
    q_ref,      # [kvh, rows, hd] VMEM (whole)
    kv_hbm,     # [L, P, 2, kvh, page, hd] HBM
    # outputs (whole-VMEM)
    acc_ref,    # [kvh, rows, hd] f32: UNNORMALIZED context
    ml_ref,     # [2, kvh, rows, 128] f32: row 0 = m, row 1 = l (broadcast)
    # scratch
    kv_vmem, acc, m_i, l_i, kv_sem,
    *, scale: float, chunk_pages: int, page_size: int,
    num_kv_heads: int, rows: int, head_dim: int, max_shared_pages: int,
    q_dtype,
):
    l = lidx[0]
    S = shared_len[0]
    chunk_kv = chunk_pages * page_size
    nc = pl.cdiv(jnp.maximum(S, 1), chunk_kv)

    def start_chunk(c, slot):
        for k in range(chunk_pages):
            page_idx = c * chunk_pages + k
            pid = shared_pages[jnp.minimum(page_idx, max_shared_pages - 1)]
            pltpu.make_async_copy(
                kv_hbm.at[l, pid], kv_vmem.at[slot, k],
                kv_sem.at[slot, k]).start()

    start_chunk(0, 0)
    acc[...] = jnp.zeros_like(acc)
    m_i[...] = jnp.full_like(m_i, -jnp.inf)
    l_i[...] = jnp.zeros_like(l_i)

    col = jax.lax.broadcasted_iota(jnp.int32, (rows, chunk_kv), 1)

    def body(c, _):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nc)
        def _():
            start_chunk(c + 1, 1 - slot)

        for k in range(chunk_pages):
            pltpu.make_async_copy(
                kv_hbm.at[0, 0], kv_vmem.at[slot, k],
                kv_sem.at[slot, k]).wait()

        kv_pos = c * chunk_kv + col
        mask = kv_pos < S  # every q position >= S: no causal term needed
        for h in range(num_kv_heads):
            k_h = kv_vmem[slot, :, 0, h].reshape(chunk_kv, head_dim)
            v_h = kv_vmem[slot, :, 1, h].reshape(chunk_kv, head_dim)
            if k_h.dtype != q_dtype:
                k_h = k_h.astype(q_dtype)
                v_h = v_h.astype(q_dtype)
            s = jax.lax.dot_general(
                q_ref[h], k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = jnp.where(mask, s, -jnp.inf)
            m_prev = m_i[h]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
            p = jnp.where(mask, jnp.exp(s - m_safe), 0.0)
            alpha = jnp.where(jnp.isfinite(m_prev),
                              jnp.exp(m_prev - m_safe), 0.0)
            l_i[h] = l_i[h] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v_h.dtype), v_h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc[h] = acc[h] * alpha + pv
            m_i[h] = m_new
        return 0

    jax.lax.fori_loop(0, nc, body, 0)

    acc_ref[...] = acc[...]
    for h in range(num_kv_heads):
        ml_ref[0, h] = jnp.broadcast_to(m_i[h], (rows, 128))
        ml_ref[1, h] = jnp.broadcast_to(l_i[h], (rows, 128))


@functools.partial(jax.jit,
                   static_argnames=("scale", "chunk_pages", "interpret"))
def shared_prefix_attention(
    q: jax.Array,             # [R, nq, hd]
    kv_cache: jax.Array,      # [L, P, 2, kvh, page, hd] (frozen)
    layer_idx: jax.Array,     # [] | [1] i32
    shared_pages: jax.Array,  # [max_shared] i32 physical page ids
    shared_len: jax.Array,    # [] | [1] i32 tokens in the shared prefix
    scale: float,
    chunk_pages: int = DEFAULT_CHUNK_PAGES,
    interpret: Optional[bool] = None,
):
    """-> (acc [R, kvh, group, hd] f32 unnormalized, m [R, kvh, group] f32,
    l [R, kvh, group] f32): the shared-prefix online-softmax state for
    every request's current query, computed with ONE read of the shared
    pages."""
    if interpret is None:
        interpret = os.environ.get("APHRODITE_PALLAS_INTERPRET", "0") == "1"
    R, nq, hd = q.shape
    L, P, _, kvh, page_size, hd_c = kv_cache.shape
    assert hd == hd_c
    group = nq // kvh
    rows = R * group
    max_shared = shared_pages.shape[0]
    # [R, nq, hd] -> [kvh, R*group, hd]
    q4 = jnp.transpose(q.reshape(R, kvh, group, hd), (1, 0, 2, 3)
                       ).reshape(kvh, rows, hd)
    lidx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    slen = jnp.asarray(shared_len, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((2, chunk_pages, 2, kvh, page_size, hd),
                       kv_cache.dtype),
            pltpu.VMEM((kvh, rows, hd), jnp.float32),
            pltpu.VMEM((kvh, rows, 1), jnp.float32),
            pltpu.VMEM((kvh, rows, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2, chunk_pages)),
        ],
    )
    kernel = functools.partial(
        _spa_kernel, scale=scale, chunk_pages=chunk_pages,
        page_size=page_size, num_kv_heads=kvh, rows=rows, head_dim=hd,
        max_shared_pages=max_shared, q_dtype=q.dtype)
    acc, ml = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((kvh, rows, hd), jnp.float32),
                   jax.ShapeDtypeStruct((2, kvh, rows, 128), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(lidx, shared_pages, slen, q4, kv_cache)

    # -> per-request blocks the window kernel can slice on its leading dim
    acc = acc.reshape(kvh, R, group, hd).transpose(1, 0, 2, 3)
    m = ml[0].reshape(kvh, R, group, 128).transpose(1, 0, 2, 3)
    lsum = ml[1].reshape(kvh, R, group, 128).transpose(1, 0, 2, 3)
    return acc, m, lsum


def ref_cascade_window_decode(
    q: jax.Array,             # [R, nq, hd]
    cache_layer: jax.Array,   # [P, 2, kvh, page, hd]
    tail_k_l: jax.Array,      # [R, kvh, Kw, hd]
    tail_v_l: jax.Array,
    step_idx, paged_lens, block_tables,
    shared_pages, shared_len, scale: float,
) -> jax.Array:
    """Pure-JAX oracle of the cascade split: shared-prefix state + a
    suffix-only pass, merged — must equal plain window attention."""
    P, _, kvh, page_size, hd = cache_layer.shape
    R, nq, _ = q.shape
    group = nq // kvh
    max_pages = block_tables.shape[1]
    max_kv = max_pages * page_size
    Kw = tail_k_l.shape[2]

    acc_s, m_s, l_s = ref_shared_prefix_attention(
        q, cache_layer, shared_pages, shared_len, scale)

    kv = cache_layer[block_tables]
    kv = jnp.transpose(kv, (0, 1, 4, 3, 2, 5)).reshape(
        R, max_kv, kvh, 2, hd).astype(jnp.float32)
    keys = jnp.concatenate(
        [kv[:, :, :, 0],
         jnp.transpose(tail_k_l, (0, 2, 1, 3)).astype(jnp.float32)], axis=1)
    values = jnp.concatenate(
        [kv[:, :, :, 1],
         jnp.transpose(tail_v_l, (0, 2, 1, 3)).astype(jnp.float32)], axis=1)
    qf = q.astype(jnp.float32).reshape(R, kvh, group, hd)
    s = jnp.einsum("rhgd,rkhd->rhgk", qf, keys) * scale
    kv_pos = jnp.concatenate([
        jnp.broadcast_to(jnp.arange(max_kv)[None], (R, max_kv)),
        paged_lens[:, None] + jnp.arange(Kw)[None]], axis=1)
    mask = (kv_pos >= shared_len) & (kv_pos < paged_lens[:, None])
    mask = mask.at[:, max_kv:].set(
        jnp.arange(Kw)[None] <= step_idx)
    s = jnp.where(mask[:, None, None, :], s, -jnp.inf)
    m_t = jnp.max(s, axis=-1)
    m_safe = jnp.where(jnp.isfinite(m_t), m_t, 0.0)
    p = jnp.where(mask[:, None, None, :],
                  jnp.exp(s - m_safe[..., None]), 0.0)
    l_t = jnp.sum(p, axis=-1)
    acc_t = jnp.einsum("rhgk,rkhd->rhgd", p, values)

    # online-softmax state merge (ref kernels/attention/merge_attn_states)
    m = jnp.maximum(m_s, m_t)
    m_fin = jnp.where(jnp.isfinite(m), m, 0.0)
    a_s = jnp.where(jnp.isfinite(m_s), jnp.exp(m_s - m_fin), 0.0)
    a_t = jnp.where(jnp.isfinite(m_t), jnp.exp(m_t - m_fin), 0.0)
    lsum = l_s * a_s + l_t * a_t
    acc = acc_s * a_s[..., None] + acc_t * a_t[..., None]
    out = acc / jnp.maximum(lsum, 1e-20)[..., None]
    return out.reshape(R, nq, hd).astype(q.dtype)


def ref_shared_prefix_attention(
    q: jax.Array,             # [R, nq, hd]
    cache_layer: jax.Array,   # [P, 2, kvh, page, hd]
    shared_pages: jax.Array,  # [max_shared] i32
    shared_len,               # int / scalar
    scale: float,
):
    """Pure-JAX oracle: -> (acc unnormalized, m, l) like the kernel."""
    P, _, kvh, page_size, hd = cache_layer.shape
    R, nq, _ = q.shape
    group = nq // kvh
    max_kv = shared_pages.shape[0] * page_size
    kv = cache_layer[shared_pages]                 # [MP, 2, kvh, page, hd]
    kv = jnp.transpose(kv, (0, 3, 2, 1, 4)).reshape(
        max_kv, kvh, 2, hd).astype(jnp.float32)
    keys, values = kv[:, :, 0], kv[:, :, 1]
    qf = q.astype(jnp.float32).reshape(R, kvh, group, hd)
    s = jnp.einsum("rhgd,khd->rhgk", qf, keys) * scale
    valid = jnp.arange(max_kv) < shared_len
    s = jnp.where(valid[None, None, None, :], s, -jnp.inf)
    m = jnp.max(s, axis=-1)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.where(valid[None, None, None, :],
                  jnp.exp(s - m_safe[..., None]), 0.0)
    lsum = jnp.sum(p, axis=-1)
    acc = jnp.einsum("rhgk,khd->rhgd", p, values)
    return acc, m, lsum
