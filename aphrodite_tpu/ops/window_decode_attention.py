"""Pallas TPU kernel: multi-step ("window") decode paged attention.

Built for the in-graph multi-step decode scan (worker/runner.py): during a
K-step window the paged KV cache is *frozen* (read-only) and each step's new
K/V rows live in a small per-layer tail buffer that is updated in place in
the scan carry. This removes the two big per-step costs of the v1 design
(ops/decode_paged_attention.py):

- no per-step scatter into the paged cache (measured ~5 ms/step on v5e for a
  0.44 GiB cache: the scan xs->ys dataflow copied every layer's page pool);
- no per-layer materialization of ``kv_cache[l]``: the kernel takes the FULL
  ``[L, ...]`` cache in HBM and a dynamic layer index (scalar prefetch), so
  the only HBM traffic is the pages actually attended;
- cross-request DMA pipelining: the chunk double-buffer is threaded through
  the whole grid (the next request's first chunk is prefetched while the
  current request computes), jax.experimental ragged_paged_attention-style.

At the end of the window the runner flushes the tails into the paged cache
with one batched scatter (runner._execute_multi_step).

Replaces the reference's paged_attention_v1/v2 decode kernels
(kernels/attention/paged_attention_v1.cu) for the multi-step path.
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


def _wd_kernel(
    # scalar prefetch
    lidx, step, paged_lens, block_tables, shared_len,
    # inputs
    q_ref,      # [1, kvh, group, hd] VMEM
    kv_hbm,     # [L, P, 2, kvh, page, hd] HBM (frozen)
    tk_ref,     # [1, 1, kvh, Kw, hd] VMEM (layer l, request r)
    tv_ref,     # [1, 1, kvh, Kw, hd] VMEM
    *rest,      # [cascade init: acc0, m0, l0 blocks] + out_ref + scratch
    scale: float, chunk_pages: int, page_size: int,
    num_kv_heads: int, group: int, head_dim: int,
    sliding_window: Optional[int], logits_soft_cap: Optional[float],
    chunk_attn: Optional[int], max_pages: int, q_dtype, cascade: bool,
):
    if cascade:
        acc0_ref, m0_ref, l0_ref = rest[0:3]
        rest = rest[3:]
    out_ref, kv_vmem, acc, m_i, l_i, ctr, kv_sem = rest
    r = pl.program_id(0)
    R = pl.num_programs(0)
    chunk_kv = chunk_pages * page_size
    l = lidx[0]
    i = step[0]
    S = shared_len[0]

    def nc_of(r2):
        # Uniform >=1 so the start/wait DMA stream stays in lockstep even
        # for empty (padding) rows; their single chunk is fully masked.
        return pl.cdiv(jnp.maximum(paged_lens[r2], 1), chunk_kv)

    def c0_of(r2):
        # Cascade: the shared prefix (kv_pos < S) is covered by the init
        # state — start at its chunk boundary (the straddling chunk is
        # masked below).
        base = S // chunk_kv if cascade else jnp.int32(0)
        if sliding_window is None and chunk_attn is None:
            return jnp.clip(base, 0, nc_of(r2) - 1)
        pos2 = paged_lens[r2] + i
        if chunk_attn is not None:
            lo = (pos2 // chunk_attn) * chunk_attn
        else:
            lo = pos2 - sliding_window + 1
        return jnp.clip(jnp.maximum(lo // chunk_kv, base), 0,
                        nc_of(r2) - 1)

    def start_chunk(r2, c2):
        slot = jax.lax.rem(ctr[0], 2)
        for k in range(chunk_pages):
            page_idx = c2 * chunk_pages + k
            pid = block_tables[r2, jnp.minimum(page_idx, max_pages - 1)]
            pltpu.make_async_copy(
                kv_hbm.at[l, pid], kv_vmem.at[slot, k],
                kv_sem.at[slot, k]).start()
        ctr[0] = ctr[0] + 1

    @pl.when(r == 0)
    def _():
        ctr[0] = 0
        ctr[1] = 0
        start_chunk(0, c0_of(0))

    plen = paged_lens[r]
    pos = plen + i
    nc = nc_of(r)
    c0 = c0_of(r)

    if cascade:
        acc[...] = acc0_ref[0]
        m_i[...] = m0_ref[0, :, :, :1]
        l_i[...] = l0_ref[0, :, :, :1]
    else:
        acc[...] = jnp.zeros_like(acc)
        m_i[...] = jnp.full_like(m_i, -jnp.inf)
        l_i[...] = jnp.zeros_like(l_i)

    col = jax.lax.broadcasted_iota(jnp.int32, (group, chunk_kv), 1)

    def online_update(s, mask, v, h):
        """One online-softmax block update for head h. s: [group, N] f32."""
        if logits_soft_cap is not None:
            s = logits_soft_cap * jnp.tanh(s / logits_soft_cap)
        s = jnp.where(mask, s, -jnp.inf)
        m_prev = m_i[h]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.where(mask, jnp.exp(s - m_safe), 0.0)
        alpha = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - m_safe),
                          0.0)
        l_i[h] = l_i[h] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc[h] = acc[h] * alpha + pv
        m_i[h] = m_new

    def body(c, _):
        # Prefetch the next chunk in the global stream before waiting.
        is_last = c + 1 >= nc
        nxt_r = jnp.where(is_last, r + 1, r)

        @pl.when(nxt_r < R)
        def _():
            nxt_c = jnp.where(is_last, c0_of(jnp.minimum(nxt_r, R - 1)),
                              c + 1)
            start_chunk(nxt_r, nxt_c)

        slot = jax.lax.rem(ctr[1], 2)
        for k in range(chunk_pages):
            pltpu.make_async_copy(
                kv_hbm.at[0, 0], kv_vmem.at[slot, k],
                kv_sem.at[slot, k]).wait()
        ctr[1] = ctr[1] + 1

        kv_pos = c * chunk_kv + col
        mask = kv_pos < plen
        if cascade:
            mask &= kv_pos >= S  # shared prefix covered by the init state
        if sliding_window is not None:
            mask &= kv_pos > pos - sliding_window
        if chunk_attn is not None:
            mask &= (kv_pos // chunk_attn) == (pos // chunk_attn)
        for h in range(num_kv_heads):
            k_h = kv_vmem[slot, :, 0, h].reshape(chunk_kv, head_dim)
            v_h = kv_vmem[slot, :, 1, h].reshape(chunk_kv, head_dim)
            if k_h.dtype != q_dtype:  # fp8 KV cache: upcast for the MXU
                k_h = k_h.astype(q_dtype)
                v_h = v_h.astype(q_dtype)
            s = jax.lax.dot_general(
                q_ref[0, h], k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            online_update(s, mask, v_h, h)
        return 0

    jax.lax.fori_loop(c0, nc, body, 0)

    # Tail block: this window's fresh K/V (positions plen + j, j <= i).
    Kw = tk_ref.shape[3]
    jcol = jax.lax.broadcasted_iota(jnp.int32, (group, Kw), 1)
    tmask = jcol <= i
    if sliding_window is not None:
        tmask &= (plen + jcol) > pos - sliding_window
    if chunk_attn is not None:
        tmask &= ((plen + jcol) // chunk_attn) == (pos // chunk_attn)
    for h in range(num_kv_heads):
        t_k = tk_ref[0, 0, h]  # [Kw, hd]
        t_v = tv_ref[0, 0, h]
        s = jax.lax.dot_general(
            q_ref[0, h], t_k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        online_update(s, tmask, t_v, h)

    for h in range(num_kv_heads):
        out_ref[0, h] = (acc[h] /
                         jnp.maximum(l_i[h], 1e-20)).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "sliding_window", "logits_soft_cap",
                     "chunk_attn", "chunk_pages", "interpret"))
def window_decode_attention(
    q: jax.Array,            # [R, nq, hd]
    kv_cache: jax.Array,     # [L, P, 2, kvh, page, hd] (frozen)
    tail_k: jax.Array,       # [L, R, kvh, Kw, hd]
    tail_v: jax.Array,       # [L, R, kvh, Kw, hd]
    layer_idx: jax.Array,    # [] or [1] i32
    step_idx: jax.Array,     # [] or [1] i32
    paged_lens: jax.Array,   # [R] i32 (frozen tokens in pages)
    block_tables: jax.Array,  # [R, max_pages] i32
    scale: float,
    sliding_window: Optional[int] = None,
    chunk_attn: Optional[int] = None,
    logits_soft_cap: Optional[float] = None,
    chunk_pages: int = DEFAULT_CHUNK_PAGES,
    interpret: Optional[bool] = None,
    cascade_init=None,       # (acc0 [R,kvh,g,hd] f32, m0/l0 [R,kvh,g,128])
    shared_len=None,         # [] i32 tokens covered by cascade_init
) -> jax.Array:
    if interpret is None:
        interpret = os.environ.get("APHRODITE_PALLAS_INTERPRET", "0") == "1"
    R, nq, hd = q.shape
    L, num_pages, _, kvh, page_size, hd_c = kv_cache.shape
    assert hd == hd_c, "pad q to the cache head_dim before calling"
    group = nq // kvh
    max_pages = block_tables.shape[1]
    Kw = tail_k.shape[3]
    cascade = cascade_init is not None
    if cascade:
        assert sliding_window is None and chunk_attn is None

    q4 = q.reshape(R, kvh, group, hd)
    lidx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    step = jnp.asarray(step_idx, jnp.int32).reshape(1)
    slen = (jnp.asarray(shared_len, jnp.int32).reshape(1) if cascade
            else jnp.zeros((1,), jnp.int32))

    in_specs = [
        pl.BlockSpec((1, kvh, group, hd), lambda r, *_: (r, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((1, 1, kvh, Kw, hd),
                     lambda r, lidx, *_: (lidx[0], r, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, kvh, Kw, hd),
                     lambda r, lidx, *_: (lidx[0], r, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [q4, kv_cache, tail_k, tail_v]
    if cascade:
        acc0, m0, l0 = cascade_init
        in_specs += [
            pl.BlockSpec((1, kvh, group, hd), lambda r, *_: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, group, 128), lambda r, *_: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kvh, group, 128), lambda r, *_: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [acc0.astype(jnp.float32), m0.astype(jnp.float32),
                     l0.astype(jnp.float32)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(R,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, kvh, group, hd), lambda r, *_: (r, 0, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, chunk_pages, 2, kvh, page_size, hd),
                       kv_cache.dtype),
            pltpu.VMEM((kvh, group, hd), jnp.float32),
            pltpu.VMEM((kvh, group, 1), jnp.float32),
            pltpu.VMEM((kvh, group, 1), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((2, chunk_pages)),
        ],
    )

    kernel = functools.partial(
        _wd_kernel, scale=scale, chunk_pages=chunk_pages,
        page_size=page_size, num_kv_heads=kvh, group=group, head_dim=hd,
        sliding_window=sliding_window, logits_soft_cap=logits_soft_cap,
        chunk_attn=chunk_attn, max_pages=max_pages, q_dtype=q.dtype,
        cascade=cascade)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, kvh, group, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(lidx, step, paged_lens, block_tables, slen, *operands)
    return out.reshape(R, nq, hd)


def ref_window_decode_attention(
    q: jax.Array,            # [R, nq, hd]
    cache_layer: jax.Array,  # [P, 2, kvh, page, hd]
    tail_k_l: jax.Array,     # [R, kvh, Kw, hd] (layer slice)
    tail_v_l: jax.Array,
    step_idx: jax.Array,
    paged_lens: jax.Array,
    block_tables: jax.Array,
    scale: float,
    sliding_window: Optional[int] = None,
    chunk_attn: Optional[int] = None,
    logits_soft_cap: Optional[float] = None,
) -> jax.Array:
    """Pure-JAX oracle (CPU path / kernel ground truth)."""
    num_pages, _, kvh, page_size, hd = cache_layer.shape
    R, nq, _ = q.shape
    group = nq // kvh
    max_pages = block_tables.shape[1]
    max_kv = max_pages * page_size
    Kw = tail_k_l.shape[2]

    kv = cache_layer[block_tables]  # [R, maxP, 2, kvh, page, hd]
    kv = jnp.transpose(kv, (0, 1, 4, 3, 2, 5))  # [R, MP, page, kvh, 2, hd]
    kv = kv.reshape(R, max_kv, kvh, 2, hd).astype(jnp.float32)
    keys = jnp.concatenate(
        [kv[:, :, :, 0],
         jnp.transpose(tail_k_l, (0, 2, 1, 3)).astype(jnp.float32)], axis=1)
    values = jnp.concatenate(
        [kv[:, :, :, 1],
         jnp.transpose(tail_v_l, (0, 2, 1, 3)).astype(jnp.float32)], axis=1)

    qf = q.astype(jnp.float32).reshape(R, kvh, group, hd)
    logits = jnp.einsum("rhgd,rkhd->rhgk", qf, keys) * scale
    if logits_soft_cap is not None:
        logits = logits_soft_cap * jnp.tanh(logits / logits_soft_cap)

    pos = paged_lens + step_idx  # [R]
    kv_pos = jnp.concatenate([
        jnp.broadcast_to(jnp.arange(max_kv)[None, :], (R, max_kv)),
        paged_lens[:, None] + jnp.arange(Kw)[None, :]], axis=1)  # [R, K+]
    mask = kv_pos < paged_lens[:, None]
    mask = mask.at[:, max_kv:].set(jnp.arange(Kw)[None, :] <= step_idx)
    if sliding_window is not None:
        mask &= kv_pos > (pos[:, None] - sliding_window)
    if chunk_attn is not None:
        mask &= (kv_pos // chunk_attn) == (pos[:, None] // chunk_attn)
    logits = jnp.where(mask[:, None, None, :], logits, -jnp.inf)
    # Fully-masked rows (padding) softmax to NaN; zero them instead.
    probs = jax.nn.softmax(logits, axis=-1)
    probs = jnp.where(jnp.isnan(probs), 0.0, probs)
    out = jnp.einsum("rhgk,rkhd->rhgd", probs, values)
    return out.reshape(R, nq, hd).astype(q.dtype)
