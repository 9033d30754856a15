"""Pallas TPU kernel: single-token (decode) paged attention.

Specialization of ops/ragged_paged_attention.py for the pure-decode step:
every request contributes exactly one query token, so q is dense
[R, kvh, group, hd] and the grid is simply (R_pad,) — no work-item
scheduling, no output re-gather. Used by the multi-step decode scan, where
attention metadata is constructed in-graph (see worker/runner.py).

Replaces the reference's paged_attention_v1/v2 decode kernels
(kernels/attention/paged_attention_v1.cu).
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


def _decode_kernel(
    # scalar prefetch
    layer_idx, seq_lens, block_tables,
    # inputs: q blocked per request
    q_ref,   # [1, kvh, group, hd] VMEM
    kv_hbm,  # [L, P, 2, kvh, page, hd] HBM
    # outputs
    out_ref,  # [1, kvh, group, hd] VMEM
    cache_out_ref,  # aliased cache pass-through (untouched)
    # scratch
    kv_vmem, acc, m_i, l_i, kv_sem,
    *, scale: float, chunk_pages: int, page_size: int,
    num_kv_heads: int, group: int, head_dim: int,
    sliding_window: Optional[int], logits_soft_cap: Optional[float],
    chunk_attn: Optional[int],
    max_pages: int, q_dtype=None, alibi=None,
):
    r = pl.program_id(0)
    l = layer_idx[0]
    chunk_kv = chunk_pages * page_size
    seq_len = seq_lens[r]

    @pl.when(seq_len > 0)
    def _run():
        pos = seq_len - 1  # this token's position == highest attendable
        num_chunks = pl.cdiv(seq_len, chunk_kv)

        def start_chunk(c, slot):
            @pl.when(c < num_chunks)
            def _():
                for k in range(chunk_pages):
                    page_idx = c * chunk_pages + k
                    page_id = block_tables[
                        r, jnp.minimum(page_idx, max_pages - 1)]
                    pltpu.make_async_copy(
                        kv_hbm.at[l, page_id], kv_vmem.at[slot, k],
                        kv_sem.at[slot, k]).start()

        def wait_chunk(slot):
            for k in range(chunk_pages):
                pltpu.make_async_copy(
                    kv_hbm.at[0, 0], kv_vmem.at[slot, k],
                    kv_sem.at[slot, k]).wait()

        start_chunk(0, 0)
        acc[...] = jnp.zeros_like(acc)
        m_i[...] = jnp.full_like(m_i, -jnp.inf)
        l_i[...] = jnp.zeros_like(l_i)

        col = jax.lax.broadcasted_iota(jnp.int32, (group, chunk_kv), 1)

        def body(c, _):
            slot = jax.lax.rem(c, 2)
            start_chunk(c + 1, 1 - slot)
            wait_chunk(slot)
            kv_pos = c * chunk_kv + col
            mask = kv_pos <= pos
            if sliding_window is not None:
                mask &= kv_pos > pos - sliding_window
            if chunk_attn is not None:  # Llama4 chunked local attention
                mask &= (kv_pos // chunk_attn) == (pos // chunk_attn)
            for h in range(num_kv_heads):
                k_h = kv_vmem[slot, :, 0, h].reshape(chunk_kv, head_dim)
                v_h = kv_vmem[slot, :, 1, h].reshape(chunk_kv, head_dim)
                if k_h.dtype != q_dtype:  # fp8 KV cache: upcast for the MXU
                    k_h = k_h.astype(q_dtype)
                    v_h = v_h.astype(q_dtype)
                q_h = q_ref[0, h]  # [group, hd]
                s = jax.lax.dot_general(
                    q_h, k_h, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                if alibi is not None:
                    # ALiBi: slope[h,g] * (kv_pos - pos). Array constants
                    # can't be captured in Pallas: build from iota +
                    # scalar selects.
                    g_iota = jax.lax.broadcasted_iota(
                        jnp.int32, (group, 1), 0)
                    slopes_h = alibi[h * group:(h + 1) * group]
                    sl_g = jnp.full((group, 1), slopes_h[0], jnp.float32)
                    for g2 in range(1, group):
                        sl_g = jnp.where(g_iota == g2,
                                         jnp.float32(slopes_h[g2]), sl_g)
                    s = s + sl_g * (kv_pos - pos).astype(jnp.float32)
                if logits_soft_cap is not None:
                    s = logits_soft_cap * jnp.tanh(s / logits_soft_cap)
                s = jnp.where(mask, s, -jnp.inf)
                m_prev = m_i[h]
                m_new = jnp.maximum(m_prev,
                                    jnp.max(s, axis=-1, keepdims=True))
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

        jax.lax.fori_loop(0, num_chunks, body, 0)
        for h in range(num_kv_heads):
            out_ref[0, h] = (acc[h] /
                             jnp.maximum(l_i[h], 1e-20)).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "sliding_window", "logits_soft_cap",
                     "chunk_attn", "alibi",
                     "chunk_pages", "interpret"))
def decode_paged_attention(
    q: jax.Array,  # [R, nq, hd]
    kv_cache: jax.Array,  # [P, 2, kvh, page, hd] or [L, P, ...] + layer_idx
    block_tables: jax.Array,  # [R, max_pages]
    seq_lens: jax.Array,  # [R]
    scale: float,
    sliding_window: Optional[int] = None,
    chunk_attn: Optional[int] = None,
    logits_soft_cap: Optional[float] = None,
    chunk_pages: int = DEFAULT_CHUNK_PAGES,
    interpret: Optional[bool] = None,
    layer_idx=None,
    alibi=None,  # static per-q-head slope tuple
) -> jax.Array:
    if interpret is None:
        interpret = os.environ.get("APHRODITE_PALLAS_INTERPRET", "0") == "1"
    R, nq, hd = q.shape
    if kv_cache.ndim == 5:
        kv_cache = kv_cache[None]
        layer_idx = jnp.zeros((), jnp.int32)
    lidx = jnp.asarray(layer_idx, jnp.int32).reshape(1)
    _, num_pages, _, kvh, page_size, hd_c = kv_cache.shape
    assert hd == hd_c, "pad q to the cache head_dim before calling"
    group = nq // kvh
    max_pages = block_tables.shape[1]

    q4 = q.reshape(R, kvh, group, hd)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(R,),
        in_specs=[
            pl.BlockSpec((1, kvh, group, hd), lambda r, *_: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=(pl.BlockSpec(
            (1, kvh, group, hd), lambda r, *_: (r, 0, 0, 0),
            memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pltpu.VMEM((2, chunk_pages, 2, kvh, page_size, hd),
                       kv_cache.dtype),
            pltpu.VMEM((kvh, group, hd), jnp.float32),
            pltpu.VMEM((kvh, group, 1), jnp.float32),
            pltpu.VMEM((kvh, group, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2, chunk_pages)),
        ],
    )

    kernel = functools.partial(
        _decode_kernel, scale=scale, chunk_pages=chunk_pages,
        page_size=page_size, num_kv_heads=kvh, group=group, head_dim=hd,
        sliding_window=sliding_window, logits_soft_cap=logits_soft_cap,
        chunk_attn=chunk_attn,
        max_pages=max_pages, q_dtype=q.dtype, alibi=alibi)

    out, kv_cache_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((R, kvh, group, hd), q.dtype),
                   jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype)),
        input_output_aliases={4: 1},  # kv_cache -> cache pass-through
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(lidx, seq_lens, block_tables, q4, kv_cache)
    return out.reshape(R, nq, hd), kv_cache_out
