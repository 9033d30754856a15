"""Pallas TPU kernel: ragged paged attention (mixed prefill + decode).

One kernel serves the whole continuous batch over its block tables — the TPU
replacement for the reference's paged_attention_v1/v2 CUDA kernels
(kernels/attention/) and the torch-xla `ragged_paged_attention` op the
reference TPU backend calls (aphrodite/v1/attention/backends/pallas.py:174).

Design:
- The host pre-schedules fixed-size *work items*: (request, q_start, q_len,
  pos_start) covering each request's scheduled tokens in chunks of BLOCK_Q.
  Item arrays ride in as scalar-prefetch operands (SMEM), so the kernel grid
  is simply (max_items,).
- Each grid step flash-attends one q block against its request's KV pages:
  pages are DMA'd HBM->VMEM in chunks of CHUNK_PAGES with double buffering;
  online-softmax (m, l, acc) accumulates in fp32 VMEM scratch.
- Output is written per item ([max_items, kvh, BLOCK_Q*group, hd]) and
  re-gathered to the flat token layout by XLA — no cross-item write races.
- Layout rule (Mosaic tiling): every slice taken inside the kernel is a
  LEADING-dim slice; minor dims are always (rows|page, head_dim). This is
  why q arrives as [kvh, T*group, hd] and the cache as
  [P, 2, kvh, page, hd] (see attention/backend.py).
- Causality: q position = pos_start + row//group; KV slot j holds context
  position j, so the mask is kv_pos <= q_pos (plus optional sliding window).
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aphrodite_tpu.attention.metadata import AttentionMetadata

DEFAULT_BLOCK_Q = 128
DEFAULT_CHUNK_PAGES = 8


def _rpa_kernel(
    # scalar prefetch (SMEM)
    layer_idx, item_req, item_qstart, item_qlen, item_pos, seq_lens,
    block_tables, num_items, mm_spans,
    # tensor inputs
    q_hbm,   # [kvh, (T+BQ)*group, hd]
    kv_hbm,  # [L, P, 2, kvh, page, hd]
    # outputs: per-item [1, kvh, BQ*group, hd] + aliased cache pass-through
    out_ref,
    cache_out_ref,  # aliased to kv_hbm: never touched, only threads the
                    # buffer through so the carry-cache scan stays linear
                    # (no XLA copy-insertion around the custom call)
    # scratch
    q_vmem, kv_vmem, acc, m_i, l_i, ctr, q_sem, kv_sem,
    *, scale: float, block_q: int, chunk_pages: int, page_size: int,
    num_q_heads: int, num_kv_heads: int, head_dim: int,
    sliding_window: Optional[int], logits_soft_cap: Optional[float],
    chunk_attn: Optional[int],
    max_pages: int, q_dtype=None,
    alibi: Optional[tuple] = None, num_spans: int = 0,
):
    it = pl.program_id(0)
    l = layer_idx[0]
    group = num_q_heads // num_kv_heads
    rows = block_q * group
    chunk_kv = chunk_pages * page_size
    n_items = num_items[0]

    # Cross-item DMA pipelining: the KV chunk stream and the q-block
    # double buffer are threaded through the WHOLE grid (the next item's
    # first chunk and q block are prefetched while the current item
    # computes), so per-item first-chunk latency is never exposed — the
    # same scheme as ops/window_decode_attention.py.
    def kv_limit_of(i2):
        if num_spans:
            # Bidirectional image spans may reach PAST the causal limit
            # (everything already written this step is visible): scan up
            # to seq_len and let the mask decide.
            return seq_lens[item_req[i2]]
        return jnp.minimum(item_pos[i2] + item_qlen[i2],
                           seq_lens[item_req[i2]])

    def nc_of(i2):
        return pl.cdiv(jnp.maximum(kv_limit_of(i2), 1), chunk_kv)

    def c0_of(i2):
        if sliding_window is None and chunk_attn is None:
            return jnp.int32(0)
        pos_lo = item_pos[i2]
        if chunk_attn is not None:
            lo = (pos_lo // chunk_attn) * chunk_attn
        else:
            lo = pos_lo - sliding_window + 1
        return jnp.clip(lo // chunk_kv, 0, nc_of(i2) - 1)

    def start_chunk(i2, c2):
        slot = jax.lax.rem(ctr[0], 2)
        req2 = item_req[i2]
        for k in range(chunk_pages):
            page_idx = c2 * chunk_pages + k
            page_id = block_tables[req2,
                                   jnp.minimum(page_idx, max_pages - 1)]
            pltpu.make_async_copy(
                kv_hbm.at[l, page_id], kv_vmem.at[slot, k],
                kv_sem.at[slot, k]).start()
        ctr[0] = ctr[0] + 1

    def start_q(i2):
        # Segment starts are 8-aligned in the flat layout
        # (Q_SEGMENT_ALIGN); tell Mosaic so the dynamic DMA offset is
        # legal.
        row_start = pl.multiple_of(item_qstart[i2] * group, 8)
        slot = jax.lax.rem(i2, 2)
        pltpu.make_async_copy(
            q_hbm.at[:, pl.ds(row_start, rows), :], q_vmem.at[slot],
            q_sem.at[slot]).start()

    @pl.when(it == 0)
    def _():
        ctr[0] = 0
        ctr[1] = 0

        @pl.when(n_items > 0)
        def _():
            start_q(0)
            start_chunk(0, c0_of(0))

    @pl.when(it < n_items)
    def _run():
        pos0 = item_pos[it]
        kv_limit = kv_limit_of(it)
        nc = nc_of(it)
        c0 = c0_of(it)

        acc[...] = jnp.zeros_like(acc)
        m_i[...] = jnp.full_like(m_i, -jnp.inf)
        l_i[...] = jnp.zeros_like(l_i)
        q_slot = jax.lax.rem(it, 2)
        pltpu.make_async_copy(q_hbm.at[:, pl.ds(0, rows), :],
                              q_vmem.at[q_slot], q_sem.at[q_slot]).wait()

        @pl.when(it + 1 < n_items)
        def _():
            start_q(it + 1)

        row_q = jax.lax.broadcasted_iota(
            jnp.int32, (rows, chunk_kv), 0) // group
        q_pos = pos0 + row_q  # [rows, chunk_kv]
        col = jax.lax.broadcasted_iota(jnp.int32, (rows, chunk_kv), 1)

        def body(c, _):
            # Prefetch the next chunk in the GLOBAL stream before waiting:
            # the last chunk of this item prefetches the next item's first.
            is_last = c + 1 >= nc
            nxt_i = jnp.where(is_last, it + 1, it)

            @pl.when(nxt_i < n_items)
            def _():
                nxt_c = jnp.where(
                    is_last, c0_of(jnp.minimum(nxt_i, n_items - 1)), c + 1)
                start_chunk(nxt_i, nxt_c)

            slot = jax.lax.rem(ctr[1], 2)
            for k in range(chunk_pages):
                pltpu.make_async_copy(
                    kv_hbm.at[0, 0], kv_vmem.at[slot, k],
                    kv_sem.at[slot, k]).wait()
            ctr[1] = ctr[1] + 1

            kv_pos = c * chunk_kv + col  # [rows, chunk_kv]
            causal = kv_pos <= q_pos
            if num_spans:
                # Gemma3-MM bidirectional image spans: q and kv both inside
                # ANY span of this request attend regardless of causality
                # (HF token-type-run masking); M is static and small.
                req2 = item_req[it]
                bidir = jnp.zeros_like(causal)
                for m in range(num_spans):
                    lo = mm_spans[req2 * num_spans * 2 + 2 * m]
                    hi = mm_spans[req2 * num_spans * 2 + 2 * m + 1]
                    bidir |= ((q_pos >= lo) & (q_pos < hi)
                              & (kv_pos >= lo) & (kv_pos < hi))
                causal = causal | bidir
            mask = causal & (kv_pos < kv_limit)
            if sliding_window is not None:
                mask &= kv_pos > q_pos - sliding_window
            if chunk_attn is not None:  # Llama4 chunked local attention
                mask &= (kv_pos // chunk_attn) == (q_pos // chunk_attn)
            for h in range(num_kv_heads):
                # Leading-dim slices only (Mosaic-friendly).
                k_h = kv_vmem[slot, :, 0, h].reshape(chunk_kv, head_dim)
                v_h = kv_vmem[slot, :, 1, h].reshape(chunk_kv, head_dim)
                if k_h.dtype != q_dtype:  # fp8 KV cache: upcast for the MXU
                    k_h = k_h.astype(q_dtype)
                    v_h = v_h.astype(q_dtype)
                q_h = q_vmem[q_slot, h]  # [rows, hd]
                s = jax.lax.dot_general(
                    q_h, k_h, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                if alibi is not None:
                    # ALiBi: slope[h,g] * (kv_pos - q_pos). Pallas kernels
                    # cannot capture array constants, so the per-row slope
                    # vector is built from iota + scalar selects (row =
                    # token*group + g; group static values per kv head).
                    g_iota = jax.lax.broadcasted_iota(
                        jnp.int32, (rows, 1), 0) % group
                    slopes_h = alibi[h * group:(h + 1) * group]
                    sl_rows = jnp.full((rows, 1), slopes_h[0], jnp.float32)
                    for g2 in range(1, group):
                        sl_rows = jnp.where(g_iota == g2,
                                            jnp.float32(slopes_h[g2]),
                                            sl_rows)
                    s = s + sl_rows * (kv_pos - q_pos).astype(jnp.float32)
                if logits_soft_cap is not None:
                    s = logits_soft_cap * jnp.tanh(s / logits_soft_cap)
                s = jnp.where(mask, s, -jnp.inf)
                m_prev = m_i[h]  # [rows, 1]
                m_new = jnp.maximum(m_prev,
                                    jnp.max(s, axis=-1, keepdims=True))
                # Rows with no valid kv yet keep m=-inf; guard exp.
                m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
                p = jnp.exp(s - m_safe)
                p = jnp.where(mask, p, 0.0)
                alpha = jnp.where(jnp.isfinite(m_prev),
                                  jnp.exp(m_prev - m_safe), 0.0)
                l_i[h] = l_i[h] * alpha + jnp.sum(p, axis=-1, keepdims=True)
                pv = jax.lax.dot_general(
                    p.astype(v_h.dtype), v_h, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc[h] = acc[h] * alpha + pv
                m_i[h] = m_new
            return 0

        jax.lax.fori_loop(c0, nc, body, 0)

        for h in range(num_kv_heads):
            denom = jnp.maximum(l_i[h], 1e-20)  # [rows, 1]
            out_ref[0, h] = (acc[h] / denom).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "sliding_window", "logits_soft_cap",
                     "chunk_attn", "alibi",
                     "block_q", "chunk_pages", "interpret"))
def ragged_paged_attention(
    q: jax.Array,  # [T, nq, hd] (flat token layout)
    kv_cache: jax.Array,  # [P, 2, kvh, page, hd] or [L, P, ...] + layer_idx
    md: AttentionMetadata,
    scale: float,
    sliding_window: Optional[int] = None,
    chunk_attn: Optional[int] = None,
    logits_soft_cap: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    chunk_pages: int = DEFAULT_CHUNK_PAGES,
    interpret: Optional[bool] = None,
    layer_idx=None,
    alibi: Optional[tuple] = None,  # static per-q-head slopes
) -> jax.Array:
    if interpret is None:
        # Env override lets the full engine run the Pallas path on CPU.
        interpret = os.environ.get("APHRODITE_PALLAS_INTERPRET", "0") == "1"
    assert md.item_req is not None, \
        "AttentionMetadata lacks work items (runner must build them)"
    T, nq, hd = q.shape
    if kv_cache.ndim == 5:
        # Per-layer view: wrap as a 1-layer stack (free reshape). The
        # 6-D + dynamic-layer form exists so the layer scan can carry the
        # FULL cache without materializing per-layer slices.
        kv_cache = kv_cache[None]
        layer_idx = jnp.zeros((), jnp.int32)
    num_pages = kv_cache.shape[1]
    _, _, _, kvh, page_size, _ = kv_cache.shape
    max_items = md.item_req.shape[0]
    group = nq // kvh
    lidx = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    # VMEM budget guard: the fp32 softmax scratch scales with
    # block_q*group*hd (MLA geometry: group=128, hd=640). The runner
    # auto-shrinks block_q (_compute_block_q_cap); a hand-passed block_q
    # that blows VMEM fails loudly here instead of deep in Mosaic.
    rows_ = block_q * group
    chunk_kv_ = chunk_pages * page_size
    scratch_bytes = (
        2 * kvh * rows_ * hd * q.dtype.itemsize          # q double buffer
        + 2 * chunk_pages * 2 * kvh * page_size * hd
        * kv_cache.dtype.itemsize                        # kv chunks
        + kvh * rows_ * hd * 4 + 2 * kvh * rows_ * 4     # acc + m/l
        + 2 * kvh * rows_ * hd * q.dtype.itemsize        # out (2x buffered)
        + 4 * rows_ * chunk_kv_ * 4)                     # VPU temporaries
    assert scratch_bytes < 15 * 2 ** 20, (
        f"ragged kernel scratch {scratch_bytes/2**20:.1f} MiB exceeds VMEM "
        f"(block_q={block_q}, group={group}, head_dim={hd}); shrink "
        "block_q — the runner's _compute_block_q_cap does this from model "
        "geometry")

    # [T, nq, hd] -> [kvh, (T+BQ)*group, hd]: rows grouped per kv head so the
    # kernel's q-block DMA is one contiguous leading-dim slice per head.
    q_arr = jnp.pad(q, ((0, block_q), (0, 0), (0, 0)))
    q_arr = q_arr.reshape(T + block_q, kvh, group, hd)
    q_arr = jnp.transpose(q_arr, (1, 0, 2, 3)).reshape(
        kvh, (T + block_q) * group, hd)

    # Bidirectional image spans (Gemma3-MM) flat [R*M*2] for SMEM prefetch.
    num_spans = 0
    spans_flat = jnp.zeros((2,), jnp.int32)
    if md.mm_bidir_spans is not None:
        R_, M_, _ = md.mm_bidir_spans.shape
        num_spans = M_
        spans_flat = md.mm_bidir_spans.reshape(-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=9,
        grid=(max_items,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # q
            pl.BlockSpec(memory_space=pltpu.HBM),  # kv
        ],
        out_specs=(pl.BlockSpec(
            (1, kvh, block_q * group, hd), lambda i, *_: (i, 0, 0, 0),
            memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pltpu.VMEM((2, kvh, block_q * group, hd), q.dtype),
            pltpu.VMEM((2, chunk_pages, 2, kvh, page_size, hd),
                       kv_cache.dtype),
            pltpu.VMEM((kvh, block_q * group, hd), jnp.float32),
            pltpu.VMEM((kvh, block_q * group, 1), jnp.float32),
            pltpu.VMEM((kvh, block_q * group, 1), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, chunk_pages)),
        ],
    )

    kernel = functools.partial(
        _rpa_kernel, scale=scale, block_q=block_q, chunk_pages=chunk_pages,
        page_size=page_size, num_q_heads=nq, num_kv_heads=kvh, head_dim=hd,
        sliding_window=sliding_window, logits_soft_cap=logits_soft_cap,
        chunk_attn=chunk_attn,
        max_pages=md.block_tables.shape[1], q_dtype=q.dtype,
        alibi=alibi, num_spans=num_spans)

    out_items, kv_cache_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct(
            (max_items, kvh, block_q * group, hd), q.dtype),
            jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype)),
        input_output_aliases={10: 1},  # kv_cache -> cache pass-through
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(lidx, md.item_req, md.item_qstart, md.item_qlen, md.item_pos,
      md.seq_lens, md.block_tables, md.num_items_arr, spans_flat,
      q_arr, kv_cache)

    # [items, kvh, BQ*G, hd] -> [items, BQ, nq, hd] -> flat [T, nq, hd].
    out = out_items.reshape(max_items, kvh, block_q, group, hd)
    out = jnp.transpose(out, (0, 2, 1, 3, 4)).reshape(
        max_items, block_q, nq, hd)
    return out[md.token_item, md.token_item_row], kv_cache_out
