"""Paged-attention compute path.

KV cache layout (per layer): ``[num_pages, 2, num_kv_heads, page_size, head_dim]``
with K at ``[:, 0]`` and V at ``[:, 1]``. Rationale (Mosaic tiling): every
per-head / per-K-or-V access in the Pallas kernel is then a *leading-dim*
slice of a VMEM buffer whose minor dims stay ``(page_size, head_dim)`` —
no lane/sublane-unaligned slicing regardless of head_dim (64 or 128). One
page DMA still moves K and V for all heads together (same motivation as the
reference's combined layout, aphrodite/v1/attention/backends/pallas.py:37-43).

Two implementations with identical semantics:

- ``ref_ragged_paged_attention``: pure-JAX oracle (vmap over tokens). Used on
  CPU, in tests, and as the ground truth for the Pallas kernel.
- ``aphrodite_tpu.ops.ragged_paged_attention``: the Pallas TPU kernel
  (one kernel for mixed prefill+decode over the block tables).

Semantics: query token ``i`` of request ``r`` at absolute position ``p``
attends to KV slots ``j`` of ``r`` with ``j <= p`` (causal over the paged
context, which already includes this step's freshly written tokens), further
restricted by a sliding window when configured.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from aphrodite_tpu.attention.metadata import AttentionMetadata


def kv_cache_shape(num_pages: int, page_size: int, num_kv_heads: int,
                   head_dim: int, pad_head_dim: bool = False
                   ) -> tuple[int, int, int, int, int]:
    """pad_head_dim=True rounds head_dim up to the 128-lane tile — required
    for the Pallas kernel's HBM page DMAs (Mosaic cannot slice partial
    lanes); the pad lanes hold zeros and drop out of the attention math."""
    if pad_head_dim:
        head_dim = max(128, -(-head_dim // 128) * 128)
    return (num_pages, 2, num_kv_heads, page_size, head_dim)


def write_kv(kv_cache: jax.Array, k: jax.Array, v: jax.Array,
             slot_mapping: jax.Array, layer_idx=None) -> jax.Array:
    """Scatter this step's K/V into the paged cache.

    kv_cache: [P, 2, kvh, page, hd] (per-layer view) or the FULL
    [L, P, 2, kvh, page, hd] stack with ``layer_idx`` — the latter is used
    by the carry-cache layer scan so XLA updates the buffer in place
    instead of copying it through scan xs/ys (measured ~30 ms/dispatch on
    a 0.44 GiB cache). k, v: [T, kvh, hd]; slot_mapping: [T] flat slots
    (page*page_size + offset), -1 => dropped.
    Replaces the reference's reshape_and_cache kernel
    (kernels/cache_kernels.cu) with an XLA scatter.
    """
    full = kv_cache.ndim == 6
    num_pages, _, kvh, page_size, hd = kv_cache.shape[-5:]
    if k.shape[-1] != hd:
        pad = hd - k.shape[-1]
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad)))
    pages = jnp.where(slot_mapping < 0, num_pages, slot_mapping // page_size)
    offs = jnp.where(slot_mapping < 0, 0, slot_mapping % page_size)
    if full:
        kv_cache = kv_cache.at[layer_idx, pages, 0, :, offs, :].set(
            k.astype(kv_cache.dtype), mode="drop")
        kv_cache = kv_cache.at[layer_idx, pages, 1, :, offs, :].set(
            v.astype(kv_cache.dtype), mode="drop")
        return kv_cache
    kv_cache = kv_cache.at[pages, 0, :, offs, :].set(
        k.astype(kv_cache.dtype), mode="drop")
    kv_cache = kv_cache.at[pages, 1, :, offs, :].set(
        v.astype(kv_cache.dtype), mode="drop")
    return kv_cache


def write_kv_staged(kv_cache: jax.Array, k: jax.Array, v: jax.Array,
                    stage_pages: jax.Array, stage_src: jax.Array,
                    layer_idx=None) -> jax.Array:
    """Page-granular KV write: gather -> merge -> whole-page scatter.

    XLA's TPU scatter serializes per index, so the per-token write_kv costs
    ~28 ms/layer-stack at T=8192 (PROFILE.md). Here the host preschedules
    the pages a step touches (runner build_kv_stage): ``stage_pages [J]``
    physical page ids (sentinel = num_pages for unused staging slots) and
    ``stage_src [J, page_size]`` flat token index feeding each page row
    (-1 = keep the old cache row). In-graph this becomes a contiguous
    gather of the new rows, a gather of the old pages, a masked merge, and
    ONE row scatter of full 16 KB pages at 1-D indices — ~25x faster than
    the per-token scatter. Replaces the reference's reshape_and_cache
    kernel (kernels/cache_kernels.cu) on the hot path.
    """
    full = kv_cache.ndim == 6
    num_pages, _, kvh, page_size, hd = kv_cache.shape[-5:]
    if k.shape[-1] != hd:
        pad = hd - k.shape[-1]
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad)))
    J = stage_pages.shape[0]
    src = stage_src.reshape(J * page_size)
    valid = src >= 0
    src_c = jnp.where(valid, src, 0)
    # [J*page, kvh, hd] new rows (pad rows garbage, masked below)
    new_k = jnp.take(k, src_c, axis=0).astype(kv_cache.dtype)
    new_v = jnp.take(v, src_c, axis=0).astype(kv_cache.dtype)
    # -> [J, kvh, page, hd] to match the cache page layout
    new_k = new_k.reshape(J, page_size, kvh, hd).transpose(0, 2, 1, 3)
    new_v = new_v.reshape(J, page_size, kvh, hd).transpose(0, 2, 1, 3)
    vm = valid.reshape(J, 1, page_size, 1)
    cache_l = kv_cache[layer_idx] if full else kv_cache
    old = jnp.take(cache_l, stage_pages, axis=0, mode="fill",
                   fill_value=0)                    # [J, 2, kvh, page, hd]
    merged = jnp.stack([jnp.where(vm, new_k, old[:, 0]),
                        jnp.where(vm, new_v, old[:, 1])], axis=1)
    if full:
        return kv_cache.at[layer_idx, stage_pages].set(
            merged, mode="drop", unique_indices=True)
    return kv_cache.at[stage_pages].set(merged, mode="drop",
                                        unique_indices=True)


def alibi_slopes(num_heads: int) -> jax.Array:
    """Standard ALiBi head slopes (Press et al.; matches HF's
    build_alibi_tensor closest-power-of-2 interpolation)."""
    import math
    n = 2 ** math.floor(math.log2(num_heads))
    base = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
    slopes = [base ** (i + 1) for i in range(n)]
    if n < num_heads:
        extra_base = 2.0 ** (-(2.0 ** -(math.log2(2 * n) - 3)))
        slopes += [extra_base ** (i + 1)
                   for i in range(1, 2 * (num_heads - n), 2)]
    return jnp.asarray(slopes, jnp.float32)


def ref_ragged_paged_attention(
    q: jax.Array,  # [T, nq, hd]
    kv_cache: jax.Array,  # [P, 2, kvh, page, hd]
    md: AttentionMetadata,
    scale: float,
    sliding_window: Optional[int] = None,
    logits_soft_cap: Optional[float] = None,
    alibi: Optional[jax.Array] = None,  # [nq] per-head slopes
    chunk_attn: Optional[int] = None,
    blocksparse: Optional[tuple] = None,
) -> jax.Array:
    """Pure-JAX oracle for ragged paged attention (correct, not fast).

    ``blocksparse`` = (block_size, local_blocks, vert_stride, head_step):
    Phi-3-Small block-sparse pattern (reference
    aphrodite/attention/ops/blocksparse_attention/utils.py:94-218) — a KV
    block is visible if it is within ``local_blocks`` blocks of the query
    block, or vertically strided: ``(bk + h*head_step + 1) % vert_stride
    == 0`` (head_step=0 => homogeneous heads)."""
    num_pages, _, kvh, page_size, hd = kv_cache.shape
    nq = q.shape[1]
    group = nq // kvh
    max_pages_per_req = md.block_tables.shape[1]
    max_kv = max_pages_per_req * page_size

    def per_token(qt, req, pos):
        pages = md.block_tables[req]  # [max_pages]
        kv = kv_cache[pages]  # [max_pages, 2, kvh, page, hd]
        kv = jnp.transpose(kv, (0, 3, 2, 1, 4))  # [MP, page, kvh, 2, hd]
        kv = kv.reshape(max_kv, kvh, 2, hd).astype(jnp.float32)
        keys, values = kv[:, :, 0], kv[:, :, 1]  # [max_kv, kvh, hd]
        qf = qt.astype(jnp.float32).reshape(kvh, group, hd)
        logits = jnp.einsum("hgd,khd->hgk", qf, keys) * scale
        if logits_soft_cap is not None:
            logits = logits_soft_cap * jnp.tanh(logits / logits_soft_cap)
        kv_pos = jnp.arange(max_kv)
        if alibi is not None:
            # bias = slope * (j - p): 0 at the query position, negative for
            # older keys (softmax-shift-equivalent to HF's slope*j form).
            bias = (alibi.reshape(kvh, group)[:, :, None]
                    * (kv_pos - pos)[None, None, :])
            logits = logits + bias
        mask = kv_pos <= pos
        if md.mm_bidir_spans is not None:
            spans = md.mm_bidir_spans[req]  # [M, 2]
            q_in = (spans[:, 0] <= pos) & (pos < spans[:, 1])  # [M]
            k_in = (spans[:, 0][:, None] <= kv_pos[None, :]) \
                & (kv_pos[None, :] < spans[:, 1][:, None])     # [M, K]
            # bidirectional attention within each image span (HF Gemma3
            # token-type-run masking), bounded by what has been written so
            # far (chunked prefill cannot see the future).
            bidir = jnp.any(q_in[:, None] & k_in, axis=0)
            mask |= bidir & (kv_pos < md.seq_lens[req])
        if sliding_window is not None:
            mask &= kv_pos > pos - sliding_window
        if chunk_attn is not None:  # Llama4 chunked local attention
            mask &= (kv_pos // chunk_attn) == (pos // chunk_attn)
        mask = mask[None, None, :]
        if blocksparse is not None:
            bs_sz, local_blocks, vert_stride, head_step = blocksparse
            bq, bk = pos // bs_sz, kv_pos // bs_sz  # scalar, [K]
            h_idx = jnp.arange(nq).reshape(kvh, group)  # global q-head idx
            local_ok = (bq - bk) < local_blocks  # [K]
            vert_ok = (bk[None, None, :] + h_idx[:, :, None] * head_step
                       + 1) % vert_stride == 0  # [kvh, group, K]
            mask = mask & (local_ok[None, None, :] | vert_ok)
        logits = jnp.where(mask, logits, -jnp.inf)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("hgk,khd->hgd", probs, values)
        return out.reshape(nq, hd)

    out = jax.vmap(per_token)(q, md.token_req_idx, md.token_pos)
    return out.astype(q.dtype)


def window_attention(
    q: jax.Array,            # [T=R, nq, hd]
    cache: jax.Array,        # [L, P, 2, kvh, page, hd_c] (frozen)
    tail_k: jax.Array,       # [L, R, kvh, Kw, hd_c]
    tail_v: jax.Array,
    layer_idx: jax.Array,
    md: AttentionMetadata,
    scale: float,
    sliding_window: Optional[int] = None,
    logits_soft_cap: Optional[float] = None,
    chunk_attn: Optional[int] = None,
    use_pallas: bool = False,
) -> jax.Array:
    """Multi-step window decode: frozen paged cache + in-window tail
    (ops/window_decode_attention.py). Dispatches Pallas kernel (TPU) or the
    oracle (CPU/tests). When the batch shares a KV prefix
    (md.shared_pages/shared_len set by the runner), the shared pages are
    attended ONCE for the whole batch (ops/cascade_attention.py) and the
    per-request kernel starts from that online-softmax state — the
    reference's cascade attention + merge_attn_states, fused."""
    hd = q.shape[-1]
    hd_c = cache.shape[-1]
    if hd_c != hd:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, hd_c - hd)))
    cascade = (getattr(md, "shared_pages", None) is not None
               and sliding_window is None and chunk_attn is None
               and logits_soft_cap is None)
    if use_pallas:
        from aphrodite_tpu.ops.window_decode_attention import (
            window_decode_attention)
        init = slen = None
        if cascade:
            from aphrodite_tpu.ops.cascade_attention import (
                shared_prefix_attention)
            init = shared_prefix_attention(q, cache, layer_idx,
                                           md.shared_pages, md.shared_len,
                                           scale)
            slen = md.shared_len
        out = window_decode_attention(
            q, cache, tail_k, tail_v, layer_idx, md.window_step,
            md.paged_lens, md.block_tables, scale,
            sliding_window=sliding_window, chunk_attn=chunk_attn,
            logits_soft_cap=logits_soft_cap,
            cascade_init=init, shared_len=slen)
    else:
        from aphrodite_tpu.ops.window_decode_attention import (
            ref_window_decode_attention)
        cache_l = jax.lax.dynamic_index_in_dim(cache, layer_idx, 0,
                                               keepdims=False)
        tk_l = jax.lax.dynamic_index_in_dim(tail_k, layer_idx, 0,
                                            keepdims=False)
        tv_l = jax.lax.dynamic_index_in_dim(tail_v, layer_idx, 0,
                                            keepdims=False)
        if cascade:
            from aphrodite_tpu.ops.cascade_attention import (
                ref_cascade_window_decode)
            out = ref_cascade_window_decode(
                q, cache_l, tk_l, tv_l, md.window_step, md.paged_lens,
                md.block_tables, md.shared_pages, md.shared_len, scale)
        else:
            out = ref_window_decode_attention(
                q, cache_l, tk_l, tv_l, md.window_step, md.paged_lens,
                md.block_tables, scale, sliding_window=sliding_window,
                chunk_attn=chunk_attn, logits_soft_cap=logits_soft_cap)
    return out[..., :hd]


def write_tail(tail: jax.Array, rows: jax.Array, layer_idx, step
               ) -> jax.Array:
    """Write this step's K (or V) rows into the per-layer tail buffer.
    tail: [L, R, kvh, Kw, hd_c]; rows: [R, kvh, hd]."""
    hd_c = tail.shape[-1]
    if rows.shape[-1] != hd_c:
        rows = jnp.pad(rows, ((0, 0), (0, 0), (0, hd_c - rows.shape[-1])))
    upd = rows[None, :, :, None, :].astype(tail.dtype)
    return jax.lax.dynamic_update_slice(
        tail, upd, (layer_idx, 0, 0, step, 0))


def paged_attention(
    q: jax.Array,
    kv_cache: jax.Array,
    md: AttentionMetadata,
    scale: float,
    sliding_window: Optional[int] = None,
    logits_soft_cap: Optional[float] = None,
    use_pallas: bool = False,
    alibi: Optional[jax.Array] = None,
    chunk_attn: Optional[int] = None,
    blocksparse: Optional[tuple] = None,
    layer_idx=None,
    with_cache: bool = False,
) -> jax.Array:
    """Dispatch to the Pallas kernel (TPU) or the JAX oracle (CPU/tests).
    kv_cache is a per-layer [P, ...] view, or the full [L, P, ...] stack
    plus ``layer_idx`` (carry-cache scan; the Pallas kernels then slice
    the layer during their page DMAs — nothing is materialized)."""
    hd = q.shape[-1]
    hd_cache = kv_cache.shape[-1]
    if hd_cache != hd:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, hd_cache - hd)))
    # ALiBi slopes are model constants: bake them into the kernels as a
    # static tuple (the per-row bias pattern compiles to constants). A
    # traced slopes array (shouldn't happen) falls back to the oracle.
    alibi_static = None
    if alibi is not None and not isinstance(alibi, jax.core.Tracer):
        import numpy as _np
        alibi_static = tuple(
            float(x) for x in _np.asarray(alibi, _np.float32).ravel())
    pallas_ok = use_pallas and (alibi is None or alibi_static is not None)
    full = kv_cache.ndim == 6
    if full and (blocksparse is not None or not pallas_ok):
        # Oracle paths take the per-layer view.
        kv_view = jax.lax.dynamic_index_in_dim(kv_cache, layer_idx, 0,
                                               keepdims=False)
    else:
        kv_view = kv_cache
    if blocksparse is not None:
        # Blocksparse (Phi-3-Small) runs the XLA path: the per-(head,q,k)
        # stride mask needs indices the Pallas kernels don't thread.
        out = ref_ragged_paged_attention(
            q, kv_view, md, scale, sliding_window=sliding_window,
            logits_soft_cap=logits_soft_cap, blocksparse=blocksparse)
    elif pallas_ok and md.decode_mode:
        # Decode q tokens sit past every image span, so bidirectional
        # spans never alter decode masks — ALiBi bias is in-kernel.
        from aphrodite_tpu.ops.decode_paged_attention import (
            decode_paged_attention)
        out, kv_cache = decode_paged_attention(
            q, kv_cache, md.block_tables, md.seq_lens, scale,
            sliding_window=sliding_window, logits_soft_cap=logits_soft_cap,
            chunk_attn=chunk_attn, layer_idx=layer_idx,
            alibi=alibi_static)
    elif pallas_ok:
        from aphrodite_tpu.ops.ragged_paged_attention import (
            DEFAULT_BLOCK_Q, ragged_paged_attention)
        out, kv_cache = ragged_paged_attention(
            q, kv_cache, md, scale,
            sliding_window=sliding_window,
            logits_soft_cap=logits_soft_cap,
            chunk_attn=chunk_attn,
            block_q=md.block_q or DEFAULT_BLOCK_Q,
            layer_idx=layer_idx,
            alibi=alibi_static)
    else:
        out = ref_ragged_paged_attention(
            q, kv_view, md, scale,
            sliding_window=sliding_window,
            logits_soft_cap=logits_soft_cap,
            alibi=alibi,
            chunk_attn=chunk_attn)
    out = out[..., :hd]
    # with_cache: thread the (kernel-aliased) cache back to the caller so
    # the carry-cache layer scan stays a single linear buffer chain.
    return (out, kv_cache) if with_cache else out
