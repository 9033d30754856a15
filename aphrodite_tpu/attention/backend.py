"""Paged-attention compute path.

KV cache layout (per layer): ``[num_pages, page_size, num_kv_heads, 2, head_dim]``
with K at ``[..., 0, :]`` and V at ``[..., 1, :]`` — head-interleaved K/V so a
single page DMA brings both (same motivation as the reference's
``(num_blocks, block_size, num_kv_heads*2, head_size)`` layout,
aphrodite/v1/attention/backends/pallas.py:37-43).

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


def write_kv(kv_cache: jax.Array, k: jax.Array, v: jax.Array,
             slot_mapping: jax.Array) -> jax.Array:
    """Scatter this step's K/V into the paged cache.

    kv_cache: [P, page, kvh, 2, hd]; k, v: [T, kvh, hd];
    slot_mapping: [T] flat slots, -1 => dropped (pad token).
    Replaces the reference's reshape_and_cache kernel
    (kernels/cache_kernels.cu) with an XLA scatter on a donated buffer.
    """
    num_pages, page_size, kvh, _, hd = kv_cache.shape
    flat = kv_cache.reshape(num_pages * page_size, kvh, 2, hd)
    kv = jnp.stack([k, v], axis=2)  # [T, kvh, 2, hd]
    slots = jnp.where(slot_mapping < 0, num_pages * page_size, slot_mapping)
    flat = flat.at[slots].set(kv.astype(flat.dtype), mode="drop",
                              indices_are_sorted=False, unique_indices=False)
    return flat.reshape(kv_cache.shape)


def ref_ragged_paged_attention(
    q: jax.Array,  # [T, nq, hd]
    kv_cache: jax.Array,  # [P, page, kvh, 2, hd]
    md: AttentionMetadata,
    scale: float,
    sliding_window: Optional[int] = None,
    logits_soft_cap: Optional[float] = None,
) -> jax.Array:
    """Pure-JAX oracle for ragged paged attention (correct, not fast)."""
    num_pages, page_size, kvh, _, hd = kv_cache.shape
    nq = q.shape[1]
    group = nq // kvh
    max_pages_per_req = md.block_tables.shape[1]
    max_kv = max_pages_per_req * page_size

    def per_token(qt, req, pos):
        pages = md.block_tables[req]  # [max_pages]
        kv = kv_cache[pages]  # [max_pages, page, kvh, 2, hd]
        kv = kv.reshape(max_kv, kvh, 2, hd).astype(jnp.float32)
        keys, values = kv[:, :, 0], kv[:, :, 1]  # [max_kv, kvh, hd]
        qf = qt.astype(jnp.float32).reshape(kvh, group, hd)
        logits = jnp.einsum("hgd,khd->hgk", qf, keys) * scale
        if logits_soft_cap is not None:
            logits = logits_soft_cap * jnp.tanh(logits / logits_soft_cap)
        kv_pos = jnp.arange(max_kv)
        mask = kv_pos <= pos
        if sliding_window is not None:
            mask &= kv_pos > pos - sliding_window
        logits = jnp.where(mask[None, None, :], logits, -jnp.inf)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("hgk,khd->hgd", probs, values)
        return out.reshape(nq, hd)

    out = jax.vmap(per_token)(q, md.token_req_idx, md.token_pos)
    return out.astype(q.dtype)


def paged_attention(
    q: jax.Array,
    kv_cache: jax.Array,
    md: AttentionMetadata,
    scale: float,
    sliding_window: Optional[int] = None,
    logits_soft_cap: Optional[float] = None,
    use_pallas: bool = False,
) -> jax.Array:
    """Dispatch to the Pallas kernel (TPU) or the JAX oracle (CPU/tests)."""
    if use_pallas:
        from aphrodite_tpu.ops.ragged_paged_attention import (
            ragged_paged_attention)
        return ragged_paged_attention(
            q, kv_cache, md, scale,
            sliding_window=sliding_window,
            logits_soft_cap=logits_soft_cap)
    return ref_ragged_paged_attention(
        q, kv_cache, md, scale,
        sliding_window=sliding_window,
        logits_soft_cap=logits_soft_cap)
