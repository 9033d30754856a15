"""In-kernel ALiBi bias + Gemma3 bidirectional spans: Pallas-path oracle
parity at >=1k context (VERDICT r2 #7). Previously these families dropped
to the O(T*ctx) vmap oracle."""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from aphrodite_tpu.attention.backend import (alibi_slopes,
                                             ref_ragged_paged_attention,
                                             write_kv)
from aphrodite_tpu.attention.metadata import build_work_items
from aphrodite_tpu.ops.decode_paged_attention import decode_paged_attention
from aphrodite_tpu.ops.ragged_paged_attention import ragged_paged_attention

from tests.utils import make_prefill_metadata

PAGE = 32
KVH = 2
NQ = 4
HD = 64


def _setup(prompts, seed=0, max_pages=40, t_pad=None):
    rng = np.random.RandomState(seed)
    md, ids, used = make_prefill_metadata(prompts, PAGE, max_pages,
                                          num_tokens_pad=t_pad)
    T = len(np.asarray(md.token_pos))
    q = jnp.asarray(rng.randn(T, NQ, HD), jnp.float32) * 0.3
    k = jnp.asarray(rng.randn(T, KVH, HD), jnp.float32) * 0.3
    v = jnp.asarray(rng.randn(T, KVH, HD), jnp.float32) * 0.3
    from aphrodite_tpu.attention.backend import kv_cache_shape
    cache = jnp.zeros(kv_cache_shape(used + 4, PAGE, KVH, HD), jnp.float32)
    cache = write_kv(cache, k, v, md.slot_mapping)
    qsl = np.asarray(md.query_start_loc)
    items = build_work_items(qsl[:-1], np.diff(qsl),
                             np.asarray(md.seq_lens), len(prompts), T, 128,
                             md.block_tables.shape[0])
    md = dataclasses.replace(
        md, **{k2: jnp.asarray(v2) for k2, v2 in items.items()},
        block_q=128)
    return q, cache, md


def test_alibi_prefill_kernel_1k_ctx():
    prompts = [[1] * 1024, [2] * 300]
    q, cache, md = _setup(prompts)
    slopes = alibi_slopes(NQ)
    out, _ = ragged_paged_attention(
        q, cache, md, 0.125, interpret=True,
        alibi=tuple(float(x) for x in np.asarray(slopes)))
    ref = ref_ragged_paged_attention(q, cache, md, 0.125, alibi=slopes)
    live = np.asarray(md.slot_mapping) >= 0
    np.testing.assert_allclose(np.asarray(out)[live], np.asarray(ref)[live],
                               rtol=2e-3, atol=2e-3)


def test_alibi_decode_kernel_1k_ctx():
    rng = np.random.RandomState(1)
    R, ctx = 3, 1030
    npages = -(-ctx // PAGE)
    P = R * npages + 2
    cache = jnp.asarray(rng.randn(P, 2, KVH, PAGE, HD), jnp.float32) * 0.3
    bt = np.zeros((R, npages + 1), np.int32)
    for r in range(R):
        bt[r, :npages] = np.arange(1 + r * npages, 1 + (r + 1) * npages) % P
    seq_lens = jnp.asarray([ctx, ctx - 13, ctx - 101], jnp.int32)
    q = jnp.asarray(rng.randn(R, NQ, HD), jnp.float32) * 0.3
    slopes = alibi_slopes(NQ)
    out, _ = decode_paged_attention(
        q, cache, jnp.asarray(bt), seq_lens, 0.125, interpret=True,
        alibi=tuple(float(x) for x in np.asarray(slopes)))
    # oracle via the ragged reference with decode-shaped metadata
    from aphrodite_tpu.attention.metadata import AttentionMetadata
    md = AttentionMetadata(
        token_req_idx=jnp.arange(R, dtype=jnp.int32),
        token_pos=seq_lens - 1,
        slot_mapping=jnp.zeros((R,), jnp.int32),
        query_start_loc=jnp.arange(R + 1, dtype=jnp.int32),
        seq_lens=seq_lens, block_tables=jnp.asarray(bt),
        num_reqs=jnp.asarray(R, jnp.int32),
        num_tokens=jnp.asarray(R, jnp.int32))
    ref = ref_ragged_paged_attention(q, cache, md, 0.125, alibi=slopes)
    np.testing.assert_allclose(
        np.asarray(out).reshape(R, NQ, HD), np.asarray(ref),
        rtol=2e-3, atol=2e-3)


def test_bidir_spans_prefill_kernel_1k_ctx():
    prompts = [[1] * 1100, [2] * 600]
    q, cache, md = _setup(prompts, seed=2)
    spans = np.full((md.block_tables.shape[0], 2, 2), -1, np.int32)
    spans[0, 0] = (64, 320)    # an image span inside request 0
    spans[0, 1] = (700, 956)
    spans[1, 0] = (10, 266)
    md = dataclasses.replace(md, mm_bidir_spans=jnp.asarray(spans))
    out, _ = ragged_paged_attention(q, cache, md, 0.125, interpret=True)
    ref = ref_ragged_paged_attention(q, cache, md, 0.125)
    live = np.asarray(md.slot_mapping) >= 0
    np.testing.assert_allclose(np.asarray(out)[live], np.asarray(ref)[live],
                               rtol=2e-3, atol=2e-3)
