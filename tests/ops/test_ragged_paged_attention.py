"""Pallas ragged paged attention (interpret mode) vs the pure-JAX oracle
(SURVEY.md §4.5 pattern: kernel vs reference impl)."""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from aphrodite_tpu.attention.backend import (ref_ragged_paged_attention,
                                             write_kv)
from aphrodite_tpu.attention.metadata import build_work_items
from aphrodite_tpu.ops.ragged_paged_attention import ragged_paged_attention

from tests.utils import make_prefill_metadata

PAGE = 16
MAX_PAGES = 8
KVH = 2
NQ = 4
HD = 64
BLOCK_Q = 32


def setup_case(prompts, seed=0, t_pad=None, r_pad=None, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    md, ids, used = make_prefill_metadata(
        prompts, PAGE, MAX_PAGES, num_tokens_pad=t_pad, num_reqs_pad=r_pad)
    T = len(np.asarray(md.token_pos))
    R = md.block_tables.shape[0]
    q = jnp.asarray(rng.randn(T, NQ, HD), dtype) * 0.3
    k = jnp.asarray(rng.randn(T, KVH, HD), dtype) * 0.3
    v = jnp.asarray(rng.randn(T, KVH, HD), dtype) * 0.3
    from aphrodite_tpu.attention.backend import kv_cache_shape
    kv_cache = jnp.zeros(kv_cache_shape(used + 4, PAGE, KVH, HD), dtype)
    kv_cache = write_kv(kv_cache, k, v, md.slot_mapping)

    qsl_np = np.asarray(md.query_start_loc)
    items = build_work_items(qsl_np[:-1], np.diff(qsl_np),
                             np.asarray(md.seq_lens),
                             len(prompts), T, BLOCK_Q, R)
    md = dataclasses.replace(
        md, **{k2: jnp.asarray(v2) for k2, v2 in items.items()})
    return q, kv_cache, md


@pytest.mark.parametrize("prompts", [
    [[1] * 7],                      # single short prefill
    [[1] * 40, [2] * 13, [3] * 1],  # mixed prefill + tiny
    [[1] * 1, [2] * 1, [3] * 1],    # pure decode-like
    [[1] * 100],                    # multi-item long prefill
])
def test_kernel_matches_oracle(prompts):
    q, kv_cache, md = setup_case(prompts)
    scale = HD ** -0.5
    ref = ref_ragged_paged_attention(q, kv_cache, md, scale)
    got, _ = ragged_paged_attention(q, kv_cache, md, scale, block_q=BLOCK_Q,
                                 chunk_pages=2, interpret=True)
    T = int(np.asarray(md.num_tokens))
    np.testing.assert_allclose(np.asarray(got)[:T], np.asarray(ref)[:T],
                               rtol=2e-3, atol=2e-3)


def test_kernel_sliding_window():
    q, kv_cache, md = setup_case([[1] * 60])
    scale = HD ** -0.5
    ref = ref_ragged_paged_attention(q, kv_cache, md, scale,
                                     sliding_window=16)
    got, _ = ragged_paged_attention(q, kv_cache, md, scale, sliding_window=16,
                                 block_q=BLOCK_Q, chunk_pages=2,
                                 interpret=True)
    T = int(np.asarray(md.num_tokens))
    np.testing.assert_allclose(np.asarray(got)[:T], np.asarray(ref)[:T],
                               rtol=2e-3, atol=2e-3)


def test_kernel_soft_cap():
    q, kv_cache, md = setup_case([[1] * 33, [2] * 5])
    scale = HD ** -0.5
    ref = ref_ragged_paged_attention(q, kv_cache, md, scale,
                                     logits_soft_cap=30.0)
    got, _ = ragged_paged_attention(q, kv_cache, md, scale,
                                 logits_soft_cap=30.0, block_q=BLOCK_Q,
                                 chunk_pages=2, interpret=True)
    T = int(np.asarray(md.num_tokens))
    np.testing.assert_allclose(np.asarray(got)[:T], np.asarray(ref)[:T],
                               rtol=2e-3, atol=2e-3)


def test_kernel_padded_buckets():
    """Padded token/request buckets must not disturb valid outputs."""
    prompts = [[1] * 9, [2] * 3]
    q, kv_cache, md = setup_case(prompts, t_pad=64, r_pad=8)
    scale = HD ** -0.5
    ref = ref_ragged_paged_attention(q, kv_cache, md, scale)
    got, _ = ragged_paged_attention(q, kv_cache, md, scale, block_q=BLOCK_Q,
                                 chunk_pages=2, interpret=True)
    T = 12
    np.testing.assert_allclose(np.asarray(got)[:T], np.asarray(ref)[:T],
                               rtol=2e-3, atol=2e-3)


def test_kernel_decode_after_prefill():
    """Decode step (1 new token on an existing context) matches oracle."""
    from aphrodite_tpu.attention.metadata import AttentionMetadata
    rng = np.random.RandomState(3)
    ctx = 37
    md0, _, used = make_prefill_metadata([[1] * ctx], PAGE, MAX_PAGES)
    from aphrodite_tpu.attention.backend import kv_cache_shape
    kv_cache = jnp.zeros(kv_cache_shape(used + 4, PAGE, KVH, HD), jnp.float32)
    k = jnp.asarray(rng.randn(ctx, KVH, HD), jnp.float32)
    v = jnp.asarray(rng.randn(ctx, KVH, HD), jnp.float32)
    kv_cache = write_kv(kv_cache, k, v, md0.slot_mapping)

    # One decode token at position ctx.
    slot = (ctx // PAGE + 1) * PAGE + ctx % PAGE \
        if False else int(np.asarray(md0.block_tables)[0, ctx // PAGE]) \
        * PAGE + ctx % PAGE
    qsl = np.array([0, 1], np.int32)
    seq_lens = np.array([ctx + 1], np.int32)
    md = AttentionMetadata(
        token_req_idx=jnp.asarray([0], jnp.int32),
        token_pos=jnp.asarray([ctx], jnp.int32),
        slot_mapping=jnp.asarray([slot], jnp.int32),
        query_start_loc=jnp.asarray(qsl),
        seq_lens=jnp.asarray(seq_lens),
        block_tables=md0.block_tables,
        num_reqs=jnp.asarray(1, jnp.int32),
        num_tokens=jnp.asarray(1, jnp.int32),
    )
    kq = jnp.asarray(rng.randn(1, KVH, HD), jnp.float32)
    vq = jnp.asarray(rng.randn(1, KVH, HD), jnp.float32)
    kv_cache = write_kv(kv_cache, kq, vq, md.slot_mapping)
    q = jnp.asarray(rng.randn(1, NQ, HD), jnp.float32)

    items = build_work_items(qsl[:-1], np.diff(qsl), seq_lens, 1, 1,
                             BLOCK_Q, 1)
    md = dataclasses.replace(
        md, **{k2: jnp.asarray(v2) for k2, v2 in items.items()})
    scale = HD ** -0.5
    ref = ref_ragged_paged_attention(q, kv_cache, md, scale)
    got, _ = ragged_paged_attention(q, kv_cache, md, scale, block_q=BLOCK_Q,
                                 chunk_pages=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got)[:1], np.asarray(ref)[:1],
                               rtol=2e-3, atol=2e-3)


def test_mla_v3_geometry_small_block_q():
    """DeepSeek-V3 absorbed-MQA geometry (group=128, head_dim 576->640):
    the runner auto-shrinks block_q so the kernel's fp32 scratch fits
    VMEM; parity vs the oracle through the Pallas path at that block_q,
    and the VMEM-budget assert rejects the old fixed block_q=128."""
    import dataclasses as dc
    group, kvh, hd = 128, 1, 640
    nq = group * kvh
    page, max_pages = 16, 8
    rng = np.random.RandomState(5)
    prompts = [[1] * 24, [2] * 9]
    md, ids, used = make_prefill_metadata(
        prompts, page, max_pages, num_tokens_pad=64, num_reqs_pad=4)
    T = len(np.asarray(md.token_pos))
    R = md.block_tables.shape[0]
    q = jnp.asarray(rng.randn(T, nq, hd), jnp.float32) * 0.1
    k = jnp.asarray(rng.randn(T, kvh, hd), jnp.float32) * 0.1
    v = jnp.asarray(rng.randn(T, kvh, hd), jnp.float32) * 0.1
    from aphrodite_tpu.attention.backend import kv_cache_shape
    kv_cache = jnp.zeros(kv_cache_shape(used + 4, page, kvh, hd),
                         jnp.float32)
    kv_cache = write_kv(kv_cache, k, v, md.slot_mapping)

    # the geometry cap math (mirrors runner._compute_block_q_cap)
    chunk_pages = 2
    kv_bytes = 2 * chunk_pages * 2 * kvh * page * hd * 2
    budget = 12 * 2 ** 20 - kv_bytes
    per_row = kvh * (hd * (4 + 2 * 2 + 2) + 16)
    rows = max(budget // per_row, 8)
    bq = int(max(8, min(128, (rows // group) // 8 * 8)))
    assert bq <= 16, bq  # V3 geometry must shrink hard

    qsl_np = np.asarray(md.query_start_loc)
    items = build_work_items(qsl_np[:-1], np.diff(qsl_np),
                             np.asarray(md.seq_lens),
                             len(prompts), T, bq, R)
    md2 = dc.replace(md, **{k2: jnp.asarray(v2)
                            for k2, v2 in items.items()})
    out, _ = ragged_paged_attention(q, kv_cache, md2, scale=0.05,
                                    block_q=bq, chunk_pages=chunk_pages,
                                    interpret=True)
    ref = ref_ragged_paged_attention(q, kv_cache, md2, scale=0.05)
    tl = np.asarray(md.slot_mapping) >= 0
    np.testing.assert_allclose(np.asarray(out)[tl], np.asarray(ref)[tl],
                               rtol=2e-3, atol=2e-3)

    # fixed block_q=128 at this geometry must be rejected by the VMEM guard
    items128 = build_work_items(qsl_np[:-1], np.diff(qsl_np),
                                np.asarray(md.seq_lens),
                                len(prompts), T, 128, R)
    md3 = dc.replace(md, **{k2: jnp.asarray(v2)
                            for k2, v2 in items128.items()})
    with pytest.raises(AssertionError, match="VMEM"):
        ragged_paged_attention(q, kv_cache, md3, scale=0.05, block_q=128,
                               chunk_pages=chunk_pages, interpret=True)
