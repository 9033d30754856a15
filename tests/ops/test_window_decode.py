"""Window-decode attention kernel (interpret mode) vs its pure-JAX oracle,
and the oracle vs a from-scratch full-attention reference."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from aphrodite_tpu.ops.window_decode_attention import (
    ref_window_decode_attention, window_decode_attention)

PAGE = 16
KVH = 2
NQ = 4
HD = 128
L = 3
KW = 4


def setup_case(paged_lens, seed=0, dtype=jnp.float32, max_pages=8):
    rng = np.random.RandomState(seed)
    R = len(paged_lens)
    P = R * max_pages + 1
    cache = jnp.asarray(rng.randn(L, P, 2, KVH, PAGE, HD), dtype) * 0.3
    bt = np.zeros((R, max_pages), np.int32)
    for r in range(R):
        bt[r] = np.arange(1 + r * max_pages, 1 + (r + 1) * max_pages)
    tail_k = jnp.asarray(rng.randn(L, R, KVH, KW, HD), dtype) * 0.3
    tail_v = jnp.asarray(rng.randn(L, R, KVH, KW, HD), dtype) * 0.3
    q = jnp.asarray(rng.randn(R, NQ, HD), dtype) * 0.3
    return (q, cache, tail_k, tail_v, jnp.asarray(bt),
            jnp.asarray(paged_lens, jnp.int32))


@pytest.mark.parametrize("paged_lens,step", [
    ([40, 13, 7, 0], 0),
    ([40, 13, 7, 0], 2),
    ([128, 1, 65, 33], 3),
    ([5], 1),
])
def test_kernel_matches_oracle(paged_lens, step):
    q, cache, tk, tv, bt, plens = setup_case(paged_lens)
    scale = HD ** -0.5
    for layer in (0, L - 1):
        ref = ref_window_decode_attention(
            q, cache[layer], tk[layer], tv[layer], jnp.int32(step), plens,
            bt, scale)
        got = window_decode_attention(
            q, cache, tk, tv, jnp.int32(layer), jnp.int32(step), plens, bt,
            scale, chunk_pages=2, interpret=True)
        live = np.asarray(plens) > 0
        np.testing.assert_allclose(np.asarray(got)[live],
                                   np.asarray(ref)[live],
                                   rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("window", [16, 48])
def test_kernel_sliding_window(window):
    q, cache, tk, tv, bt, plens = setup_case([100, 30, 9])
    scale = HD ** -0.5
    ref = ref_window_decode_attention(
        q, cache[1], tk[1], tv[1], jnp.int32(2), plens, bt, scale,
        sliding_window=window)
    got = window_decode_attention(
        q, cache, tk, tv, jnp.int32(1), jnp.int32(2), plens, bt, scale,
        sliding_window=window, chunk_pages=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_kernel_soft_cap():
    q, cache, tk, tv, bt, plens = setup_case([33, 5])
    scale = HD ** -0.5
    ref = ref_window_decode_attention(
        q, cache[0], tk[0], tv[0], jnp.int32(1), plens, bt, scale,
        logits_soft_cap=30.0)
    got = window_decode_attention(
        q, cache, tk, tv, jnp.int32(0), jnp.int32(1), plens, bt, scale,
        logits_soft_cap=30.0, chunk_pages=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_oracle_matches_dense():
    """Oracle vs a dense causal attention over the materialized sequence."""
    rng = np.random.RandomState(1)
    plen, step = 21, 2
    q, cache, tk, tv, bt, plens = setup_case([plen], seed=1)
    scale = HD ** -0.5
    out = ref_window_decode_attention(
        q, cache[0], tk[0], tv[0], jnp.int32(step), plens, bt, scale)

    # materialize K/V: paged tokens then tail[:step+1]
    kv = np.asarray(cache[0])[np.asarray(bt[0])]  # [maxP, 2, kvh, page, hd]
    kv = kv.transpose(0, 3, 2, 1, 4).reshape(-1, KVH, 2, HD)
    keys = np.concatenate(
        [kv[:plen, :, 0],
         np.asarray(tk[0, 0]).transpose(1, 0, 2)[:step + 1]], axis=0)
    vals = np.concatenate(
        [kv[:plen, :, 1],
         np.asarray(tv[0, 0]).transpose(1, 0, 2)[:step + 1]], axis=0)
    group = NQ // KVH
    qf = np.asarray(q[0]).reshape(KVH, group, HD)
    logits = np.einsum("hgd,khd->hgk", qf, keys) * scale
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    expect = np.einsum("hgk,khd->hgd", probs, vals).reshape(NQ, HD)
    np.testing.assert_allclose(np.asarray(out[0]), expect,
                               rtol=2e-3, atol=2e-3)
