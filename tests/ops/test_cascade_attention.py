"""Cascade (shared-prefix) attention: the split shared-pass + init-state
window pass must equal plain window attention exactly (oracle + interpret
kernels). Ref: v1/attention/backends/flash_attn.py cascade path +
kernels/attention/merge_attn_states.cu."""
import numpy as np
import jax
import jax.numpy as jnp

from aphrodite_tpu.ops.cascade_attention import (ref_cascade_window_decode,
                                                 ref_shared_prefix_attention,
                                                 shared_prefix_attention)
from aphrodite_tpu.ops.window_decode_attention import (
    ref_window_decode_attention, window_decode_attention)

L, P, KVH, PS, HD = 2, 64, 2, 16, 64
NQ, GROUP = 6, 3
R, KW = 4, 8


def setup(seed=0, shared_pages_n=2, suffix_pages=2):
    rng = np.random.RandomState(seed)
    shared = list(range(1, 1 + shared_pages_n))
    S = shared_pages_n * PS
    bt = np.zeros((R, 8), np.int32)
    plens = np.zeros((R,), np.int32)
    nxt = 1 + shared_pages_n
    for r in range(R):
        nsuf = 1 + (r % suffix_pages)
        pages = shared + list(range(nxt, nxt + nsuf))
        nxt += nsuf
        bt[r, :len(pages)] = pages
        plens[r] = S + nsuf * PS - rng.randint(0, PS)
    cache = rng.randn(L, P, 2, KVH, PS, HD).astype(np.float32) * 0.3
    q = rng.randn(R, NQ, HD).astype(np.float32) * 0.3
    tk = rng.randn(L, R, KVH, KW, HD).astype(np.float32) * 0.3
    tv = rng.randn(L, R, KVH, KW, HD).astype(np.float32) * 0.3
    return (jnp.asarray(q), jnp.asarray(cache), jnp.asarray(tk),
            jnp.asarray(tv), jnp.asarray(bt), jnp.asarray(plens),
            jnp.asarray(shared + [0, 0], dtype=jnp.int32), S)


def test_oracle_cascade_equals_plain():
    q, cache, tk, tv, bt, plens, spages, S = setup()
    step = jnp.asarray(3)
    plain = ref_window_decode_attention(
        q, cache[0], tk[0], tv[0], step, plens, bt, 0.1)
    casc = ref_cascade_window_decode(
        q, cache[0], tk[0], tv[0], step, plens, bt, spages,
        jnp.asarray(S), 0.1)
    np.testing.assert_allclose(np.asarray(casc), np.asarray(plain),
                               rtol=1e-5, atol=1e-5)


def test_kernel_shared_pass_matches_oracle():
    q, cache, tk, tv, bt, plens, spages, S = setup(seed=1)
    acc, m, l = shared_prefix_attention(
        q, cache, jnp.asarray(0), spages, jnp.asarray(S), 0.1,
        chunk_pages=1, interpret=True)
    acc_r, m_r, l_r = ref_shared_prefix_attention(
        q, cache[0], spages, S, 0.1)
    np.testing.assert_allclose(np.asarray(acc), np.asarray(acc_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(m[..., 0]), np.asarray(m_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l[..., 0]), np.asarray(l_r),
                               rtol=1e-4, atol=1e-4)


def test_kernel_cascade_window_matches_plain():
    q, cache, tk, tv, bt, plens, spages, S = setup(seed=2)
    step = jnp.asarray(2)
    init = shared_prefix_attention(
        q, cache, jnp.asarray(0), spages, jnp.asarray(S), 0.1,
        chunk_pages=1, interpret=True)
    out = window_decode_attention(
        q, cache, tk, tv, jnp.asarray(0), step, plens, bt, 0.1,
        chunk_pages=1, interpret=True, cascade_init=init,
        shared_len=jnp.asarray(S))
    plain = window_decode_attention(
        q, cache, tk, tv, jnp.asarray(0), step, plens, bt, 0.1,
        chunk_pages=1, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(plain),
                               rtol=1e-4, atol=1e-4)


def test_unaligned_shared_boundary():
    """S not a multiple of chunk_kv: the straddling chunk must mask the
    already-covered prefix positions."""
    q, cache, tk, tv, bt, plens, spages, _ = setup(seed=3)
    S = PS + 7  # mid-page boundary: shared pass covers part of page 2
    step = jnp.asarray(1)
    casc = ref_cascade_window_decode(
        q, cache[0], tk[0], tv[0], step, plens, bt, spages,
        jnp.asarray(S), 0.1)
    plain = ref_window_decode_attention(
        q, cache[0], tk[0], tv[0], step, plens, bt, 0.1)
    np.testing.assert_allclose(np.asarray(casc), np.asarray(plain),
                               rtol=1e-5, atol=1e-5)
    init = shared_prefix_attention(
        q, cache, jnp.asarray(0), spages, jnp.asarray(S), 0.1,
        chunk_pages=1, interpret=True)
    out = window_decode_attention(
        q, cache, tk, tv, jnp.asarray(0), step, plens, bt, 0.1,
        chunk_pages=1, interpret=True, cascade_init=init,
        shared_len=jnp.asarray(S))
    plain_k = window_decode_attention(
        q, cache, tk, tv, jnp.asarray(0), step, plens, bt, 0.1,
        chunk_pages=1, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(plain_k),
                               rtol=1e-4, atol=1e-4)
