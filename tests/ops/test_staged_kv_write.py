"""write_kv_staged == write_kv (page-granular staged KV write oracle)."""
import numpy as np
import jax
import jax.numpy as jnp

from aphrodite_tpu.attention.backend import write_kv, write_kv_staged
from aphrodite_tpu.attention.metadata import build_kv_stage


def _mk(T, R, ps, P, seed, partial=True):
    rng = np.random.RandomState(seed)
    k = rng.randn(T, 2, 8).astype(np.float32)
    v = rng.randn(T, 2, 8).astype(np.float32)
    slots = np.full((T,), -1, np.int32)
    # fill a ragged layout: R requests with random chunk lens at random
    # (page-aligned-ish) positions, partial start/end pages included
    used = set()
    t = 0
    for r in range(R):
        n = rng.randint(1, max(2, T // R))
        start_off = rng.randint(0, ps) if partial else 0
        npages = (start_off + n + ps - 1) // ps
        pages = []
        while len(pages) < npages:
            p = rng.randint(1, P)
            if p not in used:
                used.add(p)
                pages.append(p)
        for j in range(n):
            if t >= T:
                break
            pos = start_off + j
            slots[t] = pages[pos // ps] * ps + pos % ps
            t += 1
    return k, v, slots


def test_staged_matches_per_token():
    T, R, ps, P = 96, 5, 16, 64
    k, v, slots = _mk(T, R, ps, P, 0)
    cache = np.random.RandomState(1).randn(P, 2, 2, ps, 8).astype(np.float32)
    ref = write_kv(jnp.asarray(cache), jnp.asarray(k), jnp.asarray(v),
                   jnp.asarray(slots))
    sp, ss = build_kv_stage(slots, T, R + 3, ps, P)
    got = write_kv_staged(jnp.asarray(cache), jnp.asarray(k),
                          jnp.asarray(v), jnp.asarray(sp), jnp.asarray(ss))
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_staged_full_stack_layer_indexed():
    T, R, ps, P, L = 64, 3, 16, 32, 4
    k, v, slots = _mk(T, R, ps, P, 2)
    cache = np.random.RandomState(3).randn(L, P, 2, 2, ps, 8).astype(
        np.float32)
    lidx = jnp.asarray(2)
    ref = write_kv(jnp.asarray(cache), jnp.asarray(k), jnp.asarray(v),
                   jnp.asarray(slots), layer_idx=lidx)
    sp, ss = build_kv_stage(slots, T, R + 3, ps, P)
    got = write_kv_staged(jnp.asarray(cache), jnp.asarray(k),
                          jnp.asarray(v), jnp.asarray(sp), jnp.asarray(ss),
                          layer_idx=lidx)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_staged_all_pad():
    T, ps, P = 32, 16, 16
    k = np.zeros((T, 2, 8), np.float32)
    slots = np.full((T,), -1, np.int32)
    cache = np.random.RandomState(4).randn(P, 2, 2, ps, 8).astype(np.float32)
    sp, ss = build_kv_stage(slots, T, 4, ps, P)
    got = write_kv_staged(jnp.asarray(cache), jnp.asarray(k),
                          jnp.asarray(k), jnp.asarray(sp), jnp.asarray(ss))
    np.testing.assert_array_equal(cache, np.asarray(got))
