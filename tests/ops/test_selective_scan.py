"""Pallas selective-scan kernel vs the associative_scan oracle."""
import os

import numpy as np
import pytest

os.environ.setdefault("APHRODITE_PALLAS_INTERPRET", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from aphrodite_tpu.ops.selective_scan import selective_scan  # noqa: E402


def oracle(dA, dBx):
    def combine(a, b):
        return a[0] * b[0], a[1] * b[0] + b[1]
    _, hs = jax.lax.associative_scan(
        combine, (dA.astype(np.float32), dBx.astype(np.float32)), axis=0)
    return np.asarray(hs)


@pytest.mark.parametrize("T,shape,bt,bc", [
    (64, (16, 8), 16, 128),      # multi-chunk T, padded C
    (100, (24,), 32, 128),       # ragged T padding
    (256, (48, 4), 64, 128),     # trailing dims flattened
    (32, (130,), 8, 128),        # C > bc: multiple column blocks
])
def test_matches_oracle(T, shape, bt, bc):
    rng = np.random.default_rng(T)
    dA = rng.uniform(0.8, 1.0, size=(T,) + shape).astype(np.float32)
    dBx = rng.normal(size=(T,) + shape).astype(np.float32)
    got = selective_scan(jnp.asarray(dA), jnp.asarray(dBx),
                         block_t=bt, block_c=bc, interpret=True)
    np.testing.assert_allclose(np.asarray(got), oracle(dA, dBx),
                               rtol=1e-5, atol=1e-5)


def test_segment_reset_semantics():
    """dA=0 rows reset the recurrence exactly like the model's
    segment-isolation rewrite expects."""
    T = 48
    rng = np.random.default_rng(0)
    dA = rng.uniform(0.9, 1.0, size=(T, 8)).astype(np.float32)
    dBx = rng.normal(size=(T, 8)).astype(np.float32)
    dA[0] = 0.0
    dA[17] = 0.0  # segment boundary mid-chunk
    got = selective_scan(jnp.asarray(dA), jnp.asarray(dBx),
                         block_t=16, block_c=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), oracle(dA, dBx),
                               rtol=1e-5, atol=1e-5)
