"""Native-int4 W4A16 decode path (TPU resident format): numpy-oracle tests
for the XLA grouped dot, the int4 Pallas kernel (interpret mode), and the
w4a16_matmul dispatch; plus the loader's packed->int4 realization."""
import os

import numpy as np
import pytest

os.environ.setdefault("APHRODITE_PALLAS_INTERPRET", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from aphrodite_tpu.ops.quant_gemm import (w4a16_int4_grouped,  # noqa: E402
                                          w4a16_matmul)
from aphrodite_tpu.ops.quant_matmul_pallas import (  # noqa: E402
    w4a16_int4_matmul_pallas)


def _case(M, K, N, group, seed=0):
    # int4 resident semantics: values and zeros live in [-8, 8) (the
    # loader shifts uint4 nibbles by -8 at realization)
    rng = np.random.default_rng(seed)
    q = rng.integers(-8, 8, size=(K, N)).astype(np.int8)
    G = K // group
    s = rng.uniform(0.5, 1.5, size=(G, N)).astype(np.float32)
    z = rng.integers(-8, 8, size=(G, N)).astype(np.float32)
    x = rng.normal(size=(M, K)).astype(np.float32)
    w_deq = ((q.reshape(G, group, N).astype(np.float32) - z[:, None, :])
             * s[:, None, :]).reshape(K, N)
    exp = x @ w_deq
    return x, q, s, z, exp


def test_int4_grouped_oracle():
    x, q, s, z, exp = _case(16, 256, 128, 64)
    q4 = jnp.asarray(q).astype(jnp.int4)
    got = w4a16_int4_grouped(jnp.asarray(x), q4, jnp.asarray(s),
                             jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(got), exp, rtol=2e-4, atol=2e-3)


def test_int4_grouped_symmetric():
    x, q, s, z, _ = _case(8, 256, 128, 128)
    q4 = jnp.asarray(q).astype(jnp.int4)
    got = w4a16_int4_grouped(jnp.asarray(x), q4, jnp.asarray(s), None)
    G = s.shape[0]
    w_deq = (q.reshape(G, 128, 128).astype(np.float32)
             * s[:, None, :]).reshape(256, 128)
    np.testing.assert_allclose(np.asarray(got), x @ w_deq, rtol=2e-4,
                               atol=2e-3)


def test_int4_pallas_oracle():
    x, q, s, z, exp = _case(128, 512, 256, 128, seed=1)
    q4 = jnp.asarray(q).astype(jnp.int4)
    got = w4a16_int4_matmul_pallas(jnp.asarray(x), q4, jnp.asarray(s),
                                   jnp.asarray(z), block_n=128,
                                   block_k=256, interpret=True)
    np.testing.assert_allclose(np.asarray(got), exp, rtol=2e-4, atol=2e-3)


@pytest.mark.parametrize("M", [16, 128, 512])
def test_w4a16_matmul_dispatch_int4(M):
    """All three dispatch bands (grouped / pallas / dequant-GEMM) agree
    with the oracle when given the int4 leaf."""
    x, q, s, z, exp = _case(M, 512, 256, 128, seed=2)
    q4 = jnp.asarray(q).astype(jnp.int4)
    got = w4a16_matmul(jnp.asarray(x), None, jnp.asarray(s),
                       jnp.asarray(z), qweight4=q4)
    np.testing.assert_allclose(np.asarray(got), exp, rtol=2e-4, atol=5e-3)


def test_realize_int4_leaves():
    from aphrodite_tpu.loader.weights import realize_int4_leaves
    rng = np.random.default_rng(3)
    K, N = 256, 128
    q = rng.integers(0, 16, size=(K, N)).astype(np.uint8)
    packed = (q[:K // 2] | (q[K // 2:] << 4)).view(np.int8)
    params = {"layers": {"wq": {"qweight_packed": jnp.asarray(packed),
                                "scales": jnp.ones((2, N), jnp.float32),
                                "zeros": jnp.zeros((2, N), jnp.float32)}}}
    out = realize_int4_leaves(params)
    leaf = out["layers"]["wq"]
    assert "qweight_packed" not in leaf
    q4 = np.asarray(leaf["qweight4"].astype(jnp.int8))
    np.testing.assert_array_equal(q4, q.astype(np.int8) - 8)
    # zeros shifted by the same -8: dequant (q - z) * s is unchanged
    np.testing.assert_array_equal(np.asarray(leaf["zeros"]), -8.0)
