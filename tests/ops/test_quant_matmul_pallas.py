"""Pallas fused dequant GEMMs (interpret mode) vs numpy oracles."""
import numpy as np
import pytest
import jax.numpy as jnp

from aphrodite_tpu.ops.quant_matmul_pallas import (w4a16_matmul_pallas,
                                                   w8a16_matmul_pallas)

RS = np.random.RandomState(0)


@pytest.mark.parametrize("M,K,N,bn,bk", [
    (8, 64, 128, 64, 32),
    (32, 256, 192, 128, 128),
    (5, 128, 64, 512, 512),  # blocks larger than dims
])
def test_w8a16_pallas(M, K, N, bn, bk):
    x = RS.randn(M, K).astype(np.float32)
    q = RS.randint(-127, 127, (K, N)).astype(np.int8)
    s = (RS.rand(N) * 0.1).astype(np.float32)
    got = np.asarray(w8a16_matmul_pallas(
        jnp.asarray(x), jnp.asarray(q), jnp.asarray(s),
        block_n=bn, block_k=bk, interpret=True))
    exp = (x @ q.astype(np.float32)) * s[None, :]
    np.testing.assert_allclose(got, exp, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("M,K,N,group,bn,bk", [
    (8, 128, 64, 32, 64, 64),
    (16, 256, 128, 64, 128, 128),
    (4, 64, 96, 64, 512, 512),  # single group == K
])
def test_w4a16_pallas(M, K, N, group, bn, bk):
    G = K // group
    x = RS.randn(M, K).astype(np.float32)
    q = RS.randint(0, 16, (K, N)).astype(np.int8)
    s = (RS.rand(G, N) * 0.1).astype(np.float32)
    z = RS.randint(0, 16, (G, N)).astype(np.float32)
    got = np.asarray(w4a16_matmul_pallas(
        jnp.asarray(x), jnp.asarray(q), jnp.asarray(s), jnp.asarray(z),
        block_n=bn, block_k=bk, interpret=True))
    wd = ((q.reshape(G, group, N).astype(np.float32) - z[:, None, :])
          * s[:, None, :]).reshape(K, N)
    np.testing.assert_allclose(got, x @ wd, rtol=5e-3, atol=5e-3)


def test_w4a16_packed_matches_unpacked():
    """True-4-bit packed kernel (global-half nibble packing) vs the
    unpacked reference math, interpret mode."""
    import numpy as np
    import jax.numpy as jnp
    from aphrodite_tpu.ops.quant_matmul_pallas import (
        w4a16_packed_matmul_pallas)
    rng = np.random.RandomState(0)
    M, K, N, group = 8, 2048, 256, 128
    G = K // group
    qu = rng.randint(0, 16, (K, N)).astype(np.int8)
    scales = rng.rand(G, N).astype(np.float32) * 0.05 + 0.01
    zeros = rng.randint(0, 16, (G, N)).astype(np.float32)
    x = jnp.asarray(rng.randn(M, K), jnp.float32)

    lo = qu[:K // 2].astype(np.uint8)
    hi = qu[K // 2:].astype(np.uint8)
    qp = jnp.asarray((lo | (hi << 4)).view(np.int8))

    got = w4a16_packed_matmul_pallas(x, qp, jnp.asarray(scales),
                                     jnp.asarray(zeros), block_k=2048,
                                     block_n=128, interpret=True)
    wf = (qu.astype(np.float32).reshape(G, group, N)
          - zeros[:, None, :]) * scales[:, None, :]
    ref = np.asarray(x) @ wf.reshape(K, N)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-2, atol=2e-2)
