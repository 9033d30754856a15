"""Grouped (sorted-token ragged GEMM) MoE vs the dense scan-over-experts
path: numerical equivalence and FLOP scaling with top_k rather than E."""
import jax
import jax.numpy as jnp
import numpy as np

from aphrodite_tpu.models.moe_common import (_grouped_moe, moe_combine,
                                             softmax_topk_routing)


def silu_mul(g, u):
    return jax.nn.silu(g) * u


def make_case(T, E, H=32, I=48, k=2, seed=0):
    rng = np.random.RandomState(seed)
    h = jnp.asarray(rng.randn(T, H), jnp.float32) * 0.3
    lp = {
        "we_gate": jnp.asarray(rng.randn(E, H, I), jnp.float32) * 0.2,
        "we_up": jnp.asarray(rng.randn(E, H, I), jnp.float32) * 0.2,
        "we_down": jnp.asarray(rng.randn(E, I, H), jnp.float32) * 0.2,
    }
    router = jnp.asarray(rng.randn(H, E), jnp.float32)
    topi, topw = softmax_topk_routing(h, router, k, norm_topk=True)
    return h, lp, topi, topw


def test_grouped_matches_scan():
    T, E = 64, 8
    h, lp, topi, topw = make_case(T, E)
    got = _grouped_moe(h, lp, silu_mul, topi,
                       topw.astype(h.dtype), E)
    # dense scan reference (force the scan path with a tiny T threshold)
    want = moe_combine(h[:4], lp, silu_mul, topi[:4], topw[:4],
                       num_experts=E)
    np.testing.assert_allclose(np.asarray(got[:4]), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_moe_combine_routes_to_grouped():
    """moe_combine picks the grouped path for prefill-sized batches and the
    result matches the expert-scan computed on the same inputs."""
    T, E = 128, 8
    h, lp, topi, topw = make_case(T, E, seed=1)
    got = moe_combine(h, lp, silu_mul, topi, topw, num_experts=E)

    def scan_ref(h, lp, topi, topw):
        acc = np.zeros_like(np.asarray(h))
        for e in range(E):
            y = silu_mul(h @ lp["we_gate"][e], h @ lp["we_up"][e]) \
                @ lp["we_down"][e]
            gate = np.where(np.asarray(topi) == e, np.asarray(topw),
                            0.0).sum(-1)
            acc += gate[:, None] * np.asarray(y)
        return acc

    np.testing.assert_allclose(np.asarray(got), scan_ref(h, lp, topi, topw),
                               rtol=1e-4, atol=1e-4)


def test_grouped_gmm_kernel_matches_scan(monkeypatch):
    """The megablox grouped-GEMM path (interpret mode) — the kernel whose
    FLOPs scale with T*top_k instead of T*E — matches the expert scan."""
    monkeypatch.setenv("APHRODITE_PALLAS_INTERPRET", "1")
    T, E = 64, 8
    h, lp, topi, topw = make_case(T, E, seed=2)
    got = _grouped_moe(h, lp, silu_mul, topi, topw.astype(h.dtype), E)

    acc = np.zeros_like(np.asarray(h))
    for e in range(E):
        y = silu_mul(h @ lp["we_gate"][e], h @ lp["we_up"][e]) \
            @ lp["we_down"][e]
        gate = np.where(np.asarray(topi) == e, np.asarray(topw), 0.0).sum(-1)
        acc += gate[:, None] * np.asarray(y)
    np.testing.assert_allclose(np.asarray(got), acc, rtol=1e-4, atol=1e-4)
