"""C host-op kernels vs their NumPy/Python references (csrc/hostops.c)."""
import numpy as np
import pytest

from aphrodite_tpu._native import fill_slots, get_lib, ngram_propose


pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="no C compiler available")


def test_fill_slots_matches_python():
    rng = np.random.RandomState(0)
    for _ in range(20):
        bs = int(rng.choice([8, 16, 32]))
        n_blocks = rng.randint(1, 20)
        block_ids = rng.randint(0, 500, n_blocks).astype(np.int32)
        start = rng.randint(0, n_blocks * bs // 2)
        n = rng.randint(0, n_blocks * bs - start)
        t0 = rng.randint(0, 8)
        got = np.full((t0 + n + 4,), -1, np.int32)
        fill_slots(got, t0, start, n, block_ids, bs)
        exp = np.full_like(got, -1)
        for j in range(n):
            p = start + j
            exp[t0 + j] = block_ids[p // bs] * bs + p % bs
        np.testing.assert_array_equal(got, exp)


def test_ngram_matches_python():
    from aphrodite_tpu.spec_decode.ngram import NgramProposer

    def py_propose(tokens, min_n, max_n, k):
        L = len(tokens)
        if L < min_n + 1:
            return []
        arr = np.asarray(tokens, np.int64)
        for n in range(min(max_n, L - 1), min_n - 1, -1):
            suffix = arr[L - n:]
            windows = np.lib.stride_tricks.sliding_window_view(
                arr[:L - 1], n)
            matches = np.nonzero((windows == suffix).all(axis=1))[0]
            if len(matches):
                start = int(matches[-1]) + n
                draft = arr[start:start + k]
                if len(draft):
                    return [int(t) for t in draft]
        return []

    rng = np.random.RandomState(1)
    for _ in range(200):
        L = rng.randint(1, 60)
        tokens = rng.randint(0, 6, L).tolist()  # small vocab -> matches
        min_n, max_n, k = 1, rng.randint(1, 5), rng.randint(1, 5)
        got = ngram_propose(np.asarray(tokens, np.int32), min_n, max_n, k)
        exp = py_propose(tokens, min_n, max_n, k)
        assert got == exp, (tokens, min_n, max_n, k)


def test_work_items_match_python():
    from aphrodite_tpu.attention import metadata as M
    rng = np.random.RandomState(2)
    for _ in range(20):
        R = rng.randint(1, 6)
        R_pad = 8
        block_q = int(rng.choice([4, 8, 16]))
        seg_starts = np.zeros((R_pad,), np.int32)
        seg_counts = np.zeros((R_pad,), np.int32)
        seq_lens = np.zeros((R_pad,), np.int32)
        t = 0
        for r in range(R):
            t = (t + 7) // 8 * 8
            seg_starts[r] = t
            seg_counts[r] = rng.randint(1, 20)
            t += seg_counts[r]
            seq_lens[r] = seg_counts[r] + rng.randint(0, 30)
        T_pad = max(64, (t + 63) // 64 * 64)
        got = M.build_work_items(seg_starts, seg_counts, seq_lens, R,
                                 T_pad, block_q, R_pad)
        # Force the python path by hiding the lib.
        import aphrodite_tpu._native as nat
        lib, nat._lib = nat._lib, None
        try:
            exp = M.build_work_items(seg_starts, seg_counts, seq_lens, R,
                                     T_pad, block_q, R_pad)
        finally:
            nat._lib = lib
        for key in exp:
            np.testing.assert_array_equal(got[key], exp[key], err_msg=key)


def test_platform_abstraction():
    """Platform registry (reference platforms/interface.py): detection,
    spec-sheet capabilities, OOT registration."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from aphrodite_tpu.platforms import (Platform, current_platform,
                                         register_platform, _REGISTRY,
                                         _TPU_GENERATIONS)
    p = current_platform(refresh=True)
    assert p.is_cpu and not p.is_tpu
    v5e = _TPU_GENERATIONS["v5e"]
    assert v5e.hbm_gbps == 819.0 and v5e.supports_native_int4
    assert _TPU_GENERATIONS["v6e"].supports_native_fp8_matmul
    register_platform("npu-x", Platform("npu-x", "NPU X", True, "x1",
                                        500.0, 100.0))
    assert _REGISTRY["npu-x"].hbm_gbps == 500.0
