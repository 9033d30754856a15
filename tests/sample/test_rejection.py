"""Rejection-sampling spec verification (sample/sampler.py spec_draft path):
lossless output distribution and typical-acceptance thresholding.
Reference: aphrodite/modeling/layers/rejection_sampler.py:27,
typical_acceptance_sampler.py:8."""
import numpy as np
import jax.numpy as jnp
import pytest

from aphrodite_tpu.sample.metadata import build_sampling_metadata
from aphrodite_tpu.sample.sampler import sample_tokens
from aphrodite_tpu.sampling_params import SamplingParams

V = 32


def run(logits_row, draft, method, n, temp=1.0, q=None, seed0=0):
    R = n
    logits = jnp.broadcast_to(jnp.asarray(logits_row, jnp.float32),
                              (R, V))
    # distinct seeds per row -> independent draws
    reqs = [(SamplingParams(temperature=temp, seed=seed0 + i, max_tokens=4),
             [1, 2, 3], 3, 0) for i in range(R)]
    smd, flags = build_sampling_metadata(reqs, V, R, base_seed=0)
    out = sample_tokens(
        logits, smd, flags, 0,
        spec_draft=jnp.full((R,), draft, jnp.int32),
        spec_q=(jnp.full((R,), q, jnp.float32) if q is not None else None),
        spec_method=method)
    return np.asarray(out["tokens"])


def test_rejection_is_lossless():
    """Emitted-token distribution == target distribution: accepting the
    draft with prob p(d) and recovering from p\\{d} renormalized composes
    back to exactly p."""
    rng = np.random.RandomState(0)
    logits_row = rng.randn(V) * 1.5
    p = np.exp(logits_row - logits_row.max())
    p /= p.sum()
    draft = int(np.argmax(p))  # pick a high-prob draft
    n = 20000
    toks = run(logits_row, draft, "rejection_sampler", n)
    counts = np.bincount(toks, minlength=V) / n
    # chi-square-ish tolerance on the big bins
    assert abs(counts[draft] - p[draft]) < 0.02, (counts[draft], p[draft])
    big = p > 0.02
    np.testing.assert_allclose(counts[big], p[big], atol=0.02)


def test_rejection_accept_rate_matches_p_over_q():
    rng = np.random.RandomState(1)
    logits_row = rng.randn(V)
    p = np.exp(logits_row - logits_row.max())
    p /= p.sum()
    draft = int(np.argsort(p)[-2])
    n = 8000
    # q = 2*p(d): acceptance should be ~ p/q = 0.5
    toks = run(logits_row, draft, "rejection_sampler", n,
               q=float(2 * p[draft]))
    acc = (toks == draft).mean()
    # accepted emits d; rejected CANNOT emit d (recovery excludes it)
    assert abs(acc - 0.5) < 0.05, acc


def test_typical_acceptance():
    # Near-deterministic target: draft == argmax is always accepted,
    # a low-probability draft is rejected and argmax is emitted.
    logits_row = np.full(V, -4.0)
    logits_row[7] = 6.0
    toks = run(logits_row, 7, "typical_acceptance_sampler", 64)
    assert (toks == 7).all()
    toks = run(logits_row, 3, "typical_acceptance_sampler", 64)
    assert (toks == 7).all()  # rejected -> argmax recovery


def test_greedy_rows_keep_argmax():
    logits_row = np.linspace(0, 3, V)
    toks = run(logits_row, 5, "rejection_sampler", 8, temp=0.0)
    assert (toks == V - 1).all()
