"""Sampler pipeline tests vs hand-computed oracles of the reference math
(SURVEY.md §4.7)."""
import numpy as np
import pytest
import jax.numpy as jnp

from aphrodite_tpu.sample.metadata import build_sampling_metadata
from aphrodite_tpu.sample.sampler import sample_tokens
from aphrodite_tpu.sampling_params import SamplingParams

VOCAB = 32


def run(logits_rows, params_list, toks=None, out_lens=None):
    reqs = []
    for i, p in enumerate(params_list):
        t = toks[i] if toks else [1, 2, 3]
        ol = out_lens[i] if out_lens else 0
        reqs.append((p, t, len(t) - ol, ol))
    md, flags = build_sampling_metadata(reqs, VOCAB, len(params_list))
    out = sample_tokens(jnp.asarray(logits_rows, jnp.float32), md, flags)
    return {k: np.asarray(v) for k, v in out.items()}, flags


def logits_with_top(order):
    """Row of VOCAB logits where `order[i]` has the i-th highest logit."""
    row = np.full((VOCAB,), -10.0, np.float32)
    for rank, tok in enumerate(order):
        row[tok] = 5.0 - rank
    return row


def test_greedy_argmax():
    row = logits_with_top([7, 3, 11])
    out, flags = run([row], [SamplingParams(temperature=0.0)])
    assert not any(flags)
    assert out["tokens"][0] == 7


def test_top_k_restricts_support():
    row = logits_with_top([7, 3, 11, 5])
    seen = set()
    for seed in range(40):
        out, _ = run([row], [SamplingParams(temperature=5.0, top_k=2,
                                            seed=seed)])
        seen.add(int(out["tokens"][0]))
    assert seen <= {7, 3}
    assert len(seen) == 2


def test_top_p_restricts_support():
    row = np.full((VOCAB,), -100.0, np.float32)
    # probs ~ [0.6, 0.3, 0.1]
    row[[4, 9, 14]] = np.log([0.6, 0.3, 0.1])
    seen = set()
    for seed in range(60):
        out, _ = run([row], [SamplingParams(temperature=1.0, top_p=0.7,
                                            seed=seed)])
        seen.add(int(out["tokens"][0]))
    assert seen == {4, 9}


def test_min_p():
    row = np.full((VOCAB,), -100.0, np.float32)
    row[[4, 9, 14]] = np.log([0.6, 0.3, 0.05])
    seen = set()
    for seed in range(60):
        out, _ = run([row], [SamplingParams(temperature=1.0, min_p=0.2,
                                            seed=seed)])
        seen.add(int(out["tokens"][0]))
    assert seen == {4, 9}


def test_seeded_determinism():
    row = np.zeros((VOCAB,), np.float32)
    a, _ = run([row], [SamplingParams(temperature=1.0, seed=42)])
    b, _ = run([row], [SamplingParams(temperature=1.0, seed=42)])
    c, _ = run([row], [SamplingParams(temperature=1.0, seed=43)])
    assert a["tokens"][0] == b["tokens"][0]
    draws = {int(run([row], [SamplingParams(temperature=1.0, seed=s)])[0]
                 ["tokens"][0]) for s in range(8)}
    assert len(draws) > 1


def test_repetition_penalty_oracle():
    row = np.linspace(-1, 1, VOCAB).astype(np.float32)
    toks = [3, 5, 5, 30]  # prompt 3,5; output 5,30 (out_len=2)
    p = SamplingParams(temperature=0.0, repetition_penalty=2.0,
                       frequency_penalty=0.5, presence_penalty=0.25)
    out, flags = run([row], [p], toks=[toks], out_lens=[2])
    assert flags.do_penalties
    # Oracle (reference layers/utils.py:28): rep divides positive logits of
    # seen tokens, freq*count and presence*mask subtract for output tokens.
    expect = row.copy()
    seen = {3, 5, 30}
    out_counts = {5: 1, 30: 1}
    for t in seen:
        expect[t] = expect[t] / 2.0 if expect[t] > 0 else expect[t] * 2.0
    for t, c in out_counts.items():
        expect[t] -= 0.5 * c + 0.25
    assert out["tokens"][0] == int(np.argmax(expect))


def test_no_repeat_ngram():
    # Context ... [8, 9] ... ends with 8 -> token 9 must be banned (n=2).
    toks = [1, 8, 9, 2, 8]
    row = logits_with_top([9, 4])  # 9 would win without the ban
    p = SamplingParams(temperature=0.0, no_repeat_ngram_size=2)
    out, flags = run([row], [p], toks=[toks])
    assert flags.do_ngram
    assert out["tokens"][0] == 4


def test_dry_penalizes_repeat():
    # Context: A B C A B C A B -> "C" (token 12) would extend the repeat.
    A, B, C = 10, 11, 12
    toks = [A, B, C, A, B, C, A, B]
    row = np.zeros((VOCAB,), np.float32)
    row[C] = 1.0
    row[5] = 0.9
    p = SamplingParams(temperature=0.0, dry_multiplier=3.0,
                       dry_allowed_length=1)
    out, flags = run([row], [p], toks=[toks])
    assert flags.do_dry
    assert out["tokens"][0] == 5  # C was penalized below 0.9

    # Without DRY, C wins.
    out2, _ = run([row], [SamplingParams(temperature=0.0)], toks=[toks])
    assert out2["tokens"][0] == C


def test_dry_sequence_breaker_disables():
    A, B, C, BRK = 10, 11, 12, 20
    toks = [A, B, C, A, B, C, A, BRK, B]  # breaker interrupts the tail window
    row = np.zeros((VOCAB,), np.float32)
    row[C] = 1.0
    p = SamplingParams(temperature=0.0, dry_multiplier=3.0,
                       dry_allowed_length=1,
                       dry_sequence_breaker_ids=[BRK])
    out, _ = run([row], [p], toks=[toks])
    assert out["tokens"][0] == C  # window too small -> no penalty


def test_xtc_excludes_top():
    row = np.full((VOCAB,), -100.0, np.float32)
    row[[4, 9, 14]] = np.log([0.5, 0.3, 0.2])
    p = SamplingParams(temperature=0.0, xtc_probability=1.0,
                       xtc_threshold=0.25)
    out, flags = run([row], [p])
    assert flags.do_xtc
    # 0.5 and 0.3 are above threshold; all but the lowest qualifying (0.3)
    # removed -> greedy now picks 9.
    assert out["tokens"][0] == 9


def test_nsigma():
    row = np.zeros((VOCAB,), np.float32)
    row[7] = 10.0
    row[9] = 9.5
    p = SamplingParams(temperature=5.0, nsigma=1.5, seed=0)
    seen = {int(run([row], [p.clone()])[0]["tokens"][0]) for _ in range(1)}
    for seed in range(30):
        pp = SamplingParams(temperature=5.0, nsigma=1.5, seed=seed)
        seen.add(int(run([row], [pp])[0]["tokens"][0]))
    assert seen <= {7, 9}


def test_logit_bias():
    row = np.zeros((VOCAB,), np.float32)
    row[3] = 5.0
    p = SamplingParams(temperature=0.0, logit_bias={17: 100.0})
    out, flags = run([row], [p])
    assert flags.do_logit_bias
    assert out["tokens"][0] == 17


def test_min_tokens_masks_stop():
    row = np.zeros((VOCAB,), np.float32)
    row[6] = 5.0  # stop token would win
    p = SamplingParams(temperature=0.0, min_tokens=3, stop_token_ids=[6],
                       max_tokens=10)
    out, flags = run([row], [p], out_lens=[1])
    assert flags.do_min_tokens
    assert out["tokens"][0] != 6


def test_truncation_samplers_keep_argmax():
    row = np.random.RandomState(0).randn(VOCAB).astype(np.float32)
    for p in (SamplingParams(temperature=0.0, tfs=0.3),
              SamplingParams(temperature=0.0, eta_cutoff=500.0),
              SamplingParams(temperature=0.0, epsilon_cutoff=500.0),
              SamplingParams(temperature=0.0, top_a=0.9),
              SamplingParams(temperature=0.0, smoothing_factor=0.5)):
        out, flags = run([row], [p])
        assert flags.do_advanced
        assert out["tokens"][0] == int(np.argmax(row)), p


def test_typical_oracle():
    """Typical sampling keeps the lowest-surprisal-deviation tokens, NOT
    necessarily the argmax (reference _apply_typical_sampling
    sampler.py:1007)."""
    row = np.random.RandomState(0).randn(VOCAB).astype(np.float32)
    lsm = row - np.log(np.exp(row).sum())
    probs = np.exp(lsm)
    neg_ent = (probs * lsm).sum()
    dev = np.abs(neg_ent - lsm)
    order = np.argsort(dev, kind="stable")
    cum = np.cumsum(probs[order])
    keep_sorted = ~(cum >= 0.3)
    keep_sorted[0] = True
    # The mask applied is over *cumsum >= p* positions (first kept).
    allowed = np.zeros(VOCAB, bool)
    allowed[order[keep_sorted]] = True
    expected = int(np.argmax(np.where(allowed, row, -np.inf)))
    out, _ = run([row], [SamplingParams(temperature=0.0, typical_p=0.3)])
    assert out["tokens"][0] == expected


def test_quadratic_flattens():
    row = np.zeros((VOCAB,), np.float32)
    row[3] = 4.0
    row[5] = 2.0
    p = SamplingParams(temperature=1.0, smoothing_factor=10.0, seed=1)
    # Heavy smoothing pulls everything toward the max; argmax is preserved.
    out, _ = run([row], [SamplingParams(temperature=0.0,
                                        smoothing_factor=10.0)])
    assert out["tokens"][0] == 3


def test_dynatemp_runs():
    row = np.random.RandomState(1).randn(VOCAB).astype(np.float32)
    p = SamplingParams(temperature=1.0, dynatemp_min=0.5, dynatemp_max=1.5,
                       seed=3)
    out, flags = run([row], [p])
    assert flags.do_advanced
    assert 0 <= out["tokens"][0] < VOCAB


def test_skew_runs():
    row = np.random.RandomState(2).randn(VOCAB).astype(np.float32)
    p = SamplingParams(temperature=1.0, skew=2.0, seed=4)
    out, flags = run([row], [p])
    assert flags.do_skew
    assert 0 <= out["tokens"][0] < VOCAB


def test_mixed_batch_isolation():
    """Params of one row must not affect another row."""
    row_a = logits_with_top([7, 3])
    row_b = logits_with_top([9, 4])
    out, _ = run([row_a, row_b],
                 [SamplingParams(temperature=0.0),
                  SamplingParams(temperature=0.0, logit_bias={4: 50.0})])
    assert out["tokens"][0] == 7
    assert out["tokens"][1] == 4


def test_topk_logprobs():
    row = logits_with_top([7, 3, 11])
    reqs = [(SamplingParams(temperature=0.0, logprobs=3), [1], 1, 0)]
    md, flags = build_sampling_metadata(reqs, VOCAB, 1)
    out = sample_tokens(jnp.asarray([row]), md, flags, max_logprobs=3)
    idx = np.asarray(out["topk_indices"][0])
    assert list(idx) == [7, 3, 11]
    vals = np.asarray(out["topk_values"][0])
    assert np.all(np.diff(vals) <= 0)


def test_allowed_token_ids():
    """allowed_token_ids restricts sampling to the listed ids; rows
    without a restriction are untouched."""
    from aphrodite_tpu.sampling_params import SamplingParams as SP
    import numpy as np
    import jax.numpy as jnp
    from aphrodite_tpu.sample.metadata import build_sampling_metadata
    from aphrodite_tpu.sample.sampler import sample_tokens
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, VOCAB), jnp.float32)
    p_restrict = SP(temperature=0.0, allowed_token_ids=[5, 9, 11])
    p_free = SP(temperature=0.0)
    md, flags = build_sampling_metadata(
        [(p_restrict, [1], 1, 0), (p_free, [1], 1, 0)], VOCAB, 2)
    assert flags.do_allowed
    out = sample_tokens(logits, md, flags, 0)
    toks = np.asarray(out["tokens"])
    assert toks[0] in (5, 9, 11)
    assert toks[1] == int(np.argmax(np.asarray(logits)[1]))
    # the restricted row picks the best among the allowed set
    sub = {i: float(np.asarray(logits)[0][i]) for i in (5, 9, 11)}
    assert toks[0] == max(sub, key=sub.get)


def test_sampler_priority_reorders_pipeline():
    """sampler_priority is honored batch-globally (reference reads the
    first seq group's order, sampler.py:318): applying temperature AFTER
    min_p changes which tokens survive the min_p cut for temp > 1."""
    import numpy as np
    import jax.numpy as jnp
    from aphrodite_tpu.sample.metadata import build_sampling_metadata
    from aphrodite_tpu.sample.sampler import sample_tokens
    from aphrodite_tpu.sampling_params import (DEFAULT_SAMPLER_ORDER,
                                               SamplerID,
                                               SamplingParams as SP)
    logits = jnp.asarray([[4.0, 3.0] + [0.0] * (VOCAB - 2)], jnp.float32)
    # min_p=0.5: default order (temp 4.0 first) flattens the gap so token 1
    # SURVIVES min_p; with temperature moved after min_p, the raw gap
    # (e^-1 < 0.5 relative) kills token 1.
    kw = dict(temperature=4.0, min_p=0.5, seed=7, max_tokens=4)
    p_default = SP(**kw)
    order = [i for i in DEFAULT_SAMPLER_ORDER]
    order.remove(SamplerID.TEMPERATURE)
    order.insert(order.index(SamplerID.MIN_P) + 1, SamplerID.TEMPERATURE)
    p_reordered = SP(**kw, sampler_priority=list(order))

    def surviving(p):
        md, flags = build_sampling_metadata([(p, [1], 1, 0)], VOCAB, 1)
        out = sample_tokens(logits, md, flags, max_logprobs=4)
        lp = np.asarray(out["topk_values"])[0]
        return int(np.isfinite(lp).sum())

    assert surviving(p_default) >= 2      # both tokens alive
    assert surviving(p_reordered) == 1    # min_p saw the raw distribution
