"""The full Aphrodite sampler pipeline as vectorized JAX ops.

Behavioral parity with the reference v0 Sampler
(aphrodite/modeling/layers/sampler.py:257-1164): default order
DRY -> penalties -> no-repeat-ngram -> temperature(+dynatemp) -> top-nsigma ->
top-p/top-k -> top-a -> min-p -> TFS -> eta -> epsilon -> typical ->
quadratic -> XTC (temperature_last moves temperature after XTC), then
softmax -> skew -> seeded sample. Every op is self-masking on per-row
parameters; `SamplerFlags` statically gates technique groups so the hot
greedy/top-k/top-p path compiles to a small program.

Known deviations (documented):
- DRY ignores the reference's GPU perf caps `max_occurrences` /
  `early_exit_match_len` (we compute the exact penalty over all occurrences,
  with a static match-length cap of MAX_MATCH).
- `sampler_priority` follows the reference's batch-global semantics (the
  first request's order applies to the batch; one jit specialization per
  distinct order).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from aphrodite_tpu.sample.metadata import SamplerFlags, SamplingMetadata

_TEMPERATURE_MIN = 2e-2
MAX_MATCH = 64  # static cap on DRY / no-repeat-ngram match length
NEG_INF = float("-inf")


# --------------------------------------------------------------------------- #
# token-history machinery shared by DRY and no-repeat-ngram
# --------------------------------------------------------------------------- #
def _suffix_match_lengths(seq: jax.Array, total_len: jax.Array,
                          break_mask: jax.Array
                          ) -> tuple[jax.Array, jax.Array]:
    """For each position j: the length of the longest u such that
    seq[j-i] == seq[end-i] for i=1..u (end = last token index).
    Returns (m_plain, m_break) — the latter additionally stops at sequence
    breakers on the j side (DRY semantics)."""
    R, L = seq.shape
    end = total_len - 1  # [R]
    pos = jnp.arange(L)[None, :]  # [1, L]

    def body(u, carry):
        alive_p, alive_b, m_p, m_b = carry
        tail_idx = jnp.clip(end - u, 0)[:, None]
        tail_tok = jnp.take_along_axis(seq, tail_idx, axis=1)  # [R, 1]
        src_idx = jnp.clip(pos - u, 0)
        src_tok = jnp.take_along_axis(seq, jnp.broadcast_to(src_idx, (R, L)),
                                      axis=1)
        src_brk = jnp.take_along_axis(break_mask,
                                      jnp.broadcast_to(src_idx, (R, L)),
                                      axis=1)
        ok = (src_tok == tail_tok) & (pos - u >= 0) & (end[:, None] - u >= 0)
        alive_p = alive_p & ok
        alive_b = alive_b & ok & ~src_brk
        return alive_p, alive_b, m_p + alive_p, m_b + alive_b

    init = (jnp.ones((R, L), bool), jnp.ones((R, L), bool),
            jnp.zeros((R, L), jnp.int32), jnp.zeros((R, L), jnp.int32))
    _, _, m_plain, m_break = jax.lax.fori_loop(1, MAX_MATCH + 1, body, init)
    return m_plain, m_break


def _apply_dry(logits: jax.Array, md: SamplingMetadata) -> jax.Array:
    """DRY repetition penalty (reference `_apply_dry` sampler.py:745).
    Penalizes tokens that would extend a sequence already seen in context."""
    R, V = logits.shape
    seq, L = md.token_seq, md.token_seq.shape[1]
    end = md.total_len - 1
    pos = jnp.arange(L)[None, :]

    break_mask = (seq[:, :, None] == md.dry_breakers[:, None, :]).any(-1)
    m_plain, m_break = _suffix_match_lengths(seq, md.total_len, break_mask)

    # Window: how far back from the tail matching may extend before a breaker.
    # w = first i in [0, MAX_MATCH] with break at end-i (i=0 => last token is
    # a breaker => DRY disabled for the row).
    i_range = jnp.arange(MAX_MATCH + 1)[None, :]
    tail_idx = jnp.clip(end[:, None] - i_range, 0)
    tail_brk = jnp.take_along_axis(break_mask, tail_idx, axis=1) | \
        (end[:, None] - i_range < 0)
    window = jnp.argmax(tail_brk, axis=1) + \
        jnp.where(tail_brk.any(axis=1), 0, MAX_MATCH + 1)  # [R]

    last_tok = jnp.take_along_axis(seq, jnp.clip(end, 0)[:, None], axis=1)
    range_start = jnp.where(md.dry_range > 0,
                            md.total_len - md.dry_range, 0)[:, None]

    m = jnp.minimum(m_break, (window[:, None] - 1).clip(0))
    is_endpoint = ((seq == last_tok) & (pos < end[:, None])
                   & (pos >= range_start) & (m > 0))
    new_len = jnp.where(is_endpoint, m + 1, 0)
    # Target token: seq[j+1].
    nxt = jnp.take_along_axis(seq, jnp.minimum(pos + 1, L - 1), axis=1)
    targets = jnp.where(is_endpoint, nxt, V)  # V == drop (pad column)

    ngram_lens = jnp.zeros((R, V + 1), jnp.int32)
    ngram_lens = ngram_lens.at[jnp.arange(R)[:, None], targets].max(
        new_len, mode="drop")
    ngram_lens = ngram_lens[:, :V]

    row_on = ((md.dry_multiplier > 0) & (window > md.dry_allowed)
              & (md.total_len >= 2))[:, None]
    pen = md.dry_multiplier[:, None] * \
        md.dry_base[:, None] ** (ngram_lens - md.dry_allowed[:, None])
    return jnp.where(row_on & (ngram_lens > 0), logits - pen, logits)


def _apply_no_repeat_ngram(logits: jax.Array,
                           md: SamplingMetadata) -> jax.Array:
    """Ban tokens completing an n-gram already present in context
    (reference `_apply_no_repeat_ngram` sampler.py:850)."""
    R, V = logits.shape
    seq, L = md.token_seq, md.token_seq.shape[1]
    end = md.total_len - 1
    pos = jnp.arange(L)[None, :]
    no_break = jnp.zeros_like(seq, dtype=bool)
    m_plain, _ = _suffix_match_lengths(seq, md.total_len, no_break)

    n = md.no_repeat_ngram[:, None]
    last_tok = jnp.take_along_axis(seq, jnp.clip(end, 0)[:, None], axis=1)
    # (n-1)-suffix match ending at j: seq[j]==last and m_plain[j] >= n-2.
    hit = ((seq == last_tok) & (m_plain >= n - 2) & (pos < end[:, None])
           & (pos >= n - 2))
    nxt = jnp.take_along_axis(seq, jnp.minimum(pos + 1, L - 1), axis=1)
    targets = jnp.where(hit, nxt, V)
    banned = jnp.zeros((R, V + 1), bool)
    banned = banned.at[jnp.arange(R)[:, None], targets].max(True, mode="drop")
    banned = banned[:, :V]
    row_on = ((md.no_repeat_ngram > 0)
              & (md.total_len >= md.no_repeat_ngram))[:, None]
    return jnp.where(row_on & banned, NEG_INF, logits)


def _apply_penalties(logits: jax.Array, md: SamplingMetadata) -> jax.Array:
    """Presence/frequency/repetition (reference layers/utils.py:28)."""
    R, V = logits.shape
    seq, L = md.token_seq, md.token_seq.shape[1]
    pos = jnp.arange(L)[None, :]
    in_prompt = pos < md.prompt_len[:, None]
    in_output = (pos >= md.prompt_len[:, None]) & \
        (pos < md.total_len[:, None])

    rows = jnp.arange(R)[:, None]
    ones = jnp.ones_like(seq)
    prompt_counts = jnp.zeros((R, V + 1), jnp.int32).at[
        rows, jnp.where(in_prompt, seq, V)].add(ones, mode="drop")[:, :V]
    output_counts = jnp.zeros((R, V + 1), jnp.int32).at[
        rows, jnp.where(in_output, seq, V)].add(ones, mode="drop")[:, :V]

    prompt_mask = prompt_counts > 0
    output_mask = output_counts > 0
    rep = md.repetition_penalty[:, None]
    rep = jnp.where(prompt_mask | output_mask, rep, 1.0)
    logits = jnp.where(logits > 0, logits / rep, logits * rep)
    logits = logits - md.frequency_penalty[:, None] * output_counts
    logits = logits - md.presence_penalty[:, None] * output_mask
    return logits


# --------------------------------------------------------------------------- #
# temperature & truncation samplers
# --------------------------------------------------------------------------- #
def _entropy(logits: jax.Array) -> jax.Array:
    lsm = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(lsm)
    plogp = jnp.where(jnp.isfinite(lsm), p * lsm, 0.0)
    return -jnp.sum(plogp, axis=-1)


def _apply_temperature(logits, md: SamplingMetadata, dynatemp: bool):
    temps = md.temperature
    if dynatemp:
        ent = _entropy(logits)
        max_ent = jnp.log(jnp.sum(jnp.isfinite(logits), axis=-1)
                          .astype(jnp.float32))
        norm_ent = jnp.where(max_ent > 0, ent / max_ent, 0.0)
        dyn = md.dynatemp_min + (md.dynatemp_max - md.dynatemp_min) * \
            norm_ent ** md.dynatemp_exp
        dyn_on = (md.dynatemp_min != 0) | (md.dynatemp_max != 0)
        temps = jnp.where(dyn_on, dyn, temps)
    temps = jnp.where(jnp.isnan(temps) | (temps <= _TEMPERATURE_MIN),
                      _TEMPERATURE_MIN, temps)
    # Low temps shift range to [-inf, 1] to avoid fp saturation
    # (reference _apply_temperatures sampler.py:664).
    mx = jnp.max(logits, axis=-1, keepdims=True)
    logits = jnp.where((temps < 0.1)[:, None], logits - (mx - 1), logits)
    return logits / temps[:, None]


def _unsort(sorted_vals, sort_idx):
    R = sorted_vals.shape[0]
    out = jnp.empty_like(sorted_vals)
    return out.at[jnp.arange(R)[:, None], sort_idx].set(sorted_vals)


def _apply_top_k_top_p(logits, md: SamplingMetadata):
    R, V = logits.shape
    ls = jnp.sort(logits, axis=-1)  # ascending
    idx = jnp.argsort(logits, axis=-1)
    k = jnp.where(md.top_k > 0, md.top_k, V).astype(jnp.int32)
    kth = jnp.take_along_axis(ls, (V - k)[:, None], axis=1)
    ls = jnp.where(ls < kth, NEG_INF, ls)
    probs = jax.nn.softmax(ls, axis=-1)
    csum = jnp.cumsum(probs, axis=-1)
    mask = csum <= (1.0 - md.top_p)[:, None]
    mask = mask.at[:, -1].set(False)  # keep at least one
    ls = jnp.where(mask, NEG_INF, ls)
    return _unsort(ls, idx)


def _apply_min_p(logits, md):
    probs = jax.nn.softmax(logits, axis=-1)
    top = jnp.max(probs, axis=-1, keepdims=True)
    remove = probs < md.min_p[:, None] * top
    return jnp.where(remove & (md.min_p > 0)[:, None], NEG_INF, logits)


def _apply_top_a(logits, md):
    probs = jax.nn.softmax(logits, axis=-1)
    top = jnp.max(probs, axis=-1, keepdims=True)
    remove = probs < (top * top * md.top_a[:, None])
    return jnp.where(remove & (md.top_a > 0)[:, None], NEG_INF, logits)


def _apply_tfs(logits, md):
    R, V = logits.shape
    ls = -jnp.sort(-logits, axis=-1)  # descending
    idx = jnp.argsort(-logits, axis=-1)
    probs = jax.nn.softmax(ls, axis=-1)
    d2 = jnp.abs(jnp.diff(jnp.diff(probs, axis=-1), axis=-1))
    d2n = d2 / jnp.maximum(jnp.sum(d2, axis=-1, keepdims=True), 1e-20)
    cdf = jnp.cumsum(d2n, axis=-1)
    inner = cdf > md.tfs[:, None]
    mask = jnp.concatenate(
        [jnp.zeros((R, 1), bool), inner, jnp.ones((R, 1), bool)], axis=-1)
    ls = jnp.where(mask & (md.tfs < 1.0)[:, None], NEG_INF, ls)
    return _unsort(ls, idx)


def _keep_argmax(mask, probs):
    top = jnp.argmax(probs, axis=-1)
    return mask.at[jnp.arange(mask.shape[0]), top].set(False)


def _apply_eta(logits, md):
    lsm = jax.nn.log_softmax(logits, axis=-1)
    probs = jnp.exp(lsm)
    neg_ent = -_entropy(logits)
    eps = jnp.minimum(md.eta_cutoff,
                      jnp.sqrt(md.eta_cutoff) * jnp.exp(neg_ent))[:, None]
    mask = _keep_argmax(probs < eps, probs)
    return jnp.where(mask & (md.eta_cutoff > 0)[:, None], NEG_INF, logits)


def _apply_epsilon(logits, md):
    probs = jax.nn.softmax(logits, axis=-1)
    mask = _keep_argmax(probs < md.epsilon_cutoff[:, None], probs)
    return jnp.where(mask & (md.epsilon_cutoff > 0)[:, None], NEG_INF, logits)


def _apply_typical(logits, md):
    R, V = logits.shape
    lsm = jax.nn.log_softmax(logits, axis=-1)
    probs = jnp.exp(lsm)
    neg_ent = -_entropy(logits)[:, None]
    dev = jnp.abs(neg_ent - jnp.where(jnp.isfinite(lsm), lsm, -1e30))
    idx = jnp.argsort(dev, axis=-1)  # ascending deviation
    reordered = jnp.take_along_axis(probs, idx, axis=1)
    mask_sorted = jnp.cumsum(reordered, axis=-1) >= md.typical_p[:, None]
    mask_sorted = mask_sorted.at[:, 0].set(False)
    mask = _unsort(mask_sorted, idx)
    return jnp.where(mask & (md.typical_p < 1.0)[:, None], NEG_INF, logits)


def _apply_quadratic(logits, md):
    sf = md.smoothing_factor[:, None]
    sc = md.smoothing_curve[:, None]
    k = sf * (3 - sc) / 2
    s = sf * (sc - 1) / 2
    mx = jnp.max(logits, axis=-1, keepdims=True)
    diff = logits - mx
    corr = diff - diff * diff * (s * diff - k)
    corr = jnp.where(jnp.isnan(corr), 0.0, corr)
    return jnp.where((sf != 0), logits - corr, logits)


def _apply_xtc(logits, md, u):
    R, V = logits.shape
    apply_row = (u < md.xtc_probability) & (md.xtc_probability > 0)
    probs = jax.nn.softmax(logits, axis=-1)
    sp = -jnp.sort(-probs, axis=-1)
    sidx = jnp.argsort(-probs, axis=-1)
    above = sp[:, 1:] >= md.xtc_threshold[:, None]
    count = jnp.sum(above, axis=-1)  # tokens to remove from the top
    mask_sorted = jnp.arange(V)[None, :] < count[:, None]
    mask = _unsort(mask_sorted, sidx)
    return jnp.where(mask & apply_row[:, None], NEG_INF, logits)


def _apply_nsigma(logits, md):
    # torch.std default: unbiased (ddof=1).
    std = jnp.std(logits, axis=-1, keepdims=True, ddof=1)
    thr = jnp.max(logits, axis=-1, keepdims=True) - md.nsigma[:, None] * std
    return jnp.where((logits < thr) & (md.nsigma > 0)[:, None], NEG_INF,
                     logits)


def _apply_min_tokens(logits, md, step_offset):
    R, V = logits.shape
    active = (md.out_len + step_offset) < md.min_tokens
    tgt = jnp.where(active[:, None], md.stop_tokens, -1)
    tgt = jnp.where(tgt < 0, V, tgt)
    mask = jnp.zeros((R, V + 1), bool).at[
        jnp.arange(R)[:, None], tgt].set(True, mode="drop")[:, :V]
    return jnp.where(mask, NEG_INF, logits)


def _apply_allowed_tokens(logits, md):
    """allowed_token_ids: rows with a restriction keep ONLY the listed
    token logits (everything else -inf); unrestricted rows pass through
    (reference SamplingParams.allowed_token_ids semantics)."""
    R, V = logits.shape
    allowed = md.allowed_tokens
    has = jnp.any(allowed >= 0, axis=1)
    vals = jnp.take_along_axis(logits, jnp.clip(allowed, 0), axis=1)
    tgt = jnp.where(allowed < 0, V, allowed)  # pad -> OOB drop
    masked = jnp.full_like(logits, -jnp.inf).at[
        jnp.arange(R)[:, None], tgt].set(vals, mode="drop")
    return jnp.where(has[:, None], masked, logits)


def _apply_logit_bias(logits, md):
    R, V = logits.shape
    tgt = jnp.where(md.bias_tokens < 0, V, md.bias_tokens)
    return jnp.pad(logits, ((0, 0), (0, 1))).at[
        jnp.arange(R)[:, None], tgt].add(md.bias_values,
                                         mode="drop")[:, :V]


# --------------------------------------------------------------------------- #
# the pipeline
# --------------------------------------------------------------------------- #
@functools.partial(jax.jit, static_argnames=("flags", "max_logprobs",
                                             "spec_method"))
def sample_tokens(
    logits: jax.Array,            # [R, V] float32
    md: SamplingMetadata,
    flags: SamplerFlags,
    max_logprobs: int = 0,
    step_offset: jax.Array | int = 0,
    spec_draft: jax.Array | None = None,   # [R] draft token per row; -1=none
    # [R] draft proposal prob q(d); None = one-hot q (q(d)=1). Every
    # built-in proposer (ngram, greedy draft model, EAGLE/Medusa/MLP
    # heads, MTP) proposes DETERMINISTICALLY, so q is one-hot and
    # min(1, p/q) == p — None is exact AND acceptance-optimal for them.
    # A stochastic proposer must thread its per-token q here or its
    # acceptance rate drops below the reference RejectionSampler's.
    spec_q: jax.Array | None = None,
    spec_method: str | None = None,
    posterior_threshold: float = 0.09,
    posterior_alpha: float = 0.3,
) -> dict:
    """Run the sampler pipeline; returns dict with:
    tokens [R] int32, logprob [R] f32 (of the chosen token),
    and when max_logprobs>0: topk_values/topk_indices [R, max_logprobs].

    step_offset advances the per-row RNG counter (used by multi-step decode,
    where the same metadata serves several consecutive steps in-graph).

    Speculative verification rows (spec_draft[r] >= 0, temperature>0):
    instead of an independent sample, the row runs lossless rejection
    sampling against the draft token — accept with prob min(1, p(d)/q(d)),
    else a residual recovery sample with d excluded (reference
    aphrodite/modeling/layers/rejection_sampler.py:27; exact for the
    deterministic proposers where q is one-hot). spec_method
    "typical_acceptance_sampler" uses the entropy-thresholded typical
    acceptance instead (reference typical_acceptance_sampler.py:8).
    Greedy rows keep argmax; the host's compare loop implements their
    accept/reject exactly."""
    logits = logits.astype(jnp.float32)

    if flags.do_allowed:
        logits = _apply_allowed_tokens(logits, md)
    if flags.do_logit_bias:
        logits = _apply_logit_bias(logits, md)
    if flags.do_min_tokens:
        logits = _apply_min_tokens(logits, md, step_offset)
    if flags.do_dry:
        logits = _apply_dry(logits, md)
    if flags.do_penalties:
        logits = _apply_penalties(logits, md)
    if flags.do_ngram:
        logits = _apply_no_repeat_ngram(logits, md)

    # Per-row keys derived fully in-graph: seeded requests get a
    # reproducible stream keyed by their output position.
    counters = md.out_len + step_offset
    keys = jax.vmap(
        lambda s, c: jax.random.fold_in(
            jax.random.PRNGKey(s.astype(jnp.int32)), c))(md.seeds, counters)
    key_xtc = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)
    key_sample = jax.vmap(lambda k: jax.random.fold_in(k, 2))(keys)

    # Technique application order: default pipeline, or the batch's
    # sampler_priority (the reference reads it from the FIRST seq group
    # and applies it batch-wide, aphrodite/modeling/layers/sampler.py:318;
    # here it rides SamplerFlags as a static tuple — one jit
    # specialization per distinct order in traffic).
    from aphrodite_tpu.sampling_params import SamplerID as _SID
    stages = {
        _SID.TEMPERATURE: lambda lg: (
            _apply_temperature(lg, md, flags.do_advanced)
            if not flags.all_greedy else lg),
        _SID.TOP_NSIGMA: lambda lg: (_apply_nsigma(lg, md)
                                     if flags.do_advanced else lg),
        _SID.TOP_K: lambda lg: (_apply_top_k_top_p(lg, md)
                                if flags.do_top_k_p else lg),
        _SID.TOP_P: lambda lg: lg,  # fused with TOP_K above
        _SID.TOP_A: lambda lg: (_apply_top_a(lg, md)
                                if flags.do_advanced else lg),
        _SID.MIN_P: lambda lg: (_apply_min_p(lg, md)
                                if flags.do_min_p else lg),
        _SID.TFS: lambda lg: (_apply_tfs(lg, md)
                              if flags.do_advanced else lg),
        _SID.ETA: lambda lg: (_apply_eta(lg, md)
                              if flags.do_advanced else lg),
        _SID.EPSILON: lambda lg: (_apply_epsilon(lg, md)
                                  if flags.do_advanced else lg),
        _SID.TYPICAL: lambda lg: (_apply_typical(lg, md)
                                  if flags.do_advanced else lg),
        _SID.QUADRATIC: lambda lg: (_apply_quadratic(lg, md)
                                    if flags.do_advanced else lg),
        _SID.XTC: lambda lg: _xtc_stage(lg),
        _SID.DRY: lambda lg: lg,          # token-history stages ran above
        _SID.PENALTIES: lambda lg: lg,
        _SID.NO_REPEAT_NGRAM: lambda lg: lg,
        _SID.MIN_TOKENS: lambda lg: lg,
    }

    def _xtc_stage(lg):
        if not flags.do_xtc:
            return lg
        u = jax.vmap(lambda k: jax.random.uniform(k, ()))(key_xtc)
        return _apply_xtc(lg, md, u)

    order = getattr(flags, "order", ()) or ()
    if order:
        for sid in order:
            logits = stages[_SID(sid)](logits)
    else:
        if not flags.all_greedy and not flags.do_temp_last:
            logits = _apply_temperature(logits, md, flags.do_advanced)
        if flags.do_advanced:
            logits = _apply_nsigma(logits, md)
        if flags.do_top_k_p:
            logits = _apply_top_k_top_p(logits, md)
        if flags.do_advanced:
            logits = _apply_top_a(logits, md)
        if flags.do_min_p:
            logits = _apply_min_p(logits, md)
        if flags.do_advanced:
            logits = _apply_tfs(logits, md)
            logits = _apply_eta(logits, md)
            logits = _apply_epsilon(logits, md)
            logits = _apply_typical(logits, md)
            logits = _apply_quadratic(logits, md)
        if flags.do_xtc:
            logits = _xtc_stage(logits)
        if flags.do_temp_last:
            logits = _apply_temperature(logits, md, flags.do_advanced)

    need_lp = flags.need_logprobs or max_logprobs > 0
    if flags.all_greedy:
        tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        logprobs_final = (jax.nn.log_softmax(logits, axis=-1)
                          if need_lp or flags.do_skew else None)
    else:
        logprobs_final = jax.nn.log_softmax(logits, axis=-1)
        if flags.do_skew:
            probs = jnp.exp(logprobs_final)
            cum = jnp.cumsum(probs, axis=-1)
            cum = cum ** jnp.exp(md.skew)[:, None]
            probs = jnp.diff(cum, axis=-1,
                             prepend=jnp.zeros_like(cum[:, :1]))
            logprobs_final = jnp.log(jnp.maximum(probs, 1e-30))

        # Gumbel-max sampling on the final distribution; greedy rows take
        # argmax of the *pre-randomness* logits.
        gumbel = jax.vmap(
            lambda k: jax.random.gumbel(
                k, logprobs_final.shape[-1:]))(key_sample)
        noisy = jnp.where(jnp.isfinite(logprobs_final),
                          logprobs_final + gumbel, NEG_INF)
        sampled = jnp.argmax(noisy, axis=-1)
        greedy_tok = jnp.argmax(logits, axis=-1)
        tokens = jnp.where(md.is_greedy, greedy_tok,
                           sampled).astype(jnp.int32)

        if spec_draft is not None and spec_method is not None:
            R, V = logprobs_final.shape
            is_verify = spec_draft >= 0
            d = jnp.clip(spec_draft, 0)
            p = jnp.exp(jnp.where(jnp.isfinite(logprobs_final),
                                  logprobs_final, NEG_INF))
            p_d = jnp.take_along_axis(p, d[:, None], axis=1)[:, 0]
            if spec_method == "typical_acceptance_sampler":
                ent = -jnp.sum(jnp.where(jnp.isfinite(logprobs_final),
                                         p * logprobs_final, 0.0), axis=-1)
                thr = jnp.minimum(posterior_threshold,
                                  jnp.exp(-ent) * posterior_alpha)
                accept = p_d > thr
                recovery = jnp.argmax(logprobs_final, axis=-1)
            else:  # rejection_sampler
                key_u = jax.vmap(
                    lambda k: jax.random.fold_in(k, 3))(keys)
                u = jax.vmap(lambda k: jax.random.uniform(k, ()))(key_u)
                q_d = (jnp.maximum(spec_q, 1e-10) if spec_q is not None
                       else jnp.float32(1.0))
                accept = u < p_d / q_d
                # Residual recovery: for one-hot q, (p - q)+ renormalized
                # == p with d excluded; sample via Gumbel-argmax.
                cols = jnp.arange(V, dtype=jnp.int32)[None, :]
                masked = jnp.where(cols == d[:, None], NEG_INF,
                                   logprobs_final)
                key_r = jax.vmap(
                    lambda k: jax.random.fold_in(k, 4))(keys)
                g2 = jax.vmap(
                    lambda k: jax.random.gumbel(k, (V,)))(key_r)
                recovery = jnp.argmax(
                    jnp.where(jnp.isfinite(masked), masked + g2, NEG_INF),
                    axis=-1)
            spec_tok = jnp.where(accept, d, recovery).astype(jnp.int32)
            tokens = jnp.where(is_verify & ~md.is_greedy, spec_tok, tokens)

    if logprobs_final is not None:
        chosen_lp = jnp.take_along_axis(logprobs_final, tokens[:, None],
                                        axis=1)[:, 0]
    else:
        chosen_lp = jnp.zeros(tokens.shape, jnp.float32)
    out = {"tokens": tokens, "logprob": chosen_lp}
    if max_logprobs > 0:
        vals, idxs = jax.lax.top_k(logprobs_final, max_logprobs)
        out["topk_values"] = vals
        out["topk_indices"] = idxs
    return out
