"""Batched sampling metadata: per-request params packed into device arrays.

TPU analog of the reference's SamplingTensors
(aphrodite/modeling/sampling_metadata.py:899-ish "from_sampling_metadata"):
every sampler technique reads a per-row parameter vector and is self-masking
(disabled rows see an identity transform), so ONE compiled sampler program
serves any mix of per-request settings. A small static `SamplerFlags` tuple
gates whole technique groups so the common fast path (greedy/temp/top-k/p)
compiles to a tiny program.
"""
from __future__ import annotations

from dataclasses import dataclass, fields
from typing import NamedTuple, Optional, Sequence

import jax
import numpy as np

from aphrodite_tpu.sampling_params import SamplingParams, SamplingType
from aphrodite_tpu.utils import next_power_of_2

MAX_BREAKERS = 16
MAX_STOP_TOKENS = 16
MAX_LOGIT_BIAS = 32
MAX_ALLOWED_TOKENS = 64


class SamplerFlags(NamedTuple):
    """Static (compile-time) gates. One jit specialization per combination
    actually seen in traffic — typically 2-3. The hot greedy path compiles to
    argmax only — no vocab sort, no gumbel, no log_softmax."""
    do_top_k_p: bool = False     # full-vocab sort — the expensive one
    do_min_p: bool = False
    all_greedy: bool = True      # skip RNG + gumbel entirely
    need_logprobs: bool = False  # compute log_softmax + chosen logprob
    do_penalties: bool = False
    do_dry: bool = False
    do_ngram: bool = False
    # top-a / tfs / eta / epsilon / typical / quadratic / nsigma / dynatemp
    do_advanced: bool = False
    do_xtc: bool = False
    do_skew: bool = False
    do_temp_last: bool = False
    do_min_tokens: bool = False
    do_logit_bias: bool = False
    do_allowed: bool = False
    # Batch-global sampler_priority (static tuple of SamplerID ints);
    # () = default pipeline order.
    order: tuple = ()


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SamplingMetadata:
    # -- token history (only populated when penalties/dry/ngram active) ------
    token_seq: jax.Array      # [R, L] int32, padded with vocab_size
    prompt_len: jax.Array     # [R] int32
    total_len: jax.Array      # [R] int32
    # -- per-row parameters --------------------------------------------------
    temperature: jax.Array    # [R] f32 (1.0 for greedy rows; see is_greedy)
    dynatemp_min: jax.Array
    dynatemp_max: jax.Array
    dynatemp_exp: jax.Array
    top_p: jax.Array
    top_k: jax.Array          # [R] int32 (0 => disabled)
    top_a: jax.Array
    min_p: jax.Array
    tfs: jax.Array
    eta_cutoff: jax.Array     # already scaled to probability units
    epsilon_cutoff: jax.Array
    typical_p: jax.Array
    smoothing_factor: jax.Array
    smoothing_curve: jax.Array
    xtc_threshold: jax.Array
    xtc_probability: jax.Array
    nsigma: jax.Array
    skew: jax.Array
    presence_penalty: jax.Array
    frequency_penalty: jax.Array
    repetition_penalty: jax.Array
    # -- DRY -----------------------------------------------------------------
    dry_multiplier: jax.Array
    dry_base: jax.Array
    dry_allowed: jax.Array    # [R] int32
    dry_range: jax.Array      # [R] int32 (0 = unlimited)
    dry_breakers: jax.Array   # [R, MAX_BREAKERS] int32, pad -1
    no_repeat_ngram: jax.Array  # [R] int32 (0 = disabled)
    # -- min-tokens / stops / bias -------------------------------------------
    min_tokens: jax.Array         # [R] int32 (0 = no min)
    stop_tokens: jax.Array        # [R, MAX_STOP_TOKENS] int32, pad -1
    bias_tokens: jax.Array        # [R, MAX_LOGIT_BIAS] int32, pad -1
    bias_values: jax.Array        # [R, MAX_LOGIT_BIAS] f32
    allowed_tokens: jax.Array     # [R, MAX_ALLOWED_TOKENS] int32, pad -1
    # -- sampling ------------------------------------------------------------
    is_greedy: jax.Array      # [R] bool
    # Per-row RNG derivation happens IN-GRAPH (no host-side key material):
    # key = fold_in(PRNGKey(seed), out_len + step_offset).
    seeds: jax.Array          # [R] uint32
    out_len: jax.Array        # [R] int32 (current output length / counter)


def build_sampling_metadata(
    reqs: Sequence[tuple[SamplingParams, list[int], int, int]],
    vocab_size: int,
    num_reqs_pad: int,
    base_seed: int = 0,
    need_tokens: Optional[bool] = None,
) -> tuple[SamplingMetadata, SamplerFlags]:
    """Pack per-request params into padded device arrays (see
    build_sampling_arrays for the host-side numpy variant the runner packs
    into its single per-step transfer)."""
    arrays, flags = build_sampling_arrays(reqs, vocab_size, num_reqs_pad,
                                          base_seed, need_tokens)
    import jax.numpy as jnp
    return SamplingMetadata(
        **{k: jnp.asarray(v) for k, v in arrays.items()}), flags


def build_sampling_arrays(
    reqs: Sequence[tuple[SamplingParams, list[int], int, int]],
    vocab_size: int,
    num_reqs_pad: int,
    base_seed: int = 0,
    need_tokens: Optional[bool] = None,
    extra_len: int = 0,
    history_len: Optional[int] = None,
) -> tuple[dict, SamplerFlags]:
    """Pack per-request params into padded numpy arrays (field name ->
    array, matching SamplingMetadata's fields).

    Each element of ``reqs`` is (params, all_token_ids, prompt_len,
    output_len). output_len doubles as the per-request sample counter for
    seeded reproducibility.

    ``extra_len`` reserves room in token_seq past the longest current
    sequence: multi-step decode windows append each sampled token to the
    history IN-GRAPH (worker/runner.py _multi_step_window), so the buffer
    must cover the window's worth of future tokens.
    """
    R = num_reqs_pad
    f32 = lambda v: np.full((R,), v, np.float32)  # noqa: E731
    i32 = lambda v: np.full((R,), v, np.int32)  # noqa: E731

    cols = {
        "temperature": f32(1.0), "dynatemp_min": f32(0.0),
        "dynatemp_max": f32(0.0), "dynatemp_exp": f32(1.0),
        "top_p": f32(1.0), "top_k": i32(0), "top_a": f32(0.0),
        "min_p": f32(0.0), "tfs": f32(1.0), "eta_cutoff": f32(0.0),
        "epsilon_cutoff": f32(0.0), "typical_p": f32(1.0),
        "smoothing_factor": f32(0.0), "smoothing_curve": f32(1.0),
        "xtc_threshold": f32(0.0), "xtc_probability": f32(0.0),
        "nsigma": f32(0.0), "skew": f32(0.0),
        "presence_penalty": f32(0.0), "frequency_penalty": f32(0.0),
        "repetition_penalty": f32(1.0),
        "dry_multiplier": f32(0.0), "dry_base": f32(1.75),
        "dry_allowed": i32(2), "dry_range": i32(0),
        "no_repeat_ngram": i32(0),
    }
    dry_breakers = np.full((R, MAX_BREAKERS), -1, np.int32)
    stop_tokens = np.full((R, MAX_STOP_TOKENS), -1, np.int32)
    bias_tokens = np.full((R, MAX_LOGIT_BIAS), -1, np.int32)
    bias_values = np.zeros((R, MAX_LOGIT_BIAS), np.float32)
    allowed_tokens = np.full((R, MAX_ALLOWED_TOKENS), -1, np.int32)
    min_tokens = np.zeros((R,), np.int32)
    is_greedy = np.ones((R,), bool)
    seeds = np.zeros((R,), np.uint32)
    out_lens = np.zeros((R,), np.int32)
    prompt_len = np.zeros((R,), np.int32)
    total_len = np.zeros((R,), np.int32)

    flags = dict.fromkeys(SamplerFlags._fields, False)
    max_len = 1
    for params, toks, p_len, _ in reqs:
        if params.sampling_type != SamplingType.GREEDY:
            pass
        max_len = max(max_len, len(toks))

    for r, (p, toks, p_len, out_len) in enumerate(reqs):
        prompt_len[r] = p_len
        total_len[r] = len(toks)
        greedy = p.sampling_type == SamplingType.GREEDY
        is_greedy[r] = greedy
        if not greedy:
            flags["all_greedy"] = False
        cols["temperature"][r] = p.temperature if not greedy else 1.0
        cols["top_p"][r] = p.top_p
        cols["top_k"][r] = max(p.top_k, 0)
        cols["min_p"][r] = p.min_p
        if p.top_k > 0 or p.top_p < 1.0:
            flags["do_top_k_p"] = True
        if p.min_p > 0:
            flags["do_min_p"] = True
        if p.logprobs is not None:
            flags["need_logprobs"] = True
        if p.dynatemp_min != 0.0 or p.dynatemp_max != 0.0:
            cols["dynatemp_min"][r] = p.dynatemp_min
            cols["dynatemp_max"][r] = p.dynatemp_max
            cols["dynatemp_exp"][r] = p.dynatemp_exponent
            flags["do_advanced"] = True
        for name, val, default in (
                ("top_a", p.top_a, 0.0), ("tfs", p.tfs, 1.0),
                ("typical_p", p.typical_p, 1.0),
                ("smoothing_factor", p.smoothing_factor, 0.0),
                ("nsigma", p.nsigma, 0.0)):
            if val != default:
                cols[name][r] = val
                flags["do_advanced"] = True
        # eta/epsilon arrive in units of 1e-4 (reference convention).
        if p.eta_cutoff > 0:
            cols["eta_cutoff"][r] = p.eta_cutoff * 1e-4
            flags["do_advanced"] = True
        if p.epsilon_cutoff > 0:
            cols["epsilon_cutoff"][r] = p.epsilon_cutoff * 1e-4
            flags["do_advanced"] = True
        cols["smoothing_curve"][r] = p.smoothing_curve
        if p.xtc_probability > 0:
            cols["xtc_threshold"][r] = p.xtc_threshold
            cols["xtc_probability"][r] = p.xtc_probability
            flags["do_xtc"] = True
        if p.skew != 0.0:
            cols["skew"][r] = p.skew
            flags["do_skew"] = True
        if p.temperature_last and not greedy:
            flags["do_temp_last"] = True
        if (p.presence_penalty != 0 or p.frequency_penalty != 0
                or p.repetition_penalty != 1.0):
            cols["presence_penalty"][r] = p.presence_penalty
            cols["frequency_penalty"][r] = p.frequency_penalty
            cols["repetition_penalty"][r] = p.repetition_penalty
            flags["do_penalties"] = True
        if p.dry_multiplier > 0:
            cols["dry_multiplier"][r] = p.dry_multiplier
            cols["dry_base"][r] = p.dry_base
            cols["dry_allowed"][r] = p.dry_allowed_length
            cols["dry_range"][r] = p.dry_range
            brk = p.dry_sequence_breaker_ids[:MAX_BREAKERS]
            dry_breakers[r, :len(brk)] = brk
            flags["do_dry"] = True
        if p.no_repeat_ngram_size > 0:
            cols["no_repeat_ngram"][r] = p.no_repeat_ngram_size
            flags["do_ngram"] = True
        out_lens[r] = out_len
        if p.min_tokens > 0 and out_len < p.min_tokens:
            ids = sorted(p.all_stop_token_ids)[:MAX_STOP_TOKENS]
            if ids:
                stop_tokens[r, :len(ids)] = ids
                min_tokens[r] = p.min_tokens
                flags["do_min_tokens"] = True
        if p.allowed_token_ids:
            ids = list(p.allowed_token_ids)[:MAX_ALLOWED_TOKENS]
            allowed_tokens[r, :len(ids)] = ids
            flags["do_allowed"] = True
        if p.logit_bias:
            items = list(p.logit_bias.items())[:MAX_LOGIT_BIAS]
            for j, (tok, val) in enumerate(items):
                bias_tokens[r, j] = int(tok)
                bias_values[r, j] = float(val)
            flags["do_logit_bias"] = True
        seed = p.seed if p.seed is not None else (base_seed + r * 7919)
        seeds[r] = np.uint32(seed & 0x7fffffff)

    for p, _, _, _ in reqs:
        if p.sampler_priority is not None:
            flags["order"] = tuple(int(x) for x in p.sampler_priority)
            break
    sampler_flags = SamplerFlags(**flags)
    need_tok = (need_tokens if need_tokens is not None else
                (sampler_flags.do_penalties or sampler_flags.do_dry
                 or sampler_flags.do_ngram))
    if need_tok:
        # ``history_len`` lets callers drive the buffer bucket from a value
        # every host computes identically (continuation windows: effective
        # lengths incl. in-flight tokens) — host-local list lengths may be
        # stale on host 0 vs realized on followers.
        L = next_power_of_2(max(max_len + extra_len, history_len or 1))
        token_seq = np.full((R, L), vocab_size, np.int32)
        for r, (_, toks, _, _) in enumerate(reqs):
            token_seq[r, :len(toks)] = toks
    else:
        token_seq = np.full((R, 1), vocab_size, np.int32)

    arrays = dict(
        token_seq=token_seq,
        prompt_len=prompt_len,
        total_len=total_len,
        dry_breakers=dry_breakers,
        min_tokens=min_tokens,
        stop_tokens=stop_tokens,
        bias_tokens=bias_tokens,
        bias_values=bias_values,
        allowed_tokens=allowed_tokens,
        is_greedy=is_greedy,
        seeds=seeds,
        out_len=out_lens,
        **cols)
    return arrays, sampler_flags
