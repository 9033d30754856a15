"""Round-5 window-eligibility semantics: token-history samplers
(penalties/DRY/no-repeat-ngram) run INSIDE multi-step decode windows, and
window eligibility is per-row — a grammar request or a mid-prefill chunk
no longer reverts the whole batch to single-step decode.

Every test asserts (a) token equality with explicit single-step execution
and (b) via spies, that the windowed machinery actually ran (the old
behavior — silent whole-batch fallback — would pass (a) trivially).
Reference bar: the multi-step runner executes the full sampler every
sub-step (aphrodite/worker/multi_step_model_runner.py:482-520)."""
import re
from types import SimpleNamespace

import pytest

from aphrodite_tpu.sampling_params import GuidedDecodingParams, SamplingParams

from tests.utils import (build_tiny_tokenizer, save_tiny_hf_checkpoint,
                         tiny_llama_hf_config)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_winsamp")
    save_tiny_hf_checkpoint(d, tiny_llama_hf_config(max_pos=512))
    build_tiny_tokenizer(d)
    return d


@pytest.fixture
def window_spy(monkeypatch):
    """Counts windowed dispatches: .fused = fused-window chains that fired,
    .pure = whole-batch multi-step waves."""
    import aphrodite_tpu.worker.runner as runner_mod
    spy = SimpleNamespace(fused=0, pure=0)
    orig_f = runner_mod.ModelRunner._maybe_fused_window
    orig_m = runner_mod.ModelRunner._execute_multi_step

    def f(self, *a, **k):
        out = orig_f(self, *a, **k)
        if out is not None:
            spy.fused += 1
        return out

    def m(self, *a, **k):
        spy.pure += 1
        return orig_m(self, *a, **k)

    monkeypatch.setattr(runner_mod.ModelRunner, "_maybe_fused_window", f)
    monkeypatch.setattr(runner_mod.ModelRunner, "_execute_multi_step", m)
    return spy


def _llm(ckpt, multi_step, **kw):
    from aphrodite_tpu.entrypoints.llm import LLM
    args = dict(model=str(ckpt), dtype="float32", block_size=16,
                num_kv_blocks=256, max_num_batched_tokens=128,
                max_num_seqs=8, max_model_len=400,
                tpu_config={"multi_step_decode": multi_step})
    args.update(kw)
    return LLM(**args)


def _toks(outs):
    return [o.outputs[0].token_ids for o in outs]


def test_penalties_run_in_window(ckpt, window_spy):
    # Greedy + repetition/presence/frequency penalties: historically forced
    # whole-batch single-step. Now the window carries the token history.
    p = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True,
                       repetition_penalty=1.3, presence_penalty=0.4,
                       frequency_penalty=0.2)
    prompts = [[1, 5, 9], list(range(40, 60)), [7]]
    single = _toks(_llm(ckpt, 1).generate(prompts, [p, p, p]))
    assert window_spy.fused + window_spy.pure == 0  # K=1 never windows
    multi = _toks(_llm(ckpt, 8).generate(prompts, [p, p, p]))
    assert single == multi
    assert window_spy.fused + window_spy.pure >= 1, \
        "penalties fell back to single-step instead of windowing"


def test_dry_ngram_seeded_in_window(ckpt, window_spy):
    params = [
        SamplingParams(temperature=0.9, seed=11, max_tokens=20,
                       ignore_eos=True, dry_multiplier=0.8,
                       dry_allowed_length=2),
        SamplingParams(temperature=0.0, max_tokens=20, ignore_eos=True,
                       no_repeat_ngram_size=2),
        SamplingParams(temperature=0.7, seed=3, top_k=20, max_tokens=20,
                       ignore_eos=True, repetition_penalty=1.2),
    ]
    prompts = [[2, 4, 6, 8], [9, 9, 4, 9, 9], list(range(30, 45))]
    single = _toks(_llm(ckpt, 1).generate(prompts, params))
    multi = _toks(_llm(ckpt, 8).generate(prompts, params))
    assert single == multi
    assert window_spy.fused + window_spy.pure >= 1


def test_grammar_row_does_not_block_windows(ckpt, window_spy):
    # One guided request + two plain greedy requests: the plain rows must
    # window (per-row eligibility) while the grammar row single-steps, and
    # the results must equal full single-step execution.
    guided = SamplingParams(
        temperature=0.0, max_tokens=20,
        guided_decoding=GuidedDecodingParams(regex=r"(the )+quick"))
    plain = SamplingParams(temperature=0.0, max_tokens=20, ignore_eos=True)
    prompts = ["hello", "test of the", "the quick brown"]
    params = [guided, plain, plain]

    outs1 = _llm(ckpt, 1, tokenizer=str(ckpt)).generate(prompts, params)
    fused_before = window_spy.fused
    outs8 = _llm(ckpt, 8, tokenizer=str(ckpt)).generate(prompts, params)
    assert _toks(outs1) == _toks(outs8)
    assert re.fullmatch(r"(the )+quick", outs8[0].outputs[0].text)
    assert window_spy.fused > fused_before, \
        "a grammar row blocked the whole batch from windowing"


def test_mid_prefill_row_does_not_block_windows(ckpt, window_spy):
    # Request 0 prefills in chunks across several waves
    # (max_num_batched_tokens=64 < 200-token prompt) while requests 1/2
    # reach decode immediately: their rows must window in waves where
    # request 0 is still mid-prefill.
    p = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True,
                       repetition_penalty=1.1)
    prompts = [list(range(3, 203)), [5, 7], [11, 13, 17]]
    kw = dict(max_num_batched_tokens=64)
    single = _toks(_llm(ckpt, 1, **kw).generate(prompts, [p, p, p]))
    fused_before = window_spy.fused
    multi = _toks(_llm(ckpt, 8, **kw).generate(prompts, [p, p, p]))
    assert single == multi
    assert window_spy.fused > fused_before, \
        "a mid-prefill chunk blocked decode rows from windowing"
