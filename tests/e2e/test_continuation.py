"""Round-5 continuation windows: decode window w+1 is scheduled and
dispatched while window w is still in flight, chained off its device
output (worker/runner.py _execute_continuation + core/scheduler.py
_schedule_continuation). The device pipeline never drains between decode
windows — the mechanism behind online decode matching offline throughput.

Every test asserts (a) token equality with single-step execution and
(b) via a spy, that continuation waves actually dispatched (without (b),
a silent fallback to realize-then-window would pass (a) trivially).
Reference bar: v1 async scheduling overlap
(aphrodite/v1/core/sched/scheduler.py, --async-scheduling).
"""
from types import SimpleNamespace

import pytest

from aphrodite_tpu.sampling_params import SamplingParams

from tests.utils import (build_tiny_tokenizer, save_tiny_hf_checkpoint,
                         tiny_llama_hf_config)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_cont")
    save_tiny_hf_checkpoint(d, tiny_llama_hf_config(max_pos=512))
    build_tiny_tokenizer(d)
    return d


@pytest.fixture
def cont_spy(monkeypatch):
    """.waves = continuation dispatches, .chained/.joined = row kinds."""
    import aphrodite_tpu.worker.runner as runner_mod
    spy = SimpleNamespace(waves=0, chained=0, joined=0)
    orig = runner_mod.ModelRunner._execute_continuation

    def f(self, so, order):
        spy.waves += 1
        group = self._window_group
        for rid in order:
            st = self.requests[rid]
            if group and rid in group["rows"] and st.inflight > 0:
                spy.chained += 1
            else:
                spy.joined += 1
        return orig(self, so, order)

    monkeypatch.setattr(runner_mod.ModelRunner, "_execute_continuation", f)
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


def test_continuation_fires_and_token_exact(ckpt, cont_spy):
    # 40 decode tokens at window 8: >= 3 continuation windows chained off
    # the fused prefill window, all without a host sync in between.
    params = [
        SamplingParams(temperature=0.0, max_tokens=40, ignore_eos=True),
        SamplingParams(temperature=0.8, seed=7, top_k=30, max_tokens=40,
                       ignore_eos=True),
        SamplingParams(temperature=0.0, max_tokens=17, ignore_eos=True),
    ]
    prompts = [[1, 5, 9, 13], list(range(40, 60)), [3, 3, 7]]
    single = _toks(_llm(ckpt, 1).generate(prompts, params))
    assert cont_spy.waves == 0  # K=1 never windows, never continues
    multi = _toks(_llm(ckpt, 8).generate(prompts, params))
    assert single == multi
    assert cont_spy.waves >= 2, \
        "decode windows realized instead of chaining on device"
    assert cont_spy.chained >= 2 * 2


def test_continuation_carries_sampler_history(ckpt, cont_spy):
    # Penalty/DRY state must survive ACROSS chained windows: the history
    # carry returned by window w seeds window w+1 in-graph.
    params = [
        SamplingParams(temperature=0.0, max_tokens=40, ignore_eos=True,
                       repetition_penalty=1.3, frequency_penalty=0.3),
        SamplingParams(temperature=0.9, seed=11, max_tokens=40,
                       ignore_eos=True, dry_multiplier=0.8,
                       dry_allowed_length=2),
        SamplingParams(temperature=0.0, max_tokens=40, ignore_eos=True,
                       no_repeat_ngram_size=3),
    ]
    prompts = [[2, 4, 6, 8], [9, 9, 4, 9, 9], list(range(30, 45))]
    single = _toks(_llm(ckpt, 1).generate(prompts, params))
    multi = _toks(_llm(ckpt, 8).generate(prompts, params))
    assert single == multi
    assert cont_spy.waves >= 2


def test_continuation_stops_and_logprobs(ckpt, cont_spy):
    # Stop tokens cut a chained request mid-window: later in-flight window
    # tokens for it must be dropped, streams of other rows unaffected;
    # logprobs ride the continuation windows.
    probe = SamplingParams(temperature=0.0, max_tokens=40, ignore_eos=True)
    ref = _toks(_llm(ckpt, 1).generate([[1, 5, 9, 13]], [probe]))[0]
    stop_tok = ref[25]  # force a stop deep into the chained windows
    params = [
        SamplingParams(temperature=0.0, max_tokens=40,
                       stop_token_ids=[stop_tok], logprobs=2),
        SamplingParams(temperature=0.0, max_tokens=40, ignore_eos=True),
    ]
    prompts = [[1, 5, 9, 13], [7, 7, 2]]
    single = _llm(ckpt, 1).generate(prompts, params)
    multi = _llm(ckpt, 8).generate(prompts, params)
    assert _toks(single) == _toks(multi)
    assert cont_spy.waves >= 1
    s_lp = single[0].outputs[0].logprobs
    m_lp = multi[0].outputs[0].logprobs
    assert len(s_lp) == len(m_lp)
    for a, b in zip(s_lp, m_lp):
        assert set(a) == set(b)


def test_late_arrival_joins_chain(ckpt, cont_spy):
    # Engine-driven staggered arrivals: request B arrives while A's window
    # chain is in flight. B prefills between windows, then host-joins A's
    # continuation wave. Tokens must match the single-step run for both.
    from aphrodite_tpu.engine.llm_engine import LLMEngine
    from aphrodite_tpu.entrypoints.llm import build_engine_config

    def run(multi_step):
        config = build_engine_config(
            str(ckpt), dtype="float32", block_size=16, num_kv_blocks=256,
            max_num_batched_tokens=128, max_num_seqs=8, max_model_len=400,
            tpu_config={"multi_step_decode": multi_step})
        eng = LLMEngine(config)
        pa = SamplingParams(temperature=0.0, max_tokens=40, ignore_eos=True)
        pb = SamplingParams(temperature=0.6, seed=5, max_tokens=30,
                            ignore_eos=True)
        eng.add_request("A", {"prompt_token_ids": [1, 5, 9, 13]}, pa)
        done = {}
        steps = 0
        while eng.has_unfinished_requests():
            for out in eng.step():
                # step() emits token DELTAS per realize: accumulate.
                done.setdefault(out.request_id, []).extend(
                    out.outputs[0].token_ids)
            steps += 1
            if steps == 3:  # A is mid-chain by now (window runs start ~2)
                eng.add_request("B", {"prompt_token_ids": list(range(20, 52))},
                                pb)
        return done

    single = run(1)
    multi = run(8)
    assert single == multi
    assert cont_spy.waves >= 1
    assert cont_spy.joined >= 1, "late arrival never host-joined the chain"
