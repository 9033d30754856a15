"""End-to-end offline generation vs the HF oracle (SURVEY.md §4.1 pattern:
same tiny checkpoint through both engines, compare tokens)."""
import numpy as np
import pytest

from aphrodite_tpu.sampling_params import SamplingParams

from tests.utils import (build_tiny_tokenizer, save_tiny_hf_checkpoint,
                         tiny_llama_hf_config)


@pytest.fixture(scope="module")
def tiny_env(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_e2e")
    hf_config = tiny_llama_hf_config(max_pos=512)
    hf_model = save_tiny_hf_checkpoint(d, hf_config)
    tok = build_tiny_tokenizer(d)
    return d, hf_model, tok


@pytest.fixture(scope="module")
def llm(tiny_env):
    from aphrodite_tpu.entrypoints.llm import LLM
    d, _, _ = tiny_env
    return LLM(model=str(d), dtype="float32", block_size=16,
               num_kv_blocks=256, max_num_batched_tokens=128,
               max_num_seqs=8, max_model_len=256)


def hf_greedy(hf_model, tok, prompt, max_new):
    import torch
    ids = tok.encode(prompt, return_tensors="pt")
    with torch.no_grad():
        out = hf_model.generate(ids, max_new_tokens=max_new, do_sample=False,
                                eos_token_id=None)
    return out[0][ids.shape[1]:].tolist()


def test_greedy_matches_hf(tiny_env, llm):
    d, hf_model, tok = tiny_env
    prompts = ["the quick brown fox", "hello world, this is",
               "paged attention over block"]
    params = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    outs = llm.generate(prompts, params)
    for prompt, out in zip(prompts, outs):
        expect = hf_greedy(hf_model, tok, prompt, 12)
        assert out.outputs[0].token_ids == expect, prompt
        assert out.finished
        assert out.outputs[0].finish_reason == "length"


def test_chunked_prefill_same_result(tiny_env):
    from aphrodite_tpu.entrypoints.llm import LLM
    d, hf_model, tok = tiny_env
    # Budget of 16 forces multi-chunk prefill for a ~40-token prompt.
    small = LLM(model=str(d), dtype="float32", block_size=16,
                num_kv_blocks=256, max_num_batched_tokens=16,
                max_num_seqs=4, max_model_len=256)
    prompt = "the quick brown fox jumps over the lazy dog " * 3
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    out = small.generate([prompt], params)[0]
    expect = hf_greedy(hf_model, tok, prompt, 8)
    assert out.outputs[0].token_ids == expect


def test_prefix_cache_consistency(llm, tiny_env):
    d, hf_model, tok = tiny_env
    prompt = "the quick brown fox jumps over the lazy dog and runs"
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    a = llm.generate([prompt], params)[0]
    # Second run hits the prefix cache; result must be identical.
    b = llm.generate([prompt], params)[0]
    assert a.outputs[0].token_ids == b.outputs[0].token_ids
    assert b.num_cached_tokens > 0


def test_detokenized_text(llm):
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    out = llm.generate(["hello world"], params)[0]
    assert isinstance(out.outputs[0].text, str)
    assert len(out.outputs[0].text) > 0


def test_seeded_sampling_reproducible(llm):
    p = SamplingParams(temperature=1.0, seed=1234, max_tokens=10,
                       ignore_eos=True)
    a = llm.generate(["the quick"], p)[0]
    b = llm.generate(["the quick"], p)[0]
    assert a.outputs[0].token_ids == b.outputs[0].token_ids
    p2 = SamplingParams(temperature=1.0, seed=99, max_tokens=10,
                        ignore_eos=True)
    c = llm.generate(["the quick"], p2)[0]
    assert len(c.outputs[0].token_ids) == 10


def test_n_greater_than_one(llm):
    p = SamplingParams(n=3, temperature=1.0, seed=7, max_tokens=6,
                       ignore_eos=True)
    out = llm.generate(["hello world"], p)[0]
    assert len(out.outputs) == 3
    assert {o.index for o in out.outputs} == {0, 1, 2}
    for o in out.outputs:
        assert len(o.token_ids) == 6


def test_max_tokens_and_stop_token(llm, tiny_env):
    d, hf_model, tok = tiny_env
    params = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
    out = llm.generate(["hello world"], params)[0]
    assert len(out.outputs[0].token_ids) == 5

    expect = hf_greedy(hf_model, tok, "hello world", 10)
    stop_tok = expect[3]
    params = SamplingParams(temperature=0.0, max_tokens=10,
                            stop_token_ids=[stop_tok], ignore_eos=True)
    out = llm.generate(["hello world"], params)[0]
    assert out.outputs[0].token_ids == expect[:3]
    assert out.outputs[0].finish_reason == "stop"
    assert out.outputs[0].stop_reason == stop_tok


def test_stop_string(llm, tiny_env):
    d, hf_model, tok = tiny_env
    # Oracle: our own un-stopped generation text (incremental detok keeps the
    # prompt/generation boundary space that a bare decode() drops).
    base = llm.generate(
        ["the quick brown"],
        SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True))[0]
    full_text = base.outputs[0].text
    if len(full_text) < 4:
        pytest.skip("generated text too short for a stop-string test")
    stop = full_text[2:4]
    params = SamplingParams(temperature=0.0, max_tokens=12, stop=[stop],
                            ignore_eos=True)
    out = llm.generate(["the quick brown"], params)[0]
    assert out.finished
    assert out.outputs[0].finish_reason == "stop"
    assert stop not in out.outputs[0].text
    assert out.outputs[0].text == full_text[:full_text.index(stop)]


def test_many_concurrent_requests(llm, tiny_env):
    d, hf_model, tok = tiny_env
    prompts = [f"hello world {i} the quick" for i in range(12)]
    params = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    outs = llm.generate(prompts, params)
    assert len(outs) == 12
    for prompt, out in zip(prompts, outs):
        expect = hf_greedy(hf_model, tok, prompt, 6)
        assert out.outputs[0].token_ids == expect
