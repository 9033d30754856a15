"""Structured output: regex engine unit tests + guided generation E2E."""
import json

import numpy as np
import pytest

from aphrodite_tpu.sampling_params import (GuidedDecodingParams,
                                           SamplingParams)
from aphrodite_tpu.structured_output.fsm import DFA, TokenFSM
from aphrodite_tpu.structured_output.json_schema import schema_to_regex

from tests.utils import (build_tiny_tokenizer, save_tiny_hf_checkpoint,
                         tiny_llama_hf_config)


def dfa_accepts(pattern, text):
    d = DFA(pattern)
    return d.is_final(d.walk(d.start, text))


def test_dfa_basics():
    assert dfa_accepts("abc", "abc")
    assert not dfa_accepts("abc", "abd")
    assert dfa_accepts("a*b", "aaab")
    assert dfa_accepts("a*b", "b")
    assert dfa_accepts("(ab|cd)+", "abcdab")
    assert not dfa_accepts("(ab|cd)+", "")
    assert dfa_accepts("[a-c]{2,3}", "abc")
    assert not dfa_accepts("[a-c]{2,3}", "a")
    assert not dfa_accepts("[a-c]{2,3}", "abca")
    assert dfa_accepts(r"\d+\.\d{2}", "123.45")
    assert dfa_accepts("[^x]+", "abc")
    assert not dfa_accepts("[^x]+", "axc")
    assert dfa_accepts("a?b?c?", "")
    assert dfa_accepts("yes|no", "no")
    assert dfa_accepts(r"\{a{1,4}\}", "{aaa}")


def test_dfa_liveness():
    d = DFA("abc")
    s = d.walk(d.start, "ab")
    assert d.is_live(s) and not d.is_final(s)
    s2 = d.walk(d.start, "ax")
    assert s2 == d.DEAD


def test_token_fsm_masks():
    vocab = ["a", "b", "ab", "c", "x", ""]
    fsm = TokenFSM(DFA("a+b"), vocab)
    allowed, fin = fsm.allowed(fsm.dfa.start)
    assert set(allowed) == {0, 2}  # "a" keeps alive, "ab" completes
    assert not fin
    st = fsm.advance(fsm.dfa.start, 2)  # consumed "ab"
    allowed2, fin2 = fsm.allowed(st)
    assert fin2 and allowed2 == []


def test_json_schema_regex():
    r = schema_to_regex({"type": "object",
                         "properties": {"name": {"type": "string"},
                                        "age": {"type": "integer"}}})
    assert dfa_accepts(r, '{"name": "bob", "age": 42}')
    assert not dfa_accepts(r, '{"name": 3, "age": 42}')
    r2 = schema_to_regex({"enum": ["red", "green"]})
    assert dfa_accepts(r2, '"red"')
    assert not dfa_accepts(r2, '"blue"')
    r3 = schema_to_regex({"type": "array", "items": {"type": "integer"}})
    assert dfa_accepts(r3, "[1, 2, 3]")
    assert not dfa_accepts(r3, '["a"]')


@pytest.fixture(scope="module")
def llm(tmp_path_factory):
    from aphrodite_tpu.entrypoints.llm import LLM
    d = tmp_path_factory.mktemp("tiny_guided")
    save_tiny_hf_checkpoint(d, tiny_llama_hf_config(max_pos=512))
    build_tiny_tokenizer(d)
    return LLM(model=str(d), dtype="float32", block_size=16,
               num_kv_blocks=256, max_num_batched_tokens=128,
               max_num_seqs=8, max_model_len=256)


def test_guided_choice(llm):
    params = SamplingParams(
        temperature=0.0, max_tokens=16,
        guided_decoding=GuidedDecodingParams(
            choice=["the quick fox", "hello world"]))
    out = llm.generate(["test of the"], params)[0]
    assert out.outputs[0].text in ("the quick fox", "hello world")


def test_guided_regex(llm):
    params = SamplingParams(
        temperature=0.0, max_tokens=20,
        guided_decoding=GuidedDecodingParams(regex=r"(the )+quick"))
    out = llm.generate(["hello"], params)[0]
    import re
    assert re.fullmatch(r"(the )+quick", out.outputs[0].text), \
        out.outputs[0].text


def test_guided_regex_sampled(llm):
    params = SamplingParams(
        temperature=1.5, seed=3, max_tokens=20,
        guided_decoding=GuidedDecodingParams(regex=r"[the quickbrown]{5}"))
    out = llm.generate(["hello"], params)[0]
    import re
    assert re.fullmatch(r"[the quickbrown]{5}", out.outputs[0].text), \
        out.outputs[0].text
