"""Ngram speculative decoding: greedy output must be IDENTICAL with spec on
vs off (reference invariant: tests/spec_decode e2e "greedy equality")."""
import numpy as np
import pytest

from aphrodite_tpu.config import SpeculativeConfig
from aphrodite_tpu.sampling_params import SamplingParams
from aphrodite_tpu.spec_decode.ngram import NgramProposer

from tests.utils import save_tiny_hf_checkpoint, tiny_llama_hf_config


def test_ngram_proposer_unit():
    p = NgramProposer(min_n=2, max_n=3, num_speculative_tokens=3)
    # ... 5 6 7 8 ... suffix [7, 8] seen earlier, followed by 9 10 11.
    toks = [1, 7, 8, 9, 10, 11, 4, 7, 8]
    assert p.propose(toks) == [9, 10, 11]
    assert p.propose([1, 2, 3]) == []
    # Self-match must not count.
    assert p.propose([5, 6, 5, 6]) == [5, 6]


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_spec")
    save_tiny_hf_checkpoint(d, tiny_llama_hf_config())
    return d


def _generate(ckpt, spec, prompts, params_list):
    from aphrodite_tpu.entrypoints.llm import LLM
    sc = SpeculativeConfig(method="ngram", num_speculative_tokens=4,
                           prompt_lookup_max=3,
                           prompt_lookup_min=1) if spec else None
    llm = LLM(model=str(ckpt), dtype="float32", block_size=16,
              num_kv_blocks=256, max_num_batched_tokens=128,
              max_num_seqs=8, max_model_len=256, tokenizer="unused",
              speculative_config=sc)
    outs = llm.generate(prompts, params_list)
    return [o.outputs[0].token_ids for o in outs]


def test_spec_greedy_equality(ckpt):
    # Repetitive prompts give the ngram proposer real hits.
    prompts = [
        [5, 6, 7, 5, 6, 7, 5, 6],
        list(range(30, 60)),
        [9, 9, 9, 9, 9, 9],
    ]
    params = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    base = _generate(ckpt, False, prompts, params)
    spec = _generate(ckpt, True, prompts, params)
    assert spec == base


def test_spec_with_stop_and_max_tokens(ckpt):
    prompts = [[5, 6, 7, 5, 6, 7]]
    base = _generate(ckpt, False, prompts,
                     SamplingParams(temperature=0.0, max_tokens=10,
                                    ignore_eos=True))[0]
    stop_tok = base[4]
    p = SamplingParams(temperature=0.0, max_tokens=10,
                       stop_token_ids=[stop_tok], ignore_eos=True)
    got = _generate(ckpt, True, prompts, p)[0]
    assert got == base[:base.index(stop_tok)]


def test_spec_dynamic_disable_by_batch_size(ckpt):
    """disable_by_batch_size: speculation off while the running queue is
    deeper than the threshold (reference spec_decode_worker.py:292 +
    tests/spec_decode/test_dynamic_spec_decode.py), outputs unchanged."""
    from aphrodite_tpu.config import SpeculativeConfig
    from aphrodite_tpu.entrypoints.llm import LLM
    from aphrodite_tpu.sampling_params import SamplingParams

    # repetitive prompts: the ngram proposer needs ngram hits to draft
    prompts = [[7, 8, 9, 7, 8, 9, 7, 8, 9, 7, 8],
               [11, 12, 11, 12, 11, 12, 11, 12],
               [3, 4, 5, 3, 4, 5, 3, 4, 5],
               [20, 21, 20, 21, 20, 21, 20, 21]]
    params = [SamplingParams(temperature=0.0, max_tokens=8,
                             ignore_eos=True)] * 4

    def run(dbs):
        sc = SpeculativeConfig(method="ngram", num_speculative_tokens=4,
                               prompt_lookup_max=3, prompt_lookup_min=1,
                               disable_by_batch_size=dbs)
        llm = LLM(model=str(ckpt), dtype="float32", block_size=16,
                  num_kv_blocks=128, max_num_batched_tokens=256,
                  max_num_seqs=4, max_model_len=128, tokenizer="unused",
                  speculative_config=sc)
        outs = llm.generate(prompts, params)
        drafted = llm.engine.core.stats.spec_drafted
        return [o.outputs[0].token_ids for o in outs], drafted

    base, drafted_off = run(dbs=1)     # 4 running > 1: never speculates
    spec, drafted_on = run(dbs=None)   # unlimited: speculates
    assert spec == base
    assert drafted_off == 0
    assert drafted_on > 0
