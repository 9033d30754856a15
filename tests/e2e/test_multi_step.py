"""Multi-step decode (K steps per dispatch) must be token-identical to
single-step execution, for greedy and seeded sampling."""
import pytest

from aphrodite_tpu.sampling_params import SamplingParams

from tests.utils import save_tiny_hf_checkpoint, tiny_llama_hf_config


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_ms")
    save_tiny_hf_checkpoint(d, tiny_llama_hf_config())
    return d


def _generate(ckpt, multi_step, params_list):
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(ckpt), dtype="float32", block_size=16,
              num_kv_blocks=256, max_num_batched_tokens=128,
              max_num_seqs=8, max_model_len=256, tokenizer="unused",
              tpu_config={"multi_step_decode": multi_step})
    prompts = [[1, 5, 9], list(range(40, 60)), [7]]
    outs = llm.generate(prompts, params_list)
    return [o.outputs[0].token_ids for o in outs]


def test_multi_step_matches_single_step(ckpt):
    params = [
        SamplingParams(temperature=0.0, max_tokens=20, ignore_eos=True),
        SamplingParams(temperature=1.0, seed=7, max_tokens=20,
                       ignore_eos=True),
        SamplingParams(temperature=0.8, seed=3, top_k=40, top_p=0.9,
                       max_tokens=20, ignore_eos=True),
    ]
    single = _generate(ckpt, 1, params)
    multi = _generate(ckpt, 8, params)
    assert single == multi


def test_multi_step_stop_token_truncation(ckpt):
    # Find a token the greedy path emits, then stop on it: the multi-step
    # overshoot must be discarded.
    p0 = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)
    base = _generate(ckpt, 8, [p0, p0, p0])[0]
    stop_tok = base[5]
    p1 = SamplingParams(temperature=0.0, max_tokens=16,
                        stop_token_ids=[stop_tok], ignore_eos=True)
    got = _generate(ckpt, 8, [p1, p0, p0])[0]
    assert got == base[:base.index(stop_tok)]


def test_multi_step_fallback_with_penalties(ckpt):
    # Penalties need fresh token history -> engine silently single-steps;
    # results must equal the explicit single-step run.
    p = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True,
                      repetition_penalty=1.3)
    pp = [p, p, p]
    assert _generate(ckpt, 8, pp) == _generate(ckpt, 1, pp)
