"""Full engine with the Pallas attention kernel (interpret mode on CPU) must
match the pure-JAX reference attention path token-for-token."""
import os

import pytest

from aphrodite_tpu.sampling_params import SamplingParams

from tests.utils import save_tiny_hf_checkpoint, tiny_llama_hf_config


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_pallas")
    save_tiny_hf_checkpoint(d, tiny_llama_hf_config())
    return d


def _generate(ckpt, use_pallas):
    from aphrodite_tpu.entrypoints.llm import LLM
    os.environ["APHRODITE_PALLAS_INTERPRET"] = "1"
    try:
        llm = LLM(model=str(ckpt), dtype="float32", block_size=16,
                  num_kv_blocks=128, max_num_batched_tokens=64,
                  max_num_seqs=8, max_model_len=256, tokenizer="unused",
                  tpu_config={"use_pallas_attention": use_pallas})
        prompts = [[1, 5, 9, 20, 3], list(range(50, 90)), [7, 8]]
        params = SamplingParams(temperature=0.0, max_tokens=8,
                                ignore_eos=True)
        outs = llm.generate(prompts, params)
        return [o.outputs[0].token_ids for o in outs]
    finally:
        os.environ.pop("APHRODITE_PALLAS_INTERPRET", None)


def test_pallas_engine_matches_reference(ckpt):
    ref = _generate(ckpt, use_pallas=False)
    got = _generate(ckpt, use_pallas=True)
    assert got == ref
