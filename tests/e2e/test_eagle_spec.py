"""EAGLE speculative decoding: greedy output must be IDENTICAL with the
eagle head on vs off (proposals are deterministic; verification emits only
target samples). The head here is randomly initialized — acceptance will be
poor, but correctness must hold; that separation (wiring vs draft quality)
is exactly what the unbiasedness invariant promises.
Reference: aphrodite/v1/spec_decode/eagle.py:20 (EagleProposer)."""
import pytest

from aphrodite_tpu.config import SpeculativeConfig
from aphrodite_tpu.sampling_params import SamplingParams

from tests.utils import save_tiny_hf_checkpoint, tiny_llama_hf_config


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("eagle_target")
    save_tiny_hf_checkpoint(d, tiny_llama_hf_config())
    return d


def _generate(target, eagle, prompts, params, chunk=128):
    from aphrodite_tpu.entrypoints.llm import LLM
    sc = (SpeculativeConfig(method="eagle", num_speculative_tokens=3)
          if eagle else None)
    llm = LLM(model=str(target), dtype="float32", block_size=16,
              num_kv_blocks=256, max_num_batched_tokens=chunk,
              max_num_seqs=8, max_model_len=256, tokenizer="unused",
              speculative_config=sc)
    outs = llm.generate(prompts, params)
    return [o.outputs[0].token_ids for o in outs]


PROMPTS = [[5, 6, 7, 5, 6, 7, 5, 6], list(range(30, 60)), [9, 9, 9, 9]]


def test_eagle_greedy_equality(ckpt):
    params = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)
    base = _generate(ckpt, False, PROMPTS, params)
    spec = _generate(ckpt, True, PROMPTS, params)
    assert spec == base


def test_eagle_with_chunked_prefill(ckpt):
    """Chunk seams exercise the ingest-approximation path; correctness must
    still hold (the seam can only lower acceptance)."""
    params = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    prompts = [list(range(30, 60)), list(range(100, 140))]
    base = _generate(ckpt, False, prompts, params, chunk=128)
    spec = _generate(ckpt, True, prompts, params, chunk=16)
    assert spec == base
