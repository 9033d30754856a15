"""Draft-model speculative decoding: greedy output must be IDENTICAL with
spec on vs off, for both a perfect draft (the target itself: everything
accepted) and a disagreeing draft (different weights: rejections exercised).
Reference: aphrodite/spec_decode/multi_step_worker.py draft proposer +
spec_decode_worker verification (SURVEY.md §2.9)."""
import pytest

from aphrodite_tpu.config import SpeculativeConfig
from aphrodite_tpu.sampling_params import SamplingParams

from tests.utils import save_tiny_hf_checkpoint, tiny_llama_hf_config


@pytest.fixture(scope="module")
def ckpts(tmp_path_factory):
    target = tmp_path_factory.mktemp("spec_target")
    draft = tmp_path_factory.mktemp("spec_draft")
    save_tiny_hf_checkpoint(target, tiny_llama_hf_config(), seed=0)
    # Smaller, differently-initialized draft: frequent disagreement.
    save_tiny_hf_checkpoint(
        draft, tiny_llama_hf_config(hidden=32, layers=1, heads=2,
                                    kv_heads=2, intermediate=64), seed=7)
    return target, draft


def _generate(target, draft_path, prompts, params):
    from aphrodite_tpu.entrypoints.llm import LLM
    sc = (SpeculativeConfig(method="draft_model", num_speculative_tokens=3,
                            draft_model=str(draft_path))
          if draft_path else None)
    llm = LLM(model=str(target), dtype="float32", block_size=16,
              num_kv_blocks=256, max_num_batched_tokens=128,
              max_num_seqs=8, max_model_len=256, tokenizer="unused",
              speculative_config=sc)
    outs = llm.generate(prompts, params)
    return [o.outputs[0].token_ids for o in outs]


PROMPTS = [[5, 6, 7, 5, 6, 7, 5, 6], list(range(30, 60)), [9, 9, 9, 9]]


def test_perfect_draft_greedy_equality(ckpts):
    target, _ = ckpts
    params = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)
    base = _generate(target, None, PROMPTS, params)
    spec = _generate(target, target, PROMPTS, params)  # draft == target
    assert spec == base


def test_disagreeing_draft_greedy_equality(ckpts):
    target, draft = ckpts
    params = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)
    base = _generate(target, None, PROMPTS, params)
    spec = _generate(target, draft, PROMPTS, params)
    assert spec == base
