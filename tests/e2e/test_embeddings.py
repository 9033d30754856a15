"""Embedding/pooling path: pooled hidden states vs an HF oracle."""
import numpy as np
import pytest
import torch

from tests.utils import save_tiny_hf_checkpoint, tiny_llama_hf_config


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_embed")
    hf = save_tiny_hf_checkpoint(d, tiny_llama_hf_config())
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(d), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=128, max_num_seqs=8,
              max_model_len=256, tokenizer="unused")
    return llm, hf


@pytest.mark.parametrize("pooling", ["last", "mean"])
def test_embed_matches_hf_hidden(env, pooling):
    llm, hf = env
    prompts = [[1, 5, 9, 20, 3], [7, 8, 9]]
    vecs = llm.embed(prompts, pooling=pooling, normalize=False)
    for p, v in zip(prompts, vecs):
        with torch.no_grad():
            hs = hf(torch.tensor([p]),
                    output_hidden_states=True).hidden_states[-1][0]
            # Apply the final norm (our hidden is post-final-norm).
            hs = hf.model.norm(hs).numpy()
        exp = hs.mean(0) if pooling == "mean" else hs[-1]
        np.testing.assert_allclose(np.asarray(v), exp, rtol=2e-3, atol=2e-3)


def test_embed_normalized(env):
    llm, _ = env
    vecs = llm.embed([[1, 2, 3]], normalize=True)
    assert abs(np.linalg.norm(vecs[0]) - 1.0) < 1e-5
