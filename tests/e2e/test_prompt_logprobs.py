"""Prompt logprobs vs HF forward log-softmax oracle."""
import numpy as np
import pytest
import torch

from aphrodite_tpu.sampling_params import SamplingParams

from tests.utils import save_tiny_hf_checkpoint, tiny_llama_hf_config


def test_prompt_logprobs_match_hf(tmp_path):
    hf = save_tiny_hf_checkpoint(tmp_path, tiny_llama_hf_config())
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(tmp_path), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=32, max_num_seqs=4,
              max_model_len=128, tokenizer="unused")
    prompt = list(range(40, 80))  # 40 tokens -> multi-chunk with budget 32
    params = SamplingParams(temperature=0.0, max_tokens=2, ignore_eos=True,
                            prompt_logprobs=2)
    out = llm.generate([prompt], params)[0]
    plp = out.prompt_logprobs
    assert plp is not None
    assert plp[0] is None
    assert len(plp) == len(prompt)

    with torch.no_grad():
        logits = hf(torch.tensor([prompt])).logits[0]
        lsm = torch.log_softmax(logits.float(), dim=-1).numpy()
    for i in range(1, len(prompt)):
        got = plp[i][prompt[i]].logprob
        exp = lsm[i - 1, prompt[i]]
        np.testing.assert_allclose(got, exp, rtol=2e-3, atol=2e-3)
        # top-k entries are the true top tokens
        ids = sorted(plp[i], key=lambda t: -plp[i][t].logprob)
        top2 = np.argsort(-lsm[i - 1])[:2]
        assert set(int(x) for x in top2) <= set(plp[i].keys())
