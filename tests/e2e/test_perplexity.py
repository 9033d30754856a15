"""LLM.evaluate_perplexity: teacher-forced NLL through the serving
forward must match HF's cross-entropy loss (the quality-parity check
BASELINE.md pins: ppl parity vs the reference at the same bit-width)."""
import numpy as np
import pytest
import torch

from tests.utils import save_tiny_hf_checkpoint, tiny_llama_hf_config


def test_perplexity_matches_hf(tmp_path):
    hf = save_tiny_hf_checkpoint(tmp_path, tiny_llama_hf_config(max_pos=512))
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(tmp_path), dtype="float32", block_size=16,
              num_kv_blocks=256, max_num_batched_tokens=512,
              max_num_seqs=4, max_model_len=256, tokenizer="unused",
              device="cpu")
    rng = np.random.RandomState(0)
    seqs = [rng.randint(10, 200, size=n).tolist() for n in (24, 41, 17)]
    res = llm.evaluate_perplexity(seqs)
    assert res["tokens"] == sum(len(s) - 1 for s in seqs)

    # HF oracle: token-weighted mean NLL over the same sequences.
    total_nll, total_tok = 0.0, 0
    with torch.no_grad():
        for s in seqs:
            ids = torch.tensor([s])
            logits = hf(ids).logits[0]
            lsm = torch.log_softmax(logits.float(), dim=-1)
            nll = -lsm[torch.arange(len(s) - 1), torch.tensor(s[1:])]
            total_nll += float(nll.sum())
            total_tok += len(s) - 1
    hf_mean = total_nll / total_tok
    assert res["mean_nll"] == pytest.approx(hf_mean, rel=1e-3, abs=1e-3)
