"""Beam search vs an exact breadth-first torch oracle."""
import numpy as np
import pytest
import torch

from tests.utils import save_tiny_hf_checkpoint, tiny_llama_hf_config


def torch_beam(hf, base, width, steps):
    beams = [(list(base), 0.0)]
    for _ in range(steps):
        cand = []
        for toks, score in beams:
            with torch.no_grad():
                logits = hf(torch.tensor([toks])).logits[0, -1]
                lsm = torch.log_softmax(logits.float(), -1).numpy()
            top = np.argsort(-lsm)[:2 * width]
            for t in top:
                cand.append((toks + [int(t)], score + float(lsm[t])))
        cand.sort(key=lambda c: -c[1])
        beams = cand[:width]
    return [(t[len(base):], s) for t, s in beams]


def test_beam_search_matches_oracle(tmp_path):
    hf = save_tiny_hf_checkpoint(tmp_path, tiny_llama_hf_config())
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(tmp_path), dtype="float32", block_size=16,
              num_kv_blocks=256, max_num_batched_tokens=128, max_num_seqs=8,
              max_model_len=128, tokenizer="unused")
    base = [3, 17, 42, 7]
    got = llm.beam_search([base], beam_width=3, max_tokens=5,
                          ignore_eos=True)[0]
    exp = torch_beam(hf, base, 3, 5)
    assert got["sequences"][0] == exp[0][0]
    np.testing.assert_allclose(got["scores"][0], exp[0][1], rtol=1e-3,
                               atol=1e-3)
    # Full beam set matches (order-insensitive on ties).
    assert {tuple(s) for s in got["sequences"]} == \
        {tuple(t) for t, _ in exp}
