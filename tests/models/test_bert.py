"""BERT encoder vs HF oracle (embedding-model category)."""
import numpy as np
import pytest
import torch


def test_bert_embed_matches_hf(tmp_path):
    from transformers import BertConfig, BertModel
    cfg = BertConfig(vocab_size=128, hidden_size=48, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=96,
                     max_position_embeddings=64,
                     architectures=["BertModel"])
    torch.manual_seed(0)
    hf = BertModel(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)

    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(tmp_path), dtype="float32", tokenizer="unused",
              device="cpu")
    prompts = [[5, 9, 17, 3], [2, 4, 6, 8, 10, 12]]
    vecs = llm.embed(prompts, pooling="mean", normalize=False)
    for p, v in zip(prompts, vecs):
        with torch.no_grad():
            out = hf(torch.tensor([p])).last_hidden_state[0].numpy()
        np.testing.assert_allclose(np.asarray(v), out.mean(0), rtol=2e-3,
                                   atol=2e-3)
