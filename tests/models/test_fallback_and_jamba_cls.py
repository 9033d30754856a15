"""TransformersForCausalLM fallback + JambaForSequenceClassification."""
import json

import numpy as np
import pytest
import torch

from aphrodite_tpu.sampling_params import SamplingParams


def test_transformers_fallback_serves_llama_schema(tmp_path):
    """A llama-schema checkpoint under an unlisted architecture name is
    served when the fallback is requested explicitly."""
    from transformers import AutoModelForCausalLM, LlamaConfig
    cfg = LlamaConfig(vocab_size=256, hidden_size=64, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      intermediate_size=128, max_position_embeddings=256,
                      tie_word_embeddings=False)
    torch.manual_seed(0)
    hf = AutoModelForCausalLM.from_config(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    d = json.loads((tmp_path / "config.json").read_text())
    d["architectures"] = ["SomeUnlistedForCausalLM"]
    (tmp_path / "config.json").write_text(json.dumps(d))

    from aphrodite_tpu.entrypoints.llm import LLM
    # Unknown arch without opt-in: clear error.
    with pytest.raises(ValueError, match="not supported"):
        LLM(model=str(tmp_path), dtype="float32", block_size=16,
            num_kv_blocks=64, max_num_seqs=2, max_model_len=128,
            tokenizer="unused")
    llm = LLM(model=str(tmp_path), dtype="float32", block_size=16,
              num_kv_blocks=64, max_num_seqs=2, max_model_len=128,
              tokenizer="unused", architecture="TransformersForCausalLM")
    p = [1, 5, 9, 20, 3]
    outs = llm.generate([p], SamplingParams(temperature=0.0, max_tokens=8,
                                            ignore_eos=True))
    with torch.no_grad():
        exp = hf.generate(torch.tensor([p]), max_new_tokens=8,
                          do_sample=False,
                          eos_token_id=None)[0][len(p):].tolist()
    assert outs[0].outputs[0].token_ids == exp


def test_jamba_seq_classification_matches_hf(tmp_path):
    from transformers import JambaConfig, JambaForSequenceClassification
    cfg = JambaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        num_experts=1, num_experts_per_tok=1, attn_layer_period=2,
        attn_layer_offset=1, expert_layer_period=100, expert_layer_offset=1,
        mamba_expand=2, mamba_d_state=16, mamba_d_conv=4, mamba_dt_rank=8,
        num_labels=3, pad_token_id=0, max_position_embeddings=128,
        use_mamba_kernels=False,
        architectures=["JambaForSequenceClassification"])
    torch.manual_seed(0)
    hf = JambaForSequenceClassification(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(tmp_path), dtype="float32", tokenizer="unused",
              device="cpu")
    prompts = [[5, 9, 17, 3], [2, 4, 6, 8, 10, 12]]
    vecs = llm.embed(prompts, pooling="last", normalize=False)
    for p, v in zip(prompts, vecs):
        with torch.no_grad():
            out = hf(torch.tensor([p])).logits[0].numpy()
        np.testing.assert_allclose(np.asarray(v), out, rtol=2e-3, atol=2e-3)
