"""Mixtral MoE vs HF oracle on a tiny random checkpoint."""
import numpy as np
import pytest

from aphrodite_tpu.sampling_params import SamplingParams


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    import torch
    from transformers import AutoModelForCausalLM, MixtralConfig
    d = tmp_path_factory.mktemp("tiny_mixtral")
    cfg = MixtralConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=96, num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=512, tie_word_embeddings=False)
    torch.manual_seed(0)
    model = AutoModelForCausalLM.from_config(cfg).eval()
    model.save_pretrained(d, safe_serialization=True)
    return d, model


def test_mixtral_greedy_matches_hf(ckpt):
    import torch
    from aphrodite_tpu.entrypoints.llm import LLM
    d, hf_model = ckpt
    llm = LLM(model=str(d), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=256, tokenizer="unused")
    prompts = [[1, 5, 9, 20, 3], [7, 8, 9, 10]]
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    outs = llm.generate(prompts, params)
    for prompt, out in zip(prompts, outs):
        with torch.no_grad():
            exp = hf_model.generate(
                torch.tensor([prompt]), max_new_tokens=8, do_sample=False,
                eos_token_id=None)[0][len(prompt):].tolist()
        assert out.outputs[0].token_ids == exp
