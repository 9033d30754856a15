"""Phi-3 and Qwen3 vs HF oracles."""
import pytest
import torch

from aphrodite_tpu.sampling_params import SamplingParams


def _check(tmp_path, cfg, n_new=8):
    from transformers import AutoModelForCausalLM
    torch.manual_seed(0)
    hf = AutoModelForCausalLM.from_config(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(tmp_path), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=256, tokenizer="unused")
    prompts = [[1, 5, 9, 20, 3], [7, 8, 9, 10, 11, 12]]
    outs = llm.generate(prompts, SamplingParams(temperature=0.0,
                                                max_tokens=n_new,
                                                ignore_eos=True))
    for p, out in zip(prompts, outs):
        with torch.no_grad():
            exp = hf.generate(torch.tensor([p]), max_new_tokens=n_new,
                              do_sample=False,
                              eos_token_id=None)[0][len(p):].tolist()
        assert out.outputs[0].token_ids == exp, p


def test_phi3_matches_hf(tmp_path):
    from transformers import Phi3Config
    cfg = Phi3Config(vocab_size=256, hidden_size=64, num_hidden_layers=2,
                     num_attention_heads=4, num_key_value_heads=2,
                     intermediate_size=128, max_position_embeddings=512,
                     tie_word_embeddings=False, pad_token_id=0,
                     bos_token_id=1, eos_token_id=2)
    _check(tmp_path, cfg)


def test_qwen3_matches_hf(tmp_path):
    from transformers import Qwen3Config
    cfg = Qwen3Config(vocab_size=256, hidden_size=64, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      intermediate_size=128, head_dim=16,
                      max_position_embeddings=512,
                      tie_word_embeddings=False)
    _check(tmp_path, cfg)
