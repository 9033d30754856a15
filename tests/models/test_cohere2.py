"""Cohere2 (Command-R7B): sliding/global layer pattern where global layers
use NO positional encoding — vs the HF oracle."""
import pytest
import torch

from aphrodite_tpu.sampling_params import SamplingParams


def test_cohere2_matches_hf(tmp_path):
    from transformers import AutoModelForCausalLM, Cohere2Config
    cfg = Cohere2Config(
        vocab_size=256, hidden_size=64, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, max_position_embeddings=512,
        sliding_window=8, sliding_window_pattern=2, logit_scale=0.8,
        layer_norm_eps=1e-5, tie_word_embeddings=True,
        bos_token_id=1, eos_token_id=2, pad_token_id=0)
    torch.manual_seed(0)
    hf = AutoModelForCausalLM.from_config(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)

    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(tmp_path), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=256, tokenizer="unused")
    # Long enough prompts that the sliding window (8) actually clips.
    prompts = [[1, 5, 9, 20, 3, 7, 11, 13, 17, 19, 23, 29],
               [7, 8, 9, 10, 11]]
    outs = llm.generate(prompts, SamplingParams(temperature=0.0,
                                                max_tokens=8,
                                                ignore_eos=True))
    for p, o in zip(prompts, outs):
        with torch.no_grad():
            exp = hf.generate(torch.tensor([p]), max_new_tokens=8,
                              do_sample=False,
                              eos_token_id=None)[0][len(p):].tolist()
        assert o.outputs[0].token_ids == exp
