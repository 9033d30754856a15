"""GPT-2 / OPT / GPT-NeoX vs HF oracles (classic decoder mechanisms:
learned positions, fused QKV layouts, post-LN, parallel residual,
partial rotary)."""
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


def test_gpt2_matches_hf(tmp_path):
    from transformers import GPT2Config
    _check(tmp_path, GPT2Config(
        vocab_size=256, n_embd=64, n_layer=2, n_head=4, n_positions=512,
        bos_token_id=1, eos_token_id=2))


def test_opt_matches_hf(tmp_path):
    from transformers import OPTConfig
    _check(tmp_path, OPTConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, ffn_dim=128, max_position_embeddings=512,
        do_layer_norm_before=True, pad_token_id=0, bos_token_id=1,
        eos_token_id=2, word_embed_proj_dim=64))


def test_opt_post_ln_matches_hf(tmp_path):
    """OPT-350m style: do_layer_norm_before=False (post-LN residuals)."""
    from transformers import OPTConfig
    _check(tmp_path, OPTConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, ffn_dim=128, max_position_embeddings=512,
        do_layer_norm_before=False, pad_token_id=0, bos_token_id=1,
        eos_token_id=2, word_embed_proj_dim=64))


def test_gpt_neox_matches_hf(tmp_path):
    from transformers import GPTNeoXConfig
    _check(tmp_path, GPTNeoXConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=512, rotary_pct=0.25,
        use_parallel_residual=True, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2))


def test_gpt_neox_sequential_residual(tmp_path):
    from transformers import GPTNeoXConfig
    _check(tmp_path, GPTNeoXConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=512, rotary_pct=1.0,
        use_parallel_residual=False, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2))
