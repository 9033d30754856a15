"""Gemma 1/2 vs HF oracle on tiny random checkpoints."""
import numpy as np
import pytest

from aphrodite_tpu.sampling_params import SamplingParams


def _make_ckpt(tmpdir, cfg):
    import torch
    from transformers import AutoModelForCausalLM
    torch.manual_seed(0)
    model = AutoModelForCausalLM.from_config(cfg).eval()
    model.save_pretrained(tmpdir, safe_serialization=True)
    return model


def _check(d, hf_model, max_tokens=8):
    import torch
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(d), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=256, tokenizer="unused")
    prompts = [[1, 5, 9, 20, 3], list(range(60, 100))]
    params = SamplingParams(temperature=0.0, max_tokens=max_tokens,
                            ignore_eos=True)
    outs = llm.generate(prompts, params)
    for prompt, out in zip(prompts, outs):
        with torch.no_grad():
            exp = hf_model.generate(
                torch.tensor([prompt]), max_new_tokens=max_tokens,
                do_sample=False, eos_token_id=None)[0][len(prompt):].tolist()
        assert out.outputs[0].token_ids == exp, prompt


def test_gemma1_matches_hf(tmp_path):
    from transformers import GemmaConfig
    cfg = GemmaConfig(vocab_size=256, hidden_size=64, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      intermediate_size=128, head_dim=16,
                      max_position_embeddings=512)
    hf = _make_ckpt(tmp_path, cfg)
    _check(tmp_path, hf)


def test_gemma2_matches_hf(tmp_path):
    from transformers import Gemma2Config
    cfg = Gemma2Config(vocab_size=256, hidden_size=64, num_hidden_layers=4,
                       num_attention_heads=4, num_key_value_heads=2,
                       intermediate_size=128, head_dim=16,
                       max_position_embeddings=512, sliding_window=16,
                       query_pre_attn_scalar=16,
                       attn_logit_softcapping=50.0,
                       final_logit_softcapping=30.0)
    hf = _make_ckpt(tmp_path, cfg)
    _check(tmp_path, hf)


def test_gemma3_text(tmp_path):
    """Gemma-3: QK-norm + dual rope bases + 5:1 sliding/global pattern."""
    from transformers import Gemma3TextConfig
    from tests.models.test_llama_variants import _check
    _check(tmp_path, Gemma3TextConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, query_pre_attn_scalar=16, sliding_window=8,
        sliding_window_pattern=2, rope_theta=1000000.0,
        rope_local_base_freq=10000.0, max_position_embeddings=512,
        pad_token_id=0, bos_token_id=1, eos_token_id=2))
