"""Quantized MoE serving (reference experts_int8 semantics) for Mixtral
and DeepSeek: engine runs for every method; w8a16 on a lossless grid must
be token-exact vs fp."""
import numpy as np
import pytest
import torch

from aphrodite_tpu.sampling_params import SamplingParams

KW = dict(dtype="float32", block_size=16, num_kv_blocks=128,
          max_num_batched_tokens=64, max_num_seqs=4, max_model_len=128,
          tokenizer="unused")
PARAMS = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)


def _snap_int8_grid(model):
    with torch.no_grad():
        for name, mod in model.named_modules():
            if isinstance(mod, torch.nn.Linear) and (
                    "proj" in name or ".w1" in name or ".w2" in name
                    or ".w3" in name):
                w = mod.weight.data
                scale = torch.clamp(w.abs().amax(dim=1, keepdim=True),
                                    min=1e-8) / 127.0
                mod.weight.data = torch.round(w / scale) * scale
    return model


@pytest.fixture(scope="module")
def mixtral_ckpt(tmp_path_factory):
    from transformers import MixtralConfig, MixtralForCausalLM
    d = tmp_path_factory.mktemp("mixtral_q")
    torch.manual_seed(0)
    cfg = MixtralConfig(vocab_size=256, hidden_size=64, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        intermediate_size=96, num_local_experts=4,
                        num_experts_per_tok=2, max_position_embeddings=256,
                        tie_word_embeddings=False)
    _snap_int8_grid(MixtralForCausalLM(cfg)).save_pretrained(
        d, safe_serialization=True)
    return d


@pytest.fixture(scope="module")
def deepseek_ckpt(tmp_path_factory):
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM
    d = tmp_path_factory.mktemp("ds_q")
    torch.manual_seed(0)
    cfg = DeepseekV2Config(
        vocab_size=256, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4, intermediate_size=96,
        kv_lora_rank=32, q_lora_rank=24, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, head_dim=8,
        max_position_embeddings=256, tie_word_embeddings=False,
        n_routed_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
        n_shared_experts=1, first_k_dense_replace=1, topk_method="greedy")
    _snap_int8_grid(DeepseekV2ForCausalLM(cfg)).save_pretrained(
        d, safe_serialization=True)
    return d


def _run(ckpt, quant=None):
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(ckpt), quantization=quant, **KW)
    return [o.outputs[0].token_ids
            for o in llm.generate([[3, 7, 11], [5, 6]], PARAMS)]


def test_mixtral_w8a16_lossless(mixtral_ckpt):
    assert _run(mixtral_ckpt, "w8a16") == _run(mixtral_ckpt)


@pytest.mark.parametrize("method", ["int8", "fp8"])
def test_mixtral_runs_quantized(mixtral_ckpt, method):
    outs = _run(mixtral_ckpt, method)
    assert all(len(o) == 6 for o in outs)


def test_deepseek_w8a16_lossless(deepseek_ckpt):
    assert _run(deepseek_ckpt, "w8a16") == _run(deepseek_ckpt)


@pytest.mark.parametrize("method", ["int8", "fp8"])
def test_deepseek_runs_quantized(deepseek_ckpt, method):
    outs = _run(deepseek_ckpt, method)
    assert all(len(o) == 6 for o in outs)
