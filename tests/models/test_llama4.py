"""Llama 4 text decoder vs the HF oracle: chunked-local rope layers with L2
qk-norm, NoPE layers with attention-temperature tuning, top-1
input-scaled MoE + shared expert, interleaved dense layers."""
import pytest
import torch

from aphrodite_tpu.sampling_params import SamplingParams


def test_llama4_text_matches_hf(tmp_path):
    from transformers import Llama4TextConfig
    from transformers.models.llama4 import Llama4ForCausalLM
    cfg = Llama4TextConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=48, intermediate_size_mlp=128,
        num_local_experts=4, num_experts_per_tok=1,
        interleave_moe_layer_step=2,
        no_rope_layers=[1, 1, 1, 0],  # last layer NoPE/global
        attention_chunk_size=8, use_qk_norm=True,
        attn_temperature_tuning=True, floor_scale=4, attn_scale=0.1,
        max_position_embeddings=512, tie_word_embeddings=False,
        rope_theta=10000.0, pad_token_id=0, bos_token_id=1, eos_token_id=2,
        attention_bias=False)
    torch.manual_seed(0)
    hf = Llama4ForCausalLM(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)

    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(tmp_path), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=256, tokenizer="unused")
    # Long enough that the chunk boundary (8) matters.
    prompts = [[1, 5, 9, 20, 3, 7, 11, 13, 17, 19, 23, 29],
               [7, 8, 9, 10]]
    outs = llm.generate(prompts, SamplingParams(temperature=0.0,
                                                max_tokens=8,
                                                ignore_eos=True))
    for p, o in zip(prompts, outs):
        with torch.no_grad():
            exp = hf.generate(torch.tensor([p]), max_new_tokens=8,
                              do_sample=False,
                              eos_token_id=None)[0][len(p):].tolist()
        assert o.outputs[0].token_ids == exp


def test_llama4_vision_matches_hf(tmp_path):
    from transformers import Llama4Config
    from transformers.models.llama4 import Llama4ForConditionalGeneration
    from transformers.models.llama4.configuration_llama4 import (
        Llama4TextConfig, Llama4VisionConfig)
    import numpy as np
    IMG = 250
    vision = Llama4VisionConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, image_size=16, patch_size=8,
        pixel_shuffle_ratio=0.5, projector_input_dim=48,
        projector_output_dim=48, vision_output_dim=48,
        rope_theta=10000)
    text = Llama4TextConfig(
        vocab_size=320, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        intermediate_size=48, intermediate_size_mlp=128,
        num_local_experts=4, num_experts_per_tok=1,
        interleave_moe_layer_step=2, no_rope_layers=[1, 0],
        attention_chunk_size=8, use_qk_norm=True,
        attn_temperature_tuning=True, floor_scale=4, attn_scale=0.1,
        max_position_embeddings=512, tie_word_embeddings=False,
        rope_theta=10000.0, pad_token_id=0, bos_token_id=1,
        eos_token_id=2, attention_bias=False)
    cfg = Llama4Config(vision_config=vision.to_dict(),
                       text_config=text.to_dict(), image_token_index=IMG)
    torch.manual_seed(1)
    hf = Llama4ForConditionalGeneration(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)

    rng = np.random.RandomState(0)
    tiles = rng.randn(2, 3, 16, 16).astype(np.float32)
    # g=2, ratio 0.5 -> 1 token per tile; 2 tiles -> 2 tokens.
    base = [1, 7, IMG, 9, 20]
    expanded = [1, 7, IMG, IMG, 9, 20]
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(tmp_path), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=256, tokenizer="unused")
    outs = llm.generate(
        [{"prompt_token_ids": base, "multi_modal_data": {"image": tiles}}],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))
    with torch.no_grad():
        exp = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(tiles),
            max_new_tokens=6, do_sample=False, eos_token_id=None)
    assert outs[0].outputs[0].token_ids == exp[0][len(expanded):].tolist()
