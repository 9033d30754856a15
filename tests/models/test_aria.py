"""Aria (Idefics3 tower + cross-attn resampler + grouped-MoE llama) vs HF."""
import numpy as np
import pytest
import torch

from aphrodite_tpu.sampling_params import SamplingParams

IMG = 250


def test_aria_matches_hf(tmp_path):
    from transformers import (AriaConfig, AriaForConditionalGeneration,
                              Idefics3VisionConfig)
    from transformers.models.aria.configuration_aria import AriaTextConfig
    vc = Idefics3VisionConfig(hidden_size=32, num_hidden_layers=2,
                              num_attention_heads=2, intermediate_size=64,
                              image_size=16, patch_size=8)  # 4 patches
    tc = AriaTextConfig(vocab_size=256, hidden_size=64,
                        intermediate_size=32, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        moe_num_experts=4, moe_topk=2,
                        moe_num_shared_experts=1,
                        max_position_embeddings=128, pad_token_id=0,
                        bos_token_id=1, eos_token_id=2,
                        tie_word_embeddings=False)
    cfg = AriaConfig(vision_config=vc.to_dict(), text_config=tc.to_dict(),
                     image_token_index=IMG,
                     projector_patch_to_query_dict={4: 2})
    torch.manual_seed(0)
    hf = AriaForConditionalGeneration(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)

    rng = np.random.RandomState(0)
    img = rng.randn(1, 3, 16, 16).astype(np.float32)
    base = [1, 7, IMG, 9, 20]
    expanded = [1, 7, IMG, IMG, 9, 20]  # 2 queries per image
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(tmp_path), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=120, tokenizer="unused")
    outs = llm.generate(
        [{"prompt_token_ids": base, "multi_modal_data": {"image": img}},
         [5, 6, 7, 8]],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))
    with torch.no_grad():
        exp = hf.generate(input_ids=torch.tensor([expanded]),
                          pixel_values=torch.tensor(img),
                          pixel_mask=torch.ones(1, 16, 16,
                                                dtype=torch.long),
                          max_new_tokens=6, do_sample=False,
                          eos_token_id=None)
        exp_txt = hf.generate(torch.tensor([[5, 6, 7, 8]]),
                              max_new_tokens=6, do_sample=False,
                              eos_token_id=None)
    assert outs[0].outputs[0].token_ids == exp[0][len(expanded):].tolist()
    assert outs[1].outputs[0].token_ids == exp_txt[0][4:].tolist()
