"""BLIP-2 (ViT + Q-Former + OPT) vs the HF oracle."""
import numpy as np
import pytest
import torch

from aphrodite_tpu.sampling_params import SamplingParams

IMG = 250


def test_blip2_matches_hf(tmp_path):
    from transformers import (Blip2Config, Blip2ForConditionalGeneration,
                              Blip2QFormerConfig, Blip2VisionConfig,
                              OPTConfig)
    vision = Blip2VisionConfig(hidden_size=32, num_hidden_layers=2,
                               num_attention_heads=2, intermediate_size=64,
                               image_size=16, patch_size=8)
    qformer = Blip2QFormerConfig(hidden_size=48, num_hidden_layers=2,
                                 num_attention_heads=2,
                                 intermediate_size=96,
                                 cross_attention_frequency=2,
                                 encoder_hidden_size=32, vocab_size=30)
    text = OPTConfig(vocab_size=256, hidden_size=64, num_hidden_layers=2,
                     num_attention_heads=4, ffn_dim=128,
                     max_position_embeddings=128, word_embed_proj_dim=64,
                     bos_token_id=1, eos_token_id=2, pad_token_id=0)
    cfg = Blip2Config(vision_config=vision.to_dict(),
                      qformer_config=qformer.to_dict(),
                      text_config=text.to_dict(), num_query_tokens=4,
                      image_token_index=IMG)
    torch.manual_seed(0)
    hf = Blip2ForConditionalGeneration(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)

    rng = np.random.RandomState(0)
    img = rng.randn(1, 3, 16, 16).astype(np.float32)
    base = [1, 7, IMG, 9, 20]
    expanded = [1, 7] + [IMG] * 4 + [9, 20]
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(tmp_path), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=120, tokenizer="unused")
    outs = llm.generate(
        [{"prompt_token_ids": base, "multi_modal_data": {"image": img}}],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))
    with torch.no_grad():
        exp = hf.generate(input_ids=torch.tensor([expanded]),
                          pixel_values=torch.tensor(img),
                          max_new_tokens=6, do_sample=False,
                          eos_token_id=None)
    got = outs[0].outputs[0].token_ids
    exp_ids = exp[0].tolist()
    # HF generate may echo the prompt for blip2; compare the tail.
    assert got == exp_ids[-len(got):]
