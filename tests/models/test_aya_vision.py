"""Aya Vision (SigLIP + SwiGLU pixel-shuffle projector + Cohere) vs HF."""
import numpy as np
import pytest
import torch

from aphrodite_tpu.sampling_params import SamplingParams

IMG = 250


def test_aya_vision_matches_hf(tmp_path):
    from transformers import (AyaVisionConfig,
                              AyaVisionForConditionalGeneration,
                              CohereConfig, SiglipVisionConfig)
    vision = SiglipVisionConfig(hidden_size=32, num_hidden_layers=2,
                                num_attention_heads=2,
                                intermediate_size=64, image_size=16,
                                patch_size=4)  # g=4
    text = CohereConfig(vocab_size=320, hidden_size=64,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, intermediate_size=128,
                        max_position_embeddings=256, logit_scale=0.8,
                        use_qk_norm=False, pad_token_id=0, bos_token_id=1,
                        eos_token_id=2)
    cfg = AyaVisionConfig(vision_config=vision.to_dict(),
                          text_config=text.to_dict(), image_token_index=IMG,
                          downsample_factor=2,
                          alignment_intermediate_size=96,
                          vision_feature_layer=-1,
                          vision_feature_select_strategy="full")
    torch.manual_seed(0)
    hf = AyaVisionForConditionalGeneration(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)

    rng = np.random.RandomState(0)
    tiles = rng.randn(2, 3, 16, 16).astype(np.float32)
    # g=4, ds=2 -> 4 tokens/tile; 2 tiles -> 8.
    base = [1, 7, IMG, 9, 20]
    expanded = [1, 7] + [IMG] * 8 + [9, 20]
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(tmp_path), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=128, tokenizer="unused")
    outs = llm.generate(
        [{"prompt_token_ids": base, "multi_modal_data": {"image": tiles}}],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))
    with torch.no_grad():
        exp = hf.generate(input_ids=torch.tensor([expanded]),
                          pixel_values=torch.tensor(tiles),
                          max_new_tokens=6, do_sample=False,
                          eos_token_id=None)
    assert outs[0].outputs[0].token_ids == exp[0][len(expanded):].tolist()
