"""PaliGemma (SigLIP + Gemma) vs the HF oracle."""
import numpy as np
import pytest
import torch

from aphrodite_tpu.sampling_params import SamplingParams

IMG = 255
N_IMG_TOKENS = 4  # (16/8)^2


def tiny_paligemma_cfg(gen2=False):
    from transformers import (GemmaConfig, Gemma2Config, PaliGemmaConfig,
                              SiglipVisionConfig)
    vision = SiglipVisionConfig(hidden_size=32, num_hidden_layers=2,
                                num_attention_heads=2, intermediate_size=64,
                                image_size=16, patch_size=8)
    tcls = Gemma2Config if gen2 else GemmaConfig
    text = tcls(vocab_size=256, hidden_size=64, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2, head_dim=16,
                intermediate_size=128, max_position_embeddings=512)
    return PaliGemmaConfig(vision_config=vision.to_dict(),
                           text_config=text.to_dict(), image_token_index=IMG,
                           projection_dim=64, pad_token_id=0)


@pytest.mark.parametrize("gen2", [False, True])
def test_paligemma_matches_hf(tmp_path, gen2):
    from transformers import PaliGemmaForConditionalGeneration
    torch.manual_seed(0)
    hf = PaliGemmaForConditionalGeneration(tiny_paligemma_cfg(gen2)).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)

    rng = np.random.RandomState(0)
    img = rng.randn(1, 3, 16, 16).astype(np.float32)
    ids = [IMG] * N_IMG_TOKENS + [1, 7, 9, 20, 3]

    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(tmp_path), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=256, tokenizer="unused")
    out = llm.generate(
        [{"prompt_token_ids": ids, "multi_modal_data": {"image": img}}],
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True))
    with torch.no_grad():
        exp = hf.generate(torch.tensor([ids]),
                          pixel_values=torch.tensor(img),
                          max_new_tokens=8, do_sample=False,
                          eos_token_id=None)[0][len(ids):].tolist()
    assert out[0].outputs[0].token_ids == exp
