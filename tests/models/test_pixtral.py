"""Pixtral tower (2-D rope, RMSNorm ViT) + Mistral-3 patch merger vs HF.

Prompt layout: per-row image-token runs separated by [IMG_BREAK] with a
trailing [IMG_END]; HF receives the identical expanded ids so the feature
scatter order is compared exactly."""
import numpy as np
import pytest
import torch

from aphrodite_tpu.sampling_params import SamplingParams

IMG, BRK, END = 299, 298, 297


def _pixtral_vision():
    from transformers import PixtralVisionConfig
    return PixtralVisionConfig(hidden_size=32, num_hidden_layers=2,
                               num_attention_heads=2, head_dim=16,
                               intermediate_size=64, image_size=32,
                               patch_size=8, rope_theta=10000.0)


def _text_cfg(model="llama"):
    from transformers import LlamaConfig, MistralConfig
    cls = LlamaConfig if model == "llama" else MistralConfig
    return cls(vocab_size=320, hidden_size=64, num_hidden_layers=2,
               num_attention_heads=4, num_key_value_heads=2,
               intermediate_size=128, max_position_embeddings=512,
               tie_word_embeddings=False)


def _llm(d, **kw):
    from aphrodite_tpu.entrypoints.llm import LLM
    args = dict(model=str(d), dtype="float32", block_size=16,
                num_kv_blocks=128, max_num_batched_tokens=128,
                max_num_seqs=4, max_model_len=256, tokenizer="unused")
    args.update(kw)
    return LLM(**args)


def test_pixtral_llava_matches_hf(tmp_path):
    from transformers import LlavaConfig, LlavaForConditionalGeneration
    cfg = LlavaConfig(vision_config=_pixtral_vision().to_dict(),
                      text_config=_text_cfg().to_dict(),
                      image_token_index=IMG, vision_feature_layer=-1,
                      vision_feature_select_strategy="full",
                      pad_token_id=0)
    cfg.image_break_token_index = BRK
    cfg.image_end_token_index = END
    torch.manual_seed(0)
    hf = LlavaForConditionalGeneration(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)

    rng = np.random.RandomState(0)
    img = rng.randn(3, 16, 24).astype(np.float32)  # grid 2x3
    base = [1, 7, IMG, 9, 20, 3]
    llm = _llm(tmp_path)
    outs = llm.generate(
        [{"prompt_token_ids": base, "multi_modal_data": {"image": img}}],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))
    expanded = [1, 7,
                IMG, IMG, IMG, BRK,
                IMG, IMG, IMG, END,
                9, 20, 3]
    with torch.no_grad():
        exp = hf.generate(torch.tensor([expanded]),
                          pixel_values=torch.tensor(img[None]),
                          max_new_tokens=6, do_sample=False,
                          eos_token_id=None)
    assert outs[0].outputs[0].token_ids == exp[0][len(expanded):].tolist()


def test_pixtral_pre_expanded_prompt(tmp_path):
    """HF-processor-style prompts (row runs already present) pass through
    the run-recovery path."""
    from transformers import LlavaConfig, LlavaForConditionalGeneration
    cfg = LlavaConfig(vision_config=_pixtral_vision().to_dict(),
                      text_config=_text_cfg().to_dict(),
                      image_token_index=IMG, vision_feature_layer=-1,
                      vision_feature_select_strategy="full",
                      pad_token_id=0)
    torch.manual_seed(1)
    hf = LlavaForConditionalGeneration(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    rng = np.random.RandomState(1)
    img = rng.randn(3, 16, 16).astype(np.float32)  # grid 2x2
    expanded = [1, IMG, IMG, BRK, IMG, IMG, END, 30]
    llm = _llm(tmp_path)
    outs = llm.generate(
        [{"prompt_token_ids": expanded,
          "multi_modal_data": {"image": img}}],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))
    with torch.no_grad():
        exp = hf.generate(torch.tensor([expanded]),
                          pixel_values=torch.tensor(img[None]),
                          max_new_tokens=6, do_sample=False,
                          eos_token_id=None)
    assert outs[0].outputs[0].token_ids == exp[0][len(expanded):].tolist()


def test_mistral3_matches_hf(tmp_path):
    from transformers import (Mistral3Config,
                              Mistral3ForConditionalGeneration)
    cfg = Mistral3Config(vision_config=_pixtral_vision().to_dict(),
                         text_config=_text_cfg("mistral").to_dict(),
                         image_token_index=IMG, vision_feature_layer=-1,
                         spatial_merge_size=2,
                         multimodal_projector_bias=False, pad_token_id=0)
    cfg.image_break_token_index = BRK
    cfg.image_end_token_index = END
    torch.manual_seed(2)
    hf = Mistral3ForConditionalGeneration(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)

    rng = np.random.RandomState(2)
    img = rng.randn(3, 16, 32).astype(np.float32)  # grid 2x4 -> merged 1x2
    base = [1, 7, IMG, 9]
    expanded = [1, 7, IMG, IMG, END, 9]
    llm = _llm(tmp_path)
    outs = llm.generate(
        [{"prompt_token_ids": base, "multi_modal_data": {"image": img}}],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))
    with torch.no_grad():
        exp = hf.generate(torch.tensor([expanded]),
                          pixel_values=torch.tensor(img[None]),
                          image_sizes=torch.tensor([[16, 32]]),
                          max_new_tokens=6, do_sample=False,
                          eos_token_id=None)
    assert outs[0].outputs[0].token_ids == exp[0][len(expanded):].tolist()
