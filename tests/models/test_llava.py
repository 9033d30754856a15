"""LLaVA (vision-language) vs the HF oracle.

Covers: ViT tower + projector numerics, placeholder expansion, the
device-side embedding scatter, image batching with a text-only request in
the same batch, chunked prefill across an image span, and prefix-cache
isolation between different images with identical token ids."""
import numpy as np
import pytest
import torch

from aphrodite_tpu.sampling_params import SamplingParams

IMG = 255  # image_token_index


def tiny_llava_cfg():
    from transformers import CLIPVisionConfig, LlamaConfig, LlavaConfig
    vision = CLIPVisionConfig(hidden_size=32, num_hidden_layers=2,
                              num_attention_heads=2, intermediate_size=64,
                              image_size=16, patch_size=8)
    text = LlamaConfig(vocab_size=256, hidden_size=64, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=2,
                       intermediate_size=128, max_position_embeddings=512,
                       tie_word_embeddings=False)
    return LlavaConfig(vision_config=vision.to_dict(),
                       text_config=text.to_dict(), image_token_index=IMG,
                       vision_feature_layer=-2,
                       vision_feature_select_strategy="default",
                       pad_token_id=0)


N_IMG_TOKENS = 4  # (16/8)^2


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from transformers import LlavaForConditionalGeneration
    torch.manual_seed(0)
    d = tmp_path_factory.mktemp("tiny_llava")
    hf = LlavaForConditionalGeneration(tiny_llava_cfg()).eval()
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf


def _hf_generate(hf, ids, pixel_values, n_new):
    with torch.no_grad():
        out = hf.generate(
            torch.tensor([ids]),
            pixel_values=torch.tensor(pixel_values) if pixel_values is not
            None else None,
            max_new_tokens=n_new, do_sample=False, eos_token_id=None)
    return out[0][len(ids):].tolist()


def _llm(d, **kw):
    from aphrodite_tpu.entrypoints.llm import LLM
    args = dict(model=str(d), dtype="float32", block_size=16,
                num_kv_blocks=128, max_num_batched_tokens=64,
                max_num_seqs=4, max_model_len=256, tokenizer="unused")
    args.update(kw)
    return LLM(**args)


def test_llava_matches_hf(ckpt):
    d, hf = ckpt
    rng = np.random.RandomState(0)
    img1 = rng.randn(1, 3, 16, 16).astype(np.float32)
    img2 = rng.randn(1, 3, 16, 16).astype(np.float32)
    # Placeholder NOT pre-expanded: the processor expands IMG -> 4 tokens.
    base = [1, 7, IMG, 9, 20, 3]
    expanded = [1, 7] + [IMG] * N_IMG_TOKENS + [9, 20, 3]

    llm = _llm(d)
    prompts = [
        {"prompt_token_ids": base, "multi_modal_data": {"image": img1}},
        {"prompt_token_ids": base, "multi_modal_data": {"image": img2}},
        [5, 6, 7, 8],  # text-only request in the same batch
    ]
    outs = llm.generate(prompts, SamplingParams(temperature=0.0,
                                                max_tokens=8,
                                                ignore_eos=True))
    exp1 = _hf_generate(hf, expanded, img1, 8)
    exp2 = _hf_generate(hf, expanded, img2, 8)
    exp3 = _hf_generate(hf, [5, 6, 7, 8], None, 8)
    assert outs[0].outputs[0].token_ids == exp1
    assert outs[1].outputs[0].token_ids == exp2
    assert outs[2].outputs[0].token_ids == exp3
    # Same prompt tokens, different images => mm_hash must keep these
    # prefix-cache-isolated (outputs above already differ if so).
    assert exp1 != exp2, "degenerate test: pick different images"


def test_llava_chunked_prefill_across_image(ckpt):
    """Force a chunk boundary inside the image span: scatter must land only
    the scheduled rows of the span each step."""
    d, hf = ckpt
    rng = np.random.RandomState(1)
    img = rng.randn(1, 3, 16, 16).astype(np.float32)
    prefix = [2] * 11
    base = prefix + [IMG] + [9, 4] * 8
    expanded = prefix + [IMG] * N_IMG_TOKENS + [9, 4] * 8
    llm = _llm(d, max_num_batched_tokens=16)  # prompt 31 -> 2+ chunks
    outs = llm.generate(
        [{"prompt_token_ids": base, "multi_modal_data": {"image": img}}],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))
    assert outs[0].outputs[0].token_ids == _hf_generate(hf, expanded, img, 6)


def test_llava_pre_expanded_prompt(ckpt):
    """HF-processor-style prompts (placeholders already expanded) pass
    through unchanged."""
    d, hf = ckpt
    rng = np.random.RandomState(2)
    img = rng.randn(1, 3, 16, 16).astype(np.float32)
    expanded = [1] + [IMG] * N_IMG_TOKENS + [30, 40]
    llm = _llm(d)
    outs = llm.generate(
        [{"prompt_token_ids": expanded, "multi_modal_data": {"image": img}}],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))
    assert outs[0].outputs[0].token_ids == _hf_generate(hf, expanded, img, 6)
