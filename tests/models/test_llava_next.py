"""LLaVA-Next / Next-Video / OneVision (anyres) vs HF oracles.

Covers: anyres tile packing (base + spatial grid, unpad, image_newline),
video pooling (Next-Video avg-pool pre-projector; OneVision bilinear
post-projector + trailing newline), the multi-media adapter, and mixed
image+text batches."""
import numpy as np
import pytest
import torch

from aphrodite_tpu.sampling_params import SamplingParams

IMG, VID = 299, 298
PINPOINTS = [[16, 32], [32, 16], [32, 32]]


def _vision_cfg():
    from transformers import CLIPVisionConfig
    return CLIPVisionConfig(hidden_size=32, num_hidden_layers=2,
                            num_attention_heads=2, intermediate_size=64,
                            image_size=16, patch_size=8)


def _text_cfg():
    from transformers import LlamaConfig
    return LlamaConfig(vocab_size=320, hidden_size=64, num_hidden_layers=2,
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


def _proc_image(img_hw):
    """Run the HF LlavaNext image processor on a random image -> dict."""
    from transformers.models.llava_next.image_processing_llava_next import (
        LlavaNextImageProcessor)
    proc = LlavaNextImageProcessor(
        size={"shortest_edge": 16}, crop_size={"height": 16, "width": 16},
        image_grid_pinpoints=PINPOINTS)
    rng = np.random.RandomState(sum(img_hw))
    img = rng.randint(0, 255, (img_hw[0], img_hw[1], 3)).astype(np.uint8)
    return proc(images=[img], return_tensors="np")


@pytest.mark.parametrize("img_hw", [(20, 36), (16, 16), (40, 24)])
def test_llava_next_matches_hf(tmp_path, img_hw):
    from transformers import (LlavaNextConfig,
                              LlavaNextForConditionalGeneration)
    cfg = LlavaNextConfig(
        vision_config=_vision_cfg().to_dict(),
        text_config=_text_cfg().to_dict(), image_token_index=IMG,
        image_grid_pinpoints=PINPOINTS, vision_feature_layer=-2,
        vision_feature_select_strategy="default", pad_token_id=0)
    torch.manual_seed(0)
    hf = LlavaNextForConditionalGeneration(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)

    out = _proc_image(img_hw)
    base = [1, 7, IMG, 9, 20, 3]
    llm = _llm(tmp_path)
    outs = llm.generate(
        [{"prompt_token_ids": base,
          "multi_modal_data": {"image": dict(out)}},
         [5, 6, 7, 8]],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))

    # Recover the expanded prompt from our adapter to drive HF.
    from aphrodite_tpu.multimodal import LlavaNextAdapter
    pv, expanded, spans, extra = LlavaNextAdapter(cfg).process(
        dict(out), base)
    with torch.no_grad():
        exp = hf.generate(
            torch.tensor([expanded]),
            pixel_values=torch.tensor(out["pixel_values"]),
            image_sizes=torch.tensor(out["image_sizes"]),
            max_new_tokens=6, do_sample=False, eos_token_id=None)
        exp_txt = hf.generate(torch.tensor([[5, 6, 7, 8]]),
                              max_new_tokens=6, do_sample=False,
                              eos_token_id=None)
    assert outs[0].outputs[0].token_ids == \
        exp[0][len(expanded):].tolist()
    assert outs[1].outputs[0].token_ids == exp_txt[0][4:].tolist()


def test_llava_next_video_matches_hf(tmp_path):
    from transformers import (LlavaNextVideoConfig,
                              LlavaNextVideoForConditionalGeneration)
    cfg = LlavaNextVideoConfig(
        vision_config=_vision_cfg().to_dict(),
        text_config=_text_cfg().to_dict(), image_token_index=IMG,
        video_token_index=VID, image_grid_pinpoints=PINPOINTS,
        vision_feature_layer=-2, vision_feature_select_strategy="default",
        spatial_pool_mode="average", spatial_pool_stride=2, pad_token_id=0)
    torch.manual_seed(1)
    hf = LlavaNextVideoForConditionalGeneration(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)

    rng = np.random.RandomState(0)
    video = rng.randn(3, 3, 16, 16).astype(np.float32)  # 3 frames
    base = [1, 7, VID, 9, 20, 3]
    llm = _llm(tmp_path)
    outs = llm.generate(
        [{"prompt_token_ids": base, "multi_modal_data": {"video": video}}],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))
    # g=2, stride=2 -> 1 token per frame, no newline.
    expanded = [1, 7] + [VID] * 3 + [9, 20, 3]
    with torch.no_grad():
        exp = hf.generate(
            torch.tensor([expanded]),
            pixel_values_videos=torch.tensor(video[None]),
            max_new_tokens=6, do_sample=False, eos_token_id=None)
    assert outs[0].outputs[0].token_ids == exp[0][len(expanded):].tolist()


def test_llava_onevision_image_and_video(tmp_path):
    from transformers import (LlavaOnevisionConfig,
                              LlavaOnevisionForConditionalGeneration)
    cfg = LlavaOnevisionConfig(
        vision_config=_vision_cfg().to_dict(),
        text_config=_text_cfg().to_dict(), image_token_index=IMG,
        video_token_index=VID, image_grid_pinpoints=PINPOINTS,
        vision_feature_layer=-2, vision_feature_select_strategy="default",
        vision_aspect_ratio="anyres_max_9", pad_token_id=0)
    torch.manual_seed(2)
    hf = LlavaOnevisionForConditionalGeneration(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    llm = _llm(tmp_path)

    out = _proc_image((20, 36))
    base_i = [1, 7, IMG, 9]
    from aphrodite_tpu.multimodal import LlavaNextAdapter
    _, expanded_i, _, _ = LlavaNextAdapter(cfg).process(dict(out), base_i)

    rng = np.random.RandomState(3)
    video = rng.randn(2, 3, 16, 16).astype(np.float32)
    base_v = [1, 7, VID, 9]
    # g=2 -> ceil(g/2)^2 = 1 token/frame + 1 trailing newline.
    expanded_v = [1, 7] + [VID] * 3 + [9]

    outs = llm.generate(
        [{"prompt_token_ids": base_i,
          "multi_modal_data": {"image": dict(out)}},
         {"prompt_token_ids": base_v,
          "multi_modal_data": {"video": video}}],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))
    with torch.no_grad():
        exp_i = hf.generate(
            torch.tensor([expanded_i]),
            pixel_values=torch.tensor(out["pixel_values"]),
            image_sizes=torch.tensor(out["image_sizes"]),
            max_new_tokens=6, do_sample=False, eos_token_id=None)
        exp_v = hf.generate(
            torch.tensor([expanded_v]),
            pixel_values_videos=torch.tensor(video[None]),
            max_new_tokens=6, do_sample=False, eos_token_id=None)
    assert outs[0].outputs[0].token_ids == \
        exp_i[0][len(expanded_i):].tolist()
    assert outs[1].outputs[0].token_ids == \
        exp_v[0][len(expanded_v):].tolist()
