"""Qwen2.5-Omni thinker vs the HF oracle: windowed audio tower and the
Qwen2.5-VL vision path, each end-to-end through the engine."""
import numpy as np
import pytest
import torch

from aphrodite_tpu.sampling_params import SamplingParams

AUD, IMG = 250, 251


def _cfg():
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import (
        Qwen2_5OmniAudioEncoderConfig, Qwen2_5OmniTextConfig,
        Qwen2_5OmniThinkerConfig, Qwen2_5OmniVisionEncoderConfig)
    audio = Qwen2_5OmniAudioEncoderConfig(
        num_mel_bins=32, d_model=48, encoder_layers=2,
        encoder_attention_heads=2, encoder_ffn_dim=96, n_window=8,
        output_dim=64, max_source_positions=64)
    vision = Qwen2_5OmniVisionEncoderConfig(
        depth=2, hidden_size=32, intermediate_size=64, num_heads=2,
        patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
        window_size=16, fullatt_block_indexes=[1], out_hidden_size=64,
        embed_dim=32, in_channels=3, spatial_patch_size=4)
    text = Qwen2_5OmniTextConfig(
        vocab_size=320, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, max_position_embeddings=512,
        tie_word_embeddings=False,
        rope_scaling={"rope_type": "default",
                      "mrope_section": [4, 2, 2]})
    return Qwen2_5OmniThinkerConfig(
        audio_config=audio.to_dict(), vision_config=vision.to_dict(),
        text_config=text.to_dict(), audio_token_index=AUD,
        image_token_index=IMG, video_token_index=252,
        vision_start_token_id=253, vision_end_token_id=254,
        audio_start_token_id=255, audio_end_token_id=256,
        position_id_per_seconds=25, seconds_per_chunk=2.0,
        pad_token_id=0, bos_token_id=1, eos_token_id=2)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from transformers.models.qwen2_5_omni.modeling_qwen2_5_omni import (
        Qwen2_5OmniThinkerForConditionalGeneration)
    torch.manual_seed(0)
    cfg = _cfg()
    cfg.architectures = ["Qwen2_5OmniModel"]
    hf = Qwen2_5OmniThinkerForConditionalGeneration(cfg).eval()
    d = tmp_path_factory.mktemp("tiny_omni")
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf


def _llm(d):
    from aphrodite_tpu.entrypoints.llm import LLM
    return LLM(model=str(d), dtype="float32", block_size=16,
               num_kv_blocks=128, max_num_batched_tokens=128,
               max_num_seqs=4, max_model_len=256, tokenizer="unused")


def test_omni_audio_matches_hf(ckpt):
    d, hf = ckpt
    rng = np.random.RandomState(0)
    L = 37  # 3 chunks of <=16 mel frames (n_window=8)
    feats = rng.randn(32, L).astype(np.float32)
    # tokens = floor((ceil(16/2)*2 + ceil(5/2)) / 2) = floor(19/2) = 9
    n_tok = 9
    base = [1, 7, AUD, 9, 20]
    expanded = [1, 7] + [AUD] * n_tok + [9, 20]
    llm = _llm(d)
    outs = llm.generate(
        [{"prompt_token_ids": base,
          "multi_modal_data": {"audio": {"input_features": feats,
                                         "feature_len": L}}},
         [5, 6, 7, 8]],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))
    fam = np.zeros((1, L), np.int64) + 1
    with torch.no_grad():
        exp = hf.generate(
            input_ids=torch.tensor([expanded]),
            input_features=torch.tensor(feats[None]),
            feature_attention_mask=torch.tensor(fam),
            max_new_tokens=6, do_sample=False, eos_token_id=None)
        exp_txt = hf.generate(torch.tensor([[5, 6, 7, 8]]),
                              max_new_tokens=6, do_sample=False,
                              eos_token_id=None)
    assert outs[0].outputs[0].token_ids == exp[0][len(expanded):].tolist()
    assert outs[1].outputs[0].token_ids == exp_txt[0][4:].tolist()


def test_omni_image_matches_hf(ckpt):
    d, hf = ckpt
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        Qwen2VLImageProcessor)
    proc = Qwen2VLImageProcessor(patch_size=4, temporal_patch_size=2,
                                 merge_size=2, min_pixels=16 * 16,
                                 max_pixels=64 * 64)
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (32, 32, 3)).astype(np.uint8)
    out = proc(images=[img], return_tensors="np")
    grid = out["image_grid_thw"]
    n_tok = int(np.prod(grid[0])) // 4
    base = [1, 7, 253, IMG, 9]
    expanded = [1, 7, 253] + [IMG] * n_tok + [9]
    llm = _llm(d)
    outs = llm.generate(
        [{"prompt_token_ids": base,
          "multi_modal_data": {"image": dict(out)}}],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))
    with torch.no_grad():
        exp = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(out["pixel_values"]),
            image_grid_thw=torch.tensor(grid),
            max_new_tokens=6, do_sample=False, eos_token_id=None)
    assert outs[0].outputs[0].token_ids == exp[0][len(expanded):].tolist()
