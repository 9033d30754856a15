"""Qwen2-VL / Qwen2.5-VL vs HF oracles: mrope positions (text + image
spans + decode deltas through the multi-step scan), the packed-patch ViT
(per-frame full attention; 2.5's window attention), and the merger."""
import numpy as np
import pytest
import torch

from aphrodite_tpu.sampling_params import SamplingParams

IMG, VSTART = 250, 249


def _vision_cfg_2vl():
    return {"depth": 2, "embed_dim": 32, "num_heads": 2, "hidden_size": 64,
            "patch_size": 4, "temporal_patch_size": 2,
            "spatial_merge_size": 2, "mlp_ratio": 2, "in_channels": 3}


def _vision_cfg_25():
    return {"depth": 2, "hidden_size": 32, "num_heads": 2,
            "out_hidden_size": 64, "intermediate_size": 48,
            "patch_size": 4, "temporal_patch_size": 2,
            "spatial_merge_size": 2, "window_size": 8,
            "fullatt_block_indexes": [1], "in_channels": 3}


def _text_cfg():
    return {"vocab_size": 256, "hidden_size": 64, "intermediate_size": 128,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "num_key_value_heads": 2, "max_position_embeddings": 512,
            "rope_theta": 10000.0, "rms_norm_eps": 1e-6,
            "rope_scaling": {"type": "mrope", "mrope_section": [2, 3, 3]},
            "tie_word_embeddings": False}


def _mk(tmp_path, v25: bool):
    torch.manual_seed(0)
    if v25:
        from transformers import (Qwen2_5_VLConfig,
                                  Qwen2_5_VLForConditionalGeneration as Cls)
        cfg = Qwen2_5_VLConfig(
            text_config=_text_cfg(), vision_config=_vision_cfg_25(),
            image_token_id=IMG, video_token_id=248,
            vision_start_token_id=VSTART, vision_end_token_id=247,
            bos_token_id=1, eos_token_id=2, pad_token_id=0)
    else:
        from transformers import (Qwen2VLConfig,
                                  Qwen2VLForConditionalGeneration as Cls)
        cfg = Qwen2VLConfig(
            text_config=_text_cfg(), vision_config=_vision_cfg_2vl(),
            image_token_id=IMG, video_token_id=248,
            vision_start_token_id=VSTART, vision_end_token_id=247,
            bos_token_id=1, eos_token_id=2, pad_token_id=0)
    hf = Cls(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    return hf


def _pixels(hw=(16, 16), seed=0):
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        Qwen2VLImageProcessor)
    proc = Qwen2VLImageProcessor(min_pixels=16, max_pixels=100_000,
                                 patch_size=4, temporal_patch_size=2,
                                 merge_size=2)
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 255, size=hw + (3,), dtype=np.uint8)
    out = proc(images=[img], return_tensors="np")
    return (out["pixel_values"].astype(np.float32),
            np.asarray(out["image_grid_thw"], np.int64))


def _llm(d, **kw):
    from aphrodite_tpu.entrypoints.llm import LLM
    args = dict(model=str(d), dtype="float32", block_size=16,
                num_kv_blocks=128, max_num_batched_tokens=128,
                max_num_seqs=4, max_model_len=256, tokenizer="unused")
    args.update(kw)
    return LLM(**args)


def _hf_gen(hf, ids, pv, grid, n_new):
    with torch.no_grad():
        out = hf.generate(
            torch.tensor([ids]),
            pixel_values=torch.tensor(pv) if pv is not None else None,
            image_grid_thw=torch.tensor(grid) if grid is not None else None,
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            max_new_tokens=n_new, do_sample=False, eos_token_id=None)
    return out[0][len(ids):].tolist()


@pytest.mark.parametrize("v25", [False, True])
def test_qwen2_vl_matches_hf(tmp_path, v25):
    hf = _mk(tmp_path, v25)
    pv, grid = _pixels((16, 16))
    n_tok = int(grid[0].prod()) // 4  # merged tokens per image
    assert n_tok == 4
    prompt = [1, 7, VSTART] + [IMG] * n_tok + [5, 9, 20]
    llm = _llm(tmp_path)
    outs = llm.generate(
        [{"prompt_token_ids": prompt,
          "multi_modal_data": {"image": {"pixel_values": pv,
                                         "image_grid_thw": grid}}},
         [3, 11, 12, 13]],  # text-only request through the mrope model
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True))
    exp_img = _hf_gen(hf, prompt, pv, grid, 8)
    exp_txt = _hf_gen(hf, [3, 11, 12, 13], None, None, 8)
    assert outs[0].outputs[0].token_ids == exp_img
    assert outs[1].outputs[0].token_ids == exp_txt


def test_qwen2_vl_two_images_and_chunked_prefill(tmp_path):
    hf = _mk(tmp_path, v25=False)
    pv1, grid1 = _pixels((16, 16), seed=1)
    pv2, grid2 = _pixels((24, 16), seed=2)  # different grid: 6 tokens
    pv = np.concatenate([pv1, pv2], axis=0)
    grid = np.concatenate([grid1, grid2], axis=0)
    n1 = int(grid1[0].prod()) // 4
    n2 = int(grid2[0].prod()) // 4
    prompt = ([1] * 9 + [VSTART] + [IMG] * n1 + [4]
              + [VSTART] + [IMG] * n2 + [5, 9] * 6)
    llm = _llm(tmp_path, max_num_batched_tokens=32)  # forces chunking
    outs = llm.generate(
        [{"prompt_token_ids": prompt,
          "multi_modal_data": {"image": {"pixel_values": pv,
                                         "image_grid_thw": grid}}}],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))
    assert outs[0].outputs[0].token_ids == _hf_gen(hf, prompt, pv, grid, 6)


def test_mrope_positions_match_hf():
    """Host mrope table vs HF's get_rope_index."""
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration
    from aphrodite_tpu.models.qwen2_vl import mrope_positions
    cfg = Qwen2VLConfig(
        text_config=_text_cfg(), vision_config=_vision_cfg_2vl(),
        image_token_id=IMG, video_token_id=248,
        vision_start_token_id=VSTART, vision_end_token_id=247)
    hf = Qwen2VLForConditionalGeneration(cfg)
    grid = np.array([[1, 6, 4]])  # 24 patches -> 6 merged tokens
    n_tok = 6
    ids = [1, 7, VSTART] + [IMG] * n_tok + [5, 9]
    pos_hf, delta_hf = hf.model.get_rope_index(
        torch.tensor([ids]), image_grid_thw=torch.tensor(grid))
    table, delta = mrope_positions(
        len(ids), [(3, n_tok)], grid, merge=2)
    np.testing.assert_array_equal(table, pos_hf[:, 0].numpy())
    assert delta == int(delta_hf[0])
