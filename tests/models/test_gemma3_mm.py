"""Gemma-3 multimodal vs the HF oracle: SigLIP tower + avg-pool projector,
bidirectional image-token attention (global and sliding layers), and the
embed-normalizer interaction with scattered image features."""
import numpy as np
import pytest
import torch

from aphrodite_tpu.sampling_params import SamplingParams

IMG = 255


def _cfg():
    from transformers import Gemma3Config, SiglipVisionConfig
    from transformers import Gemma3TextConfig
    vision = SiglipVisionConfig(hidden_size=32, num_hidden_layers=2,
                                num_attention_heads=2, intermediate_size=64,
                                image_size=16, patch_size=4)
    text = Gemma3TextConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, query_pre_attn_scalar=16, sliding_window=8,
        sliding_window_pattern=2, rope_theta=1000000.0,
        rope_local_base_freq=10000.0, max_position_embeddings=512,
        pad_token_id=0, bos_token_id=1, eos_token_id=2)
    return Gemma3Config(text_config=text.to_dict(),
                        vision_config=vision.to_dict(),
                        image_token_index=IMG, mm_tokens_per_image=4,
                        boi_token_index=253, eoi_token_index=254,
                        pad_token_id=0, bos_token_id=1, eos_token_id=2)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from transformers import Gemma3ForConditionalGeneration
    torch.manual_seed(0)
    d = tmp_path_factory.mktemp("tiny_gemma3mm")
    hf = Gemma3ForConditionalGeneration(_cfg()).eval()
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf


def _hf_gen(hf, ids, pv, n_new):
    # token_type_ids activates HF's within-image bidirectional mask (it is
    # purely causal without them — the processor normally supplies these).
    tt = torch.tensor([[1 if t == IMG else 0 for t in ids]])
    with torch.no_grad():
        out = hf.generate(
            torch.tensor([ids]),
            pixel_values=torch.tensor(pv) if pv is not None else None,
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            token_type_ids=tt,
            max_new_tokens=n_new, do_sample=False, eos_token_id=None)
    return out[0][len(ids):].tolist()


def _llm(d, **kw):
    from aphrodite_tpu.entrypoints.llm import LLM
    args = dict(model=str(d), dtype="float32", block_size=16,
                num_kv_blocks=128, max_num_batched_tokens=128,
                max_num_seqs=4, max_model_len=256, tokenizer="unused")
    args.update(kw)
    return LLM(**args)


def test_gemma3_mm_matches_hf(ckpt):
    d, hf = ckpt
    rng = np.random.RandomState(0)
    img = rng.randn(1, 3, 16, 16).astype(np.float32)
    base = [2, 7, 253, IMG, 254, 9, 20, 3]
    expanded = [2, 7, 253] + [IMG] * 4 + [254, 9, 20, 3]
    llm = _llm(d)
    outs = llm.generate(
        [{"prompt_token_ids": base, "multi_modal_data": {"image": img}},
         [2, 5, 6, 7, 8]],  # text-only through the same stack
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True))
    assert outs[0].outputs[0].token_ids == _hf_gen(hf, expanded, img, 8)
    assert outs[1].outputs[0].token_ids == _hf_gen(hf, [2, 5, 6, 7, 8],
                                                   None, 8)


def test_gemma3_mm_two_images(ckpt):
    """Two images: HF makes ALL image tokens mutually visible (cross-image
    bidirectionality, gemma3_mm.py:679-685)."""
    d, hf = ckpt
    rng = np.random.RandomState(1)
    imgs = rng.randn(2, 3, 16, 16).astype(np.float32)
    base = [2, 7, IMG, 9, IMG, 4, 5]
    expanded = [2, 7] + [IMG] * 4 + [9] + [IMG] * 4 + [4, 5]
    llm = _llm(d)
    outs = llm.generate(
        [{"prompt_token_ids": base, "multi_modal_data": {"image": imgs}}],
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True))
    assert outs[0].outputs[0].token_ids == _hf_gen(hf, expanded, imgs, 8)
