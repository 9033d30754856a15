"""MLlama (Llama 3.2 Vision) vs the HF oracle: gated-tile vision tower,
cross-attention decoder layers, text-only requests skipping cross layers."""
import numpy as np
import pytest
import torch

from aphrodite_tpu.sampling_params import SamplingParams

IMG = 299


def _cfg():
    from transformers import MllamaConfig
    from transformers.models.mllama.configuration_mllama import (
        MllamaTextConfig, MllamaVisionConfig)
    vision = MllamaVisionConfig(
        hidden_size=32, num_hidden_layers=4, num_global_layers=2,
        attention_heads=2, intermediate_size=64, image_size=16,
        patch_size=8, max_num_tiles=4, intermediate_layers_indices=[1, 2],
        vision_output_dim=96, supported_aspect_ratios=[
            [1, 1], [1, 2], [2, 1], [2, 2], [1, 3], [3, 1], [1, 4], [4, 1]])
    text = MllamaTextConfig(
        vocab_size=320, hidden_size=64, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, cross_attention_layers=[1, 3],
        max_position_embeddings=512, tie_word_embeddings=False,
        rope_scaling={"rope_type": "default"}, pad_token_id=0,
        bos_token_id=1, eos_token_id=2)
    return MllamaConfig(vision_config=vision.to_dict(),
                        text_config=text.to_dict(), image_token_index=IMG)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from transformers import MllamaForConditionalGeneration
    torch.manual_seed(0)
    hf = MllamaForConditionalGeneration(_cfg()).eval()
    d = tmp_path_factory.mktemp("tiny_mllama")
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf


def _proc(img_hw):
    from transformers.models.mllama.image_processing_mllama import (
        MllamaImageProcessor)
    proc = MllamaImageProcessor(size={"height": 16, "width": 16},
                                max_image_tiles=4)
    rng = np.random.RandomState(sum(img_hw))
    img = rng.randint(0, 255, (img_hw[0], img_hw[1], 3)).astype(np.uint8)
    return proc(images=[[img]], return_tensors="np")


def test_mllama_matches_hf(ckpt):
    d, hf = ckpt
    out = _proc((24, 40))
    base = [1, IMG, 7, 9, 20, 3]
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(d), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=256, tokenizer="unused")
    outs = llm.generate(
        [{"prompt_token_ids": base,
          "multi_modal_data": {"image": dict(out)}},
         [5, 6, 7, 8]],  # text-only request in the same batch
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))

    pv = torch.tensor(out["pixel_values"])
    ar_ids = torch.tensor(out["aspect_ratio_ids"])
    ar_mask = torch.tensor(out["aspect_ratio_mask"])
    n = len(base)
    # Leading image: every text token attends all valid tiles.
    cross_mask = ar_mask[:, :, None, :].repeat(1, 1, n, 1
                                               ).permute(0, 2, 1, 3)
    with torch.no_grad():
        exp = hf.generate(
            input_ids=torch.tensor([base]), pixel_values=pv,
            aspect_ratio_ids=ar_ids, aspect_ratio_mask=ar_mask,
            cross_attention_mask=cross_mask,
            max_new_tokens=6, do_sample=False, eos_token_id=None)
        exp_txt = hf.generate(
            input_ids=torch.tensor([[5, 6, 7, 8]]), max_new_tokens=6,
            do_sample=False, eos_token_id=None)
    assert outs[0].outputs[0].token_ids == exp[0][n:].tolist()
    assert outs[1].outputs[0].token_ids == exp_txt[0][4:].tolist()
