"""Idefics3 / SmolVLM vs HF oracles: SigLIP tower, pixel-shuffle
connector, placeholder expansion."""
import numpy as np
import pytest
import torch

from aphrodite_tpu.sampling_params import SamplingParams

IMG = 250


def _cfg(arch):
    from transformers import Idefics3Config
    vision = {"hidden_size": 32, "num_hidden_layers": 2,
              "num_attention_heads": 2, "intermediate_size": 64,
              "image_size": 16, "patch_size": 4,
              "hidden_act": "gelu_pytorch_tanh"}
    text = {"model_type": "llama", "vocab_size": 256, "hidden_size": 64,
            "intermediate_size": 128, "num_hidden_layers": 2,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "max_position_embeddings": 512, "rms_norm_eps": 1e-6,
            "tie_word_embeddings": False, "pad_token_id": 0}
    if arch == "SmolVLMForConditionalGeneration":
        from transformers import SmolVLMConfig
        cls = SmolVLMConfig
    else:
        cls = Idefics3Config
    return cls(text_config=text, vision_config=vision, image_token_id=IMG,
               scale_factor=2, pad_token_id=0, bos_token_id=1,
               eos_token_id=2)


@pytest.mark.parametrize("arch", ["Idefics3ForConditionalGeneration",
                                  "SmolVLMForConditionalGeneration"])
def test_idefics3_matches_hf(tmp_path, arch):
    import transformers
    cls = getattr(transformers, arch.replace("ForConditionalGeneration",
                                             "ForConditionalGeneration"))
    torch.manual_seed(0)
    hf = cls(_cfg(arch)).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    rng = np.random.RandomState(0)
    img = rng.randn(1, 3, 16, 16).astype(np.float32)
    n_tok = 4  # (16/4 / 2)^2
    base = [1, 7, IMG, 9, 20, 3]
    expanded = [1, 7] + [IMG] * n_tok + [9, 20, 3]

    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(tmp_path), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=256, tokenizer="unused")
    outs = llm.generate(
        [{"prompt_token_ids": base, "multi_modal_data": {"image": img}},
         [5, 6, 7, 8]],
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True))
    with torch.no_grad():
        exp = hf.generate(
            torch.tensor([expanded]),
            pixel_values=torch.tensor(img[None]),  # [B, N_img, 3, S, S]
            attention_mask=torch.ones(1, len(expanded), dtype=torch.long),
            max_new_tokens=8, do_sample=False,
            eos_token_id=None)[0][len(expanded):].tolist()
        exp_txt = hf.generate(
            torch.tensor([[5, 6, 7, 8]]),
            attention_mask=torch.ones(1, 4, dtype=torch.long),
            max_new_tokens=8, do_sample=False,
            eos_token_id=None)[0][4:].tolist()
    assert outs[0].outputs[0].token_ids == exp
    assert outs[1].outputs[0].token_ids == exp_txt
