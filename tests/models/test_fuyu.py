"""Fuyu vs the HF oracle: linear patch projection, per-row placeholder
runs with newline separators."""
import numpy as np
import torch

from aphrodite_tpu.sampling_params import SamplingParams

IMG_TOK = 250
NL_TOK = 255  # vocab-1 (tiny vocab stand-in for |NEWLINE|)


def test_fuyu_matches_hf(tmp_path):
    from transformers import FuyuConfig, FuyuForCausalLM
    text = {"model_type": "persimmon", "vocab_size": 256, "hidden_size": 64,
            "intermediate_size": 128, "num_hidden_layers": 2,
            "num_attention_heads": 4, "hidden_act": "relu2",
            "max_position_embeddings": 512, "partial_rotary_factor": 0.5,
            "tie_word_embeddings": False, "pad_token_id": 0,
            "qk_layernorm": True}
    cfg = FuyuConfig(text_config=text, patch_size=4, image_token_id=IMG_TOK,
                     hidden_size=64, num_attention_heads=4,
                     num_hidden_layers=2, intermediate_size=128,
                     vocab_size=256,
                     bos_token_id=1, eos_token_id=2, pad_token_id=0)
    torch.manual_seed(0)
    hf = FuyuForCausalLM(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)

    rng = np.random.RandomState(0)
    img = rng.rand(8, 8, 3).astype(np.float32)  # HWC in [0, 1]
    # our engine: one placeholder, adapter expands to 2 rows x (2 + NL)
    base = [1, 7, IMG_TOK, 9, 20]
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(tmp_path), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=256, tokenizer="unused")
    outs = llm.generate(
        [{"prompt_token_ids": base, "multi_modal_data": {"image": img}}],
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True))

    # HF side: same normalization + patchify, explicit indices
    norm = (img - 0.5) / 0.5
    t = torch.tensor(norm.transpose(2, 0, 1))[None]  # [1, 3, 8, 8]
    from transformers.models.fuyu.image_processing_fuyu import (
        FuyuImageProcessor)
    proc = FuyuImageProcessor(patch_size={"height": 4, "width": 4})
    patches = proc.patchify_image(t)  # [1, 4, 48]
    expanded = [1, 7, IMG_TOK, IMG_TOK, NL_TOK, IMG_TOK, IMG_TOK, NL_TOK,
                9, 20]
    idx = torch.full((1, len(expanded)), -1, dtype=torch.long)
    idx[0, 2], idx[0, 3], idx[0, 5], idx[0, 6] = 0, 1, 2, 3
    with torch.no_grad():
        exp = hf.generate(
            torch.tensor([expanded]), image_patches=patches,
            image_patches_indices=idx,
            attention_mask=torch.ones(1, len(expanded), dtype=torch.long),
            max_new_tokens=8, do_sample=False,
            eos_token_id=None)[0][len(expanded):].tolist()
    assert outs[0].outputs[0].token_ids == exp
