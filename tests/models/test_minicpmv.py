"""MiniCPM-V 2.6 vs a torch oracle (HF Idefics2 vision tower + trusted
nn.MultiheadAttention resampler + HF Qwen2 with inputs_embeds)."""
import json

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from aphrodite_tpu.sampling_params import SamplingParams

IMG = 250
DV, Q = 32, 4  # vision hidden, query_num


def _qwen_cfg():
    from transformers import Qwen2Config
    return Qwen2Config(vocab_size=256, hidden_size=64, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=2,
                       intermediate_size=128, max_position_embeddings=256,
                       tie_word_embeddings=False, pad_token_id=0,
                       bos_token_id=1, eos_token_id=2)


def _vit():
    from transformers.models.idefics2.configuration_idefics2 import (
        Idefics2VisionConfig)
    from transformers.models.idefics2.modeling_idefics2 import (
        Idefics2VisionTransformer)
    cfg = Idefics2VisionConfig(hidden_size=DV, num_hidden_layers=2,
                               num_attention_heads=2, intermediate_size=64,
                               image_size=28, patch_size=14)
    torch.manual_seed(1)
    return Idefics2VisionTransformer(cfg).eval(), cfg


def test_minicpmv_matches_oracle(tmp_path):
    from transformers import AutoModelForCausalLM
    torch.manual_seed(0)
    lm = AutoModelForCausalLM.from_config(_qwen_cfg()).eval()
    vit, vcfg = _vit()
    H = 64
    torch.manual_seed(2)
    res = {
        "query": torch.randn(Q, H) * 0.05,
        "kv_proj.weight": torch.randn(H, DV) * 0.05,
        "attn.in_proj_weight": torch.randn(3 * H, H) * 0.05,
        "attn.in_proj_bias": torch.randn(3 * H) * 0.05,
        "attn.out_proj.weight": torch.randn(H, H) * 0.05,
        "attn.out_proj.bias": torch.randn(H) * 0.05,
        "ln_q.weight": torch.ones(H) + torch.randn(H) * 0.05,
        "ln_q.bias": torch.randn(H) * 0.05,
        "ln_kv.weight": torch.ones(H) + torch.randn(H) * 0.05,
        "ln_kv.bias": torch.randn(H) * 0.05,
        "ln_post.weight": torch.ones(H) + torch.randn(H) * 0.05,
        "ln_post.bias": torch.randn(H) * 0.05,
        "proj": torch.randn(H, H) * 0.05,
    }
    tensors = {}
    for k, v in vit.state_dict().items():
        tensors["vpm." + k] = v
    for k, v in res.items():
        tensors["resampler." + k] = v
    for k, v in lm.state_dict().items():
        tensors["llm." + k] = v
    from safetensors.numpy import save_file
    save_file({k: np.ascontiguousarray(v.detach().numpy())
               for k, v in tensors.items()},
              str(tmp_path / "model.safetensors"))
    cfg = _qwen_cfg().to_dict()
    cfg.update({"architectures": ["MiniCPMV"], "model_type": "minicpmv",
                "version": 2.6, "query_num": Q, "image_token_id": IMG,
                "vision_config": vcfg.to_dict(), "torch_dtype": "float32"})
    (tmp_path / "config.json").write_text(json.dumps(cfg))

    # One 28x42 slice -> patch grid (2, 3).
    rng = np.random.RandomState(0)
    sl = rng.randn(3, 28, 42).astype(np.float32)
    media = {"pixel_values": [sl], "tgt_sizes": [(2, 3)]}
    base = [1, 7, IMG, 9, 20]
    expanded = [1, 7] + [IMG] * Q + [9, 20]

    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(tmp_path), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=120, tokenizer="unused")
    outs = llm.generate(
        [{"prompt_token_ids": base, "multi_modal_data": {"image": media}}],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))

    # ---- oracle
    from aphrodite_tpu.models.minicpmv import sincos_2d
    with torch.no_grad():
        feats = vit(torch.tensor(sl[None]),
                    patch_attention_mask=torch.ones(1, 2, 3,
                                                    dtype=torch.bool)
                    ).last_hidden_state[0]  # [6, DV]
        kv = feats @ res["kv_proj.weight"].T
        kv = F.layer_norm(kv, (H,), res["ln_kv.weight"], res["ln_kv.bias"],
                          1e-6)
        q = F.layer_norm(res["query"], (H,), res["ln_q.weight"],
                         res["ln_q.bias"], 1e-6)
        pos = torch.tensor(sincos_2d(H, 2, 3).reshape(6, H),
                           dtype=torch.float32)
        out, _ = F.multi_head_attention_forward(
            q[:, None], (kv + pos)[:, None], kv[:, None], H, 1,
            res["attn.in_proj_weight"], res["attn.in_proj_bias"],
            None, None, False, 0.0,
            res["attn.out_proj.weight"], res["attn.out_proj.bias"],
            need_weights=False)
        out = out[:, 0]
        out = F.layer_norm(out, (H,), res["ln_post.weight"],
                           res["ln_post.bias"], 1e-6)
        emb_rows = out @ res["proj"]
        embeds = lm.get_input_embeddings()(torch.tensor([expanded]))
        embeds[0, 2:2 + Q] = emb_rows
        exp = lm.generate(inputs_embeds=embeds, max_new_tokens=6,
                          do_sample=False, eos_token_id=None)
    assert outs[0].outputs[0].token_ids == exp[0].tolist()
