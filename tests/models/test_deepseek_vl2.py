"""DeepSeek-VL2 vs a torch oracle (hand timm-SigLIP ViT + downsample MLP
projector + global/local newline assembly + HF DeepseekV2 inputs_embeds)."""
import json

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from aphrodite_tpu.sampling_params import SamplingParams

IMG = 250
DV, LV, NH, IV = 32, 2, 2, 64  # vision width/layers/heads/mlp
S, PS = 16, 8  # image/patch -> grid 2; ratio 2 -> hw 1


def _lm_cfg():
    from transformers import DeepseekV2Config
    return DeepseekV2Config(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4, intermediate_size=128,
        kv_lora_rank=32, q_lora_rank=None, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, head_dim=8,
        n_routed_experts=None, first_k_dense_replace=2,
        max_position_embeddings=256, tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2)


def _make_vision(seed):
    torch.manual_seed(seed)

    def rnd(*s):
        return torch.randn(*s) * 0.05

    ws = {"vision.patch_embed.proj.weight": rnd(DV, 3, PS, PS),
          "vision.patch_embed.proj.bias": rnd(DV),
          "vision.pos_embed": rnd(1, 4, DV),
          "vision.norm.weight": torch.ones(DV) + 0.1 * rnd(DV),
          "vision.norm.bias": 0.1 * rnd(DV)}
    for i in range(LV):
        p = f"vision.blocks.{i}."
        ws[p + "norm1.weight"] = torch.ones(DV) + 0.1 * rnd(DV)
        ws[p + "norm1.bias"] = 0.1 * rnd(DV)
        ws[p + "attn.qkv.weight"] = rnd(3 * DV, DV)
        ws[p + "attn.qkv.bias"] = 0.1 * rnd(3 * DV)
        ws[p + "attn.proj.weight"] = rnd(DV, DV)
        ws[p + "attn.proj.bias"] = 0.1 * rnd(DV)
        ws[p + "norm2.weight"] = torch.ones(DV) + 0.1 * rnd(DV)
        ws[p + "norm2.bias"] = 0.1 * rnd(DV)
        ws[p + "mlp.fc1.weight"] = rnd(IV, DV)
        ws[p + "mlp.fc1.bias"] = 0.1 * rnd(IV)
        ws[p + "mlp.fc2.weight"] = rnd(DV, IV)
        ws[p + "mlp.fc2.bias"] = 0.1 * rnd(DV)
    # projector: downsample 2 -> in 4*DV=128, depth 2, n_embed 64
    ws["projector.layers.0.weight"] = rnd(64, 4 * DV)
    ws["projector.layers.0.bias"] = 0.1 * rnd(64)
    ws["projector.layers.2.weight"] = rnd(64, 64)
    ws["projector.layers.2.bias"] = 0.1 * rnd(64)
    ws["image_newline"] = rnd(64)
    ws["view_seperator"] = rnd(64)
    return ws


def _vision_oracle(ws, pv):
    """pv [N,3,S,S] -> projected [N, 1, 64] (grid 2, ratio 2)."""
    x = F.conv2d(torch.tensor(pv), ws["vision.patch_embed.proj.weight"],
                 ws["vision.patch_embed.proj.bias"], stride=PS)
    N = x.shape[0]
    x = x.flatten(2).transpose(1, 2) + ws["vision.pos_embed"]
    hd = DV // NH
    T = x.shape[1]
    for i in range(LV):
        p = f"vision.blocks.{i}."
        h = F.layer_norm(x, (DV,), ws[p + "norm1.weight"],
                         ws[p + "norm1.bias"], 1e-6)
        qkv = h @ ws[p + "attn.qkv.weight"].T + ws[p + "attn.qkv.bias"]
        q, k, v = qkv.chunk(3, dim=-1)
        q = q.view(N, T, NH, hd).transpose(1, 2)
        k = k.view(N, T, NH, hd).transpose(1, 2)
        v = v.view(N, T, NH, hd).transpose(1, 2)
        a = F.softmax((q @ k.transpose(-1, -2)) * hd ** -0.5, -1) @ v
        a = a.transpose(1, 2).reshape(N, T, DV)
        x = x + a @ ws[p + "attn.proj.weight"].T + ws[p + "attn.proj.bias"]
        h = F.layer_norm(x, (DV,), ws[p + "norm2.weight"],
                         ws[p + "norm2.bias"], 1e-6)
        h = F.gelu(h @ ws[p + "mlp.fc1.weight"].T + ws[p + "mlp.fc1.bias"],
                   approximate="tanh")
        x = x + h @ ws[p + "mlp.fc2.weight"].T + ws[p + "mlp.fc2.bias"]
    x = F.layer_norm(x, (DV,), ws["vision.norm.weight"],
                     ws["vision.norm.bias"], 1e-6)
    # space-to-depth 2x2 (grid 2 -> 1 position, channel-major blocks)
    x = x.view(N, 2, 2, DV)
    x = x.view(N, 1, 2, 1, 2, DV).permute(0, 1, 3, 5, 2, 4).reshape(
        N, 1, DV * 4)
    x = x @ ws["projector.layers.0.weight"].T + \
        ws["projector.layers.0.bias"]
    x = F.gelu(x)
    return x @ ws["projector.layers.2.weight"].T + \
        ws["projector.layers.2.bias"]


def test_deepseek_vl2_matches_oracle(tmp_path):
    from transformers import AutoModelForCausalLM
    torch.manual_seed(0)
    lm = AutoModelForCausalLM.from_config(_lm_cfg()).eval()
    ws = _make_vision(3)
    tensors = dict(ws)
    for k, v in lm.state_dict().items():
        tensors["language." + k] = v
    from safetensors.numpy import save_file
    save_file({k: np.ascontiguousarray(v.detach().numpy())
               for k, v in tensors.items()},
              str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps({
        "architectures": ["DeepseekVLV2ForCausalLM"],
        "model_type": "deepseek_vl_v2",
        "language_config": _lm_cfg().to_dict(),
        "vision_config": {"model_type": "vision", "image_size": S,
                          "patch_size": PS, "width": DV, "layers": LV,
                          "heads": NH, "mlp_ratio": 2},
        "projector_config": {"model_type": "mlp_projector",
                             "projector_type": "downsample_mlp_gelu",
                             "input_dim": DV, "n_embed": 64, "depth": 2,
                             "mlp_ratio": 1, "downsample_ratio": 2},
        "tile_tag": "2D", "global_view_pos": "head",
        "image_token_id": IMG, "torch_dtype": "float32"}))

    rng = np.random.RandomState(0)
    tiles = rng.randn(2, 3, S, S).astype(np.float32)  # global + 1 local
    base = [1, 7, IMG, 9, 20]
    # tokens = 1*(1+1) + 1*1*(1*1+1) + 1 = 5
    expanded = [1, 7] + [IMG] * 5 + [9, 20]
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(tmp_path), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=120, tokenizer="unused")
    outs = llm.generate(
        [{"prompt_token_ids": base, "multi_modal_data": {"image": tiles}}],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))

    with torch.no_grad():
        emb = _vision_oracle(ws, tiles)  # [2, 1, 64]
        nl, sep = ws["image_newline"], ws["view_seperator"]
        glob = torch.cat([emb[0], nl[None]], dim=0)   # [2, 64]
        loc = torch.cat([emb[1], nl[None]], dim=0)    # [2, 64]
        rows = torch.cat([glob, sep[None], loc], dim=0)  # [5, 64]
        embeds = lm.get_input_embeddings()(torch.tensor([expanded]))
        embeds[0, 2:7] = rows
        exp = lm.generate(inputs_embeds=embeds, max_new_tokens=6,
                          do_sample=False, eos_token_id=None)
    assert outs[0].outputs[0].token_ids == exp[0].tolist()
