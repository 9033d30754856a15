"""InternVL (InternViT + pixel shuffle + mlp1) vs a hand torch oracle.

The oracle replicates the remote-code InternViT encoder (fused QKV,
layer-scale, LayerNorm or RMSNorm + flat qk-norm), the v2 pixel shuffle and
the LayerNorm MLP projector, then drives HF Qwen2 with inputs_embeds; the
engine must reproduce its greedy tokens through the full serving path
(dynamic tiling handled by the shared adapter)."""
import json

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from aphrodite_tpu.sampling_params import SamplingParams

IMG = 255
S, PS, G = 32, 8, 4  # image size, patch, grid
DV, NH, LV, IV = 32, 2, 2, 64  # vision tower dims


def _qwen2_cfg():
    from transformers import Qwen2Config
    return Qwen2Config(vocab_size=256, hidden_size=64, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=2,
                       intermediate_size=128, max_position_embeddings=512,
                       tie_word_embeddings=False)


def _make_vision(seed, qk_norm, norm_type):
    torch.manual_seed(seed)

    def rnd(*s):
        return torch.randn(*s) * 0.05

    ws = {
        "vision_model.embeddings.class_embedding": rnd(1, 1, DV),
        "vision_model.embeddings.patch_embedding.weight": rnd(DV, 3, PS, PS),
        "vision_model.embeddings.patch_embedding.bias": rnd(DV),
        "vision_model.embeddings.position_embedding":
            rnd(1, G * G + 1, DV),
    }
    for i in range(LV):
        p = f"vision_model.encoder.layers.{i}."
        ws[p + "norm1.weight"] = torch.ones(DV) + 0.1 * rnd(DV)
        ws[p + "norm2.weight"] = torch.ones(DV) + 0.1 * rnd(DV)
        if norm_type == "layer_norm":
            ws[p + "norm1.bias"] = 0.1 * rnd(DV)
            ws[p + "norm2.bias"] = 0.1 * rnd(DV)
        ws[p + "attn.qkv.weight"] = rnd(3 * DV, DV)
        ws[p + "attn.qkv.bias"] = 0.1 * rnd(3 * DV)
        ws[p + "attn.proj.weight"] = rnd(DV, DV)
        ws[p + "attn.proj.bias"] = 0.1 * rnd(DV)
        ws[p + "ls1"] = torch.ones(DV) * 0.9
        ws[p + "ls2"] = torch.ones(DV) * 1.1
        ws[p + "mlp.fc1.weight"] = rnd(IV, DV)
        ws[p + "mlp.fc1.bias"] = 0.1 * rnd(IV)
        ws[p + "mlp.fc2.weight"] = rnd(DV, IV)
        ws[p + "mlp.fc2.bias"] = 0.1 * rnd(DV)
        if qk_norm:
            ws[p + "attn.q_norm.weight"] = torch.ones(DV) + 0.1 * rnd(DV)
            ws[p + "attn.k_norm.weight"] = torch.ones(DV) + 0.1 * rnd(DV)
    D4 = DV * 4
    ws["mlp1.0.weight"] = torch.ones(D4) + 0.1 * rnd(D4)
    ws["mlp1.0.bias"] = 0.1 * rnd(D4)
    ws["mlp1.1.weight"] = rnd(64, D4)
    ws["mlp1.1.bias"] = 0.1 * rnd(64)
    ws["mlp1.3.weight"] = rnd(64, 64)
    ws["mlp1.3.bias"] = 0.1 * rnd(64)
    return ws


def _vision_oracle(ws, pv, qk_norm, norm_type):
    """pv [N,3,S,S] -> [N*tokens, 64] torch, mirroring remote-code
    InternViT + pixel_shuffle(v2) + mlp1."""
    eps = 1e-6
    x = F.conv2d(torch.tensor(pv),
                 ws["vision_model.embeddings.patch_embedding.weight"],
                 ws["vision_model.embeddings.patch_embedding.bias"],
                 stride=PS)
    N = x.shape[0]
    x = x.flatten(2).transpose(1, 2)  # [N, P, D]
    cls = ws["vision_model.embeddings.class_embedding"].expand(N, -1, -1)
    x = torch.cat([cls, x], dim=1)
    x = x + ws["vision_model.embeddings.position_embedding"]

    def norm(v, w, b):
        if norm_type == "layer_norm":
            return F.layer_norm(v, (DV,), w, b, eps)
        return v * torch.rsqrt((v.float() ** 2).mean(-1, keepdim=True)
                               + eps) * w

    def rmsn(v, w):
        return v * torch.rsqrt((v.float() ** 2).mean(-1, keepdim=True)
                               + eps) * w

    hd = DV // NH
    T = x.shape[1]
    for i in range(LV):
        p = f"vision_model.encoder.layers.{i}."
        h = norm(x, ws[p + "norm1.weight"], ws.get(p + "norm1.bias"))
        qkv = h @ ws[p + "attn.qkv.weight"].T + ws[p + "attn.qkv.bias"]
        q, k, v = qkv.chunk(3, dim=-1)
        if qk_norm:
            q = rmsn(q, ws[p + "attn.q_norm.weight"])
            k = rmsn(k, ws[p + "attn.k_norm.weight"])
        q = q.view(N, T, NH, hd).transpose(1, 2)
        k = k.view(N, T, NH, hd).transpose(1, 2)
        v = v.view(N, T, NH, hd).transpose(1, 2)
        a = F.softmax((q @ k.transpose(-1, -2)) * hd ** -0.5, dim=-1) @ v
        a = a.transpose(1, 2).reshape(N, T, DV)
        a = a @ ws[p + "attn.proj.weight"].T + ws[p + "attn.proj.bias"]
        x = x + a * ws[p + "ls1"]
        h = norm(x, ws[p + "norm2.weight"], ws.get(p + "norm2.bias"))
        h = F.gelu(h @ ws[p + "mlp.fc1.weight"].T + ws[p + "mlp.fc1.bias"])
        h = h @ ws[p + "mlp.fc2.weight"].T + ws[p + "mlp.fc2.bias"]
        x = x + h * ws[p + "ls2"]

    x = x[:, 1:, :]  # drop CLS
    # pixel_shuffle v2 (remote-code semantics)
    x = x.reshape(N, G, G, DV)
    x = x.view(N, G, G // 2, DV * 2).permute(0, 2, 1, 3).contiguous()
    x = x.view(N, G // 2, G // 2, DV * 4).permute(0, 2, 1, 3).contiguous()
    x = x.reshape(N, -1, DV * 4)
    x = F.layer_norm(x, (DV * 4,), ws["mlp1.0.weight"], ws["mlp1.0.bias"],
                     1e-5)
    x = F.gelu(x @ ws["mlp1.1.weight"].T + ws["mlp1.1.bias"])
    x = x @ ws["mlp1.3.weight"].T + ws["mlp1.3.bias"]
    return x.reshape(-1, 64)


@pytest.mark.parametrize("qk_norm,norm_type",
                         [(False, "layer_norm"), (True, "rms_norm")])
def test_internvl_matches_torch_oracle(tmp_path, qk_norm, norm_type):
    from transformers import AutoModelForCausalLM
    torch.manual_seed(0)
    lm = AutoModelForCausalLM.from_config(_qwen2_cfg()).eval()
    ws = _make_vision(1 + int(qk_norm), qk_norm, norm_type)
    tensors = dict(ws)
    for k, v in lm.state_dict().items():
        tensors["language_model." + k] = v
    from safetensors.numpy import save_file
    save_file({k: np.ascontiguousarray(v.detach().numpy())
               for k, v in tensors.items()},
              str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps({
        "architectures": ["InternVLChatModel"],
        "model_type": "internvl_chat",
        "llm_config": _qwen2_cfg().to_dict(),
        "vision_config": {
            "model_type": "intern_vit_6b", "hidden_size": DV,
            "num_hidden_layers": LV, "num_attention_heads": NH,
            "intermediate_size": IV, "image_size": S, "patch_size": PS,
            "layer_norm_eps": 1e-6, "qkv_bias": True,
            "qk_normalization": qk_norm, "norm_type": norm_type,
            "hidden_act": "gelu"},
        "downsample_ratio": 0.5, "select_layer": -1, "ps_version": "v2",
        "use_thumbnail": True, "min_dynamic_patch": 1,
        "max_dynamic_patch": 4, "dynamic_image_size": True,
        "img_context_token_id": IMG, "torch_dtype": "float32"}))

    # Tile a non-square PIL image through the shared adapter so the oracle
    # consumes the exact same pixels.
    from PIL import Image
    from aphrodite_tpu.config import ModelConfig
    from aphrodite_tpu.multimodal import InternVLAdapter
    rng = np.random.RandomState(0)
    pil = Image.fromarray(rng.randint(0, 255, (40, 70, 3), np.uint8))
    cfg = ModelConfig(model=str(tmp_path), dtype="float32")
    adapter = InternVLAdapter(cfg.hf_config)
    base = [1, 7, IMG, 9, 20, 3]
    pv, expanded, spans, _ = adapter.process(pil, base)

    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(tmp_path), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=128, max_num_seqs=4,
              max_model_len=256, tokenizer="unused")
    outs = llm.generate(
        [{"prompt_token_ids": base, "multi_modal_data": {"image": pil}}],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))

    feats = _vision_oracle(ws, pv, qk_norm, norm_type)
    embeds = lm.get_input_embeddings()(torch.tensor([expanded]))
    fi = 0
    for off, ln in spans:
        embeds[0, off:off + ln] = feats[fi:fi + ln]
        fi += ln
    with torch.no_grad():
        exp = lm.generate(inputs_embeds=embeds, max_new_tokens=6,
                          do_sample=False, eos_token_id=None)
    assert outs[0].outputs[0].token_ids == exp[0].tolist()
