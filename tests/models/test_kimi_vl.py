"""Kimi-VL: MoonViT tower (interp 2D pos emb + interleaved 2D rope +
packed per-image attention + patch merger) and the patch-group projector
vs a torch oracle mirroring reference moonvit.py; the DeepSeek-V2 LM half
vs HF DeepseekV2ForCausalLM driven with the oracle's inputs_embeds."""
import json
import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from aphrodite_tpu.sampling_params import SamplingParams

IMG = 250  # media_placeholder_token_id
PS = 4                       # patch size
VD, VH, VL, VI = 32, 2, 2, 48   # vision hidden/heads/layers/intermediate
PE_H = PE_W = 6              # init pos emb grid (interp exercised)
TD = 64                      # text hidden
M = VD * 4                   # projector width (merge 2x2)


def _text_cfg():
    from transformers import DeepseekV2Config
    return DeepseekV2Config(
        vocab_size=256, hidden_size=TD, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        intermediate_size=128, kv_lora_rank=32, q_lora_rank=None,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        head_dim=8, max_position_embeddings=512,
        tie_word_embeddings=False, pad_token_id=0,
        n_routed_experts=None, first_k_dense_replace=2)


def _vision_cfg():
    return {"model_type": "moonvit", "patch_size": PS,
            "init_pos_emb_height": PE_H, "init_pos_emb_width": PE_W,
            "num_attention_heads": VH, "num_hidden_layers": VL,
            "hidden_size": VD, "intermediate_size": VI,
            "merge_kernel_size": [2, 2]}


def _make_vision_weights(seed=1):
    torch.manual_seed(seed)

    def rnd(*s):
        return torch.randn(*s) * 0.05

    ws = {"vision_tower.patch_embed.proj.weight": rnd(VD, 3, PS, PS),
          "vision_tower.patch_embed.proj.bias": 0.02 * rnd(VD),
          "vision_tower.patch_embed.pos_emb.weight": rnd(PE_H, PE_W, VD),
          "vision_tower.encoder.final_layernorm.weight":
              torch.ones(VD) + 0.1 * rnd(VD),
          "vision_tower.encoder.final_layernorm.bias": 0.02 * rnd(VD),
          "multi_modal_projector.pre_norm.weight":
              torch.ones(VD) + 0.1 * rnd(VD),
          "multi_modal_projector.pre_norm.bias": 0.02 * rnd(VD),
          "multi_modal_projector.linear_1.weight": rnd(M, M),
          "multi_modal_projector.linear_1.bias": 0.02 * rnd(M),
          "multi_modal_projector.linear_2.weight": rnd(TD, M),
          "multi_modal_projector.linear_2.bias": 0.02 * rnd(TD)}
    for i in range(VL):
        p = f"vision_tower.encoder.blocks.{i}."
        ws[p + "norm0.weight"] = torch.ones(VD) + 0.1 * rnd(VD)
        ws[p + "norm0.bias"] = 0.02 * rnd(VD)
        ws[p + "norm1.weight"] = torch.ones(VD) + 0.1 * rnd(VD)
        ws[p + "norm1.bias"] = 0.02 * rnd(VD)
        ws[p + "wqkv.weight"] = rnd(3 * VD, VD)
        ws[p + "wqkv.bias"] = 0.02 * rnd(3 * VD)
        ws[p + "wo.weight"] = rnd(VD, VD)
        ws[p + "wo.bias"] = 0.02 * rnd(VD)
        ws[p + "mlp.fc0.weight"] = rnd(VI, VD)
        ws[p + "mlp.fc0.bias"] = 0.02 * rnd(VI)
        ws[p + "mlp.fc1.weight"] = rnd(VD, VI)
        ws[p + "mlp.fc1.bias"] = 0.02 * rnd(VD)
    return ws


def _moonvit_oracle(ws, pixels, grid_hws):
    """Torch mirror of reference moonvit.py + the kimi projector:
    pixels [N, 3, PS, PS] -> [sum counts, TD]."""
    hd = VD // VH
    x = F.conv2d(pixels, ws["vision_tower.patch_embed.proj.weight"],
                 ws["vision_tower.patch_embed.proj.bias"]).view(-1, VD)
    # Learnable2DInterpPosEmb (bicubic, align_corners=False)
    pos_rows = []
    pe = ws["vision_tower.patch_embed.pos_emb.weight"]
    for h, w in grid_hws:
        if (h, w) == (PE_H, PE_W):
            pos_rows.append(pe.flatten(end_dim=1))
        else:
            pos_rows.append(F.interpolate(
                pe.permute(2, 0, 1).unsqueeze(0), size=(h, w),
                mode="bicubic").squeeze(0).permute(1, 2, 0)
                .flatten(end_dim=1))
    x = x + torch.cat(pos_rows)
    # Rope2DPosEmb freqs per patch (col at even pairs, row at odd)
    angs = []
    for h, w in grid_hws:
        ypos = torch.arange(h).repeat_interleave(w).double()
        xpos = torch.arange(w).repeat(h).double()
        inv = 10000.0 ** -(torch.arange(0, hd, 4)[: hd // 4].double() / hd)
        ang = torch.empty(h * w, hd // 2, dtype=torch.float64)
        ang[:, 0::2] = xpos[:, None] * inv[None]
        ang[:, 1::2] = ypos[:, None] * inv[None]
        angs.append(ang)
    ang = torch.cat(angs)
    cos, sin = torch.cos(ang).float(), torch.sin(ang).float()

    def rope(t):  # [N, VH, hd] interleaved-pair rotation
        t0, t1 = t[..., 0::2], t[..., 1::2]
        c, s = cos[:, None], sin[:, None]
        out = torch.stack([t0 * c - t1 * s, t1 * c + t0 * s], dim=-1)
        return out.reshape(t.shape)

    seg = [int(h * w) for h, w in grid_hws]
    N = x.shape[0]
    ids = torch.cat([torch.full((n,), i) for i, n in enumerate(seg)])
    mask = ids[:, None] == ids[None]
    for i in range(VL):
        p = f"vision_tower.encoder.blocks.{i}."
        h = F.layer_norm(x, (VD,), ws[p + "norm0.weight"],
                         ws[p + "norm0.bias"])
        qkv = h @ ws[p + "wqkv.weight"].T + ws[p + "wqkv.bias"]
        q, k, v = qkv.split(VD, -1)
        q = rope(q.view(N, VH, hd))
        k = rope(k.view(N, VH, hd))
        v = v.view(N, VH, hd)
        s = torch.einsum("qhd,khd->hqk", q, k) / math.sqrt(hd)
        s = s.masked_fill(~mask[None], -torch.inf)
        o = torch.einsum("hqk,khd->qhd", F.softmax(s, -1),
                         v).reshape(N, VD)
        x = x + o @ ws[p + "wo.weight"].T + ws[p + "wo.bias"]
        h = F.layer_norm(x, (VD,), ws[p + "norm1.weight"],
                         ws[p + "norm1.bias"])
        y = F.gelu(h @ ws[p + "mlp.fc0.weight"].T + ws[p + "mlp.fc0.bias"],
                   approximate="tanh")
        x = x + y @ ws[p + "mlp.fc1.weight"].T + ws[p + "mlp.fc1.bias"]
    x = F.layer_norm(x, (VD,),
                     ws["vision_tower.encoder.final_layernorm.weight"],
                     ws["vision_tower.encoder.final_layernorm.bias"])
    # patch_merger + projector
    groups, off = [], 0
    for h, w in grid_hws:
        seq = x[off:off + h * w].view(h // 2, 2, w // 2, 2, VD)
        groups.append(seq.permute(0, 2, 1, 3, 4).reshape(-1, 4, VD))
        off += h * w
    g = torch.cat(groups)
    g = F.layer_norm(g, (VD,), ws["multi_modal_projector.pre_norm.weight"],
                     ws["multi_modal_projector.pre_norm.bias"]).view(-1, M)
    g = F.gelu(g @ ws["multi_modal_projector.linear_1.weight"].T
               + ws["multi_modal_projector.linear_1.bias"])
    return g @ ws["multi_modal_projector.linear_2.weight"].T \
        + ws["multi_modal_projector.linear_2.bias"]


def _pixels(grid_hw, seed=0):
    rng = np.random.RandomState(seed)
    h, w = grid_hw
    return rng.randn(h * w, 3, PS, PS).astype(np.float32) * 0.5


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from transformers import DeepseekV2ForCausalLM
    torch.manual_seed(0)
    lm = DeepseekV2ForCausalLM(_text_cfg()).eval()
    vws = _make_vision_weights()
    d = tmp_path_factory.mktemp("tiny_kimivl")
    tensors = {f"language_model.{k}": v for k, v in lm.state_dict().items()
               if not k.endswith("rotary_emb.inv_freq")}
    tensors.update(vws)
    from safetensors.numpy import save_file
    save_file({k: np.ascontiguousarray(v.detach().numpy())
               for k, v in tensors.items()},
              str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps({
        "architectures": ["KimiVLForConditionalGeneration"],
        "model_type": "kimi_vl",
        "vision_config": _vision_cfg(),
        "text_config": json.loads(_text_cfg().to_json_string()),
        "media_placeholder_token_id": IMG, "vocab_size": 256,
        "tie_word_embeddings": False, "torch_dtype": "float32"}))
    return d, lm, vws


def _hf_gen(lm, vws, ids, pixels, grids, n_new):
    """HF greedy with the oracle's image embeds scattered at placeholders."""
    embeds = lm.get_input_embeddings()(torch.tensor([ids]))
    if pixels is not None:
        img = _moonvit_oracle(vws, torch.tensor(pixels), grids)
        pos = [i for i, t in enumerate(ids) if t == IMG]
        assert len(pos) == img.shape[0]
        embeds[0, torch.tensor(pos)] = img
    with torch.no_grad():
        out = lm.generate(inputs_embeds=embeds,
                          attention_mask=torch.ones(1, len(ids),
                                                    dtype=torch.long),
                          max_new_tokens=n_new, do_sample=False,
                          eos_token_id=None)
    # generate with inputs_embeds returns only the new tokens
    return out[0].tolist()[:n_new]


def test_kimi_vl_matches_oracle(ckpt):
    d, lm, vws = ckpt
    grid = [(4, 6)]  # 24 patches -> 6 merged tokens; interp 6x6 -> 4x6
    pv = _pixels(grid[0])
    n_tok = (grid[0][0] // 2) * (grid[0][1] // 2)
    prompt = [1, 7] + [IMG] * n_tok + [5, 9, 20]
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(d), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=128, tokenizer="unused")
    outs = llm.generate(
        [{"prompt_token_ids": prompt,
          "multi_modal_data": {"image": {
              "pixel_values": pv,
              "image_grid_hws": np.asarray(grid, np.int64)}}},
         [3, 11, 12, 13]],
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True))
    assert outs[0].outputs[0].token_ids == _hf_gen(lm, vws, prompt, pv,
                                                   grid, 8)
    assert outs[1].outputs[0].token_ids == _hf_gen(lm, vws, [3, 11, 12, 13],
                                                   None, None, 8)


def test_kimi_vl_two_images_native_grid(ckpt):
    """Second image at the native 6x6 pos-emb grid (no interpolation) plus
    a 4x4 interpolated one, single prompt."""
    d, lm, vws = ckpt
    grids = [(4, 4), (6, 6)]
    pvs = [_pixels(g, seed=i + 1) for i, g in enumerate(grids)]
    pv = np.concatenate(pvs)
    n1 = (grids[0][0] // 2) * (grids[0][1] // 2)
    n2 = (grids[1][0] // 2) * (grids[1][1] // 2)
    prompt = [1] + [IMG] * n1 + [4] + [IMG] * n2 + [5, 9]
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(d), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=32,  # chunked
              max_num_seqs=2, max_model_len=128, tokenizer="unused")
    outs = llm.generate(
        [{"prompt_token_ids": prompt,
          "multi_modal_data": {"image": {
              "pixel_values": pv,
              "image_grid_hws": np.asarray(grids, np.int64)}}}],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))
    assert outs[0].outputs[0].token_ids == _hf_gen(lm, vws, prompt, pv,
                                                   grids, 6)
