"""Ovis2: AIMv2 tower + softmax visual tokenizer + VTE indicator assembly
vs a torch oracle mirroring reference aimv2.py/ovis2.py; the Qwen2 LM half
vs HF Qwen2ForCausalLM driven with the oracle's inputs_embeds."""
import json
import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from aphrodite_tpu.sampling_params import SamplingParams

PAD = 250                      # image_pad_token_id (tiny vocab)
VD, VH, VL, VI = 32, 2, 2, 48  # aimv2 hidden/heads/layers/intermediate
PS, S = 4, 16                  # patch size, crop side -> 4x4 patches
HS = 2                         # hidden_stride -> 2x2=4 tokens per crop
VVOCAB = 64                    # visual vocab (59 head logits + 5)
TD = 64                        # text hidden
T_CROP = 4


def _text_cfg():
    from transformers import Qwen2Config
    return Qwen2Config(vocab_size=256, hidden_size=TD, num_hidden_layers=2,
                       num_attention_heads=4, num_key_value_heads=2,
                       intermediate_size=128, max_position_embeddings=512,
                       rms_norm_eps=1e-6, rope_theta=10000.0,
                       tie_word_embeddings=False, pad_token_id=0)


def _make_vision_weights(seed=1):
    torch.manual_seed(seed)

    def rnd(*s):
        return torch.randn(*s) * 0.05

    G2 = (S // PS) ** 2
    ws = {"visual_tokenizer.backbone.preprocessor.patchifier.proj.weight":
              rnd(VD, 3, PS, PS),
          "visual_tokenizer.backbone.preprocessor.patchifier.proj.bias":
              0.02 * rnd(VD),
          "visual_tokenizer.backbone.preprocessor.patchifier.norm.weight":
              torch.ones(VD) + 0.1 * rnd(VD),
          "visual_tokenizer.backbone.preprocessor.pos_embed":
              rnd(1, G2, VD),
          "visual_tokenizer.backbone.trunk.post_trunk_norm.weight":
              torch.ones(VD),
          "visual_tokenizer.head.0.weight": rnd(VVOCAB - 5, VD * HS * HS),
          "visual_tokenizer.head.1.weight":
              torch.ones(VVOCAB - 5) + 0.1 * rnd(VVOCAB - 5),
          "visual_tokenizer.head.1.bias": 0.02 * rnd(VVOCAB - 5),
          "vte.weight": rnd(VVOCAB, TD)}
    for i in range(VL):
        p = f"visual_tokenizer.backbone.trunk.blocks.{i}."
        ws[p + "norm_1.weight"] = torch.ones(VD) + 0.1 * rnd(VD)
        ws[p + "norm_2.weight"] = torch.ones(VD) + 0.1 * rnd(VD)
        ws[p + "attn.qkv.weight"] = rnd(3 * VD, VD)
        ws[p + "attn.proj.weight"] = rnd(VD, VD)
        ws[p + "mlp.fc1.weight"] = rnd(VI, VD)
        ws[p + "mlp.fc3.weight"] = rnd(VI, VD)
        ws[p + "mlp.fc2.weight"] = rnd(VD, VI)
    return ws


def _rms(x, w, eps=1e-5):
    return x * torch.rsqrt((x ** 2).mean(-1, keepdim=True) + eps) * w


def _indicator_ids(grid):
    start, prefix, col, row, end = (VVOCAB - 1, VVOCAB - 2, VVOCAB - 3,
                                    VVOCAB - 4, VVOCAB - 5)
    r, c = grid
    out = [start, prefix]
    if r * c > 1:
        for ri in range(r):
            out.extend([col] * (c - 1))
            if ri < r - 1:
                out.append(row)
    out.append(end)
    return out


def _ovis_oracle(ws, pixels, grids):
    """pixels [N_crops, 3, S, S] -> [sum counts, TD] (aimv2 backbone,
    tokenizer head, softmax tokens, VTE + indicator interleave)."""
    hd = VD // VH
    x = F.conv2d(pixels,
                 ws["visual_tokenizer.backbone.preprocessor.patchifier"
                    ".proj.weight"],
                 ws["visual_tokenizer.backbone.preprocessor.patchifier"
                    ".proj.bias"], stride=PS).flatten(2).transpose(1, 2)
    x = _rms(x, ws["visual_tokenizer.backbone.preprocessor.patchifier"
                   ".norm.weight"])
    x = x + ws["visual_tokenizer.backbone.preprocessor.pos_embed"]
    N, T, _ = x.shape
    for i in range(VL):
        p = f"visual_tokenizer.backbone.trunk.blocks.{i}."
        h = _rms(x, ws[p + "norm_1.weight"])
        qkv = h @ ws[p + "attn.qkv.weight"].T
        q, k, v = qkv.view(N, T, 3, VH, hd).permute(2, 0, 3, 1, 4).unbind(0)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(N, T, VD) @ ws[p + "attn.proj.weight"].T
        x = x + o
        h = _rms(x, ws[p + "norm_2.weight"])
        y = (F.silu(h @ ws[p + "mlp.fc1.weight"].T)
             * (h @ ws[p + "mlp.fc3.weight"].T)) @ ws[p + "mlp.fc2.weight"].T
        x = x + y
    # hidden_stride merge
    side = int(math.isqrt(T))
    x = x.view(N, side // HS, HS, side // HS, HS, VD).permute(
        0, 1, 3, 2, 4, 5).reshape(N, (side // HS) ** 2, HS * HS * VD)
    logits = x @ ws["visual_tokenizer.head.0.weight"].T
    logits = F.layer_norm(logits, (VVOCAB - 5,),
                          ws["visual_tokenizer.head.1.weight"],
                          ws["visual_tokenizer.head.1.bias"])
    toks = F.softmax(logits, -1)
    toks = torch.cat([toks, torch.zeros(N, toks.shape[1], 5)], -1)
    vis = toks @ ws["vte.weight"]  # [N, T_CROP, TD]
    pieces, ci = [], 0
    for grid in grids:
        inds = torch.tensor(_indicator_ids(grid))
        ind_emb = ws["vte.weight"][inds]
        patches = 1 if grid[0] * grid[1] <= 1 else 1 + grid[0] * grid[1]
        for i in range(patches):
            pieces.append(ind_emb[i:i + 1])
            pieces.append(vis[ci + i])
        pieces.append(ind_emb[patches:])
        ci += patches
    return torch.cat(pieces)


def _crops(n, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(n, 3, S, S).astype(np.float32) * 0.5


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from transformers import Qwen2ForCausalLM
    torch.manual_seed(0)
    lm = Qwen2ForCausalLM(_text_cfg()).eval()
    vws = _make_vision_weights()
    d = tmp_path_factory.mktemp("tiny_ovis2")
    tensors = {f"llm.{k}": v for k, v in lm.state_dict().items()}
    tensors.update(vws)
    from safetensors.numpy import save_file
    save_file({k: np.ascontiguousarray(v.detach().numpy())
               for k, v in tensors.items()},
              str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps({
        "architectures": ["Ovis2ForConditionalGeneration"],
        "model_type": "ovis",
        "llm_config": json.loads(_text_cfg().to_json_string()),
        "visual_tokenizer_config": {
            "model_type": "aimv2_visual_tokenizer", "vocab_size": VVOCAB,
            "tokenize_function": "softmax", "hidden_stride": HS,
            "drop_cls_token": False,
            "backbone_config": {
                "model_type": "aimv2", "hidden_size": VD,
                "intermediate_size": VI, "num_hidden_layers": VL,
                "num_attention_heads": VH, "patch_size": PS,
                "image_size": S, "rms_norm_eps": 1e-5,
                "qkv_bias": False, "use_bias": False}},
        "image_pad_token_id": PAD, "hidden_size": TD, "vocab_size": 256,
        "tie_word_embeddings": False, "torch_dtype": "float32"}))
    return d, lm, vws


def _hf_gen(lm, vws, ids, pixels, grids, n_new):
    embeds = lm.get_input_embeddings()(torch.tensor([ids]))
    if pixels is not None:
        img = _ovis_oracle(vws, torch.tensor(pixels), grids)
        pos = [i for i, t in enumerate(ids) if t == PAD]
        assert len(pos) == img.shape[0], (len(pos), img.shape)
        embeds[0, torch.tensor(pos)] = img
    with torch.no_grad():
        out = lm.generate(inputs_embeds=embeds,
                          attention_mask=torch.ones(1, len(ids),
                                                    dtype=torch.long),
                          max_new_tokens=n_new, do_sample=False,
                          eos_token_id=None)
    return out[0].tolist()[:n_new]


def _llm(d, **kw):
    from aphrodite_tpu.entrypoints.llm import LLM
    args = dict(model=str(d), dtype="float32", block_size=16,
                num_kv_blocks=128, max_num_batched_tokens=64,
                max_num_seqs=4, max_model_len=128, tokenizer="unused")
    args.update(kw)
    return LLM(**args)


def test_ovis2_single_crop(ckpt):
    d, lm, vws = ckpt
    grids = [(1, 1)]
    pv = _crops(1)
    count = 3 + 1 * T_CROP  # indicators + crop tokens
    prompt = [1, 7] + [PAD] * count + [5, 9, 20]
    outs = _llm(d).generate(
        [{"prompt_token_ids": prompt,
          "multi_modal_data": {"image": {
              "pixel_values": pv,
              "grids": np.asarray(grids, np.int64)}}},
         [3, 11, 12, 13]],
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True))
    assert outs[0].outputs[0].token_ids == _hf_gen(lm, vws, prompt, pv,
                                                   grids, 8)
    assert outs[1].outputs[0].token_ids == _hf_gen(lm, vws, [3, 11, 12, 13],
                                                   None, None, 8)


def test_ovis2_partition_grid(ckpt):
    """1x2 partition grid: global crop + 2 tiles, col-sep indicator."""
    d, lm, vws = ckpt
    grids = [(1, 2)]
    pv = _crops(3, seed=2)  # global + 2 tiles
    count = (1 * 2 + 2) + 3 * T_CROP
    prompt = [1] + [PAD] * count + [5, 9]
    outs = _llm(d, max_num_batched_tokens=16).generate(  # chunked prefill
        [{"prompt_token_ids": prompt,
          "multi_modal_data": {"image": {
              "pixel_values": pv,
              "grids": np.asarray(grids, np.int64)}}}],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))
    assert outs[0].outputs[0].token_ids == _hf_gen(lm, vws, prompt, pv,
                                                   grids, 6)
