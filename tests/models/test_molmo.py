"""Molmo vs a torch oracle mirroring reference molmo.py: the custom
decoder (fused att_proj, flat RMS qk norms, MulAndSilu ff_proj, optional
norm_after, merged wte + new_embedding) and the vision backbone
(CLIP ViT, vit_layers concat, pad_embed, 2x2 mean-query attention
pooling, SwiGLU projector, feat_is_patch filtering)."""
import json
import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from aphrodite_tpu.sampling_params import SamplingParams

IM_PATCH, IM_START, IM_COL, IM_END = 300, 301, 302, 303  # in extra vocab
H, L, NH, NKV, HD = 64, 2, 4, 2, 16
FUSED_I = 96                       # fused ff_proj width -> 48 per branch
V, EMB = 256, 256                  # vocab / embedding_size (+128 extra)
VD, VHD, VL, VMLP = 32, 2, 3, 48   # vision dims (3 layers, take [-2,-3])
PS = 4
VIT_LAYERS = [-2, -3]
EPS = 1e-5


def _make_weights(grid, seed=0):
    torch.manual_seed(seed)

    def rnd(*s):
        return torch.randn(*s) * 0.05

    num_pos = grid * grid + 1
    ws = {"model.transformer.wte.embedding": rnd(EMB, H),
          "model.transformer.wte.new_embedding": rnd(128, H),
          "model.transformer.ln_f.weight": torch.ones(H) + 0.1 * rnd(H),
          "model.transformer.ff_out.weight": rnd(EMB, H)}
    for i in range(L):
        p = f"model.transformer.blocks.{i}."
        ws[p + "attn_norm.weight"] = torch.ones(H) + 0.1 * rnd(H)
        ws[p + "ff_norm.weight"] = torch.ones(H) + 0.1 * rnd(H)
        ws[p + "att_proj.weight"] = rnd((NH + 2 * NKV) * HD, H)
        ws[p + "att_proj.bias"] = 0.02 * rnd((NH + 2 * NKV) * HD)
        ws[p + "attn_out.weight"] = rnd(H, NH * HD)
        ws[p + "q_norm.weight"] = torch.ones(NH * HD) + 0.1 * rnd(NH * HD)
        ws[p + "k_norm.weight"] = torch.ones(NKV * HD) + 0.1 * rnd(NKV * HD)
        ws[p + "ff_proj.weight"] = rnd(FUSED_I, H)
        ws[p + "ff_out.weight"] = rnd(H, FUSED_I // 2)
    vb = "model.vision_backbone."
    ws[vb + "image_vit.patch_embedding.weight"] = rnd(VD, 3 * PS * PS)
    ws[vb + "image_vit.class_embedding"] = rnd(VD)
    ws[vb + "image_vit.positional_embedding"] = rnd(num_pos, VD)
    ws[vb + "image_vit.pre_ln.weight"] = torch.ones(VD) + 0.1 * rnd(VD)
    ws[vb + "image_vit.pre_ln.bias"] = 0.02 * rnd(VD)
    for i in range(VL):
        p = vb + f"image_vit.transformer.resblocks.{i}."
        for nk in ("attention_norm", "ffn_norm"):
            ws[p + nk + ".weight"] = torch.ones(VD) + 0.1 * rnd(VD)
            ws[p + nk + ".bias"] = 0.02 * rnd(VD)
        ws[p + "attention.wq.weight"] = rnd(VD, VD)
        ws[p + "attention.wq.bias"] = 0.02 * rnd(VD)
        ws[p + "attention.wk.weight"] = rnd(VD, VD)
        ws[p + "attention.wk.bias"] = 0.02 * rnd(VD)
        ws[p + "attention.wv.weight"] = rnd(VD, VD)
        ws[p + "attention.wv.bias"] = 0.02 * rnd(VD)
        ws[p + "attention.wo.weight"] = rnd(VD, VD)
        ws[p + "attention.wo.bias"] = 0.02 * rnd(VD)
        ws[p + "feed_forward.w1.weight"] = rnd(VMLP, VD)
        ws[p + "feed_forward.w1.bias"] = 0.02 * rnd(VMLP)
        ws[p + "feed_forward.w2.weight"] = rnd(VD, VMLP)
        ws[p + "feed_forward.w2.bias"] = 0.02 * rnd(VD)
    FD = VD * len(VIT_LAYERS)
    ws[vb + "pad_embed"] = rnd(2, FD)
    for pk, ind in (("wq", FD), ("wk", FD), ("wv", FD), ("wo", VD)):
        outd = VD if pk != "wo" else VD
        ws[vb + f"image_pooling_2d.{pk}.weight"] = rnd(outd, ind)
        ws[vb + f"image_pooling_2d.{pk}.bias"] = 0.02 * rnd(outd)
    ws[vb + "image_projector.w1.weight"] = rnd(FUSED_I // 2, VD)
    ws[vb + "image_projector.w3.weight"] = rnd(FUSED_I // 2, VD)
    ws[vb + "image_projector.w2.weight"] = rnd(H, FUSED_I // 2)
    return ws


def _rms(x, w, eps=EPS):
    return (x * torch.rsqrt((x.float() ** 2).mean(-1, keepdim=True) + eps)
            * w).to(x.dtype)


def _mha(q, k, v, nh, nkv, hd):
    B, Tq = q.shape[:2]
    Tk = k.shape[1]
    q = q.view(B, Tq, nh, hd).transpose(1, 2)
    k = k.view(B, Tk, nkv, hd).repeat_interleave(
        nh // nkv, 2).transpose(1, 2)
    v = v.view(B, Tk, nkv, hd).repeat_interleave(
        nh // nkv, 2).transpose(1, 2)
    o = F.scaled_dot_product_attention(q, k, v)
    return o.transpose(1, 2).reshape(B, Tq, nh * hd)


def _vision_oracle(ws, crops, masks, fis, grid):
    vb = "model.vision_backbone."
    vhd = VD // VHD
    T = crops.shape[0]
    x = crops @ ws[vb + "image_vit.patch_embedding.weight"].T
    cls = ws[vb + "image_vit.class_embedding"].view(1, 1, -1).expand(
        T, 1, VD)
    x = torch.cat([cls, x], 1) + ws[vb + "image_vit.positional_embedding"]
    x = F.layer_norm(x, (VD,), ws[vb + "image_vit.pre_ln.weight"],
                     ws[vb + "image_vit.pre_ln.bias"], EPS)
    outs = []
    for i in range(VL):
        p = vb + f"image_vit.transformer.resblocks.{i}."
        h = F.layer_norm(x, (VD,), ws[p + "attention_norm.weight"],
                         ws[p + "attention_norm.bias"], EPS)
        o = _mha(h @ ws[p + "attention.wq.weight"].T
                 + ws[p + "attention.wq.bias"],
                 h @ ws[p + "attention.wk.weight"].T
                 + ws[p + "attention.wk.bias"],
                 h @ ws[p + "attention.wv.weight"].T
                 + ws[p + "attention.wv.bias"], VHD, VHD, vhd)
        x = x + o @ ws[p + "attention.wo.weight"].T \
            + ws[p + "attention.wo.bias"]
        h = F.layer_norm(x, (VD,), ws[p + "ffn_norm.weight"],
                         ws[p + "ffn_norm.bias"], EPS)
        y = h @ ws[p + "feed_forward.w1.weight"].T \
            + ws[p + "feed_forward.w1.bias"]
        y = y * torch.sigmoid(1.702 * y)
        x = x + y @ ws[p + "feed_forward.w2.weight"].T \
            + ws[p + "feed_forward.w2.bias"]
        outs.append(x)
    f = torch.cat([outs[ly] for ly in VIT_LAYERS], -1)[:, 1:]
    all_pad = (masks == 0).float()
    part = ((masks < 1).float() * (1 - all_pad))
    f = f + ws[vb + "pad_embed"][0] * all_pad[..., None] \
        + ws[vb + "pad_embed"][1] * part[..., None]
    pg = (grid + 1) // 2
    FD = f.shape[-1]
    f = f.view(T, grid, grid, FD)
    if grid % 2:
        f = F.pad(f, (0, 0, 0, 1, 0, 1))
    f = f.view(T, pg, 2, pg, 2, FD).permute(0, 1, 3, 2, 4, 5).reshape(
        T * pg * pg, 4, FD)
    q = f.mean(-2, keepdim=True)
    o = _mha(q @ ws[vb + "image_pooling_2d.wq.weight"].T
             + ws[vb + "image_pooling_2d.wq.bias"],
             f @ ws[vb + "image_pooling_2d.wk.weight"].T
             + ws[vb + "image_pooling_2d.wk.bias"],
             f @ ws[vb + "image_pooling_2d.wv.weight"].T
             + ws[vb + "image_pooling_2d.wv.bias"], VHD, VHD, vhd)
    o = o @ ws[vb + "image_pooling_2d.wo.weight"].T \
        + ws[vb + "image_pooling_2d.wo.bias"]
    o = o.view(T, pg * pg, VD)
    y = F.silu(o @ ws[vb + "image_projector.w1.weight"].T) \
        * (o @ ws[vb + "image_projector.w3.weight"].T)
    feats = y @ ws[vb + "image_projector.w2.weight"].T  # [T, pg*pg, H]
    return feats.reshape(-1, H)[fis.reshape(-1)]


def _lm_oracle(ws, ids, img_rows, n_new, norm_after):
    """Greedy decode; img_rows scatter onto IM_PATCH positions."""
    embed = torch.cat([ws["model.transformer.wte.embedding"],
                       ws["model.transformer.wte.new_embedding"]])
    I = FUSED_I // 2
    inv = 10000.0 ** -(torch.arange(0, HD, 2).double() / HD)
    toks = list(ids)

    def rope(t, pos):
        ang = pos[:, None].double() * inv[None]
        c = torch.cos(ang)[:, None].float()
        s = torch.sin(ang)[:, None].float()
        t1, t2 = t[..., :HD // 2], t[..., HD // 2:]
        return torch.cat([t1 * c - t2 * s, t2 * c + t1 * s], -1)

    for _ in range(n_new):
        T = len(toks)
        pos = torch.arange(T)
        x = embed[torch.tensor(toks)]
        if img_rows is not None:
            p = [i for i, t in enumerate(ids) if t == IM_PATCH]
            x[torch.tensor(p)] = img_rows
        for i in range(L):
            pre = f"model.transformer.blocks.{i}."

            def attn(h):
                qkv = h @ ws[pre + "att_proj.weight"].T \
                    + ws[pre + "att_proj.bias"]
                q, k, v = qkv.split([NH * HD, NKV * HD, NKV * HD], -1)
                q = _rms(q, ws[pre + "q_norm.weight"])
                k = _rms(k, ws[pre + "k_norm.weight"])
                q = rope(q.view(T, NH, HD), pos)
                k = rope(k.view(T, NKV, HD), pos)
                v = v.view(T, NKV, HD)
                k = k.repeat_interleave(NH // NKV, 1)
                v = v.repeat_interleave(NH // NKV, 1)
                s = torch.einsum("qhd,khd->hqk", q, k) / math.sqrt(HD)
                mask = torch.tril(torch.ones(T, T, dtype=torch.bool))
                s = s.masked_fill(~mask[None], -torch.inf)
                o = torch.einsum("hqk,khd->qhd", F.softmax(s, -1), v)
                return o.reshape(T, NH * HD) @ ws[pre + "attn_out.weight"].T

            def mlp(h):
                y = h @ ws[pre + "ff_proj.weight"].T
                y = y[..., :I] * F.silu(y[..., I:])
                return y @ ws[pre + "ff_out.weight"].T

            if norm_after:
                x = x + _rms(attn(x), ws[pre + "attn_norm.weight"])
                x = x + _rms(mlp(x), ws[pre + "ff_norm.weight"])
            else:
                x = x + attn(_rms(x, ws[pre + "attn_norm.weight"]))
                x = x + mlp(_rms(x, ws[pre + "ff_norm.weight"]))
        x = _rms(x, ws["model.transformer.ln_f.weight"])
        logits = x[-1] @ ws["model.transformer.ff_out.weight"].T
        toks.append(int(torch.argmax(logits)))
    return toks[len(ids):]


def _save(tmp_path, ws, grid, norm_after):
    from safetensors.numpy import save_file
    save_file({k: np.ascontiguousarray(v.numpy()) for k, v in ws.items()},
              str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps({
        "architectures": ["MolmoForCausalLM"], "model_type": "molmo",
        "hidden_size": H, "intermediate_size": FUSED_I,
        "num_hidden_layers": L, "num_attention_heads": NH,
        "num_key_value_heads": NKV, "vocab_size": V, "embedding_size": EMB,
        "qkv_bias": True, "norm_after": norm_after,
        "attention_layer_norm": True, "layer_norm_eps": EPS,
        "rope_theta": 10000.0, "max_position_embeddings": 512,
        "weight_tying": False, "layer_norm_type": "rms",
        "img_patch_id": IM_PATCH, "vit_layers": VIT_LAYERS,
        "vision_config": {
            "image_emb_dim": VD, "image_num_heads": VHD,
            "image_num_key_value_heads": VHD, "image_num_layers": VL,
            "image_mlp_dim": VMLP, "image_patch_size": PS,
            "image_default_input_size": [grid * PS, grid * PS],
            "image_num_pos": grid * grid + 1, "image_norm_eps": EPS},
        "tie_word_embeddings": False, "torch_dtype": "float32"}))


def _crops(n, grid, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(n, grid * grid, 3 * PS * PS).astype(np.float32) * 0.5


def _llm(d, **kw):
    from aphrodite_tpu.entrypoints.llm import LLM
    args = dict(model=str(d), dtype="float32", block_size=16,
                num_kv_blocks=128, max_num_batched_tokens=64,
                max_num_seqs=4, max_model_len=128, tokenizer="unused")
    args.update(kw)
    return LLM(**args)


@pytest.mark.parametrize("norm_after", [False, True])
def test_molmo_matches_oracle(tmp_path, norm_after):
    grid = 4  # 16 patches -> pooled 2x2 = 4 features per crop
    ws = _make_weights(grid)
    d = tmp_path / ("na" if norm_after else "pre")
    d.mkdir()
    _save(d, ws, grid, norm_after)
    crops = _crops(2, grid, seed=3)
    masks = np.ones((2, grid * grid), np.float32)
    masks[1, 10:] = 0.0   # all-pad patches on crop 2
    masks[1, 8:10] = 0.5  # partial-pad patches
    fis = np.array([[1, 1, 1, 0], [1, 0, 1, 0]], bool)
    # spans: run of 3 (crop 1) + im_col + run of 2 (crop 2)
    prompt = ([1, 7, IM_START] + [IM_PATCH] * 3 + [IM_COL]
              + [IM_PATCH] * 2 + [IM_END, 5, 9])
    outs = _llm(d).generate(
        [{"prompt_token_ids": prompt,
          "multi_modal_data": {"image": {
              "images": crops, "image_masks": masks,
              "feat_is_patch": fis}}},
         [3, 11, 12, 13]],
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True))
    img_rows = _vision_oracle(ws, torch.tensor(crops), torch.tensor(masks),
                              torch.tensor(fis), grid)
    assert outs[0].outputs[0].token_ids == _lm_oracle(
        ws, prompt, img_rows, 8, norm_after)
    assert outs[1].outputs[0].token_ids == _lm_oracle(
        ws, [3, 11, 12, 13], None, 8, norm_after)


def test_molmo_odd_grid_pooling(tmp_path):
    """Odd patch grid exercises the zero-pad row/col before 2x2 pooling."""
    grid = 3  # 9 patches -> pooled 2x2 grid of 4
    ws = _make_weights(grid, seed=5)
    _save(tmp_path, ws, grid, False)
    crops = _crops(1, grid, seed=6)
    masks = np.ones((1, grid * grid), np.float32)
    fis = np.ones((1, 4), bool)
    prompt = [1, IM_START] + [IM_PATCH] * 4 + [IM_END, 5]
    outs = _llm(tmp_path).generate(
        [{"prompt_token_ids": prompt,
          "multi_modal_data": {"image": {
              "images": crops, "image_masks": masks,
              "feat_is_patch": fis}}}],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))
    img_rows = _vision_oracle(ws, torch.tensor(crops), torch.tensor(masks),
                              torch.tensor(fis), grid)
    assert outs[0].outputs[0].token_ids == _lm_oracle(
        ws, prompt, img_rows, 6, False)
