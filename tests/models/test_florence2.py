"""Florence-2: DaViT tower (staged conv embeds, window + channel
attention, depthwise conv residuals), 2D/temporal position embeds +
projection, and pad-position encoder merge vs a torch oracle; the BART LM
half vs HF BartForConditionalGeneration with the oracle's encoder
embeds."""
import json

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from aphrodite_tpu.sampling_params import SamplingParams

PAD, EOS = 1, 2
DIMS = (16, 32)
DEPTHS = (1, 1)
HEADS = (2, 2)
GROUPS = (2, 2)
PATCH = (3, 2)
STRIDE = (2, 2)
PADDING = (1, 0)
PRENORM = (False, True)
WIN = 2
TD = 64
SIDE = 4            # final grid for a 16x16 image (stride 2*2)
N_IMG = 1 + SIDE * SIDE   # spatial_avg_pool + temporal_avg_pool


def _text_cfg_dict():
    return {"model_type": "florence2_language", "vocab_size": 256,
            "d_model": TD, "encoder_layers": 2, "decoder_layers": 2,
            "encoder_attention_heads": 4, "decoder_attention_heads": 4,
            "encoder_ffn_dim": 128, "decoder_ffn_dim": 128,
            "max_position_embeddings": 128, "scale_embedding": True,
            "activation_function": "gelu", "pad_token_id": PAD,
            "bos_token_id": 0, "eos_token_id": EOS,
            "decoder_start_token_id": EOS, "is_encoder_decoder": True,
            "tie_word_embeddings": True}


def _bart():
    from transformers import BartConfig, BartForConditionalGeneration
    torch.manual_seed(0)
    d = dict(_text_cfg_dict())
    d.pop("model_type")
    cfg = BartConfig(**d)
    bart = BartForConditionalGeneration(cfg).eval()
    # Amplify cross-attention so the decoder actually listens to the
    # encoder (HF-init decoders otherwise collapse to a constant token,
    # which would let a broken vision path pass greedy comparison).
    with torch.no_grad():
        for layer in bart.model.decoder.layers:
            for proj in (layer.encoder_attn.q_proj,
                         layer.encoder_attn.v_proj,
                         layer.encoder_attn.out_proj):
                proj.weight *= 4.0
    return bart


def _make_vision_weights(seed=1):
    torch.manual_seed(seed)

    def rnd(*s):
        return torch.randn(*s) * 0.05

    ws = {}
    vt = "vision_tower."
    for i in range(2):
        cin = 3 if i == 0 else DIMS[i - 1]
        D, k = DIMS[i], PATCH[i]
        nd = cin if PRENORM[i] else D
        ws[vt + f"convs.{i}.proj.weight"] = rnd(D, cin, k, k)
        ws[vt + f"convs.{i}.proj.bias"] = 0.02 * rnd(D)
        ws[vt + f"convs.{i}.norm.weight"] = torch.ones(nd) + 0.1 * rnd(nd)
        ws[vt + f"convs.{i}.norm.bias"] = 0.02 * rnd(nd)
        I = 4 * D
        for j in range(DEPTHS[i]):
            for blk, attn in (("spatial_block", "window_attn"),
                              ("channel_block", "channel_attn")):
                p = vt + f"blocks.{i}.{j}.{blk}."
                ws[p + "conv1.fn.dw.weight"] = rnd(D, 1, 3, 3)
                ws[p + "conv1.fn.dw.bias"] = 0.02 * rnd(D)
                ws[p + "conv2.fn.dw.weight"] = rnd(D, 1, 3, 3)
                ws[p + "conv2.fn.dw.bias"] = 0.02 * rnd(D)
                ws[p + f"{attn}.norm.weight"] = torch.ones(D) + 0.1 * rnd(D)
                ws[p + f"{attn}.norm.bias"] = 0.02 * rnd(D)
                ws[p + f"{attn}.fn.qkv.weight"] = rnd(3 * D, D)
                ws[p + f"{attn}.fn.qkv.bias"] = 0.02 * rnd(3 * D)
                ws[p + f"{attn}.fn.proj.weight"] = rnd(D, D)
                ws[p + f"{attn}.fn.proj.bias"] = 0.02 * rnd(D)
                ws[p + "ffn.norm.weight"] = torch.ones(D) + 0.1 * rnd(D)
                ws[p + "ffn.norm.bias"] = 0.02 * rnd(D)
                ws[p + "ffn.fn.net.fc1.weight"] = rnd(I, D)
                ws[p + "ffn.fn.net.fc1.bias"] = 0.02 * rnd(I)
                ws[p + "ffn.fn.net.fc2.weight"] = rnd(D, I)
                ws[p + "ffn.fn.net.fc2.bias"] = 0.02 * rnd(D)
    DL = DIMS[-1]
    # Strong projection so greedy tokens actually depend on the image
    # (tiny random towers otherwise drown in the BART prior).
    ws["image_projection"] = rnd(DL, TD) * 40
    ws["image_proj_norm.weight"] = torch.ones(TD) + 0.1 * rnd(TD)
    ws["image_proj_norm.bias"] = 0.02 * rnd(TD)
    ws["image_pos_embed.row_embeddings.weight"] = rnd(8, DL // 2)
    ws["image_pos_embed.column_embeddings.weight"] = rnd(8, DL - DL // 2)
    ws["visual_temporal_embed.pos_idx_to_embed"] = rnd(4, DL)
    return ws


def _davit_oracle(ws, pixels):
    """pixels [1, 3, 16, 16] -> [N_IMG, TD] projected rows (mirrors
    reference florence2.py DaViT + _encode_image)."""
    vt = "vision_tower."
    x = pixels
    for i in range(2):
        D = DIMS[i]
        if i > 0:
            B, N, C = tokens.shape
            if PRENORM[i]:
                tokens = F.layer_norm(tokens, (C,),
                                      ws[vt + f"convs.{i}.norm.weight"],
                                      ws[vt + f"convs.{i}.norm.bias"], 1e-5)
            side = int(N ** 0.5)
            x = tokens.transpose(1, 2).reshape(B, C, side, side)
        x = F.conv2d(x, ws[vt + f"convs.{i}.proj.weight"],
                     ws[vt + f"convs.{i}.proj.bias"], stride=STRIDE[i],
                     padding=PADDING[i])
        B, D_, H, W = x.shape
        tokens = x.flatten(2).transpose(1, 2)
        if not PRENORM[i]:
            tokens = F.layer_norm(tokens, (D,),
                                  ws[vt + f"convs.{i}.norm.weight"],
                                  ws[vt + f"convs.{i}.norm.bias"], 1e-5)
        for j in range(DEPTHS[i]):
            for blk, attn in (("spatial_block", "window_attn"),
                              ("channel_block", "channel_attn")):
                p = vt + f"blocks.{i}.{j}.{blk}."

                def dw(t, key):
                    B, N, C = t.shape
                    img = t.transpose(1, 2).reshape(B, C, H, W)
                    o = F.conv2d(img, ws[p + key + ".weight"],
                                 ws[p + key + ".bias"], padding=1, groups=C)
                    return o.flatten(2).transpose(1, 2)

                tokens = tokens + dw(tokens, "conv1.fn.dw")
                h = F.layer_norm(tokens, (D,),
                                 ws[p + f"{attn}.norm.weight"],
                                 ws[p + f"{attn}.norm.bias"], 1e-5)
                qkv = h @ ws[p + f"{attn}.fn.qkv.weight"].T \
                    + ws[p + f"{attn}.fn.qkv.bias"]
                if blk == "spatial_block":
                    nh = HEADS[i]
                    hv = qkv.reshape(1, H, W, 3 * D)
                    hv = hv.reshape(1, H // WIN, WIN, W // WIN, WIN, 3 * D)
                    hv = hv.permute(0, 1, 3, 2, 4, 5).reshape(
                        -1, WIN * WIN, 3 * D)
                    q, k, v = hv.chunk(3, -1)
                    Bw, Nw = q.shape[:2]
                    hd = D // nh
                    q = q.view(Bw, Nw, nh, hd).transpose(1, 2)
                    k = k.view(Bw, Nw, nh, hd).transpose(1, 2)
                    v = v.view(Bw, Nw, nh, hd).transpose(1, 2)
                    o = F.scaled_dot_product_attention(q, k, v)
                    o = o.transpose(1, 2).reshape(Bw, Nw, D)
                    o = o @ ws[p + f"{attn}.fn.proj.weight"].T \
                        + ws[p + f"{attn}.fn.proj.bias"]
                    o = o.reshape(1, H // WIN, W // WIN, WIN, WIN, D)
                    o = o.permute(0, 1, 3, 2, 4, 5).reshape(1, H * W, D)
                else:
                    g = GROUPS[i]
                    cg = D // g
                    N = H * W
                    q, k, v = qkv.reshape(1, N, 3, g, cg).permute(
                        2, 0, 3, 1, 4).unbind(0)
                    q = q * (float(N) ** -0.5)
                    att = (q.transpose(-1, -2) @ k).softmax(-1)
                    o = (att @ v.transpose(-1, -2)).transpose(-1, -2)
                    o = o.transpose(1, 2).reshape(1, N, D)
                    o = o @ ws[p + f"{attn}.fn.proj.weight"].T \
                        + ws[p + f"{attn}.fn.proj.bias"]
                tokens = tokens + o
                tokens = tokens + dw(tokens, "conv2.fn.dw")
                h = F.layer_norm(tokens, (D,), ws[p + "ffn.norm.weight"],
                                 ws[p + "ffn.norm.bias"], 1e-5)
                h = F.gelu(h @ ws[p + "ffn.fn.net.fc1.weight"].T
                           + ws[p + "ffn.fn.net.fc1.bias"])
                tokens = tokens + h @ ws[p + "ffn.fn.net.fc2.weight"].T \
                    + ws[p + "ffn.fn.net.fc2.bias"]
    # 2D positions (column embeds first) + temporal row 0
    DL = DIMS[-1]
    col = ws["image_pos_embed.column_embeddings.weight"][:SIDE]
    row = ws["image_pos_embed.row_embeddings.weight"][:SIDE]
    pos = torch.cat([col.unsqueeze(0).repeat(SIDE, 1, 1),
                     row.unsqueeze(1).repeat(1, SIDE, 1)], -1)
    x = tokens + pos.reshape(1, SIDE * SIDE, DL)
    x = x + ws["visual_temporal_embed.pos_idx_to_embed"][0]
    x = torch.cat([x.mean(1, keepdim=True), x], 1)  # spatial avg + temporal
    x = x @ ws["image_projection"]
    x = F.layer_norm(x, (TD,), ws["image_proj_norm.weight"],
                     ws["image_proj_norm.bias"], 1e-5)
    return x[0]


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    bart = _bart()
    vws = _make_vision_weights()
    d = tmp_path_factory.mktemp("tiny_florence2")
    tensors = {f"language_model.{k}": v for k, v in bart.state_dict().items()}
    tensors.update(vws)
    from safetensors.numpy import save_file
    save_file({k: np.ascontiguousarray(v.detach().numpy())
               for k, v in tensors.items()},
              str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps({
        "architectures": ["Florence2ForConditionalGeneration"],
        "model_type": "florence2",
        "text_config": _text_cfg_dict(),
        "vision_config": {
            "model_type": "davit", "depths": DEPTHS, "dim_embed": DIMS,
            "num_heads": HEADS, "num_groups": GROUPS,
            "patch_size": PATCH, "patch_stride": STRIDE,
            "patch_padding": PADDING, "patch_prenorm": PRENORM,
            "window_size": WIN, "projection_dim": TD,
            "image_pos_embed": {"type": "learned_abs_2d",
                                "max_pos_embeddings": 8},
            "visual_temporal_embedding": {"type": "COSINE",
                                          "max_temporal_embeddings": 4},
            "image_feature_source": ["spatial_avg_pool",
                                     "temporal_avg_pool"]},
        "pad_token_id": PAD, "bos_token_id": 0, "eos_token_id": EOS,
        "decoder_start_token_id": EOS, "vocab_size": 256,
        "is_encoder_decoder": True, "torch_dtype": "float32"}))
    return d, bart, vws


def _pixels(seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(1, 3, 16, 16).astype(np.float32) * 0.5


def _hf_gen(bart, vws, enc_text, pixels, n_new):
    enc_ids = [PAD] * N_IMG + enc_text if pixels is not None else enc_text
    emb = bart.model.shared(torch.tensor([enc_ids]))
    if pixels is not None:
        emb[0, :N_IMG] = _davit_oracle(vws, torch.tensor(pixels))
    with torch.no_grad():
        out = bart.generate(
            inputs_embeds=emb,
            attention_mask=torch.ones(1, len(enc_ids), dtype=torch.long),
            decoder_input_ids=torch.tensor([[EOS]]),
            max_new_tokens=n_new, do_sample=False, eos_token_id=None,
            min_new_tokens=n_new)
    return out[0][1:1 + n_new].tolist()


def test_florence2_matches_oracle(ckpt):
    d, bart, vws = ckpt
    pv = _pixels()
    enc_text = [0, 37, 42, 99, 2]
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(d), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=128, tokenizer="unused")
    outs = llm.generate(
        [{"encoder_prompt_token_ids": enc_text,
          "multi_modal_data": {"image": {"pixel_values": pv}}},
         {"encoder_prompt_token_ids": enc_text}],  # text-only enc-dec
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                       logprobs=1))
    assert outs[0].outputs[0].token_ids == _hf_gen(bart, vws, enc_text,
                                                   pv, 6)
    assert outs[1].outputs[0].token_ids == _hf_gen(bart, vws, enc_text,
                                                   None, 6)
    # Greedy tokens collapse to a copy-loop on untrained weights, so also
    # check the first-step LOGPROB numerically: it moves with the image
    # rows and would catch a broken vision path.
    enc_ids = [PAD] * N_IMG + enc_text
    emb = bart.model.shared(torch.tensor([enc_ids]))
    emb[0, :N_IMG] = _davit_oracle(vws, torch.tensor(pv))
    with torch.no_grad():
        logits = bart(inputs_embeds=emb,
                      attention_mask=torch.ones(1, len(enc_ids),
                                                dtype=torch.long),
                      decoder_input_ids=torch.tensor([[EOS]])
                      ).logits[0, -1].float()
    tok = outs[0].outputs[0].token_ids[0]
    exp_lp = torch.log_softmax(logits, -1)[tok].item()
    got_lp = outs[0].outputs[0].logprobs[0][tok].logprob
    np.testing.assert_allclose(got_lp, exp_lp, rtol=2e-3, atol=2e-3)
