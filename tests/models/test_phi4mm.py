"""Phi-4-multimodal vs torch oracles mirroring reference phi4mm.py /
phi4mm_audio.py / phi4mm_utils.py: SigLIP-navit with mask-bucketized
positions + avgpool compression + HD transform (sub_GN/glb_GN), the
nemo-subsampled causal conformer with T5 relative bias (incl. the
500-frame unfold), dual speech/vision audio projections, and LoRA
base_layer unwrapping; the Phi-3 LM half vs HF Phi3ForCausalLM."""
import json
import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from aphrodite_tpu.sampling_params import SamplingParams

IMG_TOK, AUD_TOK = 250, 251
TD = 64
VD, VH, VL, VI, PS, S = 32, 2, 3, 48, 4, 16   # vision (runs VL-1 layers)
G, CG = 4, 2                                  # vit grid / compressed grid
AD, AH, AL, AF = 32, 2, 2, 48                 # audio dim/heads/blocks/ffn
AMELS, ACH, TRED = 16, 8, 4                   # mels, conv channels, t-red
T5MAX = 20
EPS = 1e-6


def _text_cfg():
    from transformers import Phi3Config
    return Phi3Config(vocab_size=256, hidden_size=TD, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      intermediate_size=128, max_position_embeddings=512,
                      rms_norm_eps=1e-5, rope_theta=10000.0,
                      tie_word_embeddings=False, pad_token_id=0)


def _make_mm_weights(seed=3):
    torch.manual_seed(seed)

    def rnd(*s):
        return torch.randn(*s) * 0.05

    IMG = "model.embed_tokens_extend.image_embed."
    AUD = "model.embed_tokens_extend.audio_embed."
    ws = {IMG + "glb_GN": rnd(1, 1, VD), IMG + "sub_GN": rnd(1, 1, 1, VD),
          IMG + "img_projection.0.weight": rnd(TD, VD),
          IMG + "img_projection.0.bias": 0.02 * rnd(TD),
          IMG + "img_projection.2.weight": rnd(TD, TD),
          IMG + "img_projection.2.bias": 0.02 * rnd(TD)}
    vp = IMG + "img_processor."
    ws[vp + "embeddings.patch_embedding.weight"] = rnd(VD, 3, PS, PS)
    ws[vp + "embeddings.patch_embedding.bias"] = 0.02 * rnd(VD)
    ws[vp + "embeddings.position_embedding.weight"] = rnd(G * G, VD)
    for i in range(VL):
        p = vp + f"encoder.layers.{i}."
        for nk in ("layer_norm1", "layer_norm2"):
            ws[p + nk + ".weight"] = torch.ones(VD) + 0.1 * rnd(VD)
            ws[p + nk + ".bias"] = 0.02 * rnd(VD)
        for pk in ("q_proj", "k_proj", "v_proj", "out_proj"):
            ws[p + f"self_attn.{pk}.weight"] = rnd(VD, VD)
            ws[p + f"self_attn.{pk}.bias"] = 0.02 * rnd(VD)
        ws[p + "mlp.fc1.weight"] = rnd(VI, VD)
        ws[p + "mlp.fc1.bias"] = 0.02 * rnd(VI)
        ws[p + "mlp.fc2.weight"] = rnd(VD, VI)
        ws[p + "mlp.fc2.bias"] = 0.02 * rnd(VD)
    enc = AUD + "encoder."
    ws[enc + "encoder_embedding.global_mean"] = 0.1 * rnd(AMELS)
    ws[enc + "encoder_embedding.global_invstd"] = \
        torch.ones(AMELS) + 0.1 * rnd(AMELS)
    ws[enc + "embed.conv.0.weight"] = rnd(ACH, 1, 3, 3)
    ws[enc + "embed.conv.0.bias"] = 0.02 * rnd(ACH)
    ws[enc + "embed.conv.2.weight"] = rnd(ACH, 1, 3, 3)
    ws[enc + "embed.conv.2.bias"] = 0.02 * rnd(ACH)
    ws[enc + "embed.conv.3.weight"] = rnd(ACH, ACH, 1, 1)
    ws[enc + "embed.conv.3.bias"] = 0.02 * rnd(ACH)
    out_freq = AMELS
    for _ in range(2):
        out_freq = (out_freq - 1) // 2 + 1
    ws[enc + "embed.out.weight"] = rnd(AD, ACH * out_freq)
    ws[enc + "embed.out.bias"] = 0.02 * rnd(AD)
    ws[enc + "relative_attention_bias_layer.bias_values.weight"] = \
        rnd(2 * T5MAX, AH)
    for i in range(AL):
        p = enc + f"encoders.{i}."
        for ff in ("feed_forward_in", "feed_forward_out"):
            ws[p + ff + ".layer_norm.weight"] = torch.ones(AD) + 0.1 * rnd(AD)
            ws[p + ff + ".layer_norm.bias"] = 0.02 * rnd(AD)
            ws[p + ff + ".net.0.linear.weight"] = rnd(2 * AF, AD)
            ws[p + ff + ".net.0.linear.bias"] = 0.02 * rnd(2 * AF)
            ws[p + ff + ".net.2.weight"] = rnd(AD, AF)
            ws[p + ff + ".net.2.bias"] = 0.02 * rnd(AD)
        ws[p + "layer_norm_att.weight"] = torch.ones(AD) + 0.1 * rnd(AD)
        ws[p + "layer_norm_att.bias"] = 0.02 * rnd(AD)
        for pk in ("linear_q", "linear_k", "linear_v", "linear_out"):
            ws[p + f"self_attn.{pk}.weight"] = rnd(AD, AD)
            ws[p + f"self_attn.{pk}.bias"] = 0.02 * rnd(AD)
        ws[p + "conv.layer_norm.weight"] = torch.ones(AD) + 0.1 * rnd(AD)
        ws[p + "conv.layer_norm.bias"] = 0.02 * rnd(AD)
        ws[p + "conv.glu.ext_pw_conv_1d.weight"] = rnd(2 * AD, AD, 1)
        ws[p + "conv.glu.ext_pw_conv_1d.bias"] = 0.02 * rnd(2 * AD)
        ws[p + "conv.glu.b1"] = 0.02 * rnd(1, AD, 1)
        ws[p + "conv.glu.b2"] = 0.02 * rnd(1, AD, 1)
        ws[p + "conv.dw_sep_conv_1d.dw_conv.weight"] = rnd(AD, 1, 3)
        ws[p + "conv.dw_sep_conv_1d.dw_conv.bias"] = 0.02 * rnd(AD)
        ws[p + "conv.dw_sep_conv_1d.pw_conv.weight"] = rnd(AD, AD, 1)
        ws[p + "conv.dw_sep_conv_1d.pw_conv.bias"] = 0.02 * rnd(AD)
        ws[p + "conv.ext_pw_conv_1d.weight"] = rnd(AD, AD, 1)
        ws[p + "conv.ext_pw_conv_1d.bias"] = 0.02 * rnd(AD)
        ws[p + "layer_norm.weight"] = torch.ones(AD) + 0.1 * rnd(AD)
        ws[p + "layer_norm.bias"] = 0.02 * rnd(AD)
    for tag in ("speech", "vision"):
        ws[AUD + f"audio_projection.{tag}.0.weight"] = rnd(TD, AD)
        ws[AUD + f"audio_projection.{tag}.0.bias"] = 0.02 * rnd(TD)
        ws[AUD + f"audio_projection.{tag}.2.weight"] = rnd(TD, TD)
        ws[AUD + f"audio_projection.{tag}.2.bias"] = 0.02 * rnd(TD)
    return ws


def _swish(x):
    return x * torch.sigmoid(x)


def _navit_pos_ids(mask):
    side = mask.shape[0]
    ids = torch.zeros(side * side, dtype=torch.long)
    nb_h, nb_w = int(mask[:, 0].sum()), int(mask[0].sum())
    if nb_h == 0:
        return ids
    bounds = torch.arange(1 / side, 1.0, 1 / side)
    fh = torch.arange(0, 1 - 1e-6, 1 / nb_h)
    fw = torch.arange(0, 1 - 1e-6, 1 / nb_w)
    bh = torch.bucketize(fh, bounds, right=True)
    bw = torch.bucketize(fw, bounds, right=True)
    pos = (bh[:, None] * side + bw[None]).flatten()
    ids[mask.reshape(-1).bool()] = pos
    return ids


def _vision_oracle(ws, pv, sizes, mask):
    """pv [N, crops, 3, S, S] -> projected rows (HD transform)."""
    IMG = "model.embed_tokens_extend.image_embed."
    vp = IMG + "img_processor."
    n_img, n_crops = pv.shape[:2]
    x = pv.reshape(-1, 3, S, S)
    x = F.conv2d(x, ws[vp + "embeddings.patch_embedding.weight"],
                 ws[vp + "embeddings.patch_embedding.bias"], stride=PS)
    x = x.flatten(2).transpose(1, 2)  # [N, G*G, VD]
    pe = ws[vp + "embeddings.position_embedding.weight"]
    for n in range(x.shape[0]):
        ids = _navit_pos_ids(mask.reshape(-1, G, G)[n])
        x[n] = x[n] + pe[ids]
    hd = VD // VH
    for i in range(VL - 1):  # layer_idx -2 truncation
        p = vp + f"encoder.layers.{i}."
        h = F.layer_norm(x, (VD,), ws[p + "layer_norm1.weight"],
                         ws[p + "layer_norm1.bias"], EPS)
        q = (h @ ws[p + "self_attn.q_proj.weight"].T
             + ws[p + "self_attn.q_proj.bias"])
        k = (h @ ws[p + "self_attn.k_proj.weight"].T
             + ws[p + "self_attn.k_proj.bias"])
        v = (h @ ws[p + "self_attn.v_proj.weight"].T
             + ws[p + "self_attn.v_proj.bias"])
        N, P = q.shape[:2]
        q = q.view(N, P, VH, hd).transpose(1, 2)
        k = k.view(N, P, VH, hd).transpose(1, 2)
        v = v.view(N, P, VH, hd).transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(N, P, VD)
        x = x + o @ ws[p + "self_attn.out_proj.weight"].T \
            + ws[p + "self_attn.out_proj.bias"]
        h = F.layer_norm(x, (VD,), ws[p + "layer_norm2.weight"],
                         ws[p + "layer_norm2.bias"], EPS)
        h = F.gelu(h @ ws[p + "mlp.fc1.weight"].T
                   + ws[p + "mlp.fc1.bias"], approximate="tanh")
        x = x + h @ ws[p + "mlp.fc2.weight"].T + ws[p + "mlp.fc2.bias"]
    # avgpool 2x2 compression
    f = x.view(-1, G, G, VD).permute(0, 3, 1, 2)
    f = F.avg_pool2d(f, 2).permute(0, 2, 3, 1)  # [N, CG, CG, VD]
    f = f.reshape(n_img, n_crops, CG, CG, VD)
    sub_GN = ws[IMG + "sub_GN"].reshape(VD)
    glb_GN = ws[IMG + "glb_GN"].reshape(VD)
    pieces = []
    for b in range(n_img):
        h, w = int(sizes[b, 0]) // S, int(sizes[b, 1]) // S
        glb = torch.cat([f[b, 0], sub_GN.expand(CG, 1, VD)], 1
                        ).reshape(-1, VD)
        sub = f[b, 1:1 + h * w].reshape(h, w, CG, CG, VD)
        sub = sub.permute(0, 2, 1, 3, 4).reshape(h * CG, w * CG, VD)
        m = mask[b, 1:1 + h * w, ::2, ::2].reshape(h, w, CG, CG)
        m = m.permute(0, 2, 1, 3).reshape(h * CG, w * CG)
        uh, uw = int(m[:, 0].sum()), int(m[0].sum())
        sub = sub[:uh, :uw]
        sub = torch.cat([sub, sub_GN.expand(uh, 1, VD)], 1).reshape(-1, VD)
        pieces.append(torch.cat([sub, glb_GN[None], glb]))
    x = torch.cat(pieces)
    x = F.gelu(x @ ws[IMG + "img_projection.0.weight"].T
               + ws[IMG + "img_projection.0.bias"])
    return x @ ws[IMG + "img_projection.2.weight"].T \
        + ws[IMG + "img_projection.2.bias"]


def _audio_oracle(ws, mel, mode):
    """mel [1, T, AMELS] -> projected rows [T', TD]."""
    AUD = "model.embed_tokens_extend.audio_embed."
    enc = AUD + "encoder."
    x = (mel - ws[enc + "encoder_embedding.global_mean"]) \
        * ws[enc + "encoder_embedding.global_invstd"]
    x = x.unsqueeze(1)  # [1, 1, T, F]
    x = F.relu(F.conv2d(x, ws[enc + "embed.conv.0.weight"],
                        ws[enc + "embed.conv.0.bias"], stride=2, padding=1))
    x = F.conv2d(x, ws[enc + "embed.conv.2.weight"],
                 ws[enc + "embed.conv.2.bias"], stride=2, padding=1,
                 groups=ACH)
    x = F.relu(F.conv2d(x, ws[enc + "embed.conv.3.weight"],
                        ws[enc + "embed.conv.3.bias"]))
    B, C, T, Fq = x.shape
    x = x.transpose(1, 2).reshape(B, T, C * Fq)
    x = x @ ws[enc + "embed.out.weight"].T + ws[enc + "embed.out.bias"]
    # unfold long sequences into 500-frame chunks
    MAXU = 500
    orig_T = x.shape[1]
    unfolded = orig_T > MAXU
    pad = 0
    if unfolded:
        pad = (-orig_T) % MAXU
        x = F.pad(x, (0, 0, 0, pad))
        x = x.reshape(-1, MAXU, AD)
    Tc = x.shape[1]
    pos = torch.arange(Tc)
    rel = (pos[None] - pos[:, None]).clamp(-T5MAX, T5MAX - 1) + T5MAX
    bias = ws[enc + "relative_attention_bias_layer.bias_values.weight"][rel]
    bias = bias.permute(2, 0, 1)[None]  # [1, H, T, T]
    hd = AD // AH

    def ff(h, p):
        h = F.layer_norm(h, (AD,), ws[p + ".layer_norm.weight"],
                         ws[p + ".layer_norm.bias"], 1e-5)
        g = h @ ws[p + ".net.0.linear.weight"].T \
            + ws[p + ".net.0.linear.bias"]
        a, gate = g.chunk(2, -1)
        return (a * _swish(gate)) @ ws[p + ".net.2.weight"].T \
            + ws[p + ".net.2.bias"]

    for i in range(AL):
        p = enc + f"encoders.{i}."
        x = x + 0.5 * ff(x, p + "feed_forward_in")
        h = F.layer_norm(x, (AD,), ws[p + "layer_norm_att.weight"],
                         ws[p + "layer_norm_att.bias"], 1e-5)
        B = h.shape[0]
        q = (h @ ws[p + "self_attn.linear_q.weight"].T
             + ws[p + "self_attn.linear_q.bias"]).view(B, Tc, AH, hd)
        k = (h @ ws[p + "self_attn.linear_k.weight"].T
             + ws[p + "self_attn.linear_k.bias"]).view(B, Tc, AH, hd)
        v = (h @ ws[p + "self_attn.linear_v.weight"].T
             + ws[p + "self_attn.linear_v.bias"]).view(B, Tc, AH, hd)
        s = torch.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd) + bias
        o = torch.einsum("bhqk,bkhd->bqhd", s.softmax(-1), v
                         ).reshape(B, Tc, AD)
        x = x + o @ ws[p + "self_attn.linear_out.weight"].T \
            + ws[p + "self_attn.linear_out.bias"]
        # causal conv module
        h = F.layer_norm(x, (AD,), ws[p + "conv.layer_norm.weight"],
                         ws[p + "conv.layer_norm.bias"], 1e-5)
        g = F.conv1d(h.transpose(1, 2),
                     ws[p + "conv.glu.ext_pw_conv_1d.weight"],
                     ws[p + "conv.glu.ext_pw_conv_1d.bias"])
        h = (g[:, :AD] + ws[p + "conv.glu.b1"]) \
            * _swish(g[:, AD:] + ws[p + "conv.glu.b2"])
        h = F.pad(h, (2, 0))
        h = F.conv1d(h, ws[p + "conv.dw_sep_conv_1d.dw_conv.weight"],
                     ws[p + "conv.dw_sep_conv_1d.dw_conv.bias"], groups=AD)
        h = F.conv1d(h, ws[p + "conv.dw_sep_conv_1d.pw_conv.weight"],
                     ws[p + "conv.dw_sep_conv_1d.pw_conv.bias"])
        h = _swish(h)
        h = F.conv1d(h, ws[p + "conv.ext_pw_conv_1d.weight"],
                     ws[p + "conv.ext_pw_conv_1d.bias"]).transpose(1, 2)
        x = x + h
        x = x + 0.5 * ff(x, p + "feed_forward_out")
        x = F.layer_norm(x, (AD,), ws[p + "layer_norm.weight"],
                         ws[p + "layer_norm.bias"], 1e-5)
    if unfolded:
        x = x.reshape(1, -1, AD)
        if pad:
            x = x[:, :-pad]
    tag = "vision" if mode == "vision" else "speech"
    x = F.gelu(x[0] @ ws[AUD + f"audio_projection.{tag}.0.weight"].T
               + ws[AUD + f"audio_projection.{tag}.0.bias"])
    return x @ ws[AUD + f"audio_projection.{tag}.2.weight"].T \
        + ws[AUD + f"audio_projection.{tag}.2.bias"]


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from transformers import Phi3ForCausalLM
    torch.manual_seed(0)
    lm = Phi3ForCausalLM(_text_cfg()).eval()
    mm = _make_mm_weights()
    d = tmp_path_factory.mktemp("tiny_phi4mm")
    tensors = {}
    for k, v in lm.state_dict().items():
        # Wrap the LM projections in LoRA base_layer modules and ship fake
        # adapters (exercises the unwrap + skip, phi4mm.py:1248-1251).
        if any(s in k for s in ("qkv_proj", "o_proj", "gate_up_proj",
                                "down_proj")):
            base = k.replace(".weight", ".base_layer.weight")
            tensors[base] = v
            tensors[k.replace(".weight", ".lora_A.weight")] = \
                torch.zeros(4, v.shape[1])
        else:
            tensors[k] = v
    tensors.update(mm)
    from safetensors.numpy import save_file
    save_file({k: np.ascontiguousarray(v.detach().numpy())
               for k, v in tensors.items()},
              str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps({
        "architectures": ["Phi4MMForCausalLM"], "model_type": "phi4mm",
        **json.loads(_text_cfg().to_json_string()),
        "image_token_id": IMG_TOK, "audio_token_id": AUD_TOK,
        "vision_config": {"hidden_size": VD, "image_size": S,
                          "intermediate_size": VI,
                          "num_attention_heads": VH,
                          "num_hidden_layers": VL, "patch_size": PS,
                          "layer_norm_eps": EPS},
        "img_processor": {"layer_idx": -2, "type_feature": "patch"},
        "audio_processor": {"name": "cascades", "config": {
            "input_size": AMELS, "attention_dim": AD,
            "attention_heads": AH, "num_blocks": AL, "linear_units": AF,
            "kernel_size": 3, "ext_pw_out_channel": AD,
            "depthwise_seperable_out_channel": AD, "time_reduction": TRED,
            "nemo_conv_settings": {"conv_channels": ACH},
            "relative_attention_bias_args": {
                "type": "t5", "t5_bias_max_distance": T5MAX}}},
        "embd_layer": {"audio_embd_layer": {"compression_rate": TRED}},
        "torch_dtype": "float32"}))
    return d, lm, mm


def _hf_gen(lm, ids, mm_rows_by_tok, n_new):
    embeds = lm.get_input_embeddings()(torch.tensor([ids]))
    for tok, rows in mm_rows_by_tok.items():
        pos = [i for i, t in enumerate(ids) if t == tok]
        assert len(pos) == rows.shape[0], (tok, len(pos), rows.shape)
        embeds[0, torch.tensor(pos)] = rows
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
                num_kv_blocks=128, max_num_batched_tokens=128,
                max_num_seqs=4, max_model_len=256, tokenizer="unused")
    args.update(kw)
    return LLM(**args)


def _image_inputs(seed=0):
    """One 32x16 image: 2x1 sub-crop grid + global, one pad crop, the
    second sub-crop half-valid."""
    rng = np.random.RandomState(seed)
    pv = rng.randn(1, 4, 3, S, S).astype(np.float32) * 0.5
    sizes = np.asarray([[2 * S, S]], np.int64)
    mask = np.zeros((1, 4, G, G), np.float32)
    mask[0, 0] = 1            # global
    mask[0, 1] = 1            # sub crop 1 fully valid
    mask[0, 2, :2, :] = 1     # sub crop 2: top half valid
    return pv, sizes, mask


def test_phi4mm_image_and_audio(ckpt):
    d, lm, mm = ckpt
    pv, sizes, mask = _image_inputs()
    # tokens: mask[:3,::2,::2].sum()=4+4+2=10, + uh(3) + 1 + CG(2) = 16
    n_img = 16
    mel = (np.random.RandomState(7).randn(1, 24, AMELS) * 0.5
           ).astype(np.float32)
    n_aud = 6  # 24 -> 12 -> 6
    prompt = [1, 7] + [IMG_TOK] * n_img + [5] + [AUD_TOK] * n_aud + [9]
    outs = _llm(d).generate(
        [{"prompt_token_ids": prompt,
          "multi_modal_data": {
              "image": {"input_image_embeds": pv, "image_sizes": sizes,
                        "image_attention_mask": mask,
                        "num_img_tokens": [n_img]},
              "audio": {"input_audio_embeds": mel,
                        "audio_embed_sizes": [n_aud]}}},
         [3, 11, 12, 13]],
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True))
    img_rows = _vision_oracle(mm, torch.tensor(pv), sizes,
                              torch.tensor(mask))
    aud_rows = _audio_oracle(mm, torch.tensor(mel), "vision")[:n_aud]
    exp = _hf_gen(lm, prompt, {IMG_TOK: img_rows, AUD_TOK: aud_rows}, 8)
    assert outs[0].outputs[0].token_ids == exp
    assert outs[1].outputs[0].token_ids == _hf_gen(lm, [3, 11, 12, 13],
                                                   {}, 8)


def test_phi4mm_audio_only_speech_mode(ckpt):
    """Audio without images uses the SPEECH projection, and a long mel
    exercises the 500-frame unfold path."""
    d, lm, mm = ckpt
    mel = (np.random.RandomState(9).randn(1, 2100, AMELS) * 0.5
           ).astype(np.float32)
    t = 2100
    for _ in range(2):
        t = (t - 1) // 2 + 1
    n_aud = t  # 525 -> unfolds into 500 + 25(pad to 500)
    prompt = [1] + [AUD_TOK] * n_aud + [5]
    outs = _llm(d, max_model_len=1024, num_kv_blocks=256,
                max_num_batched_tokens=1024).generate(
        [{"prompt_token_ids": prompt,
          "multi_modal_data": {"audio": {"input_audio_embeds": mel,
                                         "audio_embed_sizes": [n_aud]}}}],
        SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True))
    aud_rows = _audio_oracle(mm, torch.tensor(mel), "speech")[:n_aud]
    exp = _hf_gen(lm, prompt, {AUD_TOK: aud_rows}, 4)
    assert outs[0].outputs[0].token_ids == exp
