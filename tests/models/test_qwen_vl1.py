"""Qwen-VL v1 (OpenCLIP tower + attention pool) vs a torch oracle; the LM
side reuses the QWen==llama schema equivalence (HF Llama inputs_embeds)."""
import json
import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from aphrodite_tpu.sampling_params import SamplingParams

DV, LV, NHV, IV = 32, 2, 2, 64
S, PS = 128, 8      # grid 16 == sqrt(256): no position interpolation
NQ = 256            # n_queries -> q_grid 16 == grid
DO = 64             # pool/output dim == LM hidden
IMG_START = 200
IMG = IMG_START + 2


def _lm():
    from transformers import AutoModelForCausalLM, LlamaConfig
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=4, attention_bias=True,
                      max_position_embeddings=512, bos_token_id=1,
                      eos_token_id=2, pad_token_id=0)
    hf = AutoModelForCausalLM.from_config(cfg).eval()
    with torch.no_grad():
        for lyr in hf.model.layers:
            lyr.self_attn.o_proj.bias.zero_()
    return hf


def _qwen_schema(hf):
    sd = hf.state_dict()
    out = {"transformer.wte.weight": sd["model.embed_tokens.weight"],
           "transformer.ln_f.weight": sd["model.norm.weight"],
           "lm_head.weight": sd["lm_head.weight"]}
    for i in range(2):
        src, dst = f"model.layers.{i}.", f"transformer.h.{i}."
        out[dst + "attn.c_attn.weight"] = torch.cat(
            [sd[src + "self_attn.q_proj.weight"],
             sd[src + "self_attn.k_proj.weight"],
             sd[src + "self_attn.v_proj.weight"]], dim=0)
        out[dst + "attn.c_attn.bias"] = torch.cat(
            [sd[src + "self_attn.q_proj.bias"],
             sd[src + "self_attn.k_proj.bias"],
             sd[src + "self_attn.v_proj.bias"]], dim=0)
        out[dst + "attn.c_proj.weight"] = sd[src + "self_attn.o_proj.weight"]
        out[dst + "mlp.w2.weight"] = sd[src + "mlp.gate_proj.weight"]
        out[dst + "mlp.w1.weight"] = sd[src + "mlp.up_proj.weight"]
        out[dst + "mlp.c_proj.weight"] = sd[src + "mlp.down_proj.weight"]
        out[dst + "ln_1.weight"] = sd[src + "input_layernorm.weight"]
        out[dst + "ln_2.weight"] = sd[src + "post_attention_layernorm.weight"]
    return out


def _make_vision(seed=5):
    torch.manual_seed(seed)

    def rnd(*s):
        return torch.randn(*s) * 0.05

    vp = "transformer.visual."
    nh, hd = NHV, DV // NHV
    ws = {vp + "conv1.weight": rnd(DV, 3, PS, PS),
          vp + "positional_embedding": rnd(256, DV),
          vp + "ln_pre.weight": torch.ones(DV) + 0.1 * rnd(DV),
          vp + "ln_pre.bias": 0.1 * rnd(DV),
          vp + "ln_post.weight": torch.ones(DO) + 0.1 * rnd(DO),
          vp + "ln_post.bias": 0.1 * rnd(DO),
          vp + "proj": rnd(DO, DO)}
    for i in range(LV):
        p = f"{vp}transformer.resblocks.{i}."
        ws[p + "ln_1.weight"] = torch.ones(DV) + 0.1 * rnd(DV)
        ws[p + "ln_1.bias"] = 0.1 * rnd(DV)
        ws[p + "attn.in_proj.weight"] = rnd(3 * DV, DV)
        ws[p + "attn.in_proj.bias"] = 0.1 * rnd(3 * DV)
        ws[p + "attn.out_proj.weight"] = rnd(DV, DV)
        ws[p + "attn.out_proj.bias"] = 0.1 * rnd(DV)
        ws[p + "ln_2.weight"] = torch.ones(DV) + 0.1 * rnd(DV)
        ws[p + "ln_2.bias"] = 0.1 * rnd(DV)
        ws[p + "mlp.c_fc.weight"] = rnd(IV, DV)
        ws[p + "mlp.c_fc.bias"] = 0.1 * rnd(IV)
        ws[p + "mlp.c_proj.weight"] = rnd(DV, IV)
        ws[p + "mlp.c_proj.bias"] = 0.1 * rnd(DV)
    ap = vp + "attn_pool."
    from aphrodite_tpu.models.qwen_vl import sincos_2d_v20
    ws[ap + "query"] = rnd(NQ, DO)
    ws[ap + "kv_proj.weight"] = rnd(DO, DV)
    ws[ap + "attn.in_proj_weight"] = rnd(3 * DO, DO)
    ws[ap + "attn.in_proj_bias"] = 0.1 * rnd(3 * DO)
    ws[ap + "attn.out_proj.weight"] = rnd(DO, DO)
    ws[ap + "attn.out_proj.bias"] = 0.1 * rnd(DO)
    ws[ap + "ln_q.weight"] = torch.ones(DO) + 0.1 * rnd(DO)
    ws[ap + "ln_q.bias"] = 0.1 * rnd(DO)
    ws[ap + "ln_kv.weight"] = torch.ones(DO) + 0.1 * rnd(DO)
    ws[ap + "ln_kv.bias"] = 0.1 * rnd(DO)
    ws[ap + "pos_embed"] = torch.tensor(
        sincos_2d_v20(DO, int(math.sqrt(NQ))), dtype=torch.float32)
    return ws


def _vision_oracle(ws, pv):
    vp = "transformer.visual."
    x = F.conv2d(torch.tensor(pv), ws[vp + "conv1.weight"], stride=PS)
    N = x.shape[0]
    x = x.flatten(2).transpose(1, 2)
    x = x + ws[vp + "positional_embedding"][None]
    x = F.layer_norm(x, (DV,), ws[vp + "ln_pre.weight"],
                     ws[vp + "ln_pre.bias"], 1e-6)
    nh, hd = NHV, DV // NHV
    T = x.shape[1]
    for i in range(LV):
        p = f"{vp}transformer.resblocks.{i}."
        h = F.layer_norm(x, (DV,), ws[p + "ln_1.weight"],
                         ws[p + "ln_1.bias"], 1e-6)
        qkv = h @ ws[p + "attn.in_proj.weight"].T + \
            ws[p + "attn.in_proj.bias"]
        # per-head interleaved [nh, 3*hd] (VisualAttention layout)
        qkv = qkv.view(N, T, nh, 3 * hd)
        q, k, v = qkv.split(hd, dim=-1)
        q, k, v = (t.transpose(1, 2) for t in (q, k, v))
        a = F.softmax((q @ k.transpose(-1, -2)) / math.sqrt(hd), -1) @ v
        a = a.transpose(1, 2).reshape(N, T, DV)
        x = x + a @ ws[p + "attn.out_proj.weight"].T + \
            ws[p + "attn.out_proj.bias"]
        h = F.layer_norm(x, (DV,), ws[p + "ln_2.weight"],
                         ws[p + "ln_2.bias"], 1e-6)
        h = F.gelu(h @ ws[p + "mlp.c_fc.weight"].T + ws[p + "mlp.c_fc.bias"])
        x = x + h @ ws[p + "mlp.c_proj.weight"].T + ws[p + "mlp.c_proj.bias"]
    ap = vp + "attn_pool."
    kv = x @ ws[ap + "kv_proj.weight"].T
    kv = F.layer_norm(kv, (DO,), ws[ap + "ln_kv.weight"],
                      ws[ap + "ln_kv.bias"], 1e-6)
    q = F.layer_norm(ws[ap + "query"], (DO,), ws[ap + "ln_q.weight"],
                     ws[ap + "ln_q.bias"], 1e-6)
    pos = ws[ap + "pos_embed"]
    out, _ = F.multi_head_attention_forward(
        (q + pos)[:, None].expand(-1, N, -1),
        (kv + pos[None]).transpose(0, 1), kv.transpose(0, 1), DO, 1,
        ws[ap + "attn.in_proj_weight"], ws[ap + "attn.in_proj_bias"],
        None, None, False, 0.0,
        ws[ap + "attn.out_proj.weight"], ws[ap + "attn.out_proj.bias"],
        need_weights=False)
    out = out.transpose(0, 1)  # [N, Q, DO]
    out = F.layer_norm(out, (DO,), ws[vp + "ln_post.weight"],
                       ws[vp + "ln_post.bias"], 1e-6)
    return out @ ws[vp + "proj"]


def test_qwen_vl1_matches_oracle(tmp_path):
    hf = _lm()
    tensors = _qwen_schema(hf)
    tensors.update(_make_vision())
    from safetensors.numpy import save_file
    save_file({k: np.ascontiguousarray(v.detach().numpy())
               for k, v in tensors.items()},
              str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps({
        "architectures": ["QWenLMHeadModel"], "model_type": "qwen",
        "vocab_size": 512, "hidden_size": 64, "num_hidden_layers": 2,
        "num_attention_heads": 4, "intermediate_size": 256,
        "kv_channels": 16, "rotary_emb_base": 10000,
        "layer_norm_epsilon": 1e-6, "max_position_embeddings": 512,
        "seq_length": 512, "no_bias": True, "tie_word_embeddings": False,
        "visual": {"width": DV, "layers": LV, "heads": NHV,
                   "mlp_ratio": 2.0, "patch_size": PS, "image_size": S,
                   "output_dim": DO, "n_queries": NQ,
                   "image_start_id": IMG_START},
        "torch_dtype": "float32"}))

    rng = np.random.RandomState(0)
    img = rng.randn(1, 3, S, S).astype(np.float32)
    base = [1, 7, IMG, 9, 20]
    expanded = [1, 7] + [IMG] * NQ + [9, 20]
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(tmp_path), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=512, max_num_seqs=4,
              max_model_len=400, tokenizer="unused")
    outs = llm.generate(
        [{"prompt_token_ids": base, "multi_modal_data": {"image": img}}],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))
    with torch.no_grad():
        rows = _vision_oracle(ws=tensors, pv=img)[0]
        embeds = hf.get_input_embeddings()(torch.tensor([expanded]))
        embeds[0, 2:2 + NQ] = rows
        exp = hf.generate(inputs_embeds=embeds, max_new_tokens=6,
                          do_sample=False, eos_token_id=None)
    assert outs[0].outputs[0].token_ids == exp[0].tolist()
