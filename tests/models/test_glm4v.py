"""GLM-4V (EVA2CLIP tower + GLU projector on ChatGLM) vs a torch oracle."""
import json
import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from aphrodite_tpu.sampling_params import SamplingParams

IMG = 250
DV, LV, NHV, IV = 32, 2, 2, 64
S, PS = 16, 8  # grid 2 -> conv2x2 -> 1 token + boi/eoi = 3
V, D, L, NH, NKV, I = 256, 64, 2, 4, 2, 96


def _make_weights():
    torch.manual_seed(4)
    hd = D // NH
    rot = hd // 2

    def rnd(*s):
        return torch.randn(*s) * 0.05

    ws = {"transformer.embedding.word_embeddings.weight": rnd(V, D),
          "transformer.encoder.final_layernorm.weight":
              torch.ones(D) + 0.1 * rnd(D),
          "transformer.output_layer.weight": rnd(V, D)}
    for i in range(L):
        p = f"transformer.encoder.layers.{i}."
        ws[p + "input_layernorm.weight"] = torch.ones(D) + 0.1 * rnd(D)
        ws[p + "post_attention_layernorm.weight"] = \
            torch.ones(D) + 0.1 * rnd(D)
        ws[p + "self_attention.query_key_value.weight"] = \
            rnd(D + 2 * NKV * hd, D)
        ws[p + "self_attention.query_key_value.bias"] = \
            0.1 * rnd(D + 2 * NKV * hd)
        ws[p + "self_attention.dense.weight"] = rnd(D, D)
        ws[p + "mlp.dense_h_to_4h.weight"] = rnd(2 * I, D)
        ws[p + "mlp.dense_4h_to_h.weight"] = rnd(D, I)
    vp = "transformer.vision."
    ws[vp + "patch_embedding.proj.weight"] = rnd(DV, 3, PS, PS)
    ws[vp + "patch_embedding.proj.bias"] = 0.1 * rnd(DV)
    ws[vp + "patch_embedding.cls_embedding"] = rnd(1, DV)
    ws[vp + "patch_embedding.position_embedding.weight"] = rnd(5, DV)
    for i in range(LV):
        p = f"{vp}transformer.layers.{i}."
        ws[p + "input_layernorm.weight"] = torch.ones(DV) + 0.1 * rnd(DV)
        ws[p + "input_layernorm.bias"] = 0.1 * rnd(DV)
        ws[p + "attention.query_key_value.weight"] = rnd(3 * DV, DV)
        ws[p + "attention.query_key_value.bias"] = 0.1 * rnd(3 * DV)
        ws[p + "attention.dense.weight"] = rnd(DV, DV)
        ws[p + "attention.dense.bias"] = 0.1 * rnd(DV)
        ws[p + "post_attention_layernorm.weight"] = \
            torch.ones(DV) + 0.1 * rnd(DV)
        ws[p + "post_attention_layernorm.bias"] = 0.1 * rnd(DV)
        ws[p + "mlp.fc1.weight"] = rnd(IV, DV)
        ws[p + "mlp.fc1.bias"] = 0.1 * rnd(IV)
        ws[p + "mlp.fc2.weight"] = rnd(DV, IV)
        ws[p + "mlp.fc2.bias"] = 0.1 * rnd(DV)
    ws[vp + "conv.weight"] = rnd(D, DV, 2, 2)
    ws[vp + "conv.bias"] = 0.1 * rnd(D)
    ws[vp + "linear_proj.linear_proj.weight"] = rnd(D, D)
    ws[vp + "linear_proj.norm1.weight"] = torch.ones(D) + 0.1 * rnd(D)
    ws[vp + "linear_proj.norm1.bias"] = 0.1 * rnd(D)
    ws[vp + "linear_proj.gate_proj.weight"] = rnd(I, D)
    ws[vp + "linear_proj.dense_h_to_4h.weight"] = rnd(I, D)
    ws[vp + "linear_proj.dense_4h_to_h.weight"] = rnd(D, I)
    ws[vp + "boi"] = rnd(1, 1, D)
    ws[vp + "eoi"] = rnd(1, 1, D)
    return ws


def _vision_oracle(ws, pv):
    vp = "transformer.vision."
    x = F.conv2d(torch.tensor(pv), ws[vp + "patch_embedding.proj.weight"],
                 ws[vp + "patch_embedding.proj.bias"], stride=PS)
    N = x.shape[0]
    x = x.flatten(2).transpose(1, 2)
    cls = ws[vp + "patch_embedding.cls_embedding"].expand(N, -1, -1)
    x = torch.cat([cls, x], dim=1)
    x = x + ws[vp + "patch_embedding.position_embedding.weight"][None]
    hd = DV // NHV
    T = x.shape[1]
    for i in range(LV):
        p = f"{vp}transformer.layers.{i}."
        qkv = x @ ws[p + "attention.query_key_value.weight"].T + \
            ws[p + "attention.query_key_value.bias"]
        q, k, v = qkv.chunk(3, dim=-1)
        q = q.view(N, T, NHV, hd).transpose(1, 2)
        k = k.view(N, T, NHV, hd).transpose(1, 2)
        v = v.view(N, T, NHV, hd).transpose(1, 2)
        a = F.softmax((q @ k.transpose(-1, -2)) * hd ** -0.5, -1) @ v
        a = a.transpose(1, 2).reshape(N, T, DV)
        a = a @ ws[p + "attention.dense.weight"].T + \
            ws[p + "attention.dense.bias"]
        x = x + F.layer_norm(a, (DV,), ws[p + "input_layernorm.weight"],
                             ws[p + "input_layernorm.bias"], 1e-6)
        h = F.gelu(x @ ws[p + "mlp.fc1.weight"].T + ws[p + "mlp.fc1.bias"])
        h = h @ ws[p + "mlp.fc2.weight"].T + ws[p + "mlp.fc2.bias"]
        x = x + F.layer_norm(h, (DV,),
                             ws[p + "post_attention_layernorm.weight"],
                             ws[p + "post_attention_layernorm.bias"], 1e-6)
    x = x[:, 1:]
    g = S // PS
    x = x.view(N, g, g, DV).permute(0, 3, 1, 2)
    x = F.conv2d(x, ws[vp + "conv.weight"], ws[vp + "conv.bias"], stride=2)
    x = x.flatten(2).transpose(1, 2)
    x = x @ ws[vp + "linear_proj.linear_proj.weight"].T
    x = F.gelu(F.layer_norm(x, (D,), ws[vp + "linear_proj.norm1.weight"],
                            ws[vp + "linear_proj.norm1.bias"], 1e-5))
    gate = x @ ws[vp + "linear_proj.gate_proj.weight"].T
    up = x @ ws[vp + "linear_proj.dense_h_to_4h.weight"].T
    x = (F.silu(gate) * up) @ ws[vp + "linear_proj.dense_4h_to_h.weight"].T
    boi = ws[vp + "boi"].expand(N, -1, -1)
    eoi = ws[vp + "eoi"].expand(N, -1, -1)
    return torch.cat([boi, x, eoi], dim=1) / 8.0


def _glm_oracle(ws, ids, n_new, inject=None):
    hd = D // NH
    rot = hd // 2
    inv = 10000.0 ** -(torch.arange(0, rot, 2).float() / rot)

    def rms(x, w):
        return x * torch.rsqrt((x.float() ** 2).mean(-1, keepdim=True)
                               + 1e-5) * w

    def rope_i(x, pos):
        T, h, _ = x.shape
        xr = x[..., :rot].reshape(T, h, rot // 2, 2)
        ang = pos[:, None].float() * inv[None, :]
        c, s = torch.cos(ang)[:, None], torch.sin(ang)[:, None]
        o = torch.stack([xr[..., 0] * c - xr[..., 1] * s,
                         xr[..., 1] * c + xr[..., 0] * s], dim=-1)
        return torch.cat([o.reshape(T, h, rot), x[..., rot:]], dim=-1)

    toks = list(ids)
    for _ in range(n_new):
        T = len(toks)
        x = ws["transformer.embedding.word_embeddings.weight"][
            torch.tensor(toks)].clone()
        if inject is not None:
            off, rows = inject
            x[off:off + rows.shape[0]] = rows
        pos = torch.arange(T)
        mask = torch.tril(torch.ones(T, T, dtype=torch.bool))
        for i in range(L):
            p = f"transformer.encoder.layers.{i}."
            h = rms(x, ws[p + "input_layernorm.weight"])
            qkv = h @ ws[p + "self_attention.query_key_value.weight"].T \
                + ws[p + "self_attention.query_key_value.bias"]
            q = qkv[:, :D].view(T, NH, hd)
            k = qkv[:, D:D + NKV * hd].view(T, NKV, hd)
            v = qkv[:, D + NKV * hd:].view(T, NKV, hd)
            q, k = rope_i(q, pos), rope_i(k, pos)
            k = k.repeat_interleave(NH // NKV, dim=1)
            v = v.repeat_interleave(NH // NKV, dim=1)
            q, k, v = (t.transpose(0, 1) for t in (q, k, v))
            s = (q @ k.transpose(-1, -2)) / math.sqrt(hd)
            s = s.masked_fill(~mask[None], -torch.inf)
            a = (F.softmax(s, dim=-1) @ v).transpose(0, 1).reshape(T, D)
            x = x + a @ ws[p + "self_attention.dense.weight"].T
            h = rms(x, ws[p + "post_attention_layernorm.weight"])
            gu = h @ ws[p + "mlp.dense_h_to_4h.weight"].T
            y = F.silu(gu[:, :I]) * gu[:, I:]
            x = x + y @ ws[p + "mlp.dense_4h_to_h.weight"].T
        x = rms(x, ws["transformer.encoder.final_layernorm.weight"])
        logits = x[-1] @ ws["transformer.output_layer.weight"].T
        toks.append(int(torch.argmax(logits)))
    return toks[len(ids):]


def test_glm4v_matches_oracle(tmp_path):
    ws = _make_weights()
    from safetensors.numpy import save_file
    save_file({k: np.ascontiguousarray(v.numpy()) for k, v in ws.items()},
              str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps({
        "architectures": ["GLM4VForCausalLM"], "model_type": "chatglm",
        "hidden_size": D, "num_layers": L, "num_attention_heads": NH,
        "multi_query_attention": True, "multi_query_group_num": NKV,
        "ffn_hidden_size": I, "kv_channels": D // NH, "vocab_size": V,
        "layernorm_epsilon": 1e-5, "rmsnorm": True, "original_rope": True,
        "add_qkv_bias": True, "add_bias_linear": False, "rope_ratio": 1.0,
        "seq_length": 256, "padded_vocab_size": V, "image_token_id": IMG,
        "tie_word_embeddings": False,
        "vision_config": {"hidden_size": DV, "num_hidden_layers": LV,
                          "num_heads": NHV, "intermediate_size": IV,
                          "patch_size": PS, "image_size": S,
                          "num_positions": 5, "layer_norm_eps": 1e-6,
                          "scaling_factor": 8.0, "in_channels": 3},
        "torch_dtype": "float32"}))

    rng = np.random.RandomState(0)
    img = rng.randn(1, 3, S, S).astype(np.float32)
    base = [1, 7, IMG, 9, 20]
    expanded = [1, 7] + [IMG] * 3 + [9, 20]  # 1 token + boi/eoi
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(tmp_path), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=120, tokenizer="unused")
    outs = llm.generate(
        [{"prompt_token_ids": base, "multi_modal_data": {"image": img}},
         [5, 6, 7, 8]],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))
    with torch.no_grad():
        rows = _vision_oracle(ws, img)[0]
    exp_img = _glm_oracle(ws, expanded, 6, inject=(2, rows))
    exp_txt = _glm_oracle(ws, [5, 6, 7, 8], 6)
    assert outs[0].outputs[0].token_ids == exp_img
    assert outs[1].outputs[0].token_ids == exp_txt
