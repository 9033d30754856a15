"""Phi-3-Small vs a torch oracle mirroring reference
aphrodite/modeling/models/phi3_small.py (gegelu + muP + head-major QKV) and
aphrodite/attention/ops/blocksparse_attention/utils.py:94-218 (blocksparse
mask with per-head vertical stride)."""
import json
import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from aphrodite_tpu.sampling_params import SamplingParams

V, D, L, NH, NKV, HD, I = 256, 64, 2, 4, 2, 16, 48
G = NH // NKV
BS_SZ, LOCAL, VERT = 4, 1, 2          # blocksparse pattern
HEAD_STEP = max(1, VERT // NH)        # hetero heads
DENSE_EVERY = 2                       # layer idx 1 runs dense
MUP_ATTN, MUP_EMB, MUP_WIDTH = 2.0, 1.5, 2.0
GEGELU_LIMIT = 0.3
ROPE_SCALE = 2.0                      # rope_position_scale (linear)
DUMMY = [250, 251, 252, 253, 254, 255]
EPS = 1e-5


def _make_weights(seed=0):
    torch.manual_seed(seed)

    def rnd(*s):
        return torch.randn(*s) * 0.05

    ws = {"model.embed_tokens.weight": rnd(V, D),
          "model.final_layernorm.weight": torch.ones(D) + 0.1 * rnd(D),
          "model.final_layernorm.bias": 0.02 * rnd(D),
          "lm_head.weight": rnd(V, D)}
    for i in range(L):
        p = f"model.layers.{i}."
        ws[p + "input_layernorm.weight"] = torch.ones(D) + 0.1 * rnd(D)
        ws[p + "input_layernorm.bias"] = 0.02 * rnd(D)
        ws[p + "post_attention_layernorm.weight"] = \
            torch.ones(D) + 0.1 * rnd(D)
        ws[p + "post_attention_layernorm.bias"] = 0.02 * rnd(D)
        ws[p + "self_attn.query_key_value.weight"] = rnd((G + 2) * NKV * HD,
                                                         D)
        ws[p + "self_attn.query_key_value.bias"] = 0.02 * rnd(
            (G + 2) * NKV * HD)
        ws[p + "self_attn.dense.weight"] = rnd(D, NH * HD)
        ws[p + "self_attn.dense.bias"] = 0.02 * rnd(D)
        ws[p + "mlp.up_proj.weight"] = rnd(2 * I, D)
        ws[p + "mlp.up_proj.bias"] = 0.02 * rnd(2 * I)
        ws[p + "mlp.down_proj.weight"] = rnd(D, I)
        ws[p + "mlp.down_proj.bias"] = 0.02 * rnd(D)
    return ws


def _gegelu(x):
    a_g, a_l = x[..., ::2], x[..., 1::2]
    a_g = a_g.clamp(max=GEGELU_LIMIT)
    a_l = a_l.clamp(-GEGELU_LIMIT, GEGELU_LIMIT)
    return a_g * torch.sigmoid(1.702 * a_g) * (a_l + 1.0)


def _oracle(ws, ids, n_new):
    toks = list(ids)
    inv = 10000.0 ** -(torch.arange(0, HD, 2).double() / HD) / ROPE_SCALE
    scale = MUP_ATTN / HD

    def ln(x, w, b):
        return F.layer_norm(x.float(), (D,), w, b, EPS)

    def rope(t, pos):
        ang = pos[:, None].double() * inv[None]
        c, s = torch.cos(ang)[:, None].float(), \
            torch.sin(ang)[:, None].float()
        t1, t2 = t[..., :HD // 2], t[..., HD // 2:]
        return torch.cat([t1 * c - t2 * s, t2 * c + t1 * s], -1)

    for _ in range(n_new):
        T = len(toks)
        pos = torch.arange(T)
        x = ws["model.embed_tokens.weight"][torch.tensor(toks)] * MUP_EMB
        for i in range(L):
            p = f"model.layers.{i}."
            h = ln(x, ws[p + "input_layernorm.weight"],
                   ws[p + "input_layernorm.bias"])
            qkv = (h @ ws[p + "self_attn.query_key_value.weight"].T
                   + ws[p + "self_attn.query_key_value.bias"])
            qkv = qkv.view(T, NKV, G + 2, HD)
            q = rope(qkv[:, :, :G].reshape(T, NH, HD), pos)
            k = rope(qkv[:, :, G], pos)
            v = qkv[:, :, G + 1]
            outs = []
            for hq in range(NH):
                kv = hq // G
                s = scale * (q[:, hq] @ k[:, kv].T)  # [T, T]
                mask = pos[:, None] >= pos[None]
                if (i + 1) % DENSE_EVERY != 0:
                    bq, bk = pos[:, None] // BS_SZ, pos[None] // BS_SZ
                    vert = (pos // BS_SZ + hq * HEAD_STEP + 1) % VERT == 0
                    mask = mask & ((bq - bk < LOCAL) | vert[None])
                s = s.masked_fill(~mask, -torch.inf)
                outs.append(F.softmax(s, -1) @ v[:, kv])
            o = torch.stack(outs, 1).reshape(T, NH * HD)
            x = x + (o @ ws[p + "self_attn.dense.weight"].T
                     + ws[p + "self_attn.dense.bias"])
            h = ln(x, ws[p + "post_attention_layernorm.weight"],
                   ws[p + "post_attention_layernorm.bias"])
            gu = h @ ws[p + "mlp.up_proj.weight"].T \
                + ws[p + "mlp.up_proj.bias"]
            x = x + (_gegelu(gu) @ ws[p + "mlp.down_proj.weight"].T
                     + ws[p + "mlp.down_proj.bias"])
        x = ln(x, ws["model.final_layernorm.weight"],
               ws["model.final_layernorm.bias"])
        logits = x[-1] @ ws["lm_head.weight"].T
        logits[torch.tensor(DUMMY)] = -torch.inf
        toks.append(int(torch.argmax(logits / MUP_WIDTH)))
    return toks[len(ids):]


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    ws = _make_weights()
    d = tmp_path_factory.mktemp("tiny_phi3small")
    from safetensors.numpy import save_file
    save_file({k: np.ascontiguousarray(v.numpy()) for k, v in ws.items()},
              str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps({
        "architectures": ["Phi3SmallForCausalLM"], "model_type": "phi3small",
        "vocab_size": V, "hidden_size": D, "num_hidden_layers": L,
        "num_attention_heads": NH, "num_key_value_heads": NKV,
        "intermediate_size": I, "hidden_act": "gegelu",
        "gegelu_limit": GEGELU_LIMIT, "layer_norm_epsilon": EPS,
        "mup_use_scaling": True, "mup_attn_multiplier": MUP_ATTN,
        "mup_embedding_multiplier": MUP_EMB,
        "mup_width_multiplier": MUP_WIDTH,
        "rope_embedding_base": 10000.0, "rope_position_scale": ROPE_SCALE,
        "blocksparse_block_size": BS_SZ,
        "blocksparse_num_local_blocks": LOCAL,
        "blocksparse_vert_stride": VERT,
        "blocksparse_homo_head_pattern": False,
        "dense_attention_every_n_layers": DENSE_EVERY,
        "dummy_token_indices": DUMMY,
        "max_position_embeddings": 512, "tie_word_embeddings": False,
        "torch_dtype": "float32"}))
    return d, ws


def test_phi3_small_matches_oracle(ckpt):
    d, ws = ckpt
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(d), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=128, tokenizer="unused")
    prompts = [[1, 5, 9, 20, 3, 7, 11, 2, 4, 6, 8, 10, 12, 14],
               [7, 8, 9, 10, 11, 12, 13, 14, 15]]
    outs = llm.generate(prompts, SamplingParams(temperature=0.0,
                                                max_tokens=8,
                                                ignore_eos=True))
    for p, o in zip(prompts, outs):
        assert o.outputs[0].token_ids == _oracle(ws, p, 8), p


def test_phi3_small_chunked_prefill(ckpt):
    d, ws = ckpt
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(d), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=16, max_num_seqs=2,
              max_model_len=128, tokenizer="unused")
    p = [2] * 9 + [9, 4] * 11
    outs = llm.generate([p], SamplingParams(temperature=0.0, max_tokens=6,
                                            ignore_eos=True))
    assert outs[0].outputs[0].token_ids == _oracle(ws, p, 6)
