"""MiniMax-Text-01 (lightning attention hybrid + MoE) vs a torch oracle
mirroring reference minimax_text_01.py + lightning_attn.py."""
import json
import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from aphrodite_tpu.sampling_params import SamplingParams

V, D, L, NH, NKV, HD, I, E = 256, 64, 4, 4, 2, 16, 48, 4
ATTN_TYPES = [0, 1, 0, 1]
ROT = 8  # rotary_dim
ALPHA_LIN, BETA_LIN = 1.1, 0.9
ALPHA_FULL, BETA_FULL = 0.95, 1.05
ALPHA_MLP, BETA_MLP = 1.02, 0.98


def _slopes(n):
    def pow2(k):
        start = 2.0 ** (-(2.0 ** -(math.log2(k) - 3)))
        return [start * (start ** i) for i in range(k)]
    return pow2(n)


def _make_weights(seed=0):
    torch.manual_seed(seed)

    def rnd(*s):
        return torch.randn(*s) * 0.05

    ws = {"model.embed_tokens.weight": rnd(V, D),
          "model.norm.weight": torch.ones(D) + 0.1 * rnd(D),
          "lm_head.weight": rnd(V, D)}
    A = NH * HD
    for i in range(L):
        p = f"model.layers.{i}."
        ws[p + "input_layernorm.weight"] = torch.ones(D) + 0.1 * rnd(D)
        ws[p + "post_attention_layernorm.weight"] = \
            torch.ones(D) + 0.1 * rnd(D)
        if ATTN_TYPES[i] == 0:
            ws[p + "self_attn.qkv_proj.weight"] = rnd(3 * A, D)
            ws[p + "self_attn.norm.weight"] = torch.ones(A) + 0.1 * rnd(A)
            ws[p + "self_attn.output_gate.weight"] = rnd(A, D)
            ws[p + "self_attn.out_proj.weight"] = rnd(D, A)
        else:
            ws[p + "self_attn.q_proj.weight"] = rnd(NH * HD, D)
            ws[p + "self_attn.k_proj.weight"] = rnd(NKV * HD, D)
            ws[p + "self_attn.v_proj.weight"] = rnd(NKV * HD, D)
            ws[p + "self_attn.o_proj.weight"] = rnd(D, NH * HD)
        ws[p + "block_sparse_moe.gate.weight"] = rnd(E, D)
        for e in range(E):
            ws[p + f"block_sparse_moe.experts.{e}.w1.weight"] = rnd(I, D)
            ws[p + f"block_sparse_moe.experts.{e}.w3.weight"] = rnd(I, D)
            ws[p + f"block_sparse_moe.experts.{e}.w2.weight"] = rnd(D, I)
    return ws


def _oracle(ws, ids, n_new):
    slopes = torch.tensor(_slopes(NH), dtype=torch.float64)
    toks = list(ids)
    inv = 10000.0 ** -(torch.arange(0, ROT, 2).float() / ROT)

    def rms(x, w):
        return x * torch.rsqrt((x.float() ** 2).mean(-1, keepdim=True)
                               + 1e-5) * w

    for _ in range(n_new):
        T = len(toks)
        x = ws["model.embed_tokens.weight"][torch.tensor(toks)]
        pos = torch.arange(T)
        lin_ord = 0
        for i in range(L):
            p = f"model.layers.{i}."
            h = rms(x, ws[p + "input_layernorm.weight"])
            if ATTN_TYPES[i] == 0:
                decay = torch.exp(-slopes * (
                    1 - i / (L - 1 + 1e-5) + 1e-5)).float()
                qkv = F.silu((h @ ws[p + "self_attn.qkv_proj.weight"].T
                              ).float()).view(T, NH, 3 * HD)
                q, k, v = qkv.split(HD, dim=-1)
                S = torch.zeros(NH, HD, HD)
                outs = []
                for t in range(T):
                    S = decay[:, None, None] * S + \
                        k[t][:, :, None] * v[t][:, None, :]
                    outs.append(torch.einsum("hd,hde->he", q[t], S))
                o = torch.stack(outs).reshape(T, NH * HD)
                o = o * torch.rsqrt((o ** 2).mean(-1, keepdim=True) + 1e-5)
                o = o * ws[p + "self_attn.norm.weight"].float()
                gate = torch.sigmoid(
                    (h @ ws[p + "self_attn.output_gate.weight"].T).float())
                o = (gate * o)
                out = o @ ws[p + "self_attn.out_proj.weight"].T.float()
                alpha, beta = ALPHA_LIN, BETA_LIN
            else:
                q = (h @ ws[p + "self_attn.q_proj.weight"].T
                     ).view(T, NH, HD)
                k = (h @ ws[p + "self_attn.k_proj.weight"].T
                     ).view(T, NKV, HD)
                v = (h @ ws[p + "self_attn.v_proj.weight"].T
                     ).view(T, NKV, HD)

                def rope(t):
                    ang = pos[:, None].float() * inv[None]
                    c, s = torch.cos(ang)[:, None], torch.sin(ang)[:, None]
                    t1, t2 = t[..., :ROT // 2], t[..., ROT // 2:ROT]
                    rot = torch.cat([t1 * c - t2 * s, t2 * c + t1 * s], -1)
                    return torch.cat([rot, t[..., ROT:]], -1)
                q, k = rope(q), rope(k)
                k = k.repeat_interleave(NH // NKV, dim=1)
                v = v.repeat_interleave(NH // NKV, dim=1)
                q, k, v = (t.transpose(0, 1) for t in (q, k, v))
                s = (q @ k.transpose(-1, -2)) / math.sqrt(HD)
                mask = torch.tril(torch.ones(T, T, dtype=torch.bool))
                s = s.masked_fill(~mask[None], -torch.inf)
                o = (F.softmax(s, -1) @ v).transpose(0, 1).reshape(T, -1)
                out = o @ ws[p + "self_attn.o_proj.weight"].T
                alpha, beta = ALPHA_FULL, BETA_FULL
            x = x * alpha + out.to(x.dtype) * beta
            h = rms(x, ws[p + "post_attention_layernorm.weight"])
            logits = (h @ ws[p + "block_sparse_moe.gate.weight"].T).float()
            probs = F.softmax(logits, -1)
            topw, topi = torch.topk(probs, 2, -1)
            topw = topw / topw.sum(-1, keepdim=True)
            y = torch.zeros_like(h)
            for e in range(E):
                pe = f"block_sparse_moe.experts.{e}."
                g = h @ ws[p + pe + "w1.weight"].T
                u = h @ ws[p + pe + "w3.weight"].T
                oe = (F.silu(g) * u) @ ws[p + pe + "w2.weight"].T
                w_e = ((topi == e).float() * topw).sum(-1, keepdim=True)
                y = y + w_e * oe
            x = x * ALPHA_MLP + y * BETA_MLP
        x = rms(x, ws["model.norm.weight"])
        logits = x[-1] @ ws["lm_head.weight"].T
        toks.append(int(torch.argmax(logits)))
    return toks[len(ids):]


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    ws = _make_weights()
    d = tmp_path_factory.mktemp("tiny_minimax")
    from safetensors.numpy import save_file
    save_file({k: np.ascontiguousarray(v.numpy()) for k, v in ws.items()},
              str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps({
        "architectures": ["MiniMaxText01ForCausalLM"],
        "model_type": "minimax_text01",
        "vocab_size": V, "hidden_size": D, "num_hidden_layers": L,
        "num_attention_heads": NH, "num_key_value_heads": NKV,
        "head_dim": HD, "intermediate_size": I, "rotary_dim": ROT,
        "num_local_experts": E, "num_experts_per_tok": 2,
        "attn_type_list": ATTN_TYPES, "rms_norm_eps": 1e-5,
        "layernorm_linear_attention_alpha": ALPHA_LIN,
        "layernorm_linear_attention_beta": BETA_LIN,
        "layernorm_full_attention_alpha": ALPHA_FULL,
        "layernorm_full_attention_beta": BETA_FULL,
        "layernorm_mlp_alpha": ALPHA_MLP, "layernorm_mlp_beta": BETA_MLP,
        "postnorm": False, "rope_theta": 10000.0,
        "max_position_embeddings": 256, "tie_word_embeddings": False,
        "torch_dtype": "float32"}))
    return d, ws


def test_minimax_matches_oracle(ckpt):
    d, ws = ckpt
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(d), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=128, tokenizer="unused")
    prompts = [[1, 5, 9, 20, 3, 7], [7, 8, 9, 10]]
    outs = llm.generate(prompts, SamplingParams(temperature=0.0,
                                                max_tokens=8,
                                                ignore_eos=True))
    for p, o in zip(prompts, outs):
        assert o.outputs[0].token_ids == _oracle(ws, p, 8)


def test_minimax_chunked_prefill(ckpt):
    d, ws = ckpt
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(d), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=16, max_num_seqs=2,
              max_model_len=128, tokenizer="unused")
    p = [2] * 9 + [9, 4] * 11
    outs = llm.generate([p], SamplingParams(temperature=0.0, max_tokens=6,
                                            ignore_eos=True))
    assert outs[0].outputs[0].token_ids == _oracle(ws, p, 6)
