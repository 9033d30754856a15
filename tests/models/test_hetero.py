"""Heterogeneous-layer decoders (DeciLM / Arctic) vs hand torch oracles.

No transformers classes exist for either; the oracles mirror the reference
forward passes (nemotron_nas.py layer no-ops + per-layer GQA/FFN sizes,
arctic.py dense/MoE interleave with the parallel residual-MLP branch)."""
import math

import torch
import torch.nn.functional as F

from tests.models.test_remote_variants import _run_ours, _save, PROMPTS


def _rnd(*s):
    return torch.randn(*s) * 0.05


def _rms(x, w, eps=1e-5):
    return x * torch.rsqrt((x.float() ** 2).mean(-1, keepdim=True) + eps) * w


def _rope(x, pos, hd):
    inv = 10000.0 ** -(torch.arange(0, hd, 2).float() / hd)
    ang = pos[:, None].float() * inv[None, :]
    c, s = torch.cos(ang)[:, None], torch.sin(ang)[:, None]
    x1, x2 = x[..., :hd // 2], x[..., hd // 2:]
    return torch.cat([x1 * c - x2 * s, x2 * c + x1 * s], dim=-1)


def _attn(h, pos, wq, wk, wv, wo, nh, nkv, hd):
    T = h.shape[0]
    q = (h @ wq.T).view(T, nh, hd)
    k = (h @ wk.T).view(T, nkv, hd)
    v = (h @ wv.T).view(T, nkv, hd)
    q, k = _rope(q, pos, hd), _rope(k, pos, hd)
    k = k.repeat_interleave(nh // nkv, dim=1)
    v = v.repeat_interleave(nh // nkv, dim=1)
    q, k, v = (t.transpose(0, 1) for t in (q, k, v))
    s = (q @ k.transpose(-1, -2)) / math.sqrt(hd)
    mask = torch.tril(torch.ones(T, T, dtype=torch.bool))
    s = s.masked_fill(~mask[None], -torch.inf)
    a = (F.softmax(s, dim=-1) @ v).transpose(0, 1).reshape(T, nh * hd)
    return a @ wo.T


def test_decilm_torch_oracle(tmp_path):
    torch.manual_seed(5)
    V, D, NH, hd = 256, 64, 4, 16
    blocks = [
        {"attention": {"no_op": False, "n_heads_in_group": 2},
         "ffn": {"no_op": False, "ffn_mult": 1.0}},
        {"attention": {"no_op": True},
         "ffn": {"no_op": False, "ffn_mult": 2.0}},
        {"attention": {"no_op": False, "n_heads_in_group": 4},
         "ffn": {"no_op": True}},
    ]

    def ffn_I(mult):
        I = int(2 * mult * D / 3)
        return I if I % 256 == 0 else I + 256 - I % 256

    ws = {"model.embed_tokens.weight": _rnd(V, D),
          "model.norm.weight": torch.ones(D) + 0.1 * _rnd(D),
          "lm_head.weight": _rnd(V, D)}
    for i, b in enumerate(blocks):
        p = f"model.layers.{i}."
        if not b["attention"].get("no_op"):
            nkv = NH // b["attention"]["n_heads_in_group"]
            ws[p + "input_layernorm.weight"] = torch.ones(D) + 0.1 * _rnd(D)
            ws[p + "self_attn.q_proj.weight"] = _rnd(NH * hd, D)
            ws[p + "self_attn.k_proj.weight"] = _rnd(nkv * hd, D)
            ws[p + "self_attn.v_proj.weight"] = _rnd(nkv * hd, D)
            ws[p + "self_attn.o_proj.weight"] = _rnd(D, NH * hd)
        if not b["ffn"].get("no_op"):
            I = ffn_I(b["ffn"]["ffn_mult"])
            ws[p + "post_attention_layernorm.weight"] = \
                torch.ones(D) + 0.1 * _rnd(D)
            ws[p + "mlp.gate_proj.weight"] = _rnd(I, D)
            ws[p + "mlp.up_proj.weight"] = _rnd(I, D)
            ws[p + "mlp.down_proj.weight"] = _rnd(D, I)

    def oracle(ids, n_new):
        toks = list(ids)
        for _ in range(n_new):
            T = len(toks)
            x = ws["model.embed_tokens.weight"][torch.tensor(toks)]
            pos = torch.arange(T)
            for i, b in enumerate(blocks):
                p = f"model.layers.{i}."
                if not b["attention"].get("no_op"):
                    nkv = NH // b["attention"]["n_heads_in_group"]
                    h = _rms(x, ws[p + "input_layernorm.weight"])
                    x = x + _attn(h, pos,
                                  ws[p + "self_attn.q_proj.weight"],
                                  ws[p + "self_attn.k_proj.weight"],
                                  ws[p + "self_attn.v_proj.weight"],
                                  ws[p + "self_attn.o_proj.weight"],
                                  NH, nkv, hd)
                if not b["ffn"].get("no_op"):
                    h = _rms(x, ws[p + "post_attention_layernorm.weight"])
                    y = (F.silu(h @ ws[p + "mlp.gate_proj.weight"].T)
                         * (h @ ws[p + "mlp.up_proj.weight"].T)) \
                        @ ws[p + "mlp.down_proj.weight"].T
                    x = x + y
            x = _rms(x, ws["model.norm.weight"])
            logits = x[-1] @ ws["lm_head.weight"].T
            toks.append(int(torch.argmax(logits)))
        return toks[len(ids):]

    _save(tmp_path, ws, {
        "architectures": ["DeciLMForCausalLM"], "model_type": "nemotron-nas",
        "hidden_size": D, "num_hidden_layers": 3, "num_attention_heads": NH,
        "block_configs": blocks, "vocab_size": V, "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0, "max_position_embeddings": 512,
        "hidden_act": "silu", "tie_word_embeddings": False,
        "bos_token_id": 1, "eos_token_id": 2})
    got = _run_ours(tmp_path)
    assert got == [oracle(p, 8) for p in PROMPTS]


def test_arctic_torch_oracle(tmp_path):
    torch.manual_seed(6)
    V, D, NH, NKV, hd, I, E = 256, 64, 4, 2, 16, 96, 4
    L, FREQ = 2, 2  # layer 1 is MoE (+ residual branch), layer 0 dense

    ws = {"model.embed_tokens.weight": _rnd(V, D),
          "model.norm.weight": torch.ones(D) + 0.1 * _rnd(D),
          "lm_head.weight": _rnd(V, D)}
    for i in range(L):
        p = f"model.layers.{i}."
        ws[p + "input_layernorm.weight"] = torch.ones(D) + 0.1 * _rnd(D)
        ws[p + "post_attention_layernorm.weight"] = \
            torch.ones(D) + 0.1 * _rnd(D)
        ws[p + "self_attn.q_proj.weight"] = _rnd(NH * hd, D)
        ws[p + "self_attn.k_proj.weight"] = _rnd(NKV * hd, D)
        ws[p + "self_attn.v_proj.weight"] = _rnd(NKV * hd, D)
        ws[p + "self_attn.o_proj.weight"] = _rnd(D, NH * hd)
        if (i + 1) % FREQ == 0:
            ws[p + "block_sparse_moe.gate.weight"] = _rnd(E, D)
            for e in range(E):
                ws[p + f"block_sparse_moe.experts.{e}.w1.weight"] = _rnd(I, D)
                ws[p + f"block_sparse_moe.experts.{e}.w3.weight"] = _rnd(I, D)
                ws[p + f"block_sparse_moe.experts.{e}.w2.weight"] = _rnd(D, I)
            ws[p + "residual_layernorm.weight"] = torch.ones(D) + 0.1 * _rnd(D)
            ws[p + "residual_mlp.w1.weight"] = _rnd(D, D)
            ws[p + "residual_mlp.w3.weight"] = _rnd(D, D)
            ws[p + "residual_mlp.w2.weight"] = _rnd(D, D)
        else:
            ws[p + "block_sparse_moe.mlp.w1.weight"] = _rnd(I, D)
            ws[p + "block_sparse_moe.mlp.w3.weight"] = _rnd(I, D)
            ws[p + "block_sparse_moe.mlp.w2.weight"] = _rnd(D, I)

    def glu(h, w1, w3, w2):
        return (F.silu(h @ w1.T) * (h @ w3.T)) @ w2.T

    def oracle(ids, n_new):
        toks = list(ids)
        for _ in range(n_new):
            T = len(toks)
            x = ws["model.embed_tokens.weight"][torch.tensor(toks)]
            pos = torch.arange(T)
            for i in range(L):
                p = f"model.layers.{i}."
                x_in = x
                h = _rms(x, ws[p + "input_layernorm.weight"])
                x1 = x_in + _attn(h, pos,
                                  ws[p + "self_attn.q_proj.weight"],
                                  ws[p + "self_attn.k_proj.weight"],
                                  ws[p + "self_attn.v_proj.weight"],
                                  ws[p + "self_attn.o_proj.weight"],
                                  NH, NKV, hd)
                if (i + 1) % FREQ == 0:
                    r = glu(_rms(x1, ws[p + "residual_layernorm.weight"]),
                            ws[p + "residual_mlp.w1.weight"],
                            ws[p + "residual_mlp.w3.weight"],
                            ws[p + "residual_mlp.w2.weight"])
                    h2 = _rms(x_in,
                              ws[p + "post_attention_layernorm.weight"])
                    rl = h2 @ ws[p + "block_sparse_moe.gate.weight"].T
                    probs = F.softmax(rl.float(), dim=-1)
                    topw, topi = torch.topk(probs, 2, dim=-1)
                    topw = topw / topw.sum(-1, keepdim=True)
                    moe = torch.zeros_like(h2)
                    for e in range(E):
                        y = glu(h2,
                                ws[p + f"block_sparse_moe.experts.{e}.w1.weight"],
                                ws[p + f"block_sparse_moe.experts.{e}.w3.weight"],
                                ws[p + f"block_sparse_moe.experts.{e}.w2.weight"])
                        w_e = ((topi == e).float() * topw).sum(
                            -1, keepdim=True)
                        moe = moe + w_e * y
                    x = x1 + r + moe
                else:
                    h2 = _rms(x1, ws[p + "post_attention_layernorm.weight"])
                    x = x1 + glu(h2,
                                 ws[p + "block_sparse_moe.mlp.w1.weight"],
                                 ws[p + "block_sparse_moe.mlp.w3.weight"],
                                 ws[p + "block_sparse_moe.mlp.w2.weight"])
            x = _rms(x, ws["model.norm.weight"])
            logits = x[-1] @ ws["lm_head.weight"].T
            toks.append(int(torch.argmax(logits)))
        return toks[len(ids):]

    _save(tmp_path, ws, {
        "architectures": ["ArcticForCausalLM"], "model_type": "arctic",
        "hidden_size": D, "num_hidden_layers": L, "num_attention_heads": NH,
        "num_key_value_heads": NKV, "intermediate_size": I,
        "num_local_experts": E, "num_experts_per_tok": 2,
        "moe_layer_frequency": FREQ, "use_residual": True,
        "vocab_size": V, "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
        "max_position_embeddings": 512, "tie_word_embeddings": False,
        "bos_token_id": 1, "eos_token_id": 2})
    got = _run_ours(tmp_path)
    assert got == [oracle(p, 8) for p in PROMPTS]
