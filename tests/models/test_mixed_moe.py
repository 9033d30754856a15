"""Mixed dense/MoE layer stacks (run-segmented scan).

Covers: Qwen2-MoE with mlp_only_layers + decoder_sparse_step vs the real HF
oracle, and DeepSeek V1 (first_k_dense_replace, softmax top-k routing with
norm_topk_prob=False, ungated shared experts) vs a hand torch oracle
mirroring reference deepseek.py."""
import json
import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from aphrodite_tpu.sampling_params import SamplingParams

PROMPTS = [[1, 5, 9, 20, 3], [7, 8, 9, 10, 11]]


def _run_ours(model_dir, n_new=8):
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(model_dir), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=256, tokenizer="unused")
    outs = llm.generate(PROMPTS, SamplingParams(temperature=0.0,
                                                max_tokens=n_new,
                                                ignore_eos=True))
    return [o.outputs[0].token_ids for o in outs]


def test_qwen2moe_mlp_only_layers_matches_hf(tmp_path):
    """Layers [dense, moe, dense, moe] via mlp_only_layers — the HF class
    implements this natively, so the mixed-run scan gets a real oracle."""
    from transformers import AutoModelForCausalLM, Qwen2MoeConfig
    cfg = Qwen2MoeConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=96, moe_intermediate_size=48,
        shared_expert_intermediate_size=80,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        decoder_sparse_step=1, mlp_only_layers=[0, 2],
        max_position_embeddings=512, tie_word_embeddings=False)
    torch.manual_seed(0)
    hf = AutoModelForCausalLM.from_config(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    got = _run_ours(tmp_path)
    for p, g in zip(PROMPTS, got):
        with torch.no_grad():
            exp = hf.generate(torch.tensor([p]), max_new_tokens=8,
                              do_sample=False,
                              eos_token_id=None)[0][len(p):].tolist()
        assert g == exp


def test_deepseek_v1_torch_oracle(tmp_path):
    """DeepSeek V1 semantics: first dense layer, then MoE layers with
    softmax top-k routing (no renorm) + 2 ungated shared experts."""
    torch.manual_seed(1)
    V, D, L, NH, NKV, Id, Im, E, K, NS = 256, 64, 3, 4, 2, 96, 32, 4, 2, 2
    hd = D // NH
    first_dense = 1

    def rnd(*s):
        return torch.randn(*s) * 0.05

    ws = {"model.embed_tokens.weight": rnd(V, D),
          "model.norm.weight": torch.ones(D) + 0.1 * rnd(D),
          "lm_head.weight": rnd(V, D)}
    for i in range(L):
        p = f"model.layers.{i}."
        ws[p + "input_layernorm.weight"] = torch.ones(D) + 0.1 * rnd(D)
        ws[p + "post_attention_layernorm.weight"] = \
            torch.ones(D) + 0.1 * rnd(D)
        ws[p + "self_attn.q_proj.weight"] = rnd(NH * hd, D)
        ws[p + "self_attn.k_proj.weight"] = rnd(NKV * hd, D)
        ws[p + "self_attn.v_proj.weight"] = rnd(NKV * hd, D)
        ws[p + "self_attn.o_proj.weight"] = rnd(D, NH * hd)
        if i < first_dense:
            ws[p + "mlp.gate_proj.weight"] = rnd(Id, D)
            ws[p + "mlp.up_proj.weight"] = rnd(Id, D)
            ws[p + "mlp.down_proj.weight"] = rnd(D, Id)
        else:
            ws[p + "mlp.gate.weight"] = rnd(E, D)
            for e in range(E):
                ws[p + f"mlp.experts.{e}.gate_proj.weight"] = rnd(Im, D)
                ws[p + f"mlp.experts.{e}.up_proj.weight"] = rnd(Im, D)
                ws[p + f"mlp.experts.{e}.down_proj.weight"] = rnd(D, Im)
            ws[p + "mlp.shared_experts.gate_proj.weight"] = rnd(NS * Im, D)
            ws[p + "mlp.shared_experts.up_proj.weight"] = rnd(NS * Im, D)
            ws[p + "mlp.shared_experts.down_proj.weight"] = rnd(D, NS * Im)

    inv = 10000.0 ** -(torch.arange(0, hd, 2).float() / hd)

    def rms(x, w):
        return x * torch.rsqrt((x.float() ** 2).mean(-1, keepdim=True)
                               + 1e-6) * w

    def rope(x, pos):
        ang = pos[:, None].float() * inv[None, :]
        c, s = torch.cos(ang)[:, None], torch.sin(ang)[:, None]
        x1, x2 = x[..., :hd // 2], x[..., hd // 2:]
        return torch.cat([x1 * c - x2 * s, x2 * c + x1 * s], dim=-1)

    def swiglu(h, p):
        g = h @ ws[p + "gate_proj.weight"].T
        u = h @ ws[p + "up_proj.weight"].T
        return (F.silu(g) * u) @ ws[p + "down_proj.weight"].T

    def oracle(ids, n_new):
        toks = list(ids)
        for _ in range(n_new):
            T = len(toks)
            x = ws["model.embed_tokens.weight"][torch.tensor(toks)]
            pos = torch.arange(T)
            mask = torch.tril(torch.ones(T, T, dtype=torch.bool))
            for i in range(L):
                p = f"model.layers.{i}."
                h = rms(x, ws[p + "input_layernorm.weight"])
                q = (h @ ws[p + "self_attn.q_proj.weight"].T).view(T, NH, hd)
                k = (h @ ws[p + "self_attn.k_proj.weight"].T).view(T, NKV,
                                                                   hd)
                v = (h @ ws[p + "self_attn.v_proj.weight"].T).view(T, NKV,
                                                                   hd)
                q, k = rope(q, pos), rope(k, pos)
                k = k.repeat_interleave(NH // NKV, dim=1)
                v = v.repeat_interleave(NH // NKV, dim=1)
                q, k, v = (t.transpose(0, 1) for t in (q, k, v))
                s = (q @ k.transpose(-1, -2)) / math.sqrt(hd)
                s = s.masked_fill(~mask[None], -torch.inf)
                a = (F.softmax(s, dim=-1) @ v).transpose(0, 1).reshape(T, D)
                x = x + a @ ws[p + "self_attn.o_proj.weight"].T
                h = rms(x, ws[p + "post_attention_layernorm.weight"])
                if i < first_dense:
                    y = swiglu(h, p + "mlp.")
                else:
                    probs = F.softmax(h @ ws[p + "mlp.gate.weight"].T, -1)
                    topw, topi = torch.topk(probs, K, dim=-1)  # no renorm
                    y = torch.zeros_like(h)
                    for e in range(E):
                        o = swiglu(h, p + f"mlp.experts.{e}.")
                        w_e = ((topi == e).float() * topw).sum(-1,
                                                               keepdim=True)
                        y = y + w_e * o
                    y = y + swiglu(h, p + "mlp.shared_experts.")
                x = x + y
            x = rms(x, ws["model.norm.weight"])
            logits = x[-1] @ ws["lm_head.weight"].T
            toks.append(int(torch.argmax(logits)))
        return toks[len(ids):]

    from safetensors.numpy import save_file
    save_file({k: np.ascontiguousarray(v.numpy()) for k, v in ws.items()},
              str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps({
        "architectures": ["DeepseekForCausalLM"], "model_type": "deepseek",
        "vocab_size": V, "hidden_size": D, "num_hidden_layers": L,
        "num_attention_heads": NH, "num_key_value_heads": NKV,
        "intermediate_size": Id, "moe_intermediate_size": Im,
        "n_routed_experts": E, "num_experts_per_tok": K,
        "n_shared_experts": NS, "first_k_dense_replace": first_dense,
        "moe_layer_freq": 1, "norm_topk_prob": False,
        "rms_norm_eps": 1e-6, "max_position_embeddings": 512,
        "tie_word_embeddings": False, "torch_dtype": "float32"}))
    got = _run_ours(tmp_path)
    for p, g in zip(PROMPTS, got):
        assert g == oracle(p, 8)
