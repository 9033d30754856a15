"""LongRoPE (Phi-3 / MiniCPM3 'longrope' rope_scaling) and MiniCPM3 (MLA +
muP scales over a dense stack).

Phi-3 longrope is checked against the HF oracle (positions below
original_max_position_embeddings -> short_factor branch, identical in both
implementations); the short/long switchover is unit-checked directly; and
MiniCPM3 runs against a hand torch oracle (no transformers class exists)."""
import math

import numpy as np
import torch
import torch.nn.functional as F

from tests.models.test_remote_variants import (_hf_greedy, _run_ours, _save,
                                               PROMPTS)


def test_phi3_longrope_vs_hf(tmp_path):
    from transformers import Phi3Config, AutoModelForCausalLM
    torch.manual_seed(0)
    half = 8  # head_dim 16 -> 8 frequencies
    cfg = Phi3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512,
        original_max_position_embeddings=128,
        rope_scaling={"type": "longrope",
                      "short_factor": [1.0 + 0.1 * i for i in range(half)],
                      "long_factor": [2.0 + 0.3 * i for i in range(half)]},
        bos_token_id=1, eos_token_id=2, pad_token_id=0)
    hf = AutoModelForCausalLM.from_config(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    assert _run_ours(tmp_path) == _hf_greedy(hf)


def test_longrope_cos_sin_switchover():
    """Positions < orig_max use short_factor, >= orig_max long_factor, each
    with its mscale (reference Phi3LongRoPEScaledRotaryEmbedding)."""
    import jax.numpy as jnp
    from aphrodite_tpu.layers.rotary import (RopeConfig, compute_cos_sin,
                                             compute_inv_freq,
                                             longrope_orig_max)
    short = [1.0, 2.0]
    long_ = [4.0, 8.0]
    cfg = RopeConfig(head_dim=4, rotary_dim=4, base=10000.0,
                     max_position=256,
                     scaling={"type": "longrope", "short_factor": short,
                              "long_factor": long_,
                              "original_max_position_embeddings": 64})
    inv, ms = compute_inv_freq(cfg)
    assert inv.shape == (2, 2) and ms.shape == (2,)
    thr = longrope_orig_max(cfg)
    assert thr == 64
    expected_m = math.sqrt(1 + math.log(256 / 64) / math.log(64))
    assert np.allclose(ms, expected_m)
    pos = jnp.array([0, 63, 64, 200], jnp.int32)
    cos, sin = compute_cos_sin(pos, jnp.asarray(inv), ms, thr)
    base_inv = 10000.0 ** -(np.arange(0, 4, 2) / 4)
    for row, p, fac in ((0, 0, short), (1, 63, short), (2, 64, long_),
                        (3, 200, long_)):
        ang = p * base_inv / np.asarray(fac)
        assert np.allclose(np.asarray(cos)[row], np.cos(ang) * expected_m,
                           atol=1e-5), (row, p)
        assert np.allclose(np.asarray(sin)[row], np.sin(ang) * expected_m,
                           atol=1e-5), (row, p)


def test_minicpm3_torch_oracle(tmp_path):
    """MiniCPM3 = MLA (q/kv LoRA, neox rope on the pe dims, longrope
    scaling) + muP scales, vs a hand torch oracle mirroring reference
    minicpm3.py / minicpm.py."""
    torch.manual_seed(4)
    V, D, L, NH, I = 256, 64, 2, 4, 96
    R, NOPE, ROPE, VD, QLORA = 32, 16, 8, 16, 24
    QK = NOPE + ROPE
    scale_emb, scale_depth, dim_base = 12.0, 1.4, 32.0
    orig_max = 128
    short = [1.0 + 0.2 * i for i in range(ROPE // 2)]
    long_ = [2.0 + 0.5 * i for i in range(ROPE // 2)]

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
        ws[p + "self_attn.q_a_proj.weight"] = rnd(QLORA, D)
        ws[p + "self_attn.q_a_layernorm.weight"] = \
            torch.ones(QLORA) + 0.1 * rnd(QLORA)
        ws[p + "self_attn.q_b_proj.weight"] = rnd(NH * QK, QLORA)
        ws[p + "self_attn.kv_a_proj_with_mqa.weight"] = rnd(R + ROPE, D)
        ws[p + "self_attn.kv_a_layernorm.weight"] = \
            torch.ones(R) + 0.1 * rnd(R)
        ws[p + "self_attn.kv_b_proj.weight"] = rnd(NH * (NOPE + VD), R)
        ws[p + "self_attn.o_proj.weight"] = rnd(D, NH * VD)
        ws[p + "mlp.gate_proj.weight"] = rnd(I, D)
        ws[p + "mlp.up_proj.weight"] = rnd(I, D)
        ws[p + "mlp.down_proj.weight"] = rnd(D, I)

    rm = scale_depth / math.sqrt(L)
    mscale = math.sqrt(1 + math.log(512 / orig_max) / math.log(orig_max))
    base_inv = 10000.0 ** -(torch.arange(0, ROPE, 2).float() / ROPE)

    def rms(x, w):
        return x * torch.rsqrt((x.float() ** 2).mean(-1, keepdim=True)
                               + 1e-5) * w

    def rope_neox(x, pos):
        # prompts are short: always the short_factor branch
        inv = base_inv / torch.tensor(short)
        ang = pos[:, None].float() * inv[None, :]
        c = torch.cos(ang)[:, None] * mscale
        s = torch.sin(ang)[:, None] * mscale
        x1, x2 = x[..., :ROPE // 2], x[..., ROPE // 2:]
        return torch.cat([x1 * c - x2 * s, x2 * c + x1 * s], dim=-1)

    def oracle(ids, n_new):
        toks = list(ids)
        for _ in range(n_new):
            T = len(toks)
            x = ws["model.embed_tokens.weight"][torch.tensor(toks)] \
                * scale_emb
            pos = torch.arange(T)
            mask = torch.tril(torch.ones(T, T, dtype=torch.bool))
            for i in range(L):
                p = f"model.layers.{i}."
                h = rms(x, ws[p + "input_layernorm.weight"])
                q = rms(h @ ws[p + "self_attn.q_a_proj.weight"].T,
                        ws[p + "self_attn.q_a_layernorm.weight"])
                q = (q @ ws[p + "self_attn.q_b_proj.weight"].T).view(
                    T, NH, QK)
                q_nope, q_pe = q[..., :NOPE], q[..., NOPE:]
                kv_a = h @ ws[p + "self_attn.kv_a_proj_with_mqa.weight"].T
                ckv = rms(kv_a[:, :R],
                          ws[p + "self_attn.kv_a_layernorm.weight"])
                k_pe = rope_neox(kv_a[:, None, R:], pos)
                q_pe = rope_neox(q_pe, pos)
                kv = (ckv @ ws[p + "self_attn.kv_b_proj.weight"].T).view(
                    T, NH, NOPE + VD)
                k_nope, v = kv[..., :NOPE], kv[..., NOPE:]
                k = torch.cat([k_nope, k_pe.expand(T, NH, ROPE)], dim=-1)
                qq = torch.cat([q_nope, q_pe], dim=-1)
                qq, k, v = (t.transpose(0, 1) for t in (qq, k, v))
                s = (qq @ k.transpose(-1, -2)) / math.sqrt(QK)
                s = s.masked_fill(~mask[None], -torch.inf)
                a = (F.softmax(s, dim=-1) @ v).transpose(0, 1).reshape(
                    T, NH * VD)
                o = a @ ws[p + "self_attn.o_proj.weight"].T
                x = x + o * rm
                h = rms(x, ws[p + "post_attention_layernorm.weight"])
                y = (F.silu(h @ ws[p + "mlp.gate_proj.weight"].T)
                     * (h @ ws[p + "mlp.up_proj.weight"].T)) \
                    @ ws[p + "mlp.down_proj.weight"].T
                x = x + y * rm
            x = rms(x, ws["model.norm.weight"])
            logits = (x[-1] @ ws["lm_head.weight"].T) / (D / dim_base)
            toks.append(int(torch.argmax(logits)))
        return toks[len(ids):]

    _save(tmp_path, ws, {
        "architectures": ["MiniCPM3ForCausalLM"], "model_type": "minicpm3",
        "hidden_size": D, "num_hidden_layers": L, "num_attention_heads": NH,
        "num_key_value_heads": NH, "intermediate_size": I,
        "q_lora_rank": QLORA, "kv_lora_rank": R, "qk_nope_head_dim": NOPE,
        "qk_rope_head_dim": ROPE, "v_head_dim": VD, "vocab_size": V,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
        "max_position_embeddings": 512,
        "rope_scaling": {"type": "longrope", "short_factor": short,
                         "long_factor": long_,
                         "original_max_position_embeddings": orig_max},
        "scale_emb": scale_emb, "scale_depth": scale_depth,
        "dim_model_base": dim_base, "hidden_act": "silu",
        "tie_word_embeddings": False, "bos_token_id": 1, "eos_token_id": 2})
    got = _run_ours(tmp_path)
    assert got == [oracle(p, 8) for p in PROMPTS]
