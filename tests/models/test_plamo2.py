"""PLaMo2 (mamba-1 + attention hybrid, sandwich norms) vs a torch oracle
mirroring reference plamo2.py (per-head dt, dt/B/C RMSNorms, per-head q/k
RMS scales, norm weight offsets folded at load)."""
import json
import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from aphrodite_tpu.sampling_params import SamplingParams

V, D, L = 256, 64, 4
NQ, NKV, HD = 4, 2, 16          # attention (hidden_size_per_head = 16)
NHM, DS, K = 4, 8, 4            # mamba: heads, d_state, d_conv
DI = NHM * HD                   # 64
R = max(64, D // 16)            # time_step_rank = 64
I = 96
STEP = 2                        # layers 1, 3 are attention
EPS = 1e-6


def _is_mamba(i):
    return (i % STEP) != (STEP // 2)


def _make_weights(seed=0):
    torch.manual_seed(seed)

    def rnd(*s):
        return torch.randn(*s) * 0.05

    ws = {"model.embed_tokens.weight": rnd(V, D),
          "model.norm.weight": 0.1 * rnd(D),      # loader adds +1.0
          "lm_head.weight": rnd(V, D)}
    for i in range(L):
        p = f"model.layers.layers.{i}."
        for n in ("pre_mixer_norm", "post_mixer_norm", "pre_mlp_norm",
                  "post_mlp_norm"):
            ws[p + n + ".weight"] = 0.1 * rnd(D)
        ws[p + "mlp.gate_up_proj.weight"] = rnd(2 * I, D)
        ws[p + "mlp.down_proj.weight"] = rnd(D, I)
        if _is_mamba(i):
            ws[p + "mixer.in_proj.weight"] = rnd(2 * DI, D)
            ws[p + "mixer.conv1d.weight"] = rnd(DI, 1, K)
            ws[p + "mixer.bcdt_proj.weight"] = rnd(2 * DS + R, DI)
            ws[p + "mixer.dt_proj.weight"] = rnd(NHM, R)
            ws[p + "mixer.dt_bias"] = rnd(NHM)
            ws[p + "mixer.A_log"] = 0.5 * torch.rand(NHM)
            ws[p + "mixer.D"] = torch.ones(NHM) + 0.1 * rnd(NHM)
            ws[p + "mixer.out_proj.weight"] = rnd(D, DI)
            ws[p + "mixer.dt_norm_weight"] = torch.ones(R) + 0.1 * rnd(R)
            ws[p + "mixer.B_norm_weight"] = torch.ones(DS) + 0.1 * rnd(DS)
            ws[p + "mixer.C_norm_weight"] = torch.ones(DS) + 0.1 * rnd(DS)
        else:
            ws[p + "mixer.qkv_proj.weight"] = rnd((NQ + 2 * NKV) * HD, D)
            ws[p + "mixer.o_proj.weight"] = rnd(D, NQ * HD)
            ws[p + "mixer.q_weight"] = torch.ones(NQ, HD) + 0.1 * rnd(NQ, HD)
            ws[p + "mixer.k_weight"] = (torch.ones(NKV, HD)
                                        + 0.1 * rnd(NKV, HD))
    return ws


NORM_OFF = {"pre_mixer_norm": 1.0, "post_mixer_norm": 0.2,
            "pre_mlp_norm": 1.0, "post_mlp_norm": 5.0 ** -1.5}


def _oracle(ws, ids, n_new):
    toks = list(ids)
    inv = 10000.0 ** -(torch.arange(0, HD, 2).float() / HD)

    def rms(x, w, eps=EPS):
        return (x.float() * torch.rsqrt(
            (x.float() ** 2).mean(-1, keepdim=True) + eps)) * w.float()

    def mamba(h, p):
        T = h.shape[0]
        proj = h @ ws[p + "mixer.in_proj.weight"].T.float()
        pr = proj.view(T, NHM, 2 * HD)
        gate = pr[..., :HD].reshape(T, DI)
        hx = pr[..., HD:].reshape(T, DI)
        cw = ws[p + "mixer.conv1d.weight"].view(DI, K).float()
        hpad = torch.cat([torch.zeros(K - 1, DI), hx])
        hc = torch.stack([(hpad[t:t + K].T * cw).sum(-1)
                          for t in range(T)])
        hc = F.silu(hc)
        bcdt = hc @ ws[p + "mixer.bcdt_proj.weight"].T.float()
        B = rms(bcdt[:, :DS], ws[p + "mixer.B_norm_weight"])
        C = rms(bcdt[:, DS:2 * DS], ws[p + "mixer.C_norm_weight"])
        dt = rms(bcdt[:, 2 * DS:], ws[p + "mixer.dt_norm_weight"])
        dt = dt @ ws[p + "mixer.dt_proj.weight"].T.float()
        dt = F.softplus(dt + ws[p + "mixer.dt_bias"].float())
        dt = dt.repeat_interleave(HD, dim=-1)            # [T, DI]
        A = -torch.exp(ws[p + "mixer.A_log"].float()
                       ).repeat_interleave(HD)[:, None].expand(DI, DS)
        Dp = ws[p + "mixer.D"].float().repeat_interleave(HD)
        S = torch.zeros(DI, DS)
        ys = []
        for t in range(T):
            S = torch.exp(dt[t][:, None] * A) * S \
                + dt[t][:, None] * B[t][None, :] * hc[t][:, None]
            ys.append(S @ C[t] + Dp * hc[t])
        y = torch.stack(ys) * F.silu(gate)
        return y @ ws[p + "mixer.out_proj.weight"].T.float()

    def attn(h, p):
        T = h.shape[0]
        qkv = h @ ws[p + "mixer.qkv_proj.weight"].T.float()
        q = qkv[:, :NQ * HD].view(T, NQ, HD)
        k = qkv[:, NQ * HD:(NQ + NKV) * HD].view(T, NKV, HD)
        v = qkv[:, (NQ + NKV) * HD:].view(T, NKV, HD)
        q = rms(q, ws[p + "mixer.q_weight"], 1e-6)
        k = rms(k, ws[p + "mixer.k_weight"], 1e-6)
        ang = torch.arange(T)[:, None].float() * inv[None]
        c, s = torch.cos(ang)[:, None], torch.sin(ang)[:, None]

        def rope(t):
            t1, t2 = t[..., :HD // 2], t[..., HD // 2:]
            return torch.cat([t1 * c - t2 * s, t2 * c + t1 * s], -1)
        q, k = rope(q), rope(k)
        k = k.repeat_interleave(NQ // NKV, dim=1)
        v = v.repeat_interleave(NQ // NKV, dim=1)
        q, k, v = (t.transpose(0, 1) for t in (q, k, v))
        sc = (q @ k.transpose(-1, -2)) / math.sqrt(HD)
        mask = torch.tril(torch.ones(T, T, dtype=torch.bool))
        sc = sc.masked_fill(~mask[None], -torch.inf)
        o = (F.softmax(sc, -1) @ v).transpose(0, 1).reshape(T, -1)
        return o @ ws[p + "mixer.o_proj.weight"].T.float()

    for _ in range(n_new):
        x = ws["model.embed_tokens.weight"][torch.tensor(toks)].float()
        for i in range(L):
            p = f"model.layers.layers.{i}."

            def lnorm(v, n):
                return rms(v, ws[p + n + ".weight"] + NORM_OFF[n])
            h = lnorm(x, "pre_mixer_norm")
            out = mamba(h, p) if _is_mamba(i) else attn(h, p)
            x = x + lnorm(out, "post_mixer_norm")
            h = lnorm(x, "pre_mlp_norm")
            gu = h @ ws[p + "mlp.gate_up_proj.weight"].T.float()
            y = (F.silu(gu[:, :I]) * gu[:, I:]) \
                @ ws[p + "mlp.down_proj.weight"].T.float()
            x = x + lnorm(y, "post_mlp_norm")
        x = rms(x, ws["model.norm.weight"] + 1.0)
        logits = x[-1] @ ws["lm_head.weight"].T.float()
        toks.append(int(torch.argmax(logits)))
    return toks[len(ids):]


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    ws = _make_weights()
    d = tmp_path_factory.mktemp("tiny_plamo2")
    from safetensors.numpy import save_file
    save_file({k: np.ascontiguousarray(v.numpy()) for k, v in ws.items()},
              str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps({
        "architectures": ["Plamo2ForCausalLM"], "model_type": "plamo2",
        "vocab_size": V, "hidden_size": D, "num_hidden_layers": L,
        "num_attention_heads": NQ, "num_key_value_heads": NKV,
        "hidden_size_per_head": HD, "intermediate_size": I,
        "mamba_num_heads": NHM, "mamba_d_state": DS, "mamba_d_conv": K,
        "mamba_step": STEP, "mamba_enabled": True,
        "rms_norm_eps": EPS, "rope_theta": 10000.0,
        "max_position_embeddings": 256, "tie_word_embeddings": False,
        "torch_dtype": "float32"}))
    return d, ws


def test_plamo2_matches_oracle(ckpt):
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


def test_plamo2_chunked_prefill(ckpt):
    """Prefill split across steps exercises the conv/ssm state resume."""
    d, ws = ckpt
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(d), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=16, max_num_seqs=2,
              max_model_len=128, tokenizer="unused")
    p = [2] * 9 + [9, 4] * 11
    outs = llm.generate([p], SamplingParams(temperature=0.0, max_tokens=6,
                                            ignore_eos=True))
    assert outs[0].outputs[0].token_ids == _oracle(ws, p, 6)
