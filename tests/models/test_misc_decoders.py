"""Wave-3 variants vs oracles: QWen v1, JAIS, ChatGLM, TeleChat2, TeleFLM,
Fairseq2-Llama (checkpoint-schema conversion against real HF oracles) and
Grok-1 / JAIS-muP / ChatGLM (hand torch oracles for semantics HF transformers
does not ship)."""
import json
import math

import numpy as np
import torch
import torch.nn.functional as F

from aphrodite_tpu.sampling_params import SamplingParams
from tests.models.test_remote_variants import (_hf_greedy, _run_ours, _save,
                                               _tiny_llama, PROMPTS)


def _run_ours_logits_free(model_dir, n_new=8):
    return _run_ours(model_dir, n_new)


# ---------------------------------------------------------------- QWen v1
def test_qwen_v1_vs_llama_oracle(tmp_path):
    from transformers import LlamaConfig, AutoModelForCausalLM
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=4, attention_bias=True,
                      max_position_embeddings=512, bos_token_id=1,
                      eos_token_id=2)
    hf = AutoModelForCausalLM.from_config(cfg).eval()
    with torch.no_grad():  # QWen has no o_proj bias
        for lyr in hf.model.layers:
            lyr.self_attn.o_proj.bias.zero_()
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
    _save(tmp_path, out, {
        "architectures": ["QWenLMHeadModel"], "model_type": "qwen",
        "hidden_size": 64, "intermediate_size": 256, "num_hidden_layers": 2,
        "num_attention_heads": 4, "vocab_size": 256,
        "layer_norm_epsilon": 1e-6, "rotary_emb_base": 10000.0,
        "seq_length": 512, "tie_word_embeddings": False,
        "bos_token_id": 1, "eos_token_id": 2})
    assert _run_ours(tmp_path) == _hf_greedy(hf)


# ------------------------------------------------------------------- JAIS
def test_jais_gpt2_oracle(tmp_path):
    """Learned-position dense-gelu JAIS == GPT-2 with Conv1D layout."""
    from transformers import GPT2Config, AutoModelForCausalLM
    torch.manual_seed(0)
    cfg = GPT2Config(vocab_size=256, n_embd=64, n_layer=2, n_head=4,
                     n_positions=512, bos_token_id=1, eos_token_id=2)
    hf = AutoModelForCausalLM.from_config(cfg).eval()
    sd = {k: v for k, v in hf.state_dict().items()
          if not k.endswith((".attn.bias", ".attn.masked_bias"))}
    _save(tmp_path, sd, {
        "architectures": ["JAISLMHeadModel"], "model_type": "jais",
        "n_embd": 64, "n_layer": 2, "n_head": 4, "n_positions": 512,
        "vocab_size": 256, "layer_norm_epsilon": 1e-5,
        "activation_function": "gelu_new",
        "position_embedding_type": "learned",
        "tie_word_embeddings": True, "bos_token_id": 1, "eos_token_id": 2})
    assert _run_ours(tmp_path) == _hf_greedy(hf)


def _alibi_slopes(n):
    def pow2(k):
        start = 2 ** (-(2 ** -(math.log2(k) - 3)))
        return [start * (start ** i) for i in range(k)]
    if math.log2(n).is_integer():
        return pow2(n)
    k = 2 ** math.floor(math.log2(n))
    return pow2(k) + _alibi_slopes(2 * k)[0::2][:n - k]


def test_jais_swiglu_alibi_mup(tmp_path):
    """JAIS with ALiBi + swiglu + muP scales vs a hand torch oracle
    (reference jais.py:57-92,142-170,233-236 semantics)."""
    torch.manual_seed(1)
    V, D, L, NH, I = 256, 64, 2, 4, 96
    hd = D // NH
    emb_scale, width_scale = 2.5, 0.4

    def rnd(*s):
        return torch.randn(*s) * 0.05

    ws = {"transformer.wte.weight": rnd(V, D),
          "transformer.ln_f.weight": torch.ones(D) + 0.1 * rnd(D),
          "transformer.ln_f.bias": 0.1 * rnd(D)}
    for i in range(L):
        p = f"transformer.h.{i}."
        ws[p + "ln_1.weight"] = torch.ones(D) + 0.1 * rnd(D)
        ws[p + "ln_1.bias"] = 0.1 * rnd(D)
        ws[p + "ln_2.weight"] = torch.ones(D) + 0.1 * rnd(D)
        ws[p + "ln_2.bias"] = 0.1 * rnd(D)
        ws[p + "attn.c_attn.weight"] = rnd(D, 3 * D)   # Conv1D [in, out]
        ws[p + "attn.c_attn.bias"] = 0.1 * rnd(3 * D)
        ws[p + "attn.c_proj.weight"] = rnd(D, D)
        ws[p + "attn.c_proj.bias"] = 0.1 * rnd(D)
        ws[p + "mlp.c_fc.weight"] = rnd(D, I)
        ws[p + "mlp.c_fc.bias"] = 0.1 * rnd(I)
        ws[p + "mlp.c_fc2.weight"] = rnd(D, I)
        ws[p + "mlp.c_fc2.bias"] = 0.1 * rnd(I)
        ws[p + "mlp.c_proj.weight"] = rnd(I, D)
        ws[p + "mlp.c_proj.bias"] = 0.1 * rnd(D)

    slopes = torch.tensor(_alibi_slopes(NH), dtype=torch.float32)

    def oracle(ids, n_new):
        toks = list(ids)
        for _ in range(n_new):
            T = len(toks)
            x = ws["transformer.wte.weight"][torch.tensor(toks)] * emb_scale
            pos = torch.arange(T)
            bias = slopes[:, None, None] * (pos[None, None, :]
                                            - pos[None, :, None])
            mask = torch.tril(torch.ones(T, T, dtype=torch.bool))
            for i in range(L):
                p = f"transformer.h.{i}."
                h = F.layer_norm(x, (D,), ws[p + "ln_1.weight"],
                                 ws[p + "ln_1.bias"], 1e-5)
                qkv = h @ ws[p + "attn.c_attn.weight"] + \
                    ws[p + "attn.c_attn.bias"]
                q, k, v = qkv.split(D, dim=-1)
                q = q.view(T, NH, hd).transpose(0, 1)
                k = k.view(T, NH, hd).transpose(0, 1)
                v = v.view(T, NH, hd).transpose(0, 1)
                s = (q @ k.transpose(-1, -2)) / hd  # scale_qk_dot_by_d
                s = s + bias
                s = s.masked_fill(~mask[None], -torch.inf)
                a = (F.softmax(s, dim=-1) @ v).transpose(0, 1).reshape(T, D)
                x = x + a @ ws[p + "attn.c_proj.weight"] + \
                    ws[p + "attn.c_proj.bias"]
                h = F.layer_norm(x, (D,), ws[p + "ln_2.weight"],
                                 ws[p + "ln_2.bias"], 1e-5)
                up = h @ ws[p + "mlp.c_fc.weight"] + ws[p + "mlp.c_fc.bias"]
                gate = h @ ws[p + "mlp.c_fc2.weight"] + \
                    ws[p + "mlp.c_fc2.bias"]
                y = up * F.silu(gate)
                x = x + y @ ws[p + "mlp.c_proj.weight"] + \
                    ws[p + "mlp.c_proj.bias"]
            x = F.layer_norm(x, (D,), ws["transformer.ln_f.weight"],
                             ws["transformer.ln_f.bias"], 1e-5)
            logits = x[-1] @ ws["transformer.wte.weight"].T * width_scale
            toks.append(int(torch.argmax(logits)))
        return toks[len(ids):]

    _save(tmp_path, ws, {
        "architectures": ["JAISLMHeadModel"], "model_type": "jais",
        "n_embd": D, "n_layer": L, "n_head": NH, "n_inner": I,
        "n_positions": 512, "vocab_size": V, "layer_norm_epsilon": 1e-5,
        "activation_function": "swiglu",
        "position_embedding_type": "alibi",
        "embeddings_scale": emb_scale, "width_scale": width_scale,
        "scale_qk_dot_by_d": True,
        "tie_word_embeddings": True, "bos_token_id": 1, "eos_token_id": 2})
    got = _run_ours(tmp_path)
    assert got == [oracle(p, 8) for p in PROMPTS]


# ---------------------------------------------------------------- ChatGLM
def test_chatglm_torch_oracle(tmp_path):
    """ChatGLM-3-style stack (MQA groups, fused QKV+bias, interleaved
    half-dim rotary, merged swiglu) vs a hand torch oracle mirroring
    reference chatglm.py:52-160."""
    torch.manual_seed(2)
    V, D, L, NH, NKV, I = 256, 64, 2, 4, 2, 96
    hd = D // NH
    rope_ratio = 2.0
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

    inv = (10000.0 * rope_ratio) ** -(torch.arange(0, rot, 2).float() / rot)

    def rms(x, w):
        return x * torch.rsqrt((x.float() ** 2).mean(-1, keepdim=True)
                               + 1e-5) * w

    def rope_interleaved(x, pos):
        # x: [T, h, hd]; rotate first `rot` dims in (2i, 2i+1) pairs.
        T, h, _ = x.shape
        xr = x[..., :rot].reshape(T, h, rot // 2, 2)
        ang = pos[:, None].float() * inv[None, :]
        c, s = torch.cos(ang)[:, None], torch.sin(ang)[:, None]
        o = torch.stack([xr[..., 0] * c - xr[..., 1] * s,
                         xr[..., 1] * c + xr[..., 0] * s], dim=-1)
        return torch.cat([o.reshape(T, h, rot), x[..., rot:]], dim=-1)

    def oracle(ids, n_new):
        toks = list(ids)
        for _ in range(n_new):
            T = len(toks)
            x = ws["transformer.embedding.word_embeddings.weight"][
                torch.tensor(toks)]
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
                q, k = rope_interleaved(q, pos), rope_interleaved(k, pos)
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

    _save(tmp_path, ws, {
        "architectures": ["ChatGLMModel"], "model_type": "chatglm",
        "hidden_size": D, "num_layers": L, "num_attention_heads": NH,
        "multi_query_attention": True, "multi_query_group_num": NKV,
        "ffn_hidden_size": I, "kv_channels": hd, "vocab_size": V,
        "layernorm_epsilon": 1e-5, "rmsnorm": True, "original_rope": True,
        "add_qkv_bias": True, "add_bias_linear": False,
        "rope_ratio": rope_ratio, "seq_length": 512,
        "post_layer_norm": True, "tie_word_embeddings": False,
        "bos_token_id": 1, "eos_token_id": 2})
    got = _run_ours(tmp_path)
    assert got == [oracle(p, 8) for p in PROMPTS]


# -------------------------------------------------------------- TeleChat2
def test_telechat2_vs_llama_oracle(tmp_path):
    from transformers import LlamaConfig, AutoModelForCausalLM
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=4, attention_bias=False,
                      mlp_bias=True, max_position_embeddings=512,
                      bos_token_id=1, eos_token_id=2)
    hf = AutoModelForCausalLM.from_config(cfg).eval()
    with torch.no_grad():  # telechat2: biases only on dense + down_proj
        for lyr in hf.model.layers:
            lyr.mlp.gate_proj.bias.zero_()
            lyr.mlp.up_proj.bias.zero_()
    sd = hf.state_dict()
    nh, nkv, hd = 4, 4, 16
    out = {"transformer.word_embeddings.weight":
               sd["model.embed_tokens.weight"],
           "transformer.ln_f.weight": sd["model.norm.weight"],
           "lm_head.weight": sd["lm_head.weight"]}
    for i in range(2):
        src, dst = f"model.layers.{i}.", f"transformer.h.{i}."
        k = sd[src + "self_attn.k_proj.weight"].view(nkv, 1, hd, 64)
        v = sd[src + "self_attn.v_proj.weight"].view(nkv, 1, hd, 64)
        out[dst + "self_attention.key_value.weight"] = torch.cat(
            [k, v], dim=1).reshape(2 * nkv * hd, 64)
        out[dst + "self_attention.query.weight"] = \
            sd[src + "self_attn.q_proj.weight"]
        out[dst + "self_attention.dense.weight"] = \
            sd[src + "self_attn.o_proj.weight"]
        out[dst + "self_attention.dense.bias"] = \
            torch.zeros(64)
        out[dst + "mlp.gate_proj.weight"] = sd[src + "mlp.gate_proj.weight"]
        out[dst + "mlp.up_proj.weight"] = sd[src + "mlp.up_proj.weight"]
        out[dst + "mlp.down_proj.weight"] = sd[src + "mlp.down_proj.weight"]
        out[dst + "mlp.down_proj.bias"] = sd[src + "mlp.down_proj.bias"]
        out[dst + "input_layernorm.weight"] = \
            sd[src + "input_layernorm.weight"]
        out[dst + "post_attention_layernorm.weight"] = \
            sd[src + "post_attention_layernorm.weight"]
    _save(tmp_path, out, {
        "architectures": ["TeleChat2ForCausalLM"], "model_type": "telechat",
        "hidden_size": 64, "intermediate_size": 128, "n_layer": 2,
        "n_head": 4, "num_key_value_heads": 4, "vocab_size": 256,
        "rms_norm_eps": 1e-6, "rope_theta": 10000.0, "seq_length": 512,
        "tie_word_embeddings": False, "bos_token_id": 1, "eos_token_id": 2})
    assert _run_ours(tmp_path) == _hf_greedy(hf)


# ---------------------------------------------------------------- TeleFLM
def test_teleflm_mup_vs_llama_oracle(tmp_path):
    """muP path: saving embed/input_mult must reproduce the plain-llama
    greedy tokens (logit scaling is argmax-invariant)."""
    hf, cfg = _tiny_llama()
    sd = dict(hf.state_dict())
    input_mult = 4.0
    sd["model.embed_tokens.weight"] = sd["model.embed_tokens.weight"] \
        / input_mult
    _save(tmp_path, sd, {
        "architectures": ["TeleFLMForCausalLM"], "model_type": "teleflm",
        "hidden_size": 64, "intermediate_size": 128, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "vocab_size": 256, "rms_norm_eps": 1e-6, "hidden_act": "silu",
        "rope_theta": 10000.0, "max_position_embeddings": 512,
        "use_mup": True, "input_mult": input_mult, "output_mult": 3.0,
        "mup_scale_factor": 2.0,
        "tie_word_embeddings": False, "bos_token_id": 1, "eos_token_id": 2})
    assert _run_ours(tmp_path) == _hf_greedy(hf)


# --------------------------------------------------------- Fairseq2 Llama
def test_fairseq2_llama_vs_llama_oracle(tmp_path):
    hf, cfg = _tiny_llama()
    sd = hf.state_dict()
    nh, nkv, hd, H = 4, 2, 16, 64

    def to_interleaved(w, n):
        # inverse of the load-time un-permute (fairseq2_llama.py:106-115)
        return w.view(n, 2, hd // 2, H).transpose(1, 2).reshape(n * hd, H)

    out = {"decoder_frontend.embed.weight": sd["model.embed_tokens.weight"],
           "decoder.layer_norm.weight": sd["model.norm.weight"],
           "final_proj.weight": sd["lm_head.weight"]}
    for i in range(2):
        src, dst = f"model.layers.{i}.", f"decoder.layers.{i}."
        out[dst + "self_attn.q_proj.weight"] = to_interleaved(
            sd[src + "self_attn.q_proj.weight"], nh)
        out[dst + "self_attn.k_proj.weight"] = to_interleaved(
            sd[src + "self_attn.k_proj.weight"], nkv)
        out[dst + "self_attn.v_proj.weight"] = sd[src +
                                                  "self_attn.v_proj.weight"]
        out[dst + "self_attn.output_proj.weight"] = \
            sd[src + "self_attn.o_proj.weight"]
        out[dst + "ffn.gate_proj.weight"] = sd[src + "mlp.gate_proj.weight"]
        out[dst + "ffn.inner_proj.weight"] = sd[src + "mlp.up_proj.weight"]
        out[dst + "ffn.output_proj.weight"] = sd[src + "mlp.down_proj.weight"]
        out[dst + "self_attn_layer_norm.weight"] = \
            sd[src + "input_layernorm.weight"]
        out[dst + "ffn_layer_norm.weight"] = \
            sd[src + "post_attention_layernorm.weight"]
    _save(tmp_path, out, {
        "architectures": ["Fairseq2LlamaForCausalLM"], "model_type": "llama",
        "hidden_size": 64, "intermediate_size": 128, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "vocab_size": 256, "rms_norm_eps": 1e-6, "hidden_act": "silu",
        "rope_theta": 10000.0, "max_position_embeddings": 512,
        "tie_word_embeddings": False, "bos_token_id": 1, "eos_token_id": 2})
    assert _run_ours(tmp_path) == _hf_greedy(hf)


# ----------------------------------------------------------------- Grok-1
def test_grok1_torch_oracle(tmp_path):
    """Grok-1 semantics (sandwich norms, router/attn softcaps, output
    multipliers, linear/linear_v/linear_1 experts) vs a hand torch oracle
    mirroring reference grok1.py."""
    torch.manual_seed(3)
    V, D, L, NH, NKV, I, E = 256, 64, 2, 4, 2, 48, 4
    hd = D // NH
    emb_scale, out_scale, attn_mult, cap = 1.5, 0.6, 0.8, 30.0

    def rnd(*s):
        return torch.randn(*s) * 0.05

    ws = {"model.embed_tokens.weight": rnd(V, D),
          "model.norm.scale": torch.ones(D) + 0.1 * rnd(D)}
    for i in range(L):
        p = f"model.layers.{i}."
        for n in ("pre_attn_norm", "post_attn_norm", "pre_moe_norm",
                  "post_moe_norm"):
            ws[p + n + ".scale"] = torch.ones(D) + 0.1 * rnd(D)
        ws[p + "self_attn.q_proj.weight"] = rnd(D, D)
        ws[p + "self_attn.k_proj.weight"] = rnd(NKV * hd, D)
        ws[p + "self_attn.v_proj.weight"] = rnd(NKV * hd, D)
        ws[p + "self_attn.o_proj.weight"] = rnd(D, D)
        ws[p + "moe_block.gate.weight"] = rnd(E, D)
        for e in range(E):
            ws[p + f"moe_block.experts.{e}.linear.weight"] = rnd(I, D)
            ws[p + f"moe_block.experts.{e}.linear_v.weight"] = rnd(I, D)
            ws[p + f"moe_block.experts.{e}.linear_1.weight"] = rnd(D, I)

    inv = 10000.0 ** -(torch.arange(0, hd, 2).float() / hd)

    def rms(x, w):
        return x * torch.rsqrt((x.float() ** 2).mean(-1, keepdim=True)
                               + 1e-5) * w

    def rope(x, pos):
        T, h, _ = x.shape
        ang = pos[:, None].float() * inv[None, :]
        c, s = torch.cos(ang)[:, None], torch.sin(ang)[:, None]
        x1, x2 = x[..., :hd // 2], x[..., hd // 2:]
        return torch.cat([x1 * c - x2 * s, x2 * c + x1 * s], dim=-1)

    def oracle(ids, n_new):
        toks = list(ids)
        for _ in range(n_new):
            T = len(toks)
            x = ws["model.embed_tokens.weight"][torch.tensor(toks)] \
                * emb_scale
            pos = torch.arange(T)
            mask = torch.tril(torch.ones(T, T, dtype=torch.bool))
            for i in range(L):
                p = f"model.layers.{i}."
                h = rms(x, ws[p + "pre_attn_norm.scale"])
                q = (h @ ws[p + "self_attn.q_proj.weight"].T).view(T, NH, hd)
                k = (h @ ws[p + "self_attn.k_proj.weight"].T).view(T, NKV, hd)
                v = (h @ ws[p + "self_attn.v_proj.weight"].T).view(T, NKV, hd)
                q, k = rope(q, pos), rope(k, pos)
                k = k.repeat_interleave(NH // NKV, dim=1)
                v = v.repeat_interleave(NH // NKV, dim=1)
                q, k, v = (t.transpose(0, 1) for t in (q, k, v))
                s = (q @ k.transpose(-1, -2)) / math.sqrt(hd)
                s = cap * torch.tanh(s / cap)
                s = s.masked_fill(~mask[None], -torch.inf)
                a = (F.softmax(s, dim=-1) @ v).transpose(0, 1).reshape(T, D)
                a = (a @ ws[p + "self_attn.o_proj.weight"].T) * attn_mult
                x = x + rms(a, ws[p + "post_attn_norm.scale"])
                h = rms(x, ws[p + "pre_moe_norm.scale"])
                rl = h @ ws[p + "moe_block.gate.weight"].T
                rl = cap * torch.tanh(rl / cap)
                probs = F.softmax(rl, dim=-1)
                topw, topi = torch.topk(probs, 2, dim=-1)
                topw = topw / topw.sum(-1, keepdim=True)
                y = torch.zeros_like(h)
                for e in range(E):
                    g = h @ ws[p + f"moe_block.experts.{e}.linear.weight"].T
                    u = h @ ws[p + f"moe_block.experts.{e}.linear_v.weight"].T
                    o = (F.silu(g) * u) @ \
                        ws[p + f"moe_block.experts.{e}.linear_1.weight"].T
                    w_e = ((topi == e).float() * topw).sum(-1, keepdim=True)
                    y = y + w_e * o
                x = x + rms(y, ws[p + "post_moe_norm.scale"])
            x = rms(x, ws["model.norm.scale"])
            logits = x[-1] @ ws["model.embed_tokens.weight"].T * out_scale
            toks.append(int(torch.argmax(logits)))
        return toks[len(ids):]

    _save(tmp_path, ws, {
        "architectures": ["Grok1ModelForCausalLM"], "model_type": "grok-1",
        "hidden_size": D, "num_hidden_layers": L, "num_attention_heads": NH,
        "num_key_value_heads": NKV, "intermediate_size": I,
        "num_experts": E, "num_experts_per_tok": 2, "vocab_size": V,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
        "max_position_embeddings": 512, "attn_logit_softcapping": cap,
        "attn_output_multiplier": attn_mult,
        "embedding_multiplier_scale": emb_scale,
        "output_multiplier_scale": out_scale,
        "tie_word_embeddings": True, "bos_token_id": 1, "eos_token_id": 2})
    got = _run_ours(tmp_path)
    assert got == [oracle(p, 8) for p in PROMPTS]
