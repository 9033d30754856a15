"""ModernBERT / NomicBERT-style / GTE-new rotary encoders vs oracles."""
import json

import numpy as np
import pytest
import torch
import torch.nn.functional as F


def _embed(tmp_path, prompts, pooling="mean"):
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(tmp_path), dtype="float32", tokenizer="unused",
              device="cpu")
    return llm.embed(prompts, pooling=pooling, normalize=False)


def test_modernbert_embed_matches_hf(tmp_path):
    from transformers import ModernBertConfig, ModernBertModel
    cfg = ModernBertConfig(
        vocab_size=128, hidden_size=48, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=64, global_attn_every_n_layers=2,
        local_attention=4, global_rope_theta=16000.0,
        local_rope_theta=1000.0, architectures=["ModernBertModel"],
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        reference_compile=False)
    torch.manual_seed(0)
    hf = ModernBertModel(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    prompts = [[5, 9, 17, 3, 2, 4, 6, 8], [2, 4, 6, 8, 10, 12]]
    vecs = _embed(tmp_path, prompts)
    for p, v in zip(prompts, vecs):
        with torch.no_grad():
            out = hf(torch.tensor([p])).last_hidden_state[0].numpy()
        np.testing.assert_allclose(np.asarray(v), out.mean(0), rtol=2e-3,
                                   atol=2e-3)


def test_modernbert_classification_matches_hf(tmp_path):
    from transformers import (ModernBertConfig,
                              ModernBertForSequenceClassification)
    cfg = ModernBertConfig(
        vocab_size=128, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=64, global_attn_every_n_layers=2,
        local_attention=4, num_labels=1, classifier_pooling="mean",
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        architectures=["ModernBertForSequenceClassification"],
        reference_compile=False)
    torch.manual_seed(1)
    hf = ModernBertForSequenceClassification(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(tmp_path), dtype="float32", tokenizer="unused",
              device="cpu")
    pairs = [([1, 5, 9], [17, 3]), ([2, 4], [6, 8, 10])]
    scores = llm.score([p for p, _ in pairs], [q for _, q in pairs])
    for (a, b), s in zip(pairs, scores):
        ids = a + b
        with torch.no_grad():
            logit = hf(torch.tensor([ids])).logits[0, 0].item()
        exp = 1.0 / (1.0 + np.exp(-logit))
        assert abs(s - exp) < 2e-3


def _rotary_bert_oracle(ws, ids, L, nh, hd, gate_key, up_key, act):
    """Post-norm rotary gated-MLP BERT forward (torch)."""
    eps = 1e-12
    x = ws["embeddings.word_embeddings.weight"][torch.tensor(ids)]
    x = x + ws["embeddings.token_type_embeddings.weight"][0]
    x = F.layer_norm(x, x.shape[-1:], ws["emb_ln.weight"],
                     ws["emb_ln.bias"], eps)
    S = len(ids)
    inv = 10000.0 ** -(torch.arange(0, hd, 2).float() / hd)
    ang = torch.arange(S)[:, None].float() * inv[None]
    cos, sin = torch.cos(ang), torch.sin(ang)

    def rope(t):  # [S, nh, hd]
        t1, t2 = t[..., :hd // 2], t[..., hd // 2:]
        c, s = cos[:, None], sin[:, None]
        return torch.cat([t1 * c - t2 * s, t2 * c + t1 * s], dim=-1)

    for i in range(L):
        p = f"encoder.layers.{i}."
        qkv = x @ ws[p + "attn.Wqkv.weight"].T
        q, k, v = qkv.chunk(3, dim=-1)
        q = rope(q.view(S, nh, hd))
        k = rope(k.view(S, nh, hd))
        v = v.view(S, nh, hd)
        s = torch.einsum("qnd,knd->nqk", q, k) / np.sqrt(hd)
        o = torch.einsum("nqk,knd->qnd", F.softmax(s, -1), v).reshape(S, -1)
        o = o @ ws[p + "attn.out_proj.weight"].T
        x = F.layer_norm(x + o, x.shape[-1:], ws[p + "norm1.weight"],
                         ws[p + "norm1.bias"], eps)
        g = x @ ws[p + gate_key].T
        u = x @ ws[p + up_key].T
        h = (act(g) * u) @ ws[p + "mlp.fc2.weight"].T
        x = F.layer_norm(x + h, x.shape[-1:], ws[p + "norm2.weight"],
                         ws[p + "norm2.bias"], eps)
    return x


def test_nomic_bert_matches_torch_oracle(tmp_path):
    torch.manual_seed(2)
    V, D, L, NH, I = 128, 48, 2, 4, 64
    hd = D // NH

    def rnd(*s):
        return torch.randn(*s) * 0.05

    ws = {"embeddings.word_embeddings.weight": rnd(V, D),
          "embeddings.token_type_embeddings.weight": rnd(2, D),
          "emb_ln.weight": torch.ones(D) + 0.1 * rnd(D),
          "emb_ln.bias": 0.1 * rnd(D)}
    for i in range(L):
        p = f"encoder.layers.{i}."
        ws[p + "attn.Wqkv.weight"] = rnd(3 * D, D)
        ws[p + "attn.out_proj.weight"] = rnd(D, D)
        ws[p + "norm1.weight"] = torch.ones(D) + 0.1 * rnd(D)
        ws[p + "norm1.bias"] = 0.1 * rnd(D)
        ws[p + "mlp.fc11.weight"] = rnd(I, D)  # up
        ws[p + "mlp.fc12.weight"] = rnd(I, D)  # gate
        ws[p + "mlp.fc2.weight"] = rnd(D, I)
        ws[p + "norm2.weight"] = torch.ones(D) + 0.1 * rnd(D)
        ws[p + "norm2.bias"] = 0.1 * rnd(D)
    from safetensors.numpy import save_file
    save_file({k: np.ascontiguousarray(v.numpy()) for k, v in ws.items()},
              str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps({
        "architectures": ["NomicBertModel"], "model_type": "nomic_bert",
        "n_embd": D, "n_layer": L, "n_head": NH, "n_inner": I,
        "vocab_size": V, "n_positions": 64, "layer_norm_eps": 1e-12,
        "activation_function": "swiglu", "rotary_emb_fraction": 1.0,
        "rotary_emb_base": 10000, "type_vocab_size": 2,
        "torch_dtype": "float32"}))
    prompts = [[5, 9, 17, 3], [2, 4, 6, 8, 10]]
    vecs = _embed(tmp_path, prompts)

    class W:  # swiglu: silu(fc12) * fc11
        pass
    for p, v in zip(prompts, vecs):
        ws2 = dict(ws)
        out = _rotary_bert_oracle(ws2, p, L, NH, hd, "mlp.fc12.weight",
                                  "mlp.fc11.weight", F.silu)
        np.testing.assert_allclose(np.asarray(v), out.mean(0).numpy(),
                                   rtol=2e-3, atol=2e-3)


def test_gte_new_matches_torch_oracle(tmp_path):
    torch.manual_seed(3)
    V, D, L, NH, I = 128, 48, 2, 4, 64
    hd = D // NH

    def rnd(*s):
        return torch.randn(*s) * 0.05

    ws = {"embeddings.word_embeddings.weight": rnd(V, D),
          "embeddings.token_type_embeddings.weight": rnd(2, D),
          "embeddings.LayerNorm.weight": torch.ones(D) + 0.1 * rnd(D),
          "embeddings.LayerNorm.bias": 0.1 * rnd(D)}
    for i in range(L):
        p = f"encoder.layer.{i}."
        ws[p + "attention.qkv_proj.weight"] = rnd(3 * D, D)
        ws[p + "attention.qkv_proj.bias"] = 0.1 * rnd(3 * D)
        ws[p + "attention.o_proj.weight"] = rnd(D, D)
        ws[p + "attention.o_proj.bias"] = 0.1 * rnd(D)
        ws[p + "attn_ln.weight"] = torch.ones(D) + 0.1 * rnd(D)
        ws[p + "attn_ln.bias"] = 0.1 * rnd(D)
        ws[p + "mlp.up_gate_proj.weight"] = rnd(2 * I, D)  # [gate | up]
        ws[p + "mlp.down_proj.weight"] = rnd(D, I)
        ws[p + "mlp.down_proj.bias"] = 0.1 * rnd(D)
        ws[p + "mlp_ln.weight"] = torch.ones(D) + 0.1 * rnd(D)
        ws[p + "mlp_ln.bias"] = 0.1 * rnd(D)
    from safetensors.numpy import save_file
    save_file({k: np.ascontiguousarray(v.numpy()) for k, v in ws.items()},
              str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps({
        "architectures": ["NewModel"], "model_type": "new",
        "hidden_size": D, "num_hidden_layers": L,
        "num_attention_heads": NH, "intermediate_size": I,
        "vocab_size": V, "max_position_embeddings": 64,
        "layer_norm_eps": 1e-12, "position_embedding_type": "rope",
        "rope_theta": 10000, "type_vocab_size": 2,
        "torch_dtype": "float32"}))
    prompts = [[5, 9, 17, 3], [2, 4, 6, 8, 10]]
    vecs = _embed(tmp_path, prompts)

    eps = 1e-12
    for p, v in zip(prompts, vecs):
        S = len(p)
        x = ws["embeddings.word_embeddings.weight"][torch.tensor(p)]
        x = x + ws["embeddings.token_type_embeddings.weight"][0]
        x = F.layer_norm(x, (D,), ws["embeddings.LayerNorm.weight"],
                         ws["embeddings.LayerNorm.bias"], eps)
        inv = 10000.0 ** -(torch.arange(0, hd, 2).float() / hd)
        ang = torch.arange(S)[:, None].float() * inv[None]
        cos, sin = torch.cos(ang), torch.sin(ang)

        def rope(t):
            t1, t2 = t[..., :hd // 2], t[..., hd // 2:]
            c, s = cos[:, None], sin[:, None]
            return torch.cat([t1 * c - t2 * s, t2 * c + t1 * s], dim=-1)

        for i in range(L):
            pre = f"encoder.layer.{i}."
            qkv = x @ ws[pre + "attention.qkv_proj.weight"].T + \
                ws[pre + "attention.qkv_proj.bias"]
            q, k, vv = qkv.chunk(3, dim=-1)
            q = rope(q.view(S, NH, hd))
            k = rope(k.view(S, NH, hd))
            vv = vv.view(S, NH, hd)
            s = torch.einsum("qnd,knd->nqk", q, k) / np.sqrt(hd)
            o = torch.einsum("nqk,knd->qnd", F.softmax(s, -1), vv
                             ).reshape(S, -1)
            o = o @ ws[pre + "attention.o_proj.weight"].T + \
                ws[pre + "attention.o_proj.bias"]
            x = F.layer_norm(x + o, (D,), ws[pre + "attn_ln.weight"],
                             ws[pre + "attn_ln.bias"], eps)
            ug = x @ ws[pre + "mlp.up_gate_proj.weight"].T
            g, u = ug.chunk(2, dim=-1)
            h = (F.gelu(g) * u) @ ws[pre + "mlp.down_proj.weight"].T + \
                ws[pre + "mlp.down_proj.bias"]
            x = F.layer_norm(x + h, (D,), ws[pre + "mlp_ln.weight"],
                             ws[pre + "mlp_ln.bias"], eps)
        np.testing.assert_allclose(np.asarray(v), x.mean(0).numpy(),
                                   rtol=2e-3, atol=2e-3)
