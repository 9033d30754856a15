"""InternLM2 reward head, GritLM embedding serving, and Roberta
cross-encoder classification (RobertaClassificationHead mapping)."""
import json

import numpy as np
import torch

from tests.models.test_remote_variants import _save


def _llm(path, **kw):
    from aphrodite_tpu.entrypoints.llm import LLM
    return LLM(model=str(path), dtype="float32", block_size=16,
               num_kv_blocks=64, max_num_batched_tokens=64, max_num_seqs=4,
               max_model_len=128, tokenizer="unused", **kw)


def test_internlm2_reward_matches_llama_oracle(tmp_path):
    """Tiny llama exported under InternLM2 naming + a v_head: pooled reward
    must equal (HF last hidden state) @ v_head^T."""
    from transformers import LlamaConfig, AutoModelForCausalLM
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=512,
                      bos_token_id=1, eos_token_id=2)
    hf = AutoModelForCausalLM.from_config(cfg).eval()
    sd = hf.state_dict()
    nh, nkv, hd, H = 4, 2, 16, 64
    g = nh // nkv
    v_head = torch.randn(1, H) * 0.05
    out = {"model.tok_embeddings.weight": sd["model.embed_tokens.weight"],
           "model.norm.weight": sd["model.norm.weight"],
           "v_head.weight": v_head}
    for i in range(2):
        src = f"model.layers.{i}."
        q = sd[src + "self_attn.q_proj.weight"].reshape(nkv, g, hd, H)
        k = sd[src + "self_attn.k_proj.weight"].reshape(nkv, 1, hd, H)
        v = sd[src + "self_attn.v_proj.weight"].reshape(nkv, 1, hd, H)
        out[src + "attention.wqkv.weight"] = torch.cat(
            [q, k, v], dim=1).reshape((g + 2) * nkv * hd, H)
        out[src + "attention.wo.weight"] = sd[src + "self_attn.o_proj.weight"]
        out[src + "feed_forward.w1.weight"] = sd[src + "mlp.gate_proj.weight"]
        out[src + "feed_forward.w3.weight"] = sd[src + "mlp.up_proj.weight"]
        out[src + "feed_forward.w2.weight"] = sd[src + "mlp.down_proj.weight"]
        out[src + "attention_norm.weight"] = sd[src + "input_layernorm.weight"]
        out[src + "ffn_norm.weight"] = \
            sd[src + "post_attention_layernorm.weight"]
    _save(tmp_path, out, {
        "architectures": ["InternLM2ForRewardModel"],
        "model_type": "internlm2",
        "hidden_size": 64, "intermediate_size": 128, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2, "bias": False,
        "vocab_size": 256, "rms_norm_eps": 1e-6, "hidden_act": "silu",
        "rope_theta": 10000.0, "max_position_embeddings": 512,
        "tie_word_embeddings": True, "bos_token_id": 1, "eos_token_id": 2})
    llm = _llm(tmp_path)
    prompts = [[5, 9, 17, 3], [2, 4, 6, 8, 10, 12]]
    rewards = llm.embed(prompts, pooling="last", normalize=False)
    for p, r in zip(prompts, rewards):
        with torch.no_grad():
            hidden = hf.model(torch.tensor([p])).last_hidden_state[0, -1]
            exp = (hidden @ v_head.T).numpy()
        np.testing.assert_allclose(np.asarray(r), exp, rtol=2e-3, atol=2e-3)


def test_gritlm_embeds_as_mistral(tmp_path):
    from transformers import MistralConfig, MistralForCausalLM
    torch.manual_seed(0)
    cfg = MistralConfig(vocab_size=256, hidden_size=64,
                        intermediate_size=128, num_hidden_layers=2,
                        num_attention_heads=4, num_key_value_heads=2,
                        max_position_embeddings=512,
                        architectures=["GritLM"],
                        bos_token_id=1, eos_token_id=2)
    hf = MistralForCausalLM(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    # save_pretrained normalizes architectures; force GritLM.
    d = json.loads((tmp_path / "config.json").read_text())
    d["architectures"] = ["GritLM"]
    (tmp_path / "config.json").write_text(json.dumps(d))
    llm = _llm(tmp_path)
    prompts = [[5, 9, 17, 3], [2, 4, 6, 8, 10, 12]]
    vecs = llm.embed(prompts, pooling="mean", normalize=False)
    for p, v in zip(prompts, vecs):
        with torch.no_grad():
            out = hf.model(torch.tensor([p])).last_hidden_state[0].numpy()
        np.testing.assert_allclose(np.asarray(v), out.mean(0), rtol=2e-3,
                                   atol=2e-3)


def test_roberta_cross_encoder_matches_hf(tmp_path):
    from transformers import (RobertaConfig,
                              RobertaForSequenceClassification)
    torch.manual_seed(0)
    cfg = RobertaConfig(vocab_size=128, hidden_size=48, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=96,
                        max_position_embeddings=66, pad_token_id=1,
                        num_labels=1)
    hf = RobertaForSequenceClassification(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    llm = _llm(tmp_path)
    pairs = [([0, 5, 9, 2], [2, 17, 3, 2]), ([0, 7, 2], [2, 30, 31, 2])]
    from aphrodite_tpu.models.registry import get_model_class
    # classify() path: run through the encoder runner via llm._score-like
    # API. The public surface is LLM.score(text...), which needs a
    # tokenizer; drive the model layer directly with token ids instead.
    import jax
    from aphrodite_tpu.config import ModelConfig
    mc = ModelConfig(model=str(tmp_path), dtype="float32",
                     tokenizer="unused")
    model = get_model_class(mc.architecture)(mc)
    from aphrodite_tpu.loader.weights import weights_iterator
    params = jax.tree.map(np.asarray,
                          model.load_weights(weights_iterator(str(tmp_path))))
    for a, b in pairs:
        ids = a + b
        input_ids = np.array([ids + [1] * (12 - len(ids))], np.int32)
        mask = np.array([[1] * len(ids) + [0] * (12 - len(ids))], np.int32)
        types = np.zeros_like(input_ids)
        got = np.asarray(model.classify(params, input_ids, mask, types))[0]
        with torch.no_grad():
            exp = hf(input_ids=torch.tensor([ids]),
                     attention_mask=torch.ones(1, len(ids),
                                               dtype=torch.long)).logits[0]
        np.testing.assert_allclose(got, exp.numpy(), rtol=2e-3, atol=2e-3)
