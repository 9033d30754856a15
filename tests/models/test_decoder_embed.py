"""Decoder-based embedders + RoBERTa position offset, vs HF oracles."""
import numpy as np
import torch


def _llm(tmp_path, **kw):
    from aphrodite_tpu.entrypoints.llm import LLM
    return LLM(model=str(tmp_path), dtype="float32", tokenizer="unused",
               device="cpu", **kw)


def test_roberta_embed_matches_hf(tmp_path):
    from transformers import RobertaConfig, RobertaModel
    cfg = RobertaConfig(vocab_size=128, hidden_size=48, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=96,
                        max_position_embeddings=66, pad_token_id=1,
                        architectures=["RobertaModel"])
    torch.manual_seed(0)
    hf = RobertaModel(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    llm = _llm(tmp_path)
    prompts = [[5, 9, 17, 3], [2, 4, 6, 8, 10, 12]]
    vecs = llm.embed(prompts, pooling="mean", normalize=False)
    for p, v in zip(prompts, vecs):
        with torch.no_grad():
            out = hf(torch.tensor([p])).last_hidden_state[0].numpy()
        np.testing.assert_allclose(np.asarray(v), out.mean(0), rtol=2e-3,
                                   atol=2e-3)


def test_qwen2_decoder_embed_matches_hf(tmp_path):
    from transformers import Qwen2Config, Qwen2Model
    cfg = Qwen2Config(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=128,
                      architectures=["Qwen2Model"])
    torch.manual_seed(0)
    hf = Qwen2Model(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    llm = _llm(tmp_path)
    prompts = [[5, 9, 17, 3], [2, 4, 6, 8, 10, 12]]
    vecs = llm.embed(prompts, pooling="last", normalize=False)
    for p, v in zip(prompts, vecs):
        with torch.no_grad():
            out = hf(torch.tensor([p])).last_hidden_state[0, -1].numpy()
        np.testing.assert_allclose(np.asarray(v), out, rtol=2e-3, atol=2e-3)


def test_qwen2_seq_classification_matches_hf(tmp_path):
    from transformers import Qwen2Config, Qwen2ForSequenceClassification
    cfg = Qwen2Config(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, num_labels=3, pad_token_id=0,
                      max_position_embeddings=128,
                      architectures=["Qwen2ForSequenceClassification"])
    torch.manual_seed(0)
    hf = Qwen2ForSequenceClassification(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    llm = _llm(tmp_path)
    prompts = [[5, 9, 17, 3], [2, 4, 6, 8, 10, 12]]
    vecs = llm.embed(prompts, pooling="last", normalize=False)
    for p, v in zip(prompts, vecs):
        with torch.no_grad():
            out = hf(torch.tensor([p])).logits[0].numpy()
        np.testing.assert_allclose(np.asarray(v), out, rtol=2e-3, atol=2e-3)


def test_qwen2_reward_model(tmp_path):
    """No HF class for Qwen2ForRewardModel — hand-build the vLLM-style
    score head (score.0 / score.2) on a Qwen2Model and check the pooled
    reward against a direct torch computation."""
    import json
    from transformers import Qwen2Config, Qwen2Model
    cfg = Qwen2Config(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=128)
    torch.manual_seed(0)
    hf = Qwen2Model(cfg).eval()
    H = 64
    w0 = torch.randn(H, H) * 0.05
    b0 = torch.randn(H) * 0.05
    w2 = torch.randn(1, H) * 0.05
    from safetensors.numpy import save_file
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    sd["score.0.weight"] = w0.numpy()
    sd["score.0.bias"] = b0.numpy()
    sd["score.2.weight"] = w2.numpy()
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
              str(tmp_path / "model.safetensors"))
    d = json.loads(cfg.to_json_string())
    d["architectures"] = ["Qwen2ForRewardModel"]
    (tmp_path / "config.json").write_text(json.dumps(d))
    llm = _llm(tmp_path)
    prompts = [[5, 9, 17, 3]]
    v = llm.embed(prompts, pooling="last", normalize=False)[0]
    with torch.no_grad():
        h = hf(torch.tensor(prompts)).last_hidden_state[0, -1]
        exp = (torch.relu(h @ w0.T + b0) @ w2.T).numpy()
    np.testing.assert_allclose(np.asarray(v), exp, rtol=2e-3, atol=2e-3)
