"""Cross-encoder scoring (BertForSequenceClassification) vs HF oracle +
the /score and /rerank server routes."""
import numpy as np
import pytest
import torch


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from transformers import BertConfig, BertForSequenceClassification, \
        BertTokenizerFast
    d = tmp_path_factory.mktemp("tiny_xenc")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "the", "quick", "brown", "fox", "dog", "cat", "runs", "fast",
             "a", "b", "c", "d", "e", "hello", "world", "##s", "##ing"]
    (d / "vocab.txt").write_text("\n".join(vocab))
    tok = BertTokenizerFast(str(d / "vocab.txt"), do_lower_case=True)
    tok.save_pretrained(str(d))
    cfg = BertConfig(vocab_size=len(vocab) + 10, hidden_size=32,
                     num_hidden_layers=2, num_attention_heads=2,
                     intermediate_size=64, max_position_embeddings=128,
                     num_labels=1)
    torch.manual_seed(0)
    hf = BertForSequenceClassification(cfg).eval()
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf, tok


def test_score_matches_hf(ckpt):
    d, hf, tok = ckpt
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(d), dtype="float32", max_model_len=128,
              num_kv_blocks=16)
    query = "the quick brown fox"
    docs = ["the dog runs fast", "hello world", "a b c d e"]
    got = llm.score(query, docs)
    enc = tok([query] * len(docs), docs, return_tensors="pt", padding=True)
    with torch.no_grad():
        exp = torch.sigmoid(hf(**enc).logits[:, 0]).tolist()
    np.testing.assert_allclose(got, exp, rtol=2e-4, atol=2e-5)
    ranked = llm.rerank(query, docs)
    order = sorted(range(len(docs)), key=lambda i: -exp[i])
    assert [r["index"] for r in ranked] == order


def test_score_rerank_routes(ckpt):
    d, _, _ = ckpt
    import httpx
    from tests.utils import RemoteOpenAIServer
    with RemoteOpenAIServer(str(d)) as srv:
        r = httpx.post(srv.base_url + "/v1/score",
                       json={"text_1": "the quick brown fox",
                             "text_2": ["the dog runs fast", "hello world"]},
                       timeout=120)
        assert r.status_code == 200, r.text
        data = r.json()["data"]
        assert len(data) == 2 and all(0 <= x["score"] <= 1 for x in data)
        r2 = httpx.post(srv.base_url + "/v2/rerank",
                        json={"query": "the quick brown fox",
                              "documents": ["the dog runs fast",
                                            "hello world", "a b"],
                              "top_n": 2}, timeout=120)
        assert r2.status_code == 200, r2.text
        res = r2.json()["results"]
        assert len(res) == 2
        assert res[0]["relevance_score"] >= res[1]["relevance_score"]
