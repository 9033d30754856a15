"""Live-server E2E over HTTP (reference pattern: tests/endpoints/openai/ via
RemoteOpenAIServer)."""
import json

import httpx
import pytest

from tests.utils import (RemoteOpenAIServer, build_tiny_tokenizer,
                         save_tiny_hf_checkpoint, tiny_llama_hf_config)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_srv")
    save_tiny_hf_checkpoint(d, tiny_llama_hf_config(max_pos=512))
    build_tiny_tokenizer(d)
    with RemoteOpenAIServer(
            d, extra_args=["--block-size", "16", "--num-kv-blocks", "256",
                           "--max-num-batched-tokens", "128",
                           "--max-num-seqs", "8",
                           "--max-model-len", "256",
                           "--dtype", "float32"]) as srv:
        yield srv


def test_health_version_models(server):
    assert httpx.get(server.base_url + "/health").status_code == 200
    v = httpx.get(server.base_url + "/version").json()
    assert "version" in v
    models = httpx.get(server.base_url + "/v1/models").json()
    assert models["object"] == "list"
    assert models["data"][0]["max_model_len"] == 256


def test_chat_completion(server):
    r = httpx.post(server.base_url + "/v1/chat/completions", json={
        "messages": [{"role": "user", "content": "hello world"}],
        "max_tokens": 8, "temperature": 0, "ignore_eos": True,
    }, timeout=120)
    assert r.status_code == 200, r.text
    body = r.json()
    assert body["object"] == "chat.completion"
    assert len(body["choices"]) == 1
    msg = body["choices"][0]["message"]
    assert msg["role"] == "assistant"
    assert isinstance(msg["content"], str) and len(msg["content"]) > 0
    assert body["usage"]["completion_tokens"] == 8
    assert body["choices"][0]["finish_reason"] == "length"


def test_chat_completion_streaming(server):
    chunks = []
    with httpx.stream("POST", server.base_url + "/v1/chat/completions",
                      json={
                          "messages": [{"role": "user",
                                        "content": "the quick brown"}],
                          "max_tokens": 8, "temperature": 0,
                          "ignore_eos": True, "stream": True,
                          "stream_options": {"include_usage": True},
                      }, timeout=120) as r:
        assert r.status_code == 200
        for line in r.iter_lines():
            if line.startswith("data: "):
                chunks.append(line[len("data: "):])
    assert chunks[-1] == "[DONE]"
    parsed = [json.loads(c) for c in chunks[:-1]]
    assert parsed[0]["choices"][0]["delta"]["role"] == "assistant"
    text = "".join(c["choices"][0]["delta"].get("content") or ""
                   for c in parsed if c.get("choices"))
    assert len(text) > 0
    usage = [c for c in parsed if c.get("usage")]
    assert usage and usage[-1]["usage"]["completion_tokens"] == 8

    # Streamed text == non-streamed text for the same greedy request.
    r2 = httpx.post(server.base_url + "/v1/chat/completions", json={
        "messages": [{"role": "user", "content": "the quick brown"}],
        "max_tokens": 8, "temperature": 0, "ignore_eos": True,
    }, timeout=120)
    assert r2.json()["choices"][0]["message"]["content"] == text


def test_completions(server):
    r = httpx.post(server.base_url + "/v1/completions", json={
        "prompt": "hello world, this",
        "max_tokens": 6, "temperature": 0, "ignore_eos": True,
    }, timeout=120)
    assert r.status_code == 200, r.text
    body = r.json()
    assert body["object"] == "text_completion"
    assert len(body["choices"][0]["text"]) > 0
    assert body["usage"]["completion_tokens"] == 6


def test_completions_n_and_seed(server):
    r = httpx.post(server.base_url + "/v1/completions", json={
        "prompt": "hello", "n": 2, "seed": 5, "temperature": 1.0,
        "max_tokens": 4, "ignore_eos": True,
    }, timeout=120)
    body = r.json()
    assert len(body["choices"]) == 2
    assert body["usage"]["completion_tokens"] == 8


def test_completions_sampler_extensions(server):
    r = httpx.post(server.base_url + "/v1/completions", json={
        "prompt": "hello world", "max_tokens": 4, "temperature": 0.8,
        "seed": 1, "min_p": 0.05, "xtc_probability": 0.3,
        "dry_multiplier": 0.5, "nsigma": 1.5, "dynatemp_min": 0.5,
        "dynatemp_max": 1.2, "ignore_eos": True,
    }, timeout=120)
    assert r.status_code == 200, r.text
    assert len(r.json()["choices"][0]["text"]) >= 0


def test_tokenize_detokenize(server):
    r = httpx.post(server.base_url + "/v1/tokenize",
                   json={"prompt": "hello world"}, timeout=30)
    toks = r.json()
    assert toks["count"] == len(toks["tokens"]) > 0
    r2 = httpx.post(server.base_url + "/v1/detokenize",
                    json={"tokens": toks["tokens"]}, timeout=30)
    assert "hello" in r2.json()["prompt"]


def test_metrics_and_info(server):
    m = httpx.get(server.base_url + "/metrics").text
    assert "aphrodite_request_success_total" in m
    info = httpx.get(server.base_url + "/server_info").json()
    assert info["stats"]["num_running"] == 0


def test_bad_request(server):
    r = httpx.post(server.base_url + "/v1/chat/completions", json={
        "messages": [{"role": "user", "content": "x"}],
        "temperature": -1,
    }, timeout=30)
    assert r.status_code == 400


def test_embeddings_route(server):
    r = httpx.post(server.base_url + "/v1/embeddings",
                   json={"input": "hello world"}, timeout=120)
    assert r.status_code == 200, r.text
    body = r.json()
    assert body["object"] == "list"
    assert len(body["data"]) == 1
    emb = body["data"][0]["embedding"]
    assert len(emb) == 64  # hidden size of the tiny model


def test_serviceinfo_and_load(server):
    info = httpx.get(server.base_url + "/.well-known/serviceinfo").json()
    assert info["software"]["name"] == "aphrodite-tpu"
    assert "openai" in info["api"]
    load = httpx.get(server.base_url + "/load").json()
    assert load["server_load"] >= 0


def test_invocations_dispatch(server):
    r = httpx.post(server.base_url + "/invocations",
                   json={"prompt": "hello", "max_tokens": 4,
                         "temperature": 0.0}, timeout=60)
    assert r.status_code == 200 and r.json()["object"] == "text_completion"
    r = httpx.post(server.base_url + "/invocations",
                   json={"messages": [{"role": "user", "content": "hi"}],
                         "max_tokens": 4}, timeout=60)
    assert r.status_code == 200 and r.json()["object"] == "chat.completion"
    r = httpx.post(server.base_url + "/invocations", json={"x": 1},
                   timeout=30)
    assert r.status_code == 400


def test_pooling_route(server):
    # decoder models pool hidden states too (reference --task embed).
    r = httpx.post(server.base_url + "/pooling",
                   json={"input": "hello"}, timeout=60)
    assert r.status_code == 200
    data = r.json()["data"]
    assert data and isinstance(data[0]["data"], list)
