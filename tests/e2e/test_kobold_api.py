"""KoboldAI legacy API (reference: endpoints/kobold/api_server.py):
generate, tokencount, version/model/config routes against a live server."""
import pytest

from tests.utils import (RemoteOpenAIServer, build_tiny_tokenizer,
                         save_tiny_hf_checkpoint, tiny_llama_hf_config)


@pytest.fixture(scope="module")
def srv(tmp_path_factory):
    d = tmp_path_factory.mktemp("kobold_ckpt")
    save_tiny_hf_checkpoint(d, tiny_llama_hf_config())
    build_tiny_tokenizer(d)
    with RemoteOpenAIServer(str(d),
                            extra_args=("--launch-kobold-api",)) as s:
        yield s


def test_kobold_generate(srv):
    import httpx
    r = httpx.post(srv.base_url + "/api/v1/generate",
                   json={"prompt": "the quick brown",
                         "max_length": 8, "temperature": 0.0,
                         "max_context_length": 128}, timeout=120)
    assert r.status_code == 200, r.text
    res = r.json()["results"]
    assert len(res) == 1 and isinstance(res[0]["text"], str)

    r2 = httpx.post(srv.base_url + "/api/extra/tokencount",
                    json={"prompt": "hello world"}, timeout=30)
    assert r2.status_code == 200 and r2.json()["value"] >= 1

    for route, key in [("/api/v1/info/version", "result"),
                       ("/api/v1/model", "result"),
                       ("/api/v1/config/max_context_length", "value"),
                       ("/api/v1/config/max_length", "value"),
                       ("/api/extra/version", "result"),
                       ("/api/v1/config/soft_prompts_list", "values")]:
        resp = httpx.get(srv.base_url + route, timeout=30)
        assert resp.status_code == 200 and key in resp.json(), route


def test_kobold_stream(srv):
    import httpx
    with httpx.stream("POST", srv.base_url + "/api/extra/generate/stream",
                      json={"prompt": "hello", "max_length": 4,
                            "temperature": 0.0}, timeout=120) as r:
        assert r.status_code == 200
        body = "".join(r.iter_text())
    assert "event: message" in body
