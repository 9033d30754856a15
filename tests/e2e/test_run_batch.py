"""OpenAI batch-file runner (reference run_batch.py format): chat +
completion lines, bad lines isolated, order preserved."""
import json
import subprocess
import sys

import pytest

from tests.utils import build_tiny_tokenizer, save_tiny_hf_checkpoint, \
    tiny_llama_hf_config


def test_run_batch(tmp_path):
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    save_tiny_hf_checkpoint(ckpt, tiny_llama_hf_config())
    build_tiny_tokenizer(ckpt)
    lines = [
        {"custom_id": "a", "method": "POST", "url": "/v1/chat/completions",
         "body": {"messages": [{"role": "user", "content": "hello"}],
                  "max_tokens": 4, "temperature": 0.0}},
        {"custom_id": "b", "method": "POST", "url": "/v1/completions",
         "body": {"prompt": "the quick", "max_tokens": 4,
                  "temperature": 0.0}},
        {"custom_id": "c", "method": "GET", "url": "/nope", "body": {}},
    ]
    inp = tmp_path / "in.jsonl"
    outp = tmp_path / "out.jsonl"
    inp.write_text("\n".join(json.dumps(x) for x in lines))
    r = subprocess.run(
        [sys.executable, "-m", "aphrodite_tpu.cli", "run-batch",
         str(ckpt), "--device", "cpu", "--dtype", "float32",
         "--num-kv-blocks", "64", "--max-model-len", "128",
         "-i", str(inp), "-o", str(outp)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    got = [json.loads(x) for x in outp.read_text().splitlines()]
    assert [g["custom_id"] for g in got] == ["a", "b", "c"]
    assert got[0]["response"]["status_code"] == 200
    assert got[0]["response"]["body"]["choices"][0]["message"]["content"]
    assert got[1]["response"]["status_code"] == 200
    assert got[1]["response"]["body"]["choices"][0]["text"]
    assert got[2]["error"] is not None
