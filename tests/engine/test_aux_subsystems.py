"""Aux subsystems: request tracing, plugin loading, usage reporting,
sharded-state save/reload (SURVEY.md §2.9/§5)."""
import json
import os

import numpy as np
import pytest

from aphrodite_tpu.sampling_params import SamplingParams
from tests.utils import save_tiny_hf_checkpoint, tiny_llama_hf_config

SP = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
KW = dict(dtype="float32", block_size=16, num_kv_blocks=64,
          max_num_batched_tokens=64, max_num_seqs=4, max_model_len=256,
          tokenizer="unused", device="cpu")


@pytest.fixture()
def ckpt(tmp_path):
    save_tiny_hf_checkpoint(tmp_path, tiny_llama_hf_config())
    return tmp_path


def test_request_tracing_memory_exporter(ckpt):
    from aphrodite_tpu.entrypoints.llm import LLM
    from aphrodite_tpu.tracing import SpanAttributes as A
    llm = LLM(model=str(ckpt), otlp_traces_endpoint="memory", **KW)
    llm.generate([[1, 5, 9]], SP)
    spans = llm.engine.core.stats.tracer.memory.spans()
    assert len(spans) == 1
    at = spans[0].attributes
    assert at[A.GEN_AI_USAGE_PROMPT_TOKENS] == 3
    assert at[A.GEN_AI_USAGE_COMPLETION_TOKENS] == 6
    assert at[A.GEN_AI_LATENCY_E2E] > 0
    assert at[A.GEN_AI_LATENCY_TIME_TO_FIRST_TOKEN] > 0


def test_plugin_loading(monkeypatch):
    calls = []

    class EP:
        name = "demo"

        @staticmethod
        def load():
            def plug():
                calls.append(1)
                from aphrodite_tpu.models.registry import register_model
                register_model("MyOOTArch", object)
            return plug

    import aphrodite_tpu.plugins as P
    monkeypatch.setattr("importlib.metadata.entry_points",
                        lambda group=None: [EP] if group == P.PLUGIN_GROUP
                        else [])
    loaded = P.load_general_plugins(force=True)
    assert loaded == ["demo"] and calls == [1]
    from aphrodite_tpu.models.registry import supported_architectures
    assert "MyOOTArch" in supported_architectures()
    # filter honored
    monkeypatch.setenv("APHRODITE_TPU_PLUGINS", "other")
    assert P.load_general_plugins(force=True) == []


def test_usage_reporting(ckpt, tmp_path, monkeypatch):
    import aphrodite_tpu.usage as U
    stats_dir = tmp_path / "cfg"
    monkeypatch.setattr(U, "_DIR", str(stats_dir))
    U.report_usage("LlamaForCausalLM", "TEST", {"tp": 1})
    import time
    # the reporter thread creates then writes the file: wait for CONTENT,
    # not existence (empty-file window shows under load)
    for _ in range(200):
        f = stats_dir / "usage_stats.json"
        if f.exists() and f.read_text().strip():
            break
        time.sleep(0.05)
    rec = json.loads((stats_dir / "usage_stats.json").read_text()
                     .splitlines()[0])
    assert rec["model_architecture"] == "LlamaForCausalLM"
    assert rec["context"] == "TEST"
    # opt-out
    monkeypatch.setenv("DO_NOT_TRACK", "1")
    assert not U.usage_stats_enabled()


def test_sharded_state_roundtrip(ckpt, tmp_path):
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(ckpt), quantization="w8a16", **KW)
    base = [o.outputs[0].token_ids
            for o in llm.generate([[1, 5, 9, 20], [7, 8, 9]], SP)]
    out_dir = tmp_path / "sharded"
    llm.save_sharded_state(str(out_dir))
    del llm
    llm2 = LLM(model=str(out_dir), load_format="sharded_state",
               quantization="w8a16", **KW)
    again = [o.outputs[0].token_ids
             for o in llm2.generate([[1, 5, 9, 20], [7, 8, 9]], SP)]
    assert base == again
