"""Benchmark harnesses produce sane metrics on the tiny model."""
import asyncio

import pytest

from tests.utils import save_tiny_hf_checkpoint, tiny_llama_hf_config


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_bench")
    save_tiny_hf_checkpoint(d, tiny_llama_hf_config())
    return d


def test_latency_and_throughput(ckpt):
    from aphrodite_tpu.benchmarks.harness import (bench_latency,
                                                  bench_throughput)
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(ckpt), dtype="float32", block_size=16,
              num_kv_blocks=256, max_num_batched_tokens=128, max_num_seqs=8,
              max_model_len=256, tokenizer="unused")
    lat = bench_latency(llm, input_len=8, output_len=8, batch_size=2,
                        num_iters=2, warmup=1)
    assert lat["avg_latency_s"] > 0
    thr = bench_throughput(llm, num_prompts=6, input_len=8, output_len=8)
    assert thr["output_tokens_per_s"] > 0
    assert thr["requests_per_s"] > 0


def test_serve_bench(ckpt):
    from aphrodite_tpu.benchmarks.harness import bench_serve_async
    from aphrodite_tpu.engine.async_llm import AsyncLLM
    from aphrodite_tpu.entrypoints.llm import build_engine_config
    cfg = build_engine_config(str(ckpt), dtype="float32", block_size=16,
                              num_kv_blocks=256, max_num_batched_tokens=128,
                              max_num_seqs=8, max_model_len=256,
                              tokenizer="unused")
    engine = AsyncLLM(cfg)

    async def run():
        return await bench_serve_async(engine, num_prompts=6, input_len=8,
                                       output_len=8, request_rate=50.0)

    res = asyncio.run(run())
    assert res["completed"] == 6
    assert res["mean_ttft_ms"] > 0
    assert res["output_token_throughput"] > 0
    assert "p99_itl_ms" in res
