"""BASELINE north-star latency metrics at 8B: p50 TTFT + ITL through the
online serving path (AsyncLLM + Poisson arrivals), Llama-3.1-8B-class
W4A16 on one chip — the half of the north-star that
baseline_results.json's offline throughput numbers do not cover.

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/serve_8b.py
Writes benchmarks/serve_8b.json.
"""
from __future__ import annotations

import asyncio
import json
import sys
import time


def _llama8b_config():
    from transformers import LlamaConfig
    return LlamaConfig(
        vocab_size=128256, hidden_size=4096, num_hidden_layers=32,
        num_attention_heads=32, num_key_value_heads=8,
        intermediate_size=14336, max_position_embeddings=8192,
        rope_theta=500000.0, architectures=["LlamaForCausalLM"])


def main():
    from aphrodite_tpu.benchmarks.harness import bench_serve_async
    from aphrodite_tpu.engine.async_llm import AsyncLLM
    from aphrodite_tpu.entrypoints.llm import build_engine_config

    t0 = time.time()
    # config-2-matched shapes: the XLA cache from the throughput runs
    # stays warm and the serving buckets are the precompile set
    config = build_engine_config(
        "serve8b-w4a16", hf_config=_llama8b_config(), tokenizer="unused",
        dtype="bfloat16", load_format="dummy", quantization="gptq",
        block_size=64, max_num_seqs=32, max_num_batched_tokens=16384,
        max_model_len=704,
        # Streaming-appropriate decode granularity: the offline default
        # (64-step fused windows) delivers whole requests in one realize,
        # making TTFT == E2EL. 8-step windows bound token delivery at
        # 8-token granularity while still amortizing the tunnel RPC.
        multi_step_decode=8)
    engine = AsyncLLM(config)
    print(f"# engine built {time.time()-t0:.1f}s", file=sys.stderr,
          flush=True)
    t0 = time.time()
    engine.worker_call("precompile")
    print(f"# precompile {time.time()-t0:.1f}s", file=sys.stderr,
          flush=True)

    async def run():
        # warmup (compiles the serving buckets)
        await bench_serve_async(engine, num_prompts=8, input_len=512,
                                output_len=16)
        results = {}
        for rate, tag in ((float("inf"), "burst"), (8.0, "poisson_8rps"),
                          (2.0, "poisson_2rps")):
            r = await bench_serve_async(engine, num_prompts=32,
                                        input_len=512, output_len=64,
                                        request_rate=rate)
            results[tag] = {k: round(v, 2) for k, v in r.items()}
            print(f"{tag}: p50 TTFT {r['median_ttft_ms']:.0f} ms, "
                  f"p50 ITL {r['median_itl_ms']:.1f} ms, "
                  f"p99 TTFT {r['p99_ttft_ms']:.0f} ms, "
                  f"out tok/s {r['output_token_throughput']:.0f}",
                  flush=True)
        return results

    results = asyncio.get_event_loop().run_until_complete(run())
    out = {
        "config": "Llama-3.1-8B-class W4A16 (int4 resident), 1 v5e chip, "
                  "32 x (512 prompt + 64 decode), online AsyncLLM serving",
        "results": results,
    }
    with open("benchmarks/serve_8b.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote benchmarks/serve_8b.json")


if __name__ == "__main__":
    main()
