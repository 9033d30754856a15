"""Benchmark harnesses: latency / throughput / serve.

Parity: aphrodite/benchmarks/{latency,throughput,serve}.py + the CLI
`aphrodite bench ...` (endpoints/cli/benchmark/). Metric definitions follow
the reference serve harness (serve.py:52-59):

  TTFT  — time to first token
  TPOT  — (E2E - TTFT) / (output_tokens - 1), per request
  ITL   — inter-token latency, per token-step observation
  E2EL  — end-to-end request latency

each reported as mean/median/std/p90/p95/p99; plus request & token
throughput. The serve harness drives the in-process AsyncLLM with Poisson
arrivals (rate=inf -> all at once).
"""
from __future__ import annotations

import asyncio
import json
import time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np


def percentile_block(name: str, xs: list[float], unit="ms", scale=1e3
                     ) -> dict:
    if not xs:
        # Keys are part of the serve-metrics contract (reference
        # benchmarks/serve.py emits them unconditionally); fused decode
        # windows can deliver a whole request in one delta, leaving zero
        # inter-token samples.
        xs = [0.0]
    a = np.asarray(xs) * scale
    return {
        f"mean_{name}_{unit}": float(np.mean(a)),
        f"median_{name}_{unit}": float(np.median(a)),
        f"std_{name}_{unit}": float(np.std(a)),
        f"p90_{name}_{unit}": float(np.percentile(a, 90)),
        f"p95_{name}_{unit}": float(np.percentile(a, 95)),
        f"p99_{name}_{unit}": float(np.percentile(a, 99)),
    }


def make_prompts(num: int, input_len: int, vocab: int, seed: int = 0
                 ) -> list[list[int]]:
    rng = np.random.RandomState(seed)
    return [rng.randint(10, max(vocab - 10, 11),
                        size=input_len).tolist() for _ in range(num)]


# --------------------------------------------------------------------------- #
def bench_latency(llm, input_len=32, output_len=128, batch_size=1,
                  num_iters=5, warmup=1) -> dict:
    """Offline batch latency (reference benchmarks/latency.py)."""
    from aphrodite_tpu.sampling_params import SamplingParams
    vocab = llm.engine.core.worker.model.vocab_size
    prompts = make_prompts(batch_size, input_len, vocab)
    params = SamplingParams(temperature=0.0, max_tokens=output_len,
                            ignore_eos=True)
    for _ in range(warmup):
        llm.generate(prompts, params)
    lats = []
    for _ in range(num_iters):
        t0 = time.perf_counter()
        llm.generate(prompts, params)
        lats.append(time.perf_counter() - t0)
    return {
        "avg_latency_s": float(np.mean(lats)),
        **percentile_block("latency", lats, unit="s", scale=1.0),
    }


def bench_throughput(llm, num_prompts=64, input_len=128, output_len=128
                     ) -> dict:
    """Offline throughput (reference benchmarks/throughput.py)."""
    from aphrodite_tpu.sampling_params import SamplingParams
    vocab = llm.engine.core.worker.model.vocab_size
    prompts = make_prompts(num_prompts, input_len, vocab)
    params = SamplingParams(temperature=0.0, max_tokens=output_len,
                            ignore_eos=True)
    llm.generate(prompts[:4], params)  # warmup/compile
    t0 = time.perf_counter()
    outs = llm.generate(prompts, params)
    dt = time.perf_counter() - t0
    n_out = sum(len(o.outputs[0].token_ids) for o in outs)
    n_in = num_prompts * input_len
    return {
        "elapsed_s": dt,
        "requests_per_s": num_prompts / dt,
        "total_tokens_per_s": (n_in + n_out) / dt,
        "output_tokens_per_s": n_out / dt,
    }


# --------------------------------------------------------------------------- #
@dataclass
class _ReqResult:
    ttft: Optional[float] = None
    e2el: Optional[float] = None
    itls: list[float] = field(default_factory=list)
    n_out: int = 0


async def _drive_one(async_llm, prompt, params, rid, res: _ReqResult):
    t0 = time.perf_counter()
    last = None
    async for out in async_llm.generate(prompt, params, rid):
        now = time.perf_counter()
        n_new = sum(len(c.token_ids) for c in out.outputs)
        if n_new:
            if res.ttft is None:
                res.ttft = now - t0
            elif last is not None:
                res.itls.append((now - last) / n_new)
            last = now
            res.n_out += n_new
    res.e2el = time.perf_counter() - t0


async def bench_serve_async(async_llm, num_prompts=32, input_len=128,
                            output_len=64, request_rate=float("inf"),
                            seed=0) -> dict:
    """Online serving benchmark with Poisson arrivals
    (reference benchmarks/serve.py)."""
    from aphrodite_tpu.sampling_params import SamplingParams
    vocab = async_llm.engine.core.worker.model.vocab_size
    prompts = make_prompts(num_prompts, input_len, vocab, seed)
    params = SamplingParams(temperature=0.0, max_tokens=output_len,
                            ignore_eos=True)
    rng = np.random.RandomState(seed)
    results = [_ReqResult() for _ in prompts]
    tasks = []
    t_start = time.perf_counter()
    for i, p in enumerate(prompts):
        tasks.append(asyncio.create_task(
            _drive_one(async_llm, p, params, f"bench-{i}", results[i])))
        if request_rate != float("inf"):
            await asyncio.sleep(rng.exponential(1.0 / request_rate))
    await asyncio.gather(*tasks)
    wall = time.perf_counter() - t_start

    ttfts = [r.ttft for r in results if r.ttft is not None]
    e2els = [r.e2el for r in results if r.e2el is not None]
    tpots = [(r.e2el - r.ttft) / (r.n_out - 1)
             for r in results if r.n_out > 1]
    itls = [x for r in results for x in r.itls]
    n_out = sum(r.n_out for r in results)
    return {
        "completed": len(e2els),
        "duration_s": wall,
        "request_throughput": len(e2els) / wall,
        "output_token_throughput": n_out / wall,
        "total_token_throughput": (n_out + num_prompts * input_len) / wall,
        **percentile_block("ttft", ttfts),
        **percentile_block("tpot", tpots),
        **percentile_block("itl", itls),
        **percentile_block("e2el", e2els, unit="ms"),
    }
