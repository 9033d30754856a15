"""SSM (Mamba) serving performance on the real chip (VERDICT r3 weak #5):
is the pure-XLA associative_scan within shouting distance of roofline, or
does it need a Pallas chunked-scan kernel?

Workload: Mamba-2.8B-class geometry (d_model 2560, 64 layers, expand 2,
d_state 16), 8 x (512 prefill + 64 decode), greedy, dummy bf16 weights.
Rooflines: prefill is GEMM-dominated (in/x/out projections ~= 6 *
d_model^2 * expand FLOPs/token) and the scan adds elementwise work;
decode is weight-stream-bound like attention models (~2 bytes/param).
Reference carries 1,801 LoC of CUDA kernels for this
(kernels/mamba/selective_scan/); the question is what the XLA scan
achieves without any.

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/ssm_bench.py
Writes benchmarks/ssm_bench.json.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

D, LAYERS, EXPAND, STATE, VOCAB = 2560, 64, 2, 16, 50280
N_REQ, PREFILL, DECODE = 8, 512, 64


def _config():
    from transformers import MambaConfig
    return MambaConfig(
        vocab_size=VOCAB, hidden_size=D, num_hidden_layers=LAYERS,
        state_size=STATE, expand=EXPAND, conv_kernel=4,
        architectures=["MambaForCausalLM"])


def main():
    from aphrodite_tpu.entrypoints.llm import LLM
    from aphrodite_tpu.sampling_params import SamplingParams

    t0 = time.time()
    llm = LLM(model="ssm-bench", hf_config=_config(), tokenizer="unused",
              dtype="bfloat16", load_format="dummy", block_size=64,
              num_kv_blocks=64, max_num_seqs=N_REQ,
              max_num_batched_tokens=4096,
              max_model_len=PREFILL + DECODE + 64)
    print(f"# engine init {time.time()-t0:.1f}s", file=sys.stderr,
          flush=True)

    rng = np.random.RandomState(0)
    prompts = [rng.randint(10, VOCAB - 10, size=PREFILL).tolist()
               for _ in range(N_REQ)]
    params = SamplingParams(temperature=0.0, max_tokens=DECODE,
                            ignore_eos=True)
    t = time.perf_counter()
    llm.generate(prompts, params)
    print(f"# warmup {time.perf_counter()-t:.1f}s", file=sys.stderr,
          flush=True)

    times = []
    for _ in range(3):
        t = time.perf_counter()
        llm.generate(prompts, params)
        times.append(time.perf_counter() - t)
    dt = min(times)

    # separate prefill-only and decode-heavy runs to split the phases
    p_only = SamplingParams(temperature=0.0, max_tokens=1, ignore_eos=True)
    llm.generate(prompts, p_only)
    t = time.perf_counter()
    llm.generate(prompts, p_only)
    dt_prefill = time.perf_counter() - t
    dt_decode = max(dt - dt_prefill, 1e-9)

    n_pre = N_REQ * PREFILL
    n_dec = N_REQ * DECODE
    # params (non-embedding) for the stream roofline
    d_in = D * EXPAND
    per_layer = (D * 2 * d_in          # in_proj (x and z)
                 + d_in * D            # out_proj
                 + d_in * 4            # conv
                 + d_in * (STATE * 2)  # B/C projections (x_proj)
                 + d_in * STATE)       # A
    n_params = per_layer * LAYERS + 2 * VOCAB * D
    stream_roofline_tok_s = 380e9 / (n_params * 2) * N_REQ  # bf16, bs=8

    out = {
        "config": f"Mamba-2.8B-class d={D} L={LAYERS} expand={EXPAND} "
                  f"state={STATE}, {N_REQ}x({PREFILL}+{DECODE}) greedy",
        "seconds_per_run": round(dt, 3),
        "prefill_s": round(dt_prefill, 3),
        "prefill_tok_per_s": round(n_pre / dt_prefill, 1),
        "decode_s": round(dt_decode, 3),
        "decode_tok_per_s": round(n_dec / dt_decode, 1),
        "approx_params_B": round(n_params / 1e9, 2),
        "decode_weight_stream_roofline_tok_per_s_at_380GBps": round(
            stream_roofline_tok_s, 1),
        "decode_pct_of_stream_roofline": round(
            100 * (n_dec / dt_decode) / stream_roofline_tok_s, 1),
    }
    print(json.dumps(out, indent=1))
    with open("benchmarks/ssm_bench.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote benchmarks/ssm_bench.json")


if __name__ == "__main__":
    main()
