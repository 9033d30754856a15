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

``--jamba`` instead runs a hybrid attention+Mamba+MoE geometry
(Jamba-style layer interleave, scaled to fit one chip) and writes
benchmarks/ssm_bench_jamba.json — the hybrid path mixes paged-KV
attention layers with recurrent-state layers in the same step
(models/hetero.py), which neither the pure-Mamba row nor the attention
benches cover (VERDICT r4 weak #9).
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


def main_jamba():
    """Hybrid Jamba-style geometry: 16 layers, attention every 8th
    (period 8 / offset 4), MoE every other layer (8 experts, top-2),
    Mamba mixers elsewhere — ~2.1B params, one chip."""
    from aphrodite_tpu.entrypoints.llm import LLM
    from aphrodite_tpu.sampling_params import SamplingParams
    from transformers import JambaConfig

    D_J, L_J = 2048, 16
    cfg = JambaConfig(
        vocab_size=VOCAB, hidden_size=D_J, num_hidden_layers=L_J,
        num_attention_heads=16, num_key_value_heads=4,
        intermediate_size=4096, mamba_expand=2, mamba_d_state=16,
        mamba_d_conv=4, mamba_dt_rank=128,
        attn_layer_period=8, attn_layer_offset=4,
        expert_layer_period=2, expert_layer_offset=1,
        num_experts=8, num_experts_per_tok=2,
        max_position_embeddings=4096, tie_word_embeddings=False,
        use_mamba_kernels=False,
        architectures=["JambaForCausalLM"])

    t0 = time.time()
    llm = LLM(model="jamba-bench", hf_config=cfg, tokenizer="unused",
              dtype="bfloat16", load_format="dummy", block_size=64,
              num_kv_blocks=256, max_num_seqs=N_REQ,
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
    p_only = SamplingParams(temperature=0.0, max_tokens=1, ignore_eos=True)
    llm.generate(prompts, p_only)
    t = time.perf_counter()
    llm.generate(prompts, p_only)
    dt_prefill = time.perf_counter() - t
    dt_decode = max(dt - dt_prefill, 1e-9)

    d_in = D_J * 2
    mamba_layer = (D_J * 2 * d_in + d_in * D_J + d_in * 4
                   + d_in * (128 + 2 * 16) + 128 * d_in + d_in * 16)
    attn_layer = D_J * D_J + 2 * D_J * (D_J // 4) + D_J * D_J
    moe_ffn = 3 * D_J * 4096
    n_attn = L_J // 8
    n_moe = L_J // 2
    n_params = ((L_J - n_attn) * mamba_layer + n_attn * attn_layer
                + n_moe * 8 * moe_ffn + (L_J - n_moe) * moe_ffn
                + 2 * VOCAB * D_J)
    # Decode streams ALL mamba/attn weights but only top-2 of 8 experts
    # per token; with bs=8 routed tokens likely touch most experts, so
    # report the conservative all-weights roofline alongside.
    stream_tok_s = 380e9 / (n_params * 2) * N_REQ

    n_dec = N_REQ * DECODE
    out = {
        "config": f"Jamba-style hybrid d={D_J} L={L_J} (attn x{n_attn}, "
                  f"MoE x{n_moe} of 8 experts top-2), "
                  f"{N_REQ}x({PREFILL}+{DECODE}) greedy",
        "seconds_per_run": round(dt, 3),
        "prefill_s": round(dt_prefill, 3),
        "prefill_tok_per_s": round(N_REQ * PREFILL / dt_prefill, 1),
        "decode_s": round(dt_decode, 3),
        "decode_tok_per_s": round(n_dec / dt_decode, 1),
        "approx_params_B": round(n_params / 1e9, 2),
        "decode_all_weights_stream_roofline_tok_per_s": round(
            stream_tok_s, 1),
        "decode_pct_of_stream_roofline": round(
            100 * (n_dec / dt_decode) / stream_tok_s, 1),
    }
    print(json.dumps(out, indent=1))
    with open("benchmarks/ssm_bench_jamba.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote benchmarks/ssm_bench_jamba.json")


if __name__ == "__main__":
    if "--jamba" in sys.argv:
        main_jamba()
    else:
        main()
