"""Benchmark: the reference's TPU CI workload on one chip.

Workload (mirrors /root/reference/tests/v1/tpu/test_perf.py:54-71):
Qwen2.5-1.5B-class model, 64 prompts x (500-token prefix + 50-token decode),
max_num_seqs=32, greedy. Reference committed threshold: 1.4 s +/- 0.3 per run
on TPU v5e ("v5lite"), 1.7 s +/- 0.2 on v6e. Weights are randomly
initialized (dummy load) — identical compute/memory behavior to real weights.

Prints ONE JSON line:
  {"metric": ..., "value": seconds_per_run, "unit": "s",
   "vs_baseline": baseline_s / value  (>1 == faster than reference)}
"""
import argparse
import json
import sys
import time

import numpy as np

V5E_BASELINE_S = 1.4  # reference tests/v1/tpu/test_perf.py:60-63 (v5lite)

NUM_PROMPTS = 64
PREFIX_LEN = 500
DECODE_LEN = 50
MAX_NUM_SEQS = 32


def qwen25_1p5b_config():
    from transformers import Qwen2Config
    return Qwen2Config(
        vocab_size=151936, hidden_size=1536, num_hidden_layers=28,
        num_attention_heads=12, num_key_value_heads=2,
        intermediate_size=8960, max_position_embeddings=4096,
        rope_theta=1000000.0, rms_norm_eps=1e-6, tie_word_embeddings=True,
        architectures=["Qwen2ForCausalLM"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--quick", action="store_true",
                    help="tiny model + workload (CI sanity)")
    # Through a tunneled chip every dispatch costs ~25 ms of RPC overhead:
    # fewer, fatter prefill steps win (device time is FLOPs-bound either way).
    ap.add_argument("--max-num-batched-tokens", type=int, default=16384)
    args = ap.parse_args()

    from aphrodite_tpu.entrypoints.llm import LLM
    from aphrodite_tpu.sampling_params import SamplingParams

    if args.quick:
        from transformers import LlamaConfig
        hf_config = LlamaConfig(
            vocab_size=2048, hidden_size=512, num_hidden_layers=4,
            num_attention_heads=8, num_key_value_heads=2,
            intermediate_size=1024, max_position_embeddings=1024,
            architectures=["LlamaForCausalLM"])
        num_prompts, prefix_len, decode_len = 8, 100, 16
    else:
        hf_config = qwen25_1p5b_config()
        num_prompts, prefix_len, decode_len = (NUM_PROMPTS, PREFIX_LEN,
                                               DECODE_LEN)

    t0 = time.time()
    llm = LLM(model="bench-dummy", hf_config=hf_config, tokenizer="unused",
              dtype="bfloat16", load_format="dummy", block_size=64,
              max_num_batched_tokens=args.max_num_batched_tokens,
              max_num_seqs=MAX_NUM_SEQS,
              max_model_len=prefix_len + decode_len + 64)
    print(f"# engine init {time.time()-t0:.1f}s", file=sys.stderr)

    rng = np.random.RandomState(0)
    prompts = [rng.randint(10, 1000, size=prefix_len).tolist()
               for _ in range(num_prompts)]
    params = SamplingParams(temperature=0.0, max_tokens=decode_len,
                            ignore_eos=True)

    def one_run():
        t = time.perf_counter()
        outs = llm.generate(prompts, params)
        dt = time.perf_counter() - t
        n_tokens = sum(len(o.outputs[0].token_ids) for o in outs)
        assert n_tokens == num_prompts * decode_len, n_tokens
        return dt

    for i in range(args.warmup):
        dt = one_run()
        print(f"# warmup {i}: {dt:.2f}s", file=sys.stderr)
    times = []
    for i in range(args.runs):
        dt = one_run()
        times.append(dt)
        print(f"# run {i}: {dt:.2f}s", file=sys.stderr)

    value = float(np.mean(times))
    total_tokens = num_prompts * (prefix_len + decode_len)
    print(f"# tokens/s (prefill+decode): {total_tokens/value:.0f}; "
          f"decode tokens/s: {num_prompts*decode_len/value:.0f}",
          file=sys.stderr)
    print(json.dumps({
        "metric": ("avg seconds per run: Qwen2.5-1.5B-class, 64x(500 prefill "
                   "+ 50 decode), bs<=32, greedy, 1 chip "
                   "(reference tests/v1/tpu/test_perf.py workload; "
                   "vs_baseline = 1.4s v5e reference / ours, >1 = faster)"),
        "value": round(value, 3),
        "unit": "s",
        "vs_baseline": round(V5E_BASELINE_S / value, 3),
    }))


if __name__ == "__main__":
    main()
