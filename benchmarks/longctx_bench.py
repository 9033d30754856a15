"""Long-context serving bench on the real chip: full engine path.

Complements benchmarks/decode_attn_roofline.py (kernel-only): runs the
whole serving stack — scheduler, paged cache, fused prefill+window decode —
at a 3.5k-token context, the regime where decode attention reads dominate.

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/longctx_bench.py
Writes benchmarks/longctx_bench.json.
"""
import json
import sys
import time

import numpy as np

NUM_PROMPTS = 8
PREFIX_LEN = 3500
DECODE_LEN = 100


def main():
    from bench import qwen25_1p5b_config
    from aphrodite_tpu.entrypoints.llm import LLM
    from aphrodite_tpu.sampling_params import SamplingParams

    llm = LLM(model="bench-dummy", hf_config=qwen25_1p5b_config(),
              tokenizer="unused", dtype="bfloat16", load_format="dummy",
              block_size=64, max_num_batched_tokens=16384,
              max_num_seqs=NUM_PROMPTS, max_model_len=4096)

    rng = np.random.RandomState(0)
    prompts = [rng.randint(10, 1000, size=PREFIX_LEN).tolist()
               for _ in range(NUM_PROMPTS)]
    params = SamplingParams(temperature=0.0, max_tokens=DECODE_LEN,
                            ignore_eos=True)

    def one_run():
        t = time.perf_counter()
        outs = llm.generate(prompts, params)
        dt = time.perf_counter() - t
        n = sum(len(o.outputs[0].token_ids) for o in outs)
        assert n == NUM_PROMPTS * DECODE_LEN, n
        return dt

    for i in range(2):  # 2 warmups: run 0 can hit residual bucket compiles
        print(f"# warmup {i}: {one_run():.2f}s", file=sys.stderr)
    times = [one_run() for _ in range(3)]
    value = float(np.median(times))
    dec_tps = NUM_PROMPTS * DECODE_LEN / value
    print(f"# runs: {[round(t, 2) for t in times]}; "
          f"decode tokens/s: {dec_tps:.0f}", file=sys.stderr)
    out = {"metric": (f"long-context serving: {NUM_PROMPTS}x({PREFIX_LEN} "
                      f"prefill + {DECODE_LEN} decode), 1 chip"),
           "seconds_per_run": round(value, 3),
           "decode_tokens_per_s": round(dec_tps, 1)}
    print(json.dumps(out))
    with open("benchmarks/longctx_bench.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
