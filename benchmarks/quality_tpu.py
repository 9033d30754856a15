"""On-chip numerical parity artifact (VERDICT r3 'weak #3' / BASELINE.md
quality-parity demand): run the SAME model + weights + prompts on the CPU
oracle path (interpret-mode Pallas) and on the real TPU (compiled Mosaic,
int4/fp8 device formats), and record greedy token agreement plus the
teacher-forced NLL delta through the serving forward.

Configs: bf16, W4A16 (gptq on-the-fly), FP8 weights + FP8-E4M3 KV.
Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/quality_tpu.py
Writes benchmarks/quality_tpu.json.
"""
from __future__ import annotations

import json
import math
import sys

import numpy as np

# Small but int4-path-aligned geometry: K/2 divisible by 8*group for every
# projection so the TPU resident format (loader.realize_int4_leaves)
# engages, like the 8B config would.
H, HEADS, KVH, HD, I, V, L = 2048, 16, 8, 128, 4096, 8192, 4

N_PROMPTS = 8
PROMPT_LEN = 64
DECODE_LEN = 32


def _config():
    from transformers import LlamaConfig
    return LlamaConfig(
        vocab_size=V, hidden_size=H, num_hidden_layers=L,
        num_attention_heads=HEADS, num_key_value_heads=KVH,
        intermediate_size=I, max_position_embeddings=2048,
        architectures=["LlamaForCausalLM"])


def run_backend(device: str, quant: str):
    import os

    import jax
    from aphrodite_tpu.entrypoints.llm import LLM
    from aphrodite_tpu.sampling_params import SamplingParams

    # CPU oracle path lowers Pallas in interpret mode; the TPU phase must
    # compile real Mosaic (each engine retraces, so flipping is safe).
    os.environ["APHRODITE_PALLAS_INTERPRET"] = \
        "1" if device == "cpu" else "0"

    kwargs = dict(model=f"quality-{quant}", hf_config=_config(),
                  tokenizer="unused", dtype="bfloat16",
                  load_format="dummy", seed=0, block_size=64,
                  num_kv_blocks=128, max_num_seqs=N_PROMPTS,
                  max_num_batched_tokens=2048, max_model_len=256,
                  device=device)
    if quant == "w4a16":
        kwargs["quantization"] = "gptq"
    elif quant == "fp8":
        kwargs.update(quantization="fp8", kv_cache_dtype="fp8_e4m3")
    llm = LLM(**kwargs)

    rng = np.random.RandomState(0)
    seqs = [rng.randint(10, V - 10, size=PROMPT_LEN + DECODE_LEN).tolist()
            for _ in range(N_PROMPTS)]
    # Teacher-forced: every position scored on an IDENTICAL context on
    # both backends (free-running greedy diverges at the first argmax
    # tie-flip, after which token comparisons are meaningless).
    params = SamplingParams(temperature=0.0, max_tokens=1,
                            prompt_logprobs=2, ignore_eos=True,
                            detokenize=False)
    outs = llm.generate(seqs, params)
    recs = []
    for o, seq in zip(outs, seqs):
        rows = []
        for i, d in enumerate(o.prompt_logprobs):
            if d is None:
                continue
            pairs = sorted(((int(t), float(_lp_val(v)))
                            for t, v in d.items()), key=lambda kv: -kv[1])
            gold = seq[i]
            gold_lp = dict(pairs).get(gold)
            rows.append({"top": pairs[:2], "gold": gold,
                         "gold_lp": gold_lp})
        recs.append(rows)
    ppl = llm.evaluate_perplexity(seqs[:4])
    del llm
    return recs, ppl


def _lp_val(v):
    return getattr(v, "logprob", v)


def _phase_main(device: str, quant: str):
    """Subprocess entry: one (device, quant) phase per process — the CPU
    engine flips jax_platforms globally and would poison a TPU engine in
    the same process."""
    recs, ppl = run_backend(device, quant)
    print("PHASE_RESULT " + json.dumps(
        {"recs": recs, "ppl": ppl}), flush=True)


def _run_phase(device: str, quant: str):
    import subprocess
    env = dict(__import__("os").environ)
    env["PYTHONPATH"] = ".:/root/.axon_site"
    out = subprocess.run(
        [sys.executable, __file__, "--phase", device, quant],
        capture_output=True, text=True, env=env, timeout=3000)
    for line in out.stdout.splitlines():
        if line.startswith("PHASE_RESULT "):
            d = json.loads(line[len("PHASE_RESULT "):])
            return d["recs"], d["ppl"]
    raise RuntimeError(
        f"phase {device}/{quant} failed:\n{out.stdout[-2000:]}"
        f"\n{out.stderr[-3000:]}")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--phase":
        _phase_main(sys.argv[2], sys.argv[3])
        return
    results = {}
    for quant in ("bf16", "w4a16", "fp8"):
        print(f"=== {quant} ===", flush=True)
        cpu_recs, cpu_ppl = _run_phase("cpu", quant)
        tpu_recs, tpu_ppl = _run_phase("tpu", quant)
        # Per-position, identical-context comparison: argmax agreement,
        # the measured cross-backend logprob noise on gold tokens, and
        # "true" mismatches = argmax disagreements whose CPU top1-top2
        # margin exceeds the observed p99 noise (i.e. not explainable by
        # numerics on a random-weight model's near-uniform logits).
        agree = disagree = 0
        noise = []
        margins_of_disagreements = []
        for crow, trow in zip(cpu_recs, tpu_recs):
            for c, t in zip(crow, trow):
                if c["gold_lp"] is not None and t["gold_lp"] is not None:
                    noise.append(abs(c["gold_lp"] - t["gold_lp"]))
                if c["top"][0][0] == t["top"][0][0]:
                    agree += 1
                else:
                    disagree += 1
                    margins_of_disagreements.append(
                        c["top"][0][1] - c["top"][1][1])
        noise_arr = np.array(noise) if noise else np.zeros(1)
        p99 = float(np.percentile(noise_arr, 99))
        true_mismatch = sum(1 for m in margins_of_disagreements
                            if m > p99)
        nll_delta = abs(cpu_ppl["mean_nll"] - tpu_ppl["mean_nll"])
        results[quant] = {
            "cpu_mean_nll": round(cpu_ppl["mean_nll"], 6),
            "tpu_mean_nll": round(tpu_ppl["mean_nll"], 6),
            "abs_nll_delta": round(nll_delta, 6),
            "cpu_ppl": round(cpu_ppl["perplexity"], 4),
            "tpu_ppl": round(tpu_ppl["perplexity"], 4),
            "positions": agree + disagree,
            "argmax_agree": agree,
            "argmax_disagree_within_noise": disagree - true_mismatch,
            "argmax_true_mismatches": true_mismatch,
            "gold_lp_noise_p50": round(
                float(np.percentile(noise_arr, 50)), 6),
            "gold_lp_noise_p99": round(p99, 6),
            "gold_lp_noise_max": round(float(noise_arr.max()), 6),
        }
        print(json.dumps(results[quant], indent=1), flush=True)

    out = {
        "description": "CPU oracle (interpret Pallas) vs real TPU "
                       "(compiled Mosaic, device int4/fp8 formats): same "
                       "dummy-seeded weights, same prompts; "
                       f"{N_PROMPTS}x({PROMPT_LEN}+{DECODE_LEN}) greedy + "
                       "teacher-forced NLL through the serving forward",
        "geometry": f"L={L} H={H} heads={HEADS}/{KVH} I={I} V={V}",
        "results": results,
    }
    with open("benchmarks/quality_tpu.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote benchmarks/quality_tpu.json")


if __name__ == "__main__":
    main()
