"""One-off: profile the bench workload per-step (where does 4.35s go?)."""
import sys
import time

import numpy as np

from bench import qwen25_1p5b_config, NUM_PROMPTS, PREFIX_LEN, DECODE_LEN, \
    MAX_NUM_SEQS
from aphrodite_tpu.entrypoints.llm import LLM
from aphrodite_tpu.sampling_params import SamplingParams

t0 = time.time()
llm = LLM(model="bench-dummy", hf_config=qwen25_1p5b_config(),
          tokenizer="unused", dtype="bfloat16", load_format="dummy",
          block_size=32, max_num_batched_tokens=8192,
          max_num_seqs=MAX_NUM_SEQS,
          max_model_len=PREFIX_LEN + DECODE_LEN + 64)
print(f"# engine init {time.time()-t0:.1f}s", file=sys.stderr)

rng = np.random.RandomState(0)
prompts = [rng.randint(10, 1000, size=PREFIX_LEN).tolist()
           for _ in range(NUM_PROMPTS)]
params = SamplingParams(temperature=0.0, max_tokens=DECODE_LEN,
                        ignore_eos=True)

core = llm.engine.core
worker = core.worker
runner = worker.runner

records = []
orig_exec = runner.execute_model
orig_ms = runner._execute_multi_step


def wrap_exec(so):
    kinds = []
    n_dec = n_pre = 0
    for rid, n in so.num_scheduled_tokens.items():
        if n == 1:
            n_dec += 1
        else:
            n_pre += 1
    T = so.total_num_scheduled_tokens
    R = len(so.num_scheduled_tokens)
    t = time.perf_counter()
    out = orig_exec(so)
    dt = time.perf_counter() - t
    records.append(("step", R, T, n_pre, n_dec, dt))
    return out




runner.execute_model = wrap_exec

# hook multi-step detection: patch _execute_multi_step to tag
real_ms = runner._execute_multi_step
def tag_ms(so, order, R, R_pad, smd, flags, max_lp, num_steps, step_budgets=None):
    records.append(("MSTART", num_steps, 0, 0, 0, 0.0))
    return real_ms(so, order, R, R_pad, smd, flags, max_lp, num_steps, step_budgets)
runner._execute_multi_step = tag_ms

# warmup
t = time.perf_counter()
outs = llm.generate(prompts, params)
print(f"# warmup: {time.perf_counter()-t:.2f}s", file=sys.stderr)
records.clear()

t = time.perf_counter()
outs = llm.generate(prompts, params)
total = time.perf_counter() - t
print(f"# run: {total:.2f}s", file=sys.stderr)

# aggregate
agg = {}
step_total = 0.0
i = 0
is_multi = False
out_lines = []
for rec in records:
    if rec is None:
        continue
    if rec[0] == "MSTART":
        is_multi = rec[1]
        continue
    kind, R, T, n_pre, n_dec, dt = rec
    if is_multi:
        kind = f"multi{is_multi}"
        is_multi = False
    elif n_pre and n_dec:
        kind = "mixed"
    elif n_pre:
        kind = "prefill"
    else:
        kind = "decode1"
    step_total += dt
    k = (kind,)
    a = agg.setdefault(kind, [0, 0.0, 0, 0])
    a[0] += 1
    a[1] += dt
    a[2] += T
    a[3] += R
    out_lines.append(f"{kind:8s} R={R:3d} T={T:5d} pre={n_pre:2d} "
                     f"dec={n_dec:2d} {dt*1000:7.1f}ms")

for ln in out_lines:
    print(ln, file=sys.stderr)
print(f"\n# total run {total:.3f}s; in-execute {step_total:.3f}s; "
      f"host/sched overhead {total-step_total:.3f}s", file=sys.stderr)
for kind, (n, dt, T, R) in sorted(agg.items()):
    print(f"# {kind:8s}: {n:4d} steps, {dt:.3f}s total, "
          f"{dt/n*1000:.1f}ms/step, {T} tokens", file=sys.stderr)
