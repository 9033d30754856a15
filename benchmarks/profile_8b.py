"""8B-geometry per-phase profile (VERDICT r3 'weak #1'): where does each
millisecond of BASELINE config 2/3 go at Llama-3.1-8B-class shapes?

Same discipline as profile_bench.py (the 1.5B decomposition that drove
PROFILE.md rounds 2->3), plus weight-streaming microbenches of the exact
decode GEMMs so the step wall can be attributed kernel-by-kernel.

Usage (real TPU):
  PYTHONPATH=.:/root/.axon_site python benchmarks/profile_8b.py [w4a16|fp8] [--micro-only|--engine-only]
Writes benchmarks/profile_8b_<tag>.json.
"""
from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

NUM_PROMPTS = 32
PREFIX_LEN = 512
DECODE_LEN = 64

# Llama-3.1-8B geometry
H, KVH, HEADS, HD, I, V, L = 4096, 8, 32, 128, 14336, 128256, 32
GROUP = 128

# [K, N] per-layer projections, fused the way the model runs them
SHAPES = [("qkv", H, (HEADS + 2 * KVH) * HD), ("o", HEADS * HD, H),
          ("gate_up", H, 2 * I), ("down", I, H)]


def _llama8b_config():
    from transformers import LlamaConfig
    return LlamaConfig(
        vocab_size=V, hidden_size=H, num_hidden_layers=L,
        num_attention_heads=HEADS, num_key_value_heads=KVH,
        intermediate_size=I, max_position_embeddings=8192,
        rope_theta=500000.0, architectures=["LlamaForCausalLM"])


def _sync(x):
    float(np.asarray(x).reshape(-1)[0])


def _slope_time(fn, x0, chains):
    """min-of-3 slope timing: per-call seconds, dispatch+sync removed."""
    ts = []
    for c in chains:
        _sync(fn(x0, c))  # compile
        ts.append(min(_time_once(fn, x0, c) for _ in range(3)))
    dt = (ts[1] - ts[0]) / (chains[1] - chains[0])
    assert dt > 0, f"non-monotone slope timing: {ts} at chains {chains}"
    return dt


def _time_once(fn, x0, c):
    t0 = time.perf_counter()
    _sync(fn(x0, c))
    return time.perf_counter() - t0


def micro(quant: str):
    """Chained decode-GEMM streams at the exact 8B per-layer shapes:
    the weight-stream roofline the engine step is held against."""
    import jax
    import jax.numpy as jnp

    M = 32  # decode batch
    results = {}
    key = jax.random.PRNGKey(0)

    if quant == "w4a16":
        # the production decode path: XLA int4 grouped dot
        # (ops/quant_gemm.w4a16_int4_grouped via the int4 resident format)
        from aphrodite_tpu.ops.quant_gemm import w4a16_int4_grouped

        def w4(x, q4, sc, zr):
            return w4a16_int4_grouped(x, q4, sc, zr)

        def make_int4(shape):
            # values are irrelevant for timing; iota avoids the 4-byte
            # random-bits intermediate (randint would need L*K*N*4 HBM)
            probe = jax.jit(lambda: jnp.zeros((), jnp.int32))
            fmt = jax.jit(lambda w: w.reshape(-1)[0].astype(jnp.int32)) \
                .lower(jax.ShapeDtypeStruct(shape, jnp.int4)) \
                .compile().input_formats[0][0]

            def build():
                w8 = jax.lax.broadcasted_iota(jnp.int8, shape, 2)
                return w8.astype(jnp.int4)
            return jax.jit(build, out_shardings=fmt)()

        weights = {}
        per_layer_bytes = 0
        for name, K, N in SHAPES:
            qp = make_int4((L, K, N))
            sc = jnp.ones((L, K // GROUP, N), jnp.float32)
            zr = jnp.zeros((L, K // GROUP, N), jnp.float32)
            weights[name] = (qp, sc, zr)
            per_layer_bytes += K // 2 * N + 2 * (K // GROUP) * N * 4

        def one_layer(x, l, ws):
            """Real decode dataflow: qkv -> o -> gate_up -> down."""
            qp, sc, zr = ws["qkv"]
            y = w4(x, qp[l], sc[l], zr[l])              # [M, 6144]
            qp, sc, zr = ws["o"]
            y = w4(y[:, :HEADS * HD].astype(jnp.bfloat16),
                   qp[l], sc[l], zr[l])                 # [M, H]
            h = y.astype(jnp.bfloat16)
            qp, sc, zr = ws["gate_up"]
            y = w4(h, qp[l], sc[l], zr[l])              # [M, 2I]
            qp, sc, zr = ws["down"]
            y = w4(y[:, :I].astype(jnp.bfloat16), qp[l], sc[l], zr[l])
            return y.astype(jnp.bfloat16)               # [M, H]

        @functools.partial(jax.jit, static_argnames=("chain",))
        def chained_w(x, ws, chain):
            def rep(xc, _):
                out, _ = jax.lax.scan(
                    lambda c, l: (one_layer(c, l, ws), None), xc,
                    jnp.arange(L, dtype=jnp.int32))
                return out, None
            out, _ = jax.lax.scan(rep, x, None, length=chain)
            return out

        def chained(x, chain):
            return chained_w(x, weights, chain)

        x0 = jnp.ones((M, H), jnp.bfloat16)
        dt = _slope_time(chained, x0, chains=(2, 4))
        total = per_layer_bytes * L
        results["w4_all_layers"] = {
            "ms_per_model_pass": round(dt * 1e3, 2),
            "weight_gib": round(total / 2**30, 3),
            "achieved_gbps": round(total / dt / 1e9, 1)}
        print("w4 stream (32 layers, real dataflow):",
              results["w4_all_layers"], flush=True)

        # per-projection attribution
        for name, K, N in SHAPES:
            qp, sc, zr = weights[name]

            @functools.partial(jax.jit, static_argnames=("chain", "K"))
            def proj_jit(x, qp, sc, zr, chain, K):
                def body(xc, l):
                    y = w4(xc, qp[l], sc[l], zr[l]).astype(jnp.bfloat16)
                    if y.shape[1] >= K:
                        return y[:, :K], None
                    return jnp.pad(y, ((0, 0), (0, K - y.shape[1]))), None
                def rep(xc, _):
                    out, _ = jax.lax.scan(body, xc,
                                          jnp.arange(L, dtype=jnp.int32))
                    return out, None
                out, _ = jax.lax.scan(rep, x, None, length=chain)
                return out

            def proj_chain(x, chain, qp=qp, sc=sc, zr=zr, K=K):
                return proj_jit(x, qp, sc, zr, chain, K)

            xk = jnp.ones((M, K), jnp.bfloat16)
            dtp = _slope_time(proj_chain, xk, chains=(4, 24))
            bytes_p = (K // 2 * N + 2 * (K // GROUP) * N * 4) * L
            results[f"w4_{name}"] = {
                "ms_per_32layers": round(dtp * 1e3, 2),
                "achieved_gbps": round(bytes_p / dtp / 1e9, 1)}
            print(f"w4 {name} [{K}x{N}] x32:", results[f"w4_{name}"],
                  flush=True)

    elif quant == "fp8":
        weights = {}
        per_layer_bytes = 0
        for name, K, N in SHAPES:
            qw = jax.random.normal(key, (L, K, N),
                                   jnp.bfloat16).astype(jnp.float8_e4m3fn)
            sc = jnp.full((L, N), 0.01, jnp.float32)
            weights[name] = (qw, sc)
            per_layer_bytes += K * N + N * 4

        def mm(x, qw, sc):
            y = jnp.dot(x, qw.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            return y * sc[None, :]

        def take(y, n):
            # consume ALL columns (cheap sum) so XLA cannot DCE the
            # unused part of the GEMM + its weight read
            return (y[:, :n] + y.sum(axis=1, keepdims=True) * 1e-9
                    ).astype(jnp.bfloat16)

        def one_layer(x, l, ws):
            qw, sc = ws["qkv"]
            y = mm(x, qw[l], sc[l])
            qw, sc = ws["o"]
            y = mm(take(y, HEADS * HD), qw[l], sc[l])
            h = take(y, H)
            qw, sc = ws["gate_up"]
            y = mm(h, qw[l], sc[l])
            qw, sc = ws["down"]
            y = mm(take(y, I), qw[l], sc[l])
            return take(y, H)

        @functools.partial(jax.jit, static_argnames=("chain",))
        def chained_w(x, ws, chain):
            def rep(xc, _):
                out, _ = jax.lax.scan(
                    lambda c, l: (one_layer(c, l, ws), None), xc,
                    jnp.arange(L, dtype=jnp.int32))
                return out, None
            out, _ = jax.lax.scan(rep, x, None, length=chain)
            return out

        def chained(x, chain):
            return chained_w(x, weights, chain)

        import jax.numpy as jnp2
        x0 = jnp2.ones((M, H), jnp2.bfloat16)
        dt = _slope_time(chained, x0, chains=(2, 4))
        total = per_layer_bytes * L
        results["fp8_all_layers"] = {
            "ms_per_model_pass": round(dt * 1e3, 2),
            "weight_gib": round(total / 2**30, 3),
            "achieved_gbps": round(total / dt / 1e9, 1)}
        print("fp8 stream (32 layers):", results["fp8_all_layers"],
              flush=True)

    # lm_head (bf16, common to all quant modes)
    import jax.numpy as jnp
    wlm = jax.random.normal(jax.random.PRNGKey(1), (H, V), jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("chain",))
    def lm_jit(x, w, chain):
        def body(xc, _):
            y = jnp.dot(xc, w, preferred_element_type=jnp.float32)
            # consume all V columns so the weight read cannot be DCE'd
            return ((y[:, :H] + y.sum(axis=1, keepdims=True) * 1e-9)
                    / np.float32(V)).astype(jnp.bfloat16), None
        out, _ = jax.lax.scan(body, x, None, length=chain)
        return out

    def lm_chain(x, chain):
        return lm_jit(x, wlm, chain)

    x0 = jnp.ones((32, H), jnp.bfloat16)
    dt = _slope_time(lm_chain, x0, chains=(8, 16))
    results["lm_head"] = {
        "ms": round(dt * 1e3, 2),
        "weight_gib": round(H * V * 2 / 2**30, 3),
        "achieved_gbps": round(H * V * 2 / dt / 1e9, 1)}
    print("lm_head [32x4096]x[4096x128256]:", results["lm_head"],
          flush=True)
    return results


def engine_profile(quant: str):
    from aphrodite_tpu.entrypoints.llm import LLM
    from aphrodite_tpu.sampling_params import SamplingParams

    t0 = time.time()
    kwargs = dict(model=f"profile8b-{quant}", hf_config=_llama8b_config(),
                  tokenizer="unused", dtype="bfloat16", load_format="dummy",
                  block_size=64, max_num_seqs=NUM_PROMPTS,
                  max_num_batched_tokens=16384,
                  max_model_len=PREFIX_LEN + DECODE_LEN + 128)
    if quant == "w4a16":
        kwargs["quantization"] = "gptq"
    elif quant == "fp8":
        kwargs.update(quantization="fp8", kv_cache_dtype="fp8_e4m3")
    llm = LLM(**kwargs)
    print(f"# engine init {time.time()-t0:.1f}s", file=sys.stderr,
          flush=True)

    rng = np.random.RandomState(0)
    prompts = [rng.randint(10, 100000, size=PREFIX_LEN).tolist()
               for _ in range(NUM_PROMPTS)]
    params = SamplingParams(temperature=0.0, max_tokens=DECODE_LEN,
                            ignore_eos=True)

    runner = llm.engine.core.worker.runner
    records = []
    orig_exec = runner.execute_model
    real_ms = runner._execute_multi_step

    def wrap_exec(so):
        n_dec = sum(1 for n in so.num_scheduled_tokens.values() if n == 1)
        n_pre = len(so.num_scheduled_tokens) - n_dec
        T = so.total_num_scheduled_tokens
        R = len(so.num_scheduled_tokens)
        t = time.perf_counter()
        out = orig_exec(so)
        dt = time.perf_counter() - t
        records.append(["step", R, T, n_pre, n_dec, dt])
        return out

    def tag_ms(so, order, R, R_pad, smd, flags, max_lp, num_steps,
               step_budgets=None):
        records.append(["MSTART", num_steps, 0, 0, 0, 0.0])
        return real_ms(so, order, R, R_pad, smd, flags, max_lp, num_steps,
                       step_budgets)

    runner.execute_model = wrap_exec
    runner._execute_multi_step = tag_ms

    t = time.perf_counter()
    llm.generate(prompts, params)
    print(f"# warmup: {time.perf_counter()-t:.2f}s", file=sys.stderr,
          flush=True)
    records.clear()

    times = []
    for _ in range(3):
        records.append(["RUN", 0, 0, 0, 0, 0.0])
        t = time.perf_counter()
        llm.generate(prompts, params)
        times.append(time.perf_counter() - t)
    total = min(times)
    print(f"# runs: {[round(x, 3) for x in times]}", file=sys.stderr)

    runs = []
    run_steps = []
    is_multi = 0
    for rec in records:
        if rec[0] == "RUN":
            run_steps = []
            runs.append(run_steps)
            continue
        if rec[0] == "MSTART":
            is_multi = rec[1]
            continue
        _, R, T, n_pre, n_dec, dt = rec
        if is_multi:
            kind = f"multi{is_multi}"
            is_multi = 0
        elif n_pre:
            kind = "mixed" if n_dec else "prefill"
        else:
            kind = "decode1"
        run_steps.append((kind, R, T, dt))
    best = runs[int(np.argmin(times))]
    agg = {}
    for kind, R, T, dt in best:
        a = agg.setdefault(kind, [0, 0.0, 0])
        a[0] += 1
        a[1] += dt
        a[2] += T
        print(f"  {kind:10s} R={R:3d} T={T:6d} {dt*1000:8.1f}ms",
              file=sys.stderr)
    in_exec = sum(dt for _, _, _, dt in best)
    out = {"seconds_per_run": round(total, 3),
           "decode_tok_per_s_full_run": round(
               NUM_PROMPTS * DECODE_LEN / total, 1),
           "host_overhead_s": round(total - in_exec, 3),
           "steps": {k: {"n": a[0], "total_s": round(a[1], 3),
                         "ms_per_step": round(a[1] / a[0] * 1e3, 1),
                         "tokens": a[2]} for k, a in agg.items()}}
    dec_s = sum(a[1] for k, a in agg.items() if k.startswith("multi")
                or k == "decode1")
    if dec_s:
        out["pure_decode_tok_per_s"] = round(
            NUM_PROMPTS * DECODE_LEN / dec_s, 1)
        out["ms_per_decode_substep"] = round(dec_s / DECODE_LEN * 1e3, 2)
    print(json.dumps(out, indent=1), flush=True)
    return out


def main():
    quant = sys.argv[1] if len(sys.argv) > 1 else "w4a16"
    res = {"config": f"llama-3.1-8B-class {quant}, 32x(512+64), bs<=32"}
    if "--engine-only" not in sys.argv:
        res["micro"] = micro(quant)
    if "--micro-only" not in sys.argv:
        res["engine"] = engine_profile(quant)
    with open(f"benchmarks/profile_8b_{quant}.json", "w") as f:
        json.dump(res, f, indent=1)
    print(f"wrote benchmarks/profile_8b_{quant}.json")


if __name__ == "__main__":
    main()
