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
    the weight-stream roofline the engine step is held against.

    Column consumption MUST be via argmax (r4 verdict weak #2): a
    `y.sum(axis=1)` witness is algebraically rewritten by XLA into
    `x @ W.sum(axis=1)` whose weight reduction is loop-invariant and
    hoisted out of the chain — the benched loop then reads only the
    SLICED weight columns, inflating GB/s past the HBM peak (the round-4
    lm_head artifact: 1,063 GB/s on an 819 GB/s part). argmax cannot be
    simplified through the dot, so every column must be computed and
    every weight byte read, every iteration."""
    import jax
    import jax.numpy as jnp

    M = 32  # decode batch
    results = {}
    key = jax.random.PRNGKey(0)

    def consume(y, keep):
        """Truncate to `keep` columns while making ALL columns (and thus
        the full weight read) data-live via an argmax witness."""
        ix = jnp.argmax(y, axis=1, keepdims=True).astype(jnp.bfloat16)
        out = y[:, :keep].astype(jnp.bfloat16) + ix * jnp.bfloat16(1e-9)
        if out.shape[1] < keep:
            out = jnp.pad(out, ((0, 0), (0, keep - out.shape[1])))
        return out

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
            """Real decode dataflow: qkv -> o -> gate_up -> down.
            Every truncation goes through consume() — a bare y[:, :k]
            would let XLA skip reading the discarded weight columns."""
            qp, sc, zr = ws["qkv"]
            y = w4(x, qp[l], sc[l], zr[l])              # [M, 6144]
            qp, sc, zr = ws["o"]
            y = w4(consume(y, HEADS * HD), qp[l], sc[l], zr[l])  # [M, H]
            h = consume(y, H)
            qp, sc, zr = ws["gate_up"]
            y = w4(h, qp[l], sc[l], zr[l])              # [M, 2I]
            qp, sc, zr = ws["down"]
            y = w4(consume(y, I), qp[l], sc[l], zr[l])
            return consume(y, H)                        # [M, H]

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
                    y = w4(xc, qp[l], sc[l], zr[l])
                    return consume(y, K), None
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

        def one_layer(x, l, ws):
            qw, sc = ws["qkv"]
            y = mm(x, qw[l], sc[l])
            qw, sc = ws["o"]
            y = mm(consume(y, HEADS * HD), qw[l], sc[l])
            h = consume(y, H)
            qw, sc = ws["gate_up"]
            y = mm(h, qw[l], sc[l])
            qw, sc = ws["down"]
            y = mm(consume(y, I), qw[l], sc[l])
            return consume(y, H)

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
            # argmax witness: the real sampler's consumption pattern, and
            # the one XLA cannot rewrite into a hoisted weight reduction
            return (consume(y, H) / np.float32(V)).astype(jnp.bfloat16), \
                None
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


def components(quant: str, micro_results: dict) -> dict:
    """In-engine step-wall decomposition (VERDICT r4 #3): attention
    window, sampler, KV window flush, measured at the exact config-2/3
    decode geometry, so the engine's ms/sub-step sums to named parts
    plus an explicit residual (norms/rope/residual-adds/scan glue)."""
    import jax
    import jax.numpy as jnp

    out = {}

    # -- decode attention: the real window kernel, one call = one layer --
    from benchmarks.decode_attn_roofline import bench_case
    ctx = PREFIX_LEN + DECODE_LEN // 2  # mid-window context
    kv_dtype = "fp8" if quant == "fp8" else "bf16"
    ms, gib, gbps = bench_case(R=NUM_PROMPTS, ctx=ctx, kvh=KVH,
                               group=HEADS // KVH, hd=HD, page=64,
                               L=4, Kw=64)
    attn_ms = ms * L
    out["attention_window"] = {
        "ms_per_substep_32_layers": round(attn_ms, 2),
        "kv_gib_per_layer": round(gib, 4),
        "achieved_gbps": round(gbps, 1),
        "note": f"bf16 KV benched; config-3 streams {kv_dtype}"}
    print(f"attn window ({NUM_PROMPTS}r x ctx{ctx} x {KVH}kvh x32L): "
          f"{attn_ms:.2f} ms/substep @ {gbps:.0f} GB/s", flush=True)

    # -- sampler: greedy argmax over [R, V] f32 logits (config-2 flags) --
    logits0 = jax.random.normal(jax.random.PRNGKey(2),
                                (NUM_PROMPTS, V), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("chain",))
    def samp(lg, chain):
        def body(c, _):
            tok = jnp.argmax(lg + c[:, None], axis=-1).astype(jnp.int32)
            lp = jnp.take_along_axis(
                jax.nn.log_softmax(lg + c[:, None], axis=-1),
                tok[:, None], axis=1)[:, 0]
            return lp.astype(jnp.float32), None
        outv, _ = jax.lax.scan(body, jnp.zeros((NUM_PROMPTS,),
                                               jnp.float32), None,
                               length=chain)
        return outv

    dts = []
    for c in (8, 24):
        _sync(samp(logits0, c))
        dts.append(min(_time_once(samp, logits0, c) for _ in range(3)))
    samp_ms = (dts[1] - dts[0]) / 16 * 1e3
    out["sampler_greedy"] = {"ms": round(samp_ms, 3)}
    print(f"sampler (greedy+logprob, [32x{V}]): {samp_ms:.3f} ms",
          flush=True)

    # -- KV window-tail flush: once per WINDOW, amortized over K steps --
    K = 64
    page = 64
    LB = 4  # bench a 4-layer slice, scale to the full 32
    P = NUM_PROMPTS * ((ctx + DECODE_LEN) // page + 2)
    kv = jnp.zeros((LB, P, 2, KVH, page, HD), jnp.bfloat16)
    tk = jnp.ones((LB, NUM_PROMPTS, KVH, K, HD), jnp.bfloat16)
    paged_lens = jnp.full((NUM_PROMPTS,), ctx, jnp.int32)
    bt = jnp.arange(NUM_PROMPTS * (P // NUM_PROMPTS),
                    dtype=jnp.int32).reshape(NUM_PROMPTS, -1)

    @jax.jit
    def flush(kv, tk, tv, paged_lens, bt):
        j = jnp.arange(K, dtype=jnp.int32)
        abs_pos = paged_lens[:, None] + j[None, :]
        pages = jnp.take_along_axis(bt, abs_pos // page, axis=1)
        pf = pages.reshape(-1)
        of = (abs_pos % page).reshape(-1)
        val_k = tk.transpose(1, 3, 0, 2, 4).reshape(
            NUM_PROMPTS * K, LB, KVH, HD)
        val_v = tv.transpose(1, 3, 0, 2, 4).reshape(
            NUM_PROMPTS * K, LB, KVH, HD)
        kv = kv.at[:, pf, 0, :, of, :].set(val_k, mode="drop")
        kv = kv.at[:, pf, 1, :, of, :].set(val_v, mode="drop")
        return kv

    _sync(flush(kv, tk, tk, paged_lens, bt)[0, 0, 0, 0, 0])
    t0 = time.perf_counter()
    _sync(flush(kv, tk, tk, paged_lens, bt)[0, 0, 0, 0, 0])
    flush_s = time.perf_counter() - t0
    # One flush covers LB benched layers x K steps; scale to 32 layers,
    # amortize per sub-step. (Includes the dispatch sync: upper bound.)
    flush_ms = flush_s * (L / LB) / K * 1e3
    out["kv_window_flush"] = {"ms_per_substep_amortized": round(
        flush_ms, 3)}
    print(f"kv flush (amortized /substep, 32L): {flush_ms:.3f} ms",
          flush=True)

    # -- assemble the table --------------------------------------------
    gemm_key = "w4_all_layers" if quant == "w4a16" else "fp8_all_layers"
    gemm_ms = micro_results.get(gemm_key, {}).get("ms_per_model_pass")
    lm_ms = micro_results.get("lm_head", {}).get("ms")
    if gemm_ms is not None and lm_ms is not None:
        accounted = gemm_ms + lm_ms + attn_ms + samp_ms + flush_ms
        out["accounted_ms_per_substep"] = {
            "gemms": gemm_ms, "lm_head": lm_ms,
            "attention": round(attn_ms, 2),
            "sampler": round(samp_ms, 3),
            "kv_flush": round(flush_ms, 3),
            "total": round(accounted, 2)}
        print(f"accounted: {accounted:.2f} ms/substep "
              f"(gemm {gemm_ms} + lm_head {lm_ms} + attn {attn_ms:.2f} "
              f"+ sampler {samp_ms:.2f} + flush {flush_ms:.2f})",
              flush=True)
    return out


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
        res["components"] = components(quant, res["micro"])
    if "--micro-only" not in sys.argv:
        res["engine"] = engine_profile(quant)
        acc = res.get("components", {}).get("accounted_ms_per_substep")
        eng = res["engine"].get("ms_per_decode_substep")
        if acc and eng:
            res["unattributed_ms_per_substep"] = round(
                eng - acc["total"], 2)
            print(f"engine substep {eng} ms vs accounted "
                  f"{acc['total']} ms -> unattributed "
                  f"{res['unattributed_ms_per_substep']} ms", flush=True)
    with open(f"benchmarks/profile_8b_{quant}.json", "w") as f:
        json.dump(res, f, indent=1)
    print(f"wrote benchmarks/profile_8b_{quant}.json")


if __name__ == "__main__":
    main()
