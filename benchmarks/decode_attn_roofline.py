"""Decode-attention roofline check: achieved HBM bandwidth of the window
(frozen-cache) decode kernel at long contexts.

Answers VERDICT r2 "weak #8": the kernel computes one request per grid step
with [group, hd]-row dots (<=8 of 128 MXU rows). That is only a problem if
the kernel is compute-bound; decode attention is inherently HBM-bound (every
attended KV byte is read once, ~2 FLOPs/byte), so the right metric is
achieved KV-read bandwidth vs the chip's HBM roofline, not MXU occupancy.

Usage (real TPU): PYTHONPATH=.:/root/.axon_site python benchmarks/decode_attn_roofline.py
Writes benchmarks/decode_attn_roofline.json.

Reference equivalents: kernels/attention/paged_attention_v2.cu (the
reference's decode kernel is likewise bandwidth-bound and evaluated on
achieved bandwidth).
"""
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from aphrodite_tpu.ops.window_decode_attention import window_decode_attention

from aphrodite_tpu.platforms import current_platform

V5E_HBM_GBPS = current_platform().hbm_gbps or 819.0


def bench_case(R, ctx, kvh, group, hd=128, page=32, L=4, Kw=8, n=30):
    """Time the kernel; return (ms/call, KV GiB read/call, GB/s)."""
    P_needed = R * -(-ctx // page)
    P = P_needed + 8
    key = jax.random.PRNGKey(0)
    kv = jax.random.normal(key, (L, P, 2, kvh, page, hd), jnp.bfloat16)
    q = jax.random.normal(key, (R, kvh * group, hd), jnp.bfloat16)
    tails = jax.random.normal(key, (L, R, kvh, Kw, hd), jnp.bfloat16)
    paged_lens = jnp.full((R,), ctx, jnp.int32)
    pages_per_req = -(-ctx // page)
    bt = jnp.arange(R * pages_per_req, dtype=jnp.int32).reshape(
        R, pages_per_req)
    lidx = jnp.zeros((1,), jnp.int32)
    step = jnp.zeros((1,), jnp.int32)

    fn = functools.partial(window_decode_attention, scale=hd ** -0.5)

    @functools.partial(jax.jit, static_argnames=("chain",))
    def many(q, kv, tails, lidx, step, paged_lens, bt, chain):
        # Chain sequential kernel calls inside ONE dispatch so the
        # ~25-30 ms tunnel RPC is amortized; data dependence via q.
        def body(qc, _):
            o = fn(qc, kv, tails, tails, lidx, step, paged_lens, bt)
            return o.astype(qc.dtype), None
        out, _ = jax.lax.scan(body, q, None, length=chain)
        return out

    def timed(chain):
        # block_until_ready does not synchronize through the axon tunnel;
        # a 1-element d2h fetch is the only true sync (see PROFILE.md).
        out = many(q, kv, tails, lidx, step, paged_lens, bt, chain=chain)
        float(out[0, 0, 0])  # warm compile + sync
        t0 = time.perf_counter()
        out = many(q, kv, tails, lidx, step, paged_lens, bt, chain=chain)
        float(out[0, 0, 0])
        return time.perf_counter() - t0

    # Slope method: (t(2C) - t(C)) / C cancels the fixed sync/dispatch RPC.
    # Adaptive chain: small cases need >=2 GiB of chained KV traffic to
    # rise above the tunnel's timing noise.
    kv_bytes = R * pages_per_req * page * 2 * kvh * hd * 2  # bf16
    C = max(16, -(-2**31 // kv_bytes))
    t1 = min(timed(C) for _ in range(3))
    t2 = min(timed(2 * C) for _ in range(3))
    assert t2 > t1, (
        f"non-monotone timing (t({C})={t1:.4f}s >= t({2*C})={t2:.4f}s): "
        "tunnel timing noise swamped the slope; rerun or raise the chain")
    dt = (t2 - t1) / C

    gbps = kv_bytes / dt / 1e9
    return dt * 1e3, kv_bytes / 2**30, gbps


def main():
    results = []
    print(f"{'case':<38} {'ms/call':>8} {'KV MiB':>8} {'GB/s':>7} "
          f"{'%roof':>6}")
    for (R, ctx, kvh, group) in [
        (32, 512, 2, 6),     # bench-model-like geometry, medium ctx
        (32, 2048, 2, 6),    # long ctx
        (16, 8192, 2, 6),    # very long ctx
        (32, 2048, 8, 4),    # llama-8B-like geometry
        (16, 8192, 8, 4),
        (8, 16384, 8, 4),    # few requests, extreme ctx
    ]:
        ms, gib, gbps = bench_case(R, ctx, kvh, group)
        pct = 100.0 * gbps / V5E_HBM_GBPS
        name = f"R={R} ctx={ctx} kvh={kvh} g={group}"
        print(f"{name:<38} {ms:>8.3f} {gib*1024:>8.1f} {gbps:>7.1f} "
              f"{pct:>5.1f}%")
        results.append({"R": R, "ctx": ctx, "kvh": kvh, "group": group,
                        "ms_per_call": round(ms, 3),
                        "kv_gib": round(gib, 4),
                        "achieved_gbps": round(gbps, 1),
                        "pct_of_v5e_roofline": round(pct, 1)})
    with open("benchmarks/decode_attn_roofline.json", "w") as f:
        json.dump({"v5e_hbm_gbps": V5E_HBM_GBPS, "cases": results}, f,
                  indent=1)
    print("wrote benchmarks/decode_attn_roofline.json")


if __name__ == "__main__":
    main()
