"""Device microbenchmarks: establish the chip's speed-of-light.

Measures achievable dense-GEMM TFLOP/s, HBM bandwidth, dispatch (RPC)
overhead, and the cost of the pieces of one decode step at the bench shape
(Qwen2.5-1.5B-class, bs=32). Run on the real chip to steer kernel work:
`PYTHONPATH=. python benchmarks/microbench.py`.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    # Through the tunneled runtime block_until_ready can return before the
    # device finishes; a d2h fetch of one element is a true sync point.
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n


def main():
    dev = jax.devices()[0]
    print(f"device: {dev} platform={dev.platform}")
    key = jax.random.PRNGKey(0)

    # --- dispatch overhead: tiny op, sync every time -----------------------
    x = jnp.zeros((8, 8), jnp.float32)
    f = jax.jit(lambda v: v + 1)
    f(x).block_until_ready()
    t0 = time.perf_counter()
    N = 20
    for _ in range(N):
        y = f(x)
        y.block_until_ready()
    dt = (time.perf_counter() - t0) / N
    print(f"dispatch+sync roundtrip: {dt*1e3:.2f} ms")

    # pipelined dispatch (no per-step sync)
    t0 = time.perf_counter()
    y = x
    for _ in range(N):
        y = f(y)
    y.block_until_ready()
    print(f"pipelined tiny dispatch: {(time.perf_counter()-t0)/N*1e3:.2f} ms")

    # --- dense GEMM TFLOPs -------------------------------------------------
    for M, K, N_ in [(8192, 8192, 8192), (1024, 1536, 8960), (32, 1536, 8960)]:
        a = jax.random.normal(key, (M, K), jnp.bfloat16)
        b = jax.random.normal(key, (K, N_), jnp.bfloat16)
        mm = jax.jit(lambda a, b: a @ b)
        dt = timeit(mm, a, b)
        fl = 2 * M * K * N_
        print(f"gemm {M}x{K}x{N_} bf16: {dt*1e3:.3f} ms  "
              f"{fl/dt/1e12:.1f} TFLOP/s")

    # --- HBM bandwidth: big copy ------------------------------------------
    big = jax.random.normal(key, (512, 1024, 1024), jnp.bfloat16)  # 1 GiB
    cp = jax.jit(lambda v: v * 1.000001)
    dt = timeit(cp, big, n=10)
    nbytes = big.size * 2 * 2  # read + write
    print(f"copy 1GiB (r+w): {dt*1e3:.2f} ms  {nbytes/dt/1e9:.0f} GB/s")

    # --- decode-shaped weight-streaming GEMMs (bs=32, Qwen1.5B shapes) ----
    bs = 32
    H, I, V = 1536, 8960, 151936
    shapes = [("qkv+o", H, 2 * H + 2 * 2 * 128), ("mlp_in", H, 2 * I),
              ("mlp_dn", I, H), ("lm_head", H, V)]
    tot = 0.0
    for name, k, n_ in shapes:
        a = jax.random.normal(key, (bs, k), jnp.bfloat16)
        b = jax.random.normal(key, (k, n_), jnp.bfloat16)
        mm = jax.jit(lambda a, b: a @ b)
        dt = timeit(mm, a, b)
        bw = k * n_ * 2 / dt / 1e9
        mult = 28 if name != "lm_head" else 1
        tot += dt * mult
        print(f"decode gemm {name} [{bs}x{k}]x[{k}x{n_}]: {dt*1e3:.3f} ms "
              f"({bw:.0f} GB/s weight stream) x{mult}")
    print(f"decode step GEMM floor (28 layers + head): {tot*1e3:.2f} ms")

    # --- fused whole-layer-stack scan vs per-layer dispatch ----------------
    L = 28
    Wq = jax.random.normal(key, (L, H, H), jnp.bfloat16)
    Wmlp_in = jax.random.normal(key, (L, H, 2 * I), jnp.bfloat16)
    Wmlp_dn = jax.random.normal(key, (L, I, H), jnp.bfloat16)
    a = jax.random.normal(key, (bs, H), jnp.bfloat16)

    @jax.jit
    def stack_scan(a, Wq, Wmlp_in, Wmlp_dn):
        def layer(x, xs):
            wq, wi, wd = xs
            x = x + x @ wq
            h = x @ wi
            x = x + (h[:, :I] * jax.nn.silu(h[:, I:])) @ wd
            return x, None
        out, _ = jax.lax.scan(layer, a, (Wq, Wmlp_in, Wmlp_dn))
        return out

    dt = timeit(stack_scan, a, Wq, Wmlp_in, Wmlp_dn)
    nbytes = (Wq.size + Wmlp_in.size + Wmlp_dn.size) * 2
    print(f"28-layer GEMM scan: {dt*1e3:.2f} ms "
          f"({nbytes/dt/1e9:.0f} GB/s weight stream)")

    # --- KV-cache-shaped scatter, scanned over layers ----------------------
    P, kvh, page, hd = 512, 2, 32, 128
    kv = jnp.zeros((L, P, 2, kvh, page, hd), jnp.bfloat16)
    k_new = jax.random.normal(key, (bs, kvh, hd), jnp.bfloat16)
    slots = jnp.arange(bs, dtype=jnp.int32) * page

    @jax.jit
    def scan_scatter(kv, k_new, slots):
        def layer(_, kvl):
            pages = slots // page
            offs = slots % page
            kvl = kvl.at[pages, 0, :, offs, :].set(k_new)
            kvl = kvl.at[pages, 1, :, offs, :].set(k_new)
            return _, kvl
        _, kv = jax.lax.scan(layer, 0, kv)
        return kv

    dt = timeit(scan_scatter, kv, k_new, slots, n=10)
    print(f"28-layer KV scatter scan (carry {L*P*2*kvh*page*hd*2/2**30:.2f} "
          f"GiB): {dt*1e3:.2f} ms")

    # --- decode attention kernel, scanned over layers ----------------------
    from aphrodite_tpu.ops.decode_paged_attention import decode_paged_attention
    R, nq = 32, 12
    ctx = 530
    max_pages = 20
    kvL = jax.random.normal(key, (L, P, 2, kvh, page, hd), jnp.bfloat16)
    q = jax.random.normal(key, (R, nq, hd), jnp.bfloat16)
    bt = jnp.asarray(
        np.random.RandomState(0).randint(0, P, (R, max_pages)), jnp.int32)
    sl = jnp.full((R,), ctx, jnp.int32)

    @jax.jit
    def attn_scan(q, kvL, bt, sl):
        def layer(_, kvl):
            o, _ = decode_paged_attention(q, kvl, bt, sl, scale=0.088)
            return _, jnp.sum(o)
        _, outs = jax.lax.scan(layer, 0, kvL)
        return outs

    dt = timeit(attn_scan, q, kvL, bt, sl, n=10)
    kv_bytes = R * ctx * kvh * hd * 2 * 2 * L
    print(f"decode attn kernel scan x{L} R={R} ctx={ctx}: {dt*1e3:.2f} ms "
          f"({kv_bytes/dt/1e9:.0f} GB/s KV stream)")

    # --- greedy sampler shape --------------------------------------------
    from aphrodite_tpu.sample.metadata import build_sampling_metadata
    from aphrodite_tpu.sample.sampler import sample_tokens
    from aphrodite_tpu.sampling_params import SamplingParams
    V = 151936
    logits = jax.random.normal(key, (bs, V), jnp.float32)
    sp = SamplingParams(temperature=0.0, max_tokens=50)
    smd, flags = build_sampling_metadata(
        [(sp, [1, 2, 3], 3, 0)] * bs, V, bs, base_seed=0)
    samp = jax.jit(functools.partial(sample_tokens, flags=flags,
                                     max_logprobs=0),
                   static_argnames=())
    dt = timeit(samp, logits, smd)
    print(f"greedy sample_tokens [{bs}, {V}]: {dt*1e3:.3f} ms")

    # --- full logits path: hidden -> logits -> sample ---------------------
    emb = jax.random.normal(key, (V, H), jnp.bfloat16)
    hid = jax.random.normal(key, (bs, H), jnp.bfloat16)

    @jax.jit
    def logit_sample(hid, emb, smd):
        lg = jnp.dot(hid, emb.T, preferred_element_type=jnp.float32)
        return sample_tokens(lg, smd, flags, 0)

    dt = timeit(logit_sample, hid, emb, smd)
    print(f"lm_head+sample [{bs}x{H}]x[{H}x{V}]: {dt*1e3:.3f} ms")


if __name__ == "__main__":
    main()
