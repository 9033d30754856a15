"""Shared sparse-MoE expert combine.

One implementation used by every MoE family (Mixtral/Qwen-MoE/OLMoE on the
Llama lineage; DBRX/PhiMoE/GraniteMoE on the FlexibleDecoder lineage).
Routing (which experts, what weights) differs per model and stays in the
model class; the expert compute is shared:

- default: ``lax.scan`` over experts with a weighted dense combine — each
  expert's weights stream from HBM exactly once per step (bandwidth-optimal
  for decode, where most experts are hit anyway).
- expert-parallel: dense einsum over the expert dim with ``we_*`` sharded on
  the mesh's ``tp`` axis; GSPMD all-reduces the token-expert combine.

Reference: aphrodite/modeling/layers/fused_moe/layer.py:432 (FusedMoE);
the Pallas grouped-GEMM for prefill FLOP-optimality is the documented
follow-up (reference moe_pallas.py:62 precedent).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from aphrodite_tpu.layers.linear import apply_linear


def moe_combine(h: jax.Array, lp: dict, act, topi: jax.Array,
                topw: jax.Array, *, quant_fmt=None,
                expert_parallel: bool = False,
                num_experts: int | None = None, mesh=None) -> jax.Array:
    """Weighted combine of top-k experts.

    h: [T, H]; lp holds we_gate/we_up [.., H, I] and we_down [.., I, H]
    stacked on a leading expert dim E; topi/topw: [T, k] routing.
    ``act(gate, up)`` is the gated activation.
    """
    E = num_experts
    if E is None:
        leaf = lp["we_gate"]
        E = (leaf["qweight"] if isinstance(leaf, dict) else leaf).shape[0]
    topw = topw.astype(h.dtype)

    if expert_parallel:
        return _ep_moe(h, lp, act, topi, topw, E, quant_fmt, mesh)

    # Large token batches (prefill): sorted-token grouped GEMM — FLOPs
    # scale with top_k, not E (the reference's fused_moe grouped kernel,
    # fused_moe.py; here via lax.ragged_dot, which XLA lowers to a
    # group-offset MXU loop). Small batches (decode) keep the scan over
    # experts: every expert's weights stream from HBM exactly once, which
    # is bandwidth-optimal when most experts are hit anyway, and avoids
    # gather/scatter latency on tiny T. Quantized experts stay on the scan
    # path (ragged_dot needs plain arrays).
    T = h.shape[0]
    if quant_fmt is None and T * topi.shape[1] >= 4 * E:
        return _grouped_moe(h, lp, act, topi, topw, E)

    def expert(acc, xs):
        wg, wu, wd, e = xs
        y = act(apply_linear(h, wg, fmt=quant_fmt),
                apply_linear(h, wu, fmt=quant_fmt))
        y = apply_linear(y, wd, fmt=quant_fmt)
        gate = jnp.sum(jnp.where(topi == e, topw, 0.0), axis=-1)  # [T]
        return acc + gate[:, None] * y, None

    acc, _ = jax.lax.scan(
        expert, jnp.zeros_like(h),
        (lp["we_gate"], lp["we_up"], lp["we_down"],
         jnp.arange(E, dtype=jnp.int32)))
    return acc


def _ep_moe(h: jax.Array, lp: dict, act, topi: jax.Array, topw: jax.Array,
            E: int, quant_fmt, mesh) -> jax.Array:
    """Expert-parallel combine: each device owns E/tp experts and runs the
    sorted-token grouped GEMM over its LOCAL expert range only — FLOPs per
    device ∝ top_k/tp, not E (ref: fused_moe/layer.py:432 EP dispatch;
    redesigned as shard_map + megablox with the roll-to-local trick
    instead of NCCL all-to-all). Quantized experts run a local expert scan
    (dequant GEMMs can't ride the grouped kernel) — FLOPs ∝ E/tp per
    device. Both end in one psum over the expert axis."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P
    assert mesh is not None, "expert parallelism needs the device mesh"
    axis = "tp"
    ntp = dict(zip(mesh.axis_names, mesh.devices.shape)).get(axis, 1)
    if E % ntp:
        raise ValueError(f"num_experts {E} must divide by tp={ntp} for EP")
    T, k = topi.shape
    M = T * k
    flat_e = topi.reshape(-1)
    order = jnp.argsort(flat_e, stable=True)
    src_tok = order // k
    x_sorted = jnp.take(h, src_tok, axis=0)
    group_sizes = jnp.bincount(flat_e, length=E).astype(jnp.int32)
    w_sorted = jnp.take(topw.reshape(-1), order)
    weights = {kk: lp[kk] for kk in ("we_gate", "we_up", "we_down")}
    wspec = jax.tree.map(lambda _: P(axis), weights)

    def per_shard(h_rep, xs_rep, gsz, topi_r, topw_r, ws):
        d = jax.lax.axis_index(axis)
        wg, wu, wd = ws["we_gate"], ws["we_up"], ws["we_down"]
        E_local = (wg["qweight"] if isinstance(wg, dict) else wg).shape[0]
        offset = d * E_local
        if quant_fmt is not None:
            # Local expert scan with quantized leaves; gates use global ids.
            def expert(acc, xs2):
                ws_e, e_local = xs2
                y = act(apply_linear(h_rep, ws_e["we_gate"],
                                     fmt=quant_fmt),
                        apply_linear(h_rep, ws_e["we_up"], fmt=quant_fmt))
                y = apply_linear(y, ws_e["we_down"], fmt=quant_fmt)
                gid = offset + e_local
                gate = jnp.sum(jnp.where(topi_r == gid, topw_r, 0.0),
                               axis=-1)
                return acc + gate[:, None] * y, None
            acc, _ = jax.lax.scan(
                expert, jnp.zeros_like(h_rep),
                ({"we_gate": wg, "we_up": wu, "we_down": wd},
                 jnp.arange(E_local, dtype=jnp.int32)))
            return jax.lax.psum(acc, axis)
        # Grouped GEMM over the local expert range: roll the globally
        # sorted rows so this shard's range starts at row 0, run the
        # group GEMMs with the local sizes (rows past the local range are
        # untouched garbage), mask, roll back, psum.
        local_sizes = jax.lax.dynamic_slice(gsz, (offset,), (E_local,))
        start = jnp.sum(jnp.where(jnp.arange(E) < offset, gsz, 0))
        n_local = jnp.sum(local_sizes)
        xs = jnp.roll(xs_rep, -start, axis=0)
        import os
        interpret = os.environ.get("APHRODITE_PALLAS_INTERPRET",
                                   "0") == "1"
        if jax.default_backend() == "tpu" or interpret:
            from jax.experimental.pallas.ops.tpu.megablox import gmm

            def tile(dim):
                return 128 if dim % 128 == 0 else dim
            tm = min(128, xs.shape[0])

            def run(x2, w2, n_dim):
                return gmm(x2, w2, local_sizes,
                           preferred_element_type=jnp.float32,
                           tiling=(tm, tile(w2.shape[1]), tile(n_dim)),
                           interpret=interpret).astype(h.dtype)
            g = run(xs, wg, wg.shape[-1])
            u = run(xs, wu, wu.shape[-1])
            y = run(act(g, u), wd, wd.shape[-1])
        else:
            g = jax.lax.ragged_dot(
                xs, wg, local_sizes,
                preferred_element_type=jnp.float32).astype(h.dtype)
            u = jax.lax.ragged_dot(
                xs, wu, local_sizes,
                preferred_element_type=jnp.float32).astype(h.dtype)
            y = jax.lax.ragged_dot(
                act(g, u), wd, local_sizes,
                preferred_element_type=jnp.float32).astype(h.dtype)
        rows = jnp.arange(M)
        y = jnp.where((rows < n_local)[:, None], y, 0)
        y = jnp.roll(y, start, axis=0)
        return jax.lax.psum(y, axis)

    fn = shard_map(per_shard, mesh=mesh,
                   in_specs=(P(), P(), P(), P(), P(), wspec),
                   out_specs=P(), check_rep=False)
    y = fn(h, x_sorted, group_sizes, topi, topw, weights)
    if quant_fmt is not None:
        return y  # scan path already combined per token
    out = jnp.zeros_like(h)
    return out.at[src_tok].add(y * w_sorted[:, None])


def _grouped_moe(h: jax.Array, lp: dict, act, topi: jax.Array,
                 topw: jax.Array, E: int) -> jax.Array:
    """Sorted-token grouped expert GEMM.

    Flatten the (token, choice) pairs, sort rows by expert id, run the
    three expert projections as ragged group GEMMs, then weight and
    scatter-add back per token. M = T*top_k rows of work total — the
    top-k sparsity gain the dense einsum discarded.
    """
    import os
    T, k = topi.shape
    M = T * k
    flat_e = topi.reshape(-1)
    order = jnp.argsort(flat_e, stable=True)
    src_tok = order // k                                   # [M]
    x_sorted = jnp.take(h, src_tok, axis=0)                # [M, H]
    group_sizes = jnp.bincount(flat_e, length=E).astype(jnp.int32)

    backend = jax.default_backend()
    interpret = os.environ.get("APHRODITE_PALLAS_INTERPRET", "0") == "1"
    if backend == "tpu" or interpret:
        # Megablox grouped-GEMM Pallas kernel (jax.experimental): tiles of
        # sorted rows hit only their group's expert weights on the MXU.
        from jax.experimental.pallas.ops.tpu.megablox import gmm

        def tile(d):
            return 128 if d % 128 == 0 else d

        M_pad = -(-M // 128) * 128 if M >= 128 else M
        if M_pad != M:
            x_sorted = jnp.pad(x_sorted, ((0, M_pad - M), (0, 0)))
        H = h.shape[1]
        I = lp["we_gate"].shape[-1]
        tm = min(128, M_pad)

        def run(x, w, n_dim):
            out = gmm(x, w, group_sizes,
                      preferred_element_type=jnp.float32,
                      tiling=(tm, tile(w.shape[1]), tile(n_dim)),
                      interpret=interpret)
            return out.astype(h.dtype)

        g = run(x_sorted, lp["we_gate"], I)
        u = run(x_sorted, lp["we_up"], I)
        y = run(act(g, u), lp["we_down"], H)[:M]
    else:
        # CPU fallback: lax.ragged_dot (dense-masked lowering — correct,
        # and fine for host tests).
        g = jax.lax.ragged_dot(
            x_sorted, lp["we_gate"], group_sizes,
            preferred_element_type=jnp.float32).astype(h.dtype)
        u = jax.lax.ragged_dot(
            x_sorted, lp["we_up"], group_sizes,
            preferred_element_type=jnp.float32).astype(h.dtype)
        y = jax.lax.ragged_dot(
            act(g, u), lp["we_down"], group_sizes,
            preferred_element_type=jnp.float32).astype(h.dtype)
    w_sorted = jnp.take(topw.reshape(-1), order)
    out = jnp.zeros_like(h)
    return out.at[src_tok].add(y * w_sorted[:, None])


def softmax_topk_routing(h: jax.Array, router: jax.Array, top_k: int,
                         norm_topk: bool) -> tuple[jax.Array, jax.Array]:
    """Mixtral-style routing: softmax over all logits, take top-k, optionally
    renormalize the selected weights to sum 1."""
    logits = jnp.dot(h, router, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    topw, topi = jax.lax.top_k(probs, top_k)
    if norm_topk:
        topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
    return topi, topw


def sparsemixer_routing(h: jax.Array, router: jax.Array,
                        jitter_eps: float) -> tuple[jax.Array, jax.Array]:
    """PhiMoE inference routing (HF modeling_phimoe.sparsemixer, top_k=2):
    each of the two selections is an argmax whose weight is the softmax of
    the *threshold-masked* logits at that argmax; the second round masks the
    first winner to -inf. Weights are NOT renormalized."""
    scores = jnp.dot(h, router, preferred_element_type=jnp.float32)

    def pick(s, orig):
        m = jnp.max(s, axis=-1, keepdims=True)
        factor = jnp.maximum(jnp.abs(orig), m)
        masked_out = ((m - s) / factor) > (2 * jitter_eps)
        masked = jnp.where(masked_out, -jnp.inf, s)
        idx = jnp.argmax(s, axis=-1)
        w = jnp.take_along_axis(jax.nn.softmax(masked, axis=-1),
                                idx[:, None], axis=-1)[:, 0]
        return idx, w

    i1, w1 = pick(scores, scores)
    scores2 = scores.at[jnp.arange(scores.shape[0]), i1].set(-jnp.inf)
    i2, w2 = pick(scores2, scores)
    return (jnp.stack([i1, i2], axis=-1).astype(jnp.int32),
            jnp.stack([w1, w2], axis=-1))
