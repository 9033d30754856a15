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
                num_experts: int | None = None) -> jax.Array:
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
        if quant_fmt is not None:
            raise NotImplementedError(
                "expert parallelism with quantized experts: follow-up")
        gates = jnp.sum(
            topw[:, :, None] * jax.nn.one_hot(topi, E, dtype=h.dtype),
            axis=1)  # [T, E]
        g = jnp.einsum("th,ehi->eti", h, lp["we_gate"],
                       preferred_element_type=jnp.float32).astype(h.dtype)
        u = jnp.einsum("th,ehi->eti", h, lp["we_up"],
                       preferred_element_type=jnp.float32).astype(h.dtype)
        y = jnp.einsum("eti,eio->eto", act(g, u), lp["we_down"],
                       preferred_element_type=jnp.float32).astype(h.dtype)
        return jnp.einsum("te,eto->to", gates, y)

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
