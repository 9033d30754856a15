"""Quantized weight loading: on-the-fly quantization of fp checkpoints and
repacking of GPTQ/AWQ packed checkpoints into the TPU layouts.

Parity: the reference's load-time repack (gptq_marlin.py:329) and
quantize-on-load (fp8.py) paths — SURVEY.md §2.6.
"""
from __future__ import annotations

from typing import Iterable, Optional

import numpy as np

from aphrodite_tpu.quantization.base import (QUANTIZABLE, QuantizationConfig,
                                             unpack_awq, unpack_gptq)
from aphrodite_tpu.utils import logger


def quantize_stacked_params(params: dict, qcfg: QuantizationConfig,
                            model=None) -> dict:
    """Quantize an fp parameter tree's linear layers (stacked [L, in, out],
    or [L, E, in, out] expert stacks — reference experts_int8 semantics)
    into quantized-weight dicts. Targets come from model.quant_targets()
    when defined: a list of (container key, param key) pairs.

    Runs the math on the JAX *CPU* backend (jitted, multi-threaded) — plain
    numpy with ml_dtypes bf16 conversion is ~20 minutes for an 8B-class
    model on small hosts; this path is seconds."""
    import time

    import jax
    import jax.numpy as jnp

    cpu = jax.local_devices(backend="cpu")[0]
    t0 = time.time()

    @jax.jit
    def q_int8(w):
        w = w.astype(jnp.float32)
        scale = jnp.maximum(jnp.max(jnp.abs(w), axis=1) / 127.0, 1e-8)
        q = jnp.clip(jnp.round(w / scale[:, None, :]), -128,
                     127).astype(jnp.int8)
        return q, scale

    @jax.jit
    def q_fp8(w):
        w = w.astype(jnp.float32)
        scale = jnp.maximum(jnp.max(jnp.abs(w), axis=1) / 448.0, 1e-8)
        q = (w / scale[:, None, :]).astype(jnp.float8_e4m3fn)
        return q, scale

    def q_int4(w, g):
        L, K, N = w.shape
        G = K // g

        @jax.jit
        def f(w):
            wg = w.astype(jnp.float32).reshape(L, G, g, N)
            wmax = jnp.max(wg, axis=2)
            wmin = jnp.min(wg, axis=2)
            scale = jnp.maximum((wmax - wmin) / 15.0, 1e-8)
            zero = jnp.clip(jnp.round(-wmin / scale), 0, 15)
            q = jnp.clip(jnp.round(wg / scale[:, :, None, :]) +
                         zero[:, :, None, :], 0, 15).astype(jnp.int8)
            return q.reshape(L, K, N), scale, zero
        return f(w)

    if model is not None and hasattr(model, "quant_targets"):
        targets = model.quant_targets()
    else:
        targets = [("layers", k) for k in QUANTIZABLE]
    done = []
    with jax.default_device(cpu):
        for container, key in targets:
            sub = params.get(container)
            w = sub.get(key) if sub is not None else None
            if w is None:
                continue
            w = jnp.asarray(w)  # host cpu array (bf16 stays bf16)
            lead = w.shape[:-2]  # [L] or [L, E]
            K, N = w.shape[-2:]
            w = w.reshape((-1, K, N))
            if qcfg.method in ("int8", "w8a16"):
                q, scale = q_int8(w)
                sub[key] = {"qweight": np.asarray(q).reshape(*lead, K, N),
                            "scales": np.asarray(scale).reshape(*lead, N)}
            elif qcfg.method == "fp8":
                q, scale = q_fp8(w)
                sub[key] = {
                    "qweight": np.asarray(q).reshape(*lead, K, N),
                    "weight_scale": np.asarray(scale).reshape(*lead, N)}
            elif qcfg.method == "fpx":
                from aphrodite_tpu.quantization.base import fpx_encode
                mbits = qcfg.weight_bits - qcfg.exp_bits - 1
                codes = np.empty(w.shape, np.uint8)
                scales = np.empty(w.shape[:1] + (N,), np.float32)
                for i in range(w.shape[0]):
                    codes[i], scales[i] = fpx_encode(
                        np.asarray(w[i], np.float32), qcfg.exp_bits, mbits)
                sub[key] = {"qweight": codes.reshape(*lead, K, N),
                            "scales": scales.reshape(*lead, N)}
            elif qcfg.method in ("gptq", "awq"):
                if len(lead) > 1:
                    raise NotImplementedError(
                        "w4a16 on expert stacks: follow-up (use int8/"
                        "w8a16/fp8 for MoE)")
                g = qcfg.group_size if 0 < qcfg.group_size <= K else K
                q, scale, zero = q_int4(w, g)
                sub[key] = {"qweight": np.asarray(q),
                            "scales": np.asarray(scale),
                            "zeros": np.asarray(zero)}
            else:
                raise ValueError(qcfg.method)
            done.append(key)
    if qcfg.lm_head_quantized and isinstance(params.get("lm_head"),
                                             (np.ndarray, jnp.ndarray)):
        # Per-channel int8 regardless of the layer method: the lm_head is
        # quality-sensitive and per-channel W8A16 is near-lossless while
        # halving the decode-dominant [H, V] stream (reference gptq
        # quantizes lm_head at the layer bit-width; we are deliberately
        # conservative).
        with jax.default_device(cpu):
            w = jnp.asarray(params["lm_head"])[None]       # [1, H, V]
            q, scale = q_int8(w)
        params["lm_head"] = {"qweight": np.asarray(q[0]),
                             "scales": np.asarray(scale[0])}
        if model is not None:
            model.lm_head_quant_fmt = "w8a16"
        done.append("lm_head")
    logger.info("quantized %s on the fly (%s) in %.1fs", done,
                qcfg.method, time.time() - t0)
    return params


# HF projection-name -> our stacked key (llama family).
_PROJ_MAP = {
    "self_attn.q_proj": "wq",
    "self_attn.k_proj": "wk",
    "self_attn.v_proj": "wv",
    "self_attn.o_proj": "wo",
    "mlp.gate_proj": "w_gate",
    "mlp.up_proj": "w_up",
    "mlp.down_proj": "w_down",
}
_QPARTS = ("qweight", "qzeros", "scales", "g_idx", "bias",
           # compressed-tensors naming (llm-compressor checkpoints)
           "weight", "weight_scale", "weight_scale_inv",
           "weight_zero_point", "input_scale",
           "weight_packed", "weight_shape", "weight_g_idx",
           # HQQ naming
           "W_q", "zero", "scale",
           # serialized-Marlin naming (reference quantization/marlin.py:220)
           "B", "s")


def _unpack_compressed(parts: dict, method: str, out_dtype) -> dict:
    """compressed-tensors int8/fp8 tensors -> native format dicts
    (weight [out, in] + weight_scale [out,1]|scalar)."""
    w = parts["weight"]
    scale = np.asarray(parts.get("weight_scale", 1.0), np.float32)
    out = w.shape[0]
    scale = np.broadcast_to(scale.reshape(-1), (out,)) \
        if scale.size in (1, out) else scale.reshape(out)
    zp = parts.get("weight_zero_point")
    if zp is not None and np.any(np.asarray(zp)):
        raise ValueError("asymmetric compressed-tensors weights are not "
                         "supported (symmetric int8/fp8 only)")
    if method == "fp8":
        import ml_dtypes
        d = {"qweight": w.T.astype(ml_dtypes.float8_e4m3fn),
             "weight_scale": scale.astype(np.float32)}
        if parts.get("input_scale") is not None:
            d["input_scale"] = np.asarray(
                np.asarray(parts["input_scale"]).reshape(-1)[0], np.float32)
        return d
    return {"qweight": w.T.astype(np.int8),
            "scales": scale.astype(np.float32)}


def _normalize_block_scales(scale: np.ndarray, K: int, N: int,
                            block: Optional[tuple]) -> np.ndarray:
    """Blockwise scale grid [ceil(K/b0), ceil(N/b1)] -> an exact-division
    grid the runtime can map back to elements without knowing the block
    size. DeepSeek checkpoints ceil-divide the grid, so a ragged last block
    makes K // grid_rows ambiguous (96 rows over 2 blocks could be 48+48 or
    64+32). Expand the ragged axis by gcd(b, K mod b): rows become
    [b/g]*(full blocks) + [r/g] copies of each scale, giving a grid where
    K % rows == 0 and block boundaries land exactly."""
    Kb, Nb = scale.shape

    def _expand(s, dim, b, axis):
        nblk = s.shape[axis]
        if b is None:  # no config: infer only when division is exact
            if dim % nblk == 0:
                return s
            raise ValueError(
                f"ragged blockwise scale grid ({nblk} blocks over {dim}) "
                "needs weight_block_size from the quant config")
        r = dim - (nblk - 1) * b
        if r == b:
            return s  # exact grid already
        import math
        g = math.gcd(b, r)
        reps = [b // g] * (nblk - 1) + [r // g]
        return np.repeat(s, reps, axis=axis)

    b0, b1 = (block or (None, None))
    # checkpoint grid is [out-blocks, in-blocks] pre-transpose; here scale
    # is already transposed to [K-blocks, N-blocks] = [in, out] order, and
    # weight_block_size is (out_block, in_block) per DeepSeek convention.
    scale = _expand(scale, K, b1, 0)
    scale = _expand(scale, N, b0, 1)
    return scale


def _unpack_fp8_native(parts: dict, qcfg) -> dict:
    """HF quant_method=fp8 checkpoints (DeepSeek-V3 style): weight f8e4m3
    [out, in] + weight_scale_inv blockwise [out/b0, in/b1] (or per-tensor
    weight_scale) + optional static input_scale."""
    import ml_dtypes
    w = np.asarray(parts["weight"])
    d = {"qweight": w.T.astype(ml_dtypes.float8_e4m3fn)}
    scale = parts.get("weight_scale_inv")
    if scale is not None:
        s = np.asarray(scale, np.float32).T
        d["weight_scale_block"] = _normalize_block_scales(
            s, w.shape[1], w.shape[0],
            getattr(qcfg, "weight_block_size", None))
    else:
        scale = np.asarray(parts.get("weight_scale", 1.0), np.float32)
        out = w.shape[0]
        d["weight_scale"] = (np.broadcast_to(scale.reshape(-1), (out,))
                             if scale.size in (1, out)
                             else scale.reshape(out)).astype(np.float32)
    if parts.get("input_scale") is not None:
        d["input_scale"] = np.asarray(
            np.asarray(parts["input_scale"]).reshape(-1)[0], np.float32)
    return d


def load_llama_quantized(model, weights: Iterable[tuple[str, np.ndarray]],
                         qcfg: QuantizationConfig) -> dict:
    """Load a GPTQ/AWQ-packed llama-family checkpoint: collect the packed
    tensors per (layer, projection), unpack into the w4a16 layout, stack."""
    import jax.numpy as jnp
    import ml_dtypes
    target = (np.dtype("bfloat16") if model.dtype == jnp.bfloat16
              else np.dtype(jnp.dtype(model.dtype).name))
    raw: dict[tuple[int, str], dict[str, np.ndarray]] = {}
    params: dict = {}
    other: dict[str, np.ndarray] = {}

    for name, w in weights:
        if name == "model.embed_tokens.weight":
            params["embed"] = np.asarray(w).astype(target)
        elif name == "model.norm.weight":
            params["final_norm"] = np.asarray(w).astype(target)
        elif name == "lm_head.weight":
            if not model.tie_embeddings:
                params["lm_head"] = np.asarray(w).T.astype(target)
        elif name.startswith("model.layers."):
            rest = name[len("model.layers."):]
            idx_str, sub = rest.split(".", 1)
            li = int(idx_str)
            matched = False
            for proj, key in _PROJ_MAP.items():
                if sub.startswith(proj + "."):
                    part = sub[len(proj) + 1:]
                    if part in _QPARTS:
                        raw.setdefault((li, key), {})[part] = np.asarray(w)
                        matched = True
                    break
            if not matched:
                leaf = sub.rsplit(".", 1)[-1]
                if sub == "input_layernorm.weight":
                    other[f"input_norm.{li}"] = np.asarray(w)
                elif sub == "post_attention_layernorm.weight":
                    other[f"post_norm.{li}"] = np.asarray(w)
                elif "self_attn" in sub and leaf in ("k_scale", "v_scale",
                                                     "kv_scale"):
                    # Calibrated fp8-KV scales shipped by fp8-serialized
                    # checkpoints (reference quantization/kv_cache.py:10).
                    other[f"{leaf}.{li}"] = np.asarray(w)

    L = model.num_layers
    layers: dict = {}
    for norm in ("input_norm", "post_norm"):
        buf = np.ones((L, model.hidden_size), target)
        for li in range(L):
            t = other.get(f"{norm}.{li}")
            if t is not None:
                buf[li] = t.astype(target)
        layers[norm] = buf
    if any(k.startswith(("k_scale.", "v_scale.", "kv_scale."))
           for k in other):
        ks = np.ones((L,), np.float32)
        vs = np.ones((L,), np.float32)
        for li in range(L):
            both = other.get(f"kv_scale.{li}")
            k_t, v_t = other.get(f"k_scale.{li}"), other.get(f"v_scale.{li}")
            if both is not None:
                ks[li] = vs[li] = float(both.reshape(-1)[0])
            if k_t is not None:
                ks[li] = float(k_t.reshape(-1)[0])
            if v_t is not None:
                vs[li] = float(v_t.reshape(-1)[0])
        if np.any(ks != 1.0) or np.any(vs != 1.0):
            layers["kv_k_scale"] = ks
            layers["kv_v_scale"] = vs

    for key in QUANTIZABLE:
        per_layer = []
        for li in range(L):
            parts = raw.get((li, key))
            if parts is None:
                raise ValueError(f"missing quantized tensors for layer {li} "
                                 f"{key}")
            if qcfg.checkpoint_layout == "ct_packed":
                from aphrodite_tpu.quantization.base import unpack_ct_packed
                unpacked = unpack_ct_packed(parts, bits=qcfg.weight_bits,
                                            symmetric=not qcfg.zero_point)
            elif qcfg.checkpoint_layout == "compressed_tensors":
                unpacked = _unpack_compressed(parts, qcfg.method, target)
            elif qcfg.checkpoint_layout == "fp8_native":
                unpacked = _unpack_fp8_native(parts, qcfg)
            elif qcfg.checkpoint_layout == "marlin":
                from aphrodite_tpu.quantization.importers import \
                    unpack_marlin
                unpacked = unpack_marlin(parts["B"], parts["s"])
            elif qcfg.checkpoint_layout == "hqq":
                from aphrodite_tpu.quantization.importers import unpack_hqq
                out_features = {
                    "wq": model.num_heads * model.head_dim,
                    "wk": model.num_kv_heads * model.head_dim,
                    "wv": model.num_kv_heads * model.head_dim,
                    "wo": model.hidden_size,
                    "w_gate": model.intermediate_size,
                    "w_up": model.intermediate_size,
                    "w_down": model.hidden_size,
                }[key]
                unpacked = unpack_hqq(parts, out_features)
            elif qcfg.method == "gptq":
                unpacked = unpack_gptq(parts["qweight"], parts["qzeros"],
                                       parts["scales"],
                                       bits=qcfg.weight_bits,
                                       g_idx=parts.get("g_idx"))
            else:
                unpacked = unpack_awq(parts["qweight"], parts["qzeros"],
                                      parts["scales"],
                                      bits=qcfg.weight_bits)
            per_layer.append(unpacked)
        common_keys = set(per_layer[0])
        for u in per_layer[1:]:
            common_keys &= set(u)
        stacked = {k: np.stack([u[k] for u in per_layer])
                   for k in common_keys
                   if isinstance(per_layer[0][k], np.ndarray)}
        if any("input_perm" in u for u in per_layer):
            stacked["input_perm"] = np.stack(
                [u.get("input_perm",
                       np.arange(u["qweight"].shape[0], dtype=np.int32))
                 for u in per_layer])
        layers[key] = stacked
    params["layers"] = layers
    if "embed" not in params:
        raise ValueError("checkpoint missing model.embed_tokens.weight")
    return params
