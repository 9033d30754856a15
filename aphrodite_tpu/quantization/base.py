"""Quantization configs + load-time repack into TPU-friendly layouts.

The reference repacks GPTQ/AWQ checkpoints into its CUDA kernels' layouts at
load time (gptq_marlin.py:329 process_weights_after_loading); here the repack
target is plain arrays the XLA/Pallas dequant-matmul consumes:

  w4a16: {"format": "w4a16", "qweight": int8 [in, out] (values 0..15),
          "scales": [G, out], "zeros": [G, out] (float, already scaled? no —
          integer zero points), "group_size": g, "out_features": out}
  w8a16: {"format": "w8a16", "qweight": int8 [in, out], "scales": [out]}
  int8 (W8A8): {"format": "int8", "qweight": int8 [in, out], "scales": [out]}
  fp8:  {"format": "fp8", "qweight": f8e4m3 [in, out], "weight_scale": [out]}
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import numpy as np

from aphrodite_tpu.utils import logger

# Linear-layer param keys that may be quantized (per-layer stacked names used
# by the llama family models).
QUANTIZABLE = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


@dataclasses.dataclass
class QuantizationConfig:
    method: str                  # gptq | awq | int8 | w8a16 | fp8 | fpx
    weight_bits: int = 8
    exp_bits: int = 2            # fpx only: eXmY exponent bits
    group_size: int = -1         # -1 = per-channel (k-wide group)
    desc_act: bool = False       # GPTQ activation reordering (g_idx)
    zero_point: bool = True      # asymmetric (awq) vs symmetric
    lm_head_quantized: bool = False
    # True when the checkpoint itself holds packed tensors (HF
    # quantization_config) vs on-the-fly quantization of an fp checkpoint.
    from_checkpoint: bool = False
    # Packed-tensor naming scheme: "gptq_awq" (qweight/qzeros/scales),
    # "compressed_tensors" (weight int8|f8 + weight_scale), or "hqq"
    # (W_q/zero/scale).
    checkpoint_layout: str = "gptq_awq"
    # Weights-iterator transform applied before loading (bitsandbytes /
    # modelopt checkpoints dequantize at load — quantization/importers.py).
    # method == "dequant" means the runtime stays full precision.
    preprocess: Optional[str] = None
    # FP8 activation quantization (reference quantization/fp8.py:47-80):
    # None = weight-only; "dynamic" = per-token act scales computed
    # in-graph; "static" = per-tensor input_scale from the checkpoint.
    activation_scheme: Optional[str] = None
    # DeepSeek-style 2-D blockwise weight scales, e.g. (128, 128)
    # (reference fp8.py weight_block_size); None = per-output-channel.
    weight_block_size: Optional[tuple] = None

    # ------------------------------------------------------------- detection
    @staticmethod
    def from_hf_config(hf_quant_cfg: dict) -> "QuantizationConfig":
        m = (hf_quant_cfg.get("quant_method") or "").lower()
        if m == "gptq":
            return QuantizationConfig(
                method="gptq",
                weight_bits=hf_quant_cfg.get("bits", 4),
                group_size=hf_quant_cfg.get("group_size", -1),
                desc_act=hf_quant_cfg.get("desc_act", False),
                zero_point=True, from_checkpoint=True)
        if m == "awq":
            return QuantizationConfig(
                method="awq",
                weight_bits=hf_quant_cfg.get("bits", 4),
                group_size=hf_quant_cfg.get("group_size", 128),
                zero_point=hf_quant_cfg.get("zero_point", True),
                from_checkpoint=True)
        if m == "marlin":
            # Serialized Marlin = tile-permuted symmetric GPTQ W4A16
            # (reference quantization/marlin.py); unpacked back to the
            # gptq layout at load (importers.unpack_marlin).
            return QuantizationConfig(
                method="gptq", weight_bits=4,
                group_size=hf_quant_cfg.get("group_size", 128),
                zero_point=False, from_checkpoint=True,
                checkpoint_layout="marlin")
        if m in ("fp8", "fbgemm_fp8"):
            wbs = hf_quant_cfg.get("weight_block_size")
            return QuantizationConfig(
                method="fp8",
                activation_scheme=hf_quant_cfg.get("activation_scheme"),
                weight_block_size=tuple(wbs) if wbs else None,
                from_checkpoint=True, checkpoint_layout="fp8_native")
        if m in ("int8", "tpu_int8", "w8a8"):
            return QuantizationConfig(method="int8")
        if m == "bitsandbytes":
            if hf_quant_cfg.get("load_in_8bit"):
                # int8 rows dequantize, then recompress per-channel w8a16
                # on the fly (near-lossless round trip).
                return QuantizationConfig(method="w8a16", preprocess="bnb8")
            return QuantizationConfig(method="dequant", preprocess="bnb4",
                                      weight_bits=4)
        if m == "hqq":
            wq = ((hf_quant_cfg.get("quant_config") or {})
                  .get("weight_quant_params") or {})
            bits = wq.get("nbits", 4)
            if bits != 4:
                raise ValueError(f"HQQ {bits}-bit not supported (4 only)")
            return QuantizationConfig(
                method="gptq", weight_bits=4,
                group_size=wq.get("group_size", 64),
                from_checkpoint=True, checkpoint_layout="hqq")
        if m == "modelopt":
            algo = ((hf_quant_cfg.get("quantization") or {})
                    .get("quant_algo") or hf_quant_cfg.get("quant_algo")
                    or "").upper()
            if "NVFP4" in algo or "FP4" in algo:
                return QuantizationConfig(method="dequant",
                                          preprocess="nvfp4", weight_bits=4)
            if "FP8" in algo:
                # dequantize the per-tensor-scaled fp8 weights, recompress
                # per-channel fp8 on the fly (strictly finer scales).
                return QuantizationConfig(method="fp8",
                                          preprocess="modelopt_fp8")
            raise ValueError(f"modelopt quant_algo {algo!r} not supported")
        if m == "compressed-tensors":
            # llm-compressor checkpoints (reference:
            # quantization/compressed_tensors/): map the weight/activation
            # scheme onto the native TPU formats. Supported: W8A8 int8
            # (dynamic per-token acts), W8A16 int8 weight-only, FP8, and
            # pack-quantized wNa16 (4-bit -> native w4a16; 8-bit ->
            # dequant at load + per-channel w8a16 recompress).
            groups = hf_quant_cfg.get("config_groups") or {}
            spec = next(iter(groups.values()), {})
            w = spec.get("weights") or {}
            acts = spec.get("input_activations")
            bits = w.get("num_bits", 8)
            wtype = (w.get("type") or "int").lower()
            fmt = (hf_quant_cfg.get("format") or "").lower()
            if fmt == "pack-quantized":
                if wtype != "int" or bits not in (4, 8):
                    raise ValueError(
                        f"pack-quantized {bits}-bit {wtype} not supported")
                if bits == 8:
                    return QuantizationConfig(
                        method="w8a16", preprocess="ct_pack8",
                        zero_point=not w.get("symmetric", True))
                strategy = (w.get("strategy") or "group").lower()
                return QuantizationConfig(
                    method="gptq", weight_bits=4,
                    group_size=(w.get("group_size") or -1)
                    if strategy == "group" else -1,
                    zero_point=not w.get("symmetric", True),
                    # g_idx is only serialized for ActivationOrdering.GROUP
                    # (reference CompressedTensorsWNA16.has_g_idx);
                    # "weight"-ordered checkpoints permute rows offline.
                    desc_act=(w.get("actorder") or "") == "group",
                    from_checkpoint=True, checkpoint_layout="ct_packed")
            if wtype == "float" and bits == 8:
                scheme = None
                if acts:
                    scheme = ("dynamic" if acts.get("dynamic", True)
                              else "static")
                return QuantizationConfig(
                    method="fp8", from_checkpoint=True,
                    activation_scheme=scheme,
                    checkpoint_layout="compressed_tensors")
            if wtype == "int" and bits == 8:
                return QuantizationConfig(
                    method="int8" if acts else "w8a16",
                    from_checkpoint=True,
                    checkpoint_layout="compressed_tensors")
            raise ValueError(
                f"compressed-tensors scheme not supported: "
                f"{bits}-bit {wtype} weights (format {fmt!r})")
        raise ValueError(f"unsupported quantization method {m!r}")

    @staticmethod
    def from_name(name: str) -> "QuantizationConfig":
        name = name.lower()
        if name in ("tpu_int8", "int8"):
            return QuantizationConfig(method="int8")
        if name == "w8a16":
            return QuantizationConfig(method="w8a16")
        if name == "fp8":
            return QuantizationConfig(method="fp8")
        if name in ("fp8_w8a8", "fp8-dynamic", "ptpc_fp8"):
            # Dynamic per-token activation scales (reference ptpc_fp8.py).
            return QuantizationConfig(method="fp8",
                                      activation_scheme="dynamic")
        if name == "gptq":
            return QuantizationConfig(method="gptq", weight_bits=4,
                                      group_size=128)
        if name == "awq":
            return QuantizationConfig(method="awq", weight_bits=4,
                                      group_size=128)
        if name in ("fp4", "fp5", "fp6", "fp7", "quant_llm"):
            # QuantLLM FPx: eXmY floating-point weight grids with
            # per-output-channel absmax scales (reference
            # quantization/fp6.py:29-36 — exp_bits defaults to 2, so
            # fp6 == e2m3).
            bits = 6 if name == "quant_llm" else int(name[2])
            return QuantizationConfig(method="fpx", weight_bits=bits,
                                      exp_bits=2)
        if name == "deepspeedfp":
            # Reference DeepSpeedFPConfig defaults to weight_bits=8
            # (group_size=512, quantization/deepspeedfp.py); 8-bit FP with
            # absmax scales == e4m3 on our eXmY grid.
            return QuantizationConfig(method="fpx", weight_bits=8,
                                      exp_bits=4, group_size=512)
        raise ValueError(f"unknown quantization {name!r}")

    # --------------------------------------------------- quantize-on-the-fly
    def quantize_tensor(self, w: np.ndarray) -> dict:
        """fp checkpoint tensor [in, out] -> quantized weight dict
        (the reference's on-the-fly path, e.g. Fp8Config quantizing fp16
        checkpoints at load, quantization/fp8.py:47-80)."""
        w = np.ascontiguousarray(np.asarray(w, np.float32))
        if self.method in ("int8", "w8a16"):
            scale = np.abs(w).max(axis=0) / 127.0
            scale = np.maximum(scale, 1e-8)
            q = np.clip(np.round(w / scale), -128, 127).astype(np.int8)
            return {"format": "int8" if self.method == "int8" else "w8a16",
                    "qweight": q, "scales": scale.astype(np.float32),
                    "out_features": w.shape[1]}
        if self.method == "fp8":
            import ml_dtypes
            amax = np.abs(w).max(axis=0)
            scale = np.maximum(amax / 448.0, 1e-8)  # e4m3 max normal
            q = (w / scale).astype(ml_dtypes.float8_e4m3fn)
            return {"format": "fp8", "qweight": q,
                    "weight_scale": scale.astype(np.float32),
                    "out_features": w.shape[1]}
        if self.method in ("gptq", "awq"):
            g = self.group_size if self.group_size > 0 else w.shape[0]
            k, n = w.shape
            assert k % g == 0, (k, g)
            wg = w.reshape(k // g, g, n)
            if self.zero_point:  # asymmetric uint4
                wmax = wg.max(axis=1)
                wmin = wg.min(axis=1)
                scale = np.maximum((wmax - wmin) / 15.0, 1e-8)
                zero = np.clip(np.round(-wmin / scale), 0, 15)
                q = np.clip(np.round(wg / scale[:, None, :]) +
                            zero[:, None, :], 0, 15).astype(np.int8)
            else:
                amax = np.abs(wg).max(axis=1)
                scale = np.maximum(amax / 7.0, 1e-8)
                zero = np.full_like(scale, 8.0)
                q = np.clip(np.round(wg / scale[:, None, :]) + 8, 0,
                            15).astype(np.int8)
            return {"format": "w4a16", "qweight": q.reshape(k, n),
                    "scales": scale.astype(np.float32),
                    "zeros": zero.astype(np.float32),
                    "group_size": g, "out_features": n}
        raise ValueError(self.method)


def runtime_format(qcfg: "QuantizationConfig") -> str:
    """The static format tag the model passes to apply_linear."""
    if qcfg.method == "fp8" and qcfg.activation_scheme:
        return "fp8_w8a8"
    if qcfg.method == "fpx":
        m = qcfg.weight_bits - qcfg.exp_bits - 1
        return f"fpx_e{qcfg.exp_bits}m{m}"
    return {"gptq": "w4a16", "awq": "w4a16", "int8": "int8",
            "w8a16": "w8a16", "fp8": "fp8"}[qcfg.method]


def fpx_grid(ebits: int, mbits: int) -> np.ndarray:
    """All non-negative eXmY magnitudes (IEEE-style: denormals at exp==0,
    no inf/nan — the whole exponent range is normal numbers; reference
    fp6_utils.py:185-200)."""
    bias = (1 << (ebits - 1)) - 1
    vals = []
    for e in range(1 << ebits):
        for man in range(1 << mbits):
            if e == 0:
                vals.append(man * 2.0 ** (1 - bias - mbits))
            else:
                vals.append(((1 << mbits) + man) * 2.0 ** (e - bias - mbits))
    return np.asarray(vals, np.float64)


def fpx_encode(w: np.ndarray, ebits: int, mbits: int
               ) -> tuple[np.ndarray, np.ndarray]:
    """Quantize [in, out] fp weights to eXmY codes + per-output-channel
    scales (scale = absmax / max_normal, reference fp6_utils.py:493-504
    to_scaled_tc_fpx). Codes are uint8 sign|exp|mantissa; rounding is
    nearest, ties to even mantissa (RNE, matching the magic-adder path)."""
    w = np.asarray(w, np.float64)
    grid = fpx_grid(ebits, mbits)
    max_normal = grid[-1]
    scale = np.maximum(np.abs(w).max(axis=0) / max_normal, 1e-12)
    x = w / scale[None, :]
    mag = np.abs(x)
    mids = (grid[:-1] + grid[1:]) / 2.0
    idx = np.searchsorted(mids, mag, side="left").astype(np.int64)
    # ties-to-even: an exact midpoint with side="left" landed on the lower
    # code; if that lower code is odd, step up to the even one above.
    tie = (idx < len(mids)) & \
        (mag == np.take(mids, idx, mode="clip")) & ((idx & 1) == 1)
    idx = np.where(tie, idx + 1, idx)
    sign = (x < 0).astype(np.uint8)
    codes = (sign << (ebits + mbits)) | idx.astype(np.uint8)
    return codes, scale.astype(np.float32)


def get_quantization_config(model_config) -> Optional[QuantizationConfig]:
    """Resolve quantization from explicit config or HF checkpoint metadata
    (reference: model_loader/weight_utils.py get_quant_config). ModelOpt
    exports live in a sibling hf_quant_config.json (reference
    modelopt.py get_config_filenames)."""
    import os
    hf_q = getattr(model_config.hf_config, "quantization_config", None)
    if hf_q is None and os.path.isdir(str(model_config.model)):
        import json as _json
        side = os.path.join(str(model_config.model), "hf_quant_config.json")
        if os.path.exists(side):
            with open(side) as f:
                hf_q = _json.load(f)
            hf_q.setdefault("quant_method", "modelopt")
    if hf_q is not None:
        if not isinstance(hf_q, dict):
            hf_q = hf_q.to_dict() if hasattr(hf_q, "to_dict") else dict(
                hf_q.__dict__)
        qcfg = QuantizationConfig.from_hf_config(hf_q)
        if hf_q.get("lm_head") or getattr(model_config,
                                          "quantize_lm_head", False):
            qcfg.lm_head_quantized = True
        if qcfg.preprocess and model_config.quantization and \
                model_config.quantization not in (
                    qcfg.method, "bitsandbytes", "modelopt", "nvfp4",
                    (hf_q.get("quant_method") or "").lower()):
            # Explicit --quantization on a dequantize-at-load checkpoint:
            # recompress on the fly into the requested runtime format.
            qcfg.method = QuantizationConfig.from_name(
                model_config.quantization).method
        return qcfg
    if model_config.quantization:
        qcfg = QuantizationConfig.from_name(model_config.quantization)
        if getattr(model_config, "quantize_lm_head", False):
            qcfg.lm_head_quantized = True
        return qcfg
    return None


# --------------------------------------------------------------------------- #
# GPTQ / AWQ packed-checkpoint repack
# --------------------------------------------------------------------------- #
AWQ_ORDER = [0, 4, 1, 5, 2, 6, 3, 7]


def unpack_gptq(qweight: np.ndarray, qzeros: np.ndarray, scales: np.ndarray,
                bits: int = 4, g_idx: Optional[np.ndarray] = None) -> dict:
    """GPTQ checkpoint tensors -> our w4a16 layout.

    GPTQ packs along the *input* dim: qweight int32 [in/8, out] holds 8
    4-bit rows per word (row-major nibbles); qzeros int32 [G, out/8]
    (checkpoint zeros are stored off-by-one: stored = z - 1 in most GPTQ
    exports; AutoGPTQ v2 dropped that — we follow the modern convention of
    stored == z, matching the reference kernels' `qzeros + 0` handling).
    """
    assert bits == 4, "only 4-bit GPTQ supported"
    pack = 32 // bits
    kw, n = qweight.shape
    k = kw * pack
    shifts = np.arange(pack, dtype=np.uint32) * bits
    # [in/8, 8, out] -> [in, out]
    w = ((qweight.astype(np.uint32)[:, None, :] >> shifts[None, :, None])
         & 0xF).astype(np.int8).reshape(k, n)
    G = qzeros.shape[0]
    z = ((qzeros.astype(np.uint32)[:, :, None] >> shifts[None, None, :])
         & 0xF).astype(np.float32).reshape(G, n)
    out = {"format": "w4a16", "qweight": w,
           "scales": scales.astype(np.float32), "zeros": z,
           "group_size": k // G, "out_features": n}
    if g_idx is not None and len(g_idx) and not np.all(np.diff(g_idx) >= 0):
        # desc_act: rows are visited in g_idx group order. Repack by sorting
        # rows so groups are contiguous; record the permutation applied to
        # the *input* activations.
        perm = np.argsort(g_idx, kind="stable")
        out["qweight"] = w[perm]
        out["input_perm"] = perm.astype(np.int32)
    return out


def unpack_awq(qweight: np.ndarray, qzeros: np.ndarray, scales: np.ndarray,
               bits: int = 4) -> dict:
    """AWQ packs along the *output* dim with the interleaved nibble order
    [0,4,1,5,2,6,3,7]: qweight int32 [in, out/8]."""
    assert bits == 4
    pack = 32 // bits
    k, nw = qweight.shape
    n = nw * pack
    shifts = (np.array(AWQ_ORDER, dtype=np.uint32) * bits)
    order_inv = np.argsort(AWQ_ORDER)
    w = ((qweight.astype(np.uint32)[:, :, None] >> shifts[None, None, :])
         & 0xF).astype(np.int8)
    # nibble j holds logical column AWQ_ORDER.index? Undo interleave:
    w = w[:, :, order_inv].reshape(k, n) if False else w.reshape(k, n)
    # shifts already ordered by logical column via AWQ_ORDER: nibble at
    # shift AWQ_ORDER[j]*4 is logical column j.
    G = qzeros.shape[0]
    z = ((qzeros.astype(np.uint32)[:, :, None] >> shifts[None, None, :])
         & 0xF).astype(np.float32).reshape(G, n)
    return {"format": "w4a16", "qweight": w,
            "scales": scales.astype(np.float32), "zeros": z,
            "group_size": k // G, "out_features": n}


def unpack_ct_packed(parts: dict, bits: int = 4,
                     symmetric: bool = False) -> dict:
    """compressed-tensors pack-quantized (llm-compressor wNa16) -> w4a16.

    weight_packed int32 [out, in/8] holds 8 consecutive input-dim values
    per word, little-endian nibbles (reference
    quantization/utils/quant_utils.py:151 unpack_quantized_values_into_int32
    with packed_dim=1). Symmetric checkpoints store biased-unsigned values
    (uint4b8 — compressed_tensors_wNa16.py:25-27): zero == 2^(bits-1).
    Asymmetric ones pack weight_zero_point [out/8, G] along the output dim.
    weight_scale is [out, G] (group) or [out, 1] (channel); optional
    weight_g_idx [in] carries actorder like GPTQ desc_act.
    """
    assert bits == 4, "only 4-bit pack-quantized reaches the w4a16 runtime"
    pf = 32 // bits
    qp = np.asarray(parts["weight_packed"])
    out, kw = qp.shape
    k = kw * pf
    shifts = np.arange(pf, dtype=np.uint32) * bits
    w = ((qp.astype(np.uint32)[:, :, None] >> shifts[None, None, :])
         & 0xF).astype(np.int8).reshape(out, k)
    scales = np.asarray(parts["weight_scale"], np.float32)
    G = scales.shape[1] if scales.ndim == 2 else 1
    scales = scales.reshape(out, G)
    zp = parts.get("weight_zero_point")
    if symmetric or zp is None or not np.asarray(zp).size:
        # Symmetric schemes store values biased by 2^(bits-1) (uint4b8);
        # a serialized all-zeros zp tensor must NOT override that bias
        # (reference CompressedTensorsWNA16: symmetric flag wins).
        z = np.full((out, G), float(1 << (bits - 1)), np.float32)
    else:
        zp = np.asarray(zp)
        z = ((zp.astype(np.uint32)[:, None, :] >> shifts[None, :, None])
             & 0xF).astype(np.float32).reshape(out, G)
    res = {"format": "w4a16",
           "qweight": np.ascontiguousarray(w.T),
           "scales": np.ascontiguousarray(scales.T),
           "zeros": np.ascontiguousarray(z.T),
           "group_size": k // G, "out_features": out}
    g_idx = parts.get("weight_g_idx")
    if g_idx is not None and len(g_idx) and \
            not np.all(np.diff(np.asarray(g_idx)) >= 0):
        perm = np.argsort(np.asarray(g_idx), kind="stable")
        res["qweight"] = res["qweight"][perm]
        res["input_perm"] = perm.astype(np.int32)
    return res
