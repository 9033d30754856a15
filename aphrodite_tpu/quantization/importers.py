"""Checkpoint importers for quantization formats without a native TPU
runtime layout: each transforms the raw weights iterator.

Formats handled by *dequantizing at load* (the TPU answer to CUDA-kernel
formats — serve in the model dtype, or recompress on the fly by passing an
explicit --quantization):

- bitsandbytes 4-bit (NF4/FP4 double-quantized blockwise; reference
  model_loader/loader.py:1081 _quantized_4bit_generator)
- bitsandbytes 8-bit (int8 + SCB row scales; reference loader.py:1053)
- ModelOpt FP8 (per-tensor scale; reference quantization/modelopt.py:58)
- ModelOpt NVFP4 (e2m1 nibbles + fp8 16-block scales + global scale;
  reference quantization/modelopt.py:209)

HQQ keeps its 4-bit layout: it is uniform-affine int4 (group 64) and maps
exactly onto the native w4a16 runtime format (reference
quantization/hqq_marlin.py:105 repacks to GPTQ the same way).
"""
from __future__ import annotations

import json
from typing import Iterable, Iterator, Tuple

import numpy as np

Weight = Tuple[str, np.ndarray]

# e2m1 magnitude table indexed by the low 3 bits; bit 3 is the sign.
E2M1 = np.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0], np.float32)


# ------------------------------------------------------------------ 4-bit bnb
def _dequant_bnb4(packed: np.ndarray, side: dict, prefix: str) -> np.ndarray:
    """Dequantize one bitsandbytes 4-bit tensor.

    packed: uint8 [N/2(, 1)] — high nibble = element 2i, low = 2i+1.
    side holds '<prefix>.absmax', '.quant_map', optionally '.nested_absmax',
    '.nested_quant_map', and '.quant_state.bitsandbytes__nf4|fp4' (uint8
    JSON bytes with blocksize/shape/nested_offset).
    """
    state_key = next((k for k in side
                      if k.startswith(prefix + ".quant_state.")), None)
    if state_key is None:
        raise ValueError(f"missing bnb quant_state for {prefix}")
    state = json.loads(bytes(side[state_key].astype(np.uint8).tolist()))
    blocksize = int(state.get("blocksize", 64))
    shape = state["shape"]
    quant_map = np.asarray(side[prefix + ".quant_map"], np.float32)
    absmax = np.asarray(side[prefix + ".absmax"])
    if prefix + ".nested_absmax" in side:  # double quantization
        nested_absmax = np.asarray(side[prefix + ".nested_absmax"],
                                   np.float32)
        nested_map = np.asarray(side[prefix + ".nested_quant_map"],
                                np.float32)
        nb = int(state.get("nested_blocksize", 256))
        offset = float(state.get("nested_offset", 0.0))
        codes = absmax.astype(np.int64).reshape(-1)
        blk = np.arange(codes.size) // nb
        absmax = nested_map[codes] * nested_absmax[blk] + offset
    else:
        absmax = absmax.astype(np.float32).reshape(-1)
    p = packed.astype(np.uint8).reshape(-1)
    nibbles = np.empty(p.size * 2, np.int64)
    nibbles[0::2] = p >> 4
    nibbles[1::2] = p & 0xF
    n = int(np.prod(shape))
    nibbles = nibbles[:n]
    vals = quant_map[nibbles] * absmax[np.arange(n) // blocksize]
    return vals.reshape(shape).astype(np.float32)


def bnb4_dequant_iterator(weights: Iterable[Weight]) -> Iterator[Weight]:
    """Two-pass: collect side tensors, then dequantize each packed weight."""
    items = list(weights)  # bnb state must be matched across files
    side_suffixes = ("absmax", "quant_map", "nested_absmax",
                     "nested_quant_map")
    side = {}
    packed = {}
    for name, w in items:
        tail = name.split(".")[-1]
        if "quant_state.bitsandbytes" in name or tail in side_suffixes:
            side[name] = np.asarray(w)
        else:
            packed[name] = w
    for name, w in packed.items():
        if name + ".quant_state.bitsandbytes__nf4" in side or \
                name + ".quant_state.bitsandbytes__fp4" in side:
            yield name, _dequant_bnb4(np.asarray(w), side, name)
        else:
            yield name, w


def bnb8_dequant_iterator(weights: Iterable[Weight]) -> Iterator[Weight]:
    """bitsandbytes 8-bit: '<name>' int8 rows + '<name>.SCB' (or sibling
    .SCB spelling) per-row absmax; W = int8 * SCB / 127."""
    items = list(weights)
    scb = {}
    rest = []
    for name, w in items:
        if name.lower().endswith(".scb"):
            scb[name[:-len(".SCB")].lower()] = np.asarray(w, np.float32)
        elif name.endswith(".weight_format"):
            continue
        else:
            rest.append((name, w))
    for name, w in rest:
        key = name.lower()
        if key in scb:
            w = np.asarray(w, np.float32) * (scb[key][:, None] / 127.0)
        yield name, w


# ----------------------------------------------------------------- modelopt
def modelopt_fp8_dequant_iterator(weights: Iterable[Weight]
                                  ) -> Iterator[Weight]:
    """ModelOpt FP8: weight(e4m3) * weight_scale(per-tensor). Dequantized
    here; per-channel FP8 recompression happens on the fly downstream."""
    items = list(weights)
    scales = {n[:-len("_scale")]: np.float32(np.asarray(w).reshape(-1)[0])
              for n, w in items if n.endswith(".weight_scale")}
    import ml_dtypes
    for name, w in items:
        if name.endswith((".weight_scale", ".input_scale",
                          ".weight_scale_2")):
            continue
        w = np.asarray(w)
        if name in scales and w.dtype == ml_dtypes.float8_e4m3fn:
            yield name, w.astype(np.float32) * scales[name]
        else:
            yield name, w


def nvfp4_dequant_iterator(weights: Iterable[Weight]) -> Iterator[Weight]:
    """ModelOpt NVFP4: weight uint8 [out, in/2] (two e2m1 nibbles, low
    nibble = even element), weight_scale e4m3 [out, in/16] per-16-block,
    weight_scale_2 fp32 scalar."""
    items = list(weights)
    by_name = dict(items)
    for name, w in items:
        if name.endswith((".weight_scale", ".weight_scale_2",
                          ".input_scale")):
            continue
        w = np.asarray(w)
        sname, s2name = name + "_scale", name + "_scale_2"
        if w.dtype == np.uint8 and sname in by_name:
            out, half = w.shape
            nib = np.empty((out, half * 2), np.uint8)
            nib[:, 0::2] = w & 0xF
            nib[:, 1::2] = w >> 4
            mag = E2M1[(nib & 0x7).astype(np.int64)]
            sign = np.where(nib & 0x8, -1.0, 1.0).astype(np.float32)
            vals = mag * sign
            bs = np.asarray(by_name[sname]).astype(np.float32)  # [out, in/16]
            s2 = np.float32(np.asarray(by_name[s2name]).reshape(-1)[0]) \
                if s2name in by_name else np.float32(1.0)
            vals = vals.reshape(out, -1, 16) * bs[:, :, None] * s2
            yield name, vals.reshape(out, -1)
        else:
            yield name, w


# ------------------------------------------------- compressed-tensors pack
def ct_pack8_dequant_iterator(weights: Iterable[Weight],
                              symmetric: bool = False) -> Iterator[Weight]:
    """compressed-tensors pack-quantized int8 (llm-compressor w8a16 with
    format=pack-quantized): '<module>.weight_packed' int32 [out, in/4]
    (4 consecutive values per word, little-endian bytes; stored biased by
    128 when symmetric — reference quant_utils.py:151 +
    compressed_tensors_wNa16.py:25-27) + '.weight_scale' [out, G].
    Dequantizes to fp32 '<module>.weight'; per-channel w8a16 recompression
    happens downstream (near-lossless: channel scales are at least as fine
    as the stored group scales after dequant)."""
    items = list(weights)
    by_name = dict(items)
    for name, w in items:
        if name.endswith((".weight_scale", ".weight_zero_point",
                          ".weight_shape", ".weight_g_idx", ".input_scale")):
            continue
        if not name.endswith(".weight_packed"):
            yield name, w
            continue
        mod = name[:-len(".weight_packed")]
        qp = np.asarray(w)
        out, kw = qp.shape
        k = kw * 4
        shifts = np.arange(4, dtype=np.uint32) * 8
        q = ((qp.astype(np.uint32)[:, :, None] >> shifts[None, None, :])
             & 0xFF).astype(np.float32).reshape(out, k)
        scales = np.asarray(by_name[mod + ".weight_scale"],
                            np.float32).reshape(out, -1)
        G = scales.shape[1]
        zp = by_name.get(mod + ".weight_zero_point")
        if symmetric or zp is None or not np.asarray(zp).size:
            # uint8b128 bias; a serialized all-zeros zp on a symmetric
            # scheme must not override it (see unpack_ct_packed).
            z = np.full((out, G), 128.0, np.float32)
        else:
            zp = np.asarray(zp)
            z = ((zp.astype(np.uint32)[:, None, :] >> shifts[None, :, None])
                 & 0xFF).astype(np.float32).reshape(out, G)
        g_idx = by_name.get(mod + ".weight_g_idx")
        if g_idx is not None and len(g_idx):
            gi = np.asarray(g_idx, np.int64)  # column -> group
        else:
            gi = np.arange(k) // (k // G)
        yield mod + ".weight", (q - z[:, gi]) * scales[:, gi]


# ---------------------------------------------------------------------- HQQ
def unpack_hqq(parts: dict, out_features: int) -> dict:
    """HQQ tensors (W_q packed uint8 half-rows; zero/scale stored
    [n_groups, 1] and reshaped [out, G] like the reference's
    HQQZeroScaleParameter) -> native w4a16 dict. Dequant semantics:
    W = (q - zero) * scale, groups along the input dim
    (reference hqq_marlin.py:105-176)."""
    wq = np.asarray(parts["W_q"], np.uint8)
    zero = np.asarray(parts["zero"], np.float32)
    scale = np.asarray(parts["scale"], np.float32)
    step, cols = wq.shape
    flat = np.empty((2 * step, cols), np.uint8)
    flat[:step] = wq >> 4
    flat[step:] = wq & 0xF
    # [out, in] row-major, like the reference's reshape(output_shape, -1).
    total = flat.size
    out = out_features
    if total % out:
        raise ValueError("HQQ weight size does not divide out_features")
    k = total // out
    q = flat.reshape(out, k).astype(np.int8)
    G = zero.size // out
    return {"format": "w4a16", "qweight": np.ascontiguousarray(q.T),
            "scales": np.ascontiguousarray(scale.reshape(out, G).T),
            "zeros": np.ascontiguousarray(zero.reshape(out, G).T),
            "group_size": k // G, "out_features": out}


# ------------------------------------------------------------------- Marlin
def _marlin_weight_perm() -> np.ndarray:
    """The 1024-entry intra-supertile column permutation the Marlin CUDA
    kernel bakes into serialized checkpoints (reference
    quantization/utils/marlin_utils_test.py:65 get_weight_perm, 4-bit):
    each warp lane's ldmatrix fragment layout, tiled 4x across the
    supertile, then the dequant interleave [0,2,4,6,1,3,5,7]."""
    perm = []
    for i in range(32):
        lane = []
        col = i // 4
        for block in (0, 1):
            for row in (2 * (i % 4), 2 * (i % 4) + 1,
                        2 * (i % 4 + 4), 2 * (i % 4 + 4) + 1):
                lane.append(16 * row + col + 8 * block)
        for j in range(4):
            perm.extend(p + 256 * j for p in lane)
    perm = np.array(perm)
    interleave = np.array([0, 2, 4, 6, 1, 3, 5, 7])
    return perm.reshape(-1, 8)[:, interleave].ravel()


def unpack_marlin(B: np.ndarray, s: np.ndarray) -> dict:
    """Serialized Marlin checkpoint (B int32 [K/16, N*16/8], s fp16 scales)
    -> native w4a16 dict. Marlin is tile-permuted symmetric GPTQ (implicit
    zero point 8): invert the nibble pack, the column permutation, and the
    16x16 tiling (reference quantization/marlin.py:220 B/s tensors;
    marlin_utils_test.py:30 marlin_permute_weights)."""
    B = np.asarray(B)
    s = np.asarray(s, np.float32)
    Kt, Nw = B.shape          # [K/16, N*16/8]
    N = Nw * 8 // 16
    K = Kt * 16
    # nibble unpack: word holds columns c, c+8N/8... interleaved by shift
    shifts = np.arange(8, dtype=np.uint32) * 4
    qw = np.zeros((Kt, Nw * 8), np.uint8)
    unpacked = (B.astype(np.uint32)[:, :, None] >> shifts[None, None, :]
                ) & 0xF
    for i in range(8):
        qw[:, i::8] = unpacked[:, :, i].astype(np.uint8)
    # invert the 1024-wide column permutation
    perm = _marlin_weight_perm()
    inv = np.argsort(perm)
    qw = qw.reshape(-1, 1024)[:, inv].reshape(Kt, N * 16)
    # invert the 16x16 tiling: [K/16, N/16, 16, 16] -> [K, N]
    qw = qw.reshape(Kt, N // 16, 16, 16).transpose(0, 2, 1, 3).reshape(K, N)
    # invert the scale permutation (marlin_utils.py:204 get_scale_perms)
    scale_perm = np.array([i + 8 * j for i in range(8) for j in range(8)])
    scale_perm_single = np.array(
        [2 * i + j for i in range(4) for j in (0, 1, 8, 9, 16, 17, 24, 25)])
    G = s.size // N
    if G > 1:
        s = s.reshape(-1, 64)[:, np.argsort(scale_perm)].reshape(G, N)
    else:
        s = s.reshape(-1, 32)[:, np.argsort(scale_perm_single)].reshape(1, N)
    zeros = np.full((G, N), 8.0, np.float32)
    return {"format": "w4a16", "qweight": qw.astype(np.int8),
            "scales": s, "zeros": zeros,
            "group_size": K // G, "out_features": N}
