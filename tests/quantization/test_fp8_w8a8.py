"""FP8 W8A8: dynamic/static activation quantization and blockwise weight
scales (reference quantization/fp8.py:47-80, kernels/scaled_mm)."""
import numpy as np
import ml_dtypes
import jax.numpy as jnp
import pytest

from aphrodite_tpu.ops.quant_gemm import fp8_matmul
from aphrodite_tpu.quantization.base import (QuantizationConfig,
                                             runtime_format)

F8 = ml_dtypes.float8_e4m3fn


def oracle(x, w8, wscale, xs):
    """Both operands fake-quantized to e4m3, f32 accumulate."""
    xq = (x / xs).astype(F8).astype(np.float32) * xs
    wf = w8.astype(np.float32) * wscale
    return xq @ wf


def test_dynamic_per_token():
    rng = np.random.RandomState(0)
    M, K, N = 4, 64, 32
    x = rng.randn(M, K).astype(np.float32)
    w = rng.randn(K, N).astype(np.float32) * 0.1
    wscale = np.abs(w).max(0) / 448.0
    w8 = (w / wscale).astype(F8)
    got = fp8_matmul(jnp.asarray(x), jnp.asarray(w8), jnp.asarray(wscale),
                     act_quant=True)
    xs = np.abs(x).max(-1, keepdims=True) / 448.0
    ref = oracle(x, w8, wscale[None, :], xs)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-2, atol=2e-2)


def test_static_input_scale():
    rng = np.random.RandomState(1)
    M, K, N = 4, 64, 32
    x = rng.randn(M, K).astype(np.float32)
    w = rng.randn(K, N).astype(np.float32) * 0.1
    wscale = np.abs(w).max(0) / 448.0
    w8 = (w / wscale).astype(F8)
    iscale = np.asarray(np.abs(x).max() / 448.0, np.float32)
    got = fp8_matmul(jnp.asarray(x), jnp.asarray(w8), jnp.asarray(wscale),
                     input_scale=jnp.asarray(iscale), act_quant=True)
    ref = oracle(x, w8, wscale[None, :], np.asarray(iscale).reshape(1, 1))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-2, atol=2e-2)


def test_blockwise_weight_scales():
    """DeepSeek-style 2-D weight_block_size scales."""
    rng = np.random.RandomState(2)
    M, K, N, b = 4, 128, 64, 32
    x = rng.randn(M, K).astype(np.float32)
    w = rng.randn(K, N).astype(np.float32) * 0.1
    ws = np.abs(w).reshape(K // b, b, N // b, b).max(axis=(1, 3)) / 448.0
    w8 = (w / np.repeat(np.repeat(ws, b, 0), b, 1)).astype(F8)
    got = fp8_matmul(jnp.asarray(x), jnp.asarray(w8), jnp.asarray(ws),
                     act_quant=True)
    wf = w8.astype(np.float32) * np.repeat(np.repeat(ws, b, 0), b, 1)
    xs = np.abs(x).max(-1, keepdims=True) / 448.0
    xq = (x / xs).astype(F8).astype(np.float32) * xs
    np.testing.assert_allclose(np.asarray(got), xq @ wf,
                               rtol=2e-2, atol=2e-2)


def test_config_detection():
    q = QuantizationConfig.from_hf_config(
        {"quant_method": "fp8", "activation_scheme": "dynamic",
         "weight_block_size": [128, 128]})
    assert q.activation_scheme == "dynamic"
    assert q.weight_block_size == (128, 128)
    assert q.checkpoint_layout == "fp8_native"
    assert runtime_format(q) == "fp8_w8a8"
    q2 = QuantizationConfig.from_name("fp8_w8a8")
    assert runtime_format(q2) == "fp8_w8a8"
    q3 = QuantizationConfig.from_name("fp8")
    assert runtime_format(q3) == "fp8"


def test_unpack_fp8_native_blockwise():
    from aphrodite_tpu.quantization.loader import _unpack_fp8_native
    rng = np.random.RandomState(3)
    out, inp = 64, 128
    w8 = rng.randn(out, inp).astype(np.float32).astype(F8)
    sinv = rng.rand(out // 32, inp // 32).astype(np.float32)
    d = _unpack_fp8_native({"weight": w8, "weight_scale_inv": sinv,
                            "input_scale": np.asarray([0.01])}, None)
    assert d["qweight"].shape == (inp, out)
    assert d["weight_scale_block"].shape == (inp // 32, out // 32)
    assert isinstance(d["input_scale"], np.ndarray)


def test_blockwise_ceil_div_grid():
    """DeepSeek checkpoints ceil-divide the scale grid: K/N that are NOT
    multiples of the block size load through _normalize_block_scales (gcd
    expansion to an exact-division grid) and then match the elementwise
    oracle (regression: the runtime reshape failed at trace time, and a
    naive runtime ceil-div would misplace the ragged block boundary)."""
    from aphrodite_tpu.quantization.loader import _normalize_block_scales
    rng = np.random.RandomState(3)
    M, K, N, b = 4, 96, 48, 64  # ceil(96/64)=2, ceil(48/64)=1 blocks
    x = rng.randn(M, K).astype(np.float32)
    w = rng.randn(K, N).astype(np.float32) * 0.1
    Kb, Nb = -(-K // b), -(-N // b)
    # per-block absmax over the true (ragged-last) block partition
    ws = np.zeros((Kb, Nb), np.float32)
    for i in range(Kb):
        for j in range(Nb):
            blk = w[i * b:(i + 1) * b, j * b:(j + 1) * b]
            ws[i, j] = max(np.abs(blk).max() / 448.0, 1e-8)
    expand = np.repeat(np.repeat(ws, b, 0), b, 1)[:K, :N]
    w8 = (w / expand).astype(F8)
    # weight_block_size is (out_block, in_block); grid here is [K, N] order
    ws_norm = _normalize_block_scales(ws, K, N, (b, b))
    assert K % ws_norm.shape[0] == 0 and N % ws_norm.shape[1] == 0
    got = fp8_matmul(jnp.asarray(x), jnp.asarray(w8), jnp.asarray(ws_norm),
                     act_quant=True)
    wf = w8.astype(np.float32) * expand
    xs = np.abs(x).max(-1, keepdims=True) / 448.0
    xq = (x / xs).astype(F8).astype(np.float32) * xs
    np.testing.assert_allclose(np.asarray(got), xq @ wf,
                               rtol=2e-2, atol=2e-2)
