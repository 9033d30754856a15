"""Quantization tests: matmul kernels vs numpy dequant oracles, GPTQ/AWQ
unpack roundtrips, and E2E engine runs on quantized checkpoints
(SURVEY.md §4.9 pattern)."""
import numpy as np
import pytest
import jax.numpy as jnp

from aphrodite_tpu.ops.quant_gemm import (fp8_matmul, int8_matmul,
                                          w4a16_matmul, w8a16_matmul)
from aphrodite_tpu.quantization.base import (AWQ_ORDER, QuantizationConfig,
                                             unpack_awq, unpack_gptq)

from tests.utils import save_tiny_hf_checkpoint, tiny_llama_hf_config

RS = np.random.RandomState(0)


def test_w8a16_matmul_oracle():
    x = RS.randn(8, 64).astype(np.float32)
    w = RS.randn(64, 32).astype(np.float32)
    qc = QuantizationConfig.from_name("w8a16")
    q = qc.quantize_tensor(w)
    got = np.asarray(w8a16_matmul(jnp.asarray(x), jnp.asarray(q["qweight"]),
                                  jnp.asarray(q["scales"])))
    wd = q["qweight"].astype(np.float32) * q["scales"][None, :]
    np.testing.assert_allclose(got, x @ wd, rtol=1e-4, atol=1e-4)
    # Dequantized weight approximates the original.
    assert np.abs(wd - w).max() < np.abs(w).max() / 100


def test_int8_w8a8_matmul_oracle():
    x = RS.randn(8, 64).astype(np.float32)
    w = RS.randn(64, 32).astype(np.float32)
    qc = QuantizationConfig.from_name("int8")
    q = qc.quantize_tensor(w)
    got = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(q["qweight"]),
                                 jnp.asarray(q["scales"])))
    # Oracle: quantize activations per-token, int accumulate, rescale.
    xs = np.maximum(np.abs(x).max(-1, keepdims=True) / 127.0, 1e-8)
    xq = np.clip(np.round(x / xs), -128, 127)
    ref = (xq @ q["qweight"].astype(np.float64)) * xs * q["scales"][None, :]
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_fp8_matmul_oracle():
    x = RS.randn(8, 64).astype(np.float32)
    w = RS.randn(64, 32).astype(np.float32)
    qc = QuantizationConfig.from_name("fp8")
    q = qc.quantize_tensor(w)
    got = np.asarray(fp8_matmul(jnp.asarray(x), jnp.asarray(q["qweight"]),
                                jnp.asarray(q["weight_scale"])))
    wd = q["qweight"].astype(np.float32) * q["weight_scale"][None, :]
    np.testing.assert_allclose(got, x @ wd, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("zero_point", [True, False])
def test_w4a16_matmul_oracle(zero_point):
    x = RS.randn(8, 128).astype(np.float32)
    w = RS.randn(128, 32).astype(np.float32)
    qc = QuantizationConfig(method="gptq", weight_bits=4, group_size=32,
                            zero_point=zero_point)
    q = qc.quantize_tensor(w)
    got = np.asarray(w4a16_matmul(jnp.asarray(x), jnp.asarray(q["qweight"]),
                                  jnp.asarray(q["scales"]),
                                  jnp.asarray(q["zeros"])))
    G, g = 128 // 32, 32
    qd = q["qweight"].reshape(G, g, 32).astype(np.float32)
    wd = ((qd - q["zeros"][:, None, :]) *
          q["scales"][:, None, :]).reshape(128, 32)
    np.testing.assert_allclose(got, x @ wd, rtol=2e-3, atol=2e-3)
    assert np.abs(wd - w).max() < 0.35  # 4-bit grid error bound


def _pack_gptq(q, zeros, scales):
    """Synthesize GPTQ checkpoint tensors from uint4 q [in, out],
    zeros [G, out], scales [G, out]."""
    k, n = q.shape
    G = zeros.shape[0]
    qweight = np.zeros((k // 8, n), np.uint32)
    for j in range(8):
        qweight |= (q[j::8].astype(np.uint32) & 0xF) << (4 * j)
    qzeros = np.zeros((G, n // 8), np.uint32)
    for j in range(8):
        qzeros |= (zeros[:, j::8].astype(np.uint32) & 0xF) << (4 * j)
    # np.ascontiguousarray: safetensors writes raw buffers and silently
    # corrupts non-contiguous arrays.
    return (np.ascontiguousarray(qweight.astype(np.int32)),
            np.ascontiguousarray(qzeros.astype(np.int32)),
            np.ascontiguousarray(scales.astype(np.float16)))


def test_gptq_pack_unpack_roundtrip():
    k, n, G = 64, 16, 4
    q = RS.randint(0, 16, (k, n)).astype(np.int8)
    zeros = RS.randint(0, 16, (G, n)).astype(np.float32)
    scales = RS.rand(G, n).astype(np.float32)
    qw, qz, sc = _pack_gptq(q, zeros, scales)
    out = unpack_gptq(qw, qz, sc)
    np.testing.assert_array_equal(out["qweight"], q)
    np.testing.assert_array_equal(out["zeros"], zeros)
    np.testing.assert_allclose(out["scales"], scales, rtol=1e-3)
    assert out["group_size"] == k // G


def _pack_awq(q, zeros, scales):
    k, n = q.shape
    G = zeros.shape[0]
    qweight = np.zeros((k, n // 8), np.uint32)
    qzeros = np.zeros((G, n // 8), np.uint32)
    for j in range(8):
        shift = 4 * AWQ_ORDER[j]
        qweight |= (q[:, j::8].astype(np.uint32) & 0xF) << shift
        qzeros |= (zeros[:, j::8].astype(np.uint32) & 0xF) << shift
    return (np.ascontiguousarray(qweight.astype(np.int32)),
            np.ascontiguousarray(qzeros.astype(np.int32)),
            np.ascontiguousarray(scales.astype(np.float16)))


def test_awq_pack_unpack_roundtrip():
    k, n, G = 32, 16, 2
    q = RS.randint(0, 16, (k, n)).astype(np.int8)
    zeros = RS.randint(0, 16, (G, n)).astype(np.float32)
    scales = RS.rand(G, n).astype(np.float32)
    qw, qz, sc = _pack_awq(q, zeros, scales)
    out = unpack_awq(qw, qz, sc)
    np.testing.assert_array_equal(out["qweight"], q)
    np.testing.assert_array_equal(out["zeros"], zeros)


# --------------------------------------------------------------------------- #
# E2E: engine on quantized checkpoints
# --------------------------------------------------------------------------- #
@pytest.fixture(scope="module")
def tiny_fp_ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_q")
    hf_model = save_tiny_hf_checkpoint(
        d, tiny_llama_hf_config(hidden=64, intermediate=128))
    return d, hf_model


@pytest.mark.parametrize("method", ["w8a16", "int8", "fp8", "gptq"])
def test_engine_runs_quantized(tiny_fp_ckpt, method):
    """On-the-fly quantization of an fp checkpoint: engine must run and
    produce reasonable output (token-level parity is checked separately for
    lossless grids)."""
    from aphrodite_tpu.entrypoints.llm import LLM
    from aphrodite_tpu.sampling_params import SamplingParams
    d, _ = tiny_fp_ckpt
    llm = LLM(model=str(d), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=128, tokenizer="unused", quantization=method)
    out = llm.generate([[1, 5, 9, 20]],
                       SamplingParams(temperature=0.0, max_tokens=5,
                                      ignore_eos=True))[0]
    assert len(out.outputs[0].token_ids) == 5


def test_w8a16_lossless_grid_matches_fp(tmp_path):
    """Weights snapped to the int8 grid quantize losslessly -> greedy tokens
    must match the fp engine exactly."""
    import torch
    from transformers import AutoModelForCausalLM
    from aphrodite_tpu.entrypoints.llm import LLM
    from aphrodite_tpu.sampling_params import SamplingParams

    hf_config = tiny_llama_hf_config(hidden=64, intermediate=128)
    torch.manual_seed(0)
    model = AutoModelForCausalLM.from_config(hf_config).eval()
    # Snap all linear weights to an int8-representable grid.
    with torch.no_grad():
        for name, mod in model.named_modules():
            if isinstance(mod, torch.nn.Linear) and "proj" in name:
                w = mod.weight.data  # [out, in]
                scale = w.abs().amax(dim=1, keepdim=True) / 127.0
                mod.weight.data = torch.round(w / scale) * scale
    model.save_pretrained(tmp_path, safe_serialization=True)

    params = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    fp = LLM(model=str(tmp_path), dtype="float32", block_size=16,
             num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
             max_model_len=128, tokenizer="unused")
    a = fp.generate([[3, 7, 11]], params)[0].outputs[0].token_ids
    q = LLM(model=str(tmp_path), dtype="float32", block_size=16,
            num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
            max_model_len=128, tokenizer="unused", quantization="w8a16")
    b = q.generate([[3, 7, 11]], params)[0].outputs[0].token_ids
    assert a == b


def test_gptq_checkpoint_loading(tmp_path):
    """Synthesize a GPTQ-packed checkpoint; engine tokens must match the HF
    oracle running on the dequantized weights."""
    import torch
    from transformers import AutoModelForCausalLM
    from aphrodite_tpu.entrypoints.llm import LLM
    from aphrodite_tpu.sampling_params import SamplingParams
    from safetensors.numpy import save_file

    hf_config = tiny_llama_hf_config(hidden=64, intermediate=128,
                                     kv_heads=2, heads=4)
    torch.manual_seed(1)
    model = AutoModelForCausalLM.from_config(hf_config).eval()
    group = 32

    tensors = {}
    qc = QuantizationConfig(method="gptq", weight_bits=4, group_size=group)
    with torch.no_grad():
        for name, mod in model.named_modules():
            if isinstance(mod, torch.nn.Linear) and (
                    "proj" in name and "lm_head" not in name):
                w = mod.weight.data.numpy().T.astype(np.float32)  # [in, out]
                q = qc.quantize_tensor(w)
                G = w.shape[0] // group
                qw, qz, sc = _pack_gptq(q["qweight"], q["zeros"],
                                        q["scales"])
                tensors[f"{name}.qweight"] = qw
                tensors[f"{name}.qzeros"] = qz
                tensors[f"{name}.scales"] = sc
                # Write dequantized values back into the oracle model,
                # with scales round-tripped through the checkpoint's fp16.
                sc16 = q["scales"].astype(np.float16).astype(np.float32)
                wd = ((q["qweight"].reshape(G, group, -1).astype(np.float32)
                       - q["zeros"][:, None, :]) * sc16[:, None, :]
                      ).reshape(w.shape)
                mod.weight.data = torch.tensor(wd.T)
            elif hasattr(mod, "weight") and mod.weight is not None and \
                    "." in name:
                tensors[f"{name}.weight"] = np.ascontiguousarray(
                    mod.weight.data.numpy().astype(np.float32))
    tensors["model.embed_tokens.weight"] = \
        model.model.embed_tokens.weight.data.numpy().astype(np.float32)
    tensors["model.norm.weight"] = \
        model.model.norm.weight.data.numpy().astype(np.float32)
    tensors["lm_head.weight"] = \
        model.lm_head.weight.data.numpy().astype(np.float32)
    save_file(tensors, str(tmp_path / "model.safetensors"))
    hf_config.quantization_config = {
        "quant_method": "gptq", "bits": 4, "group_size": group,
        "desc_act": False}
    hf_config.architectures = ["LlamaForCausalLM"]
    hf_config.save_pretrained(tmp_path)

    prompt = [2, 9, 17, 33]
    with torch.no_grad():
        exp = model.generate(torch.tensor([prompt]), max_new_tokens=6,
                             do_sample=False,
                             eos_token_id=None)[0][len(prompt):].tolist()

    llm = LLM(model=str(tmp_path), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=128, tokenizer="unused")
    got = llm.generate([prompt],
                       SamplingParams(temperature=0.0, max_tokens=6,
                                      ignore_eos=True))[0]
    assert got.outputs[0].token_ids == exp


# --------------------------------------------------------------------------- #
# QuantLLM FPx (fp4/fp5/fp6/fp7 eXmY grids)
# --------------------------------------------------------------------------- #
def _fpx_decode_np(codes, ebits, mbits):
    """Independent numpy decode oracle for uint8 sign|exp|mantissa codes."""
    bias = (1 << (ebits - 1)) - 1
    c = codes.astype(np.int64)
    e = (c >> mbits) & ((1 << ebits) - 1)
    man = c & ((1 << mbits) - 1)
    sign = np.where((c >> (ebits + mbits)) & 1, -1.0, 1.0)
    mag = np.where(e == 0, man * 2.0 ** (1 - bias - mbits),
                   ((1 << mbits) + man) * np.exp2(e - bias - mbits + 0.0))
    return sign * mag


@pytest.mark.parametrize("ebits,mbits", [(2, 3), (2, 2), (2, 1), (3, 2),
                                         (2, 4)])
def test_fpx_encode_grid(ebits, mbits):
    from aphrodite_tpu.quantization.base import fpx_encode, fpx_grid
    grid = fpx_grid(ebits, mbits)
    # grid values must be monotone and max_normal = (2 - 2^-m) * 2^(emax-bias)
    assert np.all(np.diff(grid) > 0)
    bias = (1 << (ebits - 1)) - 1
    emax = (1 << ebits) - 1
    assert grid[-1] == (2 - 2.0 ** -mbits) * 2.0 ** (emax - bias)
    # encode of exactly-representable scaled values is exact
    rs = np.random.RandomState(0)
    n = 16
    scale_true = rs.rand(n).astype(np.float32) + 0.5
    pick = rs.randint(0, len(grid), (64, n))
    signs = rs.choice([-1.0, 1.0], (64, n))
    # force one absmax entry per column so the recovered scale matches
    pick[0] = len(grid) - 1
    signs[0] = 1.0
    w = (signs * grid[pick]) * scale_true[None, :]
    codes, scale = fpx_encode(w, ebits, mbits)
    np.testing.assert_allclose(scale, scale_true, rtol=1e-6)
    dec = _fpx_decode_np(codes, ebits, mbits) * scale[None, :]
    np.testing.assert_allclose(dec, w, rtol=1e-6)
    # random weights: error bounded by half a grid step
    w = rs.randn(128, n).astype(np.float32)
    codes, scale = fpx_encode(w, ebits, mbits)
    dec = _fpx_decode_np(codes, ebits, mbits) * scale[None, :]
    step = np.max(np.diff(grid))  # largest grid gap, in scaled units
    assert np.max(np.abs(dec - w) / scale[None, :]) <= step / 2 + 1e-9


def test_fpx_matmul_oracle():
    from aphrodite_tpu.ops.quant_gemm import fpx_matmul
    from aphrodite_tpu.quantization.base import fpx_encode
    x = RS.randn(8, 64).astype(np.float32)
    w = RS.randn(64, 32).astype(np.float32)
    codes, scale = fpx_encode(w, 2, 3)  # fp6 e2m3
    import jax.numpy as jnp
    got = np.asarray(fpx_matmul(jnp.asarray(x), jnp.asarray(codes),
                                jnp.asarray(scale), 2, 3))
    wd = _fpx_decode_np(codes, 2, 3) * scale[None, :]
    np.testing.assert_allclose(got, x @ wd, rtol=1e-4, atol=1e-4)
    assert np.abs(wd - w).max() < 0.25  # fp6 grid error bound


@pytest.mark.parametrize("method", ["fp6", "fp4"])
def test_engine_runs_fpx(tiny_fp_ckpt, method):
    d, _ = tiny_fp_ckpt
    from aphrodite_tpu.entrypoints.llm import LLM
    from aphrodite_tpu.sampling_params import SamplingParams
    llm = LLM(model=str(d), dtype="float32", block_size=16,
              num_kv_blocks=64, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=256, tokenizer="unused", quantization=method)
    out = llm.generate([[1, 5, 9, 20, 3]],
                       SamplingParams(temperature=0.0, max_tokens=5,
                                      ignore_eos=True))[0]
    assert len(out.outputs[0].token_ids) == 5


def test_lm_head_quantized(tmp_path):
    """--quantize-lm-head: the lm_head leaf becomes a per-channel int8
    dict and engine tokens match an HF oracle whose lm_head carries the
    same int8 round-trip (reference QuantizationConfig.lm_head_quantized)."""
    import torch
    from aphrodite_tpu.entrypoints.llm import LLM
    from aphrodite_tpu.sampling_params import SamplingParams

    hf_config = tiny_llama_hf_config(hidden=64, intermediate=128)
    hf = save_tiny_hf_checkpoint(tmp_path, hf_config)
    # Oracle: replace lm_head with its per-channel int8 round-trip.
    with torch.no_grad():
        w = hf.lm_head.weight.data.numpy().T.astype(np.float32)  # [H, V]
        scale = np.maximum(np.abs(w).max(axis=0) / 127.0, 1e-8)
        q = np.clip(np.round(w / scale[None, :]), -128, 127)
        hf.lm_head.weight.data = torch.tensor((q * scale[None, :]).T
                                              .astype(np.float32))
        prompt = [3, 9, 27, 81]
        exp = hf.generate(torch.tensor([prompt]), max_new_tokens=6,
                          do_sample=False,
                          eos_token_id=None)[0][len(prompt):].tolist()

    llm = LLM(model=str(tmp_path), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=128, tokenizer="unused",
              quantization="w8a16", quantize_lm_head=True)
    head = llm.engine.core.worker.runner.params["lm_head"]
    assert isinstance(head, dict) and head["qweight"].dtype == jnp.int8
    got = llm.generate([prompt],
                       SamplingParams(temperature=0.0, max_tokens=6,
                                      ignore_eos=True))[0]
    # layer weights are ALSO w8a16 here (near-lossless), so tokens track
    # the lm-head-rounded oracle
    assert got.outputs[0].token_ids == exp
