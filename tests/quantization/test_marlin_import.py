"""Serialized-Marlin checkpoint import: pack a known int4 matrix with the
Marlin tile/permute/interleave layout (the format spec from reference
quantization/utils/marlin_utils_test.py:30-92), then verify unpack_marlin
recovers the exact values and scales."""
import numpy as np

from aphrodite_tpu.quantization.base import QuantizationConfig
from aphrodite_tpu.quantization.importers import (_marlin_weight_perm,
                                                  unpack_marlin)


def _marlin_pack(q_w: np.ndarray) -> np.ndarray:
    """Forward Marlin weight packing (format spec): 16x16 tiling, the
    1024-wide column permutation, 8 nibbles per int32 word."""
    K, N = q_w.shape
    t = q_w.reshape(K // 16, 16, N // 16, 16).transpose(0, 2, 1, 3)
    t = t.reshape(K // 16, N * 16)
    perm = _marlin_weight_perm()
    t = t.reshape(-1, 1024)[:, perm].reshape(K // 16, N * 16)
    packed = np.zeros((K // 16, N * 16 // 8), np.uint32)
    for i in range(8):
        packed |= t[:, i::8].astype(np.uint32) << (4 * i)
    return packed.astype(np.int32)


def _marlin_pack_scales(s: np.ndarray, K: int, group_size: int) -> np.ndarray:
    G, N = s.shape
    if group_size < K and group_size != -1:
        perm = np.array([i + 8 * j for i in range(8) for j in range(8)])
        out = s.reshape(-1, 64)[:, perm].reshape(-1, N)
    else:
        perm = np.array([2 * i + j for i in range(4)
                         for j in (0, 1, 8, 9, 16, 17, 24, 25)])
        out = s.reshape(-1, 32)[:, perm].reshape(-1, N)
    # safetensors silently corrupts non-contiguous arrays (CLAUDE.md)
    return np.ascontiguousarray(out)


def test_marlin_unpack_roundtrip_grouped():
    rng = np.random.default_rng(0)
    K, N, group = 128, 64, 32
    q = rng.integers(0, 16, size=(K, N)).astype(np.uint8)
    s = rng.uniform(0.5, 2.0, size=(K // group, N)).astype(np.float32)
    B = _marlin_pack(q)
    s_packed = _marlin_pack_scales(s, K, group)
    out = unpack_marlin(B, s_packed)
    assert out["format"] == "w4a16"
    assert out["group_size"] == group and out["out_features"] == N
    np.testing.assert_array_equal(out["qweight"], q.astype(np.int8))
    np.testing.assert_allclose(out["scales"], s, rtol=1e-6)
    # symmetric format: implicit zero point 8 everywhere
    assert np.all(out["zeros"] == 8.0)


def test_marlin_unpack_roundtrip_channelwise():
    rng = np.random.default_rng(1)
    K, N = 64, 128
    q = rng.integers(0, 16, size=(K, N)).astype(np.uint8)
    s = rng.uniform(0.5, 2.0, size=(1, N)).astype(np.float32)
    out = unpack_marlin(_marlin_pack(q), _marlin_pack_scales(s, K, -1))
    np.testing.assert_array_equal(out["qweight"], q.astype(np.int8))
    np.testing.assert_allclose(out["scales"], s, rtol=1e-6)
    assert out["group_size"] == K


def test_marlin_config_detection():
    cfg = QuantizationConfig.from_hf_config(
        {"quant_method": "marlin", "group_size": 128})
    assert cfg.method == "gptq" and cfg.checkpoint_layout == "marlin"
    assert cfg.weight_bits == 4 and not cfg.zero_point


def test_marlin_checkpoint_e2e(tmp_path):
    """Synthesize a serialized-Marlin checkpoint; engine tokens must match
    the HF oracle running on the dequantized weights (the
    test_gptq_checkpoint_loading pattern)."""
    import torch
    from safetensors.numpy import save_file
    from transformers import AutoModelForCausalLM

    from aphrodite_tpu.entrypoints.llm import LLM
    from aphrodite_tpu.sampling_params import SamplingParams
    from tests.utils import tiny_llama_hf_config

    hf_config = tiny_llama_hf_config(hidden=64, intermediate=128,
                                     kv_heads=2, heads=4)
    torch.manual_seed(3)
    model = AutoModelForCausalLM.from_config(hf_config).eval()
    group = 32

    tensors = {}
    with torch.no_grad():
        for name, mod in model.named_modules():
            if isinstance(mod, torch.nn.Linear) and (
                    "proj" in name and "lm_head" not in name):
                w = mod.weight.data.numpy().T.astype(np.float32)  # [in, out]
                K, N = w.shape
                G = K // group
                wg = w.reshape(G, group, N)
                scale = np.maximum(np.abs(wg).max(axis=1) / 7.0, 1e-8)
                q = np.clip(np.round(wg / scale[:, None, :]) + 8,
                            0, 15).astype(np.uint8).reshape(K, N)
                sc16 = scale.astype(np.float16).astype(np.float32)
                tensors[f"{name}.B"] = _marlin_pack(q)
                tensors[f"{name}.s"] = _marlin_pack_scales(
                    sc16, K, group).astype(np.float16)
                wd = ((q.reshape(G, group, N).astype(np.float32) - 8.0)
                      * sc16[:, None, :]).reshape(K, N)
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
    hf_config.quantization_config = {"quant_method": "marlin",
                                     "group_size": group}
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
