"""compressed-tensors (llm-compressor) checkpoint loading.

A tiny llama is quantized per-channel symmetric int8 and saved in the
compressed-tensors tensor layout (weight int8 + weight_scale, HF
quantization_config with config_groups). Loading it must be token-exact vs
on-the-fly int8 quantization of the equivalent fp checkpoint — both paths
land in the same native W8A8 format."""
import json

import numpy as np
import pytest
import torch

from aphrodite_tpu.sampling_params import SamplingParams

from tests.utils import save_tiny_hf_checkpoint, tiny_llama_hf_config

CT_CONFIG = {
    "quant_method": "compressed-tensors",
    "format": "int-quantized",
    "config_groups": {
        "group_0": {
            "weights": {"num_bits": 8, "type": "int", "symmetric": True,
                        "strategy": "channel", "dynamic": False},
            "input_activations": {"num_bits": 8, "type": "int",
                                  "symmetric": True, "dynamic": True},
            "targets": ["Linear"],
        }
    },
    "ignore": ["lm_head"],
}

_PROJS = ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
          "self_attn.o_proj", "mlp.gate_proj", "mlp.up_proj",
          "mlp.down_proj")


def test_compressed_tensors_int8(tmp_path):
    fp_dir = tmp_path / "fp"
    ct_dir = tmp_path / "ct"
    fp_dir.mkdir(), ct_dir.mkdir()
    cfg = tiny_llama_hf_config()
    save_tiny_hf_checkpoint(fp_dir, cfg)

    # Re-pack the fp checkpoint into compressed-tensors int8 layout.
    from safetensors.numpy import load_file, save_file
    sd = load_file(str(next(fp_dir.glob("*.safetensors"))))
    out = {}
    for name, w in sd.items():
        if name.startswith("model.layers.") and any(
                name == f"model.layers.{name.split('.')[2]}.{p}.weight"
                for p in _PROJS):
            wf = w.astype(np.float32)
            scale = np.maximum(np.abs(wf).max(axis=1) / 127.0, 1e-8)
            q = np.clip(np.round(wf / scale[:, None]), -128,
                        127).astype(np.int8)
            out[name] = q
            out[name.replace(".weight", ".weight_scale")] = \
                scale[:, None].astype(np.float32)
        else:
            out[name] = w
    save_file({k: np.ascontiguousarray(v) for k, v in out.items()},
              str(ct_dir / "model.safetensors"))
    hf_cfg = json.loads((fp_dir / "config.json").read_text())
    hf_cfg["quantization_config"] = CT_CONFIG
    (ct_dir / "config.json").write_text(json.dumps(hf_cfg))

    from aphrodite_tpu.entrypoints.llm import LLM
    kw = dict(dtype="float32", block_size=16, num_kv_blocks=128,
              max_num_batched_tokens=64, max_num_seqs=4, max_model_len=256,
              tokenizer="unused")
    prompts = [[1, 5, 9, 20, 3], [7, 8, 9, 10, 11]]
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)

    llm_ct = LLM(model=str(ct_dir), **kw)  # auto-detected from hf config
    got = [o.outputs[0].token_ids for o in llm_ct.generate(prompts, params)]
    llm_fp = LLM(model=str(fp_dir), quantization="int8", **kw)
    exp = [o.outputs[0].token_ids for o in llm_fp.generate(prompts, params)]
    assert got == exp


# ------------------------------------------------- pack-quantized (wNa16)
def _pack_ct(q_out_in: np.ndarray, bits: int = 4) -> np.ndarray:
    """llm-compressor pack_to_int32 along the input dim (packed_dim=1):
    consecutive values per int32 word, little-endian."""
    pf = 32 // bits
    out, k = q_out_in.shape
    packed = np.zeros((out, k // pf), np.uint32)
    mask = (1 << bits) - 1
    for j in range(pf):
        packed |= (q_out_in[:, j::pf].astype(np.uint32) & mask) << (bits * j)
    return np.ascontiguousarray(packed.astype(np.int32))


def test_ct_packed_unpack_roundtrip():
    from aphrodite_tpu.quantization.base import unpack_ct_packed
    rs = np.random.RandomState(3)
    out, k, G = 16, 64, 4
    q = rs.randint(0, 16, (out, k)).astype(np.int8)
    scales = rs.rand(out, G).astype(np.float32)
    # symmetric: implied zero == 8
    u = unpack_ct_packed({"weight_packed": _pack_ct(q),
                          "weight_scale": scales})
    np.testing.assert_array_equal(u["qweight"], q.T)
    np.testing.assert_allclose(u["scales"], scales.T)
    np.testing.assert_array_equal(u["zeros"], np.full((G, out), 8.0))
    assert u["group_size"] == k // G and u["out_features"] == out
    # asymmetric: packed zero points along the output dim
    zp = rs.randint(0, 16, (out, G)).astype(np.int8)
    zp_packed = _pack_ct(zp.T).T  # pack along out -> [out/8, G]
    u = unpack_ct_packed({"weight_packed": _pack_ct(q),
                          "weight_scale": scales,
                          "weight_zero_point": zp_packed})
    np.testing.assert_array_equal(u["zeros"], zp.T.astype(np.float32))
    # actorder: non-monotonic g_idx triggers an input permutation
    g_idx = rs.permutation(np.repeat(np.arange(G), k // G)).astype(np.int32)
    u = unpack_ct_packed({"weight_packed": _pack_ct(q),
                          "weight_scale": scales, "weight_g_idx": g_idx})
    perm = np.argsort(g_idx, kind="stable")
    np.testing.assert_array_equal(u["input_perm"], perm)
    np.testing.assert_array_equal(u["qweight"], q.T[perm])


def test_ct_pack8_dequant_iterator():
    from aphrodite_tpu.quantization.importers import ct_pack8_dequant_iterator
    rs = np.random.RandomState(4)
    out, k, G = 8, 32, 2
    q = rs.randint(0, 256, (out, k)).astype(np.int16)
    scales = rs.rand(out, G).astype(np.float32)
    packed = np.zeros((out, k // 4), np.uint32)
    for j in range(4):
        packed |= (q[:, j::4].astype(np.uint32) & 0xFF) << (8 * j)
    ws = [("m.weight_packed", packed.astype(np.int32)),
          ("m.weight_scale", scales),
          ("other.weight", np.ones((2, 2), np.float32))]
    got = dict(ct_pack8_dequant_iterator(ws))
    gi = np.arange(k) // (k // G)
    exp = (q.astype(np.float32) - 128.0) * scales[:, gi]
    np.testing.assert_allclose(got["m.weight"], exp, rtol=1e-6)
    assert "other.weight" in got and "m.weight_packed" not in got


def test_ct_packed_detection():
    from aphrodite_tpu.quantization.base import QuantizationConfig
    cfg4 = {"quant_method": "compressed-tensors", "format": "pack-quantized",
            "config_groups": {"group_0": {"weights": {
                "num_bits": 4, "type": "int", "symmetric": True,
                "strategy": "group", "group_size": 32}}}}
    qc = QuantizationConfig.from_hf_config(cfg4)
    assert qc.method == "gptq" and qc.checkpoint_layout == "ct_packed" \
        and qc.group_size == 32 and not qc.zero_point
    cfg8 = {"quant_method": "compressed-tensors", "format": "pack-quantized",
            "config_groups": {"group_0": {"weights": {
                "num_bits": 8, "type": "int", "symmetric": True,
                "strategy": "channel"}}}}
    qc = QuantizationConfig.from_hf_config(cfg8)
    assert qc.method == "w8a16" and qc.preprocess == "ct_pack8"


def test_compressed_tensors_w4a16_matches_gptq(tmp_path):
    """A pack-quantized (symmetric, group) checkpoint and a GPTQ checkpoint
    holding the *same* int4 values/scales (zero == 8) must land in the same
    native w4a16 format -> token-exact agreement."""
    fp_dir = tmp_path / "fp"
    gptq_dir = tmp_path / "gptq"
    ct_dir = tmp_path / "ct"
    for d in (fp_dir, gptq_dir, ct_dir):
        d.mkdir()
    cfg = tiny_llama_hf_config()
    save_tiny_hf_checkpoint(fp_dir, cfg)

    from safetensors.numpy import load_file, save_file
    sd = load_file(str(next(fp_dir.glob("*.safetensors"))))
    rs = np.random.RandomState(7)
    gs = 32
    gptq_sd, ct_sd = {}, {}
    for name, w in sd.items():
        is_proj = name.startswith("model.layers.") and any(
            name == f"model.layers.{name.split('.')[2]}.{p}.weight"
            for p in _PROJS)
        if not is_proj:
            gptq_sd[name] = w
            ct_sd[name] = w
            continue
        out, k = w.shape
        G = k // gs
        q = rs.randint(0, 16, (out, k)).astype(np.int8)
        # fp16-representable scales so both checkpoints dequant identically
        scales = (rs.rand(out, G).astype(np.float16) * 0.02 + 0.001)
        base = name[:-len(".weight")]
        # GPTQ layout: qweight [in/8, out], qzeros [G, out/8], scales [G,out]
        qweight = np.zeros((k // 8, out), np.uint32)
        qT = q.T  # [in, out]
        for j in range(8):
            qweight |= (qT[j::8].astype(np.uint32) & 0xF) << (4 * j)
        zeros = np.full((G, out), 8, np.uint8)
        qzeros = np.zeros((G, out // 8), np.uint32)
        for j in range(8):
            qzeros |= (zeros[:, j::8].astype(np.uint32) & 0xF) << (4 * j)
        gptq_sd[base + ".qweight"] = qweight.astype(np.int32)
        gptq_sd[base + ".qzeros"] = qzeros.astype(np.int32)
        gptq_sd[base + ".scales"] = scales.T.astype(np.float16)
        ct_sd[base + ".weight_packed"] = _pack_ct(q)
        ct_sd[base + ".weight_scale"] = scales.astype(np.float16)
        ct_sd[base + ".weight_shape"] = np.array([out, k], np.int64)
    for d, out_sd in ((gptq_dir, gptq_sd), (ct_dir, ct_sd)):
        save_file({n: np.ascontiguousarray(v) for n, v in out_sd.items()},
                  str(d / "model.safetensors"))
    hf_cfg = json.loads((fp_dir / "config.json").read_text())
    hf_cfg["quantization_config"] = {
        "quant_method": "gptq", "bits": 4, "group_size": gs,
        "desc_act": False, "sym": True}
    (gptq_dir / "config.json").write_text(json.dumps(hf_cfg))
    hf_cfg["quantization_config"] = {
        "quant_method": "compressed-tensors", "format": "pack-quantized",
        "config_groups": {"group_0": {"weights": {
            "num_bits": 4, "type": "int", "symmetric": True,
            "strategy": "group", "group_size": gs},
            "targets": ["Linear"]}},
        "ignore": ["lm_head"]}
    (ct_dir / "config.json").write_text(json.dumps(hf_cfg))

    from aphrodite_tpu.entrypoints.llm import LLM
    kw = dict(dtype="float32", block_size=16, num_kv_blocks=128,
              max_num_batched_tokens=64, max_num_seqs=4, max_model_len=256,
              tokenizer="unused")
    prompts = [[1, 5, 9, 20, 3], [7, 8, 9, 10, 11]]
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    got = [o.outputs[0].token_ids
           for o in LLM(model=str(ct_dir), **kw).generate(prompts, params)]
    exp = [o.outputs[0].token_ids
           for o in LLM(model=str(gptq_dir), **kw).generate(prompts, params)]
    assert got == exp
