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
