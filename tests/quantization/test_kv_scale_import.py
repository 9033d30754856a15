"""Calibrated per-layer KV-cache scale import (reference
aphrodite/quantization/kv_cache.py:10: fp8-serialized checkpoints ship
k_scale/v_scale per attention layer).

The TPU design folds the scales OUTSIDE the kernels — the cache stores
k/ks and v/vs, q absorbs ks (bilinearity of q·k) and the attention output
absorbs vs — so power-of-two scales are bit-exact in fp32 and generation
must match the identical checkpoint without scales token-for-token."""
import shutil

import numpy as np
import pytest

from aphrodite_tpu.sampling_params import SamplingParams

from tests.utils import save_tiny_hf_checkpoint, tiny_llama_hf_config


@pytest.fixture(scope="module")
def ckpts(tmp_path_factory):
    """(plain_dir, scaled_dir): identical weights; scaled_dir adds
    per-layer k_scale=2.0 / v_scale=0.5 tensors."""
    base = tmp_path_factory.mktemp("kvscale")
    plain = base / "plain"
    scaled = base / "scaled"
    plain.mkdir()
    save_tiny_hf_checkpoint(plain, tiny_llama_hf_config())
    shutil.copytree(plain, scaled)

    from safetensors.numpy import load_file, save_file
    st = scaled / "model.safetensors"
    tensors = load_file(str(st))
    n_layers = tiny_llama_hf_config().num_hidden_layers
    for li in range(n_layers):
        tensors[f"model.layers.{li}.self_attn.attn.k_scale"] = \
            np.asarray([2.0], np.float32)
        tensors[f"model.layers.{li}.self_attn.attn.v_scale"] = \
            np.asarray([0.5], np.float32)
    save_file(tensors, str(st))
    return plain, scaled


def _gen(d):
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(d), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_seqs=4, max_model_len=128,
              tokenizer="unused")
    p = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)
    outs = llm.generate([[1, 5, 9], list(range(30, 50))], p)
    return [o.outputs[0].token_ids for o in outs], llm


def test_kv_scales_loaded_and_token_exact(ckpts):
    plain, scaled = ckpts
    base_toks, _ = _gen(plain)
    scaled_toks, llm = _gen(scaled)
    # The scales actually loaded...
    layers = llm.engine.core.worker.runner.params["layers"]
    assert "kv_k_scale" in layers and "kv_v_scale" in layers
    np.testing.assert_allclose(np.asarray(layers["kv_k_scale"]), 2.0)
    np.testing.assert_allclose(np.asarray(layers["kv_v_scale"]), 0.5)
    # ...and power-of-two scales are numerically invisible in fp32.
    assert base_toks == scaled_toks


def test_legacy_combined_kv_scale(tmp_path):
    save_tiny_hf_checkpoint(tmp_path, tiny_llama_hf_config())
    from safetensors.numpy import load_file, save_file
    st = tmp_path / "model.safetensors"
    tensors = load_file(str(st))
    n_layers = tiny_llama_hf_config().num_hidden_layers
    for li in range(n_layers):
        tensors[f"model.layers.{li}.self_attn.kv_scale"] = \
            np.asarray([4.0], np.float32)
    save_file(tensors, str(st))
    toks, llm = _gen(tmp_path)
    layers = llm.engine.core.worker.runner.params["layers"]
    np.testing.assert_allclose(np.asarray(layers["kv_k_scale"]), 4.0)
    np.testing.assert_allclose(np.asarray(layers["kv_v_scale"]), 4.0)
    assert all(len(t) == 16 for t in toks)
