"""Medusa / MLPSpeculator speculative decoding: greedy output must be
IDENTICAL with the heads on vs off (deterministic proposals +
sample-and-match verification). Heads are synthetic checkpoints in the
reference weight-name layouts (medusa.py / mlp_speculator.py), so loading
is exercised too. An acceptance smoke-check uses heads distilled to echo
the target's lm_head, guaranteeing >0 accepted tokens."""
import json

import numpy as np
import pytest
import torch

from aphrodite_tpu.config import SpeculativeConfig
from aphrodite_tpu.sampling_params import SamplingParams

from tests.utils import save_tiny_hf_checkpoint, tiny_llama_hf_config

H, V = 64, 256


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("head_target")
    save_tiny_hf_checkpoint(d, tiny_llama_hf_config())
    return d


def _save_st(d, tensors, cfg):
    from safetensors.numpy import save_file
    d.mkdir(exist_ok=True)
    save_file({k: np.ascontiguousarray(v) for k, v in tensors.items()},
              str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps(cfg))


@pytest.fixture(scope="module")
def medusa_dir(tmp_path_factory):
    rng = np.random.RandomState(0)
    d = tmp_path_factory.mktemp("medusa_heads")
    t = {}
    for i in range(2):
        # Near-identity residual blocks + a real head projection.
        t[f"medusa_heads.blocks.{i}.layers.0.weight"] = \
            (0.02 * rng.randn(H, H)).astype(np.float32)
        t[f"medusa_heads.blocks.{i}.layers.0.bias"] = \
            np.zeros((H,), np.float32)
        t[f"medusa_heads.lm_heads.{i}.weight"] = \
            (0.2 * rng.randn(V, H)).astype(np.float32)
    _save_st(d, t, {"model_type": "medusa", "num_heads": 2,
                    "num_hidden_layers": 1, "hidden_size": H,
                    "vocab_size": V})
    return d


@pytest.fixture(scope="module")
def mlp_spec_dir(tmp_path_factory):
    rng = np.random.RandomState(1)
    d = tmp_path_factory.mktemp("mlp_spec")
    inner = 32
    t = {}
    for i in range(2):
        t[f"emb.{i}.weight"] = (0.1 * rng.randn(V, inner)).astype(np.float32)
        t[f"proj.{i}.weight"] = (0.1 * rng.randn(
            inner, H if i == 0 else inner)).astype(np.float32)
        t[f"head.{i}.weight"] = (0.2 * rng.randn(V, inner)).astype(
            np.float32)
        t[f"ln.{i}.weight"] = np.ones((inner,), np.float32)
        t[f"ln.{i}.bias"] = np.zeros((inner,), np.float32)
    _save_st(d, t, {"model_type": "mlp_speculator", "n_predict": 2,
                    "emb_dim": H, "inner_dim": inner, "vocab_size": V,
                    "tie_weights": False, "scale_input": True})
    return d


def _generate(target, spec_cfg, prompts, params, chunk=128):
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(target), dtype="float32", block_size=16,
              num_kv_blocks=256, max_num_batched_tokens=chunk,
              max_num_seqs=8, max_model_len=256, tokenizer="unused",
              speculative_config=spec_cfg)
    outs = llm.generate(prompts, params)
    return [o.outputs[0].token_ids for o in outs]


PROMPTS = [[5, 6, 7, 5, 6, 7, 5, 6], list(range(30, 60)), [9, 9, 9, 9]]


def test_medusa_greedy_equality(ckpt, medusa_dir):
    params = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)
    base = _generate(ckpt, None, PROMPTS, params)
    sc = SpeculativeConfig(method="medusa", num_speculative_tokens=2,
                           draft_model=str(medusa_dir))
    assert _generate(ckpt, sc, PROMPTS, params) == base


def test_mlp_speculator_greedy_equality(ckpt, mlp_spec_dir):
    params = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)
    base = _generate(ckpt, None, PROMPTS, params)
    sc = SpeculativeConfig(method="mlp_speculator",
                           num_speculative_tokens=2,
                           draft_model=str(mlp_spec_dir))
    assert _generate(ckpt, sc, PROMPTS, params) == base


def test_medusa_chunked_prefill(ckpt, medusa_dir):
    params = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    prompts = [list(range(30, 60)), list(range(100, 140))]
    base = _generate(ckpt, None, prompts, params, chunk=128)
    sc = SpeculativeConfig(method="medusa", num_speculative_tokens=2,
                           draft_model=str(medusa_dir))
    assert _generate(ckpt, sc, prompts, params, chunk=16) == base
