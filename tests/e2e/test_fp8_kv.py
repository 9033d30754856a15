"""FP8 KV cache: numerics close to full precision, E2E runs, kernel handles
the dtype (BASELINE config 3 pathway)."""
import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from aphrodite_tpu.attention.backend import (kv_cache_shape,
                                             ref_ragged_paged_attention,
                                             write_kv)
from aphrodite_tpu.sampling_params import SamplingParams

from tests.utils import (make_prefill_metadata, save_tiny_hf_checkpoint,
                         tiny_llama_hf_config)


@pytest.mark.parametrize("fp8", [jnp.float8_e4m3fn, jnp.float8_e5m2])
def test_fp8_kv_attention_close(fp8):
    rng = np.random.RandomState(0)
    PAGE, KVH, HD = 16, 2, 64
    md, ids, used = make_prefill_metadata([[1] * 33], PAGE, 8)
    T = 33
    q = jnp.asarray(rng.randn(T, 4, HD), jnp.float32) * 0.3
    k = jnp.asarray(rng.randn(T, KVH, HD), jnp.float32) * 0.3
    v = jnp.asarray(rng.randn(T, KVH, HD), jnp.float32) * 0.3

    ref_cache = write_kv(jnp.zeros(kv_cache_shape(used + 2, PAGE, KVH, HD),
                                   jnp.float32), k, v, md.slot_mapping)
    fp8_cache = write_kv(jnp.zeros(kv_cache_shape(used + 2, PAGE, KVH, HD),
                                   fp8), k, v, md.slot_mapping)
    scale = HD ** -0.5
    ref = np.asarray(ref_ragged_paged_attention(q, ref_cache, md, scale))
    got = np.asarray(ref_ragged_paged_attention(q, fp8_cache, md, scale))
    err = np.abs(ref - got).max()
    assert err < 0.12, err  # fp8 quantization noise, not garbage
    assert err > 0  # actually exercised the low-precision path


@pytest.mark.parametrize("cache_dtype", ["fp8_e4m3", "fp8_e5m2"])
def test_engine_runs_fp8_kv(tmp_path, cache_dtype):
    from aphrodite_tpu.entrypoints.llm import LLM
    save_tiny_hf_checkpoint(tmp_path, tiny_llama_hf_config())
    llm = LLM(model=str(tmp_path), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=128, tokenizer="unused",
              kv_cache_dtype=cache_dtype)
    outs = llm.generate(
        [[1, 5, 9, 20, 3]],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))
    assert len(outs[0].outputs[0].token_ids) == 6


def test_sleep_wake(tmp_path):
    """Sleep frees KV (and weights at level 2); wake restores; outputs
    unchanged."""
    from aphrodite_tpu.entrypoints.llm import LLM
    save_tiny_hf_checkpoint(tmp_path / "m", tiny_llama_hf_config())
    llm = LLM(model=str(tmp_path / "m"), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=128, tokenizer="unused")
    params = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    before = llm.generate([[1, 2, 3]], params)[0].outputs[0].token_ids
    llm.engine.sleep(level=2)
    assert llm.engine.is_sleeping
    llm.engine.wake_up()
    assert not llm.engine.is_sleeping
    after = llm.generate([[1, 2, 3]], params)[0].outputs[0].token_ids
    assert before == after
