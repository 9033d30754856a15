"""HF-oracle parity: our pure-JAX Llama forward vs torch transformers on the
same tiny random checkpoint (test pattern from SURVEY.md §4.1)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from aphrodite_tpu.config import ModelConfig
from aphrodite_tpu.loader.weights import create_model, weights_iterator

from tests.utils import (make_prefill_metadata, save_tiny_hf_checkpoint,
                         tiny_llama_hf_config)

BLOCK = 16
MAX_PAGES = 8


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_llama")
    hf_config = tiny_llama_hf_config()
    hf_model = save_tiny_hf_checkpoint(d, hf_config)
    return d, hf_config, hf_model


def _jax_logits(model, params, prompts, kv_dtype=jnp.float32):
    md, ids, used_pages = make_prefill_metadata(prompts, BLOCK, MAX_PAGES)
    from aphrodite_tpu.attention.backend import kv_cache_shape
    kv_cache = jnp.zeros(
        (model.num_layers,) + kv_cache_shape(used_pages + 4, BLOCK,
                                             model.num_kv_heads,
                                             model.head_dim), kv_dtype)
    hidden, _ = model.apply(params, ids, kv_cache, md)
    logits = model.compute_logits(params, hidden)
    return np.asarray(logits), md


def test_llama_forward_matches_hf(tiny_ckpt):
    import torch
    d, hf_config, hf_model = tiny_ckpt
    mc = ModelConfig(model=str(d), dtype="float32", hf_config=hf_config,
                     architecture="LlamaForCausalLM", tokenizer="unused")
    model = create_model(mc)
    params = model.load_weights(weights_iterator(str(d)))
    params = jax.tree.map(jnp.asarray, params)

    prompts = [[1, 5, 9, 200, 3], [7, 8, 9, 10, 11, 12, 13]]
    logits, md = _jax_logits(model, params, prompts)

    # HF oracle per prompt.
    qsl = np.asarray(md.query_start_loc)
    for r, p in enumerate(prompts):
        with torch.no_grad():
            out = hf_model(torch.tensor([p])).logits[0].numpy()
        got = logits[qsl[r]:qsl[r + 1]]
        np.testing.assert_allclose(got, out, rtol=2e-3, atol=2e-3)


def test_gqa_and_padding_invariance(tiny_ckpt):
    """Pad tokens must not change real-token logits."""
    d, hf_config, _ = tiny_ckpt
    mc = ModelConfig(model=str(d), dtype="float32", hf_config=hf_config,
                     architecture="LlamaForCausalLM", tokenizer="unused")
    model = create_model(mc)
    params = model.load_weights(weights_iterator(str(d)))
    params = jax.tree.map(jnp.asarray, params)

    prompts = [[4, 5, 6, 7]]
    logits_a, _ = _jax_logits(model, params, prompts)

    md, ids, used = make_prefill_metadata(prompts, BLOCK, MAX_PAGES,
                                          num_tokens_pad=16)
    from aphrodite_tpu.attention.backend import kv_cache_shape
    kv_cache = jnp.zeros((model.num_layers,) + kv_cache_shape(
        used + 4, BLOCK, model.num_kv_heads, model.head_dim), jnp.float32)
    hidden, _ = model.apply(params, ids, kv_cache, md)
    logits_b = np.asarray(model.compute_logits(params, hidden))[:4]
    np.testing.assert_allclose(logits_a[:4], logits_b, rtol=1e-5, atol=1e-5)


def test_decode_step_matches_prefill(tiny_ckpt):
    """Prefill N tokens then decode token N+1 -> same logits as full prefill."""
    from aphrodite_tpu.attention.metadata import AttentionMetadata
    d, hf_config, _ = tiny_ckpt
    mc = ModelConfig(model=str(d), dtype="float32", hf_config=hf_config,
                     architecture="LlamaForCausalLM", tokenizer="unused")
    model = create_model(mc)
    params = model.load_weights(weights_iterator(str(d)))
    params = jax.tree.map(jnp.asarray, params)

    full = [11, 22, 33, 44, 55]
    # Full prefill oracle.
    logits_full, _ = _jax_logits(model, params, [full])

    # Prefill first 4, then decode the 5th.
    md, ids, used = make_prefill_metadata([full[:4]], BLOCK, MAX_PAGES)
    from aphrodite_tpu.attention.backend import kv_cache_shape
    kv_cache = jnp.zeros((model.num_layers,) + kv_cache_shape(
        used + 4, BLOCK, model.num_kv_heads, model.head_dim), jnp.float32)
    _, kv_cache = model.apply(params, ids, kv_cache, md)

    md2 = AttentionMetadata(
        token_req_idx=jnp.asarray([0], jnp.int32),
        token_pos=jnp.asarray([4], jnp.int32),
        slot_mapping=jnp.asarray([1 * BLOCK + 4], jnp.int32),
        query_start_loc=jnp.asarray([0, 1], jnp.int32),
        seq_lens=jnp.asarray([5], jnp.int32),
        block_tables=md.block_tables,
        num_reqs=jnp.asarray(1, jnp.int32),
        num_tokens=jnp.asarray(1, jnp.int32),
    )
    hidden, _ = model.apply(params, jnp.asarray([full[4]], jnp.int32),
                            kv_cache, md2)
    logits_dec = np.asarray(model.compute_logits(params, hidden))
    np.testing.assert_allclose(logits_dec[0], logits_full[4], rtol=1e-4,
                               atol=1e-4)
