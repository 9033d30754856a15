"""Chameleon (early-fusion VQ tokens + per-head qk-LayerNorm llama) vs HF."""
import numpy as np
import pytest
import torch

from aphrodite_tpu.sampling_params import SamplingParams

IMG_TOK = 290


def _vocab_map():
    chr_map = {str(d): chr(ord("A") + d) for d in range(10)}
    vm = {"<image>": IMG_TOK}
    for i in range(16):
        name = "IMGIMG" + "".join(chr_map[c] for c in str(i)) + "Z"
        vm[name] = 295 + i
    return vm


def test_chameleon_matches_hf(tmp_path):
    from transformers import (ChameleonConfig,
                              ChameleonForConditionalGeneration)
    from transformers.models.chameleon.configuration_chameleon import (
        ChameleonVQVAEConfig)
    vq = ChameleonVQVAEConfig(
        embed_dim=8, num_embeddings=16, base_channels=32,
        channel_multiplier=[1, 2], num_res_blocks=1, attn_resolutions=[8],
        resolution=16, latent_channels=8, double_latent=False,
        in_channels=3)
    cfg = ChameleonConfig(
        vocab_size=320, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, vocabulary_map=_vocab_map(),
        vq_config=vq.to_dict(), swin_norm=False, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2, pad_token_id=0)
    torch.manual_seed(0)
    hf = ChameleonForConditionalGeneration(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)

    rng = np.random.RandomState(0)
    img = rng.randn(1, 3, 16, 16).astype(np.float32)  # 8x8 grid -> 64 toks
    base = [1, 7, IMG_TOK, 9, 20]
    expanded = [1, 7] + [IMG_TOK] * 64 + [9, 20]

    # 1) VQ tokenization must match HF bit-exactly.
    import jax
    import jax.numpy as jnp
    from aphrodite_tpu.config import ModelConfig
    from aphrodite_tpu.models.chameleon import (
        ChameleonForConditionalGeneration as Ours)
    import safetensors.numpy as stn
    mc = ModelConfig(model=str(tmp_path), dtype="float32")
    ours = Ours(mc)
    params = ours.load_weights(
        iter(stn.load_file(str(tmp_path / "model.safetensors")).items()))
    params = {k: (v if k == "vqmodel" else jax.tree.map(jnp.asarray, v))
              for k, v in params.items()}
    idx = ours.vq.encode_indices(params["vqmodel"], jnp.asarray(img))
    got_bpe = np.asarray(ours._img2bpe)[np.asarray(idx)][0]
    with torch.no_grad():
        hf_bpe = hf.model.get_image_tokens(torch.tensor(img))[0].numpy()
    np.testing.assert_array_equal(got_bpe, hf_bpe)

    # 2) Full-prompt logits parity (deterministic — this tiny random model
    # has sub-1e-2 logit margins, so greedy-token comparison would just
    # measure HF's own cached-vs-uncached noise).
    from aphrodite_tpu.attention.metadata import AttentionMetadata
    T = len(expanded)
    S = 128
    kv = jnp.zeros((2,) + __import__(
        "aphrodite_tpu.attention.backend", fromlist=["kv_cache_shape"]
    ).kv_cache_shape(2, S, 2, 16), jnp.float32)
    md = AttentionMetadata(
        token_req_idx=jnp.zeros((T,), jnp.int32),
        token_pos=jnp.arange(T, dtype=jnp.int32),
        slot_mapping=jnp.arange(T, dtype=jnp.int32),
        query_start_loc=jnp.asarray([0, T], jnp.int32),
        seq_lens=jnp.asarray([T], jnp.int32),
        block_tables=jnp.asarray([[0]], jnp.int32),
        num_reqs=jnp.int32(1), num_tokens=jnp.int32(T))
    rows = ours.encode_images(params, jnp.asarray(img))
    span_idx = jnp.arange(2, 2 + 64, dtype=jnp.int32)
    hidden, _ = ours.apply(params, jnp.asarray(expanded), kv, md,
                           mm=(rows, span_idx))
    logits = np.asarray(ours.compute_logits(params, hidden))
    with torch.no_grad():
        exp_logits = hf(input_ids=torch.tensor([expanded]),
                        pixel_values=torch.tensor(img)).logits[0].numpy()
    np.testing.assert_allclose(logits, exp_logits, rtol=2e-3, atol=2e-3)

    # 3) Text-only greedy end-to-end through the engine.
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(tmp_path), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=128, max_num_seqs=4,
              max_model_len=256, tokenizer="unused")
    outs = llm.generate([[5, 6, 7, 8]],
                        SamplingParams(temperature=0.0, max_tokens=6,
                                       ignore_eos=True))
    with torch.no_grad():
        exp_txt = hf.generate(torch.tensor([[5, 6, 7, 8]]),
                              max_new_tokens=6, do_sample=False,
                              eos_token_id=None)
    assert outs[0].outputs[0].token_ids == exp_txt[0][4:].tolist()
