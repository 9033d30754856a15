"""Granite Speech vs the HF oracle: conformer CTC encoder (Shaw block
attention, conv module with eval BatchNorm, mid-stack CTC branch),
windowed QFormer projector, and placeholder scatter over Granite."""
import numpy as np
import pytest
import torch

from aphrodite_tpu.sampling_params import SamplingParams

AUDIO = 250
CTX = 4          # conformer context_size
WINDOW, DSR = 4, 2   # projector window / downsample -> 2 queries per block


def _mk(tmp_path):
    from transformers import (Blip2QFormerConfig, GraniteConfig,
                              GraniteSpeechConfig,
                              GraniteSpeechEncoderConfig,
                              GraniteSpeechForConditionalGeneration)
    torch.manual_seed(0)
    enc = GraniteSpeechEncoderConfig(
        input_dim=16, num_layers=2, hidden_dim=32, feedforward_mult=2,
        num_heads=2, dim_head=16, output_dim=12, context_size=CTX,
        conv_kernel_size=3, conv_expansion_factor=2, max_pos_emb=8)
    proj = Blip2QFormerConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=48, encoder_hidden_size=32,
        cross_attention_frequency=1)
    txt = GraniteConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2)
    cfg = GraniteSpeechConfig(encoder_config=enc, projector_config=proj,
                              text_config=txt, downsample_rate=DSR,
                              window_size=WINDOW, audio_token_index=AUDIO)
    hf = GraniteSpeechForConditionalGeneration(cfg).eval()
    # Give BatchNorm non-trivial running statistics.
    for layer in hf.encoder.layers:
        bn = layer.conv.batch_norm
        bn.running_mean.data = torch.randn_like(bn.running_mean) * 0.05
        bn.running_var.data = 1.0 + 0.2 * torch.rand_like(bn.running_var)
    hf.save_pretrained(tmp_path, safe_serialization=True)
    return hf


def _features(T, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(1, T, 16).astype(np.float32) * 0.5


def _hf_gen(hf, ids, feats, n_tok, n_new):
    kwargs = {}
    if feats is not None:
        kwargs = {"input_features": torch.tensor(feats),
                  "input_features_mask": torch.ones(1, n_tok,
                                                    dtype=torch.bool)}
    with torch.no_grad():
        out = hf.generate(torch.tensor([ids]),
                          attention_mask=torch.ones(1, len(ids),
                                                    dtype=torch.long),
                          max_new_tokens=n_new, do_sample=False,
                          eos_token_id=None, **kwargs)
    return out[0][len(ids):].tolist()


def _llm(d, **kw):
    from aphrodite_tpu.entrypoints.llm import LLM
    args = dict(model=str(d), dtype="float32", block_size=16,
                num_kv_blocks=128, max_num_batched_tokens=64,
                max_num_seqs=4, max_model_len=128, tokenizer="unused")
    args.update(kw)
    return LLM(**args)


def test_granite_speech_matches_hf(tmp_path):
    hf = _mk(tmp_path)
    feats = _features(8)      # 2 blocks -> 4 audio tokens, no remainders
    n_tok = 4
    prompt = [1, 7] + [AUDIO] * n_tok + [5, 9]
    outs = _llm(tmp_path).generate(
        [{"prompt_token_ids": prompt,
          "multi_modal_data": {"audio": {
              "input_features": feats,
              "audio_embed_sizes": [n_tok]}}},
         [3, 11, 12, 13]],
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True))
    assert outs[0].outputs[0].token_ids == _hf_gen(hf, prompt, feats,
                                                   n_tok, 8)
    assert outs[1].outputs[0].token_ids == _hf_gen(hf, [3, 11, 12, 13],
                                                   None, None, 8)


def test_granite_speech_remainder_blocks(tmp_path):
    """T=7 leaves a remainder in both the conformer context blocks and the
    projector window (masked block attention + zero-padded last window)."""
    hf = _mk(tmp_path)
    feats = _features(7, seed=2)
    n_tok = 4  # ceil(7/4) = 2 blocks * 2 queries
    prompt = [1] + [AUDIO] * n_tok + [5]
    outs = _llm(tmp_path).generate(
        [{"prompt_token_ids": prompt,
          "multi_modal_data": {"audio": {
              "input_features": feats,
              "audio_embed_sizes": [n_tok]}}}],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))
    assert outs[0].outputs[0].token_ids == _hf_gen(hf, prompt, feats,
                                                   n_tok, 6)


def test_granite_speech_raw_waveform_path(tmp_path):
    """Raw audio through the numpy mel pipeline: correct token count and a
    clean end-to-end run (no torchaudio available to oracle the mel)."""
    _mk(tmp_path)
    wav = np.sin(np.linspace(0, 440 * 2 * np.pi, 2400)).astype(np.float32)
    # mel frames = 2400//160 + 1 = 16 -> enc 8 -> 2 blocks -> 4 tokens
    prompt = [1, AUDIO, 5]
    outs = _llm(tmp_path).generate(
        [{"prompt_token_ids": prompt, "multi_modal_data": {"audio": wav}}],
        SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True))
    assert len(outs[0].outputs[0].token_ids) == 4
