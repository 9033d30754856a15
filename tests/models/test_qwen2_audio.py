"""Qwen2-Audio vs the HF oracle: Whisper-style tower + avg-pool +
projector, per-item length masking, placeholder expansion by the length
formula."""
import numpy as np
import pytest
import torch

from aphrodite_tpu.sampling_params import SamplingParams

AUD = 250


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from transformers import Qwen2AudioConfig, \
        Qwen2AudioForConditionalGeneration
    from transformers.models.qwen2_audio.configuration_qwen2_audio import (
        Qwen2AudioEncoderConfig)
    torch.manual_seed(0)
    audio = Qwen2AudioEncoderConfig(
        d_model=32, encoder_layers=2, encoder_attention_heads=2,
        encoder_ffn_dim=64, num_mel_bins=16, max_source_positions=20)
    text = {"model_type": "qwen2", "vocab_size": 256, "hidden_size": 64,
            "intermediate_size": 128, "num_hidden_layers": 2,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "max_position_embeddings": 512, "rope_theta": 10000.0,
            "rms_norm_eps": 1e-6, "tie_word_embeddings": False}
    cfg = Qwen2AudioConfig(audio_config=audio.to_dict(), text_config=text,
                           audio_token_index=AUD, bos_token_id=1,
                           eos_token_id=2, pad_token_id=0)
    d = tmp_path_factory.mktemp("tiny_q2audio")
    hf = Qwen2AudioForConditionalGeneration(cfg).eval()
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf


def _llm(d, **kw):
    from aphrodite_tpu.entrypoints.llm import LLM
    args = dict(model=str(d), dtype="float32", block_size=16,
                num_kv_blocks=128, max_num_batched_tokens=128,
                max_num_seqs=4, max_model_len=256, tokenizer="unused")
    args.update(kw)
    return LLM(**args)


def _hf_gen(hf, ids, feats, fam, n_new):
    with torch.no_grad():
        out = hf.generate(
            torch.tensor([ids]),
            input_features=torch.tensor(feats) if feats is not None
            else None,
            feature_attention_mask=torch.tensor(fam) if fam is not None
            else None,
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            max_new_tokens=n_new, do_sample=False, eos_token_id=None)
    return out[0][len(ids):].tolist()


def test_qwen2_audio_matches_hf(ckpt):
    d, hf = ckpt
    rng = np.random.RandomState(0)
    frames = 40  # 2 * max_source_positions
    feats = rng.randn(1, 16, frames).astype(np.float32)
    fam = np.ones((1, frames), np.int64)
    # full-length audio: (40-1)//2+1 = 20 conv frames -> (20-2)//2+1 = 10
    n_tok = 10
    prompt = [1, 7] + [AUD] * n_tok + [5, 9, 20]
    llm = _llm(d)
    outs = llm.generate(
        [{"prompt_token_ids": prompt,
          "multi_modal_data": {"audio": {"input_features": feats,
                                         "feature_attention_mask": fam}}},
         [3, 11, 12, 13]],
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True))
    assert outs[0].outputs[0].token_ids == _hf_gen(hf, prompt, feats, fam, 8)
    assert outs[1].outputs[0].token_ids == _hf_gen(hf, [3, 11, 12, 13],
                                                   None, None, 8)


def test_qwen2_audio_partial_length(ckpt):
    """Shorter audio zero-padded to the chunk: attention masking + the
    token-count formula must match HF."""
    d, hf = ckpt
    rng = np.random.RandomState(1)
    frames, real = 40, 30
    feats = rng.randn(1, 16, frames).astype(np.float32)
    feats[:, :, real:] = 0.0
    fam = np.zeros((1, frames), np.int64)
    fam[:, :real] = 1
    n_tok = ((real - 1) // 2 + 1 - 2) // 2 + 1  # 7
    assert n_tok == 7
    prompt = [1, 7] + [AUD] * n_tok + [5, 9]
    llm = _llm(d)
    outs = llm.generate(
        [{"prompt_token_ids": prompt,
          "multi_modal_data": {"audio": {"input_features": feats,
                                         "feature_attention_mask": fam}}}],
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True))
    assert outs[0].outputs[0].token_ids == _hf_gen(hf, prompt, feats, fam, 8)
