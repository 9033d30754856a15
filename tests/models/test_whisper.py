"""Whisper (encoder-decoder ASR) vs an HF oracle.

Covers: log-mel frontend parity (shared feature extractor), the conv+
transformer audio encoder, cross-attention decode over the per-request
encoder cache, batching an audio request next to another, and multi-step
decode being correctly disabled for encoder-decoder models."""
import numpy as np
import pytest
import torch

from aphrodite_tpu.sampling_params import SamplingParams


def tiny_whisper_cfg():
    from transformers import WhisperConfig
    return WhisperConfig(
        vocab_size=256, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64, num_mel_bins=16,
        max_source_positions=100, max_target_positions=128,
        decoder_start_token_id=3, pad_token_id=0, bos_token_id=1,
        eos_token_id=2, suppress_tokens=[], begin_suppress_tokens=[])


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from transformers import WhisperForConditionalGeneration
    torch.manual_seed(0)
    d = tmp_path_factory.mktemp("tiny_whisper")
    hf = WhisperForConditionalGeneration(tiny_whisper_cfg()).eval()
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf


def _hf_greedy(hf, feats, dec_ids, n_new):
    """Manual greedy loop (avoids whisper-specific generate() logic)."""
    ids = list(dec_ids)
    feats_t = torch.tensor(feats)
    with torch.no_grad():
        for _ in range(n_new):
            out = hf(input_features=feats_t,
                     decoder_input_ids=torch.tensor([ids]))
            ids.append(int(out.logits[0, -1].argmax()))
    return ids[len(dec_ids):]


def test_whisper_matches_hf(ckpt):
    d, hf = ckpt
    from aphrodite_tpu.entrypoints.llm import LLM
    from aphrodite_tpu.multimodal import WhisperAdapter
    rng = np.random.RandomState(0)
    wav1 = (0.1 * rng.randn(32000)).astype(np.float32)  # 2 s @ 16 kHz
    wav2 = (0.1 * np.sin(np.arange(24000) / 20)).astype(np.float32)
    adapter = WhisperAdapter(tiny_whisper_cfg())

    llm = LLM(model=str(d), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=128, tokenizer="unused")
    dec1, dec2 = [3], [3, 7, 9]
    outs = llm.generate(
        [{"prompt_token_ids": dec1, "multi_modal_data": {"audio": wav1}},
         {"prompt_token_ids": dec2, "multi_modal_data": {"audio": wav2}}],
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True))
    exp1 = _hf_greedy(hf, adapter.preprocess(wav1), dec1, 8)
    exp2 = _hf_greedy(hf, adapter.preprocess(wav2), dec2, 8)
    assert outs[0].outputs[0].token_ids == exp1
    assert outs[1].outputs[0].token_ids == exp2


def test_whisper_resampling_path(ckpt):
    """(waveform, sr) tuples resample to 16 kHz before the mel frontend."""
    d, _ = ckpt
    from aphrodite_tpu.entrypoints.llm import LLM
    rng = np.random.RandomState(1)
    wav8k = (0.1 * rng.randn(16000)).astype(np.float32)
    llm = LLM(model=str(d), dtype="float32", block_size=16,
              num_kv_blocks=64, max_num_batched_tokens=64, max_num_seqs=2,
              max_model_len=128, tokenizer="unused")
    outs = llm.generate(
        [{"prompt_token_ids": [3],
          "multi_modal_data": {"audio": (wav8k, 8000)}}],
        SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True))
    assert len(outs[0].outputs[0].token_ids) == 4
