"""Live-server /v1/audio/transcriptions E2E against a tiny Whisper."""
import io
import struct
import wave

import numpy as np
import pytest

from tests.utils import RemoteOpenAIServer, build_tiny_tokenizer
from tests.models.test_whisper import tiny_whisper_cfg


def _wav_bytes(wav: np.ndarray, sr: int = 16000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(wav, -1, 1) * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def test_transcription_route(tmp_path):
    import httpx
    import torch
    from transformers import WhisperForConditionalGeneration
    torch.manual_seed(0)
    WhisperForConditionalGeneration(tiny_whisper_cfg()).save_pretrained(
        tmp_path, safe_serialization=True)
    build_tiny_tokenizer(tmp_path)
    rng = np.random.RandomState(0)
    wav = (0.1 * rng.randn(24000)).astype(np.float32)
    with RemoteOpenAIServer(str(tmp_path)) as srv:
        r = httpx.post(
            srv.base_url + "/v1/audio/transcriptions",
            files={"file": ("x.wav", _wav_bytes(wav), "audio/wav")},
            data={"model": "m", "temperature": "0"},
            timeout=180)
        assert r.status_code == 200, r.text
        assert isinstance(r.json()["text"], str)
