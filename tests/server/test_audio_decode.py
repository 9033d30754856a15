"""audio.decode_audio: WAV + from-scratch FLAC decode (device-free).

The FLAC decoder is exercised against a minimal test-side encoder that
emits spec-conformant streams covering: verbatim/constant/fixed subframes,
rice residuals, multiple frames, and left/side stereo decorrelation.
Reference surface: serving_transcription decodes via librosa
(aphrodite/endpoints/openai/serving_transcription.py:160)."""
import io
import struct
import wave

import numpy as np
import pytest

from aphrodite_tpu.audio import decode_audio


class _BitW:
    def __init__(self):
        self.bits = []

    def w(self, val, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((val >> i) & 1)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self):
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _streaminfo(sr, channels, bps, total):
    b = _BitW()
    b.w(4096, 16)  # min blocksize
    b.w(4096, 16)  # max blocksize
    b.w(0, 24)
    b.w(0, 24)
    b.w(sr, 20)
    b.w(channels - 1, 3)
    b.w(bps - 1, 5)
    b.w(total, 36)
    body = b.bytes() + b"\x00" * 16  # md5
    return bytes([0x80]) + len(body).to_bytes(3, "big") + body


def _frame_header(b, blocksize, ch_code, frame_no):
    b.w(0x3FFE, 14)
    b.w(0, 1)       # reserved
    b.w(0, 1)       # fixed blocksize strategy
    b.w(7, 4)       # blocksize: 16-bit field follows
    b.w(0, 4)       # sample rate: from STREAMINFO
    b.w(ch_code, 4)
    b.w(4, 3)       # 16-bit samples
    b.w(0, 1)
    assert frame_no < 0x80
    b.w(frame_no, 8)  # utf8-coded frame number (single byte)
    b.w(blocksize - 1, 16)
    b.w(0, 8)       # header CRC (decoder skips)


def _sub_verbatim(b, samples, bps):
    b.w(0, 1)
    b.w(1, 6)
    b.w(0, 1)
    for s in samples:
        b.w(s & ((1 << bps) - 1), bps)


def _sub_constant(b, value, bps):
    b.w(0, 1)
    b.w(0, 6)
    b.w(0, 1)
    b.w(value & ((1 << bps) - 1), bps)


def _sub_fixed1_rice(b, samples, bps, param=6):
    b.w(0, 1)
    b.w(8 + 1, 6)   # FIXED order 1
    b.w(0, 1)
    b.w(samples[0] & ((1 << bps) - 1), bps)  # warmup
    b.w(0, 2)       # rice method 0 (4-bit params)
    b.w(0, 4)       # partition order 0
    b.w(param, 4)
    for i in range(1, len(samples)):
        r = samples[i] - samples[i - 1]
        u = (r << 1) ^ (r >> 63) if r >= 0 else ((-r) << 1) - 1
        q, rem = u >> param, u & ((1 << param) - 1)
        b.w(0, q) if q else None
        b.w(1, 1)
        b.w(rem, param)


def _flac(frames, sr=16000, channels=1, bps=16):
    total = sum(f[0] for f in frames)
    out = _streaminfo(sr, channels, bps, total)
    for i, (blocksize, ch_code, write_subs) in enumerate(frames):
        b = _BitW()
        _frame_header(b, blocksize, ch_code, i)
        write_subs(b)
        b.align()
        b.w(0, 16)  # frame CRC
        out += b.bytes()
    return b"fLaC" + out


def test_flac_verbatim_and_constant_mono():
    rng = np.random.RandomState(0)
    s1 = rng.randint(-2000, 2000, size=64).tolist()
    s2 = [123] * 32

    def subs1(b):
        _sub_verbatim(b, s1, 16)

    def subs2(b):
        _sub_constant(b, 123, 16)

    data = _flac([(64, 0, subs1), (32, 0, subs2)])
    wav, sr = decode_audio(data)
    assert sr == 16000
    expect = np.asarray(s1 + s2, np.float32) / 32768.0
    np.testing.assert_allclose(wav, expect, atol=1e-7)


def test_flac_fixed_rice_residual():
    # A ramp with noise: order-1 fixed prediction leaves small residuals.
    rng = np.random.RandomState(1)
    s = np.cumsum(rng.randint(-30, 30, size=96)).tolist()

    def subs(b):
        _sub_fixed1_rice(b, s, 16)

    wav, sr = decode_audio(_flac([(96, 0, subs)]))
    np.testing.assert_allclose(
        wav, np.asarray(s, np.float32) / 32768.0, atol=1e-7)


def test_flac_left_side_stereo():
    rng = np.random.RandomState(2)
    left = rng.randint(-5000, 5000, size=48).tolist()
    right = rng.randint(-5000, 5000, size=48).tolist()
    side = [l - r for l, r in zip(left, right)]

    def subs(b):
        _sub_verbatim(b, left, 16)
        _sub_verbatim(b, side, 17)  # side channel carries one extra bit

    wav, sr = decode_audio(_flac([(48, 8, subs)], channels=2))
    expect = (np.asarray(left, np.float32)
              + np.asarray(right, np.float32)) / 2 / 32768.0
    np.testing.assert_allclose(wav, expect, atol=1e-7)


def test_wav_roundtrip():
    sr = 8000
    samples = (np.sin(np.linspace(0, 40, 400)) * 20000).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(samples.tobytes())
    wav, got_sr = decode_audio(buf.getvalue())
    assert got_sr == sr
    np.testing.assert_allclose(wav, samples.astype(np.float32) / 32768.0,
                               atol=1e-6)


@pytest.mark.parametrize("payload,msg", [
    (b"ID3\x04" + b"\x00" * 64, "mp3"),
    (b"\xff\xfb\x90\x00" + b"\x00" * 64, "mp3"),
    (b"OggS\x00" + b"\x00" * 64, "Ogg"),
    (struct.pack(">I", 32) + b"ftypM4A " + b"\x00" * 64, "m4a"),
])
def test_lossy_formats_get_transcode_hint(payload, msg):
    with pytest.raises(ValueError, match=msg):
        decode_audio(payload)
    # and the drop is documented
    from aphrodite_tpu.audio import DROPPED_AUDIO_FORMATS
    assert "mp3" in DROPPED_AUDIO_FORMATS
