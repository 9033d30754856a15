"""Audio decoding for /v1/audio/transcriptions|translations.

The reference accepts anything librosa/soundfile can read
(aphrodite/endpoints/openai/serving_transcription.py:29-35,160 delegates to
librosa.load). This environment has no system audio codecs, so the formats
Whisper traffic actually uses are implemented from scratch:

- WAV  (stdlib `wave`: PCM 8/16/32-bit, any channel count)
- FLAC (from-scratch decoder below: constant/verbatim/fixed/LPC subframes,
  rice/rice2 residuals, all stereo decorrelation modes — the full
  mandatory-to-implement surface of the FLAC format spec)

Lossy perceptual codecs (mp3, ogg/vorbis, m4a/aac) are EXPLICITLY DROPPED:
a correct psychoacoustic decoder is thousands of lines of DSP (huffman
tables, MDCT banks) that belongs in a codec library, and this environment
forbids adding one. The error message tells the client what to transcode
to. See DROPPED_AUDIO_FORMATS.
"""
from __future__ import annotations

import io
import wave

import numpy as np

# Format -> why it is not supported (drop-ledger style, mirroring
# quantization.EXPLICITLY_DROPPED_QUANT).
DROPPED_AUDIO_FORMATS = {
    "mp3": "MPEG-1 Layer III needs a full psychoacoustic decoder "
           "(huffman tables + hybrid MDCT filterbank); no codec library "
           "in this environment. Transcode to WAV or FLAC.",
    "ogg": "Ogg/Vorbis needs floor-curve + codebook DSP of similar size. "
           "Transcode to WAV or FLAC.",
    "m4a/aac": "AAC is patent-encumbered DSP of similar size. "
               "Transcode to WAV or FLAC.",
}


def decode_audio(data: bytes):
    """Audio bytes -> (mono float32 waveform in [-1, 1], sample_rate).

    Sniffs the container magic; raises ValueError with a remediation hint
    for recognized-but-unsupported formats.
    """
    if data[:4] == b"RIFF":
        return _decode_wav(data)
    if data[:4] == b"fLaC":
        return _decode_flac(data)
    if data[:4] == b"OggS":
        raise ValueError("Ogg container not supported: "
                         + DROPPED_AUDIO_FORMATS["ogg"])
    if data[:3] == b"ID3" or (len(data) > 1 and data[0] == 0xFF
                              and (data[1] & 0xE0) == 0xE0):
        raise ValueError("mp3 not supported: "
                         + DROPPED_AUDIO_FORMATS["mp3"])
    if len(data) > 11 and data[4:8] == b"ftyp":
        raise ValueError("mp4/m4a container not supported: "
                         + DROPPED_AUDIO_FORMATS["m4a/aac"])
    raise ValueError("unrecognized audio format (supported: WAV, FLAC)")


def _decode_wav(data: bytes):
    """WAV bytes -> (mono float32 waveform, sample_rate) via stdlib."""
    with wave.open(io.BytesIO(data)) as w:
        sr = w.getframerate()
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        frames = w.readframes(w.getnframes())
    if width == 2:
        arr = np.frombuffer(frames, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        arr = np.frombuffer(frames, np.int32).astype(np.float32) / 2**31
    elif width == 1:
        arr = (np.frombuffer(frames, np.uint8).astype(np.float32)
               - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if n_ch > 1:
        arr = arr.reshape(-1, n_ch).mean(axis=1)
    return arr, sr


# --------------------------------------------------------------------------- #
# FLAC
# --------------------------------------------------------------------------- #
class _Bits:
    """MSB-first bit reader over a bytes object."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, bit_pos: int = 0):
        self.data = data
        self.pos = bit_pos

    def read(self, n: int) -> int:
        p, d = self.pos, self.data
        end = p + n
        # Gather the covering bytes, then shift out the tail.
        first, last = p >> 3, (end + 7) >> 3
        chunk = int.from_bytes(d[first:last], "big")
        chunk >>= (last << 3) - end
        self.pos = end
        return chunk & ((1 << n) - 1)

    def sread(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        # Count 0 bits until the terminating 1.
        n = 0
        p, d = self.pos, self.data
        while True:
            byte = d[p >> 3]
            rem = 8 - (p & 7)
            window = byte & ((1 << rem) - 1)
            if window == 0:
                n += rem
                p += rem
                continue
            lead = rem - window.bit_length()
            n += lead
            p += lead + 1
            self.pos = p
            return n

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _utf8_coded(bits: _Bits) -> int:
    """FLAC frame-header sample/frame number (UTF-8-style varint)."""
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while (b0 << n) & 0x80:
        n += 1
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        v = (v << 6) | (bits.read(8) & 0x3F)
    return v


_BLOCKSIZE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
              8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
              13: 8192, 14: 16384, 15: 32768}
_SAMPLE_SIZE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _read_residual(bits: _Bits, blocksize: int, order: int) -> list[int]:
    method = bits.read(2)
    if method > 1:
        raise ValueError("FLAC: reserved residual coding method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = bits.read(4)
    nparts = 1 << porder
    if blocksize % nparts or (blocksize >> porder) < order:
        raise ValueError("FLAC: bad rice partition order")
    out = []
    for part in range(nparts):
        count = (blocksize >> porder) - (order if part == 0 else 0)
        param = bits.read(plen)
        if param == escape:
            nbits = bits.read(5)
            if nbits == 0:
                out.extend([0] * count)
            else:
                out.extend(bits.sread(nbits) for _ in range(count))
        else:
            for _ in range(count):
                q = bits.unary()
                v = (q << param) | bits.read(param)
                out.append((v >> 1) ^ -(v & 1))
    return out


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _read_subframe(bits: _Bits, blocksize: int, bps: int) -> list[int]:
    if bits.read(1):
        raise ValueError("FLAC: subframe padding bit set")
    ftype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.unary() + 1
        bps -= wasted
    if ftype == 0:                                    # CONSTANT
        samples = [bits.sread(bps)] * blocksize
    elif ftype == 1:                                  # VERBATIM
        samples = [bits.sread(bps) for _ in range(blocksize)]
    elif 8 <= ftype <= 12:                            # FIXED, order 0-4
        order = ftype - 8
        samples = [bits.sread(bps) for _ in range(order)]
        resid = _read_residual(bits, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for r in resid:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append(pred + r)
    elif ftype >= 32:                                 # LPC, order 1-32
        order = ftype - 31
        samples = [bits.sread(bps) for _ in range(order)]
        precision = bits.read(4) + 1
        if precision == 16:
            raise ValueError("FLAC: invalid LPC precision")
        shift = bits.sread(5)
        coefs = [bits.sread(precision) for _ in range(order)]
        resid = _read_residual(bits, blocksize, order)
        for r in resid:
            pred = sum(c * samples[-1 - j]
                       for j, c in enumerate(coefs)) >> shift
            samples.append(pred + r)
    else:
        raise ValueError(f"FLAC: reserved subframe type {ftype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def _decode_flac(data: bytes):
    """FLAC bytes -> (mono float32, sample_rate). From-scratch decoder for
    the mandatory format surface (frames, all subframe types, rice/rice2
    residuals, stereo decorrelation); CRCs are not verified."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    sr = bps = channels = None
    total = 0
    while True:  # metadata blocks
        hdr = data[pos]
        btype, last = hdr & 0x7F, hdr & 0x80
        blen = int.from_bytes(data[pos + 1:pos + 4], "big")
        if btype == 0:  # STREAMINFO
            b = _Bits(data[pos + 4:pos + 4 + blen])
            b.read(16 + 16 + 24 + 24)
            sr = b.read(20)
            channels = b.read(3) + 1
            bps = b.read(5) + 1
            total = b.read(36)
        pos += 4 + blen
        if last:
            break
    if sr is None or sr == 0:
        raise ValueError("FLAC: missing/invalid STREAMINFO")

    bits = _Bits(data, pos * 8)
    chans: list[list[int]] = [[] for _ in range(channels)]
    nbits = len(data) * 8
    while bits.pos + 15 < nbits and (total == 0
                                     or len(chans[0]) < total):
        if bits.read(14) != 0x3FFE:
            raise ValueError("FLAC: lost frame sync")
        bits.read(1)          # reserved
        bits.read(1)          # blocking strategy
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        ss_code = bits.read(3)
        bits.read(1)          # reserved
        _utf8_coded(bits)
        if bs_code == 6:
            blocksize = bits.read(8) + 1
        elif bs_code == 7:
            blocksize = bits.read(16) + 1
        else:
            blocksize = _BLOCKSIZE[bs_code]
        if sr_code == 12:
            bits.read(8)
        elif sr_code in (13, 14):
            bits.read(16)
        fbps = bps if ss_code == 0 else _SAMPLE_SIZE[ss_code]
        bits.read(8)          # header CRC
        if ch_code < 8:       # independent channels
            subs = [_read_subframe(bits, blocksize, fbps)
                    for _ in range(ch_code + 1)]
        elif ch_code == 8:    # left/side
            left = _read_subframe(bits, blocksize, fbps)
            side = _read_subframe(bits, blocksize, fbps + 1)
            subs = [left, [l - s for l, s in zip(left, side)]]
        elif ch_code == 9:    # right/side
            side = _read_subframe(bits, blocksize, fbps + 1)
            right = _read_subframe(bits, blocksize, fbps)
            subs = [[s + r for s, r in zip(side, right)], right]
        elif ch_code == 10:   # mid/side
            mid = _read_subframe(bits, blocksize, fbps)
            side = _read_subframe(bits, blocksize, fbps + 1)
            subs = [[], []]
            for m, s in zip(mid, side):
                left = ((m << 1) | (s & 1)) + s
                subs[0].append(left >> 1)
                subs[1].append((left >> 1) - s)
        else:
            raise ValueError("FLAC: reserved channel assignment")
        bits.align()
        bits.read(16)         # frame CRC
        for c, s in zip(chans, subs):
            c.extend(s)

    if total:
        chans = [c[:total] for c in chans]
    arr = np.asarray(chans, np.float32) / float(1 << (bps - 1))
    return arr.mean(axis=0), sr
