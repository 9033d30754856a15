"""GGUF checkpoint import: from-scratch reader + ggml block dequant.

Parity: the reference's GGUF support (aphrodite/quantization/gguf.py +
kernels/quantization/gguf/) loads llama.cpp checkpoints and runs dequant
GEMMs natively. The TPU rebuild imports at load time instead: parse the
GGUF container (the public spec: magic/KV-metadata/tensor-infos/aligned
data), dequantize ggml blocks to the serving dtype with vectorized numpy,
remap tensor names to HF conventions, and reverse llama.cpp's rope
permutation of q/k — after which every downstream path (TP sharding,
further on-the-fly quantization, Pallas kernels) is format-agnostic.

No ``gguf`` package exists in this environment; the parser below
implements GGUF v2/v3 directly.
"""
from __future__ import annotations

import struct
from typing import Any, BinaryIO, Iterator

import numpy as np

GGUF_MAGIC = b"GGUF"

# --- GGUF KV value types -----------------------------------------------------
_KV_FMT = {0: "B", 1: "b", 2: "H", 3: "h", 4: "I", 5: "i", 6: "f",
           10: "Q", 11: "q", 12: "d"}
_T_STRING = 8
_T_ARRAY = 9
_T_BOOL = 7

# --- ggml tensor types (type id -> (block_elems, block_bytes)) ---------------
GGML_F32, GGML_F16 = 0, 1
GGML_Q4_0, GGML_Q4_1, GGML_Q5_0, GGML_Q5_1, GGML_Q8_0 = 2, 3, 6, 7, 8
GGML_Q4_K, GGML_Q5_K, GGML_Q6_K = 12, 13, 14
GGML_BF16 = 30
_BLOCK = {
    GGML_F32: (1, 4), GGML_F16: (1, 2), GGML_BF16: (1, 2),
    GGML_Q4_0: (32, 18), GGML_Q4_1: (32, 20),
    GGML_Q5_0: (32, 22), GGML_Q5_1: (32, 24), GGML_Q8_0: (32, 34),
    GGML_Q4_K: (256, 144), GGML_Q5_K: (256, 176), GGML_Q6_K: (256, 210),
}


def _read_str(f: BinaryIO) -> str:
    (n,) = struct.unpack("<Q", f.read(8))
    return f.read(n).decode("utf-8", errors="replace")


def _read_value(f: BinaryIO, vtype: int) -> Any:
    if vtype in _KV_FMT:
        fmt = _KV_FMT[vtype]
        (v,) = struct.unpack("<" + fmt, f.read(struct.calcsize(fmt)))
        return v
    if vtype == _T_BOOL:
        return bool(f.read(1)[0])
    if vtype == _T_STRING:
        return _read_str(f)
    if vtype == _T_ARRAY:
        (etype,) = struct.unpack("<I", f.read(4))
        (count,) = struct.unpack("<Q", f.read(8))
        return [_read_value(f, etype) for _ in range(count)]
    raise ValueError(f"unknown GGUF KV type {vtype}")


class GGUFFile:
    """Parsed GGUF container: ``metadata`` dict + lazy tensor access."""

    def __init__(self, path: str) -> None:
        self.path = path
        f = self._f = open(path, "rb")
        if f.read(4) != GGUF_MAGIC:
            raise ValueError(f"{path}: not a GGUF file")
        (self.version,) = struct.unpack("<I", f.read(4))
        if self.version < 2:
            raise ValueError(f"GGUF v{self.version} not supported (>=2)")
        n_tensors, n_kv = struct.unpack("<QQ", f.read(16))
        self.metadata: dict[str, Any] = {}
        for _ in range(n_kv):
            key = _read_str(f)
            (vtype,) = struct.unpack("<I", f.read(4))
            self.metadata[key] = _read_value(f, vtype)
        self.tensors: dict[str, tuple[tuple[int, ...], int, int]] = {}
        for _ in range(n_tensors):
            name = _read_str(f)
            (ndims,) = struct.unpack("<I", f.read(4))
            dims = struct.unpack(f"<{ndims}Q", f.read(8 * ndims))
            ttype, offset = struct.unpack("<IQ", f.read(12))
            # GGML dims are innermost-first; numpy shape is the reverse.
            self.tensors[name] = (tuple(reversed(dims)), ttype, offset)
        align = self.metadata.get("general.alignment", 32)
        pos = f.tell()
        self.data_start = (pos + align - 1) // align * align

    @property
    def arch(self) -> str:
        return self.metadata.get("general.architecture", "llama")

    def load(self, name: str) -> np.ndarray:
        """Read + dequantize one tensor to float32/float16."""
        shape, ttype, offset = self.tensors[name]
        if ttype not in _BLOCK:
            raise ValueError(f"{name}: unsupported ggml type {ttype}")
        block_elems, block_bytes = _BLOCK[ttype]
        n = int(np.prod(shape))
        nblocks = n // block_elems
        self._f.seek(self.data_start + offset)
        raw = np.frombuffer(self._f.read(nblocks * block_bytes), np.uint8)
        return dequantize(raw, ttype, nblocks).reshape(shape)

    def close(self) -> None:
        self._f.close()


# ---------------------------------------------------------------- dequant ---
def _f16(b: np.ndarray) -> np.ndarray:
    return b.view(np.float16).astype(np.float32)


def dequantize(raw: np.ndarray, ttype: int, nblocks: int) -> np.ndarray:
    """raw: uint8 [nblocks * block_bytes] -> float32 [nblocks * elems].
    Block layouts follow the public ggml quant spec (llama.cpp
    ggml-quants.c); each implemented as vectorized numpy over blocks."""
    if ttype == GGML_F32:
        return raw.view(np.float32).copy()
    if ttype == GGML_F16:
        return raw.view(np.float16).astype(np.float32)
    if ttype == GGML_BF16:
        out = np.zeros(raw.size // 2, np.uint32)
        out[:] = raw.view(np.uint16)
        return (out << 16).view(np.float32).copy()
    _, bb = _BLOCK[ttype]
    b = raw.reshape(nblocks, bb)
    if ttype == GGML_Q8_0:
        d = _f16(b[:, :2])  # [N,1] scale
        q = b[:, 2:].view(np.int8).astype(np.float32)
        return (d * q).reshape(-1)
    if ttype in (GGML_Q4_0, GGML_Q4_1):
        off = 2 if ttype == GGML_Q4_0 else 4
        d = _f16(b[:, :2])
        qs = b[:, off:off + 16]
        lo = (qs & 0xF).astype(np.float32)
        hi = (qs >> 4).astype(np.float32)
        q = np.concatenate([lo, hi], axis=1)  # elem j / j+16
        if ttype == GGML_Q4_0:
            return (d * (q - 8.0)).reshape(-1)
        m = _f16(b[:, 2:4])
        return (d * q + m).reshape(-1)
    if ttype in (GGML_Q5_0, GGML_Q5_1):
        off = 2 if ttype == GGML_Q5_0 else 4
        d = _f16(b[:, :2])
        qh = b[:, off:off + 4].copy().view(np.uint32)  # [N,1]
        qs = b[:, off + 4:off + 20]
        j = np.arange(16, dtype=np.uint32)
        h_lo = ((qh >> j) << 4) & 0x10            # elem j
        h_hi = (qh >> (j + 12)) & 0x10            # elem j+16
        lo = ((qs & 0xF) | h_lo.astype(np.uint8)).astype(np.float32)
        hi = ((qs >> 4) | h_hi.astype(np.uint8)).astype(np.float32)
        q = np.concatenate([lo, hi], axis=1)
        if ttype == GGML_Q5_0:
            return (d * (q - 16.0)).reshape(-1)
        m = _f16(b[:, 2:4])
        return (d * q + m).reshape(-1)
    if ttype == GGML_Q4_K:
        d = _f16(b[:, 0:2])                       # [N,1]
        dmin = _f16(b[:, 2:4])
        sc = b[:, 4:16]                           # [N,12] packed 6-bit
        qs = b[:, 16:144].reshape(nblocks, 4, 32)  # 4 chunks of 64 elems
        scs = np.zeros((nblocks, 8), np.float32)
        mins = np.zeros((nblocks, 8), np.float32)
        for j in range(8):  # get_scale_min_k4
            if j < 4:
                scs[:, j] = (sc[:, j] & 63)
                mins[:, j] = (sc[:, j + 4] & 63)
            else:
                scs[:, j] = (sc[:, j + 4] & 0xF) | ((sc[:, j - 4] >> 6) << 4)
                mins[:, j] = (sc[:, j + 4] >> 4) | ((sc[:, j] >> 6) << 4)
        lo = (qs & 0xF).astype(np.float32)        # sub-block 2c
        hi = (qs >> 4).astype(np.float32)         # sub-block 2c+1
        q = np.stack([lo, hi], axis=2).reshape(nblocks, 8, 32)
        y = d[:, :, None] * scs[:, :, None] * q \
            - dmin[:, :, None] * mins[:, :, None]
        return y.reshape(-1)
    if ttype == GGML_Q6_K:
        ql = b[:, 0:128].reshape(nblocks, 2, 64)
        qh = b[:, 128:192].reshape(nblocks, 2, 32)
        scales = b[:, 192:208].view(np.int8).astype(np.float32)  # [N,16]
        d = _f16(b[:, 208:210])
        out = np.zeros((nblocks, 2, 128), np.float32)
        sc = scales.reshape(nblocks, 2, 8)
        l = np.arange(32)
        is_ = l // 16                              # 0 or 1
        for half in range(2):
            qlh = ql[:, half]
            qhh = qh[:, half]
            q1 = ((qlh[:, :32] & 0xF) | ((qhh & 3) << 4)).astype(
                np.int32) - 32
            q2 = ((qlh[:, 32:] & 0xF) | (((qhh >> 2) & 3) << 4)).astype(
                np.int32) - 32
            q3 = ((qlh[:, :32] >> 4) | (((qhh >> 4) & 3) << 4)).astype(
                np.int32) - 32
            q4 = ((qlh[:, 32:] >> 4) | (((qhh >> 6) & 3) << 4)).astype(
                np.int32) - 32
            for k, q in enumerate((q1, q2, q3, q4)):
                out[:, half, 32 * k:32 * (k + 1)] = \
                    sc[:, half, is_ + 2 * k] * q
        return (d * out.reshape(nblocks, 256)).reshape(-1)
    raise ValueError(f"unsupported ggml type {ttype}")


# --------------------------------------------------------- HF name mapping --
_COMMON_MAP = {
    "token_embd.weight": "model.embed_tokens.weight",
    "output_norm.weight": "model.norm.weight",
    "output.weight": "lm_head.weight",
}
_LAYER_MAP = {
    "attn_norm.weight": "input_layernorm.weight",
    "attn_q.weight": "self_attn.q_proj.weight",
    "attn_k.weight": "self_attn.k_proj.weight",
    "attn_v.weight": "self_attn.v_proj.weight",
    "attn_q.bias": "self_attn.q_proj.bias",
    "attn_k.bias": "self_attn.k_proj.bias",
    "attn_v.bias": "self_attn.v_proj.bias",
    "attn_output.weight": "self_attn.o_proj.weight",
    "ffn_norm.weight": "post_attention_layernorm.weight",
    "ffn_gate.weight": "mlp.gate_proj.weight",
    "ffn_up.weight": "mlp.up_proj.weight",
    "ffn_down.weight": "mlp.down_proj.weight",
}

GGUF_ARCH_TO_HF = {
    "llama": "LlamaForCausalLM",
    "mistral": "MistralForCausalLM",
    "qwen2": "Qwen2ForCausalLM",
    "qwen3": "Qwen3ForCausalLM",
    "gemma": "GemmaForCausalLM",
    "gemma2": "Gemma2ForCausalLM",
    "phi3": "Phi3ForCausalLM",
    "mamba": "MambaForCausalLM",
}


def _reverse_permute(w: np.ndarray, n_head: int) -> np.ndarray:
    """Undo llama.cpp's rope permutation of q/k rows (llama arch only;
    same transform the HF GGUF loader applies)."""
    dim = w.shape[0] // n_head // 2
    return w.reshape(n_head, dim, 2, *w.shape[1:]) \
        .swapaxes(1, 2).reshape(w.shape)


def gguf_to_hf_config(g: GGUFFile):
    """Build the HF config from GGUF metadata (keys per the public
    llama.cpp conventions; same mapping transformers uses)."""
    from transformers import CONFIG_MAPPING
    arch = g.arch
    md = g.metadata
    p = arch + "."

    def get(key, default=None):
        return md.get(p + key, default)

    model_type = {"mistral": "mistral"}.get(arch, arch)
    kw = dict(
        max_position_embeddings=get("context_length", 2048),
        num_hidden_layers=get("block_count"),
        intermediate_size=get("feed_forward_length"),
        hidden_size=get("embedding_length"),
        rope_theta=get("rope.freq_base", 10000.0),
        num_attention_heads=get("attention.head_count"),
        num_key_value_heads=get("attention.head_count_kv"),
        rms_norm_eps=get("attention.layer_norm_rms_epsilon", 1e-5),
        vocab_size=md.get(p + "vocab_size",
                          len(md.get("tokenizer.ggml.tokens", [])) or None),
        architectures=[GGUF_ARCH_TO_HF.get(arch, "LlamaForCausalLM")],
        tie_word_embeddings="output.weight" not in g.tensors,
    )
    kw = {k: v for k, v in kw.items() if v is not None}
    cfg = CONFIG_MAPPING[model_type](**kw)
    return cfg


def gguf_weights_iterator(path: str) -> Iterator[tuple[str, np.ndarray]]:
    """Yield (HF tensor name, dequantized float32 array) for every tensor
    in a GGUF file."""
    g = GGUFFile(path)
    n_head = g.metadata.get(g.arch + ".attention.head_count")
    n_kv = g.metadata.get(g.arch + ".attention.head_count_kv", n_head)
    permute = g.arch in ("llama", "mistral")
    try:
        for name in g.tensors:
            if name in ("rope_freqs.weight",):
                continue
            w = g.load(name)
            if name in _COMMON_MAP:
                yield _COMMON_MAP[name], w
                continue
            if name.startswith("blk."):
                _, idx, sub = name.split(".", 2)
                hf_sub = _LAYER_MAP.get(sub)
                if hf_sub is None:
                    continue
                if permute and sub == "attn_q.weight":
                    w = _reverse_permute(w, n_head)
                elif permute and sub == "attn_k.weight":
                    w = _reverse_permute(w, n_kv)
                yield f"model.layers.{idx}.{hf_sub}", w
    finally:
        g.close()
