"""GGUF import: from-scratch reader/dequant vs a spec-following writer.

A tiny llama checkpoint is quantized (Q8_0 / Q4_0 / Q4_K / Q6_K mix, F32
norms) and packed into a GGUF v3 file by this test — including llama.cpp's
q/k rope permutation. The loader must produce exactly the dequantized
values, so generation must match an HF oracle run on those dequantized
weights token-for-token."""
import struct

import numpy as np
import pytest
import torch

from aphrodite_tpu.sampling_params import SamplingParams

from tests.utils import tiny_llama_hf_config


# ---------------------------------------------------------------- quantizers
def q8_0(w):
    x = w.reshape(-1, 32).astype(np.float32)
    d = np.abs(x).max(1, keepdims=True) / 127.0
    d[d == 0] = 1.0
    q = np.clip(np.round(x / d), -127, 127).astype(np.int8)
    blocks = np.concatenate(
        [d.astype(np.float16).view(np.uint8), q.view(np.uint8)], axis=1)
    return blocks.reshape(-1), (d * q).reshape(w.shape)


def q4_0(w):
    x = w.reshape(-1, 32).astype(np.float32)
    amax = np.abs(x).max(1, keepdims=True)
    d = amax / 7.0
    d[d == 0] = 1.0
    q = np.clip(np.round(x / d) + 8, 0, 15).astype(np.uint8)
    packed = (q[:, :16] | (q[:, 16:] << 4)).astype(np.uint8)
    blocks = np.concatenate(
        [d.astype(np.float16).view(np.uint8), packed], axis=1)
    deq = (d.astype(np.float16).astype(np.float32)
           * (q.astype(np.float32) - 8.0))
    return blocks.reshape(-1), deq.reshape(w.shape)


def q4_k(w):
    x = w.reshape(-1, 8, 32).astype(np.float32)  # blocks of 256
    n = x.shape[0]
    xmin = np.minimum(x.min(2), 0)               # [-, 8]
    xmax = np.maximum(x.max(2), 0)
    sc6 = np.ones((n, 8)); mn6 = np.zeros((n, 8))
    d = (xmax - xmin).max(1) / (15.0 * 63.0)
    d[d == 0] = 1.0
    dmin = (-xmin).max(1) / 63.0
    dmin[dmin == 0] = 1.0
    mn6 = np.clip(np.round(-xmin / dmin[:, None]), 0, 63).astype(np.uint8)
    sc6 = np.clip(np.round(
        (xmax - xmin) / (15.0 * d[:, None])), 1, 63).astype(np.uint8)
    scale = d[:, None, None] * sc6[:, :, None]
    m = dmin[:, None, None] * mn6[:, :, None]
    q = np.clip(np.round((x + m) / scale), 0, 15).astype(np.uint8)
    deq = scale * q - m
    # pack scales/mins (get_scale_min_k4 inverse)
    sbytes = np.zeros((n, 12), np.uint8)
    for j in range(4):
        sbytes[:, j] = (sc6[:, j] & 63) | ((sc6[:, j + 4] >> 4) << 6)
        sbytes[:, j + 4] = (mn6[:, j] & 63) | ((mn6[:, j + 4] >> 4) << 6)
        sbytes[:, j + 8] = (sc6[:, j + 4] & 0xF) | ((mn6[:, j + 4] & 0xF)
                                                    << 4)
    qpack = np.zeros((n, 4, 32), np.uint8)
    qr = q.reshape(n, 4, 2, 32)
    qpack = (qr[:, :, 0] | (qr[:, :, 1] << 4)).astype(np.uint8)
    df = np.asarray(d, np.float16); mf = np.asarray(dmin, np.float16)
    blocks = np.concatenate(
        [df.view(np.uint8).reshape(n, 2), mf.view(np.uint8).reshape(n, 2),
         sbytes, qpack.reshape(n, 128)], axis=1)
    # dequant oracle must go through f16 scale storage
    d16 = df.astype(np.float32); m16 = mf.astype(np.float32)
    deq = (d16[:, None, None] * sc6 [:, :, None] * q
           - m16[:, None, None] * mn6[:, :, None])
    return blocks.reshape(-1), deq.reshape(w.shape)


def q6_k(w):
    x = w.reshape(-1, 16, 16).astype(np.float32)  # 16 sub-blocks of 16
    n = x.shape[0]
    amax_sub = np.abs(x).max(2)                   # [n, 16]
    d = amax_sub.max(1) / (31.0 * 127.0)
    d[d == 0] = 1.0
    sc = np.clip(np.round(amax_sub / (31.0 * d[:, None])), 1, 127
                 ).astype(np.int8)
    scale = d[:, None, None] * sc[:, :, None]
    q = np.clip(np.round(x / scale) + 32, 0, 63).astype(np.uint8)
    d16 = np.asarray(d, np.float16)
    deq = (d16.astype(np.float32)[:, None, None] * sc[:, :, None]
           * (q.astype(np.float32) - 32.0))
    # pack: per 128-half: ql 64B (low nibbles of l & l+32 | highs of l+64,
    # l+96), qh 32B (2-bit parts)
    qq = q.reshape(n, 2, 128)
    ql = np.zeros((n, 2, 64), np.uint8)
    qh = np.zeros((n, 2, 32), np.uint8)
    for half in range(2):
        h = qq[:, half]
        q1, q2, q3, q4 = h[:, :32], h[:, 32:64], h[:, 64:96], h[:, 96:]
        ql[:, half, :32] = (q1 & 0xF) | ((q3 & 0xF) << 4)
        ql[:, half, 32:] = (q2 & 0xF) | ((q4 & 0xF) << 4)
        qh[:, half] = ((q1 >> 4) | ((q2 >> 4) << 2) | ((q3 >> 4) << 4)
                       | ((q4 >> 4) << 6))
    blocks = np.concatenate(
        [ql.reshape(n, 128), qh.reshape(n, 64),
         sc.view(np.uint8), d16.view(np.uint8).reshape(n, 2)], axis=1)
    return blocks.reshape(-1), deq.reshape(w.shape)


QUANTS = {0: None, 8: q8_0, 2: q4_0, 12: q4_k, 14: q6_k}


# -------------------------------------------------------------- GGUF writer
def _w_str(f, s):
    b = s.encode()
    f.write(struct.pack("<Q", len(b))); f.write(b)


def _w_kv(f, key, vtype, value):
    _w_str(f, key)
    f.write(struct.pack("<I", vtype))
    fmt = {4: "I", 6: "f", 10: "Q"}[vtype]
    f.write(struct.pack("<" + fmt, value))


def write_gguf(path, metadata, tensors):
    """tensors: list of (name, np f32 array, ggml_type)."""
    with open(path, "wb") as f:
        f.write(b"GGUF")
        f.write(struct.pack("<I", 3))
        f.write(struct.pack("<QQ", len(tensors), len(metadata)))
        for key, (vtype, value) in metadata.items():
            if vtype == 8:
                _w_str(f, key); f.write(struct.pack("<I", 8))
                _w_str(f, value)
            else:
                _w_kv(f, key, vtype, value)
        datas, offset = [], 0
        for name, arr, ttype in tensors:
            if ttype == 0:
                data = arr.astype(np.float32).tobytes()
            else:
                data, _ = QUANTS[ttype](arr)
                data = data.tobytes()
            _w_str(f, name)
            dims = tuple(reversed(arr.shape))
            f.write(struct.pack("<I", len(dims)))
            f.write(struct.pack(f"<{len(dims)}Q", *dims))
            f.write(struct.pack("<IQ", ttype, offset))
            pad = (-len(data)) % 32
            datas.append(data + b"\0" * pad)
            offset += len(data) + pad
        f.write(b"\0" * ((-f.tell()) % 32))
        for data in datas:
            f.write(data)


def _permute(w, n_head):
    dim = w.shape[0] // n_head // 2
    return w.reshape(n_head, 2, dim, *w.shape[1:]) \
        .swapaxes(1, 2).reshape(w.shape)


def test_gguf_llama_roundtrip(tmp_path):
    from transformers import LlamaForCausalLM
    cfg = tiny_llama_hf_config(hidden=64, heads=4, kv_heads=2,
                               vocab_size=256, intermediate=128)
    torch.manual_seed(0)
    hf = LlamaForCausalLM(cfg)
    sd = {k: v.numpy().astype(np.float32)
          for k, v in hf.state_dict().items()}

    gg_name = {
        "model.embed_tokens.weight": ("token_embd.weight", 8),
        "model.norm.weight": ("output_norm.weight", 0),
        "lm_head.weight": ("output.weight", 14),
    }
    sub_map = {
        "input_layernorm.weight": ("attn_norm.weight", 0),
        "self_attn.q_proj.weight": ("attn_q.weight", 2),
        "self_attn.k_proj.weight": ("attn_k.weight", 8),
        "self_attn.v_proj.weight": ("attn_v.weight", 12),
        "self_attn.o_proj.weight": ("attn_output.weight", 14),
        "post_attention_layernorm.weight": ("ffn_norm.weight", 0),
        "mlp.gate_proj.weight": ("ffn_gate.weight", 2),
        "mlp.up_proj.weight": ("ffn_up.weight", 8),
        "mlp.down_proj.weight": ("ffn_down.weight", 12),
    }
    tensors, oracle_sd = [], {}
    for name, w in sd.items():
        if name in gg_name:
            gname, ttype = gg_name[name]
        elif name.startswith("model.layers."):
            idx, sub = name[len("model.layers."):].split(".", 1)
            mapped = sub_map.get(sub)
            if mapped is None:
                continue
            gname, ttype = f"blk.{idx}.{mapped[0]}", mapped[1]
        else:
            continue
        deq = w if ttype == 0 else QUANTS[ttype](w)[1]
        oracle_sd[name] = torch.tensor(deq)
        stored = w
        if gname.endswith("attn_q.weight"):
            stored = _permute(w, cfg.num_attention_heads)
        elif gname.endswith("attn_k.weight"):
            stored = _permute(w, cfg.num_key_value_heads)
        tensors.append((gname, stored, ttype))

    path = str(tmp_path / "tiny.gguf")
    write_gguf(path, {
        "general.architecture": (8, "llama"),
        "llama.block_count": (4, cfg.num_hidden_layers),
        "llama.context_length": (4, 512),
        "llama.embedding_length": (4, cfg.hidden_size),
        "llama.feed_forward_length": (4, cfg.intermediate_size),
        "llama.attention.head_count": (4, cfg.num_attention_heads),
        "llama.attention.head_count_kv": (4, cfg.num_key_value_heads),
        "llama.attention.layer_norm_rms_epsilon": (6, cfg.rms_norm_eps),
        "llama.rope.freq_base": (6, 10000.0),
        "llama.vocab_size": (4, cfg.vocab_size),
    }, tensors)

    hf.load_state_dict(oracle_sd, strict=False)
    hf = hf.eval()

    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=path, dtype="float32", block_size=16, num_kv_blocks=128,
              max_num_batched_tokens=64, max_num_seqs=4, max_model_len=256,
              tokenizer="unused")
    prompts = [[1, 5, 9, 20, 3], [7, 8, 9, 10, 11, 12]]
    outs = llm.generate(prompts, SamplingParams(temperature=0.0,
                                                max_tokens=8,
                                                ignore_eos=True))
    for p, out in zip(prompts, outs):
        with torch.no_grad():
            exp = hf.generate(torch.tensor([p]), max_new_tokens=8,
                              do_sample=False,
                              eos_token_id=None)[0][len(p):].tolist()
        assert out.outputs[0].token_ids == exp, p
