"""Checkpoint importers: bitsandbytes NF4/int8, HQQ, ModelOpt FP8, NVFP4.

Each test hand-builds a tiny llama checkpoint in the target format's exact
serialization (the quantizer libs are not installed here), then checks our
engine against an oracle fed the *identically dequantized* weights — the
importer math and plumbing must be token-exact."""
import json

import numpy as np
import pytest
import torch

from aphrodite_tpu.sampling_params import SamplingParams

PROMPTS = [[1, 5, 9, 20, 3], [7, 8, 9, 10, 11, 12]]
_PROJS = ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
          "self_attn.o_proj", "mlp.gate_proj", "mlp.up_proj",
          "mlp.down_proj")

NF4 = np.array([
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.562617301940918,
    0.7229568362236023, 1.0], np.float32)


def _tiny_llama_fp():
    from transformers import LlamaConfig, AutoModelForCausalLM
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, tie_word_embeddings=False,
                      max_position_embeddings=512, bos_token_id=1,
                      eos_token_id=2)
    cfg.architectures = ["LlamaForCausalLM"]
    hf = AutoModelForCausalLM.from_config(cfg).eval()
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in hf.state_dict().items()}
    return hf, cfg, sd


def _is_linear(name):
    return name.startswith("model.layers.") and \
        any(p in name for p in _PROJS) and name.endswith(".weight")


def _run(model_dir, n_new=8, **kw):
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(model_dir), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=256, tokenizer="unused", **kw)
    outs = llm.generate(PROMPTS, SamplingParams(temperature=0.0,
                                                max_tokens=n_new,
                                                ignore_eos=True))
    return [o.outputs[0].token_ids for o in outs]


def _hf_greedy(hf, n_new=8):
    exp = []
    for p in PROMPTS:
        with torch.no_grad():
            exp.append(hf.generate(torch.tensor([p]), max_new_tokens=n_new,
                                   do_sample=False,
                                   eos_token_id=None)[0][len(p):].tolist())
    return exp


def _save(d, tensors, cfg, quant_cfg=None):
    from safetensors.numpy import save_file
    save_file({k: np.ascontiguousarray(v) for k, v in tensors.items()},
              str(d / "model.safetensors"))
    c = json.loads(cfg.to_json_string())
    if quant_cfg is not None:
        c["quantization_config"] = quant_cfg
    (d / "config.json").write_text(json.dumps(c))


# ------------------------------------------------------------------ bnb nf4
def _bnb4_quantize(w, blocksize=64, nested_blocksize=256):
    """Quantize one [out, in] weight into bnb 4-bit double-quantized
    serialization tensors; returns (tensors dict keyed by suffix,
    dequantized fp weight)."""
    flat = w.reshape(-1)
    n = flat.size
    pad = (-n) % blocksize
    fpad = np.concatenate([flat, np.zeros(pad, np.float32)])
    blocks = fpad.reshape(-1, blocksize)
    absmax = np.abs(blocks).max(axis=1)
    absmax = np.maximum(absmax, 1e-8)
    normed = blocks / absmax[:, None]
    codes = np.argmin(np.abs(normed[:, :, None] - NF4[None, None, :]),
                      axis=-1).astype(np.uint8)
    # nested (double) quantization of absmax
    offset = np.float32(absmax.mean())
    centered = absmax - offset
    npad = (-centered.size) % nested_blocksize
    cpad = np.concatenate([centered, np.zeros(npad, np.float32)])
    nblocks = cpad.reshape(-1, nested_blocksize)
    nested_absmax = np.maximum(np.abs(nblocks).max(axis=1), 1e-8)
    nmap = np.linspace(-1.0, 1.0, 256).astype(np.float32)
    ncodes = np.argmin(
        np.abs((nblocks / nested_absmax[:, None])[:, :, None]
               - nmap[None, None, :]), axis=-1).astype(np.uint8)
    ncodes = ncodes.reshape(-1)[:centered.size]
    absmax_deq = nmap[ncodes.astype(np.int64)] * \
        nested_absmax[np.arange(centered.size) // nested_blocksize] + offset
    # packed nibbles: element 2i in the high nibble
    cflat = codes.reshape(-1)[:n + pad]
    packed = ((cflat[0::2] << 4) | cflat[1::2]).astype(np.uint8)
    deq = (NF4[cflat.astype(np.int64)]
           * absmax_deq[np.arange(n + pad) // blocksize])[:n].reshape(w.shape)
    state = {"blocksize": blocksize, "shape": list(w.shape),
             "dtype": "float32", "nested_blocksize": nested_blocksize,
             "nested_offset": float(offset), "nested_dtype": "float32"}
    state_bytes = np.frombuffer(json.dumps(state).encode(), np.uint8).copy()
    return {
        "": packed.reshape(-1, 1),
        ".absmax": ncodes,
        ".nested_absmax": nested_absmax,
        ".nested_quant_map": nmap,
        ".quant_map": NF4,
        ".quant_state.bitsandbytes__nf4": state_bytes,
    }, deq.astype(np.float32)


def test_bitsandbytes_nf4(tmp_path):
    hf, cfg, sd = _tiny_llama_fp()
    out = {}
    for name, w in sd.items():
        if _is_linear(name):
            tensors, deq = _bnb4_quantize(w)
            for suffix, t in tensors.items():
                out[name + suffix] = t
            # oracle gets the dequantized values
            with torch.no_grad():
                dict(hf.named_parameters())[name].copy_(torch.tensor(deq))
        else:
            out[name] = w
    _save(tmp_path, out, cfg, {"quant_method": "bitsandbytes",
                               "load_in_4bit": True,
                               "bnb_4bit_quant_type": "nf4"})
    assert _run(tmp_path) == _hf_greedy(hf)


def test_bitsandbytes_int8(tmp_path):
    hf, cfg, sd = _tiny_llama_fp()
    bnb_dir, fp_dir = tmp_path / "bnb", tmp_path / "fp"
    bnb_dir.mkdir(), fp_dir.mkdir()
    out, fp = {}, {}
    for name, w in sd.items():
        if _is_linear(name):
            scb = np.maximum(np.abs(w).max(axis=1), 1e-8)
            q = np.clip(np.round(w / scb[:, None] * 127), -127,
                        127).astype(np.int8)
            out[name] = q
            out[name + ".SCB"] = scb.astype(np.float32)
            fp[name] = (q.astype(np.float32) * scb[:, None] / 127.0)
        else:
            out[name] = w
            fp[name] = w
    _save(bnb_dir, out, cfg, {"quant_method": "bitsandbytes",
                              "load_in_8bit": True})
    _save(fp_dir, fp, cfg)
    # both paths on-the-fly-quantize the same dequantized fp values
    assert _run(bnb_dir) == _run(fp_dir, quantization="w8a16")


# ---------------------------------------------------------------------- HQQ
def test_hqq(tmp_path):
    hf, cfg, sd = _tiny_llama_fp()
    g = 64
    out = {}
    for name, w in sd.items():
        if _is_linear(name):
            o, k = w.shape
            wg = w.reshape(o, k // g, g)
            wmax, wmin = wg.max(axis=2), wg.min(axis=2)
            scale = np.maximum((wmax - wmin) / 15.0, 1e-8)
            zero = np.round(-wmin / scale)
            q = np.clip(np.round(w.reshape(o, -1, g) / scale[:, :, None])
                        + zero[:, :, None], 0, 15).astype(np.uint8)
            q = q.reshape(o, k)
            deq = ((q.reshape(o, -1, g).astype(np.float32)
                    - zero[:, :, None]) * scale[:, :, None]).reshape(o, k)
            with torch.no_grad():
                dict(hf.named_parameters())[name].copy_(torch.tensor(deq))
            base = name[:-len(".weight")]
            half = q.reshape(-1, k)
            top, bot = half[:o // 2], half[o // 2:]
            out[base + ".W_q"] = ((top << 4) | bot).astype(np.uint8)
            out[base + ".zero"] = zero.reshape(-1, 1).astype(np.float32)
            out[base + ".scale"] = scale.reshape(-1, 1).astype(np.float32)
        else:
            out[name] = w
    _save(tmp_path, out, cfg, {
        "quant_method": "hqq",
        "quant_config": {"weight_quant_params": {"nbits": 4,
                                                 "group_size": g}},
        "skip_modules": ["lm_head"]})
    ours = _run(tmp_path)
    assert ours == _hf_greedy(hf)


# ----------------------------------------------------------------- modelopt
def test_modelopt_fp8(tmp_path):
    import ml_dtypes
    hf, cfg, sd = _tiny_llama_fp()
    mo_dir, fp_dir = tmp_path / "mo", tmp_path / "fp"
    mo_dir.mkdir(), fp_dir.mkdir()
    out, fp = {}, {}
    for name, w in sd.items():
        if _is_linear(name):
            scale = np.float32(max(np.abs(w).max() / 448.0, 1e-8))
            q = (w / scale).astype(ml_dtypes.float8_e4m3fn)
            out[name] = q
            out[name + "_scale"] = np.array([scale], np.float32)
            fp[name] = q.astype(np.float32) * scale
        else:
            out[name] = w
            fp[name] = w
    _save(mo_dir, out, cfg)
    (mo_dir / "hf_quant_config.json").write_text(json.dumps(
        {"quantization": {"quant_algo": "FP8",
                          "kv_cache_quant_algo": None}}))
    _save(fp_dir, fp, cfg)
    assert _run(mo_dir) == _run(fp_dir, quantization="fp8")


def test_modelopt_nvfp4(tmp_path):
    import ml_dtypes
    hf, cfg, sd = _tiny_llama_fp()
    E2M1 = np.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0], np.float32)
    grid = np.concatenate([E2M1, -E2M1])  # index = sign<<3 | mag
    out = {}
    for name, w in sd.items():
        if _is_linear(name):
            o, k = w.shape
            s2 = np.float32(max(np.abs(w).max() / (6.0 * 448.0), 1e-8))
            blocks = w.reshape(o, k // 16, 16)
            bs = (np.abs(blocks).max(axis=2) / 6.0 / s2).astype(
                ml_dtypes.float8_e4m3fn)
            bs_f = np.maximum(bs.astype(np.float32), 1e-8)
            normed = blocks / (bs_f[:, :, None] * s2)
            codes = np.argmin(np.abs(normed[:, :, :, None]
                                     - grid[None, None, None, :]),
                              axis=-1).astype(np.uint8).reshape(o, k)
            packed = (codes[:, 0::2] | (codes[:, 1::2] << 4)).astype(np.uint8)
            deq = (grid[codes.reshape(o, -1, 16).astype(np.int64)]
                   * bs_f[:, :, None] * s2).reshape(o, k)
            with torch.no_grad():
                dict(hf.named_parameters())[name].copy_(
                    torch.tensor(deq.astype(np.float32)))
            out[name] = packed
            out[name + "_scale"] = bs
            out[name + "_scale_2"] = np.array([s2], np.float32)
        else:
            out[name] = w
    _save(tmp_path, out, cfg)
    (tmp_path / "hf_quant_config.json").write_text(json.dumps(
        {"quantization": {"quant_algo": "NVFP4"}}))
    assert _run(tmp_path) == _hf_greedy(hf)
