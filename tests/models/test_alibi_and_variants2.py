"""Wave-2 decoder variants vs HF oracles: Bloom, MPT, Falcon (all three
decoder generations), GLM, GLM-4, plus Baichuan (fused-W_pack llama with
ALiBi/NormHead) tested against a hand-built checkpoint since its config
only exists as remote code."""
import json

import numpy as np
import torch

from aphrodite_tpu.sampling_params import SamplingParams
from tests.models.test_llama_variants import _check


def test_bloom(tmp_path):
    from transformers import BloomConfig
    _check(tmp_path, BloomConfig(
        vocab_size=256, hidden_size=64, n_layer=2, n_head=4,
        bos_token_id=1, eos_token_id=2))


def test_bloom_nonpow2_heads(tmp_path):
    from transformers import BloomConfig
    _check(tmp_path, BloomConfig(
        vocab_size=256, hidden_size=96, n_layer=2, n_head=6,
        bos_token_id=1, eos_token_id=2))


def test_mpt(tmp_path):
    from transformers import MptConfig
    _check(tmp_path, MptConfig(
        vocab_size=256, d_model=64, n_layers=2, n_heads=4, max_seq_len=512,
        bos_token_id=1, eos_token_id=2))


def test_mpt_nonpow2_clip(tmp_path):
    from transformers import MptConfig
    from transformers.models.mpt.configuration_mpt import MptAttentionConfig
    _check(tmp_path, MptConfig(
        vocab_size=256, d_model=96, n_layers=2, n_heads=6, max_seq_len=512,
        attn_config=MptAttentionConfig(clip_qkv=6.0, alibi_bias_max=8),
        bos_token_id=1, eos_token_id=2))


def test_falcon_new_arch(tmp_path):
    from transformers import FalconConfig
    _check(tmp_path, FalconConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_kv_heads=2, new_decoder_architecture=True,
        bias=False, max_position_embeddings=512,
        bos_token_id=1, eos_token_id=2))


def test_falcon_7b_style(tmp_path):
    from transformers import FalconConfig
    _check(tmp_path, FalconConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, new_decoder_architecture=False,
        multi_query=True, parallel_attn=True, bias=False, alibi=False,
        max_position_embeddings=512, bos_token_id=1, eos_token_id=2))


def test_falcon_rw_alibi(tmp_path):
    from transformers import FalconConfig
    _check(tmp_path, FalconConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, new_decoder_architecture=False,
        multi_query=False, parallel_attn=False, bias=True, alibi=True,
        max_position_embeddings=512, bos_token_id=1, eos_token_id=2))


def test_glm(tmp_path):
    from transformers import GlmConfig
    _check(tmp_path, GlmConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, partial_rotary_factor=0.5, attention_bias=True,
        max_position_embeddings=512, pad_token_id=0, bos_token_id=1,
        eos_token_id=2))


def test_glm4(tmp_path):
    from transformers import Glm4Config
    _check(tmp_path, Glm4Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, partial_rotary_factor=0.5, attention_bias=True,
        max_position_embeddings=512, pad_token_id=0, bos_token_id=1,
        eos_token_id=2))


# ---------------------------------------------------------------- Baichuan
def _build_baichuan_ckpt(tmp_path, hidden=64, vocab=256, alibi_13b=False,
                         arch="BaichuanForCausalLM"):
    """Hand-built Baichuan checkpoint: a random llama-geometry model with
    fused W_pack and Baichuan's config.json (model_type requires remote
    code, exercising the generic-config fallback)."""
    rng = np.random.default_rng(0)
    L, H, II = 2, hidden, 2 * hidden
    heads = 4

    def r(*s):
        return rng.normal(0, 0.02, s).astype(np.float32)

    tensors = {
        "model.embed_tokens.weight": r(vocab, H),
        "model.norm.weight": np.ones((H,), np.float32),
        "lm_head.weight": r(vocab, H),
    }
    for i in range(L):
        p = f"model.layers.{i}."
        tensors[p + "self_attn.W_pack.weight"] = r(3 * H, H)
        tensors[p + "self_attn.o_proj.weight"] = r(H, H)
        tensors[p + "mlp.gate_proj.weight"] = r(II, H)
        tensors[p + "mlp.up_proj.weight"] = r(II, H)
        tensors[p + "mlp.down_proj.weight"] = r(H, II)
        tensors[p + "input_layernorm.weight"] = np.ones((H,), np.float32)
        tensors[p + "post_attention_layernorm.weight"] = np.ones(
            (H,), np.float32)
    from safetensors.numpy import save_file
    save_file(tensors, str(tmp_path / "model.safetensors"))
    cfg = {
        "architectures": [arch],
        "model_type": "baichuan",
        "hidden_size": H, "intermediate_size": II,
        "num_hidden_layers": L, "num_attention_heads": heads,
        "vocab_size": vocab, "rms_norm_eps": 1e-6,
        "hidden_act": "silu",
        "max_position_embeddings": 512 if alibi_13b else 4096,
        "tie_word_embeddings": False,
        "bos_token_id": 1, "eos_token_id": 2,
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg))
    return tensors


def test_baichuan_rope_vs_llama_oracle(tmp_path):
    """Baichuan-7B-style (rope): must match our own Llama model fed the
    same weights with W_pack split — validates the fused load path and the
    generic-config fallback end to end."""
    tensors = _build_baichuan_ckpt(tmp_path, hidden=64,
                                   arch="BaiChuanForCausalLM")
    # Equivalent llama checkpoint in a sibling dir.
    llama_dir = tmp_path / "llama"
    llama_dir.mkdir()
    lt = {}
    H = 64
    for k, v in tensors.items():
        if k.endswith("W_pack.weight"):
            base = k[: -len("W_pack.weight")]
            lt[base + "q_proj.weight"] = v[:H]
            lt[base + "k_proj.weight"] = v[H:2 * H]
            lt[base + "v_proj.weight"] = v[2 * H:]
        else:
            lt[k] = v
    from safetensors.numpy import save_file
    save_file(lt, str(llama_dir / "model.safetensors"))
    cfg = json.loads((tmp_path / "config.json").read_text())
    cfg["architectures"] = ["LlamaForCausalLM"]
    cfg["model_type"] = "llama"
    cfg["num_key_value_heads"] = cfg["num_attention_heads"]
    cfg["tie_word_embeddings"] = False
    (llama_dir / "config.json").write_text(json.dumps(cfg))

    from aphrodite_tpu.entrypoints.llm import LLM
    kw = dict(dtype="float32", block_size=16, num_kv_blocks=128,
              max_num_batched_tokens=64, max_num_seqs=4, max_model_len=256,
              tokenizer="unused")
    prompts = [[1, 5, 9, 20, 3], [7, 8, 9, 10, 11, 12]]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    out_b = LLM(model=str(tmp_path), **kw).generate(prompts, sp)
    out_l = LLM(model=str(llama_dir), **kw).generate(prompts, sp)
    for b, l in zip(out_b, out_l):
        assert b.outputs[0].token_ids == l.outputs[0].token_ids


def test_baichuan_13b_alibi_runs(tmp_path):
    """13B-style (hidden != 4096 -> ALiBi): smoke — decodes, deterministic,
    and consistent between a 1-shot and an incremental decode."""
    _build_baichuan_ckpt(tmp_path, hidden=64, alibi_13b=True)
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(tmp_path), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=256, tokenizer="unused")
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    a = llm.generate([[1, 5, 9, 20, 3]], sp)[0].outputs[0].token_ids
    # Prefill the prompt + first 4 generated tokens -> same continuation
    # (checks ALiBi biasing is position-consistent across prefill/decode).
    b = llm.generate([[1, 5, 9, 20, 3] + a[:4]],
                     SamplingParams(temperature=0.0, max_tokens=4,
                                    ignore_eos=True))[0].outputs[0].token_ids
    assert b == a[4:]
