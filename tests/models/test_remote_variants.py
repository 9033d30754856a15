"""Remote-code architectures (no transformers class) tested against REAL
HF oracles by checkpoint-schema conversion: a tiny HF Llama/StableLM model
is exported under the remote arch's weight naming + config.json, and our
engine must reproduce HF's greedy tokens exactly.

Covers: InternLM2 (fused per-kv-group wqkv), Exaone-3 (GPT-style schema),
Orion (LN+bias llama ≡ StableLM geometry), MiniCPM (muP scales), Exaone4
(native HF oracle), Xverse/Solar (llama-exact aliases)."""
import json

import numpy as np
import torch

from aphrodite_tpu.sampling_params import SamplingParams

PROMPTS = [[1, 5, 9, 20, 3], [7, 8, 9, 10, 11, 12]]


def _tiny_llama(tie=False, kv_heads=2):
    from transformers import LlamaConfig, AutoModelForCausalLM
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=kv_heads, tie_word_embeddings=tie,
                      max_position_embeddings=512, bos_token_id=1,
                      eos_token_id=2)
    return AutoModelForCausalLM.from_config(cfg).eval(), cfg


def _run_ours(model_dir, n_new=8):
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(model_dir), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=256, tokenizer="unused")
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


def _save(tmp_path, tensors, cfg_dict):
    from safetensors.numpy import save_file
    tensors = {k: np.ascontiguousarray(v.detach().numpy()
                                       if torch.is_tensor(v) else v)
               for k, v in tensors.items()}
    save_file(tensors, str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps(cfg_dict))


def test_internlm2_vs_llama_oracle(tmp_path):
    hf, cfg = _tiny_llama()
    sd = hf.state_dict()
    nh, nkv, hd, H = 4, 2, 16, 64
    g = nh // nkv
    out = {"model.tok_embeddings.weight": sd["model.embed_tokens.weight"],
           "model.norm.weight": sd["model.norm.weight"],
           "output.weight": sd["lm_head.weight"]}
    for i in range(2):
        src = f"model.layers.{i}."
        dst = f"model.layers.{i}."
        q = sd[src + "self_attn.q_proj.weight"].reshape(nkv, g, hd, H)
        k = sd[src + "self_attn.k_proj.weight"].reshape(nkv, 1, hd, H)
        v = sd[src + "self_attn.v_proj.weight"].reshape(nkv, 1, hd, H)
        out[dst + "attention.wqkv.weight"] = torch.cat(
            [q, k, v], dim=1).reshape((g + 2) * nkv * hd, H)
        out[dst + "attention.wo.weight"] = sd[src + "self_attn.o_proj.weight"]
        out[dst + "feed_forward.w1.weight"] = sd[src + "mlp.gate_proj.weight"]
        out[dst + "feed_forward.w3.weight"] = sd[src + "mlp.up_proj.weight"]
        out[dst + "feed_forward.w2.weight"] = sd[src + "mlp.down_proj.weight"]
        out[dst + "attention_norm.weight"] = sd[src + "input_layernorm.weight"]
        out[dst + "ffn_norm.weight"] = sd[
            src + "post_attention_layernorm.weight"]
    _save(tmp_path, out, {
        "architectures": ["InternLM2ForCausalLM"], "model_type": "internlm2",
        "hidden_size": 64, "intermediate_size": 128, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2, "bias": False,
        "vocab_size": 256, "rms_norm_eps": 1e-6, "hidden_act": "silu",
        "rope_theta": 10000.0, "max_position_embeddings": 512,
        "tie_word_embeddings": False, "bos_token_id": 1, "eos_token_id": 2})
    assert _run_ours(tmp_path) == _hf_greedy(hf)


def test_exaone_vs_llama_oracle(tmp_path):
    hf, cfg = _tiny_llama()
    sd = hf.state_dict()
    ren = {"model.embed_tokens.weight": "transformer.wte.weight",
           "model.norm.weight": "transformer.ln_f.weight",
           "lm_head.weight": "lm_head.weight"}
    sub = {"self_attn.q_proj.weight": "attn.attention.q_proj.weight",
           "self_attn.k_proj.weight": "attn.attention.k_proj.weight",
           "self_attn.v_proj.weight": "attn.attention.v_proj.weight",
           "self_attn.o_proj.weight": "attn.attention.out_proj.weight",
           "mlp.gate_proj.weight": "mlp.c_fc_0.weight",
           "mlp.up_proj.weight": "mlp.c_fc_1.weight",
           "mlp.down_proj.weight": "mlp.c_proj.weight",
           "input_layernorm.weight": "ln_1.weight",
           "post_attention_layernorm.weight": "ln_2.weight"}
    out = {}
    for k, v in sd.items():
        if k in ren:
            out[ren[k]] = v
        elif k.startswith("model.layers."):
            _, _, i, rest = k.split(".", 3)
            out[f"transformer.h.{i}." + sub[rest]] = v
    _save(tmp_path, out, {
        "architectures": ["ExaoneForCausalLM"], "model_type": "exaone",
        "hidden_size": 64, "intermediate_size": 128, "num_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "vocab_size": 256, "layer_norm_epsilon": 1e-6,
        "activation_function": "silu", "rope_theta": 10000.0,
        "max_position_embeddings": 512, "tie_word_embeddings": False,
        "bos_token_id": 1, "eos_token_id": 2})
    assert _run_ours(tmp_path) == _hf_greedy(hf)


def test_orion_vs_stablelm_oracle(tmp_path):
    """Orion == StableLM geometry (LN+bias, full rotary, gated silu): save
    a tiny HF StableLM under Orion's config."""
    from transformers import StableLmConfig, AutoModelForCausalLM
    torch.manual_seed(0)
    cfg = StableLmConfig(vocab_size=256, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         partial_rotary_factor=1.0, use_qkv_bias=False,
                         use_parallel_residual=False, qk_layernorm=False,
                         max_position_embeddings=512, bos_token_id=1,
                         eos_token_id=2)
    hf = AutoModelForCausalLM.from_config(cfg).eval()
    _save(tmp_path, dict(hf.state_dict()), {
        "architectures": ["OrionForCausalLM"], "model_type": "orion",
        "hidden_size": 64, "intermediate_size": 128, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "vocab_size": 256, "rms_norm_eps": cfg.layer_norm_eps,
        "hidden_act": "silu", "rope_theta": 10000.0,
        "max_position_embeddings": 512, "tie_word_embeddings": False,
        "bos_token_id": 1, "eos_token_id": 2})
    assert _run_ours(tmp_path) == _hf_greedy(hf)


def test_minicpm_identity_scales_vs_llama(tmp_path):
    hf, cfg = _tiny_llama(tie=True)
    sd = {k: v for k, v in hf.state_dict().items()}
    _save(tmp_path, sd, {
        "architectures": ["MiniCPMForCausalLM"], "model_type": "minicpm",
        "hidden_size": 64, "intermediate_size": 128, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "vocab_size": 256, "rms_norm_eps": 1e-6, "hidden_act": "silu",
        "scale_emb": 1.0, "scale_depth": 2.0 ** 0.5,  # sqrt(L) -> rm == 1
        "dim_model_base": 64, "max_position_embeddings": 512,
        "tie_word_embeddings": True, "bos_token_id": 1, "eos_token_id": 2})
    assert _run_ours(tmp_path) == _hf_greedy(hf)


def test_exaone4(tmp_path):
    from transformers import Exaone4Config
    from tests.models.test_llama_variants import _check
    _check(tmp_path, Exaone4Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        sliding_window=None, sliding_window_pattern=1,
        layer_types=["full_attention"] * 2,
        max_position_embeddings=512,
        pad_token_id=0, bos_token_id=1, eos_token_id=2))


def test_xverse_alias_vs_llama(tmp_path):
    hf, cfg = _tiny_llama()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    d = json.loads((tmp_path / "config.json").read_text())
    d["architectures"] = ["XverseForCausalLM"]
    d["model_type"] = "xverse"
    (tmp_path / "config.json").write_text(json.dumps(d))
    assert _run_ours(tmp_path) == _hf_greedy(hf)
