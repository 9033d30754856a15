"""LoRA breadth (VERDICT r2 #9): GPT-NeoX (fused query_key_value split),
embed/lm_head boundary adapters, and LRU adapter-cache eviction — each
vs a merged-weights HF oracle."""
import json

import numpy as np
import pytest

from aphrodite_tpu.sampling_params import SamplingParams

RANK = 4
ALPHA = 8.0


def _mk_adapter(path, hf_model, seed, targets, embed=False, head=False):
    import copy
    import torch
    from safetensors.numpy import save_file

    rs = np.random.RandomState(seed)
    merged = copy.deepcopy(hf_model)
    tensors = {}
    scaling = ALPHA / RANK
    with torch.no_grad():
        for name, mod in merged.named_modules():
            if isinstance(mod, torch.nn.Linear) and \
                    any(name.endswith(t) for t in targets):
                out_f, in_f = mod.weight.shape
                A = (rs.randn(RANK, in_f) * 0.04).astype(np.float32)
                B = (rs.randn(out_f, RANK) * 0.04).astype(np.float32)
                tensors[f"base_model.model.{name}.lora_A.weight"] = A
                tensors[f"base_model.model.{name}.lora_B.weight"] = B
                mod.weight += torch.tensor(B @ A * scaling)
            if embed and isinstance(mod, torch.nn.Embedding) and \
                    name.endswith("embed_tokens"):
                V, H = mod.weight.shape
                A = (rs.randn(RANK, V) * 0.04).astype(np.float32)
                B = (rs.randn(H, RANK) * 0.04).astype(np.float32)
                tensors[f"base_model.model.{name}.lora_embedding_A"] = A
                tensors[f"base_model.model.{name}.lora_embedding_B"] = B
                mod.weight += torch.tensor((B @ A).T * scaling)
            if head and isinstance(mod, torch.nn.Linear) and \
                    name.endswith("lm_head"):
                out_f, in_f = mod.weight.shape
                A = (rs.randn(RANK, in_f) * 0.04).astype(np.float32)
                B = (rs.randn(out_f, RANK) * 0.04).astype(np.float32)
                tensors[f"base_model.{name}.lora_A.weight"] = A
                tensors[f"base_model.{name}.lora_B.weight"] = B
                mod.weight += torch.tensor(B @ A * scaling)
    path.mkdir(parents=True, exist_ok=True)
    save_file(tensors, str(path / "adapter_model.safetensors"))
    (path / "adapter_config.json").write_text(json.dumps(
        {"r": RANK, "lora_alpha": ALPHA, "target_modules": list(targets)}))
    return merged


def _hf_greedy(model, prompt, n):
    import torch
    with torch.no_grad():
        out = model.generate(torch.tensor([prompt]), max_new_tokens=n,
                             do_sample=False, eos_token_id=None)
    return out[0][len(prompt):].tolist()


def _llm(d, **kw):
    from aphrodite_tpu.entrypoints.llm import LLM
    return LLM(model=str(d), dtype="float32", block_size=16,
               num_kv_blocks=256, max_num_batched_tokens=128,
               max_num_seqs=8, max_model_len=256, tokenizer="unused",
               enable_lora=True, max_lora_rank=8, **kw)


def test_gpt_neox_lora_fused_qkv(tmp_path):
    import torch
    from transformers import AutoModelForCausalLM, GPTNeoXConfig
    cfg = GPTNeoXConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=512, tie_word_embeddings=False)
    torch.manual_seed(0)
    hf = AutoModelForCausalLM.from_config(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    merged = _mk_adapter(tmp_path / "ad", hf, 3,
                         ("query_key_value", "dense", "dense_h_to_4h",
                          "dense_4h_to_h"))
    llm = _llm(tmp_path, max_loras=2)
    llm.add_lora("a", str(tmp_path / "ad"))
    prompt = [3, 17, 99, 21]
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    got = llm.generate([prompt], params,
                       lora_request="a")[0].outputs[0].token_ids
    assert got == _hf_greedy(merged, prompt, 8)
    base = llm.generate([prompt], params)[0].outputs[0].token_ids
    assert base == _hf_greedy(hf, prompt, 8)
    assert got != base


def test_embed_and_lm_head_adapters(tmp_path):
    from tests.utils import save_tiny_hf_checkpoint, tiny_llama_hf_config
    hf = save_tiny_hf_checkpoint(tmp_path, tiny_llama_hf_config())
    merged = _mk_adapter(tmp_path / "ad", hf, 5, ("q_proj", "v_proj"),
                         embed=True, head=True)
    llm = _llm(tmp_path, max_loras=2)
    llm.add_lora("a", str(tmp_path / "ad"))
    mgr = llm.engine.core.worker.lora_manager
    assert mgr.has_embed and mgr.has_head
    prompt = [3, 17, 99, 21]
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    got = llm.generate([prompt], params,
                       lora_request="a")[0].outputs[0].token_ids
    assert got == _hf_greedy(merged, prompt, 8)
    base = llm.generate([prompt], params)[0].outputs[0].token_ids
    assert base == _hf_greedy(hf, prompt, 8)


def test_lru_eviction(tmp_path):
    from tests.utils import save_tiny_hf_checkpoint, tiny_llama_hf_config
    hf = save_tiny_hf_checkpoint(tmp_path, tiny_llama_hf_config())
    merged = {}
    for i, name in enumerate(["a", "b", "c"]):
        merged[name] = _mk_adapter(tmp_path / name, hf, 10 + i,
                                   ("q_proj", "v_proj"))
    llm = _llm(tmp_path, max_loras=2)
    llm.add_lora("a", str(tmp_path / "a"))
    llm.add_lora("b", str(tmp_path / "b"))
    prompt = [3, 17, 99]
    params = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    # touch "a" so "b" is the LRU victim
    llm.generate([prompt], params, lora_request="a")
    llm.add_lora("c", str(tmp_path / "c"))  # evicts "b"
    mgr = llm.engine.core.worker.lora_manager
    assert set(mgr.slots) == {"a", "c"}
    got_c = llm.generate([prompt], params,
                         lora_request="c")[0].outputs[0].token_ids
    assert got_c == _hf_greedy(merged["c"], prompt, 6)
    got_a = llm.generate([prompt], params,
                         lora_request="a")[0].outputs[0].token_ids
    assert got_a == _hf_greedy(merged["a"], prompt, 6)
    with pytest.raises(ValueError):
        llm.generate([prompt], params, lora_request="b")
