"""Multi-LoRA serving: adapter math vs a merged-weights HF oracle, adapter
isolation in a mixed batch, runtime add/remove."""
import json

import numpy as np
import pytest

from aphrodite_tpu.sampling_params import SamplingParams

from tests.utils import save_tiny_hf_checkpoint, tiny_llama_hf_config

RANK = 4
ALPHA = 8.0


def _make_adapter(path, hf_model, seed, targets=("q_proj", "v_proj")):
    """Random LoRA adapter in peft layout + the merged torch oracle model."""
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
                A = (rs.randn(RANK, in_f) * 0.05).astype(np.float32)
                B = (rs.randn(out_f, RANK) * 0.05).astype(np.float32)
                tensors[f"base_model.model.{name}.lora_A.weight"] = A
                tensors[f"base_model.model.{name}.lora_B.weight"] = B
                mod.weight += torch.tensor(B @ A * scaling)
    path.mkdir(parents=True, exist_ok=True)
    save_file(tensors, str(path / "adapter_model.safetensors"))
    (path / "adapter_config.json").write_text(json.dumps(
        {"r": RANK, "lora_alpha": ALPHA,
         "target_modules": list(targets)}))
    return merged


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_lora")
    hf_model = save_tiny_hf_checkpoint(d, tiny_llama_hf_config())
    merged_a = _make_adapter(d / "adapter_a", hf_model, seed=1)
    merged_b = _make_adapter(d / "adapter_b", hf_model, seed=2)

    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(d), dtype="float32", block_size=16,
              num_kv_blocks=256, max_num_batched_tokens=128, max_num_seqs=8,
              max_model_len=256, tokenizer="unused", enable_lora=True,
              max_loras=2, max_lora_rank=8)
    llm.add_lora("a", str(d / "adapter_a"))
    llm.add_lora("b", str(d / "adapter_b"))
    return llm, hf_model, merged_a, merged_b


def _hf_greedy(model, prompt, n):
    import torch
    with torch.no_grad():
        out = model.generate(torch.tensor([prompt]), max_new_tokens=n,
                             do_sample=False, eos_token_id=None)
    return out[0][len(prompt):].tolist()


def test_lora_matches_merged_oracle(env):
    llm, base, merged_a, merged_b = env
    prompt = [3, 17, 99, 21]
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    got_a = llm.generate([prompt], params,
                         lora_request="a")[0].outputs[0].token_ids
    assert got_a == _hf_greedy(merged_a, prompt, 8)
    got_b = llm.generate([prompt], params,
                         lora_request="b")[0].outputs[0].token_ids
    assert got_b == _hf_greedy(merged_b, prompt, 8)
    got_base = llm.generate([prompt], params)[0].outputs[0].token_ids
    assert got_base == _hf_greedy(base, prompt, 8)
    # Adapters actually change the output for this random setup.
    assert len({tuple(got_a), tuple(got_b), tuple(got_base)}) >= 2




def test_lora_remove_and_reload(env):
    llm, base, *_ = env
    prompt = [5, 6, 7]
    params = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    with pytest.raises(ValueError):
        llm.generate([prompt], params, lora_request="nope")
    assert llm.remove_lora("b")
    with pytest.raises(ValueError):
        llm.generate([prompt], params, lora_request="b")
    import os
    llm.add_lora("b", os.path.join(
        llm.engine.config.model_config.model, "adapter_b"))


def test_mixed_batch_adapter_isolation(env):
    """Different adapters in ONE batch must not bleed into each other."""
    llm, base, merged_a, merged_b = env
    prompt = [3, 17, 99, 21]
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    eng = llm.engine
    eng.add_request("mix-base", prompt, params)
    eng.add_request("mix-a", prompt, params, lora_name="a")
    eng.add_request("mix-b", prompt, params, lora_name="b")
    results = {}
    while eng.has_unfinished_requests():
        for out in eng.step():
            agg = results.setdefault(out.request_id, [])
            agg.extend(out.outputs[0].token_ids)
    assert results["mix-base"] == _hf_greedy(base, prompt, 8)
    assert results["mix-a"] == _hf_greedy(merged_a, prompt, 8)
    assert results["mix-b"] == _hf_greedy(merged_b, prompt, 8)