"""Prompt adapters (soft prompts): PEFT prompt-tuning embeddings prepend
virtual tokens via the embedding-scatter path. Oracle: HF forward with
inputs_embeds = [adapter rows; embed(prompt)]."""
import numpy as np
import pytest
import torch

from aphrodite_tpu.sampling_params import SamplingParams

from tests.utils import save_tiny_hf_checkpoint, tiny_llama_hf_config

N_VIRTUAL = 6


def test_prompt_adapter_matches_hf(tmp_path):
    from transformers import AutoModelForCausalLM
    from safetensors.numpy import save_file
    ckpt = tmp_path / "ckpt"
    pa_dir = tmp_path / "pa"
    ckpt.mkdir(), pa_dir.mkdir()
    cfg = tiny_llama_hf_config()
    save_tiny_hf_checkpoint(ckpt, cfg)
    rng = np.random.RandomState(0)
    emb = (0.05 * rng.randn(N_VIRTUAL, cfg.hidden_size)).astype(np.float32)
    save_file({"prompt_embeddings": emb},
              str(pa_dir / "adapter_model.safetensors"))

    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(ckpt), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=256, tokenizer="unused")
    prompt = [5, 9, 20, 3]
    outs = llm.generate(
        [{"prompt_token_ids": prompt, "prompt_adapter": str(pa_dir)},
         prompt],  # same prompt WITHOUT the adapter must differ
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True))

    hf = AutoModelForCausalLM.from_pretrained(str(ckpt)).eval()
    ids = list(prompt)
    with torch.no_grad():
        for _ in range(8):
            e = hf.get_input_embeddings()(torch.tensor([ids]))
            full = torch.cat([torch.tensor(emb)[None], e], dim=1)
            logits = hf(inputs_embeds=full).logits
            ids.append(int(logits[0, -1].argmax()))
    assert outs[0].outputs[0].token_ids == ids[len(prompt):]
    assert outs[0].outputs[0].token_ids != outs[1].outputs[0].token_ids
