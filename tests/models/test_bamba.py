"""Bamba (Mamba-2 + rotary attention hybrid) vs the HF oracle, including
chunked-prefill state resume across the mixed cache pytree."""
import pytest
import torch

from aphrodite_tpu.sampling_params import SamplingParams


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from transformers import BambaConfig, BambaForCausalLM
    cfg = BambaConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, mamba_n_heads=8, mamba_d_head=16,
        mamba_expand=2, mamba_d_state=32, mamba_n_groups=1,
        mamba_d_conv=4, attn_layer_indices=[1, 3],
        max_position_embeddings=512, tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2)
    torch.manual_seed(0)
    hf = BambaForCausalLM(cfg).eval()
    d = tmp_path_factory.mktemp("tiny_bamba")
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf


def _hf_greedy(hf, p, n_new=8):
    with torch.no_grad():
        return hf.generate(torch.tensor([p]), max_new_tokens=n_new,
                           do_sample=False,
                           eos_token_id=None)[0][len(p):].tolist()


def test_bamba_matches_hf(ckpt):
    d, hf = ckpt
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(d), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=256, tokenizer="unused")
    prompts = [[1, 5, 9, 20, 3, 7, 11], [7, 8, 9, 10]]
    outs = llm.generate(prompts, SamplingParams(temperature=0.0,
                                                max_tokens=8,
                                                ignore_eos=True))
    for p, o in zip(prompts, outs):
        assert o.outputs[0].token_ids == _hf_greedy(hf, p)


def test_bamba_chunked_prefill(ckpt):
    d, hf = ckpt
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(d), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=16, max_num_seqs=2,
              max_model_len=256, tokenizer="unused")
    p = [2] * 11 + [9, 4] * 12  # 35 tokens -> 3 chunks
    outs = llm.generate([p], SamplingParams(temperature=0.0, max_tokens=6,
                                            ignore_eos=True))
    assert outs[0].outputs[0].token_ids == _hf_greedy(hf, p, 6)
