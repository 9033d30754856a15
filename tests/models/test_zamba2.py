"""Zamba2 (Mamba-2 + cycled shared transformer blocks w/ LoRA adapters) vs
the HF oracle."""
import pytest
import torch

from aphrodite_tpu.sampling_params import SamplingParams


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from transformers import Zamba2Config, Zamba2ForCausalLM
    cfg = Zamba2Config(
        vocab_size=256, hidden_size=32, intermediate_size=64,
        num_hidden_layers=6, num_attention_heads=4, num_key_value_heads=4,
        attention_head_dim=16, mamba_expand=2, mamba_d_state=16,
        mamba_d_conv=4, mamba_ngroups=1, mamba_headdim=8, num_mem_blocks=2,
        use_shared_attention_adapter=True, adapter_rank=4,
        use_mem_rope=True, rope_theta=10000.0,
        layers_block_type=["mamba", "hybrid", "mamba", "hybrid", "mamba",
                           "hybrid"],
        max_position_embeddings=256, pad_token_id=0, bos_token_id=1,
        eos_token_id=2)
    torch.manual_seed(0)
    hf = Zamba2ForCausalLM(cfg).eval()
    d = tmp_path_factory.mktemp("tiny_zamba2")
    # shared blocks are tied tensors -> torch serialization
    hf.save_pretrained(d, safe_serialization=False)
    return d, hf


def _hf_greedy(hf, p, n_new=8):
    with torch.no_grad():
        return hf.generate(torch.tensor([p]), max_new_tokens=n_new,
                           do_sample=False,
                           eos_token_id=None)[0][len(p):].tolist()


def test_zamba2_matches_hf(ckpt):
    d, hf = ckpt
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(d), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=128, tokenizer="unused")
    prompts = [[1, 5, 9, 20, 3, 7, 11], [7, 8, 9, 10]]
    outs = llm.generate(prompts, SamplingParams(temperature=0.0,
                                                max_tokens=8,
                                                ignore_eos=True))
    for p, o in zip(prompts, outs):
        assert o.outputs[0].token_ids == _hf_greedy(hf, p)


def test_zamba2_chunked_prefill(ckpt):
    d, hf = ckpt
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(d), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=16, max_num_seqs=2,
              max_model_len=128, tokenizer="unused")
    p = [2] * 9 + [9, 4] * 11  # 31 tokens -> 2+ chunks
    outs = llm.generate([p], SamplingParams(temperature=0.0, max_tokens=6,
                                            ignore_eos=True))
    assert outs[0].outputs[0].token_ids == _hf_greedy(hf, p, 6)
