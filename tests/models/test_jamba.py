"""Jamba (hybrid attention + Mamba + MoE) vs HF oracle.

Covers the hybrid cache pytree (paged KV for attention layers, slot state
for mamba layers), the attn/mamba/moe/dense layer-run scheduling, Jamba's
learned dt/B/C norms, and un-renormalized top-k routing."""
import pytest
import torch

from aphrodite_tpu.sampling_params import SamplingParams


def tiny_jamba_cfg(**kw):
    from transformers import JambaConfig
    base = dict(vocab_size=256, hidden_size=64, num_hidden_layers=4,
                num_attention_heads=4, num_key_value_heads=2,
                intermediate_size=128, mamba_expand=2, mamba_d_state=8,
                mamba_d_conv=4, mamba_dt_rank=8,
                attn_layer_period=2, attn_layer_offset=1,
                expert_layer_period=2, expert_layer_offset=0,
                num_experts=4, num_experts_per_tok=2,
                max_position_embeddings=512, tie_word_embeddings=False,
                pad_token_id=0, bos_token_id=1, eos_token_id=2,
                use_mamba_kernels=False)
    base.update(kw)
    return JambaConfig(**base)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from transformers import JambaForCausalLM
    torch.manual_seed(0)
    d = tmp_path_factory.mktemp("tiny_jamba")
    hf = JambaForCausalLM(tiny_jamba_cfg()).eval()
    hf.save_pretrained(d, safe_serialization=True)
    return d, hf


def _generate(d, prompts, n_new=8, chunk=64):
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(d), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=chunk,
              max_num_seqs=4, max_model_len=256, tokenizer="unused")
    outs = llm.generate(prompts, SamplingParams(temperature=0.0,
                                                max_tokens=n_new,
                                                ignore_eos=True))
    return [o.outputs[0].token_ids for o in outs]


def _hf(hf, p, n_new=8):
    with torch.no_grad():
        return hf.generate(torch.tensor([p]), max_new_tokens=n_new,
                           do_sample=False,
                           eos_token_id=None)[0][len(p):].tolist()


def test_jamba_matches_hf(ckpt):
    d, hf = ckpt
    prompts = [[1, 5, 9, 20, 3], [7, 8, 9, 10, 11, 12], [100, 101]]
    outs = _generate(d, prompts)
    for p, out in zip(prompts, outs):
        assert out == _hf(hf, p), p


def test_jamba_chunked_prefill(ckpt):
    """Chunk seams exercise both cache kinds' resume paths at once."""
    d, hf = ckpt
    prompts = [list(range(30, 69)), list(range(100, 131))]
    outs = _generate(d, prompts, n_new=6, chunk=16)
    for p, out in zip(prompts, outs):
        assert out == _hf(hf, p, 6), len(p)
