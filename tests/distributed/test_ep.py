"""Expert-parallel correctness on the virtual 8-device CPU mesh: experts
sharded across the tp axis (reference: fused_moe/layer.py:432 `use_ep`)
must produce the same tokens as the unsharded scan-over-experts path."""
import pytest

from aphrodite_tpu.sampling_params import SamplingParams


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    import torch
    from transformers import AutoModelForCausalLM, MixtralConfig
    d = tmp_path_factory.mktemp("tiny_mixtral_ep")
    cfg = MixtralConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        intermediate_size=96, num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=512, tie_word_embeddings=False)
    torch.manual_seed(0)
    model = AutoModelForCausalLM.from_config(cfg).eval()
    model.save_pretrained(d, safe_serialization=True)
    return d


def _generate(ckpt_dir, tp, ep):
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(ckpt_dir), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=256, tensor_parallel_size=tp,
              enable_expert_parallel=ep, tokenizer="unused")
    prompts = [[1, 5, 9, 20, 3], [7, 8, 9, 10]]
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    outs = llm.generate(prompts, params)
    return [o.outputs[0].token_ids for o in outs]


def test_ep_matches_unsharded(ckpt):
    base = _generate(ckpt, 1, False)
    ep2 = _generate(ckpt, 2, True)
    ep4 = _generate(ckpt, 4, True)
    assert base == ep2
    assert base == ep4
