"""DeepSeek-MTP speculative decoding: greedy output must be identical with
the MTP head on vs off (unbiased sample-and-match verification)."""
import pytest
import torch

from aphrodite_tpu.config import SpeculativeConfig
from aphrodite_tpu.sampling_params import SamplingParams


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from transformers import AutoModelForCausalLM, DeepseekV2Config
    cfg = DeepseekV2Config(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        intermediate_size=128, moe_intermediate_size=32,
        kv_lora_rank=32, q_lora_rank=None, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, head_dim=8,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense_replace=1, topk_method="greedy", n_group=None,
        topk_group=None, max_position_embeddings=512,
        tie_word_embeddings=False, pad_token_id=0)
    torch.manual_seed(0)
    hf = AutoModelForCausalLM.from_config(cfg).eval()
    d = tmp_path_factory.mktemp("mtp_target")
    hf.save_pretrained(d, safe_serialization=True)
    return d


def _generate(target, mtp, prompts, params):
    from aphrodite_tpu.entrypoints.llm import LLM
    sc = (SpeculativeConfig(method="deepseek_mtp",
                            num_speculative_tokens=2) if mtp else None)
    llm = LLM(model=str(target), dtype="float32", block_size=16,
              num_kv_blocks=256, max_num_batched_tokens=128,
              max_num_seqs=8, max_model_len=256, tokenizer="unused",
              speculative_config=sc)
    outs = llm.generate(prompts, params)
    return [o.outputs[0].token_ids for o in outs]


def test_mtp_greedy_equality(ckpt):
    prompts = [[5, 6, 7, 5, 6, 7, 5, 6], list(range(30, 60)), [9, 9, 9]]
    params = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    base = _generate(ckpt, False, prompts, params)
    spec = _generate(ckpt, True, prompts, params)
    assert spec == base
