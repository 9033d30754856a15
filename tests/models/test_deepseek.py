"""DeepSeek V2/V3 (MLA + DeepSeek-MoE) vs HF oracles.

Covers: MLA with and without q_lora_rank, dense-prefix + MoE layer mix,
greedy and group-limited-greedy routing (V2), sigmoid noaux_tc routing with
shared experts (V3)."""
import pytest
import torch

from aphrodite_tpu.sampling_params import SamplingParams


def _check(tmp_path, cfg, n_new=8):
    from transformers import AutoModelForCausalLM
    torch.manual_seed(0)
    hf = AutoModelForCausalLM.from_config(cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(tmp_path), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=256, tokenizer="unused")
    prompts = [[1, 5, 9, 20, 3], [7, 8, 9, 10, 11, 12]]
    outs = llm.generate(prompts, SamplingParams(temperature=0.0,
                                                max_tokens=n_new,
                                                ignore_eos=True))
    for p, out in zip(prompts, outs):
        with torch.no_grad():
            exp = hf.generate(torch.tensor([p]), max_new_tokens=n_new,
                              do_sample=False,
                              eos_token_id=None)[0][len(p):].tolist()
        assert out.outputs[0].token_ids == exp, p


def _v2_cfg(**kw):
    from transformers import DeepseekV2Config
    base = dict(vocab_size=256, hidden_size=64, num_hidden_layers=3,
                num_attention_heads=4, num_key_value_heads=4,
                intermediate_size=128, kv_lora_rank=32, q_lora_rank=None,
                qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
                head_dim=8, max_position_embeddings=512,
                tie_word_embeddings=False, pad_token_id=0,
                n_routed_experts=None, first_k_dense_replace=3)
    base.update(kw)
    return DeepseekV2Config(**base)


def test_deepseek_v2_lite_dense(tmp_path):
    """MLA without q_lora_rank, all-dense layers."""
    _check(tmp_path, _v2_cfg())


def test_deepseek_v2_qlora_moe(tmp_path):
    """q_a/q_b low-rank queries + greedy-routed MoE with a shared expert."""
    cfg = _v2_cfg(q_lora_rank=24, n_routed_experts=8, num_experts_per_tok=2,
                  moe_intermediate_size=32, n_shared_experts=1,
                  first_k_dense_replace=1, topk_method="greedy",
                  routed_scaling_factor=1.0)
    _check(tmp_path, cfg)


def test_deepseek_v2_group_limited(tmp_path):
    """group_limited_greedy routing (n_group/topk_group)."""
    cfg = _v2_cfg(n_routed_experts=8, num_experts_per_tok=2,
                  moe_intermediate_size=32, n_shared_experts=2,
                  first_k_dense_replace=1,
                  topk_method="group_limited_greedy", n_group=4,
                  topk_group=2, routed_scaling_factor=2.0)
    _check(tmp_path, cfg)


def test_deepseek_v3(tmp_path):
    """Sigmoid router + e_score_correction_bias + norm_topk_prob."""
    from transformers import DeepseekV3Config
    cfg = DeepseekV3Config(
        vocab_size=256, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        intermediate_size=128, kv_lora_rank=32, q_lora_rank=24,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        head_dim=8, max_position_embeddings=512, tie_word_embeddings=False,
        n_routed_experts=8, num_experts_per_tok=2, moe_intermediate_size=32,
        n_shared_experts=1, first_k_dense_replace=1, n_group=4,
        topk_group=2, norm_topk_prob=True, routed_scaling_factor=2.5)
    # HF initializes the correction bias to zeros; perturb it so the test
    # actually exercises the bias-vs-weight split in the router.
    import transformers
    torch.manual_seed(0)
    hf = transformers.AutoModelForCausalLM.from_config(cfg)
    for n, b in hf.named_buffers():
        if "e_score_correction_bias" in n:
            b.normal_(0, 0.5)
    hf.save_pretrained(tmp_path, safe_serialization=True)
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(tmp_path), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=256, tokenizer="unused")
    prompts = [[1, 5, 9, 20, 3], [7, 8, 9, 10, 11, 12]]
    outs = llm.generate(prompts, SamplingParams(temperature=0.0,
                                                max_tokens=8,
                                                ignore_eos=True))
    hf = hf.eval()
    for p, out in zip(prompts, outs):
        with torch.no_grad():
            exp = hf.generate(torch.tensor([p]), max_new_tokens=8,
                              do_sample=False,
                              eos_token_id=None)[0][len(p):].tolist()
        assert out.outputs[0].token_ids == exp, p
