"""MoE breadth vs HF oracles: Qwen2-MoE shared expert, Qwen3-MoE, OLMoE,
GraniteMoE(+Shared), PhiMoE (sparsemixer), DBRX."""
from tests.models.test_llama_variants import _check


def test_qwen2_moe_shared_expert(tmp_path):
    from transformers import Qwen2MoeConfig
    _check(tmp_path, Qwen2MoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=48, shared_expert_intermediate_size=80,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        decoder_sparse_step=1, mlp_only_layers=[],
        max_position_embeddings=512, bos_token_id=1, eos_token_id=2))


def test_qwen3_moe(tmp_path):
    from transformers import Qwen3MoeConfig
    _check(tmp_path, Qwen3MoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        moe_intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=True,
        decoder_sparse_step=1, mlp_only_layers=[],
        max_position_embeddings=512, bos_token_id=1, eos_token_id=2))


def test_olmoe(tmp_path):
    from transformers import OlmoeConfig
    _check(tmp_path, OlmoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=8, num_experts_per_tok=4, norm_topk_prob=False,
        max_position_embeddings=512, pad_token_id=0, bos_token_id=1,
        eos_token_id=2))


def test_granitemoe(tmp_path):
    from transformers import GraniteMoeConfig
    _check(tmp_path, GraniteMoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        embedding_multiplier=6.0, residual_multiplier=0.5,
        attention_multiplier=0.1, logits_scaling=4.0,
        max_position_embeddings=512, bos_token_id=1, eos_token_id=2))


def test_granitemoe_shared(tmp_path):
    from transformers import GraniteMoeSharedConfig
    _check(tmp_path, GraniteMoeSharedConfig(
        vocab_size=256, hidden_size=64, intermediate_size=48,
        shared_intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=512, bos_token_id=1, eos_token_id=2))


def test_phimoe(tmp_path):
    from transformers import PhimoeConfig
    _check(tmp_path, PhimoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=8, num_experts_per_tok=2,
        attention_bias=True, lm_head_bias=True,
        max_position_embeddings=512, bos_token_id=1, eos_token_id=2))


def test_dbrx(tmp_path):
    from transformers import DbrxConfig
    from transformers.models.dbrx.configuration_dbrx import (DbrxAttentionConfig,
                                                             DbrxFFNConfig)
    _check(tmp_path, DbrxConfig(
        vocab_size=256, d_model=64, n_heads=4, n_layers=2, max_seq_len=512,
        attn_config=DbrxAttentionConfig(kv_n_heads=2, clip_qkv=8.0,
                                        rope_theta=10000.0),
        ffn_config=DbrxFFNConfig(ffn_hidden_size=48, moe_num_experts=4,
                                 moe_top_k=2,
                                 moe_normalize_expert_weights=1.0),
        bos_token_id=1, eos_token_id=2))
