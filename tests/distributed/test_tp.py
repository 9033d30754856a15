"""Tensor-parallel correctness on the virtual 8-device CPU mesh:
TP-sharded execution must match single-device logits/tokens
(SURVEY.md §4: mesh simulation replaces the reference's multi-GPU tests)."""
import numpy as np
import pytest

from aphrodite_tpu.sampling_params import SamplingParams

from tests.utils import save_tiny_hf_checkpoint, tiny_llama_hf_config


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_tp")
    hf_config = tiny_llama_hf_config(hidden=64, heads=4, kv_heads=4,
                                     vocab_size=256, intermediate=128)
    save_tiny_hf_checkpoint(d, hf_config)
    return d


def _generate(ckpt_dir, tp, sp=False):
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(ckpt_dir), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=128, max_num_seqs=8,
              max_model_len=256, tensor_parallel_size=tp,
              sequence_parallel=sp, tokenizer="unused")
    prompts = [[1, 5, 9, 20, 3], [7, 8, 9, 10, 11, 12, 13], [100, 101]]
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    outs = llm.generate(prompts, params)
    return [o.outputs[0].token_ids for o in outs]


def test_tp_matches_single_device(ckpt):
    single = _generate(ckpt, 1)
    tp2 = _generate(ckpt, 2)
    tp4 = _generate(ckpt, 4)
    assert single == tp2
    assert single == tp4


def test_sequence_parallel_matches(ckpt):
    """SP is a sharding-annotation choice: numerics must be unchanged."""
    assert _generate(ckpt, 4) == _generate(ckpt, 4, sp=True)


def test_mesh_build():
    import jax
    from aphrodite_tpu.config import ParallelConfig
    from aphrodite_tpu.parallel.mesh import build_mesh
    mesh = build_mesh(ParallelConfig(tensor_parallel_size=4,
                                     data_parallel_size=2))
    assert mesh.shape == {"dp": 2, "pp": 1, "tp": 4}
    with pytest.raises(ValueError):
        build_mesh(ParallelConfig(tensor_parallel_size=16))


def test_tp_deepseek_mla(tmp_path):
    """MLA models: q heads shard across tp, the single latent KV head is
    replicated (kv_cache_pspec shard_kv=False path)."""
    import torch
    from transformers import AutoModelForCausalLM, DeepseekV2Config
    torch.manual_seed(0)
    cfg = DeepseekV2Config(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4, intermediate_size=128,
        kv_lora_rank=32, q_lora_rank=None, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, head_dim=8,
        max_position_embeddings=512, tie_word_embeddings=False,
        n_routed_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
        n_shared_experts=1, first_k_dense_replace=1)
    AutoModelForCausalLM.from_config(cfg).save_pretrained(
        tmp_path, safe_serialization=True)
    assert _generate(tmp_path, 1) == _generate(tmp_path, 2)
