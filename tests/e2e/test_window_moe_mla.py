"""Window (frozen-cache) multi-step decode for MoE and MLA models:
the runner must actually take the window path and be token-exact vs the
v1 per-step path (VERDICT r2 #6)."""
import numpy as np
import pytest

from aphrodite_tpu.sampling_params import SamplingParams


def _mixtral_cfg():
    from transformers import MixtralConfig
    return MixtralConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=96, num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=512, architectures=["MixtralForCausalLM"])


def _dsv2_cfg():
    cfg = dict(
        vocab_size=256, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        intermediate_size=96, moe_intermediate_size=48,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense_replace=1, moe_layer_freq=1,
        kv_lora_rank=32, q_lora_rank=None, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16, max_position_embeddings=512,
        norm_topk_prob=False, topk_method="greedy", n_group=1, topk_group=1,
        routed_scaling_factor=1.0, scoring_func="softmax",
        architectures=["DeepseekV2ForCausalLM"], model_type="deepseek_v2")
    from transformers import PretrainedConfig
    return PretrainedConfig(**cfg)


def _run(hf_config, force_v1: bool):
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model="dummy", hf_config=hf_config, tokenizer="unused",
              dtype="float32", load_format="dummy", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=256,
              max_num_seqs=4, max_model_len=256, device="cpu", seed=0)
    runner = llm.engine.core.worker.runner
    window_calls = []
    if force_v1:
        runner.use_window_decode = False
    else:
        assert runner.use_window_decode, \
            f"{type(runner.model).__name__} must support window decode"
        real = runner._multi_step_window_fn

        def spy(*a, **k):
            window_calls.append(1)
            return real(*a, **k)
        runner._multi_step_window_fn = spy
    rng = np.random.RandomState(0)
    prompts = [rng.randint(10, 200, size=12 + 5 * i).tolist()
               for i in range(3)]
    outs = llm.generate(prompts, SamplingParams(
        temperature=0.0, max_tokens=10, ignore_eos=True))
    toks = [o.outputs[0].token_ids for o in outs]
    if not force_v1:
        assert window_calls, "window path never taken"
    return toks


@pytest.mark.parametrize("cfg_fn", [_mixtral_cfg, _dsv2_cfg],
                         ids=["mixtral", "deepseek_v2_mla"])
def test_window_token_exact(cfg_fn):
    cfg = cfg_fn()
    assert _run(cfg, force_v1=False) == _run(cfg, force_v1=True)
