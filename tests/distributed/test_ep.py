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


def _generate_q(ckpt_dir, tp, ep):
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(ckpt_dir), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=64, max_num_seqs=4,
              max_model_len=256, tensor_parallel_size=tp,
              enable_expert_parallel=ep, tokenizer="unused",
              quantization="w8a16")
    prompts = [[1, 5, 9, 20, 3], [7, 8, 9, 10]]
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    outs = llm.generate(prompts, params)
    return [o.outputs[0].token_ids for o in outs]


def test_ep_quantized_matches_unsharded(ckpt):
    """Quantized experts under EP (previously NotImplementedError):
    the local expert scan with sharded quantized leaves must be
    token-exact vs the single-device quantized path."""
    base = _generate_q(ckpt, 1, False)
    ep2 = _generate_q(ckpt, 2, True)
    assert base == ep2


def test_ep_grouped_work_scales_with_topk_not_E(monkeypatch):
    """Per-device MoE work under EP must follow T*top_k rows through the
    grouped GEMM (which tiles strictly by group sizes), with E/tp local
    experts as the group set — NOT an all-experts dense einsum. Verified
    by spying the megablox gmm calls the EP path issues (the old EP path
    issued [E, T, I]-shaped einsums, work ∝ E). Numerics are checked
    against the scan oracle through the interpret-mode kernel."""
    import os
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh
    from aphrodite_tpu.models import moe_common
    from aphrodite_tpu.models.moe_common import moe_combine
    from aphrodite_tpu.layers.common import silu_and_mul

    monkeypatch.setenv("APHRODITE_PALLAS_INTERPRET", "1")
    from jax.experimental.pallas.ops.tpu.megablox import gmm as real_gmm
    calls = []

    def spy_gmm(lhs, rhs, group_sizes, **kw):
        calls.append((lhs.shape, rhs.shape))
        return real_gmm(lhs, rhs, group_sizes, **kw)

    import jax.experimental.pallas.ops.tpu.megablox as mb
    monkeypatch.setattr(mb, "gmm", spy_gmm)

    devs = np.array(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devs, ("tp",))
    T, H, I, k = 64, 64, 96, 2
    rng = np.random.RandomState(0)

    for E in (8, 32):
        calls.clear()
        lp = {
            "we_gate": jnp.asarray(rng.randn(E, H, I), jnp.float32) * 0.1,
            "we_up": jnp.asarray(rng.randn(E, H, I), jnp.float32) * 0.1,
            "we_down": jnp.asarray(rng.randn(E, I, H), jnp.float32) * 0.1,
        }
        h = jnp.asarray(rng.randn(T, H), jnp.float32)
        topi = jnp.asarray(rng.randint(0, E, (T, k)), jnp.int32)
        topw = jnp.asarray(rng.rand(T, k), jnp.float32)
        out = moe_combine(h, lp, silu_and_mul, topi, topw,
                          expert_parallel=True, num_experts=E, mesh=mesh)
        # the grouped-GEMM work list: M = T*k rows, E/tp local experts
        assert calls, "EP did not take the grouped path"
        for lhs_shape, rhs_shape in calls:
            assert lhs_shape[0] == T * k, (E, lhs_shape)
            assert rhs_shape[0] == E // 4, (E, rhs_shape)
        # numerics: match the unsharded scan oracle
        ref = moe_combine(h, lp, silu_and_mul, topi, topw,
                          expert_parallel=False, num_experts=E)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
