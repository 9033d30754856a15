"""Pipeline-parallel correctness on the virtual 8-device CPU mesh: the
layer stack + KV cache sharded across pp stages (shard_map circular
pipeline, see LlamaForCausalLM._pipeline) must match single-device tokens.
Reference inventory row: _PP group, aphrodite/distributed/parallel_state.py:809."""
import pytest

from aphrodite_tpu.sampling_params import SamplingParams

from tests.utils import save_tiny_hf_checkpoint, tiny_llama_hf_config


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_pp")
    hf_config = tiny_llama_hf_config(hidden=64, heads=4, kv_heads=4,
                                     vocab_size=256, intermediate=128,
                                     layers=4)
    save_tiny_hf_checkpoint(d, hf_config)
    return d


def _generate(ckpt_dir, pp, tp=1):
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(ckpt_dir), dtype="float32", block_size=16,
              num_kv_blocks=128, max_num_batched_tokens=128, max_num_seqs=8,
              max_model_len=256, pipeline_parallel_size=pp,
              tensor_parallel_size=tp, tokenizer="unused")
    prompts = [[1, 5, 9, 20, 3], [7, 8, 9, 10, 11, 12, 13], [100, 101]]
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    outs = llm.generate(prompts, params)
    return [o.outputs[0].token_ids for o in outs]


def test_pp_matches_single_device(ckpt):
    single = _generate(ckpt, 1)
    pp2 = _generate(ckpt, 2)
    assert single == pp2


def test_pp_with_tp(ckpt):
    single = _generate(ckpt, 1)
    pp2tp2 = _generate(ckpt, 2, tp=2)
    assert single == pp2tp2


def test_pp_rejects_indivisible_layers(ckpt):
    with pytest.raises(ValueError, match="not divisible"):
        _generate(ckpt, 3)


def test_pp_divides_per_device_compute(ckpt):
    """The microbatched pipeline must run ~1/pp of the model per device
    (the round-1 circular pipeline recomputed every stage on every device:
    per-device FLOPs equaled the full model plus collectives)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from aphrodite_tpu.entrypoints.llm import LLM

    def step_flops(pp):
        llm = LLM(model=str(ckpt), dtype="float32", block_size=16,
                  num_kv_blocks=128, max_num_batched_tokens=128,
                  max_num_seqs=8, max_model_len=256,
                  pipeline_parallel_size=pp, tokenizer="unused")
        runner = llm.engine.core.worker.runner
        model, params = runner.model, runner.params
        T = 64
        from tests.utils import make_prefill_metadata
        md, ids, used = make_prefill_metadata(
            [[1] * 16] * 4, 16, 8, num_tokens_pad=T)
        kv = runner.kv_cache

        def fn(params, kv, ids, md):
            return model.apply(params, ids, kv, md)[0]

        c = jax.jit(fn).lower(params, kv, jnp.asarray(np.zeros(T, np.int32)),
                              md).compile().cost_analysis()
        return c.get("flops", 0.0)

    dense = step_flops(1)
    pp2 = step_flops(2)
    # theory at M=4, pp=2: (M+pp-1)/(M*pp) = 5/8 of the dense FLOPs
    assert pp2 < 0.85 * dense, (pp2, dense, pp2 / dense)


def test_pp_pallas_kernel_path(monkeypatch, tmp_path):
    """Attention inside the pipeline takes the Pallas kernel when the
    runner supplies per-microbatch work items (interpret mode on CPU):
    token-exact vs the XLA pipeline path and vs single-device."""
    import numpy as np
    from tests.utils import save_tiny_hf_checkpoint, tiny_llama_hf_config
    from aphrodite_tpu.sampling_params import SamplingParams
    from aphrodite_tpu.entrypoints.llm import LLM

    d = tmp_path / "ckpt"
    save_tiny_hf_checkpoint(d, tiny_llama_hf_config(max_pos=512))
    rng = np.random.RandomState(0)
    prompts = [rng.randint(10, 200, size=30 + 11 * i).tolist()
               for i in range(3)]
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)

    def gen(pp, pallas):
        if pallas:
            monkeypatch.setenv("APHRODITE_PALLAS_INTERPRET", "1")
        else:
            monkeypatch.delenv("APHRODITE_PALLAS_INTERPRET",
                               raising=False)
        llm = LLM(model=str(d), dtype="float32", block_size=16,
                  num_kv_blocks=128, max_num_batched_tokens=256,
                  max_num_seqs=4, max_model_len=256, tokenizer="unused",
                  device="cpu", pipeline_parallel_size=pp,
                  tpu_config={"use_pallas_attention": pallas})
        return [o.outputs[0].token_ids
                for o in llm.generate(prompts, params)]

    base = gen(1, False)
    assert gen(2, True) == base
