"""Fused-window + async scheduling under awkward combinations:
preemption pressure, n>1 fanout, EOS-stop mid-window, seeded sampling."""
import numpy as np
import pytest

from aphrodite_tpu.sampling_params import SamplingParams

from tests.utils import save_tiny_hf_checkpoint, tiny_llama_hf_config


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_combo")
    save_tiny_hf_checkpoint(d, tiny_llama_hf_config(max_pos=512))
    return d


def _llm(ckpt, blocks=64, **kw):
    from aphrodite_tpu.entrypoints.llm import LLM
    return LLM(model=str(ckpt), dtype="float32", block_size=16,
               num_kv_blocks=blocks, max_num_batched_tokens=128,
               max_num_seqs=4, max_model_len=200, tokenizer="unused",
               device="cpu", **kw)


def test_preemption_pressure_token_exact(ckpt):
    """A pool too small for the full batch forces preemption/recompute;
    outputs must still match a roomy pool exactly."""
    rng = np.random.RandomState(0)
    prompts = [rng.randint(10, 200, size=40 + 9 * i).tolist()
               for i in range(6)]
    params = SamplingParams(temperature=0.0, max_tokens=20, ignore_eos=True)
    tight = _llm(ckpt, blocks=40)
    roomy = _llm(ckpt, blocks=256)
    a = [o.outputs[0].token_ids for o in tight.generate(prompts, params)]
    b = [o.outputs[0].token_ids for o in roomy.generate(prompts, params)]
    assert a == b


def test_eos_stop_mid_window(ckpt):
    """stop_token_ids hit inside an in-graph window must truncate the
    emitted tokens at the stop (core-side _append_and_check_stop)."""
    llm = _llm(ckpt)
    base = llm.generate([[3, 5, 7]], SamplingParams(
        temperature=0.0, max_tokens=30, ignore_eos=True))[0]
    toks = base.outputs[0].token_ids
    stop_tok = toks[4]
    out = llm.generate([[3, 5, 7]], SamplingParams(
        temperature=0.0, max_tokens=30, stop_token_ids=[stop_tok]))[0]
    got = out.outputs[0].token_ids
    # engine convention: the stop token truncates and is excluded
    assert got == toks[:4]
    assert out.outputs[0].finish_reason == "stop"


def test_n_greater_one_with_seeds(ckpt):
    """n=4 sampled fanout through fused windows: children differ and are
    reproducible for the same seed."""
    llm = _llm(ckpt)
    params = SamplingParams(temperature=1.0, max_tokens=10, n=4, seed=123,
                            ignore_eos=True)
    out1 = llm.generate([[2, 4, 6, 8]], params)[0]
    out2 = llm.generate([[2, 4, 6, 8]], params)[0]
    seqs1 = sorted(tuple(c.token_ids) for c in out1.outputs)
    seqs2 = sorted(tuple(c.token_ids) for c in out2.outputs)
    assert len(seqs1) == 4
    assert seqs1 == seqs2          # seeded reproducibility
    assert len(set(seqs1)) >= 2    # children actually diverge
