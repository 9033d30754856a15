"""Async scheduling (PendingStep) robustness: aborts and stop conditions
racing an in-flight window, page-pressure realize, and equivalence with
synchronous scheduling."""
import numpy as np
import pytest

from aphrodite_tpu.sampling_params import SamplingParams

from tests.utils import save_tiny_hf_checkpoint, tiny_llama_hf_config


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_async")
    save_tiny_hf_checkpoint(d, tiny_llama_hf_config(max_pos=512))
    return d


def _llm(ckpt, async_on=True, blocks=256):
    from aphrodite_tpu.entrypoints.llm import LLM
    return LLM(model=str(ckpt), dtype="float32", block_size=16,
               num_kv_blocks=blocks, max_num_batched_tokens=256,
               max_num_seqs=4, max_model_len=256, tokenizer="unused",
               device="cpu", async_scheduling=async_on)


def test_async_equals_sync(ckpt):
    rng = np.random.RandomState(0)
    prompts = [rng.randint(10, 200, size=20 + 7 * i).tolist()
               for i in range(6)]
    params = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    a = [o.outputs[0].token_ids
         for o in _llm(ckpt, True).generate(prompts, params)]
    b = [o.outputs[0].token_ids
         for o in _llm(ckpt, False).generate(prompts, params)]
    assert a == b


def test_abort_while_pending(ckpt):
    """Aborting a request whose window is in flight must not corrupt the
    engine or other requests."""
    llm = _llm(ckpt)
    eng = llm.engine
    core = eng.core
    params = SamplingParams(temperature=0.0, max_tokens=40, ignore_eos=True)
    eng.add_request("keep", [3, 5, 7, 9], params)
    eng.add_request("kill", [4, 6, 8, 10], params)
    eng.step()  # dispatches the fused window -> pending
    assert core._pending, "expected an in-flight async step"
    eng.abort_request("kill")
    results = {}
    for _ in range(200):
        for out in eng.step():
            results.setdefault(out.request_id, []).extend(
                out.outputs[0].token_ids)
        if not eng.has_unfinished_requests():
            break
    assert len(results.get("keep", [])) == 40
    # engine remains usable
    out = llm.generate([[1, 2, 3]], SamplingParams(
        temperature=0.0, max_tokens=4, ignore_eos=True))
    assert len(out[0].outputs[0].token_ids) == 4


def test_page_pressure_realizes_before_preempt(ckpt):
    """When the pool can't fit the next wave, the scheduler must realize
    the in-flight step (freeing finished requests' pages) instead of
    preempting it."""
    # tight pool: ~enough for one wave only
    llm = _llm(ckpt, blocks=40)
    eng = llm.engine
    rng = np.random.RandomState(1)
    prompts = [rng.randint(10, 200, size=60).tolist() for _ in range(6)]
    params = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)
    outs = llm.generate(prompts, params)
    assert all(len(o.outputs[0].token_ids) == 16 for o in outs)
    assert eng.core.scheduler.num_preemptions == 0, \
        "realize hook should satisfy page pressure without preemption"
