"""Shared encoder cache: the same image across requests encodes once, and
a preempted request does not re-encode (reference
aphrodite/v1/core/encoder_cache_manager.py)."""
import numpy as np
import pytest
import torch

from aphrodite_tpu.sampling_params import SamplingParams
from aphrodite_tpu.worker.encoder_cache import EncoderCache

from tests.models.test_llava import IMG, tiny_llava_cfg


# --------------------------------------------------------------- unit level
def test_lru_budget_and_eviction():
    class A:
        def __init__(self, n):
            self.nbytes = n
    c = EncoderCache(budget_bytes=100)
    c.put("a", A(40))
    c.put("b", A(40))
    assert c.get("a") is not None           # touches a: b becomes LRU
    c.put("c", A(40))                       # evicts b
    assert c.get("b") is None
    assert c.get("a") is not None and c.get("c") is not None
    assert c.evictions == 1 and c.used_bytes == 80
    c.put("huge", A(1000))                  # over budget: not cached
    assert c.get("huge") is None
    # replacing a key does not double-count bytes
    c.put("a", A(10))
    assert c.used_bytes == 50


# ---------------------------------------------------------------- e2e level
@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from transformers import LlavaForConditionalGeneration
    torch.manual_seed(0)
    d = tmp_path_factory.mktemp("tiny_llava_ec")
    hf = LlavaForConditionalGeneration(tiny_llava_cfg()).eval()
    hf.save_pretrained(d, safe_serialization=True)
    return d


def _llm(d, **kw):
    from aphrodite_tpu.entrypoints.llm import LLM
    args = dict(model=str(d), dtype="float32", block_size=16,
                num_kv_blocks=128, max_num_batched_tokens=64,
                max_num_seqs=4, max_model_len=256, tokenizer="unused")
    args.update(kw)
    return LLM(**args)


def test_same_image_encodes_once_across_requests(ckpt):
    """Cache misses == encoder computations (a jit-call spy would only
    count traces): same image -> 1 miss then hits; new image -> new miss."""
    llm = _llm(ckpt)
    ec = llm.engine.core.worker.runner.encoder_cache
    rng = np.random.RandomState(0)
    img = rng.randn(1, 3, 16, 16).astype(np.float32)
    base = [1, 7, IMG, 9, 20, 3]
    prompts = [
        {"prompt_token_ids": base, "multi_modal_data": {"image": img}},
        {"prompt_token_ids": base + [5],
         "multi_modal_data": {"image": img}},   # same image, new request
    ]
    outs = llm.generate(prompts, SamplingParams(temperature=0.0,
                                                max_tokens=4,
                                                ignore_eos=True))
    assert all(len(o.outputs[0].token_ids) == 4 for o in outs)
    assert ec.misses == 1 and ec.hits >= 1 and ec.num_entries == 1
    # different image => a fresh miss + encode
    img2 = rng.randn(1, 3, 16, 16).astype(np.float32)
    llm.generate(
        [{"prompt_token_ids": base, "multi_modal_data": {"image": img2}}],
        SamplingParams(temperature=0.0, max_tokens=2, ignore_eos=True))
    assert ec.misses == 2 and ec.num_entries == 2


def test_preempted_request_does_not_reencode(ckpt):
    """Preemption discards RequestState (and its mm_embeds); on resume the
    shared cache supplies the embeddings without another encoder pass."""
    llm = _llm(ckpt)
    ec = llm.engine.core.worker.runner.encoder_cache
    rng = np.random.RandomState(2)
    img = rng.randn(1, 3, 16, 16).astype(np.float32)
    base = [1, 7, IMG, 9, 20, 3]
    req = {"prompt_token_ids": base, "multi_modal_data": {"image": img}}
    llm.generate([req], SamplingParams(temperature=0.0, max_tokens=2,
                                       ignore_eos=True))
    assert ec.misses == 1

    # simulate preemption-and-resume: new request with the same image after
    # the original state is gone
    sched = llm.engine.core.scheduler
    assert not sched.running and not sched.waiting
    llm.generate([req], SamplingParams(temperature=0.0, max_tokens=2,
                                       ignore_eos=True))
    assert ec.misses == 1 and ec.hits >= 1  # served from the shared cache


def test_mid_batch_input_error_aborts_one_request(ckpt):
    """A payload that passes admission but fails in the encoder aborts
    only that request; the rest of the batch keeps serving (reference
    aphrodite_engine.py:1430 per-request input-error isolation)."""
    llm = _llm(ckpt)
    runner = llm.engine.core.worker.runner
    rng = np.random.RandomState(5)
    img = rng.randn(1, 3, 16, 16).astype(np.float32)
    base = [1, 7, IMG, 9, 20, 3]
    prompts = [
        {"prompt_token_ids": base, "multi_modal_data": {"image": img}},
        [5, 6, 7, 8],                                     # healthy text
    ]
    # Admission validation already rejects malformed shapes (multimodal.py
    # _to_pixels); inject an encoder failure that only manifests inside
    # the engine step — the class of error the isolation must contain.
    real = runner._mm_embeds_compute

    def boom(st, key):
        if st.mm is not None:
            raise RuntimeError("encoder OOM (injected)")
        return real(st, key)

    runner._mm_embeds_compute = boom
    outs = llm.generate(prompts, SamplingParams(temperature=0.0,
                                                max_tokens=4,
                                                ignore_eos=True))
    by_finish = {o.outputs[0].finish_reason: o for o in outs}
    assert "error" in by_finish, [o.outputs[0].finish_reason for o in outs]
    assert by_finish["error"].outputs[0].token_ids == []
    ok = by_finish.get("length")
    assert ok is not None and len(ok.outputs[0].token_ids) == 4
    # engine survives: a follow-up request works
    out2 = llm.generate([[9, 8, 7]], SamplingParams(temperature=0.0,
                                                    max_tokens=2,
                                                    ignore_eos=True))[0]
    assert len(out2.outputs[0].token_ids) == 2
