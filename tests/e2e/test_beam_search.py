"""Beam search vs an exact breadth-first torch oracle."""
import numpy as np
import pytest
import torch

from tests.utils import save_tiny_hf_checkpoint, tiny_llama_hf_config


def torch_beam(hf, base, width, steps):
    beams = [(list(base), 0.0)]
    for _ in range(steps):
        cand = []
        for toks, score in beams:
            with torch.no_grad():
                logits = hf(torch.tensor([toks])).logits[0, -1]
                lsm = torch.log_softmax(logits.float(), -1).numpy()
            top = np.argsort(-lsm)[:2 * width]
            for t in top:
                cand.append((toks + [int(t)], score + float(lsm[t])))
        cand.sort(key=lambda c: -c[1])
        beams = cand[:width]
    return [(t[len(base):], s) for t, s in beams]


def test_beam_search_matches_oracle(tmp_path):
    hf = save_tiny_hf_checkpoint(tmp_path, tiny_llama_hf_config())
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(tmp_path), dtype="float32", block_size=16,
              num_kv_blocks=256, max_num_batched_tokens=128, max_num_seqs=8,
              max_model_len=128, tokenizer="unused")
    base = [3, 17, 42, 7]
    got = llm.beam_search([base], beam_width=3, max_tokens=5,
                          ignore_eos=True)[0]
    exp = torch_beam(hf, base, 3, 5)
    assert got["sequences"][0] == exp[0][0]
    np.testing.assert_allclose(got["scores"][0], exp[0][1], rtol=1e-3,
                               atol=1e-3)
    # Full beam set matches (order-insensitive on ties).
    assert {tuple(s) for s in got["sequences"]} == \
        {tuple(t) for t, _ in exp}


def test_beam_fork_machinery_engaged(tmp_path):
    """The native fork path: one admission per prompt (no per-round
    re-generate), children share the parent's full KV blocks by refcount,
    and a mid-block tail fork clones the tail page."""
    save_tiny_hf_checkpoint(tmp_path, tiny_llama_hf_config())
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(tmp_path), dtype="float32", block_size=16,
              num_kv_blocks=256, max_num_batched_tokens=128, max_num_seqs=8,
              max_model_len=128, tokenizer="unused")
    core = llm.engine.core

    admissions = {"n": 0}
    real_process = llm.engine.processor.process

    def spy_process(*a, **kw):
        admissions["n"] += 1
        return real_process(*a, **kw)

    llm.engine.processor.process = spy_process
    forks = {"n": 0}
    real_fork = core.fork_request

    def spy_fork(*a, **kw):
        forks["n"] += 1
        return real_fork(*a, **kw)

    core.fork_request = spy_fork
    got = llm.beam_search([[3, 17, 42, 7]], beam_width=3, max_tokens=5,
                          ignore_eos=True)[0]
    assert admissions["n"] == 1          # ONE admission, not one per round
    assert forks["n"] >= 1               # forks actually happened
    assert len(got["sequences"]) == 3
    # engine fully drained afterwards
    assert not core.scheduler.running and not core.scheduler.waiting
    # all pages returned (fork refcounts unwound)
    pool = core.scheduler.kv.pool
    assert pool.get_num_free_blocks() == pool.num_blocks - 1


def test_kv_fork_shares_and_clones(tmp_path):
    """Device-free: KVCacheManager.fork refcounts full blocks and clones
    only a partial tail."""
    from aphrodite_tpu.core.kv_cache_manager import KVCacheManager
    from aphrodite_tpu.core.request import Request
    from aphrodite_tpu.sampling_params import SamplingParams

    kv = KVCacheManager(num_blocks=16, block_size=4,
                        enable_caching=True)
    req = Request(request_id="p", prompt_token_ids=list(range(100, 110)),
                  sampling_params=SamplingParams(max_tokens=4))
    kv.allocate_slots(req, 10)           # 10 tokens -> 3 blocks (4,4,2)
    req.num_computed_tokens = 10
    pblocks = kv.req_to_blocks["p"]

    block_ids, tail_copy = kv.fork("p", "c", num_computed=10)
    # two full blocks shared, refcount bumped
    assert block_ids[:2] == [b.block_id for b in pblocks[:2]]
    assert all(b.ref_cnt == 2 for b in pblocks[:2])
    # partial tail cloned to a fresh page
    assert tail_copy == (pblocks[2].block_id, block_ids[2])
    assert block_ids[2] != pblocks[2].block_id
    assert pblocks[2].ref_cnt == 1

    # freeing the parent releases only its references
    kv.free(req)
    assert all(b.ref_cnt == 1 for b in pblocks[:2])

    # block-aligned fork: no tail copy at all
    req2 = Request(request_id="q", prompt_token_ids=list(range(200, 208)),
                   sampling_params=SamplingParams(max_tokens=4))
    kv.allocate_slots(req2, 8)
    req2.num_computed_tokens = 8
    ids2, tc2 = kv.fork("q", "q2", num_computed=8)
    assert tc2 is None and len(ids2) == 2
