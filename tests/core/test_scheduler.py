"""Device-free scheduler tests: chunked prefill, continuous batching,
prefix caching, preemption, stop conditions (SURVEY.md §4.6)."""
import pytest

from aphrodite_tpu.config import CacheConfig, SchedulerConfig
from aphrodite_tpu.core.request import Request, RequestStatus
from aphrodite_tpu.core.sched_output import ModelRunnerOutput
from aphrodite_tpu.core.scheduler import Scheduler
from aphrodite_tpu.sampling_params import SamplingParams


def make_scheduler(num_blocks=64, block_size=16, max_seqs=8,
                   max_tokens=64, max_model_len=512):
    cc = CacheConfig(block_size=block_size, num_blocks_override=num_blocks,
                     num_blocks=num_blocks)
    sc = SchedulerConfig(max_num_seqs=max_seqs,
                         max_num_batched_tokens=max_tokens,
                         max_model_len=max_model_len)
    return Scheduler(sc, cc)


def make_request(rid, prompt_len, max_tokens=16, prompt=None, **params):
    toks = prompt if prompt is not None else list(range(100, 100 + prompt_len))
    return Request(request_id=rid, prompt_token_ids=toks,
                   sampling_params=SamplingParams(max_tokens=max_tokens,
                                                  **params),
                   eos_token_id=2)


def step_tokens(sched, out, tok=500):
    """Simulate the runner: emit `tok` for every request that finished its
    prompt this step."""
    req_ids, sampled = [], []
    for rid, n in out.num_scheduled_tokens.items():
        req = sched.requests[rid]
        req_ids.append(rid)
        done = req.num_computed_tokens + n >= req.num_tokens
        sampled.append([tok] if done else [])
    return ModelRunnerOutput(req_ids=req_ids, sampled_token_ids=sampled)


def test_basic_prefill_then_decode():
    s = make_scheduler()
    s.add_request(make_request("a", 10, max_tokens=3))
    out = s.schedule()
    assert out.num_scheduled_tokens == {"a": 10}
    assert len(out.scheduled_new_reqs) == 1
    eco = s.update_from_output(out, step_tokens(s, out))
    assert eco[0].new_token_ids == [500]

    for _ in range(2):
        out = s.schedule()
        assert out.num_scheduled_tokens == {"a": 1}
        eco = s.update_from_output(out, step_tokens(s, out))
    assert eco[0].finished and eco[0].finish_reason == "length"
    assert not s.has_unfinished_requests()


def test_chunked_prefill():
    s = make_scheduler(max_tokens=32)
    s.add_request(make_request("a", 100))
    out = s.schedule()
    assert out.num_scheduled_tokens == {"a": 32}
    eco = s.update_from_output(out, step_tokens(s, out))
    assert eco == []  # no token emitted mid-prefill
    out = s.schedule()
    assert out.num_scheduled_tokens == {"a": 32}
    s.update_from_output(out, step_tokens(s, out))
    out = s.schedule()
    s.update_from_output(out, step_tokens(s, out))
    out = s.schedule()
    assert out.num_scheduled_tokens == {"a": 4}  # 100 = 32*3 + 4
    eco = s.update_from_output(out, step_tokens(s, out))
    assert eco[0].new_token_ids == [500]


def test_budget_shared_across_requests():
    s = make_scheduler(max_tokens=24)
    s.add_request(make_request("a", 16))
    s.add_request(make_request("b", 16))
    out = s.schedule()
    assert out.num_scheduled_tokens == {"a": 16, "b": 8}
    s.update_from_output(out, step_tokens(s, out))
    out = s.schedule()
    # a decodes 1, b finishes prefill (8 left).
    assert out.num_scheduled_tokens == {"a": 1, "b": 8}


def test_prefix_cache_hit():
    s = make_scheduler(block_size=16)
    common = list(range(200, 248))  # 3 full pages
    s.add_request(make_request("a", 0, prompt=common + [1, 2, 3]))
    out = s.schedule()
    s.update_from_output(out, step_tokens(s, out))
    # Second request shares the 48-token prefix.
    s.add_request(make_request("b", 0, prompt=common + [9, 9, 9]))
    out = s.schedule()
    assert out.num_scheduled_tokens["b"] == 3  # only the tail
    nr = [r for r in out.scheduled_new_reqs if r.req_id == "b"][0]
    assert nr.num_computed_tokens == 48
    # Shared pages are the same physical ids.
    a_blocks = s.kv.get_block_ids("a")[:3]
    b_blocks = s.kv.get_block_ids("b")[:3]
    assert a_blocks == b_blocks


def test_preemption_and_resume():
    # Pool with 9 usable pages, two requests needing 4 pages each + growth.
    s = make_scheduler(num_blocks=10, block_size=16, max_tokens=256,
                       max_model_len=256)
    # Each request grows to 104 tokens = 7 pages; 7+7 > 9 usable pages, but
    # either alone fits, so one gets preempted and later resumes.
    s.add_request(make_request("a", 64, max_tokens=40))
    s.add_request(make_request("b", 64, max_tokens=40))
    out = s.schedule()
    assert set(out.num_scheduled_tokens) == {"a", "b"}
    s.update_from_output(out, step_tokens(s, out))
    # Decode until the pool forces a preemption of b.
    preempted = False
    for _ in range(40):
        out = s.schedule()
        if "b" not in out.num_scheduled_tokens and \
                s.requests.get("b") is not None and \
                s.requests["b"].status == RequestStatus.PREEMPTED:
            preempted = True
            break
        s.update_from_output(out, step_tokens(s, out))
    assert preempted
    # a eventually finishes, then b resumes from recompute.
    for _ in range(300):
        out = s.schedule()
        if not s.has_unfinished_requests():
            break
        s.update_from_output(out, step_tokens(s, out))
    assert not s.has_unfinished_requests()


def test_stop_token_and_eos():
    s = make_scheduler()
    s.add_request(make_request("a", 4, max_tokens=50))
    out = s.schedule()
    ro = ModelRunnerOutput(req_ids=["a"], sampled_token_ids=[[2]])  # EOS
    eco = s.update_from_output(out, ro)
    assert eco[0].finished and eco[0].finish_reason == "stop"
    assert eco[0].new_token_ids == [2]  # EOS stays in ids

    s.add_request(make_request("b", 4, max_tokens=50, stop_token_ids=[7]))
    out = s.schedule()
    ro = ModelRunnerOutput(req_ids=["b"], sampled_token_ids=[[7]])
    eco = s.update_from_output(out, ro)
    assert eco[0].finished and eco[0].stop_reason == 7
    assert eco[0].new_token_ids == []  # stop token stripped


def test_ignore_eos_and_min_tokens():
    s = make_scheduler()
    s.add_request(make_request("a", 4, max_tokens=3, ignore_eos=True))
    out = s.schedule()
    eco = s.update_from_output(
        out, ModelRunnerOutput(req_ids=["a"], sampled_token_ids=[[2]]))
    assert not eco[0].finished

    s.add_request(make_request("b", 4, max_tokens=10, min_tokens=2))
    out = s.schedule()
    eco = s.update_from_output(
        out, ModelRunnerOutput(req_ids=["b"], sampled_token_ids=[[2]]))
    assert not eco[0].finished  # eos ignored before min_tokens


def test_abort():
    s = make_scheduler()
    s.add_request(make_request("a", 4))
    out = s.schedule()
    s.finish_requests(["a"])
    assert not s.has_unfinished_requests()
    out2 = s.schedule()
    assert "a" in out2.finished_req_ids


def test_max_num_seqs_cap():
    s = make_scheduler(max_seqs=2, max_tokens=1024)
    for i in range(4):
        s.add_request(make_request(f"r{i}", 8))
    out = s.schedule()
    assert len(out.num_scheduled_tokens) == 2
