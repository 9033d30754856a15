"""Device-free priority-policy scheduler tests (reference semantics:
processing/scheduler.py:965 _schedule_priority_preemption + v1
preempt-lowest-priority; lower value = higher priority, arrival breaks
ties)."""
from aphrodite_tpu.config import CacheConfig, SchedulerConfig
from aphrodite_tpu.core.request import Request
from aphrodite_tpu.core.sched_output import ModelRunnerOutput
from aphrodite_tpu.core.scheduler import Scheduler
from aphrodite_tpu.sampling_params import SamplingParams


def make_scheduler(num_blocks=64, block_size=16, max_seqs=8,
                   max_tokens=64, max_model_len=512):
    cc = CacheConfig(block_size=block_size, num_blocks_override=num_blocks,
                     num_blocks=num_blocks)
    sc = SchedulerConfig(max_num_seqs=max_seqs,
                         max_num_batched_tokens=max_tokens,
                         max_model_len=max_model_len, policy="priority")
    return Scheduler(sc, cc)


def make_request(rid, prompt_len, priority=0, max_tokens=16,
                 arrival=None, **params):
    # distinct prompts per request id: shared prefixes would otherwise hit
    # the prefix cache and change the block math the tests rely on
    base = 100 + (hash(rid) % 1000) * 100
    req = Request(request_id=rid,
                  prompt_token_ids=list(range(base, base + prompt_len)),
                  sampling_params=SamplingParams(max_tokens=max_tokens,
                                                 **params),
                  eos_token_id=2, priority=priority)
    if arrival is not None:
        req.metrics.arrival_time = arrival
    return req


def step_tokens(sched, out, tok=500):
    req_ids, sampled = [], []
    for rid, n in out.num_scheduled_tokens.items():
        req = sched.requests[rid]
        req_ids.append(rid)
        done = req.num_computed_tokens + n >= req.num_tokens
        sampled.append([tok] if done else [])
    return ModelRunnerOutput(req_ids=req_ids, sampled_token_ids=sampled)


def test_waiting_ordered_by_priority_then_arrival():
    s = make_scheduler(max_tokens=16, max_seqs=1)
    s.add_request(make_request("low", 8, priority=5, arrival=1.0))
    s.add_request(make_request("high", 8, priority=0, arrival=2.0))
    s.add_request(make_request("mid-old", 8, priority=3, arrival=0.5))
    out = s.schedule()
    # only one seat: the lowest (priority, arrival) wins despite arriving
    # last
    assert list(out.num_scheduled_tokens) == ["high"]


def test_arrival_breaks_priority_ties():
    s = make_scheduler(max_tokens=8, max_seqs=1)
    s.add_request(make_request("b", 8, priority=1, arrival=2.0))
    s.add_request(make_request("a", 8, priority=1, arrival=1.0))
    out = s.schedule()
    assert list(out.num_scheduled_tokens) == ["a"]


def test_priority_force_preemption_on_seats():
    """A full batch of low-priority requests is force-preempted when a
    higher-priority request arrives (seat pressure)."""
    s = make_scheduler(max_tokens=64, max_seqs=2)
    s.add_request(make_request("low1", 8, priority=5, arrival=1.0))
    s.add_request(make_request("low2", 8, priority=5, arrival=2.0))
    out = s.schedule()
    s.update_from_output(out, step_tokens(s, out))
    assert {r.request_id for r in s.running} == {"low1", "low2"}

    s.add_request(make_request("vip", 8, priority=0, arrival=3.0))
    out = s.schedule()
    # the newest low-priority request is preempted; vip admitted
    assert "vip" in out.num_scheduled_tokens
    assert {r.request_id for r in s.running} == {"low1", "vip"}
    assert s.requests["low2"].num_computed_tokens == 0  # recompute preempt
    assert s.num_preemptions == 1


def test_priority_force_preemption_on_pages():
    """Page pressure: the worst-priority running request is evicted so the
    high-priority arrival can allocate."""
    # 7 usable blocks (pool reserves one), 16-token pages: 60+44 prompt
    # tokens fill all 7; vip's 40 tokens (3 blocks) cannot allocate.
    s = make_scheduler(num_blocks=8, max_tokens=128, max_seqs=8)
    s.add_request(make_request("low1", 60, priority=5, arrival=1.0))
    s.add_request(make_request("low2", 44, priority=5, arrival=2.0))
    out = s.schedule()
    assert out.num_scheduled_tokens == {"low1": 60, "low2": 44}
    s.update_from_output(out, step_tokens(s, out))
    assert s.kv.pool.get_num_free_blocks() == 0

    s.add_request(make_request("vip", 40, priority=0, arrival=3.0))
    out = s.schedule()
    assert "vip" in out.num_scheduled_tokens
    assert "low2" not in {r.request_id for r in s.running}
    assert s.num_preemptions == 1


def test_no_preemption_without_priority_inversion():
    """An equal-priority arrival does NOT preempt (only strictly-better
    priority forces preemption)."""
    s = make_scheduler(max_tokens=64, max_seqs=2)
    s.add_request(make_request("a", 8, priority=1, arrival=1.0))
    s.add_request(make_request("b", 8, priority=1, arrival=2.0))
    out = s.schedule()
    s.update_from_output(out, step_tokens(s, out))

    s.add_request(make_request("c", 8, priority=1, arrival=3.0))
    out = s.schedule()
    assert "c" not in out.num_scheduled_tokens
    assert s.num_preemptions == 0


def test_running_budget_goes_to_high_priority_first():
    """When the token budget cannot cover all running requests, the
    high-priority ones are scheduled."""
    s = make_scheduler(max_tokens=64, max_seqs=4)
    for rid, prio in (("p5", 5), ("p0", 0), ("p3", 3)):
        s.add_request(make_request(rid, 20, priority=prio,
                                   arrival=float(prio)))
    out = s.schedule()  # 64-token budget covers all three 20-token prefills
    s.update_from_output(out, step_tokens(s, out))
    # decode now; shrink the budget artificially to 2 tokens
    s.config.max_num_batched_tokens = 2
    out = s.schedule()
    assert set(out.num_scheduled_tokens) == {"p0", "p3"}


def test_fcfs_unchanged_by_priority_field():
    """Default policy ignores the priority field entirely."""
    cc = CacheConfig(block_size=16, num_blocks_override=64, num_blocks=64)
    sc = SchedulerConfig(max_num_seqs=1, max_num_batched_tokens=16,
                         max_model_len=512)
    s = Scheduler(sc, cc)
    s.add_request(make_request("first", 8, priority=9, arrival=1.0))
    s.add_request(make_request("vip", 8, priority=0, arrival=2.0))
    out = s.schedule()
    assert list(out.num_scheduled_tokens) == ["first"]


def test_priority_e2e_generate(tmp_path):
    """End-to-end drive: the engine runs with policy=priority and mixed
    priorities; outputs must match the same prompts under FCFS (greedy
    determinism is scheduling-order independent)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from tests.utils import save_tiny_hf_checkpoint, tiny_llama_hf_config
    from aphrodite_tpu.entrypoints.llm import LLM

    save_tiny_hf_checkpoint(tmp_path, tiny_llama_hf_config())
    prompts = [[3, 5, 7, 11], [4, 6, 8, 10], [2, 9, 12, 13]]
    params = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)

    def run(**kw):
        llm = LLM(model=str(tmp_path), dtype="float32", block_size=16,
                  num_kv_blocks=64, max_num_seqs=2, max_model_len=64,
                  tokenizer="unused", **kw)
        outs = llm.generate(prompts, params, **({"priority": [5, 0, 2]}
                                                if kw else {}))
        return [o.outputs[0].token_ids for o in outs]

    assert run(scheduling_policy="priority") == run()
