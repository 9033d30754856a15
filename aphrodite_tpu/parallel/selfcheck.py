"""Multi-host topology self-check: the REAL config-5 control-plane path,
runnable on CPU without a pod.

Host 0 (the calling process) builds a full engine — scheduler, worker on
a tp-sharded mesh, StepBroadcaster + HealthMonitor — while a follower
runs in a SEPARATE OS PROCESS with its own JAX runtime and virtual
device mesh, executing the broadcast SchedulerOutputs through the same
``Worker.execute_model`` the production follower loop uses
(parallel/control_plane.py StepFollower). After the run the follower's
request token state must equal host 0's emitted tokens exactly — the
SPMD lockstep property (every host runs the same deterministic program,
so state evolves identically with strictly one-way control traffic).
A second scenario SIGKILLs the follower mid-stream and asserts host 0's
next broadcast raises FollowerDeadError instead of deadlocking.

Reference analog: DPEngineCoreProc wave coordination
(aphrodite/v1/engine/core.py:589-716) and the Ray-DAG step broadcast
(executor/ray_distributed_executor.py:49-98). What this cannot cover —
XLA collectives crossing physical hosts — is exactly the part XLA owns;
the sharded program itself is validated by dryrun_multichip.

Used by tests/distributed/test_multihost_e2e.py and
``__graft_entry__.dryrun_multichip`` (the driver artifact shows the
follower path).
"""
from __future__ import annotations

import json
import os
import signal
import socket
import subprocess
import sys
import time


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _dummy_cfg():
    from transformers import LlamaConfig
    return LlamaConfig(
        vocab_size=512, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=2,
        intermediate_size=512, max_position_embeddings=512,
        architectures=["LlamaForCausalLM"])


def _engine_kwargs(tp: int) -> dict:
    return dict(tokenizer="unused", dtype="float32", load_format="dummy",
                block_size=16, num_kv_blocks=128,
                max_num_batched_tokens=128, max_num_seqs=4,
                max_model_len=256, device="cpu",
                tensor_parallel_size=tp, sequence_parallel=tp > 1)


def _spawn_follower(bind: str, health: str, out_file: str, tp: int,
                    n_devices: int) -> subprocess.Popen:
    env = dict(os.environ)
    env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count="
                        f"{n_devices}")
    env.pop("APHRODITE_CP_PEERS", None)  # followers never re-broadcast
    return subprocess.Popen(
        [sys.executable, "-m", "aphrodite_tpu.parallel.selfcheck",
         "--follower", "--bind", bind, "--health", health,
         "--out", out_file, "--tp", str(tp)],
        env=env, cwd=os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))))


def follower_main(argv=None) -> None:
    """Subprocess entry: the production follower loop (Worker +
    StepFollower) plus a per-step token-state snapshot dumped at
    shutdown so the parent can assert lockstep equality."""
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--bind", required=True)
    ap.add_argument("--health", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--tp", type=int, default=2)
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")
    from aphrodite_tpu.entrypoints.llm import build_engine_config
    from aphrodite_tpu.parallel.control_plane import StepFollower
    from aphrodite_tpu.worker.worker import Worker

    config = build_engine_config("selfcheck-dummy", hf_config=_dummy_cfg(),
                                 **_engine_kwargs(args.tp))
    worker = Worker(config)
    snapshots: dict[str, list[int]] = {}
    real_exec = worker.execute_model

    def exec_and_snapshot(so):
        out = real_exec(so)
        if hasattr(out, "realize") and out.realize is not None:
            out.realize()
            out = None
        for rid, st in worker.runner.requests.items():
            snapshots[rid] = list(st.token_ids)
        return out

    worker.execute_model = exec_and_snapshot
    follower = StepFollower(worker, bind_addr=args.bind,
                            health_addr=args.health)
    try:
        follower.serve_forever()
    finally:
        follower.close()
        with open(args.out, "w") as f:
            json.dump({"snapshots": snapshots,
                       "steps": follower.steps_executed}, f)


def follower_e2e_check(tp: int = 2, follower_devices: int = 4,
                       kill_test: bool = True, verbose: bool = True
                       ) -> dict:
    """Run the two-OS-process topology; returns a summary dict and
    raises AssertionError on any lockstep violation."""
    import tempfile

    from aphrodite_tpu.entrypoints.llm import LLM
    from aphrodite_tpu.parallel.control_plane import FollowerDeadError
    from aphrodite_tpu.sampling_params import SamplingParams

    bind = f"tcp://127.0.0.1:{_free_port()}"
    health = f"tcp://127.0.0.1:{_free_port()}"
    out_file = tempfile.mktemp(suffix=".json")
    proc = _spawn_follower(bind, health, out_file, tp, follower_devices)
    old_env = {k: os.environ.get(k)
               for k in ("APHRODITE_CP_PEERS", "APHRODITE_CP_HEALTH")}
    os.environ["APHRODITE_CP_PEERS"] = bind
    os.environ["APHRODITE_CP_HEALTH"] = health
    try:
        llm = LLM(model="selfcheck-dummy", hf_config=_dummy_cfg(),
                  **_engine_kwargs(tp))
        # Mixed sampling exercises the follower through every runner
        # path: greedy, seeded, and penalties-in-window.
        params = [
            SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True),
            SamplingParams(temperature=0.9, seed=7, max_tokens=8,
                           ignore_eos=True),
            SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                           repetition_penalty=1.3),
        ]
        # One prompt longer than the 128-token budget: chunked prefill
        # forces multiple broadcast waves, with the other rows windowing
        # while it is mid-prefill (per-row window eligibility).
        prompts = [[1, 5, 9], [30 + (i % 200) for i in range(200)],
                   [7, 11]]
        outs = llm.generate(prompts, params)
        expected = {o.request_id: list(prompts[i])
                    + list(o.outputs[0].token_ids)
                    for i, o in enumerate(outs)}
        llm.engine.core.shutdown()
        proc.wait(timeout=120)
        with open(out_file) as f:
            follower_state = json.load(f)
        mismatches = []
        for rid, toks in expected.items():
            got = follower_state["snapshots"].get(rid)
            if got != toks:
                mismatches.append((rid, toks, got))
        assert not mismatches, (
            f"follower state diverged from host 0: {mismatches}")
        assert follower_state["steps"] > 0
        summary = {"followed_steps": follower_state["steps"],
                   "requests_checked": len(expected),
                   "token_equal": True}
        if verbose:
            print(f"follower-e2e OK: separate-process follower executed "
                  f"{follower_state['steps']} broadcast steps on its own "
                  f"{follower_devices}-device tp={tp} mesh; "
                  f"{len(expected)} requests token-identical to host 0")
    finally:
        if proc.poll() is None:
            proc.kill()
        for k, v in old_env.items():
            os.environ.pop(k, None) if v is None else \
                os.environ.__setitem__(k, v)

    if not kill_test:
        return summary

    # ---- scenario 2: SIGKILL mid-stream -> FollowerDeadError ----------
    bind2 = f"tcp://127.0.0.1:{_free_port()}"
    health2 = f"tcp://127.0.0.1:{_free_port()}"
    out2 = tempfile.mktemp(suffix=".json")
    proc2 = _spawn_follower(bind2, health2, out2, tp, follower_devices)
    os.environ["APHRODITE_CP_PEERS"] = bind2
    os.environ["APHRODITE_CP_HEALTH"] = health2
    try:
        llm2 = LLM(model="selfcheck-dummy", hf_config=_dummy_cfg(),
                   **_engine_kwargs(tp))
        mon = llm2.engine.core.broadcaster.health
        mon.timeout_s = 1.5  # fast deadline for the check
        p0 = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
        llm2.generate([[1, 2, 3]], p0)        # follower alive: works
        os.kill(proc2.pid, signal.SIGKILL)    # hard host death
        proc2.wait(timeout=30)
        time.sleep(mon.timeout_s + 1.0)
        try:
            llm2.generate([[4, 5, 6]], p0)
            raise AssertionError(
                "FollowerDeadError not raised after SIGKILL")
        except FollowerDeadError:
            pass
        summary["kill_detected"] = True
        if verbose:
            print("follower-e2e OK: SIGKILLed follower surfaced "
                  "FollowerDeadError from the next broadcast")
    finally:
        if proc2.poll() is None:
            proc2.kill()
        for k, v in old_env.items():
            os.environ.pop(k, None) if v is None else \
                os.environ.__setitem__(k, v)
    return summary


if __name__ == "__main__":
    if "--follower" in sys.argv:
        sys.argv.remove("--follower")
        follower_main(sys.argv[1:])
    else:
        follower_e2e_check()
