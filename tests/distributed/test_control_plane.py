"""Multi-host per-step control plane (parallel/control_plane.py):
device-free broadcast protocol test + a CPU check that a follower
"host" fed by the broadcast executes an identical step sequence and
reaches identical request state."""
import threading

import numpy as np
import pytest

from aphrodite_tpu.parallel.control_plane import (StepBroadcaster,
                                                  StepFollower)
from aphrodite_tpu.sampling_params import SamplingParams


class RecordingWorker:
    def __init__(self):
        self.steps = []
        self.utils = []

    def execute_model(self, so):
        self.steps.append(so)
        return None

    def sleep(self, level=1):
        self.utils.append(("sleep", level))


def _addr(port):
    return f"tcp://127.0.0.1:{port}"


def test_broadcast_ordering_and_kinds():
    import socket
    s = socket.socket(); s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]; s.close()
    w = RecordingWorker()
    follower = StepFollower(w, _addr(port))
    bc = StepBroadcaster([_addr(port)])
    payloads = [{"step": i, "params": SamplingParams(max_tokens=i + 1)}
                for i in range(5)]
    for p in payloads[:3]:
        bc.broadcast_step(p)
    bc.broadcast_utility("sleep", 2)
    for p in payloads[3:]:
        bc.broadcast_step(p)
    bc.shutdown()
    while follower.serve_one(timeout_ms=5000):
        pass
    assert [s["step"] for s in w.steps] == [0, 1, 2, 3, 4]
    assert w.steps[4]["params"].max_tokens == 5
    assert w.utils == [("sleep", 2)]
    follower.close()


def test_sequence_gap_detected():
    import socket
    s = socket.socket(); s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]; s.close()
    w = RecordingWorker()
    follower = StepFollower(w, _addr(port))
    bc = StepBroadcaster([_addr(port)])
    bc.broadcast_step({"step": 0})
    bc.seq += 1  # simulate a lost message
    bc.broadcast_step({"step": 2})
    assert follower.serve_one(timeout_ms=5000)
    with pytest.raises(RuntimeError, match="control-plane gap"):
        follower.serve_one(timeout_ms=5000)
    follower.close()
    bc.shutdown()


def test_follower_host_reaches_identical_state(tmp_path):
    """Two 'hosts' on CPU: host 0 runs the real engine (scheduler +
    worker) with a broadcaster; a follower worker consumes the stream.
    After the run the follower's runner holds exactly the token ids host
    0's scheduler produced — the SPMD lockstep property the control plane
    must guarantee."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from tests.utils import save_tiny_hf_checkpoint, tiny_llama_hf_config
    from aphrodite_tpu.entrypoints.llm import LLM, build_engine_config
    from aphrodite_tpu.worker.worker import Worker
    import socket
    s = socket.socket(); s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]; s.close()

    d = tmp_path / "ckpt"
    save_tiny_hf_checkpoint(d, tiny_llama_hf_config(max_pos=512))
    kw = dict(dtype="float32", block_size=16, num_kv_blocks=128,
              max_num_batched_tokens=128, max_num_seqs=4,
              max_model_len=128, tokenizer="unused", device="cpu")

    follower_cfg = build_engine_config(str(d), **kw)
    follower_worker = Worker(follower_cfg)
    # Snapshot per-request token state after every executed step so the
    # equivalence check survives the final purge.
    snapshots = {}
    real_exec = follower_worker.execute_model

    def exec_and_snapshot(so):
        out = real_exec(so)
        if hasattr(out, "realize") and out.realize is not None:
            out.realize()
            out = None
        for rid, st in follower_worker.runner.requests.items():
            snapshots[rid] = list(st.token_ids)
        return out
    follower_worker.execute_model = exec_and_snapshot
    follower = StepFollower(follower_worker, _addr(port))
    done = threading.Event()

    def run_follower():
        while follower.serve_one(timeout_ms=30000):
            pass
        done.set()

    t = threading.Thread(target=run_follower, daemon=True)

    llm = LLM(model=str(d), **kw)
    core = llm.engine.core
    core.broadcaster = StepBroadcaster([_addr(port)])
    t.start()
    rng = np.random.RandomState(0)
    prompts = [rng.randint(10, 200, size=9 + 3 * i).tolist()
               for i in range(3)]
    outs = llm.generate(prompts, SamplingParams(
        temperature=0.0, max_tokens=7, ignore_eos=True))
    core.shutdown()
    assert done.wait(120)
    assert follower.steps_executed >= 1

    # Follower request state must hold prompt + ALL sampled tokens for
    # every request (identical trajectory to host 0).
    assert len(snapshots) == len(outs)
    snap_by_tokens = {tuple(v) for v in snapshots.values()}
    for i, out in enumerate(outs):
        expect = tuple(prompts[i] + list(out.outputs[0].token_ids))
        assert expect in snap_by_tokens, f"request {i} diverged"
    follower.close()


# ------------------------------------------------------- failure detection
def _free_port():
    import socket
    s = socket.socket(); s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]; s.close()
    return port


def _follower_proc(bind, health, fail_on_step):
    """Subprocess body: follow the stream; optionally blow up on a step."""
    from aphrodite_tpu.parallel.control_plane import StepFollower

    class W:
        def execute_model(self, so):
            if fail_on_step is not None and so.get("step") == fail_on_step:
                raise RuntimeError("injected follower failure")
            return None

    f = StepFollower(W(), bind, health_addr=health, follower_id="f0",
                     heartbeat_interval=0.2)
    try:
        f.serve_forever()
    finally:
        f.close()


def _spawn_follower(bind, health, fail_on_step=None):
    import multiprocessing as mp
    ctx = mp.get_context("spawn")
    p = ctx.Process(target=_follower_proc,
                    args=(bind, health, fail_on_step), daemon=True)
    p.start()
    return p


def test_follower_death_detected_within_timeout():
    """SIGKILL a follower: host 0 surfaces FollowerDeadError from
    broadcast_step within the heartbeat deadline, instead of hanging in
    the next collective (reference analog: v1/engine/core.py:499
    ENGINE_CORE_DEAD)."""
    import time as _t

    from aphrodite_tpu.parallel.control_plane import (FollowerDeadError,
                                                      HealthMonitor)
    bind = _addr(_free_port())
    health = _addr(_free_port())
    mon = HealthMonitor(health, num_followers=1, timeout_s=1.0)
    bc = StepBroadcaster([bind], health=mon)
    proc = _spawn_follower(bind, health)
    try:
        mon.wait_for_followers(1, timeout_s=30)
        bc.broadcast_step({"step": 0})  # healthy: no raise
        proc.kill()                     # SIGKILL: no bye, no error message
        proc.join(10)
        deadline = _t.monotonic() + 10
        with pytest.raises(FollowerDeadError, match="heartbeat deadline"):
            while _t.monotonic() < deadline:
                bc.broadcast_step({"step": 1})
                _t.sleep(0.1)
        assert _t.monotonic() < deadline, "detection took too long"
    finally:
        proc.kill()
        mon.close()


def test_follower_error_propagates_traceback():
    """A follower whose worker raises reports the traceback on the health
    channel; host 0's next broadcast raises with the cause."""
    from aphrodite_tpu.parallel.control_plane import (FollowerDeadError,
                                                      HealthMonitor)
    import time as _t
    bind = _addr(_free_port())
    health = _addr(_free_port())
    mon = HealthMonitor(health, num_followers=1, timeout_s=30.0)
    bc = StepBroadcaster([bind], health=mon)
    proc = _spawn_follower(bind, health, fail_on_step=1)
    try:
        mon.wait_for_followers(1, timeout_s=30)
        bc.broadcast_step({"step": 0})
        bc.broadcast_step({"step": 1})  # follower raises on this one
        deadline = _t.monotonic() + 10
        with pytest.raises(FollowerDeadError,
                           match="injected follower failure"):
            while _t.monotonic() < deadline:
                bc.broadcast_step({"step": 2})
                _t.sleep(0.1)
    finally:
        proc.kill()
        mon.close()


def test_clean_shutdown_not_flagged():
    """A follower that departs after shutdown (bye) must not trip the
    monitor."""
    import time as _t

    from aphrodite_tpu.parallel.control_plane import HealthMonitor
    bind = _addr(_free_port())
    health = _addr(_free_port())
    mon = HealthMonitor(health, num_followers=1, timeout_s=1.0)
    bc = StepBroadcaster([bind], health=mon)
    proc = _spawn_follower(bind, health)
    try:
        mon.wait_for_followers(1, timeout_s=30)
        bc.broadcast_step({"step": 0})
        bc.shutdown()
        proc.join(10)
        _t.sleep(1.5)  # past the heartbeat deadline
        mon.check()    # departed cleanly: no raise
    finally:
        proc.kill()
        mon.close()


def test_launch_plan_placement(tmp_path):
    """Placement automation: per-host env/argv wiring is consistent
    (peers <-> binds, health monitor <-> heartbeat connect, ranks)."""
    from aphrodite_tpu.parallel.launcher import build_launch_plan, launch
    hosts = ["10.0.0.1", "10.0.0.2", "10.0.0.3"]
    plan = build_launch_plan(hosts, "/models/m", ["-tp", "4"])
    assert [e["rank"] for e in plan] == [0, 1, 2]
    h0 = plan[0]["env"]
    assert h0["APHRODITE_CP_PEERS"] == \
        "tcp://10.0.0.2:21700,tcp://10.0.0.3:21700"
    assert h0["APHRODITE_CP_HEALTH"].endswith(":21701")
    for e in plan[1:]:
        assert e["env"]["APHRODITE_CP_BIND"] == "tcp://0.0.0.0:21700"
        assert e["env"]["APHRODITE_CP_HEALTH"] == "tcp://10.0.0.1:21701"
        assert e["argv"][3] == "follower"
        assert e["env"]["APHRODITE_NUM_PROCESSES"] == "3"
    assert plan[0]["argv"][3] == "run"
    # single host: no control plane env at all
    solo = build_launch_plan(["localhost"], "/m")
    assert "APHRODITE_CP_PEERS" not in solo[0]["env"]
    # ssh command rendering
    cmds = launch(hosts, "/m", dry_run=True)
    assert all(c.startswith("ssh ") for c in cmds[1:])
    assert "follower" in cmds[1]
    # CLI dry run end-to-end
    import subprocess, sys
    hf = tmp_path / "hosts"
    hf.write_text("\n".join(hosts) + "\n")
    out = subprocess.run(
        [sys.executable, "-m", "aphrodite_tpu.cli", "launch",
         "--hostfile", str(hf), "--dry-run", "/m", "--", "-tp", "4"],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-500:]
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    assert len(lines) == 3 and "APHRODITE_CP_PEERS" in lines[0]
