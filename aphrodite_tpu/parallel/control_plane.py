"""Multi-host per-step control plane.

Reference analog: the Ray DAG that ships each step's SchedulerOutput to
every worker (aphrodite/executor/ray_distributed_executor.py:49-98) and
the TPU communicator's broadcast plumbing
(device_communicators/tpu_communicator.py:29-90).

TPU-native design: under multi-host SPMD there is exactly ONE logical
program — every host must enter the same jitted step with the same
(replicated) metadata or the GSPMD collectives deadlock. The scheduler,
detokenizer and HTTP frontend live on host 0 only; each step's
SchedulerOutput is broadcast to the peer hosts, whose follower loop calls
the same ``worker.execute_model(so)``. Because sampled tokens are
REPLICATED outputs of the same deterministic program, every host's
request state evolves identically without any peer->host0 traffic: the
control plane is strictly one-way.

Wire protocol (ZMQ PUSH host0 -> PULL peer, one socket per peer, pickled):
  ("step",    seq_no, SchedulerOutput)
  ("utility", seq_no, (method, args, kwargs))   # reset_prefix_cache, ...
  ("shutdown", seq_no, None)

Health channel (follower PUSH -> host0 PULL, reference analog:
v1/engine/core.py:499 ENGINE_CORE_DEAD + multiproc_worker_utils.py:95
worker-death monitor): each follower heartbeats every
``heartbeat_interval`` seconds; host 0's HealthMonitor raises a clean
FollowerDeadError from broadcast_step when a follower misses its
deadline or reports an error — instead of the engine hanging forever in
the next SPMD collective. A dead follower is NOT resumable in place
(the SPMD program state is gone): the monitor's error says to restart
the serving job; orchestration-level restart is the deployment layer's
job, as it is for the reference's Ray placement groups.

  ("hb",    follower_id, expected_seq)
  ("error", follower_id, traceback_str)
  ("bye",   follower_id, None)

Environment:
  APHRODITE_CP_PEERS        host0: comma-separated peer PULL addresses
  APHRODITE_CP_BIND         peers: the address this host's PULL binds
  APHRODITE_CP_HEALTH       host0 health PULL bind / peers' connect addr
"""
from __future__ import annotations

import os
import pickle
import threading
import time
from typing import Optional

from aphrodite_tpu.utils import logger


class FollowerDeadError(RuntimeError):
    """A follower host died or errored: the SPMD program cannot continue.

    Restart the serving job (followers cannot rejoin an in-flight SPMD
    program — their device state is unrecoverable)."""


class HealthMonitor:
    """Host 0: track follower heartbeats; surface death within a bounded
    timeout instead of deadlocking the next collective."""

    def __init__(self, bind_addr: Optional[str] = None,
                 num_followers: int = 0,
                 timeout_s: float = 10.0,
                 join_timeout_s: float = 600.0) -> None:
        import zmq
        bind_addr = bind_addr or os.environ.get("APHRODITE_CP_HEALTH")
        self.ctx = zmq.Context.instance()
        self.sock = self.ctx.socket(zmq.PULL)
        self.sock.bind(bind_addr)
        self.timeout_s = timeout_s
        self.join_timeout_s = join_timeout_s
        self._started = time.monotonic()
        self.num_followers = num_followers
        self.last_seen: dict[str, float] = {}
        self.errors: dict[str, str] = {}
        self.departed: set[str] = set()
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._drain, daemon=True)
        self._thread.start()

    def _drain(self) -> None:
        while not self._stop.is_set():
            if not self.sock.poll(200):
                continue
            try:
                kind, fid, payload = pickle.loads(self.sock.recv())
            except Exception:
                continue
            with self._lock:
                if kind == "hb":
                    self.last_seen[fid] = time.monotonic()
                elif kind == "error":
                    self.errors[fid] = payload
                elif kind == "bye":
                    self.departed.add(fid)

    def wait_for_followers(self, n: Optional[int] = None,
                           timeout_s: float = 60.0) -> None:
        """Block until n followers have heartbeat at least once."""
        n = n if n is not None else self.num_followers
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            with self._lock:
                if len(self.last_seen) >= n:
                    return
            time.sleep(0.05)
        raise FollowerDeadError(
            f"only {len(self.last_seen)}/{n} followers joined within "
            f"{timeout_s:.0f}s")

    def check(self) -> None:
        """Raise FollowerDeadError if any follower errored or went silent
        past the deadline. Called from broadcast_step — every engine step
        costs one dict scan."""
        now = time.monotonic()
        with self._lock:
            if (len(self.last_seen) < self.num_followers
                    and now - self._started > self.join_timeout_s):
                # a follower that NEVER joined (ssh/process failed to
                # start) would otherwise hang the first collective forever
                raise FollowerDeadError(
                    f"only {len(self.last_seen)}/{self.num_followers} "
                    f"followers ever joined within "
                    f"{self.join_timeout_s:.0f}s; check the launch plan")
            if self.errors:
                fid, tb = next(iter(self.errors.items()))
                raise FollowerDeadError(
                    f"follower {fid} reported an error; restart the "
                    f"serving job.\n--- follower traceback ---\n{tb}")
            for fid, seen in self.last_seen.items():
                if fid in self.departed:
                    continue
                if now - seen > self.timeout_s:
                    raise FollowerDeadError(
                        f"follower {fid} missed its heartbeat deadline "
                        f"({now - seen:.1f}s > {self.timeout_s:.1f}s): "
                        "host dead or hung; restart the serving job")

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=1.0)
        self.sock.close(100)


class StepBroadcaster:
    """Host 0: replicate each step's control metadata to all peers."""

    def __init__(self, peer_addrs: Optional[list[str]] = None,
                 health: Optional[HealthMonitor] = None) -> None:
        import zmq
        if peer_addrs is None:
            peers = os.environ.get("APHRODITE_CP_PEERS", "")
            peer_addrs = [p for p in peers.split(",") if p]
        self.ctx = zmq.Context.instance()
        self.socks = []
        for addr in peer_addrs:
            s = self.ctx.socket(zmq.PUSH)
            # Block rather than drop: a lost step deadlocks the SPMD
            # program, so backpressure is the correct failure mode.
            s.setsockopt(zmq.SNDHWM, 0)
            s.connect(addr)
            self.socks.append(s)
        self.seq = 0
        if health is None and os.environ.get("APHRODITE_CP_HEALTH"):
            health = HealthMonitor(num_followers=len(peer_addrs))
        self.health = health

    def _send(self, kind: str, payload) -> None:
        msg = pickle.dumps((kind, self.seq, payload),
                           protocol=pickle.HIGHEST_PROTOCOL)
        for s in self.socks:
            s.send(msg)
        self.seq += 1

    def broadcast_step(self, sched_out) -> None:
        if self.health is not None:
            self.health.check()  # raise cleanly instead of deadlocking
        self._send("step", sched_out)

    def broadcast_utility(self, method: str, *args, **kwargs) -> None:
        self._send("utility", (method, args, kwargs))

    def shutdown(self) -> None:
        try:
            self._send("shutdown", None)
        except Exception:
            pass
        for s in self.socks:
            s.close(100)


class StepFollower:
    """Peer host: receive the step stream and apply it to a worker.

    ``worker`` needs ``execute_model(so)`` plus the utility methods host 0
    forwards. A PendingStep result is realized immediately — follower
    hosts have no consumer to overlap with, and realize keeps the local
    request state identical to host 0's."""

    def __init__(self, worker, bind_addr: Optional[str] = None,
                 health_addr: Optional[str] = None,
                 follower_id: Optional[str] = None,
                 heartbeat_interval: float = 2.0) -> None:
        import zmq
        bind_addr = bind_addr or os.environ["APHRODITE_CP_BIND"]
        self.ctx = zmq.Context.instance()
        self.sock = self.ctx.socket(zmq.PULL)
        self.sock.setsockopt(zmq.RCVHWM, 0)
        self.sock.bind(bind_addr)
        self.worker = worker
        self.expected_seq = 0
        self.steps_executed = 0
        self.follower_id = follower_id or f"{os.uname().nodename}:" \
            f"{os.getpid()}"
        self._hb_sock = None
        self._hb_stop = threading.Event()
        health_addr = health_addr or os.environ.get("APHRODITE_CP_HEALTH")
        if health_addr:
            self._hb_sock = self.ctx.socket(zmq.PUSH)
            self._hb_sock.setsockopt(zmq.LINGER, 500)
            self._hb_sock.connect(health_addr)
            self._hb_lock = threading.Lock()
            self._hb_interval = heartbeat_interval
            t = threading.Thread(target=self._heartbeat_loop, daemon=True)
            t.start()

    def _hb_send(self, kind: str, payload=None) -> None:
        if self._hb_sock is None:
            return
        with self._hb_lock:
            self._hb_sock.send(pickle.dumps(
                (kind, self.follower_id, payload)))

    def _heartbeat_loop(self) -> None:
        self._hb_send("hb", self.expected_seq)  # announce immediately
        while not self._hb_stop.wait(self._hb_interval):
            try:
                self._hb_send("hb", self.expected_seq)
            except Exception:
                return
        # clean departure: the monitor stops expecting beats from us
        try:
            self._hb_send("bye")
        except Exception:
            pass

    def serve_one(self, timeout_ms: Optional[int] = None) -> bool:
        """Process one message. Returns False on shutdown/timeout."""
        if timeout_ms is not None and not self.sock.poll(timeout_ms):
            return False
        kind, seq, payload = pickle.loads(self.sock.recv())
        if seq != self.expected_seq:
            raise RuntimeError(
                f"control-plane gap: expected seq {self.expected_seq}, "
                f"got {seq} — a lost step would deadlock the SPMD program")
        self.expected_seq = seq + 1
        if kind == "shutdown":
            return False
        if kind == "utility":
            method, args, kwargs = payload
            getattr(self.worker, method)(*args, **kwargs)
            return True
        out = self.worker.execute_model(payload)
        if hasattr(out, "realize") and out.realize is not None:
            out.realize()
        self.steps_executed += 1
        return True

    def serve_forever(self) -> None:
        try:
            while self.serve_one():
                pass
        except Exception:
            # Report the failure on the health channel before dying so
            # host 0 raises a described error instead of a bare timeout.
            import traceback
            self._hb_send("error", traceback.format_exc())
            raise

    def close(self) -> None:
        self._hb_stop.set()
        if self._hb_sock is not None:
            try:
                self._hb_send("bye")
            except Exception:
                pass
            self._hb_sock.close(500)
        self.sock.close(100)


def run_follower(config, bind_addr: Optional[str] = None) -> None:
    """Peer-host entry point: join the JAX runtime, build the worker
    (weights shard onto this host's devices via the global mesh), then
    follow host 0's step stream until shutdown."""
    from aphrodite_tpu.parallel.launcher import initialize_multihost
    from aphrodite_tpu.worker.worker import Worker
    info = initialize_multihost()
    logger.info("follower: process %d/%d", info["process_id"],
                info["num_processes"])
    worker = Worker(config)
    follower = StepFollower(worker, bind_addr)
    try:
        follower.serve_forever()
    finally:
        follower.close()
