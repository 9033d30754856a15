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

Environment:
  APHRODITE_CP_PEERS  host0: comma-separated peer PULL addresses
  APHRODITE_CP_BIND   peers: the address this host's PULL binds
"""
from __future__ import annotations

import os
import pickle
from typing import Optional

from aphrodite_tpu.utils import logger


class StepBroadcaster:
    """Host 0: replicate each step's control metadata to all peers."""

    def __init__(self, peer_addrs: Optional[list[str]] = None) -> None:
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

    def _send(self, kind: str, payload) -> None:
        msg = pickle.dumps((kind, self.seq, payload),
                           protocol=pickle.HIGHEST_PROTOCOL)
        for s in self.socks:
            s.send(msg)
        self.seq += 1

    def broadcast_step(self, sched_out) -> None:
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

    def __init__(self, worker, bind_addr: Optional[str] = None) -> None:
        import zmq
        bind_addr = bind_addr or os.environ["APHRODITE_CP_BIND"]
        self.ctx = zmq.Context.instance()
        self.sock = self.ctx.socket(zmq.PULL)
        self.sock.setsockopt(zmq.RCVHWM, 0)
        self.sock.bind(bind_addr)
        self.worker = worker
        self.expected_seq = 0
        self.steps_executed = 0

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
        while self.serve_one():
            pass

    def close(self) -> None:
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
