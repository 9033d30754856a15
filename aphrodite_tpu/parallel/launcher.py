"""Multi-host initialization.

Reference analog: Ray placement + PJRT multiprocess init
(executor/ray_distributed_executor.py, device_communicators/
tpu_communicator.py:80-82). TPU-native: each host runs ONE engine process;
`jax.distributed.initialize` joins them into a single JAX runtime whose
`jax.devices()` spans the slice, and the existing mesh/NamedSharding code
then shards weights and KV across hosts with ICI/DCN collectives inserted
by XLA. The scheduler stays on host 0 conceptually — with SPMD execution,
every host runs the same jitted step over its local shard.

Environment (GKE/JobSet-style):
  APHRODITE_COORDINATOR   host:port of process 0
  APHRODITE_NUM_PROCESSES total engine processes
  APHRODITE_PROCESS_ID    this process's rank
(TPU pods can also rely on jax.distributed.initialize() auto-detection.)
"""
from __future__ import annotations

import os
from typing import Optional

import jax

from aphrodite_tpu.utils import logger


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Join the multi-host JAX runtime. No-op if single-process."""
    coordinator_address = coordinator_address or os.environ.get(
        "APHRODITE_COORDINATOR")
    if num_processes is None and "APHRODITE_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["APHRODITE_NUM_PROCESSES"])
    if process_id is None and "APHRODITE_PROCESS_ID" in os.environ:
        process_id = int(os.environ["APHRODITE_PROCESS_ID"])

    if coordinator_address is None and num_processes in (None, 1):
        # Cloud TPU pods auto-detect via the TPU metadata when available.
        try:
            jax.distributed.initialize()
        except Exception:
            return {"num_processes": 1, "process_id": 0,
                    "num_devices": len(jax.devices())}
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    info = {
        "num_processes": jax.process_count(),
        "process_id": jax.process_index(),
        "num_devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
    }
    logger.info("multihost: process %d/%d, %d global devices",
                info["process_id"], info["num_processes"],
                info["num_devices"])
    return info


# --------------------------------------------------------------- placement
def build_launch_plan(hosts: list[str], model: str,
                      engine_args: Optional[list[str]] = None,
                      base_port: int = 2242,
                      cp_port: int = 21700,
                      health_port: int = 21701,
                      coordinator_port: int = 8476) -> list[dict]:
    """Placement automation (the Ray-placement-group replacement,
    reference executor/ray_distributed_executor.py:49-155): given the
    host list, compute every process's full environment + argv. Host 0
    runs the serving frontend (scheduler + HTTP + step broadcaster +
    health monitor); hosts 1..N-1 run `aphrodite-tpu follower`. The
    plan is data — launch() executes it over ssh, or hand each entry to
    your orchestrator (GKE JobSet, Slurm) verbatim.

    Returns one dict per host: {host, rank, env, argv}."""
    engine_args = engine_args or []
    n = len(hosts)
    if n < 1:
        raise ValueError("need at least one host")
    coord = f"{hosts[0]}:{coordinator_port}"
    peers = ",".join(f"tcp://{h}:{cp_port}" for h in hosts[1:])
    health0 = f"tcp://0.0.0.0:{health_port}"
    health_connect = f"tcp://{hosts[0]}:{health_port}"
    plan = []
    for rank, host in enumerate(hosts):
        env = {
            "APHRODITE_COORDINATOR": coord,
            "APHRODITE_NUM_PROCESSES": str(n),
            "APHRODITE_PROCESS_ID": str(rank),
        }
        if rank == 0:
            if n > 1:
                env["APHRODITE_CP_PEERS"] = peers
                env["APHRODITE_CP_HEALTH"] = health0
            argv = ["python", "-m", "aphrodite_tpu.cli", "run", model,
                    "--port", str(base_port), *engine_args]
        else:
            env["APHRODITE_CP_BIND"] = f"tcp://0.0.0.0:{cp_port}"
            env["APHRODITE_CP_HEALTH"] = health_connect
            argv = ["python", "-m", "aphrodite_tpu.cli", "follower",
                    model, *engine_args]
        plan.append({"host": host, "rank": rank, "env": env, "argv": argv})
    return plan


def launch(hosts: list[str], model: str,
           engine_args: Optional[list[str]] = None,
           ssh_cmd: str = "ssh", dry_run: bool = False,
           **ports) -> list:
    """Execute a launch plan: host 0 locally (if hosts[0] is this
    machine / 'localhost'), peers over `ssh_cmd host env K=V ... argv`.
    dry_run returns the commands instead of spawning — orchestrators
    that template their own manifests consume the plan directly."""
    import shlex
    import subprocess
    plan = build_launch_plan(hosts, model, engine_args, **ports)
    cmds = []
    for entry in plan:
        envs = " ".join(f"{k}={shlex.quote(v)}"
                        for k, v in entry["env"].items())
        argv = " ".join(shlex.quote(a) for a in entry["argv"])
        if entry["host"] in ("localhost", "127.0.0.1"):
            cmd = f"env {envs} {argv}"
        else:
            cmd = f"{ssh_cmd} {shlex.quote(entry['host'])} " \
                  f"'env {envs} {argv}'"
        cmds.append(cmd)
    if dry_run:
        return cmds
    # Start followers FIRST (their PULL sockets must bind before host 0
    # broadcasts; EngineCore's health.wait_for_followers gates serving
    # and HealthMonitor.check flags never-joined followers).
    procs = []
    for cmd in reversed(cmds):
        procs.append(subprocess.Popen(cmd, shell=True))
    return procs
