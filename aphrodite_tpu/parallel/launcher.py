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
