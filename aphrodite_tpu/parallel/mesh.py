"""Device mesh construction.

This replaces the reference's entire distributed stack — GroupCoordinator,
pynccl, custom allreduce, shm broadcast (aphrodite/distributed/, ~9k LoC,
SURVEY.md §2.8): parallelism here is one `jax.sharding.Mesh` with axes
``(dp, tp)`` and NamedSharding annotations; XLA inserts/overlaps the ICI
collectives inside the compiled step.

Multi-host: call `jax.distributed.initialize` before building the mesh; the
same mesh code then spans hosts (DCN between slices).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aphrodite_tpu.config import ParallelConfig
from aphrodite_tpu.utils import logger

MESH_AXES = ("dp", "tp")


def build_mesh(parallel_config: ParallelConfig,
               devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    tp = parallel_config.tensor_parallel_size
    dp = parallel_config.data_parallel_size
    need = tp * dp
    if need > len(devices):
        raise ValueError(
            f"mesh needs {need} devices (tp={tp} dp={dp}), "
            f"have {len(devices)}")
    devices = devices[:need]
    try:
        from jax.experimental import mesh_utils
        dev_array = mesh_utils.create_device_mesh((dp, tp), devices=devices)
    except Exception:
        dev_array = np.array(devices).reshape(dp, tp)
    mesh = Mesh(dev_array, MESH_AXES)
    logger.info("device mesh: dp=%d tp=%d on %s", dp, tp,
                devices[0].platform)
    return mesh


def kv_cache_pspec() -> P:
    """KV cache [L, pages, 2, kvh, page, hd]: shard the KV heads across tp."""
    return P(None, None, None, "tp", None, None)


def shard(mesh: Mesh, spec: P) -> NamedSharding:
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
