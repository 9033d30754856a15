"""Device mesh construction.

This replaces the reference's entire distributed stack — GroupCoordinator,
pynccl, custom allreduce, shm broadcast (aphrodite/distributed/, ~9k LoC,
SURVEY.md §2.8): parallelism here is one `jax.sharding.Mesh` with axes
``(dp, pp, tp)`` and NamedSharding annotations; XLA inserts/overlaps the ICI
collectives inside the compiled step. Expert parallelism rides the tp axis
(expert dim sharded instead of the per-expert intermediate dim); sequence
parallelism falls out of GSPMD sharding propagation (activations constrained
to P("tp") on the token dim between blocks).

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

MESH_AXES = ("dp", "pp", "tp")


def build_mesh(parallel_config: ParallelConfig,
               devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    tp = parallel_config.tensor_parallel_size
    dp = parallel_config.data_parallel_size
    pp = parallel_config.pipeline_parallel_size
    need = tp * dp * pp
    if need > len(devices):
        raise ValueError(
            f"mesh needs {need} devices (tp={tp} dp={dp} pp={pp}), "
            f"have {len(devices)}")
    devices = devices[:need]
    try:
        from jax.experimental import mesh_utils
        dev_array = mesh_utils.create_device_mesh((dp, pp, tp),
                                                  devices=devices)
    except Exception:
        dev_array = np.array(devices).reshape(dp, pp, tp)
    mesh = Mesh(dev_array, MESH_AXES)
    logger.info("device mesh: dp=%d pp=%d tp=%d on %s", dp, pp, tp,
                devices[0].platform)
    return mesh


def kv_cache_pspec(pp: bool = False, shard_kv: bool = True) -> P:
    """KV cache [L, pages, 2, kvh, page, hd]: layers across pp stages,
    KV heads across tp. shard_kv=False replicates the cache across tp —
    required when kvh does not divide by the tp size (GQA with few heads,
    and MLA's single latent head)."""
    return P("pp" if pp else None, None, None,
             "tp" if shard_kv else None, None, None)


def model_param_specs(model) -> dict:
    """The model's PartitionSpec tree, with the stacked-[L, ...] layer
    leaves additionally sharded across `pp` when pipeline parallelism is
    on (models keep their specs pp-agnostic; the L dim is always dim 0)."""
    specs = model.param_specs()
    if getattr(model, "pp_size", 1) > 1 and "layers" in specs:
        def _pp(s):
            if isinstance(s, dict):  # quantized-weight leaf groups
                return {k: _pp(v) for k, v in s.items()}
            if s is None:
                return P("pp")
            return P("pp", *tuple(s)[1:])
        specs["layers"] = {k: _pp(s) for k, s in specs["layers"].items()}
    return specs


def shard(mesh: Mesh, spec: P) -> NamedSharding:
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
