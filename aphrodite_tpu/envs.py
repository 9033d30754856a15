"""Environment-variable surface (reference: aphrodite/common/envs.py,
116 `APHRODITE_*` vars).

The TPU engine's env surface is deliberately small: most of the
reference's vars configure CUDA-ecosystem machinery that has no TPU
analog (attention-backend selection, NCCL knobs, Triton caches, CUDA
graph tuning, Ray plumbing) — the corresponding behavior here is either
a single code path (one attention backend per device kind), a config
dataclass field, or owned by JAX/XLA's own envs (`JAX_*`, `XLA_FLAGS`,
`LIBTPU_INIT_ARGS`). Every variable the engine honors is registered
below with type, default, and purpose; `aphrodite-tpu collect-env`
prints their live values.

Usage mirrors the reference: ``from aphrodite_tpu import envs;
envs.APHRODITE_PALLAS_INTERPRET`` (module attribute access reads the
environment at call time, like the reference's lambda registry).
"""
from __future__ import annotations

import os
from typing import Any, Callable

_bool = lambda v: v == "1"  # noqa: E731

# name -> (parser, default, description)
ENVIRONMENT_VARIABLES: dict[str, tuple[Callable[[str], Any], Any, str]] = {
    # ---- kernels / compile ----------------------------------------------
    "APHRODITE_PALLAS_INTERPRET": (
        _bool, False,
        "Run every Pallas kernel in interpret mode (CPU-executable; used "
        "by the kernel parity tests and for debugging on hosts without a "
        "TPU)."),
    "APHRODITE_QUANT_PALLAS": (
        _bool, None,
        "Force the Pallas dequant-GEMM kernels on (1) or off (0). "
        "Unset: the measured per-format defaults apply "
        "(benchmarks/quant_microbench_v5e.json — W4A16 packed uses "
        "Pallas on TPU, W8A16 uses XLA)."),
    "APHRODITE_DISABLE_COMPILE_CACHE": (
        _bool, False,
        "Disable the persistent XLA compilation cache (worker.py; keyed "
        "by a host CPU-feature fingerprint)."),
    "APHRODITE_COMPILE_CACHE_DIR": (
        str, "~/.cache/aphrodite_tpu/xla-<host-fingerprint>",
        "Override the persistent compile-cache directory."),
    # ---- multi-host -----------------------------------------------------
    "APHRODITE_COORDINATOR": (
        str, None,
        "host:port of process 0 for jax.distributed.initialize "
        "(parallel/launcher.py)."),
    "APHRODITE_NUM_PROCESSES": (
        int, None, "Total engine processes in the multi-host job."),
    "APHRODITE_PROCESS_ID": (
        int, None, "This process's rank in the multi-host job."),
    "APHRODITE_CP_PEERS": (
        str, "",
        "Host 0: comma-separated peer PULL addresses for the per-step "
        "control plane (parallel/control_plane.py)."),
    "APHRODITE_CP_BIND": (
        str, None,
        "Peer hosts: the ZMQ PULL bind address for host 0's step "
        "stream (`aphrodite-tpu follower --bind ...` overrides)."),
    "APHRODITE_DP_RANK": (
        int, 0,
        "Exported to each data-parallel engine replica so launchers can "
        "pin per-rank accelerators (engine/core_proc.py "
        "DPEngineCoreClient)."),
    # ---- misc -----------------------------------------------------------
    "APHRODITE_TPU_PLUGINS": (
        str, "",
        "Comma-separated allowlist of general plugins to load; empty = "
        "all installed entry points (plugins.py)."),
    "APHRODITE_TPU_NO_USAGE_STATS": (
        _bool, False, "Opt out of local usage-stats recording (usage.py)."),
    "APHRODITE_TPU_CONFIG_HOME": (
        str, "~/.config/aphrodite_tpu", "Config/usage-stats directory."),
    "APHRODITE_TPU_LOG_LEVEL": (
        str, "INFO", "Engine logger level (utils.py)."),
}


def __getattr__(name: str):
    if name in ENVIRONMENT_VARIABLES:
        parser, default, _ = ENVIRONMENT_VARIABLES[name]
        raw = os.environ.get(name)
        if raw is None:
            return default
        try:
            return parser(raw)
        except (TypeError, ValueError):
            return default
    raise AttributeError(name)


def environment_report() -> list[str]:
    """`collect-env` lines: every registered var with its live value."""
    out = []
    for name, (_, default, _desc) in sorted(
            ENVIRONMENT_VARIABLES.items()):
        raw = os.environ.get(name)
        state = f"= {raw!r}" if raw is not None else f"(default {default!r})"
        out.append(f"{name} {state}")
    return out
