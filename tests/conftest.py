"""Test-wide environment: force CPU backend with 8 virtual devices so
multi-chip sharding logic is exercised without TPU hardware (SURVEY.md §4
"Implication for the rebuild"). Never remove the virtual mesh — TP tests
depend on it.

APHRODITE_TPU_PERF_TEST=1 opts OUT of the CPU forcing so
tests/tpu/test_perf.py can drive the real chip.

Note: a pytest plugin imports jax before this conftest runs, so setting
JAX_PLATFORMS in os.environ alone is too late — use jax.config.update,
which works any time before backend initialization.
"""
import os

if os.environ.get("APHRODITE_TPU_PERF_TEST") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

    import jax

    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu", jax.devices()
    assert jax.device_count() == 8, jax.devices()
