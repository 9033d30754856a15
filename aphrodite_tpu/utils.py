"""Small shared utilities (shape math, bucketing, logging).

The bucketing helpers mirror the reference's TPU runner padding policy
(reference: aphrodite/v1/worker/tpu_model_runner.py:50-90) — every jitted
program shape must come from a small static set so XLA never recompiles at
serving time.
"""
from __future__ import annotations

import logging
import os
import time
from typing import Iterable, Sequence

logger = logging.getLogger("aphrodite_tpu")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(
        logging.Formatter("%(levelname)s %(asctime)s [%(name)s] %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(os.environ.get("APHRODITE_TPU_LOG_LEVEL", "INFO"))


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def next_power_of_2(x: int) -> int:
    if x <= 1:
        return 1
    return 1 << (x - 1).bit_length()


def pad_to_bucket(x: int, min_bucket: int, max_bucket: int) -> int:
    """Pad ``x`` up to the nearest power-of-two bucket in [min, max].

    This is the shape-bucketing policy for jitted program shapes: number of
    scheduled tokens, number of requests, and pages-per-request each get padded
    so the compiled-program count stays logarithmic in the range.
    """
    if x > max_bucket:
        raise ValueError(f"{x} exceeds max bucket {max_bucket}")
    return min(max_bucket, max(min_bucket, next_power_of_2(x)))


def bucket_schedule(min_bucket: int, max_bucket: int,
                    fine_above: int = 1024, fine_step: int = 512
                    ) -> list[int]:
    """Bucket ladder: powers of two up to ``fine_above``, then fixed
    ``fine_step`` increments. Pow2 jumps near the top waste up to 2x compute
    on full prefill steps; the fine region caps waste at ~fine_step/max."""
    out = []
    b = min_bucket
    while b < min(max_bucket, fine_above):
        out.append(b)
        b *= 2
    while b < max_bucket:
        out.append(b)
        b += fine_step
    out.append(max_bucket)
    return sorted(set(out))


def pick_bucket(buckets: list[int], x: int) -> int:
    """Smallest bucket >= x."""
    import bisect
    i = bisect.bisect_left(buckets, x)
    if i == len(buckets):
        raise ValueError(f"{x} exceeds max bucket {buckets[-1]}")
    return buckets[i]


class Counter:
    """Monotonic id generator."""

    def __init__(self) -> None:
        self._v = 0

    def __next__(self) -> int:
        v = self._v
        self._v += 1
        return v

    def reset(self) -> None:
        self._v = 0


class StopWatch:
    """Context-manager wall-clock timer."""

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.start
        return False


def flatten_2d(items: Iterable[Sequence]) -> list:
    return [x for row in items for x in row]


_STR_DTYPE_TO_JAX = None


def jax_dtype(name):
    """Map a dtype string to a jax dtype (lazy import keeps this module light)."""
    import jax.numpy as jnp
    global _STR_DTYPE_TO_JAX
    if _STR_DTYPE_TO_JAX is None:
        _STR_DTYPE_TO_JAX = {
            "float32": jnp.float32,
            "float16": jnp.float16,
            "bfloat16": jnp.bfloat16,
            "float8_e4m3": jnp.float8_e4m3fn,
            "float8_e4m3fn": jnp.float8_e4m3fn,
            "float8_e5m2": jnp.float8_e5m2,
            "int8": jnp.int8,
            "int32": jnp.int32,
            "auto": jnp.bfloat16,
            "half": jnp.float16,
            "float": jnp.float32,
        }
    if not isinstance(name, str):
        return name
    try:
        return _STR_DTYPE_TO_JAX[name]
    except KeyError:
        raise ValueError(f"unknown dtype {name!r}") from None


class PerRequestError(Exception):
    """An error attributable to ONE request discovered inside the engine
    (after admission validation) — e.g. a multimodal payload that fails in
    the encoder. The engine core catches this, aborts just that request,
    and keeps serving the batch (reference:
    aphrodite/engine/aphrodite_engine.py:1430 per-request input-error
    isolation)."""

    def __init__(self, req_id: str, msg: str) -> None:
        super().__init__(msg)
        self.req_id = req_id
