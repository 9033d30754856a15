"""Pack per-step host metadata into ONE device transfer.

Through the tunneled TPU runtime every host->device transfer carries a
fixed ~1-6 ms RPC cost regardless of size (benchmarks/microbench.py h2d
probe). A serving step ships ~50 small arrays (AttentionMetadata ~10,
SamplingMetadata ~38, work items ~7), so the transfers dominate the step
wall time. This module bit-packs every int32/uint32/float32/bool metadata
array into one flat int32 buffer on the host (numpy concatenation is tens
of microseconds) and unpacks with static slices in-graph.

The layout (name -> offset/shape/dtype) is a static jit argument derived
from the shape buckets, so one program per bucket — exactly the existing
compile-cache granularity. The reference has no analog (CUDA transfers are
sub-microsecond); this is TPU-tunnel-native design.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

_DTYPES = {"i": np.int32, "u": np.uint32, "f": np.float32, "b": np.bool_}


def pack_meta(fields: dict[str, np.ndarray]
              ) -> tuple[np.ndarray, tuple]:
    """fields: ordered {name: np array of i32/u32/f32/bool}. Returns
    (flat int32 buffer, layout). The layout is hashable/static:
    ((name, offset, shape, dtype_code), ...)."""
    layout = []
    parts = []
    off = 0
    for name, arr in fields.items():
        arr = np.ascontiguousarray(arr)
        if arr.dtype == np.bool_:
            code, flat = "b", arr.astype(np.int32).ravel()
        elif arr.dtype == np.uint32:
            code, flat = "u", arr.view(np.int32).ravel()
        elif arr.dtype == np.float32:
            code, flat = "f", arr.view(np.int32).ravel()
        else:
            assert arr.dtype == np.int32, (name, arr.dtype)
            code, flat = "i", arr.ravel()
        layout.append((name, off, arr.shape, code))
        parts.append(flat)
        off += flat.size
    return np.concatenate(parts), tuple(layout)


def unpack_meta(flat: jax.Array, layout: tuple) -> dict[str, jax.Array]:
    """In-graph unpack: static slices + bitcasts (all free at runtime —
    XLA folds them into the consumers)."""
    out: dict[str, Any] = {}
    for name, off, shape, code in layout:
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        piece = jax.lax.slice(flat, (off,), (off + n,))
        if code == "u":
            piece = jax.lax.bitcast_convert_type(piece, jnp.uint32)
        elif code == "f":
            piece = jax.lax.bitcast_convert_type(piece, jnp.float32)
        elif code == "b":
            piece = piece.astype(jnp.bool_)
        out[name] = piece.reshape(shape)
    return out
