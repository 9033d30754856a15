"""ctypes binding for the C host-op kernels (csrc/hostops.c).

Compiled lazily with the system C compiler into a source-hash-keyed cache
(so editing the .c file rebuilds); every caller falls back to the NumPy
implementation when no compiler is available, keeping the engine fully
functional in compilerless environments.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

from aphrodite_tpu.utils import logger

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "csrc", "hostops.c")
_lib: Optional[ctypes.CDLL] = None
_tried = False

_I32P = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")


def _build() -> Optional[ctypes.CDLL]:
    try:
        with open(_SRC, "rb") as f:
            src = f.read()
    except OSError:
        return None
    key = hashlib.sha256(src).hexdigest()[:16]
    cache = os.path.join(tempfile.gettempdir(),
                         f"aphrodite_tpu_hostops_{os.getuid()}")
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, f"libhostops_{key}.so")
    if not os.path.exists(so):
        cc = os.environ.get("CC", "cc")
        tmp = so + f".{os.getpid()}.tmp"
        try:
            subprocess.run([cc, "-O3", "-shared", "-fPIC", _SRC, "-o", tmp],
                           check=True, capture_output=True, timeout=60)
            os.replace(tmp, so)
        except Exception as e:
            logger.info("hostops C build unavailable (%s); using NumPy "
                        "fallbacks", e)
            return None
    lib = ctypes.CDLL(so)
    lib.fill_slots.argtypes = [_I32P, ctypes.c_int64, ctypes.c_int64,
                               ctypes.c_int64, _I32P, ctypes.c_int64]
    lib.fill_slots.restype = None
    lib.build_work_items.argtypes = [_I32P, _I32P, _I32P, ctypes.c_int64,
                                     ctypes.c_int64, _I32P, _I32P, _I32P,
                                     _I32P, _I32P, _I32P]
    lib.build_work_items.restype = ctypes.c_int64
    lib.ngram_propose.argtypes = [_I32P, ctypes.c_int64, ctypes.c_int64,
                                  ctypes.c_int64, ctypes.c_int64, _I32P]
    lib.ngram_propose.restype = ctypes.c_int64
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if not _tried:
        _tried = True
        _lib = _build()
        if _lib is not None:
            logger.info("hostops: native C host kernels loaded")
    return _lib


# ------------------------------------------------------------- public ops --
def fill_slots(slots: np.ndarray, t0: int, start: int, n: int,
               block_ids: np.ndarray, block_size: int) -> None:
    """slots[t0:t0+n] = page(start+i)*bs + offset(start+i)."""
    lib = get_lib()
    if lib is not None and n > 0:
        lib.fill_slots(slots, t0, start, n,
                       np.ascontiguousarray(block_ids, np.int32),
                       block_size)
        return
    p = np.arange(start, start + n)
    slots[t0:t0 + n] = (np.asarray(block_ids, np.int64)[p // block_size]
                        * block_size + p % block_size)


def ngram_propose(token_ids: np.ndarray, min_n: int, max_n: int,
                  k: int) -> list[int]:
    lib = get_lib()
    if lib is None:
        return None  # caller uses its own fallback
    arr = np.ascontiguousarray(token_ids, np.int32)
    out = np.empty((k,), np.int32)
    cnt = lib.ngram_propose(arr, len(arr), min_n, max_n, k, out)
    return [int(t) for t in out[:cnt]]
