"""Pre-sharded / pre-quantized state save+load (reference:
ShardedStateLoader in modeling/model_loader/loader.py and
executor_base.py:233 save_sharded_state).

Saving dumps the worker's *final* parameter pytree — after checkpoint
repack, on-the-fly quantization, and stacking — so reloading skips all of
that work (the reference's motivation: TP-sharded fast restarts; here the
big win is skipping quantize-on-load). Keys are "/"-joined pytree paths in
one safetensors file per host; dtypes numpy can't express (fp8) ride as
uint8 with the real dtype recorded in the file metadata.
"""
from __future__ import annotations

import json
import os
from typing import Any

import numpy as np

from aphrodite_tpu.utils import logger

_PATTERN = "sharded-rank{rank}.safetensors"
_F8 = {"float8_e4m3fn", "float8_e5m2"}


def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def save_sharded_state(params: Any, path: str, rank: int = 0) -> str:
    from safetensors.numpy import save_file
    os.makedirs(path, exist_ok=True)
    flat = _flatten(params)
    dtypes = {}
    blobs = {}
    for k, v in flat.items():
        v = np.ascontiguousarray(v)
        if v.dtype.name in _F8:
            dtypes[k] = v.dtype.name
            v = v.view(np.uint8)
        blobs[k] = v
    fn = os.path.join(path, _PATTERN.format(rank=rank))
    save_file(blobs, fn, metadata={"dtypes": json.dumps(dtypes)})
    logger.info("saved sharded state (%d tensors) to %s", len(blobs), fn)
    return fn


def load_sharded_state(path: str, rank: int = 0) -> dict:
    import ml_dtypes
    from safetensors import safe_open
    fn = os.path.join(path, _PATTERN.format(rank=rank))
    if not os.path.exists(fn):
        raise FileNotFoundError(
            f"{fn} not found — save with LLM.save_sharded_state() first")
    tree: dict = {}
    with safe_open(fn, framework="np") as sf:
        meta = sf.metadata() or {}
        dtypes = json.loads(meta.get("dtypes", "{}"))
        for key in sf.keys():
            v = sf.get_tensor(key)
            if key in dtypes:
                v = v.view(getattr(ml_dtypes, dtypes[key]))
            node = tree
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = v
    return tree
