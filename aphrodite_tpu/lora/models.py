"""Multi-LoRA serving.

Parity: aphrodite/lora/ (LoRAModelManager lora/models.py:336, punica batched
apply, runtime add/remove via executor RPCs). TPU-native design: adapters
live in fixed device-resident slot-stacked tensors

    lora_A_<key>: [L, S, in, r]      lora_B_<key>: [L, S, r, out]

(slot 0 = identity/no-adapter, all zeros; alpha/r scaling folded into B at
load). Per-token adapter slots ride in AttentionMetadata; application is a
scan over the S slots with masked accumulation — the TPU replacement for the
reference's Triton BGMV/SGMV kernels (r and S are small, so the extra
masked FLOPs are negligible against the base GEMM).
"""
from __future__ import annotations

import json
import os
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aphrodite_tpu.utils import logger

# Stackable target keys (llama-family naming).
TARGET_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")
_HF_TO_KEY = {
    "q_proj": "wq", "k_proj": "wk", "v_proj": "wv", "o_proj": "wo",
    "gate_proj": "w_gate", "up_proj": "w_up", "down_proj": "w_down",
}


def lora_apply(x: jax.Array, A: jax.Array, B: jax.Array,
               slots: jax.Array) -> jax.Array:
    """x [T, in]; A [S, in, r]; B [S, r, out]; slots [T] -> delta [T, out].
    Slot 0 is all-zero (no adapter)."""
    def body(acc, xs):
        A_s, B_s, s = xs
        u = jnp.dot(jnp.dot(x, A_s, preferred_element_type=jnp.float32)
                    .astype(x.dtype), B_s,
                    preferred_element_type=jnp.float32).astype(x.dtype)
        mask = (slots == s)[:, None]
        return acc + jnp.where(mask, u, 0), None

    S = A.shape[0]
    acc0 = jnp.zeros((x.shape[0], B.shape[-1]), x.dtype)
    acc, _ = jax.lax.scan(body, acc0,
                          (A, B, jnp.arange(S, dtype=jnp.int32)))
    return acc


class LoRAManager:
    """Owns the slot-stacked adapter tensors and the name<->slot table."""

    def __init__(self, model, max_loras: int, max_rank: int,
                 dtype=jnp.bfloat16) -> None:
        self.model = model
        self.max_loras = max_loras
        self.max_rank = max_rank
        self.dtype = dtype
        # name -> slot (1-based; slot 0 = no adapter).
        self.slots: dict[str, int] = {}
        shapes = model._layer_shapes()
        L = model.num_layers
        S = max_loras + 1
        self.tensors: dict[str, jax.Array] = {}
        for key in TARGET_KEYS:
            if key not in shapes:
                continue
            _, k_in, k_out = shapes[key]
            # Layer-major so the tensors ride the model's scan over layers.
            self.tensors[f"lora_A_{key}"] = jnp.zeros(
                (L, S, k_in, max_rank), dtype)
            self.tensors[f"lora_B_{key}"] = jnp.zeros(
                (L, S, max_rank, k_out), dtype)

    # -------------------------------------------------------------------- api
    def list_loras(self) -> list[str]:
        return sorted(self.slots)

    def slot_of(self, name: Optional[str]) -> int:
        if name is None:
            return 0
        if name not in self.slots:
            raise ValueError(f"LoRA adapter {name!r} is not loaded")
        return self.slots[name]

    def add_lora(self, name: str, path: str) -> int:
        if name in self.slots:
            return self.slots[name]
        used = set(self.slots.values())
        free = [s for s in range(1, self.max_loras + 1) if s not in used]
        if not free:
            raise ValueError(f"no free LoRA slots (max_loras="
                             f"{self.max_loras})")
        slot = free[0]
        self._load_into_slot(slot, path)
        self.slots[name] = slot
        logger.info("loaded LoRA %r into slot %d from %s", name, slot, path)
        return slot

    def remove_lora(self, name: str) -> bool:
        slot = self.slots.pop(name, None)
        if slot is None:
            return False
        # Zero the slot so stale weights can't leak.
        for key, t in self.tensors.items():
            self.tensors[key] = t.at[:, slot].set(0)
        return True

    # ----------------------------------------------------------------- loading
    def _load_into_slot(self, slot: int, path: str) -> None:
        cfg_path = os.path.join(path, "adapter_config.json")
        with open(cfg_path) as f:
            cfg = json.load(f)
        rank = cfg.get("r", 8)
        alpha = cfg.get("lora_alpha", rank)
        scaling = alpha / rank
        if rank > self.max_rank:
            raise ValueError(f"adapter rank {rank} > max_lora_rank "
                             f"{self.max_rank}")
        tensors = _read_adapter_tensors(path)
        L = self.model.num_layers
        staged: dict[str, np.ndarray] = {}
        for name, w in tensors.items():
            parsed = _parse_lora_name(name)
            if parsed is None:
                continue
            li, key, which = parsed
            tkey = f"lora_{which}_{key}"
            if tkey not in self.tensors:
                continue
            buf = staged.get(tkey)
            if buf is None:
                full = self.tensors[tkey].shape
                buf = np.zeros((full[0],) + full[2:], np.float32)
                staged[tkey] = buf
            if which == "A":   # checkpoint [r, in] -> [in, r]
                buf[li, :, :w.shape[0]] = w.T
            else:              # checkpoint [out, r] -> [r, out], scaled
                buf[li, :w.shape[1], :] = w.T * scaling
        for tkey, buf in staged.items():
            self.tensors[tkey] = self.tensors[tkey].at[:, slot].set(
                jnp.asarray(buf, self.dtype))


def _read_adapter_tensors(path: str) -> dict[str, np.ndarray]:
    st = os.path.join(path, "adapter_model.safetensors")
    if os.path.exists(st):
        from safetensors import safe_open
        out = {}
        with safe_open(st, framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    bin_path = os.path.join(path, "adapter_model.bin")
    import torch
    state = torch.load(bin_path, map_location="cpu", weights_only=True)
    return {k: v.float().numpy() for k, v in state.items()}


def _parse_lora_name(name: str) -> Optional[tuple[int, str, str]]:
    """'base_model.model.model.layers.3.self_attn.q_proj.lora_A.weight'
    -> (3, 'wq', 'A')."""
    parts = name.split(".")
    try:
        li = int(parts[parts.index("layers") + 1])
    except (ValueError, IndexError):
        return None
    proj = None
    for p in parts:
        if p in _HF_TO_KEY:
            proj = _HF_TO_KEY[p]
    which = None
    for p in parts:
        if p in ("lora_A", "lora_B"):
            which = p[-1]
    if proj is None or which is None:
        return None
    return li, proj, which
