"""Multi-LoRA serving.

Parity: aphrodite/lora/ (LoRAModelManager lora/models.py:336, punica batched
apply lora/punica_wrapper/punica_base.py:123, LRU adapter cache
lora/models.py:743, runtime add/remove via executor RPCs). TPU-native
design: adapters live in fixed device-resident slot-stacked tensors

    lora_A_<key>: [L, S, in, r]      lora_B_<key>: [L, S, r, out]

(slot 0 = identity/no-adapter, all zeros; alpha/r scaling folded into B at
load). Per-token adapter slots ride in AttentionMetadata. Application is
token-grouped: tokens sort by adapter slot and the A/B projections run as
ragged group GEMMs (the same sorted-token scheme as the MoE grouped GEMM
— the TPU replacement for the reference's Triton BGMV/SGMV kernels), so
adapter cost follows the tokens actually routed through adapters. Small
batches fall back to the masked slot scan.

Target modules are model-declared (``lora_target_map``): each model class
maps its checkpoint projection names onto its stacked param keys; fused
checkpoint projections (GPT-NeoX ``query_key_value``) split their B onto
the per-projection keys with a shared A. ``embed_tokens``/``lm_head``
adapters live in unstacked [S, ...] tensors applied at the embedding /
logits boundaries.
"""
from __future__ import annotations

import json
import os
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from aphrodite_tpu.utils import logger

# Default (llama-family) mapping: checkpoint proj name -> param key(s).
DEFAULT_TARGET_MAP = {
    "q_proj": "wq", "k_proj": "wk", "v_proj": "wv", "o_proj": "wo",
    "gate_proj": "w_gate", "up_proj": "w_up", "down_proj": "w_down",
}
# Kept for backward compatibility with existing imports.
TARGET_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")
_HF_TO_KEY = DEFAULT_TARGET_MAP

# Non-layer adapters: checkpoint name -> (A shape kind, B shape kind).
EMBED_KEY = "embed"
HEAD_KEY = "lm_head"


def lora_apply(x: jax.Array, A: jax.Array, B: jax.Array,
               slots: jax.Array) -> jax.Array:
    """x [T, in]; A [S, in, r]; B [S, r, out]; slots [T] -> delta [T, out].
    Slot 0 is all-zero (no adapter).

    Token-grouped path (T >= 64): sort tokens by slot, run both
    projections as ragged group GEMMs over the slot-stacked weights, and
    unsort — work follows the tokens routed through each adapter (the
    reference's SGMV shape). Tiny batches keep the masked slot scan."""
    S = A.shape[0]
    T = x.shape[0]
    if T >= 64 and S > 1:
        order = jnp.argsort(slots, stable=True)
        xs = jnp.take(x, order, axis=0)
        sizes = jnp.bincount(slots, length=S).astype(jnp.int32)
        u = jax.lax.ragged_dot(
            xs, A, sizes, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        y = jax.lax.ragged_dot(
            u, B, sizes, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        inv = jnp.zeros_like(order).at[order].set(
            jnp.arange(T, dtype=order.dtype))
        return jnp.take(y, inv, axis=0)

    def body(acc, xs2):
        A_s, B_s, s = xs2
        u = jnp.dot(jnp.dot(x, A_s, preferred_element_type=jnp.float32)
                    .astype(x.dtype), B_s,
                    preferred_element_type=jnp.float32).astype(x.dtype)
        mask = (slots == s)[:, None]
        return acc + jnp.where(mask, u, 0), None

    acc0 = jnp.zeros((T, B.shape[-1]), x.dtype)
    acc, _ = jax.lax.scan(body, acc0,
                          (A, B, jnp.arange(S, dtype=jnp.int32)))
    return acc


def lora_embed_delta(input_ids: jax.Array, slots: jax.Array,
                     A: jax.Array, B: jax.Array) -> jax.Array:
    """Embedding adapter: A [S, V, r] gathered per (slot, token) +
    masked-scan B apply -> delta [T, H]."""
    a_rows = A[slots, input_ids]  # [T, r]

    def body(acc, xs):
        B_s, s = xs
        u = jnp.dot(a_rows, B_s,
                    preferred_element_type=jnp.float32).astype(acc.dtype)
        return acc + jnp.where((slots == s)[:, None], u, 0), None

    S = B.shape[0]
    acc0 = jnp.zeros((input_ids.shape[0], B.shape[-1]), B.dtype)
    acc, _ = jax.lax.scan(body, acc0, (B, jnp.arange(S, dtype=jnp.int32)))
    return acc


class LoRAManager:
    """Owns the slot-stacked adapter tensors and the name<->slot table,
    with LRU eviction when all slots are in use (ref lora/models.py:743
    LRUCacheLoRAModelManager)."""

    def __init__(self, model, max_loras: int, max_rank: int,
                 dtype=jnp.bfloat16) -> None:
        self.model = model
        self.max_loras = max_loras
        self.max_rank = max_rank
        self.dtype = dtype
        # name -> slot (1-based; slot 0 = no adapter).
        self.slots: dict[str, int] = {}
        self._tick = 0
        self._last_used: dict[str, int] = {}
        self.target_map = dict(getattr(model, "lora_target_map",
                                       DEFAULT_TARGET_MAP))
        shapes = model._layer_shapes()
        L = model.num_layers
        S = max_loras + 1
        self.tensors: dict[str, jax.Array] = {}
        keys = set()
        for v in self.target_map.values():
            keys.update(v if isinstance(v, (tuple, list)) else (v,))
        for key in sorted(keys):
            if key not in shapes:
                continue
            _, k_in, k_out = shapes[key]
            # Layer-major so the tensors ride the model's scan over layers.
            self.tensors[f"lora_A_{key}"] = jnp.zeros(
                (L, S, k_in, max_rank), dtype)
            self.tensors[f"lora_B_{key}"] = jnp.zeros(
                (L, S, max_rank, k_out), dtype)
        # Embedding / lm_head adapters (unstacked, applied at boundaries).
        V, H = model.vocab_size, model.hidden_size
        self.extra_tensors = {
            f"lora_A_{EMBED_KEY}": jnp.zeros((S, V, max_rank), dtype),
            f"lora_B_{EMBED_KEY}": jnp.zeros((S, max_rank, H), dtype),
            f"lora_A_{HEAD_KEY}": jnp.zeros((S, H, max_rank), dtype),
            f"lora_B_{HEAD_KEY}": jnp.zeros((S, max_rank, V), dtype),
        }
        self.has_embed = False
        self.has_head = False

    @property
    def device_tensors(self) -> dict:
        """Per-layer stacks, plus the boundary adapters only when an
        adapter actually populated them (models split them off before the
        layer scan)."""
        if not (self.has_embed or self.has_head):
            return self.tensors
        out = dict(self.tensors)
        if self.has_embed:
            out["lora_A_embed"] = self.extra_tensors["lora_A_embed"]
            out["lora_B_embed"] = self.extra_tensors["lora_B_embed"]
        if self.has_head:
            out["lora_A_lm_head"] = self.extra_tensors["lora_A_lm_head"]
            out["lora_B_lm_head"] = self.extra_tensors["lora_B_lm_head"]
        return out

    # -------------------------------------------------------------------- api
    def list_loras(self) -> list[str]:
        return sorted(self.slots)

    def slot_of(self, name: Optional[str]) -> int:
        if name is None:
            return 0
        if name not in self.slots:
            raise ValueError(f"LoRA adapter {name!r} is not loaded")
        self._tick += 1
        self._last_used[name] = self._tick
        return self.slots[name]

    def add_lora(self, name: str, path: str) -> int:
        if name in self.slots:
            self._tick += 1
            self._last_used[name] = self._tick
            return self.slots[name]
        used = set(self.slots.values())
        free = [s for s in range(1, self.max_loras + 1) if s not in used]
        if free:
            slot = free[0]
        else:
            # LRU eviction: reuse the slot of the least-recently-used
            # adapter (ref LRUCacheLoRAModelManager).
            victim = min(self.slots, key=lambda n: self._last_used.get(n, 0))
            slot = self.slots.pop(victim)
            self._last_used.pop(victim, None)
            logger.info("evicting LRU LoRA %r from slot %d", victim, slot)
            self._zero_slot(slot)
        self._load_into_slot(slot, path)
        self.slots[name] = slot
        self._tick += 1
        self._last_used[name] = self._tick
        logger.info("loaded LoRA %r into slot %d from %s", name, slot, path)
        return slot

    def remove_lora(self, name: str) -> bool:
        slot = self.slots.pop(name, None)
        self._last_used.pop(name, None)
        if slot is None:
            return False
        self._zero_slot(slot)
        return True

    def _zero_slot(self, slot: int) -> None:
        for key, t in self.tensors.items():
            self.tensors[key] = t.at[:, slot].set(0)
        for key, t in self.extra_tensors.items():
            self.extra_tensors[key] = t.at[slot].set(0)

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

        def stage(tkey, li, w, which, out_slice=None):
            pool = self.tensors if tkey in self.tensors else None
            if pool is None:
                return
            buf = staged.get(tkey)
            if buf is None:
                full = self.tensors[tkey].shape
                buf = np.zeros((full[0],) + full[2:], np.float32)
                staged[tkey] = buf
            if which == "A":   # checkpoint [r, in] -> [in, r]
                buf[li, :, :w.shape[0]] = w.T
            else:              # checkpoint [out, r] -> [r, out], scaled
                tgt = buf[li] if out_slice is None else \
                    buf[li][:, out_slice]
                tgt[:w.shape[1], :] = w.T * scaling

        for name, w in tensors.items():
            parsed = _parse_lora_name(name, self.target_map)
            if parsed is None:
                extra = self._parse_extra(name)
                if extra is not None:
                    ekey, which = extra
                    tkey = f"lora_{which}_{ekey}"
                    t = self.extra_tensors[tkey]
                    buf = np.zeros(t.shape[1:], np.float32)
                    if which == "A":
                        # embed A ships [V, r] or [r, V]? HF embedding
                        # lora_embedding_A is [r, V] -> [V, r]
                        ww = w.T if w.shape[0] <= w.shape[1] else w
                        buf[:ww.shape[0], :ww.shape[1]] = ww
                    else:
                        ww = w.T if w.shape[0] > w.shape[1] else w
                        buf[:ww.shape[0], :ww.shape[1]] = ww * scaling
                    self.extra_tensors[tkey] = t.at[slot].set(
                        jnp.asarray(buf, self.dtype))
                    if ekey == EMBED_KEY:
                        self.has_embed = True
                    else:
                        self.has_head = True
                continue
            li, keys, which = parsed
            if isinstance(keys, str):
                stage(f"lora_{which}_{keys}", li, w, which)
            elif which == "A":
                # Fused checkpoint projection (e.g. query_key_value):
                # shared A on every split key.
                for k2 in keys:
                    stage(f"lora_A_{k2}", li, w, "A")
            elif hasattr(self.model, "lora_split_fused"):
                # Model-declared fused layout (e.g. NeoX per-head
                # interleaving).
                for k2, wb in self.model.lora_split_fused(keys, w).items():
                    stage(f"lora_B_{k2}", li, wb, "B")
            else:
                # Split B evenly across the fused output dim.
                n = w.shape[0] // len(keys)
                for j, k2 in enumerate(keys):
                    stage(f"lora_B_{k2}", li, w[j * n:(j + 1) * n], "B")
        for tkey, buf in staged.items():
            self.tensors[tkey] = self.tensors[tkey].at[:, slot].set(
                jnp.asarray(buf, self.dtype))

    @staticmethod
    def _parse_extra(name: str) -> Optional[tuple[str, str]]:
        if "embed_tokens" in name:
            which = "A" if ("lora_embedding_A" in name or "lora_A" in name) \
                else "B"
            return EMBED_KEY, which
        if "lm_head" in name:
            which = "A" if "lora_A" in name else "B"
            return HEAD_KEY, which
        return None


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


def _parse_lora_name(name: str, target_map=None
                     ) -> Optional[tuple[int, object, str]]:
    """'base_model.model.model.layers.3.self_attn.q_proj.lora_A.weight'
    -> (3, 'wq', 'A'). With a fused mapping entry the second element is
    the tuple of split keys."""
    target_map = target_map or DEFAULT_TARGET_MAP
    parts = name.split(".")
    try:
        li = int(parts[parts.index("layers") + 1])
    except (ValueError, IndexError):
        return None
    proj = None
    for p in parts:
        if p in target_map:
            proj = target_map[p]
    which = None
    for p in parts:
        if p in ("lora_A", "lora_B"):
            which = p[-1]
    if proj is None or which is None:
        return None
    return li, proj, which
