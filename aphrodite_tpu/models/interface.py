"""Model interface: pure-functional causal LMs.

Unlike the reference's stateful nn.Modules (aphrodite/modeling/models/), a
model here is a *description*: it builds a parameter pytree (from a checkpoint
or randomly), exposes a jit-able ``apply(params, input_ids, kv_cache, md)``,
and declares sharding specs for every parameter leaf. The worker owns the
arrays; the model owns none.
"""
from __future__ import annotations

from typing import Any, Iterable, Optional, Protocol, runtime_checkable

import jax
import numpy as np

from aphrodite_tpu.attention.metadata import AttentionMetadata

Params = dict  # nested dict of jax.Array / np.ndarray / quant-weight dicts


@runtime_checkable
class CausalLM(Protocol):
    """Protocol all decoder models implement."""

    # KV geometry (already divided by TP where applicable is NOT done here —
    # these are global/logical counts; sharding divides them).
    num_kv_heads: int
    head_dim: int
    num_layers: int

    def init_dummy_params(self, rng: jax.Array) -> Params: ...

    def load_weights(self, weights: Iterable[tuple[str, np.ndarray]]) -> Params: ...

    def apply(self, params: Params, input_ids: jax.Array,
              kv_cache: jax.Array, md: AttentionMetadata
              ) -> tuple[jax.Array, jax.Array]:
        """Returns (hidden_states [T, H], updated kv_cache)."""
        ...

    def compute_logits(self, params: Params, hidden: jax.Array) -> jax.Array:
        """hidden [R, H] -> logits [R, V] (float32)."""
        ...

    def param_specs(self) -> Any:
        """Pytree of jax.sharding.PartitionSpec congruent with params."""
        ...
