"""Attention metadata: the per-step device arrays describing the ragged batch.

This is the TPU analog of the reference's per-backend AttentionMetadata
(reference: aphrodite/v1/attention/backends/pallas.py:70-110) — one metadata
bundle serves mixed prefill+decode in a single kernel call. All shapes are
padded to static buckets before jit; validity is encoded in the data
(slot_mapping == -1 for pad tokens, seq_lens == 0 for pad requests).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class AttentionMetadata:
    # [T] int32: request index that each scheduled token belongs to (pad: 0,
    # masked out via slot_mapping/query mask).
    token_req_idx: jax.Array
    # [T] int32: absolute context position of each scheduled token (pad: 0).
    token_pos: jax.Array
    # [T] int32: flat KV slot (block * block_size + offset) each new token's
    # K/V is written to; -1 for pad tokens (scatter mode="drop").
    slot_mapping: jax.Array
    # [R+1] int32 cumulative count of scheduled tokens per request.
    query_start_loc: jax.Array
    # [R] int32 total context length (computed + newly scheduled) per request.
    seq_lens: jax.Array
    # [R, MAX_PAGES] int32 physical page ids per request.
    block_tables: jax.Array
    # [] int32 number of live (non-pad) requests.
    num_reqs: jax.Array
    # [] int32 number of live (non-pad) tokens.
    num_tokens: jax.Array
