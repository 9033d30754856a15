"""Attention metadata: the per-step device arrays describing the ragged batch.

This is the TPU analog of the reference's per-backend AttentionMetadata
(reference: aphrodite/v1/attention/backends/pallas.py:70-110) — one metadata
bundle serves mixed prefill+decode in a single kernel call. All shapes are
padded to static buckets before jit; validity is encoded in the data
(slot_mapping == -1 for pad tokens, seq_lens == 0 for pad requests).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import numpy as np


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

    # ---- Pallas-kernel work items (see ops/ragged_paged_attention.py). ----
    # Host-prescheduled fixed-size q blocks: [max_items] each.
    item_req: Optional[jax.Array] = None
    item_qstart: Optional[jax.Array] = None
    item_qlen: Optional[jax.Array] = None
    item_pos: Optional[jax.Array] = None
    num_items_arr: Optional[jax.Array] = None  # [1] int32
    # Token -> (item, row-in-item) for re-gathering kernel output: [T].
    token_item: Optional[jax.Array] = None
    token_item_row: Optional[jax.Array] = None
    # Static q-block size the work items were scheduled with.
    block_q: Optional[int] = field(default=None,
                                   metadata=dict(static=True))
    # Per-token LoRA adapter slot ([T] int32; 0 = no adapter). Present only
    # when LoRA serving is enabled.
    lora_slots: Optional[jax.Array] = None
    # Pure-decode step (one token per request, token i belongs to request i):
    # routes to the decode-specialized kernel; metadata may be built in-graph.
    decode_mode: bool = field(default=False, metadata=dict(static=True))
    # ---- multi-step window decode (ops/window_decode_attention.py). ----
    # [] int32 step index within the window; paged_lens [R] int32 = tokens
    # frozen in the paged cache at window entry. Set only by the runner's
    # window multi-step path.
    window_step: Optional[jax.Array] = None
    paged_lens: Optional[jax.Array] = None
    # ---- bidirectional multimodal spans (Gemma-3 MM). ----
    # [R, M, 2] int32 (start, end) absolute prompt positions of image-token
    # runs; tokens whose positions both fall in ANY span of their request
    # attend bidirectionally (reference gemma3_mm.py:679-685). (-1, -1)
    # pads. None for ordinary causal models.
    mm_bidir_spans: Optional[jax.Array] = None
    # ---- mrope (Qwen2-VL family): 3-channel rotary positions. ----
    # [3, T] int32 (temporal, height, width) position per token; None for
    # models without mrope. Decode tokens carry pos+delta in all 3 rows.
    mrope_pos: Optional[jax.Array] = None
    # [R] int32 per-request decode-position delta (max prompt mrope + 1 -
    # prompt_len); used by the in-graph multi-step scan to rebuild
    # mrope_pos from advancing token_pos.
    mrope_deltas: Optional[jax.Array] = None
    # ---- SSM (Mamba) state routing. ----
    # [R] int32: recurrent-state slot per request (models/mamba.py).
    state_slots: Optional[jax.Array] = None
    # [R] int32: flat-layout index of each request's first scheduled token
    # (segments have alignment gaps, so this is not query_start_loc[:-1]).
    seg_starts: Optional[jax.Array] = None
    # ---- pipeline-parallel per-microbatch Pallas work items ([M, ...]
    # stacks built by runner.build_pp_work_items; the pipeline slices the
    # active microbatch's row in-graph so attention inside the pp
    # shard_map takes the Pallas kernel instead of the XLA oracle). ----
    pp_item_req: Optional[jax.Array] = None
    pp_item_qstart: Optional[jax.Array] = None
    pp_item_qlen: Optional[jax.Array] = None
    pp_item_pos: Optional[jax.Array] = None
    pp_num_items: Optional[jax.Array] = None       # [M, 1]
    pp_token_item: Optional[jax.Array] = None
    pp_token_item_row: Optional[jax.Array] = None
    # ---- cascade / shared-prefix attention (ops/cascade_attention.py).
    # [n] physical page ids every request in the batch shares as its KV
    # prefix + the token count they cover; None = no cascade this step.
    shared_pages: Optional[jax.Array] = None
    shared_len: Optional[jax.Array] = None
    # ---- page-granular KV write staging (attention/backend.py
    # write_kv_staged): [J] physical page ids (unused slots get distinct
    # out-of-range ids) + [J, page_size] flat token index per page row
    # (-1 = keep old). Built host-side (runner build_kv_stage).
    stage_pages: Optional[jax.Array] = None
    stage_src: Optional[jax.Array] = None


# Flat-layout alignment of each request's q segment. The Pallas kernel's
# q-block DMA offset is qstart*group; Mosaic requires dynamic sublane indices
# to be 8-aligned, and qstart % 8 == 0 guarantees that for any group size.
Q_SEGMENT_ALIGN = 8


def build_kv_stage(slots: np.ndarray, T_pad: int, R_pad: int,
                   page_size: int, num_pages: int
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Host schedule for write_kv_staged: which physical pages this step
    touches and which flat token fills each page row. Unused staging slots
    get DISTINCT out-of-range page ids (num_pages + j) so the in-graph
    scatter can promise unique_indices."""
    J = T_pad // page_size + R_pad
    stage_pages = (num_pages + np.arange(J, dtype=np.int32)).astype(np.int32)
    stage_src = np.full((J, page_size), -1, np.int32)
    valid = np.nonzero(slots >= 0)[0].astype(np.int32)
    if len(valid):
        pages = slots[valid] // page_size
        offs = slots[valid] % page_size
        upages, inv = np.unique(pages, return_inverse=True)
        stage_pages[:len(upages)] = upages
        stage_src[inv, offs] = valid
    return stage_pages, stage_src


def build_pp_work_items(seg_starts: np.ndarray, seg_counts: np.ndarray,
                        pos0s: np.ndarray, num_reqs: int, T_pad: int,
                        num_microbatches: int, block_q: int,
                        num_reqs_pad: int) -> dict[str, np.ndarray]:
    """Per-microbatch Pallas work items for the pipeline: microbatch m
    covers flat tokens [m*Tm, (m+1)*Tm); each request's intersection with
    that window becomes q blocks with MICROBATCH-RELATIVE qstart (the
    pipeline's q buffer is the Tm-token slice) and absolute context
    positions. Boundary-crossing segments split at the window edge
    (relative qstart 0 and Tm%8==0 keep Mosaic's 8-alignment).
    pos0s[r]: context position of request r's FIRST scheduled token."""
    M = num_microbatches
    Tm = T_pad // M
    max_items = Tm // block_q + num_reqs_pad
    item_req = np.zeros((M, max_items), np.int32)
    item_qstart = np.zeros((M, max_items), np.int32)
    item_qlen = np.zeros((M, max_items), np.int32)
    item_pos = np.zeros((M, max_items), np.int32)
    num_items = np.zeros((M, 1), np.int32)
    token_item = np.zeros((M, Tm), np.int32)
    token_row = np.zeros((M, Tm), np.int32)
    for m in range(M):
        lo, hi = m * Tm, (m + 1) * Tm
        n = 0
        for r in range(num_reqs):
            qs_abs = int(seg_starts[r])
            qe_abs = qs_abs + int(seg_counts[r])
            a, b = max(qs_abs, lo), min(qe_abs, hi)
            if a >= b:
                continue
            off = 0
            while a + off < b:
                qlen = min(block_q, b - a - off)
                rel = a - lo + off
                item_req[m, n] = r
                item_qstart[m, n] = rel
                item_qlen[m, n] = qlen
                item_pos[m, n] = int(pos0s[r]) + (a - qs_abs) + off
                token_item[m, rel:rel + qlen] = n
                token_row[m, rel:rel + qlen] = np.arange(qlen)
                off += qlen
                n += 1
        num_items[m, 0] = n
    return {
        "pp_item_req": item_req,
        "pp_item_qstart": item_qstart,
        "pp_item_qlen": item_qlen,
        "pp_item_pos": item_pos,
        "pp_num_items": num_items,
        "pp_token_item": token_item,
        "pp_token_item_row": token_row,
    }


def build_work_items(seg_starts: np.ndarray, seg_counts: np.ndarray,
                     seq_lens: np.ndarray,
                     num_reqs: int, num_tokens_pad: int, block_q: int,
                     num_reqs_pad: int
                     ) -> dict[str, np.ndarray]:
    """Host-side schedule of fixed-size q blocks for the Pallas kernel.
    seg_starts[r] / seg_counts[r]: where request r's scheduled tokens live in
    the flat token layout. max_items is static per (T, R) bucket: T/block_q
    full blocks plus at most one partial block per request."""
    max_items = num_tokens_pad // block_q + num_reqs_pad
    item_req = np.zeros((max_items,), np.int32)
    item_qstart = np.zeros((max_items,), np.int32)
    item_qlen = np.zeros((max_items,), np.int32)
    item_pos = np.zeros((max_items,), np.int32)
    token_item = np.zeros((num_tokens_pad,), np.int32)
    token_row = np.zeros((num_tokens_pad,), np.int32)
    from aphrodite_tpu._native import get_lib
    lib = get_lib()
    if lib is not None:
        n = lib.build_work_items(
            np.ascontiguousarray(seg_starts[:num_reqs], np.int32),
            np.ascontiguousarray(seg_counts[:num_reqs], np.int32),
            np.ascontiguousarray(seq_lens[:num_reqs], np.int32),
            num_reqs, block_q, item_req, item_qstart, item_qlen,
            item_pos, token_item, token_row)
        return {
            "item_req": item_req,
            "item_qstart": item_qstart,
            "item_qlen": item_qlen,
            "item_pos": item_pos,
            "num_items_arr": np.array([n], np.int32),
            "token_item": token_item,
            "token_item_row": token_row,
        }
    n = 0
    for r in range(num_reqs):
        qs = int(seg_starts[r])
        qe = qs + int(seg_counts[r])
        pos0 = int(seq_lens[r]) - (qe - qs)
        off = 0
        while qs + off < qe:
            qlen = min(block_q, qe - qs - off)
            item_req[n] = r
            item_qstart[n] = qs + off
            item_qlen[n] = qlen
            item_pos[n] = pos0 + off
            token_item[qs + off:qs + off + qlen] = n
            token_row[qs + off:qs + off + qlen] = np.arange(qlen)
            off += qlen
            n += 1
    return {
        "item_req": item_req,
        "item_qstart": item_qstart,
        "item_qlen": item_qlen,
        "item_pos": item_pos,
        "num_items_arr": np.array([n], np.int32),
        "token_item": token_item,
        "token_item_row": token_row,
    }
