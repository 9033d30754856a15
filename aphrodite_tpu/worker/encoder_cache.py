"""Shared (cross-request) encoder-output cache.

Parity: aphrodite/v1/core/encoder_cache_manager.py — the reference budgets
encoder outputs and shares them across requests and scheduler steps. Here
the cache lives in the model runner, keyed by ``MMInputs.content_hash()``
(the same key that feeds KV prefix hashing), holding the projected
embeddings ON DEVICE: the same image in two requests encodes once, and a
preempted-then-resumed request does not re-encode.

Byte-budgeted LRU; entries are only ever whole encoder outputs.
"""
from __future__ import annotations

from collections import OrderedDict
from typing import Any, Optional


class EncoderCache:

    def __init__(self, budget_bytes: int = 512 * 1024 * 1024) -> None:
        self.budget = budget_bytes
        self._entries: OrderedDict[Any, Any] = OrderedDict()
        self._bytes = 0
        self.hits = 0
        self.misses = 0
        self.evictions = 0

    @staticmethod
    def _nbytes(embeds) -> int:
        return getattr(embeds, "nbytes", 0) or 0

    def get(self, key) -> Optional[Any]:
        if key is None:
            return None
        e = self._entries.get(key)
        if e is None:
            self.misses += 1
            return None
        self._entries.move_to_end(key)
        self.hits += 1
        return e

    def put(self, key, embeds) -> None:
        if key is None:
            return
        n = self._nbytes(embeds)
        if n > self.budget:
            return  # larger than the whole budget: never cacheable
        old = self._entries.pop(key, None)
        if old is not None:
            self._bytes -= self._nbytes(old)
        while self._bytes + n > self.budget and self._entries:
            _, victim = self._entries.popitem(last=False)
            self._bytes -= self._nbytes(victim)
            self.evictions += 1
        self._entries[key] = embeds
        self._bytes += n

    @property
    def num_entries(self) -> int:
        return len(self._entries)

    @property
    def used_bytes(self) -> int:
        return self._bytes

    def stats_dict(self) -> dict:
        return {"hits": self.hits, "misses": self.misses,
                "evictions": self.evictions, "entries": self.num_entries,
                "bytes": self._bytes}
