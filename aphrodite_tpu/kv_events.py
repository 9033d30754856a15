"""KV cache event publishing for external prefix-cache-aware routers.

Parity: aphrodite/distributed/kv_events.py:82 (ZmqEventPublisher) — a ZMQ
PUB socket emits BlockStored / BlockRemoved / AllBlocksCleared batches so a
fleet router can steer prefix-sharing requests to the replica that already
holds the pages.
"""
from __future__ import annotations

import json
import time
from typing import Optional

from aphrodite_tpu.utils import logger


class KVEventPublisher:

    TOPIC = b"kv-events"

    def __init__(self, endpoint: str = "tcp://*:5557") -> None:
        import zmq
        self.ctx = zmq.Context.instance()
        self.sock = self.ctx.socket(zmq.PUB)
        self.sock.bind(endpoint)
        self.endpoint = endpoint
        self._seq = 0
        logger.info("KV event publisher on %s", endpoint)

    def _emit(self, events: list[dict]) -> None:
        self._seq += 1
        payload = {"ts": time.time(), "seq": self._seq, "events": events}
        try:
            self.sock.send_multipart(
                [self.TOPIC, json.dumps(payload).encode()],
                flags=__import__("zmq").NOBLOCK)
        except Exception:
            pass  # no subscribers / full HWM: drop, never block serving

    def blocks_stored(self, block_hashes: list[int],
                      parent_hash: Optional[int] = None,
                      token_ids: Optional[list[int]] = None) -> None:
        self._emit([{"type": "BlockStored",
                     "block_hashes": [int(h) for h in block_hashes],
                     "parent_block_hash": parent_hash}])

    def blocks_removed(self, block_hashes: list[int]) -> None:
        self._emit([{"type": "BlockRemoved",
                     "block_hashes": [int(h) for h in block_hashes]}])

    def all_cleared(self) -> None:
        self._emit([{"type": "AllBlocksCleared"}])

    def close(self) -> None:
        self.sock.close(0)
