"""Disaggregated prefill: KV transfer between engine instances.

Parity: aphrodite/distributed/kv_transfer/ — KVConnectorBase +
SimpleConnector over PyNcclPipe/MooncakePipe with a lookup buffer
(kv_lookup_buffer/simple_buffer.py). The TPU redesign ships KV pages over
ZMQ (the data plane between *hosts* is a network hop either way; the
device<->host copy uses one gather per request) and reuses the prefix
cache as the injection mechanism: a consumer seeds received pages into its
BlockPool as content-hashed cached blocks, after which normal scheduling
treats them as prefix-cache hits — no special-cased request state.

Roles (KVTransferConfig.kv_role):
- "kv_producer": after each request finishes, its full prompt pages are
  pushed into an in-process lookup buffer served over a ZMQ REP socket.
- "kv_consumer": at admission, a ZMQ REQ lookup keyed by the page-aligned
  prompt-token hash chain fetches pages (drop-on-read) and seeds them.

Trust model: the wire format is sha256 keys and a JSON header + raw
tensor bytes — NO pickle crosses the network (a pickling peer would be
arbitrary-code-execution), payloads are length-capped
(max_payload_bytes), and the service only exists when kv_role is
explicitly configured. The endpoint still carries model activations
unauthenticated and unencrypted: deploy it on a trusted network segment
(the reference's NCCL/Mooncake pipes assume the same).

EXPLICITLY DROPPED (drop-ledger, quantization/__init__.py style): the
reference's pluggable connector zoo (KVConnectorBase subclasses —
PyNcclConnector, MooncakeConnector, LMCacheConnector,
MooncakeStoreConnector, kv_connector/base.py:24). Rationale: every one
of them exists to pick a GPU-side transport (NCCL p2p, RDMA libraries,
a CUDA-aware cache service) — none of which exist on TPU, where the
only way off the chip is host DMA and then the host NIC. Once the data
plane is host-to-host bytes, one length-prefixed ZMQ pipe IS the
transport-general design; a connector interface would abstract over a
single implementation. The extension point that matters — WHERE pages
are injected — is the prefix cache (seed_pages), which any future
transport can call; an external cache service (LMCache-style) would
implement the same lookup-buffer REQ/REP protocol out of process.
"""
from __future__ import annotations

import hashlib
import json
import struct
import threading
from collections import OrderedDict
from dataclasses import dataclass
from typing import Optional

import numpy as np

_MAGIC = b"KVX1"
# transport views: 1- and 2-byte logical dtypes ride as uint8/uint16.
# The runner's extract_pages already ships bf16/fp8 pages as uint16/uint8
# bit patterns, so the uint dtypes are first-class transports themselves.
_DTYPE_VIEWS = {"bfloat16": np.uint16, "float16": np.uint16,
                "float8_e4m3fn": np.uint8, "float8_e5m2": np.uint8,
                "float32": np.uint32,
                "uint8": np.uint8, "uint16": np.uint16,
                "uint32": np.uint32}


def _logical_dtype(name: str):
    if name in ("float16", "float32", "uint8", "uint16", "uint32"):
        return np.dtype(name)
    import ml_dtypes
    return np.dtype(getattr(ml_dtypes, name))


def encode_payload(kv: np.ndarray, n_tokens: int) -> bytes:
    name = kv.dtype.name
    view = _DTYPE_VIEWS.get(name)
    if view is None:
        raise ValueError(f"unsupported KV dtype {name}")
    raw = np.ascontiguousarray(kv).view(view)
    header = json.dumps({"n_tokens": int(n_tokens), "dtype": name,
                         "shape": list(kv.shape)}).encode()
    return _MAGIC + struct.pack("<I", len(header)) + header + raw.tobytes()


def decode_payload(buf: bytes, max_bytes: int) -> Optional[dict]:
    if len(buf) > max_bytes or len(buf) < 8 or buf[:4] != _MAGIC:
        return None
    hlen = struct.unpack("<I", buf[4:8])[0]
    if hlen > 65536 or len(buf) < 8 + hlen:
        return None
    try:
        header = json.loads(buf[8:8 + hlen])
        name = str(header["dtype"])
        shape = tuple(int(x) for x in header["shape"])
        view = _DTYPE_VIEWS[name]
        n_el = int(np.prod(shape))
        raw = np.frombuffer(buf, dtype=view, offset=8 + hlen,
                            count=n_el).reshape(shape)
    except (KeyError, ValueError, TypeError):
        return None
    return {"kv": raw.view(_logical_dtype(name)),
            "n_tokens": int(header["n_tokens"])}

from aphrodite_tpu.utils import logger


@dataclass
class KVTransferConfig:
    """(reference: KVTransferConfig, aphrodite/common/config.py:3546)"""
    kv_role: Optional[str] = None  # kv_producer | kv_consumer
    # ZMQ endpoint of the producer's lookup service.
    kv_endpoint: str = "tcp://127.0.0.1:21455"
    # Producer-side lookup buffer cap (entries evict LRU beyond this).
    buffer_size_bytes: int = 2 << 30
    # Drop entries when read (one-shot handoff, the SimpleBuffer default).
    drop_on_read: bool = True
    # Reject network payloads beyond this (DoS / corruption guard).
    max_payload_bytes: int = 1 << 30


def _key(token_ids: list[int], block_size: int) -> Optional[bytes]:
    n_full = len(token_ids) // block_size
    if n_full == 0:
        return None
    arr = np.asarray(token_ids[:n_full * block_size], np.int64)
    return hashlib.sha256(arr.tobytes()).digest()


class ProducerBuffer:
    """Bounded LRU store served over ZMQ REP (runs in the producer)."""

    def __init__(self, cfg: KVTransferConfig) -> None:
        import zmq
        self.cfg = cfg
        self._store: OrderedDict[bytes, bytes] = OrderedDict()
        self._bytes = 0
        self._lock = threading.Lock()
        self._ctx = zmq.Context.instance()
        sock = self._ctx.socket(zmq.REP)
        sock.bind(cfg.kv_endpoint)
        self._sock = sock
        self._alive = True
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()
        logger.info("KV producer lookup service on %s", cfg.kv_endpoint)

    def put(self, token_ids: list[int], block_size: int,
            kv_pages: np.ndarray) -> None:
        key = _key(token_ids, block_size)
        if key is None:
            return
        payload = encode_payload(
            np.asarray(kv_pages),
            len(token_ids) // block_size * block_size)
        with self._lock:
            self._store.pop(key, None)
            self._store[key] = payload
            self._bytes += len(payload)
            while self._bytes > self.cfg.buffer_size_bytes and \
                    len(self._store) > 1:
                _, old = self._store.popitem(last=False)
                self._bytes -= len(old)

    def _serve(self) -> None:
        import zmq
        while self._alive:
            try:
                if not self._sock.poll(200):
                    continue
                key = self._sock.recv()
                if len(key) != 32:  # sha256 keys only
                    self._sock.send(b"")
                    continue
                with self._lock:
                    if self.cfg.drop_on_read:
                        payload = self._store.pop(key, None)
                        if payload is not None:
                            self._bytes -= len(payload)
                    else:
                        payload = self._store.get(key)
                self._sock.send(payload if payload is not None else b"")
            except zmq.ZMQError:
                break
            except Exception:
                if self._alive:
                    logger.exception("KV lookup service error")

    def close(self) -> None:
        self._alive = False
        self._thread.join(timeout=2)
        self._sock.close(0)


class ConsumerClient:
    """ZMQ REQ lookup client (runs in the consumer's engine core)."""

    def __init__(self, cfg: KVTransferConfig) -> None:
        import zmq
        self.cfg = cfg
        self._ctx = zmq.Context.instance()
        self._sock = self._ctx.socket(zmq.REQ)
        self._sock.setsockopt(zmq.RCVTIMEO, 2000)
        self._sock.setsockopt(zmq.SNDTIMEO, 2000)
        self._sock.setsockopt(zmq.LINGER, 0)
        self._sock.connect(cfg.kv_endpoint)
        self._lock = threading.Lock()

    def lookup(self, token_ids: list[int], block_size: int
               ) -> Optional[dict]:
        key = _key(token_ids, block_size)
        if key is None:
            return None
        try:
            with self._lock:
                self._sock.send(key)
                payload = self._sock.recv()
        except Exception:
            logger.warning("KV transfer lookup failed (producer down?)")
            return None
        if not payload:
            return None
        return decode_payload(payload, self.cfg.max_payload_bytes)

    def close(self) -> None:
        self._sock.close(0)
