"""KV event publishing: stored / removed / cleared over ZMQ PUB."""
import json
import time

import zmq

from aphrodite_tpu.core.block_pool import BlockPool
from aphrodite_tpu.kv_events import KVEventPublisher


def test_kv_events_roundtrip():
    ctx = zmq.Context.instance()
    sub = ctx.socket(zmq.SUB)
    port = sub.bind_to_random_port("tcp://127.0.0.1")
    sub.setsockopt(zmq.SUBSCRIBE, b"kv-events")
    # Publisher connects out to the subscriber's bound port via a second
    # pattern: simpler to bind pub and connect sub instead.
    sub.close(0)

    pub = KVEventPublisher("tcp://127.0.0.1:0")
    # Resolve the bound endpoint.
    endpoint = pub.sock.getsockopt_string(zmq.LAST_ENDPOINT)
    sub = ctx.socket(zmq.SUB)
    sub.connect(endpoint)
    sub.setsockopt(zmq.SUBSCRIBE, b"kv-events")
    time.sleep(0.3)  # PUB/SUB join

    pool = BlockPool(num_blocks=6, event_publisher=pub)
    blocks = pool.get_new_blocks(3)
    pool.cache_full_blocks(blocks, [101, 202, 303], 0, 3)
    pool.free_blocks(list(reversed(blocks)))
    pool.get_new_blocks(4)  # forces eviction of at least one cached hash
    pool.free_blocks(pool.blocks[1:5])
    events = []
    deadline = time.time() + 3
    while time.time() < deadline:
        if sub.poll(200):
            _, raw = sub.recv_multipart()
            events.extend(json.loads(raw)["events"])
            if any(e["type"] == "BlockRemoved" for e in events):
                break
    types = {e["type"] for e in events}
    assert "BlockStored" in types
    assert "BlockRemoved" in types
    stored = [e for e in events if e["type"] == "BlockStored"][0]
    assert set(stored["block_hashes"]) == {101, 202, 303}
    sub.close(0)
    pub.close()
