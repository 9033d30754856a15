"""Device-free unit tests for the block pool + prefix caching
(test pattern: SURVEY.md §4.6 — drive the scheduler layer with fabricated
requests, no model, no device)."""
import pytest

from aphrodite_tpu.core.block_pool import (BlockPool, FreeBlockQueue,
                                           KVCacheBlock, hash_block_tokens,
                                           hash_request_tokens)


def test_free_queue_fifo():
    blocks = [KVCacheBlock(i) for i in range(5)]
    q = FreeBlockQueue(blocks)
    assert q.num_free == 5
    assert q.popleft().block_id == 0
    q.remove(blocks[2])
    assert q.popleft().block_id == 1
    assert q.popleft().block_id == 3
    q.append(blocks[2])
    assert q.popleft().block_id == 4
    assert q.popleft().block_id == 2
    assert q.num_free == 0
    with pytest.raises(ValueError):
        q.popleft()


def test_hash_chain():
    toks = list(range(40))
    hashes = hash_request_tokens(16, toks)
    assert len(hashes) == 2  # only full pages
    # Chained: same second page under a different first page differs.
    h2 = hash_block_tokens(None, tuple(toks[16:32]))
    assert h2 != hashes[1]
    assert hash_request_tokens(16, toks)[:2] == hashes


def test_pool_alloc_free_and_eviction():
    pool = BlockPool(num_blocks=6)  # 5 usable (block 0 = null)
    blocks = pool.get_new_blocks(3)
    assert [b.block_id for b in blocks] == [1, 2, 3]
    assert pool.get_num_free_blocks() == 2

    # Cache two of them, free all -> hashes survive until reallocated.
    pool.cache_full_blocks(blocks, [111, 222, 333], 0, 2)
    assert pool.get_cached_block(111).block_id == 1
    pool.free_blocks(list(reversed(blocks)))
    assert pool.get_num_free_blocks() == 5
    assert pool.get_cached_block(111) is not None

    # Cache hit: touch revives a free block.
    hit = pool.get_cached_block(222)
    pool.touch([hit])
    assert hit.ref_cnt == 1
    assert pool.get_num_free_blocks() == 4

    # Allocate the rest; the LRU order means untouched cached block 1
    # eventually gets evicted and loses its hash.
    rest = pool.get_new_blocks(4)
    assert pool.get_cached_block(111) is None  # evicted on reuse
    assert pool.get_cached_block(222) is hit  # still held
    assert pool.get_num_free_blocks() == 0


def test_null_block_never_allocated():
    pool = BlockPool(num_blocks=3)
    a = pool.get_new_blocks(2)
    assert 0 not in [b.block_id for b in a]
    with pytest.raises(ValueError):
        pool.get_new_blocks(1)


def test_reset_prefix_cache():
    pool = BlockPool(num_blocks=4)
    blocks = pool.get_new_blocks(2)
    pool.cache_full_blocks(blocks, [7, 8], 0, 2)
    assert not pool.reset_prefix_cache()  # blocks still held
    pool.free_blocks(blocks)
    assert pool.reset_prefix_cache()
    assert pool.get_cached_block(7) is None
