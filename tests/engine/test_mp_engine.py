"""Process-isolated engine core (ZMQ): generation parity and crash
isolation (reference: tests/mq_aphrodite_engine/ patterns)."""
import asyncio

import pytest

from aphrodite_tpu.sampling_params import SamplingParams

from tests.utils import (build_tiny_tokenizer, save_tiny_hf_checkpoint,
                         tiny_llama_hf_config)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_mp")
    save_tiny_hf_checkpoint(d, tiny_llama_hf_config(max_pos=512))
    build_tiny_tokenizer(d)
    return d


def _config(ckpt):
    from aphrodite_tpu.entrypoints.llm import build_engine_config
    return build_engine_config(
        str(ckpt), dtype="float32", block_size=16, num_kv_blocks=128,
        max_num_batched_tokens=64, max_num_seqs=4, max_model_len=128,
        device="cpu")


def test_mp_engine_matches_inproc(ckpt):
    from aphrodite_tpu.engine.async_llm import AsyncLLM
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)

    async def collect(engine, rid):
        toks = []
        async for out in engine.generate("hello world", params, rid):
            toks.extend(out.outputs[0].token_ids)
        return toks

    inproc = AsyncLLM(_config(ckpt))
    expected = asyncio.run(collect(inproc, "r1"))

    mp_engine = AsyncLLM(_config(ckpt), multiprocess=True)
    try:
        got = asyncio.run(collect(mp_engine, "r2"))
        assert got == expected
        # Utility calls cross the boundary.
        stats = mp_engine.stats
        assert stats["num_running"] == 0
        assert "aphrodite_request_success_total 1" in \
            mp_engine.metrics_text()
    finally:
        mp_engine.shutdown()


def test_mp_engine_concurrent_requests(ckpt):
    from aphrodite_tpu.engine.async_llm import AsyncLLM
    params = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    engine = AsyncLLM(_config(ckpt), multiprocess=True)

    async def one(i):
        toks = []
        async for out in engine.generate(f"hello {i}", params, f"c{i}"):
            toks.extend(out.outputs[0].token_ids)
        return toks

    async def many():
        return await asyncio.gather(*[one(i) for i in range(5)])

    try:
        results = asyncio.run(many())
        assert all(len(r) == 6 for r in results)
    finally:
        engine.shutdown()
