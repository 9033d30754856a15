"""Disaggregated prefill: producer engine ships prompt KV pages, consumer
engine seeds them as prefix-cache hits; generation must be token-exact vs
a standalone engine, with the consumer's prefill largely skipped."""
import numpy as np
import pytest

from aphrodite_tpu.sampling_params import SamplingParams

from tests.utils import save_tiny_hf_checkpoint, tiny_llama_hf_config


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("kvx_ckpt")
    save_tiny_hf_checkpoint(d, tiny_llama_hf_config())
    return d


def _llm(d, role=None, endpoint=None):
    from aphrodite_tpu.entrypoints.llm import LLM
    kv = {"kv_role": role, "kv_endpoint": endpoint} if role else None
    return LLM(model=str(d), dtype="float32", block_size=16,
               num_kv_blocks=128, max_num_batched_tokens=128,
               max_num_seqs=4, max_model_len=256, tokenizer="unused",
               kv_transfer_config=kv)


def test_disaggregated_prefill(ckpt):
    ep = "tcp://127.0.0.1:21973"
    prompt = list(range(40, 40 + 37))  # 2 full pages + tail
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)

    baseline = _llm(ckpt)
    expected = baseline.generate([prompt], params)[0].outputs[0].token_ids

    producer = _llm(ckpt, "kv_producer", ep)
    producer.generate([prompt],
                      SamplingParams(temperature=0.0, max_tokens=1,
                                     ignore_eos=True))

    consumer = _llm(ckpt, "kv_consumer", ep)
    out = consumer.generate([prompt], params)[0]
    assert out.outputs[0].token_ids == expected

    # The consumer must have admitted the prompt with cached pages.
    mgr = consumer.engine.core.scheduler.kv
    assert mgr.hit_tokens >= 32, (mgr.hit_tokens, mgr.query_tokens)
    assert consumer.engine.core.stats.kv_transfer_pages == 2


def test_consumer_miss_is_harmless(ckpt):
    """Lookup against a dead producer must degrade to normal prefill."""
    consumer = _llm(ckpt, "kv_consumer", "tcp://127.0.0.1:21974")
    params = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    out = consumer.generate([[1, 2, 3, 4, 5]], params)[0]
    assert len(out.outputs[0].token_ids) == 4


def test_wire_format_is_pickle_free_and_capped():
    """Security: the wire carries sha256 keys + JSON-header payloads (no
    pickle = no code execution from a hostile peer); oversized or
    malformed payloads are rejected, bf16 and fp8 round-trip."""
    import numpy as np
    import ml_dtypes
    from aphrodite_tpu.distributed.kv_transfer import (decode_payload,
                                                       encode_payload,
                                                       _key)
    key = _key(list(range(32)), 16)
    assert isinstance(key, bytes) and len(key) == 32  # sha256, not pickle

    for dt in (ml_dtypes.bfloat16, ml_dtypes.float8_e4m3fn, np.float32):
        kv = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4) \
            .astype(dt)
        buf = encode_payload(kv, 12)
        assert not buf.startswith(b"\x80")  # not a pickle stream
        out = decode_payload(buf, max_bytes=1 << 20)
        assert out["n_tokens"] == 12
        np.testing.assert_array_equal(
            out["kv"].astype(np.float32), kv.astype(np.float32))

    # size cap + malformed rejection
    kv = np.zeros((4, 4), ml_dtypes.bfloat16)
    buf = encode_payload(kv, 4)
    assert decode_payload(buf, max_bytes=10) is None
    assert decode_payload(b"JUNK" + buf[4:], max_bytes=1 << 20) is None
    import pickle
    evil = pickle.dumps({"kv": "boom"})
    assert decode_payload(evil, max_bytes=1 << 20) is None


def test_wire_format_uint_transport_dtypes():
    """The runner ships bf16/fp8 pages as uint16/uint8 bit patterns
    (extract_pages): those must encode/decode as-is."""
    import numpy as np
    from aphrodite_tpu.distributed.kv_transfer import (decode_payload,
                                                       encode_payload)
    for dt in (np.uint16, np.uint8, np.uint32):
        kv = np.arange(24, dtype=dt).reshape(2, 3, 4)
        out = decode_payload(encode_payload(kv, 8), max_bytes=1 << 20)
        assert out["kv"].dtype == dt
        np.testing.assert_array_equal(out["kv"], kv)
