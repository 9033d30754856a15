"""Shared-prefix decode through the whole engine: prefix caching shares
the pages, the runner detects the common block prefix, and the cascade
window path must be token-exact vs cascade disabled."""
import numpy as np
import pytest

from aphrodite_tpu.sampling_params import SamplingParams

from tests.utils import save_tiny_hf_checkpoint, tiny_llama_hf_config


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_cascade")
    save_tiny_hf_checkpoint(d, tiny_llama_hf_config(max_pos=512))
    return d


def _generate(ckpt, detect: bool):
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(ckpt), dtype="float32", block_size=16,
              num_kv_blocks=256, max_num_batched_tokens=512,
              max_num_seqs=4, max_model_len=256, tokenizer="unused",
              device="cpu")
    runner = llm.engine.core.worker.runner
    if not detect:
        runner._detect_shared_prefix = lambda *a, **k: None
    rng = np.random.RandomState(0)
    shared = rng.randint(10, 200, size=100).tolist()  # 6+ shared pages
    prompts = [shared + rng.randint(10, 200, size=5 + i).tolist()
               for i in range(3)]
    outs = llm.generate(prompts, SamplingParams(
        temperature=0.0, max_tokens=12, ignore_eos=True))
    return [o.outputs[0].token_ids for o in outs]


def test_cascade_token_exact(ckpt):
    with_c = _generate(ckpt, True)
    without = _generate(ckpt, False)
    assert with_c == without


def test_detection_requires_common_prefix(ckpt):
    from aphrodite_tpu.entrypoints.llm import LLM
    llm = LLM(model=str(ckpt), dtype="float32", block_size=16,
              num_kv_blocks=256, max_num_batched_tokens=512,
              max_num_seqs=4, max_model_len=256, tokenizer="unused",
              device="cpu")
    runner = llm.engine.core.worker.runner

    class FakeSt:
        def __init__(self, blocks):
            self.block_ids = blocks
    runner.requests = {"a": FakeSt([1, 2, 3, 4, 9]),
                       "b": FakeSt([1, 2, 3, 4, 7, 8])}
    pages, S = runner._detect_shared_prefix(["a", "b"], 1000)
    assert pages[:4] == [1, 2, 3, 4] and S == 64
    # divergence before 4 pages -> no cascade
    runner.requests["b"].block_ids = [1, 2, 9, 4]
    assert runner._detect_shared_prefix(["a", "b"], 1000) is None
    # min_plen caps the shared region
    runner.requests["b"].block_ids = [1, 2, 3, 4, 7]
    assert runner._detect_shared_prefix(["a", "b"], 40) is None
