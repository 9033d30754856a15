"""aphrodite_tpu: a TPU-native LLM inference/serving framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of Aphrodite Engine
(reference: xoul-ai/aphrodite-fork): continuous batching over a paged KV cache,
prefix caching, chunked prefill, a Pallas ragged-paged-attention kernel, the
full Aphrodite sampler suite, quantization, tensor parallelism via mesh
sharding, and an OpenAI-compatible server.

Reference layer map: /root/repo/SURVEY.md §1.
"""

__version__ = "0.1.0"

from aphrodite_tpu.sampling_params import SamplingParams
from aphrodite_tpu.outputs import CompletionOutput, RequestOutput

__all__ = [
    "LLM",
    "SamplingParams",
    "CompletionOutput",
    "RequestOutput",
    "EngineArgs",
]


def __getattr__(name):
    # Lazy imports keep `import aphrodite_tpu` cheap (no jax/transformers cost
    # until an engine is actually constructed).
    if name == "LLM":
        from aphrodite_tpu.entrypoints.llm import LLM
        return LLM
    if name == "EngineArgs":
        from aphrodite_tpu.engine.args import EngineArgs
        return EngineArgs
    if name == "AsyncLLM":
        from aphrodite_tpu.engine.async_llm import AsyncLLM
        return AsyncLLM
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
