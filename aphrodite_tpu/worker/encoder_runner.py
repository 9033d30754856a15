"""Runner for encoder/embedding models: padded bidirectional forward +
pooling (no paged KV, no sampler)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from aphrodite_tpu.utils import next_power_of_2


class EncoderRunner:

    def __init__(self, config, model, params) -> None:
        self.config = config
        self.model = model
        self.params = params
        self._encode = jax.jit(model.encode)

    def embed(self, token_lists: list[list[int]], pooling: str = "mean"):
        outs = []
        max_b = 16
        for start in range(0, len(token_lists), max_b):
            chunk = token_lists[start:start + max_b]
            B = len(chunk)
            S = next_power_of_2(max(len(t) for t in chunk))
            ids = np.zeros((B, S), np.int32)
            mask = np.zeros((B, S), np.int32)
            for i, t in enumerate(chunk):
                ids[i, :len(t)] = t
                mask[i, :len(t)] = 1
            hidden = self._encode(self.params, jnp.asarray(ids),
                                  jnp.asarray(mask))
            hidden = np.asarray(hidden.astype(jnp.float32))
            for i, t in enumerate(chunk):
                seg = hidden[i, :len(t)]
                if pooling == "cls":
                    outs.append(seg[0])
                elif pooling == "last":
                    outs.append(seg[-1])
                else:
                    outs.append(seg.mean(0))
        return outs

    def execute_model(self, scheduler_output):
        raise ValueError("encoder models do not support generation; use "
                         "LLM.embed / /v1/embeddings")
