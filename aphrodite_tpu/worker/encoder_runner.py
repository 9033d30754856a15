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

    def score(self, pairs: list[tuple[list[int], list[int]]]
              ) -> list[list[float]]:
        """Cross-encoder scoring: pairs of (token_ids, token_type_ids) ->
        per-pair classifier logits."""
        if not getattr(self.model, "is_cross_encoder", False):
            raise ValueError("model has no classification head; /score and "
                             "/rerank need a *ForSequenceClassification "
                             "checkpoint")
        if not hasattr(self, "_classify"):
            self._classify = jax.jit(self.model.classify)
        outs = []
        max_b = 16
        for start in range(0, len(pairs), max_b):
            chunk = pairs[start:start + max_b]
            B = len(chunk)
            S = next_power_of_2(max(len(t) for t, _ in chunk))
            ids = np.zeros((B, S), np.int32)
            mask = np.zeros((B, S), np.int32)
            types = np.zeros((B, S), np.int32)
            for i, (t, ty) in enumerate(chunk):
                ids[i, :len(t)] = t
                mask[i, :len(t)] = 1
                types[i, :len(ty)] = ty
            logits = self._classify(self.params, jnp.asarray(ids),
                                    jnp.asarray(mask), jnp.asarray(types))
            outs.extend(np.asarray(logits, np.float32)[:B].tolist())
        return outs

    def execute_model(self, scheduler_output):
        raise ValueError("encoder models do not support generation; use "
                         "LLM.embed / /v1/embeddings")
