"""N-gram (prompt-lookup) draft proposer.

Parity: aphrodite/v1/spec_decode/ngram_proposer.py:9 — find the most recent
occurrence of the current n-token suffix earlier in the context and propose
the tokens that followed it. Verification happens in the runner's
sample-and-match pass, which emits exactly the target model's samples, so
the proposal source cannot bias the output distribution.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


class NgramProposer:

    def __init__(self, min_n: int = 1, max_n: int = 4,
                 num_speculative_tokens: int = 4) -> None:
        self.min_n = min_n
        self.max_n = max_n
        self.k = num_speculative_tokens

    def propose(self, token_ids: list[int]) -> list[int]:
        """Returns up to k draft tokens ([] when no match)."""
        L = len(token_ids)
        if L < self.min_n + 1:
            return []
        from aphrodite_tpu._native import ngram_propose
        drafted = ngram_propose(np.asarray(token_ids, np.int32),
                                self.min_n, self.max_n, self.k)
        if drafted is not None:  # C fast path (None = no compiler)
            return drafted
        arr = np.asarray(token_ids, dtype=np.int64)
        for n in range(min(self.max_n, L - 1), self.min_n - 1, -1):
            suffix = arr[L - n:]
            # Most recent earlier occurrence of the suffix.
            windows = np.lib.stride_tricks.sliding_window_view(
                arr[:L - 1], n)
            matches = np.nonzero((windows == suffix).all(axis=1))[0]
            if len(matches):
                start = int(matches[-1]) + n
                draft = arr[start:start + self.k]
                if len(draft):
                    return [int(t) for t in draft]
        return []
