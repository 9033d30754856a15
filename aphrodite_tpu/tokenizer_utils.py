"""Tokenizer access + incremental detokenization.

Parity: aphrodite/transformers_utils/tokenizer.py (cached get_tokenizer) and
aphrodite/v1/engine/detokenizer.py:17 (IncrementalDetokenizer with
prefix/read offsets — emits text only once multi-token glyphs resolve).
"""
from __future__ import annotations

import functools
import os
from typing import Optional

# Number of trailing prompt tokens used to prime detokenization spacing.
_PRIME_TOKENS = 5


@functools.lru_cache(maxsize=8)
def get_tokenizer(name: str, trust_remote_code: bool = False,
                  revision: Optional[str] = None,
                  tokenizer_mode: str = "auto"):
    """tokenizer_mode: "auto" picks tekken.json when it is the only
    tokenizer in a Mistral-format checkpoint dir; "mistral" forces it;
    "hf"/"slow" force transformers (reference
    transformers_utils/tokenizer.py get_tokenizer modes)."""
    if tokenizer_mode != "hf":
        from aphrodite_tpu.tokenizers_mistral import (TekkenTokenizer,
                                                      find_tekken_file)
        tekken = find_tekken_file(name)
        if tokenizer_mode == "mistral":
            if tekken is None:
                raise ValueError(
                    f"tokenizer_mode='mistral' but no tekken.json under "
                    f"{name!r} (sentencepiece tokenizer.model.v* files "
                    "need the HF conversion in this environment)")
            return TekkenTokenizer(tekken)
        if tekken is not None and not (
                os.path.isdir(name)
                and (os.path.isfile(os.path.join(name, "tokenizer.json"))
                     or os.path.isfile(
                         os.path.join(name, "tokenizer_config.json")))):
            # Mistral-format checkpoint with no HF tokenizer alongside.
            return TekkenTokenizer(tekken)
    from transformers import AutoTokenizer
    return AutoTokenizer.from_pretrained(
        name, trust_remote_code=trust_remote_code, revision=revision)


class IncrementalDetokenizer:
    """Streams text deltas from a growing token list, holding back output
    while the byte-level decoder is mid-glyph (trailing U+FFFD)."""

    def __init__(self, tokenizer, prompt_token_ids: list[int],
                 skip_special_tokens: bool = True,
                 spaces_between_special_tokens: bool = True) -> None:
        self.tokenizer = tokenizer
        self.skip_special_tokens = skip_special_tokens
        self.spaces = spaces_between_special_tokens
        self.tokens: list[int] = list(prompt_token_ids[-_PRIME_TOKENS:])
        self.prefix_offset = 0
        self.read_offset = len(self.tokens)

    def _decode(self, toks: list[int]) -> str:
        return self.tokenizer.decode(
            toks, skip_special_tokens=self.skip_special_tokens,
            spaces_between_special_tokens=self.spaces)

    def update(self, new_token_ids: list[int]) -> str:
        if not new_token_ids:
            return ""
        self.tokens.extend(new_token_ids)
        prefix_text = self._decode(
            self.tokens[self.prefix_offset:self.read_offset])
        full_text = self._decode(self.tokens[self.prefix_offset:])
        if full_text.endswith("�"):
            # Incomplete UTF-8 sequence: wait for more tokens.
            return ""
        delta = full_text[len(prefix_text):]
        self.prefix_offset = self.read_offset
        self.read_offset = len(self.tokens)
        return delta


class StopStringTracker:
    """Scans accumulated text for stop strings; reports the truncation point.
    (reference: aphrodite/engine/output_processor/stop_checker.py)"""

    def __init__(self, stop: list[str], include_in_output: bool) -> None:
        self.stop = stop
        self.include = include_in_output
        self.max_len = max((len(s) for s in stop), default=0)

    def check(self, text: str, delta_len: int
              ) -> Optional[tuple[str, int]]:
        """Returns (stop_string, truncate_index_into_text) on a hit."""
        if not self.stop or not delta_len:
            return None
        window_start = max(0, len(text) - delta_len - self.max_len + 1)
        for s in self.stop:
            idx = text.find(s, window_start)
            if idx != -1:
                return s, (idx + len(s)) if self.include else idx
        return None
