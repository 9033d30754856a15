"""Structured-output manager: per-request grammar state + packed bitmasks.

Parity model: aphrodite/v1/structured_output/__init__.py:23 — the scheduler
ships a vocab bitmask per step for each constrained request; the runner
applies it in-graph before sampling (like the reference's TPU
structured_decode, v1/worker/tpu_model_runner.py:1266); the manager advances
the FSM with the emitted tokens afterwards.
"""
from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Optional

import numpy as np

from aphrodite_tpu.sampling_params import GuidedDecodingParams
from aphrodite_tpu.structured_output.fsm import DFA, TokenFSM
from aphrodite_tpu.structured_output.json_schema import (_escape_literal,
                                                         schema_to_regex)
from aphrodite_tpu.utils import logger


@dataclass
class GrammarState:
    fsm: TokenFSM
    state: int
    done: bool = False


class StructuredOutputManager:

    def __init__(self, tokenizer, vocab_size: int,
                 eos_token_id: Optional[int]) -> None:
        self.tokenizer = tokenizer
        self.vocab_size = vocab_size
        self.eos_token_id = eos_token_id
        self._token_strings: Optional[list[str]] = None
        self._fsm_cache: dict[str, TokenFSM] = {}
        self.requests: dict[str, GrammarState] = {}

    # --------------------------------------------------------------- plumbing
    def _tokens(self) -> list[str]:
        if self._token_strings is None:
            tok = self.tokenizer
            special = set(getattr(tok, "all_special_ids", []) or [])
            out = []
            for i in range(self.vocab_size):
                if i in special:
                    out.append("")  # special tokens never satisfy grammar
                else:
                    try:
                        out.append(tok.decode([i]))
                    except Exception:
                        out.append("")
            self._token_strings = out
        return self._token_strings

    @staticmethod
    def grammar_key(gd: GuidedDecodingParams) -> str:
        if gd.regex:
            return "regex:" + gd.regex
        if gd.choice is not None:
            return "choice:" + json.dumps(gd.choice)
        if gd.json is not None:
            return "json:" + (gd.json if isinstance(gd.json, str)
                              else json.dumps(gd.json))
        if gd.json_object:
            return "json_object"
        if gd.grammar:
            return "grammar:" + gd.grammar
        raise ValueError("empty guided decoding constraint")

    def _compile(self, gd: GuidedDecodingParams) -> TokenFSM:
        key = self.grammar_key(gd)
        fsm = self._fsm_cache.get(key)
        if fsm is not None:
            return fsm
        if gd.grammar:
            # EBNF/Lark/GBNF: depth-bounded expansion into the lazy-DFA
            # engine (structured_output/grammar.py; reference delegates to
            # xgrammar's PDA, backend_xgrammar.py:28).
            from aphrodite_tpu.structured_output.grammar import (
                compile_grammar)
            fsm = TokenFSM(compile_grammar(gd.grammar), self._tokens())
            self._fsm_cache[key] = fsm
            return fsm
        if gd.regex:
            pattern = gd.regex
        elif gd.choice is not None:
            pattern = "(" + "|".join(_escape_literal(c)
                                     for c in gd.choice) + ")"
        elif gd.json is not None:
            pattern = schema_to_regex(gd.json)
        else:  # json_object
            pattern = schema_to_regex(None)
        fsm = TokenFSM(DFA(pattern), self._tokens())
        self._fsm_cache[key] = fsm
        return fsm

    # ------------------------------------------------------------------- api
    def add_request(self, request_id: str,
                    gd: GuidedDecodingParams) -> None:
        fsm = self._compile(gd)
        self.requests[request_id] = GrammarState(fsm=fsm,
                                                 state=fsm.dfa.start)

    def remove_request(self, request_id: str) -> None:
        self.requests.pop(request_id, None)

    def has(self, request_id: str) -> bool:
        return request_id in self.requests

    def bitmask_row(self, request_id: str) -> np.ndarray:
        """Packed uint32 bitmask [ceil(V/32)] of permitted token ids."""
        st = self.requests[request_id]
        W = (self.vocab_size + 31) // 32
        mask = np.zeros((W,), np.uint32)
        if st.done:
            if self.eos_token_id is not None:
                mask[self.eos_token_id // 32] |= np.uint32(
                    1 << (self.eos_token_id % 32))
            return mask
        allowed, may_finish = st.fsm.allowed(st.state)
        ids = np.asarray(allowed, np.int64)
        if len(ids):
            np.bitwise_or.at(mask, ids // 32,
                             (np.uint32(1) << (ids % 32).astype(np.uint32)))
        if may_finish and self.eos_token_id is not None:
            mask[self.eos_token_id // 32] |= np.uint32(
                1 << (self.eos_token_id % 32))
        if not len(ids) and not may_finish:
            logger.warning("grammar dead-ended for %s; allowing EOS",
                           request_id)
            if self.eos_token_id is not None:
                mask[self.eos_token_id // 32] |= np.uint32(
                    1 << (self.eos_token_id % 32))
        return mask

    def advance(self, request_id: str, token_ids: list[int]) -> None:
        st = self.requests.get(request_id)
        if st is None:
            return
        for t in token_ids:
            if t == self.eos_token_id:
                st.done = True
                break
            st.state = st.fsm.advance(st.state, t)
            if not st.fsm.dfa.is_live(st.state):
                st.done = True
                break
            if st.fsm.dfa.is_final(st.state):
                # Accepting; allow EOS next step but also continuations.
                pass
