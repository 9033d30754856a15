"""From-scratch regex engine: parser -> Thompson NFA -> lazy DFA -> token FSM.

The environment ships no grammar backend (no xgrammar/outlines), so this is a
self-contained implementation of the piece the reference delegates to those
libraries (aphrodite/v1/structured_output/): compile a constraint to an
automaton, then expose per-state *token*-level masks over the tokenizer
vocabulary (outlines-style: walk each token's characters through the DFA;
masks are cached per DFA state).

Regex subset: literals, '.', escapes (\\d \\w \\s \\n \\t \\. etc.),
character classes [a-z0-9_] (with ^ negation), groups (), alternation |,
quantifiers * + ? {m} {m,} {m,n}.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

EPS = None  # epsilon edge label


# --------------------------------------------------------------------------- #
# charset representation: frozenset of chars, or ("neg", frozenset)
# --------------------------------------------------------------------------- #
DOT = ("neg", frozenset("\n"))

_ESCAPES = {
    "d": frozenset("0123456789"),
    "w": frozenset("abcdefghijklmnopqrstuvwxyz"
                   "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_"),
    "s": frozenset(" \t\n\r\f\v"),
    "n": frozenset("\n"),
    "t": frozenset("\t"),
    "r": frozenset("\r"),
}


def _charset_match(cs, ch: str) -> bool:
    if isinstance(cs, tuple) and cs[0] == "neg":
        return ch not in cs[1]
    return ch in cs


# --------------------------------------------------------------------------- #
# NFA
# --------------------------------------------------------------------------- #
class NFA:
    def __init__(self) -> None:
        self.edges: list[list[tuple[object, int]]] = []

    def new_state(self) -> int:
        self.edges.append([])
        return len(self.edges) - 1

    def add(self, src: int, label, dst: int) -> None:
        self.edges[src].append((label, dst))


@dataclass
class Frag:
    start: int
    end: int


class RegexParser:
    """Recursive-descent regex -> NFA fragment."""

    def __init__(self, pattern: str, nfa: NFA) -> None:
        self.p = pattern
        self.i = 0
        self.nfa = nfa

    def peek(self) -> Optional[str]:
        return self.p[self.i] if self.i < len(self.p) else None

    def eat(self) -> str:
        ch = self.p[self.i]
        self.i += 1
        return ch

    def parse(self) -> Frag:
        f = self.alternation()
        if self.i != len(self.p):
            raise ValueError(f"regex parse error at {self.i}: {self.p!r}")
        return f

    def alternation(self) -> Frag:
        frags = [self.concat()]
        while self.peek() == "|":
            self.eat()
            frags.append(self.concat())
        if len(frags) == 1:
            return frags[0]
        s, e = self.nfa.new_state(), self.nfa.new_state()
        for f in frags:
            self.nfa.add(s, EPS, f.start)
            self.nfa.add(f.end, EPS, e)
        return Frag(s, e)

    def concat(self) -> Frag:
        frags = []
        while self.peek() is not None and self.peek() not in "|)":
            frags.append(self.repeat())
        if not frags:
            s = self.nfa.new_state()
            return Frag(s, s)
        for a, b in zip(frags, frags[1:]):
            self.nfa.add(a.end, EPS, b.start)
        return Frag(frags[0].start, frags[-1].end)

    def repeat(self) -> Frag:
        f = self.atom()
        while self.peek() in ("*", "+", "?", "{"):
            op = self.peek()
            if op == "{":
                j = self.p.index("}", self.i)
                spec = self.p[self.i + 1:j]
                self.i = j + 1
                if "," in spec:
                    lo_s, hi_s = spec.split(",", 1)
                    lo = int(lo_s or 0)
                    hi = int(hi_s) if hi_s else None
                else:
                    lo = hi = int(spec)
                f = self._bounded(f, lo, hi)
            else:
                self.eat()
                s, e = self.nfa.new_state(), self.nfa.new_state()
                self.nfa.add(s, EPS, f.start)
                self.nfa.add(f.end, EPS, e)
                if op in "*+":
                    self.nfa.add(f.end, EPS, f.start)
                if op in "*?":
                    self.nfa.add(s, EPS, e)
                f = Frag(s, e)
        return f

    def _clone(self, f: Frag) -> Frag:
        """Deep-copy a fragment's subgraph (for bounded repeats)."""
        mapping = {}

        def get(s):
            if s not in mapping:
                mapping[s] = self.nfa.new_state()
            return mapping[s]

        stack = [f.start]
        seen = {f.start}
        while stack:
            s = stack.pop()
            for label, dst in list(self.nfa.edges[s]):
                self.nfa.add(get(s), label, get(dst))
                if dst not in seen:
                    seen.add(dst)
                    stack.append(dst)
        get(f.end)
        return Frag(mapping[f.start], mapping[f.end])

    def _bounded(self, f: Frag, lo: int, hi: Optional[int]) -> Frag:
        parts = [f] + [self._clone(f) for _ in range(max(
            (hi if hi is not None else lo), 1) - 1)]
        s = self.nfa.new_state()
        e = self.nfa.new_state()
        cur = s
        for idx, part in enumerate(parts):
            self.nfa.add(cur, EPS, part.start)
            if idx + 1 >= lo:
                self.nfa.add(part.end, EPS, e)
            cur = part.end
        if lo == 0:
            self.nfa.add(s, EPS, e)
        if hi is None:  # unbounded tail: loop the last copy
            self.nfa.add(parts[-1].end, EPS, parts[-1].start)
        return Frag(s, e)

    def atom(self) -> Frag:
        ch = self.eat()
        if ch == "(":
            if self.p[self.i:self.i + 2] == "?:":
                self.i += 2
            f = self.alternation()
            assert self.eat() == ")"
            return f
        if ch == "[":
            return self._charclass()
        if ch == ".":
            return self._edge(DOT)
        if ch == "\\":
            esc = self.eat()
            cs = _ESCAPES.get(esc)
            if cs is None and esc.isupper() and esc.lower() in _ESCAPES:
                cs = ("neg", _ESCAPES[esc.lower()])
            if cs is None:
                cs = frozenset(esc)
            return self._edge(cs)
        return self._edge(frozenset(ch))

    def _edge(self, cs) -> Frag:
        s, e = self.nfa.new_state(), self.nfa.new_state()
        self.nfa.add(s, cs, e)
        return Frag(s, e)

    def _charclass(self) -> Frag:
        neg = False
        if self.peek() == "^":
            self.eat()
            neg = True
        chars: set[str] = set()
        while self.peek() != "]":
            ch = self.eat()
            if ch == "\\":
                esc = self.eat()
                sub = _ESCAPES.get(esc, frozenset(esc))
                chars |= set(sub)
                continue
            if self.peek() == "-" and self.p[self.i + 1:self.i + 2] != "]":
                self.eat()
                hi = self.eat()
                for o in range(ord(ch), ord(hi) + 1):
                    chars.add(chr(o))
            else:
                chars.add(ch)
        self.eat()  # ]
        cs = ("neg", frozenset(chars)) if neg else frozenset(chars)
        return self._edge(cs)


# --------------------------------------------------------------------------- #
# lazy DFA over NFA state sets
# --------------------------------------------------------------------------- #
class DFA:
    DEAD = -1

    def __init__(self, pattern: str) -> None:
        nfa = NFA()
        frag = RegexParser(pattern, nfa).parse()
        self._init_from(nfa, frag)

    @classmethod
    def from_nfa(cls, nfa: NFA, frag: Frag) -> "DFA":
        """Build over a pre-constructed NFA (grammar backend)."""
        dfa = cls.__new__(cls)
        dfa._init_from(nfa, frag)
        return dfa

    def _init_from(self, nfa: NFA, frag: Frag) -> None:
        self.nfa = nfa
        self.accept_nfa = frag.end
        start_set = self._eps_closure({frag.start})
        self._sets: list[frozenset[int]] = [frozenset(start_set)]
        self._index = {self._sets[0]: 0}
        self._trans: list[dict[str, int]] = [{}]
        self.start = 0

    def _eps_closure(self, states: set[int]) -> set[int]:
        stack = list(states)
        out = set(states)
        while stack:
            s = stack.pop()
            for label, dst in self.nfa.edges[s]:
                if label is EPS and dst not in out:
                    out.add(dst)
                    stack.append(dst)
        return out

    def step(self, state: int, ch: str) -> int:
        if state == self.DEAD:
            return self.DEAD
        cached = self._trans[state].get(ch)
        if cached is not None:
            return cached
        nxt: set[int] = set()
        for s in self._sets[state]:
            for label, dst in self.nfa.edges[s]:
                if label is not EPS and _charset_match(label, ch):
                    nxt.add(dst)
        if not nxt:
            self._trans[state][ch] = self.DEAD
            return self.DEAD
        closure = frozenset(self._eps_closure(nxt))
        idx = self._index.get(closure)
        if idx is None:
            idx = len(self._sets)
            self._sets.append(closure)
            self._index[closure] = idx
            self._trans.append({})
        self._trans[state][ch] = idx
        return idx

    def walk(self, state: int, text: str) -> int:
        for ch in text:
            state = self.step(state, ch)
            if state == self.DEAD:
                break
        return state

    def is_final(self, state: int) -> bool:
        return state != self.DEAD and self.accept_nfa in self._sets[state]

    def is_live(self, state: int) -> bool:
        """Can any continuation (possibly empty) still reach accept?"""
        if state == self.DEAD:
            return False
        # BFS over charset labels from the NFA set.
        seen = set(self._sets[state])
        stack = list(seen)
        while stack:
            s = stack.pop()
            if s == self.accept_nfa:
                return True
            for _, dst in self.nfa.edges[s]:
                if dst not in seen:
                    seen.add(dst)
                    stack.append(dst)
        return False


# --------------------------------------------------------------------------- #
# token-level FSM
# --------------------------------------------------------------------------- #
class TokenFSM:
    """Token-level view of a DFA over a tokenizer vocabulary.

    allowed(state) -> (list of permitted token ids, may_finish) with
    per-state caching. A token is permitted iff walking its string keeps the
    DFA alive; may_finish reports whether EOS is legal (accepting state)."""

    def __init__(self, dfa: DFA, token_strings: list[str]) -> None:
        self.dfa = dfa
        self.tokens = token_strings
        self._cache: dict[int, list[int]] = {}

    def allowed(self, state: int) -> tuple[list[int], bool]:
        toks = self._cache.get(state)
        if toks is None:
            toks = []
            for tid, text in enumerate(self.tokens):
                if not text:
                    continue
                nxt = self.dfa.walk(state, text)
                if nxt != self.dfa.DEAD and self.dfa.is_live(nxt):
                    toks.append(tid)
            self._cache[state] = toks
        return toks, self.dfa.is_final(state)

    def advance(self, state: int, token_id: int) -> int:
        return self.dfa.walk(state, self.tokens[token_id])
