"""Grammar-constrained decoding: EBNF/Lark/GBNF -> NFA (depth-bounded).

The reference delegates `guided_grammar` to xgrammar's pushdown automaton
(aphrodite/v1/structured_output/backend_xgrammar.py:28). This environment
ships no grammar library, so we compile the grammar ourselves into the
native lazy-DFA engine (structured_output/fsm.py): recursive rules are
expanded to a configurable maximum recursion depth (default 6,
plus a total-NFA-size guard), turning the
context-free language into a regular under-approximation that the existing
NFA -> lazy DFA -> token FSM pipeline handles unchanged. Nesting deeper
than the cap is simply not offered to the sampler — the same flavor of
bound as max_tokens. Non-recursive grammars compile exactly.

Accepted syntaxes (auto-detected):
- GBNF (llama.cpp):  ``root ::= expr``   with ``#`` comments
- Lark/EBNF (vLLM):  ``start: expr``     with ``//`` comments

Body syntax shared by both: "literal" or 'literal', [a-z0-9] classes
(with ^ negation and escapes), ( ) groups, |, * + ?, {m,n} bounded
repeats, rule references, and ``.`` (any char).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Union

from aphrodite_tpu.structured_output.fsm import (DOT, EPS, _ESCAPES, NFA,
                                                 Frag)

DEFAULT_MAX_DEPTH = 6
MAX_NFA_STATES = 300_000

_LIT_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "\\": "\\", '"': '"',
                "'": "'", "0": "\0"}


# --------------------------------------------------------------------------- #
# AST
# --------------------------------------------------------------------------- #
@dataclass
class Lit:
    text: str


@dataclass
class Term:
    charset: object  # frozenset | ("neg", frozenset)


@dataclass
class Ref:
    name: str


@dataclass
class Seq:
    items: list


@dataclass
class Alt:
    options: list


@dataclass
class Rep:
    node: object
    lo: int
    hi: Optional[int]


Node = Union[Lit, Term, Ref, Seq, Alt, Rep]


# --------------------------------------------------------------------------- #
# grammar text -> rules
# --------------------------------------------------------------------------- #
class GrammarParseError(ValueError):
    pass


def _strip_comments(text: str) -> str:
    out = []
    for line in text.splitlines():
        for marker in ("#", "//"):
            # don't cut markers inside quotes
            idx, in_q = 0, None
            while idx < len(line):
                ch = line[idx]
                if in_q:
                    if ch == "\\":
                        idx += 1
                    elif ch == in_q:
                        in_q = None
                elif ch in "\"'":
                    in_q = ch
                elif line.startswith(marker, idx):
                    line = line[:idx]
                    break
                idx += 1
        out.append(line)
    return "\n".join(out)


# Lark `%import common.X` definitions, expressed in our own body syntax
# (reference guided_grammar inputs lean on lark's common terminal library;
# the reference itself delegates to xgrammar which bundles these).
_COMMON_TERMINALS = {
    "DIGIT": "[0-9]",
    "HEXDIGIT": "[0-9a-fA-F]",
    "LETTER": "[A-Za-z]",
    "UCASE_LETTER": "[A-Z]",
    "LCASE_LETTER": "[a-z]",
    "WS": "[ \\t\\r\\n\\f]+",
    "WS_INLINE": "[ \\t]+",
    "NEWLINE": "[\\r]? [\\n]",
    "INT": "[0-9]+",
    "SIGNED_INT": "[+-]? [0-9]+",
    "DECIMAL": "[0-9]+ '.' [0-9]* | '.' [0-9]+",
    "FLOAT": "[0-9]+ '.' [0-9]+ ([eE] [+-]? [0-9]+)?",
    "NUMBER": "[0-9]+ ('.' [0-9]+)? ([eE] [+-]? [0-9]+)?",
    "SIGNED_NUMBER": "[+-]? [0-9]+ ('.' [0-9]+)? ([eE] [+-]? [0-9]+)?",
    "CNAME": "[A-Za-z_] [A-Za-z0-9_]*",
    "WORD": "[A-Za-z]+",
    "ESCAPED_STRING": "'\"' ([^\"\\\\] | '\\\\' .)* '\"'",
}


def _weave_ignore(node: Node, ign: Node) -> Node:
    """Insert an optional ignored-terminal repeat between sequence items
    (Lark `%ignore` semantics, approximated: ignored tokens may appear
    between the tokens of a rule; terminals stay contiguous because weaving
    never descends into Lit/Term/_Regex)."""
    gap = Rep(ign, 0, None)
    if isinstance(node, Seq):
        items: list = []
        for it in node.items:
            if items:
                items.append(gap)
            items.append(_weave_ignore(it, ign))
        return Seq(items)
    if isinstance(node, Alt):
        return Alt([_weave_ignore(o, ign) for o in node.options])
    if isinstance(node, Rep):
        # leading gap per iteration so ignored tokens may sit between
        # repetitions too (e.g. `pair ("," pair)*` with spaces before ",")
        return Rep(Seq([gap, _weave_ignore(node.node, ign)]),
                   node.lo, node.hi)
    return node


def parse_grammar(text: str) -> tuple[dict[str, Node], str]:
    """-> (rules, start_rule). GBNF uses ``::=`` and entry ``root``;
    Lark-style uses ``:`` and entry ``start``. Lark ``%import common.X``
    and ``%ignore`` directives are handled; other ``%`` directives raise a
    clear GrammarParseError instead of being glued onto the previous rule."""
    text = _strip_comments(text)
    gbnf = "::=" in text
    sep = "::=" if gbnf else ":"
    # split out %-directive lines before rule-chunk joining
    directives: list[str] = []
    body_lines: list[str] = []
    for raw in text.splitlines():
        if raw.lstrip().startswith("%"):
            directives.append(raw.strip())
        else:
            body_lines.append(raw)
    # join continuation lines: a rule starts at column 0 with `name sep`
    chunks: list[str] = []
    for raw in body_lines:
        if not raw.strip():
            continue
        head = raw.split(sep, 1)[0].strip()
        is_rule_start = (sep in raw and head.replace("_", "").replace(
            "-", "").isalnum() and not raw[0].isspace())
        if is_rule_start or not chunks:
            chunks.append(raw)
        else:
            chunks[-1] += " " + raw.strip()
    rules: dict[str, Node] = {}
    for chunk in chunks:
        if sep not in chunk:
            raise GrammarParseError(f"expected '{sep}' in rule: {chunk!r}")
        name, body = chunk.split(sep, 1)
        name = name.strip().lstrip("?!")  # lark rule modifiers
        rules[name] = _BodyParser(body.strip(), rules_hint=None).parse()
    ignored: list[Node] = []
    for d in directives:
        parts = d.split()
        if parts[0] == "%import" and len(parts) >= 2:
            target = parts[1]
            base = target.rsplit(".", 1)[-1]
            alias = (parts[3] if len(parts) >= 4 and parts[2] == "->"
                     else base)
            if not target.startswith("common.") or \
                    base not in _COMMON_TERMINALS:
                raise GrammarParseError(
                    f"unsupported %import {target!r} (supported: "
                    f"common.{{{', '.join(sorted(_COMMON_TERMINALS))}}})")
            rules.setdefault(alias,
                             _BodyParser(_COMMON_TERMINALS[base]).parse())
        elif parts[0] == "%ignore" and len(parts) >= 2:
            ignored.append(_BodyParser(" ".join(parts[1:])).parse())
        elif parts[0] == "%declare":
            pass  # declared terminals must be defined elsewhere; no-op
        else:
            raise GrammarParseError(f"unsupported Lark directive: {d!r}")
    if ignored:
        ign = ignored[0] if len(ignored) == 1 else Alt(ignored)
        for name in list(rules):
            if not name.isupper():  # lark: lowercase = rule, UPPER = token
                rules[name] = _weave_ignore(rules[name], ign)
    start = "root" if gbnf else "start"
    if start not in rules:
        if len(rules) == 1:
            start = next(iter(rules))
        else:
            raise GrammarParseError(
                f"grammar must define a '{start}' rule (got "
                f"{sorted(rules)})")
    if ignored and not start.isupper():
        ign = ignored[0] if len(ignored) == 1 else Alt(ignored)
        gap = Rep(ign, 0, None)
        rules[start] = Seq([gap, rules[start], gap])
    return rules, start


class _BodyParser:
    """Recursive-descent parser for a rule body."""

    def __init__(self, s: str, rules_hint=None) -> None:
        self.s = s
        self.i = 0

    def peek(self) -> Optional[str]:
        return self.s[self.i] if self.i < len(self.s) else None

    def eat(self) -> str:
        ch = self.s[self.i]
        self.i += 1
        return ch

    def skip_ws(self) -> None:
        while self.peek() is not None and self.peek() in " \t\n":
            self.i += 1

    def parse(self) -> Node:
        node = self.alternation()
        self.skip_ws()
        if self.i != len(self.s):
            raise GrammarParseError(
                f"grammar body parse error at {self.i}: {self.s!r}")
        return node

    def alternation(self) -> Node:
        opts = [self.sequence()]
        self.skip_ws()
        while self.peek() == "|":
            self.eat()
            opts.append(self.sequence())
            self.skip_ws()
        return opts[0] if len(opts) == 1 else Alt(opts)

    def sequence(self) -> Node:
        items = []
        while True:
            self.skip_ws()
            ch = self.peek()
            if ch is None or ch in "|)":
                break
            items.append(self.repeat())
        if not items:
            return Seq([])
        return items[0] if len(items) == 1 else Seq(items)

    def repeat(self) -> Node:
        node = self.atom()
        while True:
            ch = self.peek()
            if ch == "*":
                self.eat()
                node = Rep(node, 0, None)
            elif ch == "+":
                self.eat()
                node = Rep(node, 1, None)
            elif ch == "?":
                self.eat()
                node = Rep(node, 0, 1)
            elif ch == "{":
                j = self.s.index("}", self.i)
                spec = self.s[self.i + 1:j]
                self.i = j + 1
                if "," in spec:
                    lo_s, hi_s = spec.split(",", 1)
                    lo = int(lo_s or 0)
                    hi = int(hi_s) if hi_s.strip() else None
                else:
                    lo = hi = int(spec)
                node = Rep(node, lo, hi)
            else:
                return node

    def atom(self) -> Node:
        self.skip_ws()
        ch = self.eat()
        if ch == "(":
            node = self.alternation()
            self.skip_ws()
            if self.eat() != ")":
                raise GrammarParseError("unbalanced '(' in grammar body")
            return node
        if ch in "\"'":
            quote = ch
            buf = []
            while True:
                c = self.eat()
                if c == "\\":
                    e = self.eat()
                    buf.append(_LIT_ESCAPES.get(e, e))
                elif c == quote:
                    break
                else:
                    buf.append(c)
            return Lit("".join(buf))
        if ch == "[":
            return Term(self._charclass())
        if ch == ".":
            return Term(DOT)
        if ch == "/":  # Lark inline regex terminal: compile via charsets
            # Support the character-level subset by re-parsing with the
            # body parser (regex and grammar atoms coincide for our subset).
            j = self.i
            depth = 0
            while True:
                if j >= len(self.s):
                    raise GrammarParseError(
                        f"unterminated /regex/ terminal: {self.s[self.i:]!r}")
                c = self.s[j]
                if c == "\\":
                    j += 2
                    continue
                if c == "/" and depth == 0:
                    break
                if c == "[":
                    depth += 1
                if c == "]":
                    depth = max(0, depth - 1)
                j += 1
            pattern = self.s[self.i:j]
            self.i = j + 1
            from aphrodite_tpu.structured_output.fsm import RegexParser
            return _Regex(pattern)
        if ch == "\\":
            esc = self.eat()
            cs = _ESCAPES.get(esc)
            if cs is None and esc.isupper() and esc.lower() in _ESCAPES:
                cs = ("neg", _ESCAPES[esc.lower()])
            return Term(cs if cs is not None else frozenset(esc))
        # rule reference: [A-Za-z_][A-Za-z0-9_-]*
        if ch.isalpha() or ch == "_":
            buf = [ch]
            while self.peek() is not None and (
                    self.peek().isalnum() or self.peek() in "_-"):
                buf.append(self.eat())
            return Ref("".join(buf))
        raise GrammarParseError(f"unexpected {ch!r} in grammar body")

    def _charclass(self):
        neg = False
        if self.peek() == "^":
            self.eat()
            neg = True
        chars: set[str] = set()
        while self.peek() != "]":
            ch = self.eat()
            if ch == "\\":
                esc = self.eat()
                if esc in _ESCAPES:
                    chars |= set(_ESCAPES[esc])
                    continue
                ch = _LIT_ESCAPES.get(esc, esc)
            if self.peek() == "-" and self.s[self.i + 1:self.i + 2] != "]":
                self.eat()
                hi = self.eat()
                if hi == "\\":
                    hi = _LIT_ESCAPES.get(self.eat(), hi)
                for o in range(ord(ch), ord(hi) + 1):
                    chars.add(chr(o))
            else:
                chars.add(ch)
        self.eat()
        return ("neg", frozenset(chars)) if neg else frozenset(chars)


@dataclass
class _Regex:
    pattern: str


# --------------------------------------------------------------------------- #
# rules -> NFA fragment (depth-bounded expansion)
# --------------------------------------------------------------------------- #
def grammar_to_nfa(rules: dict[str, Node], start: str, nfa: NFA,
                   max_depth: int = DEFAULT_MAX_DEPTH) -> Frag:
    """Expand rule references up to ``max_depth`` levels, building one NFA.
    A reference at depth 0 becomes an unmatchable fragment — the lazy DFA's
    liveness check then prunes those paths, so only the bounded-nesting
    sub-language is offered to the sampler."""

    from collections import Counter
    def build(node: Node, depth: Counter) -> Frag:
        if isinstance(node, Lit):
            s = nfa.new_state()
            cur = s
            for ch in node.text:
                nxt = nfa.new_state()
                nfa.add(cur, frozenset(ch), nxt)
                cur = nxt
            return Frag(s, cur)
        if isinstance(node, Term):
            s, e = nfa.new_state(), nfa.new_state()
            nfa.add(s, node.charset, e)
            return Frag(s, e)
        if isinstance(node, _Regex):
            from aphrodite_tpu.structured_output.fsm import RegexParser
            return RegexParser(node.pattern, nfa).parse()
        if isinstance(node, Ref):
            if node.name not in rules:
                raise GrammarParseError(f"undefined rule {node.name!r}")
            # Depth counts RECURSION (re-entering a rule already being
            # expanded), not plain references — non-recursive grammars
            # compile exactly regardless of rule nesting.
            if depth[node.name] >= max_depth or \
                    len(nfa.edges) > MAX_NFA_STATES:
                s, e = nfa.new_state(), nfa.new_state()
                return Frag(s, e)  # disconnected: dead path
            d2 = depth.copy()
            d2[node.name] += 1
            return build(rules[node.name], d2)
        if isinstance(node, Seq):
            if not node.items:
                s = nfa.new_state()
                return Frag(s, s)
            frags = [build(it, depth) for it in node.items]
            for a, b in zip(frags, frags[1:]):
                nfa.add(a.end, EPS, b.start)
            return Frag(frags[0].start, frags[-1].end)
        if isinstance(node, Alt):
            s, e = nfa.new_state(), nfa.new_state()
            for opt in node.options:
                f = build(opt, depth)
                nfa.add(s, EPS, f.start)
                nfa.add(f.end, EPS, e)
            return Frag(s, e)
        if isinstance(node, Rep):
            lo, hi = node.lo, node.hi
            s, e = nfa.new_state(), nfa.new_state()
            if hi is None:
                # lo copies then a loop copy
                cur = s
                for _ in range(lo):
                    f = build(node.node, depth)
                    nfa.add(cur, EPS, f.start)
                    cur = f.end
                f = build(node.node, depth)
                nfa.add(cur, EPS, f.start)
                nfa.add(f.end, EPS, f.start)
                nfa.add(f.end, EPS, e)
                nfa.add(cur, EPS, e)
                return Frag(s, e)
            cur = s
            for idx in range(hi):
                if idx >= lo:
                    nfa.add(cur, EPS, e)
                f = build(node.node, depth)
                nfa.add(cur, EPS, f.start)
                cur = f.end
            nfa.add(cur, EPS, e)
            if lo == 0:
                nfa.add(s, EPS, e)
            return Frag(s, e)
        raise GrammarParseError(f"unknown grammar node {node!r}")

    return build(Ref(start), Counter())


def compile_grammar(text: str, max_depth: int = DEFAULT_MAX_DEPTH):
    """Grammar text -> DFA for the token FSM."""
    from aphrodite_tpu.structured_output.fsm import DFA
    rules, start = parse_grammar(text)
    nfa = NFA()
    frag = grammar_to_nfa(rules, start, nfa, max_depth)
    return DFA.from_nfa(nfa, frag)
