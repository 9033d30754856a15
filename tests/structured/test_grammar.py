"""Grammar backend (EBNF/Lark/GBNF -> depth-bounded NFA -> lazy DFA)."""
import pytest

from aphrodite_tpu.structured_output.fsm import TokenFSM
from aphrodite_tpu.structured_output.grammar import (GrammarParseError,
                                                     compile_grammar,
                                                     parse_grammar)

GBNF_EXPR = r"""
# arithmetic over single digits
root ::= expr
expr ::= term (("+" | "-") term)*
term ::= factor (("*" | "/") factor)*
factor ::= num | "(" expr ")"
num ::= [0-9]+
"""

LARK_JSON = r"""
start: value
value: object | array | string | number | "true" | "false" | "null"
object: "{" (pair ("," pair)*)? "}"
pair: string ":" value
array: "[" (value ("," value)*)? "]"
string: "\"" [a-zA-Z0-9_ ]* "\""
number: "-"? [0-9]+ ("." [0-9]+)?
"""


def accepts(dfa, text):
    return dfa.is_final(dfa.walk(dfa.start, text))


def test_gbnf_arithmetic():
    d = compile_grammar(GBNF_EXPR)
    assert accepts(d, "1+2*3")
    assert accepts(d, "12")
    assert accepts(d, "(1+2)*(3-4)/5")
    assert not accepts(d, "1+")
    assert not accepts(d, "+1")
    assert not accepts(d, "(1")
    # nesting within the depth bound
    assert accepts(d, "((((1))))")


def test_lark_json():
    d = compile_grammar(LARK_JSON)
    assert accepts(d, '{"a":1}')
    assert accepts(d, '{"a":{"b":[1,2,{"c":"x"}]},"d":null}')
    assert accepts(d, "[]")
    assert accepts(d, "[1,-2.5,true]")
    assert not accepts(d, '{"a":}')
    assert not accepts(d, "[1,")
    assert not accepts(d, "tru")


def test_depth_bound_prunes_not_crashes():
    d = compile_grammar(GBNF_EXPR, max_depth=4)
    assert accepts(d, "1+1")
    # parenthesis nesting deeper than the bound is simply not offered
    deep = "(" * 10 + "1" + ")" * 10
    assert not accepts(d, deep)


def test_token_masks_follow_grammar():
    d = compile_grammar(GBNF_EXPR)
    vocab = ["1", "+", "(", ")", "12", "+2", "*", ""]
    fsm = TokenFSM(d, vocab)
    allowed, fin = fsm.allowed(d.start)
    assert not fin
    assert set(allowed) == {0, 2, 4}  # digits or open paren
    st = fsm.advance(d.start, 0)  # "1"
    allowed2, fin2 = fsm.allowed(st)
    assert fin2  # "1" is a complete expression
    assert 1 in allowed2 and 6 in allowed2 and 3 not in allowed2


def test_parse_errors():
    with pytest.raises(GrammarParseError):
        compile_grammar("root ::= undefined_rule")
    with pytest.raises(GrammarParseError):
        compile_grammar("a ::= \"x\"\nb ::= \"y\"")  # no root


def test_comments_and_formats():
    rules, start = parse_grammar("root ::= \"a\"  # trailing comment")
    assert start == "root"
    rules, start = parse_grammar("start: \"a\" // lark comment")
    assert start == "start"


def test_guided_grammar_end_to_end_masks():
    """Manager-level: guided_grammar produces masks that force valid
    arithmetic over a toy vocabulary."""
    from aphrodite_tpu.structured_output import StructuredOutputManager
    from aphrodite_tpu.sampling_params import GuidedDecodingParams

    class ToyTok:
        all_special_ids = [7]

        def decode(self, ids):
            return ["1", "+", "(", ")", "2", "*", "/", "<eos>"][ids[0]]

    mgr = StructuredOutputManager(ToyTok(), 8, eos_token_id=7)
    mgr.add_request("r1", GuidedDecodingParams(grammar=GBNF_EXPR))
    row = mgr.bitmask_row("r1")
    allowed = [i for i in range(8) if row[i // 32] >> (i % 32) & 1]
    assert set(allowed) == {0, 2, 4}
    mgr.advance("r1", [0])  # "1"
    row = mgr.bitmask_row("r1")
    allowed = [i for i in range(8) if row[i // 32] >> (i % 32) & 1]
    assert 7 in allowed  # EOS legal (complete expr)
    assert 1 in allowed and 5 in allowed and 3 not in allowed


def test_lark_directives_import_ignore():
    """%import common.* and %ignore are honored; ignored terminals may sit
    between rule tokens (and between repetitions), never inside tokens."""
    g = r"""
start: "[" (pair ("," pair)*)? "]"
pair: NUMBER
%import common.NUMBER
%import common.WS
%ignore WS
"""
    d = compile_grammar(g)
    assert accepts(d, "[1, 2.5 ,3]")
    assert accepts(d, "[ 1 ]")
    assert accepts(d, " [1] ")
    assert accepts(d, "[]")
    assert not accepts(d, "[1,,2]")
    assert not accepts(d, "[1 2]")


def test_lark_directive_errors_are_clear():
    with pytest.raises(GrammarParseError, match="unsupported Lark"):
        parse_grammar('start: "x"\n%override foo')
    with pytest.raises(GrammarParseError, match="unsupported %import"):
        parse_grammar('start: "x"\n%import mymod.THING')
    with pytest.raises(GrammarParseError, match="unterminated /regex/"):
        parse_grammar("start: /abc")
