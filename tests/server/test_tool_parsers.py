"""Named / model-specific tool parsers: pythonic (Llama-4 style), and
per-family constrained parsing (reference tests/tool_use +
endpoints/openai/tool_parsers/{mistral,llama}_tool_parser.py)."""
import json

import pytest

from aphrodite_tpu.server.tool_parser import (StreamingToolParser,
                                              parse_pythonic_tool_calls,
                                              parse_tool_calls)


# ------------------------------------------------------------- pythonic
def test_pythonic_basic():
    calls, rest = parse_pythonic_tool_calls(
        '[get_weather(city="San Francisco", metric="celsius")]')
    assert rest == ""
    assert len(calls) == 1
    f = calls[0]["function"]
    assert f["name"] == "get_weather"
    assert json.loads(f["arguments"]) == {"city": "San Francisco",
                                          "metric": "celsius"}


def test_pythonic_parallel_calls_and_types():
    calls, rest = parse_pythonic_tool_calls(
        "[f(x=3, flag=True, items=[1, 2], opt=None), g(s='hi')]")
    assert rest == "" and len(calls) == 2
    assert json.loads(calls[0]["function"]["arguments"]) == {
        "x": 3, "flag": True, "items": [1, 2], "opt": None}
    assert json.loads(calls[1]["function"]["arguments"]) == {"s": "hi"}


@pytest.mark.parametrize("text", [
    "plain prose",
    "[1, 2, 3]",                      # list but not calls
    "[f(x=3); g()]",                  # syntax error
    "[f(3)]",                         # positional args not allowed
    "[obj.method(x=1)]",              # dotted names not allowed
    "prefix [f(x=1)]",                # extra content around the list
])
def test_pythonic_rejects_non_calls(text):
    calls, rest = parse_pythonic_tool_calls(text)
    assert calls == [] and rest == text


def test_parse_tool_calls_pythonic_name():
    calls, rest = parse_tool_calls('[f(x=1)]', "pythonic")
    assert len(calls) == 1 and rest == ""
    # auto mode does NOT treat bracket lists as pythonic (too ambiguous
    # with prose/JSON content)
    calls, rest = parse_tool_calls('[f(x=1)]', "auto")
    assert calls == []


# ------------------------------------------------- named-parser constraint
MISTRAL = '[TOOL_CALLS] [{"name": "f", "arguments": {"x": 1}}]'
HERMES = '<tool_call>{"name": "f", "arguments": {"x": 1}}</tool_call>'
LLAMA = '{"name": "f", "arguments": {"x": 1}}'


def test_named_parser_accepts_own_format():
    for name, text in (("mistral", MISTRAL), ("hermes", HERMES),
                       ("llama", LLAMA)):
        calls, rest = parse_tool_calls(text, name)
        assert len(calls) == 1, name
        assert calls[0]["function"]["name"] == "f"


def test_named_parser_rejects_other_formats():
    # A mistral-constrained parser must not fire on hermes output
    calls, rest = parse_tool_calls(HERMES, "mistral")
    assert calls == [] and rest == HERMES
    calls, rest = parse_tool_calls(MISTRAL, "hermes")
    assert calls == [] and rest == MISTRAL


# ------------------------------------------------------------- streaming
def _drain(parser, text, chunk=3):
    content, calls = "", []
    for i in range(0, len(text), chunk):
        c, _, tc = parser.feed(text[i:i + chunk])
        content += c
        calls.extend(tc)
    c, _, tc = parser.flush()
    content += c
    calls.extend(tc)
    return content, calls


def test_streaming_pythonic_whole_call_at_flush():
    p = StreamingToolParser(parser_name="pythonic")
    content, calls = _drain(p, '[get_weather(city="SF")]')
    assert content == ""
    names = [c["function"].get("name") for c in calls
             if "name" in c["function"]]
    assert names == ["get_weather"]
    args = "".join(c["function"].get("arguments", "") for c in calls)
    assert json.loads(args) == {"city": "SF"}
    assert p.emitted_tool_calls


def test_streaming_pythonic_prose_passthrough():
    p = StreamingToolParser(parser_name="pythonic")
    content, calls = _drain(p, "just some text")
    assert content == "just some text" and calls == []


def test_streaming_named_mistral():
    p = StreamingToolParser(parser_name="mistral")
    content, calls = _drain(p, MISTRAL)
    args = "".join(c["function"].get("arguments", "") for c in calls)
    assert json.loads(args) == {"x": 1}
    # and hermes markers stream through as content under mistral
    p2 = StreamingToolParser(parser_name="mistral")
    content, calls = _drain(p2, HERMES)
    assert calls == [] and content == HERMES


def test_streaming_named_llama_bare_json():
    p = StreamingToolParser(parser_name="llama")
    content, calls = _drain(p, LLAMA)
    assert content == ""
    args = "".join(c["function"].get("arguments", "") for c in calls)
    assert json.loads(args) == {"x": 1}


def test_internlm2_constrained_no_bare_json_fallthrough():
    """--tool-call-parser internlm2 must NOT fire on bare-JSON content
    (review finding: it fell through to the llama parser)."""
    calls, rest = parse_tool_calls(LLAMA, "internlm2")
    assert calls == [] and rest == LLAMA
    intern = ('<|action_start|><|plugin|>{"name": "f", "parameters": '
              '{"x": 1}}<|action_end|>')
    calls, _ = parse_tool_calls(intern, "internlm2")
    assert len(calls) == 1


def test_named_reasoning_parsers():
    from aphrodite_tpu.server.tool_parser import parse_reasoning
    think = "<think>plan</think>answer"
    granite = "Here is my thought process: plan Here is my response: answer"
    # deepseek_r1/qwen3 accept <think>, reject granite prose
    for name in ("auto", "deepseek_r1", "qwen3"):
        r, c = parse_reasoning(think, name)
        assert r == "plan" and c == "answer", name
    assert parse_reasoning(granite, "deepseek_r1") == (None, granite)
    # granite accepts prose, rejects nothing-to-split and... <think> stays
    r, c = parse_reasoning(granite, "granite")
    assert r == "plan" and c == "answer"
    assert parse_reasoning(think, "granite") == (None, think)
    # none disables splitting entirely
    assert parse_reasoning(think, "none") == (None, think)
    # streaming: reasoning_parser="none" passes think markers as content
    from aphrodite_tpu.server.tool_parser import StreamingToolParser
    p = StreamingToolParser(reasoning_parser="none")
    content, _ = _drain(p, think)
    assert content == think
