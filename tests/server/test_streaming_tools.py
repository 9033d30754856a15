"""StreamingToolParser: incremental tool-call/reasoning deltas match the
batch parser semantics across chunkings and wire formats."""
import json

import pytest

from aphrodite_tpu.server.tool_parser import StreamingToolParser


def drive(text, chunk=3, parse_think=True):
    p = StreamingToolParser(parse_think=parse_think)
    content, reasoning, calls = "", "", []
    for i in range(0, len(text), chunk):
        c, r, tc = p.feed(text[i:i + chunk])
        content += c
        reasoning += r
        calls.extend(tc)
    c, r, tc = p.feed("")
    content += c
    reasoning += r
    calls.extend(tc)
    c, r, _ = p.flush()
    content += c
    reasoning += r
    return content, reasoning, calls, p


def reconstruct(calls):
    """Aggregate streaming deltas into (name, arguments_json) per index."""
    out = {}
    for d in calls:
        e = out.setdefault(d["index"], {"name": None, "args": ""})
        fn = d.get("function", {})
        if fn.get("name"):
            e["name"] = fn["name"]
        if fn.get("arguments"):
            e["args"] += fn["arguments"]
    return out


@pytest.mark.parametrize("chunk", [1, 3, 7, 100])
def test_hermes_streaming(chunk):
    text = ('I will check the weather. <tool_call>{"name": "get_weather", '
            '"arguments": {"city": "Paris", "unit": "C"}}</tool_call> done')
    content, reasoning, calls, p = drive(text, chunk)
    agg = reconstruct(calls)
    assert agg[0]["name"] == "get_weather"
    assert json.loads(agg[0]["args"]) == {"city": "Paris", "unit": "C"}
    assert "I will check the weather." in content
    assert "<tool_call>" not in content
    assert p.emitted_tool_calls


@pytest.mark.parametrize("chunk", [1, 5])
def test_mistral_array_streaming(chunk):
    text = ('[TOOL_CALLS] [{"name": "a", "arguments": {"x": 1}}, '
            '{"name": "b", "arguments": {}}]')
    content, _, calls, _ = drive(text, chunk)
    agg = reconstruct(calls)
    assert agg[0]["name"] == "a" and json.loads(agg[0]["args"]) == {"x": 1}
    assert agg[1]["name"] == "b" and json.loads(agg[1]["args"]) == {}
    assert content.strip() == ""


def test_internlm_streaming():
    text = ('<|action_start|><|plugin|>{"name": "calc", '
            '"parameters": {"expr": "1+1"}}<|action_end|>')
    _, _, calls, _ = drive(text, 4)
    agg = reconstruct(calls)
    assert agg[0]["name"] == "calc"
    assert json.loads(agg[0]["args"]) == {"expr": "1+1"}


@pytest.mark.parametrize("chunk", [2, 9])
def test_think_reasoning_streaming(chunk):
    text = "<think>step by step</think>The answer is 4."
    content, reasoning, calls, _ = drive(text, chunk)
    assert reasoning == "step by step"
    assert content == "The answer is 4."
    assert calls == []


def test_bare_json_streaming():
    text = '{"name": "f", "arguments": {"k": [1, 2]}}'
    content, _, calls, _ = drive(text, 3)
    agg = reconstruct(calls)
    assert agg[0]["name"] == "f"
    assert json.loads(agg[0]["args"]) == {"k": [1, 2]}


def test_plain_content_untouched():
    text = "Just a normal answer with no tools < or markers."
    content, reasoning, calls, _ = drive(text, 4)
    assert content == text
    assert calls == [] and reasoning == ""


def test_name_emitted_before_args_complete():
    p = StreamingToolParser()
    p.feed('<tool_call>{"name": "slow", "arguments": {"a"')
    _, _, calls = p.feed(": 1}}</tool_call>")
    # name was emitted during the first feed
    p2 = StreamingToolParser()
    _, _, first = p2.feed('<tool_call>{"name": "slow", "arguments": {"a"')
    assert any(d.get("function", {}).get("name") == "slow" for d in first)


@pytest.mark.parametrize("chunk", [1, 2, 5])
def test_brace_content_not_swallowed(chunk):
    """Non-JSON content starting with '{' streams through as content even
    when the first SSE delta is a bare '{' (regression: a 1-char first
    chunk used to irrevocably enter call mode and drop the text)."""
    text = "{not json, just braces} and more."
    content, reasoning, calls, p = drive(text, chunk)
    assert content == text
    assert calls == []
    assert not p.emitted_tool_calls


@pytest.mark.parametrize("chunk", [1, 3])
def test_nameless_json_object_is_content(chunk):
    """A balanced '{...}' that never reveals a function name is plain JSON
    content: recovered, and finished_calls stays 0 (finish_reason must not
    be mislabeled 'tool_calls')."""
    text = '{"answer": 42}'
    content, reasoning, calls, p = drive(text, chunk)
    assert content == text
    assert p.finished_calls == 0
    assert not p.emitted_tool_calls


def test_unfinished_bare_json_flushes_as_content():
    p = StreamingToolParser()
    p.feed('{"partial')
    c, r, calls = p.flush()
    assert c == '{"partial'


def test_bare_json_call_still_parses():
    text = '{"name": "get_weather", "arguments": {"city": "SF"}}'
    content, reasoning, calls, p = drive(text, 3)
    agg = reconstruct(calls)
    assert agg[0]["name"] == "get_weather"
    assert json.loads(agg[0]["args"]) == {"city": "SF"}
    assert p.emitted_tool_calls
