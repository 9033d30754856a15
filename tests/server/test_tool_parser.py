"""Tool-call / reasoning parser units."""
import json

from aphrodite_tpu.server.tool_parser import parse_reasoning, parse_tool_calls


def test_hermes_tool_call():
    text = ('I will check.\n<tool_call>\n{"name": "get_weather", '
            '"arguments": {"city": "Paris"}}\n</tool_call>')
    calls, rest = parse_tool_calls(text)
    assert len(calls) == 1
    assert calls[0]["function"]["name"] == "get_weather"
    assert json.loads(calls[0]["function"]["arguments"]) == {"city": "Paris"}
    assert rest == "I will check."


def test_multiple_tool_calls():
    text = ('<tool_call>{"name": "a", "arguments": {}}</tool_call>'
            '<tool_call>{"name": "b", "arguments": {"x": 1}}</tool_call>')
    calls, rest = parse_tool_calls(text)
    assert [c["function"]["name"] for c in calls] == ["a", "b"]
    assert rest == ""


def test_bare_json_tool_call():
    text = '{"name": "lookup", "parameters": {"q": "tpu"}}'
    calls, rest = parse_tool_calls(text)
    assert len(calls) == 1
    assert calls[0]["function"]["name"] == "lookup"


def test_no_tool_call():
    calls, rest = parse_tool_calls("just some text")
    assert calls == [] and rest == "just some text"
    calls, rest = parse_tool_calls('{"not": "a tool"}')
    assert calls == []


def test_reasoning_extraction():
    r, rest = parse_reasoning("<think>step by step</think>The answer is 4.")
    assert r == "step by step"
    assert rest == "The answer is 4."
    r2, rest2 = parse_reasoning("no thinking here")
    assert r2 is None and rest2 == "no thinking here"
    r3, rest3 = parse_reasoning("<think>unterminated stream")
    assert r3 == "unterminated stream" and rest3 == ""


def test_mistral_format():
    calls, rest = parse_tool_calls(
        'Sure.[TOOL_CALLS] [{"name": "get_weather", "arguments": '
        '{"city": "Paris"}}, {"name": "t2", "arguments": {}}]')
    assert [c["function"]["name"] for c in calls] == ["get_weather", "t2"]
    assert rest == "Sure."


def test_jamba_format():
    calls, rest = parse_tool_calls(
        'ok <tool_calls>[{"name": "f", "arguments": {"x": 1}}]</tool_calls>')
    assert len(calls) == 1 and calls[0]["function"]["name"] == "f"
    assert rest == "ok"


def test_internlm2_format():
    calls, rest = parse_tool_calls(
        'I will call<|action_start|><|plugin|>{"name": "search", '
        '"parameters": {"q": "tpu"}}<|action_end|>')
    assert len(calls) == 1 and calls[0]["function"]["name"] == "search"
    import json
    assert json.loads(calls[0]["function"]["arguments"]) == {"q": "tpu"}
    assert rest == "I will call"


def test_llama_semicolon_chain():
    calls, rest = parse_tool_calls(
        '{"name": "a", "parameters": {}};{"name": "b", "parameters": {}}')
    assert [c["function"]["name"] for c in calls] == ["a", "b"]
    assert rest == ""


def test_granite_reasoning():
    r, rest = parse_reasoning(
        "Here is my thought process: hmm, tricky. Here is my response: 42.")
    assert r == "hmm, tricky." and rest == "42."
