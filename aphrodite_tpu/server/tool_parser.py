"""Tool-call and reasoning-content parsing of model output.

Parity subset of the reference's tool parser zoo
(aphrodite/endpoints/openai/tool_parsers/, ~10 model-specific parsers) and
reasoning parsers (aphrodite/reasoning/). Wire formats covered:
- Hermes/Qwen ``<tool_call>{json}</tool_call>``;
- Jamba ``<tool_calls>[{...}, ...]</tool_calls>``
  (jamba_tool_parser.py:40-45);
- Mistral ``[TOOL_CALLS] [{...}, ...]`` (mistral_tool_parser.py:62-90);
- InternLM2 ``<|action_start|><|plugin|>{json}<|action_end|>``
  (internlm2_tool_parser.py:54-66);
- bare-JSON function calls (Llama-3 style, incl. ';'-chained);
- ``<think>...</think>`` reasoning (DeepSeek-R1 / Qwen3) and Granite's
  "Here is my thought process / response" convention
  (granite_reasoning_parser.py:27-35).
"""
from __future__ import annotations

import json
import re
import uuid
from typing import Optional

_TOOL_CALL_RE = re.compile(r"<tool_call>\s*(\{.*?\})\s*</tool_call>",
                           re.DOTALL)
_JAMBA_RE = re.compile(r"<tool_calls>\s*(\[.*?\])\s*</tool_calls>",
                       re.DOTALL)
_MISTRAL_RE = re.compile(r"\[TOOL_CALLS\]\s*(\[.*\])", re.DOTALL)
_INTERNLM_RE = re.compile(
    r"<\|action_start\|><\|plugin\|>\s*(\{.*?\})\s*(?:<\|action_end\|>|$)",
    re.DOTALL)
_THINK_RE = re.compile(r"<think>(.*?)</think>", re.DOTALL)
_GRANITE_RE = re.compile(
    r"(?:Here's|Here is) my thought process:(.*?)"
    r"(?:Here's|Here is) my response:(.*)", re.DOTALL)


def parse_reasoning(text: str) -> tuple[Optional[str], str]:
    """Split '<think>...</think>rest' -> (reasoning, rest). Handles an
    unterminated think block (everything is reasoning) and Granite's
    prose-delimited thinking sections."""
    m = _THINK_RE.search(text)
    if m:
        rest = text[:m.start()] + text[m.end():]
        return m.group(1).strip(), rest.lstrip("\n")
    if text.lstrip().startswith("<think>"):
        return text.split("<think>", 1)[1].strip(), ""
    m = _GRANITE_RE.search(text)
    if m:
        return m.group(1).strip(), m.group(2).strip()
    return None, text


def _mk_call(name: str, arguments) -> dict:
    if not isinstance(arguments, str):
        arguments = json.dumps(arguments)
    return {
        "id": f"chatcmpl-tool-{uuid.uuid4().hex[:16]}",
        "type": "function",
        "function": {"name": name, "arguments": arguments},
    }


def parse_tool_calls(text: str) -> tuple[list[dict], str]:
    """Returns (tool_calls, remaining_content)."""
    calls: list[dict] = []

    # Hermes/Qwen: <tool_call>{"name": ..., "arguments": {...}}</tool_call>
    def repl(m):
        try:
            obj = json.loads(m.group(1))
            calls.append(_mk_call(obj.get("name", ""),
                                  obj.get("arguments", {})))
            return ""
        except json.JSONDecodeError:
            return m.group(0)

    rest = _TOOL_CALL_RE.sub(repl, text)
    if calls:
        return calls, rest.strip()

    def _from_list(payload: str) -> bool:
        try:
            arr = json.loads(payload)
        except json.JSONDecodeError:
            return False
        if not isinstance(arr, list):
            return False
        for obj in arr:
            if isinstance(obj, dict) and "name" in obj:
                calls.append(_mk_call(
                    obj["name"], obj.get("arguments",
                                         obj.get("parameters", {}))))
        return bool(calls)

    # Jamba: <tool_calls>[{...}, ...]</tool_calls>
    m = _JAMBA_RE.search(text)
    if m and _from_list(m.group(1)):
        return calls, (text[:m.start()] + text[m.end():]).strip()

    # Mistral: [TOOL_CALLS] [{...}, ...]
    m = _MISTRAL_RE.search(text)
    if m and _from_list(m.group(1)):
        return calls, text[:m.start()].strip()

    # InternLM2: <|action_start|><|plugin|>{json}<|action_end|>
    m = _INTERNLM_RE.search(text)
    if m:
        try:
            obj = json.loads(m.group(1))
            if isinstance(obj, dict) and "name" in obj:
                calls.append(_mk_call(
                    obj["name"], obj.get("parameters",
                                         obj.get("arguments", {}))))
                return calls, text[:m.start()].strip()
        except json.JSONDecodeError:
            pass

    # Bare JSON: {"name": ..., "arguments"|"parameters": {...}},
    # optionally ';'-chained (Llama-3 style).
    stripped = text.strip()
    if stripped.startswith("{"):
        for piece in stripped.split(";"):
            try:
                obj = json.loads(piece.strip())
            except json.JSONDecodeError:
                calls.clear()
                break
            if isinstance(obj, dict) and "name" in obj and (
                    "arguments" in obj or "parameters" in obj):
                calls.append(_mk_call(
                    obj["name"], obj.get("arguments",
                                         obj.get("parameters", {}))))
            else:
                calls.clear()
                break
        if calls:
            return calls, ""
    return calls, text
