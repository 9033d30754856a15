"""Tool-call and reasoning-content parsing of model output.

Parity subset of the reference's tool parser zoo
(aphrodite/endpoints/openai/tool_parsers/, ~10 model-specific parsers) and
reasoning parsers (aphrodite/reasoning/): covers the two dominant wire
formats — Hermes/Qwen ``<tool_call>{json}</tool_call>`` and bare-JSON
function calls (Llama-3 style) — plus ``<think>...</think>`` reasoning
extraction (DeepSeek-R1 / Qwen3 convention).
"""
from __future__ import annotations

import json
import re
import uuid
from typing import Optional

_TOOL_CALL_RE = re.compile(r"<tool_call>\s*(\{.*?\})\s*</tool_call>",
                           re.DOTALL)
_THINK_RE = re.compile(r"<think>(.*?)</think>", re.DOTALL)


def parse_reasoning(text: str) -> tuple[Optional[str], str]:
    """Split '<think>...</think>rest' -> (reasoning, rest). Handles an
    unterminated think block (everything is reasoning)."""
    m = _THINK_RE.search(text)
    if m:
        rest = text[:m.start()] + text[m.end():]
        return m.group(1).strip(), rest.lstrip("\n")
    if text.lstrip().startswith("<think>"):
        return text.split("<think>", 1)[1].strip(), ""
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

    # Bare JSON: {"name": ..., "arguments"|"parameters": {...}}
    stripped = text.strip()
    if stripped.startswith("{"):
        try:
            obj = json.loads(stripped)
            if isinstance(obj, dict) and "name" in obj and (
                    "arguments" in obj or "parameters" in obj):
                calls.append(_mk_call(
                    obj["name"], obj.get("arguments",
                                         obj.get("parameters", {}))))
                return calls, ""
        except json.JSONDecodeError:
            pass
    return calls, text
