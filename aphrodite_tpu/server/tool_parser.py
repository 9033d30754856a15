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


# Named reasoning parsers (reference aphrodite/reasoning/: deepseek_r1,
# qwen3, granite parsers selected by --reasoning-parser). "auto" tries
# the <think> family then Granite prose; "none" disables splitting.
REASONING_PARSERS = ("auto", "deepseek_r1", "qwen3", "granite", "none")


def parse_reasoning(text: str, parser_name: str = "auto"
                    ) -> tuple[Optional[str], str]:
    """Split '<think>...</think>rest' -> (reasoning, rest). Handles an
    unterminated think block (everything is reasoning) and Granite's
    prose-delimited thinking sections. ``parser_name`` constrains the
    recognized convention (deepseek_r1/qwen3 both use <think>)."""
    if parser_name == "none":
        return None, text
    if parser_name in ("auto", "deepseek_r1", "qwen3"):
        m = _THINK_RE.search(text)
        if m:
            rest = text[:m.start()] + text[m.end():]
            return m.group(1).strip(), rest.lstrip("\n")
        if text.lstrip().startswith("<think>"):
            return text.split("<think>", 1)[1].strip(), ""
        if parser_name != "auto":
            return None, text
    m = _GRANITE_RE.search(text)
    if m and parser_name in ("auto", "granite"):
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


def parse_pythonic_tool_calls(text: str) -> tuple[list[dict], str]:
    """Llama-4 / pythonic tool format: the whole output is a Python list
    of calls with keyword args, e.g. ``[get_weather(city="SF"), f(x=3)]``
    (reference endpoints/openai/tool_parsers pythonic parser semantics).
    Returns ([], text) unless the ENTIRE text parses as such a list."""
    import ast
    stripped = text.strip()
    if not (stripped.startswith("[") and stripped.endswith("]")):
        return [], text
    try:
        tree = ast.parse(stripped, mode="eval")
    except SyntaxError:
        return [], text
    if not isinstance(tree.body, ast.List) or not tree.body.elts:
        return [], text
    calls = []
    for el in tree.body.elts:
        if not (isinstance(el, ast.Call) and isinstance(el.func, ast.Name)
                and not el.args):
            return [], text
        args = {}
        for kw in el.keywords:
            if kw.arg is None:
                return [], text
            try:
                args[kw.arg] = ast.literal_eval(kw.value)
            except (ValueError, SyntaxError):
                return [], text
        calls.append(_mk_call(el.func.id, args))
    return calls, ""


# Named-parser registry (reference --tool-call-parser): each name maps to
# the subset of stream markers that model family emits; "llama" is the
# bare-JSON format (no markers), "pythonic" is the ast-parsed list above.
PARSER_MARKERS = {
    "hermes": [("<tool_call>", "</tool_call>", False)],
    "jamba": [("<tool_calls>", "</tool_calls>", True)],
    "mistral": [("[TOOL_CALLS]", None, True)],
    "internlm2": [("<|action_start|><|plugin|>", "<|action_end|>", False)],
    "llama": [],
    "llama3_json": [],
    "pythonic": [],
}


def parse_tool_calls(text: str, parser_name: str = "auto"
                     ) -> tuple[list[dict], str]:
    """Returns (tool_calls, remaining_content). ``parser_name`` constrains
    parsing to one model family's wire format ("auto" tries them all)."""
    if parser_name == "pythonic":
        return parse_pythonic_tool_calls(text)
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

    if parser_name in ("auto", "hermes"):
        rest = _TOOL_CALL_RE.sub(repl, text)
        if calls:
            return calls, rest.strip()
    if parser_name == "hermes":
        return [], text

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
    if parser_name in ("auto", "jamba"):
        m = _JAMBA_RE.search(text)
        if m and _from_list(m.group(1)):
            return calls, (text[:m.start()] + text[m.end():]).strip()
        if parser_name == "jamba":
            return [], text

    # Mistral: [TOOL_CALLS] [{...}, ...]
    if parser_name in ("auto", "mistral"):
        m = _MISTRAL_RE.search(text)
        if m and _from_list(m.group(1)):
            return calls, text[:m.start()].strip()
        if parser_name == "mistral":
            return [], text

    # InternLM2: <|action_start|><|plugin|>{json}<|action_end|>
    if parser_name in ("auto", "internlm2"):
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
        if parser_name == "internlm2":
            return [], text

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


# --------------------------------------------------------------------------- #
# streaming parser
# --------------------------------------------------------------------------- #
_MARKERS = [
    # (open marker, close marker or None, payload is array?)
    ("<tool_call>", "</tool_call>", False),
    ("<tool_calls>", "</tool_calls>", True),
    ("[TOOL_CALLS]", None, True),
    ("<|action_start|><|plugin|>", "<|action_end|>", False),
]
_MAX_MARKER = max(len(m[0]) for m in _MARKERS)
_NAME_RE = re.compile(r'"name"\s*:\s*"((?:[^"\\]|\\.)*)"')
_ARGS_KEY_RE = re.compile(r'"(?:arguments|parameters)"\s*:\s*')


class StreamingToolParser:
    """Incremental tool-call parsing for SSE chat deltas.

    Feed text deltas; each feed() returns (content_delta, reasoning_delta,
    tool_call_deltas) where tool_call_deltas follow the OpenAI streaming
    shape: [{"index": i, "id": ..., "type": "function",
    "function": {"name": ...}}] first, then argument fragments
    [{"index": i, "function": {"arguments": "..."}}]. Covers the same wire
    formats as the batch parser above, streamed: the function name is
    emitted as soon as the partial JSON reveals it, and the raw text of the
    arguments object streams through as it arrives (reference:
    aphrodite/endpoints/openai/tool_parsers/hermes_tool_parser.py
    extract_tool_calls_streaming and siblings, redesigned as one
    format-table-driven incremental scanner)."""

    def __init__(self, parse_think: bool = True,
                 parser_name: str = "auto",
                 reasoning_parser: str = "auto") -> None:
        if reasoning_parser == "none":
            parse_think = False
        self.reasoning_parser = reasoning_parser
        self.parser_name = parser_name
        self.markers = (PARSER_MARKERS[parser_name]
                        if parser_name in PARSER_MARKERS else _MARKERS)
        self._max_marker = max((len(m[0]) for m in self.markers),
                               default=0)
        # pythonic: the whole output may be a Python call list -- buffer
        # and decide at flush (arguments are not valid JSON until the
        # expression completes, so nothing can stream earlier)
        self.pythonic = parser_name == "pythonic"
        self.buf = ""
        self.mode = "scan"       # scan | think | call
        self.parse_think = parse_think
        self.started = False     # saw any non-space output yet
        self.close_marker = None
        self.is_array = False
        self.call_index = -1
        self.name_sent = False
        self.args_started = False
        self.args_depth = 0
        self.args_in_str = False
        self.args_esc = False
        self.body = ""           # accumulated JSON body of the current call
        self.finished_calls = 0
        self.args_emitted = False  # any argument fragment emitted this call
        self.recovered = ""      # bare-call body recovered as content

    # ---- helpers ---------------------------------------------------------
    def _find_marker(self, text):
        best = None
        for op, cl, arr in self.markers:
            i = text.find(op)
            if i >= 0 and (best is None or i < best[0]):
                best = (i, op, cl, arr)
        # Bare JSON tool call: only at the very start of output, and only
        # once the buffer confirms '{"' — a lone '{' first chunk is held
        # back in scan mode instead (see feed), so non-JSON content that
        # merely begins with '{' is never irrevocably consumed as a call.
        if not self.started and self.parser_name in ("auto", "llama",
                                                     "llama3_json"):
            ls = text.lstrip()
            if ls.startswith('{"'):
                i = text.find("{")
                if best is None or i < best[0]:
                    best = (i, "", None, False)
        return best

    def _marker_prefix_len(self, text):
        """Longest suffix of `text` that is a prefix of any open marker
        (held back so a split marker is not emitted as content)."""
        for n in range(min(len(text), self._max_marker), 0, -1):
            suf = text[-n:]
            if any(m[0].startswith(suf) for m in self.markers):
                return n
        return 0

    def feed(self, delta: str):
        self.buf += delta
        content, reasoning, calls = "", "", []
        if self.pythonic:
            ls = self.buf.lstrip()
            if not ls:
                return content, reasoning, calls
            if ls.startswith("["):
                return content, reasoning, calls  # hold until flush
            c, self.buf = self.buf, ""
            self.started = True
            return c, reasoning, calls
        progressed = True
        while progressed:
            progressed = False
            if self.mode == "scan":
                if self.parse_think and not self.started and \
                        self.buf.lstrip().startswith("<think>"):
                    self.buf = self.buf.split("<think>", 1)[1]
                    self.mode = "think"
                    progressed = True
                    continue
                if self.parse_think and not self.started and \
                        "<think>".startswith(self.buf.lstrip() or "<"):
                    break  # might still become a think block
                m = self._find_marker(self.buf)
                if m is not None:
                    i, op, cl, arr = m
                    content += self.buf[:i]
                    self.buf = self.buf[i + len(op):]
                    self.mode = "call"
                    self.close_marker = cl
                    self.is_array = arr
                    self.call_index = self.finished_calls
                    self.name_sent = False
                    self.args_started = False
                    self.args_emitted = False
                    self.body = ""
                    self.started = True
                    progressed = True
                    continue
                if not self.started and self.buf.lstrip() == "{":
                    break  # might still become a bare '{"' tool call
                hold = self._marker_prefix_len(self.buf)
                emit = self.buf[:len(self.buf) - hold]
                if emit:
                    content += emit
                    if emit.strip():
                        self.started = True
                    self.buf = self.buf[len(emit):]
                break
            if self.mode == "think":
                j = self.buf.find("</think>")
                if j >= 0:
                    reasoning += self.buf[:j]
                    self.buf = self.buf[j + len("</think>"):]
                    self.mode = "scan"
                    progressed = True
                    continue
                hold = 0
                for n in range(min(len(self.buf), 8), 0, -1):
                    if "</think>".startswith(self.buf[-n:]):
                        hold = n
                        break
                emit = self.buf[:len(self.buf) - hold]
                if emit:
                    reasoning += emit
                    self.buf = self.buf[len(emit):]
                break
            if self.mode == "scan_close":
                j = self.buf.find(self.close_marker)
                if j >= 0:
                    self.buf = self.buf[j + len(self.close_marker):]
                    self.mode = "scan"
                    progressed = True
                    continue
                break
            if self.mode == "call":
                calls.extend(self._feed_call())
                if self.recovered:
                    content += self.recovered
                    self.recovered = ""
                if self.mode == "call":
                    break
                progressed = True
        return content, reasoning, calls

    def _feed_call(self):
        """Consume self.buf while inside a call payload."""
        out = []
        # strip a leading '[' of array payloads / ',' between elements
        while self.buf and not self.body and self.buf[0] in " \n\t[,":
            self.buf = self.buf[1:]
        if self.close_marker and self.buf.startswith(
                self.close_marker[:len(self.buf)]) and \
                self.close_marker.startswith(self.buf):
            return out  # partial close marker: wait
        # move chars into body until the object closes
        while self.buf:
            if self.close_marker is not None and not self.body and \
                    self.buf.startswith(self.close_marker):
                self.buf = self.buf[len(self.close_marker):]
                self.mode = "scan"
                return out
            if self.buf and self.buf[0] == "]" and not self.body:
                # array payload exhausted
                self.buf = self.buf[1:]
                if self.close_marker:
                    j = self.buf.find(self.close_marker)
                    if j >= 0:
                        self.buf = self.buf[j + len(self.close_marker):]
                self.mode = "scan"
                return out
            ch = self.buf[0]
            self.buf = self.buf[1:]
            self.body += ch
            if self.args_started:
                if self.args_in_str:
                    if self.args_esc:
                        self.args_esc = False
                    elif ch == "\\":
                        self.args_esc = True
                    elif ch == '"':
                        self.args_in_str = False
                elif ch == '"':
                    self.args_in_str = True
                elif ch in "{[":
                    self.args_depth += 1
                elif ch in "}]":
                    self.args_depth -= 1
                out.append({"index": self.call_index,
                            "function": {"arguments": ch}})
                self.args_emitted = True
                if self.args_depth == 0 and not self.args_in_str:
                    self.args_started = False
            if not self.name_sent:
                m = _NAME_RE.search(self.body)
                if m:
                    self.name_sent = True
                    out.append({
                        "index": self.call_index,
                        "id": f"chatcmpl-tool-{uuid.uuid4().hex[:16]}",
                        "type": "function",
                        "function": {"name": json.loads(
                            '"' + m.group(1) + '"'), "arguments": ""}})
            if not self.args_started:
                m = _ARGS_KEY_RE.search(self.body)
                if m and m.end() == len(self.body):
                    self.args_started = True
                    self.args_depth = 0
                    self.args_in_str = False
                    self.args_esc = False
            # whole object complete? depth-track the body itself
            if self._object_closed():
                if self.close_marker is None and not self.is_array and \
                        not self.name_sent and not self.args_emitted:
                    # balanced bare '{...}' that never revealed a function
                    # name: plain JSON content, not a tool call — recover it
                    # (and don't bump finished_calls, so finish_reason stays
                    # 'stop').
                    self.recovered += self.body
                    self.body = ""
                    self.mode = "scan"
                    return out
                self.finished_calls += 1
                if self.is_array:
                    self.call_index = self.finished_calls
                    self.name_sent = False
                    self.args_started = False
                    self.args_emitted = False
                    self.body = ""
                    # continue consuming next element or ']'
                    while self.buf and self.buf[0] in " \n\t,":
                        self.buf = self.buf[1:]
                    continue
                if self.close_marker:
                    j = self.buf.find(self.close_marker)
                    if j >= 0:
                        self.buf = self.buf[j + len(self.close_marker):]
                        self.mode = "scan"
                        return out
                    if len(self.buf) < len(self.close_marker):
                        # wait for the close marker
                        self.body = ""
                        self.mode = "scan_close"
                        return out
                self.mode = "scan"
                return out
        return out

    def _object_closed(self) -> bool:
        depth = 0
        in_str = esc = False
        seen = False
        for ch in self.body:
            if in_str:
                if esc:
                    esc = False
                elif ch == "\\":
                    esc = True
                elif ch == '"':
                    in_str = False
            elif ch == '"':
                in_str = True
            elif ch == "{":
                depth += 1
                seen = True
            elif ch == "}":
                depth -= 1
        return seen and depth == 0

    def flush(self):
        """End of stream: return any held-back content."""
        if self.pythonic and self.buf:
            found, rest = parse_pythonic_tool_calls(self.buf)
            self.buf = ""
            if not found:
                return rest, "", []
            out = []
            for c in found:
                out.append({"index": self.finished_calls,
                            "id": c["id"], "type": "function",
                            "function": {"name": c["function"]["name"],
                                         "arguments": ""}})
                out.append({"index": self.finished_calls,
                            "function": {"arguments":
                                         c["function"]["arguments"]}})
                self.finished_calls += 1
            return "", "", out
        if self.mode == "scan_close":
            self.mode = "scan"
            return "", "", []
        if self.mode == "think":
            r, self.buf = self.buf, ""
            return "", r, []
        if self.mode == "scan":
            c, self.buf = self.buf, ""
            return c, "", []
        if self.mode == "call" and self.close_marker is None and \
                not self.name_sent and not self.args_emitted:
            # bare-JSON candidate that never became a call: return the
            # consumed body as content instead of silently dropping it
            c = self.body + self.buf
            self.body, self.buf = "", ""
            return c, "", []
        return "", "", []

    @property
    def emitted_tool_calls(self) -> bool:
        return self.finished_calls > 0 or self.name_sent
