"""JSON-schema (subset) -> regex, for guided_json constraints.

Covers the schema shapes the reference's guided-json tests exercise:
typed scalars, enums/consts, objects with (required) properties, arrays,
nested combinations. Free-form "json_object" mode gets a generic
one-level-nested JSON value pattern.
"""
from __future__ import annotations

import json
from typing import Any, Union

WS = r"[ \n\t]{0,8}"
STRING = r'"[^"\\\x00-\x1f]{0,256}"'
INTEGER = r"-?(0|[1-9]\d{0,15})"
NUMBER = INTEGER + r"(\.\d{1,15})?([eE][+-]?\d{1,3})?"
BOOLEAN = r"(true|false)"
NULL = r"null"


def _value_regex(schema: dict, depth: int = 0) -> str:
    if depth > 6:
        return STRING
    if not schema:
        return _any_value(depth)
    if "enum" in schema:
        return "(" + "|".join(
            _escape_literal(json.dumps(v)) for v in schema["enum"]) + ")"
    if "const" in schema:
        return _escape_literal(json.dumps(schema["const"]))
    t = schema.get("type")
    if isinstance(t, list):
        return "(" + "|".join(
            _value_regex({**schema, "type": tt}, depth) for tt in t) + ")"
    if t == "string":
        return STRING
    if t == "integer":
        return INTEGER
    if t == "number":
        return NUMBER
    if t == "boolean":
        return BOOLEAN
    if t == "null":
        return NULL
    if t == "array":
        item = _value_regex(schema.get("items", {}), depth + 1)
        elem = WS + item + WS
        return (r"\[(" + elem + r"(," + elem + r"){0,31})?\]")
    if t == "object" or "properties" in schema:
        props = schema.get("properties", {})
        if not props:
            return _any_value(depth)
        parts = []
        for i, (key, sub) in enumerate(props.items()):
            kv = (WS + _escape_literal(json.dumps(key)) + WS + ":" + WS +
                  _value_regex(sub, depth + 1))
            parts.append(kv)
        body = ",".join(parts)
        return r"\{" + body + WS + r"\}"
    return _any_value(depth)


def _any_value(depth: int) -> str:
    scalar = f"({STRING}|{NUMBER}|{BOOLEAN}|{NULL})"
    if depth >= 2:
        return scalar
    inner = WS + scalar + WS
    arr = r"\[(" + inner + r"(," + inner + r"){0,15})?\]"
    kv = WS + STRING + WS + ":" + inner
    obj = r"\{(" + kv + r"(," + kv + r"){0,15})?" + WS + r"\}"
    return f"({scalar}|{arr}|{obj})"


_REGEX_SPECIALS = set(r"\^$.|?*+()[]{}")


def _escape_literal(text: str) -> str:
    return "".join("\\" + c if c in _REGEX_SPECIALS else c for c in text)


def schema_to_regex(schema: Union[str, dict, None]) -> str:
    """Compile a JSON schema (or None for free-form JSON) to a regex."""
    if isinstance(schema, str):
        schema = json.loads(schema)
    if schema is None:
        schema = {}
    return WS + _value_regex(schema) + WS
