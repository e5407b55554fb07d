"""Mapping rule trees with the reference's DictionaryMapping semantics.

The reference loads hjson rule files (kgforge/core/archetypes/mapping.py:57-77,
kgforge/specializations/mappings/dictionaries.py:31-48). hjson isn't available
here, so `parse_hjson` is a from-scratch parser for the subset the reference's
mapping corpus actually uses: unquoted keys, unquoted string values (kept
verbatim — they are Python expressions to be eval'd), quoted strings, numbers,
booleans, nested objects/arrays (block or inline), comments (#, //), trailing
commas.
"""

from __future__ import annotations

import json
from typing import Any


class Mapping:
    """A parsed rule tree. `load` accepts a dict, JSON text, hjson text, or a
    file path — mirroring Mapping.load's str/file dispatch (mapping.py:57-77).
    """

    def __init__(self, rules: dict):
        self.rules = rules

    @classmethod
    def load(cls, source: Any) -> "Mapping":
        if isinstance(source, Mapping):
            return source
        if isinstance(source, dict):
            return cls(source)
        text = source
        if isinstance(source, str) and "\n" not in source and source.endswith(
                (".hjson", ".json")):
            with open(source, encoding="utf-8") as f:
                text = f.read()
        try:
            return cls(json.loads(text))
        except (json.JSONDecodeError, TypeError):
            return cls(parse_hjson(text))

    def __repr__(self) -> str:
        return f"Mapping({json.dumps(self.rules, default=str)[:80]}...)"


def _strip_comment_lines(text: str) -> list[str]:
    out = []
    for line in text.splitlines():
        s = line.strip()
        if s.startswith("#") or s.startswith("//"):
            continue
        out.append(line)
    return out


def _coerce_scalar(raw: str) -> Any:
    """Quoted → JSON string; number/bool/null → typed; else verbatim text."""
    s = raw.strip().rstrip(",").strip()
    if not s:
        return ""
    try:
        return json.loads(s)
    except json.JSONDecodeError:
        return s


def parse_hjson(text: str) -> Any:
    lines = _strip_comment_lines(text)
    pos = 0

    def skip_blank(i: int) -> int:
        while i < len(lines) and not lines[i].strip():
            i += 1
        return i

    def parse_value_block(i: int):
        """Parse the value starting at line i (which is '{', '[', or inline)."""
        i = skip_blank(i)
        s = lines[i].strip()
        if s.startswith("{"):
            return parse_object(i)
        if s.startswith("["):
            return parse_array(i)
        return _coerce_scalar(s), i + 1

    def parse_object(i: int):
        obj: dict[str, Any] = {}
        s = lines[i].strip()
        if s != "{":  # inline object on one line
            try:
                return json.loads(s.rstrip(",")), i + 1
            except json.JSONDecodeError:
                pass
        i += 1
        while True:
            i = skip_blank(i)
            s = lines[i].strip()
            if s.startswith("}"):
                return obj, i + 1
            # key: value  |  key: (block follows)
            key, _, rest = s.partition(":")
            key = key.strip().strip('"').strip("'")
            rest = rest.strip()
            if rest == "" or rest in ("{", "["):
                if rest:
                    # `key: {` on one line — treat as block opener
                    lines[i] = rest
                    val, i = parse_value_block(i)
                else:
                    val, i = parse_value_block(i + 1)
                obj[key] = val
            elif rest.startswith(("{", "[")):
                try:
                    obj[key] = json.loads(rest.rstrip(","))
                    i += 1
                except json.JSONDecodeError:
                    lines[i] = rest
                    val, i = parse_value_block(i)
                    obj[key] = val
            else:
                obj[key] = _coerce_scalar(rest)
                i += 1

    def parse_array(i: int):
        arr: list[Any] = []
        s = lines[i].strip()
        if s != "[":
            try:
                return json.loads(s.rstrip(",")), i + 1
            except json.JSONDecodeError:
                pass
        i += 1
        while True:
            i = skip_blank(i)
            s = lines[i].strip()
            if s.startswith("]"):
                return arr, i + 1
            if s.startswith("{") or s.startswith("["):
                val, i = parse_value_block(i)
                arr.append(val)
            else:
                arr.append(_coerce_scalar(s))
                i += 1

    pos = skip_blank(pos)
    value, _ = parse_value_block(pos)
    return value
