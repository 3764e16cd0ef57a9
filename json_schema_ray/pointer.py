"""RFC 6901 JSON Pointer evaluation.

Works over plain JSON data or over ``Schema`` nodes (anything exposing
``__getitem__`` by spec keyword name), mirroring the reference's
evaluator (reference: lib/json_pointer/evaluator.rb:12-78) including
its blank-segment-preserving split and ``~0``/``~1`` unescaping.
"""

from __future__ import annotations

import re
from typing import Any

_DIGITS = re.compile(r"^\d+$")


def evaluate(data: Any, original_path: str) -> Any:
    path = original_path
    if path[:1] == "#":
        path = path[1:]
    if path == "":
        return data
    if path[0] != "/":
        raise ValueError(f'Path must begin with a leading "/": {original_path}.')
    parts = _split(path)
    return _evaluate_segment(data, parts)


def _evaluate_segment(data: Any, path_parts: list) -> Any:
    if not path_parts:
        return data
    if data is None:
        # spec doesn't define how to handle this; return None
        return None
    key = _transform_key(path_parts[0])
    rest = path_parts[1:]
    if isinstance(data, list):
        if not _DIGITS.match(key):
            raise ValueError(f'Key operating on an array must be a digit or "-": {key}.')
        idx = int(key)
        value = data[idx] if idx < len(data) else None
        return _evaluate_segment(value, rest)
    try:
        value = data[key]
    except (KeyError, TypeError):
        value = None
    return _evaluate_segment(value, rest)


def _split(path: str) -> list:
    """Split preserving blank segments (reference evaluator.rb:53-69)."""
    parts = []
    last = 0
    while True:
        idx = path.find("/", last)
        if idx == -1:
            break
        parts.append("" if idx == last else path[last:idx])
        last = idx + 1
    parts.append(path[last:])
    parts.pop(0)  # leading "/" produces a blank first segment
    return parts


def _transform_key(key: str) -> str:
    return key.replace("~1", "/").replace("~0", "~")
