"""Error values and Ruby-compatible value rendering.

Semantics derived from the reference implementation's error classes
(reference: lib/json_schema/error.rb:17-84) and Ruby's default
``to_s`` / ``inspect`` formatting, which the reference interpolates
into every validation message. Byte-exact message parity with the
reference's validator_test.rb fixtures depends on these renderers.
"""

from __future__ import annotations

import math
from typing import Any, Optional


def ruby_float_s(f: float) -> str:
    """Render a float the way Ruby ``Float#to_s`` does.

    Ruby always keeps a fractional part (``10.0``), and in exponent
    notation renders ``1.0e-05`` where Python would say ``1e-05``.
    """
    if math.isnan(f):
        return "NaN"
    if math.isinf(f):
        return "Infinity" if f > 0 else "-Infinity"
    s = repr(f)
    if "e" in s or "E" in s:
        mant, _, exp = s.lower().partition("e")
        if "." not in mant:
            mant += ".0"
        sign = "-" if exp.startswith("-") else "+"
        digits = exp.lstrip("+-")
        if len(digits) < 2:
            digits = "0" + digits
        return f"{mant}e{sign}{digits}"
    if "." not in s:
        s += ".0"
    return s


_STR_ESCAPES = {
    "\\": "\\\\",
    '"': '\\"',
    "\n": "\\n",
    "\t": "\\t",
    "\r": "\\r",
    "\f": "\\f",
    "\v": "\\v",
    "\b": "\\b",
    "\a": "\\a",
    "\x1b": "\\e",
    "\0": "\\0",
}


def ruby_str_inspect(s: str) -> str:
    out = ['"']
    for ch in s:
        esc = _STR_ESCAPES.get(ch)
        if esc is not None:
            out.append(esc)
        elif ch < " ":
            out.append("\\u%04X" % ord(ch))
        else:
            out.append(ch)
    out.append('"')
    return "".join(out)


def ruby_inspect(data: Any) -> str:
    """Ruby ``Object#inspect`` over JSON-shaped values."""
    if data is None:
        return "nil"
    if data is True:
        return "true"
    if data is False:
        return "false"
    if isinstance(data, str):
        return ruby_str_inspect(data)
    if isinstance(data, float):
        return ruby_float_s(data)
    if isinstance(data, int):
        return str(data)
    if isinstance(data, list):
        return "[" + ", ".join(ruby_inspect(v) for v in data) + "]"
    if isinstance(data, dict):
        return (
            "{"
            + ", ".join(f"{ruby_inspect(k)}=>{ruby_inspect(v)}" for k, v in data.items())
            + "}"
        )
    return str(data)


def ruby_to_s(data: Any) -> str:
    """Ruby string interpolation ``#{data}`` over JSON-shaped values."""
    if data is None:
        return ""
    if data is True:
        return "true"
    if data is False:
        return "false"
    if isinstance(data, str):
        return data
    if isinstance(data, float):
        return ruby_float_s(data)
    if isinstance(data, int):
        return str(data)
    if isinstance(data, (list, dict)):
        return ruby_inspect(data)
    return str(data)


class Error(Exception):
    pass


class AggregateError(Error):
    """Raised by the bang variants; reference: lib/json_schema/error.rb:5-15."""

    def __init__(self, errors):
        self.errors = errors
        super().__init__(self.__str__())

    def __str__(self) -> str:
        return " ".join(str(e) for e in self.errors)


class SchemaError(Error):
    """Schema-compile-time error; reference: lib/json_schema/error.rb:17-37."""

    def __init__(self, schema, message: str, type: str):
        self.schema = schema
        self.message = message
        self.type = type

    @staticmethod
    def aggregate(errors) -> list:
        return [str(e) for e in errors]

    def __str__(self) -> str:
        if self.schema is not None and self.schema.pointer:
            return f"{self.schema.pointer}: {self.message}"
        return self.message

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"SchemaError({self.type}: {self.message})"


class ValidationError(SchemaError):
    """Data validation error; reference: lib/json_schema/error.rb:39-59."""

    def __init__(self, schema, path, message: str, type: str,
                 data: Any = None, sub_errors: Optional[list] = None):
        super().__init__(schema, message, type)
        self.path = path
        self.data = data
        self.sub_errors = sub_errors

    @property
    def pointer(self) -> str:
        return "/".join(str(p) for p in self.path)

    def __str__(self) -> str:
        return f"{self.pointer}: failed schema {self.schema.pointer}: {self.message}"

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"ValidationError({self.type} @ {self.pointer}: {self.message})"


def to_list(items: list) -> str:
    """English list join with a/an; reference: lib/json_schema/error.rb:61-84."""
    length = len(items)
    if length == 1:
        joined = items[0]
    elif length == 2:
        joined = f"{items[0]} or {items[1]}"
    else:
        joined = ", ".join(items[:-1]) + ", or " + items[-1]
    if joined and joined[0].lower() in "aeiou":
        return f"an {joined}"
    return f"a {joined}"
