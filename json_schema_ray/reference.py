"""JSON Reference = (optional URI, JSON Pointer) pair.

Mirrors the reference's normalization rules (reference:
lib/json_reference.rb:15-34): split on ``#``, prepend ``#`` to the
pointer, strip a trailing ``/``.
"""

from __future__ import annotations

from functools import total_ordering
from typing import Any, Optional
from urllib.parse import urlparse

from . import pointer as json_pointer


class Uri:
    """Minimal stand-in for Ruby's ``URI`` objects used by the expander.

    Only the pieces the reference touches: ``host``, ``scheme``,
    ``path``, ``absolute?``, ``to_s``.
    """

    def __init__(self, raw: str):
        self.raw = raw
        p = urlparse(raw)
        self.scheme: Optional[str] = p.scheme or None
        self.host: Optional[str] = p.netloc or None
        self.path: str = p.path
        self.fragment: Optional[str] = p.fragment or None

    @property
    def absolute(self) -> bool:
        return self.scheme is not None

    def without_fragment(self) -> "Uri":
        base = self.raw.split("#", 1)[0]
        return Uri(base)

    def __str__(self) -> str:
        return self.raw

    def __eq__(self, other: Any) -> bool:
        return isinstance(other, Uri) and self.raw == other.raw

    def __hash__(self) -> int:
        return hash(self.raw)

    def __repr__(self) -> str:  # pragma: no cover
        return f"Uri({self.raw!r})"


@total_ordering
class Reference:
    def __init__(self, ref: str):
        self.uri: Optional[Uri] = None
        if "#" in ref:
            uri, _, pointer_part = ref.partition("#")
            if uri:
                self.uri = Uri(uri)
            self.pointer = pointer_part
        else:
            self.pointer = ref
        self.pointer = "#" + self.pointer
        if self.pointer.endswith("/"):
            self.pointer = self.pointer[:-1]

    def resolve_pointer(self, data: Any) -> Any:
        return json_pointer.evaluate(data, self.pointer)

    def __str__(self) -> str:
        if self.uri is not None:
            return f"{self.uri}{self.pointer}"
        return self.pointer

    def __eq__(self, other: Any) -> bool:
        return isinstance(other, Reference) and str(self) == str(other)

    def __lt__(self, other: "Reference") -> bool:
        return str(self) < str(other)

    def __hash__(self) -> int:
        return hash(str(self))

    def __repr__(self) -> str:  # pragma: no cover
        return f"Reference({str(self)})"
