"""Ruby-semantics regex wrapper.

Ruby regexes treat ``^``/``$`` as *line* anchors unconditionally and
``=~`` is an unanchored search (reference: lib/json_schema/validator.rb:470-480
and parser.rb:248-257). Python needs ``re.MULTILINE`` to match that.
A couple of Ruby-only escapes are translated. The original source is
kept for Ruby-style ``inspect`` rendering in error messages and for
handing to RE2 in the vectorized path.
"""

from __future__ import annotations

import re

_RUBY_TRANSLATIONS = [
    (re.compile(r"(?<!\\)\\z"), r"\\Z"),
    (re.compile(r"(?<!\\)\\h"), "[0-9a-fA-F]"),
    (re.compile(r"(?<!\\)\\H"), "[^0-9a-fA-F]"),
    # Ruby/ECMA named groups (?<name>...) -> Python (?P<name>...)
    (re.compile(r"\(\?<([A-Za-z_][A-Za-z0-9_]*)>"), r"(?P<\1>"),
    (re.compile(r"\(\?'([A-Za-z_][A-Za-z0-9_]*)'"), r"(?P<\1>"),
]


class RubyRegexp:
    __slots__ = ("source", "compiled")

    def __init__(self, source: str):
        self.source = source
        translated = source
        for pat, repl in _RUBY_TRANSLATIONS:
            translated = pat.sub(repl, translated)
        self.compiled = re.compile(translated, re.MULTILINE)

    def search(self, data: str):
        return self.compiled.search(data)

    def inspect(self) -> str:
        # Regexp#inspect escapes bare forward slashes
        src = re.sub(r"(?<!\\)/", r"\\/", self.source)
        return f"/{src}/"

    def __repr__(self) -> str:  # pragma: no cover
        return self.inspect()

    def __eq__(self, other) -> bool:
        return isinstance(other, RubyRegexp) and self.source == other.source

    def __hash__(self) -> int:
        return hash(self.source)
