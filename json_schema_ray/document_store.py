"""URI -> Schema registry for cross-document ``$ref`` resolution.

Reference: lib/json_schema/document_store.rb:8-30 (``#`` suffix is
normalized away on both add and lookup).
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple


class DocumentStore:
    def __init__(self):
        self._schema_map: dict = {}

    def add_schema(self, schema) -> None:
        if schema.uri is None:
            raise ValueError("can't add nil URI")
        uri = schema.uri[:-1] if schema.uri.endswith("#") else schema.uri
        self._schema_map[uri] = schema

    def __iter__(self) -> Iterator[Tuple[str, object]]:
        return iter(self._schema_map.items())

    def lookup_schema(self, uri: str) -> Optional[object]:
        if uri.endswith("#"):
            uri = uri[:-1]
        return self._schema_map.get(uri)
