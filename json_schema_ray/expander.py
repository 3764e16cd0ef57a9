"""In-place ``$ref`` expansion over a Schema tree.

Faithful re-expression of the reference expander
(reference: lib/json_schema/reference_expander.rb:8-362): pointer and
URI resolution, ref-chains, cycle detection, cross-document stores,
copy-into-place, and clone re-hydration. Runs once per job on the
driver — this is part of the compile phase, never the data plane.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

from . import pointer as json_pointer
from .document_store import DocumentStore
from .errors import AggregateError, SchemaError
from .reference import Reference, Uri
from .schema import Schema


class ReferenceExpander:
    def __init__(self):
        self.errors: List[SchemaError] = []
        self.store: Optional[DocumentStore] = None

    def expand(self, schema: Schema, store: Optional[DocumentStore] = None) -> bool:
        self.errors = []
        self._local_store = DocumentStore()
        self._schema = schema
        self._schema_paths: dict = {}
        self.store = store if store is not None else DocumentStore()

        # a bare JSON reference: short-circuit (expander.rb:17-19)
        if schema.reference is not None and not schema.expanded:
            return self._dereference(schema, [])

        for uri, store_schema in self.store:
            self._build_schema_paths(uri, store_schema)

        self._build_schema_paths("", schema)
        self._traverse_schema(schema)

        refs = sorted(self._unresolved_refs(schema))
        if refs:
            message = f"Couldn't resolve references: {', '.join(str(r) for r in refs)}."
            self.errors.append(SchemaError(schema, message, "unresolved_references"))

        return len(self.errors) == 0

    def expand_bang(self, schema: Schema, store: Optional[DocumentStore] = None) -> bool:
        if not self.expand(schema, store=store):
            raise AggregateError(self.errors)
        return True

    # --- store bookkeeping ---
    def _add_reference(self, schema: Schema) -> None:
        uri = Uri(schema.uri)
        stored = self._lookup_reference(uri)
        if stored is not None and len(stored.pointer) < len(schema.pointer):
            return
        if uri.absolute:
            self.store.add_schema(schema)
        else:
            self._local_store.add_schema(schema)

    def _build_schema_paths(self, uri: str, schema: Schema) -> None:
        if schema.reference is not None:
            return
        paths = self._schema_paths.setdefault(uri, {})
        paths[schema.pointer] = schema
        for subschema in self._schema_children(schema):
            self._build_schema_paths(uri, subschema)
        # alternate tree for the schema's custom URI
        if schema.uri != uri:
            fragment, parent = schema.fragment, schema.parent
            schema.fragment, schema.parent = "#", None
            self._build_schema_paths(schema.uri, schema)
            schema.fragment, schema.parent = fragment, parent

    def _dereference(self, ref_schema: Schema, ref_stack: list,
                     parent_ref: Optional[Reference] = None) -> bool:
        ref = ref_schema.reference

        # no reference but children may carry references (expander.rb:93-105)
        if ref is None:
            for subschema in self._schema_children(ref_schema):
                if subschema.reference is None:
                    continue
                if parent_ref is not None and ref_schema.uri == str(parent_ref.uri):
                    continue
                if subschema.reference.uri is None and parent_ref is not None:
                    subschema.reference = Reference(
                        f"{parent_ref.uri}{subschema.reference.pointer}")
                self._dereference(subschema, ref_stack)
            return True

        if ref in ref_stack:
            message = f"Reference loop detected: {', '.join(str(r) for r in sorted(ref_stack))}."
            self.errors.append(SchemaError(ref_schema, message, "loop_detected"))
            return False

        new_schema = self._resolve_reference(ref_schema)
        if new_schema is None:
            return False

        if new_schema.reference is not None and not new_schema.expanded:
            if not self._dereference(new_schema, ref_stack + [ref]):
                return False

        # global reference: manually expand nested references
        if ref.uri is not None:
            for subschema in self._schema_children(new_schema):
                if ref_schema is subschema:
                    continue
                if subschema.reference is not None:
                    if subschema.expanded:
                        continue
                    if subschema.reference.uri is None:
                        subschema.reference = Reference(
                            f"{ref.uri}{subschema.reference.pointer}")
                if (isinstance(subschema.items, Schema)
                        and subschema.items.reference is not None):
                    if subschema.expanded:
                        continue
                    if subschema.items.reference.uri is None:
                        subschema.items.reference = Reference(
                            f"{ref.uri}{subschema.items.reference.pointer}")
                self._dereference(subschema, ref_stack, parent_ref=ref)

        # copy new schema into place, preserving parent (expander.rb:171-183)
        parent = ref_schema.parent
        ref_schema.copy_from(new_schema)
        ref_schema.parent = parent

        if ref_schema.original:
            for child in self._schema_children(ref_schema):
                child.parent = ref_schema

        return True

    def _lookup_pointer(self, uri: Optional[Uri], pointer: str) -> Optional[Schema]:
        paths = self._schema_paths.setdefault(str(uri) if uri else "", {})
        return paths.get(pointer)

    def _lookup_reference(self, uri: Uri) -> Optional[Schema]:
        if uri.absolute:
            return self.store.lookup_schema(str(uri))
        return self._local_store.lookup_schema(str(uri))

    def _resolve_pointer(self, ref_schema: Schema, resolved_schema: Schema) -> Optional[Schema]:
        ref = ref_schema.reference
        new_schema = self._lookup_pointer(ref.uri, ref.pointer)
        if new_schema is None:
            new_schema = json_pointer.evaluate(resolved_schema, ref.pointer)
            if new_schema is None:
                message = f'Couldn\'t resolve pointer "{ref.pointer}".'
                self.errors.append(SchemaError(resolved_schema, message, "unresolved_pointer"))
                return None
            # aggressively detect circular dependencies (expander.rb:214-227)
            nn = (self._lookup_pointer(ref.uri, new_schema.reference.pointer)
                  if new_schema.reference is not None else None)
            if nn is not None:
                nn.clones.add(ref_schema)
            else:
                self._build_schema_paths(str(ref.uri) if ref.uri else "", resolved_schema)
        else:
            new_schema.clones.add(ref_schema)
        return new_schema

    def _resolve_reference(self, ref_schema: Schema) -> Optional[Schema]:
        ref = ref_schema.reference
        uri = ref.uri

        if uri is not None and uri.host:
            scheme = uri.scheme or "http"
            if self.store.lookup_schema(str(uri)):
                return self._resolve_uri(ref_schema, uri)
            message = (f"Reference resolution over {scheme} is not currently "
                       f"supported (URI: {uri}).")
            self.errors.append(SchemaError(ref_schema, message, "scheme_not_supported"))
            return None
        elif uri is not None and uri.path[:1] == "/":
            return self._resolve_uri(ref_schema, uri)
        elif uri is not None:
            if ref_schema.uri:
                schema_uri = ref_schema.uri.rstrip("/")
                return self._resolve_uri(ref_schema, Uri(schema_uri + "/" + uri.path))
            return None
        else:
            return self._resolve_pointer(ref_schema, self._schema)

    def _resolve_uri(self, ref_schema: Schema, uri: Uri) -> Optional[Schema]:
        schema = self._lookup_reference(uri)
        if schema is not None:
            return self._resolve_pointer(ref_schema, schema)
        message = f"Couldn't resolve URI: {uri}."
        self.errors.append(SchemaError(ref_schema, message, "unresolved_pointer"))
        return None

    def _schema_children(self, schema: Schema) -> Iterator[Schema]:
        """Canonical child enumeration (expander.rb:284-324)."""
        yield from schema.all_of
        yield from schema.any_of
        yield from schema.one_of
        yield from schema.definitions.values()
        yield from schema.pattern_properties.values()
        yield from schema.properties.values()

        additional = schema.additional_properties
        if isinstance(additional, Schema):
            yield additional

        if schema.not_ is not None:
            yield schema.not_

        items = schema.items
        if items is not None:
            if isinstance(items, list):
                yield from items
            else:
                yield items

        for s in schema.dependencies.values():
            if isinstance(s, Schema):
                yield s

        if schema.links:
            for link in schema.links:
                if link.schema is not None:
                    yield link.schema
                if link.target_schema is not None:
                    yield link.target_schema

    def _unresolved_refs(self, schema: Schema) -> list:
        if not schema.original:
            return []
        arr: list = []
        for subschema in self._schema_children(schema):
            if not subschema.expanded:
                arr.append(subschema.reference)
            else:
                arr.extend(self._unresolved_refs(subschema))
        return arr

    def _traverse_schema(self, schema: Schema) -> None:
        self._add_reference(schema)

        for subschema in self._schema_children(schema):
            if subschema.reference is not None and not subschema.expanded:
                self._dereference(subschema, [])
            if subschema.reference is None:
                self._traverse_schema(subschema)

        # re-hydrate clones (expander.rb:354-361)
        if schema.original:
            for clone in list(schema.clones):
                parent = clone.parent
                clone.copy_from(schema)
                clone.parent = parent
