"""Schema node tree.

Python re-expression of the reference's ``JsonSchema::Schema``
(reference: lib/json_schema/schema.rb:4-294) and its ``Attributes``
mixin (reference: lib/json_schema/attributes.rb:25-115): ~45 copyable
attributes with defaults, spec-name indexing for JSON Pointer
evaluation, identity-shared ``clones`` sets for ``$ref`` expansion,
and the ``pointer`` chain used in every error message.
"""

from __future__ import annotations

from typing import Any, Optional

# (python_name, spec_name, default) — default=None means "no default".
# Order matters only for repr/debug. ``not`` is a Python keyword, hence
# ``not_`` with spec name "not".
_SCHEMA_ATTRS = [
    ("id", "id", None),
    ("title", "title", None),
    ("description", "description", None),
    ("default", "default", None),
    # validation: any
    ("all_of", "allOf", []),
    ("any_of", "anyOf", []),
    ("definitions", "definitions", {}),
    ("enum", "enum", None),
    ("one_of", "oneOf", []),
    ("not_", "not", None),
    ("type", "type", []),
    # validation: array
    ("additional_items", "additionalItems", True),
    ("items", "items", None),
    ("max_items", "maxItems", None),
    ("min_items", "minItems", None),
    ("unique_items", "uniqueItems", None),
    # validation: number/integer
    ("max", "maximum", None),
    ("max_exclusive", "exclusiveMaximum", False),
    ("min", "minimum", None),
    ("min_exclusive", "exclusiveMinimum", False),
    ("multiple_of", "multipleOf", None),
    # validation: object
    ("additional_properties", "additionalProperties", True),
    ("dependencies", "dependencies", {}),
    ("max_properties", "maxProperties", None),
    ("min_properties", "minProperties", None),
    ("pattern_properties", "patternProperties", {}),
    ("properties", "properties", {}),
    ("required", "required", None),
    ("strict_properties", "strictProperties", False),
    # validation: string
    ("format", "format", None),
    ("max_length", "maxLength", None),
    ("min_length", "minLength", None),
    ("pattern", "pattern", None),
    # hyperschema
    ("links", "links", []),
    ("media", "media", None),
    ("path_start", "pathStart", None),
    ("read_only", "readOnly", None),
    # hyperschema link attributes (used by Link, declared on Schema to
    # mirror the reference's inherit_attrs arrangement)
    ("enc_type", "encType", "application/json"),
    ("href", "href", None),
    ("media_type", "mediaType", "application/json"),
    ("method", "method", None),
    ("rel", "rel", None),
    ("schema", "schema", None),
    ("target_schema", "targetSchema", None),
]

_SPEC_TO_PY = {spec: py for py, spec, _ in _SCHEMA_ATTRS}
_DEFAULTS = {py: default for py, _, default in _SCHEMA_ATTRS}

# Copyable-but-not-spec attributes (reference schema.rb:37-70).
_EXTRA_COPYABLE = ["expanded", "data", "parent", "clones", "uri"]
_ALL_COPYABLE = _EXTRA_COPYABLE + [py for py, _, _ in _SCHEMA_ATTRS]


def _make_property(name: str, default: Any):
    key = "_" + name

    def getter(self):
        val = getattr(self, key)
        if val is None and default is not None:
            return default
        return val

    def setter(self, value):
        if name == "type":
            self._type_parsed = None
        setattr(self, key, value)

    return property(getter, setter)


class Schema:
    def __init__(self):
        for name in _ALL_COPYABLE:
            setattr(self, "_" + name, None)
        self._type_parsed = None
        # Fragment of a JSON Pointer back to this schema; not copyable.
        self.fragment: Optional[str] = None
        # Unresolved JSON Reference, when this node is a ``$ref``.
        self.reference = None
        # Shared-by-identity set across all copies of this node
        # (reference schema.rb:26).
        self._clones = set()

    # --- spec-name indexing (reference attributes.rb:96-103) ---
    def __getitem__(self, name: str) -> Any:
        py = _SPEC_TO_PY.get(name)
        if py is None:
            raise KeyError(f"Schema does not respond to #{name}")
        return getattr(self, py)

    def copy_from(self, other: "Schema") -> None:
        for name in _ALL_COPYABLE:
            setattr(self, "_" + name, getattr(other, "_" + name))
        self._type_parsed = None

    # --- predicate helpers ---
    @property
    def original(self) -> bool:
        return self not in self.clones

    @property
    def pointer(self) -> str:
        if self.parent is not None:
            return self.parent.pointer + "/" + (self.fragment or "")
        return self.fragment or ""

    def type_checkers(self):
        """Type-name list resolved to checker tags, cached like the
        reference's ``type_parsed`` (reference schema.rb:216-218).
        Unknown names (e.g. ``any``) contribute nothing, replicating
        the reference's ``TYPE_MAP`` flat_map/compact behavior.
        """
        if self._type_parsed is None:
            out = []
            for t in self.type or []:
                out.extend(TYPE_MAP.get(t, ()))
            self._type_parsed = out
        return self._type_parsed

    def expand_references(self, store=None):
        from .expander import ReferenceExpander

        expander = ReferenceExpander()
        if expander.expand(self, store=store):
            return True, None
        return False, expander.errors

    def expand_references_bang(self, store=None):
        from .expander import ReferenceExpander

        ReferenceExpander().expand_bang(self, store=store)
        return True

    def validate(self, data: Any, fail_fast: bool = False):
        from .interpreter import Validator

        validator = Validator(self)
        valid = validator.validate(data, fail_fast=fail_fast)
        return valid, validator.errors

    def validate_bang(self, data: Any, fail_fast: bool = False) -> None:
        from .interpreter import Validator

        Validator(self).validate_bang(data, fail_fast=fail_fast)

    def __repr__(self) -> str:
        return f"#<Schema pointer={self.pointer}>"

    def __hash__(self) -> int:
        return id(self)

    def __eq__(self, other: Any) -> bool:
        return self is other


for _py, _spec, _default in _SCHEMA_ATTRS:
    setattr(Schema, _py, _make_property(_py, _default))
for _name in _EXTRA_COPYABLE:
    setattr(Schema, _name, _make_property(_name, None))


# Ruby-class-equivalent type tags (reference schema.rb:5-13). Checked
# with `is_a`-compatible semantics: in Ruby, true/false are not
# Integer, and "integer" excludes Float while "number" includes both.
TYPE_MAP = {
    "array": ("array",),
    "boolean": ("boolean",),
    "integer": ("integer",),
    "number": ("integer", "float"),
    "null": ("null",),
    "object": ("object",),
    "string": ("string",),
}


def is_a(data: Any, tag: str) -> bool:
    if tag == "array":
        return isinstance(data, list)
    if tag == "boolean":
        return isinstance(data, bool)
    if tag == "integer":
        return isinstance(data, int) and not isinstance(data, bool)
    if tag == "float":
        return isinstance(data, float)
    if tag == "null":
        return data is None
    if tag == "object":
        return isinstance(data, dict)
    if tag == "string":
        return isinstance(data, str)
    return False


class Link(Schema):
    """Hyperschema link subobject (reference schema.rb:284-286)."""


class Media:
    """Hyperschema media subobject (reference schema.rb:289-292)."""

    def __init__(self):
        self.binary_encoding = None
        self.type = None
