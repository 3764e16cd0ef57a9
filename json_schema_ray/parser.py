"""JSON Schema draft-04 parser: JSON -> Schema tree.

Keyword extraction, per-keyword value type validation, `type`
normalization, resolution-scope URI algebra and hyperschema link/media
parsing all mirror the reference parser
(reference: lib/json_schema/parser.rb:28-384).
"""

from __future__ import annotations

import re
from typing import Any, List, Optional

from .config import configuration
from .errors import AggregateError, SchemaError, ruby_inspect
from .formats import DEFAULT_FORMAT_VALIDATORS
from .reference import Reference, Uri
from .regexp import RubyRegexp
from .schema import Link, Media, Schema

ALLOWED_TYPES = ["any", "array", "boolean", "integer", "number", "null", "object", "string"]
FORMATS = list(DEFAULT_FORMAT_VALIDATORS.keys())

# Ruby-class tags used for keyword *value* validation
# (reference parser.rb:7, 9-18).
_FRIENDLY = {
    "array": "array",
    "boolean": "boolean",
    "float": "number",
    "hash": "object",
    "integer": "integer",
    "string": "string",
}

_BOOLEAN = ("boolean",)


def _value_is(value: Any, tag: str) -> bool:
    if tag == "string":
        return isinstance(value, str)
    if tag == "array":
        return isinstance(value, list)
    if tag == "hash":
        return isinstance(value, dict)
    if tag == "boolean":
        return isinstance(value, bool)
    if tag == "integer":
        return isinstance(value, int) and not isinstance(value, bool)
    if tag == "float":
        return isinstance(value, float)
    return False


# Rough ECMA-262 regex validation used when
# ``validate_regex_with = "ecma-re-validator"`` is configured: reject
# constructs ECMA-262 regexes don't support.
_NON_ECMA = re.compile(r"\(\?<[=!]|\\A|\\z|\\h|\\H|\(\?#")


def _ecma_valid(source: str) -> bool:
    if _NON_ECMA.search(source):
        return False
    try:
        re.compile(source)
        return True
    except re.error:
        return False


class Parser:
    def __init__(self):
        self.errors: List[SchemaError] = []

    def parse(self, data: Any, parent: Optional[Schema] = None) -> Optional[Schema]:
        self.errors = []
        schema = self._parse_data(data, parent, "#")
        if not self.errors:
            return schema
        return None

    def parse_bang(self, data: Any, parent: Optional[Schema] = None) -> Schema:
        schema = self.parse(data, parent)
        if schema is None:
            raise AggregateError(self.errors)
        return schema

    # --- resolution scope algebra (reference parser.rb:51-75) ---
    def _build_uri(self, id_: Optional[str], parent_uri: Optional[str]) -> str:
        if id_:
            base = id_.split("#", 1)[0]
            uri = Uri(base)
            if uri.absolute or (uri.path[:1] == "/"):
                out = str(uri)
                return out[:-1] if out.endswith("/") else out
            elif parent_uri:
                parent_uri = parent_uri[:-1] if parent_uri.endswith("/") else parent_uri
                return parent_uri + "/" + base
            else:
                return "/"
        elif parent_uri:
            return parent_uri
        return "/"

    def _parse_data(self, data: Any, parent: Optional[Schema], fragment: str) -> Optional[Schema]:
        if not isinstance(data, dict):
            message = f"{ruby_inspect(data)} is not a valid schema."
            self.errors.append(SchemaError(parent, message, "schema_not_found"))
            return None
        ref = data.get("$ref")
        if ref is not None and ref is not False:  # Ruby truthiness: "" counts
            schema = Schema()
            schema.fragment = fragment
            schema.parent = parent
            schema.reference = Reference(ref)
            return schema
        return self._parse_schema(data, parent, fragment)

    def _parse_schema(self, data: dict, parent: Optional[Schema], fragment: str) -> Schema:
        schema = Schema()
        schema.fragment = fragment
        schema.parent = parent
        schema.data = data
        schema.id = self._validate_type(schema, ("string",), "id")

        # any parsed schema is automatically expanded
        schema.expanded = True

        schema.uri = self._build_uri(schema.id, parent.uri if parent else None)

        schema.title = self._validate_type(schema, ("string",), "title")
        schema.description = self._validate_type(schema, ("string",), "description")
        schema.default = data.get("default")

        # validation: any
        schema.all_of = self._validate_type(schema, ("array",), "allOf") or []
        schema.any_of = self._validate_type(schema, ("array",), "anyOf") or []
        schema.definitions = self._validate_type(schema, ("hash",), "definitions") or {}
        schema.enum = self._validate_type(schema, ("array",), "enum")
        schema.one_of = self._validate_type(schema, ("array",), "oneOf") or []
        schema.not_ = self._validate_type(schema, ("hash",), "not")
        type_ = self._validate_type(schema, ("array", "string"), "type")
        schema.type = [type_] if isinstance(type_, str) else type_
        self._validate_known_type(schema)

        # validation: array
        schema.additional_items = self._validate_type(schema, _BOOLEAN + ("hash",), "additionalItems")
        schema.items = self._validate_type(schema, ("array", "hash"), "items")
        schema.max_items = self._validate_type(schema, ("integer",), "maxItems")
        schema.min_items = self._validate_type(schema, ("integer",), "minItems")
        schema.unique_items = self._validate_type(schema, _BOOLEAN, "uniqueItems")

        # validation: number/integer
        schema.max = self._validate_type(schema, ("float", "integer"), "maximum")
        schema.max_exclusive = self._validate_type(schema, _BOOLEAN, "exclusiveMaximum")
        schema.min = self._validate_type(schema, ("float", "integer"), "minimum")
        schema.min_exclusive = self._validate_type(schema, _BOOLEAN, "exclusiveMinimum")
        schema.multiple_of = self._validate_type(schema, ("float", "integer"), "multipleOf")

        # validation: object
        schema.additional_properties = self._validate_type(
            schema, _BOOLEAN + ("hash",), "additionalProperties")
        schema.dependencies = self._validate_type(schema, ("hash",), "dependencies") or {}
        schema.max_properties = self._validate_type(schema, ("integer",), "maxProperties")
        schema.min_properties = self._validate_type(schema, ("integer",), "minProperties")
        schema.pattern_properties = self._validate_type(schema, ("hash",), "patternProperties") or {}
        schema.properties = self._validate_type(schema, ("hash",), "properties") or {}
        schema.required = self._validate_type(schema, ("array",), "required")
        schema.strict_properties = self._validate_type(schema, _BOOLEAN, "strictProperties")

        # validation: string
        schema.format = self._validate_type(schema, ("string",), "format")
        schema.max_length = self._validate_type(schema, ("integer",), "maxLength")
        schema.min_length = self._validate_type(schema, ("integer",), "minLength")
        pattern = self._validate_type(schema, ("string",), "pattern")
        schema.pattern = self._parse_regex(schema, pattern) if pattern else pattern
        if schema.format:
            self._validate_format(schema, schema.format)

        # hyperschema
        schema.links = self._validate_type(schema, ("array",), "links")
        schema.media = self._validate_type(schema, ("hash",), "media")
        schema.path_start = self._validate_type(schema, ("string",), "pathStart")
        schema.read_only = self._validate_type(schema, _BOOLEAN, "readOnly")

        self._parse_additional_items(schema)
        self._parse_additional_properties(schema)
        self._parse_all_of(schema)
        self._parse_any_of(schema)
        self._parse_one_of(schema)
        self._parse_definitions(schema)
        self._parse_dependencies(schema)
        self._parse_items(schema)
        self._parse_links(schema)
        self._parse_media(schema)
        self._parse_not(schema)
        self._parse_pattern_properties(schema)
        self._parse_properties(schema)

        return schema

    def _parse_additional_items(self, schema: Schema) -> None:
        if schema.additional_items and isinstance(schema.additional_items, dict):
            schema.additional_items = self._parse_data(
                schema.additional_items, schema, "additionalItems")

    def _parse_additional_properties(self, schema: Schema) -> None:
        if schema.additional_properties and isinstance(schema.additional_properties, dict):
            schema.additional_properties = self._parse_data(
                schema.additional_properties, schema, "additionalProperties")

    def _parse_all_of(self, schema: Schema) -> None:
        if schema.all_of:
            schema.all_of = [
                self._parse_data(s, schema, f"allOf/{i}")
                for i, s in enumerate(schema.all_of)
            ]

    def _parse_any_of(self, schema: Schema) -> None:
        if schema.any_of:
            schema.any_of = [
                self._parse_data(s, schema, f"anyOf/{i}")
                for i, s in enumerate(schema.any_of)
            ]

    def _parse_one_of(self, schema: Schema) -> None:
        if schema.one_of:
            schema.one_of = [
                self._parse_data(s, schema, f"oneOf/{i}")
                for i, s in enumerate(schema.one_of)
            ]

    def _parse_definitions(self, schema: Schema) -> None:
        if schema.definitions:
            schema.definitions = {
                key: self._parse_data(definition, schema, f"definitions/{key}")
                for key, definition in schema.definitions.items()
            }

    def _parse_dependencies(self, schema: Schema) -> None:
        if schema.dependencies:
            deps = dict(schema.dependencies)
            for k, s in deps.items():
                if isinstance(s, dict):
                    # NB: fragment is just "dependencies" in the reference
                    deps[k] = self._parse_data(s, schema, "dependencies")
                elif isinstance(s, str):
                    deps[k] = [s]
            schema.dependencies = deps

    def _parse_items(self, schema: Schema) -> None:
        if schema.items is not None:
            if isinstance(schema.items, list):
                schema.items = [
                    self._parse_data(s, schema, f"items/{i}")
                    for i, s in enumerate(schema.items)
                ]
            else:
                schema.items = self._parse_data(schema.items, schema, "items")

    def _parse_links(self, schema: Schema) -> None:
        if schema.links:
            parsed = []
            for i, l in enumerate(schema.links):
                link = Link()
                link.parent = schema
                link.fragment = f"links/{i}"
                link.data = l
                link.expanded = True
                link.uri = None
                link.description = l.get("description")
                link.enc_type = l.get("encType")
                link.href = l.get("href")
                link.method = l["method"].lower() if l.get("method") else None
                link.rel = l.get("rel")
                link.title = l.get("title")
                link.media_type = l.get("mediaType")
                if l.get("schema"):
                    link.schema = self._parse_data(l["schema"], schema, f"links/{i}/schema")
                if l.get("targetSchema"):
                    link.target_schema = self._parse_data(
                        l["targetSchema"], schema, f"links/{i}/targetSchema")
                parsed.append(link)
            schema.links = parsed

    def _parse_media(self, schema: Schema) -> None:
        if schema.media:
            data = schema.media
            media = Media()
            media.binary_encoding = data.get("binaryEncoding")
            media.type = data.get("type")
            schema.media = media

    def _parse_not(self, schema: Schema) -> None:
        if schema.not_ is not None:
            schema.not_ = self._parse_data(schema.not_, schema, "not")

    def _parse_pattern_properties(self, schema: Schema) -> None:
        if schema.pattern_properties:
            schema.pattern_properties = {
                self._parse_regex(schema, k): self._parse_data(
                    s, schema, f"patternProperties/{k}")
                for k, s in schema.pattern_properties.items()
            }

    def _parse_regex(self, schema: Schema, regex: str):
        if configuration().validate_regex_with == "ecma-re-validator":
            if not _ecma_valid(regex):
                message = f"{ruby_inspect(regex)} is not an ECMA-262 regular expression."
                self.errors.append(SchemaError(schema, message, "regex_failed"))
        try:
            return RubyRegexp(regex)
        except re.error:
            # the reference lets Regexp.new raise out of the parser;
            # surfacing a schema error is the engine's graceful superset
            message = f"{ruby_inspect(regex)} is not a valid regular expression."
            self.errors.append(SchemaError(schema, message, "regex_failed"))
            return None

    def _parse_properties(self, schema: Schema) -> None:
        if schema.properties and isinstance(schema.properties, dict):
            schema.properties = {
                key: self._parse_data(definition, schema, f"properties/{key}")
                for key, definition in schema.properties.items()
            }

    def _validate_known_type(self, schema: Schema) -> None:
        if schema.type is not None:
            bad_types = [t for t in schema.type if t not in ALLOWED_TYPES]
            if bad_types:
                message = f"Unknown types: {', '.join(sorted(bad_types))}."
                self.errors.append(SchemaError(schema, message, "unknown_type"))

    def _validate_type(self, schema: Schema, tags, field: str) -> Any:
        value = schema.data.get(field)
        if value is not None and not any(_value_is(value, t) for t in tags):
            friendly = "/".join(sorted(set(_FRIENDLY[t] for t in tags)))
            message = f'{ruby_inspect(value)} is not a valid "{field}", must be a {friendly}.'
            self.errors.append(SchemaError(schema, message, "invalid_type"))
            return None
        return value

    def _validate_format(self, schema: Schema, format_: str) -> None:
        valid_formats = FORMATS + list(configuration().custom_formats.keys())
        if format_ in valid_formats:
            return
        message = (
            f"{ruby_inspect(format_)} is not a valid format, "
            f"must be one of {', '.join(valid_formats)}."
        )
        self.errors.append(SchemaError(schema, message, "unknown_format"))


def parse(data: Any):
    """Module-level convenience mirroring ``JsonSchema.parse``
    (reference: lib/json_schema.rb:19-26)."""
    parser = Parser()
    schema = parser.parse(data)
    if schema is not None:
        return schema, None
    return None, parser.errors


def parse_bang(data: Any) -> Schema:
    return Parser().parse_bang(data)
