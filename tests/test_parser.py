"""Ported from the reference's test/json_schema/parser_test.rb."""

import pytest

import json_schema_ray as jsr
from json_schema_ray import pointer as json_pointer
from json_schema_ray.parser import Parser

from scaffold import schema_sample


class H:
    def __init__(self):
        self.schema_sample = schema_sample()
        self.parser = None

    def pointer(self, path):
        return json_pointer.evaluate(self.schema_sample, path)

    def parse(self):
        self.parser = Parser()
        return self.parser.parse(self.schema_sample)

    @property
    def error_messages(self):
        return [e.message for e in self.parser.errors]

    @property
    def error_types(self):
        return [e.type for e in self.parser.errors]


@pytest.fixture
def h():
    jsr.configuration().reset()
    yield H()
    jsr.configuration().reset()


def test_basic_attributes(h):
    schema = h.parse()
    assert schema.id is None
    assert schema.title == "Example API"
    assert schema.description == "An example API."
    assert schema.type == ["object"]
    assert schema.uri == "/"


def test_subschemas(h):
    schema = h.parse().definitions["app"]
    assert schema.reference is None
    assert schema.title == "App"
    assert schema.description == "An app."
    assert schema.id == "schemata/app"
    assert schema.type == ["object"]
    assert schema.uri == "/schemata/app"
    assert schema.parent is not None


def test_sub_subschemas(h):
    schema = h.parse().definitions["app"].definitions["name"]
    assert schema.reference is None
    assert schema.default == "hello-world"
    assert schema.description == "unique name of app"
    assert schema.type == ["string"]
    assert schema.uri == "/schemata/app"
    assert schema.parent is not None


def test_references(h):
    schema = h.parse().properties["app"]
    assert schema.reference is not None
    assert schema.reference.uri is None
    assert schema.reference.pointer == "#/definitions/app"
    assert schema.parent is not None


def test_enum(h):
    schema = h.parse().definitions["app"].definitions["visibility"]
    assert schema.enum == ["private", "public"]


def test_array_validations(h):
    schema = h.parse().definitions["app"].definitions["flags"]
    assert schema.items.pattern.source == "^[a-z][a-z\\-]*[a-z]$"
    assert schema.min_items == 1
    assert schema.max_items == 10
    assert schema.unique_items is True


def test_items_tuple(h):
    h.pointer("#/definitions/app/definitions/flags")["items"] = [
        {"enum": ["bamboo", "cedar"]},
        {"enum": ["http", "https"]},
    ]
    schema = h.parse().definitions["app"].definitions["flags"]
    assert schema.items[0].enum == ["bamboo", "cedar"]
    assert schema.items[1].enum == ["http", "https"]


def test_additional_items_boolean(h):
    h.pointer("#/definitions/app/definitions/flags")["additionalItems"] = False
    schema = h.parse().definitions["app"].definitions["flags"]
    assert schema.additional_items is False


def test_additional_items_schema(h):
    h.pointer("#/definitions/app/definitions/flags")["additionalItems"] = {
        "type": "boolean"
    }
    schema = h.parse().definitions["app"].definitions["flags"].additional_items
    assert schema.type == ["boolean"]


def test_integer_validations(h):
    schema = h.parse().definitions["app"].definitions["id"]
    assert schema.min == 0
    assert schema.min_exclusive is True
    assert schema.max == 10000
    assert schema.max_exclusive is False
    assert schema.multiple_of == 1


def test_number_validations(h):
    schema = h.parse().definitions["app"].definitions["cost"]
    assert schema.min == 0.0
    assert schema.min_exclusive is False
    assert schema.max == 1000.0
    assert schema.max_exclusive is True
    assert schema.multiple_of == 0.01


def test_object_validations(h):
    schema = h.parse().definitions["app"]
    assert schema.max_properties == 10
    assert schema.min_properties == 1
    assert schema.required == ["name"]


def test_additional_properties_boolean(h):
    h.pointer("#/definitions/app")["additionalProperties"] = False
    schema = h.parse().definitions["app"]
    assert schema.additional_properties is False


def test_additional_properties_schema(h):
    h.pointer("#/definitions/app")["additionalProperties"] = {"type": "boolean"}
    schema = h.parse().definitions["app"].additional_properties
    assert schema.type == ["boolean"]


def test_dependencies(h):
    schema = h.parse().definitions["app"]
    assert schema.dependencies["production"] == ["ssl"]
    assert schema.dependencies["ssl"].properties["cost"].min == 20.0


def test_pattern_properties(h):
    schema = h.parse().definitions["app"].definitions["config_vars"]
    (pattern, subschema), = schema.pattern_properties.items()
    assert pattern.source == "^\\w+$"
    assert subschema.type == ["null", "string"]


def test_strict_properties(h):
    h.pointer("#/definitions/app")["strictProperties"] = True
    schema = h.parse().definitions["app"]
    assert schema.strict_properties is True


def test_schema_validations(h):
    schema = h.parse().definitions["app"].definitions["contrived"]
    assert len(schema.all_of) == 2
    assert len(schema.one_of) == 2
    assert schema.not_ is not None


def test_any_of(h):
    schema = h.parse().definitions["app"].definitions["identity"]
    assert len(schema.any_of) == 2
    assert str(schema.any_of[0].reference) == "/schemata/app#/definitions/id"
    assert str(schema.any_of[1].reference) == "/schemata/app#/definitions/name"


def test_string_validations(h):
    schema = h.parse().definitions["app"].definitions["name"]
    assert schema.max_length == 30
    assert schema.min_length == 3
    assert schema.pattern.source == "^[a-z][a-z0-9-]{3,30}$"


def test_hypermedia_links(h):
    h.pointer("#/definitions/app")["links"] = [
        {
            "description": "Create a new app.",
            "encType": "application/x-www-form-urlencoded",
            "href": "/apps",
            "method": "POST",
            "rel": "create",
            "mediaType": "application/json",
            "schema": {
                "properties": {
                    "name": {"$ref": "#/definitions/app/definitions/name"},
                }
            },
            "targetSchema": {"$ref": "#/definitions/app"},
        }
    ]
    schema = h.parse().definitions["app"]
    link = schema.links[0]
    assert link.parent is schema
    assert link.fragment == "links/0"
    assert link.pointer == "#/definitions/app/links/0"
    assert link.description == "Create a new app."
    assert link.enc_type == "application/x-www-form-urlencoded"
    assert link.href == "/apps"
    assert link.method == "post"
    assert link.rel == "create"
    assert link.media_type == "application/json"
    assert link.schema.properties["name"].reference.pointer == \
        "#/definitions/app/definitions/name"


def test_hypermedia_media(h):
    media = h.pointer("#/definitions/app/media")
    media["binaryEncoding"] = "base64"
    media["type"] = "image/png"
    schema = h.parse().definitions["app"]
    assert schema.media.binary_encoding == "base64"
    assert schema.media.type == "image/png"


def test_hypermedia_path_start(h):
    h.pointer("#/definitions/app")["pathStart"] = "/v2"
    schema = h.parse().definitions["app"]
    assert schema.path_start == "/v2"


def test_hypermedia_read_only(h):
    h.pointer("#/definitions/app")["readOnly"] = True
    schema = h.parse().definitions["app"]
    assert schema.read_only is True


def test_json_pointers(h):
    schema = h.parse().definitions["app"].definitions["name"]
    assert schema.pointer == "#/definitions/app/definitions/name"


def test_errors_non_string_id(h):
    h.schema_sample["id"] = 4
    assert h.parse() is None
    assert '4 is not a valid "id", must be a string.' in h.error_messages
    assert "invalid_type" in h.error_types


def test_errors_non_string_title(h):
    h.schema_sample["title"] = 4
    assert h.parse() is None
    assert '4 is not a valid "title", must be a string.' in h.error_messages


def test_errors_non_string_description(h):
    h.schema_sample["description"] = 4
    assert h.parse() is None
    assert '4 is not a valid "description", must be a string.' in h.error_messages


def test_errors_bad_type_value(h):
    h.schema_sample["type"] = 4
    assert h.parse() is None
    assert '4 is not a valid "type", must be a array/string.' in h.error_messages


def test_errors_unknown_types(h):
    h.schema_sample["type"] = ["float", "double"]
    assert h.parse() is None
    assert "Unknown types: double, float." in h.error_messages
    assert "unknown_type" in h.error_types


def test_errors_unknown_formats(h):
    h.schema_sample["format"] = "obscure-thing"
    assert h.parse() is None
    assert (
        '"obscure-thing" is not a valid format, must be one of date, '
        "date-time, email, hostname, ipv4, ipv6, regex, uri, uri-reference, "
        "uuid." in h.error_messages
    )
    assert "unknown_format" in h.error_types


def test_regex_pass_when_not_checking(h):
    h.schema_sample["pattern"] = "\\Ameow"
    assert h.parse() is not None


def test_regex_errors_when_checking_ecma(h):
    jsr.configuration().validate_regex_with = "ecma-re-validator"
    h.schema_sample["pattern"] = "\\Ameow"
    assert h.parse() is None
    assert '"\\\\Ameow" is not an ECMA-262 regular expression.' in h.error_messages
    assert "regex_failed" in h.error_types


def test_custom_formats(h):
    jsr.configuration().register_format("the-answer", lambda data: int(data) == 42)
    h.schema_sample["format"] = "the-answer"
    assert h.parse() is not None


def test_rejects_bad_formats_with_custom_formats(h):
    jsr.configuration().register_format("the-answer", lambda data: int(data) == 42)
    h.schema_sample["format"] = "not-a-format"
    assert h.parse() is None
    assert (
        '"not-a-format" is not a valid format, must be one of date, '
        "date-time, email, hostname, ipv4, ipv6, regex, uri, uri-reference, "
        "uuid, the-answer." in h.error_messages
    )


def test_parse_bang_raises(h):
    h.schema_sample["id"] = 4
    with pytest.raises(jsr.AggregateError):
        Parser().parse_bang(h.schema_sample)
