"""Ported from the reference's test/json_schema/reference_expander_test.rb."""

import pytest

import json_schema_ray as jsr
from json_schema_ray import pointer as json_pointer
from json_schema_ray.expander import ReferenceExpander
from json_schema_ray.parser import Parser

from scaffold import schema_sample


class H:
    def __init__(self):
        self.schema_sample = schema_sample()
        self.schema = None
        self.expander = None

    def pointer(self, path):
        return json_pointer.evaluate(self.schema_sample, path)

    def expand(self, store=None):
        self.schema = Parser().parse_bang(self.schema_sample)
        self.expander = ReferenceExpander()
        return self.expander.expand(self.schema, store=store)

    @property
    def error_messages(self):
        return [e.message for e in self.expander.errors]

    @property
    def error_types(self):
        return [e.type for e in self.expander.errors]


@pytest.fixture
def h():
    yield H()


def test_expands_references(h):
    assert h.expand()
    assert h.error_messages == []
    referenced = h.schema.definitions["app"]
    reference = h.schema.properties["app"]
    assert reference.reference.pointer == "#/definitions/app"
    assert reference.description == referenced.description
    assert reference.id == referenced.id
    assert reference.type == referenced.type
    assert reference.uri == referenced.uri


def test_takes_document_store(h):
    store = jsr.DocumentStore()
    h.expand(store=store)
    assert h.expander.store is store


def test_expands_any_of(h):
    assert h.expand()
    schema = h.schema.properties["app"].definitions["contrived_plus"]
    assert schema.any_of[0].min_length == 3
    assert schema.any_of[1].min_length == 5


def test_expands_all_of(h):
    assert h.expand()
    schema = h.schema.properties["app"].definitions["contrived_plus"]
    assert schema.all_of[0].max_length == 30
    assert schema.all_of[1].min_length == 3


def test_expands_dependencies(h):
    assert h.expand()
    schema = h.schema.properties["app"].dependencies["ssl"].properties["name"]
    assert schema.type == ["string"]


def test_expands_items_list(h):
    h.pointer("#/definitions/app/definitions/flags")["items"] = {
        "$ref": "#/definitions/app/definitions/name"
    }
    assert h.expand()
    schema = h.schema.properties["app"].properties["flags"].items
    assert schema.type == ["string"]


def test_expands_items_tuple(h):
    h.pointer("#/definitions/app/definitions/flags")["items"] = [
        {"$ref": "#/definitions/app/definitions/name"},
        {"$ref": "#/definitions/app/definitions/owner"},
    ]
    assert h.expand()
    items = h.schema.properties["app"].properties["flags"].items
    assert items[0].type == ["string"]
    assert items[1].type == ["string"]


def test_expands_one_of(h):
    assert h.expand()
    schema = h.schema.properties["app"].definitions["contrived_plus"]
    assert schema.one_of[0].pattern.source == "^(foo|aaa)$"
    assert schema.one_of[1].pattern.source == "^(foo|zzz)$"


def test_expands_not(h):
    assert h.expand()
    schema = h.schema.properties["app"].definitions["contrived_plus"]
    assert schema.not_.pattern.source == "^$"


def test_expands_additional_properties(h):
    h.pointer("#")["additionalProperties"] = {"$ref": "#"}
    assert h.expand()
    schema = h.schema.additional_properties
    assert schema.type == ["object"]


def test_expands_pattern_properties(h):
    assert h.expand()
    schema = list(
        h.schema.properties["app"].definitions["roles"].pattern_properties.values()
    )[0]
    assert schema.type == ["string"]


def test_expands_link_schemas(h):
    assert h.expand()
    schema = h.schema.properties["app"].links[0].schema.properties["name"]
    assert schema.type == ["string"]


def test_expands_link_target_schemas(h):
    assert h.expand()
    schema = h.schema.properties["app"].links[0].target_schema.properties["name"]
    assert schema.type == ["string"]


def test_multiple_passes(h):
    h.pointer("#/properties").update({
        "app0": {"$ref": "#/properties/app1"},
        "app1": {"$ref": "#/properties/app2"},
        "app2": {"$ref": "#/definitions/app"},
    })
    assert h.expand()
    assert h.schema.properties["app0"].type == ["object"]


def test_resolves_circular_dependencies(h):
    h.pointer("#/properties")["app"] = {"$ref": "#"}
    assert h.expand()
    assert h.schema.properties["app"].type == ["object"]


def test_pointers_for_expanded_references(h):
    assert h.expand()
    schema = h.schema.definitions["app"].definitions["name"]
    assert schema.pointer == "#/definitions/app/definitions/name"
    schema = h.schema.properties["app"].properties["name"]
    assert schema.pointer == "#/definitions/app/properties/name"


def test_pointers_for_circular_dependencies(h):
    h.pointer("#/properties").update({
        "app": {"$ref": "#"},
        "app1": {"$ref": "#/properties/app"},
    })
    h.expand()
    schema = h.schema.properties["app"]
    assert schema.pointer == "#/properties/app"
    schema = schema.properties["app"]
    assert schema.pointer == "#/properties/app"
    schema = h.schema.properties["app1"]
    assert schema.pointer == "#/properties/app1"
    schema = schema.properties["app1"]
    assert schema.pointer == "#/properties/app1"


def test_errors_unresolvable_pointer(h):
    h.pointer("#/properties")["app"] = {"$ref": "#/definitions/nope"}
    assert not h.expand()
    assert 'Couldn\'t resolve pointer "#/definitions/nope".' in h.error_messages
    assert "unresolved_pointer" in h.error_types
    assert "Couldn't resolve references: #/definitions/nope." in h.error_messages
    assert "unresolved_references" in h.error_types


def test_errors_unresolvable_uri(h):
    h.pointer("#/properties")["app"] = {"$ref": "/schemata/user#/definitions/name"}
    assert not h.expand()
    assert ("Couldn't resolve references: /schemata/user#/definitions/name."
            in h.error_messages)
    assert "Couldn't resolve URI: /schemata/user." in h.error_messages


def test_errors_relative_uri(h):
    h.pointer("#/properties")["app"] = {"$ref": "relative#definitions/name"}
    assert not h.expand()
    assert ("Couldn't resolve references: relative#definitions/name."
            in h.error_messages)


def test_errors_reference_cycle(h):
    h.pointer("#/properties").update({
        "app0": {"$ref": "#/properties/app2"},
        "app1": {"$ref": "#/properties/app0"},
        "app2": {"$ref": "#/properties/app1"},
    })
    assert not h.expand()
    props = "#/properties/app0, #/properties/app1, #/properties/app2"
    assert f"Reference loop detected: {props}." in h.error_messages
    assert "loop_detected" in h.error_types
    assert f"Couldn't resolve references: {props}." in h.error_messages


def test_expand_bang_raises(h):
    h.pointer("#/properties")["app"] = {"$ref": "#/definitions/nope"}
    schema = Parser().parse_bang(h.schema_sample)
    with pytest.raises(jsr.AggregateError):
        ReferenceExpander().expand_bang(schema)


def test_expands_bare_reference(h):
    schema = Parser().parse_bang(schema_sample())
    schema.uri = "http://json-schema.org/test"
    store = jsr.DocumentStore()
    store.add_schema(schema)

    ref_schema = Parser().parse_bang(
        {"$ref": "http://json-schema.org/test#/definitions/app"})
    ReferenceExpander().expand_bang(ref_schema, store=store)
    assert ref_schema.expanded


def test_external_ref_in_one_of_array(h):
    sample1 = {
        "$schema": "http://json-schema.org/draft-04/schema#",
        "id": "http://json-schema.org/draft-04/schema#",
        "definitions": {
            "schemaArray": {
                "type": "array",
                "minItems": 1,
                "items": {"$ref": "#"},
            }
        },
    }
    schema1 = Parser().parse_bang(sample1)
    sample2 = {
        "$schema": "http://json-schema.org/draft-04/hyper-schema#",
        "id": "http://json-schema.org/draft-04/hyper-schema#",
        "allOf": [{"$ref": "http://json-schema.org/draft-04/schema#"}],
    }
    schema2 = Parser().parse_bang(sample2)

    store = jsr.DocumentStore()
    store.add_schema(schema1)
    store.add_schema(schema2)
    ReferenceExpander().expand_bang(schema2, store=store)
    assert schema1.expanded
    assert schema2.expanded


def test_nested_external_ref_in_one_of_array(h):
    sample1 = {
        "$schema": "http://json-schema.org/draft-04/schema#",
        "id": "http://json-schema.org/draft-04/schema#",
        "definitions": {
            "thingy": {"type": ["string"]},
            "schemaArray": {
                "type": "array",
                "minItems": 1,
                "items": {"$ref": "#/definitions/thingy"},
            },
        },
        "properties": {
            "whatsit": {"$ref": "#/definitions/schemaArray"},
        },
    }
    schema1 = Parser().parse_bang(sample1)
    sample2 = {
        "$schema": "http://json-schema.org/draft-04/hyper-schema#",
        "id": "http://json-schema.org/draft-04/hyper-schema#",
        "allOf": [{"$ref": "http://json-schema.org/draft-04/schema#"}],
    }
    schema2 = Parser().parse_bang(sample2)

    store = jsr.DocumentStore()
    store.add_schema(schema1)
    store.add_schema(schema2)
    ReferenceExpander().expand_bang(schema2, store=store)
    assert schema2.all_of[0].properties["whatsit"].items.type == ["string"]


def test_nested_external_property_reference(h):
    sample1 = {
        "$schema": "http://json-schema.org/draft-04/hyper-schema",
        "type": "object",
        "properties": {
            "foo": {"$ref": "http://json-schema.org/b.json#/definitions/bar"}
        },
    }
    schema1 = Parser().parse_bang(sample1)
    schema1.uri = "http://json-schema.org/a.json"

    sample2 = {
        "$schema": "http://json-schema.org/draft-04/hyper-schema",
        "type": "object",
        "definitions": {
            "bar": {
                "type": "object",
                "properties": {
                    "omg": {"$ref": "http://json-schema.org/c.json#/definitions/baz"}
                },
            }
        },
    }
    schema2 = Parser().parse_bang(sample2)
    schema2.uri = "http://json-schema.org/b.json"

    sample3 = {
        "$schema": "http://json-schema.org/draft-04/hyper-schema",
        "type": "object",
        "definitions": {
            "baz": {"type": "string", "maxLength": 3}
        },
    }
    schema3 = Parser().parse_bang(sample3)
    schema3.uri = "http://json-schema.org/c.json"

    store = jsr.DocumentStore()
    store.add_schema(schema1)
    store.add_schema(schema2)
    store.add_schema(schema3)

    ReferenceExpander().expand_bang(schema1, store=store)
    assert schema1.properties["foo"].properties["omg"].max_length == 3


def test_one_of_with_nested_external_refs(h):
    sample1 = {
        "$schema": "http://json-schema.org/draft-04/hyper-schema",
        "type": "object",
        "properties": {"foo": {"$ref": "http://json-schema.org/b.json#"}},
    }
    schema1 = Parser().parse_bang(sample1)
    schema1.uri = "http://json-schema.org/a.json"

    sample2 = {
        "$schema": "http://json-schema.org/draft-04/hyper-schema",
        "type": "object",
        "properties": {
            "bar": {
                "oneOf": [
                    {"type": "null"},
                    {"$ref": "http://json-schema.org/c.json#"},
                ]
            }
        },
    }
    schema2 = Parser().parse_bang(sample2)
    schema2.uri = "http://json-schema.org/b.json"

    sample3 = {
        "$schema": "http://json-schema.org/draft-04/hyper-schema",
        "type": "object",
        "properties": {"baz": {"type": "string", "maxLength": 3}},
    }
    schema3 = Parser().parse_bang(sample3)
    schema3.uri = "http://json-schema.org/c.json"

    store = jsr.DocumentStore()
    store.add_schema(schema1)
    store.add_schema(schema2)
    store.add_schema(schema3)

    ReferenceExpander().expand(schema1, store=store)
    assert (schema1.properties["foo"].properties["bar"].one_of[1]
            .properties["baz"].max_length == 3)


def test_no_infinite_recursion_on_local_external_ref(h):
    sample1 = {
        "id": "http://json-schema.org/draft-04/schema#",
        "$schema": "http://json-schema.org/draft-04/schema#",
        "properties": {
            "additionalItems": {"anyOf": [{"$ref": "#"}]}
        },
    }
    schema1 = Parser().parse_bang(sample1)
    sample2 = {
        "$schema": "http://json-schema.org/draft-04/hyper-schema#",
        "id": "http://json-schema.org/draft-04/hyper-schema#",
        "allOf": [{"$ref": "http://json-schema.org/draft-04/schema#"}],
    }
    schema2 = Parser().parse_bang(sample2)

    store = jsr.DocumentStore()
    store.add_schema(schema1)
    store.add_schema(schema2)
    ReferenceExpander().expand_bang(schema2, store=store)
    assert schema1.expanded
    assert schema2.expanded


def test_one_of_with_nested_local_refs(h):
    sample1 = {
        "$schema": "http://json-schema.org/draft-04/hyper-schema",
        "type": "object",
        "properties": {"foo": {"$ref": "http://json-schema.org/b.json#"}},
    }
    schema1 = Parser().parse_bang(sample1)
    schema1.uri = "http://json-schema.org/a.json"

    sample2 = {
        "$schema": "http://json-schema.org/draft-04/hyper-schema",
        "type": "object",
        "definitions": {"baz": {"type": "string", "maxLength": 3}},
        "properties": {
            "bar": {
                "oneOf": [
                    {"type": "null"},
                    {"$ref": "#/definitions/baz"},
                ]
            }
        },
    }
    schema2 = Parser().parse_bang(sample2)
    schema2.uri = "http://json-schema.org/b.json"

    store = jsr.DocumentStore()
    store.add_schema(schema1)
    store.add_schema(schema2)

    ReferenceExpander().expand(schema1, store=store)
    assert schema1.properties["foo"].properties["bar"].one_of[1].max_length == 3


def test_external_schema_nested_local_property_reference(h):
    sample1 = {
        "$schema": "http://json-schema.org/draft-04/hyper-schema",
        "type": "object",
        "properties": {
            "foo": {"$ref": "http://json-schema.org/b.json#/definitions/bar"},
            "foo2": {"$ref": "http://json-schema.org/b.json#/definitions/baz"},
        },
    }
    schema1 = Parser().parse_bang(sample1)
    schema1.uri = "http://json-schema.org/a.json"

    sample2 = {
        "$schema": "http://json-schema.org/draft-04/hyper-schema",
        "type": "object",
        "definitions": {
            "bar": {
                "type": "object",
                "properties": {"omg": {"$ref": "#/definitions/baz"}},
            },
            "baz": {"type": "string", "maxLength": 3},
        },
    }
    schema2 = Parser().parse_bang(sample2)
    schema2.uri = "http://json-schema.org/b.json"

    store = jsr.DocumentStore()
    store.add_schema(schema1)
    store.add_schema(schema2)

    ReferenceExpander().expand_bang(schema1, store=store)
    assert schema1.properties["foo2"].max_length == 3
    assert schema1.properties["foo"].properties["omg"].max_length == 3


def test_expands_reference_to_link(h):
    h.pointer("#/properties")["link"] = {"$ref": "#/links/0"}
    assert h.expand()
    referenced = h.schema.links[0]
    reference = h.schema.properties["link"]
    assert reference.href == referenced.href
