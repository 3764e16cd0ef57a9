"""Ported from the reference's test/json_pointer/evaluator_test.rb,
test/json_reference/reference_test.rb and
test/json_schema/document_store_test.rb."""

import pytest

import json_schema_ray as jsr
from json_schema_ray import pointer
from json_schema_ray.reference import Reference

from scaffold import schema_sample


DATA = {
    "foo": ["bar", "baz"],
    "": 0,
    "a/b": 1,
    "c%d": 2,
    "e^f": 3,
    "g|h": 4,
    "i\\j": 5,
    'k"l': 6,
    " ": 7,
    "m~n": 8,
}


def test_evaluates_pointers_according_to_spec():
    assert pointer.evaluate(DATA, "") == DATA
    assert pointer.evaluate(DATA, "/foo") == ["bar", "baz"]
    assert pointer.evaluate(DATA, "/foo/0") == "bar"
    assert pointer.evaluate(DATA, "/") == 0
    assert pointer.evaluate(DATA, "/a~1b") == 1
    assert pointer.evaluate(DATA, "/c%d") == 2
    assert pointer.evaluate(DATA, "/e^f") == 3
    assert pointer.evaluate(DATA, "/g|h") == 4
    assert pointer.evaluate(DATA, "/i\\j") == 5
    assert pointer.evaluate(DATA, '/k"l') == 6
    assert pointer.evaluate(DATA, "/ ") == 7
    assert pointer.evaluate(DATA, "/m~0n") == 8


def test_takes_leading_hash():
    assert pointer.evaluate(DATA, "#/") == 0


def test_returns_none_on_missing_values():
    assert pointer.evaluate(DATA, "/bar") is None


def test_raises_without_leading_slash():
    with pytest.raises(ValueError, match=r'Path must begin with a leading "/": foo.'):
        pointer.evaluate(DATA, "foo")
    with pytest.raises(ValueError, match=r'Path must begin with a leading "/": #foo.'):
        pointer.evaluate(DATA, "#foo")


def test_raises_on_non_digit_array_key():
    with pytest.raises(ValueError, match=r'must be a digit or "-": bar.'):
        pointer.evaluate(DATA, "/foo/bar")


def test_evaluates_on_schema_object():
    schema = jsr.parse_bang(schema_sample())
    res = pointer.evaluate(schema, "#/definitions/app/definitions/contrived/allOf/0")
    assert isinstance(res, jsr.Schema)
    assert res.max_length == 30


# --- Reference normalization ---

def test_reference_without_uri():
    ref = Reference("#/definitions")
    assert ref.uri is None
    assert ref.pointer == "#/definitions"


def test_reference_with_uri():
    ref = Reference("http://example.com#/definitions")
    assert str(ref.uri) == "http://example.com"
    assert ref.pointer == "#/definitions"


def test_reference_just_root_sign():
    ref = Reference("#")
    assert ref.uri is None
    assert ref.pointer == "#"


def test_reference_uri_with_root_sign():
    ref = Reference("http://example.com#")
    assert str(ref.uri) == "http://example.com"
    assert ref.pointer == "#"


def test_reference_adds_root_prefix():
    ref = Reference("/definitions")
    assert ref.uri is None
    assert ref.pointer == "#/definitions"


def test_reference_strips_trailing_slash():
    ref = Reference("#/definitions/")
    assert ref.uri is None
    assert ref.pointer == "#/definitions"


# --- DocumentStore ---

def _schema_with_uri(uri):
    schema = jsr.Schema()
    schema.uri = uri
    return schema


def test_store_add_and_lookup():
    store = jsr.DocumentStore()
    schema = _schema_with_uri("http://example.com/schema")
    store.add_schema(schema)
    assert store.lookup_schema(schema.uri) is schema


def test_store_iterates():
    store = jsr.DocumentStore()
    uri = "http://example.com/schema"
    schema = _schema_with_uri(uri)
    store.add_schema(schema)
    assert list(store) == [(uri, schema)]


def test_store_add_with_root_sign():
    store = jsr.DocumentStore()
    uri = "http://example.com/schema"
    schema = _schema_with_uri(uri + "#")
    store.add_schema(schema)
    assert store.lookup_schema(uri) is schema


def test_store_lookup_with_root_sign():
    store = jsr.DocumentStore()
    uri = "http://example.com/schema"
    schema = _schema_with_uri(uri)
    store.add_schema(schema)
    assert store.lookup_schema(uri + "#") is schema
