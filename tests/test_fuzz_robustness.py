"""Seeded crash-hunt: random (often malformed) schema trees through
parse -> expand -> validate over heterogeneous data must never raise —
malformed keyword values become schema errors, invalid regexes become
regex_failed, cyclic expansions emit the loop_detected error instead
of blowing the stack."""

import random

import json_schema_ray as jsr

KEYWORDS = [
    lambda d, r: {"type": r.choice(["string", ["integer", "null"],
                                    ["object"], 7, ["bogus"]])},
    lambda d, r: {"minLength": r.choice([3, -1, "x"])},
    lambda d, r: {"enum": r.choice([[1, 2], [], "notarray"])},
    lambda d, r: {"pattern": r.choice(["^a", "[", "(?<x>y)"])},
    lambda d, r: {"items": d(), "maxItems": 2},
    lambda d, r: {"properties": {"k": d()}, "required": ["k", "missing"]},
    lambda d, r: {"allOf": [d(), d()]},
    lambda d, r: {"oneOf": [d()]},
    lambda d, r: {"not": d()},
    lambda d, r: {"$ref": r.choice(["#/definitions/a", "#/nope",
                                    "http://x.com#"])},
    lambda d, r: {"dependencies": {"a": r.choice(
        ["b", ["b", "c"], {"minProperties": 1}])}},
    lambda d, r: {"patternProperties": {"^p": d()}},
    lambda d, r: {"additionalProperties": r.choice([True, False])},
    lambda d, r: {"format": r.choice(["email", "nope", "uri"])},
]

DATA = [None, 1, 1.5, "abc", "", True, [], [1, "x"], {},
        {"k": 1, "a": "y", "p1": 2}, {"a": True, "b": None},
        [[1], [1]], {"k": {"k": "deep"}}]


def _rand_schema(r, depth=0):
    if depth > 3:
        return {}
    out = {}
    for _ in range(r.randint(1, 3)):
        out.update(r.choice(KEYWORDS)(
            lambda: _rand_schema(r, depth + 1), r))
    if r.random() < 0.3:
        out["definitions"] = {"a": _rand_schema(r, depth + 1)}
    return out


def test_fuzz_no_crashes():
    r = random.Random(7)
    for _ in range(800):
        s = _rand_schema(r)
        schema, _ = jsr.parse(s)
        if schema is None:
            continue
        ok, _ = schema.expand_references()
        if not ok:
            continue
        for d in DATA:
            _, errs = schema.validate(d)
            schema.validate(d, fail_fast=True)
            for e in errs:
                str(e)


def test_named_group_pattern():
    sch = jsr.parse_bang({"type": ["string"], "pattern": "(?<word>ab)+c"})
    assert sch.validate("xababc")[0]
    assert not sch.validate("zzz")[0]


def test_invalid_regex_becomes_schema_error():
    schema, errs = jsr.parse({"type": ["string"], "pattern": "["})
    assert schema is None
    assert any(e.type == "regex_failed" for e in errs)


def test_cyclic_schema_emits_loop_detected():
    schema = jsr.parse_bang({
        "definitions": {"a": {"allOf": [{"$ref": "#/definitions/a"}]}},
        "allOf": [{"$ref": "#/definitions/a"}],
    })
    ok, _ = schema.expand_references()
    if ok:
        valid, errors = schema.validate({"x": 1})
        assert not valid
        assert any(e.type == "loop_detected" for e in errors)
