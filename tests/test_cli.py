"""CLI behavior tests, following the reference's
test/commands/validate_schema_test.rb and bin semantics."""

import json

import pytest

from json_schema_ray.cli import main
from json_schema_ray.commands.validate_schema import ValidateSchema

from scaffold import data_sample, schema_sample


SIMPLE_SCHEMA = {
    "type": ["object"],
    "required": ["name"],
    "properties": {"name": {"type": ["string"], "minLength": 3}},
}


@pytest.fixture
def files(tmp_path):
    schema_f = tmp_path / "schema.json"
    schema_f.write_text(json.dumps(SIMPLE_SCHEMA))
    data_f = tmp_path / "data.json"
    data_f.write_text(json.dumps(data_sample()))
    return str(schema_f), str(data_f), tmp_path


def test_scaffold_schema_roundtrip(tmp_path, capsys):
    schema_f = tmp_path / "scaffold.json"
    schema_f.write_text(json.dumps(schema_sample()))
    doc = tmp_path / "doc.json"
    doc.write_text(json.dumps({"app": data_sample()}))
    assert main([str(schema_f), str(doc)]) == 0


def test_valid_document(files, capsys):
    schema_f, data_f, _ = files
    assert main([schema_f, data_f]) == 0
    out = capsys.readouterr()
    assert out.out == f"{data_f} is valid.\n"


def test_invalid_document(files, capsys):
    schema_f, data_f, tmp = files
    bad = tmp / "bad.json"
    bad.write_text(json.dumps({"name": "x"}))
    assert main([schema_f, str(bad)]) == 1
    err = capsys.readouterr().err
    assert "failed schema" in err
    assert str(bad) in err


def test_empty_file(files, capsys):
    schema_f, _, tmp = files
    empty = tmp / "empty.json"
    empty.write_text("")
    assert main([schema_f, str(empty)]) == 1
    assert "File is empty." in capsys.readouterr().err


def test_missing_file(files, capsys):
    schema_f, _, tmp = files
    assert main([schema_f, str(tmp / "nope.json")]) == 1
    assert "No such file or directory." in capsys.readouterr().err


def test_invalid_json(files, capsys):
    schema_f, _, tmp = files
    bad = tmp / "bad.json"
    bad.write_text("{not json")
    assert main([schema_f, str(bad)]) == 1
    assert "Invalid JSON" in capsys.readouterr().err


def test_usage_without_args(capsys):
    assert main([]) == 1
    assert "Usage: validate-schema" in capsys.readouterr().err


def test_detect_mode(tmp_path, capsys):
    doc = tmp_path / "self.json"
    doc.write_text(json.dumps({
        "$schema": "http://json-schema.org/draft-04/schema#",
        "type": "object",
        "properties": {"a": {"type": "string"}},
    }))
    assert main(["-d", str(doc)]) == 0
    assert "is valid." in capsys.readouterr().out


def test_detect_mode_no_schema_tag(tmp_path, capsys):
    doc = tmp_path / "x.json"
    doc.write_text(json.dumps({"a": 1}))
    assert main(["-d", str(doc)]) == 1
    assert "No $schema tag for detection." in capsys.readouterr().err


def test_extra_schema(tmp_path, capsys):
    extra = tmp_path / "extra.json"
    extra.write_text(json.dumps({
        "id": "http://example.com/extra",
        "definitions": {"name": {"type": ["string"], "minLength": 3}},
    }))
    schema_f = tmp_path / "schema.json"
    schema_f.write_text(json.dumps({
        "type": ["object"],
        "properties": {
            "name": {"$ref": "http://example.com/extra#/definitions/name"}
        },
    }))
    doc = tmp_path / "doc.json"
    doc.write_text(json.dumps({"name": "ab"}))
    assert main(["-s", str(extra), str(schema_f), str(doc)]) == 1
    assert "At least 3 characters" in capsys.readouterr().err


def test_parquet_table_mode(tmp_path, capsys):
    schema_f = tmp_path / "schema.json"
    schema_f.write_text(json.dumps({
        "type": ["object"],
        "properties": {"lang": {"type": ["string"],
                                "enum": ["en", "de", "es", "fr"]}},
    }))
    assert main([str(schema_f),
                 "/root/testdata/sf0.001/documents.parquet"]) == 1
    err = capsys.readouterr().err
    assert 'zh is not a member of ["en", "de", "es", "fr"].' in err


def test_fail_fast_flag(files, capsys):
    schema_f, _, tmp = files
    bad = tmp / "bad.json"
    bad.write_text(json.dumps({"name": "x"}))
    assert main(["-f", schema_f, str(bad)]) == 1
