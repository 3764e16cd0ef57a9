"""Row-interpreter oracle tests, ported case-by-case from the
reference's test/json_schema/validator_test.rb (message text, error
type, error data and pointer assertions included)."""

import pytest

import json_schema_ray as jsr
from json_schema_ray import pointer as json_pointer

from scaffold import data_sample, schema_sample


class Harness:
    def __init__(self):
        self.schema_sample = schema_sample()
        self.data_sample = data_sample()
        self.validator = None

    def pointer(self, path):
        return json_pointer.evaluate(self.schema_sample, path)

    def _validator(self):
        schema = jsr.parse_bang(self.schema_sample)
        schema.expand_references_bang()
        app = schema.definitions["app"]
        return jsr.Validator(app)

    def assert_valid(self):
        self.validator = self._validator()
        assert self.validator.validate(self.data_sample, fail_fast=True)
        assert self.validator.validate(self.data_sample, fail_fast=False)

    def refute_valid(self):
        self.validator = self._validator()
        assert not self.validator.validate(self.data_sample, fail_fast=True)
        assert not self.validator.validate(self.data_sample, fail_fast=False)

    @property
    def error_messages(self):
        return [e.message for e in self.validator.errors]

    @property
    def error_types(self):
        return [e.type for e in self.validator.errors]

    @property
    def error_data(self):
        return [e.data for e in self.validator.errors]


@pytest.fixture
def h():
    jsr.configuration().reset()
    yield Harness()
    jsr.configuration().reset()


def test_finds_data_valid(h):
    h.assert_valid()


def test_enum_success(h):
    h.pointer("#/definitions/app/definitions/visibility")["enum"] = ["private", "public"]
    h.data_sample["visibility"] = "public"
    h.assert_valid()


def test_enum_failure(h):
    h.pointer("#/definitions/app/definitions/visibility")["enum"] = ["private", "public"]
    h.data_sample["visibility"] = "personal"
    h.refute_valid()
    assert 'personal is not a member of ["private", "public"].' in h.error_messages
    assert "invalid_type" in h.error_types


def test_type_success(h):
    h.pointer("#/definitions/app")["type"] = ["object"]
    h.data_sample = {"name": "cloudnasium"}
    h.assert_valid()


def test_subtype_of_dict_counts_as_object(h):
    class SomeDict(dict):
        pass

    h.pointer("#/definitions/app")["type"] = ["object"]
    h.data_sample = SomeDict()
    h.data_sample["name"] = "yayrails"
    h.assert_valid()


def test_type_failure(h):
    h.pointer("#/definitions/app")["type"] = ["object"]
    h.data_sample = 4
    h.refute_valid()
    assert "For 'definitions/app', 4 is not an object." in h.error_messages
    assert "invalid_type" in h.error_types
    assert 4 in h.error_data


def test_type_error_list_rendering(h):
    h.pointer("#/definitions/app")["type"] = ["string"]
    h.data_sample = 4
    h.refute_valid()
    assert "For 'definitions/app', 4 is not a string." in h.error_messages

    h.pointer("#/definitions/app")["type"] = ["string", "null"]
    h.refute_valid()
    assert "For 'definitions/app', 4 is not a string or null." in h.error_messages

    h.pointer("#/definitions/app")["type"] = ["object", "null", "string"]
    h.refute_valid()
    assert "For 'definitions/app', 4 is not an object, null, or string." in h.error_messages


def test_items_list_success(h):
    h.pointer("#/definitions/app/definitions/flags")["items"] = {
        "pattern": "^[a-z][a-z\\-]*[a-z]$"
    }
    h.data_sample["flags"] = ["websockets"]
    h.assert_valid()


def test_items_list_failure(h):
    h.pointer("#/definitions/app/definitions/flags")["items"] = {
        "pattern": "^[a-z][a-z\\-]*[a-z]$"
    }
    h.data_sample["flags"] = ["1337"]
    h.refute_valid()
    assert "1337 does not match /^[a-z][a-z\\-]*[a-z]$/." in h.error_messages
    assert "pattern_failed" in h.error_types
    assert "1337" in h.error_data


def test_items_tuple_success(h):
    h.pointer("#/definitions/app/definitions/flags")["items"] = [
        {"enum": ["bamboo", "cedar"]},
        {"enum": ["http", "https"]},
    ]
    h.data_sample["flags"] = ["cedar", "https"]
    h.assert_valid()


def test_items_tuple_additional_items_true(h):
    p = h.pointer("#/definitions/app/definitions/flags")
    p["additionalItems"] = True
    p["items"] = [{"enum": ["bamboo", "cedar"]}, {"enum": ["http", "https"]}]
    h.data_sample["flags"] = ["cedar", "https", "websockets"]
    h.assert_valid()


def test_items_tuple_additional_items_false(h):
    p = h.pointer("#/definitions/app/definitions/flags")
    p["additionalItems"] = False
    p["items"] = [{"enum": ["bamboo", "cedar"]}, {"enum": ["http", "https"]}]
    h.data_sample["flags"] = ["cedar", "https", "websockets"]
    h.refute_valid()
    assert "No more than 2 items are allowed; 3 were supplied." in h.error_messages
    assert "max_items_failed" in h.error_types
    assert ["cedar", "https", "websockets"] in h.error_data


def test_items_tuple_additional_items_schema_success(h):
    p = h.pointer("#/definitions/app/definitions/flags")
    p["additionalItems"] = {"enum": ["foo", "websockets"]}
    p["items"] = [{"enum": ["bamboo", "cedar"]}, {"enum": ["http", "https"]}]
    h.data_sample["flags"] = ["cedar", "https", "websockets"]
    h.assert_valid()


def test_items_tuple_additional_items_schema_failure(h):
    p = h.pointer("#/definitions/app/definitions/flags")
    p["additionalItems"] = {"enum": ["foo", "bar"]}
    p["items"] = [{"enum": ["bamboo", "cedar"]}, {"enum": ["http", "https"]}]
    h.data_sample["flags"] = ["cedar", "https", "websockets"]
    h.refute_valid()
    assert 'websockets is not a member of ["foo", "bar"].' in h.error_messages
    assert "invalid_type" in h.error_types
    assert "websockets" in h.error_data


def test_items_tuple_additional_items_schema_multiple_failures(h):
    p = h.pointer("#/definitions/app/definitions/flags")
    p["additionalItems"] = {"enum": ["foo", "bar"]}
    p["items"] = [{"enum": ["bamboo", "cedar"]}, {"enum": ["http", "https"]}]
    h.data_sample["flags"] = ["cedar", "https", "websockets", "1337"]
    h.refute_valid()
    assert 'websockets is not a member of ["foo", "bar"].' in h.error_messages
    assert '1337 is not a member of ["foo", "bar"].' in h.error_messages


def test_items_tuple_additional_items_schema_and_items_failures(h):
    p = h.pointer("#/definitions/app/definitions/flags")
    p["additionalItems"] = {"enum": ["foo", "bar"]}
    p["items"] = [{"enum": ["bamboo", "cedar"]}, {"enum": ["http", "https"]}]
    h.data_sample["flags"] = ["cedar", "1337", "websockets"]
    h.refute_valid()
    assert 'websockets is not a member of ["foo", "bar"].' in h.error_messages
    assert '1337 is not a member of ["http", "https"].' in h.error_messages


def test_items_tuple_not_enough_items(h):
    h.pointer("#/definitions/app/definitions/flags")["items"] = [
        {"enum": ["bamboo", "cedar"]},
        {"enum": ["http", "https"]},
    ]
    h.data_sample["flags"] = ["cedar"]
    h.refute_valid()
    assert "2 items required; only 1 was supplied." in h.error_messages
    assert "min_items_failed" in h.error_types
    assert ["cedar"] in h.error_data


def test_items_tuple_too_many_items(h):
    p = h.pointer("#/definitions/app/definitions/flags")
    p["additionalItems"] = False
    p["items"] = [{"enum": ["bamboo", "cedar"]}, {"enum": ["http", "https"]}]
    h.data_sample["flags"] = ["cedar", "https", "websockets"]
    h.refute_valid()
    assert "No more than 2 items are allowed; 3 were supplied." in h.error_messages
    assert "max_items_failed" in h.error_types


def test_items_tuple_non_conforming(h):
    p = h.pointer("#/definitions/app/definitions/flags")
    p["additionalItems"] = False
    p["items"] = [{"enum": ["bamboo", "cedar"]}, {"enum": ["http", "https"]}]
    h.data_sample["flags"] = ["cedar", "1337"]
    h.refute_valid()
    assert '1337 is not a member of ["http", "https"].' in h.error_messages


def test_max_items_success(h):
    h.pointer("#/definitions/app/definitions/flags")["maxItems"] = 10
    h.data_sample["flags"] = list(range(10))
    h.assert_valid()


def test_max_items_failure(h):
    h.pointer("#/definitions/app/definitions/flags")["maxItems"] = 10
    h.data_sample["flags"] = list(range(11))
    h.refute_valid()
    assert "No more than 10 items are allowed; 11 were supplied." in h.error_messages
    assert "max_items_failed" in h.error_types
    assert list(range(11)) in h.error_data


def test_min_items_failure(h):
    h.pointer("#/definitions/app/definitions/flags")["minItems"] = 1
    h.data_sample["flags"] = []
    h.refute_valid()
    assert "1 item required; only 0 were supplied." in h.error_messages
    assert "min_items_failed" in h.error_types
    assert [] in h.error_data


def test_unique_items_success(h):
    h.pointer("#/definitions/app/definitions/flags")["uniqueItems"] = True
    h.data_sample["flags"] = ["websockets"]
    h.assert_valid()


def test_unique_items_failure(h):
    h.pointer("#/definitions/app/definitions/flags")["uniqueItems"] = True
    h.data_sample["flags"] = ["websockets", "websockets"]
    h.refute_valid()
    assert "Duplicate items are not allowed." in h.error_messages
    assert "unique_items_failed" in h.error_types


def test_maximum_integer_inclusive(h):
    p = h.pointer("#/definitions/app/definitions/id")
    p["exclusiveMaximum"] = False
    p["maximum"] = 10
    h.data_sample["id"] = 11
    h.refute_valid()
    assert "11 must be less than or equal to 10." in h.error_messages
    assert "max_failed" in h.error_types
    assert 11 in h.error_data


def test_maximum_integer_exclusive(h):
    p = h.pointer("#/definitions/app/definitions/id")
    p["exclusiveMaximum"] = True
    p["maximum"] = 10
    h.data_sample["id"] = 10
    h.refute_valid()
    assert "10 must be less than 10." in h.error_messages


def test_maximum_number_inclusive(h):
    p = h.pointer("#/definitions/app/definitions/cost")
    p["exclusiveMaximum"] = False
    p["maximum"] = 10.0
    h.data_sample["cost"] = 10.1
    h.refute_valid()
    assert "10.1 must be less than or equal to 10.0." in h.error_messages


def test_maximum_number_exclusive(h):
    p = h.pointer("#/definitions/app/definitions/cost")
    p["exclusiveMaximum"] = True
    p["maximum"] = 10.0
    h.data_sample["cost"] = 10.0
    h.refute_valid()
    assert "10.0 must be less than 10.0." in h.error_messages


def test_minimum_integer_inclusive(h):
    p = h.pointer("#/definitions/app/definitions/id")
    p["exclusiveMinimum"] = False
    p["minimum"] = 1
    h.data_sample["id"] = 0
    h.refute_valid()
    assert "0 must be greater than or equal to 1." in h.error_messages
    assert "min_failed" in h.error_types
    assert 0 in h.error_data


def test_minimum_integer_exclusive(h):
    p = h.pointer("#/definitions/app/definitions/id")
    p["exclusiveMinimum"] = True
    p["minimum"] = 1
    h.data_sample["id"] = 1
    h.refute_valid()
    assert "1 must be greater than 1." in h.error_messages


def test_minimum_number_inclusive(h):
    p = h.pointer("#/definitions/app/definitions/cost")
    p["exclusiveMinimum"] = False
    p["minimum"] = 0.0
    h.data_sample["cost"] = -0.01
    h.refute_valid()
    assert "-0.01 must be greater than or equal to 0.0." in h.error_messages


def test_minimum_number_exclusive(h):
    p = h.pointer("#/definitions/app/definitions/cost")
    p["exclusiveMinimum"] = True
    p["minimum"] = 0.0
    h.data_sample["cost"] = 0.0
    h.refute_valid()
    assert "0.0 must be greater than 0.0." in h.error_messages


def test_multiple_of_integer(h):
    h.pointer("#/definitions/app/definitions/id")["multipleOf"] = 2
    h.data_sample["id"] = 1
    h.refute_valid()
    assert "1 is not a multiple of 2." in h.error_messages
    assert "multiple_of_failed" in h.error_types


def test_multiple_of_number(h):
    h.pointer("#/definitions/app/definitions/cost")["multipleOf"] = 0.01
    h.data_sample["cost"] = 0.005
    h.refute_valid()
    assert "0.005 is not a multiple of 0.01." in h.error_messages


def test_additional_properties_true(h):
    h.pointer("#/definitions/app")["additionalProperties"] = True
    h.data_sample["foo"] = "bar"
    h.assert_valid()


def test_additional_properties_false(h):
    p = h.pointer("#/definitions/app")
    p["additionalProperties"] = False
    p["patternProperties"] = {"^matches": {}}
    h.data_sample["foo"] = "bar"
    h.data_sample["matches_pattern"] = "yes!"
    h.refute_valid()
    assert '"foo" is not a permitted key.' in h.error_messages
    assert "invalid_keys" in h.error_types


def test_additional_properties_false_multiple(h):
    p = h.pointer("#/definitions/app")
    p["additionalProperties"] = False
    p["patternProperties"] = {"^matches": {}}
    h.data_sample["foo"] = "bar"
    h.data_sample["baz"] = "blah"
    h.data_sample["matches_pattern"] = "yes!"
    h.refute_valid()
    assert '"baz", "foo" are not permitted keys.' in h.error_messages


def test_additional_properties_schema_success(h):
    h.pointer("#/definitions/app")["additionalProperties"] = {"type": ["boolean"]}
    h.data_sample["foo"] = True
    h.assert_valid()


def test_additional_properties_schema_failure(h):
    p = h.pointer("#/definitions/app")
    p["additionalProperties"] = {"type": ["boolean"]}
    p["patternProperties"] = {"^matches": {}}
    h.data_sample["foo"] = 4
    h.data_sample["matches_pattern"] = "yes!"
    h.refute_valid()
    assert "For 'additionalProperties', 4 is not a boolean." in h.error_messages


def test_simple_dependencies(h):
    h.pointer("#/definitions/app/dependencies")["production"] = "ssl"
    h.data_sample["production"] = True
    h.refute_valid()
    assert '"ssl" wasn\'t supplied.' in h.error_messages


def test_schema_dependencies(h):
    h.pointer("#/definitions/app/dependencies")["ssl"] = {
        "properties": {"cost": {"minimum": 20.0}}
    }
    h.data_sample["cost"] = 10.0
    h.data_sample["ssl"] = True
    h.refute_valid()
    assert "10.0 must be greater than or equal to 20.0." in h.error_messages
    assert "min_failed" in h.error_types


def test_max_properties(h):
    h.pointer("#/definitions/app")["maxProperties"] = 0
    h.data_sample["name"] = "cloudnasium"
    h.refute_valid()
    assert "No more than 0 properties are allowed; 1 was supplied." in h.error_messages
    assert "max_properties_failed" in h.error_types
    assert {"name": "cloudnasium"} in h.error_data


def test_min_properties(h):
    h.pointer("#/definitions/app")["minProperties"] = 2
    h.data_sample["name"] = "cloudnasium"
    h.refute_valid()
    assert "At least 2 properties are required; 1 was supplied." in h.error_messages
    assert "min_properties_failed" in h.error_types


def test_pattern_properties(h):
    h.pointer("#/definitions/app/definitions/config_vars")["patternProperties"] = {
        "^\\w+$": {"type": ["null", "string"]}
    }
    h.data_sample["config_vars"] = {"": 123, "KEY": 456}
    h.refute_valid()
    assert "For 'definitions/config_vars', 456 is not a null or string." in h.error_messages
    assert "invalid_type" in h.error_types


def test_pattern_properties_missing_parent(h):
    schema = jsr.parse_bang({
        "$schema": "http://json-schema.org/draft-04/hyper-schema",
        "patternProperties": {
            "^S_": {"type": ["string"]}
        },
    })
    h.data_sample["S_0"] = 123
    h.validator = jsr.Validator(schema)
    assert not h.validator.validate(h.data_sample)
    assert "For 'patternProperties/^S_', 123 is not a string." in h.error_messages
    assert "invalid_type" in h.error_types


def test_required(h):
    h.pointer("#/definitions/app/dependencies")["required"] = ["name"]
    del h.data_sample["name"]
    h.refute_valid()
    assert '"name" wasn\'t supplied.' in h.error_messages
    assert "required_failed" in h.error_types
    assert ["name"] in h.error_data


def test_strict_properties_success(h):
    h.pointer("#/definitions/app")["strictProperties"] = False
    h.assert_valid()


def test_strict_properties_failure(h):
    p = h.pointer("#/definitions/app")
    p["patternProperties"] = {"^matches": {}}
    p["strictProperties"] = True
    h.data_sample["extra_key"] = "value"
    h.data_sample["matches_pattern"] = "yes!"
    h.refute_valid()
    schema = jsr.parse_bang(h.schema_sample)
    schema.expand_references_bang()
    missing = sorted(schema.definitions["app"].properties.keys())
    missing = [k for k in missing if k != "name"]
    joined = '", "'.join(missing)
    assert f'"{joined}" weren\'t supplied.' in h.error_messages
    assert '"extra_key" is not a permitted key.' in h.error_messages
    assert "invalid_keys" in h.error_types


def test_all_of(h):
    h.pointer("#/definitions/app/definitions/contrived")["allOf"] = [
        {"maxLength": 30},
        {"minLength": 3},
    ]
    h.data_sample["contrived"] = "ab"
    h.refute_valid()
    assert 'Not all subschemas of "allOf" matched.' in h.error_messages
    assert "all_of_failed" in h.error_types


def test_all_of_inline_failing_condition(h):
    h.pointer("#/definitions/app/definitions/contrived")["allOf"] = [
        {"maxLength": 30},
        {"minLength": 3},
    ]
    h.data_sample["contrived"] = "ab"
    h.refute_valid()
    assert "At least 3 characters are required; only 2 were supplied." in h.error_messages
    assert "ab" in h.error_data


def test_all_of_sub_errors(h):
    jsr.configuration().all_of_sub_errors = True
    h.pointer("#/definitions/app/definitions/contrived")["allOf"] = [
        {"minLength": 5},
        {"minLength": 3},
    ]
    h.data_sample["contrived"] = "ab"
    h.refute_valid()
    assert 'Not all subschemas of "allOf" matched.' in h.error_messages
    all_of_error = next(e for e in h.validator.errors if e.type == "all_of_failed")
    msgs = [[e.message for e in errs] for errs in all_of_error.sub_errors]
    types = [[e.type for e in errs] for errs in all_of_error.sub_errors]
    assert ["At least 3 characters are required; only 2 were supplied."] in msgs
    assert ["At least 5 characters are required; only 2 were supplied."] in msgs
    assert types == [["min_length_failed"], ["min_length_failed"]]


def test_any_of(h):
    h.pointer("#/definitions/app/definitions/contrived")["anyOf"] = [
        {"minLength": 5},
        {"minLength": 3},
    ]
    h.data_sample["contrived"] = "ab"
    h.refute_valid()
    assert 'No subschema in "anyOf" matched.' in h.error_messages
    assert "any_of_failed" in h.error_types
    any_of_error = next(e for e in h.validator.errors if e.type == "any_of_failed")
    msgs = [[e.message for e in errs] for errs in any_of_error.sub_errors]
    types = [[e.type for e in errs] for errs in any_of_error.sub_errors]
    assert ["At least 5 characters are required; only 2 were supplied."] in msgs
    assert ["At least 3 characters are required; only 2 were supplied."] in msgs
    assert types == [["min_length_failed"], ["min_length_failed"]]


def test_one_of_multi_match(h):
    h.pointer("#/definitions/app/definitions/contrived")["oneOf"] = [
        {"pattern": "^(foo|aaa)$"},
        {"pattern": "^(foo|zzz)$"},
        {"pattern": "^(hell|no)$"},
    ]
    h.data_sample["contrived"] = "foo"
    h.refute_valid()
    assert 'More than one subschema in "oneOf" matched.' in h.error_messages
    assert "one_of_failed" in h.error_types
    one_of_error = next(e for e in h.validator.errors if e.type == "one_of_failed")
    msgs = [[e.message for e in errs] for errs in one_of_error.sub_errors]
    types = [[e.type for e in errs] for errs in one_of_error.sub_errors]
    assert msgs == [[], [], ["foo does not match /^(hell|no)$/."]]
    assert types == [[], [], ["pattern_failed"]]


def test_one_of_no_match(h):
    h.pointer("#/definitions/app/definitions/contrived")["oneOf"] = [
        {"pattern": "^(foo|aaa)$"},
        {"pattern": "^(foo|zzz)$"},
    ]
    h.data_sample["contrived"] = "bar"
    h.refute_valid()
    assert 'No subschema in "oneOf" matched.' in h.error_messages


def test_not(h):
    h.pointer("#/definitions/app/definitions/contrived")["not"] = {"pattern": "^$"}
    h.data_sample["contrived"] = ""
    h.refute_valid()
    assert 'Matched "not" subschema.' in h.error_messages
    assert "not_failed" in h.error_types
    assert "" in h.error_data


FORMAT_CASES = [
    ("date", "2014-05-13", True),
    ("date", "13/05/2014", False),
    ("date", "2014-24-60", False),
    ("date-time", "2014-05-13T08:42:40Z", True),
    ("date-time", "2014-05-13T08:42:40-00:00", True),
    ("date-time", "2014-05-13T08:42:40.444Z", True),
    ("date-time", "2014-05-13T08:42:40", False),
    ("email", "dwarf@example.com", True),
    ("email", "dwarf@example.technology", True),
    ("email", "@example.com", False),
    ("hostname", "example.com", True),
    ("hostname", "@example.com", False),
    ("ipv4", "1.2.3.4", True),
    ("ipv4", "1.2.3.4.5", False),
    ("ipv6", "1::3:4:5:6:7:8", True),
    ("ipv6", "1::3:4:5:6:7:8:9", False),
    ("regex", "^owner@heroku\\.com$", True),
    ("regex", "^owner($", False),
    ("uri", "https://example.com", True),
    ("uri", "schemata/app", True),
    ("uri", "#hello", True),
    ("uri", "http://example.com[]", False),
    ("uri-reference", "https://example.com", True),
    ("uri-reference", "http://example.com[]", False),
    ("uuid", "01234567-89ab-cdef-0123-456789abcdef", True),
    ("uuid", "123", False),
]


@pytest.mark.parametrize("format_,value,expect_valid", FORMAT_CASES)
def test_formats(h, format_, value, expect_valid):
    h.pointer("#/definitions/app/definitions/owner")["format"] = format_
    h.data_sample["owner"] = value
    if expect_valid:
        h.assert_valid()
    else:
        h.refute_valid()
        assert f"{value} is not a valid {format_}." in h.error_messages
        assert "invalid_format" in h.error_types


def test_max_length(h):
    h.pointer("#/definitions/app/definitions/name")["maxLength"] = 3
    h.data_sample["name"] = "abcd"
    h.refute_valid()
    assert "Only 3 characters are allowed; 4 were supplied." in h.error_messages
    assert "max_length_failed" in h.error_types


def test_min_length(h):
    h.pointer("#/definitions/app/definitions/name")["minLength"] = 3
    h.data_sample["name"] = "ab"
    h.refute_valid()
    assert "At least 3 characters are required; only 2 were supplied." in h.error_messages
    assert "min_length_failed" in h.error_types


def test_pattern(h):
    h.pointer("#/definitions/app/definitions/name")["pattern"] = "^[a-z][a-z0-9-]{3,30}$"
    h.data_sample["name"] = "ab"
    h.refute_valid()
    assert "ab does not match /^[a-z][a-z0-9-]{3,30}$/." in h.error_messages
    assert "pattern_failed" in h.error_types
    assert "ab" in h.error_data


def test_error_pointer(h):
    h.pointer("#/definitions/app/definitions/visibility")["enum"] = ["private", "public"]
    h.data_sample["visibility"] = "personal"
    h.refute_valid()
    assert h.validator.errors[0].pointer == "#/visibility"


def test_custom_format_success(h):
    jsr.configuration().register_format("the-answer", lambda data: int(data) == 42)
    h.pointer("#/definitions/app/definitions/owner")["format"] = "the-answer"
    h.data_sample["owner"] = "42"
    h.assert_valid()


def test_custom_format_failure(h):
    jsr.configuration().register_format("the-answer", lambda data: int(data) == 42)
    h.pointer("#/definitions/app/definitions/owner")["format"] = "the-answer"
    h.data_sample["owner"] = "43"
    h.refute_valid()
    assert "43 is not a valid the-answer." in h.error_messages
    assert "invalid_format" in h.error_types


def test_validate_bang_raises_aggregate(h):
    h.pointer("#/definitions/app")["type"] = ["object"]
    schema = jsr.parse_bang(h.schema_sample)
    schema.expand_references_bang()
    app = schema.definitions["app"]
    with pytest.raises(jsr.AggregateError):
        jsr.Validator(app).validate_bang(4)


def test_error_to_s(h):
    """reference test/json_schema/error_test.rb:6-18."""
    h.pointer("#/definitions/app/definitions/visibility")["enum"] = ["private", "public"]
    h.data_sample["visibility"] = "personal"
    h.refute_valid()
    err = h.validator.errors[0]
    # the failed-schema pointer goes through the clone at
    # properties/visibility (fragment is not a copyable attr in the
    # reference, so expansion keeps the clone's own fragment)
    assert str(err) == (
        "#/visibility: failed schema #/definitions/app/properties/visibility: "
        'personal is not a member of ["private", "public"].'
    )
