"""Row-at-a-time validator with exact reference semantics.

This is the engine's in-repo oracle: keyword application order,
message templates, error types, paths, fail-fast behavior and all
numeric/string rendering follow the reference validator
(reference: lib/json_schema/validator.rb:11-605) byte-for-byte. The
vectorized Arrow path (engine/) is differential-tested against this.
"""

from __future__ import annotations

import sys
from typing import Any, List, Optional

# each schema/data recursion level spans several python frames; make
# room for _MAX_DEPTH levels before the depth guard trips
sys.setrecursionlimit(max(sys.getrecursionlimit(), 4000))

from .config import configuration
from .errors import (
    AggregateError,
    ValidationError,
    ruby_inspect,
    ruby_to_s,
    to_list,
)
from .formats import DEFAULT_FORMAT_VALIDATORS
from .schema import Schema, is_a


class FailFast(Exception):
    """Python stand-in for the reference's ``throw :fail_fast``."""


def _canon(value: Any):
    """Hashable canonical form with Ruby ``eql?`` semantics: integers,
    floats and booleans are distinct; hashes compare order-insensitively
    (used by uniqueItems; reference validator.rb:539-548)."""
    if value is None:
        return ("z",)
    if value is True or value is False:
        return ("b", value)
    if isinstance(value, float):
        return ("f", value)
    if isinstance(value, int):
        return ("i", value)
    if isinstance(value, str):
        return ("s", value)
    if isinstance(value, list):
        return ("a", tuple(_canon(v) for v in value))
    if isinstance(value, dict):
        return ("h", frozenset((k, _canon(v)) for k, v in value.items()))
    return ("o", value)


def ruby_eq(a: Any, b: Any) -> bool:
    """Ruby ``==``: ``1 == 1.0`` but ``true != 1`` (used by enum
    membership; reference validator.rb:231-240)."""
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if isinstance(a, (int, float)) and isinstance(b, (int, float)) \
            and not isinstance(a, bool):
        return a == b
    if type(a) is not type(b):
        return False
    if isinstance(a, list):
        return len(a) == len(b) and all(ruby_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict):
        return a.keys() == b.keys() and all(ruby_eq(v, b[k]) for k, v in a.items())
    return a == b


class Validator:
    def __init__(self, schema: Schema):
        self._schema = schema
        self.errors: List[ValidationError] = []
        self._fail_fast = False

    def validate(self, data: Any, fail_fast: bool = False) -> bool:
        self.errors = []
        self._fail_fast = fail_fast
        self._depth = 0
        try:
            self._validate_data(self._schema, data, self.errors, ["#"])
        except FailFast:
            pass
        return len(self.errors) == 0

    # cyclic expanded schemas recursing over the same data would blow
    # the stack (the reference's loop detection is disabled,
    # validator.rb:41-57, and Ruby SystemStackErrors there); cap the
    # depth and emit the reference's own loop message instead.
    _MAX_DEPTH = 256

    def validate_bang(self, data: Any, fail_fast: bool = False) -> None:
        if not self.validate(data, fail_fast=fail_fast):
            raise AggregateError(self.errors)

    # --- combination: reference validator.rb:72-80 ---
    def _and(self, valid_old: bool, valid_new: bool) -> bool:
        if self._fail_fast and not valid_new:
            raise FailFast()
        return valid_old and valid_new

    def _validate_data(self, schema: Schema, data: Any, errors: list, path: list) -> bool:
        self._depth += 1
        try:
            if self._depth > self._MAX_DEPTH:
                errors.append(ValidationError(
                    schema, path, "Validation loop detected.",
                    "loop_detected"))
                return False
            return self._validate_data_inner(schema, data, errors, path)
        finally:
            self._depth -= 1

    def _validate_data_inner(self, schema: Schema, data: Any, errors: list, path: list) -> bool:
        valid = True
        # keyword order is part of the contract (validator.rb:82-133)
        valid = self._and(valid, self._validate_all_of(schema, data, errors, path))
        valid = self._and(valid, self._validate_any_of(schema, data, errors, path))
        valid = self._and(valid, self._validate_enum(schema, data, errors, path))
        valid = self._and(valid, self._validate_one_of(schema, data, errors, path))
        valid = self._and(valid, self._validate_not(schema, data, errors, path))
        valid = self._and(valid, self._validate_type(schema, data, errors, path))

        if isinstance(data, list):
            valid = self._and(valid, self._validate_items(schema, data, errors, path))
            valid = self._and(valid, self._validate_max_items(schema, data, errors, path))
            valid = self._and(valid, self._validate_min_items(schema, data, errors, path))
            valid = self._and(valid, self._validate_unique_items(schema, data, errors, path))

        if isinstance(data, (int, float)) and not isinstance(data, bool):
            valid = self._and(valid, self._validate_max(schema, data, errors, path))
            valid = self._and(valid, self._validate_min(schema, data, errors, path))
            valid = self._and(valid, self._validate_multiple_of(schema, data, errors, path))

        if isinstance(data, dict):
            valid = self._and(valid, self._validate_additional_properties(schema, data, errors, path))
            valid = self._and(valid, self._validate_dependencies(schema, data, errors, path))
            valid = self._and(valid, self._validate_max_properties(schema, data, errors, path))
            valid = self._and(valid, self._validate_min_properties(schema, data, errors, path))
            valid = self._and(valid, self._validate_pattern_properties(schema, data, errors, path))
            valid = self._and(valid, self._validate_properties(schema, data, errors, path))
            valid = self._and(valid, self._validate_required(schema, data, errors, path, schema.required))
            valid = self._and(valid, self._validate_strict_properties(schema, data, errors, path))

        if isinstance(data, str):
            valid = self._and(valid, self._validate_format(schema, data, errors, path))
            valid = self._and(valid, self._validate_max_length(schema, data, errors, path))
            valid = self._and(valid, self._validate_min_length(schema, data, errors, path))
            valid = self._and(valid, self._validate_pattern(schema, data, errors, path))

        return valid

    # --- object helpers ---
    def _get_extra_keys(self, schema: Schema, data: dict) -> list:
        extra = [k for k in data.keys() if k not in schema.properties]
        for pattern in schema.pattern_properties.keys():
            extra = [k for k in extra if not pattern.search(k)]
        return extra

    def _validate_additional_properties(self, schema, data, errors, path) -> bool:
        ap = schema.additional_properties
        if ap is True:
            return True
        if isinstance(ap, Schema):
            extra = self._get_extra_keys(schema, data)
            validations = [
                self._validate_data(ap, data[key], errors, path + [key])
                for key in extra
            ]
            return all(validations)
        return self._validate_extra(schema, data, errors, path)

    def _validate_all_of(self, schema, data, errors, path) -> bool:
        if not schema.all_of:
            return True
        if configuration().all_of_sub_errors and not self._fail_fast:
            sub_errors = []
            results = []
            for subschema in schema.all_of:
                current: list = []
                sub_errors.append(current)
                results.append(self._validate_data(subschema, data, current, path))
            valid = all(results)
        else:
            sub_errors = None
            valid = all(self._validate_data(s, data, errors, path) for s in schema.all_of)
        if not valid:
            message = 'Not all subschemas of "allOf" matched.'
            errors.append(ValidationError(schema, path, message, "all_of_failed",
                                          sub_errors=sub_errors, data=data))
        return valid

    def _validate_any_of(self, schema, data, errors, path) -> bool:
        if not schema.any_of:
            return True
        sub_errors = []
        for subschema in schema.any_of:
            current: list = []
            try:
                valid = self._validate_data(subschema, data, current, path)
            except FailFast:
                valid = False
            if valid:
                return True
            sub_errors.append(current)
        message = 'No subschema in "anyOf" matched.'
        errors.append(ValidationError(schema, path, message, "any_of_failed",
                                      sub_errors=sub_errors, data=data))
        return False

    def _validate_dependencies(self, schema, data, errors, path) -> bool:
        if not schema.dependencies:
            return True
        results = []
        for key, obj in schema.dependencies.items():
            # Ruby truthiness: nil/false do not trigger the dependency
            val = data.get(key)
            if val is None or val is False:
                results.append(True)
                continue
            if isinstance(obj, Schema):
                results.append(self._validate_data(obj, data, errors, path))
            else:
                results.append(self._validate_required(schema, data, errors, path, obj))
        return all(results)

    def _validate_format(self, schema, data, errors, path) -> bool:
        if not schema.format:
            return True
        validator = (
            configuration().custom_formats.get(schema.format)
            or DEFAULT_FORMAT_VALIDATORS.get(schema.format)
        )
        if validator(data):
            return True
        message = f"{ruby_to_s(data)} is not a valid {schema.format}."
        errors.append(ValidationError(schema, path, message, "invalid_format", data=data))
        return False

    def _validate_enum(self, schema, data, errors, path) -> bool:
        if schema.enum is None:
            return True
        if any(ruby_eq(data, e) for e in schema.enum):
            return True
        message = f"{ruby_to_s(data)} is not a member of {ruby_inspect(schema.enum)}."
        errors.append(ValidationError(schema, path, message, "invalid_type", data=data))
        return False

    def _validate_extra(self, schema, data, errors, path) -> bool:
        extra = self._get_extra_keys(schema, data)
        if not extra:
            return True
        joined = '", "'.join(sorted(extra))
        message = (
            f'"{joined}" '
            + ("is not a" if len(extra) == 1 else "are not")
            + " permitted key"
            + ("." if len(extra) == 1 else "s.")
        )
        errors.append(ValidationError(schema, path, message, "invalid_keys"))
        return False

    def _validate_items(self, schema, data, errors, path) -> bool:
        if schema.items is None:
            return True
        if isinstance(schema.items, list):
            n = len(schema.items)
            size = len(data)
            if size < n:
                message = (
                    f"{n} item" + ("" if n == 1 else "s")
                    + f" required; only {size} "
                    + ("was" if size == 1 else "were")
                    + " supplied."
                )
                errors.append(ValidationError(schema, path, message, "min_items_failed", data=data))
                return False
            elif size > n and schema.additional_items is False:
                message = (
                    f"No more than {n} item" + (" is" if n == 1 else "s are")
                    + f" allowed; {size} "
                    + ("were" if size > 1 else "was")
                    + " supplied."
                )
                errors.append(ValidationError(schema, path, message, "max_items_failed", data=data))
                return False
            else:
                valid = True
                if size > n and isinstance(schema.additional_items, Schema):
                    for i in range(n, size):
                        valid = self._and(valid, self._validate_data(
                            schema.additional_items, data[i], errors, path + [i]))
                for i, subschema in enumerate(schema.items):
                    valid = self._and(valid, self._validate_data(
                        subschema, data[i], errors, path + [i]))
                return valid
        else:
            valid = True
            for i, value in enumerate(data):
                valid = self._and(valid, self._validate_data(
                    schema.items, value, errors, path + [i]))
            return valid

    def _validate_max(self, schema, data, errors, path) -> bool:
        if schema.max is None:
            return True
        if schema.max_exclusive and data < schema.max:
            return True
        if not schema.max_exclusive and data <= schema.max:
            return True
        message = (
            f"{ruby_to_s(data)} must be less than"
            + ("" if schema.max_exclusive else " or equal to")
            + f" {ruby_to_s(schema.max)}."
        )
        errors.append(ValidationError(schema, path, message, "max_failed", data=data))
        return False

    def _validate_max_items(self, schema, data, errors, path) -> bool:
        if schema.max_items is None:
            return True
        size = len(data)
        if size <= schema.max_items:
            return True
        message = (
            f"No more than {schema.max_items} item"
            + (" is" if schema.max_items == 1 else "s are")
            + f" allowed; {size} "
            + ("was" if size == 1 else "were")
            + " supplied."
        )
        errors.append(ValidationError(schema, path, message, "max_items_failed", data=data))
        return False

    def _validate_max_length(self, schema, data, errors, path) -> bool:
        if schema.max_length is None:
            return True
        n = len(data)  # unicode codepoints, like Ruby String#length
        if n <= schema.max_length:
            return True
        message = (
            f"Only {schema.max_length} character"
            + (" is" if schema.max_length == 1 else "s are")
            + f" allowed; {n} "
            + ("was" if n == 1 else "were")
            + " supplied."
        )
        errors.append(ValidationError(schema, path, message, "max_length_failed", data=data))
        return False

    def _validate_max_properties(self, schema, data, errors, path) -> bool:
        if schema.max_properties is None:
            return True
        n = len(data.keys())
        if n <= schema.max_properties:
            return True
        message = (
            f"No more than {schema.max_properties} propert"
            + ("y is" if schema.max_properties == 1 else "ies are")
            + f" allowed; {n} "
            + ("was" if n == 1 else "were")
            + " supplied."
        )
        errors.append(ValidationError(schema, path, message, "max_properties_failed", data=data))
        return False

    def _validate_min(self, schema, data, errors, path) -> bool:
        if schema.min is None:
            return True
        if schema.min_exclusive and data > schema.min:
            return True
        if not schema.min_exclusive and data >= schema.min:
            return True
        message = (
            f"{ruby_to_s(data)} must be greater than"
            + ("" if schema.min_exclusive else " or equal to")
            + f" {ruby_to_s(schema.min)}."
        )
        errors.append(ValidationError(schema, path, message, "min_failed", data=data))
        return False

    def _validate_min_items(self, schema, data, errors, path) -> bool:
        if schema.min_items is None:
            return True
        size = len(data)
        if size >= schema.min_items:
            return True
        message = (
            f"{schema.min_items} item" + ("" if schema.min_items == 1 else "s")
            + f" required; only {size} "
            + ("was" if size == 1 else "were")
            + " supplied."
        )
        errors.append(ValidationError(schema, path, message, "min_items_failed", data=data))
        return False

    def _validate_min_length(self, schema, data, errors, path) -> bool:
        if schema.min_length is None:
            return True
        n = len(data)
        if n >= schema.min_length:
            return True
        message = (
            f"At least {schema.min_length} character"
            + (" is" if schema.min_length == 1 else "s are")
            + f" required; only {n} "
            + ("was" if n == 1 else "were")
            + " supplied."
        )
        errors.append(ValidationError(schema, path, message, "min_length_failed", data=data))
        return False

    def _validate_min_properties(self, schema, data, errors, path) -> bool:
        if schema.min_properties is None:
            return True
        n = len(data.keys())
        if n >= schema.min_properties:
            return True
        message = (
            f"At least {schema.min_properties} propert"
            + ("y is" if schema.min_properties == 1 else "ies are")
            + f" required; {n} "
            + ("was" if n == 1 else "were")
            + " supplied."
        )
        errors.append(ValidationError(schema, path, message, "min_properties_failed", data=data))
        return False

    def _validate_multiple_of(self, schema, data, errors, path) -> bool:
        if schema.multiple_of is None:
            return True
        # Python's % matches Ruby's floored-modulo float semantics
        if data % schema.multiple_of == 0:
            return True
        message = f"{ruby_to_s(data)} is not a multiple of {ruby_to_s(schema.multiple_of)}."
        errors.append(ValidationError(schema, path, message, "multiple_of_failed", data=data))
        return False

    def _validate_one_of(self, schema, data, errors, path) -> bool:
        if not schema.one_of:
            return True
        sub_errors = []
        num_valid = 0
        for subschema in schema.one_of:
            current: list = []
            try:
                valid = self._validate_data(subschema, data, current, path)
            except FailFast:
                valid = False
            sub_errors.append(current)
            if valid:
                num_valid += 1
        if num_valid == 1:
            return True
        if num_valid == 0:
            message = 'No subschema in "oneOf" matched.'
        else:
            message = 'More than one subschema in "oneOf" matched.'
        errors.append(ValidationError(schema, path, message, "one_of_failed",
                                      sub_errors=sub_errors, data=data))
        return False

    def _validate_not(self, schema, data, errors, path) -> bool:
        if schema.not_ is None:
            return True
        # inner errors discarded; their wording would be inverted
        valid = not self._validate_data(schema.not_, data, [], path)
        if not valid:
            message = 'Matched "not" subschema.'
            errors.append(ValidationError(schema, path, message, "not_failed", data=data))
        return valid

    def _validate_pattern(self, schema, data, errors, path) -> bool:
        if schema.pattern is None:
            return True
        if schema.pattern.search(data):
            return True
        message = f"{ruby_to_s(data)} does not match {schema.pattern.inspect()}."
        errors.append(ValidationError(schema, path, message, "pattern_failed", data=data))
        return False

    def _validate_pattern_properties(self, schema, data, errors, path) -> bool:
        if not schema.pattern_properties:
            return True
        valid = True
        for pattern, subschema in schema.pattern_properties.items():
            for key, value in data.items():
                if pattern.search(key):
                    valid = self._and(valid, self._validate_data(
                        subschema, value, errors, path + [key]))
        return valid

    def _validate_properties(self, schema, data, errors, path) -> bool:
        if not schema.properties:
            return True
        valid = True
        for key, subschema in schema.properties.items():
            if key not in data:
                continue
            valid = self._and(valid, self._validate_data(
                subschema, data[key], errors, path + [key]))
        return valid

    def _validate_required(self, schema, data, errors, path, required) -> bool:
        if not required:
            return True
        missing = [k for k in required if k not in data]
        if not missing:
            return True
        joined = '", "'.join(sorted(missing))
        message = (
            f'"{joined}" '
            + ("wasn't" if len(missing) == 1 else "weren't")
            + " supplied."
        )
        errors.append(ValidationError(schema, path, message, "required_failed", data=missing))
        return False

    def _validate_strict_properties(self, schema, data, errors, path) -> bool:
        if not schema.strict_properties:
            return True
        return self._and(
            self._validate_extra(schema, data, errors, path),
            self._validate_required(schema, data, errors, path, list(schema.properties.keys())),
        )

    def _validate_type(self, schema, data, errors, path) -> bool:
        if not schema.type:
            return True
        if any(is_a(data, t) for t in schema.type_checkers()):
            return True
        key = self._find_parent(schema)
        message = f"For '{key}', {ruby_inspect(data)} is not {to_list(schema.type)}."
        errors.append(ValidationError(schema, path, message, "invalid_type", data=data))
        return False

    def _validate_unique_items(self, schema, data, errors, path) -> bool:
        if not schema.unique_items:
            return True
        seen = set()
        for item in data:
            seen.add(_canon(item))
        if len(data) == len(seen):
            return True
        message = "Duplicate items are not allowed."
        errors.append(ValidationError(schema, path, message, "unique_items_failed", data=data))
        return False

    def _find_parent(self, schema: Schema) -> Optional[str]:
        """reference validator.rb:550-567."""
        fragment = schema.fragment
        key = None
        if fragment is not None and "patternProperties" in fragment:
            split_pointer = schema.pointer.split("/")
            if "patternProperties" in split_pointer:
                idx = split_pointer.index("patternProperties")
                if idx - 2 >= 0:
                    parts = split_pointer[idx - 2:idx]
                    key = "/".join(p for p in parts if p is not None)
        return key if key else fragment
