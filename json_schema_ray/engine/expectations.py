"""Declarative data-contract checks ("expectations") in ONE fused scan.

The reference validates one JSON document at a time against a schema
(`/root/reference/lib/json_schema/validator.rb`); this module is the
table-level analogue for operational data contracts: a list of
row-local checks (not-null, set membership, numeric range, regex,
string length) evaluated over a Dataset in a single ``map_batches``
pass.

Scale shape: every check is a vectorized Arrow kernel; each input
block reduces to ``n_checks`` tiny partial rows ``(check, n_rows,
n_failed)``, so the driver merge folds ``n_checks x n_blocks``
counters — never data. One scan evaluates the whole contract, exactly
like the fused ``full_validation_pass`` evaluates every keyword in
one pass (engine/validate.py).

Check semantics (mirrors SQL so the DuckDB oracle is hash-exact):

- ``not_null``:     fails where the column IS NULL.
- ``in_set``:       fails where non-null and value not in the set.
- ``between``:      fails where non-null and outside [lo, hi]
                    (inclusive; either bound may be None for open).
- ``matches``:      fails where non-null and the RE2 regex does not
                    match anywhere in the string (same
                    ``pc.match_substring_regex`` == DuckDB
                    ``regexp_matches`` contract as engine/text.py).
- ``str_length_between``: fails where non-null and the UTF-8
                    character length (pc.utf8_length == DuckDB
                    ``length``) is outside [lo, hi].

Nulls only ever fail ``not_null`` — the other checks skip them, so a
contract composes without double-counting (pair any check with a
``not_null`` on the same column to also reject missing values).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

_KINDS = ("not_null", "in_set", "between", "matches",
          "str_length_between")

_PARTIAL_SCHEMA = pa.schema([
    ("check_name", pa.string()),
    ("n_rows", pa.int64()),
    ("n_failed", pa.int64()),
])


def not_null(column: str, name: Optional[str] = None) -> Dict:
    return {"kind": "not_null", "column": column,
            "name": name or f"{column}_not_null"}


def in_set(column: str, values: Sequence[Any],
           name: Optional[str] = None) -> Dict:
    return {"kind": "in_set", "column": column, "values": list(values),
            "name": name or f"{column}_in_set"}


def between(column: str, lo=None, hi=None,
            name: Optional[str] = None) -> Dict:
    if lo is None and hi is None:
        raise ValueError("between: need at least one bound")
    return {"kind": "between", "column": column, "lo": lo, "hi": hi,
            "name": name or f"{column}_between"}


def matches(column: str, pattern: str,
            name: Optional[str] = None) -> Dict:
    return {"kind": "matches", "column": column, "pattern": pattern,
            "name": name or f"{column}_matches"}


def str_length_between(column: str, lo=None, hi=None,
                       name: Optional[str] = None) -> Dict:
    if lo is None and hi is None:
        raise ValueError("str_length_between: need at least one bound")
    return {"kind": "str_length_between", "column": column,
            "lo": lo, "hi": hi,
            "name": name or f"{column}_len_between"}


def _check_failed_count(check: Dict, col: pa.ChunkedArray) -> int:
    """Vectorized fail count for one check over one batch column.

    Counts follow the null contract in the module docstring: the
    ``ok`` kernels below propagate nulls, and ``pc.sum`` skips them,
    so nulls are neither pass nor fail for non-``not_null`` checks.
    """
    kind = check["kind"]
    if kind == "not_null":
        return col.null_count
    non_null = len(col) - col.null_count
    if non_null == 0:
        return 0
    if kind == "in_set":
        vals = pa.array(check["values"]).cast(col.type)
        ok = pc.is_in(col, value_set=vals)
        # is_in maps null -> false; count passes among non-null only
        n_ok = pc.sum(pc.and_(ok, pc.is_valid(col))).as_py() or 0
        return non_null - n_ok
    if kind == "between":
        ok = None
        if check["lo"] is not None:
            ok = pc.greater_equal(col, check["lo"])
        if check["hi"] is not None:
            hi_ok = pc.less_equal(col, check["hi"])
            ok = hi_ok if ok is None else pc.and_(ok, hi_ok)
        return non_null - (pc.sum(ok).as_py() or 0)
    if kind == "matches":
        ok = pc.match_substring_regex(col, check["pattern"])
        return non_null - (pc.sum(ok).as_py() or 0)
    if kind == "str_length_between":
        ln = pc.utf8_length(col)
        ok = None
        if check["lo"] is not None:
            ok = pc.greater_equal(ln, check["lo"])
        if check["hi"] is not None:
            hi_ok = pc.less_equal(ln, check["hi"])
            ok = hi_ok if ok is None else pc.and_(ok, hi_ok)
        return non_null - (pc.sum(ok).as_py() or 0)
    raise ValueError(f"unknown expectation kind: {kind}")


def expectation_report(ds, checks: List[Dict]) -> pa.Table:
    """Evaluate a contract (list of check specs from the builders
    above) over a Dataset in one fused scan.

    Returns a driver-materialized table with one row per check,
    sorted by check name:
    ``(check_name, n_rows, n_failed, fail_e6, passed)`` where ``fail_e6``
    is the integer-truncated failure rate in parts-per-million
    (all-integer so a SQL twin is hash-exact) and ``passed`` is
    ``n_failed == 0`` as int64 (0/1).
    """
    if not checks:
        raise ValueError("expectation_report: empty contract")
    names = [c["name"] for c in checks]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate check names: {names}")
    for c in checks:
        if c["kind"] not in _KINDS:
            raise ValueError(f"unknown expectation kind: {c['kind']}")
    specs = list(checks)

    def partials(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        rows = [{"check_name": c["name"], "n_rows": n,
                 "n_failed": int(_check_failed_count(c, batch[c["column"]]))}
                for c in specs]
        return pa.Table.from_pylist(rows, schema=_PARTIAL_SCHEMA)

    cols = sorted({c["column"] for c in specs})
    part_ds = ds.select_columns(cols).map_batches(
        partials, batch_format="pyarrow", zero_copy_batch=True)

    # n_checks x n_blocks counter rows: fold on the driver.
    agg: Dict[str, List[int]] = {c["name"]: [0, 0] for c in specs}
    for batch in part_ds.iter_batches(batch_format="pyarrow"):
        for row in batch.to_pylist():
            a = agg[row["check_name"]]
            a[0] += row["n_rows"]
            a[1] += row["n_failed"]

    out = []
    for name in sorted(agg):
        n_rows, n_failed = agg[name]
        out.append({
            "check_name": name,
            "n_rows": n_rows,
            "n_failed": n_failed,
            # integer ppm; counts are non-negative so floor == trunc
            "fail_e6": (n_failed * 1_000_000) // n_rows if n_rows else 0,
            "passed": int(n_failed == 0),
        })
    return pa.Table.from_pylist(out, schema=pa.schema([
        ("check_name", pa.string()), ("n_rows", pa.int64()),
        ("n_failed", pa.int64()), ("fail_e6", pa.int64()),
        ("passed", pa.int64())]))
