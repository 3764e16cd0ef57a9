"""Schema suggestion from corpus profiling — closes the engine's
loop: profile a Parquet corpus, emit a draft-04 JSON Schema that the
repo's OWN parser/expander accepts, and validate the corpus against
it with zero violations by construction. The operational use is
bootstrapping: a pipeline owner profiles yesterday's corpus, reviews
and tightens the suggested schema, then enforces it on tomorrow's.

All profiling rides :func:`~json_schema_ray.engine.stats.column_stats`
(one pass, mergeable partials) plus one bounded distinct-value scan
for enum candidates (per-block ``pc.unique`` capped at enum_max + 1,
so the driver never holds more than a handful of values per string
column no matter the corpus size).
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc


def _bounded_distinct(ds, columns, cap: int):
    """{col: sorted distinct values} for each string column whose
    exact distinct count is <= cap, else the col maps to None. Each
    block ships at most cap + 1 values per column."""

    def uniq(batch: pa.Table) -> pa.Table:
        out_col, out_val = [], []
        for c in columns:
            u = pc.unique(batch[c].combine_chunks().drop_null())
            for v in u.slice(0, cap + 1).to_pylist():
                out_col.append(c)
                out_val.append(v)
        return pa.table({"c": pa.array(out_col, pa.string()),
                         "v": pa.array(out_val, pa.string())})

    seen: dict = {c: set() for c in columns}
    over = set()
    for b in ds.map_batches(uniq, batch_format="pyarrow",
                            zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        for c, v in zip(b["c"].to_pylist(), b["v"].to_pylist()):
            if c in over:
                continue
            seen[c].add(v)
            if len(seen[c]) > cap:
                over.add(c)
    return {c: (None if c in over else sorted(seen[c]))
            for c in columns}


# format hints are restricted to the PURE-REGEX entries of the
# engine's format table (json_schema_ray/formats.py, reference:
# lib/json_schema/validator.rb:569-604): "date" and "uri" need
# calendar / URI-parser checks a corpus-wide Arrow verification pass
# can't replicate exactly, and "hostname" both uses a lookahead (not
# RE2) and matches nearly any token. The validator SEARCHES per line
# (re.M), so a full-string RE2 match here is strictly stricter —
# a detected format can never produce a violation on this corpus.
_FORMAT_CANDIDATES = (
    ("date-time",
     r"^[0-9]{4}-[0-9]{2}-[0-9]{2}T[0-2][0-9]:[0-5][0-9]:[0-5][0-9]"
     r"(\.[0-9]+)?(Z|[\-+][0-9]{2}:[0-5][0-9])$"),
    ("uuid",
     r"^[a-f0-9]{8}-[a-f0-9]{4}-[a-f0-9]{4}-[a-f0-9]{4}"
     r"-[a-f0-9]{12}$"),
    ("email", r"(?i)^[A-Z0-9._%+-]+@[A-Z0-9.-]+\.[A-Z]+$"),
    ("ipv4",
     r"^((25[0-5]|(2[0-4]|1{0,1}[0-9]){0,1}[0-9])\.){3,3}"
     r"(25[0-5]|(2[0-4]|1{0,1}[0-9]){0,1}[0-9])$"),
)

_CLASS_DIGIT, _CLASS_LOWER, _CLASS_UPPER = "[0-9]", "[a-z]", "[A-Z]"
_RE_SPECIALS = set("\\^$.|?*+()[]{}")


def _shape_tokens(value: str):
    """Tokenize a string into (token, run_length) shape runs: digit /
    lower / upper classes or a literal character. Returns None for
    values that would produce an unwieldy pattern (> 24 runs)."""
    toks = []
    for ch in value:
        if ch.isdigit() and ch.isascii():
            t = _CLASS_DIGIT
        elif ch.isalpha() and ch.isascii() and ch.islower():
            t = _CLASS_LOWER
        elif ch.isalpha() and ch.isascii() and ch.isupper():
            t = _CLASS_UPPER
        elif ch.isascii() and not ch.isspace():
            t = "\\" + ch if ch in _RE_SPECIALS else ch
        else:
            return None  # whitespace / non-ascii: no shape claim
        if toks and toks[-1][0] == t:
            toks[-1][1] += 1
        else:
            toks.append([t, 1])
        if len(toks) > 24:
            return None
    return [(t, n) for t, n in toks]


def _shape_pattern(values) -> Optional[str]:
    """Generalize sample values into one anchored regex candidate:
    every value must share the same token sequence (classes and
    literals in the same order); run lengths widen to ``{min,max}``.
    Conservative by design — any disagreement returns None."""
    shapes = [_shape_tokens(v) for v in values if v]
    if len(shapes) < 2 or any(s is None for s in shapes):
        return None
    first = shapes[0]
    if any(len(s) != len(first)
           or [t for t, _ in s] != [t for t, _ in first]
           for s in shapes[1:]):
        return None
    parts = []
    for i, (tok, _) in enumerate(first):
        lo = min(s[i][1] for s in shapes)
        hi = max(s[i][1] for s in shapes)
        is_class = tok.startswith("[")
        if not is_class and lo == hi:
            parts.append(tok * lo)
        elif lo == hi == 1:
            parts.append(tok)
        elif lo == hi:
            parts.append(f"{tok}{{{lo}}}")
        else:
            parts.append(f"{tok}{{{lo},{hi}}}")
    pattern = "^" + "".join(parts) + "$"
    return pattern if len(pattern) <= 120 else None


def _bounded_sample(ds, columns, per_block: int = 8, cap: int = 64):
    """{col: list of <= cap sample values}: each block contributes
    its first ``per_block`` non-null values per column, the driver
    keeps the first ``cap`` — bounded both sides, one pass."""
    if not columns:
        return {}

    def head(batch: pa.Table) -> pa.Table:
        out_col, out_val = [], []
        for c in columns:
            vals = batch[c].combine_chunks().drop_null() \
                .slice(0, per_block).to_pylist()
            out_col.extend([c] * len(vals))
            out_val.extend(vals)
        return pa.table({"c": pa.array(out_col, pa.string()),
                         "v": pa.array(out_val, pa.string())})

    sample: dict = {c: [] for c in columns}
    for b in ds.map_batches(head, batch_format="pyarrow",
                            zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        for c, v in zip(b["c"].to_pylist(), b["v"].to_pylist()):
            if len(sample[c]) < cap:
                sample[c].append(v)
    return sample


def _verify_regexes(ds, checks):
    """``checks`` = [(col, key, regex)] candidate claims; returns the
    set of keys whose regex matches EVERY non-null value of its
    column corpus-wide — one vectorized map_batches pass
    (pc.match_substring_regex is RE2), per-block mismatch counts
    summed on the driver (O(len(checks)) ints per block)."""
    if not checks:
        return set()

    def miss_counts(batch: pa.Table) -> pa.Table:
        misses = []
        for col, _, regex in checks:
            arr = batch[col].combine_chunks().drop_null()
            if len(arr) == 0:
                misses.append(0)
                continue
            ok = pc.match_substring_regex(arr, regex)
            misses.append(len(arr) - pc.sum(ok).as_py())
        return pa.table({"k": pa.array(range(len(checks)), pa.int64()),
                         "m": pa.array(misses, pa.int64())})

    totals = [0] * len(checks)
    for b in ds.map_batches(miss_counts, batch_format="pyarrow",
                            zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        for k, m in zip(b["k"].to_pylist(), b["m"].to_pylist()):
            totals[k] += m
    return {key for (col, key, regex), t in zip(checks, totals)
            if t == 0}


def suggest_schema(ds, enum_max: int = 8,
                   columns: Optional[Sequence[str]] = None,
                   formats: bool = True,
                   patterns: bool = True) -> dict:
    """Profile ``ds`` and return a draft-04 schema dict: observed
    Arrow types map to JSON types, zero-null columns become
    ``required``, numeric columns get inclusive observed
    ``minimum``/``maximum``, string columns get observed
    ``minLength``/``maxLength`` (and an ``enum`` when their exact
    distinct count is <= ``enum_max``), list columns type as arrays
    with element-type items. With ``formats``/``patterns`` on,
    string columns additionally get a ``format`` hint (date-time /
    uuid / email / ipv4, preselected on a bounded sample) or — when
    no format or enum applies — a shape ``pattern`` candidate
    generalized from the sample; every format/pattern claim is then
    VERIFIED corpus-wide in one vectorized RE2 pass and dropped on
    any mismatch, preserving zero violations by construction. The
    schema round-trips through the repo's own parser (tested), and
    the emitted format checks catch drift rows that break the
    profiled shape (tested)."""
    import re as _pyre

    from .stats import column_stats

    base = ds.schema().base_schema
    names = list(columns) if columns else list(base.names)
    stats = {r["column"]: r
             for r in column_stats(ds, columns=names).to_pylist()}

    enum_candidates = [
        n for n in names
        if pa.types.is_string(base.field(n).type)
        and stats[n]["approx_distinct"] is not None
        # HLL error is ~1.6%: anything estimated near enum_max could
        # be exactly enum_max, so probe a safety band
        and stats[n]["approx_distinct"] <= enum_max * 2]
    enums = _bounded_distinct(ds, enum_candidates, enum_max) \
        if enum_candidates else {}

    str_cols = [n for n in names
                if pa.types.is_string(base.field(n).type)
                or pa.types.is_large_string(base.field(n).type)]
    fmt_of: dict = {}
    pattern_of: dict = {}
    if (formats or patterns) and str_cols:
        sample = _bounded_sample(ds, str_cols)
        checks = []
        for n in str_cols:
            vals = sample.get(n) or []
            if not vals:
                continue
            claimed_fmt = False
            if formats:
                for fname, rx in _FORMAT_CANDIDATES:
                    if all(_pyre.match(rx, v) for v in vals):
                        checks.append((n, ("format", n, fname), rx))
                        claimed_fmt = True
                        break
            if patterns and not claimed_fmt:
                pat = _shape_pattern(vals)
                if pat is not None:
                    checks.append((n, ("pattern", n, pat), pat))
        for kind, n, val in _verify_regexes(ds, checks):
            (fmt_of if kind == "format" else pattern_of)[n] = val

    props: dict = {}
    required = []
    for n in names:
        t = base.field(n).type
        st = stats[n]
        if st["null_count"] == 0:
            required.append(n)
        if pa.types.is_integer(t):
            p = {"type": ["integer"]}
            if st["num_min"] is not None:
                p["minimum"] = int(st["num_min"])
                p["maximum"] = int(st["num_max"])
        elif pa.types.is_floating(t):
            p = {"type": ["number"]}
            if st["num_min"] is not None:
                p["minimum"] = float(st["num_min"])
                p["maximum"] = float(st["num_max"])
        elif pa.types.is_boolean(t):
            p = {"type": ["boolean"]}
        elif pa.types.is_timestamp(t):
            # the engine renders timestamps as RFC3339 date-time
            # strings (README: tables-vs-documents semantics)
            p = {"type": ["string"], "format": "date-time"}
        elif (pa.types.is_list(t) or pa.types.is_large_list(t)
              or pa.types.is_fixed_size_list(t)):
            p = {"type": ["array"]}
            vt = t.value_type
            if pa.types.is_integer(vt):
                p["items"] = {"type": ["integer"]}
            elif pa.types.is_floating(vt):
                p["items"] = {"type": ["number"]}
            elif pa.types.is_string(vt):
                p["items"] = {"type": ["string"]}
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            p = {"type": ["string"]}
            if st["len_min"] is not None:
                p["minLength"] = int(st["len_min"])
                p["maxLength"] = int(st["len_max"])
            vals = enums.get(n)
            if vals is not None and len(vals) <= enum_max:
                p["enum"] = vals
            if n in fmt_of:
                p["format"] = fmt_of[n]
            elif n in pattern_of and "enum" not in p:
                p["pattern"] = pattern_of[n]
        else:
            p = {}  # unprofiled type: anything goes
        props[n] = p

    out = {
        "$schema": "http://json-schema.org/draft-04/schema#",
        "type": ["object"],
        "properties": props,
    }
    if required:  # draft-04 forbids an empty required array
        out["required"] = sorted(required)
    return out
