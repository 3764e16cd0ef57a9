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


def suggest_schema(ds, enum_max: int = 8,
                   columns: Optional[Sequence[str]] = None) -> dict:
    """Profile ``ds`` and return a draft-04 schema dict: observed
    Arrow types map to JSON types, zero-null columns become
    ``required``, numeric columns get inclusive observed
    ``minimum``/``maximum``, string columns get observed
    ``minLength``/``maxLength`` (and an ``enum`` when their exact
    distinct count is <= ``enum_max``), list columns type as arrays
    with element-type items. By construction the profiled corpus
    validates with zero violations; the schema round-trips through
    the repo's own parser (tested)."""
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
