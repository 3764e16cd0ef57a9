"""Per-turn text equality vs a reference corpus (SURVEY.md §2.4).

The per-row invariant from the engine brief: under the stable
``(conv_id, turn_idx)`` ordering, every turn's ``text`` must equal the
reference output's text for the same key. Two realizations, picked by
data layout:

- :func:`aligned_text_compare` — the 10^12-turn path. When the
  candidate and reference corpora share a partition layout (the
  standard case: the reference run wrote one output file per input
  shard), the comparison needs NO shuffle at all: a Dataset of file
  pairs fans out, each task streams one partition pair, locally sorts
  by the key, and compares with one vectorized ``pc.equal`` mask
  (zip-free — misaligned partitions fall back to a partition-local
  Arrow full-outer join). Wall-clock scales with partition count;
  nothing row-sized ever crosses the wire except actual mismatches.

- :func:`keyed_text_compare` — the layout-agnostic path. Both sides
  are tagged and unioned, then ONE hash shuffle on the key co-locates
  each turn's two rows (``groupby(keys).aggregate`` with min/sum
  combiners — no per-group Python), and a vectorized filter keeps
  only keys whose sides disagree. This is a distributed full-outer
  join realized as an aggregation, so it also reports keys missing
  from either side.

Mismatch semantics (both paths, matching DuckDB
``FULL JOIN .. WHERE a.text IS DISTINCT FROM b.text`` plus explicit
missing-side detection): a key missing from the reference side is
``missing_in_b``, from the candidate side ``missing_in_a``; present on
both sides with null-aware unequal text is ``text_mismatch``. Keys are
assumed unique per side (uniqueness is its own operator,
``engine/keys.py``); with duplicate keys the lexicographically
smallest text per side is compared.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _text_distinct(a, b):
    """Null-aware inequality (SQL IS DISTINCT FROM)."""
    null_a, null_b = pc.is_null(a), pc.is_null(b)
    both_null_differs = pc.xor(null_a, null_b)
    neq = pc.fill_null(pc.not_equal(a, b), False)
    return pc.or_(both_null_differs, neq)


MISMATCH_FIELDS = [("error_type", pa.string()),
                   ("text_a", pa.string()),
                   ("text_b", pa.string())]


def _mismatch_schema(keys: List[str], key_types: List[pa.DataType]) -> pa.Schema:
    return pa.schema(list(zip(keys, key_types)) + MISMATCH_FIELDS)


# ---------------------------------------------------------------------------
# layout-agnostic path: tag + union + one hash shuffle
# ---------------------------------------------------------------------------

def keyed_text_compare(ds_a, ds_b, keys: List[str], column: str = "text"):
    """Dataset of mismatch rows between two keyed corpora.

    Output columns: ``keys... , error_type, text_a, text_b`` —
    ``error_type`` in {text_mismatch, missing_in_a, missing_in_b}.
    """
    from ray.data.aggregate import Min, Sum

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            text = batch[column]
            if not pa.types.is_string(text.type):
                text = pc.cast(text, pa.string())
            nulls = pa.nulls(n, pa.string())
            ones = pa.array(np.ones(n, dtype=np.int64))
            zeros = pa.array(np.zeros(n, dtype=np.int64))
            cols = {k: batch[k] for k in keys}
            cols["__ta"] = text if side == 0 else nulls
            cols["__tb"] = text if side == 1 else nulls
            cols["__na"] = ones if side == 0 else zeros
            cols["__nb"] = ones if side == 1 else zeros
            return pa.table(cols)
        return fn

    tagged_a = ds_a.map_batches(tag(0), batch_format="pyarrow",
                                zero_copy_batch=True)
    tagged_b = ds_b.map_batches(tag(1), batch_format="pyarrow",
                                zero_copy_batch=True)
    unioned = tagged_a.union(tagged_b)
    from .relational import null_safe_grouped_aggregate

    agg = null_safe_grouped_aggregate(
        unioned, keys,
        [Min("__ta", alias_name="text_a", ignore_nulls=True),
         Min("__tb", alias_name="text_b", ignore_nulls=True),
         Sum("__na", alias_name="n_a"),
         Sum("__nb", alias_name="n_b")],
        ["text_a", "text_b", "n_a", "n_b"])

    def to_mismatches(batch: pa.Table) -> pa.Table:
        ta, tb = batch["text_a"], batch["text_b"]
        in_a = pc.greater(batch["n_a"], 0)
        in_b = pc.greater(batch["n_b"], 0)
        bad = pc.or_(pc.invert(pc.and_(in_a, in_b)),
                     _text_distinct(ta, tb))
        batch = batch.filter(bad)
        in_a = pc.greater(batch["n_a"], 0)
        in_b = pc.greater(batch["n_b"], 0)
        etype = pc.if_else(
            pc.invert(in_a), pa.scalar("missing_in_a"),
            pc.if_else(pc.invert(in_b), pa.scalar("missing_in_b"),
                       pa.scalar("text_mismatch")))
        cols = {k: batch[k] for k in keys}
        cols["error_type"] = etype
        cols["text_a"] = batch["text_a"]
        cols["text_b"] = batch["text_b"]
        return pa.table(cols)

    return agg.map_batches(to_mismatches, batch_format="pyarrow",
                           zero_copy_batch=True)


# ---------------------------------------------------------------------------
# co-partitioned path: zero shuffle, one task per partition pair
# ---------------------------------------------------------------------------

def compare_partition_tables(ta: pa.Table, tb: pa.Table, keys: List[str],
                             column: str = "text") -> pa.Table:
    """Partition-local compare. Fast path: both sides sorted by key
    have identical key arrays -> single ``pc.equal`` mask (zip-free).
    Misaligned partitions (dropped/extra rows) fall back to an Arrow
    full-outer join — still local to this partition pair."""
    sort_keys = [(k, "ascending") for k in keys]
    ta = ta.select(keys + [column]).sort_by(sort_keys)
    tb = tb.select(keys + [column]).sort_by(sort_keys)
    key_types = [ta.schema.field(k).type for k in keys]
    out_schema = _mismatch_schema(keys, key_types)

    aligned = ta.num_rows == tb.num_rows
    if aligned:
        for k in keys:
            eq = _text_distinct(ta[k], tb[k])
            if pc.any(eq).as_py():
                aligned = False
                break
    if aligned:
        bad = _text_distinct(ta[column], tb[column])
        if isinstance(bad, pa.ChunkedArray):
            bad = bad.combine_chunks()
        idx = pa.array(np.nonzero(
            bad.to_numpy(zero_copy_only=False))[0])
        if len(idx) == 0:
            return out_schema.empty_table()
        cols = [ta[k].take(idx) for k in keys]
        n = len(idx)
        cols.append(pa.array(["text_mismatch"] * n, pa.string()))
        cols.append(pc.cast(ta[column].take(idx), pa.string()))
        cols.append(pc.cast(tb[column].take(idx), pa.string()))
        return pa.Table.from_arrays(cols, schema=out_schema)

    # partition-local full outer join with explicit side indicators
    la = ta.rename_columns(keys + ["text_a"]) \
        .append_column("__ia", pa.array(np.ones(ta.num_rows, np.int8)))
    lb = tb.rename_columns(keys + ["text_b"]) \
        .append_column("__ib", pa.array(np.ones(tb.num_rows, np.int8)))
    j = la.join(lb, keys=keys, join_type="full outer")
    in_a = pc.fill_null(pc.equal(j["__ia"], 1), False)
    in_b = pc.fill_null(pc.equal(j["__ib"], 1), False)
    bad = pc.or_(pc.invert(pc.and_(in_a, in_b)),
                 _text_distinct(j["text_a"], j["text_b"]))
    j = j.filter(bad)
    in_a = pc.fill_null(pc.equal(j["__ia"], 1), False)
    in_b = pc.fill_null(pc.equal(j["__ib"], 1), False)
    etype = pc.if_else(
        pc.invert(in_a), pa.scalar("missing_in_a"),
        pc.if_else(pc.invert(in_b), pa.scalar("missing_in_b"),
                   pa.scalar("text_mismatch")))
    cols = [j[k] for k in keys]
    cols.append(etype)
    cols.append(pc.cast(j["text_a"], pa.string()))
    cols.append(pc.cast(j["text_b"], pa.string()))
    return pa.Table.from_arrays(cols, schema=out_schema) \
        .sort_by([(k, "ascending") for k in keys])


def aligned_text_compare(pairs: Sequence[Tuple[str, str]], keys: List[str],
                         column: str = "text",
                         concurrency: Optional[int] = None):
    """Zero-shuffle compare over co-partitioned Parquet layouts.

    ``pairs`` maps each candidate partition file to its reference
    partition file (same key range by construction). One Ray task per
    pair streams both files and emits only mismatch rows — the scale
    path for comparing a migrated 10^12-turn corpus against the
    reference run's output.
    """
    import ray

    items = [{"file_a": a, "file_b": b} for a, b in pairs]
    ds = ray.data.from_items(items)

    def cmp_batch(batch: pa.Table) -> pa.Table:
        outs = []
        for fa, fb in zip(batch["file_a"].to_pylist(),
                          batch["file_b"].to_pylist()):
            ta = pq.read_table(fa, columns=keys + [column])
            tb = pq.read_table(fb, columns=keys + [column])
            outs.append(compare_partition_tables(ta, tb, keys, column))
        return pa.concat_tables(outs, promote_options="default")

    # one file pair per task: partition-sized units of work
    return ds.map_batches(cmp_batch, batch_format="pyarrow",
                          batch_size=1,
                          concurrency=concurrency)
