"""Ray Data validation stages.

The compile happens once on the driver (parse -> expand ->
``compile_table_plan``); the resulting plan is a small pure-Python
object captured in the ``map_batches`` closure — the analogue of the
reference's "DocumentStore loaded once" (reference:
lib/json_schema/document_store.rb:8-30). Validation itself is
stateless Arrow-compute tasks over zero-copy batches; no shuffle.
"""

from __future__ import annotations

from typing import Any, List, Optional

import pyarrow as pa

from ..expander import ReferenceExpander
from ..parser import Parser
from ..schema import Schema
from .table_validator import (
    TablePlan,
    compile_table_plan,
    validate_batch,
    verdict_mask,
)


def compile_schema(schema_json: dict, store=None) -> Schema:
    """parse + $ref-expand a JSON schema document (driver-side)."""
    schema = Parser().parse_bang(schema_json)
    ReferenceExpander().expand_bang(schema, store=store)
    return schema


def compile_plan_for(
    schema_json: dict,
    arrow_schema: pa.Schema,
    key_columns: Optional[List[str]] = None,
    json_columns: Optional[set] = None,
    store=None,
) -> TablePlan:
    schema = compile_schema(schema_json, store=store)
    return compile_table_plan(schema, arrow_schema,
                              key_columns=key_columns,
                              json_columns=json_columns)


def violations_dataset(ds, plan: TablePlan):
    """Dataset of violation rows (key columns + path/schema_pointer/
    error_type/message/data_json). Streaming, stateless tasks."""

    def batch_fn(batch: pa.Table) -> pa.Table:
        return validate_batch(batch, plan)

    return ds.map_batches(batch_fn, batch_format="pyarrow",
                          zero_copy_batch=True)


class RegistryValidator:
    """Actor-pool stage: validate each row against the schema chosen
    by its ``dispatch`` column — the tool-call-arguments shape, where
    an agent transcript carries N tool families each with its own
    JSON-schema contract (reference semantics per schema: the same
    compile -> TablePlan path as every other validator; reference
    message strings via lib/json_schema/validator.rb fixtures).

    Scale shape: the registry's plans compile ONCE PER ACTOR in
    ``__init__`` (parse + $ref-expand + Arrow lowering for every
    family) — never per batch; ``__call__`` splits a batch by the
    small set of distinct dispatch values present (dictionary-encode,
    one ``filter`` per family actually present — O(families-in-batch)
    masks, each sub-batch validated fully vectorized) and emits the
    union of violation rows with a ``family`` column appended. Rows
    whose dispatch value has no registry entry (or is null) surface
    as one ``unknown_schema`` violation row each rather than
    vanishing. No shuffle; stateless between batches; the registry
    (a dict of plain schema dicts) ships to each actor once."""

    def __init__(self, registry: dict, arrow_schema: pa.Schema,
                 dispatch: str, key_columns: Optional[List[str]] = None,
                 json_columns: Optional[set] = None,
                 family_col: str = "family"):
        body = arrow_schema.remove(arrow_schema.get_field_index(dispatch))
        self.plans = {
            name: compile_plan_for(schema_json, body,
                                   key_columns=key_columns,
                                   json_columns=json_columns)
            for name, schema_json in registry.items()
        }
        self.dispatch = dispatch
        self.key_columns = list(key_columns or [])
        self.family_col = family_col
        any_plan = next(iter(self.plans.values()))
        self.out_schema = any_plan.violation_schema().append(
            pa.field(family_col, pa.string()))

    def _empty(self) -> pa.Table:
        return self.out_schema.empty_table()

    def _unknown_rows(self, sub: pa.Table, value) -> pa.Table:
        n = sub.num_rows
        cols, names = [], []
        for k in self.key_columns:
            cols.append(sub[k]); names.append(k)
        label = "" if value is None else str(value)
        fill = {
            "path": "#", "schema_pointer": "#",
            "error_type": "unknown_schema",
            "message": f"no schema registered for {label!r}.",
            "data_json": "null",
        }
        for f in self.out_schema:
            if f.name in self.key_columns or f.name == self.family_col:
                continue
            cols.append(pa.array([fill.get(f.name, "")] * n, f.type))
            names.append(f.name)
        cols.append(pa.array([label] * n, pa.string()))
        names.append(self.family_col)
        return pa.table(dict(zip(names, cols))).select(
            [f.name for f in self.out_schema])

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if batch.num_rows == 0:
            return self._empty()
        d = batch[self.dispatch].combine_chunks().dictionary_encode()
        body = batch.drop_columns([self.dispatch])
        outs = []
        null_mask = pc.is_null(d)
        if pc.any(null_mask).as_py():
            outs.append(self._unknown_rows(body.filter(null_mask), None))
        for i, value in enumerate(d.dictionary.to_pylist()):
            mask = pc.equal(d.indices, i)
            sub = body.filter(pc.fill_null(mask, False))
            plan = self.plans.get(value)
            if plan is None:
                outs.append(self._unknown_rows(sub, value))
                continue
            v = validate_batch(sub, plan)
            outs.append(v.append_column(
                self.family_col, pa.array([value] * v.num_rows,
                                          pa.string())))
        outs = [t for t in outs if t.num_rows] or [self._empty()]
        return pa.concat_tables(outs).select(
            [f.name for f in self.out_schema])


def validate_by_registry(ds, registry: dict, arrow_schema: pa.Schema,
                         dispatch: str,
                         key_columns: Optional[List[str]] = None,
                         json_columns: Optional[set] = None,
                         family_col: str = "family",
                         concurrency: Optional[int] = None):
    """Dataset of violation rows where each row was validated against
    ``registry[row[dispatch]]`` (see :class:`RegistryValidator`).
    The stage is an ACTOR POOL precisely because the per-family
    compile is real setup work multiplied by len(registry)."""
    # class-based map_batches requires an actor pool size
    extra = {"concurrency": concurrency or 4}
    return ds.map_batches(
        RegistryValidator,
        fn_constructor_kwargs=dict(
            registry=registry, arrow_schema=arrow_schema,
            dispatch=dispatch, key_columns=key_columns,
            json_columns=json_columns, family_col=family_col),
        batch_format="pyarrow", zero_copy_batch=True, **extra)


def verdicts_dataset(ds, plan: TablePlan):
    """Input dataset with an appended boolean ``valid`` column (the
    fail_fast analogue: masks only, no message materialization)."""

    def batch_fn(batch: pa.Table) -> pa.Table:
        ok = verdict_mask(batch, plan)
        return batch.append_column("valid", pa.array(ok, type=pa.bool_()))

    return ds.map_batches(batch_fn, batch_format="pyarrow",
                          zero_copy_batch=True)


def validation_scan_summary(ds, plan: TablePlan,
                            hll_p: int = 12) -> dict:
    """ONE fused scan computing verdict counts, violation-row counts
    and per-column stats partials per batch — the shape a 100TB job
    wants: a single pass over the data, one small partial per block,
    driver-side merge. Returns ``{"total_rows", "valid_rows",
    "invalid_rows", "violation_rows", "stats": pa.Table}``.
    """
    import pyarrow.compute as _pc

    from .stats import _PARTIAL_SCHEMA, _column_partial, _merge_partial
    from .table_validator import validate_batch, verdict_mask

    counter_fields = [("total_rows", pa.int64()),
                      ("valid_rows", pa.int64()),
                      ("violation_rows", pa.int64())]
    out_schema = pa.schema(
        list(_PARTIAL_SCHEMA) + [pa.field(n, t) for n, t in counter_fields])

    def batch_fn(batch: pa.Table) -> pa.Table:
        ok = verdict_mask(batch, plan)
        viol = validate_batch(batch, plan)
        rows = [_column_partial(n, batch[n], hll_p, False)
                for n in batch.column_names]
        for r in rows:
            r["total_rows"] = None
            r["valid_rows"] = None
            r["violation_rows"] = None
        rows.append({
            **{f.name: None for f in _PARTIAL_SCHEMA},
            "column": None,
            "total_rows": len(ok),
            "valid_rows": int(ok.sum()),
            "violation_rows": viol.num_rows,
        })
        return pa.Table.from_pylist(rows, schema=out_schema)

    parts = ds.map_batches(batch_fn, batch_format="pyarrow",
                           zero_copy_batch=True)
    merged: dict = {}
    totals = {"total_rows": 0, "valid_rows": 0, "violation_rows": 0}
    for batch in parts.iter_batches(batch_format="pyarrow"):
        for row in batch.to_pylist():
            if row["column"] is None:
                for k in totals:
                    totals[k] += row[k]
            else:
                _merge_partial(merged, row)

    from .stats import _finalize_stats

    return {
        **totals,
        "invalid_rows": totals["total_rows"] - totals["valid_rows"],
        "stats": _finalize_stats(merged),
    }


def full_validation_pass(ds, plan: TablePlan, hll_p: int = 12,
                         group_key: str = "conv_id",
                         order_key: str = "turn_idx",
                         ts_key: str = "ts",
                         presorted: bool = True) -> dict:
    """THE single-scan job: keyword verdicts + violation-row counts +
    per-column stats partials + per-conversation ordering checks, all
    computed in one ``map_batches`` over (pre)sorted input. Every
    block emits one small partial; the driver merges counters, stats
    sketches, interior ordering violations and the edge-conversation
    stitch set. This is the shape a 10^12-turn job runs: one pass,
    no second scan, nothing row-sized crosses the wire.
    """
    from .keys import ordering_batch_parts, stitch_edge_partials
    from .stats import _PARTIAL_SCHEMA, _column_partial, _finalize_stats, _merge_partial
    from .table_validator import validate_batch, verdict_mask

    has_ts = ts_key in [f for f in (ds.schema().names or [])]
    if not presorted:
        from .relational import null_safe_sort

        ds = null_safe_sort(ds, [group_key], [order_key])

    extra_fields = [
        ("total_rows", pa.int64()), ("valid_rows", pa.int64()),
        ("violation_rows", pa.int64()),
        ("ord_duplicate_turn", pa.int64()), ("ord_turn_gap", pa.int64()),
        ("ord_ts_out_of_order", pa.int64()),
        # edge-conversation stitch state: violation rows (etype/msg)
        # plus ONE fixed-size partial per edge segment — never the
        # conversation's raw (turn, ts) timeline
        ("edge_gid", pa.string()), ("edge_etype", pa.string()),
        ("edge_msg", pa.string()), ("edge_ft", pa.int64()),
        ("edge_lt", pa.int64()), ("edge_fts", pa.int64()),
        ("edge_lts", pa.int64()),
    ]
    out_schema = pa.schema(
        list(_PARTIAL_SCHEMA) + [pa.field(n, t) for n, t in extra_fields])
    blank = {f.name: None for f in out_schema}

    def batch_fn(batch: pa.Table) -> pa.Table:
        # ONE keyword evaluation: the verdict tally comes from the
        # violation rows' distinct row indices (a row is valid iff it
        # contributes none), not a second verdict_mask pass — ~17% of
        # the fused scan's per-batch time (differential-tested)
        viol, n_invalid = validate_batch(batch, plan,
                                         with_invalid_count=True)
        rows = []
        for name in batch.column_names:
            r = dict(blank)
            r.update(_column_partial(name, batch[name], hll_p, False))
            rows.append(r)
        counter = dict(blank)
        counter.update(total_rows=batch.num_rows,
                       valid_rows=batch.num_rows - n_invalid,
                       violation_rows=viol.num_rows,
                       ord_duplicate_turn=0, ord_turn_gap=0,
                       ord_ts_out_of_order=0)
        if batch.num_rows:
            ord_rows, stitch_rows, partials = ordering_batch_parts(
                batch, group_key, order_key, ts_key if has_ts else None)
            # ordering violations reduce to per-type COUNTS here — at
            # scale the full rows are written per-partition (see
            # violations_dataset / manifest), never driver-collected
            for _, etype, _ in ord_rows:
                counter["ord_" + etype] += 1
            for gid, etype, msg in stitch_rows:
                r = dict(blank)
                r.update(edge_gid=gid or "", edge_etype=etype,
                         edge_msg=msg)
                rows.append(r)
            for gid, ft, lt, fts, lts in partials:
                r = dict(blank)
                r.update(edge_gid=gid or "", edge_ft=ft, edge_lt=lt,
                         edge_fts=fts, edge_lts=lts)
                rows.append(r)
        rows.append(counter)
        return pa.Table.from_pylist(rows, schema=out_schema)

    parts = ds.map_batches(batch_fn, batch_format="pyarrow",
                           zero_copy_batch=True)

    merged: dict = {}
    totals = {"total_rows": 0, "valid_rows": 0, "violation_rows": 0}
    ord_counts = {"duplicate_turn": 0, "turn_gap": 0, "ts_out_of_order": 0}
    edge: dict = {}
    for batch in parts.iter_batches(batch_format="pyarrow"):
        for row in batch.to_pylist():
            if row["column"] is not None:
                _merge_partial(merged, row)
            elif row["total_rows"] is not None:
                for k in totals:
                    totals[k] += row[k]
                for k in ord_counts:
                    ord_counts[k] += row["ord_" + k] or 0
            elif row["edge_gid"] is not None:
                slot = edge.setdefault(row["edge_gid"], (set(), []))
                if row["edge_etype"] is not None:
                    slot[0].add((row["edge_gid"], row["edge_etype"],
                                 row["edge_msg"]))
                else:
                    slot[1].append((row["edge_ft"], row["edge_lt"],
                                    row["edge_fts"], row["edge_lts"]))
    edge_rows: list = []
    stitch_edge_partials(edge, has_ts, edge_rows)
    for _, etype, _ in edge_rows:
        ord_counts[etype] += 1

    return {
        **totals,
        "invalid_rows": totals["total_rows"] - totals["valid_rows"],
        "ordering_violation_counts": ord_counts,
        "stats": _finalize_stats(merged),
    }


def verdict_counts(ds, plan: TablePlan) -> dict:
    """Aggregate pass/fail counts without materializing rows."""

    def batch_fn(batch: pa.Table) -> pa.Table:
        ok = verdict_mask(batch, plan)
        return pa.table({
            "valid_rows": pa.array([int(ok.sum())], pa.int64()),
            "total_rows": pa.array([len(ok)], pa.int64()),
        })

    parts = ds.map_batches(batch_fn, batch_format="pyarrow",
                           zero_copy_batch=True)
    import pyarrow.compute as pc

    agg = parts.sum(["valid_rows", "total_rows"])
    valid = agg["sum(valid_rows)"]
    total = agg["sum(total_rows)"]
    return {"valid_rows": int(valid), "total_rows": int(total),
            "invalid_rows": int(total - valid)}
