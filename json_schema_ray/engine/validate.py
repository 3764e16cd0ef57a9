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


def verdicts_dataset(ds, plan: TablePlan):
    """Input dataset with an appended boolean ``valid`` column (the
    fail_fast analogue: masks only, no message materialization)."""

    def batch_fn(batch: pa.Table) -> pa.Table:
        ok = verdict_mask(batch, plan)
        return batch.append_column("valid", pa.array(ok, type=pa.bool_()))

    return ds.map_batches(batch_fn, batch_format="pyarrow",
                          zero_copy_batch=True)


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
