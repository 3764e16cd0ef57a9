"""Flagship pipeline: full transcript-corpus validation.

read_parquet (or deterministic synthetic transcripts) ->
vectorized keyword validation (violations + verdicts) ->
uniqueness on (conv_id, turn_idx) -> per-conversation turn-ordering
-> per-column stats. One generic violation report comes back as a
Dataset; summary stats are small driver-side tables.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import pyarrow as pa

from ..engine.keys import turn_ordering_violations, uniqueness_violations
from ..engine.stats import column_stats
from ..engine.validate import compile_plan_for, verdict_counts, violations_dataset
from ..sources.transcripts import (
    TRANSCRIPT_SCHEMA,
    VALIDATION_SCHEMA,
    write_transcripts,
)

# generic cross-check violation report shape
REPORT_SCHEMA = pa.schema([
    ("check", pa.string()),
    ("key", pa.string()),
    ("path", pa.string()),
    ("error_type", pa.string()),
    ("message", pa.string()),
])


def transcripts_path(n_turns: int, seed: int = 42,
                     violation_rate: float = 0.01,
                     n_files: int = 8) -> str:
    """Deterministic synthetic transcript corpus, cached under /tmp."""
    path = (f"/tmp/json_schema_ray/transcripts_n{n_turns}_s{seed}"
            f"_v{violation_rate}_f{n_files}")
    marker = os.path.join(path, "_DONE")
    if not os.path.exists(marker):
        write_transcripts(path, n_turns, seed=seed,
                          violation_rate=violation_rate, n_files=n_files)
        with open(marker, "w") as fh:
            fh.write("ok")
    return path


def validation_report(ds, schema_json=None, key_columns=None):
    """Keyword violations + uniqueness + ordering, unioned into one
    generic report Dataset."""
    schema_json = schema_json or VALIDATION_SCHEMA
    key_columns = key_columns or ["conv_id", "turn_idx"]
    arrow_schema = ds.schema().base_schema
    plan = compile_plan_for(schema_json, arrow_schema, key_columns=key_columns)

    keyword = violations_dataset(ds, plan)

    def keyword_to_report(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        keys = [
            json.dumps({k: batch[k][i].as_py() for k in key_columns},
                       default=str)
            for i in range(n)
        ]
        return pa.table({
            "check": pa.array(["keyword"] * n, pa.string()),
            "key": pa.array(keys, pa.string()),
            "path": batch["path"],
            "error_type": batch["error_type"],
            "message": batch["message"],
        })

    report = keyword.map_batches(keyword_to_report, batch_format="pyarrow")

    uniq = uniqueness_violations(ds, key_columns)

    def uniq_to_report(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "check": pa.array(["uniqueness"] * n, pa.string()),
            "key": batch["key"],
            "path": pa.array(["#"] * n, pa.string()),
            "error_type": batch["error_type"],
            "message": batch["message"],
        })

    order = turn_ordering_violations(ds)

    def order_to_report(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        keys = [json.dumps({"conv_id": v}) for v in batch["conv_id"].to_pylist()]
        return pa.table({
            "check": pa.array(["ordering"] * n, pa.string()),
            "key": pa.array(keys, pa.string()),
            "path": pa.array(["#"] * n, pa.string()),
            "error_type": batch["error_type"],
            "message": batch["message"],
        })

    return report.union(
        uniq.map_batches(uniq_to_report, batch_format="pyarrow"),
        order.map_batches(order_to_report, batch_format="pyarrow"),
    )


def run_flagship(n_turns: int = 6000, seed: int = 42,
                 violation_rate: float = 0.01,
                 with_stats: bool = True) -> dict:
    """The end-to-end flagship: returns the report Dataset plus
    summary dictionaries."""
    import ray

    path = transcripts_path(n_turns, seed=seed, violation_rate=violation_rate)
    files = sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.endswith(".parquet"))
    ds = ray.data.read_parquet(files)
    report = validation_report(ds)
    out = {"report": report}
    if with_stats:
        plan = compile_plan_for(VALIDATION_SCHEMA, TRANSCRIPT_SCHEMA,
                                key_columns=["conv_id", "turn_idx"])
        out["verdicts"] = verdict_counts(ray.data.read_parquet(files), plan)
        out["stats"] = column_stats(ray.data.read_parquet(files))
    return out
