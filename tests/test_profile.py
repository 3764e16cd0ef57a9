"""Schema suggestion (engine/profile.py): the suggested draft-04
schema round-trips through the repo's OWN parser/expander, validates
the profiled corpus with zero violations by construction, and picks
up enums/bounds/required from the observed data."""

import pyarrow as pa
import pyarrow.parquet as pq

import json_schema_ray as jsr
from json_schema_ray.engine.profile import suggest_schema
from json_schema_ray.engine.validate import (
    compile_plan_for,
    violations_dataset,
)


def _roundtrip(table_name, ray):
    path = f"/root/testdata/sf0.001/{table_name}.parquet"
    ds = ray.data.read_parquet(path)
    schema = suggest_schema(ds)
    s = jsr.parse_bang(schema)  # repo's own parser accepts it
    s.expand_references_bang()
    plan = compile_plan_for(schema, pq.read_schema(path))
    v = violations_dataset(ds, plan)
    n = sum(b.num_rows for b in v.iter_batches(batch_format="pyarrow"))
    return schema, n


def test_suggested_schema_validates_clean(ray_session):
    import ray

    for table in ("documents", "events", "embeddings"):
        schema, n_violations = _roundtrip(table, ray)
        assert n_violations == 0, (table, n_violations)


def test_suggested_schema_content(ray_session):
    import ray

    schema, _ = _roundtrip("documents", ray)
    lang = schema["properties"]["lang"]
    assert lang["enum"] == ["de", "en", "es", "fr", "zh"]
    assert lang["minLength"] == 2 and lang["maxLength"] == 2
    nc = schema["properties"]["n_chars"]
    assert nc["type"] == ["integer"]
    assert isinstance(nc["minimum"], int) and nc["minimum"] <= nc["maximum"]
    assert "text" in schema["required"]  # zero-null column


def test_suggested_schema_rejects_drifted_rows(ray_session):
    """The operational point: rows outside the profiled envelope
    violate the suggested schema."""
    import ray

    schema, _ = _roundtrip("documents", ray)
    bad = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["x"], pa.string()),
        "lang": pa.array(["tlh"], pa.string()),  # not in enum
        "source": pa.array(["src0"], pa.string()),
        "n_chars": pa.array([10 ** 9], pa.int64()),  # above maximum
    })
    plan = compile_plan_for(schema, bad.schema)
    v = violations_dataset(ray.data.from_arrow(bad), plan)
    rows = [r for b in v.iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()]
    types = {r["error_type"] for r in rows}
    assert "invalid_type" in types or "max_failed" in types
    assert len(rows) >= 2  # enum + maximum both trip


def test_bounded_distinct_caps(ray_session):
    import ray

    from json_schema_ray.engine.profile import _bounded_distinct

    t = pa.table({"c": pa.array([f"v{i % 50}" for i in range(500)],
                                pa.string())})
    got = _bounded_distinct(ray.data.from_arrow(t).repartition(4),
                            ["c"], cap=8)
    assert got["c"] is None  # 50 distinct > 8: reported as over-cap
