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


def _synth_shaped_corpus():
    import numpy as np

    rng = np.random.default_rng(77)
    n = 400
    uuids = [("%08x-%04x-%04x-%04x-%012x" % (
        rng.integers(0, 2**32), rng.integers(0, 2**16),
        rng.integers(0, 2**16), rng.integers(0, 2**16),
        rng.integers(0, 2**48))) for _ in range(n)]
    emails = [f"user{i}@example{i % 7}.com" for i in range(n)]
    stamps = [f"2024-0{1 + i % 9}-1{i % 9}T0{i % 9}:1{i % 5}:2{i % 7}Z"
              for i in range(n)]
    codes = [f"AB-{1000 + i}" if i % 2 else f"{10 + i}-AB"
             for i in range(n)]  # divergent token order: no claim
    skus = [f"SKU-{10000 + i}" for i in range(n)]  # one shape
    return pa.table({
        "id": pa.array(uuids, pa.string()),
        "email": pa.array(emails, pa.string()),
        "created": pa.array(stamps, pa.string()),
        "sku": pa.array(skus, pa.string()),
        "code": pa.array(codes, pa.string()),
    })


def test_suggested_schema_format_and_pattern_hints(ray_session):
    """Format hints (uuid/email/date-time) and shape-pattern
    candidates are detected on a bounded sample, VERIFIED corpus-wide
    (a single mismatching value kills the claim), and the resulting
    schema's checks catch planted drift rows."""
    import ray

    t = _synth_shaped_corpus()
    ds = ray.data.from_arrow(t).repartition(4)
    schema = suggest_schema(ds)
    props = schema["properties"]
    assert props["id"]["format"] == "uuid"
    assert props["email"]["format"] == "email"
    assert props["created"]["format"] == "date-time"
    assert props["sku"].get("pattern") == "^[A-Z]{3}-[0-9]{5}$"
    assert "pattern" not in props["code"]  # mixed shapes: no claim
    assert "format" not in props["code"]

    s = jsr.parse_bang(schema)  # round-trips the repo's own parser
    s.expand_references_bang()

    # the profiled corpus itself stays violation-free
    plan = compile_plan_for(schema, t.schema)
    v = violations_dataset(ds, plan)
    assert sum(b.num_rows
               for b in v.iter_batches(batch_format="pyarrow")) == 0

    # planted drift rows trip the new format/pattern checks
    bad = pa.table({
        "id": pa.array(["not-a-uuid"], pa.string()),
        "email": pa.array(["user@@bad"], pa.string()),
        "created": pa.array(["2024-13-99"], pa.string()),
        "sku": pa.array(["SKU-12"], pa.string()),
        "code": pa.array(["whatever"], pa.string()),
    })
    plan_bad = compile_plan_for(schema, bad.schema)
    rows = [r for b in violations_dataset(
        ray.data.from_arrow(bad), plan_bad)
        .iter_batches(batch_format="pyarrow") for r in b.to_pylist()]
    bad_cols = {r["path"].split("/")[-1] for r in rows}
    assert {"id", "email", "created", "sku"} <= bad_cols


def test_format_claim_killed_by_single_mismatch(ray_session):
    """One off-format value anywhere in the corpus must suppress the
    format hint (the sample said uuid; the verify pass disagrees)."""
    import ray

    t = _synth_shaped_corpus()
    col = t["id"].to_pylist()
    col[-1] = "zz-not-a-uuid"  # beyond the sample window
    t2 = t.set_column(t.schema.get_field_index("id"), "id",
                      pa.array(col, pa.string()))
    schema = suggest_schema(ray.data.from_arrow(t2).repartition(4))
    assert "format" not in schema["properties"]["id"]
