"""Snapshot-over-snapshot dedup (engine/dedup.py incremental_dedup +
append_index_fragment): survivors of a new delta against a historic
key index, verified against plain-Python set logic, plus the
persisted-index round trip (a second ingestion of the same keys must
admit nothing)."""

import numpy as np
import pyarrow as pa

from json_schema_ray.engine.dedup import (
    append_index_fragment,
    incremental_dedup,
)


def _brute(delta_rows, index_keys):
    """(id, key) survivors: min id per key in delta, key not in
    index; None keys group together and always survive the
    anti-filter (SQL NOT EXISTS semantics)."""
    best = {}
    for i, k in delta_rows:
        if k not in best or i < best[k]:
            best[k] = i
    return sorted((i, k) for k, i in best.items()
                  if k is None or k not in index_keys)


def _run(delta_rows, index_keys, ray):
    delta = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([i for i, _ in delta_rows], pa.int64()),
        "key": pa.array([k for _, k in delta_rows], pa.string()),
    })).repartition(3)
    index = ray.data.from_arrow(pa.table({
        "key": pa.array(sorted(index_keys), pa.string()),
    })).repartition(2)
    out = incremental_dedup(delta, index, "key", "doc_id").take_all()
    return sorted((r["doc_id"], r["key"]) for r in out)


def test_incremental_dedup_handcrafted(ray_session):
    import ray

    delta = [(5, "b"), (2, "b"), (7, "c"), (9, "c"), (1, "d"),
             (4, None), (8, None)]
    index = {"a", "b"}
    got = _run(delta, index, ray)
    assert got == _brute(delta, index)
    # b dropped (in index), c collapsed to id 7, d admitted, one
    # null-key keeper survives
    assert (1, "d") in got and (7, "c") in got
    assert not any(k == "b" for _, k in got)


def test_incremental_dedup_randomized_differential(ray_session):
    import ray

    rng = np.random.default_rng(11)
    delta = [(int(i), f"k{int(rng.integers(0, 30))}")
             for i in rng.permutation(200)]
    index = {f"k{i}" for i in range(0, 30, 3)}
    assert _run(delta, index, ray) == _brute(delta, index)


def test_incremental_dedup_empty_sides(ray_session):
    import ray

    delta = [(1, "x"), (2, "x")]
    assert _run(delta, set(), ray) == [(1, "x")]
    assert _run([], {"x"}, ray) == []


def test_index_roundtrip_second_ingestion_admits_nothing(
        ray_session, tmp_path):
    import ray

    delta_rows = [(1, "p"), (2, "q"), (3, "p")]
    delta = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([i for i, _ in delta_rows], pa.int64()),
        "key": pa.array([k for _, k in delta_rows], pa.string())}))
    empty_index = ray.data.from_arrow(pa.table({
        "key": pa.array([], pa.string())}))
    survivors = incremental_dedup(delta, empty_index, "key", "doc_id")
    idx_dir = str(tmp_path / "index")
    part = append_index_fragment(survivors, idx_dir, "run1", "key")
    assert part.endswith("run_id=run1")
    # idempotent re-run of the same run_id: no duplicate keys
    survivors2 = incremental_dedup(delta, empty_index, "key", "doc_id")
    append_index_fragment(survivors2, idx_dir, "run1", "key")
    index = ray.data.read_parquet(idx_dir)
    assert sorted(r["key"] for r in
                  index.select_columns(["key"]).take_all()) == ["p", "q"]
    # second snapshot of the SAME corpus against the persisted index
    out = incremental_dedup(delta, index, "key", "doc_id").take_all()
    assert out == []
