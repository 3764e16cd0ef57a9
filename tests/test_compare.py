"""Per-turn text-equality compare (engine/compare.py): keyed
shuffle path and zero-shuffle aligned-partition path, including a
transcript fixture where the "reference output" differs at known
rows."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from json_schema_ray.engine.compare import (
    aligned_text_compare,
    compare_partition_tables,
    keyed_text_compare,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def _ray():
    import ray

    return ray


def _table(rows):
    return pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "text": pa.array([r[2] for r in rows], pa.string()),
    })


A_ROWS = [("c1", 0, "a"), ("c1", 1, "b"), ("c2", 0, "c"), ("c3", 0, None)]
B_ROWS = [("c1", 0, "a"), ("c1", 1, "X"), ("c3", 0, None), ("c4", 0, "d")]
EXPECTED = [
    ("c1", 1, "text_mismatch", "b", "X"),
    ("c2", 0, "missing_in_b", "c", None),
    ("c4", 0, "missing_in_a", None, "d"),
]


def _norm(t: pa.Table):
    t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    return list(zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist(),
                    t["error_type"].to_pylist(), t["text_a"].to_pylist(),
                    t["text_b"].to_pylist()))


def _collect(ds):
    tables = [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch)
              else b for b in ds.iter_batches(batch_format="pyarrow")]
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return None
    return pa.concat_tables(tables, promote_options="default")


def test_keyed_compare_all_mismatch_types():
    ds_a = _ray().data.from_arrow(_table(A_ROWS))
    ds_b = _ray().data.from_arrow(_table(B_ROWS))
    out = _collect(keyed_text_compare(ds_a, ds_b, ["conv_id", "turn_idx"]))
    assert _norm(out) == EXPECTED


def test_partition_compare_fast_path_and_join_fallback():
    ta = _table(A_ROWS)
    # same keys, different physical order -> local sort aligns, fast path
    tb_aligned = _table([A_ROWS[2], A_ROWS[0],
                         ("c1", 1, "X"), A_ROWS[3]])
    out = compare_partition_tables(ta, tb_aligned, ["conv_id", "turn_idx"])
    assert _norm(out) == [("c1", 1, "text_mismatch", "b", "X")]

    # dropped + extra rows -> join fallback with missing-side rows
    out = compare_partition_tables(ta, _table(B_ROWS),
                                   ["conv_id", "turn_idx"])
    assert _norm(out) == EXPECTED


def test_aligned_compare_over_file_pairs(tmp_path):
    pairs = []
    for i, (rows_a, rows_b) in enumerate([
        (A_ROWS, B_ROWS),
        ([("d1", 0, "same")], [("d1", 0, "same")]),
    ]):
        fa = str(tmp_path / f"a-{i}.parquet")
        fb = str(tmp_path / f"b-{i}.parquet")
        pq.write_table(_table(rows_a), fa)
        pq.write_table(_table(rows_b), fb)
        pairs.append((fa, fb))
    out = _collect(aligned_text_compare(pairs, ["conv_id", "turn_idx"]))
    assert _norm(out) == EXPECTED


def test_transcript_fixture_known_mismatch_rows(tmp_path):
    """The §2.4 invariant end-to-end: candidate corpus vs a 'reference
    output' corpus that differs at known (conv_id, turn_idx) rows."""
    from json_schema_ray.sources.transcripts import generate_transcripts

    t = generate_transcripts(2000, seed=42)
    # reference output: drop 3 known rows, rewrite 5 known texts
    drop = {4, 400, 1400}
    edit = {10, 11, 500, 900, 1900}
    keep_mask = [i not in drop for i in range(t.num_rows)]
    texts = t["text"].to_pylist()
    expected = {}
    for i in edit:
        expected[(t["conv_id"][i].as_py(),
                  t["turn_idx"][i].as_py())] = "text_mismatch"
        texts[i] = texts[i] + " [EDITED]"
    for i in drop:
        expected[(t["conv_id"][i].as_py(),
                  t["turn_idx"][i].as_py())] = "missing_in_b"
    ref = pa.table({
        "conv_id": t["conv_id"], "turn_idx": t["turn_idx"],
        "text": pa.array(texts, pa.string()),
    }).filter(pa.array(keep_mask))

    # co-partitioned layout: 4 shards split at the same row boundaries
    # of the CANDIDATE; the reference shards lose their dropped rows,
    # exercising the join fallback in those partitions
    pairs = []
    step = 500
    for f in range(4):
        ca = t.slice(f * step, step)
        fa = str(tmp_path / f"cand-{f}.parquet")
        fb = str(tmp_path / f"ref-{f}.parquet")
        pq.write_table(ca.select(["conv_id", "turn_idx", "text"]), fa)
        keys_in_shard = set(zip(ca["conv_id"].to_pylist(),
                                ca["turn_idx"].to_pylist()))
        bmask = [
            (c, ti) in keys_in_shard
            for c, ti in zip(ref["conv_id"].to_pylist(),
                             ref["turn_idx"].to_pylist())
        ]
        pq.write_table(ref.filter(pa.array(bmask)), fb)
        pairs.append((fa, fb))

    out = _collect(aligned_text_compare(pairs, ["conv_id", "turn_idx"]))
    got = {(c, ti): e for c, ti, e in
           zip(out["conv_id"].to_pylist(), out["turn_idx"].to_pylist(),
               out["error_type"].to_pylist())}
    assert got == expected

    # the keyed (shuffle) path agrees exactly
    ds_a = _ray().data.from_arrow(t.select(["conv_id", "turn_idx", "text"]))
    ds_b = _ray().data.from_arrow(ref)
    out2 = _collect(keyed_text_compare(ds_a, ds_b, ["conv_id", "turn_idx"]))
    got2 = {(c, ti): e for c, ti, e in
            zip(out2["conv_id"].to_pylist(), out2["turn_idx"].to_pylist(),
                out2["error_type"].to_pylist())}
    assert got2 == expected


def test_partition_compare_randomized_vs_bruteforce():
    import random

    from json_schema_ray.engine.compare import compare_partition_tables

    rng = random.Random(17)
    for trial in range(25):
        n = rng.randrange(1, 60)
        keys = [(f"c{rng.randrange(8)}", i) for i in range(n)]
        texts = [rng.choice(["x", "y", None]) for _ in range(n)]
        a = list(zip([k[0] for k in keys], [k[1] for k in keys], texts))
        b = []
        for c, i, t in a:
            r = rng.random()
            if r < 0.15:
                continue  # dropped row
            if r < 0.35:
                t = (t or "") + "!"  # edited
            b.append((c, i, t))
        for _ in range(rng.randrange(3)):  # extra rows in b
            b.append((f"z{rng.randrange(3)}", rng.randrange(100), "new"))
        rng.shuffle(b)
        out = compare_partition_tables(_table(a), _table(b),
                                       ["conv_id", "turn_idx"])
        got = {(c, i): e for c, i, e, _, _ in _norm(out)}
        amap = {(c, i): t for c, i, t in a}
        bmap = {(c, i): t for c, i, t in b}
        expected = {}
        for k in set(amap) | set(bmap):
            if k not in amap:
                expected[k] = "missing_in_a"
            elif k not in bmap:
                expected[k] = "missing_in_b"
            elif amap[k] != bmap[k]:
                expected[k] = "text_mismatch"
        assert got == expected, (trial, got, expected)
