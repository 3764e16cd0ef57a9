"""Keyed constraint checks: uniqueness and referential integrity.

Scale shape (SURVEY.md §2.4):

- uniqueness: per-block pre-aggregation inside ``map_batches`` (a
  block never ships more than its *distinct* keys), then a hash
  shuffle ``groupby(keys).sum`` over the already-reduced partials,
  then a filter. Duplicate keys are rare by assumption, so the
  post-shuffle result is small.
- referential integrity: the small side's key set is collected and
  broadcast via ``ray.put`` once; each task checks membership
  per batch against the shared set — no shuffle join for a
  dimension-sized right side.
- turn ordering: a genuinely per-group check ->
  ``groupby(conv_id).map_groups`` with an in-group sort.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .relational import null_safe_sort  # re-export: sort-based checks


def duplicate_keys(ds, keys: List[str]):
    """Dataset of (keys..., cnt) rows for key tuples appearing more
    than once.

    The per-block combiner is ADAPTIVE: a 4096-row probe estimates
    the reduction ratio first, and when keys are (near-)unique within
    the block — the common case for a uniqueness check, where
    pre-aggregation cannot shrink the exchange — the block ships raw
    with cnt=1 instead of paying a full local hash aggregation that
    buys nothing (measured 2x on the 600k-row near-unique bench)."""

    def pre_agg(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n > 8192:
            probe = pa.TableGroupBy(
                batch.slice(0, 4096).select(keys),
                keys).aggregate([([], "count_all")])
            if probe.num_rows > 0.9 * 4096:
                ones = pa.array(np.ones(n, dtype=np.int64))
                return batch.select(keys).append_column("cnt", ones)
        g = pa.TableGroupBy(batch.select(keys), keys)
        t = g.aggregate([([], "count_all")])
        return t.rename_columns(keys + ["cnt"])

    partial = ds.map_batches(pre_agg, batch_format="pyarrow",
                             zero_copy_batch=True)
    from ray.data.aggregate import Sum

    from .relational import null_safe_grouped_aggregate

    summed = null_safe_grouped_aggregate(
        partial, keys, [Sum("cnt", alias_name="cnt")], ["cnt"])

    def keep_dups(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch["cnt"], 1))

    return summed.map_batches(keep_dups, batch_format="pyarrow",
                              zero_copy_batch=True)


def uniqueness_violations(ds, keys: List[str]):
    """Violation rows for duplicated key tuples, in the engine's
    generic violation shape."""
    dups = duplicate_keys(ds, keys)

    def to_violations(batch: pa.Table) -> pa.Table:
        import json as _json

        n = batch.num_rows
        key_json = [
            _json.dumps({k: batch[k][i].as_py() for k in keys}, default=str)
            for i in range(n)
        ]
        cnts = batch["cnt"].to_pylist()
        return pa.table({
            "key": pa.array(key_json, pa.string()),
            "error_type": pa.array(["duplicate_key"] * n, pa.string()),
            "message": pa.array(
                [f"Key {kj} appears {c} times; keys must be unique."
                 for kj, c in zip(key_json, cnts)], pa.string()),
        })

    return dups.map_batches(to_violations, batch_format="pyarrow")


def referential_violations(ds, fk: str, ref_ds, pk: str,
                           allow_null: bool = True):
    """Rows of ``ds`` whose ``fk`` has no match in ``ref_ds[pk]``.

    The reference side is assumed dimension-sized: its distinct key
    set is collected once and broadcast through the object store
    (``ray.put``), then each task probes it per batch — a broadcast
    semi-join, not a shuffle.
    """
    import ray

    # distinct reference keys collected ONCE as an Arrow array (never
    # a Python set) and shared through the object store — each task
    # probes it zero-copy with pc.is_in, no per-batch conversion
    chunks = []
    for batch in ref_ds.select_columns([pk]) \
            .iter_batches(batch_format="pyarrow"):
        col = batch[pk].drop_null()
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if len(col):
            chunks.append(col)
    ref_keys = (pc.unique(pa.concat_arrays(chunks)) if chunks
                else pa.array([]))
    ref_handle = ray.put(ref_keys)

    def probe(batch: pa.Table) -> pa.Table:
        keys = ray.get(ref_handle)
        col = batch[fk]
        if len(keys) == 0:
            keys = pa.array([], type=col.type)
        mask = pc.is_in(col, value_set=keys)
        missing = pc.invert(pc.fill_null(mask, allow_null))
        if allow_null:
            missing = pc.and_(missing, pc.is_valid(col))
        return batch.filter(missing)

    return ds.map_batches(probe, batch_format="pyarrow",
                          zero_copy_batch=True)


def _check_sorted_run(gid, turns: np.ndarray, ts: Optional[np.ndarray],
                      rows: list) -> None:
    """Exact per-conversation checks over turn-sorted arrays."""
    if len(turns) == 0:
        return
    if turns[0] != 0:
        rows.append((gid, "turn_gap",
                     f"turn_idx sequence starts at {int(turns[0])}, "
                     "expected 0."))
    d = np.diff(turns)
    for v in np.unique(turns[:-1][d == 0]):
        rows.append((gid, "duplicate_turn",
                     f"turn_idx {int(v)} appears more than once."))
    gaps = np.nonzero(d > 1)[0]
    for i in gaps:
        rows.append((gid, "turn_gap",
                     f"turn_idx jumps from {int(turns[i])} to "
                     f"{int(turns[i + 1])}."))
    if ts is not None and len(ts) > 1 and np.any(np.diff(ts) < 0):
        rows.append((gid, "ts_out_of_order",
                     "ts is not non-decreasing in turn order."))


def ordering_batch_parts(batch: pa.Table, group_key: str, order_key: str,
                         ts_key: Optional[str]):
    """Vectorized per-batch ordering checks over a group-sorted batch.

    Returns ``(rows, edge_mask, conv, turns, ts)``: interior
    violations as (gid, type, message) tuples, plus the edge mask for
    the first/last conversation (the only ones that may straddle a
    block boundary and need driver-side stitching). All group logic
    runs on dictionary codes; strings materialize only for violating
    or edge groups.
    """
    n = batch.num_rows
    conv = batch[group_key].combine_chunks()
    turns = pc.cast(batch[order_key], pa.int64()).combine_chunks() \
        .to_numpy(zero_copy_only=False)
    ts = (pc.cast(batch[ts_key], pa.int64()).combine_chunks()
          .to_numpy(zero_copy_only=False) if ts_key is not None else None)

    enc = pc.dictionary_encode(conv)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    # null group key -> code -1 (its own contiguous run after a
    # null-safe sort); gid resolves to None below
    codes = pc.fill_null(enc.indices, -1).to_numpy(zero_copy_only=False)
    dict_vals = enc.dictionary

    edge_mask = (codes == codes[0]) | (codes == codes[n - 1])

    rows: list = []
    interior = ~edge_mask
    if interior.any():
        idxs = np.nonzero(interior)[0]
        sub_codes = codes[idxs]
        sub_turns = turns[idxs]
        sub_ts = ts[idxs] if ts is not None else None
        change = np.nonzero(np.diff(sub_codes) != 0)[0] + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(sub_codes)]])
        # fast path: only visit conversations with an anomaly
        d = np.diff(sub_turns)
        same = np.diff(sub_codes) == 0
        anom = (same & (d != 1))
        if sub_ts is not None:
            anom |= (same & (np.diff(sub_ts) < 0))
        starts_bad = sub_turns[starts] != 0
        if anom.any() or starts_bad.any():
            bad_codes = set(sub_codes[1:][anom].tolist()) | \
                set(sub_codes[starts[starts_bad]].tolist())
            for s, e in zip(starts, ends):
                code = sub_codes[s]
                if code in bad_codes:
                    gid = (None if code == -1
                           else dict_vals[code].as_py())
                    _check_sorted_run(
                        gid, sub_turns[s:e],
                        sub_ts[s:e] if sub_ts is not None else None,
                        rows)
    return rows, edge_mask, conv, turns, ts


def stitch_edge_groups(edge: dict, has_ts: bool, rows: list) -> None:
    """Driver-side exact re-check of edge conversations collected from
    all batches: ``edge`` maps gid -> [(turn, ts), ...]."""
    for gid, pairs in edge.items():
        pairs.sort()
        turns = np.array([p[0] for p in pairs], dtype=np.int64)
        ts = (np.array([p[1] for p in pairs], dtype=np.int64)
              if has_ts else None)
        _check_sorted_run(gid, turns, ts, rows)


def turn_ordering_violations(ds, group_key: str = "conv_id",
                             order_key: str = "turn_idx",
                             ts_key: Optional[str] = "ts",
                             presorted: bool = False):
    """Per-conversation sequence checks: ``order_key`` must be a dense
    0..n-1 sequence (gaps, duplicates, late starts all violate) and
    ``ts`` must be non-decreasing in turn order.

    Scale shape: ONE parallel range-partitioned sort on
    ``(group, order)`` co-locates and orders each conversation, then a
    vectorized adjacent-diff pass over sorted batches handles every
    conversation that lies wholly inside a batch. The first/last
    conversation of each batch (the only ones that can straddle a
    block boundary) are emitted as edge rows — bounded by
    2 x n_blocks x max-conversation-length — and re-checked exactly
    on the driver. No per-group python in the hot path.

    With ``presorted=True`` the input is trusted to already be laid
    out contiguously by group and ordered by ``order_key`` within each
    group (the standard layout for transcript Parquet partitioned and
    written per conversation) and the global sort is skipped — the
    boundary stitching still makes the result exact for convs that
    straddle blocks. If the data VIOLATES the contiguity contract
    (e.g. a foreign row splits a conversation), each contiguous run is
    checked as its own unit, so interrupted conversations additionally
    surface as turn_gap/start anomalies; use the default sorted path
    when the layout is untrusted.
    """
    cols = [group_key, order_key] + (
        [ts_key] if ts_key and ts_key in ds.schema().names else [])
    has_ts = len(cols) == 3
    proj = ds.select_columns(cols)
    sorted_ds = proj if presorted else \
        null_safe_sort(proj, [group_key], [order_key])

    def check_batch(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        empty = {
            group_key: pa.array([], pa.string()),
            "error_type": pa.array([], pa.string()),
            "message": pa.array([], pa.string()),
            "_edge": pa.array([], pa.bool_()),
            "_turn": pa.array([], pa.int64()),
            "_ts": pa.array([], pa.int64()),
        }
        if n == 0:
            return pa.table(empty)
        rows, edge_mask, conv, turns, ts = ordering_batch_parts(
            batch, group_key, order_key, ts_key if has_ts else None)

        n_edge = int(edge_mask.sum())
        n_viol = len(rows)
        edge_idx = pa.array(np.nonzero(edge_mask)[0])
        return pa.table({
            group_key: pa.array(
                [r[0] for r in rows]
                + conv.take(edge_idx).to_pylist(), pa.string()),
            "error_type": pa.array(
                [r[1] for r in rows] + [""] * n_edge, pa.string()),
            "message": pa.array(
                [r[2] for r in rows] + [""] * n_edge, pa.string()),
            "_edge": pa.array([False] * n_viol + [True] * n_edge, pa.bool_()),
            "_turn": pa.array(
                np.concatenate([np.zeros(n_viol, dtype=np.int64),
                                turns[edge_mask]])),
            "_ts": pa.array(
                np.concatenate([
                    np.zeros(n_viol, dtype=np.int64),
                    ts[edge_mask] if ts is not None
                    else np.zeros(n_edge, dtype=np.int64)])),
        })

    out = sorted_ds.map_batches(check_batch, batch_format="pyarrow",
                                zero_copy_batch=True)

    # split interior violations from edge rows; re-check edge convs
    # exactly on the driver (tiny by construction)
    rows: list = []
    edge: dict = {}
    for batch in out.iter_batches(batch_format="pyarrow"):
        em = batch["_edge"].to_numpy(zero_copy_only=False)
        for i in np.nonzero(~em)[0]:
            rows.append((batch[group_key][i].as_py(),
                         batch["error_type"][i].as_py(),
                         batch["message"][i].as_py()))
        for i in np.nonzero(em)[0]:
            gid = batch[group_key][i].as_py()
            edge.setdefault(gid, []).append(
                (batch["_turn"][i].as_py(), batch["_ts"][i].as_py()))
    stitch_edge_groups(edge, has_ts, rows)

    import ray

    rows.sort(key=lambda r: (r[0] is None, r[0] or "", r[1], r[2]))
    return ray.data.from_arrow(pa.table({
        group_key: pa.array([r[0] for r in rows], pa.string()),
        "error_type": pa.array([r[1] for r in rows], pa.string()),
        "message": pa.array([r[2] for r in rows], pa.string()),
    }))
