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


def duplicate_keys(ds, keys: List[str]):
    """Dataset of (keys..., cnt) rows for key tuples appearing more
    than once."""

    def pre_agg(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(batch.select(keys), keys)
        t = g.aggregate([([], "count_all")])
        return t.rename_columns(keys + ["cnt"])

    partial = ds.map_batches(pre_agg, batch_format="pyarrow",
                             zero_copy_batch=True)
    summed = partial.groupby(keys).sum("cnt")

    def keep_dups(batch: pa.Table) -> pa.Table:
        batch = batch.rename_columns(keys + ["cnt"])
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

    ref_keys = set()
    for batch in ref_ds.select_columns([pk]).iter_batches(batch_format="pyarrow"):
        ref_keys.update(batch[pk].drop_null().to_pylist())
    ref_handle = ray.put(ref_keys)

    def probe(batch: pa.Table) -> pa.Table:
        keys = ray.get(ref_handle)
        col = batch[fk]
        mask = pc.is_in(col, value_set=pa.array(list(keys)))
        missing = pc.invert(pc.fill_null(mask, allow_null))
        if allow_null:
            missing = pc.and_(missing, pc.is_valid(col))
        return batch.filter(missing)

    return ds.map_batches(probe, batch_format="pyarrow",
                          zero_copy_batch=True)


def turn_ordering_violations(ds, group_key: str = "conv_id",
                             order_key: str = "turn_idx",
                             ts_key: Optional[str] = "ts"):
    """Per-conversation sequence checks: ``order_key`` must be a dense
    0..n-1 sequence (gaps, duplicates, negative starts all violate)
    and ``ts`` must be non-decreasing in turn order."""

    def check_group(group: pa.Table) -> pa.Table:
        gid = group[group_key][0].as_py()
        idx = group[order_key].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(idx, kind="stable")
        sorted_idx = idx[order]
        msgs, types = [], []
        n = len(sorted_idx)
        uniq = np.unique(sorted_idx)
        if len(uniq) != n:
            dup_vals = sorted_idx[:-1][np.diff(sorted_idx) == 0]
            for d in np.unique(dup_vals):
                types.append("duplicate_turn")
                msgs.append(f"turn_idx {int(d)} appears more than once.")
        expected = np.arange(len(uniq))
        if len(uniq) and not np.array_equal(uniq, expected):
            types.append("turn_gap")
            msgs.append(
                f"turn_idx sequence is not dense 0..{len(uniq) - 1}: "
                f"starts at {int(uniq[0])} with {len(uniq)} distinct values.")
        if ts_key is not None and ts_key in group.column_names:
            ts = pc.cast(group[ts_key], pa.int64()).combine_chunks() \
                .to_numpy(zero_copy_only=False)[order]
            if len(ts) > 1 and np.any(np.diff(ts) < 0):
                types.append("ts_out_of_order")
                msgs.append("ts is not non-decreasing in turn order.")
        return pa.table({
            group_key: pa.array([gid] * len(msgs), pa.string()),
            "error_type": pa.array(types, pa.string()),
            "message": pa.array(msgs, pa.string()),
        })

    return ds.groupby(group_key).map_groups(check_group,
                                            batch_format="pyarrow")
