"""Windowed / sessionized aggregates.

Sessionization is a genuinely per-key computation: hash-partition on
the entity key with ``groupby(key).map_groups`` and sort inside the
group (groups are user-sized, not corpus-sized). For skewed keys the
per-group sort stays bounded by the hottest single key; salting does
not apply because session boundaries need the full per-key timeline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def sessionize_counts(ds, key: str = "user_id", ts: str = "ts",
                      gap_seconds: float = 1800.0):
    """Per-key session count: a new session starts when the gap
    between consecutive events exceeds ``gap_seconds``.
    Returns a Dataset of (key, n_events, n_sessions)."""

    def per_key(group: pa.Table) -> pa.Table:
        k = group[key][0].as_py()
        tsv = pc.cast(group[ts], pa.int64()).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        tsv = np.sort(tsv)
        if len(tsv) == 0:
            sessions = 0
        else:
            gaps = np.diff(tsv) / 1_000_000.0  # timestamp[us] -> s
            sessions = 1 + int(np.count_nonzero(gaps > gap_seconds))
        return pa.table({
            key: pa.array([k]),
            "n_events": pa.array([len(tsv)], pa.int64()),
            "n_sessions": pa.array([sessions], pa.int64()),
        })

    return ds.groupby(key).map_groups(per_key, batch_format="pyarrow")


def tumbling_window_counts(ds, ts: str = "ts", value: str = "value",
                           window_seconds: int = 86400):
    """Event-time tumbling-window aggregate: (window_start, n, sum).

    Expressed as a derived-column groupby: assign each row its window
    start inside ``map_batches`` (vectorized), pre-aggregate per
    block, then a small shuffle over window keys.
    """
    from .relational import grouped_aggregate

    win_us = window_seconds * 1_000_000

    def assign(batch: pa.Table) -> pa.Table:
        tsv = pc.cast(batch[ts], pa.int64())
        if isinstance(tsv, pa.ChunkedArray):
            tsv = tsv.combine_chunks()
        # FLOOR division (numpy // truncates toward -inf), matching
        # SQL floor(): pre-1970 (negative) timestamps land in the
        # window that CONTAINS them, not the one above
        null_mask = pc.is_null(tsv).to_numpy(zero_copy_only=False)
        filled = pc.fill_null(tsv, 0).to_numpy(zero_copy_only=False)
        win = (filled // win_us) * win_us
        win_arr = pa.array(win, pa.int64(),
                           mask=null_mask if null_mask.any() else None)
        return batch.append_column("window_start_us", win_arr)

    with_win = ds.map_batches(assign, batch_format="pyarrow",
                              zero_copy_batch=True)
    return grouped_aggregate(with_win, ["window_start_us"],
                             [(value, "sum"), (None, "count")])
