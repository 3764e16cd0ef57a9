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
    than once — :func:`key_run_counts` with ``min_count=2``."""
    return key_run_counts(ds, keys, min_count=2)


def key_run_counts(ds, keys: List[str], min_count: int = 1):
    """Dataset of (keys..., cnt) rows — one row per DISTINCT key
    tuple with ``cnt >= min_count`` occurrences: the sort-based
    count-per-key that replaces a hash groupby when keys are
    (near-)unique, so per-block pre-aggregation cannot shrink the
    exchange and the groupby's aggregation machinery is pure
    overhead (the duplicate_lineitem_keys rewrite measured 7.5s ->
    2.8s on exactly this shape).

    Shape: ONE null-safe range-partitioned sort on the key tuple
    co-locates equal keys, a vectorized adjacent-equal scan counts
    runs per sorted batch (interior runs are final), and the
    first/last key of each batch emits a fixed-size
    (keys..., local_count) partial; the driver merges those
    O(blocks) partials and keeps merged counts >= ``min_count``."""
    import ray

    from .relational import null_safe_sort

    srt = null_safe_sort(ds.select_columns(keys), keys, [])
    min_count = int(min_count)

    def block_counts(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.append_column(
                "cnt", pa.array([], pa.int64())).append_column(
                "_edge", pa.array([], pa.bool_()))
        cols = [batch[k].combine_chunks().to_numpy(zero_copy_only=False)
                for k in keys]
        neq = np.zeros(n - 1, dtype=bool)
        for c in cols:
            neq |= c[1:] != c[:-1]
        change = np.nonzero(neq)[0] + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [n]])
        g = len(starts)
        cnt = ends - starts
        edge = np.zeros(g, dtype=bool)
        edge[0] = edge[g - 1] = True
        keep = edge | (cnt >= min_count)
        take = pa.array(starts[keep], pa.int64())
        out = batch.take(take)
        return out.append_column(
            "cnt", pa.array(cnt[keep], pa.int64())).append_column(
            "_edge", pa.array(edge[keep]))

    scanned = srt.map_batches(block_counts, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    def interior_only(batch: pa.Table) -> pa.Table:
        kept = batch.filter(pc.invert(batch["_edge"]))
        return kept.drop_columns(["_edge"])

    interior = scanned.map_batches(interior_only,
                                   batch_format="pyarrow",
                                   zero_copy_batch=True)

    # merge the O(blocks) fixed-size edge partials on the driver
    edge: dict = {}
    for batch in scanned.iter_batches(batch_format="pyarrow"):
        kept = batch.filter(batch["_edge"])
        for r in kept.to_pylist():
            kt = tuple(r[k] for k in keys)
            edge[kt] = edge.get(kt, 0) + r["cnt"]
    dup_rows = [kt + (c,) for kt, c in edge.items()
                if c >= min_count]
    if not dup_rows:
        return interior
    base = scanned.schema().base_schema
    extra = pa.table({
        **{k: pa.array([r[i] for r in dup_rows], base.field(k).type)
           for i, k in enumerate(keys)},
        "cnt": pa.array([r[-1] for r in dup_rows], pa.int64()),
    })
    return interior.union(ray.data.from_arrow(extra))


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
                      rows: list, check_start: bool = True) -> None:
    """Exact per-conversation checks over turn-sorted arrays.
    ``check_start=False`` for a block-boundary SEGMENT of a
    conversation: whether it starts at 0 is only known globally."""
    if len(turns) == 0:
        return
    if check_start and turns[0] != 0:
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

    Returns ``(rows, stitch_rows, partials)``:

    - ``rows``: final violations of conversations wholly inside the
      batch, as (gid, type, message) tuples.
    - ``stitch_rows``: segment-local violations of the first/last
      conversation of the batch (the only ones that may straddle a
      block boundary), computed WITHOUT the start-at-0 check.
    - ``partials``: one fixed-size mergeable tuple
      (gid, first_turn, last_turn, first_ts, last_ts) per edge
      segment (at most 2) — the only extra state the boundary merge
      needs, so driver memory is O(blocks), independent of how many
      turns a hot conversation has. The merge dedupes stitch rows
      against boundary-derived rows (``stitch_edge_partials``).

    All group logic runs on dictionary codes; strings materialize
    only for violating or edge groups.
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

    def _gid(code):
        return None if code == -1 else dict_vals[int(code)].as_py()

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
                    _check_sorted_run(
                        _gid(code), sub_turns[s:e],
                        sub_ts[s:e] if sub_ts is not None else None,
                        rows)

    stitch_rows: list = []
    partials: list = []
    if n:
        eq0 = codes == codes[0]
        first_end = n if eq0.all() else int(np.argmax(~eq0))
        segs = [(0, first_end)]
        if codes[n - 1] != codes[0]:
            last_start = int(n - np.argmax(codes[::-1] != codes[n - 1]))
            segs.append((last_start, n))
        for s, e in segs:
            gid = _gid(codes[s])
            partials.append((gid, int(turns[s]), int(turns[e - 1]),
                             int(ts[s]) if ts is not None else 0,
                             int(ts[e - 1]) if ts is not None else 0))
            _check_sorted_run(gid, turns[s:e],
                              ts[s:e] if ts is not None else None,
                              stitch_rows, check_start=False)
    return rows, stitch_rows, partials


def stitch_edge_partials(edge: dict, has_ts: bool, rows: list) -> None:
    """Driver-side merge of edge-conversation state collected from all
    batches: ``edge`` maps gid -> (stitch_row_set, [partials]) where
    each partial is (first_turn, last_turn, first_ts, last_ts) for one
    block segment. Segments are contiguous runs of the globally
    sorted stream, so merging only needs the boundary between
    adjacent segments: equal turns = duplicate, a jump > 1 = gap, a
    ts drop = out-of-order; the start-at-0 check runs on the globally
    first segment. Duplicate messages (a value duplicated both inside
    a segment and across a boundary, or ts regressions in several
    segments) collapse via the per-gid row set, matching the exact
    single-array semantics."""
    for gid, (row_set, partials) in edge.items():
        partials.sort()
        merged = set(row_set)
        ft0 = partials[0][0]
        if ft0 != 0:
            merged.add((gid, "turn_gap",
                        f"turn_idx sequence starts at {ft0}, "
                        "expected 0."))
        for prev, nxt in zip(partials[:-1], partials[1:]):
            if nxt[0] == prev[1]:
                merged.add((gid, "duplicate_turn",
                            f"turn_idx {nxt[0]} appears more than "
                            "once."))
            elif nxt[0] - prev[1] > 1:
                merged.add((gid, "turn_gap",
                            f"turn_idx jumps from {prev[1]} to "
                            f"{nxt[0]}."))
            if has_ts and nxt[2] < prev[3]:
                merged.add((gid, "ts_out_of_order",
                            "ts is not non-decreasing in turn "
                            "order."))
        rows.extend(sorted(merged, key=lambda r: (r[1], r[2])))


def turn_ordering_violations(ds, group_key: str = "conv_id",
                             order_key: str = "turn_idx",
                             ts_key: Optional[str] = "ts",
                             presorted: bool = False):
    """Per-conversation sequence checks: ``order_key`` must be a dense
    0..n-1 sequence (gaps, duplicates, late starts all violate) and
    ``ts`` must be non-decreasing in turn order.

    Scale shape: ONE parallel range-partitioned sort on
    ``(group, order, ts)`` co-locates and orders each conversation,
    then a vectorized adjacent-diff pass over sorted batches handles
    every conversation that lies wholly inside a batch. The
    first/last conversation of each batch (the only ones that can
    straddle a block boundary) emit their segment-local violations
    plus one fixed-size mergeable partial (first/last turn + ts) per
    segment; the driver merge needs only those O(batches) partials —
    independent of conversation length, hot conversations included.
    No per-group python in the hot path.

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
    # ts joins the sort keys so equal-turn rows order by ts — the
    # exact semantics the boundary merge and the reference check use
    sorted_ds = proj if presorted else \
        null_safe_sort(proj, [group_key],
                       [order_key] + ([ts_key] if has_ts else []))

    # per-batch output row kinds: 0 = final violation, 1 = edge
    # stitch violation (needs driver dedupe), 2 = edge partial
    # (fixed-size (first/last turn, first/last ts) — at most 2/batch)
    def check_batch(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        empty = {
            group_key: pa.array([], pa.string()),
            "error_type": pa.array([], pa.string()),
            "message": pa.array([], pa.string()),
            "_kind": pa.array([], pa.int8()),
            "_ft": pa.array([], pa.int64()),
            "_lt": pa.array([], pa.int64()),
            "_fts": pa.array([], pa.int64()),
            "_lts": pa.array([], pa.int64()),
        }
        if n == 0:
            return pa.table(empty)
        rows, stitch_rows, partials = ordering_batch_parts(
            batch, group_key, order_key, ts_key if has_ts else None)
        gids = [r[0] for r in rows] + [r[0] for r in stitch_rows] \
            + [p[0] for p in partials]
        n_r, n_s, n_p = len(rows), len(stitch_rows), len(partials)
        zeros = [0] * (n_r + n_s)
        return pa.table({
            group_key: pa.array(gids, pa.string()),
            "error_type": pa.array(
                [r[1] for r in rows] + [r[1] for r in stitch_rows]
                + [""] * n_p, pa.string()),
            "message": pa.array(
                [r[2] for r in rows] + [r[2] for r in stitch_rows]
                + [""] * n_p, pa.string()),
            "_kind": pa.array([0] * n_r + [1] * n_s + [2] * n_p,
                              pa.int8()),
            "_ft": pa.array(zeros + [p[1] for p in partials],
                            pa.int64()),
            "_lt": pa.array(zeros + [p[2] for p in partials],
                            pa.int64()),
            "_fts": pa.array(zeros + [p[3] for p in partials],
                             pa.int64()),
            "_lts": pa.array(zeros + [p[4] for p in partials],
                             pa.int64()),
        })

    out = sorted_ds.map_batches(check_batch, batch_format="pyarrow",
                                zero_copy_batch=True)

    # interior violations collect directly (violation-sized); edge
    # conversations merge from O(batches) fixed-size partials plus
    # their own violation rows — never their raw timelines
    rows: list = []
    edge: dict = {}
    for batch in out.iter_batches(batch_format="pyarrow"):
        kind = batch["_kind"].to_numpy(zero_copy_only=False)
        for i in np.nonzero(kind == 0)[0]:
            rows.append((batch[group_key][i].as_py(),
                         batch["error_type"][i].as_py(),
                         batch["message"][i].as_py()))
        for i in np.nonzero(kind == 1)[0]:
            gid = batch[group_key][i].as_py()
            edge.setdefault(gid, (set(), []))[0].add(
                (gid, batch["error_type"][i].as_py(),
                 batch["message"][i].as_py()))
        for i in np.nonzero(kind == 2)[0]:
            gid = batch[group_key][i].as_py()
            edge.setdefault(gid, (set(), []))[1].append(
                (batch["_ft"][i].as_py(), batch["_lt"][i].as_py(),
                 batch["_fts"][i].as_py(), batch["_lts"][i].as_py()))
    stitch_edge_partials(edge, has_ts, rows)

    import ray

    rows.sort(key=lambda r: (r[0] is None, r[0] or "", r[1], r[2]))
    return ray.data.from_arrow(pa.table({
        group_key: pa.array([r[0] for r in rows], pa.string()),
        "error_type": pa.array([r[1] for r in rows], pa.string()),
        "message": pa.array([r[2] for r in rows], pa.string()),
    }))


def transition_violations(ds, key, order: str, label: str,
                          allowed: dict, tiebreak: str,
                          start=None):
    """Protocol / state-machine validation over ordered per-key
    sequences — the transcript-shaped generalization of turn
    ordering: within each ``key``'s rows taken in ``(order,
    tiebreak)`` order, the transition ``prev_label -> label`` must be
    permitted. ``allowed`` maps a from-label to its permitted
    successor labels; a from-label ABSENT from ``allowed`` permits
    any successor (open-world: validate only the states you care
    about). ``start``, if given, is the set of labels a key's FIRST
    row may carry (None = any). A NULL label is open-world as a
    FROM-state (its successor is never restricted) and fails as a
    TO-state whenever its predecessor's successors are restricted or
    (for first rows) ``start`` is set. First-of-key detection is
    exact even when labels themselves are NULL: the lagged column is
    sentinel-coalesced, so a NULL lag uniquely means "no
    predecessor".

    Returns the violating rows as a Dataset of
    (key..., order, prev_label, label) — violation-sized, never
    corpus-sized.

    Scale shape: rides :func:`rank.lag_column` — ONE null-safe sort
    with O(n_blocks) fixed-size carries (a hot key never ships its
    timeline anywhere) — then a stateless vectorized filter: one
    ``pc.equal`` + ``pc.is_in`` pair per restricted from-label (the
    protocol alphabet is small and fixed), no per-row Python, no
    driver state."""
    from .rank import lag_column

    keys = [key] if isinstance(key, str) else list(key)
    if tiebreak == order:
        # the shift scan selects (order, tiebreak) as two columns —
        # alias the duplicate so callers may pass the same column
        # (e.g. a turn index that is both the order and the unique
        # tiebreaker)
        def alias(batch: pa.Table) -> pa.Table:
            return batch.append_column("__tb", batch[order])

        ds = ds.map_batches(alias, batch_format="pyarrow",
                            zero_copy_batch=True)
        tiebreak = "__tb"

    # lag a sentinel-coalesced copy: a NULL lag must uniquely mean
    # "first row of key", not "predecessor's label was NULL"
    sentinel = "\x00__null_label__"

    def coalesce(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__lab_nn",
            pc.fill_null(pc.cast(batch[label], pa.string()), sentinel))

    lagged = lag_column(
        ds.map_batches(coalesce, batch_format="pyarrow",
                       zero_copy_batch=True),
        key, order, value="__lab_nn", tiebreak=tiebreak, out="__prev")

    allowed_sets = {f: pa.array(sorted(set(s)), pa.string())
                    for f, s in allowed.items()}
    start_set = (pa.array(sorted(set(start)), pa.string())
                 if start is not None else None)

    def check(batch: pa.Table) -> pa.Table:
        prev = batch["__prev"]
        # mirror the coalesce step's cast: the allowed/start sets are
        # string arrays, so a dictionary- or int-typed label column
        # must compare as strings too (pc.is_in on a non-string cur
        # would error or silently never match)
        cur = pc.cast(batch[label], pa.string())
        n = batch.num_rows
        bad = pa.array(np.zeros(n, bool))
        for f, succ in allowed_sets.items():
            is_f = pc.fill_null(pc.equal(prev, f), False)
            ok = pc.fill_null(pc.is_in(cur, value_set=succ), False)
            bad = pc.or_(bad, pc.and_(is_f, pc.invert(ok)))
        if start_set is not None:
            first = pc.is_null(prev)
            ok0 = pc.fill_null(pc.is_in(cur, value_set=start_set),
                               False)
            bad = pc.or_(bad, pc.and_(first, pc.invert(ok0)))
        out = batch.filter(bad)
        prev_out = pc.if_else(
            pc.fill_null(pc.equal(out["__prev"], sentinel), False),
            pa.scalar(None, pa.string()), out["__prev"])
        return out.select(keys + [order]) \
            .append_column("prev_label", prev_out) \
            .append_column(label, out[label])

    return lagged.map_batches(check, batch_format="pyarrow",
                              zero_copy_batch=True)


def reconcile_aggregate(parent_ds, child_ds, parent_key: str,
                        child_key: str, parent_col: str,
                        child_col: str, scale: int = 100,
                        tol: int = 0):
    """Cross-table aggregate reconciliation — the numeric sibling of
    referential integrity: every ``parent_key`` row's ``parent_col``
    must equal the SUM of its child rows' ``child_col`` (both
    quantized to ``floor(v * scale + 0.5)`` int64 fixed-point, the
    repo's fixed-point-before-sum discipline) within ``tol``
    fixed-point units. Emits ONLY violations: ``mismatch`` (both
    sides present, |expected - actual| > tol), ``no_children``
    (parent without child rows) and ``orphan_children`` (child rows
    without a parent — the classic FK hole, here with the amount
    attached). Rows with a NULL key or NULL value drop on both
    sides (mirrored in the SQL oracle). A parent key appearing twice
    raises — reconciliation over duplicate parents is ill-defined.

    Scale shape: NO join. Child rows pre-combine per block
    (``pa.TableGroupBy`` sum — a hot parent key contributes at most
    one partial row per child block), parent rows tag side 0 /
    child partials side 1, and the union runs through ONE
    range-partitioned sort on (key, side); each key's rows are then
    adjacent with the parent row FIRST, so interior segments
    classify vectorized in-block (prefix-sum ``reduceat`` over the
    side mask and value column) and only each block's first/last
    segment — O(blocks) partial rows, never corpus-sized — re-unites
    through a ``repartition(1)`` stitch, the snapshot_diff / dedup
    edge discipline. Envelope: per-key sum(|q|) < 2^63.

    Returns a Dataset of (parent_key, expected, actual, status)."""
    import ray  # noqa: F401  (parity with sibling operators)

    def _quant(col: pa.ChunkedArray) -> pa.ChunkedArray:
        return pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(col, pa.float64()), float(scale)), 0.5)),
            pa.int64())

    def prep_parent(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(batch[parent_key]),
                    pc.is_valid(batch[parent_col]))
        t = batch.select([parent_key, parent_col]).filter(m)
        return pa.table({
            "__k": t[parent_key], "__v": _quant(t[parent_col]),
            "__side": pa.array(np.zeros(t.num_rows, np.int8))})

    def prep_child(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(batch[child_key]),
                    pc.is_valid(batch[child_col]))
        t = batch.select([child_key, child_col]).filter(m)
        base = pa.table({"__k": t[child_key],
                         "__v": _quant(t[child_col])})
        g = pa.TableGroupBy(base, "__k").aggregate([("__v", "sum")])
        return pa.table({
            "__k": g["__k"], "__v": g["__v_sum"].cast(pa.int64()),
            "__side": pa.array(np.ones(g.num_rows, np.int8))})

    both = parent_ds.map_batches(prep_parent, batch_format="pyarrow",
                                 zero_copy_batch=True) \
        .union(child_ds.map_batches(prep_child, batch_format="pyarrow",
                                    zero_copy_batch=True)) \
        .sort(["__k", "__side"])

    def _newseg(batch: pa.Table) -> np.ndarray:
        n = batch.num_rows
        newseg = np.zeros(n, bool)
        newseg[0] = True
        col = batch["__k"].combine_chunks()
        # keys are non-null by prep; Arrow compare keeps int64 exact
        newseg[1:] |= pc.not_equal(col.slice(1), col.slice(0, n - 1)) \
            .to_numpy(zero_copy_only=False)
        return newseg

    def classify(batch: pa.Table, interior_only: bool) -> pa.Table:
        empty = pa.schema(
            [("__k", batch.schema.field("__k").type),
             ("expected", pa.int64()), ("actual", pa.int64()),
             ("status", pa.string())]).empty_table()
        n = batch.num_rows
        if n == 0:
            return empty
        newseg = _newseg(batch)
        starts = np.nonzero(newseg)[0]
        ends = np.concatenate([starts[1:], [n]])
        g = len(starts)
        if interior_only and g <= 2:
            return empty
        lo = 1 if interior_only else 0
        hi = g - 1 if interior_only else g
        s_in, e_in = starts[lo:hi], ends[lo:hi]
        side = batch["__side"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        v = batch["__v"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        pre_par = np.concatenate([[0], np.cumsum(side == 0)])
        n_par = pre_par[e_in] - pre_par[s_in]
        if (n_par > 1).any():
            raise ValueError(
                "reconcile_aggregate: duplicate parent key — a"
                f" {parent_key!r} value appears more than once")
        pre_cnt = np.concatenate([[0], np.cumsum(side == 1)])
        n_child = pre_cnt[e_in] - pre_cnt[s_in]
        pre_sum = np.concatenate(
            [[0], np.cumsum(np.where(side == 1, v, 0))])
        csum = pre_sum[e_in] - pre_sum[s_in]
        has_par = n_par == 1
        has_child = n_child > 0
        # parent sorts first within its segment (side 0 < 1)
        expected = np.where(has_par, v[s_in], 0)
        bad = np.where(
            ~has_par, 1, np.where(~has_child, 2, np.where(
                np.abs(expected - csum) > tol, 3, 0)))
        keep = bad > 0
        labels = np.array(["", "orphan_children", "no_children",
                           "mismatch"])
        return pa.table({
            "__k": batch["__k"].take(pa.array(s_in[keep], pa.int64())),
            "expected": pa.array(expected[keep],
                                 mask=~has_par[keep]),
            "actual": pa.array(csum[keep], mask=~has_child[keep]),
            "status": pa.array(labels[bad[keep]].tolist(),
                               pa.string())})

    def interior(batch: pa.Table) -> pa.Table:
        return classify(batch, interior_only=True)

    def edge_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch
        starts = np.nonzero(_newseg(batch))[0]
        if len(starts) <= 2:
            return batch
        eidx = np.concatenate([np.arange(0, starts[1]),
                               np.arange(starts[-1], n)])
        return batch.take(pa.array(eidx, pa.int64()))

    def stitch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return classify(batch, interior_only=False)
        srt = batch.sort_by([("__k", "ascending"),
                             ("__side", "ascending")])
        return classify(srt, interior_only=False)

    scanned = both.materialize()
    verdicts = scanned.map_batches(interior, batch_format="pyarrow",
                                   zero_copy_batch=True) \
        .union(scanned.map_batches(edge_rows, batch_format="pyarrow",
                                   zero_copy_batch=True)
               .repartition(1)
               .map_batches(stitch, batch_format="pyarrow",
                            batch_size=None))

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            [parent_key, "expected", "actual", "status"])

    return verdicts.map_batches(rename, batch_format="pyarrow",
                                zero_copy_batch=True)


def functional_dependency_violations(ds, determinant: str,
                                     dependent: str):
    """Functional-dependency check — the column-level consistency
    sibling of uniqueness: the FD ``determinant -> dependent`` holds
    when every determinant value maps to exactly ONE distinct
    non-null dependent value; emit the determinant values that map
    to more than one, with the distinct count. NULL dependent values
    don't count (SQL ``count(DISTINCT ...)``); NULL determinants
    form their own group.

    Scale shape: rides
    :func:`relational.grouped_distinct_count_sorted` — ONE null-safe
    range-partitioned sort with O(blocks) fixed-size carries (a hot
    determinant never ships its rows anywhere twice) — then a
    stateless filter. Returns (determinant, n_distinct),
    violation-sized."""
    from .relational import grouped_distinct_count_sorted

    counts = grouped_distinct_count_sorted(ds, determinant, dependent)

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch["n_distinct"], 1))

    return counts.map_batches(keep, batch_format="pyarrow",
                              zero_copy_batch=True)


def accept_state_violations(ds, key, order: str, label: str,
                            accept, tiebreak: str):
    """Terminal-state check completing the protocol family
    (:func:`transition_violations` covers transitions and ``start``;
    this covers the END): each key's LAST ``label`` row — by
    ``(order, tiebreak)``, SQL ascending NULLS LAST, i.e. SQL
    ``row_number() OVER (... ORDER BY order DESC, tiebreak DESC) = 1``
    on non-null orders — must carry a label in ``accept``; keys whose
    conversation never reaches an accepted terminal state surface
    with that last label. A NULL last label always violates.

    Scale shape: NO sort. The (order, tiebreak) pair encodes into a
    fixed-width order-preserving hex prefix with the label riding as
    payload (the :func:`relational.grouped_first_last` trick), so
    arg-max is a plain combinable aggregate: one encoded MAX per key
    per block (``pa.TableGroupBy``), ONE hash-aggregate MAX merge,
    then a stateless decode + set filter. Hot keys reduce inside
    every block. ``order`` / ``tiebreak`` must be integer or
    timestamp columns.

    Returns a Dataset of (key, last_label), violation-sized."""
    from ray.data.aggregate import Max

    from .relational import null_safe_grouped_aggregate

    def _sortable_u64(arr: pa.ChunkedArray) -> tuple:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if not (pa.types.is_integer(arr.type)
                or pa.types.is_timestamp(arr.type)):
            raise TypeError(
                "accept_state_violations: order/tiebreak must be"
                f" integer or timestamp, got {arr.type}")
        valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
        v = pc.fill_null(pc.cast(arr, pa.int64()), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return v.view(np.uint64) ^ np.uint64(1 << 63), valid

    def partial(batch: pa.Table) -> pa.Table:
        import binascii

        t = batch.select([key, order, tiebreak, label])
        n = t.num_rows
        if n == 0:
            return pa.table({key: pa.array([], t[key].type),
                             "__enc": pa.array([], pa.string())})
        o_u, o_valid = _sortable_u64(t[order])
        t_u, t_valid = _sortable_u64(t[tiebreak])
        buf = np.empty((n, 18), np.uint8)
        buf[:, 0] = (~o_valid).view(np.uint8)  # NULLS LAST
        buf[:, 1:9] = o_u.astype(">u8").view(np.uint8).reshape(n, 8)
        buf[:, 9] = (~t_valid).view(np.uint8)  # NULLS LAST
        buf[:, 10:18] = t_u.astype(">u8").view(np.uint8).reshape(n, 8)
        hexed = np.frombuffer(binascii.hexlify(buf.tobytes()),
                              dtype="S36")
        prefix = pa.array(hexed.astype("U36"))
        lab = pc.cast(t[label].combine_chunks()
                      if isinstance(t[label], pa.ChunkedArray)
                      else t[label], pa.string())
        payload = pc.if_else(
            pc.is_null(lab), pa.scalar("n"),
            pc.binary_join_element_wise("v", lab, ""))
        enc = pc.binary_join_element_wise(prefix, payload, "")
        base = pa.table({key: t[key], "__enc": enc})
        g = pa.TableGroupBy(base, key).aggregate([("__enc", "max")])
        return g.rename_columns([key, "__enc"])

    agg = null_safe_grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        [key], [Max("__enc", alias_name="__enc")], ["__enc"])

    accept_arr = pa.array(sorted(set(accept)), pa.string())

    def finish(batch: pa.Table) -> pa.Table:
        payload = pc.utf8_slice_codeunits(batch["__enc"], 36)
        lab = pc.if_else(pc.equal(payload, "n"),
                         pa.scalar(None, pa.string()),
                         pc.utf8_slice_codeunits(payload, 1))
        ok = pc.fill_null(pc.is_in(lab, value_set=accept_arr), False)
        out = pa.table({key: batch[key], "last_label": lab})
        return out.filter(pc.invert(ok))

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


def transition_counts(ds, key, order: str, label: str,
                      tiebreak: str, per_key: bool = False):
    """Empirical Markov transition matrix over ordered per-key
    sequences — the mining twin of :func:`transition_violations`:
    instead of checking ``prev_label -> label`` against a declared
    protocol, COUNT every observed transition so the protocol (or a
    drifted one) can be read off the data. First rows of a key count
    under ``prev_label = NULL``, and — exactly like SQL ``lag()``
    over a nullable label — a predecessor whose label was NULL also
    lands in ``prev_label = NULL``: the two collapse into ONE group.
    A NULL label on the CURRENT side is its own category (SQL GROUP
    BY keeps a NULL group).

    Returns a Dataset of (prev_label, label, n) — alphabet²-sized.
    With ``per_key=True`` the count keeps the sequence key: rows are
    (key, prev_label, label, n) — key-dimension x alphabet²-sized —
    the per-entity kernel a divergence screen compares against the
    corpus kernel.

    Scale shape: rides :func:`rank.lag_column` (ONE null-safe sort,
    O(n_blocks) fixed-size carries; a hot key never ships its
    timeline anywhere), then per-block pair-count combiners feed a
    groupby whose input is alphabet² x n_blocks tiny rows — the
    count exchange never sees row-sized data."""
    from ray.data.aggregate import Sum

    from .rank import lag_column
    from .relational import null_safe_grouped_aggregate

    if tiebreak == order:
        def alias(batch: pa.Table) -> pa.Table:
            return batch.append_column("__tb", batch[order])

        ds = ds.map_batches(alias, batch_format="pyarrow",
                            zero_copy_batch=True)
        tiebreak = "__tb"

    sentinel = "\x00__null_label__"

    def coalesce(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__lab_nn",
            pc.fill_null(pc.cast(batch[label], pa.string()), sentinel))

    lagged = lag_column(
        ds.map_batches(coalesce, batch_format="pyarrow",
                       zero_copy_batch=True),
        key, order, value="__lab_nn", tiebreak=tiebreak, out="__prev")

    group_cols = ([key] if per_key else []) + ["__p", "__c"]

    def pair_counts(batch: pa.Table) -> pa.Table:
        # SQL lag() can't distinguish "no predecessor" from
        # "predecessor's label was NULL" — both are NULL — so both
        # map onto the SAME sentinel before counting (the coalesced
        # lag already carries the sentinel for NULL labels; a NULL
        # lag means first-of-key and joins it)
        cur = pc.fill_null(pc.cast(batch[label], pa.string()),
                           sentinel)
        prev = pc.fill_null(batch["__prev"], sentinel)
        cols = {"__p": prev, "__c": cur}
        if per_key:
            cols = {key: batch[key], **cols}
        t = pa.table(cols)
        g = pa.TableGroupBy(t, group_cols).aggregate(
            [([], "count_all")])
        out = {c: g[c] for c in group_cols}
        out["__n"] = g["count_all"].cast(pa.int64())
        return pa.table(out)

    agg = null_safe_grouped_aggregate(
        lagged.map_batches(pair_counts, batch_format="pyarrow",
                           zero_copy_batch=True),
        group_cols, [Sum("__n", alias_name="__n")], ["__n"])

    def finish(batch: pa.Table) -> pa.Table:
        def dec(col):
            return pc.if_else(pc.equal(col, sentinel),
                              pa.scalar(None, pa.string()), col)

        cols = {}
        if per_key:
            cols[key] = batch[key]
        cols["prev_label"] = dec(batch["__p"])
        cols["label"] = dec(batch["__c"])
        cols["n"] = batch["__n"]
        return pa.table(cols)

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


def first_in_group(ds, keys: List[str], order: str,
                   out: str = "is_first"):
    """Flag each row that is its key group's MINIMUM-``order`` row —
    the distributed arg-min membership test behind first-occurrence /
    novelty scoring. The right shape for NEAR-UNIQUE keys (corpus
    shingles, content hashes), where a hash aggregate's machinery is
    pure overhead: ONE null-safe range-partitioned sort on
    (keys..., order) co-locates each group, a vectorized
    adjacent-equal scan flags in-block run heads, and only each
    block's FIRST row is pending — it heads a run that may continue
    an earlier block's, and every such predecessor run, by sorted
    contiguity, ends at some earlier block's LAST row, so the
    O(n_blocks) collected last-rows resolve all pending flags in one
    broadcast lookup (pending is first iff no collected last-row of
    its key has a smaller order). ``order`` must be unique per key
    tuple and numeric/temporal."""
    import ray

    from .relational import null_safe_sort

    srt = null_safe_sort(ds, keys, [order])

    def scan(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.append_column(out, pa.array([], pa.bool_())) \
                .append_column("__rt", pa.array([], pa.int8()))
        cols = [batch[k].combine_chunks().to_numpy(zero_copy_only=False)
                for k in keys]
        neq = np.zeros(n - 1, dtype=bool)
        for c in cols:
            neq |= c[1:] != c[:-1]
        first = np.concatenate([[True], neq])
        rt = np.zeros(n, np.int8)
        rt[0] = 1  # only the block head can continue an earlier run
        out_t = batch.append_column(out, pa.array(first)) \
            .append_column("__rt", pa.array(rt))
        carry = batch.slice(n - 1, 1) \
            .append_column(out, pa.array([False])) \
            .append_column("__rt", pa.array([2], pa.int8()))
        return pa.concat_tables([out_t, carry])

    scanned = srt.map_batches(scan, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    # min order among each key's collected block-LAST rows
    min_last: dict = {}
    for kept in scanned.map_batches(
            lambda t: t.filter(pc.equal(t["__rt"], 2)),
            batch_format="pyarrow", zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        if not kept.num_rows:
            continue
        kk = list(zip(*[kept[k].to_pylist() for k in keys]))
        ov = kept[order].to_pylist()
        for kt, o in zip(kk, ov):
            if kt not in min_last or o < min_last[kt]:
                min_last[kt] = o

    handle = ray.put(min_last)

    def resolve(batch: pa.Table) -> pa.Table:
        kept = batch.filter(pc.not_equal(batch["__rt"], 2))
        n = kept.num_rows
        if n == 0:
            return kept.drop_columns(["__rt"])
        rt = kept["__rt"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        pend = np.nonzero(rt == 1)[0]
        flags = kept[out].combine_chunks() \
            .to_numpy(zero_copy_only=False).copy()
        if len(pend):
            ml = ray.get(handle)
            i = int(pend[0])
            kt = tuple(kept[k][i].as_py() for k in keys)
            o = kept[order][i].as_py()
            prev = ml.get(kt)
            flags[i] = prev is None or not (prev < o)
        oi = kept.column_names.index(out)
        return kept.set_column(oi, out, pa.array(flags)) \
            .drop_columns(["__rt"])

    return scanned.map_batches(resolve, batch_format="pyarrow",
                               zero_copy_batch=True)
