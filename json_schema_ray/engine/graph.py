"""Iterative link-graph algorithms over edge-list Datasets.

PageRank is the canonical corpus-quality signal for web-scale
training-data pipelines (Common-Crawl-style per-host authority used
to weight or filter documents). The engine computes it ALL-INTEGER
(fixed-point ranks, floor division) so every iteration is
deterministic, immune to float summation order, and bitwise
reproducible in plain SQL — the same fixed-point-before-sum
discipline the bigram LM scorer uses.

Scale shape (per iteration): the corpus-sized work is ONE pass over
the edge list (contribution = rank(src) // outdeg(src), combined
per-block by dst before the shuffle) plus ONE node-sized groupby
sum. Two realizations of the rank lookup:

- ``mode="broadcast"`` — the rank vector is node-sized (hosts, not
  documents: 10^7-ish for a web corpus vs 10^12 docs), so it is
  broadcast once per iteration via ``ray.put`` and probed per batch
  with ``pc.index_in``; the driver holds ONE int64 per node.
- ``mode="sorted"`` — no driver state at all: the per-node quotient
  table joins onto the edge list with
  :func:`~json_schema_ray.engine.relational.sort_merge_join`
  (two big sides), for graphs whose node table itself outgrows a
  broadcast.

Both modes produce identical tables (differential-tested); dangling
nodes (no out-edges) evaporate their mass, the classic simplification,
reproduced exactly by the SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def url_host_edges(ds, src_column: str = "source",
                   text_column: str = "text"):
    """Edge extraction: one (src, dst) row per URL MENTION, where
    ``dst`` is the mentioned URL's lowercased host. Parallel edges
    are kept (a host mentioned k times receives k contributions) —
    exactly SQL ``unnest(regexp_extract_all(text,
    'https?://[^\\s]+'))`` + ``lower(regexp_extract(url,
    '^https?://([^/:?#\\s]+)', 1))``, the same extraction contract
    :func:`~json_schema_ray.engine.text.url_domain_counts` proves
    against DuckDB. Malformed authorities yield the empty-string
    host, like SQL's no-match ``''``.
    """
    from .text import _flat_terms, _DOMAIN_REGEX

    def extract(batch: pa.Table) -> pa.Table:
        empty = pa.table({"src": pa.array([], pa.string()),
                          "dst": pa.array([], pa.string())})
        flat, par = _flat_terms(batch, text_column)
        if len(flat) == 0:
            return empty
        url = pc.struct_field(
            pc.extract_regex(flat, pattern=r"(?P<u>https?://[^\s]+)"),
            "u")
        hit = pc.is_valid(url).to_numpy(zero_copy_only=False)
        if not hit.any():
            return empty
        url = url.filter(pa.array(hit))
        host = pc.fill_null(
            pc.utf8_lower(pc.struct_field(
                pc.extract_regex(url, pattern=_DOMAIN_REGEX), "h")),
            "")
        src = batch[src_column].cast(pa.string()) \
            .take(pa.array(par[hit], pa.int64()))
        return pa.table({"src": src, "dst": host})

    return ds.map_batches(extract, batch_format="pyarrow",
                          zero_copy_batch=True)


def _node_degrees(edges, src: str, dst: str,
                  weight: str | None = None):
    """(nodes, deg) as a driver Arrow table: every distinct node
    label across both endpoints, and out-degree (or total out-WEIGHT
    when ``weight`` is given) per src node. Node-sized — the one
    structure PageRank legitimately holds per worker."""

    def endpoints(batch: pa.Table) -> pa.Table:
        # per-block combiner: (node, outdeg partial) for srcs plus
        # zero-degree rows for dsts, one groupby away from final
        sa = batch[src].cast(pa.string()).combine_chunks()
        da = batch[dst].cast(pa.string()).combine_chunks()
        both = pa.concat_arrays([sa, da])
        o = np.zeros(len(both), np.int64)
        if weight is None:
            o[:len(sa)] = 1
        else:
            o[:len(sa)] = pc.cast(batch[weight], pa.int64()) \
                .to_numpy(zero_copy_only=False)
        g = pa.TableGroupBy(
            pa.table({"node": both, "o": pa.array(o)}),
            ["node"]).aggregate([("o", "sum")])
        return pa.table({"node": g["node"],
                         "outdeg": g["o_sum"].cast(pa.int64())})

    agg = edges.map_batches(endpoints, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby("node").sum("outdeg")
    parts = [pa.Table.from_batches([b]) if isinstance(
        b, pa.RecordBatch) else b
        for b in agg.iter_batches(batch_format="pyarrow")]
    parts = [t for t in parts if t.num_rows]
    if not parts:
        return (pa.table({"node": pa.array([], pa.string()),
                          "outdeg": pa.array([], pa.int64())}))
    t = pa.concat_tables(parts, promote_options="default")
    return pa.table({"node": t["node"],
                     "outdeg": t["sum(outdeg)"].cast(pa.int64())}) \
        .sort_by([("node", "ascending")])


def pagerank(edges, src: str = "src", dst: str = "dst",
             n_iter: int = 3, scale: int = 10 ** 9,
             damp_num: int = 85, damp_den: int = 100,
             mode: str = "broadcast", weight: str | None = None):
    """Fixed-point integer PageRank over an edge-list Dataset.

    rank_0(v) = scale for every node (src or dst endpoint);
    rank_{i+1}(v) = base + (damp_num * S_i(v)) // damp_den where
    S_i(v) = sum over in-edges (u, v) of rank_i(u) // outdeg(u) and
    base = ((damp_den - damp_num) * scale) // damp_den. All math is
    int64 floor division on non-negative values, so DuckDB's ``//``
    reproduces it bit for bit. Pick ``scale`` so
    n_nodes * scale * damp_num stays under 2^63 (the per-node sum is
    bounded by the total rank mass).

    ``weight`` names an optional int64 edge-weight column (e.g. a
    mention count from a pre-aggregated edge list): the contribution
    becomes ``(rank_i(u) * w) // W(u)`` with ``W(u)`` the src's
    total out-weight — same integer discipline, SQL-identical via
    ``sum((r.rank * e.w) // d.outdeg)``. Unweighted parallel edges
    are the degenerate w=1 case. Weights must be positive ints, and
    the overflow bound tightens to
    ``n_nodes * scale * max_weight * damp_num < 2^63`` — ranks grow
    toward the total mass (n_nodes * scale), and rank * w multiplies
    that (numpy int64 wraps silently; DuckDB raises). Shrink
    ``scale`` accordingly for heavy weights.

    Returns a driver pyarrow Table (node:string, rank_fp:int64)
    sorted by node — node-sized by construction.
    """
    import ray

    if mode not in ("broadcast", "sorted"):
        raise ValueError(f"mode must be broadcast|sorted, got {mode!r}")
    base = ((damp_den - damp_num) * scale) // damp_den

    # the edge list is consumed once per iteration (plus once for
    # degrees): pin it in the object store so the upstream corpus
    # scan / extraction runs EXACTLY once, not n_iter+1 times —
    # edges are host-graph-sized, far below the raw corpus, and the
    # store spills if needed
    edges = edges.materialize()
    deg_t = _node_degrees(edges, src, dst, weight)
    n = deg_t.num_rows
    if n == 0:
        return pa.table({"node": pa.array([], pa.string()),
                         "rank_fp": pa.array([], pa.int64())})
    if mode == "sorted":
        return _pagerank_sorted(edges, src, dst, deg_t, n_iter,
                                scale, damp_num, damp_den, base,
                                weight)

    node_arr = deg_t["node"].combine_chunks()
    outdeg = deg_t["outdeg"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    rank = np.full(n, scale, np.int64)

    for _ in range(n_iter):
        if weight is None:
            # node-sized driver math: per-src contribution quotient
            q = np.zeros(n, np.int64)
            has_out = outdeg > 0
            q[has_out] = rank[has_out] // outdeg[has_out]
            handle = ray.put((node_arr, q, None))
        else:
            # per-edge quotient (rank * w) // W needs both factors
            handle = ray.put((node_arr, rank, outdeg))

        def contrib(batch: pa.Table, h=handle) -> pa.Table:
            nodes_r, a_r, w_r = ray.get(h)
            idx = pc.index_in(batch[src].cast(pa.string()),
                              value_set=nodes_r)
            # every src endpoint is in the node table by construction
            ii = idx.to_numpy(zero_copy_only=False)
            if w_r is None:
                c = a_r[ii]
            else:
                w = pc.cast(batch[weight], pa.int64()) \
                    .to_numpy(zero_copy_only=False)
                c = (a_r[ii] * w) // w_r[ii]
            g = pa.TableGroupBy(
                pa.table({"node": batch[dst].cast(pa.string()),
                          "c": pa.array(c)}),
                ["node"]).aggregate([("c", "sum")])
            return pa.table({"node": g["node"],
                             "c": g["c_sum"].cast(pa.int64())})

        s_parts = [pa.Table.from_batches([b]) if isinstance(
            b, pa.RecordBatch) else b
            for b in edges.map_batches(
                contrib, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("node").sum("c")
            .iter_batches(batch_format="pyarrow")]
        s_parts = [t for t in s_parts if t.num_rows]
        s = np.zeros(n, np.int64)
        if s_parts:
            st = pa.concat_tables(s_parts, promote_options="default")
            idx = pc.index_in(st["node"].combine_chunks(),
                              value_set=node_arr) \
                .to_numpy(zero_copy_only=False)
            s[idx] = st["sum(c)"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
        rank = base + (damp_num * s) // damp_den

    return pa.table({"node": node_arr,
                     "rank_fp": pa.array(rank, pa.int64())})


def _pagerank_sorted(edges, src, dst, deg_t, n_iter, scale,
                     damp_num, damp_den, base, weight=None):
    """Driver-state-free realization: the rank table stays a Dataset;
    each iteration is quotient-map -> sort-merge join onto the edge
    list -> per-block dst combiner -> one node-sized groupby. The
    driver only touches the FINAL node-sized result. With ``weight``
    the rank/out-weight pair rides the join and the per-edge
    quotient (rank * w) // W happens in the combiner."""
    import ray

    from .relational import sort_merge_join

    nodes_only = pa.table({"node": deg_t["node"]})
    ranks = ray.data.from_arrow(pa.table({
        "node": deg_t["node"],
        "outdeg": deg_t["outdeg"],
        "rank": pa.array(np.full(deg_t.num_rows, scale, np.int64)),
    }))
    zeros = ray.data.from_arrow(pa.table({
        "node": nodes_only["node"],
        "c": pa.array(np.zeros(deg_t.num_rows, np.int64)),
    }))

    for it in range(n_iter):
        if weight is None:
            def quotient(batch: pa.Table) -> pa.Table:
                r = batch["rank"].to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                o = batch["outdeg"].to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                q = np.zeros(len(r), np.int64)
                np.floor_divide(r, o, out=q, where=o > 0)
                return pa.table({"qnode": batch["node"],
                                 "q": pa.array(q)})

            carry_cols = ["q"]
        else:
            def quotient(batch: pa.Table) -> pa.Table:
                return pa.table({"qnode": batch["node"],
                                 "qrank": batch["rank"],
                                 "qw": batch["outdeg"]})

            carry_cols = ["qrank", "qw"]

        q_ds = ranks.map_batches(quotient, batch_format="pyarrow",
                                 zero_copy_batch=True)
        joined = sort_merge_join(edges, q_ds, left_on=src,
                                 right_on="qnode",
                                 value_columns=carry_cols,
                                 how="inner")

        def combine(batch: pa.Table) -> pa.Table:
            if weight is None:
                c = batch["q"]
            else:
                r = pc.cast(batch["qrank"], pa.int64()) \
                    .to_numpy(zero_copy_only=False)
                ww = pc.cast(batch["qw"], pa.int64()) \
                    .to_numpy(zero_copy_only=False)
                w = pc.cast(batch[weight], pa.int64()) \
                    .to_numpy(zero_copy_only=False)
                c = pa.array((r * w) // ww)
            g = pa.TableGroupBy(
                pa.table({"node": batch[dst].cast(pa.string()),
                          "c": c}),
                ["node"]).aggregate([("c", "sum")])
            return pa.table({"node": g["node"],
                             "c": g["c_sum"].cast(pa.int64())})

        summed = joined.map_batches(combine, batch_format="pyarrow",
                                    zero_copy_batch=True) \
            .union(zeros).groupby("node").sum("c")

        def next_rank(batch: pa.Table) -> pa.Table:
            s = batch["sum(c)"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return pa.table({
                "node": batch["node"],
                "rank": pa.array(base + (damp_num * s) // damp_den)})

        ranks_next = summed.map_batches(
            next_rank, batch_format="pyarrow", zero_copy_batch=True)
        # re-attach the static out-degree for the next quotient pass
        # (node-sized join) and bound lineage depth per iteration
        if it < n_iter - 1:
            ranks = sort_merge_join(
                ranks_next,
                ray.data.from_arrow(deg_t.rename_columns(
                    ["dnode", "outdeg"])),
                left_on="node", right_on="dnode",
                value_columns=["outdeg"], how="inner").materialize()
        else:
            ranks = ranks_next

    parts = [pa.Table.from_batches([b]) if isinstance(
        b, pa.RecordBatch) else b
        for b in ranks.iter_batches(batch_format="pyarrow")]
    parts = [t for t in parts if t.num_rows]
    out = pa.concat_tables(parts, promote_options="default")
    return pa.table({"node": out["node"],
                     "rank_fp": out["rank"].cast(pa.int64())}) \
        .sort_by([("node", "ascending")])


def hits(edges, src: str = "src", dst: str = "dst",
         n_iter: int = 3, scale: int = 10 ** 9):
    """Fixed-point integer HITS (hubs & authorities) over an
    edge-list Dataset — PageRank's companion signal: a node is a good
    AUTHORITY when good hubs link to it, a good HUB when it links to
    good authorities.

    Per iteration (all int64, bit-reproducible in SQL):
        a'(v) = sum over edges (u, v) of h(u);  a = (a' * scale) // max(a')
        h'(u) = sum over edges (u, v) of a(v);  h = (h' * scale) // max(h')
    starting from h = scale everywhere. Max-normalization (instead of
    the classical L2) keeps every value integer and bounded by
    ``scale``; the scalar max is a global aggregate, deterministic.
    Nodes outside the max component simply score lower — the relative
    ordering HITS exists for is preserved.

    Shape: per half-iteration ONE edge-list pass with a per-block
    combiner + ONE node-sized groupby (exactly PageRank's envelope);
    the hub/authority vectors are node-sized broadcasts. Bound:
    n_edges * scale must stay under 2^63.

    Returns a driver pyarrow Table (node, hub_fp, auth_fp), sorted.
    """
    import ray

    edges = edges.materialize()
    deg_t = _node_degrees(edges, src, dst)
    n = deg_t.num_rows
    if n == 0:
        return pa.table({"node": pa.array([], pa.string()),
                         "hub_fp": pa.array([], pa.int64()),
                         "auth_fp": pa.array([], pa.int64())})
    node_arr = deg_t["node"].combine_chunks()
    hub = np.full(n, scale, np.int64)
    auth = np.zeros(n, np.int64)

    def spread(vec: np.ndarray, from_col: str, to_col: str):
        """One edge pass: out[to] += vec[from], node-sized result."""
        handle = ray.put((node_arr, vec))

        def contrib(batch: pa.Table, h=handle) -> pa.Table:
            nodes_r, v_r = ray.get(h)
            idx = pc.index_in(batch[from_col].cast(pa.string()),
                              value_set=nodes_r)
            c = v_r[idx.to_numpy(zero_copy_only=False)]
            g = pa.TableGroupBy(
                pa.table({"node": batch[to_col].cast(pa.string()),
                          "c": pa.array(c)}),
                ["node"]).aggregate([("c", "sum")])
            return pa.table({"node": g["node"],
                             "c": g["c_sum"].cast(pa.int64())})

        out = np.zeros(n, np.int64)
        parts = [pa.Table.from_batches([b]) if isinstance(
            b, pa.RecordBatch) else b
            for b in edges.map_batches(
                contrib, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("node").sum("c")
            .iter_batches(batch_format="pyarrow")]
        parts = [t for t in parts if t.num_rows]
        if parts:
            st = pa.concat_tables(parts, promote_options="default")
            ii = pc.index_in(st["node"].combine_chunks(),
                             value_set=node_arr) \
                .to_numpy(zero_copy_only=False)
            out[ii] = st["sum(c)"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
        return out

    def norm(raw: np.ndarray) -> np.ndarray:
        # x * scale can exceed int64 (raw is bounded by
        # n_edges * scale): normalize in arbitrary-precision Python
        # ints — node-sized driver math. SQL side: HUGEINT.
        m = int(raw.max())
        if m <= 0:
            return raw
        return np.array([x * scale // m for x in raw.tolist()],
                        np.int64)

    for _ in range(n_iter):
        auth = norm(spread(hub, src, dst))
        hub = norm(spread(auth, dst, src))

    return pa.table({"node": node_arr,
                     "hub_fp": pa.array(hub, pa.int64()),
                     "auth_fp": pa.array(auth, pa.int64())})


def co_mention_pairs(ds, text_column: str = "text"):
    """Within-row host co-mention edges: for every row, the DISTINCT
    lowercased hosts of its URL mentions pair up (upper triangle by
    host string), one (h_a, h_b) row per unordered pair — the
    standard co-occurrence graph construction (hosts cited together
    are related). Entirely batch-local: a document is one row, so
    extraction, per-row dedup and pair expansion all happen in the
    one vectorized scan — no shuffle. Pair expansion is the global
    repeat/offset formula across ALL row segments at once (no
    per-row Python); malformed/empty hosts are dropped. Parallel
    pairs across rows are kept (callers dedup globally —
    :func:`triangle_counts` does)."""
    from .text import _flat_terms, _DOMAIN_REGEX

    empty = pa.table({"h_a": pa.array([], pa.string()),
                      "h_b": pa.array([], pa.string())})

    def expand(batch: pa.Table) -> pa.Table:
        flat, par = _flat_terms(batch, text_column)
        if len(flat) == 0:
            return empty
        url = pc.struct_field(
            pc.extract_regex(flat, pattern=r"(?P<u>https?://[^\s]+)"),
            "u")
        hit = pc.is_valid(url).to_numpy(zero_copy_only=False)
        if not hit.any():
            return empty
        host = pc.fill_null(
            pc.utf8_lower(pc.struct_field(pc.extract_regex(
                url.filter(pa.array(hit)), pattern=_DOMAIN_REGEX),
                "h")), "")
        hs = host.to_numpy(zero_copy_only=False)
        rows = par[hit]
        keep = hs != ""
        hs, rows = hs[keep], rows[keep]
        if len(hs) == 0:
            return empty
        # per-row distinct hosts, host-sorted within each row
        order = np.lexsort((hs, rows))
        hs, rows = hs[order], rows[order]
        uniq = np.concatenate(
            [[True], (rows[1:] != rows[:-1]) | (hs[1:] != hs[:-1])])
        hs, rows = hs[uniq], rows[uniq]
        n = len(hs)
        # vectorized all-segments upper triangle: element at in-seg
        # position p of a size-m segment leads m-1-p pairs
        newseg = np.concatenate([[True], rows[1:] != rows[:-1]])
        seg_ids = np.cumsum(newseg) - 1
        starts = np.nonzero(newseg)[0]
        sizes = np.diff(np.concatenate([starts, [n]]))
        c = (sizes[seg_ids] - 1
             - (np.arange(n) - starts[seg_ids])).astype(np.int64)
        total = int(c.sum())
        if total == 0:
            return empty
        rep = np.repeat(np.arange(n), c)
        off = np.arange(total) - np.repeat(
            np.concatenate([[0], np.cumsum(c)[:-1]]), c)
        return pa.table({"h_a": pa.array(hs[rep]),
                         "h_b": pa.array(hs[rep + 1 + off])})

    return ds.map_batches(expand, batch_format="pyarrow",
                          zero_copy_batch=True)


def _center_wedges(oriented, n_nodes: int):
    """(a, b) rank-oriented distinct edges -> wedge candidates
    (center a, packed id-canonical key of the b-pair). Same shape as
    dedup's bucket pairing: ONE sort on the center co-locates each
    adjacency list, interior segments expand their upper triangle
    vectorized, and the <= 2 boundary segments per block stitch in
    one worker-side pass — a hot center's O(d^2) pair blow-up happens
    in a worker, never the driver, and degree orientation bounds d by
    O(sqrt(E))."""
    srt = oriented.sort("a")

    empty = pa.table({"u": pa.array([], pa.int64()),
                      "__wk": pa.array([], pa.int64()),
                      "__edge": pa.array([], pa.bool_())})

    def pack(center: np.ndarray, x: np.ndarray, y: np.ndarray):
        lo = np.minimum(x, y)
        hi = np.maximum(x, y)
        return pa.table({
            "u": pa.array(center, pa.int64()),
            "__wk": pa.array(lo * n_nodes + hi, pa.int64()),
            "__edge": pa.array(np.zeros(len(lo), bool))})

    def seg_expand(a: np.ndarray, b: np.ndarray, interior_only: bool,
                   g_first: int, g_last: int):
        n = len(a)
        change = np.nonzero(a[1:] != a[:-1])[0] + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [n]])
        parts = []
        edge_idx = []
        for s, e in zip(starts, ends):
            is_boundary = interior_only and (s == g_first or
                                             e == g_last)
            if is_boundary:
                edge_idx.append(np.arange(s, e))
                continue
            if e - s < 2:
                continue
            m = e - s
            bb = np.sort(b[s:e])
            cnt = np.arange(m - 1, -1, -1, dtype=np.int64)
            total = m * (m - 1) // 2
            offs = np.concatenate([[0], np.cumsum(cnt)[:-1]])
            ia = np.repeat(bb, cnt)
            ib = bb[np.arange(total, dtype=np.int64)
                    - np.repeat(offs, cnt)
                    + np.repeat(np.arange(1, m + 1, dtype=np.int64),
                                cnt)]
            parts.append(pack(np.full(total, a[s], np.int64), ia, ib))
        return parts, edge_idx

    def block_wedges(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return empty
        a = batch["a"].combine_chunks().to_numpy(zero_copy_only=False)
        b = batch["b"].combine_chunks().to_numpy(zero_copy_only=False)
        parts, edge_idx = seg_expand(a, b, True, 0, n)
        if edge_idx:
            ei = np.concatenate(edge_idx)
            parts.append(pa.table({
                "u": pa.array(a[ei] * n_nodes + b[ei], pa.int64()),
                "__wk": pa.array(b[ei], pa.int64()),
                "__edge": pa.array(np.ones(len(ei), bool))}))
        return pa.concat_tables(parts) if parts else empty

    scanned = srt.map_batches(block_wedges, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    interior = scanned.map_batches(
        lambda t: t.filter(pc.invert(t["__edge"]))
        .select(["u", "__wk"]),
        batch_format="pyarrow", zero_copy_batch=True)

    def edge_wedges(batch: pa.Table) -> pa.Table:
        t = batch.filter(batch["__edge"])
        if t.num_rows == 0:
            return empty.select(["u", "__wk"])
        packed = t["u"].combine_chunks().to_numpy(zero_copy_only=False)
        a = packed // n_nodes
        b = t["__wk"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        parts, _ = seg_expand(a, b, False, -1, -1)
        if not parts:
            return empty.select(["u", "__wk"])
        return pa.concat_tables(parts).select(["u", "__wk"])

    stitched = scanned.map_batches(
        lambda t: t.filter(t["__edge"]),
        batch_format="pyarrow", zero_copy_batch=True) \
        .repartition(1) \
        .map_batches(edge_wedges, batch_format="pyarrow",
                     zero_copy_batch=True)
    return interior.union(stitched)


def triangle_counts(pairs, src: str = "h_a", dst: str = "h_b",
                    mode: str = "auto",
                    broadcast_max_edges: int = 500_000):
    """Per-node triangle counts over an undirected graph given as a
    stream of (possibly parallel, possibly reversed) string endpoint
    pairs. Classic degree-ordered compact-forward counting:

    1. ONE sort + run scan dedups to the distinct undirected edge
       set (lexicographic (lo, hi) canonical form after a per-block
       combiner; self-loops dropped) — :func:`~.keys.key_run_counts`,
       no hash groupby.
    2. Node labels + distinct-edge degrees collect to a DRIVER table
       — node-sized, the same envelope :func:`pagerank` holds
       (hosts, not documents) — assigning integer ids and the
       (degree, id) total order.
    3. Every edge orients low-rank -> high-rank; each node's
       out-adjacency is then O(sqrt(E)) long regardless of skew.
    4. Wedges expand and close in one of TWO realizations (the
       pagerank broadcast/sorted duality, differential-tested):
       ``"broadcast"`` — the oriented edge set (<=
       ``broadcast_max_edges``, checked when ``mode="auto"``)
       collects once and the whole wedge-expand + packed-key
       searchsorted closure runs as ONE vectorized driver pass
       (edge-sized state, Sum d^2 <= E^1.5 wedge scratch — the
       right shape for the node-bounded host graphs this exists
       for); ``"sorted"`` — no driver edge state: wedge candidates
       stream through the sorted interior-segment + edge-stitch
       machinery (:func:`_center_wedges`) and ONE distributed
       sort-merge join against the packed edge-key set closes them.
       Every triangle is found exactly once at its lowest-rank
       wedge in both modes.
    5. Per-triangle member counts fold to the node-sized driver
       table; only nodes in >= 1 triangle appear.

    Packing bound: n_nodes^2 must fit int64 (n_nodes < 3e9).
    Returns a driver pyarrow Table (node, n_triangles), node-sorted.
    """
    if mode not in ("auto", "broadcast", "sorted"):
        raise ValueError(f"mode must be auto|broadcast|sorted,"
                         f" got {mode!r}")
    import ray

    from .keys import key_run_counts
    from .relational import sort_merge_join

    def canon(batch: pa.Table) -> pa.Table:
        sa = batch[src].cast(pa.string()).combine_chunks()
        da = batch[dst].cast(pa.string()).combine_chunks()
        lo = pc.min_element_wise(sa, da)
        hi = pc.max_element_wise(sa, da)
        t = pa.table({"lo": lo, "hi": hi}).filter(
            pc.not_equal(lo, hi))
        # per-block combiner: distinct within the block
        g = pa.TableGroupBy(t, ["lo", "hi"]).aggregate([([], "count_all")])
        return g.select(["lo", "hi"])

    # distinct undirected edges by ONE sort + run scan (key_run_counts
    # — parallel pairs are near-unique after the per-block combiner,
    # so a hash groupby would be pure overhead)
    distinct = key_run_counts(
        pairs.map_batches(canon, batch_format="pyarrow",
                          zero_copy_batch=True),
        ["lo", "hi"]) \
        .map_batches(lambda t: t.select(["lo", "hi"]),
                     batch_format="pyarrow", zero_copy_batch=True) \
        .materialize()

    empty_out = pa.table({"node": pa.array([], pa.string()),
                          "n_triangles": pa.array([], pa.int64())})
    # undirected degree over the distinct edges: ONE endpoint-melt
    # pass with per-block combiners, merged driver-side (node-sized,
    # the same envelope the rank/orientation tables already hold)
    def endpoints(batch: pa.Table) -> pa.Table:
        both = pa.concat_arrays([batch["lo"].combine_chunks(),
                                 batch["hi"].combine_chunks()])
        g = pa.TableGroupBy(pa.table({"node": both}), ["node"]) \
            .aggregate([([], "count_all")])
        return pa.table({"node": g["node"],
                         "deg": g["count_all"].cast(pa.int64())})

    parts_d = [pa.Table.from_batches([bt]) if isinstance(
        bt, pa.RecordBatch) else bt
        for bt in distinct.map_batches(
            endpoints, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow")]
    parts_d = [t for t in parts_d if t.num_rows]
    if not parts_d:
        return empty_out
    deg_t = pa.TableGroupBy(
        pa.concat_tables(parts_d, promote_options="default"),
        ["node"]).aggregate([("deg", "sum")]) \
        .sort_by([("node", "ascending")])
    n_nodes = deg_t.num_rows
    node_arr = deg_t["node"].combine_chunks()
    deg = deg_t["deg_sum"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    # rank = position in the (degree, id) total order
    rank = np.empty(n_nodes, np.int64)
    rank[np.lexsort((np.arange(n_nodes), deg))] = \
        np.arange(n_nodes, dtype=np.int64)
    handle = ray.put((node_arr, rank))

    def orient(batch: pa.Table, h=handle) -> pa.Table:
        nodes_r, rank_r = ray.get(h)
        li = pc.index_in(batch["lo"].combine_chunks(),
                         value_set=nodes_r) \
            .to_numpy(zero_copy_only=False)
        hi_ = pc.index_in(batch["hi"].combine_chunks(),
                          value_set=nodes_r) \
            .to_numpy(zero_copy_only=False)
        swap = rank_r[li] > rank_r[hi_]
        return pa.table({
            "a": pa.array(np.where(swap, hi_, li), pa.int64()),
            "b": pa.array(np.where(swap, li, hi_), pa.int64())})

    oriented = distinct.map_batches(orient, batch_format="pyarrow",
                                    zero_copy_batch=True).materialize()
    if mode == "auto":
        mode = "broadcast" if oriented.count() <= broadcast_max_edges \
            else "sorted"
    if mode == "broadcast":
        et = pa.concat_tables(
            [pa.Table.from_batches([bt]) if isinstance(
                bt, pa.RecordBatch) else bt
             for bt in oriented.iter_batches(batch_format="pyarrow")],
            promote_options="default") if oriented.count() else None
        if et is None or et.num_rows == 0:
            return empty_out
        a = et["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = et["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        # wedge expansion over every center's adjacency run (global
        # repeat/offset formula), closure by ONE searchsorted against
        # the packed id-canonical edge keys — all vectorized
        nsg = np.concatenate([[True], a[1:] != a[:-1]])
        sst = np.nonzero(nsg)[0]
        sid = np.cumsum(nsg) - 1
        ssz = np.diff(np.concatenate([sst, [len(a)]]))
        c = ssz[sid] - 1 - (np.arange(len(a)) - sst[sid])
        total = int(c.sum())
        if total == 0:
            return empty_out
        rep = np.repeat(np.arange(len(a)), c)
        off = np.arange(total) - np.repeat(
            np.concatenate([[0], np.cumsum(c)[:-1]]), c)
        x, y = b[rep], b[rep + 1 + off]
        wk = np.minimum(x, y) * n_nodes + np.maximum(x, y)
        pk = np.sort(np.minimum(a, b) * n_nodes + np.maximum(a, b))
        pos = np.searchsorted(pk, wk)
        hit = (pos < len(pk)) & (pk[np.minimum(pos, len(pk) - 1)] == wk)
        members = np.concatenate([a[rep][hit], x[hit], y[hit]])
        if len(members) == 0:
            return empty_out
        cnts = np.bincount(members, minlength=n_nodes)
        nz = np.nonzero(cnts)[0]
        return pa.table({
            "node": node_arr.take(pa.array(nz, pa.int64())),
            "n_triangles": pa.array(cnts[nz], pa.int64()),
        }).sort_by([("node", "ascending")])
    wedges = _center_wedges(oriented, n_nodes)

    def edge_keys(batch: pa.Table) -> pa.Table:
        a = batch["a"].combine_chunks().to_numpy(zero_copy_only=False)
        b = batch["b"].combine_chunks().to_numpy(zero_copy_only=False)
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        return pa.table({
            "__ek": pa.array(lo * n_nodes + hi, pa.int64()),
            "one": pa.array(np.ones(len(a), np.int8))})

    keys = oriented.map_batches(edge_keys, batch_format="pyarrow",
                                zero_copy_batch=True)
    closed = sort_merge_join(wedges, keys, "__wk", "__ek",
                             ["one"], how="inner")

    def member_counts(batch: pa.Table) -> pa.Table:
        u = batch["u"].combine_chunks().to_numpy(zero_copy_only=False)
        wk = batch["__wk"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        members = np.concatenate([u, wk // n_nodes, wk % n_nodes])
        g = pa.TableGroupBy(
            pa.table({"id": pa.array(members, pa.int64())}),
            ["id"]).aggregate([([], "count_all")])
        return pa.table({"id": g["id"],
                         "c": g["count_all"].cast(pa.int64())})

    # node-sized per-block partials merge driver-side (same envelope
    # as the degree/rank tables) — no Ray groupby for a tiny table
    parts = [pa.Table.from_batches([b]) if isinstance(
        b, pa.RecordBatch) else b
        for b in closed.map_batches(
            member_counts, batch_format="pyarrow",
            zero_copy_batch=True).iter_batches(batch_format="pyarrow")]
    parts = [t for t in parts if t.num_rows]
    if not parts:
        return empty_out
    st = pa.TableGroupBy(
        pa.concat_tables(parts, promote_options="default"),
        ["id"]).aggregate([("c", "sum")])
    ids = st["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table({
        "node": node_arr.take(pa.array(ids)),
        "n_triangles": st["c_sum"].cast(pa.int64()),
    }).sort_by([("node", "ascending")])
