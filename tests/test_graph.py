"""Iterative link-graph operators (engine/graph.py).

PageRank is verified against a direct numpy power-iteration reference
that uses the IDENTICAL integer fixed-point arithmetic, on handcrafted
graphs (cycles, dangling nodes, parallel edges) and on a randomized
multi-block graph where the broadcast and sorted (driver-state-free)
realizations must also agree with each other.
"""

import numpy as np
import pyarrow as pa
import pytest

from json_schema_ray.engine.graph import pagerank, url_host_edges

SCALE = 10 ** 9
BASE = ((100 - 85) * SCALE) // 100


def _reference(src, dst, n_iter=3):
    """Dict node -> rank_fp via plain-Python power iteration with the
    engine's exact integer formula."""
    nodes = sorted(set(src) | set(dst))
    ni = {v: i for i, v in enumerate(nodes)}
    out = np.zeros(len(nodes), np.int64)
    for u in src:
        out[ni[u]] += 1
    rank = np.full(len(nodes), SCALE, np.int64)
    for _ in range(n_iter):
        s = np.zeros(len(nodes), np.int64)
        for u, v in zip(src, dst):
            s[ni[v]] += rank[ni[u]] // out[ni[u]]
        rank = BASE + (85 * s) // 100
    return {v: int(rank[ni[v]]) for v in nodes}


def _as_dict(t: pa.Table):
    return dict(zip(t["node"].to_pylist(), t["rank_fp"].to_pylist()))


def test_pagerank_matches_reference_both_modes(ray_session):
    import ray

    # cycle a->b->c->a, dangling-out node c? no: d has no out-edges
    # (mass evaporates), e receives only, parallel edge a->b twice
    src = ["a", "a", "b", "c", "d", "a", "a"]
    dst = ["b", "c", "c", "a", "a", "e", "b"]
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst})) \
        .repartition(3)
    want = _reference(src, dst)
    assert _as_dict(pagerank(ds, mode="broadcast")) == want
    assert _as_dict(pagerank(ds, mode="sorted")) == want
    # dangling node d decays to base immediately (nobody links to it
    # after iteration 1's in-edge? d HAS an out-edge d->a and no
    # in-edges, so it holds exactly base)
    assert want["d"] == BASE


def test_pagerank_randomized_multiblock_differential(ray_session):
    import ray

    rng = np.random.default_rng(7)
    n_edges, n_nodes = 600, 40
    src = [f"n{int(i)}" for i in rng.integers(0, n_nodes, n_edges)]
    dst = [f"n{int(i)}" for i in rng.integers(0, n_nodes, n_edges)]
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst})) \
        .repartition(7)
    want = _reference(src, dst, n_iter=3)
    got_b = _as_dict(pagerank(ds, mode="broadcast"))
    got_s = _as_dict(pagerank(ds, mode="sorted"))
    assert got_b == want
    assert got_s == want


def test_pagerank_weighted_matches_reference_both_modes(ray_session):
    import ray

    rng = np.random.default_rng(17)
    n_edges, n_nodes = 200, 20
    src = [f"n{int(i)}" for i in rng.integers(0, n_nodes, n_edges)]
    dst = [f"n{int(i)}" for i in rng.integers(0, n_nodes, n_edges)]
    w = [int(x) for x in rng.integers(1, 9, n_edges)]
    ds = ray.data.from_arrow(pa.table({
        "src": src, "dst": dst,
        "w": pa.array(w, pa.int64())})).repartition(5)

    # brute force with the weighted integer formula:
    # contribution = (rank(u) * w) // W(u)
    nodes = sorted(set(src) | set(dst))
    ni = {v: i for i, v in enumerate(nodes)}
    W = np.zeros(len(nodes), np.int64)
    for u, ww in zip(src, w):
        W[ni[u]] += ww
    rank = np.full(len(nodes), SCALE, np.int64)
    for _ in range(3):
        s = np.zeros(len(nodes), np.int64)
        for u, v, ww in zip(src, dst, w):
            s[ni[v]] += (rank[ni[u]] * ww) // W[ni[u]]
        rank = BASE + (85 * s) // 100
    want = {v: int(rank[ni[v]]) for v in nodes}

    got_b = _as_dict(pagerank(ds, weight="w", mode="broadcast"))
    got_s = _as_dict(pagerank(ds, weight="w", mode="sorted"))
    assert got_b == want
    assert got_s == want
    # weight=1 everywhere degenerates to the unweighted operator
    ones = ray.data.from_arrow(pa.table({
        "src": src, "dst": dst,
        "w": pa.array([1] * n_edges, pa.int64())})).repartition(5)
    assert _as_dict(pagerank(ones, weight="w")) == \
        _as_dict(pagerank(ds.drop_columns(["w"])))


def test_pagerank_empty_and_bad_mode(ray_session):
    import ray

    empty = ray.data.from_arrow(pa.table({
        "src": pa.array([], pa.string()),
        "dst": pa.array([], pa.string())}))
    t = pagerank(empty)
    assert t.num_rows == 0
    assert t.column_names == ["node", "rank_fp"]
    with pytest.raises(ValueError):
        pagerank(empty, mode="nope")


def test_pagerank_hot_node_mass_conservation(ray_session):
    """A star graph: every leaf links to the hub. The hub's rank must
    equal base + damped sum of every leaf's full rank (outdeg 1), and
    no int64 overflow occurs at the documented scale bound."""
    import ray

    leaves = [f"leaf{i}" for i in range(50)]
    ds = ray.data.from_arrow(pa.table({
        "src": leaves, "dst": ["hub"] * len(leaves)})).repartition(4)
    got = _as_dict(pagerank(ds, n_iter=1))
    assert got["hub"] == BASE + (85 * (50 * SCALE)) // 100
    assert all(got[v] == BASE for v in leaves)


def test_hits_matches_reference(ray_session):
    import ray

    from json_schema_ray.engine.graph import hits

    rng = np.random.default_rng(23)
    n_edges, n_nodes = 300, 25
    src = [f"n{int(i)}" for i in rng.integers(0, n_nodes, n_edges)]
    dst = [f"n{int(i)}" for i in rng.integers(0, n_nodes, n_edges)]
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst})) \
        .repartition(4)

    nodes = sorted(set(src) | set(dst))
    ni = {v: i for i, v in enumerate(nodes)}
    # reference in arbitrary-precision Python ints (x * SCALE can
    # exceed int64 before the normalizing division)
    hub = [SCALE] * len(nodes)
    auth = [0] * len(nodes)
    for _ in range(3):
        a = [0] * len(nodes)
        for u, v in zip(src, dst):
            a[ni[v]] += hub[ni[u]]
        m = max(a)
        auth = [x * SCALE // m for x in a] if m > 0 else a
        h = [0] * len(nodes)
        for u, v in zip(src, dst):
            h[ni[u]] += auth[ni[v]]
        m = max(h)
        hub = [x * SCALE // m for x in h] if m > 0 else h

    got = hits(ds, n_iter=3)
    gd = {r["node"]: (r["hub_fp"], r["auth_fp"])
          for r in got.to_pylist()}
    want = {v: (int(hub[ni[v]]), int(auth[ni[v]])) for v in nodes}
    assert gd == want
    # max-normalization bounds both vectors by scale, with at least
    # one node AT scale on each side
    assert max(h for h, _ in gd.values()) == SCALE
    assert max(a for _, a in gd.values()) == SCALE


def test_hits_empty(ray_session):
    import ray

    from json_schema_ray.engine.graph import hits

    empty = ray.data.from_arrow(pa.table({
        "src": pa.array([], pa.string()),
        "dst": pa.array([], pa.string())}))
    t = hits(empty)
    assert t.num_rows == 0
    assert t.column_names == ["node", "hub_fp", "auth_fp"]


def test_url_host_edges_extraction(ray_session):
    import ray

    docs = pa.table({
        "source": ["s1", "s2", "s3", "s4"],
        "text": [
            "see http://A.com/x and https://b.com twice http://a.com",
            "no urls at all",
            "malformed http:///nohost tail",
            None,
        ]})
    got = url_host_edges(ray.data.from_arrow(docs)).take_all()
    pairs = sorted((r["src"], r["dst"]) for r in got)
    # uppercase host lowered; one row PER MENTION; malformed
    # authority yields the empty-string host like SQL regexp_extract
    assert pairs == [("s1", "a.com"), ("s1", "a.com"),
                     ("s1", "b.com"), ("s3", "")]


def _tri_reference(edges):
    """Dict node -> triangle count by brute force over the distinct
    undirected edge set."""
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    nodes = sorted(adj)
    for i, x in enumerate(nodes):
        for y in sorted(adj[x]):
            if y <= x:
                continue
            for z in adj[x] & adj[y]:
                if z > y:
                    for m in (x, y, z):
                        counts[m] = counts.get(m, 0) + 1
    return counts


def test_triangle_counts_randomized_differential(ray_session):
    import ray

    from json_schema_ray.engine.graph import triangle_counts

    for seed, n_nodes, n_pairs, blocks in (
            (5, 12, 120, 1), (6, 30, 300, 7), (7, 60, 500, 13)):
        rng = np.random.default_rng(seed)
        a = rng.integers(0, n_nodes, n_pairs)
        b = rng.integers(0, n_nodes, n_pairs)
        edges = [(f"h{x}", f"h{y}") for x, y in zip(a, b)]
        t = pa.table({"h_a": pa.array([e[0] for e in edges]),
                      "h_b": pa.array([e[1] for e in edges])})
        ds = ray.data.from_arrow(t).repartition(blocks)
        want = _tri_reference(edges)
        for mode in ("broadcast", "sorted"):
            got = dict(zip(*[c.to_pylist() for c in
                             triangle_counts(ds, mode=mode).columns]))
            assert got == want, (seed, blocks, mode)


def test_triangle_counts_hot_center_complete_graph(ray_session):
    import ray

    from json_schema_ray.engine.graph import triangle_counts

    # K12: every node sits in C(11,2) = 55 triangles; tiny blocks
    # force the wedge expansion through the edge-stitch path
    n = 12
    pairs = [(f"v{i:02d}", f"v{j:02d}")
             for i in range(n) for j in range(i + 1, n)]
    t = pa.table({"h_a": pa.array([p[0] for p in pairs]),
                  "h_b": pa.array([p[1] for p in pairs])})
    ds = ray.data.from_arrow(t).repartition(16)
    for mode in ("sorted", "broadcast"):
        got = dict(zip(*[c.to_pylist() for c in
                         triangle_counts(ds, mode=mode).columns]))
        assert got == {f"v{i:02d}": 55 for i in range(n)}, mode


def test_triangle_counts_self_loops_parallel_and_empty(ray_session):
    import ray

    from json_schema_ray.engine.graph import triangle_counts

    t = pa.table({
        "h_a": pa.array(["a", "a", "b", "a", "c", "c", "d"]),
        "h_b": pa.array(["b", "b", "a", "c", "b", "c", "d"])})
    got = dict(zip(*[c.to_pylist() for c in
                     triangle_counts(ray.data.from_arrow(t)).columns]))
    # one triangle (a, b, c); self-loops and parallel/reversed
    # duplicates must not inflate it
    assert got == {"a": 1, "b": 1, "c": 1}
    empty = pa.table({"h_a": pa.array([], pa.string()),
                      "h_b": pa.array([], pa.string())})
    assert triangle_counts(
        ray.data.from_arrow(empty)).num_rows == 0


def test_co_mention_pairs_extraction(ray_session):
    import ray

    from json_schema_ray.engine.graph import co_mention_pairs

    t = pa.table({"text": pa.array([
        "see http://A.com/x and https://b.com/y plus http://a.com/z",
        "only http://solo.com/1 here",
        "no urls at all",
        None,
        "http://x.com/1 http://y.com/2 http://z.com/3",
    ])})
    out = co_mention_pairs(ray.data.from_arrow(t)).take_all()
    pairs = sorted((r["h_a"], r["h_b"]) for r in out)
    # row 0: hosts {a.com, b.com} (case-folded, deduped) -> 1 pair;
    # row 4: 3 hosts -> 3 pairs; singleton/empty/null rows -> none
    assert pairs == [("a.com", "b.com"), ("x.com", "y.com"),
                     ("x.com", "z.com"), ("y.com", "z.com")]
