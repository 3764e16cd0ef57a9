"""Similarity search over embedding columns (``list<float>``).

- Brute-force cosine top-k: the query matrix is broadcast once
  (``ray.put``); each batch does one numpy matmul and keeps only its
  local top-k, so the driver merges ``k x n_blocks`` candidates.
- LSH-bucketed variant (random hyperplane signatures) as the scale
  path: per-batch signatures, groupby bucket, search only the
  query's bucket(s).
- Embedding-cosine near-duplicate detection reuses the bucketing.
"""

from __future__ import annotations

import itertools
from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _batch_matrix(col: pa.ChunkedArray) -> np.ndarray:
    """(n, dim) float32 matrix from a list<float> column, zero-copy
    from the flattened values buffer when possible."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offsets = arr.offsets.to_numpy(zero_copy_only=False)
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    dim = offsets[1] - offsets[0] if len(offsets) > 1 else 0
    return flat.reshape(-1, int(dim)) if dim else flat.reshape(len(arr), 0)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def knn_bruteforce(ds, query: np.ndarray, k: int = 10,
                   id_column: str = "vec_id",
                   embedding_column: str = "embedding",
                   exclude_ids: Optional[set] = None) -> pa.Table:
    """Exact cosine top-k: per-batch matmul + partial top-k, driver
    merge. Returns (id, score) sorted by score desc, id asc."""
    import ray

    q = _normalize(np.asarray(query, dtype=np.float64).reshape(1, -1))
    q_handle = ray.put(q)
    excl = exclude_ids or set()
    excl_handle = ray.put(excl)

    def partial(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_handle)
        ex = ray.get(excl_handle)
        m = _normalize(_batch_matrix(batch[embedding_column])
                       .astype(np.float64))
        scores = (m @ qv.T).ravel()
        ids = np.asarray(batch[id_column].to_pylist())
        if ex:
            keep = ~np.isin(ids, list(ex))
            scores, ids = scores[keep], ids[keep]
        if len(scores) > k:
            top = np.argpartition(-scores, k)[:k]
            scores, ids = scores[top], ids[top]
        return pa.table({
            id_column: pa.array(ids.tolist(), pa.int64()),
            "score": pa.array(scores.tolist(), pa.float64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    rows = parts.take_all()
    rows.sort(key=lambda r: (-r["score"], r[id_column]))
    rows = rows[:k]
    return pa.table({
        id_column: pa.array([r[id_column] for r in rows], pa.int64()),
        "score": pa.array([r["score"] for r in rows], pa.float64()),
    })


class HyperplaneLSH:
    """Random-hyperplane signatures: sign pattern of dot products with
    ``n_planes`` fixed random vectors -> integer bucket."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_planes, dim))
        self.weights = (1 << np.arange(n_planes)).astype(np.int64)

    def buckets(self, m: np.ndarray) -> np.ndarray:
        signs = (m @ self.planes.T) > 0
        return signs.astype(np.int64) @ self.weights


class LSHBucketer:
    def __init__(self, dim: int, id_column: str = "vec_id",
                 embedding_column: str = "embedding",
                 n_planes: int = 12, seed: int = 42):
        self.lsh = HyperplaneLSH(dim, n_planes, seed)
        self.id_column = id_column
        self.embedding_column = embedding_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch[self.embedding_column]).astype(np.float64)
        b = self.lsh.buckets(_normalize(m))
        return batch.append_column("bucket", pa.array(b, pa.int64()))


def knn_lsh(ds, query: np.ndarray, k: int = 10, dim: Optional[int] = None,
            id_column: str = "vec_id", embedding_column: str = "embedding",
            n_planes: int = 8, seed: int = 42,
            concurrency: Optional[int] = None) -> pa.Table:
    """Approximate top-k: restrict the brute-force search to vectors
    whose LSH bucket matches the query's (plus 1-bit neighbors)."""
    q = np.asarray(query, dtype=np.float64).reshape(1, -1)
    dim = dim or q.shape[1]
    lsh = HyperplaneLSH(dim, n_planes, seed)
    q_bucket = int(lsh.buckets(_normalize(q))[0])
    near = {q_bucket} | {q_bucket ^ (1 << i) for i in range(n_planes)}

    bucketed = ds.map_batches(
        LSHBucketer,
        fn_constructor_kwargs=dict(dim=dim, id_column=id_column,
                                   embedding_column=embedding_column,
                                   n_planes=n_planes, seed=seed),
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency or (1, 4))

    def in_near(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch["bucket"],
                        value_set=pa.array(list(near), pa.int64()))
        return batch.filter(pc.fill_null(mask, False))

    candidates = bucketed.map_batches(in_near, batch_format="pyarrow")
    return knn_bruteforce(candidates, query, k=k, id_column=id_column,
                          embedding_column=embedding_column)


def train_ivf_centroids(ds, n_centroids: int = 16,
                        sample_size: int = 4096,
                        embedding_column: str = "embedding",
                        seed: int = 42, n_iter: int = 10) -> np.ndarray:
    """Coarse quantizer for IVF: k-means (Lloyd) on a bounded sample,
    trained ONCE on the driver (sample-sized work) — the 100TB analog
    trains on a reservoir sample, never the corpus."""
    sample = ds.limit(sample_size).take_all()
    m = _normalize(np.asarray([r[embedding_column] for r in sample],
                              dtype=np.float64))
    rng = np.random.default_rng(seed)
    centroids = m[rng.choice(len(m), size=min(n_centroids, len(m)),
                             replace=False)]
    for _ in range(n_iter):
        assign = np.argmax(m @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = m[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


class IVFAssigner:
    """map_batches actor: append the nearest-centroid cell id."""

    def __init__(self, centroids: np.ndarray,
                 embedding_column: str = "embedding"):
        self.centroids = centroids
        self.embedding_column = embedding_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch[self.embedding_column])
                       .astype(np.float64))
        cell = np.argmax(m @ self.centroids.T, axis=1)
        return batch.append_column("ivf_cell", pa.array(cell, pa.int64()))


def knn_ivf(ds, query: np.ndarray, k: int = 10, n_centroids: int = 16,
            n_probe: int = 4, id_column: str = "vec_id",
            embedding_column: str = "embedding", seed: int = 42,
            centroids: Optional[np.ndarray] = None,
            exclude_ids: Optional[set] = None) -> pa.Table:
    """IVF approximate top-k: restrict the brute-force search to the
    ``n_probe`` inverted lists (centroid cells) nearest the query.
    With ``n_probe == n_centroids`` this is exact. Centroids can be
    passed in (trained once, reused across queries)."""
    if centroids is None:
        centroids = train_ivf_centroids(
            ds, n_centroids=n_centroids,
            embedding_column=embedding_column, seed=seed)
    q = _normalize(np.asarray(query, dtype=np.float64).reshape(1, -1))
    sims = (q @ centroids.T).ravel()
    probe_cells = set(np.argsort(-sims)[:n_probe].tolist())

    assigned = ds.map_batches(
        IVFAssigner,
        fn_constructor_kwargs=dict(centroids=centroids,
                                   embedding_column=embedding_column),
        batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 4))

    def in_probe(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch["ivf_cell"],
                        value_set=pa.array(sorted(probe_cells), pa.int64()))
        return batch.filter(pc.fill_null(mask, False))

    candidates = assigned.map_batches(in_probe, batch_format="pyarrow")
    return knn_bruteforce(candidates, query, k=k, id_column=id_column,
                          embedding_column=embedding_column,
                          exclude_ids=exclude_ids)


def embedding_near_dup_pairs(ds, threshold: float = 0.95,
                             id_column: str = "vec_id",
                             embedding_column: str = "embedding",
                             dim: Optional[int] = None,
                             n_planes: int = 10, seed: int = 42,
                             block_rows: int = 1024):
    """Near-duplicate vector pairs: LSH-bucket, then exact cosine
    inside each bucket only. Returns a DATASET of (id_a, id_b,
    cosine) — pairs stream out of the workers; nothing row-sized is
    accumulated on the driver (callers collect/sort only final,
    sparse results).

    Scale shape (the dedup.py ``_bucket_candidate_pairs`` sort +
    interior-segment + edge-stitch machinery, adapted to carry
    vectors): each vector lands in exactly ONE bucket, so every pair
    is generated exactly once. ONE range-partitioned sort on
    ``bucket`` co-locates members; every bucket segment INTERIOR to
    a sorted batch computes its upper-triangle cosine right there,
    slab-wise. The first/last segment of each batch — the only ones
    that can straddle a block boundary, and therefore where any HOT
    bucket lives — emit their member rows instead; those edge
    members broadcast ONCE through the object store as a normalized
    matrix and a second batched probe computes batch-rows x
    same-bucket-columns sims slab-wise, so a 10k-vector (or 10M-
    vector) bucket never lands in a single worker's input: per-task
    memory is O(batch x col_block) regardless of bucket size, and
    the quadratic COMPUTE (inherent to the operator) spreads across
    the probe tasks. Envelope: the edge-member matrix
    (O(straddling + hot-bucket members x dim x 8B)) must fit the
    object store — the same broadcast contract as
    :func:`embedding_near_dup_exact`, but over the sparse edge set,
    not the corpus. Bound expected bucket size by raising
    ``n_planes`` (bucket count 2^n_planes) as the corpus grows."""
    first = ds.take(1)
    import ray

    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "cosine": pa.array([], pa.float64())})
    if not first:
        return ray.data.from_arrow(empty)
    dim = dim or len(first[0][embedding_column])

    bucketed = ds.map_batches(
        LSHBucketer,
        fn_constructor_kwargs=dict(dim=dim, id_column=id_column,
                                   embedding_column=embedding_column,
                                   n_planes=n_planes, seed=seed),
        batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 4))

    srt = bucketed.sort("bucket")
    col_block = 64 * block_rows

    def _segment_cosine(ids: np.ndarray, m: np.ndarray,
                        outs: tuple) -> None:
        """Upper-triangle slab-wise cosine for ONE in-batch segment
        (ids pre-sorted ascending, m normalized rows in id order)."""
        out_a, out_b, out_c = outs
        n = len(ids)
        for lo in range(0, n, block_rows):
            hi = min(lo + block_rows, n)
            for clo in range(lo, n, col_block):
                chi = min(clo + col_block, n)
                sims = m[lo:hi] @ m[clo:chi].T
                ri, ci = np.nonzero(sims >= threshold)
                keep = (clo + ci) > (lo + ri)  # strict upper triangle
                ri, ci = ri[keep], ci[keep]
                out_a.append(ids[lo + ri])
                out_b.append(ids[clo + ci])
                out_c.append(sims[ri, ci])

    def block_pairs(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        schema = pa.schema([
            ("id_a", pa.int64()), ("id_b", pa.int64()),
            ("cosine", pa.float64()), ("bucket", pa.int64()),
            ("__emb", pa.list_(pa.float64())),
            ("__edge", pa.bool_())])
        if n == 0:
            return schema.empty_table()
        b = batch["bucket"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        ids_all = np.asarray(batch[id_column].to_pylist(),
                             dtype=np.int64)
        mat = _normalize(_batch_matrix(batch[embedding_column])
                         .astype(np.float64))
        change = np.nonzero(b[1:] != b[:-1])[0] + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [n]])
        g = len(starts)
        outs: tuple = ([], [], [])
        sizes = ends - starts
        for gi in np.nonzero(sizes >= 2)[0]:
            if gi == 0 or gi == g - 1:
                continue  # edge segments route to the probe pass
            s, e = starts[gi], ends[gi]
            order = np.argsort(ids_all[s:e], kind="stable")
            _segment_cosine(ids_all[s:e][order], mat[s:e][order], outs)
        parts = []
        if outs[0]:
            ia = np.concatenate(outs[0])
            parts.append(pa.table({
                "id_a": pa.array(ia, pa.int64()),
                "id_b": pa.array(np.concatenate(outs[1]), pa.int64()),
                "cosine": pa.array(np.concatenate(outs[2]),
                                   pa.float64()),
                "bucket": pa.nulls(len(ia), pa.int64()),
                "__emb": pa.nulls(len(ia), pa.list_(pa.float64())),
                "__edge": pa.array(np.zeros(len(ia), bool))}))
        eidx = np.concatenate(
            [np.arange(starts[0], ends[0]),
             np.arange(starts[g - 1], ends[g - 1])]) if g > 1 \
            else np.arange(starts[0], ends[0])
        if len(eidx):
            emb = pc.cast(batch[embedding_column].combine_chunks(),
                          pa.list_(pa.float64())).take(pa.array(eidx))
            parts.append(pa.table({
                "id_a": pa.array(ids_all[eidx], pa.int64()),
                "id_b": pa.nulls(len(eidx), pa.int64()),
                "cosine": pa.nulls(len(eidx), pa.float64()),
                "bucket": pa.array(b[eidx], pa.int64()),
                "__emb": emb,
                "__edge": pa.array(np.ones(len(eidx), bool))}))
        return pa.concat_tables(parts) if parts \
            else schema.empty_table()

    scanned = srt.map_batches(block_pairs, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    def interior_only(batch: pa.Table) -> pa.Table:
        kept = batch.filter(pc.invert(batch["__edge"]))
        return kept.select(["id_a", "id_b", "cosine"])

    pairs = scanned.map_batches(interior_only, batch_format="pyarrow",
                                zero_copy_batch=True)

    # edge members: O(2 segments/batch + hot-bucket members) rows;
    # broadcast their normalized matrix once, probe in bounded batches
    edge_tables = []
    for batch in scanned.iter_batches(batch_format="pyarrow"):
        kept = batch.filter(batch["__edge"])
        if kept.num_rows:
            edge_tables.append(kept.select(["bucket", "id_a", "__emb"]))
    if not edge_tables:
        return pairs
    et = pa.concat_tables(edge_tables, promote_options="default")
    e_b = et["bucket"].combine_chunks().to_numpy(zero_copy_only=False)
    e_ids = et["id_a"].combine_chunks().to_numpy(zero_copy_only=False)
    e_m = _normalize(_batch_matrix(et["__emb"]).astype(np.float64))
    handle = ray.put((e_b, e_ids, e_m))

    def edge_probe(batch: pa.Table) -> pa.Table:
        bs_r, ids_r, m_r = ray.get(handle)
        bs = batch["bucket"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        ids = batch["id_a"].combine_chunks() \
            .to_numpy(zero_copy_only=False)
        m = _normalize(_batch_matrix(batch["__emb"]).astype(np.float64))
        out_a, out_b, out_c = [], [], []
        n_all = len(ids_r)
        for clo in range(0, n_all, col_block):
            chi = min(clo + col_block, n_all)
            sims = m @ m_r[clo:chi].T
            ri, ci = np.nonzero(sims >= threshold)
            keep = (ids_r[clo + ci] > ids[ri]) \
                & (bs_r[clo + ci] == bs[ri])  # same bucket, i < j
            ri, ci = ri[keep], ci[keep]
            out_a.append(ids[ri])
            out_b.append(ids_r[clo + ci])
            out_c.append(sims[ri, ci])
        if not out_a:
            return empty
        return pa.table({
            "id_a": pa.array(np.concatenate(out_a), pa.int64()),
            "id_b": pa.array(np.concatenate(out_b), pa.int64()),
            "cosine": pa.array(np.concatenate(out_c), pa.float64())})

    edge_ds = ray.data.from_arrow(et).map_batches(
        edge_probe, batch_format="pyarrow", batch_size=block_rows)
    return pairs.union(edge_ds)


def embedding_near_dup_exact(ds, threshold: float = 0.45,
                             id_column: str = "vec_id",
                             embedding_column: str = "embedding",
                             col_block: int = 65536):
    """EXACT all-pairs cosine near-dup — the brute-force baseline the
    LSH variant (:func:`embedding_near_dup_pairs`) approximates, and
    the oracle-checkable ground truth for it.

    Shape: the normalized corpus matrix is gathered once and
    broadcast through the object store (``ray.put``); each batch
    computes its rows x all-columns similarity slab-wise
    (``col_block`` columns at a time, bounded memory) and emits only
    pairs with ``id_a < id_b`` — every unordered pair exactly once,
    from the smaller-id side. O(n^2) compute is the operator's
    definition; the broadcast right side is O(n x dim x 8B) and must
    fit a worker — beyond that scale use the LSH/IVF variants, or
    tile the right side into column-range datasets."""
    import ray

    ids_parts, mat_parts = [], []
    for batch in ds.select_columns([id_column, embedding_column]) \
            .iter_batches(batch_format="pyarrow"):
        if batch.num_rows:
            ids_parts.append(np.asarray(batch[id_column].to_pylist(),
                                        dtype=np.int64))
            mat_parts.append(_batch_matrix(batch[embedding_column])
                             .astype(np.float64))
    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "cosine": pa.array([], pa.float64())})
    if not ids_parts:
        return ray.data.from_arrow(empty)
    all_ids = np.concatenate(ids_parts)
    all_m = _normalize(np.concatenate(mat_parts))
    handle = ray.put((all_ids, all_m))

    def probe(batch: pa.Table) -> pa.Table:
        ids_r, m_r = ray.get(handle)
        m = _normalize(_batch_matrix(batch[embedding_column])
                       .astype(np.float64))
        ids = np.asarray(batch[id_column].to_pylist(), dtype=np.int64)
        out_a, out_b, out_c = [], [], []
        n_all = len(ids_r)
        for clo in range(0, n_all, col_block):
            chi = min(clo + col_block, n_all)
            sims = m @ m_r[clo:chi].T
            ri, ci = np.nonzero(sims >= threshold)
            keep = ids_r[clo + ci] > ids[ri]  # smaller-id side emits
            ri, ci = ri[keep], ci[keep]
            out_a.extend(ids[ri].tolist())
            out_b.extend(ids_r[clo + ci].tolist())
            out_c.extend(sims[ri, ci].tolist())
        return pa.table({"id_a": pa.array(out_a, pa.int64()),
                         "id_b": pa.array(out_b, pa.int64()),
                         "cosine": pa.array(out_c, pa.float64())})

    return ds.map_batches(probe, batch_format="pyarrow",
                          zero_copy_batch=True)


def build_ann_index(ds, out_dir: str, n_centroids: int = 16,
                    id_column: str = "vec_id",
                    embedding_column: str = "embedding",
                    seed: int = 42, sample_size: int = 4096) -> np.ndarray:
    """Build a PERSISTENT IVF index: k-means centroids (JSON) plus the
    corpus written as hive-partitioned Parquet by ``ivf_cell`` — one
    directory per inverted list, so (a) queries prune their read to
    the probed cells' files only and (b) a failed build can be
    resumed per partition. Returns the centroids (also persisted)."""
    import json as _json
    import os

    cells_dir = os.path.join(out_dir, "cells")
    if os.path.isdir(cells_dir) and os.listdir(cells_dir):
        # Ray writes fresh UUID-named files and never overwrites, so
        # building into a non-empty index would MIX corpora/centroid
        # assignments; a crashed build is resumed by deleting and
        # rebuilding (partition dirs make the rewrite itself cheap)
        raise FileExistsError(
            f"index cells directory already populated: {cells_dir}; "
            "remove it (or choose a fresh out_dir) before rebuilding")
    centroids = train_ivf_centroids(ds, n_centroids=n_centroids,
                                    sample_size=sample_size,
                                    embedding_column=embedding_column,
                                    seed=seed)
    assigned = ds.map_batches(
        IVFAssigner,
        fn_constructor_kwargs=dict(centroids=centroids,
                                   embedding_column=embedding_column),
        batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 4))
    assigned.write_parquet(os.path.join(out_dir, "cells"),
                           partition_cols=["ivf_cell"])
    with open(os.path.join(out_dir, "centroids.json"), "w") as fh:
        _json.dump({"n_centroids": len(centroids), "seed": seed,
                    "id_column": id_column,
                    "embedding_column": embedding_column,
                    "centroids": centroids.tolist()}, fh)
    return centroids


def query_ann_index(index_dir: str, query: np.ndarray, k: int = 10,
                    n_probe: int = 4, id_column: str = "vec_id",
                    embedding_column: str = "embedding",
                    exclude_ids: Optional[set] = None) -> pa.Table:
    """Query a persisted IVF index: load the centroids, pick the
    ``n_probe`` nearest cells, and read ONLY those cells' partition
    directories (the scan never touches the other inverted lists),
    then run the brute-force partial top-k over the candidates.
    Local-filesystem paths only (the pruning globs the hive dirs)."""
    import json as _json
    import os

    import ray

    with open(os.path.join(index_dir, "centroids.json")) as fh:
        meta = _json.load(fh)
    if not os.path.isdir(os.path.join(index_dir, "cells")):
        raise FileNotFoundError(
            f"no cells/ directory under index at {index_dir}")
    id_column = meta.get("id_column", id_column)
    embedding_column = meta.get("embedding_column", embedding_column)
    centroids = np.asarray(meta["centroids"], dtype=np.float64)
    q = _normalize(np.asarray(query, dtype=np.float64).reshape(1, -1))
    sims = (q @ centroids.T).ravel()
    probe = np.argsort(-sims)[:n_probe].tolist()
    import glob as _glob

    paths = []
    for c in probe:
        paths.extend(sorted(_glob.glob(os.path.join(
            index_dir, "cells", f"ivf_cell={c}", "*.parquet"))))
    if not paths:
        return pa.table({id_column: pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    candidates = ray.data.read_parquet(paths)
    return knn_bruteforce(candidates, query, k=k, id_column=id_column,
                          embedding_column=embedding_column,
                          exclude_ids=exclude_ids)


def nearest_neighbor_join(ds, id_column: str = "vec_id",
                          embedding_column: str = "embedding",
                          col_block: int = 65536):
    """KNN self-join, k=1: every vector gets its single nearest
    neighbour (cosine) among all OTHER vectors — the semantic-dedup
    candidate step. Ranking uses the fixed-point score
    ``floor(cos*1e6+0.5)`` with id-ascending tie-break so the
    distributed result is totally ordered and oracle-identical to
    the SQL ``QUALIFY row_number() = 1`` form.

    Shape mirrors :func:`embedding_near_dup_exact`: the normalized
    corpus broadcasts once through the object store, each batch
    probes it slab-wise (``col_block`` columns at a time, bounded
    memory) keeping one running (best score, best id) pair per row —
    O(n^2) compute is the operator's definition; beyond
    broadcast-sized corpora use the IVF index and probe per cell.
    Returns a Dataset of (id, nn_id, cosine_e6)."""
    import ray

    ids_parts, mat_parts = [], []
    for batch in ds.select_columns([id_column, embedding_column]) \
            .iter_batches(batch_format="pyarrow"):
        if batch.num_rows:
            ids_parts.append(
                batch[id_column].combine_chunks()
                .to_numpy(zero_copy_only=False).astype(np.int64))
            mat_parts.append(_batch_matrix(batch[embedding_column])
                             .astype(np.float64))
    empty = pa.table({id_column: pa.array([], pa.int64()),
                      "nn_id": pa.array([], pa.int64()),
                      "cosine_e6": pa.array([], pa.int64())})
    if not ids_parts:
        return ray.data.from_arrow(empty)
    all_ids = np.concatenate(ids_parts)
    all_m = _normalize(np.concatenate(mat_parts))
    handle = ray.put((all_ids, all_m))

    def probe(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        ids_r, m_r = ray.get(handle)
        m = _normalize(_batch_matrix(batch[embedding_column])
                       .astype(np.float64))
        ids = batch[id_column].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        best = np.full(n, np.iinfo(np.int64).min, np.int64)
        best_id = np.full(n, np.iinfo(np.int64).max, np.int64)
        for clo in range(0, len(ids_r), col_block):
            chi = min(clo + col_block, len(ids_r))
            e6 = np.floor(m @ m_r[clo:chi].T * 1e6 + 0.5) \
                .astype(np.int64)
            # a row never matches itself
            e6[ids[:, None] == ids_r[None, clo:chi]] = \
                np.iinfo(np.int64).min
            j = np.argmax(e6, axis=1)
            cand = e6[np.arange(n), j]
            cand_id = ids_r[clo + j]
            # ties inside the slab: argmax takes the first = lowest
            # id only if ids_r is sorted; resolve explicitly
            tie = e6 == cand[:, None]
            cand_id = np.where(
                tie.any(axis=1),
                np.min(np.where(tie, ids_r[None, clo:chi],
                                np.iinfo(np.int64).max), axis=1),
                cand_id)
            upd = (cand > best) | ((cand == best) & (cand_id < best_id))
            best = np.where(upd, cand, best)
            best_id = np.where(upd, cand_id, best_id)
        ok = best > np.iinfo(np.int64).min
        return pa.table({
            id_column: pa.array(ids[ok], pa.int64()),
            "nn_id": pa.array(best_id[ok], pa.int64()),
            "cosine_e6": pa.array(best[ok], pa.int64()),
        })

    return ds.map_batches(probe, batch_format="pyarrow",
                          zero_copy_batch=True)


def embedding_gram(ds, embedding_column: str = "embedding",
                   scale: int = 10 ** 6):
    """Fixed-point second-moment (Gram) matrix of an embedding
    column — the statistic behind whitening / PCA in embedding-based
    curation (SemDeDup-style pipelines): ``G[i, j] = sum over vectors
    of q(v_i) * q(v_j)`` with ``q(x) = floor(x * scale + 0.5)``
    int64 quantization (round-half-up, the same tie rule as SQL
    ``floor(x * scale + 0.5)`` — NOT banker's rounding). All-integer
    accumulation: NO float summation order anywhere, so DuckDB
    reproduces every entry bit-for-bit.

    Shape: each block reduces to ONE d x d int64 matmul partial
    (``M.T @ M``, exact integer arithmetic) merged additively by
    Ray's aggregate tree — the shuffle carries d^2 numbers per block
    regardless of block size. NULL embeddings drop (SQL: unnest of
    NULL emits no rows). Pick ``scale`` so ``n_vectors *
    (v_max * scale)^2 < 2^63``. Returns a driver pyarrow Table
    ``(i, j, sxy_fp)`` with 1-based dims, sorted — d^2-sized by
    construction."""
    from ray.data.aggregate import AggregateFn

    def quantize(col) -> np.ndarray:
        m = _batch_matrix(col).astype(np.float64)
        # a NULL ELEMENT inside a vector quantizes to 0 — exactly
        # SQL's NULL-skip: a null xi nulls its products, which the
        # SQL sum skips, the same as adding zero
        np.nan_to_num(m, copy=False)
        return np.floor(m * scale + 0.5).astype(np.int64)

    def acc_block(acc, block: pa.Table):
        col = block[embedding_column]
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        if not valid.any():
            return acc
        q = quantize(col.filter(pa.array(valid)))
        g = q.T @ q
        return g if acc is None else acc + g

    agg = AggregateFn(
        init=lambda k: None,
        accumulate_block=acc_block,
        merge=lambda a, b: (b if a is None
                            else a if b is None else a + b),
        name="gram")
    res = ds.aggregate(agg)
    g = res["gram"] if res else None
    if g is None:
        return pa.table({"i": pa.array([], pa.int64()),
                         "j": pa.array([], pa.int64()),
                         "sxy_fp": pa.array([], pa.int64())})
    d = g.shape[0]
    ii, jj = np.divmod(np.arange(d * d, dtype=np.int64), d)
    return pa.table({"i": pa.array(ii + 1),
                     "j": pa.array(jj + 1),
                     "sxy_fp": pa.array(g.ravel())})


def embedding_dim_stats(ds, embedding_column: str = "embedding",
                        scale: int = 10 ** 6):
    """Per-DIMENSION mean / variance of an embedding column — the
    feature-normalization statistic (whitening diagonals, dead-dim
    detection) next to :func:`embedding_gram`'s full second-moment
    matrix. Same fixed-point discipline: every element quantizes to
    ``floor(x * scale + 0.5)`` int64, so the per-dim sufficient
    statistics (n, sum, sum-of-squares) accumulate as exact integers
    (per-block int64, merged in arbitrary-precision Python ints ==
    SQL HUGEINT) and the ONLY float work is the finish's mirrored
    ``mean = (S/scale)/n`` and ``var = (n*SS - S^2)/n/n/scale^2``
    expressions — population variance, matching the SQL twin exactly.

    Shape: each block reduces to THREE d-length integer vectors
    merged additively by Ray's aggregate tree — d*3 numbers per
    block on the wire regardless of block size; no shuffle of
    row-sized data. NULL embeddings drop; a NULL ELEMENT drops from
    ITS dimension only (SQL ``WHERE x IS NOT NULL`` after unnest).
    Mixed embedding widths raise. Returns a driver pyarrow Table
    (dim, n, mean_e6, var_e6) with 1-based dims — d-sized by
    construction."""
    import math

    from ray.data.aggregate import AggregateFn

    def acc_block(acc, block: pa.Table):
        col = block[embedding_column]
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        if not valid.any():
            return acc
        m = _batch_matrix(col.filter(pa.array(valid))) \
            .astype(np.float64)
        nanmask = np.isnan(m)
        q = np.floor(np.nan_to_num(m) * scale + 0.5).astype(np.int64)
        q[nanmask] = 0
        part = ((~nanmask).sum(0, dtype=np.int64).tolist(),
                q.sum(0, dtype=np.int64).tolist(),
                (q * q).sum(0, dtype=np.int64).tolist())
        if acc is None:
            return part
        if len(acc[0]) != len(part[0]):
            raise ValueError(
                f"mixed embedding widths: {len(acc[0])} vs "
                f"{len(part[0])}")
        return tuple([x + y for x, y in zip(a, b)]
                     for a, b in zip(acc, part))

    def merge(a, b):
        if a is None:
            return b
        if b is None:
            return a
        if len(a[0]) != len(b[0]):
            raise ValueError(
                f"mixed embedding widths: {len(a[0])} vs {len(b[0])}")
        return tuple([x + y for x, y in zip(p, q)]
                     for p, q in zip(a, b))

    agg = AggregateFn(init=lambda k: None,
                      accumulate_block=acc_block,
                      merge=merge, name="dimstats")
    res = ds.aggregate(agg)
    st = res["dimstats"] if res else None
    if st is None:
        return pa.table({"dim": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64()),
                         "mean_e6": pa.array([], pa.int64()),
                         "var_e6": pa.array([], pa.int64())})
    ns, ss, sss = st
    dims, out_n, means, vars_ = [], [], [], []
    for i, (n, s, ss2) in enumerate(zip(ns, ss, sss)):
        if n == 0:
            continue
        dims.append(i + 1)
        out_n.append(n)
        means.append(int(math.floor(
            float(s) / float(scale) / float(n) * 1e6 + 0.5)))
        num = n * ss2 - s * s      # exact python int == SQL HUGEINT
        vars_.append(int(math.floor(
            float(num) / float(n) / float(n)
            / float(scale) / float(scale) * 1e6 + 0.5)))
    return pa.table({"dim": pa.array(dims, pa.int64()),
                     "n": pa.array(out_n, pa.int64()),
                     "mean_e6": pa.array(means, pa.int64()),
                     "var_e6": pa.array(vars_, pa.int64())})


def grouped_embedding_centroids(ds, label_column: str = "label",
                                embedding_column: str = "embedding",
                                scale: int = 10 ** 6):
    """Per-label embedding centroid (class mean vector) — the
    statistic behind centroid-based curation (SemDeDup-style cluster
    pruning, IVF cell seeding, per-source embedding drift). Same
    fixed-point discipline as :func:`embedding_dim_stats`: elements
    quantize to ``floor(x * scale + 0.5)`` int64, per-(label, dim)
    counts and sums accumulate as exact integers (python-int merge ==
    SQL HUGEINT), and the single mirrored float finish is
    ``mean = (S/scale)/n``. NULL labels form their own group (SQL
    GROUP BY NULL); NULL vectors drop; a NULL element drops from its
    dimension only. Mixed widths raise.

    Shape: each block reduces to ``labels_in_block x d`` integer
    pairs merged additively through Ray's aggregate tree — never
    row-sized data; the label alphabet is assumed small (the output
    is labels x d rows). Returns a driver pyarrow Table
    (label, dim, n, mean_e6), 1-based dims."""
    import math

    from ray.data.aggregate import AggregateFn

    def acc_block(acc, block: pa.Table):
        col = block[embedding_column]
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        if not valid.any():
            return acc
        lab_arr = block[label_column].combine_chunks() \
            .filter(pa.array(valid))
        # type-stable label keys: a nullable int column must not leak
        # float NaN keys (to_numpy would promote), so null rows route
        # through an explicit mask and values decode per type
        null_rows = pc.is_null(lab_arr).to_numpy(zero_copy_only=False)
        if pa.types.is_integer(lab_arr.type):
            vals = lab_arr.fill_null(0).cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            dec = int
        else:
            vals = lab_arr.cast(pa.string()).fill_null("") \
                .to_numpy(zero_copy_only=False)
            dec = str
        m = _batch_matrix(col.filter(pa.array(valid))) \
            .astype(np.float64)
        nanmask = np.isnan(m)
        q = np.floor(np.nan_to_num(m) * scale + 0.5).astype(np.int64)
        q[nanmask] = 0
        acc = acc if acc is not None else {}

        def add(lab, rows):
            nd = (~nanmask[rows]).sum(0, dtype=np.int64).tolist()
            sd = q[rows].sum(0, dtype=np.int64).tolist()
            prev = acc.get(lab)
            if prev is None:
                acc[lab] = (nd, sd)
            elif len(prev[0]) != len(nd):
                raise ValueError("mixed embedding widths")
            else:
                acc[lab] = ([x + y for x, y in zip(prev[0], nd)],
                            [x + y for x, y in zip(prev[1], sd)])

        # labels are a small alphabet: one mask-reduce per label
        for lab in np.unique(vals[~null_rows]):
            add(dec(lab), (vals == lab) & ~null_rows)
        if null_rows.any():
            add(None, null_rows)
        return acc

    def merge(a, b):
        if a is None:
            return b
        if b is None:
            return a
        for lab, (nd, sd) in b.items():
            prev = a.get(lab)
            if prev is None:
                a[lab] = (nd, sd)
            else:
                if len(prev[0]) != len(nd):
                    raise ValueError("mixed embedding widths")
                a[lab] = ([x + y for x, y in zip(prev[0], nd)],
                          [x + y for x, y in zip(prev[1], sd)])
        return a

    agg = AggregateFn(init=lambda k: None,
                      accumulate_block=acc_block,
                      merge=merge, name="centroids")
    res = ds.aggregate(agg)
    st = res["centroids"] if res else None
    if not st:
        return pa.table({"label": pa.array([], pa.int64()),
                         "dim": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64()),
                         "mean_e6": pa.array([], pa.int64())})
    labels, dims, out_n, means = [], [], [], []
    for lab in sorted(st, key=lambda v: (v is None, v)):
        nd, sd = st[lab]
        for i, (n, s) in enumerate(zip(nd, sd)):
            if n == 0:
                continue
            labels.append(lab)
            dims.append(i + 1)
            out_n.append(int(n))
            means.append(int(math.floor(
                float(s) / float(scale) / float(n) * 1e6 + 0.5)))
    return pa.table({"label": pa.array(labels),
                     "dim": pa.array(dims, pa.int64()),
                     "n": pa.array(out_n, pa.int64()),
                     "mean_e6": pa.array(means, pa.int64())})


def kmeans_fixed_point(ds, k: int = 4, n_iter: int = 3,
                       id_column: str = "vec_id",
                       embedding_column: str = "embedding",
                       scale: int = 1_000_000):
    """Distributed EXACT Lloyd's k-means over the whole corpus, in
    e-``scale`` fixed-point integers — deterministic, float-order
    free, and bit-reproducible in SQL ``//`` arithmetic (the same
    all-integer iterative discipline as graph.py pagerank/HITS).

    Semantics (mirrored by the generated SQL twin):
    - quantize once: ``xq = floor(float64(x) * scale + 0.5)`` int64;
    - init: the quantized vectors of the ``k`` smallest ids;
    - each iteration assigns every point to the argmin
      squared-distance centroid (ties -> smallest cluster index,
      np.argmin == SQL ``ORDER BY dist, cl``), then recomputes each
      centroid as the truncated integer mean (DuckDB ``//``
      truncates toward zero; mirrored via sign * (|s| // n));
      clusters that go empty keep their previous centroid.

    Scale shape: the quantized corpus materializes ONCE (object
    store, never the driver — graph.py's edge-list precedent); each
    iteration is ONE map_batches pass emitting a single
    ``k x d + k``-integer partial row per block, merged on the
    driver in arbitrary-precision Python ints (== SQL HUGEINT). The
    broadcast is centroid-sized via ``ray.put``. Requires
    ``scale * max|x| << 2^31`` so int64 gram terms can't wrap
    (d * (2 * scale * max|x|)^2 < 2^63).

    Returns (cluster, dim, centroid_e, n): k*d rows, dim 1-based
    (SQL ``generate_subscripts`` convention), n = final-assignment
    cluster sizes.
    """
    import ray

    if k < 1 or n_iter < 1:
        raise ValueError("kmeans_fixed_point: k, n_iter must be >= 1")

    def quantize(batch: pa.Table) -> pa.Table:
        col = batch[embedding_column]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        valid = pc.is_valid(arr)
        t = pa.table({"__id": batch[id_column], "__e": arr}) \
            .filter(valid)
        if t.num_rows == 0:
            return pa.table({"__id": pa.array([], pa.int64()),
                             "__q": pa.array([], pa.list_(pa.int64()))})
        e = t["__e"].combine_chunks()
        offs = e.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offs)
        if len(widths) and (widths != widths[0]).any():
            raise ValueError("kmeans: ragged embedding lengths")
        flat = e.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        q = np.floor(flat * scale + 0.5).astype(np.int64)
        lists = pa.ListArray.from_arrays(
            pa.array(offs - offs[0], pa.int32()), pa.array(q))
        return pa.table({"__id": t["__id"], "__q": lists})

    qds = ds.map_batches(quantize, batch_format="pyarrow",
                         zero_copy_batch=True).materialize()

    # init: k globally-smallest ids — per-block k-smallest partials,
    # driver picks among k x blocks candidate rows
    def smallest(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        idx = pc.select_k_unstable(
            batch, k, sort_keys=[("__id", "ascending")])
        return batch.take(idx)

    cand = [r for b in qds.map_batches(
                smallest, batch_format="pyarrow",
                zero_copy_batch=True).iter_batches(
                    batch_format="pyarrow")
            for r in pa.Table.from_batches(
                [b] if isinstance(b, pa.RecordBatch) else b.to_batches()
            ).to_pylist()]
    cand.sort(key=lambda r: r["__id"])
    if len(cand) < k:
        raise ValueError(f"kmeans: {len(cand)} points < k={k}")
    if len({len(c["__q"]) for c in cand}) > 1:
        raise ValueError("kmeans: ragged embedding lengths "
                         "across blocks")
    C = np.asarray([c["__q"] for c in cand[:k]], dtype=np.int64)
    d = C.shape[1]

    counts_final = [0] * k
    for _ in range(n_iter):
        handle = ray.put(C)

        def partial(batch: pa.Table, _h=handle) -> pa.Table:
            cent = ray.get(_h)
            lists = batch["__q"].combine_chunks()
            n = len(lists)
            if n == 0:
                return pa.table({
                    "sums": pa.array([], pa.list_(pa.int64())),
                    "counts": pa.array([], pa.list_(pa.int64()))})
            X = lists.flatten().to_numpy(zero_copy_only=False) \
                .reshape(n, -1)
            if X.shape[1] != cent.shape[1]:
                raise ValueError("kmeans: ragged embedding lengths "
                                 "across blocks")
            # argmin ||x - c||^2 == argmin |c|^2 - 2 x.c  (|x|^2 is
            # constant per row); all-int64, no wrap by the documented
            # scale bound
            c2 = np.einsum("kd,kd->k", cent, cent)
            score = c2[None, :] - 2 * (X @ cent.T)
            assign = np.argmin(score, axis=1)
            sums = np.zeros((k, X.shape[1]), np.int64)
            np.add.at(sums, assign, X)
            cnts = np.bincount(assign, minlength=k).astype(np.int64)
            return pa.table({
                "sums": pa.array([sums.reshape(-1)],
                                 pa.list_(pa.int64())),
                "counts": pa.array([cnts], pa.list_(pa.int64()))})

        acc_s = [[0] * d for _ in range(k)]
        acc_n = [0] * k
        for b in qds.map_batches(
                partial, batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow"):
            t = pa.Table.from_batches(
                [b] if isinstance(b, pa.RecordBatch) else b.to_batches())
            for row in t.to_pylist():
                s, cn = row["sums"], row["counts"]
                for ci in range(k):
                    acc_n[ci] += cn[ci]
                    base = ci * d
                    rowslice = s[base:base + d]
                    tgt = acc_s[ci]
                    for j in range(d):
                        tgt[j] += rowslice[j]

        newC = C.copy()
        for ci in range(k):
            n = acc_n[ci]
            if n:
                newC[ci] = [((abs(s) // n) * (1 if s >= 0 else -1))
                            for s in acc_s[ci]]
        C = newC
        counts_final = acc_n

    rows = {"cluster": [], "dim": [], "centroid_e": [], "n": []}
    for ci in range(k):
        for j in range(d):
            rows["cluster"].append(ci)
            rows["dim"].append(j + 1)
            rows["centroid_e"].append(int(C[ci, j]))
            rows["n"].append(counts_final[ci])
    return pa.table({c: pa.array(v, pa.int64())
                     for c, v in rows.items()})


def kmeans_assign_stats(ds, centroids: pa.Table,
                        id_column: str = "vec_id",
                        embedding_column: str = "embedding",
                        scale: int = 1_000_000) -> pa.Table:
    """Per-cluster assignment stats under FIXED centroids (the
    ``(cluster, dim, centroid_e, ...)`` table
    :func:`kmeans_fixed_point` returns): cluster sizes and the EXACT
    integer inertia (sum of squared fixed-point distances) — the
    convergence/quality diagnostic a mixture pipeline reads before
    trusting the clustering.

    Scale shape: ONE map_batches scan; each block emits a single
    3k-integer partial row (counts + inertia split into hi/lo 32-bit
    int64 halves, the grouped_corr overflow discipline — a block's
    raw int64 distance sum can wrap at ~4e4 rows x d=64). Driver
    folds python ints (== SQL HUGEINT). Ties and quantization follow
    kmeans_fixed_point exactly.
    """
    import ray

    ct = centroids.sort_by([("cluster", "ascending"),
                            ("dim", "ascending")])
    k = len(pc.unique(ct["cluster"]))
    d = ct.num_rows // k
    C = ct["centroid_e"].to_numpy(zero_copy_only=False) \
        .astype(np.int64).reshape(k, d)
    handle = ray.put(C)

    def partial(batch: pa.Table) -> pa.Table:
        cent = ray.get(handle)
        col = batch[embedding_column]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        arr = arr.drop_null()
        n = len(arr)
        empty = pa.table({
            "counts": pa.array([], pa.list_(pa.int64())),
            "hi": pa.array([], pa.list_(pa.int64())),
            "lo": pa.array([], pa.list_(pa.int64()))})
        if n == 0:
            return empty
        flat = arr.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        X = np.floor(flat * scale + 0.5).astype(np.int64) \
            .reshape(n, -1)
        if X.shape[1] != cent.shape[1]:
            raise ValueError("kmeans: embedding width differs from "
                             "the centroid table's dim count")
        c2 = np.einsum("kd,kd->k", cent, cent)
        score = c2[None, :] - 2 * (X @ cent.T)
        assign = np.argmin(score, axis=1)
        x2 = np.einsum("nd,nd->n", X, X)
        dist = x2 + score[np.arange(n), assign]
        kk = cent.shape[0]
        cnts = np.bincount(assign, minlength=kk).astype(np.int64)
        mask = np.uint64(0xFFFFFFFF)
        du = dist.astype(np.uint64)
        hi = np.zeros(kk, np.int64)
        lo = np.zeros(kk, np.int64)
        np.add.at(hi, assign, (du >> np.uint64(32)).astype(np.int64))
        np.add.at(lo, assign, (du & mask).astype(np.int64))
        return pa.table({"counts": pa.array([cnts],
                                            pa.list_(pa.int64())),
                         "hi": pa.array([hi], pa.list_(pa.int64())),
                         "lo": pa.array([lo], pa.list_(pa.int64()))})

    acc_n = [0] * k
    acc_i = [0] * k
    for b in ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        t = pa.Table.from_batches(
            [b] if isinstance(b, pa.RecordBatch) else b.to_batches())
        for row in t.to_pylist():
            for ci in range(k):
                acc_n[ci] += row["counts"][ci]
                acc_i[ci] += (row["hi"][ci] << 32) + row["lo"][ci]

    return pa.table({
        "cluster": pa.array(range(k), pa.int64()),
        "n": pa.array(acc_n, pa.int64()),
        "inertia": pa.array(acc_i, pa.int64()),
    })


def embedding_cross_pairs(ds_query, ds_ref, threshold: float = 0.45,
                          id_column: str = "vec_id",
                          embedding_column: str = "embedding",
                          col_block: int = 65536):
    """Thresholded cosine pairs ACROSS two corpora — the
    train/test split-leakage gate at embedding granularity: every
    (query, ref) pair with cosine >= threshold, e.g. eval items
    whose near-twin sits in the training split (the embedding
    analogue of dedup.cross_jaccard_join).

    Shape: the REF side (the smaller split by convention) is
    gathered and broadcast once via ``ray.put``; the query side
    streams, each batch computing its rows x ref similarity
    slab-wise (``col_block`` ref columns at a time, bounded memory).
    No ordering constraint — sides are distinct by construction, so
    every cross pair emits exactly once from its query row.
    """
    import ray

    def _valid_rows(batch: pa.Table) -> pa.Table:
        # a null embedding contributes ZERO flat values, silently
        # misaligning ids with the matrix rows — drop null rows first
        keep = pc.and_(pc.is_valid(batch[id_column]),
                       pc.is_valid(batch[embedding_column]))
        return batch.filter(keep)

    ids_parts, mat_parts = [], []
    for batch in ds_ref.select_columns([id_column, embedding_column]) \
            .iter_batches(batch_format="pyarrow"):
        batch = _valid_rows(batch)
        if batch.num_rows:
            ids_parts.append(np.asarray(batch[id_column].to_pylist(),
                                        dtype=np.int64))
            mat_parts.append(_batch_matrix(batch[embedding_column])
                             .astype(np.float64))
    empty = pa.table({"id_q": pa.array([], pa.int64()),
                      "id_r": pa.array([], pa.int64()),
                      "cosine": pa.array([], pa.float64())})
    if not ids_parts:
        return ray.data.from_arrow(empty)
    ids_r_all = np.concatenate(ids_parts)
    m_r_all = _normalize(np.concatenate(mat_parts))
    handle = ray.put((ids_r_all, m_r_all))

    def probe(batch: pa.Table) -> pa.Table:
        ids_r, m_r = ray.get(handle)
        batch = _valid_rows(batch)
        if batch.num_rows == 0:
            return empty
        m = _normalize(_batch_matrix(batch[embedding_column])
                       .astype(np.float64))
        ids = np.asarray(batch[id_column].to_pylist(), dtype=np.int64)
        out_q, out_r, out_c = [], [], []
        for clo in range(0, len(ids_r), col_block):
            chi = min(clo + col_block, len(ids_r))
            sims = m @ m_r[clo:chi].T
            ri, ci = np.nonzero(sims >= threshold)
            out_q.extend(ids[ri].tolist())
            out_r.extend(ids_r[clo + ci].tolist())
            out_c.extend(sims[ri, ci].tolist())
        return pa.table({"id_q": pa.array(out_q, pa.int64()),
                         "id_r": pa.array(out_r, pa.int64()),
                         "cosine": pa.array(out_c, pa.float64())})

    return ds_query.map_batches(probe, batch_format="pyarrow",
                                zero_copy_batch=True)


def embedding_quantization_stats(ds, embedding_column: str = "embedding",
                                 scale: int = 10 ** 6,
                                 levels: int = 254):
    """Per-dimension int8-style scalar quantization audit: min/max
    calibration range plus the quantized-code sum and the total
    absolute reconstruction error a ``levels``-level uniform
    quantizer (the int8 ANN-compression standard) would incur.
    Entirely integer-exact: elements quantize to ``floor(x * scale +
    0.5)`` int64 first, the code is ``((xi-mn)*levels*2 + rng) //
    (2*rng)`` (round-half-up on exact rationals) and the
    reconstruction ``mn + (code*rng*2 + levels) // (2*levels)`` —
    all operands non-negative so ``//`` == SQL ``//`` == floor,
    making the audit hash-exact against a DuckDB twin.

    Shape: two block-reduced passes over a materialized input (the
    calibration min/max must exist before coding; the embedding
    table is the corpus's small side). Each pass ships d-length
    integer vectors per block — never row-sized data. NULL
    embeddings drop; NULL elements drop from their dimension only.
    Constant dims (rng == 0) code to 0 with 0 error. Returns a
    driver pyarrow Table (dim 1-based, mn_e6, mx_e6, q_sum,
    abs_err_e6) — d-sized by construction."""
    from ray.data.aggregate import AggregateFn

    ds = ds.materialize()
    imin, imax = np.iinfo(np.int64).min, np.iinfo(np.int64).max

    def acc_range(acc, block: pa.Table):
        col = block[embedding_column]
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        if not valid.any():
            return acc
        m = _batch_matrix(col.filter(pa.array(valid))) \
            .astype(np.float64)
        nanmask = np.isnan(m)
        q = np.floor(np.nan_to_num(m) * scale + 0.5).astype(np.int64)
        lo = np.where(nanmask, imax, q).min(0)
        hi = np.where(nanmask, imin, q).max(0)
        part = (lo.tolist(), hi.tolist())
        if acc is None:
            return part
        if len(acc[0]) != len(part[0]):
            raise ValueError(
                f"mixed embedding widths: {len(acc[0])} vs "
                f"{len(part[0])}")
        return ([min(x, y) for x, y in zip(acc[0], part[0])],
                [max(x, y) for x, y in zip(acc[1], part[1])])

    def merge_range(a, b):
        if a is None:
            return b
        if b is None:
            return a
        return ([min(x, y) for x, y in zip(a[0], b[0])],
                [max(x, y) for x, y in zip(a[1], b[1])])

    res = ds.aggregate(AggregateFn(init=lambda k: None,
                                   accumulate_block=acc_range,
                                   merge=merge_range, name="qrange"))
    rng_st = res["qrange"] if res else None
    empty = pa.table({"dim": pa.array([], pa.int64()),
                      "mn_e6": pa.array([], pa.int64()),
                      "mx_e6": pa.array([], pa.int64()),
                      "q_sum": pa.array([], pa.int64()),
                      "abs_err_e6": pa.array([], pa.int64())})
    if rng_st is None:
        return empty
    mn = np.array(rng_st[0], np.int64)
    mx = np.array(rng_st[1], np.int64)
    dead = mn > mx                    # no valid value in the dim
    mn = np.where(dead, 0, mn)
    mx = np.where(dead, 0, mx)
    rng = mx - mn

    def acc_code(acc, block: pa.Table):
        col = block[embedding_column]
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        if not valid.any():
            return acc
        m = _batch_matrix(col.filter(pa.array(valid))) \
            .astype(np.float64)
        nanmask = np.isnan(m)
        xi = np.floor(np.nan_to_num(m) * scale + 0.5).astype(np.int64)
        xi = np.where(nanmask, mn, xi)      # null element -> 0 code
        safe = np.maximum(rng, 1)
        code = ((xi - mn) * (2 * levels) + rng) // (2 * safe)
        code = np.where(rng > 0, code, 0)
        deq = mn + (code * rng * 2 + levels) // (2 * levels)
        err = np.abs(xi - deq)
        err = np.where(nanmask, 0, err)
        code = np.where(nanmask, 0, code)
        part = (code.sum(0, dtype=np.int64).tolist(),
                err.sum(0, dtype=np.int64).tolist())
        if acc is None:
            return part
        return tuple([x + y for x, y in zip(a, b)]
                     for a, b in zip(acc, part))

    def merge_code(a, b):
        if a is None:
            return b
        if b is None:
            return a
        return tuple([x + y for x, y in zip(p, q)]
                     for p, q in zip(a, b))

    res2 = ds.aggregate(AggregateFn(init=lambda k: None,
                                    accumulate_block=acc_code,
                                    merge=merge_code, name="qcode"))
    st = res2["qcode"] if res2 else None
    if st is None:
        return empty
    d = len(mn)
    return pa.table({
        "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
        "mn_e6": pa.array(mn),
        "mx_e6": pa.array(mx),
        "q_sum": pa.array(np.array(st[0], np.int64)),
        "abs_err_e6": pa.array(np.array(st[1], np.int64))})
