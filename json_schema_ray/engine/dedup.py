"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard verification, embedding-cosine near-dup.

Scale shapes:

- exact: hash-partition shuffle on the content key (groupby), keep
  the first (min id) per group — the only stage that must co-locate
  equal keys.
- MinHash+LSH: per-batch signature computation is stateless numpy
  (shingle -> 64 minhashes via one permutation family), banding turns
  each doc into ``n_bands`` (band_hash, doc) pairs, a groupby on
  band_hash buckets candidates; only bucket members are pairwise
  verified (n-gram Jaccard), so nothing quadratic ever touches the
  full corpus.
- SimHash: 64-bit signature per doc from token hashes; candidate
  pairs via banding on signature quarters.
- embedding cosine: see ``similarity.py`` — near-dup reuses its
  bucketing.
"""

from __future__ import annotations

import itertools
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..state.sketches import hash_strings

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_groups(ds, content_keys: List[str], id_column: str):
    """One row per distinct content key: the kept (minimum) id and the
    duplicate count. Pre-aggregates per block before the shuffle."""

    def pre(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(batch.select(content_keys + [id_column]),
                            content_keys)
        t = g.aggregate([(id_column, "min"), ([], "count_all")])
        names = {f"{id_column}_min": "keep_id", "count_all": "n_copies"}
        return t.rename_columns(
            [names.get(c, c) for c in t.column_names])

    partial = ds.map_batches(pre, batch_format="pyarrow",
                             zero_copy_batch=True)
    from ray.data.aggregate import Min, Sum

    result = partial.groupby(content_keys).aggregate(
        Min("keep_id", alias_name="keep_id"),
        Sum("n_copies", alias_name="n_copies"),
    )
    return result


def exact_dedup(ds, content_keys: List[str], id_column: str):
    """The deduplicated survivors (full rows whose id is the keeper)."""
    import ray

    groups = exact_dedup_groups(ds, content_keys, id_column)
    keep_ids = set()
    for batch in groups.iter_batches(batch_format="pyarrow"):
        keep_ids.update(batch["keep_id"].to_pylist())
    handle = ray.put(keep_ids)

    def keep(batch: pa.Table) -> pa.Table:
        ids = ray.get(handle)
        mask = pc.is_in(batch[id_column], value_set=pa.array(list(ids)))
        return batch.filter(pc.fill_null(mask, False))

    return ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True)


# ---------------------------------------------------------------------------
# shingling + minhash
# ---------------------------------------------------------------------------

def shingle_set(text: str, k: int = 5) -> np.ndarray:
    """Word k-gram shingle hashes (uint64)."""
    words = text.split()
    if len(words) < k:
        shingles = [" ".join(words)] if words else []
    else:
        shingles = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    return np.unique(hash_strings(shingles)) if shingles else \
        np.zeros(0, dtype=np.uint64)


_MERSENNE = np.uint64((1 << 61) - 1)


class MinHasher:
    """n_perm universal-hash minhash family; coefficients derived
    deterministically from a seed, built once per actor."""

    def __init__(self, n_perm: int = 64, seed: int = 42, shingle_k: int = 5):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, (1 << 61) - 1, size=n_perm, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, size=n_perm, dtype=np.uint64)
        self.n_perm = n_perm
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = shingle_set(text, self.shingle_k)
        if len(sh) == 0:
            return np.full(self.n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (n_perm, n_shingles) universal hashing mod Mersenne prime
        x = sh.astype(np.uint64) % _MERSENNE
        h = (np.multiply.outer(self.a, x) + self.b[:, None]) % _MERSENNE
        return h.min(axis=1)


class MinHashBander:
    """map_batches actor: text -> (band_idx, band_hash, id) rows."""

    def __init__(self, id_column: str, text_column: str = "text",
                 n_perm: int = 64, n_bands: int = 16, seed: int = 42,
                 shingle_k: int = 5):
        self.hasher = MinHasher(n_perm, seed, shingle_k)
        self.id_column = id_column
        self.text_column = text_column
        self.n_bands = n_bands
        self.rows_per_band = n_perm // n_bands

    def _band_hashes(self, sig: np.ndarray) -> np.ndarray:
        """Mix each band's rows into one uint64 with splitmix rounds
        (pure numpy — no string round-trips)."""
        from ..state.sketches import hash_ints

        m = sig.reshape(self.n_bands, self.rows_per_band)
        acc = np.full(self.n_bands, 0xCBF29CE484222325, dtype=np.uint64)
        for j in range(self.rows_per_band):
            acc = hash_ints(acc ^ m[:, j])
        return acc

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, bands, hashes = [], [], []
        band_range = list(range(self.n_bands))
        for doc_id, text in zip(batch[self.id_column].to_pylist(),
                                batch[self.text_column].to_pylist()):
            if text is None:
                continue
            sig = self.hasher.signature(text)
            bh = self._band_hashes(sig)
            ids.extend([doc_id] * self.n_bands)
            bands.extend(band_range)
            hashes.extend(bh.tolist())
        return pa.table({
            "band": pa.array(bands, pa.int32()),
            "band_hash": pa.array(hashes, pa.uint64()),
            self.id_column: pa.array(ids),
        })


def ngram_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact word-k-gram Jaccard similarity (the verify step)."""
    a, b = shingle_set(text_a, k), shingle_set(text_b, k)
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


def minhash_lsh_candidates(ds, id_column: str, text_column: str = "text",
                           n_perm: int = 64, n_bands: int = 16,
                           seed: int = 42, shingle_k: int = 5,
                           concurrency: Optional[int] = None):
    """Candidate duplicate pairs: docs sharing any LSH band bucket.
    Returns a Dataset of (id_a, id_b) with id_a < id_b, deduplicated."""
    bands = ds.map_batches(
        MinHashBander,
        fn_constructor_kwargs=dict(id_column=id_column,
                                   text_column=text_column,
                                   n_perm=n_perm, n_bands=n_bands,
                                   seed=seed, shingle_k=shingle_k),
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency or (1, 4))

    # Find collided buckets via an aggregate (no per-group python),
    # then pull ONLY their members. Collided buckets are sparse by
    # assumption — near-duplicates are the exception, not the rule —
    # so the member pull and driver-side pairing stay small even when
    # the corpus is huge.
    import ray

    bands = bands.materialize()
    counts = bands.groupby(["band", "band_hash"]).count()

    def hot_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch["count()"], 1))

    hot = _collect(counts.map_batches(hot_only, batch_format="pyarrow"))
    if hot is None:
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64())}))
    hot_keys = set(zip(hot["band"].to_pylist(), hot["band_hash"].to_pylist()))
    hot_handle = ray.put(hot_keys)

    def members(batch: pa.Table) -> pa.Table:
        keys = ray.get(hot_handle)
        mask = [(b, h) in keys for b, h in
                zip(batch["band"].to_pylist(), batch["band_hash"].to_pylist())]
        return batch.filter(pa.array(mask, pa.bool_()))

    mem = _collect(bands.map_batches(members, batch_format="pyarrow"))
    buckets: dict = {}
    if mem is not None:
        for b, h, i in zip(mem["band"].to_pylist(),
                           mem["band_hash"].to_pylist(),
                           mem[id_column].to_pylist()):
            buckets.setdefault((b, h), []).append(i)
    pairs = set()
    for ids in buckets.values():
        for a, b in itertools.combinations(sorted(ids), 2):
            pairs.add((a, b))
    out = sorted(pairs)
    return ray.data.from_arrow(pa.table({
        "id_a": pa.array([p[0] for p in out], pa.int64()),
        "id_b": pa.array([p[1] for p in out], pa.int64()),
    }))


def minhash_dedup_pairs(ds, id_column: str, text_column: str = "text",
                        threshold: float = 0.7, shingle_k: int = 5,
                        **lsh_kwargs) -> pa.Table:
    """Full near-dup pipeline: LSH candidates -> exact n-gram Jaccard
    verification against the threshold. Text for candidate ids only is
    broadcast to the verify stage. Returns (id_a, id_b, jaccard)."""
    import ray

    candidates = minhash_lsh_candidates(ds, id_column, text_column,
                                        shingle_k=shingle_k, **lsh_kwargs)
    cand_table = _collect(candidates)
    if cand_table is None or cand_table.num_rows == 0:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    needed = set(cand_table["id_a"].to_pylist()) | set(cand_table["id_b"].to_pylist())
    texts = {}
    needed_handle = ray.put(needed)

    def collect_texts(batch: pa.Table) -> pa.Table:
        want = ray.get(needed_handle)
        mask = pc.is_in(batch[id_column], value_set=pa.array(list(want)))
        return batch.filter(pc.fill_null(mask, False)) \
            .select([id_column, text_column])

    for batch in ds.map_batches(collect_texts, batch_format="pyarrow",
                                zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        for i, t in zip(batch[id_column].to_pylist(),
                        batch[text_column].to_pylist()):
            texts[i] = t

    rows = []
    for a, b in zip(cand_table["id_a"].to_pylist(),
                    cand_table["id_b"].to_pylist()):
        j = ngram_jaccard(texts.get(a, ""), texts.get(b, ""), shingle_k)
        if j >= threshold:
            rows.append({"id_a": a, "id_b": b, "jaccard": j})
    rows.sort(key=lambda r: (r["id_a"], r["id_b"]))
    if not rows:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    return pa.Table.from_pylist(rows)


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit SimHash over token hashes, vectorized per document."""

    def __init__(self, id_column: str, text_column: str = "text"):
        self.id_column = id_column
        self.text_column = text_column
        self.bits = np.arange(64, dtype=np.uint64)

    def signature(self, text: str) -> int:
        tokens = text.split()
        if not tokens:
            return 0
        h = hash_strings(tokens)
        # (n_tokens, 64) bit matrix -> column sums
        bits = ((h[:, None] >> self.bits) & np.uint64(1)).astype(np.int64)
        votes = bits.sum(axis=0) * 2 - len(tokens)
        sig = np.uint64(0)
        for i in range(64):
            if votes[i] > 0:
                sig |= np.uint64(1) << np.uint64(i)
        return int(sig)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t) if t is not None else 0
                for t in batch[self.text_column].to_pylist()]
        return pa.table({
            self.id_column: batch[self.id_column],
            "simhash": pa.array(sigs, pa.uint64()),
        })


def simhash_signatures(ds, id_column: str, text_column: str = "text",
                       concurrency: Optional[int] = None):
    return ds.map_batches(
        SimHasher,
        fn_constructor_kwargs=dict(id_column=id_column,
                                   text_column=text_column),
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency or (1, 4))


def simhash_candidates(ds, id_column: str, text_column: str = "text",
                       max_hamming: int = 3):
    """Near-dup candidates: equal 16-bit signature quarters bucket
    docs (any pair within hamming distance 3 shares a quarter)."""
    sigs = simhash_signatures(ds, id_column, text_column)

    def explode(batch: pa.Table) -> pa.Table:
        ids, quarters, values = [], [], []
        for i, s in zip(batch[id_column].to_pylist(),
                        batch["simhash"].to_pylist()):
            for q in range(4):
                ids.append(i)
                quarters.append(q)
                values.append((s >> (16 * q)) & 0xFFFF)
        return pa.table({
            "quarter": pa.array(quarters, pa.int8()),
            "value": pa.array(values, pa.int32()),
            id_column: pa.array(ids),
        })

    import ray

    exploded = sigs.map_batches(explode, batch_format="pyarrow") \
        .materialize()
    counts = exploded.groupby(["quarter", "value"]).count()

    def hot_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch["count()"], 1))

    hot = _collect(counts.map_batches(hot_only, batch_format="pyarrow"))
    if hot is None:
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64())}))
    hot_keys = set(zip(hot["quarter"].to_pylist(), hot["value"].to_pylist()))
    hot_handle = ray.put(hot_keys)

    def members(batch: pa.Table) -> pa.Table:
        keys = ray.get(hot_handle)
        mask = [(q, v) in keys for q, v in
                zip(batch["quarter"].to_pylist(), batch["value"].to_pylist())]
        return batch.filter(pa.array(mask, pa.bool_()))

    mem = _collect(exploded.map_batches(members, batch_format="pyarrow"))
    buckets: dict = {}
    if mem is not None:
        for q, v, i in zip(mem["quarter"].to_pylist(),
                           mem["value"].to_pylist(),
                           mem[id_column].to_pylist()):
            buckets.setdefault((q, v), []).append(i)
    pairs = set()
    for ids in buckets.values():
        for a, b in itertools.combinations(sorted(ids), 2):
            pairs.add((a, b))
    out = sorted(pairs)
    return ray.data.from_arrow(pa.table({
        "id_a": pa.array([p[0] for p in out], pa.int64()),
        "id_b": pa.array([p[1] for p in out], pa.int64()),
    }))


def _collect(ds) -> Optional[pa.Table]:
    tables = [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
              for b in ds.iter_batches(batch_format="pyarrow")]
    tables = [t for t in tables if t.num_rows]
    if not tables:
        return None
    return pa.concat_tables(tables, promote_options="default")
