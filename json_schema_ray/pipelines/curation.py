"""End-to-end training-data curation — the workflow the operator
families exist for, composed into one pipeline:

    read -> quality gate -> exact dedup -> near-dup cluster removal
         -> benchmark decontamination -> train/val/test split
         -> sequence packing -> partitioned parquet + summary

Every stage is one of the engine's individually-tested operators
(quality: text.QualityScore actor pool; exact: dedup.exact_dedup;
near-dup: dedup.minhash_dedup_pairs + connected_components;
decontamination: dedup.build_ngram_blocklist + ngram_containment;
split: relational.split_assign; packing: window.pack_items) — this
module only composes and counts them. Stage survivors are
materialized into the object store between filters so each stage's
upstream runs once (at 10^12 docs the counts would instead fold into
the resume manifest; the composition is otherwise scale-shaped:
broadcast sides are eval/cluster/pair-sized, never corpus-sized).

Output layout (resumable, one directory per split):

    out_dir/split=train/*.parquet   (doc_id, text, lang, n_tokens)
    out_dir/split=val/*.parquet
    out_dir/split=test/*.parquet
    out_dir/summary.json            per-stage row counts + params
    out_dir/stages/<name>/          (checkpoint=True) stage survivors
    out_dir/stages/<name>.done      marker + stage metadata, written
                                    AFTER the data; resume=True skips
                                    the intact checkpoint prefix
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def run_curation(sf_dir: str, out_dir: str,
                 quality_min: float = 0.55,
                 langs=None,
                 near_dup_threshold: float = 0.7,
                 contamination_max: float = 0.5,
                 fractions=(0.9, 0.05),
                 pack_budget: int = 512,
                 seed: int = 0,
                 checkpoint: bool = False,
                 resume: bool = False) -> dict:
    """Run the full curation pipeline over ``sf_dir``'s documents
    table; returns the summary dict (also written to
    ``out_dir/summary.json``). Deterministic: same inputs + params
    => identical survivors, splits and bins.

    ``checkpoint=True`` persists each filter stage's survivors as
    parquet under ``out_dir/stages/<name>/`` with a ``<name>.done``
    marker written only AFTER the data; ``resume=True`` then reads
    completed stages back instead of recomputing, so a killed run
    re-does at most its one in-flight stage — the stage-granular
    analogue of the validation job's per-fragment manifests."""
    import ray
    import shutil

    from ..engine.dedup import (
        build_ngram_blocklist,
        connected_components,
        exact_dedup,
        minhash_dedup_pairs,
        ngram_containment,
    )
    from ..engine.relational import split_assign
    from ..engine.text import quality_scores
    from ..engine.window import pack_items

    if resume and not checkpoint:
        raise ValueError("resume=True requires checkpoint=True "
                         "(there are no checkpoints to resume from)")

    counts = {}
    stage_meta = {}
    os.makedirs(out_dir, exist_ok=True)

    _STAGES = ["quality_gate", "exact_dedup", "near_dedup",
               "decontaminate"]
    # a checkpoint is only valid for the exact parameters and input
    # it was computed under — a resume with changed settings must
    # recompute, not silently serve stale survivors
    params_sig = json.dumps(
        [sf_dir, quality_min, sorted(langs) if langs else None,
         near_dup_threshold, contamination_max, list(fractions),
         seed], sort_keys=True)

    chain_dirty = False  # once a stage recomputes, every DOWNSTREAM
    # checkpoint is stale (it was derived from the old upstream) and
    # must be ignored — markers only short-circuit an intact prefix

    def _marker(name):
        return os.path.join(out_dir, "stages", f"{name}.done")

    def stage(name, compute):
        """Materialize a filter stage; with checkpointing, persist
        it and (on resume) read a completed stage back. ``compute``
        returns (lazy_ds, meta_dict)."""
        nonlocal chain_dirty
        sdir = os.path.join(out_dir, "stages", name)
        marker = _marker(name)
        if checkpoint and resume and not chain_dirty \
                and os.path.exists(marker) and os.path.isdir(sdir) \
                and any(f.endswith(".parquet")
                        for f in os.listdir(sdir)):
            # (an empty stage writes no parquet files and therefore
            # never short-circuits — it recomputes, which is cheap)
            with open(marker) as f:
                saved = json.load(f)
            if saved.get("__params_sig") == params_sig:
                stage_meta[name] = saved["meta"]
                # materialize so downstream consumers don't re-scan
                # the checkpoint parquet once per consumption
                return ray.data.read_parquet(sdir).materialize()
        if checkpoint and not chain_dirty:
            # first recompute of the chain: stale downstream markers
            # on DISK must die too, or a crash between stages would
            # resurrect mixed-generation checkpoints on the next run
            for later in _STAGES[_STAGES.index(name):]:
                try:
                    os.remove(_marker(later))
                except FileNotFoundError:
                    pass
        chain_dirty = True
        made, meta = compute()
        made = made.materialize()
        stage_meta[name] = meta
        if checkpoint:
            # marker dies BEFORE the data is touched: a kill during
            # write_parquet leaves partial parquet with no marker,
            # never a stale marker over partial data
            try:
                os.remove(marker)
            except FileNotFoundError:
                pass
            shutil.rmtree(sdir, ignore_errors=True)
            os.makedirs(sdir, exist_ok=True)
            made.write_parquet(sdir)
            tmp = marker + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"__params_sig": params_sig, "meta": meta},
                          f)
            os.replace(tmp, marker)
        return made

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"])
    counts["input"] = ds.count()

    # 1. quality gate (actor-pool stage: patterns compile once per
    # actor) + optional language allowlist; n_tokens rides along so
    # the packing stage never re-tokenizes
    scored = quality_scores(ds, concurrency=2)

    def quality_gate(b: pa.Table) -> pa.Table:
        keep = pc.fill_null(
            pc.greater_equal(b["quality_score"],
                             pa.scalar(float(quality_min))), False)
        if langs is not None:
            keep = pc.and_(keep, pc.fill_null(
                pc.is_in(b["lang"],
                         value_set=pa.array(list(langs))), False))
        return b.filter(keep).select(
            ["doc_id", "text", "lang", "n_tokens"])

    gated = stage(
        "quality_gate",
        lambda: (scored.map_batches(quality_gate,
                                    batch_format="pyarrow",
                                    zero_copy_batch=True), {}))
    counts["after_quality"] = gated.count()

    # 2. exact dedup on the text itself (min doc_id survives);
    # at corpus scale swap in exact_dedup_sorted (broadcast-free)
    exact = stage(
        "exact_dedup",
        lambda: (exact_dedup(gated, ["text"], "doc_id"), {}))
    counts["after_exact_dedup"] = exact.count()

    # 3. near-dup clusters: MinHash+LSH candidates, exact Jaccard
    # verify, connected components; keep each cluster's root (its
    # minimum id), drop every other member
    def near_compute():
        pairs = minhash_dedup_pairs(exact, "doc_id",
                                    threshold=near_dup_threshold)
        meta = {"near_dup_pairs": int(pairs.num_rows)}
        if not pairs.num_rows:
            return exact, meta
        comp = connected_components(pairs)
        drop = comp.filter(
            pc.invert(pc.equal(comp["id"], comp["component"])))["id"]
        handle = ray.put(drop.combine_chunks())

        def drop_members(b: pa.Table) -> pa.Table:
            d = ray.get(handle)
            return b.filter(pc.invert(pc.fill_null(
                pc.is_in(b["doc_id"], value_set=d), False)))

        return exact.map_batches(drop_members, batch_format="pyarrow",
                                 zero_copy_batch=True), meta

    near = stage("near_dedup", near_compute)
    counts["near_dup_pairs"] = stage_meta["near_dedup"][
        "near_dup_pairs"]
    counts["after_near_dedup"] = near.count()

    # 4. benchmark decontamination: the "eval set" is the
    # deterministic doc_id % 20 == 0 slice (the repo's convention);
    # docs sharing >= contamination_max of their 5-gram shingles
    # with it drop. Zero-shingle docs (NULL containment) pass.
    def eval_docs(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % 20 == 0))

    def decontaminate(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        is_eval = pa.array(ids % 20 == 0)
        clean_mask = pc.or_(
            pc.is_null(b["containment"]),
            pc.less(b["containment"],
                    pa.scalar(float(contamination_max))))
        return b.filter(pc.and_(pc.invert(is_eval),
                                pc.fill_null(clean_mask, True))) \
            .select(["doc_id", "text", "lang", "n_tokens"])

    def clean_compute():
        blocklist = build_ngram_blocklist(
            near.map_batches(eval_docs, batch_format="pyarrow",
                             zero_copy_batch=True))
        contam = ngram_containment(near, blocklist)
        return contam.map_batches(decontaminate,
                                  batch_format="pyarrow",
                                  zero_copy_batch=True), {}

    clean = stage("decontaminate", clean_compute)
    counts["after_decontamination"] = clean.count()

    # 5. deterministic split + per-split greedy packing into
    # pack_budget-token bins (n_tokens carried from the quality scan)
    with_tokens = split_assign(clean, "doc_id", list(fractions),
                               seed=seed)
    bins = pack_items(with_tokens, "split", "doc_id", "n_tokens",
                      pack_budget)
    # bins-per-split stays a DISTRIBUTED reduction (splits-sized
    # result) — never pull the per-doc bin rows to the driver
    counts["bins_per_split"] = {
        name: 0 for name in ("train", "val", "test")}
    for row in bins.groupby("split").max("bin") \
            .iter_rows():
        if row["split"] is not None:
            counts["bins_per_split"][row["split"]] = \
                int(row["max(bin)"]) + 1

    # 6. write survivors partitioned by split (resumable layout:
    # one directory per split, atomic per-fragment files)
    os.makedirs(out_dir, exist_ok=True)
    packed = with_tokens.materialize()
    for split_name in ("train", "val", "test"):
        part = os.path.join(out_dir, f"split={split_name}")

        def keep_split(b: pa.Table, s=split_name) -> pa.Table:
            return b.filter(pc.fill_null(
                pc.equal(b["split"], pa.scalar(s)), False))

        sub = packed.map_batches(keep_split, batch_format="pyarrow",
                                 zero_copy_batch=True)
        n = sub.count()
        counts.setdefault("split_rows", {})[split_name] = n
        if n:
            os.makedirs(part, exist_ok=True)
            sub.drop_columns(["split"]).write_parquet(part)

    summary = {
        "params": {"quality_min": quality_min,
                   "langs": list(langs) if langs else None,
                   "near_dup_threshold": near_dup_threshold,
                   "contamination_max": contamination_max,
                   "fractions": list(fractions),
                   "pack_budget": pack_budget, "seed": seed},
        "counts": counts,
    }
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2, sort_keys=True)
    return summary
