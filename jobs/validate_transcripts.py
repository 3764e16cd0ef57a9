"""Transcript-corpus validation job — the `ray job submit` entry.

    ray job submit -- python jobs/validate_transcripts.py \
        --input /data/transcripts --out /data/validation_run \
        [--schema schema.json] [--resume] [--profile profile.json]

Runs the resumable per-fragment validation (violations parquet +
atomic lineage manifests per input fragment — re-submitting with
--resume skips finished fragments), the fused verdict/stats scan, the
uniqueness and turn-ordering checks, and (optionally) drift against a
stored reference profile. Writes a run summary JSON and exits 0 only
when every row validated.

Owns its Ray session (guarded init), unlike the driver-contract
module; suitable for `ray job submit` on a real cluster or local runs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# invoked as a script (`python jobs/validate_transcripts.py` or via
# `ray job submit`), sys.path[0] is jobs/ — put the repo root first
# so the package imports without a PYTHONPATH; Ray workers inherit
# the driver's working_dir, and the engine ships its functions by
# closure, so this one insert covers the whole job
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True,
                        help="directory of transcript parquet fragments")
    parser.add_argument("--out", required=True, help="output directory")
    parser.add_argument("--schema", default=None,
                        help="JSON schema file (default: the canonical "
                             "transcript validation schema)")
    parser.add_argument("--resume", action="store_true",
                        help="skip fragments already recorded in the "
                             "output manifest")
    parser.add_argument("--profile", default=None,
                        help="reference profile JSON for drift checks")
    parser.add_argument("--num-cpus", type=int, default=None)
    args = parser.parse_args(argv)

    import ray

    if not ray.is_initialized():
        # workers do NOT inherit the driver's sys.path — without
        # this, every map_batches task dies with
        # ModuleNotFoundError when the job runs from outside the
        # repo (a real `ray job submit --working-dir` covers it,
        # plain `python jobs/...` does not)
        init_kwargs = dict(
            include_dashboard=False,
            runtime_env={"env_vars": {
                "PYTHONPATH": _REPO_ROOT + os.pathsep
                + os.environ.get("PYTHONPATH", "")}})
        if args.num_cpus:
            init_kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**init_kwargs)

    from json_schema_ray.engine.keys import (
        turn_ordering_violations, uniqueness_violations)
    from json_schema_ray.engine.manifest import (
        list_done_fragments, run_resumable_validation)
    from json_schema_ray.engine.validate import (
        compile_plan_for, full_validation_pass)
    from json_schema_ray.sources.transcripts import VALIDATION_SCHEMA

    schema_json = VALIDATION_SCHEMA
    if args.schema:
        with open(args.schema) as fh:
            schema_json = json.load(fh)

    if not os.path.isdir(args.input):
        sys.stderr.write(f"{args.input}: No such directory.\n")
        return 2
    files = sorted(
        os.path.join(args.input, f) for f in os.listdir(args.input)
        if f.endswith(".parquet"))
    if not files:
        sys.stderr.write(f"{args.input}: no parquet fragments found\n")
        return 2

    import pyarrow.parquet as pq

    arrow_schema = pq.read_schema(files[0])
    plan = compile_plan_for(schema_json, arrow_schema,
                            key_columns=["conv_id", "turn_idx"])

    if not args.resume:
        done = list_done_fragments(args.out)
        if done:
            sys.stderr.write(
                f"{args.out}: {len(done)} fragments already recorded; "
                "pass --resume to continue that run or choose a fresh "
                "output directory\n")
            return 2

    summary = run_resumable_validation(files, args.out, plan)

    ds = ray.data.read_parquet(files)
    fused = full_validation_pass(ds, plan, presorted=False)
    dup_rows = uniqueness_violations(
        ray.data.read_parquet(files), ["conv_id", "turn_idx"]).count()
    ordering = fused["ordering_violation_counts"]

    report = {
        "fragments": summary["fragments"],
        "fragments_skipped": summary["skipped"],
        "total_rows": fused["total_rows"],
        "valid_rows": fused["valid_rows"],
        "invalid_rows": fused["invalid_rows"],
        "violation_rows": fused["violation_rows"],
        "duplicate_keys": dup_rows,
        "ordering_violations": ordering,
        "stats": fused["stats"].to_pylist(),
    }

    if args.profile:
        from json_schema_ray.engine.drift import ReferenceProfile

        with open(args.profile) as fh:
            prof = ReferenceProfile.from_json(fh.read())
        drift = prof.compare(ray.data.read_parquet(files))
        report["drift"] = drift.to_pylist()

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "summary.json"), "w") as fh:
        json.dump(report, fh, indent=2, default=str)

    clean = (fused["invalid_rows"] == 0 and dup_rows == 0
             and sum(ordering.values()) == 0)
    print(json.dumps({k: report[k] for k in
                      ("total_rows", "valid_rows", "invalid_rows",
                       "duplicate_keys", "ordering_violations")}))
    ray.shutdown()
    return 0 if clean else 1


if __name__ == "__main__":
    sys.exit(main())
