"""End-to-end curation pipeline (pipelines/curation.py): stage
counts are monotone non-increasing through the filters, every stage
engages on the sf0.001 corpus, the output layout is the resumable
split-partitioned one, and the whole run is deterministic."""

import json
import os

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def curation_summary(ray_session, tmp_path_factory):
    from json_schema_ray.pipelines.curation import run_curation

    out = str(tmp_path_factory.mktemp("curation"))
    summary = run_curation("/root/testdata/sf0.001", out)
    return summary, out


def test_stage_counts_monotone_and_engaged(curation_summary):
    s, _ = curation_summary
    c = s["counts"]
    assert (c["input"] >= c["after_quality"]
            >= c["after_exact_dedup"] >= c["after_near_dedup"]
            >= c["after_decontamination"])
    # every filter stage actually does something on this corpus
    assert c["after_quality"] < c["input"]
    assert c["near_dup_pairs"] > 0
    assert c["after_near_dedup"] < c["after_exact_dedup"]
    assert c["after_decontamination"] < c["after_near_dedup"]
    assert sum(c["split_rows"].values()) == c["after_decontamination"]
    assert c["bins_per_split"].keys() == c["split_rows"].keys()


def test_output_layout_and_schema(curation_summary):
    s, out = curation_summary
    assert os.path.exists(os.path.join(out, "summary.json"))
    with open(os.path.join(out, "summary.json")) as f:
        assert json.load(f)["counts"] == s["counts"]
    total = 0
    for name, n in s["counts"]["split_rows"].items():
        part = os.path.join(out, f"split={name}")
        if n == 0:
            continue
        t = pq.read_table(part)
        assert t.num_rows == n
        assert {"doc_id", "text", "lang", "n_tokens"} <= \
            set(t.column_names)
        total += t.num_rows
    assert total == s["counts"]["after_decontamination"]


def test_deterministic_rerun(curation_summary, ray_session, tmp_path):
    from json_schema_ray.pipelines.curation import run_curation

    s, _ = curation_summary
    s2 = run_curation("/root/testdata/sf0.001", str(tmp_path / "o2"))
    assert s2["counts"] == s["counts"]


def test_checkpoint_resume(curation_summary, ray_session, tmp_path):
    """Stage checkpoints: a resumed run reads completed stages back
    (identical summary, no recompute), and invalidating one marker
    recomputes that stage and everything downstream — but never the
    intact prefix."""
    from json_schema_ray.pipelines.curation import run_curation

    s, _ = curation_summary
    out = str(tmp_path / "ck")
    s1 = run_curation("/root/testdata/sf0.001", out, checkpoint=True)
    assert s1["counts"] == s["counts"]
    gate_marker = os.path.join(out, "stages", "quality_gate.done")
    near_marker = os.path.join(out, "stages", "near_dedup.done")
    t_gate = os.path.getmtime(gate_marker)
    t_near = os.path.getmtime(near_marker)

    s2 = run_curation("/root/testdata/sf0.001", out, checkpoint=True,
                      resume=True)
    assert s2["counts"] == s1["counts"]
    # nothing recomputed: markers untouched
    assert os.path.getmtime(gate_marker) == t_gate
    assert os.path.getmtime(near_marker) == t_near

    # kill the near-dedup checkpoint: it and decontaminate recompute,
    # the quality/exact prefix does not
    os.remove(near_marker)
    s3 = run_curation("/root/testdata/sf0.001", out, checkpoint=True,
                      resume=True)
    assert s3["counts"] == s1["counts"]
    assert os.path.getmtime(gate_marker) == t_gate
    assert os.path.getmtime(near_marker) > t_near


def test_checkpoint_resume_guards(curation_summary, ray_session,
                                  tmp_path):
    """Resume safety: param changes void checkpoints (no stale
    survivors under new settings), a marker over gutted data never
    short-circuits (kill-mid-write shape), and resume without
    checkpoint is an error."""
    import glob

    import pytest

    from json_schema_ray.pipelines.curation import run_curation

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "ck")
    s1 = run_curation(sf, out, checkpoint=True)

    with pytest.raises(ValueError):
        run_curation(sf, out, resume=True)

    # kill-mid-write shape: stage parquet gutted, marker left behind
    # -> the stage recomputes instead of loading the empty dir
    ddir = os.path.join(out, "stages", "decontaminate")
    for f in glob.glob(os.path.join(ddir, "*.parquet")):
        os.remove(f)
    s2 = run_curation(sf, out, checkpoint=True, resume=True)
    assert s2["counts"] == s1["counts"]
    assert glob.glob(os.path.join(ddir, "*.parquet"))

    # changed params: the signature mismatch voids EVERY checkpoint;
    # a stricter gate must produce fewer survivors, not stale ones
    s3 = run_curation(sf, out, checkpoint=True, resume=True,
                      quality_min=0.95)
    assert s3["counts"]["after_quality"] < s1["counts"]["after_quality"]
