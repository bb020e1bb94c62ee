"""Resume-from-manifest equivalence (FIXTURES.md §5): a halted+resumed
run must produce outputs identical to a single full run. Mirrors the
reference's snapshot/restore harness tests
(reference: checkpointing/NoDependencyCheckpointingTests.scala:114-209)."""

from __future__ import annotations

import json
import os

import pandas as pd

from streamevmon_spark.data.transcripts import load_transcripts
from streamevmon_spark.operators.rollup import rollup_tier
from streamevmon_spark.plans.manifest import load_manifest
from streamevmon_spark.plans.pipeline import read_rollup, run_pipeline

BUCKET = 7 * 86400  # weekly buckets: multiple of every tier window


def _read_sorted(spark, out_dir, tier):
    df = read_rollup(spark, out_dir, tier).toPandas()
    return df.sort_values(
        ["conv_id", "tool", "role", "window_start"], ignore_index=True
    )


def test_full_vs_halted_resumed(spark, sf_dir, tmp_path):
    df = load_transcripts(spark, sf_dir)
    full_dir, resume_dir = str(tmp_path / "full"), str(tmp_path / "resumed")

    m_full = run_pipeline(
        spark, df, full_dir, input_path=sf_dir, tiers=("1h",),
        bucket_s=BUCKET,
    )
    assert all(p.status == "done" for p in m_full.partitions)

    # halted run: stop after 2 buckets, then resume
    m1 = run_pipeline(
        spark, df, resume_dir, input_path=sf_dir, tiers=("1h",),
        bucket_s=BUCKET, stop_after=2,
    )
    assert sum(p.status == "done" for p in m1.partitions) == 2
    m2 = run_pipeline(
        spark, df, resume_dir, input_path=sf_dir, tiers=("1h",),
        bucket_s=BUCKET,
    )
    assert all(p.status == "done" for p in m2.partitions)
    assert m2.run_id == m1.run_id  # same manifest resumed, not replanned

    a = _read_sorted(spark, full_dir, "1h")
    b = _read_sorted(spark, resume_dir, "1h")
    pd.testing.assert_frame_equal(a, b)


def test_pipeline_equals_global_rollup(spark, sf_dir, tmp_path):
    """Bucketed+boundary-injected execution == one global rollup_tier —
    the cross-bucket lag is exact."""
    df = load_transcripts(spark, sf_dir)
    out = str(tmp_path / "p")
    run_pipeline(
        spark, df, out, input_path=sf_dir, tiers=("1h",), bucket_s=BUCKET
    )
    got = _read_sorted(spark, out, "1h")
    exp = (
        rollup_tier(df, "1h")
        .toPandas()
        .sort_values(
            ["conv_id", "tool", "role", "window_start"], ignore_index=True
        )
    )
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_manifest_metrics_recorded(spark, sf_dir, tmp_path):
    df = load_transcripts(spark, sf_dir)
    out = str(tmp_path / "m")
    run_pipeline(
        spark, df, out, input_path=sf_dir, tiers=("1h",), bucket_s=BUCKET
    )
    m = load_manifest(out)
    assert m is not None
    with open(os.path.join(out, "manifest.json")) as f:
        raw = json.load(f)
    for p in raw["partitions"]:
        assert p["status"] == "done"
        assert p["rows_in"] > 0
        assert p["turns_per_sec"] > 0
        assert len(p["hot_series"]) > 0  # skew metrics present
    total_in = sum(p["rows_in"] for p in raw["partitions"])
    assert total_in == df.count()


def test_snapshot_as_of_reads(spark, sf_dir, tmp_path):
    """Time-travel: read_rollup_as_of(k) returns exactly the buckets
    completed by snapshot k; snapshots accumulate across a halted +
    resumed run; the latest snapshot equals the full table."""
    from streamevmon_spark.plans.pipeline import (
        latest_snapshot,
        read_rollup_as_of,
        run_pipeline,
    )

    df = load_transcripts(spark, sf_dir)
    out = str(tmp_path / "snap")
    m1 = run_pipeline(
        spark, df, out, input_path=sf_dir, tiers=("1h",),
        bucket_s=BUCKET, stop_after=2,
    )
    assert latest_snapshot(out) == 2
    rows_at_1 = read_rollup_as_of(spark, out, "1h", 1).count()
    rows_at_2 = read_rollup_as_of(spark, out, "1h", 2).count()
    assert 0 < rows_at_1 < rows_at_2

    # resume completes the run; earlier snapshots keep their meaning
    run_pipeline(
        spark, df, out, input_path=sf_dir, tiers=("1h",), bucket_s=BUCKET
    )
    n = latest_snapshot(out)
    assert n == len(load_manifest(out).partitions)
    assert read_rollup_as_of(spark, out, "1h", 1).count() == rows_at_1
    assert read_rollup_as_of(spark, out, "1h", 2).count() == rows_at_2
    # as-of(latest) == the full table
    full = _read_sorted(spark, out, "1h")
    asof = (
        read_rollup_as_of(spark, out, "1h", n)
        .toPandas()
        .sort_values(
            ["conv_id", "tool", "role", "window_start"],
            ignore_index=True,
        )
    )
    pd.testing.assert_frame_equal(asof, full)
    # snapshot ids are the completion order recorded in the manifest
    seqs = sorted(p.seq for p in load_manifest(out).partitions)
    assert seqs == list(range(1, n + 1))


def test_as_of_empty_and_preseq_manifests(spark, sf_dir, tmp_path):
    """Snapshot 0 (and a run halted before its first bucket) returns an
    empty frame with the real rollup schema — no output dir needed; and
    legacy manifests whose done partitions predate seq tracking (seq=0)
    are backfilled so as-of reads still see them."""
    from streamevmon_spark.plans.manifest import save_manifest
    from streamevmon_spark.plans.pipeline import (
        ROLLUP_SCHEMA,
        latest_snapshot,
        read_rollup,
        read_rollup_as_of,
        run_pipeline,
    )

    df = load_transcripts(spark, sf_dir)
    out = str(tmp_path / "empty")
    # halt before the first bucket: manifest exists, rollup dirs don't
    run_pipeline(
        spark, df, out, input_path=sf_dir, tiers=("1h",),
        bucket_s=BUCKET, stop_after=0,
    )
    empty = read_rollup_as_of(spark, out, "1h", 0)
    assert empty.count() == 0
    # the static schema matches what the pipeline actually writes
    run_pipeline(
        spark, df, out, input_path=sf_dir, tiers=("1h",), bucket_s=BUCKET
    )
    assert empty.schema == read_rollup(spark, out, "1h").schema
    assert spark.createDataFrame([], ROLLUP_SCHEMA).schema == empty.schema

    # legacy manifest: zero out every seq; loads must backfill in
    # partition order so nothing is invisible to as-of reads
    m = load_manifest(out)
    n = len(m.partitions)
    for p in m.partitions:
        p.seq = 0
    save_manifest(out, m)
    assert latest_snapshot(out) == n
    assert (
        read_rollup_as_of(spark, out, "1h", n).count()
        == read_rollup(spark, out, "1h").count()
    )


def test_cascade_pipeline_equals_per_tier(spark, sf_dir, tmp_path):
    """cascade=True (one raw scan per bucket, 1h/1d derived from the 1m
    mergeable state) writes byte-identical rollups to the per-tier path,
    including the exact percentile columns, and resumes the same way."""
    df = load_transcripts(spark, sf_dir)
    a_dir, b_dir = str(tmp_path / "per_tier"), str(tmp_path / "cascade")
    run_pipeline(
        spark, df, a_dir, input_path=sf_dir, tiers=("1m", "1h", "1d"),
        bucket_s=BUCKET,
    )
    # cascade run halted after 1 bucket, then resumed — resume must
    # compose with the cascade topology
    m1 = run_pipeline(
        spark, df, b_dir, input_path=sf_dir, tiers=("1m", "1h", "1d"),
        bucket_s=BUCKET, stop_after=1, cascade=True,
    )
    assert sum(p.status == "done" for p in m1.partitions) == 1
    run_pipeline(
        spark, df, b_dir, input_path=sf_dir, tiers=("1m", "1h", "1d"),
        bucket_s=BUCKET, cascade=True,
    )
    for tier in ("1m", "1h", "1d"):
        pd.testing.assert_frame_equal(
            _read_sorted(spark, a_dir, tier),
            _read_sorted(spark, b_dir, tier),
        )


def test_cascade_rejects_unknown_tier(spark, sf_dir, tmp_path):
    import pytest as _pytest

    df = load_transcripts(spark, sf_dir)
    with _pytest.raises(ValueError):
        run_pipeline(
            spark, df, str(tmp_path / "x"), input_path=sf_dir,
            tiers=("5m",), bucket_s=BUCKET, cascade=True,
        )
