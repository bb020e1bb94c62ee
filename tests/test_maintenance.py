"""Retention expiry + partition compaction over a pipeline store
(plans/maintenance.py): tier-differentiated age-out with manifest
tombstones, idempotence, time-travel degradation after expiry, and the
row-preserving atomic compaction rewrite."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from streamevmon_spark.data.transcripts import load_transcripts
from streamevmon_spark.plans.maintenance import (
    compact_partitions,
    run_maintenance,
)
from streamevmon_spark.plans.manifest import load_manifest
from streamevmon_spark.plans.pipeline import (
    latest_snapshot,
    read_rollup,
    read_rollup_as_of,
    run_pipeline,
)

BUCKET = 7 * 86400  # weekly buckets


@pytest.fixture(scope="module")
def store(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("maint") / "store")
    df = load_transcripts(spark, sf_dir)
    m = run_pipeline(
        spark, df, out, input_path=sf_dir, tiers=("1m", "1d"),
        bucket_s=BUCKET,
    )
    assert all(p.status == "done" for p in m.partitions)
    return out, m


def _read_sorted(spark, out, tier):
    return (
        read_rollup(spark, out, tier)
        .toPandas()
        .sort_values(
            ["conv_id", "tool", "role", "window_start"],
            ignore_index=True,
        )
    )


def test_expiry_is_tier_differentiated_and_idempotent(spark, store):
    out, m = store
    parts = sorted(m.partitions, key=lambda p: p.start_us)
    assert len(parts) >= 3, "fixture needs several weekly buckets"
    # expire the oldest bucket for 1m only: now = end of bucket 0 plus
    # exactly one retention window
    ret = {"1m": 1 * BUCKET, "1d": None}
    now_us = parts[0].end_us + BUCKET * 1_000_000
    before_1d = _read_sorted(spark, out, "1d")
    res = run_maintenance(spark, out, now_us, retention_s=ret)
    assert res["expired"] == {"1m": [parts[0].part_id]}
    assert not os.path.exists(
        os.path.join(out, "rollup_1m", parts[0].part_id)
    )
    assert os.path.exists(
        os.path.join(out, "rollup_1d", parts[0].part_id)
    )
    # live 1m read excludes the expired bucket; 1d untouched
    start0_us = parts[0].end_us
    live = _read_sorted(spark, out, "1m")
    ws_us = (
        pd.to_datetime(live["window_start"]).astype("int64") // 1000
    )
    assert (ws_us >= start0_us).all()
    pd.testing.assert_frame_equal(_read_sorted(spark, out, "1d"), before_1d)
    # idempotent: same clock, nothing more to do, no new log entry
    m2 = load_manifest(out)
    n_log = len(m2.maintenance)
    res2 = run_maintenance(spark, out, now_us, retention_s=ret)
    assert res2 == {"expired": {}, "compacted": {}}
    assert len(load_manifest(out).maintenance) == n_log


def test_as_of_read_degrades_after_expiry(spark, store):
    out, m = store
    parts = sorted(m.partitions, key=lambda p: p.start_us)
    snap = latest_snapshot(out)
    # an as-of read across ALL snapshots no longer includes the expired
    # (1m, bucket0) pair — and does not raise on the deleted path
    asof = read_rollup_as_of(spark, out, "1m", snap).toPandas()
    ws_us = pd.to_datetime(asof["window_start"]).astype("int64") // 1000
    assert (ws_us >= parts[0].end_us).all()
    # 1d history is fully reproducible
    asof_1d = read_rollup_as_of(spark, out, "1d", snap)
    assert asof_1d.count() == read_rollup(spark, out, "1d").count()


def test_compaction_preserves_rows_and_reduces_files(spark, store):
    out, _ = store
    m = load_manifest(out)  # re-read: earlier tests expired a bucket
    live_part = next(
        p for p in sorted(m.partitions, key=lambda q: q.start_us)
        if "1m" not in p.expired_tiers
    )
    d = os.path.join(out, "rollup_1m", live_part.part_id)

    def n_files():
        return len(
            [f for f in os.listdir(d)
             if f.startswith("part-") and f.endswith(".parquet")]
        )

    before = _read_sorted(spark, out, "1m")
    if n_files() <= 1:
        # force fragmentation so the rewrite has work to do
        spark.read.parquet(d).repartition(4).write.mode(
            "overwrite"
        ).parquet(d + ".__frag")
        os.rename(d, d + ".__orig")
        os.rename(d + ".__frag", d)
        import shutil

        shutil.rmtree(d + ".__orig")
        assert n_files() > 1
        pd.testing.assert_frame_equal(_read_sorted(spark, out, "1m"), before)
    res = compact_partitions(spark, out, target_files=1)
    assert live_part.part_id in res.get("1m", [])
    assert n_files() == 1
    pd.testing.assert_frame_equal(_read_sorted(spark, out, "1m"), before)
    # second pass: nothing left to compact
    assert compact_partitions(spark, out, target_files=1) == {}


def test_maintenance_requires_manifest(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        run_maintenance(spark, str(tmp_path / "nope"), 0)


def test_compaction_crash_recovery(spark, store):
    out, _ = store
    m = load_manifest(out)
    live_part = next(
        p for p in sorted(m.partitions, key=lambda q: q.start_us)
        if "1m" not in p.expired_tiers
    )
    d = os.path.join(out, "rollup_1m", live_part.part_id)
    before = _read_sorted(spark, out, "1m")
    # simulate a crash between the two renames: live dir gone, data
    # parked in '*.__compact_old', a stale tmp dir also present
    os.rename(d, d + ".__compact_old")
    os.makedirs(d + ".__compact_tmp", exist_ok=True)
    assert not os.path.isdir(d)
    compact_partitions(spark, out, target_files=1)
    # recovery restored the live dir (then compacted it as usual);
    # stray dirs are gone and no rows were lost
    assert os.path.isdir(d)
    assert not os.path.exists(d + ".__compact_old")
    assert not os.path.exists(d + ".__compact_tmp")
    pd.testing.assert_frame_equal(_read_sorted(spark, out, "1m"), before)


def test_expiry_tombstones_persist_before_compaction(spark, sf_dir, tmp_path):
    # run_maintenance must save the tombstoned manifest right after the
    # dirs are deleted, even if compaction later fails — otherwise a
    # crash leaves manifest rows pointing at missing paths
    out = str(tmp_path / "store")
    df = load_transcripts(spark, sf_dir)
    m = run_pipeline(
        spark, df, out, input_path=sf_dir, tiers=("1m",), bucket_s=BUCKET
    )
    parts = sorted(m.partitions, key=lambda p: p.start_us)
    now_us = parts[0].end_us + BUCKET * 1_000_000

    import streamevmon_spark.plans.maintenance as maint

    orig = maint.compact_partitions

    def boom(*a, **k):
        raise RuntimeError("simulated compaction crash")

    maint.compact_partitions = boom
    try:
        with pytest.raises(RuntimeError):
            maint.run_maintenance(
                spark, out, now_us, retention_s={"1m": BUCKET},
                compact_target_files=1,
            )
    finally:
        maint.compact_partitions = orig
    # the on-disk manifest already carries the tombstone, so reads skip
    # the deleted path instead of raising
    m2 = load_manifest(out)
    p0 = next(p for p in m2.partitions if p.part_id == parts[0].part_id)
    assert "1m" in p0.expired_tiers
    read_rollup(spark, out, "1m").count()  # must not raise
