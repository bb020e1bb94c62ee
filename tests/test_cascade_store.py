"""Incremental continuous-aggregate refresh (plans/cascade_store.py):
append-then-refresh must equal a full rebuild bit-for-bit, the refresh
must touch ONLY the day-partitions overlapped by new snapshot ranges,
and the watermark must make re-refresh a no-op."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from streamevmon_spark.data.transcripts import load_transcripts
from streamevmon_spark.operators.rollup import rollup_tiers_cascade_exact
from streamevmon_spark.plans.cascade_store import (
    DAY_US,
    read_cascade,
    refresh_cascade,
    run_cascade_store,
)
from streamevmon_spark.plans.manifest import load_manifest

BUCKET_S = 216_000  # 60 h: 1d windows straddle bucket boundaries


def _sorted(df):
    return df.toPandas().sort_values(
        ["conv_id", "tool", "role", "window_start"], ignore_index=True
    )


@pytest.fixture(scope="module")
def stores(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("casc")
    df = load_transcripts(spark, sf_dir)
    inc = str(base / "incremental")
    # phase 1: first 4 buckets, refresh; phase 2: the rest, refresh
    m1 = run_cascade_store(
        spark, df, inc, input_path=sf_dir, bucket_s=BUCKET_S,
        stop_after=4, sketches=True, hll=True,
    )
    assert sum(p.status == "done" for p in m1.partitions) == 4
    phase1 = {t: _sorted(read_cascade(spark, inc, t)) for t in ("1h", "1d")}
    m2 = run_cascade_store(
        spark, df, inc, input_path=sf_dir, bucket_s=BUCKET_S,
        sketches=True, hll=True,
    )
    assert all(p.status == "done" for p in m2.partitions)
    return df, inc, phase1


def test_incremental_equals_full_rebuild(spark, stores):
    df, inc, _ = stores
    full = rollup_tiers_cascade_exact(df)
    try:
        for tier in ("1h", "1d"):
            got = _sorted(read_cascade(spark, inc, tier))
            exp = _sorted(full[tier])
            pd.testing.assert_frame_equal(got, exp)
    finally:
        for s in full["_state"]:
            s.unpersist()


def test_straddling_windows_actually_merged(stores):
    # sanity of the fixture itself: with 60 h buckets some 1d windows
    # span two snapshots, so phase-2 must have REVISED rows phase 1 had
    # already emitted (not only appended new ones) — the merge path ran
    df, inc, phase1 = stores
    m = load_manifest(inc)
    p1d = phase1["1d"].set_index(["conv_id", "tool", "role", "window_start"])
    assert len(p1d) > 0
    # at least one phase-1 1d row belongs to a day overlapping bucket 4+
    boundary_us = sorted(p.start_us for p in m.partitions)[4]
    revised_days = {boundary_us // DAY_US}
    ws_us = (
        pd.to_datetime(
            p1d.index.get_level_values("window_start")
        ).astype("int64")
        // 1000
    )
    assert (ws_us // DAY_US).isin(revised_days).any()


def test_refresh_touches_only_affected_days(spark, sf_dir, tmp_path):
    df = load_transcripts(spark, sf_dir)
    out = str(tmp_path / "store")
    run_cascade_store(
        spark, df, out, input_path=sf_dir, bucket_s=BUCKET_S,
        stop_after=4,
    )
    m = load_manifest(out)
    last_day_done = max(
        p.end_us for p in m.partitions if p.status == "done"
    ) // DAY_US
    root = os.path.join(out, "cascade_1h")
    untouched = {
        d: os.path.getmtime(os.path.join(root, d))
        for d in os.listdir(root)
        if d.startswith("__cday=")
        and int(d.split("=")[1]) < last_day_done - 1
    }
    assert untouched, "fixture needs settled early days"
    run_cascade_store(
        spark, df, out, input_path=sf_dir, bucket_s=BUCKET_S
    )
    for d, mtime in untouched.items():
        assert os.path.getmtime(os.path.join(root, d)) == mtime, (
            f"refresh rewrote settled day-partition {d}"
        )


def test_refresh_watermark_noop(spark, stores):
    _, inc, _ = stores
    m_before = load_manifest(inc)
    logs = {t: len(m_before.cascade[t]["log"]) for t in ("1h", "1d")}
    res = refresh_cascade(spark, inc)
    assert res == {"1h": [], "1d": []}
    m_after = load_manifest(inc)
    for t in ("1h", "1d"):
        assert len(m_after.cascade[t]["log"]) == logs[t]


def test_incremental_sketches_equal_batch_twin(spark, stores):
    # the two-phase, watermark-driven sketch tier must be BIT-identical
    # (same blobs) to the one-shot batch path sketch_tier -> cascade:
    # both build 1m digests from the same per-window multiset in
    # canonical sorted order and merge blobs in canonical sorted order,
    # so partitioning/phasing must not leak into the bytes
    from streamevmon_spark.operators.sketch_rollup import (
        cascade_sketches,
        sketch_tier,
    )
    from streamevmon_spark.plans.cascade_store import read_sketch_cascade

    df, inc, _ = stores
    fine = sketch_tier(df, "1m").localCheckpoint()
    for tier in ("1h", "1d"):
        exp = cascade_sketches(fine, tier).toPandas()
        got = read_sketch_cascade(spark, inc, tier).toPandas()
        key = ["conv_id", "tool", "role", "window_start_us"]
        exp = exp.sort_values(key, ignore_index=True)
        got = got.sort_values(key, ignore_index=True)
        pd.testing.assert_frame_equal(
            got[key], exp[key], check_dtype=False
        )
        assert [bytes(b) for b in got["latency_tdigest"]] == [
            bytes(b) for b in exp["latency_tdigest"]
        ], f"sketch blobs diverge at tier {tier}"


def test_sketch_refresh_watermark_noop(spark, stores):
    from streamevmon_spark.plans.cascade_store import (
        refresh_sketch_cascade,
    )

    _, inc, _ = stores
    m_before = load_manifest(inc)
    logs = {
        t: len(m_before.cascade[f"sketch_{t}"]["log"])
        for t in ("1h", "1d")
    }
    res = refresh_sketch_cascade(spark, inc)
    assert res == {"1h": [], "1d": []}
    m_after = load_manifest(inc)
    for t in ("1h", "1d"):
        assert len(m_after.cascade[f"sketch_{t}"]["log"]) == logs[t]


def test_manifest_lineage_recorded(stores):
    _, inc, _ = stores
    m = load_manifest(inc)
    for t in ("1h", "1d"):
        entry = m.cascade[t]
        assert entry["last_seq"] == max(p.seq for p in m.partitions)
        assert len(entry["log"]) == 2  # one refresh per phase
        # second refresh only covered the new snapshots' day span
        assert min(entry["log"][1]["seqs"]) > max(entry["log"][0]["seqs"])
    for p in m.partitions:
        assert p.rows_out.get("state_1m", 0) > 0
        assert p.turns_per_sec > 0
        assert p.hot_series


def test_incremental_hll_equals_direct(spark, stores):
    """Two-phase max-merged HLL register tiers == direct from-raw
    computation (the property the hll_incremental_* gate rows
    hash-prove vs DuckDB; here proved Spark-vs-Spark)."""
    from streamevmon_spark.operators.hll import (
        hll_registers,
        hll_summary,
    )
    from streamevmon_spark.plans.cascade_store import read_hll_cascade

    df, inc, _ = stores
    for tier in ("1h", "1d"):
        stored = hll_summary(read_hll_cascade(spark, inc, tier))
        direct = hll_summary(hll_registers(df, tier))
        assert stored.exceptAll(direct).count() == 0
        assert direct.exceptAll(stored).count() == 0


def test_hll_refresh_watermark_noop(spark, stores):
    from streamevmon_spark.plans.cascade_store import (
        refresh_hll_cascade,
    )

    _, inc, _ = stores
    assert refresh_hll_cascade(spark, inc) == {"1h": [], "1d": []}


def test_hll_lazy_upgrade_from_exact_state(spark, sf_dir, tmp_path):
    """A store ingested WITHOUT the HLL face upgrades in place: the
    refresh derives missing hll_1m dirs from stored exact state."""
    import os

    from streamevmon_spark.operators.hll import (
        hll_registers,
        hll_summary,
    )
    from streamevmon_spark.plans.cascade_store import (
        HLL_STATE_DIR,
        read_hll_cascade,
        refresh_hll_cascade,
    )

    df = load_transcripts(spark, sf_dir)
    out = str(tmp_path / "nohll")
    run_cascade_store(
        spark, df, out, input_path=sf_dir, bucket_s=BUCKET_S
    )
    assert not os.path.isdir(os.path.join(out, HLL_STATE_DIR))
    refresh_hll_cascade(spark, out)
    got = hll_summary(read_hll_cascade(spark, out, "1d"))
    want = hll_summary(hll_registers(df, "1d"))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_state_face_range_read_equals_raw_derived(spark, stores):
    """Mergeable state_1h/state_1d face: after a lazy upgrade on the
    (two-phase-ingested) store, a range read served from STORED tier
    rows equals the raw-derived range read bit-for-bit."""
    from streamevmon_spark.operators.tier_router import realtime_range_agg
    from streamevmon_spark.plans.cascade_store import (
        range_agg_from_store,
        read_state_tier,
        refresh_state_cascade,
    )

    df, inc, _ = stores
    ref1 = refresh_state_cascade(spark, inc)
    assert any(ref1[t] for t in ("1h", "1d"))  # upgrade materialized
    # watermark no-op on second call
    ref2 = refresh_state_cascade(spark, inc)
    assert all(ref2[t] == [] for t in ("1h", "1d"))
    for t in ("1h", "1d"):
        assert read_state_tier(spark, inc, t) is not None
    got = (
        range_agg_from_store(spark, inc)
        .toPandas()
        .sort_values(["conv_id", "tool", "role"], ignore_index=True)
    )
    exp = (
        realtime_range_agg(df)
        .toPandas()
        .sort_values(["conv_id", "tool", "role"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, exp)
