"""Event post-processing tests: multi-config FrequentEventFilter
trigger -> cooldown -> re-enable cycles (reference:
events/FrequentEventFilter.scala:81-276) and the distributed
gaps-and-islands equivalence for temporal grouping (bucket-stitched
result must be byte-identical to the single-scan result)."""

from __future__ import annotations

import datetime as dt

import pytest


def _events(spark, times_s, event_type="threshold_events", severity=100):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (
            event_type,
            "conv-0001",
            "none",
            "user",
            severity,
            base + dt.timedelta(seconds=s),
        )
        for s in times_s
    ]
    return spark.createDataFrame(
        rows, "event_type string, conv_id string, tool string, role string, "
              "severity int, ts timestamp_ntz"
    )


def _run_filter(spark, times_s, configs):
    from streamevmon_spark.operators.event_grouping import (
        frequent_event_filter,
    )

    out = frequent_event_filter(_events(spark, times_s), configs=configs)
    base = dt.datetime(2024, 1, 1)
    return sorted(
        ((r.ts - base).total_seconds(), r.event_type, r.severity)
        for r in out.collect()
    )


def test_frequent_filter_trigger_cooldown_reenable(spark):
    """One tier: count 2 / interval 60 / cooldown 120. Three quick events
    trigger a bulk at the third; a triggered-while-disabled event
    refreshes the cooldown; a quiet period re-enables pass-through."""
    got = _run_filter(
        spark, [0, 10, 20, 30, 200], configs=(("small", 2, 60, 120, 25),)
    )
    assert got == [
        (0.0, "threshold_events", 100),
        (10.0, "threshold_events", 100),
        (20.0, "bulk_threshold_events", 25),  # 3 stamps > 2 -> trigger
        # t=30: still triggered while disabled -> cooldown refreshed,
        # suppressed. t=200: 1 stamp, cooldown (30+120 < 200) expired.
        (200.0, "threshold_events", 100),
    ]


def test_frequent_filter_multi_tier_all_must_reenable(spark):
    """Two tiers trip together; pass-through resumes only after the
    slower cooldown expires."""
    cfgs = (("fast", 2, 60, 60, 25), ("slow", 2, 60, 600, 75))
    got = _run_filter(spark, [0, 5, 10, 150, 300, 700], cfgs)
    # t=10 trips BOTH tiers (two bulks); t=150: fast re-enabled
    # (10+60<150) but slow still disabled -> suppressed; t=300: slow
    # still disabled (10+600>300) -> suppressed; t=700: both re-enabled.
    assert got == [
        (0.0, "threshold_events", 100),
        (5.0, "threshold_events", 100),
        (10.0, "bulk_threshold_events", 25),
        (10.0, "bulk_threshold_events", 75),
        (700.0, "threshold_events", 100),
    ]


def test_frequent_filter_retrigger_after_reenable(spark):
    """A second burst after full re-enablement triggers a second bulk."""
    got = _run_filter(
        spark,
        [0, 10, 20, 400, 410, 420],
        configs=(("small", 2, 60, 120, 25),),
    )
    assert got == [
        (0.0, "threshold_events", 100),
        (10.0, "threshold_events", 100),
        (20.0, "bulk_threshold_events", 25),
        (400.0, "threshold_events", 100),
        (410.0, "threshold_events", 100),
        (420.0, "bulk_threshold_events", 25),
    ]


@pytest.mark.parametrize("range_s", [60, 3600])
def test_group_events_bucket_stitching_identical(spark, range_s):
    """Islands crossing coarse-bucket boundaries must stitch to the exact
    single-scan result: same global island numbering, same group ids,
    same aggregates."""
    from streamevmon_spark.operators.event_grouping import (
        group_events_temporal,
    )

    # islands: [0..8s steps 2] ; gap ; [100..130 steps 5] crossing the
    # 120s boundary when range_s=60 ; gap ; long run crossing several
    # 60s buckets with sub-interval gaps
    times = (
        [0, 2, 4, 6, 8]
        + [100, 105, 110, 115, 120, 125, 130]
        + [300 + 7 * i for i in range(40)]
    )
    ev = _events(spark, times)
    single = group_events_temporal(
        ev, max_interval_s=10, max_duration_s=120, range_s=10**9
    )
    parts = group_events_temporal(
        ev, max_interval_s=10, max_duration_s=120, range_s=range_s
    )
    rows_s = sorted(map(tuple, single.collect()))
    rows_p = sorted(map(tuple, parts.collect()))
    assert rows_s == rows_p
    # sanity: the data really does produce multiple islands and a
    # duration split of the long run (120 s cap over a 273 s run)
    assert len(rows_s) >= 5
