"""Trend / alerting analytics (operators/trend.py): hand-computed
worked examples for the Holt fold, range-frame over_time windows,
for-duration alert islands, MAD medians, and activity z-scores.
Cross-engine bit-exactness is covered by the driver gate
(holt_winters / over_time_1h / alerts_for_duration / mad_outliers_1h /
activity_zscore_1h oracles)."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np

from streamevmon_spark.operators.trend import (
    activity_zscore,
    alerts_for_duration,
    holt_winters,
    holt_winters_fold,
    mad_outliers,
    over_time,
)

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp_ntz, value double"
)


def _t(minute: int, second: int = 0, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, hour, minute, second)


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _series(conv, vals, start_min=0, step_s=60):
    rows = []
    for i, v in enumerate(vals):
        ts = dt.datetime(2024, 1, 1, 0, start_min) + dt.timedelta(
            seconds=i * step_s
        )
        rows.append((conv, i, "user", "x", "t", ts, v))
    return rows


# ---------------------------------------------------------------------------
# holt_winters
# ---------------------------------------------------------------------------


def test_holt_fold_worked_example():
    """Replays the documented recurrence by hand for 3 points."""
    sf, tf = 0.5, 0.5
    x = np.array([10.0, 20.0, 10.0])
    lev, tre = holt_winters_fold(x, sf, tf)
    # k=1: s=10, b=0
    assert lev[0] == 10.0 and tre[0] == 0.0
    # k=2: s = .5*20 + .5*(10+0) = 15 ; b = .5*(15-10) + .5*0 = 2.5
    assert lev[1] == 15.0 and tre[1] == 2.5
    # k=3: s = .5*10 + .5*(15+2.5) = 13.75 ; b = .5*(13.75-15)+.5*2.5
    assert lev[2] == 13.75 and tre[2] == 0.625


def test_holt_winters_df_matches_fold(spark):
    vals = [10.0, 20.0, 15.0, 30.0]
    df = _mk(spark, _series("a", vals))
    got = {
        r.value: (r.level, r.trend)
        for r in holt_winters(df, sf=0.3, tf=0.1).collect()
    }
    lev, tre = holt_winters_fold(np.array(vals), 0.3, 0.1)
    for v, l, b in zip(vals, lev, tre):
        assert got[v] == (l, b)


def test_holt_winters_skips_lossy(spark):
    df = _mk(
        spark,
        _series("a", [10.0]) + [("a", 9, "user", "x", "t", _t(9), None)],
    )
    assert holt_winters(df).count() == 1


# ---------------------------------------------------------------------------
# over_time
# ---------------------------------------------------------------------------


def test_over_time_trailing_window(spark):
    """Points at t=0,30,90 min with range 1h: the 90-min point sees
    only t=30 and t=90 (t=0 is outside the trailing hour)."""
    rows = [
        ("a", 0, "user", "x", "t", _t(0), 10.0),
        ("a", 1, "user", "x", "t", _t(30), 20.0),
        ("a", 2, "user", "x", "t", _t(30, hour=1), 60.0),
    ]
    got = {
        r.value: r
        for r in over_time(_mk(spark, rows), range_s=3600).collect()
    }
    assert got[10.0].n_win == 1 and got[10.0].avg_win == 10.0
    assert got[20.0].n_win == 2 and got[20.0].avg_win == 15.0
    assert got[60.0].n_win == 2
    assert got[60.0].min_win == 20.0 and got[60.0].max_win == 60.0
    assert got[60.0].avg_win == 40.0


def test_over_time_window_is_per_series(spark):
    rows = [
        ("a", 0, "user", "x", "t", _t(0), 10.0),
        ("b", 0, "user", "x", "t", _t(1), 99.0),
    ]
    got = {r.value: r for r in over_time(_mk(spark, rows)).collect()}
    assert got[99.0].n_win == 1 and got[99.0].min_win == 99.0


# ---------------------------------------------------------------------------
# alerts_for_duration
# ---------------------------------------------------------------------------


def test_alerts_islands_and_for_clause(spark):
    """Run of 3 breaches spanning 10 min fires; a 1-point run and a
    run spanning only 1 min do not."""
    rows = (
        # island 1: breaches at 0, 5, 10 min (span 600 s >= 300 s)
        _series("a", [150.0, 150.0, 150.0], step_s=300)
        # below threshold breaks the run
        + [("a", 3, "user", "x", "t", _t(20), 10.0)]
        # island 2: single breach, span 0 — filtered
        + [("a", 4, "user", "x", "t", _t(25), 150.0)]
    )
    out = alerts_for_duration(
        _mk(spark, rows), threshold=100.0, for_s=300
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_points == 3 and r.duration_s == 600.0
    assert r.start_ts == _t(0) and r.end_ts == _t(10)
    assert r.fire_ts == _t(5)


def test_alerts_null_breaks_run(spark):
    rows = (
        _series("a", [150.0], step_s=300)
        + [("a", 1, "user", "x", "t", _t(5), None)]
        + [("a", 2, "user", "x", "t", _t(10), 150.0)]
    )
    # two 1-point islands, neither spans 300 s
    assert (
        alerts_for_duration(_mk(spark, rows), 100.0, 300).count() == 0
    )


# ---------------------------------------------------------------------------
# mad_outliers
# ---------------------------------------------------------------------------


def test_mad_worked_example(spark):
    """values [1,2,3,4,100]: med=3, |x-med| sorted = [0,1,1,2,97],
    mad=1, outliers(k=3): d > 3 -> only 97."""
    df = _mk(spark, _series("a", [1.0, 2.0, 3.0, 4.0, 100.0]))
    r = mad_outliers(df, "1h", k=3.0).collect()[0]
    assert r.n == 5 and r.med == 3.0 and r.mad == 1.0
    assert r.outlier_cnt == 1


def test_mad_even_count_interpolates(spark):
    """values [1,3]: idx=0.5, med = 1 + (3-1)*0.5 = 2."""
    df = _mk(spark, _series("a", [1.0, 3.0]))
    r = mad_outliers(df, "1h").collect()[0]
    assert r.med == 2.0 and r.mad == 1.0


# ---------------------------------------------------------------------------
# activity_zscore
# ---------------------------------------------------------------------------


def test_activity_zscore_worked_example(spark):
    """Three 1h buckets with counts 2,2,8 for one tool: at the third
    bucket mean=(2+2+8)/3=4, var=(4+4+64)/3-16=8, z=(8-4)/sqrt(8)."""
    rows = []
    for h, n in ((0, 2), (1, 2), (2, 8)):
        for i in range(n):
            rows.append(
                ("c%d" % i, i, "user", "x", "t", _t(i, hour=h), 1.0)
            )
    out = sorted(
        activity_zscore(_mk(spark, rows), "1h", 24).collect(),
        key=lambda r: r.bucket_start,
    )
    assert [r.c for r in out] == [2, 2, 8]
    r = out[2]
    assert r.nb == 3 and r.mean_c == 4.0
    assert r.var_c == 8.0
    assert r.zscore == (8.0 - 4.0) / math.sqrt(8.0)
    # constant window -> var 0 -> NULL z
    assert out[0].zscore is None and out[1].zscore is None
