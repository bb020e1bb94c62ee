"""Regression / symbolic analytics (operators/regress.py): worked
examples for the per-bucket least-squares fit, lag correlation, SAX
symbolization and seasonal-naive residuals. Cross-engine bit-exactness
is covered by the driver gate (trend_fit_1h / tool_lag_corr /
sax_symbols / seasonal_naive_1h oracles)."""

from __future__ import annotations

import datetime as dt
import math

from streamevmon_spark.operators.regress import (
    sax_symbols,
    seasonal_naive,
    tool_lag_corr,
    trend_fit,
)

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp_ntz, value double"
)


def _rows(conv, vals, step_s=60, tool="t", start=None):
    start = start or dt.datetime(2024, 1, 1, 0, 0)
    return [
        (conv, i, "user", "x", tool, start + dt.timedelta(seconds=i * step_s), v)
        for i, v in enumerate(vals)
    ]


# ---------------------------------------------------------------------------
# trend_fit
# ---------------------------------------------------------------------------


def test_trend_fit_linear_series(spark):
    """A perfectly linear series recovers its slope and extrapolation.

    value = 10 + 0.1 * t_seconds sampled every 60 s within one hour:
    slope_per_s == 0.1 exactly (µs quantization is exact at these
    values), predict at horizon 600 s from bucket start == 10 + 60."""
    vals = [10.0 + 0.1 * (60 * i) for i in range(60)]
    df = spark.createDataFrame(_rows("c1", vals), SCHEMA)
    out = trend_fit(df, "1h", horizon_s=600).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n == 60
    assert math.isclose(r.slope_per_s, 0.1, rel_tol=1e-12)
    assert math.isclose(r.predict, 70.0, rel_tol=1e-12)


def test_trend_fit_degenerate_null(spark):
    """n == 1 and zero-time-spread buckets yield NULL slope/predict."""
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    df = spark.createDataFrame(
        [
            ("c1", 0, "user", "x", "t", t0, 5.0),
            # second bucket: two points with the SAME timestamp
            ("c2", 0, "user", "x", "t", t0, 1.0),
            ("c2", 1, "user", "x", "t", t0, 2.0),
        ],
        SCHEMA,
    )
    rows = {r.conv_id: r for r in trend_fit(df, "1h").collect()}
    assert rows["c1"].slope_per_s is None and rows["c1"].predict is None
    assert rows["c2"].n == 2
    assert rows["c2"].slope_per_s is None  # den == 0


def test_trend_fit_excludes_lossy(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    df = spark.createDataFrame(
        [
            ("c1", 0, "user", "x", "t", t0, 1.0),
            ("c1", 1, "user", "x", "t", t0 + dt.timedelta(seconds=60), None),
            ("c1", 2, "user", "x", "t", t0 + dt.timedelta(seconds=120), 3.0),
        ],
        SCHEMA,
    )
    r = trend_fit(df, "1h").collect()[0]
    assert r.n == 2
    # two points (0s, 1.0) and (120s, 3.0): slope = 2/120
    assert math.isclose(r.slope_per_s, 2.0 / 120.0, rel_tol=1e-12)


# ---------------------------------------------------------------------------
# tool_lag_corr
# ---------------------------------------------------------------------------


def test_tool_lag_corr_perfect(spark):
    """tool 'b' copies tool 'a' shifted one hour -> r == 1.0 at lag 1."""
    rows = []
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    counts = [3, 1, 4, 1, 5]
    for h, c in enumerate(counts):
        for i in range(c):
            rows.append(
                ("c1", 0, "user", "x", "a",
                 t0 + dt.timedelta(hours=h, seconds=i), 1.0)
            )
        for i in range(c):  # same count, one hour later
            rows.append(
                ("c1", 0, "user", "x", "b",
                 t0 + dt.timedelta(hours=h + 1, seconds=i), 1.0)
            )
    df = spark.createDataFrame(rows, SCHEMA)
    out = {(r.tool_a, r.tool_b): r for r in tool_lag_corr(df, "1h", 1).collect()}
    r = out[("a", "b")]
    assert r.n_buckets == 5
    assert math.isclose(r.corr, 1.0, rel_tol=1e-12)


def test_tool_lag_corr_constant_null(spark):
    """A constant count series has zero variance -> NULL corr."""
    rows = []
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    for h in range(4):
        rows.append(("c1", 0, "user", "x", "a", t0 + dt.timedelta(hours=h), 1.0))
        rows.append(("c1", 0, "user", "x", "b", t0 + dt.timedelta(hours=h + 1), 1.0))
    df = spark.createDataFrame(rows, SCHEMA)
    out = {(r.tool_a, r.tool_b): r for r in tool_lag_corr(df, "1h", 1).collect()}
    assert out[("a", "b")].corr is None


# ---------------------------------------------------------------------------
# sax_symbols
# ---------------------------------------------------------------------------


def test_sax_constant_series_all_c(spark):
    df = spark.createDataFrame(_rows("c1", [7.0] * 16), SCHEMA)
    out = sax_symbols(df, n_segments=4).collect()
    assert len(out) == 4
    assert all(r.sym == "c" and r.z == 0.0 for r in out)
    assert all(r.n_pts == 4 for r in out)


def test_sax_step_series_symbols(spark):
    """First half 0, second half 100 over 4 segments: PAA z-scores are
    -1/+1 (population std 50) -> symbols d for high, a for low."""
    df = spark.createDataFrame(_rows("c1", [0.0] * 8 + [100.0] * 8), SCHEMA)
    out = {r.seg: r for r in sax_symbols(df, n_segments=4).collect()}
    assert [out[i].sym for i in range(4)] == ["a", "a", "d", "d"]
    assert math.isclose(out[0].z, -1.0, rel_tol=1e-12)
    assert math.isclose(out[3].z, 1.0, rel_tol=1e-12)


def test_sax_short_series_fewer_segments(spark):
    """n < n_segments emits n segments (PAA index map is still exact)."""
    df = spark.createDataFrame(_rows("c1", [1.0, 2.0, 3.0]), SCHEMA)
    out = sax_symbols(df, n_segments=8).collect()
    assert len(out) == 3
    assert sorted(r.seg for r in out) == [0, 2, 5]  # k*8 div 3


# ---------------------------------------------------------------------------
# seasonal_naive
# ---------------------------------------------------------------------------


def test_seasonal_naive_day_over_day(spark):
    """48 hourly buckets: second day = first day + 60 -> every joined
    bucket is anomalous at threshold 50 with residual exactly 60."""
    rows = []
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    for h in range(48):
        base = 10.0 if h < 24 else 70.0
        rows.append(("c1", h, "user", "x", "t",
                     t0 + dt.timedelta(hours=h), base))
    df = spark.createDataFrame(rows, SCHEMA)
    out = seasonal_naive(df, "1h", season_buckets=24, threshold=50.0).collect()
    assert len(out) == 24
    assert all(r.residual == 60.0 and r.is_anom for r in out)


def test_seasonal_naive_quiet_not_flagged(spark):
    rows = []
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    for h in range(30):
        rows.append(("c1", h, "user", "x", "t",
                     t0 + dt.timedelta(hours=h), 10.0 + (h % 3)))
    df = spark.createDataFrame(rows, SCHEMA)
    out = seasonal_naive(df, "1h", season_buckets=24, threshold=50.0).collect()
    assert len(out) == 6
    assert all(not r.is_anom for r in out)


# ---------------------------------------------------------------------------
# activity_acf
# ---------------------------------------------------------------------------


def test_activity_acf_periodic(spark):
    """Period-2 count series [1,5,1,5,...]: ACF at lag 2 is +1, at
    lag 1 it is -1 (pairs alternate perfectly)."""
    rows = []
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    for h in range(8):
        c = 1 if h % 2 == 0 else 5
        for i in range(c):
            rows.append(("c1", 0, "user", "x", "a",
                         t0 + dt.timedelta(hours=h, seconds=i), 1.0))
    df = spark.createDataFrame(rows, SCHEMA)
    out = {r.lag: r for r in
           __import__("streamevmon_spark.operators.regress",
                      fromlist=["activity_acf"]).activity_acf(
               df, "1h", max_lag=3).collect()}
    assert math.isclose(out[2].acf, 1.0, rel_tol=1e-12)
    assert math.isclose(out[1].acf, -1.0, rel_tol=1e-12)
    assert out[2].n_buckets == 6 and out[1].n_buckets == 7


# ---------------------------------------------------------------------------
# theilsen_daily
# ---------------------------------------------------------------------------


def test_theilsen_linear_recovers_slope(spark):
    """Hourly averages exactly linear in the hour index: every pairwise
    slope equals the true slope, so the median does too."""
    from streamevmon_spark.operators.regress import theilsen_daily

    rows = []
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    for h in range(6):
        rows.append(("c1", h, "user", "x", "t",
                     t0 + dt.timedelta(hours=h), 10.0 + 3.6 * h))
    df = spark.createDataFrame(rows, SCHEMA)
    out = theilsen_daily(df, "1h").collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_pairs == 15  # C(6,2)
    assert math.isclose(r.slope_per_s, 3.6 / 3600.0, rel_tol=1e-12)


def test_theilsen_robust_to_outlier_hour(spark):
    """One wild hour among five linear ones barely moves the median
    slope (the OLS fit would be dragged far off)."""
    from streamevmon_spark.operators.regress import theilsen_daily

    rows = []
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    vals = [10.0, 13.6, 17.2, 500.0, 24.4, 28.0]  # hour 3 is an outlier
    for h, v in enumerate(vals):
        rows.append(("c1", h, "user", "x", "t",
                     t0 + dt.timedelta(hours=h), v))
    df = spark.createDataFrame(rows, SCHEMA)
    r = theilsen_daily(df, "1h").collect()[0]
    true = 3.6 / 3600.0
    assert abs(r.slope_per_s - true) < 0.2 * true


def test_theilsen_single_hour_day_absent(spark):
    from streamevmon_spark.operators.regress import theilsen_daily

    df = spark.createDataFrame(
        [("c1", 0, "user", "x", "t", dt.datetime(2024, 1, 1), 5.0)],
        SCHEMA,
    )
    assert theilsen_daily(df, "1h").count() == 0
