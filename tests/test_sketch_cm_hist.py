"""Count-min sketches (operators/cmsketch.py) and fixed-le latency
histograms (operators/histo.py): hand-computed worked examples, the
one-sided-error invariant, and the SUM-mergeability invariant.
Cross-engine bit-exactness is covered by the driver gate
(cm_topk_1h / cm_topk_1d_merged / hist_quantile_1h /
hist_quantile_1d_merged oracles)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from streamevmon_spark.operators.cmsketch import (
    DEPTH,
    WIDTH,
    cm_counters,
    cm_heavy_hitters,
    cm_merge_counters,
)
from streamevmon_spark.operators.histo import (
    LE_US,
    N_BUCKETS,
    hist_counters,
    hist_merge_counters,
    hist_quantiles,
    hist_summary,
)

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp_ntz, value double"
)


def _t(minute: int, second: int = 0, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, hour, minute, second)


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _turns(conv: str, n: int, hour: int = 0):
    """n turns of one conversation inside one hour bucket."""
    return [
        (conv, i, "user", "x", "t", _t(i % 60, 0, hour + i // 60), 1.0)
        for i in range(n)
    ]


# ---------------------------------------------------------------------------
# count-min
# ---------------------------------------------------------------------------


def test_cm_counters_total_mass(spark):
    """Every row of the sketch holds the full count mass: sum of
    counters per (bucket, rw) == number of input rows in that bucket."""
    df = _mk(spark, _turns("a", 7) + _turns("b", 3))
    per_row = (
        cm_counters(df, "1h")
        .groupBy("w_us", "rw")
        .agg(F.sum("cnt").alias("mass"))
        .collect()
    )
    assert len(per_row) == DEPTH
    assert all(r.mass == 10 for r in per_row)


def test_cm_estimate_one_sided_and_exact_without_collision(spark):
    """est >= exact always; with 2 keys in a 4x256 sketch a collision in
    ALL 4 rows is (1/256)^4-improbable and the fixed md5 hashes make it
    deterministic — assert est == exact for this worked example."""
    df = _mk(spark, _turns("a", 7) + _turns("b", 3))
    rows = {r.conv_id: r for r in cm_heavy_hitters(df, "1h", k=5).collect()}
    assert rows["a"].est >= rows["a"].exact_cnt
    assert rows["a"].est == 7 and rows["a"].exact_cnt == 7
    assert rows["b"].est == 3 and rows["b"].exact_cnt == 3
    assert rows["a"].rank == 1 and rows["b"].rank == 2


def test_cm_merge_equals_direct(spark):
    """SUM-merged 1h->1d counter state is row-identical to the sketch
    built directly from raw at 1d."""
    df = _mk(spark, _turns("a", 5, hour=1) + _turns("b", 4, hour=20))
    merged = cm_merge_counters(cm_counters(df, "1h"), "1h", "1d")
    direct = cm_counters(df, "1d")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_cm_topk_truncates_and_tiebreaks(spark):
    """k=1 keeps only the hottest key; ties on est break by key ASC."""
    df = _mk(spark, _turns("a", 4) + _turns("b", 4) + _turns("c", 2))
    rows = cm_heavy_hitters(df, "1h", k=1).collect()
    assert len(rows) == 1
    assert rows[0].conv_id == "a" and rows[0].rank == 1


# ---------------------------------------------------------------------------
# fixed-le histograms
# ---------------------------------------------------------------------------


def _lat_rows(conv: str, gaps_s: list[int]):
    """One conversation whose successive inter-turn gaps are gaps_s."""
    rows, t = [], dt.datetime(2024, 1, 1, 0, 0, 0)
    rows.append((conv, 0, "user", "x", "t", t, 1.0))
    for i, g in enumerate(gaps_s, start=1):
        t = t + dt.timedelta(seconds=g)
        rows.append((conv, i, "user", "x", "t", t, 1.0))
    return rows


def test_hist_counters_worked_example(spark):
    """Gaps 0.5s, 5s, 90s land in le buckets 0 (<=1s), 1 (<=10s),
    2 (<=60s is exceeded -> bucket 2 means <=300s... recompute):
    bounds are [1s, 10s, 60s, 300s, 1800s, 7200s, 86400s]; 90s -> first
    bound >= 90s is 300s = index 3."""
    rows, t = [], dt.datetime(2024, 1, 1, 0, 0, 0)
    rows.append(("a", 0, "user", "x", "t", t, 1.0))
    for i, g_us in enumerate([500_000, 5_000_000, 90_000_000], start=1):
        t = t + dt.timedelta(microseconds=g_us)
        rows.append(("a", i, "user", "x", "t", t, 1.0))
    got = {
        r.le_idx: r.cnt
        for r in hist_counters(_mk(spark, rows), "1h").collect()
    }
    assert got == {0: 1, 1: 1, 3: 1}


def test_hist_overflow_bucket(spark):
    """A gap beyond the last bound (1d) lands in the overflow bucket,
    and the quantile for it returns the last finite bound (Prometheus
    semantics)."""
    df = _mk(spark, _lat_rows("a", [2 * 86_400]))
    cnt = hist_counters(df, "1d").collect()
    assert len(cnt) == 1 and cnt[0].le_idx == N_BUCKETS - 1
    summ = hist_summary(hist_counters(df, "1d")).collect()
    # both observations' quantiles clamp to the last finite le bound
    assert all(r.p95_us == float(LE_US[-1]) for r in summ)


def test_hist_quantile_interpolation_worked_example(spark):
    """4 latencies all in bucket 0 (le 1s): p50 target = 0.5*4 = 2, c0=4
    covers it, interpolation = 0 + 1e6 * (2 - 0)/4 = 500000.0."""
    df = _mk(spark, _lat_rows("a", [1, 1, 1, 1]))
    r = hist_quantiles(df, "1h").collect()[0]
    assert r.total == 4 and r.c0 == 4
    assert r.p50_us == 500_000.0
    assert r.p95_us == 0 + 1_000_000 * (0.95 * 4 - 0) / 4


def test_hist_merge_equals_direct(spark):
    """SUM-merged 1h->1d histogram state == direct-from-raw 1d state,
    including across hour boundaries."""
    rows = _lat_rows("a", [5, 3600, 5, 7200, 30])
    df = _mk(spark, rows)
    merged = hist_merge_counters(hist_counters(df, "1h"), "1h", "1d")
    direct = hist_counters(df, "1d")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_hist_first_turn_excluded(spark):
    """A single-turn conversation contributes no latency observation."""
    df = _mk(spark, [("solo", 0, "user", "x", "t", _t(0), 1.0)])
    assert hist_counters(df, "1h").count() == 0
