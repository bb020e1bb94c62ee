"""Series-level operational analytics (operators/seriesops.py):
worked examples for per-bucket top-k ranking and daily churn.
Cross-engine exactness is covered by the driver gate
(topk_series_1h / series_churn_1d oracles)."""

from __future__ import annotations

import datetime as dt

from streamevmon_spark.operators.seriesops import series_churn, topk_series

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp_ntz, value double"
)


def test_topk_orders_by_count_then_key(spark):
    rows = []
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    # conv-a: 3 turns, conv-b: 3 turns (tie -> key order), conv-c: 1
    for conv, n in (("a", 3), ("b", 3), ("c", 1)):
        for i in range(n):
            rows.append((conv, i, "user", "x", "t",
                         t0 + dt.timedelta(seconds=i), 1.0))
    df = spark.createDataFrame(rows, SCHEMA)
    out = topk_series(df, "1h", k=2).collect()
    assert len(out) == 2
    assert [(r.rank, r.conv_id, r.c) for r in sorted(out, key=lambda r: r.rank)] == [
        (1, "a", 3),
        (2, "b", 3),
    ]


def test_topk_counts_lossy_turns(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    df = spark.createDataFrame(
        [
            ("a", 0, "user", "x", "t", t0, None),
            ("a", 1, "user", "x", "t", t0 + dt.timedelta(seconds=1), None),
        ],
        SCHEMA,
    )
    out = topk_series(df, "1h", k=5).collect()
    assert len(out) == 1 and out[0].c == 2


def test_series_churn_new_vs_active(spark):
    rows = []
    d0 = dt.datetime(2024, 1, 1)
    # day 0: conv a, b both new; day 1: a returns, c new
    rows += [("a", 0, "user", "x", "t", d0, 1.0),
             ("b", 0, "user", "x", "t", d0, 1.0),
             ("a", 1, "user", "x", "t", d0 + dt.timedelta(days=1), 1.0),
             ("c", 0, "user", "x", "t", d0 + dt.timedelta(days=1), 1.0)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {r.bucket_start.day: r for r in series_churn(df, "1d").collect()}
    assert out[1].n_active == 2 and out[1].n_new == 2
    assert out[2].n_active == 2 and out[2].n_new == 1


def test_series_churn_quiet_day_absent(spark):
    """Buckets with no turns emit no row (presence-driven relation)."""
    d0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("a", 0, "user", "x", "t", d0, 1.0),
         ("a", 1, "user", "x", "t", d0 + dt.timedelta(days=2), 1.0)],
        SCHEMA,
    )
    out = series_churn(df, "1d").collect()
    assert sorted(r.bucket_start.day for r in out) == [1, 3]
