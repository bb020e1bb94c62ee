"""Trend / alerting analytics over per-series time series: Holt-Winters
double-exponential smoothing, trailing range-frame ``*_over_time``
aggregates, Prometheus-style for-duration threshold alerts, MAD robust
outlier scoring, and per-tool activity z-scores.

These extend the engine's analytic face the same way counter_rate and
smooth_ewma (operators/sessions.py, operators/smooth.py) do: the
reference computes trend/threshold logic inside its detector operators
(BaselineDetector's percentile window, SimpleThresholdDetector,
reference: flink/processors/SimpleThresholdDetector.scala; the spike
detector's smoothed influence fold, detectors/spike/SmoothedZScore.scala
— all already replicated bit-exactly in functions/detectors.py); here
the same primitives are exposed as first-class, oracle-checked
DataFrame transforms a dashboard or downstream feature pipeline can
call directly.

Determinism contracts (per component):

- ``holt_winters``: sequential per-series fold (level + trend) in the
  partition-wise kernel harness with a FIXED float op order that the
  DuckDB recursive-CTE oracle replays verbatim — same discipline as
  smooth_ewma.
- ``over_time``: one RANGE window frame over the integer epoch-µs
  order column; count/min/max are order-independent, the average is
  one division of an exact integer µs-quantized sum.
- ``alerts_for_duration``: pure gaps-and-islands integer arithmetic
  (two row_numbers, integer µs spans) — no floats in the hashed
  surface except the final /1e6 duration division.
- ``mad_outliers``: exact sorted-array medians with the interpolation
  formula generated ONCE (``_median_from_sorted``) and rendered per
  dialect with identical arithmetic text; |x - med| and k*mad are
  fixed-order IEEE ops on identical doubles.
- ``activity_zscore``: per-bucket counts are exact ints; the trailing
  24h mean/variance use one fixed-order formula over exact integer
  window sums; z = (c - mean)/sqrt(var) with a var<=0 NULL guard.

Scale shape: every component is one exchange on its key. over_time and
alerts sort within (series) — sharded naturally by the series key whose
skew salting the rollup layer already handles; mad_outliers groups by
(series, bucket) with array state bounded by the bucket's row count
(same bound as the exact rollup's percentile arrays, with the same
guarded-variant escape hatch if a bucket is pathological);
activity_zscore's window is over the tiny per-tool bucket relation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamevmon_spark.operators._partitionwise import (
    group_starts,
    partitionwise_apply,
)
from streamevmon_spark.operators.rollup import (
    EPOCH_NTZ,
    SERIES_KEY,
    TIERS,
)

# ---------------------------------------------------------------------------
# Holt-Winters (double exponential smoothing)
# ---------------------------------------------------------------------------

_HW_SCHEMA = (
    "conv_id string, tool string, role string, ts timestamp_ntz, "
    "value double, level double, trend double"
)


def holt_winters_fold(
    x: np.ndarray, sf: float, tf: float
) -> tuple[np.ndarray, np.ndarray]:
    """Bit-exact sequential Holt fold of one series (float64).

    Init: level_1 = x_1, trend_1 = 0.0. For k >= 2 (plain Python floats,
    fixed operand order — the contract the oracle replays):

        level_k = sf * x_k + omsf * (level_{k-1} + trend_{k-1})
        trend_k = tf * (level_k - level_{k-1}) + omtf * trend_{k-1}

    (Init differs from PromQL's holt_winters, which seeds the trend from
    the second sample; trend_1 = 0.0 keeps the recursion self-contained
    and is documented engine behavior.)
    """
    omsf, omtf = 1.0 - sf, 1.0 - tf
    lev = np.empty(x.size, dtype=np.float64)
    tre = np.empty(x.size, dtype=np.float64)
    s, b = 0.0, 0.0
    for i, xi in enumerate(x.tolist()):
        if i == 0:
            s, b = xi, 0.0
        else:
            s_new = sf * xi + omsf * (s + b)
            b = tf * (s_new - s) + omtf * b
            s = s_new
        lev[i] = s
        tre[i] = b
    return lev, tre


def holt_winters(
    transcripts: DataFrame, sf: float = 0.3, tf: float = 0.1
) -> DataFrame:
    """Holt-Winters level + trend per non-lossy point of each series."""
    pts = transcripts.where(F.col("value").isNotNull()).select(
        *SERIES_KEY, "ts", "turn_idx", "value"
    )

    def batch_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        starts = group_starts(pdf, SERIES_KEY)
        bounds = np.append(starts, len(pdf))
        vals = pdf["value"].to_numpy(dtype=np.float64)
        lev = np.empty(len(pdf), dtype=np.float64)
        tre = np.empty(len(pdf), dtype=np.float64)
        for s, e in zip(bounds[:-1], bounds[1:]):
            lev[s:e], tre[s:e] = holt_winters_fold(vals[s:e], sf, tf)
        out = pdf[["conv_id", "tool", "role", "ts", "value"]].copy()
        out["level"] = lev
        out["trend"] = tre
        return out

    return partitionwise_apply(
        pts,
        group_keys=SERIES_KEY,
        sort_cols=["ts", "turn_idx"],
        batch_fn=batch_fn,
        schema=_HW_SCHEMA,
    )


# ---------------------------------------------------------------------------
# trailing *_over_time range-frame aggregates
# ---------------------------------------------------------------------------


def over_time(transcripts: DataFrame, range_s: int = 3600) -> DataFrame:
    """PromQL ``*_over_time``-style trailing aggregates: for every
    non-lossy point, count / avg / min / max over the trailing
    ``range_s`` seconds of the SAME series (inclusive of the current
    point). One RANGE window frame over the integer epoch-µs column —
    no self-join, no explode; count/min/max are order-independent and
    the average divides an exact µs-quantized integer sum once."""
    range_us = range_s * 1_000_000
    pts = transcripts.where(F.col("value").isNotNull()).select(
        *SERIES_KEY,
        "ts",
        F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)").alias("ts_us"),
        "value",
        F.floor(F.col("value") * 1e6).alias("val_q"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*SERIES_KEY)
        .orderBy("ts_us")
        .rangeBetween(-range_us, 0)
    )
    return pts.select(
        *SERIES_KEY,
        "ts",
        "value",
        F.count(F.lit(1)).over(w).alias("n_win"),
        (
            F.sum("val_q").over(w).cast("double")
            / F.count(F.lit(1)).over(w).cast("double")
            / F.lit(1e6)
        ).alias("avg_win"),
        F.min("value").over(w).alias("min_win"),
        F.max("value").over(w).alias("max_win"),
    )


# ---------------------------------------------------------------------------
# for-duration threshold alerts (Prometheus `for:` semantics)
# ---------------------------------------------------------------------------


def alerts_for_duration(
    transcripts: DataFrame,
    threshold: float = 100.0,
    for_s: int = 300,
) -> DataFrame:
    """Maximal runs of consecutive points of one series with
    value > ``threshold``, kept only when the run spans at least
    ``for_s`` seconds (first to last breaching point) — a Prometheus
    alert rule with a ``for:`` clause, evaluated retroactively over the
    table. Lossy (NULL-value) turns break a run (an alert cannot be
    proven to hold across an observation the pipeline lost).

    Gaps-and-islands: island id = global row_number - per-flag
    row_number over the same stable (ts, turn_idx) order; one exchange
    on the series key, integer µs spans, the only float is the final
    duration division. fire_ts is the instant the rule's duration is
    first satisfied: run start + for_s."""
    for_us = for_s * 1_000_000
    from pyspark.sql import Window

    w_all = Window.partitionBy(*SERIES_KEY).orderBy("ts", "turn_idx")
    pts = (
        transcripts.select(
            *SERIES_KEY,
            "ts",
            "turn_idx",
            F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)").alias(
                "ts_us"
            ),
            (
                F.col("value").isNotNull()
                & (F.col("value") > F.lit(threshold))
            ).alias("over"),
        )
        .withColumn("rn", F.row_number().over(w_all))
        .withColumn(
            "grp",
            F.col("rn")
            - F.row_number().over(
                Window.partitionBy(*SERIES_KEY, "over").orderBy(
                    "ts", "turn_idx"
                )
            ),
        )
    )
    runs = (
        pts.where("over")
        .groupBy(*SERIES_KEY, "grp")
        .agg(
            F.min("ts_us").alias("start_us"),
            F.max("ts_us").alias("end_us"),
            F.count(F.lit(1)).alias("n_points"),
        )
        .where(F.col("end_us") - F.col("start_us") >= F.lit(for_us))
    )
    return runs.select(
        *SERIES_KEY,
        F.expr(f"timestampadd(MICROSECOND, start_us, {EPOCH_NTZ})").alias(
            "start_ts"
        ),
        F.expr(f"timestampadd(MICROSECOND, end_us, {EPOCH_NTZ})").alias(
            "end_ts"
        ),
        F.expr(
            f"timestampadd(MICROSECOND, start_us + {for_us}, {EPOCH_NTZ})"
        ).alias("fire_ts"),
        "n_points",
        (
            (F.col("end_us") - F.col("start_us")).cast("double")
            / F.lit(1e6)
        ).alias("duration_s"),
    )


# ---------------------------------------------------------------------------
# MAD robust outliers
# ---------------------------------------------------------------------------


def _median_from_sorted(arr: str, size_fn, elem_fn) -> str:
    """Linear-interpolation median over a pre-sorted DOUBLE array,
    rendered per dialect through ``size_fn(arr)`` / ``elem_fn(arr, i)``
    (i is a 1-based SQL expression string) with IDENTICAL arithmetic
    text — the same formula family as rollup._pct_from_sorted, without
    the µs re-scale (inputs are already doubles)."""
    n = size_fn(arr)
    idx = f"(0.5 * ({n} - 1))"
    lo = elem_fn(arr, f"CAST(floor({idx}) AS INT) + 1")
    hi = elem_fn(arr, f"least(CAST(floor({idx}) AS INT) + 2, {n})")
    return (
        f"CASE WHEN {n} = 0 THEN CAST(NULL AS DOUBLE) "
        f"ELSE ({lo} + ({hi} - {lo}) * ({idx} - floor({idx}))) END"
    )


def median_sql_spark(arr: str) -> str:
    return _median_from_sorted(
        arr,
        lambda a: f"size({a})",
        lambda a, i: f"CAST(element_at({a}, {i}) AS DOUBLE)",
    )


def median_sql_duckdb(arr: str) -> str:
    return _median_from_sorted(
        arr,
        lambda a: f"len({a})",
        lambda a, i: f"CAST({a}[{i}] AS DOUBLE)",
    )


def mad_outliers(
    transcripts: DataFrame, tier: str = "1h", k: float = 3.0
) -> DataFrame:
    """Per-(series, tier bucket) robust location/scale + outlier count:
    med = exact interpolated median of the bucket's values, mad =
    median of |x - med|, outlier_cnt = #{x : |x - med| > k * mad}.
    Array state per group is bounded by the bucket's row count — the
    same bound the exact rollup's percentile arrays carry. All float
    ops are fixed-order on identical doubles in both engines."""
    win_us = TIERS[tier] * 1_000_000
    pts = transcripts.where(F.col("value").isNotNull()).select(
        *SERIES_KEY,
        F.expr(
            f"(datediff(MICROSECOND, {EPOCH_NTZ}, ts) div {win_us})"
            f" * {win_us}"
        ).alias("w_us"),
        "value",
    )
    grouped = pts.groupBy("w_us", *SERIES_KEY).agg(
        F.sort_array(F.collect_list("value")).alias("varr")
    )
    med = median_sql_spark("varr")
    grouped = grouped.withColumn("med", F.expr(med))
    grouped = grouped.withColumn(
        "darr",
        F.expr("array_sort(transform(varr, x -> abs(x - med)))"),
    )
    mad = median_sql_spark("darr")
    kd = f"CAST({float(k)!r} AS DOUBLE)"
    return grouped.select(
        F.expr(f"timestampadd(MICROSECOND, w_us, {EPOCH_NTZ})").alias(
            "bucket_start"
        ),
        *SERIES_KEY,
        F.expr("size(varr)").cast("bigint").alias("n"),
        "med",
        F.expr(mad).alias("mad"),
        F.expr(
            f"size(filter(darr, d -> d > {kd} * ({mad})))"
        )
        .cast("bigint")
        .alias("outlier_cnt"),
    )


# ---------------------------------------------------------------------------
# per-tool activity z-scores
# ---------------------------------------------------------------------------


def activity_zscore(
    transcripts: DataFrame, tier: str = "1h", lookback_buckets: int = 24
) -> DataFrame:
    """Per-(tool, tier bucket) turn count plus its z-score against the
    trailing ``lookback_buckets`` buckets (inclusive) of the same tool —
    the alerting face of the north star's per-tool activity rate.
    Counts and window sums are exact ints (c^2 <= 9e18 requires bucket
    counts < 3e9 — generous at any tier); mean/var/z use one fixed-order
    formula; var <= 0 (a constant window) yields NULL z."""
    win_us = TIERS[tier] * 1_000_000
    span_us = (lookback_buckets - 1) * win_us
    buckets = (
        transcripts.select(
            F.expr(
                f"(datediff(MICROSECOND, {EPOCH_NTZ}, ts) div {win_us})"
                f" * {win_us}"
            ).alias("w_us"),
            "tool",
        )
        .groupBy("tool", "w_us")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("tool")
        .orderBy("w_us")
        .rangeBetween(-span_us, 0)
    )
    stats = buckets.select(
        "tool",
        "w_us",
        "c",
        F.count(F.lit(1)).over(w).alias("nb"),
        F.sum("c").over(w).alias("s1"),
        F.sum(F.col("c") * F.col("c")).over(w).alias("s2"),
    )
    mean = "(CAST(s1 AS DOUBLE) / CAST(nb AS DOUBLE))"
    var = (
        f"((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * {mean})"
        " / CAST(nb AS DOUBLE))"
    )
    z = (
        f"CASE WHEN {var} <= 0.0 THEN CAST(NULL AS DOUBLE)"
        f" ELSE (CAST(c AS DOUBLE) - {mean}) / sqrt({var}) END"
    )
    return stats.select(
        F.expr(f"timestampadd(MICROSECOND, w_us, {EPOCH_NTZ})").alias(
            "bucket_start"
        ),
        "tool",
        "c",
        "nb",
        F.expr(mean).alias("mean_c"),
        F.expr(var).alias("var_c"),
        F.expr(z).alias("zscore"),
    )
