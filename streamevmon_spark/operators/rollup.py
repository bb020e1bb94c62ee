"""Tiered rollup (continuous aggregates) over transcript series.

The engine's flagship operator family: per-(conv_id, tool, role) series
bucketed into tumbling retention tiers (1m / 1h / 1d), producing turn
counts, inter-turn latency stats + exact percentiles, lossy counts and
per-tool activity rates.

Reference semantics being reproduced:
- tumbling event-time windows keyed per stream
  (reference: runners/unified/schema/TypedStreams.scala:70-72, default 60 s)
- per-key ordered fold for inter-turn deltas
  (reference: detectors/WindowedFunctionWrapper.scala:50-95 — elements
  replayed sorted by time; our stable order is (ts, turn_idx))
- windowed percentile as in BaselineDetector
  (reference: detectors/baseline/BaselineDetector.scala:141)
- lossy-row accounting (reference: detectors/loss/LossDetector.scala:103-109)

Determinism contract (the "exact-match rate = 1.0" requirement):
- Timestamps are TIMESTAMP_NTZ; tumbling windows are pure epoch-bucket
  integer arithmetic (``ts_us div win_us * win_us``) — timezone-free and
  cheaper than calendar truncation at scale.
- Latencies aggregate as INTEGER microseconds: sums/min/max are exact in
  any engine and any reduction order; only the final division by 1e6
  touches floats (identical operands → identical IEEE result everywhere).
- Percentiles use an explicitly spelled-out linear-interpolation formula
  over the sorted array, so any engine evaluating the same formula on the
  same integers produces bit-identical doubles.
- ``value`` doubles are quantized to integer micro-units
  (floor(value*1e6)) before summation — cross-engine/-order exact.

Scale design:
- One shuffle: the lag() window and the groupBy share the series key, so
  Catalyst reuses the exchange. Algebraic aggregates partial map-side.
- The sorted-array percentile holds one window's worth of one series per
  group (bounded, small); at 100 TB the cascade path uses mergeable
  t-digest sketches instead (functions/tdigest.py).
- ``rollup_tier_salted`` defeats hot-conversation skew with an explicit
  two-phase (salt → partial → final) aggregation; the reference never
  solved skew (sources pinned to parallelism 1,
  reference: flink/sources/InfluxAmpSourceFunction.scala:115-117).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SERIES_KEY = ["conv_id", "tool", "role"]

# tier name -> window length in seconds
TIERS: dict[str, int] = {"1m": 60, "1h": 3600, "1d": 86400}

EPOCH_NTZ = "timestamp_ntz'1970-01-01 00:00:00'"


def ts_micros(col: str = "ts") -> Column:
    """tz-free microseconds-since-epoch for a TIMESTAMP_NTZ column."""
    return F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, {col})")


def add_inter_turn_latency(df: DataFrame) -> DataFrame:
    """Add ``lat_us`` (int µs since the previous turn of the same series)
    and ``lat_s`` (seconds, double, derived).

    Stable order (ts, turn_idx): turn_idx is the tiebreaker mandated by
    the per-turn-ordering invariant.
    """
    w = Window.partitionBy(*SERIES_KEY).orderBy("ts", "turn_idx")
    df = df.withColumn("__ts_us", ts_micros("ts"))
    df = df.withColumn("lat_us", F.col("__ts_us") - F.lag("__ts_us").over(w))
    return df.withColumn("lat_s", F.col("lat_us").cast("double") / 1e6).drop(
        "__ts_us"
    )


def _pct_from_sorted(arr: str, p: float) -> str:
    """Linear-interpolation percentile over a pre-sorted bigint array,
    spelled out so the oracle can evaluate the byte-identical formula:
    idx = p*(n-1); lo + (hi-lo)*(idx-floor(idx))."""
    idx = f"({p} * (size({arr}) - 1))"
    lo = f"CAST(element_at({arr}, CAST(floor({idx}) AS INT) + 1) AS DOUBLE)"
    hi = (
        f"CAST(element_at({arr}, least(CAST(floor({idx}) AS INT) + 2, "
        f"size({arr}))) AS DOUBLE)"
    )
    return (
        f"CASE WHEN size({arr}) = 0 THEN CAST(NULL AS DOUBLE) "
        f"ELSE ({lo} + ({hi} - {lo}) * ({idx} - floor({idx}))) / 1e6 END"
    )


def rollup_tier(df: DataFrame, tier: str = "1m") -> DataFrame:
    """Declarative tiered rollup — the exact/correctness path.

    groupBy(series key, epoch-bucket window) with native aggregates only:
    stays inside whole-stage codegen, partial-aggregates map-side, and
    shares its shuffle with the latency lag() window.
    """
    secs = TIERS[tier]
    win_us = secs * 1_000_000
    with_lat = add_inter_turn_latency(df)
    # epoch-bucket tumbling window: exact integer division, tz-free
    wstart_us = F.expr(
        f"(datediff(MICROSECOND, {EPOCH_NTZ}, ts) div {win_us}) * {win_us}"
    )
    grouped = (
        with_lat
        .withColumn("__w_us", wstart_us)
        .withColumn("__val_q", F.floor(F.col("value") * 1e6))
        .groupBy(*SERIES_KEY, "__w_us")
        .agg(
            F.count(F.lit(1)).alias("turn_count"),
            F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias(
                "lossy_count"
            ),
            F.sum("lat_us").alias("__lat_sum"),
            F.count("lat_us").alias("__lat_cnt"),
            F.min("lat_us").alias("__lat_min"),
            F.max("lat_us").alias("__lat_max"),
            F.sort_array(F.collect_list("lat_us")).alias("__lat_arr"),
            F.sum("__val_q").alias("__val_sum"),
            F.count("__val_q").alias("__val_cnt"),
        )
    )
    out = grouped.select(
        "conv_id",
        "tool",
        "role",
        F.expr(f"timestampadd(MICROSECOND, __w_us, {EPOCH_NTZ})").alias(
            "window_start"
        ),
        F.expr(
            f"timestampadd(MICROSECOND, __w_us + {win_us}, {EPOCH_NTZ})"
        ).alias("window_end"),
        "turn_count",
        "lossy_count",
        (
            F.col("__lat_sum").cast("double")
            / F.col("__lat_cnt").cast("double")
            / 1e6
        ).alias("lat_avg"),
        (F.col("__lat_min").cast("double") / 1e6).alias("lat_min"),
        (F.col("__lat_max").cast("double") / 1e6).alias("lat_max"),
        F.expr(_pct_from_sorted("__lat_arr", 0.5)).alias("lat_p50"),
        F.expr(_pct_from_sorted("__lat_arr", 0.95)).alias("lat_p95"),
        F.expr(_pct_from_sorted("__lat_arr", 0.99)).alias("lat_p99"),
        (
            F.col("__val_sum").cast("double")
            / F.col("__val_cnt").cast("double")
            / 1e6
        ).alias("val_avg"),
        (
            F.col("turn_count").cast("double") / F.lit(float(secs))
        ).alias("activity_rate"),
    )
    return out


def rollup_tier_salted(
    df: DataFrame, tier: str = "1m", n_salts: int = 16
) -> DataFrame:
    """Skew-resistant two-phase rollup for algebraic aggregates.

    Phase 1 groups by (series key, window, salt) where
    salt = pmod(xxhash64(turn_idx, ts), n_salts) — a hot conversation's
    rows in one window spread over ``n_salts`` reducers. Phase 2 merges
    partials. Counts/sums/min/max merge exactly; integer-µs arithmetic
    makes the result bit-identical to the unsalted path (asserted in
    tests). Holistic aggregates (exact percentiles) are NOT
    salt-mergeable — at scale those ride the t-digest sketch cascade.
    """
    secs = TIERS[tier]
    win_us = secs * 1_000_000
    wstart_us = F.expr(
        f"(datediff(MICROSECOND, {EPOCH_NTZ}, ts) div {win_us}) * {win_us}"
    )
    salted = (
        add_inter_turn_latency(df)
        .withColumn("__w_us", wstart_us)
        .withColumn("__val_q", F.floor(F.col("value") * 1e6))
        .withColumn(
            "__salt", F.pmod(F.xxhash64("turn_idx", "ts"), F.lit(n_salts))
        )
    )
    partial = salted.groupBy(*SERIES_KEY, "__w_us", "__salt").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("__lossy"),
        F.sum("lat_us").alias("__lat_sum"),
        F.count("lat_us").alias("__lat_cnt"),
        F.min("lat_us").alias("__lat_min"),
        F.max("lat_us").alias("__lat_max"),
        F.sum("__val_q").alias("__val_sum"),
        F.count("__val_q").alias("__val_cnt"),
    )
    merged = partial.groupBy(*SERIES_KEY, "__w_us").agg(
        F.sum("__cnt").alias("turn_count"),
        F.sum("__lossy").alias("lossy_count"),
        F.sum("__lat_sum").alias("__lat_sum"),
        F.sum("__lat_cnt").alias("__lat_cnt"),
        F.min("__lat_min").alias("__lat_min"),
        F.max("__lat_max").alias("__lat_max"),
        F.sum("__val_sum").alias("__val_sum"),
        F.sum("__val_cnt").alias("__val_cnt"),
    )
    return merged.select(
        "conv_id",
        "tool",
        "role",
        F.expr(f"timestampadd(MICROSECOND, __w_us, {EPOCH_NTZ})").alias(
            "window_start"
        ),
        "turn_count",
        "lossy_count",
        (
            F.col("__lat_sum").cast("double")
            / F.col("__lat_cnt").cast("double")
            / 1e6
        ).alias("lat_avg"),
        (F.col("__lat_min").cast("double") / 1e6).alias("lat_min"),
        (F.col("__lat_max").cast("double") / 1e6).alias("lat_max"),
        (
            F.col("__val_sum").cast("double")
            / F.col("__val_cnt").cast("double")
            / 1e6
        ).alias("val_avg"),
        (
            F.col("turn_count").cast("double") / F.lit(float(secs))
        ).alias("activity_rate"),
    )


def cascade_rollup(finer: DataFrame, from_tier: str, to_tier: str) -> DataFrame:
    """Incremental tier cascade: re-aggregate a finer rollup into a coarser
    tier WITHOUT touching raw data (the continuous-aggregate maintenance
    path — at 10^12 turns you never rescan raw for the 1h/1d tiers).

    Exact for all algebraic columns (counts, min/max). Percentile columns
    cascade via t-digest sketch merge (operators/sketch_rollup.py) with
    tolerance-tested accuracy, mirroring how the reference recomputes
    windowed percentiles per window rather than merging them
    (reference: detectors/baseline/BaselineDetector.scala:135-146).
    """
    secs = TIERS[to_tier]
    win_us = secs * 1_000_000
    wstart_us = F.expr(
        f"(datediff(MICROSECOND, {EPOCH_NTZ}, window_start) div {win_us})"
        f" * {win_us}"
    )
    return (
        finer.groupBy("conv_id", "tool", "role", wstart_us.alias("__w_us"))
        .agg(
            F.sum("turn_count").alias("turn_count"),
            F.sum("lossy_count").alias("lossy_count"),
            F.min("lat_min").alias("lat_min"),
            F.max("lat_max").alias("lat_max"),
        )
        .select(
            "conv_id",
            "tool",
            "role",
            F.expr(f"timestampadd(MICROSECOND, __w_us, {EPOCH_NTZ})").alias(
                "window_start"
            ),
            F.expr(
                f"timestampadd(MICROSECOND, __w_us + {win_us}, {EPOCH_NTZ})"
            ).alias("window_end"),
            "turn_count",
            "lossy_count",
            "lat_min",
            "lat_max",
            (
                F.col("turn_count").cast("double") / F.lit(float(secs))
            ).alias("activity_rate"),
        )
    )
