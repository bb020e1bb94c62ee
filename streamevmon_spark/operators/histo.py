"""Fixed-boundary latency histograms per retention tier, with
Prometheus-style histogram_quantile.

The exact rollup keeps full sorted latency arrays per bucket
(operators/rollup.py) — exact percentiles, but state linear in the
bucket's row count. This module is the bounded-state companion (the
store's fourth mergeable sketch face, after t-digest / HLL / count-min):
a classic fixed-le-boundary histogram (the public Prometheus histogram
model) whose per-bucket state is 8 integer counters regardless of row
count, mergeable across tiers by element-wise SUM, with quantiles
recovered by linear interpolation inside the chosen bucket
(histogram_quantile semantics).

Reference parity: the reference's DistDiffDetector maintains fixed
bucketed distributions of recent measurements to compare windows
(reference: detectors/distdiff/DistDiffDetector.scala:120-170); this is
the same bucketed-distribution state lifted to a first-class,
tier-mergeable aggregate over inter-turn latency.

Determinism contract: counters are exact int64 from one hash aggregate;
the quantile expression is ONE SQL string generated here and evaluated
verbatim by both Spark and the DuckDB oracle (dialect-intersection SQL:
CASE / CAST AS DOUBLE / fixed-order arithmetic), so both engines run
the identical IEEE operations on the same exact integers. le bounds are
integer microseconds < 2^53, exact as doubles.

Scale shape: raw -> (bucket, tool, role, le_idx) is one
map-side-combinable aggregate with output bounded at 8 rows per series
bucket; the pivot to one row per series-bucket is a second tiny
aggregate over that bounded state. Tier merge never rescans raw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamevmon_spark.operators.rollup import (
    EPOCH_NTZ,
    TIERS,
    add_inter_turn_latency,
)

#: upper bounds (inclusive, integer µs) of buckets 0..6; bucket 7 = +inf
LE_US: list[int] = [
    1_000_000,        # 1 s
    10_000_000,       # 10 s
    60_000_000,       # 1 min
    300_000_000,      # 5 min
    1_800_000_000,    # 30 min
    7_200_000_000,    # 2 h
    86_400_000_000,   # 1 d
]
N_BUCKETS = len(LE_US) + 1


def le_idx_sql(lat_col: str = "lat_us") -> str:
    """Dialect-intersection CASE chain mapping a latency to its bucket
    index (first bound >= value; overflow -> 7)."""
    whens = "".join(
        f" WHEN {lat_col} <= {b} THEN {i}" for i, b in enumerate(LE_US)
    )
    return f"CASE{whens} ELSE {len(LE_US)} END"


def quantile_sql(q: float) -> str:
    """Dialect-intersection histogram_quantile expression over the
    pivoted columns c0..c7 + total: linear interpolation inside the
    first bucket whose cumulative count reaches q*total; the overflow
    bucket returns its lower bound (Prometheus semantics). Evaluated
    VERBATIM by both engines — textual identity is the cross-engine
    bit-exactness argument."""
    # CAST the q literal: DuckDB parses bare decimals as DECIMAL, and a
    # DECIMAL*DOUBLE product could round differently than Spark's
    # DOUBLE*DOUBLE (same lesson as smooth_ewma_oracle).
    target = f"(CAST({q!r} AS DOUBLE) * CAST(total AS DOUBLE))"
    whens = []
    cum_terms: list[str] = []
    for i in range(len(LE_US)):
        cum_terms.append(f"c{i}")
        cum = " + ".join(cum_terms)
        lo = 0 if i == 0 else LE_US[i - 1]
        hi = LE_US[i]
        prev = " + ".join(cum_terms[:-1]) if i else "0"
        whens.append(
            f" WHEN CAST({cum} AS DOUBLE) >= {target} THEN"
            f" CAST({lo} AS DOUBLE) + CAST({hi - lo} AS DOUBLE)"
            f" * (({target} - CAST({prev} AS DOUBLE))"
            f" / CAST(c{i} AS DOUBLE))"
        )
    return (
        "CASE" + "".join(whens)
        + f" ELSE CAST({LE_US[-1]} AS DOUBLE) END"
    )


def hist_counters(transcripts: DataFrame, tier: str = "1h") -> DataFrame:
    """Per-(bucket, tool, role, le_idx) exact counts of inter-turn
    latency — the mergeable histogram state (<= 8 rows per series
    bucket). Latency is the stable-(ts, turn_idx)-ordered lag the exact
    rollup uses; first turns (no predecessor) carry no latency and are
    excluded in both engines."""
    win_us = TIERS[tier] * 1_000_000
    df = add_inter_turn_latency(transcripts).filter(
        F.col("lat_us").isNotNull()
    )
    return (
        df.select(
            F.expr(
                f"(datediff(MICROSECOND, {EPOCH_NTZ}, ts) div {win_us})"
                f" * {win_us}"
            ).alias("w_us"),
            "tool",
            "role",
            F.expr(le_idx_sql("lat_us")).cast("int").alias("le_idx"),
        )
        .groupBy("w_us", "tool", "role", "le_idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge_counters(
    counters: DataFrame, from_tier: str = "1h", to_tier: str = "1d"
) -> DataFrame:
    """Merge fine-tier histogram state into a coarser tier: re-bucket
    and SUM per le bucket — bit-identical to computing the coarse tier
    from raw (proved hash-exact by the hist_quantile_1d_merged gate
    query)."""
    assert TIERS[to_tier] % TIERS[from_tier] == 0
    to_us = TIERS[to_tier] * 1_000_000
    return (
        counters.withColumn("w_us", F.expr(f"(w_us div {to_us}) * {to_us}"))
        .groupBy("w_us", "tool", "role", "le_idx")
        .agg(F.sum("cnt").alias("cnt"))
    )


def hist_summary(counters: DataFrame) -> DataFrame:
    """Pivot the counter state to one row per series-bucket (c0..c7 +
    total) and evaluate p50/p95 with the shared quantile expression."""
    aggs = [
        F.sum(
            F.when(F.col("le_idx") == i, F.col("cnt")).otherwise(F.lit(0))
        ).alias(f"c{i}")
        for i in range(N_BUCKETS)
    ]
    pivoted = (
        counters.groupBy("w_us", "tool", "role")
        .agg(*aggs)
        .withColumn(
            "total",
            sum(F.col(f"c{i}") for i in range(N_BUCKETS)),
        )
    )
    return pivoted.select(
        F.expr(f"timestampadd(MICROSECOND, w_us, {EPOCH_NTZ})").alias(
            "bucket_start"
        ),
        "tool",
        "role",
        "total",
        *[f"c{i}" for i in range(N_BUCKETS)],
        F.expr(quantile_sql(0.5)).alias("p50_us"),
        F.expr(quantile_sql(0.95)).alias("p95_us"),
    )


def hist_quantiles(transcripts: DataFrame, tier: str = "1h") -> DataFrame:
    """Gate query: per-(tool, role) tier-bucket latency histogram +
    histogram_quantile p50/p95, computed from raw."""
    return hist_summary(hist_counters(transcripts, tier))
