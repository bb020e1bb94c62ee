"""Series-level operational analytics: per-bucket top-k series ranking
(the PromQL ``topk()`` read face) and daily series churn / cardinality
stats (active vs first-seen series per day — the TSDB operator's
cardinality-explosion early warning).

The reference manages its stream universe through dense stream-id
assignment and per-stream keyed state (reference:
measurements/MeasurementKeySelector.scala:47-64 and the detectors'
per-key state registries); these transforms expose the equivalent
"which streams, how many, which are new" questions as first-class
oracle-checked queries over the transcripts table.

Exactness: both outputs are pure integer counts plus a deterministic
total order (count DESC, then the series key ASC as the tiebreak), so
cross-engine equality needs no float discipline at all.

Scale shape: both collapse raw turns to a per-(series, bucket)
relation first (one exchange, the rollup key layout), after which
ranking windows / churn joins run on a relation smaller than raw by
the bucket span. The top-k window partitions by bucket — per-partition
state is the bucket's series count, the same cardinality the rollup
tiers already carry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamevmon_spark.operators.rollup import (
    EPOCH_NTZ,
    SERIES_KEY,
    TIERS,
)


def topk_series(
    transcripts: DataFrame, tier: str = "1h", k: int = 5
) -> DataFrame:
    """Top ``k`` series per tier bucket by turn count (lossy turns
    included — activity, not values), rank 1 = busiest. Deterministic
    total order: count DESC, then (conv_id, tool, role) ASC."""
    win_us = TIERS[tier] * 1_000_000
    counts = (
        transcripts.select(
            *SERIES_KEY,
            F.expr(
                f"(datediff(MICROSECOND, {EPOCH_NTZ}, ts) div {win_us})"
                f" * {win_us}"
            ).alias("w_us"),
        )
        .groupBy("w_us", *SERIES_KEY)
        .agg(F.count(F.lit(1)).alias("c"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("w_us").orderBy(
        F.col("c").desc(), *[F.col(c).asc() for c in SERIES_KEY]
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.expr(
                f"timestampadd(MICROSECOND, w_us, {EPOCH_NTZ})"
            ).alias("bucket_start"),
            F.col("rank").cast("int").alias("rank"),
            *SERIES_KEY,
            F.col("c").cast("bigint").alias("c"),
        )
    )


def series_churn(transcripts: DataFrame, tier: str = "1d") -> DataFrame:
    """Per tier bucket (default daily): ``n_active`` = distinct series
    observed, ``n_new`` = series whose FIRST-EVER turn falls in that
    bucket (0 when none). New-series days are a subset of active days,
    so a left join from the active relation loses nothing."""
    win_us = TIERS[tier] * 1_000_000
    presence = (
        transcripts.select(
            *SERIES_KEY,
            F.expr(
                f"datediff(MICROSECOND, {EPOCH_NTZ}, ts) div {win_us}"
            ).alias("w_idx"),
        )
        .groupBy(*SERIES_KEY, "w_idx")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    active = presence.groupBy("w_idx").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    first_seen = presence.groupBy(*SERIES_KEY).agg(
        F.min("w_idx").alias("first_idx")
    )
    new = first_seen.groupBy("first_idx").agg(
        F.count(F.lit(1)).alias("n_new")
    )
    joined = active.join(
        new, active["w_idx"] == new["first_idx"], "left"
    )
    return joined.select(
        F.expr(
            f"timestampadd(MICROSECOND, w_idx * {win_us}, {EPOCH_NTZ})"
        ).alias("bucket_start"),
        F.col("n_active").cast("bigint").alias("n_active"),
        F.coalesce(F.col("n_new"), F.lit(0))
        .cast("bigint")
        .alias("n_new"),
    )
