"""Count-min sketch heavy hitters per retention tier.

The north-star store keeps *mergeable* sketch state per tier alongside
exact rollup state: t-digests for percentiles (functions/tdigest.py) and
HLL registers for distinct counts (operators/hll.py). This module adds
the third classic mergeable sketch: a count-min sketch (Cormode &
Muthukrishnan 2005) answering "which conversations are hot in this
bucket?" — the exact skew question the engine's salted repartitioning
exists to absorb (a production deployment feeds the heavy-hitter list
back into the salting policy).

Reference parity: the reference's event pipeline counts per-stream event
frequency with an exact keyed map (FrequentEventFilter,
reference: flink/processors/FrequentEventFilter.scala) — exact state per
key. At 10^12 turns an exact per-key map is unbounded; the count-min
sketch is the bounded-state re-expression: DEPTH x WIDTH integer
counters per bucket regardless of key cardinality, mergeable by plain
element-wise SUM, so coarser tiers are maintained from finer-tier state
without rescanning raw (proved hash-exact by the cm_topk_1d_merged gate
query).

Determinism contract (shared with operators/hll.py):

- hashes are the portable 48-bit md5-derived integers of
  functions/porthash.hex48_sql — bit-identical in Spark and DuckDB;
  row ``i`` of the sketch salts the key with the literal prefix
  ``'cm<i>|'``;
- counters are exact int64 counts from one hash aggregate on
  (bucket, rw, cl) — map-side combinable, bounded output
  (DEPTH*WIDTH rows per bucket);
- the point estimate for a key is min over rows of its counter — all
  integer, no floats anywhere in the hashed surface.

Scale shape: the sketch build is one projection (stack of DEPTH
codegen'd hash columns — a single scan, NOT a per-row UNION) plus one
hash aggregate whose output is bounded by DEPTH*WIDTH per bucket. The
heavy-hitter *candidate* enumeration used by the gate queries is the
exact distinct-(bucket, key) set — fine at test scale and for proving
the estimator; at 10^12 turns a deployment would feed a sampled or
pre-filtered candidate set (e.g. keys seen by the salting policy)
through the same cm_estimate join, which is an equi-join against the
bounded counter relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamevmon_spark.functions.porthash import hex48_sql
from streamevmon_spark.operators.rollup import EPOCH_NTZ, TIERS

#: number of independent hash rows
DEPTH = 4
#: counters per row (power of two; 4 x 256 = 1024 counters per bucket)
WIDTH = 256


def _col_sql(row: int, key_col: str) -> str:
    """Portable SQL for the row-``row`` column index of ``key_col``."""
    h = hex48_sql(f"'cm{row}|' || {key_col}")
    return f"CAST({h} % {WIDTH} AS INT)"


def _w_us_expr(tier: str) -> str:
    win_us = TIERS[tier] * 1_000_000
    return (
        f"(datediff(MICROSECOND, {EPOCH_NTZ}, ts) div {win_us})"
        f" * {win_us}"
    )


def key_counts(
    transcripts: DataFrame, tier: str = "1h", key_col: str = "conv_id"
) -> DataFrame:
    """Exact per-(bucket, key) counts — the ONE raw-scan aggregate the
    whole heavy-hitter surface derives from. Output is bounded by
    buckets x distinct keys; callers that feed several consumers
    (counters + candidates + exact counts) should materialize it once
    (localCheckpoint / store) — that is the stored-state analogue, and
    it is what keeps the family at a single raw scan."""
    return (
        transcripts.select(
            F.expr(_w_us_expr(tier)).alias("w_us"), key_col
        )
        .groupBy("w_us", key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _rebucket_counts(counts: DataFrame, to_tier: str) -> DataFrame:
    to_us = TIERS[to_tier] * 1_000_000
    key_col = counts.columns[1]
    return (
        counts.withColumn(
            "w_us", F.expr(f"(w_us div {to_us}) * {to_us}")
        )
        .groupBy("w_us", key_col)
        .agg(F.sum("cnt").alias("cnt"))
    )


def cm_counters(
    transcripts: DataFrame | None = None,
    tier: str = "1h",
    key_col: str = "conv_id",
    counts: DataFrame | None = None,
) -> DataFrame:
    """Per-(bucket, rw, cl) exact counts — the mergeable count-min
    state. Built from the bounded ``key_counts`` relation (pass
    ``counts`` to reuse an already-materialized one): each key's DEPTH
    cells are stacked (codegen'd projection) WEIGHTED by its count, so
    the cell sums are identical to hashing every raw row, but the
    stack multiplies a pre-aggregated relation instead of raw turns.
    Output is bounded: <= DEPTH*WIDTH rows per bucket."""
    if counts is None:
        counts = key_counts(transcripts, tier, key_col)
    stack_args = ", ".join(
        f"{i}, {_col_sql(i, key_col)}" for i in range(DEPTH)
    )
    return (
        counts.select(
            "w_us",
            "cnt",
            F.expr(f"stack({DEPTH}, {stack_args}) AS (rw, cl)"),
        )
        .groupBy("w_us", "rw", "cl")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cm_merge_counters(
    counters: DataFrame, from_tier: str = "1h", to_tier: str = "1d"
) -> DataFrame:
    """Merge fine-tier counter state into a coarser tier: re-bucket and
    SUM per cell. sum is associative/commutative, so the merged state is
    bit-identical to computing the coarse tier from raw — proved
    hash-exact by the cm_topk_1d_merged gate query."""
    assert TIERS[to_tier] % TIERS[from_tier] == 0
    to_us = TIERS[to_tier] * 1_000_000
    return (
        counters.withColumn("w_us", F.expr(f"(w_us div {to_us}) * {to_us}"))
        .groupBy("w_us", "rw", "cl")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cm_estimate(
    counters: DataFrame,
    candidates: DataFrame,
    key_col: str = "conv_id",
) -> DataFrame:
    """Point-estimate each candidate key per bucket: min over the DEPTH
    rows of its counter. ``candidates`` must have (w_us, ``key_col``)
    rows; the join is an equi-join on (w_us, row, col) against the
    bounded counter relation, so the big side is the candidate set, not
    the sketch."""
    stack_args = ", ".join(
        f"{i}, {_col_sql(i, key_col)}" for i in range(DEPTH)
    )
    cells = candidates.select(
        "w_us",
        key_col,
        F.expr(f"stack({DEPTH}, {stack_args}) AS (rw, cl)"),
    )
    return (
        cells.join(counters, ["w_us", "rw", "cl"])
        .groupBy("w_us", key_col)
        .agg(F.min("cnt").alias("est"))
    )


def cm_heavy_hitters(
    transcripts: DataFrame | None = None,
    tier: str = "1h",
    key_col: str = "conv_id",
    k: int = 5,
    counters: DataFrame | None = None,
    to_tier: str | None = None,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Gate query: per tier bucket, the top-``k`` keys by count-min
    estimate (deterministic tiebreak on the key), with the exact count
    alongside — est >= exact_cnt always (one-sided error), equality when
    no collision, both verified row-by-row by the oracle.

    When ``counters`` is given it is used as the sketch state (e.g. the
    1h->1d merged state), while candidates/exact counts come from the
    ``tier``-level key_counts — pass ``counts`` (an already-materialized
    key_counts at ``tier``) and the whole computation derives from that
    one bounded relation with ZERO further raw scans; hash-equality of
    the merged path against the oracle's direct-from-raw computation is
    the mergeability proof."""
    bucket_tier = to_tier or tier
    if counts is None:
        counts = key_counts(transcripts, tier, key_col)
    exact = (
        _rebucket_counts(counts, bucket_tier)
        if bucket_tier != tier
        else counts
    ).withColumnRenamed("cnt", "exact_cnt")
    if counters is None:
        counters = cm_counters(tier=tier, key_col=key_col, counts=counts)
    est = cm_estimate(counters, exact.select("w_us", key_col), key_col)
    from pyspark.sql import Window

    ranked = (
        est.join(exact, ["w_us", key_col])
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("w_us").orderBy(
                    F.col("est").desc(), F.col(key_col)
                )
            ),
        )
        .filter(F.col("rank") <= k)
    )
    return ranked.select(
        F.expr(f"timestampadd(MICROSECOND, w_us, {EPOCH_NTZ})").alias(
            "bucket_start"
        ),
        key_col,
        "est",
        "exact_cnt",
        F.col("rank").cast("int").alias("rank"),
    )
