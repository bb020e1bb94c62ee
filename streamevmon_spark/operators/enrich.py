"""Join-like operators: dimension enrichment and positional zip.

The reference has no relational joins — its three join-like stateful
patterns map to two Spark operators:

- ``enrich_broadcast``: the MeasurementMetaExtractor / enrichMeasurement
  pattern (reference: measurements/MeasurementMetaExtractor.scala:69-131,
  measurements/traits/InfluxMeasurementFactory.scala:225-241): per-series
  dimension lookup, cached in the reference, a **broadcast hash join**
  here — the dim table ships once per executor, no shuffle of the fact
  stream, no per-key cache to invalidate. Left join ⇒ measurements with
  no meta pass through with NULL meta (the extractor's buffer-until-meta
  becomes unnecessary in batch).
- ``zip_streams``: ZipFunction (reference: flink/ZipFunction.scala:44-104)
  — positional pairing of two streams like Seq.zip, buffering the faster
  side. In Spark: row_number each side on its stable order and equi-join
  on the index; the shorter side bounds the output exactly like the
  reference's buffer drain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def enrich_broadcast(
    fact: DataFrame,
    meta: DataFrame,
    fact_key: str,
    meta_key: str,
    meta_cols: list[str],
) -> DataFrame:
    """Left broadcast-hash enrichment of a fact stream with a small
    dimension table. ``meta_cols`` are the projected dimension columns —
    column pruning keeps the broadcast payload minimal."""
    dim = meta.select(F.col(meta_key).alias("__mk"), *meta_cols)
    return (
        fact.join(
            F.broadcast(dim), fact.__getattr__(fact_key) == F.col("__mk"),
            "left",
        )
        .drop("__mk")
    )


def zip_streams(
    left: DataFrame,
    right: DataFrame,
    order_cols: list[str],
    left_prefix: str = "a_",
    right_prefix: str = "b_",
) -> DataFrame:
    """Positional zip of two streams ordered by ``order_cols`` (which
    must be a total order — ties would make any engine's ordinal
    assignment arbitrary).

    Distributed ordinal assignment (the zipWithIndex pattern) instead of
    a single-task global row_number: each side is range-partitioned on
    the order key, ranked within its partitions in parallel, and offset
    by a prefix sum over the tiny per-partition count table — the global
    ordinal is identical to a total-order row_number, but no task ever
    sorts more than one range partition. (The reference serialised both
    streams through one operator instance, flink/ZipFunction.scala:44-104
    — this is the parallelism-1 defect the engine removes.)
    """
    def numbered(df: DataFrame, prefix: str) -> DataFrame:
        ranged = df.repartitionByRange(*order_cols).withColumn(
            "__pid", F.spark_partition_id()
        )
        w_local = Window.partitionBy("__pid").orderBy(*order_cols)
        local = ranged.withColumn("__lrk", F.row_number().over(w_local) - 1)
        counts = local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
        # tiny table: one row per range partition
        w_off = Window.orderBy("__pid").rowsBetween(
            Window.unboundedPreceding, -1
        )
        offs = counts.withColumn(
            "__off", F.coalesce(F.sum("__n").over(w_off), F.lit(0))
        ).select("__pid", "__off")
        cols = [F.col(c).alias(f"{prefix}{c}") for c in df.columns]
        return local.join(offs, "__pid").select(
            (F.col("__off") + F.col("__lrk")).alias("__zip_idx"), *cols
        )

    return numbered(left, left_prefix).join(
        numbered(right, right_prefix), "__zip_idx"
    ).withColumnRenamed("__zip_idx", "zip_idx")


def asof_enrich(
    facts: DataFrame,
    dim: DataFrame,
    key_cols: list[str],
    fact_ts: str = "ts",
    dim_ts: str = "ts",
    payload_cols: list[str] | None = None,
    dim_ts_out: str = "asof_ts",
) -> DataFrame:
    """As-of (point-in-time) enrichment: each fact row gets the payload
    of the LATEST dim row with the same key and dim_ts <= fact_ts —
    the batch semantics of the reference's periodically-refreshed
    metadata lookup (reference: measurements/MeasurementMetaExtractor
    .scala:69-131 caches "the metadata state current at processing
    time"; over a historical table the state current at each row's
    EVENT time is the faithful replay).

    Scale shape: tag + union both inputs, one hash-partition on the key,
    one ordered window pass with last(ignorenulls) — a single shuffle,
    whole-stage codegen end-to-end, no range-join explosion and no
    broadcast (the dim side may be as large as the facts). Ties at
    equal timestamps resolve dim-before-fact, so a fact at exactly
    dim_ts sees that dim row (ASOF >= semantics, matching DuckDB's
    ASOF JOIN used as the oracle).
    """
    payload_cols = payload_cols or [
        c for c in dim.columns if c not in (*key_cols, dim_ts)
    ]
    fact_cols = [
        c for c in facts.columns if c not in (*key_cols, fact_ts)
    ]
    f = facts.select(
        *key_cols,
        F.col(fact_ts).alias("__t"),
        F.lit(1).alias("__is_fact"),
        *[F.col(c) for c in fact_cols],
        F.lit(None).cast(
            dim.schema[dim_ts].dataType
        ).alias(f"__d_{dim_ts}"),
        *[
            F.lit(None).cast(dim.schema[c].dataType).alias(f"__d_{c}")
            for c in payload_cols
        ],
    )
    d = dim.select(
        *key_cols,
        F.col(dim_ts).alias("__t"),
        F.lit(0).alias("__is_fact"),
        *[F.lit(None).cast(f.schema[c].dataType).alias(c) for c in fact_cols],
        F.col(dim_ts).alias(f"__d_{dim_ts}"),
        *[F.col(c).alias(f"__d_{c}") for c in payload_cols],
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("__t", "__is_fact")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = f.unionByName(d).select(
        "*",
        F.last(f"__d_{dim_ts}", ignorenulls=True).over(w).alias(dim_ts_out),
        *[
            F.last(f"__d_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in payload_cols
        ],
    )
    return filled.where(F.col("__is_fact") == 1).select(
        *key_cols,
        F.col("__t").alias(fact_ts),
        *fact_cols,
        dim_ts_out,
        *[f"asof_{c}" for c in payload_cols],
    )
