"""Streaming continuous-aggregate maintenance: the cascade store driven
by Structured Streaming instead of the batch bucket loop.

``foreachBatch`` turns every micro-batch of arriving transcript rows
into one ingest snapshot of the SAME store layout that
plans/cascade_store.run_cascade_store maintains:

1. the batch's rows — augmented with each series' carried boundary row
   (last (ts, turn_idx) across all previous batches, persisted next to
   the manifest) so the first in-batch turn of every series gets its
   exact inter-turn latency without rescanning history — are
   aggregated ONCE into mergeable 1m state and appended as
   ``state_1m/stream_<epoch>``;
2. a manifest partition record (the Iceberg-snapshot analogue) is
   appended with the batch's event-time range, rows and throughput;
3. the coarse tiers (1h/1d) are refreshed IN the batch callback via the
   shared ``refresh_cascade`` watermark machinery — only day-partitions
   overlapped by this epoch's range are merged and overwritten.

Exactness without batch alignment: micro-batches need NOT be window-
aligned. A 1m window split across two batches yields two partial state
rows; ``refresh_cascade``'s merge (sum/min/max + sorted-array flatten +
re-sort) reconstructs the exact multiset, so every coarse-tier column —
including interpolated percentiles — is bit-identical to the full
rebuild (asserted by the ``stream_cascade_*`` gate queries against the
full-rebuild rollup oracle). Boundary rows are marked and dropped after
the lag computation, so they contribute latency but never counts.

reference: flink/sources/InfluxAmpSourceFunction.scala:130-159,257-275
— the catch-up-then-subscribe lifecycle whose subscribe phase this is;
the batch store is the catch-up phase.

Scale shape: per batch, one shuffle of the batch's rows into 1m state
(tiny vs raw), plus coarse-tier merges that read only the affected
days' state. State on disk, not in executor memory — restarts resume
from the manifest like the batch store.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamevmon_spark.operators.rollup import (
    EPOCH_NTZ,
    SERIES_KEY,
)
from streamevmon_spark.operators.rollup import (
    _with_window_and_quant,
    add_inter_turn_latency_bucketed,
)
from streamevmon_spark.plans.cascade_store import (
    STATE_DIR,
    _state_agg_exprs,
    refresh_cascade,
)
from streamevmon_spark.plans.manifest import (
    Manifest,
    PartitionRecord,
    load_manifest,
    save_manifest,
)

STREAM_BOUNDARY_DIR = "stream_boundary"

_BOUNDARY_SCHEMA = (
    "conv_id string, tool string, role string, "
    "last_ts_us long, last_turn_idx int"
)


def _read_boundary(spark: SparkSession, out_dir: str) -> DataFrame:
    path = os.path.join(out_dir, STREAM_BOUNDARY_DIR)
    if os.path.isdir(path):
        return spark.read.parquet(path)
    return spark.createDataFrame([], _BOUNDARY_SCHEMA)


def _batch_state_1m(batch: DataFrame, boundary: DataFrame) -> DataFrame:
    """Mergeable 1m state of one micro-batch: boundary rows are
    injected for the lag computation and dropped before aggregation, so
    partial windows stay exact under merge."""
    prev_rows = boundary.select(
        *SERIES_KEY,
        F.col("last_turn_idx").alias("turn_idx"),
        F.lit(None).cast("string").alias("text"),
        F.expr(
            f"timestampadd(MICROSECOND, last_ts_us, {EPOCH_NTZ})"
        ).alias("ts"),
        F.lit(None).cast("double").alias("value"),
    ).withColumn("__is_boundary", F.lit(True))
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts",
            "value", "__is_boundary"]
    unioned = (
        batch.withColumn("__is_boundary", F.lit(False))
        .select(*cols)
        .unionByName(prev_rows.select(*cols))
    )
    with_lat = _with_window_and_quant(
        add_inter_turn_latency_bucketed(unioned), 60 * 1_000_000
    )
    return (
        with_lat.where(~F.col("__is_boundary"))
        .groupBy(*SERIES_KEY, "__w_us")
        .agg(*_state_agg_exprs())
    )


def _advance_boundary(
    spark: SparkSession, out_dir: str, batch: DataFrame
) -> None:
    """Fold the batch into the carried per-series boundary (atomic
    tmp-dir swap, same discipline as plans/maintenance compaction)."""
    path = os.path.join(out_dir, STREAM_BOUNDARY_DIR)
    prev = _read_boundary(spark, out_dir)
    batch_last = (
        batch.select(
            *SERIES_KEY,
            F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)").alias(
                "last_ts_us"
            ),
            F.col("turn_idx").alias("last_turn_idx"),
        )
    )
    merged = (
        prev.unionByName(batch_last)
        .groupBy(*SERIES_KEY)
        .agg(F.max(F.struct("last_ts_us", "last_turn_idx")).alias("m"))
        .select(
            *SERIES_KEY,
            F.col("m.last_ts_us").alias("last_ts_us"),
            F.col("m.last_turn_idx").alias("last_turn_idx"),
        )
    )
    tmp = path + ".__next"
    merged.write.mode("overwrite").parquet(tmp)
    old = path + ".__old"
    if os.path.isdir(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.isdir(old):
        import shutil

        shutil.rmtree(old)


def stream_cascade_store(
    spark: SparkSession,
    stream: DataFrame,
    out_dir: str,
    coarse_tiers: tuple[str, ...] = ("1h", "1d"),
    run_id: str | None = None,
) -> None:
    """Drain ``stream`` (availableNow) through the foreachBatch
    maintenance callback, leaving ``out_dir`` a valid cascade store
    readable with plans/cascade_store.read_cascade."""

    def handle(batch: DataFrame, epoch_id: int) -> None:
        if not batch.take(1):
            return
        t0 = time.monotonic()
        # persist (not localCheckpoint): the batch is re-read several
        # times (state, range stats, boundary advance) but its source
        # files are stable, so recompute-on-retry stays correct
        b = batch.persist()
        b.count()
        m = load_manifest(out_dir)
        if m is None:
            m = Manifest(
                run_id=run_id or uuid.uuid4().hex[:12],
                input_fingerprint="stream",
                tiers=["1m", *coarse_tiers],
                partitions=[],
            )
        part_id = f"stream_{int(epoch_id):06d}"
        if any(p.part_id == part_id for p in m.partitions):
            # checkpoint replay of an already-committed epoch (crash
            # between foreachBatch success and offset commit): the
            # state dir, manifest record and boundary advance are all
            # already durable — re-running would double-count
            b.unpersist()
            return
        boundary = _read_boundary(spark, out_dir)
        state = _batch_state_1m(b, boundary)
        dest = os.path.join(out_dir, STATE_DIR, part_id)
        state.write.mode("overwrite").parquet(dest)
        written = spark.read.parquet(dest)
        rng = b.agg(
            F.min(
                F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)")
            ).alias("lo"),
            F.max(
                F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)")
            ).alias("hi"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        _advance_boundary(spark, out_dir, b)
        wall = time.monotonic() - t0
        rec = PartitionRecord(
            part_id=part_id,
            start_us=int(rng["lo"]),
            end_us=int(rng["hi"]) + 1,
            status="done",
            rows_in=int(rng["n"]),
            rows_out={"state_1m": written.count()},
            wall_s=round(wall, 3),
            turns_per_sec=(
                round(rng["n"] / wall, 1) if wall > 0 else 0.0
            ),
            seq=max((p.seq for p in m.partitions), default=0) + 1,
        )
        m.partitions.append(rec)
        save_manifest(out_dir, m)
        refresh_cascade(spark, out_dir, coarse_tiers, manifest=m)
        b.unpersist()

    ckpt = os.path.join(out_dir, "_stream_ckpt")
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
