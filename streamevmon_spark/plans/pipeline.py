"""Resumable partitioned rollup pipeline.

run_pipeline(): process the transcripts table bucket-by-bucket, writing
idempotent per-(tier, bucket) parquet outputs and updating the checkpoint
manifest after each bucket (lineage + throughput + skew metrics). A
killed run resumes by skipping buckets marked done; tests assert the
resumed output is byte-identical to a single full run (FIXTURES.md §5).

The bucket-local inter-turn lag is made exact by injecting each series'
boundary row from the previous buckets (plans/manifest.py) — only rollup
windows inside the bucket are emitted, so bucket outputs never overlap
and re-runs overwrite identically (idempotent-MERGE semantics, reference:
flink/sinks/InfluxSinkFunction.scala:176-213).
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
    rollup_tier,
)
from streamevmon_spark.plans.manifest import (
    BOUNDARY_DIR,
    Manifest,
    build_boundary_table,
    _fingerprint,
    load_manifest,
    plan_partitions,
    save_manifest,
)


def _bucket_input(
    df: DataFrame,
    boundaries: DataFrame,
    start_us: int,
    end_us: int,
) -> DataFrame:
    """One bucket's rows plus each series' latest pre-bucket boundary
    row (injected so the first in-bucket turn gets its exact lag)."""
    ts_us = F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)")
    in_bucket = df.where((ts_us >= start_us) & (ts_us < end_us))
    # latest boundary row strictly before this bucket, per series (tiny)
    prev = (
        boundaries.where(F.col("__bucket") < start_us)
        .groupBy(*SERIES_KEY)
        .agg(F.max(F.struct("last_ts_us", "last_turn_idx")).alias("b"))
        .select(
            *SERIES_KEY,
            F.expr(f"timestampadd(MICROSECOND, b.last_ts_us, {EPOCH_NTZ})")
            .alias("ts"),
            F.col("b.last_turn_idx").alias("turn_idx"),
            F.lit(None).cast("string").alias("text"),
            F.lit(None).cast("double").alias("value"),
        )
    )
    return in_bucket.unionByName(
        prev.select(
            "conv_id", "turn_idx", "role", "text", "tool", "ts", "value"
        ),
        allowMissingColumns=False,
    )


def _in_bucket_windows(rolled: DataFrame, start_us: int, end_us: int):
    # boundary rows sit in earlier windows; keep only this bucket's
    # windows. Their own (boundary) row adds a spurious window outside
    # the bucket and contributes nothing inside it except the exact lag
    # for the first real turn of each series.
    ws_us = F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, window_start)")
    return rolled.where((ws_us >= start_us) & (ws_us < end_us))


def _bucket_rollup(
    spark: SparkSession,
    df: DataFrame,
    boundaries: DataFrame,
    start_us: int,
    end_us: int,
    tier: str,
) -> DataFrame:
    """Rollup restricted to one bucket, with exact cross-bucket lag."""
    unioned = _bucket_input(df, boundaries, start_us, end_us)
    return _in_bucket_windows(rollup_tier(unioned, tier), start_us, end_us)


def run_pipeline(
    spark: SparkSession,
    df: DataFrame,
    out_dir: str,
    input_path: str = "",
    tiers: tuple[str, ...] = ("1m", "1h", "1d"),
    bucket_s: int = 86400,
    stop_after: int | None = None,
    run_id: str | None = None,
    cascade: bool = False,
) -> Manifest:
    """Process all pending buckets; return the final manifest.

    ``stop_after=k`` halts after k buckets (simulates a killed run; the
    next call resumes). Outputs land at out_dir/rollup_{tier}/{part_id}/.

    ``cascade=True`` is the continuous-aggregate maintenance topology
    per bucket: the raw rows are aggregated ONCE into 1m mergeable
    state and the 1h/1d tiers derive from that state
    (operators/rollup.rollup_tiers_cascade_exact — bit-exact vs the
    per-tier rollups incl. percentiles), instead of one raw scan per
    tier. This is the 10^12-turn shape: coarser tiers never rescan raw.
    Output files are identical either way; the default stays the
    per-tier path because it supports arbitrary tier subsets without
    computing the 1m state.
    """
    manifest = load_manifest(out_dir)
    fp = _fingerprint(input_path) if input_path else "inline"
    if manifest is None or manifest.input_fingerprint != fp:
        manifest = Manifest(
            run_id=run_id or uuid.uuid4().hex[:12],
            input_fingerprint=fp,
            tiers=list(tiers),
            partitions=plan_partitions(df, bucket_s),
        )
        save_manifest(out_dir, manifest)
    bpath = os.path.join(out_dir, BOUNDARY_DIR)
    if os.path.exists(bpath):
        boundaries = spark.read.parquet(bpath)
    else:
        boundaries = build_boundary_table(spark, df, out_dir, bucket_s)

    done_now = 0
    for part in manifest.partitions:
        if part.status == "done":
            continue
        if stop_after is not None and done_now >= stop_after:
            break
        t0 = time.monotonic()
        ts_us = F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)")
        bucket_df = df.where(
            (ts_us >= part.start_us) & (ts_us < part.end_us)
        )
        rows_in = bucket_df.count()
        hot = (
            bucket_df.groupBy("conv_id")
            .count()
            .orderBy(F.desc("count"), "conv_id")
            .limit(3)
            .collect()
        )
        rows_out: dict[str, int] = {}
        if cascade:
            from streamevmon_spark.operators.rollup import (
                rollup_tiers_cascade_exact,
            )

            unknown = set(tiers) - {"1m", "1h", "1d"}
            if unknown:
                raise ValueError(
                    f"cascade mode supports tiers 1m/1h/1d, got {unknown}"
                )
            unioned = _bucket_input(
                df, boundaries, part.start_us, part.end_us
            )
            res = rollup_tiers_cascade_exact(
                unioned, persist_intermediate=True
            )
            try:
                for tier in tiers:
                    out = _in_bucket_windows(
                        res[tier], part.start_us, part.end_us
                    )
                    dest = os.path.join(
                        out_dir, f"rollup_{tier}", part.part_id
                    )
                    out.write.mode("overwrite").parquet(dest)
                    rows_out[tier] = spark.read.parquet(dest).count()
            finally:
                for state in res["_state"]:
                    state.unpersist()
        else:
            for tier in tiers:
                out = _bucket_rollup(
                    spark, df, boundaries, part.start_us, part.end_us,
                    tier,
                )
                dest = os.path.join(
                    out_dir, f"rollup_{tier}", part.part_id
                )
                out.write.mode("overwrite").parquet(dest)
                rows_out[tier] = spark.read.parquet(dest).count()
        wall = time.monotonic() - t0
        part.status = "done"
        part.seq = max((q.seq for q in manifest.partitions), default=0) + 1
        part.rows_in = rows_in
        part.rows_out = rows_out
        part.wall_s = round(wall, 3)
        part.turns_per_sec = round(rows_in / wall, 1) if wall > 0 else 0.0
        part.hot_series = [[r["conv_id"], r["count"]] for r in hot]
        save_manifest(out_dir, manifest)
        done_now += 1
    return manifest


# Static rollup output schema (mirrors operators/rollup.py:180-210) so
# an as-of read at snapshot 0 — or over a run halted before its first
# bucket — can return an empty DataFrame without touching the output dir.
ROLLUP_SCHEMA = (
    "conv_id string, tool string, role string, "
    "window_start timestamp_ntz, window_end timestamp_ntz, "
    "turn_count bigint, lossy_count bigint, "
    "lat_avg double, lat_min double, lat_max double, "
    "lat_p50 double, lat_p95 double, lat_p99 double, "
    "val_avg double, activity_rate double"
)


def read_rollup(spark: SparkSession, out_dir: str, tier: str) -> DataFrame:
    """Current live rollup for ``tier``: manifest-selected partition
    paths (done, not expired by retention maintenance) — never a bare
    glob, so tombstoned partitions and any crash-left temp dirs from a
    compaction rewrite are invisible to readers."""
    manifest = load_manifest(out_dir)
    if manifest is None:
        # pre-manifest layout (or direct dirs): fall back to the glob
        return spark.read.parquet(
            os.path.join(out_dir, f"rollup_{tier}", "*")
        )
    paths = [
        os.path.join(out_dir, f"rollup_{tier}", part.part_id)
        for part in manifest.partitions
        if part.status == "done" and tier not in part.expired_tiers
    ]
    if not paths:
        return spark.createDataFrame([], ROLLUP_SCHEMA)
    return spark.read.parquet(*paths)


def read_rollup_as_of(
    spark: SparkSession, out_dir: str, tier: str, snapshot: int
) -> DataFrame:
    """Time-travel read: the rollup output as of completion-snapshot
    ``snapshot`` — exactly the partitions whose ``seq`` (assigned in
    completion order, the Iceberg snapshot-id analogue) is <= snapshot.
    Because buckets are written idempotently to per-partition subdirs,
    an as-of read is a pure path selection — no data is rewritten or
    copied to keep history.

    Partitions expired by retention maintenance (plans/maintenance.py)
    are excluded even when their seq qualifies — the Iceberg
    expire-snapshots contract: history older than the expiry is no
    longer reproducible, and the read degrades to the surviving set
    instead of raising on the deleted path."""
    manifest = load_manifest(out_dir)
    if manifest is None:
        raise FileNotFoundError(f"no manifest under {out_dir}")
    paths = [
        os.path.join(out_dir, f"rollup_{tier}", part.part_id)
        for part in manifest.partitions
        if part.status == "done" and 0 < part.seq <= snapshot
        and tier not in part.expired_tiers
    ]
    if not paths:
        return spark.createDataFrame([], ROLLUP_SCHEMA)
    return spark.read.parquet(*paths)


def latest_snapshot(out_dir: str) -> int:
    """Highest completion-sequence number in the manifest (0 = empty)."""
    manifest = load_manifest(out_dir)
    if manifest is None:
        return 0
    return max((p.seq for p in manifest.partitions), default=0)
