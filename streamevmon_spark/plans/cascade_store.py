"""Incremental (snapshot-range-driven) continuous-aggregate refresh.

The reference maintains its aggregates continuously: the catch-up loop
reads only measurements newer than the checkpointed offset and feeds
them into the running windows (reference:
flink/sources/InfluxAmpSourceFunction.scala:130-159,257-275). This is
the batch-over-table re-imagination: a manifest-tracked store where

- each ingest bucket (the Iceberg-snapshot analogue) is aggregated ONCE
  into 1m MERGEABLE state (integer sums / counts / min / max AND the
  sorted per-window latency array) written to ``state_1m/{part_id}``;
- the coarse tiers (1h / 1d) are never rebuilt from raw: a refresh pass
  recomputes ONLY the day-partitions overlapped by snapshot ranges
  newer than the tier's ``last_seq`` watermark, merging the stored 1m
  state of every bucket intersecting those days, and overwrites exactly
  those day-partitions (Spark dynamic partition overwrite — the Iceberg
  overwrite-partitions analogue). Untouched days are not read, not
  computed, not rewritten.

Exactness: merged state concatenates per-bucket sorted latency arrays
and re-sorts (``sort_array(flatten(collect_list(arr)))``) — the
identical multiset the full rebuild sees — so every column including
the interpolated percentiles is bit-identical to
``rollup_tiers_cascade_exact`` over the whole input (asserted in
tests/test_cascade_store.py and by the ``cascade_incremental_*`` gate
queries against the full-rebuild oracle).

Cross-bucket lag stays exact the same way the resumable pipeline's
does: each bucket's input is augmented with the per-series boundary row
from earlier buckets (plans/manifest.build_boundary_table), so the
first in-bucket turn of every series carries its true inter-turn
latency even though earlier raw rows are never rescanned.

Scale: a day of new data touches one day-partition per coarse tier; the
refresh reads the 1m state (thousands of rows per series-day, not raw
turns) of the few buckets overlapping it. At 10^12 turns the raw table
is read exactly once per ingest bucket, ever.
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
    TIERS,
    _raw_to_final,
    _with_window_and_quant,
    add_inter_turn_latency_bucketed,
)
from streamevmon_spark.plans.manifest import (
    BOUNDARY_DIR,
    Manifest,
    _fingerprint,
    build_boundary_table,
    load_manifest,
    plan_partitions,
    save_manifest,
)
from streamevmon_spark.plans.pipeline import ROLLUP_SCHEMA, _bucket_input

STATE_DIR = "state_1m"
DAY_US = 86400 * 1_000_000

#: default ingest bucket: 60 h — deliberately NOT a multiple of 1 d, so
#: 1d windows straddle bucket boundaries and the refresh genuinely
#: merges state across snapshots (a 1d-aligned bucket would hide that
#: path entirely)
DEFAULT_BUCKET_S = 216_000


def _state_agg_exprs() -> list:
    """The mergeable 1m aggregate spec of the cascade head
    (operators/rollup.rollup_tiers_cascade_exact) — shared by the batch
    store and the streaming store (streaming/cascade_stream.py)."""
    return [
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
    ]


def _state_1m(unioned: DataFrame) -> DataFrame:
    """Mergeable 1m aggregate state for one bucket's (boundary-
    augmented) rows: the same aggregate spec as the cascade head
    (operators/rollup.rollup_tiers_cascade_exact), keyed by the integer
    window start ``__w_us``."""
    win_us = 60 * 1_000_000
    with_lat = _with_window_and_quant(
        add_inter_turn_latency_bucketed(unioned), win_us
    )
    return with_lat.groupBy(*SERIES_KEY, "__w_us").agg(
        *_state_agg_exprs()
    )


def _merge_state(finer: DataFrame, win_us: int) -> DataFrame:
    """Merge finer mergeable state up into ``win_us`` windows — sorted
    array concatenation keeps even percentiles exact."""
    return (
        finer.withColumn(
            "__w_up", F.expr(f"(__w_us div {win_us}) * {win_us}")
        )
        .groupBy(*SERIES_KEY, F.col("__w_up").alias("__w_us"))
        .agg(
            F.sum("turn_count").alias("turn_count"),
            F.sum("lossy_count").alias("lossy_count"),
            F.sum("__lat_sum").alias("__lat_sum"),
            F.sum("__lat_cnt").alias("__lat_cnt"),
            F.min("__lat_min").alias("__lat_min"),
            F.max("__lat_max").alias("__lat_max"),
            F.sort_array(F.flatten(F.collect_list("__lat_arr"))).alias(
                "__lat_arr"
            ),
            F.sum("__val_sum").alias("__val_sum"),
            F.sum("__val_cnt").alias("__val_cnt"),
        )
    )


def run_cascade_store(
    spark: SparkSession,
    df: DataFrame,
    out_dir: str,
    input_path: str = "",
    coarse_tiers: tuple[str, ...] = ("1h", "1d"),
    bucket_s: int = DEFAULT_BUCKET_S,
    stop_after: int | None = None,
    run_id: str | None = None,
    refresh: bool = True,
    sketches: bool = False,
    hll: bool = False,
) -> Manifest:
    """Ingest all pending buckets into 1m state, then incrementally
    refresh the coarse tiers for the new snapshot ranges. Resumable and
    idempotent exactly like plans/pipeline.run_pipeline: a second call
    skips done buckets, and the refresh watermark skips already-
    incorporated snapshots."""
    manifest = load_manifest(out_dir)
    fp = _fingerprint(input_path) if input_path else "inline"
    if manifest is None or manifest.input_fingerprint != fp:
        manifest = Manifest(
            run_id=run_id or uuid.uuid4().hex[:12],
            input_fingerprint=fp,
            tiers=["1m", *coarse_tiers],
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
        unioned = _bucket_input(df, boundaries, part.start_us, part.end_us)
        state = _state_1m(unioned).where(
            (F.col("__w_us") >= part.start_us)
            & (F.col("__w_us") < part.end_us)
        )
        dest = os.path.join(out_dir, STATE_DIR, part.part_id)
        state.write.mode("overwrite").parquet(dest)
        # metrics from the (small) written state, not a raw rescan:
        # turn_count sums to exactly the bucket's raw rows (boundary
        # rows fall in out-of-bucket windows and were filtered)
        written = spark.read.parquet(dest)
        stats = written.groupBy("conv_id").agg(
            F.sum("turn_count").alias("n")
        )
        hot = stats.orderBy(F.desc("n"), "conv_id").limit(3).collect()
        rows_in = stats.agg(F.sum("n")).collect()[0][0] or 0
        wall = time.monotonic() - t0
        part.status = "done"
        part.seq = max((q.seq for q in manifest.partitions), default=0) + 1
        part.rows_in = int(rows_in)
        part.rows_out = {"state_1m": written.count()}
        part.wall_s = round(wall, 3)
        part.turns_per_sec = (
            round(rows_in / wall, 1) if wall > 0 else 0.0
        )
        part.hot_series = [[r["conv_id"], int(r["n"])] for r in hot]
        save_manifest(out_dir, manifest)
        done_now += 1

    if refresh:
        refresh_cascade(spark, out_dir, coarse_tiers, manifest=manifest)
    if sketches:
        refresh_sketch_cascade(
            spark, out_dir, coarse_tiers, manifest=manifest
        )
    if hll:
        refresh_hll_cascade(
            spark, out_dir, coarse_tiers, manifest=manifest
        )
    return manifest


def refresh_cascade(
    spark: SparkSession,
    out_dir: str,
    coarse_tiers: tuple[str, ...] = ("1h", "1d"),
    manifest: Manifest | None = None,
) -> dict[str, list[int]]:
    """Refresh each coarse tier for snapshot ranges newer than its
    watermark. Returns {tier: [refreshed epoch-day ids]} (empty lists =
    up to date). Only the overlapped day-partitions are read, merged
    and overwritten (dynamic partition overwrite)."""
    m = manifest or load_manifest(out_dir)
    if m is None:
        raise FileNotFoundError(f"no manifest under {out_dir}")
    done = [p for p in m.partitions if p.status == "done"]
    refreshed: dict[str, list[int]] = {}
    changed = False
    for tier in coarse_tiers:
        win_us = TIERS[tier] * 1_000_000
        entry = m.cascade.setdefault(
            tier, {"last_seq": 0, "days": [], "log": []}
        )
        new_parts = [p for p in done if p.seq > entry["last_seq"]]
        refreshed[tier] = []
        if not new_parts:
            continue
        # day-partitions overlapped by the new snapshot ranges — the
        # refresh/overwrite unit (1d windows == one day; 1h windows
        # nest inside one)
        days = sorted(
            {
                d
                for p in new_parts
                for d in range(
                    p.start_us // DAY_US,
                    (p.end_us + DAY_US - 1) // DAY_US,
                )
            }
        )
        lo_us, hi_us = days[0] * DAY_US, (days[-1] + 1) * DAY_US
        # every done bucket intersecting an affected day contributes
        # state (old snapshots included — that IS the merge)
        paths = [
            os.path.join(out_dir, STATE_DIR, p.part_id)
            for p in done
            if p.start_us < hi_us and p.end_us > lo_us
        ]
        day_set = set(days)
        state = (
            spark.read.parquet(*paths)
            .withColumn("__cday", F.expr(f"__w_us div {DAY_US}"))
            .where(F.col("__cday").isin(*day_set))
        )
        merged = _merge_state(state, win_us)
        out = _raw_to_final(merged, TIERS[tier]).withColumn(
            "__cday",
            F.expr(
                f"datediff(MICROSECOND, {EPOCH_NTZ}, window_start)"
                f" div {DAY_US}"
            ),
        )
        dest = os.path.join(out_dir, f"cascade_{tier}")
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__cday")
            .parquet(dest)
        )
        entry["last_seq"] = max(p.seq for p in new_parts)
        # record only days that produced output: an affected day with
        # no windows (bucket grid overhang past the data) writes no
        # partition dir, and readers must not ask for it
        on_disk = {
            int(n.split("=")[1])
            for n in os.listdir(dest)
            if n.startswith("__cday=")
        }
        entry["days"] = sorted((set(entry["days"]) | day_set) & on_disk)
        entry["log"].append(
            {
                "seqs": sorted(p.seq for p in new_parts),
                "days": days,
            }
        )
        refreshed[tier] = days
        changed = True
    if changed:
        save_manifest(out_dir, m)
    return refreshed


SKETCH_STATE_DIR = "sketch_1m"


def _sketch_state_from_exact(state: DataFrame) -> DataFrame:
    """1m t-digest blobs derived from the stored exact 1m state.

    ``__lat_arr`` is the sorted non-null latency multiset of the window
    and ``TDigest.build`` NaN-filters and sorts, so these blobs are
    bit-identical to ``sketch_rollup.sketch_tier(raw, "1m")`` over the
    same input (asserted in tests/test_cascade_store.py) — the sketch
    tier is maintained from compact 1m state, never from a raw rescan."""
    from streamevmon_spark.operators.sketch_rollup import _SKETCH_SCHEMA

    def to_blobs(it):
        import numpy as np
        import pandas as pd

        from streamevmon_spark.functions.tdigest import TDigest

        for pdf in it:
            blobs = [
                TDigest.build(
                    np.asarray(a, dtype=np.float64) / 1e6
                ).to_bytes()
                for a in pdf["__lat_arr"]
            ]
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"],
                    "tool": pdf["tool"],
                    "role": pdf["role"],
                    "window_start_us": pdf["__w_us"].astype("int64"),
                    "latency_tdigest": blobs,
                }
            )

    return state.select(*SERIES_KEY, "__w_us", "__lat_arr").mapInPandas(
        to_blobs, _SKETCH_SCHEMA
    )


def refresh_sketch_cascade(
    spark: SparkSession,
    out_dir: str,
    coarse_tiers: tuple[str, ...] = ("1h", "1d"),
    manifest: Manifest | None = None,
) -> dict[str, list[int]]:
    """Incrementally maintain the t-digest sketch tiers (north rule:
    'inter-turn latency percentiles via t-digest sketches ...
    maintained incrementally per tier').

    Same watermark/day-partition mechanics as refresh_cascade, under
    independent ``sketch_{tier}`` manifest keys: only coarse-tier
    day-partitions overlapped by snapshot ranges newer than the tier's
    watermark are recomputed, by canonical (sorted-blob) merge of the
    per-bucket 1m sketches — raw turns are never rescanned. Missing
    per-bucket ``sketch_1m`` dirs are lazily derived from the stored
    exact 1m state, so a store ingested before sketches were enabled
    upgrades in place."""
    m = manifest or load_manifest(out_dir)
    if m is None:
        raise FileNotFoundError(f"no manifest under {out_dir}")
    from streamevmon_spark.operators.sketch_rollup import cascade_sketches

    done = [p for p in m.partitions if p.status == "done"]
    refreshed: dict[str, list[int]] = {}
    changed = False
    for tier in coarse_tiers:
        key = f"sketch_{tier}"
        win_us = TIERS[tier] * 1_000_000
        entry = m.cascade.setdefault(
            key, {"last_seq": 0, "days": [], "log": []}
        )
        new_parts = [p for p in done if p.seq > entry["last_seq"]]
        refreshed[tier] = []
        if not new_parts:
            continue
        days = sorted(
            {
                d
                for p in new_parts
                for d in range(
                    p.start_us // DAY_US,
                    (p.end_us + DAY_US - 1) // DAY_US,
                )
            }
        )
        lo_us, hi_us = days[0] * DAY_US, (days[-1] + 1) * DAY_US
        contributing = [
            p
            for p in done
            if p.start_us < hi_us and p.end_us > lo_us
        ]
        paths = []
        for p in contributing:
            sp = os.path.join(out_dir, SKETCH_STATE_DIR, p.part_id)
            if not os.path.isdir(sp):
                state = spark.read.parquet(
                    os.path.join(out_dir, STATE_DIR, p.part_id)
                )
                _sketch_state_from_exact(state).write.mode(
                    "overwrite"
                ).parquet(sp)
            paths.append(sp)
        day_set = set(days)
        fine = (
            spark.read.parquet(*paths)
            .withColumn(
                "__cday", F.expr(f"window_start_us div {DAY_US}")
            )
            .where(F.col("__cday").isin(*day_set))
            .drop("__cday")
        )
        merged = cascade_sketches(fine, tier).withColumn(
            "__cday", F.expr(f"window_start_us div {DAY_US}")
        )
        dest = os.path.join(out_dir, key)
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__cday")
            .parquet(dest)
        )
        entry["last_seq"] = max(p.seq for p in new_parts)
        on_disk = {
            int(n.split("=")[1])
            for n in os.listdir(dest)
            if n.startswith("__cday=")
        }
        entry["days"] = sorted((set(entry["days"]) | day_set) & on_disk)
        entry["log"].append(
            {"seqs": sorted(p.seq for p in new_parts), "days": days}
        )
        refreshed[tier] = days
        changed = True
    if changed:
        save_manifest(out_dir, m)
    return refreshed


HLL_STATE_DIR = "hll_1m"


def _hll_state_from_exact(state: DataFrame) -> DataFrame:
    """1m HLL register state derived from the stored exact 1m state.

    A state row (conv_id, tool, role, __w_us) exists iff that series
    had >= 1 turn in that 1m window — exactly the presence set
    operators/hll.hll_registers sees over raw turns — so the registers
    derived here are identical to a raw-side 1m computation, and the
    max-merged coarse tiers are bit-identical to direct-from-raw
    (proved by the hll_incremental_* gate queries against the direct
    oracle). Shuffle volume: <= 64 register rows per (window, tool,
    role) group, independent of turn count."""
    from streamevmon_spark.functions.porthash import hex48_sql
    from streamevmon_spark.operators.hll import M, REM_BITS

    h = hex48_sql("conv_id")
    return (
        state.select(
            F.col("__w_us").alias("w_us"),
            "tool",
            "role",
            F.expr(f"{h} % {M}").cast("int").alias("reg"),
            F.expr(f"{h} div {M}").alias("r"),
        )
        .withColumn(
            "max_rank",
            F.when(F.col("r") == 0, F.lit(REM_BITS + 1))
            .otherwise(F.lit(REM_BITS + 1) - F.length(F.expr("bin(r)")))
            .cast("int"),
        )
        .drop("r")
        .groupBy("w_us", "tool", "role", "reg")
        .agg(F.max("max_rank").alias("max_rank"))
    )


def refresh_hll_cascade(
    spark: SparkSession,
    out_dir: str,
    coarse_tiers: tuple[str, ...] = ("1h", "1d"),
    manifest: Manifest | None = None,
) -> dict[str, list[int]]:
    """Incrementally maintain the HLL distinct-conversation register
    tiers (the third mergeable sketch face of the store, alongside the
    exact state and the t-digests).

    Same watermark/day-partition mechanics as refresh_sketch_cascade,
    under independent ``hll_{tier}`` manifest keys: only coarse-tier
    day-partitions overlapped by snapshot ranges newer than the tier's
    watermark are recomputed, by max-merge of per-bucket 1m register
    state — raw turns are never rescanned. Missing per-bucket
    ``hll_1m`` dirs are lazily derived from the stored exact 1m state
    (in-place upgrade, like the sketch face)."""
    m = manifest or load_manifest(out_dir)
    if m is None:
        raise FileNotFoundError(f"no manifest under {out_dir}")
    done = [p for p in m.partitions if p.status == "done"]
    refreshed: dict[str, list[int]] = {}
    changed = False
    for tier in coarse_tiers:
        key = f"hll_{tier}"
        win_us = TIERS[tier] * 1_000_000
        entry = m.cascade.setdefault(
            key, {"last_seq": 0, "days": [], "log": []}
        )
        new_parts = [p for p in done if p.seq > entry["last_seq"]]
        refreshed[tier] = []
        if not new_parts:
            continue
        days = sorted(
            {
                d
                for p in new_parts
                for d in range(
                    p.start_us // DAY_US,
                    (p.end_us + DAY_US - 1) // DAY_US,
                )
            }
        )
        lo_us, hi_us = days[0] * DAY_US, (days[-1] + 1) * DAY_US
        contributing = [
            p for p in done if p.start_us < hi_us and p.end_us > lo_us
        ]
        paths = []
        for p in contributing:
            hp = os.path.join(out_dir, HLL_STATE_DIR, p.part_id)
            if not os.path.isdir(hp):
                state = spark.read.parquet(
                    os.path.join(out_dir, STATE_DIR, p.part_id)
                )
                _hll_state_from_exact(state).write.mode(
                    "overwrite"
                ).parquet(hp)
            paths.append(hp)
        day_set = set(days)
        fine = (
            spark.read.parquet(*paths)
            .withColumn("__cday", F.expr(f"w_us div {DAY_US}"))
            .where(F.col("__cday").isin(*day_set))
            .drop("__cday")
        )
        merged = (
            fine.withColumn(
                "w_us", F.expr(f"(w_us div {win_us}) * {win_us}")
            )
            .groupBy("w_us", "tool", "role", "reg")
            .agg(F.max("max_rank").alias("max_rank"))
            .withColumn("__cday", F.expr(f"w_us div {DAY_US}"))
        )
        dest = os.path.join(out_dir, key)
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__cday")
            .parquet(dest)
        )
        entry["last_seq"] = max(p.seq for p in new_parts)
        on_disk = {
            int(n.split("=")[1])
            for n in os.listdir(dest)
            if n.startswith("__cday=")
        }
        entry["days"] = sorted((set(entry["days"]) | day_set) & on_disk)
        entry["log"].append(
            {"seqs": sorted(p.seq for p in new_parts), "days": days}
        )
        refreshed[tier] = days
        changed = True
    if changed:
        save_manifest(out_dir, m)
    return refreshed


def read_hll_cascade(
    spark: SparkSession, out_dir: str, tier: str
) -> DataFrame:
    """The continuously-maintained HLL register tier: manifest-tracked
    day-partitions of (w_us, tool, role, reg, max_rank) — collapse with
    operators/hll.hll_summary, estimate with hll_estimate."""
    m = load_manifest(out_dir)
    entry = (m.cascade if m else {}).get(f"hll_{tier}")
    if not entry or not entry["days"]:
        return spark.createDataFrame(
            [],
            "w_us long, tool string, role string, reg int, max_rank int",
        )
    root = os.path.join(out_dir, f"hll_{tier}")
    return (
        spark.read.option("basePath", root)
        .parquet(
            *[os.path.join(root, f"__cday={d}") for d in entry["days"]]
        )
        .drop("__cday")
    )


def read_sketch_cascade(
    spark: SparkSession, out_dir: str, tier: str
) -> DataFrame:
    """The continuously-maintained sketch tier: manifest-tracked
    day-partitions of (series, window_start_us, latency_tdigest)."""
    m = load_manifest(out_dir)
    entry = (m.cascade if m else {}).get(f"sketch_{tier}")
    if not entry or not entry["days"]:
        from streamevmon_spark.operators.sketch_rollup import (
            _SKETCH_SCHEMA,
        )

        return spark.createDataFrame([], _SKETCH_SCHEMA)
    root = os.path.join(out_dir, f"sketch_{tier}")
    return (
        spark.read.option("basePath", root)
        .parquet(
            *[os.path.join(root, f"__cday={d}") for d in entry["days"]]
        )
        .drop("__cday")
    )


def read_cascade(
    spark: SparkSession, out_dir: str, tier: str
) -> DataFrame:
    """The continuously-maintained coarse rollup: manifest-tracked
    day-partitions, public rollup columns."""
    m = load_manifest(out_dir)
    entry = (m.cascade if m else {}).get(tier)
    if not entry or not entry["days"]:
        return spark.createDataFrame([], ROLLUP_SCHEMA)
    root = os.path.join(out_dir, f"cascade_{tier}")
    return (
        spark.read.option("basePath", root)
        .parquet(
            *[os.path.join(root, f"__cday={d}") for d in entry["days"]]
        )
        .drop("__cday")
    )


# ---------------------------------------------------------------------------
# Mergeable-state coarse tiers (the tier-router's stored read targets)
# ---------------------------------------------------------------------------


def refresh_state_cascade(
    spark: SparkSession,
    out_dir: str,
    coarse_tiers: tuple[str, ...] = ("1h", "1d"),
    manifest: Manifest | None = None,
) -> dict[str, list[int]]:
    """Incrementally maintain MERGEABLE coarse-tier state (the exact
    per-window aggregate incl. the sorted latency array), alongside the
    final rollup tiers refresh_cascade writes.

    refresh_cascade's ``cascade_{tier}`` partitions are FINAL rows
    (averages, percentiles) — readable but not further mergeable; the
    tier router (operators/tier_router.realtime_range_agg) needs
    mergeable rows so an arbitrary range's segments can be combined
    exactly. Same watermark/day-partition mechanics under independent
    ``state_{tier}`` manifest keys; derived from the stored 1m state,
    raw never rescanned; a store ingested before this face existed
    upgrades lazily in place (same lifecycle as the sketch/HLL faces).
    """
    m = manifest or load_manifest(out_dir)
    if m is None:
        raise FileNotFoundError(f"no manifest under {out_dir}")
    done = [p for p in m.partitions if p.status == "done"]
    refreshed: dict[str, list[int]] = {}
    changed = False
    for tier in coarse_tiers:
        key = f"state_{tier}"
        win_us = TIERS[tier] * 1_000_000
        entry = m.cascade.setdefault(
            key, {"last_seq": 0, "days": [], "log": []}
        )
        new_parts = [p for p in done if p.seq > entry["last_seq"]]
        refreshed[tier] = []
        if not new_parts:
            continue
        days = sorted(
            {
                d
                for p in new_parts
                for d in range(
                    p.start_us // DAY_US,
                    (p.end_us + DAY_US - 1) // DAY_US,
                )
            }
        )
        lo_us, hi_us = days[0] * DAY_US, (days[-1] + 1) * DAY_US
        paths = [
            os.path.join(out_dir, STATE_DIR, p.part_id)
            for p in done
            if p.start_us < hi_us and p.end_us > lo_us
        ]
        day_set = set(days)
        state = (
            spark.read.parquet(*paths)
            .withColumn("__cday", F.expr(f"__w_us div {DAY_US}"))
            .where(F.col("__cday").isin(*day_set))
            .drop("__cday")
        )
        merged = _merge_state(state, win_us).withColumn(
            "__cday", F.expr(f"__w_us div {DAY_US}")
        )
        dest = os.path.join(out_dir, key)
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__cday")
            .parquet(dest)
        )
        entry["last_seq"] = max(p.seq for p in new_parts)
        on_disk = {
            int(n.split("=")[1])
            for n in os.listdir(dest)
            if n.startswith("__cday=")
        }
        entry["days"] = sorted((set(entry["days"]) | day_set) & on_disk)
        entry["log"].append(
            {"seqs": sorted(p.seq for p in new_parts), "days": days}
        )
        refreshed[tier] = days
        changed = True
    if changed:
        save_manifest(out_dir, m)
    return refreshed


def read_state_tier(
    spark: SparkSession, out_dir: str, tier: str
) -> DataFrame | None:
    """Mergeable state for one tier: the per-bucket 1m dirs, or a
    coarse tier's manifest-tracked day-partitions (None if that face
    was never refreshed — the router then derives from 1m)."""
    m = load_manifest(out_dir)
    if m is None:
        raise FileNotFoundError(f"no manifest under {out_dir}")
    if tier == "1m":
        paths = [
            os.path.join(out_dir, STATE_DIR, p.part_id)
            for p in m.partitions
            if p.status == "done"
        ]
        return spark.read.parquet(*paths) if paths else None
    entry = m.cascade.get(f"state_{tier}")
    if not entry or not entry["days"]:
        return None
    root = os.path.join(out_dir, f"state_{tier}")
    return (
        spark.read.option("basePath", root)
        .parquet(
            *[os.path.join(root, f"__cday={d}") for d in entry["days"]]
        )
        .drop("__cday")
    )


def range_agg_from_store(
    spark: SparkSession,
    out_dir: str,
    t0_us: int | None = None,
    t1_us: int | None = None,
) -> DataFrame:
    """Exact per-series range aggregate answered ENTIRELY from the
    store: interior days from state_1d rows, edges from state_1h /
    per-bucket 1m state — raw is never opened (there is no raw handle
    in scope to open). Default bounds replay default_range_us on the
    1m state's window extrema: min(__w_us) and max(__w_us) floor the
    same minutes as the raw min/max timestamps, so the bounds are
    IDENTICAL to the raw-derived ones the driver oracle computes."""
    from streamevmon_spark.operators.tier_router import (
        default_range_us,
        realtime_range_agg,
    )

    m1 = read_state_tier(spark, out_dir, "1m")
    if m1 is None:
        raise FileNotFoundError(f"no ingested 1m state under {out_dir}")
    if t0_us is None or t1_us is None:
        row = m1.select(
            F.min("__w_us").alias("mn"), F.max("__w_us").alias("mx")
        ).collect()[0]
        t0_us, t1_us = default_range_us(row.mn, row.mx)
    return realtime_range_agg(
        None,
        t0_us,
        t1_us,
        state_1m=m1,
        state_1h=read_state_tier(spark, out_dir, "1h"),
        state_1d=read_state_tier(spark, out_dir, "1d"),
    )
