"""Store maintenance over a pipeline output directory: tier-
differentiated retention expiry and small-file partition compaction —
the Iceberg ``expire_snapshots`` / ``rewrite_data_files`` analogues for
the manifest-tracked rollup store (plans/pipeline.py).

Semantics (north rule: "rollup + downsample + retention engine ...
resumable from a checkpoint manifest recording per-partition lineage"):

- ``run_maintenance(spark, out_dir, now_us, retention)`` expires, per
  tier, every DONE day-bucket whose whole range is older than that
  tier's retention window (``part.end_us <= now_us - retention_us``).
  The physical partition dir is deleted; the manifest lineage row
  SURVIVES with the tier recorded in ``expired_tiers`` (a tombstone),
  and a maintenance-log entry records what was removed and when. This
  is the storage-level enforcement of the same age-out policy the
  relational operator family computes (operators/retention.py — the
  reference analogue is InfluxDB retention-policy enforcement on the
  stored tiers, reference: connectors/influx/InfluxConnection.scala
  retention-policy plumbing).
- ``compact_partitions(...)`` rewrites a live partition dir to
  ``target_files`` parquet files (read -> coalesce -> write-tmp ->
  atomic-ish dir swap). Row content is unchanged — the maintenance
  analogue of compacting the many small files incremental runs leave.
- Both actions are idempotent: re-running with the same arguments is a
  no-op (already-expired pairs are skipped by the tombstone; compaction
  skips dirs already at or below the target file count).

Time travel after expiry follows Iceberg's contract: an as-of read at
an old snapshot can no longer reproduce expired (tier, partition) data
— those pairs are excluded from the path list instead of raising
PATH_NOT_FOUND (plans/pipeline.read_rollup_as_of honours the
tombstones).

Scale notes: maintenance is manifest-driven metadata work; the only
data touched is the partitions being compacted (read+write of one
bucket at a time, each a distributed job). Nothing scans the store.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

from streamevmon_spark.plans.manifest import (
    Manifest,
    load_manifest,
    save_manifest,
)

#: retention window per tier, seconds; None / missing = keep forever
DEFAULT_RETENTION_S: dict[str, int | None] = {
    "1m": 30 * 86400,
    "1h": 180 * 86400,
    "1d": None,
}


def _tier_dir(out_dir: str, tier: str, part_id: str) -> str:
    return os.path.join(out_dir, f"rollup_{tier}", part_id)


def expire_partitions(
    out_dir: str,
    now_us: int,
    retention_s: dict[str, int | None] | None = None,
    manifest: Manifest | None = None,
) -> dict[str, list[str]]:
    """Delete expired (tier, partition) dirs; tombstone them in the
    manifest. Returns {tier: [part_id, ...]} actually removed now."""
    m = manifest or load_manifest(out_dir)
    if m is None:
        raise FileNotFoundError(f"no manifest under {out_dir}")
    ret = DEFAULT_RETENTION_S if retention_s is None else retention_s
    removed: dict[str, list[str]] = {}
    for part in m.partitions:
        if part.status != "done":
            continue
        for tier in m.tiers:
            window = ret.get(tier)
            if window is None or tier in part.expired_tiers:
                continue
            if part.end_us > now_us - window * 1_000_000:
                continue
            d = _tier_dir(out_dir, tier, part.part_id)
            if os.path.exists(d):
                shutil.rmtree(d)
            part.expired_tiers.append(tier)
            removed.setdefault(tier, []).append(part.part_id)
    if removed and manifest is None:
        save_manifest(out_dir, m)
    return removed


def compact_partitions(
    spark: SparkSession,
    out_dir: str,
    target_files: int = 1,
    manifest: Manifest | None = None,
) -> dict[str, list[str]]:
    """Rewrite every live partition dir holding more than
    ``target_files`` parquet files down to ``target_files`` (row
    content unchanged). Returns {tier: [part_id, ...]} rewritten."""
    m = manifest or load_manifest(out_dir)
    if m is None:
        raise FileNotFoundError(f"no manifest under {out_dir}")
    compacted: dict[str, list[str]] = {}
    for part in m.partitions:
        if part.status != "done":
            continue
        for tier in m.tiers:
            if tier in part.expired_tiers:
                continue
            d = _tier_dir(out_dir, tier, part.part_id)
            # crash recovery: a previous run may have died between the
            # two renames below, leaving the data parked in
            # '*.__compact_old' with no live dir. Restore it before
            # deciding anything (and clear stray tmp dirs) — otherwise
            # the partition would be skipped forever and manifest-driven
            # reads would fail on the missing path.
            old = d + ".__compact_old"
            if not os.path.isdir(d) and os.path.isdir(old):
                os.rename(old, d)
            shutil.rmtree(d + ".__compact_tmp", ignore_errors=True)
            if not os.path.isdir(d):
                continue
            files = [
                f for f in os.listdir(d)
                if f.startswith("part-") and f.endswith(".parquet")
            ]
            if len(files) <= target_files:
                continue
            tmp = d + ".__compact_tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            shutil.rmtree(old, ignore_errors=True)
            spark.read.parquet(d).coalesce(target_files).write.mode(
                "overwrite"
            ).parquet(tmp)
            # swap: the rewrite fully succeeded before the live dir is
            # touched. A crash between the two renames leaves the data
            # complete but parked in '*.__compact_old'; the recovery
            # step at the top of this loop renames it back on the next
            # run, so readers see a live dir again.
            os.rename(d, old)
            os.rename(tmp, d)
            shutil.rmtree(old)
            compacted.setdefault(tier, []).append(part.part_id)
    return compacted


def run_maintenance(
    spark: SparkSession,
    out_dir: str,
    now_us: int,
    retention_s: dict[str, int | None] | None = None,
    compact_target_files: int | None = None,
) -> dict:
    """One maintenance pass: expiry, then (optionally) compaction of
    the survivors; appends a maintenance-log entry to the manifest if
    anything changed. Idempotent."""
    m = load_manifest(out_dir)
    if m is None:
        raise FileNotFoundError(f"no manifest under {out_dir}")
    expired = expire_partitions(out_dir, now_us, retention_s, manifest=m)
    if expired:
        # persist tombstones BEFORE the (potentially long) compaction
        # jobs: the dirs are already deleted, and a crash here must not
        # leave manifest rows pointing at missing paths
        save_manifest(out_dir, m)
    compacted: dict[str, list[str]] = {}
    if compact_target_files is not None:
        compacted = compact_partitions(
            spark, out_dir, compact_target_files, manifest=m
        )
    if expired or compacted:
        m.maintenance.append(
            {"now_us": now_us, "expired": expired, "compacted": compacted}
        )
        save_manifest(out_dir, m)
    return {"expired": expired, "compacted": compacted}
