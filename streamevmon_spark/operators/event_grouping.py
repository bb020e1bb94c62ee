"""Event post-processing: threshold events, temporal session grouping,
and per-stream frequent-event filtering.

Reference analogues:
- ``threshold_events``: SimpleThresholdDetector — a stateless predicate
  over measurements (reference: detectors/SimpleThresholdDetector.scala:48-70).
  Fully declarative -> oracle-checked.
- ``group_events_temporal``: TemporalEventGrouper — merge events whose
  gap <= max_interval into groups, split groups exceeding max_duration
  (reference: events/grouping/time/TemporalEventGrouper.scala:54-153;
  defaults 10 s / 2 h via EventGrouperFlinkHelper.scala:36-53), with
  EventGroup's derived aggregates: modeEventType, meanSeverity,
  meanDetectionLatency (reference: events/grouping/EventGroup.scala:42-73).
  Expressed as gaps-and-islands (a running sum of gap-breaks) — pure
  window functions, identical SQL in DuckDB -> oracle-checked.
  Divergence (documented): the reference's duration cap re-anchors at
  the first event AFTER a flush (timer semantics); we bucket by
  floor((ts - island_start)/max_duration), which is order-independent
  and therefore exactly reproducible in any engine.
- ``frequent_event_filter``: FrequentEventFilter — per-stream rate
  limiter with the reference's full multi-config semantics
  (small/medium/large tiers, per-config trigger + cooldown re-enable,
  pass-through only while every config is enabled; reference:
  events/FrequentEventFilter.scala:81-276, defaults
  eventGrouping-frequentFilter-defaults.yaml). Sequential per stream ->
  partition-wise kernel, rows-only check + pinned cycle tests.

Scale note: the reference groups temporally under a single global key
(keyBy("") — EventGrouperFlinkHelper.scala:43), a deliberate serial
point. ``group_events_temporal`` removes it: islands are computed per
coarse time bucket in parallel and stitched through a tiny per-bucket
summary, with output identical to the single-scan result.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from streamevmon_spark.operators._partitionwise import (
    group_starts,
    partitionwise_apply,
)
from streamevmon_spark.operators.rollup import EPOCH_NTZ, SERIES_KEY


def threshold_events(
    df: DataFrame, threshold: float = 100.0, severity: int = 100
) -> DataFrame:
    """Stateless threshold detector: one event per row whose value
    exceeds ``threshold``. detection_latency_us is 0 — the reference
    emits Duration.ZERO for threshold events
    (reference: detectors/SimpleThresholdDetector.scala:48-70)."""
    return (
        df.where(F.col("value") > F.lit(threshold))
        .select(
            F.lit("threshold_events").alias("event_type"),
            *SERIES_KEY,
            F.lit(severity).cast("int").alias("severity"),
            F.col("ts"),
            F.lit(0).cast("long").alias("detection_latency_us"),
            F.col("value"),
        )
    )


def group_events_temporal(
    events: DataFrame,
    max_interval_s: int = 10,
    max_duration_s: int = 7200,
    range_s: int = 86400,
) -> DataFrame:
    """Session-group events: gap > max_interval starts a new island;
    islands longer than max_duration split into duration buckets.

    Distributed gaps-and-islands: events are bucketed into coarse
    ``range_s`` time ranges, islands are computed per bucket with the
    ordinary lag/running-sum trick (parallel across buckets — no global
    ORDER BY over the event stream, unlike the reference's keyBy("")
    serial point, EventGrouperFlinkHelper.scala:43), and boundary islands
    are stitched through a tiny per-bucket summary table (one row per
    coarse range): a bucket's first island merges with its predecessor's
    last island when the cross-boundary gap <= max_interval, and each
    bucket's global island-number offset is

        start_b = sum(n_islands before b) - sum(merges up to b)

    so global numbering is identical to the single-ordered-scan result.
    Island start times stitch the same way (per-island mins over the
    summary, then min per global island). Only the summary table (#coarse
    ranges + #local islands rows) ever passes through unpartitioned
    windows.

    EventGroup derived aggregates (reference:
    events/grouping/EventGroup.scala:42-73): mode_event_type (pinned
    tie-break count desc, type asc), mean_severity,
    mean_detection_latency_us (mean of member detectionLatency; 0 when
    the input carries no latency column), and a deterministic uuid
    derived from the group key (md5-based; the reference assigns random
    UUIDs via withUuid — a deterministic derivation keeps reruns
    idempotent, which the MERGE sink semantics require).
    """
    interval_us = max_interval_s * 1_000_000
    duration_us = max_duration_s * 1_000_000
    range_us = range_s * 1_000_000
    ts_us = F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)")
    e = events.withColumn("__ts_us", ts_us)
    if "detection_latency_us" not in e.columns:
        e = e.withColumn("detection_latency_us", F.lit(0).cast("long"))
    e = e.withColumn("__bkt", F.expr(f"__ts_us div {range_us}"))
    # local islands per coarse bucket — same comparator as the global
    # order (ts, series key, event_type); buckets partition event time,
    # so bucket-wise order concatenates to the global order
    wb = Window.partitionBy("__bkt").orderBy(
        "__ts_us", *SERIES_KEY, "event_type"
    )
    e = e.withColumn(
        "__ni",
        F.when(
            (F.col("__ts_us") - F.lag("__ts_us").over(wb)) > interval_us, 1
        ).otherwise(0),
    )
    e = e.withColumn(
        "__li",
        F.sum("__ni").over(
            wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # per-bucket summary: tiny (one row per coarse range) — the only
    # unpartitioned window in the plan runs over THIS table
    bsum = e.groupBy("__bkt").agg(
        F.min("__ts_us").alias("__first"),
        F.max("__ts_us").alias("__last"),
        (F.max("__li") + 1).alias("__n"),
    )
    wseq = Window.orderBy("__bkt")
    bsum = bsum.withColumn(
        "__merge",
        F.when(
            (F.col("__first") - F.lag("__last").over(wseq)) <= interval_us, 1
        ).otherwise(0),
    )
    bsum = bsum.withColumn(
        "__start",
        F.coalesce(
            F.sum("__n").over(
                wseq.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
        - F.sum("__merge").over(
            wseq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    e = e.join(bsum.select("__bkt", "__start"), "__bkt")
    e = e.withColumn("__island", F.col("__start") + F.col("__li"))
    # island start: partition-local per-(bucket, local island) min, then
    # a global min per stitched island over the small summary
    isum = e.groupBy("__bkt", "__li", "__island").agg(
        F.min("__ts_us").alias("__lmin")
    )
    gisl = isum.groupBy("__island").agg(
        F.min("__lmin").alias("__island_start")
    )
    e = e.join(gisl, "__island")
    e = e.withColumn(
        "__grp",
        F.concat_ws(
            "-",
            F.col("__island"),
            ((F.col("__ts_us") - F.col("__island_start")) / duration_us)
            .cast("long"),
        ),
    )
    # per-group aggregates + mode event type (deterministic tie-break:
    # highest count, then lexicographically smallest type)
    counts = e.groupBy("__grp", "event_type").agg(
        F.count(F.lit(1)).alias("__type_cnt")
    )
    wrank = Window.partitionBy("__grp").orderBy(
        F.col("__type_cnt").desc(), F.col("event_type").asc()
    )
    mode_type = (
        counts.withColumn("__rk", F.row_number().over(wrank))
        .where(F.col("__rk") == 1)
        .select(F.col("__grp"), F.col("event_type").alias("mode_event_type"))
    )
    groups = e.groupBy("__grp").agg(
        F.count(F.lit(1)).alias("member_count"),
        F.expr(f"timestampadd(MICROSECOND, min(__ts_us), {EPOCH_NTZ})").alias(
            "start_time"
        ),
        F.expr(f"timestampadd(MICROSECOND, max(__ts_us), {EPOCH_NTZ})").alias(
            "end_time"
        ),
        (
            F.sum("severity").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_severity"),
        (
            F.sum("detection_latency_us").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_detection_latency_us"),
    )
    md5 = F.md5(F.concat(F.lit("event_group:"), F.col("__grp")))
    uuid = F.concat_ws(
        "-",
        F.substring(md5, 1, 8),
        F.substring(md5, 9, 4),
        F.substring(md5, 13, 4),
        F.substring(md5, 17, 4),
        F.substring(md5, 21, 12),
    )
    return (
        groups.join(mode_type, "__grp")
        .select(
            F.col("__grp").alias("group_id"),
            uuid.alias("uuid"),
            "start_time",
            "end_time",
            "member_count",
            "mean_severity",
            "mean_detection_latency_us",
            "mode_event_type",
        )
    )


GROUP_EVENTS_ORACLE = """
WITH __ev AS ({events_sql}),
__ts AS (
    SELECT *,
           CAST(datediff('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts)
                AS BIGINT) AS ts_us
    FROM __ev
),
__isl AS (
    SELECT *,
           CAST(SUM(CASE WHEN ts_us - lag_ts > {interval_us} THEN 1 ELSE 0 END)
                OVER (ORDER BY ts_us, conv_id, tool, role, event_type
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS island
    FROM (
        SELECT *,
               lag(ts_us) OVER (ORDER BY ts_us, conv_id, tool, role,
                                event_type) AS lag_ts
        FROM __ts
    )
),
__grp AS (
    SELECT *,
           island || '-' ||
           CAST(CAST((ts_us - MIN(ts_us) OVER (PARTITION BY island))
                     / {duration_us} AS BIGINT) AS VARCHAR) AS group_id
    FROM __isl
),
__counts AS (
    SELECT group_id, event_type, COUNT(*) AS type_cnt
    FROM __grp GROUP BY group_id, event_type
),
__mode AS (
    SELECT group_id, event_type AS mode_event_type
    FROM (
        SELECT group_id, event_type,
               row_number() OVER (PARTITION BY group_id
                                  ORDER BY type_cnt DESC, event_type ASC)
                   AS rk
        FROM __counts
    ) WHERE rk = 1
),
__agg AS (
    SELECT group_id,
           COUNT(*) AS member_count,
           TIMESTAMP '1970-01-01 00:00:00'
               + to_microseconds(MIN(ts_us)) AS start_time,
           TIMESTAMP '1970-01-01 00:00:00'
               + to_microseconds(MAX(ts_us)) AS end_time,
           CAST(CAST(SUM(severity) AS BIGINT) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS mean_severity,
           CAST(CAST(SUM(detection_latency_us) AS BIGINT) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS mean_detection_latency_us,
           md5('event_group:' || group_id) AS h
    FROM __grp GROUP BY group_id
)
SELECT a.group_id,
       substr(a.h, 1, 8) || '-' || substr(a.h, 9, 4) || '-' ||
           substr(a.h, 13, 4) || '-' || substr(a.h, 17, 4) || '-' ||
           substr(a.h, 21, 12) AS uuid,
       a.start_time, a.end_time,
       CAST(a.member_count AS BIGINT) AS member_count,
       a.mean_severity, a.mean_detection_latency_us, m.mode_event_type
FROM __agg a JOIN __mode m USING (group_id)
"""


def group_events_single(events: DataFrame) -> DataFrame:
    """SingleEventGrouper (reference:
    events/grouping/SingleEventGrouper.scala:37-57): wrap each event in a
    singleton EventGroup anchored at eventTime = time - detectionLatency,
    with the EventGroup derived aggregates collapsing to the member's own
    values. Trivial projection — whole-stage codegen end-to-end."""
    lat = (
        F.col("detection_latency_us")
        if "detection_latency_us" in events.columns
        else F.lit(0)
    )
    anchor = F.expr(
        f"timestampadd(MICROSECOND, "
        f"-{'detection_latency_us' if 'detection_latency_us' in events.columns else '0'}"
        f", ts)"
    )
    return events.select(
        anchor.alias("start_time"),
        anchor.alias("end_time"),
        F.lit(1).cast("long").alias("member_count"),
        F.col("severity").cast("double").alias("mean_severity"),
        lat.cast("double").alias("mean_detection_latency_us"),
        F.col("event_type").alias("mode_event_type"),
    )


# (name, count, interval_s, cooldown_s, severity) — mirrors
# src/main/resources/eventGrouping-frequentFilter-defaults.yaml
DEFAULT_FREQUENCY_CONFIGS: tuple[tuple[str, int, int, int, int], ...] = (
    ("small", 5, 60, 120, 25),
    ("medium", 15, 120, 240, 50),
    ("large", 100, 360, 720, 75),
)


def frequent_event_filter(
    events: DataFrame,
    configs: tuple[tuple[str, int, int, int, int], ...] | None = None,
) -> DataFrame:
    """Multi-config per-stream rate limiter — faithful FrequentEventFilter
    (reference: events/FrequentEventFilter.scala:81-276):

    - per key, a queue of recent event timestamps trimmed to the LONGEST
      config interval (:214-215);
    - per config, "triggered" = strictly MORE than ``count`` timestamps
      within the last ``interval`` seconds (t > ts - interval, :219-221);
    - enabled + triggered -> emit one ``bulk_`` summary event carrying
      the config's severity and description, then disable the config
      (:234-246);
    - disabled + triggered -> refresh the disable timestamp, so the
      cooldown restarts (:226);
    - disabled + not triggered -> re-enable once ``cooldown`` seconds
      pass since the disable stamp (:228-231);
    - an event passes through unchanged only when EVERY config is
      enabled after processing (:252-254).

    ``configs``: (name, count, interval_s, cooldown_s, severity) tuples;
    defaults to the reference's small/medium/large YAML tiers.
    """
    cfgs = list(configs if configs is not None else DEFAULT_FREQUENCY_CONFIGS)
    if not cfgs:
        raise ValueError("frequent_event_filter needs at least one config")
    longest_us = max(c[2] for c in cfgs) * 1_000_000

    schema = (
        "event_type string, conv_id string, tool string, role string, "
        "severity int, ts timestamp_ntz, description string"
    )

    def run_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        starts = group_starts(pdf, SERIES_KEY)
        ends = np.concatenate([starts[1:], [len(pdf)]])
        ts = pdf["__ts_us"].to_numpy(np.int64)
        etype = pdf["event_type"].to_numpy()
        sev = pdf["severity"].to_numpy(np.int64)
        desc = (
            pdf["description"].to_numpy()
            if "description" in pdf.columns
            else None
        )
        rows = []
        for s, e in zip(starts, ends):
            head = pdf.iloc[s]
            queue: list[int] = []
            # config name -> disabled-at timestamp (None = enabled)
            disabled_at: dict[str, int | None] = {c[0]: None for c in cfgs}
            for i in range(s, e):
                ti = int(ts[i])
                queue.append(ti)
                while queue and queue[0] < ti - longest_us:
                    queue.pop(0)
                for name, count, interval_s, cooldown_s, severity in cfgs:
                    lo = ti - interval_s * 1_000_000
                    n_stamps = sum(1 for t in queue if t > lo)
                    triggered = n_stamps > count
                    dis = disabled_at[name]
                    if dis is not None and triggered:
                        disabled_at[name] = ti
                    elif dis is not None and not triggered:
                        if dis < ti - cooldown_s * 1_000_000:
                            disabled_at[name] = None
                    elif dis is None and triggered:
                        rows.append(
                            {
                                "event_type": f"bulk_{etype[i]}",
                                "conv_id": head["conv_id"],
                                "tool": head["tool"],
                                "role": head["role"],
                                "severity": int(severity),
                                "ts_us": ti,
                                "description": (
                                    f"Frequent events of type {etype[i]} - "
                                    f'configuration name "{name} ({count} '
                                    f"events in {interval_s} seconds)\""
                                ),
                            }
                        )
                        disabled_at[name] = ti
                if all(v is None for v in disabled_at.values()):
                    rows.append(
                        {
                            "event_type": str(etype[i]),
                            "conv_id": head["conv_id"],
                            "tool": head["tool"],
                            "role": head["role"],
                            "severity": int(sev[i]),
                            "ts_us": ti,
                            "description": (
                                str(desc[i]) if desc is not None else ""
                            ),
                        }
                    )
        out = pd.DataFrame(
            rows,
            columns=["event_type", "conv_id", "tool", "role", "severity",
                     "ts_us", "description"],
        )
        out["ts"] = pd.to_datetime(out["ts_us"].astype("int64"), unit="us")
        out["severity"] = out["severity"].astype("int32")
        return out[["event_type", "conv_id", "tool", "role", "severity",
                    "ts", "description"]]

    prepped = events.withColumn(
        "__ts_us", F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)")
    )
    return partitionwise_apply(
        prepped, SERIES_KEY, ["__ts_us", "event_type"], run_batch, schema
    )
