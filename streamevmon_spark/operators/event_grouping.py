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
  limiter: when >= count events arrive within interval seconds, emit one
  bulk summary event and suppress pass-through until cooldown seconds
  pass with no further trigger (reference:
  events/FrequentEventFilter.scala:81-276, simplified to one config
  tier; defaults from eventGrouping-frequentFilter-defaults.yaml
  smallConfig: count 10 / interval 60 / cooldown 300). Sequential per
  stream -> partition-wise kernel, rows-only check.

Scale note: the reference groups temporally under a single global key
(keyBy("") — EventGrouperFlinkHelper.scala:43), a deliberate serial
point. We keep a global ORDER BY for oracle parity at test scale; at
100 TB you would pre-partition by a coarse time range and stitch
boundary islands (same gaps-and-islands algebra applied per range).
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
    exceeds ``threshold``."""
    return (
        df.where(F.col("value") > F.lit(threshold))
        .select(
            F.lit("threshold_events").alias("event_type"),
            *SERIES_KEY,
            F.lit(severity).cast("int").alias("severity"),
            F.col("ts"),
            F.col("value"),
        )
    )


def group_events_temporal(
    events: DataFrame,
    max_interval_s: int = 10,
    max_duration_s: int = 7200,
) -> DataFrame:
    """Session-group events: gap > max_interval starts a new island;
    islands longer than max_duration split into duration buckets."""
    interval_us = max_interval_s * 1_000_000
    duration_us = max_duration_s * 1_000_000
    ts_us = F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)")
    # deterministic global order: (ts, series key, event_type)
    order = [F.col("__ts_us"), *(F.col(c) for c in SERIES_KEY),
             F.col("event_type")]
    w = Window.orderBy(*order)
    e = events.withColumn("__ts_us", ts_us)
    e = e.withColumn(
        "__new_island",
        F.when(
            (F.col("__ts_us") - F.lag("__ts_us").over(w)) > interval_us, 1
        ).otherwise(0),
    )
    e = e.withColumn(
        "__island",
        F.sum("__new_island").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    wi = Window.partitionBy("__island")
    e = e.withColumn("__island_start", F.min("__ts_us").over(wi))
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
    )
    return (
        groups.join(mode_type, "__grp")
        .select(
            F.col("__grp").alias("group_id"),
            "start_time",
            "end_time",
            "member_count",
            "mean_severity",
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
               / CAST(COUNT(*) AS DOUBLE) AS mean_severity
    FROM __grp GROUP BY group_id
)
SELECT a.group_id, a.start_time, a.end_time,
       CAST(a.member_count AS BIGINT) AS member_count,
       a.mean_severity, m.mode_event_type
FROM __agg a JOIN __mode m USING (group_id)
"""


def frequent_event_filter(
    events: DataFrame,
    count: int = 10,
    interval_s: int = 60,
    cooldown_s: int = 300,
) -> DataFrame:
    """Per-stream rate limiter (single-config FrequentEventFilter):
    pass events through until ``count`` arrive within ``interval_s``;
    then emit one ``bulk_`` summary event and suppress everything until
    ``cooldown_s`` elapse since the last suppressed event."""
    interval_us = interval_s * 1_000_000
    cooldown_us = cooldown_s * 1_000_000

    schema = (
        "event_type string, conv_id string, tool string, role string, "
        "severity int, ts timestamp_ntz, suppressed_count int"
    )

    def run_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        starts = group_starts(pdf, SERIES_KEY)
        ends = np.concatenate([starts[1:], [len(pdf)]])
        ts = pdf["__ts_us"].to_numpy(np.int64)
        etype = pdf["event_type"].to_numpy()
        sev = pdf["severity"].to_numpy(np.int64)
        rows = []
        for s, e in zip(starts, ends):
            head = pdf.iloc[s]
            recent: list[int] = []
            suppressing = False
            suppress_last = 0
            n_suppressed = 0
            for i in range(s, e):
                ti = int(ts[i])
                if suppressing:
                    if ti - suppress_last > cooldown_us:
                        suppressing = False
                        recent = []
                    else:
                        suppress_last = ti
                        n_suppressed += 1
                        continue
                recent = [r for r in recent if ti - r <= interval_us]
                recent.append(ti)
                if len(recent) >= count:
                    suppressing = True
                    suppress_last = ti
                    n_suppressed = 0
                    rows.append(
                        {
                            "event_type": f"bulk_{etype[i]}",
                            "conv_id": head["conv_id"],
                            "tool": head["tool"],
                            "role": head["role"],
                            "severity": int(sev[i]),
                            "ts_us": ti,
                            "suppressed_count": len(recent),
                        }
                    )
                else:
                    rows.append(
                        {
                            "event_type": str(etype[i]),
                            "conv_id": head["conv_id"],
                            "tool": head["tool"],
                            "role": head["role"],
                            "severity": int(sev[i]),
                            "ts_us": ti,
                            "suppressed_count": 0,
                        }
                    )
        out = pd.DataFrame(
            rows,
            columns=["event_type", "conv_id", "tool", "role", "severity",
                     "ts_us", "suppressed_count"],
        )
        out["ts"] = pd.to_datetime(out["ts_us"].astype("int64"), unit="us")
        out["severity"] = out["severity"].astype("int32")
        out["suppressed_count"] = out["suppressed_count"].astype("int32")
        return out[["event_type", "conv_id", "tool", "role", "severity",
                    "ts", "suppressed_count"]]

    prepped = events.withColumn(
        "__ts_us", F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)")
    )
    return partitionwise_apply(
        prepped, SERIES_KEY, ["__ts_us", "event_type"], run_batch, schema
    )
