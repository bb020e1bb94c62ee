"""Measurement-source layer over the raw events table — the engine's
analogue of the reference's source/scan + typed-stream operators.

The reference ingests raw row streams and splits them into typed,
schema'd measurement sub-streams with per-series keys:

- type filter (reference: runners/unified/schema/StreamToTypedStreams.scala:51-58)
- lossy filter (reference: runners/unified/schema/TypedStreams.scala:48-50)
- dense integer stream-id assignment per distinct series — pinned to
  parallelism 1 in the reference for id uniqueness
  (reference: flink/sources/LatencyTSAmpFileInputFormat.scala:41-69);
  here it is a dense_rank over the (tiny) DISTINCT series set broadcast
  back onto the fact stream — fully parallel, no single-threaded stage
- history range scan `WHERE time > start AND time <= end`
  (reference: connectors/influx/InfluxHistoryConnection.scala:140-168) —
  a predicate Catalyst pushes into the parquet/Iceberg scan
- k=v tag extraction (reference: measurements/traits/
  InfluxMeasurementFactory.scala:98-104 getNamedField) — JSON props here
- canonical CSV projection (reference: measurements/traits/
  CsvOutputable.scala:33-55): Options → empty string, Instant →
  epoch-millis, deterministic column order

Input contract: events(event_id, ts, user_id, event_type, value, props).
Series key: (user_id, event_type) — the composite stream-key analogue
(reference: measurements/MeasurementKeySelector.scala:47-64).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SERIES_KEY = ["user_id", "event_type"]


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan the raw events table with tz-naive timestamps (the engine's
    canonical event-time representation)."""
    from streamevmon_spark.session import ensure_workers_can_import

    ensure_workers_can_import(spark)
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return events.withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def typed_stream(events: DataFrame, event_type: str) -> DataFrame:
    """Typed sub-stream: the classTag.isInstance filter analogue. A plain
    predicate — Catalyst pushes it into the scan."""
    return events.where(F.col("event_type") == event_type)


def drop_lossy(events: DataFrame) -> DataFrame:
    """Remove lossy rows (NULL value — the isLossy analogue)."""
    return events.where(F.col("value").isNotNull())


def assign_stream_ids(events: DataFrame) -> DataFrame:
    """Dense integer stream-id per distinct (user_id, event_type) series.

    The reference requires parallelism 1 for this; the Spark-native form
    ranks only the DISTINCT series set (tiny — one row per series, never
    per measurement) and broadcast-joins the mapping back, so the fact
    stream is never globally sorted and the operator scales with the
    number of series, not rows."""
    series = events.select(*SERIES_KEY).distinct()
    ranked = series.withColumn(
        "stream_id",
        (
            F.dense_rank().over(
                Window.orderBy("user_id", "event_type")
            )
            - 1
        ).cast("int"),
    )
    return events.join(F.broadcast(ranked), SERIES_KEY)


def history_scan(events: DataFrame, start_ts: str, end_ts: str) -> DataFrame:
    """Catch-up range scan: ``time > start AND time <= end`` with the
    reference's exact boundary semantics (start exclusive, end inclusive).
    The predicate reaches the parquet scan (PushedFilters) so partition /
    row-group pruning does the reference's manual 1000-row chunking."""
    return events.where(
        (F.col("ts") > F.lit(start_ts).cast("timestamp_ntz"))
        & (F.col("ts") <= F.lit(end_ts).cast("timestamp_ntz"))
    )


def parse_tags(events: DataFrame, keys: tuple[str, ...] = ("k",)) -> DataFrame:
    """Extract typed tag fields from the JSON props column — the
    getNamedField / str_to_map analogue, JVM-side."""
    out = events
    for key in keys:
        out = out.withColumn(
            f"tag_{key}",
            F.get_json_object(F.col("props"), f"$.{key}").cast("int"),
        )
    return out


def csv_projection(events: DataFrame) -> DataFrame:
    """Canonical deterministic string projection of each row
    (CsvOutputable semantics): NULLs → empty string, timestamps →
    epoch-millis, fixed column order."""
    ms = F.expr(
        "datediff(MILLISECOND, timestamp_ntz'1970-01-01 00:00:00', ts)"
    )
    return events.select(
        "event_id",
        F.concat_ws(
            ",",
            F.coalesce(F.col("event_id").cast("string"), F.lit("")),
            F.coalesce(ms.cast("string"), F.lit("")),
            F.coalesce(F.col("user_id").cast("string"), F.lit("")),
            F.coalesce(F.col("event_type"), F.lit("")),
            F.coalesce(F.col("value").cast("string"), F.lit("")),
        ).alias("csv_row"),
    )
