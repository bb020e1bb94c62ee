"""The transcripts input table: (conv_id, turn_idx, role, text, tool, ts, value).

Two deterministic constructions:

1. ``load_transcripts(spark, sf_dir)`` — derives transcripts from the
   driver's ``events.parquet`` via ``TRANSCRIPTS_SQL``, a single SQL
   template written in the common Spark-SQL/DuckDB dialect subset so the
   DuckDB correctness oracle can build the *identical* table. This is the
   analogue of the reference's typed measurement parse
   (reference: measurements/traits/InfluxMeasurementFactory.scala:119-180)
   — a raw row stream projected into a fixed, declared schema.

2. ``generate_transcripts(spark, ...)`` — seeded synthetic generator with
   controllable hot-conversation skew, session gaps, bounded out-of-order
   timestamps and lossy (null-value) turns, built entirely from
   ``spark.range`` + JVM-side hash functions (no Python in the loop), so
   it scales to bench sizes. Analogue of the reference's SeedData.scala
   fixture library (reference: src/test/scala/.../test/SeedData.scala:45-1178).

Series key for all rollups: (conv_id, tool, role) — the analogue of the
reference's composite stream key
(reference: measurements/MeasurementKeySelector.scala:47-64).
The nullable ``value`` column is the HasDefault.defaultValue analogue
(reference: measurements/traits/HasDefault.scala:37-40); NULL == lossy row
(reference: measurements/traits/Measurement.scala:44-48).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Written in the dialect intersection of Spark SQL and DuckDB:
# ||, lpad, CASE, row_number() OVER, CAST AS STRING/INT/DOUBLE all agree.
# `{events}` is the raw events relation (temp view in Spark, driver view in
# DuckDB). Lossy turns: every 37th event_id carries a NULL value.
TRANSCRIPTS_SQL = """
WITH __base AS (
    SELECT
        'conv-' || lpad(CAST(user_id AS STRING), 4, '0') AS conv_id,
        CASE event_type
            WHEN 'click' THEN 'user'
            WHEN 'view' THEN 'user'
            WHEN 'error' THEN 'tool'
            ELSE 'assistant'
        END AS role,
        CASE event_type
            WHEN 'error' THEN 'exec'
            WHEN 'purchase' THEN 'search'
            WHEN 'signup' THEN 'browse'
            ELSE 'none'
        END AS tool,
        CASE WHEN event_id % 37 = 0 THEN CAST(NULL AS DOUBLE)
             ELSE value END AS value,
        ts,
        event_id
    FROM {events}
),
__numbered AS (
    SELECT
        conv_id, role, tool, value, ts,
        CAST(row_number() OVER (PARTITION BY conv_id ORDER BY ts, event_id) - 1
             AS INT) AS turn_idx
    FROM __base
)
SELECT
    conv_id,
    turn_idx,
    role,
    'c=' || conv_id || ';t=' || CAST(turn_idx AS STRING) || ';r=' || role
        AS text,
    tool,
    ts,
    value
FROM __numbered
"""


def transcripts_cte(events_relation: str = "events") -> str:
    """The transcripts derivation as a CTE body for composing oracle SQL."""
    return TRANSCRIPTS_SQL.format(events=events_relation)


def load_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the transcripts table from ``{sf_dir}/events.parquet``.

    The row_number is computed per conv_id — a single shuffle on the
    conversation key, which is exactly the partitioning every downstream
    rollup wants, so Catalyst reuses the exchange.
    """
    from streamevmon_spark.session import ensure_workers_can_import

    ensure_workers_can_import(spark)
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    # Normalize to TIMESTAMP_NTZ: tz-naive end-to-end, matching DuckDB's
    # TIMESTAMP semantics and making date_trunc independent of whatever
    # session timezone the caller's SparkSession uses.
    events = events.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    view = "__sem_events_raw"
    events.createOrReplaceTempView(view)
    return spark.sql(TRANSCRIPTS_SQL.format(events=view))


def generate_transcripts(
    spark: SparkSession,
    n_turns: int = 100_000,
    n_convs: int = 200,
    hot_share: float = 0.5,
    n_hot: int = 2,
    seed: int = 42,
    start_epoch: int = 1_704_067_200,  # 2024-01-01T00:00:00Z
    cadence_s: float = 5.0,
    gap_every: int = 500,
    gap_s: float = 3600.0,
    lossy_every: int = 37,
    partitions: int | None = None,
) -> DataFrame:
    """Seeded synthetic transcripts with hot-key skew, gaps and lossy turns.

    Pure function of its arguments: every column derives from the row id
    via xxhash64/modulo arithmetic (JVM-side, whole-stage codegen — no
    Python). ``hot_share`` of rows land on ``n_hot`` hot conversations to
    exercise salted repartitioning; every ``gap_every``-th turn of a
    conversation jumps ``gap_s`` forward to exercise session-gap reset;
    every ``lossy_every``-th row has NULL value (lossy analogue).
    """
    from streamevmon_spark.session import ensure_workers_can_import

    ensure_workers_can_import(spark)
    df = spark.range(0, n_turns, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    h = F.abs(F.xxhash64(F.col("id"), F.lit(seed)))
    hot_cut = int(hot_share * 1_000_000)
    conv_num = F.when(
        (h % 1_000_000) < hot_cut, h % n_hot
    ).otherwise(n_hot + (h % (n_convs - n_hot)))
    df = df.withColumn("conv_num", conv_num.cast("long"))
    # dense per-conversation turn index (stable total order within conv)
    from pyspark.sql import Window

    w = Window.partitionBy("conv_num").orderBy("id")
    df = df.withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))

    jitter = (F.abs(F.xxhash64(F.col("id"), F.lit(seed + 1))) % 2000) / 1000.0 - 1.0
    gaps = (F.floor(F.col("turn_idx") / gap_every)).cast("double") * gap_s
    ts_sec = (
        F.lit(float(start_epoch))
        + F.col("turn_idx").cast("double") * cadence_s
        + jitter
        + gaps
    )
    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
        (h % 3 + 1).cast("int"),
    )
    tool = F.when(
        role == "tool",
        F.element_at(
            F.array(F.lit("search"), F.lit("exec"), F.lit("browse")),
            (h % 3 + 1).cast("int"),
        ),
    ).otherwise(F.lit("none"))
    value = F.when(
        F.col("id") % lossy_every == 0, F.lit(None).cast("double")
    ).otherwise((h % 100_000) / 100.0)

    df = df.withColumn("ts_us", (ts_sec * 1e6).cast("long"))
    ts_ntz = F.expr(
        "timestampadd(MICROSECOND, ts_us, timestamp_ntz'1970-01-01 00:00:00')"
    )
    # The turn_idx window above leaves the data clustered by conv_num —
    # with hot-conversation skew that means a few huge partitions, and
    # every downstream stage would serialise on them (measured: flat
    # scaling 8→32 cores because one 2M-row cached partition gates each
    # map stage). Real ingest tables arrive size-split (parquet/Iceberg
    # file splits), so restore that layout explicitly.
    df = df.repartition(partitions or spark.sparkContext.defaultParallelism)
    return df.select(
        F.format_string("conv-%04d", F.col("conv_num")).alias("conv_id"),
        F.col("turn_idx"),
        role.alias("role"),
        F.format_string(
            "c=conv-%04d;t=%d;r=%s", F.col("conv_num"), F.col("turn_idx"), role
        ).alias("text"),
        tool.alias("tool"),
        ts_ntz.alias("ts"),
        value.alias("value"),
    )
