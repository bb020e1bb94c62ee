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


def synth_rtts(events: DataFrame, n_max: int = 20) -> DataFrame:
    """Deterministic line-protocol ``rtts`` field per event — the test
    stand-in for AMP's ``rtts="[308, None, 302]"`` string (the driver
    tables carry no array column; the DuckDB oracle builds the identical
    string, so the parse below is cross-engine checked end-to-end).

    Ping count = event_id % (n_max+1); ping i (1-based) is None when
    (event_id + i) % 11 == 0, else (event_id*7 + i*13) % 400.
    """
    n = F.expr(f"event_id % {n_max + 1}")
    elems = F.expr(
        f"transform(sequence(1, event_id % {n_max + 1}), i -> "
        "CASE WHEN (event_id + i) % 11 = 0 THEN 'None' "
        "ELSE CAST((event_id * 7 + i * 13) % 400 AS STRING) END)"
    )
    body = F.when(n > 0, F.array_join(elems, ", ")).otherwise(F.lit(""))
    return events.withColumn(
        "rtts_raw", F.concat(F.lit('"['), body, F.lit(']"'))
    )


def parse_rtts(df: DataFrame, col: str = "rtts_raw") -> DataFrame:
    """The reference's getRtts parse (measurements/traits/
    InfluxMeasurementFactory.scala:166-180): drop the 2-char edges
    (``"[`` / ``]"``), split on commas, trim, ``None`` → NULL, else int.
    Adds an ``rtts`` array<int> column. Pure built-ins — JVM-side."""
    inner = f"substring({col}, 3, length({col}) - 4)"
    return df.withColumn(
        "rtts",
        F.expr(
            f"CASE WHEN length({inner}) = 0 THEN CAST(array() AS ARRAY<INT>) "
            f"ELSE transform(split({inner}, ','), x -> "
            "CASE WHEN trim(x) = 'None' THEN CAST(NULL AS INT) "
            "ELSE CAST(trim(x) AS INT) END) END"
        ),
    )


def smokeping_projection(
    df: DataFrame, rtts_col: str = "rtts", n_pings: int = 20
) -> DataFrame:
    """Smokeping-style derived columns from a parsed rtts array
    (reference: measurements/latencyts/LatencyTSSmokeping.scala:92-113):

    - ``results``: the successful pings (non-NULL), as doubles;
    - ``median``: sorted middle (odd) / mean of the two middles (even),
      rounded to 3 dp with the reference's round(x*1000)/1000 half-up —
      spelled floor(x*1000 + 0.5)/1000 so any engine evaluating the
      same expression gets the identical double; NULL when no results;
    - ``loss``: n_pings - #results (reference getLoss).

    Also re-serializes the rtts array to a canonical semicolon string
    (``rtts_canon``) so downstream hash comparisons stay scalar-typed.
    """
    results = (
        f"transform(filter({rtts_col}, x -> x IS NOT NULL), "
        "x -> CAST(x AS DOUBLE))"
    )
    s = f"sort_array({results})"
    n = f"size({s})"
    half = f"CAST({n} div 2 AS INT)"
    mid = (
        f"CASE WHEN {n} % 2 != 0 THEN element_at({s}, {half} + 1) "
        f"ELSE (element_at({s}, {half}) + element_at({s}, {half} + 1)"
        ") / 2 END"
    )
    median = (
        f"CASE WHEN {n} = 0 THEN CAST(NULL AS DOUBLE) "
        f"ELSE floor(({mid}) * 1000 + 0.5) / 1000 END"
    )
    canon = (
        f"array_join(transform({rtts_col}, "
        "x -> coalesce(CAST(x AS STRING), 'None')), ';')"
    )
    return df.select(
        "event_id",
        F.expr(canon).alias("rtts_canon"),
        F.expr(f"CAST({n} AS INT)").alias("n_results"),
        F.expr(f"CAST({n_pings} - {n} AS INT)").alias("loss"),
        F.expr(median).alias("median"),
    )


def nab_file_scan(spark: SparkSession, path: str) -> DataFrame:
    """NAB CSV scan: (timestamp, value) files where the stream id is the
    source FILENAME (reference: flink/sources/NabFileInputFormat.scala:41-80,
    stream-from-filename :62). ``input_file_name()`` replaces the
    reference's per-file single-threaded readers — every file splits and
    scans in parallel."""
    df = spark.read.csv(path, header=True, inferSchema=False)
    return df.select(
        F.regexp_extract(
            F.input_file_name(), r"([^/]+)\.csv$", 1
        ).alias("stream"),
        F.col("timestamp").cast("timestamp_ntz").alias("ts"),
        F.col("value").cast("double").alias("value"),
    )


def nab_scoring_format(
    measurements: DataFrame,
    events: DataFrame,
    scaling: str = "continuous",
) -> DataFrame:
    """NAB scorer output rows (reference: parameterTuner/.../nab/
    NabScoringFormatSink.scala:90-160): one row per input measurement
    (timestamp, value, anomaly_score, label-passthrough); a measurement
    whose timestamp matches an event carries the event's scaled severity
    (continuous: severity/100; binary: 1.0 when severity > 0 —
    NabScoreScalingMode.scala:36-51), all others score 0.

    ``measurements``: (stream, ts, value); ``events``: rows with
    (stream-compatible key columns, ts, severity). Equi-join on
    (stream, ts) with max(severity) per timestamp (deterministic stand-in
    for the reference's first-event-wins queue drain).
    """
    ev = events.groupBy("stream", "ts").agg(F.max("severity").alias("__sev"))
    joined = measurements.join(ev, ["stream", "ts"], "left")
    if scaling == "continuous":
        score = F.coalesce(
            F.col("__sev").cast("double") / 100.0, F.lit(0.0)
        )
    elif scaling == "binary":
        score = F.when(F.coalesce(F.col("__sev"), F.lit(0)) > 0, 1.0).otherwise(
            0.0
        )
    else:
        raise ValueError(f"unknown scaling mode {scaling!r}")
    return joined.select(
        "stream", "ts", "value", score.alias("anomaly_score")
    )


def amp2_stream_key(events: DataFrame) -> DataFrame:
    """Amp2-style tag-derived composite stream key (reference:
    measurements/amp2/Amp2Measurement.scala:55-58,66): stream =
    (measurementName, source, destination, test) ++ per-type tags joined
    with ``--``. Mapped onto the events table: measurementName =
    event_type, source/destination from user_id, test constant, extra
    tag = the parsed ``k`` prop (getNamedField analogue). One concat
    projection — the key never requires a parallelism-1 stage."""
    tagged = parse_tags(events)
    return tagged.select(
        "event_id",
        F.concat_ws(
            "--",
            F.col("event_type"),
            F.concat(F.lit("u"), F.col("user_id").cast("string")),
            F.concat(F.lit("d"), (F.col("user_id") % 10).cast("string")),
            F.lit("test"),
            F.col("tag_k").cast("string"),
        ).alias("stream"),
        "ts",
        "value",
    )


def histogram_merge(events: DataFrame, bucket_width: float = 10.0) -> DataFrame:
    """esmond Histogram (``value: Map[Double, Int]``) analogue
    (reference: measurements/esmond/Histogram.scala:36-41): per-row
    bucket histograms merged per series by bucket-wise count sum. The
    map column is modeled relationally — one (bucket, count) row per
    series-bucket — which is the shape a map-typed column explodes to
    anyway and the only one that partial-aggregates map-side at 100 TB
    (a map_concat-with-sum UDAF would hold whole maps in agg state)."""
    bucket = (
        F.floor(F.col("value") / F.lit(bucket_width)) * F.lit(bucket_width)
    )
    return (
        events.where(F.col("value").isNotNull())
        .groupBy(*SERIES_KEY, bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("bucket_count"))
    )


# regex lookahead asserting the match position is followed by an EVEN
# number of double quotes — i.e. the separator is not inside a quoted
# value. The JVM-regex equivalent of the reference's quote-parity walk.
_UNQUOTED = '(?=(?:[^"]*"[^"]*")*[^"]*$)'


def synth_line_protocol(events: DataFrame) -> DataFrame:
    """Deterministic InfluxDB line-protocol lines derived from the
    events relation (there is no raw line-protocol feed in the
    sandbox), exercising every parser branch: quoted values containing
    separators, entries without '=', wrong space-part counts, and '='
    inside quoted values (the reference's all-'=' split rejects those
    lines whole). Mirrored field-for-field by the DuckDB oracle, which
    regenerates the EXPECTED parse from this grammar directly — the
    parser is checked as parse(print(x)) == x."""
    tag2 = (
        "CASE WHEN event_id % 4 = 0 "
        "THEN concat(',host=\"srv, ', event_id % 5, '\"') ELSE '' END"
    )
    bad_entry = (
        "CASE WHEN event_id % 13 = 0 THEN ',oops' "
        "WHEN event_id % 19 = 0 THEN ',eq=\"a=b\"' ELSE '' END"
    )
    extra_part = (
        "CASE WHEN event_id % 17 = 0 THEN ' spurious' ELSE '' END"
    )
    return events.select(
        "event_id",
        F.expr(
            "concat('m', event_id % 3, ',stream=', event_id % 7, "
            + tag2 + ", " + bad_entry + ", "
            "' count=', event_id % 100, 'i,latency=', "
            "event_id % 50, '.', event_id % 4, "
            "',msg=\"ok ', event_id % 2, '\"', "
            + extra_part + ", "
            "' ', CAST(event_id * 1000000000 + 123456789 AS STRING))"
        ).alias("value"),
        # materialization barrier — see sources/amp2.synth_amp2_lines:
        # downstream quote-parity splits reference `value` repeatedly
        # and would inline this generator expression per reference; the
        # repartition restores full parallelism over single-file scans
    ).repartition(
        events.sparkSession.sparkContext.defaultParallelism
    ).localCheckpoint()


def parse_line_protocol(lines: DataFrame) -> DataFrame:
    """InfluxDB line-protocol parse, Spark-first (reference:
    connectors/influx/LineProtocol.scala:154-224). Semantics mirrored
    exactly:

    - the line splits on UNQUOTED spaces into exactly 3 parts
      (measurement+tags, fields, timestamp) — else the line is dropped
      (apply returns None, :200-203);
    - each part splits on UNQUOTED commas (splitLineProtocol's
      quote-parity walk, :154-187 — here a quote-parity regex
      lookahead, one JVM-side split call);
    - every tag/field entry must split on ALL '=' characters into
      exactly 2 parts — quotes are NOT respected by entryToTuple
      (:189-197), so a quoted value containing '=' rejects the WHOLE
      line (theTags.contains(None) -> None, :212-214);
    - the nanosecond timestamp truncates to milliseconds
      (Instant.ofEpochMilli(NANOSECONDS.toMillis(...)), :220).

    Output: one row per tag/field entry (line_id, measurement, kind,
    key, val, time) — values keep their quotes, as the reference's
    Map[String,String] does. Pure codegen expressions, no UDF."""
    p3 = F.split(F.col("value"), " " + _UNQUOTED)
    parts = lines.select(
        F.col("event_id").alias("line_id"),
        F.col("value"),
        p3.alias("p"),
    ).where(F.size("p") == 3)
    split_eq_ok = (
        "forall(entries, e -> size(split(e, '=', -1)) = 2)"
    )
    exploded = (
        parts.select(
            "line_id",
            F.split(F.col("p").getItem(0), "," + _UNQUOTED).alias("mt"),
            F.split(F.col("p").getItem(1), "," + _UNQUOTED).alias("fs"),
            F.col("p").getItem(2).cast("long").alias("time_ns"),
        )
        .select(
            "line_id",
            F.col("mt").getItem(0).alias("measurement"),
            F.expr("slice(mt, 2, size(mt) - 1)").alias("tag_entries"),
            F.col("fs").alias("field_entries"),
            "time_ns",
        )
        # reference rejects the whole line when ANY entry is malformed
        .where(
            F.expr(split_eq_ok.replace("entries", "tag_entries"))
            & F.expr(split_eq_ok.replace("entries", "field_entries"))
        )
        .select(
            "line_id",
            "measurement",
            F.explode(
                F.expr(
                    "array_union(transform(tag_entries, e -> "
                    "named_struct('kind', 'tag', 'entry', e)), "
                    "transform(field_entries, e -> "
                    "named_struct('kind', 'field', 'entry', e)))"
                )
            ).alias("kv"),
            F.expr(
                f"timestampadd(MICROSECOND, (time_ns div 1000000) * 1000, "
                "timestamp_ntz'1970-01-01 00:00:00')"
            ).alias("time"),
        )
    )
    return exploded.select(
        "line_id",
        "measurement",
        F.col("kv.kind").alias("kind"),
        F.expr("split(kv.entry, '=', -1)[0]").alias("key"),
        F.expr("split(kv.entry, '=', -1)[1]").alias("val"),
        "time",
    )
