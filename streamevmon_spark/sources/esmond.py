"""perfSONAR esmond measurement-family ingest: the 6 concrete typed
measurements parsed from esmond time-series JSON entries.

Reference semantics being reproduced (all Scala, re-expressed as
Catalyst expressions + ``from_json`` — no UDFs anywhere):

- ``EsmondMeasurement.apply`` dispatches an AbstractTimeSeriesEntry to
  one of Simple / Histogram / Subinterval / PacketTrace / Href /
  Failure (reference: measurements/esmond/EsmondMeasurement.scala:54-66)
  — here the entry class is decided by the event-type string with the
  EXACT ``ResponseType.fromString`` mapping (connectors/esmond/
  ResponseType.scala:43-67): ``failures``→Failure, ``histogram-ttl`` |
  ``histogram-owdelay``→Histogram, ``pscheduler-run-href``→Href,
  ``packet-trace``→PacketTrace, 8 scalar types + ``path-mtu``→Simple,
  ``*-subintervals``→Subinterval; any other event type raises in the
  reference — here the row is dropped (the engine's None analogue).
- stream id = the event type's REST base-URI
  (EsmondMeasurement.calculateStreamId, EsmondMeasurement.scala:46-49);
  ``metadataKey`` = path segment 4 of the base-URI
  (connectors/esmond/schema/EventType.scala:47).
- entry timestamps are epoch SECONDS (``Instant.ofEpochSecond``, each
  measurement's apply — e.g. measurements/esmond/Simple.scala:53).
- payload shapes (connectors/esmond/schema/*TimeSeriesEntry.scala):
  Simple ``val: Double``; Histogram ``val: Map[String→Double, Int]``
  (bucket keys arrive as strings and are cast to double,
  HistogramTimeSeriesEntry.scala:40-44); Subinterval ``val:
  [{duration, start, val}]``; PacketTrace ``val: [{success, ip,
  hostname, rtt, as{owner, number}, ttl, query, error-message}]``;
  Href ``val: Map[String,String]`` with ``hrefLocation = val.get
  ("href")``; Failure likewise with ``failureText = val.get("error")``.
- esmond measurements are never lossy (EsmondMeasurement.scala:36-38);
  only Simple carries a default value (Simple.scala:40-46 HasDefault).

Scale shape: one projection over the entry relation — the 6-class
dispatch is a chained CASE inside a single select (the Catalyst
analogue of the reference's match statement), each branch a
``from_json`` with its own schema. No explode in the typed summary, no
shuffle, no Python. ``esmond_histogram`` explodes only the (minority)
histogram rows and hash-aggregates bucket-wise — the map-merge shape
that partial-aggregates map-side at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# event-type string -> entry class, the ResponseType.fromString mirror
# (connectors/esmond/ResponseType.scala:43-67). path-mtu logs an error
# in the reference but still parses as Simple.
ESMOND_RESPONSE_TYPE: dict[str, str] = {
    "failures": "failure",
    "histogram-ttl": "histogram",
    "histogram-owdelay": "histogram",
    "pscheduler-run-href": "href",
    "packet-trace": "packet_trace",
    "time-error-estimates": "simple",
    "packet-duplicates": "simple",
    "packet-loss-rate": "simple",
    "packet-count-sent": "simple",
    "packet-count-lost": "simple",
    "throughput": "simple",
    "packet-retransmits": "simple",
    "packet-reorders": "simple",
    "path-mtu": "simple",
    "throughput-subintervals": "subinterval",
    "packet-retransmits-subintervals": "subinterval",
}

_SUBINTERVAL_SCHEMA = (
    "ARRAY<STRUCT<duration: DOUBLE, start: DOUBLE, val: DOUBLE>>"
)
# error-message needs backtick-quoting (hyphenated JSON key)
_TRACE_SCHEMA = (
    "ARRAY<STRUCT<success: INT, ip: STRING, hostname: STRING, "
    "rtt: DOUBLE, `as`: STRUCT<owner: STRING, number: INT>, "
    "ttl: INT, query: INT, `error-message`: STRING>>"
)


def synth_esmond_entries(events: DataFrame) -> DataFrame:
    """Deterministic esmond time-series entries derived from the events
    relation (the sandbox has no live esmond REST feed): one row per
    event with (event_id, base_uri, event_type, ts_s, val_json),
    covering every entry class, histogram multi-bucket maps, empty
    subinterval/trace arrays, href/failure maps missing their payload
    key (Option → None), and an unknown event type that the typed
    mapping must drop whole. The DuckDB oracle regenerates the EXPECTED
    parse from this grammar in closed form — the parser is checked as
    parse(print(x)) == x (the line-protocol gate's pattern).

    All doubles are quarter-integers (k/4) so the JSON text, the Spark
    double and the DuckDB double are the identical value.
    """
    m = "event_id % 12"
    etype = (
        f"CASE {m} WHEN 0 THEN 'failures' "
        "WHEN 1 THEN 'histogram-owdelay' WHEN 2 THEN 'histogram-ttl' "
        "WHEN 3 THEN 'pscheduler-run-href' WHEN 4 THEN 'packet-trace' "
        "WHEN 5 THEN 'throughput' WHEN 6 THEN 'packet-loss-rate' "
        "WHEN 7 THEN 'packet-count-sent' "
        "WHEN 8 THEN 'time-error-estimates' "
        "WHEN 9 THEN 'throughput-subintervals' "
        "WHEN 10 THEN 'packet-retransmits-subintervals' "
        "ELSE 'histogram-rtt' END"  # unknown type -> rejected whole
    )
    # quarter-integer double as exact JSON text: "<q div 4>.<frac>"
    def qnum(q: str) -> str:
        return (
            f"concat(CAST(({q}) div 4 AS STRING), "
            f"CASE ({q}) % 4 WHEN 0 THEN '.0' WHEN 1 THEN '.25' "
            "WHEN 2 THEN '.5' ELSE '.75' END)"
        )

    simple_val = qnum("event_id % 4000")
    # 1-3 buckets at 40 + j/2 ms, counts 1..; bucket keys are STRINGS
    # in the real API payload
    hist = (
        "concat('{', array_join(transform(sequence(0, event_id % 3), "
        "j -> concat('\"', CAST(40 + (j + event_id % 2) div 2 AS STRING), "
        "CASE (j + event_id % 2) % 2 WHEN 0 THEN '.0' ELSE '.5' END, "
        "'\": ', CAST(1 + (event_id + j) % 5 AS STRING))), ', '), '}')"
    )
    subi = (
        "CASE WHEN event_id % 7 = 0 THEN '[]' ELSE "
        "concat('[', array_join(transform(sequence(0, event_id % 4), "
        "j -> concat('{\"duration\": ', " + qnum("120 + j") + ", "
        "', \"start\": ', " + qnum("j * 480") + ", "
        "', \"val\": ', " + qnum("(event_id * 3 + j) % 2000") + ", '}')), "
        "', '), ']') END"
    )
    trace = (
        "CASE WHEN event_id % 7 = 0 THEN '[]' ELSE "
        "concat('[', array_join(transform(sequence(1, 1 + event_id % 5), "
        "j -> concat('{\"success\": ', CAST(CASE WHEN (event_id + j) % 9 = 0 "
        "THEN 0 ELSE 1 END AS STRING), "
        "', \"ip\": \"10.0.', CAST(event_id % 20 AS STRING), '.', "
        "CAST(j AS STRING), '\"', "
        "CASE WHEN (event_id + j) % 3 = 0 THEN '' ELSE "
        "concat(', \"rtt\": ', " + qnum("(event_id * 5 + j * 7) % 800") + ") "
        "END, "
        "CASE WHEN (event_id + j) % 4 = 0 THEN '' ELSE concat("
        "', \"as\": {\"owner\": \"AS Owner ', CAST((event_id + j) % 6 "
        "AS STRING), '\", \"number\": ', CAST(64496 + (event_id + j) % 30 "
        "AS STRING), '}') END, "
        "', \"ttl\": ', CAST(j AS STRING), ', \"query\": 1}')), ', '), "
        "']') END"
    )
    href = (
        "CASE WHEN event_id % 11 = 0 THEN '{}' ELSE "
        "concat('{\"href\": \"https://ps.example.org/pscheduler/runs/', "
        "CAST(event_id % 97 AS STRING), '\"}') END"
    )
    failure = (
        "CASE WHEN event_id % 11 = 0 THEN '{\"detail\": \"x\"}' ELSE "
        "concat('{\"error\": \"Run failed: code ', "
        "CAST(event_id % 13 AS STRING), '\"}') END"
    )
    val_json = (
        f"CASE {m} WHEN 0 THEN {failure} "
        f"WHEN 1 THEN {hist} WHEN 2 THEN {hist} "
        f"WHEN 3 THEN {href} WHEN 4 THEN {trace} "
        f"WHEN 5 THEN {simple_val} WHEN 6 THEN {qnum('event_id % 4')} "
        "WHEN 7 THEN CAST(event_id % 600 AS STRING) "
        f"WHEN 8 THEN {qnum('event_id % 40')} "
        f"WHEN 9 THEN {subi} WHEN 10 THEN {subi} "
        f"ELSE {hist} END"
    )
    lines = events.select(
        "event_id",
        F.expr(
            "concat('/esmond/perfsonar/archive/', "
            "md5(CAST(event_id % 23 AS STRING)), '/', "
            f"{etype}, '/base')"
        ).alias("base_uri"),
        F.expr(etype).alias("event_type"),
        (F.col("event_id") * 30 + 1500000000).alias("ts_s"),
        F.expr(val_json).alias("val_json"),
    )
    # materialization barrier, as in synth_amp2_lines: the generator is
    # one giant concat/CASE tree referenced by every from_json branch;
    # checkpointing is the "read entries from storage" boundary a real
    # ingest has for free, and the repartition restores full
    # parallelism over the single-file events scan
    n = events.sparkSession.sparkContext.defaultParallelism
    return lines.repartition(n).localCheckpoint()


def _rtype_col() -> Column:
    """ResponseType.fromString as a chained CASE over the event-type
    column; unknown types -> NULL (the throw analogue)."""
    c = F.when(
        F.lower(F.col("event_type")) == "failures", F.lit("failure")
    )
    for et, cls in ESMOND_RESPONSE_TYPE.items():
        if et == "failures":
            continue
        c = c.when(F.lower(F.col("event_type")) == et, F.lit(cls))
    return c


def esmond_typed(entries: DataFrame) -> DataFrame:
    """The EsmondMeasurement.apply summary over every entry: one row per
    accepted entry with (entry_id, stream, metadata_key, subtype, time,
    plus per-class scalar summaries — NULL where the class doesn't
    carry them). Unknown event types are absent (the reference throws).

    Columns: ``simple_value``/``default_value`` (Simple, HasDefault),
    ``hist_n_buckets``/``hist_count_sum`` (Histogram),
    ``n_subintervals``/``subinterval_val_sum`` (Subinterval),
    ``n_hops``/``trace_rtt_sum`` (PacketTrace), ``href_location``
    (Href), ``failure_text`` (Failure), ``is_lossy`` = false always
    (EsmondMeasurement.scala:36-38).
    """
    typed = entries.select(
        F.col("event_id").alias("entry_id"),
        F.col("base_uri").alias("stream"),
        # Scala baseUri.split('/')(4): element 4 with the leading empty
        # segment, i.e. 1-based element 5 in Spark
        F.expr("split(base_uri, '/')[4]").alias("metadata_key"),
        "event_type",
        _rtype_col().alias("subtype"),
        F.expr(
            "timestampadd(SECOND, ts_s, "
            "timestamp_ntz'1970-01-01 00:00:00')"
        ).alias("time"),
        "val_json",
    ).where(F.col("subtype").isNotNull())
    simple = F.when(
        F.col("subtype") == "simple",
        F.expr("try_cast(val_json AS DOUBLE)"),
    )
    hist = F.expr("from_json(val_json, 'MAP<STRING, INT>')")
    subi = F.expr(f"from_json(val_json, '{_SUBINTERVAL_SCHEMA}')")
    trace = F.expr(f"from_json(val_json, '{_TRACE_SCHEMA}')")
    kv = F.expr("from_json(val_json, 'MAP<STRING, STRING>')")
    is_hist = F.col("subtype") == "histogram"
    is_subi = F.col("subtype") == "subinterval"
    is_trace = F.col("subtype") == "packet_trace"
    return typed.select(
        "entry_id",
        "stream",
        "metadata_key",
        "event_type",
        "subtype",
        "time",
        simple.alias("simple_value"),
        simple.alias("default_value"),
        F.when(is_hist, F.size(F.map_keys(hist))).alias(
            "hist_n_buckets"
        ),
        F.when(
            is_hist,
            F.aggregate(
                F.map_values(hist),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        ).alias("hist_count_sum"),
        F.when(is_subi, F.size(subi)).alias("n_subintervals"),
        F.when(
            is_subi,
            F.aggregate(
                subi,
                F.lit(0.0),
                lambda acc, s: acc + s["val"],
            ),
        ).alias("subinterval_val_sum"),
        F.when(is_trace, F.size(trace)).alias("n_hops"),
        F.when(
            is_trace,
            F.aggregate(
                trace,
                F.lit(0.0),
                lambda acc, h: acc + F.coalesce(h["rtt"], F.lit(0.0)),
            ),
        ).alias("trace_rtt_sum"),
        F.when(
            F.col("subtype") == "href",
            F.element_at(kv, "href"),
        ).alias("href_location"),
        F.when(
            F.col("subtype") == "failure",
            F.element_at(kv, "error"),
        ).alias("failure_text"),
        F.lit(False).alias("is_lossy"),
    )


def esmond_histogram_merged(entries: DataFrame) -> DataFrame:
    """The typed Histogram relation merged per stream: explode each
    entry's bucket map (keys → double, HistogramTimeSeriesEntry.scala:
    40-44 — buckets are always milliseconds) and bucket-wise sum counts
    per stream — the per-series histogram merge the detector layer
    consumes (measurements/esmond/Histogram.scala:36-41 +
    operators/histogram_merge's relational shape).

    Only histogram-class rows are scanned past the filter; the
    explode+hash-aggregate partial-aggregates map-side.
    """
    hist = entries.where(
        F.lower(F.col("event_type")).isin(
            "histogram-ttl", "histogram-owdelay"
        )
    )
    exploded = hist.select(
        F.col("base_uri").alias("stream"),
        F.explode(
            F.expr("from_json(val_json, 'MAP<STRING, INT>')")
        ).alias("bucket_raw", "n"),
    )
    return (
        exploded.groupBy(
            "stream",
            F.col("bucket_raw").cast("double").alias("bucket"),
        )
        .agg(F.sum("n").cast("long").alias("bucket_count"))
    )
