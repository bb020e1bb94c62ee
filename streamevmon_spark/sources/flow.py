"""libtrace-bigdata ``Flow`` measurement family: the flow_statistics
line-protocol table parsed into the full 29-field typed relation.

Reference semantics being reproduced (all Scala, re-expressed as one
Catalyst projection over the shared line-protocol map parse — no UDFs):

- ``Flow.create`` (measurements/bigdata/Flow.scala:196-236): lines
  whose measurement head is not ``flow_statistics`` are None; all
  other fields are looked up by name (getNamedField — order-free),
  with integer fields 'i'-stripped, quoted strings quote-stripped,
  and ``FlowType.withName`` throwing (-> dropped) on any type tag
  outside {flow_start, flow_interval, flow_end}
  (Flow.scala:155-160).
- stream id = the ``flow_id`` field (Flow.scala:45-46 @Column
  annotation; kept as a string, Flow.scala:203).
- ``time`` is the line timestamp ns->ms truncated; ``start_ts`` /
  ``end_ts`` are already epoch-ms integer fields; ``end_ts`` is
  Option (Flow.scala:207-209).
- geolocation (Maxmind plugin output) is Option-typed per side; city/
  country are quote-stripped but the geohash is kept RAW — quotes and
  all (Flow.scala:219-221: getNamedField without .drop(1).dropRight
  (1)) — and the source-side geohash_value is parsed WITHOUT the 'i'
  strip while the destination side strips it (Flow.scala:222 vs :229).
  These asymmetries are deliberate reference quirks; the synthetic
  grammar emits exactly the shapes the reference parser accepts
  (src value unsuffixed, dst value 'i'-suffixed) so the quirk is
  load-bearing and oracle-checked.
- ``isLossy`` = false always; ``defaultValue`` = time_to_first_byte
  (Flow.scala:118-120); ``includesGeolocation`` = source geohash
  present (Flow.scala:122).

Scale shape: one projection over ``line_protocol_maps`` output (shared
with the amp2 family) — measurement + type filters prune before the
wide column build, the tags/fields maps sit behind a no-collapse
barrier so they are built once per row, and nothing shuffles. The
rollup is a single hash aggregation with map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from streamevmon_spark.sources.amp2 import (
    _field_col,
    _no_collapse,
    _tag_col,
    line_protocol_maps,
)

FLOW_TYPES = ("flow_start", "flow_interval", "flow_end")


def _qnum(q: str) -> str:
    """Exact quarter-integer double text for q/4 (q >= 0)."""
    return (
        f"concat(CAST(({q}) div 4 AS STRING), "
        f"CASE ({q}) % 4 WHEN 0 THEN '.0' WHEN 1 THEN '.25' "
        "WHEN 2 THEN '.5' ELSE '.75' END)"
    )


def synth_flow_lines(events: DataFrame) -> DataFrame:
    """Deterministic flow_statistics line-protocol lines derived from
    the events relation: ~3 records per flow (start/interval/end via
    event_id % 3 over flow_id = event_id div 3), Option coverage for
    end_ts (flow_end only) and for each side's geolocation block
    (src: flow_id % 5, dst: flow_id % 7 — independently), quoted
    string fields containing spaces (quote-parity split coverage), an
    invalid-FlowType class (event_id % 29 = 0 -> dropped whole) and a
    foreign-measurement class (event_id % 31 = 0 -> dropped whole).
    All doubles are quarter-integers so both engines hold identical
    values. Grammar mirrored in closed form by flow_oracles.py."""
    fid = "event_id div 3"
    typ = (
        "CASE WHEN event_id % 29 = 0 THEN 'flow_weird' "
        "ELSE CASE event_id % 3 WHEN 0 THEN 'flow_start' "
        "WHEN 1 THEN 'flow_interval' ELSE 'flow_end' END END"
    )
    mname = (
        "CASE WHEN event_id % 31 = 0 THEN 'other_stats' "
        "ELSE 'flow_statistics' END"
    )
    tags = (
        f"concat({mname}, "
        "',capture_application=libtrace-bigdata', "
        f"',capture_host=cap-', ({fid}) % 4, "
        f"',category=cat', ({fid}) % 6, "
        f"',protocol=', CASE ({fid}) % 3 WHEN 0 THEN 'tcp' "
        "WHEN 1 THEN 'udp' ELSE 'icmp' END, "
        f"',type=', {typ})"
    )
    end_ts = (
        "CASE WHEN event_id % 3 = 2 THEN concat(',end_ts=', "
        f"1622329200000 + ({fid}) * 1000 + event_id % 90000, 'i') "
        "ELSE '' END"
    )
    src_geo = (
        f"CASE WHEN ({fid}) % 5 != 0 THEN concat("
        f"',source_ip_city=\"City ', ({fid}) % 9, '\"', "
        f"',source_ip_country=\"NZ', ({fid}) % 5, '\"', "
        f"',source_ip_geohash=\"gh', ({fid}) % 50, '\"', "
        # source-side geohash_value is UNsuffixed (Flow.scala:222
        # parses it with a bare toInt)
        f"',source_ip_geohash_value=', ({fid}) % 1000, "
        f"',source_ip_latitude=', {_qnum(f'({fid}) % 360')}, "
        f"',source_ip_longitude=', {_qnum('event_id % 1440')}) "
        "ELSE '' END"
    )
    dst_geo = (
        f"CASE WHEN ({fid}) % 7 != 0 THEN concat("
        f"',destination_ip_city=\"Town ', ({fid}) % 11, '\"', "
        f"',destination_ip_country=\"AU', ({fid}) % 6, '\"', "
        f"',destination_ip_geohash=\"dh', ({fid}) % 40, '\"', "
        # destination-side geohash_value IS 'i'-suffixed
        # (Flow.scala:229 strips it)
        f"',destination_ip_geohash_value=', (({fid}) * 3) % 1000, 'i', "
        f"',destination_ip_latitude=', {_qnum(f'({fid}) % 300')}, "
        f"',destination_ip_longitude=', {_qnum('(event_id * 5) % 1400')}"
        ") ELSE '' END"
    )
    fields = (
        f"concat('flow_id=', {fid}, 'i', "
        f"',start_ts=', 1622329200000 + ({fid}) * 1000, 'i', "
        f"',duration=', {_qnum('event_id % 4800')}, "
        "',in_bytes=', event_id % 100000, 'i', "
        "',out_bytes=', (event_id * 7) % 100000, 'i', "
        f"',ttfb=', {_qnum('event_id % 2000')}, "
        f"',source_ip=\"10.', ({fid}) % 32, '.', ({fid}) % 250, '.', "
        "event_id % 250, '\"', "
        "',src_port=', 1024 + event_id % 60000, 'i', "
        f"',destination_ip=\"192.168.', ({fid}) % 250, '.', "
        "event_id % 200, '\"', "
        "',dst_port=', 1024 + (event_id * 3) % 60000, 'i', "
        f"{end_ts}, {src_geo}, {dst_geo})"
    )
    # fields starts with 'flow_id=' (no leading comma); tags block ends
    # with the type tag, so tags + ' ' + fields + ' ' + ts
    lines = events.select(
        "event_id",
        F.expr(
            f"concat({tags}, ' ', {fields}, ' ', "
            "CAST(event_id * 10000000 + 1622329200000000000 + 123456 "
            "AS STRING))"
        ).alias("value"),
    )
    # same materialization barrier as synth_amp2_lines (generator is
    # one giant concat tree; checkpoint = the read-from-storage
    # boundary, repartition restores parallelism over the events scan)
    n = events.sparkSession.sparkContext.defaultParallelism
    return lines.repartition(n).localCheckpoint()


def flow_typed(lines: DataFrame) -> DataFrame:
    """Flow.create over every line: the full typed flow_statistics
    relation, rejection classes dropped (foreign measurement, invalid
    FlowType)."""
    parsed = _no_collapse(line_protocol_maps(lines), "tags", "fields")
    sel = parsed.where(
        (F.col("measurement") == "flow_statistics")
        & _tag_col("type", "str").isin(*FLOW_TYPES)
    )
    ms_to_ts = (
        "timestampadd(MICROSECOND, {0} * 1000, "
        "timestamp_ntz'1970-01-01 00:00:00')"
    )
    start_ms = (
        "try_cast(substring(element_at(fields, 'start_ts'), 1, "
        "length(element_at(fields, 'start_ts')) - 1) AS BIGINT)"
    )
    end_ms = (
        "try_cast(substring(element_at(fields, 'end_ts'), 1, "
        "length(element_at(fields, 'end_ts')) - 1) AS BIGINT)"
    )
    ttfb = _field_col("ttfb", "double")
    src_gh = _field_col("source_ip_geohash", "str")
    return sel.select(
        F.col("line_id"),
        _tag_col("capture_application", "str").alias(
            "capture_application"
        ),
        _tag_col("capture_host", "str").alias("capture_host"),
        # stream = flow_id field, 'i'-stripped, KEPT AS A STRING
        F.expr(
            "substring(element_at(fields, 'flow_id'), 1, "
            "length(element_at(fields, 'flow_id')) - 1)"
        ).alias("stream"),
        _tag_col("type", "str").alias("flow_type"),
        _tag_col("category", "str").alias("category"),
        _tag_col("protocol", "str").alias("protocol"),
        F.col("time"),
        F.expr(ms_to_ts.format(f"({start_ms})")).alias("start_time"),
        F.expr(ms_to_ts.format(f"({end_ms})")).alias("end_time"),
        _field_col("duration", "double").alias("duration"),
        _field_col("in_bytes", "long").cast("int").alias("in_bytes"),
        _field_col("out_bytes", "long").cast("int").alias("out_bytes"),
        ttfb.alias("time_to_first_byte"),
        _field_col("source_ip", "str_stripped").alias("source_ip"),
        _field_col("src_port", "long").cast("int").alias("source_port"),
        _field_col("source_ip_city", "str_stripped").alias(
            "source_ip_city"
        ),
        _field_col("source_ip_country", "str_stripped").alias(
            "source_ip_country"
        ),
        # geohash kept RAW — quotes included (Flow.scala:219-221)
        src_gh.alias("source_ip_geohash"),
        # source side: bare toInt, no 'i' strip (Flow.scala:222)
        F.expr(
            "try_cast(element_at(fields, 'source_ip_geohash_value') "
            "AS INT)"
        ).alias("source_ip_geohash_value"),
        _field_col("source_ip_latitude", "double").alias(
            "source_ip_latitude"
        ),
        _field_col("source_ip_longitude", "double").alias(
            "source_ip_longitude"
        ),
        _field_col("destination_ip", "str_stripped").alias(
            "destination_ip"
        ),
        _field_col("dst_port", "long").cast("int").alias(
            "destination_port"
        ),
        _field_col("destination_ip_city", "str_stripped").alias(
            "destination_ip_city"
        ),
        _field_col("destination_ip_country", "str_stripped").alias(
            "destination_ip_country"
        ),
        _field_col("destination_ip_geohash", "str").alias(
            "destination_ip_geohash"
        ),
        # destination side: 'i'-stripped (Flow.scala:229)
        _field_col("destination_ip_geohash_value", "long")
        .cast("int")
        .alias("destination_ip_geohash_value"),
        _field_col("destination_ip_latitude", "double").alias(
            "destination_ip_latitude"
        ),
        _field_col("destination_ip_longitude", "double").alias(
            "destination_ip_longitude"
        ),
        ttfb.alias("default_value"),
        F.lit(False).alias("is_lossy"),
        src_gh.isNotNull().alias("includes_geolocation"),
    )


def flow_rollup(typed: DataFrame) -> DataFrame:
    """Per-(capture_host, category, protocol) flow statistics: the
    continuous-aggregate shape a flow dashboard maintains — completed-
    flow byte totals (flow_end records carry the flow's final
    counters), first-byte latency sums over flow starts, and
    flow/record counts. One hash aggregation, map-side partials;
    sums stay integer/quarter-exact cross-engine."""
    return typed.groupBy("capture_host", "category", "protocol").agg(
        F.count("*").alias("n_records"),
        F.countDistinct("stream").alias("n_flows"),
        F.count(F.when(F.col("flow_type") == "flow_end", 1)).alias(
            "n_ended"
        ),
        F.sum(
            F.when(F.col("flow_type") == "flow_end", F.col("in_bytes"))
        ).cast("long").alias("in_bytes_total"),
        F.sum(
            F.when(F.col("flow_type") == "flow_end", F.col("out_bytes"))
        ).cast("long").alias("out_bytes_total"),
        F.sum(
            F.when(
                F.col("flow_type") == "flow_start",
                F.col("time_to_first_byte"),
            )
        ).alias("ttfb_sum"),
        F.max("duration").alias("duration_max"),
    )
