"""AMP (v1 / amplet) measurement-family ingest: the original AMP
InfluxDB line-protocol family — ICMP, DNS, HTTP, TCPPing,
TraceroutePathlen — as declared typed relations, plus the Postgres
meta tables and the Rich* broadcast enrichment.

Reference semantics being reproduced (all Scala, re-expressed as
Catalyst expressions — no UDFs anywhere in this module):

- ``InfluxMeasurementFactory.createMeasurement`` dispatches on the
  measurement (table) name prefix to one of ICMP / DNS /
  TraceroutePathlen / TCPPing / HTTP
  (measurements/traits/InfluxMeasurementFactory.scala:225-241).
- ``splitLineProtocol`` splits the WHOLE line on BOTH ',' and ' ' in
  one quote-aware pass (InfluxMeasurementFactory.scala:120-154), so —
  unlike amp2's LineProtocol.scala 3-part parse — tags and fields land
  in ONE flat token list; the first token is the measurement name and
  the last is the nanosecond timestamp.
- ``getNamedField(data, name)`` scans ALL tokens for the FIRST whose
  ``split('=')(0)`` equals ``name`` and returns ``split('=')(1)``
  (InfluxMeasurementFactory.scala:104-109) — values keep their quotes.
- Integer fields carry a trailing 'i' dropped before parsing
  (``_.dropRight(1).toInt``); doubles parse bare; DNS flags parse via
  Scala ``_.toBoolean`` (case-insensitive true/false, anything else
  throws); ``getRtts`` strips the 2-char edges (``"[`` / ``]"``),
  splits on commas, trims, maps 'None' -> None else toInt
  (InfluxMeasurementFactory.scala:166-189).
- A required field missing (``.get``) or any present field that fails
  its conversion throws inside ``create`` — the engine analogue is
  that the WHOLE line is dropped.
- time = ``Instant.ofEpochMilli(NANOSECONDS.toMillis(data.last
  .toLong))`` — the same ns->ms truncation as the amp2 family.
- ``defaultValue`` / ``isLossy`` per type (each case class):
  ICMP median / loss.getOrElse(100) > 0 (amp/ICMP.scala:63-67),
  DNS rtt / lossrate.getOrElse(1.0) > 0 (amp/DNS.scala:88-92),
  HTTP bytes / bytes.isEmpty (amp/HTTP.scala),
  TCPPing median / loss.getOrElse(100) > 0 (amp/TCPPing.scala:66-70),
  TraceroutePathlen path_length / false (amp/TraceroutePathlen.scala).
- Meta tables mirror the Postgres-backed ``*Meta`` case classes
  (amp/ICMPMeta.scala, DNSMeta.scala, TCPPingMeta.scala,
  HTTPMeta.scala, TracerouteMeta.scala) and ``Rich*`` enrichment
  concatenates meta columns (stream as string, source, destination,
  type-specific meta tail) before the base measurement's own fields
  (amp/RichICMP.scala, RichDNS.scala;
  InfluxMeasurementFactory.scala:243-268 enrichMeasurement).

Scale shape: one quote-parity split per line (linear fast path when
the line carries no quotes), one projection per typed table — no
explode, no shuffle, no Python. Rich* enrichment is a broadcast join
against the (small, Postgres-sized) meta dim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from streamevmon_spark.sources.amp2 import _no_collapse
from streamevmon_spark.sources.measurements import _UNQUOTED

# per-type declaration mirror, in case-class field order. Field kinds:
#   int_opt / int_req   trailing-'i' integers (Option / required .get)
#   double_opt          bare doubles
#   bool_opt            Scala toBoolean (case-insensitive true/false)
#   rtts_req            the quoted "[..]" rtt sequence (required .get)
# ``default`` names the defaultValue field; ``lossy`` is a SQL
# predicate over the parsed columns mirroring each type's isLossy.
AMP_TYPES: dict[str, dict] = {
    "icmp": {
        "table": "data_amp_icmp",
        "fields": [("loss", "int_opt"), ("lossrate", "double_opt"),
                   ("median", "int_opt"), ("packet_size", "int_req"),
                   ("results", "int_opt"), ("rtts", "rtts_req")],
        "default": "median",
        "lossy": "coalesce(loss, 100) > 0",
    },
    "dns": {
        "table": "data_amp_dns",
        "fields": [("flag_aa", "bool_opt"), ("flag_ad", "bool_opt"),
                   ("flag_cd", "bool_opt"), ("flag_qr", "bool_opt"),
                   ("flag_ra", "bool_opt"), ("flag_rd", "bool_opt"),
                   ("flag_tc", "bool_opt"), ("lossrate", "double_opt"),
                   ("opcode", "int_opt"), ("query_len", "int_opt"),
                   ("rcode", "int_opt"), ("requests", "int_req"),
                   ("response_size", "int_opt"), ("rtt", "int_opt"),
                   ("total_additional", "int_opt"),
                   ("total_answer", "int_opt"),
                   ("total_authority", "int_opt"), ("ttl", "int_opt")],
        "default": "rtt",
        "lossy": "coalesce(lossrate, 1.0) > 0.0",
    },
    "http": {
        "table": "data_amp_http",
        "fields": [("bytes", "int_opt"), ("duration", "int_opt"),
                   ("object_count", "int_req"),
                   ("server_count", "int_req")],
        "default": "bytes",
        "lossy": "bytes IS NULL",
    },
    "tcpping": {
        "table": "data_amp_tcpping",
        "fields": [("icmperrors", "int_opt"), ("loss", "int_opt"),
                   ("lossrate", "double_opt"), ("median", "int_opt"),
                   ("packet_size", "int_req"), ("results", "int_opt"),
                   ("rtts", "rtts_req")],
        "default": "median",
        "lossy": "coalesce(loss, 100) > 0",
    },
    "pathlen": {
        "table": "data_amp_traceroute_pathlen",
        "fields": [("path_length", "double_opt")],
        "default": "path_length",
        "lossy": "FALSE",
    },
}

# meta declaration mirror: type-specific columns AFTER the shared
# (stream, source, destination) head, in case-class order
AMP_META_COLS: dict[str, list[str]] = {
    "icmp": ["family", "packet_size_selection"],
    "dns": ["instance", "address", "query", "query_type",
            "query_class", "udp_payload_size", "recurse", "dnssec",
            "nsid"],
    "http": ["max_connections", "max_connections_per_server",
             "max_persistent_connections_per_server",
             "pipelining_max_requests", "persist", "pipelining",
             "caching"],
    "tcpping": ["port", "family", "packet_size_selection"],
    "traceroute": ["family", "packet_size_selection"],
}


def amp_tokens(lines: DataFrame) -> DataFrame:
    """splitLineProtocol's flat quote-aware split: (line_id,
    measurement, kvs array<string>, time). The split treats ',' and
    ' ' identically (one character class), ignoring separators inside
    double quotes — with a linear fast path for the (majority) lines
    carrying no quotes, where the plain codegen split is identical.
    ``kvs`` is every token between the measurement name and the
    timestamp; a non-numeric trailing token (``data.last.toLong``
    throws) drops the line."""
    toks = (
        "CASE WHEN NOT contains(value, '\"') "
        "THEN split(value, '[ ,]', -1) "
        f"ELSE split(value, '[ ,]{_UNQUOTED}', -1) END"
    )
    return (
        lines.select(
            F.col("event_id").alias("line_id"),
            F.expr(toks).alias("t"),
        )
        .where(F.size("t") >= 2)
        .select(
            "line_id",
            F.col("t").getItem(0).alias("measurement"),
            F.expr("slice(t, 2, size(t) - 2)").alias("kvs"),
            F.expr(
                "try_cast(element_at(t, -1) AS BIGINT)"
            ).alias("time_ns"),
        )
        .where(F.col("time_ns").isNotNull())
        .withColumn(
            "time",
            F.expr(
                "timestampadd(MICROSECOND, (time_ns div 1000000) * 1000,"
                " timestamp_ntz'1970-01-01 00:00:00')"
            ),
        )
    )


def _named(name: str) -> str:
    """getNamedField: the first token whose key (before the first '=')
    is ``name``; value = the segment between the first and second '='
    (Scala split('=')(1)). NULL when absent (headOption -> None).
    ``get()`` (NULL on invalid index) instead of ``[...]`` keeps the
    expression ANSI-safe under Spark 4's default ansi.enabled."""
    return (
        f"get(split(get(filter(kvs, "
        f"e -> get(split(e, '=', -1), 0) = '{name}'), 0), '=', -1), 1)"
    )


def _field_exprs(name: str, kind: str) -> tuple[Column, Column]:
    """(value column, line-valid predicate) for one declared field.
    The predicate is TRUE when the reference's create() would not
    throw on this field: required fields must be present, and any
    present value must convert (dropRight-'i' int / double / Scala
    toBoolean / rtts entries)."""
    raw = F.expr(_named(name))
    if kind in ("int_opt", "int_req"):
        val = F.expr(
            f"try_cast(substring({_named(name)}, 1, "
            f"length({_named(name)}) - 1) AS INT)"
        )
        ok = raw.isNull() | val.isNotNull()
        if kind == "int_req":
            ok = raw.isNotNull() & val.isNotNull()
        return val, ok
    if kind == "double_opt":
        val = F.expr(f"try_cast({_named(name)} AS DOUBLE)")
        return val, raw.isNull() | val.isNotNull()
    if kind == "bool_opt":
        low = F.lower(raw)
        val = F.when(low.isin("true", "false"), low == "true")
        return val, raw.isNull() | val.isNotNull()
    if kind == "rtts_req":
        inner = f"substring({_named(name)}, 3, length({_named(name)}) - 4)"
        val = F.expr(
            f"CASE WHEN length({inner}) = 0 "
            "THEN CAST(array() AS ARRAY<INT>) "
            f"ELSE transform(split({inner}, ','), x -> "
            "CASE WHEN trim(x) = 'None' THEN CAST(NULL AS INT) "
            "ELSE try_cast(trim(x) AS INT) END) END"
        )
        ok = raw.isNotNull() & F.expr(
            f"length({inner}) = 0 OR forall(split({inner}, ','), "
            "x -> trim(x) = 'None' OR try_cast(trim(x) AS INT) IS NOT NULL)"
        )
        return val, ok
    raise ValueError(kind)


def rtts_canon(col: str = "rtts") -> Column:
    """Canonical scalar serialization of an rtts array (lost pings as
    'None'), so gate hash comparisons stay scalar-typed."""
    return F.expr(
        f"concat_ws(';', transform({col}, "
        "x -> coalesce(CAST(x AS STRING), 'None')))"
    )


def amp_table(tokens: DataFrame, type_key: str,
              canon_rtts: bool = True) -> DataFrame:
    """One AMP type's fully-typed relation from ``amp_tokens`` output:
    (line_id, subtype, stream, <fields...>, time, default_value,
    is_lossy). Lines whose required fields are missing or whose
    present fields fail conversion are dropped whole — the create()
    throw/None set. ``canon_rtts`` replaces the rtts array with its
    scalar ';'-canon so the relation is hash-comparable."""
    spec = AMP_TYPES[type_key]
    sel = tokens.where(F.col("measurement") == spec["table"])
    sel = _no_collapse(sel, "kvs")
    stream = F.expr(_named("stream"))
    cols, valid = {}, stream.isNotNull()
    for name, kind in spec["fields"]:
        val, ok = _field_exprs(name, kind)
        cols[name] = val
        valid = valid & ok
    out = sel.where(valid).select(
        "line_id",
        F.lit(type_key).alias("subtype"),
        stream.alias("stream"),
        *[c.alias(n) for n, c in cols.items()],
        "time",
        cols[spec["default"]].cast("double").alias("default_value"),
    )
    out = out.withColumn("is_lossy", F.expr(spec["lossy"]))
    if canon_rtts and any(k == "rtts_req" for _, k in spec["fields"]):
        out = out.withColumn("rtts", rtts_canon("rtts"))
    return out


def amp_typed(tokens: DataFrame) -> DataFrame:
    """The createMeasurement summary over the 5 line-protocol AMP
    types: one row per accepted line with (line_id, measurement,
    subtype, stream, time, default_value, is_lossy). Unmatched
    measurement names and lines whose create() would throw are absent.

    Scale shape: ONE pass — the 5-type dispatch is a chained CASE on
    the measurement name inside a single projection (the Catalyst
    analogue of createMeasurement's match,
    InfluxMeasurementFactory.scala:229-238), not a 5-branch
    filter+union rescanning the parse per type."""
    sel = _no_collapse(tokens, "kvs")
    stream = F.expr(_named("stream"))
    subtype = dval = lossy = valid = None
    for type_key, spec in AMP_TYPES.items():
        cond = F.col("measurement") == spec["table"]
        v = stream.isNotNull()
        cols = {}
        for name, kind in spec["fields"]:
            val, ok = _field_exprs(name, kind)
            cols[name] = val
            v = v & ok
        d = cols[spec["default"]].cast("double")
        # isLossy over the inline columns (no named refs available in
        # the one-pass projection) — build per type explicitly:
        if type_key in ("icmp", "tcpping"):
            lz = F.coalesce(cols["loss"], F.lit(100)) > 0
        elif type_key == "dns":
            lz = F.coalesce(cols["lossrate"], F.lit(1.0)) > 0.0
        elif type_key == "http":
            lz = cols["bytes"].isNull()
        else:
            lz = F.lit(False)
        if subtype is None:
            subtype = F.when(cond, F.lit(type_key))
            dval = F.when(cond, d)
            lossy = F.when(cond, lz)
            valid = F.when(cond, v)
        else:
            subtype = subtype.when(cond, F.lit(type_key))
            dval = dval.when(cond, d)
            lossy = lossy.when(cond, lz)
            valid = valid.when(cond, v)
    return (
        sel.select(
            "line_id",
            "measurement",
            subtype.alias("subtype"),
            stream.alias("stream"),
            "time",
            dval.cast("double").alias("default_value"),
            lossy.alias("is_lossy"),
            valid.alias("__valid"),
        )
        .where(F.col("subtype").isNotNull() & F.col("__valid"))
        .drop("__valid")
    )


def enrich_amp(base: DataFrame, meta: DataFrame) -> DataFrame:
    """Rich* enrichment (InfluxMeasurementFactory.enrichMeasurement +
    Rich*.create): broadcast-join the typed base relation against its
    Postgres meta dim on the integer stream id, emitting the meta
    columns (stream as string, source, destination, type-specific
    tail) BEFORE the base measurement's own fields — the Rich* case
    class column order. Base rows with no meta row are dropped
    (getMeta -> None -> enrichment fails)."""
    meta_cols = [c for c in meta.columns if c != "stream"]
    base_cols = [c for c in base.columns
                 if c not in ("line_id", "subtype", "stream")]
    return (
        base.withColumn("__sid", F.col("stream").cast("int"))
        .join(F.broadcast(meta), F.col("__sid") == meta["stream"])
        .select(
            base["line_id"],
            base["subtype"],
            meta["stream"].cast("string").alias("stream"),
            *[meta[c] for c in meta_cols],
            *[base[c] for c in base_cols],
        )
    )


def synth_amp_meta(spark: SparkSession, type_key: str,
                   n_streams: int = 500) -> DataFrame:
    """Deterministic meta dim mirroring the Postgres ``*Meta`` tables
    (amp/ICMPMeta.scala etc.): one row per stream id in closed form —
    regenerated identically by the DuckDB oracle (amp_oracles)."""
    s = F.col("id").cast("int")
    base = spark.range(n_streams).select(
        "id",
        s.alias("stream"),
        F.concat(F.lit("amphost-"), (s % 5).cast("string"))
         .alias("source"),
        F.concat(F.lit("ampdst-"), (s % 7).cast("string"))
         .alias("destination"),
    )
    if type_key in ("icmp", "traceroute"):
        return base.select(
            "stream", "source", "destination",
            F.when(s % 2 == 0, "ipv4").otherwise("ipv6").alias("family"),
            F.when(s % 3 == 0, "random").otherwise("84")
             .alias("packet_size_selection"),
        )
    if type_key == "tcpping":
        return base.select(
            "stream", "source", "destination",
            (F.lit(443) + s % 2).alias("port"),
            F.when(s % 2 == 0, "ipv4").otherwise("ipv6").alias("family"),
            F.when(s % 3 == 0, "random").otherwise("84")
             .alias("packet_size_selection"),
        )
    if type_key == "dns":
        return base.select(
            "stream", "source", "destination",
            F.concat(F.lit("inst-"), (s % 3).cast("string"))
             .alias("instance"),
            F.concat(F.lit("192.0.2."), (s % 254).cast("string"))
             .alias("address"),
            F.concat(F.lit("q"), (s % 5).cast("string"),
                     F.lit(".example.com")).alias("query"),
            F.lit("AAAA").alias("query_type"),
            F.lit("IN").alias("query_class"),
            (F.lit(4096)).alias("udp_payload_size"),
            (s % 2 == 0).alias("recurse"),
            (s % 3 == 0).alias("dnssec"),
            F.lit(False).alias("nsid"),
        )
    if type_key == "http":
        return base.select(
            "stream", "source", "destination",
            F.lit(24).alias("max_connections"),
            F.lit(8).alias("max_connections_per_server"),
            F.lit(2).alias("max_persistent_connections_per_server"),
            F.lit(4).alias("pipelining_max_requests"),
            (s % 2 == 0).alias("persist"),
            F.lit(False).alias("pipelining"),
            (s % 5 == 0).alias("caching"),
        )
    raise ValueError(type_key)


def synth_amp_lines(events: DataFrame) -> DataFrame:
    """Deterministic AMP v1 line-protocol lines derived from the
    events relation, covering all 5 line-protocol types plus an
    unknown-measurement class, with every acceptance/rejection branch
    the reference parse has: missing stream tag (required .get), a
    malformed required int ('badi'), an invalid DNS boolean, lossy
    rows (missing default field), empty and None-holding rtts arrays
    (with trimmed spaces), zero-padded ints, capitalized booleans, and
    the ns->ms timestamp truncation. Grammar mirrored in closed form
    by the DuckDB oracle (amp_oracles.py)."""
    m = "event_id % 6"
    mname = (
        f"CASE {m} WHEN 0 THEN 'data_amp_icmp' "
        "WHEN 1 THEN 'data_amp_dns' WHEN 2 THEN 'data_amp_http' "
        "WHEN 3 THEN 'data_amp_tcpping' "
        "WHEN 4 THEN 'data_amp_traceroute_pathlen' "
        "ELSE 'data_amp_other' END"
    )
    # stream tag omitted when event_id % 41 = 0 -> create().get throws
    stream_tag = (
        "CASE WHEN event_id % 41 = 0 THEN '' "
        "ELSE concat(',stream=', event_id % 500) END"
    )
    lossy = "event_id % 7 = 0"
    # icmp/tcpping rtts: empty every 11th, else [a, b,None, c] with
    # assorted spaces (trim semantics)
    rtts = (
        "CASE WHEN event_id % 11 = 0 THEN 'rtts=\"[]\"' "
        "ELSE concat('rtts=\"[', event_id % 300, ', ', "
        "(event_id * 7) % 300, ',None, ', (event_id * 13) % 300, "
        "']\"') END"
    )
    # median malformed every 53rd (toInt throws -> line dropped);
    # omitted when lossy; zero-padded every 3rd otherwise
    median = (
        "CASE WHEN event_id % 53 = 0 THEN ',median=badi' "
        f"WHEN {lossy} THEN '' "
        "WHEN event_id % 3 = 0 THEN concat(',median=0', "
        "event_id % 250, 'i') "
        "ELSE concat(',median=', event_id % 250, 'i') END"
    )
    icmp_like = (
        f"concat('loss=', CASE WHEN {lossy} THEN '2i' ELSE '0i' END, "
        f"',lossrate=', CASE WHEN {lossy} THEN '0.1' ELSE '0.0' END, "
        f"{median}, "
        "',packet_size=', CASE WHEN event_id % 3 = 0 THEN '0' "
        "ELSE '' END, 84 + event_id % 9, 'i', "
        f"',results=', CASE WHEN {lossy} THEN '8i' ELSE '10i' END, "
        f"',', {rtts})"
    )
    # DNS: flag_ra invalid every 37th (toBoolean throws); flag_ad /
    # flag_tc / ttl / rtt / response_size optional-absent classes;
    # flag_qr capitalized every 9th (toBoolean is case-insensitive)
    dns_fields = (
        "concat('flag_aa=', CASE WHEN event_id % 2 = 0 THEN 'true' "
        "ELSE 'false' END, "
        "CASE WHEN event_id % 3 = 0 THEN '' "
        "ELSE ',flag_ad=false' END, "
        "',flag_cd=true', "
        "',flag_qr=', CASE WHEN event_id % 9 = 0 THEN 'True' "
        "ELSE 'true' END, "
        "',flag_ra=', CASE WHEN event_id % 37 = 0 THEN 'maybe' "
        "ELSE 'false' END, "
        "',flag_rd=true', "
        "CASE WHEN event_id % 4 = 0 THEN '' "
        "ELSE ',flag_tc=false' END, "
        f"',lossrate=', CASE WHEN {lossy} THEN '1.0' ELSE '0.0' END, "
        "',opcode=', event_id % 3, 'i', "
        "',query_len=', 30 + event_id % 20, 'i', "
        "',rcode=', event_id % 4, 'i', "
        "',requests=1i', "
        f"CASE WHEN {lossy} THEN '' ELSE concat(',response_size=', "
        "120 + event_id % 64, 'i') END, "
        f"CASE WHEN {lossy} THEN '' ELSE concat(',rtt=', "
        "event_id % 120000, 'i') END, "
        "',total_additional=1i,total_answer=1i,total_authority=0i', "
        "CASE WHEN event_id % 6 = 0 THEN '' ELSE concat(',ttl=', "
        "event_id % 3600, 'i') END)"
    )
    http_fields = (
        f"concat(CASE WHEN {lossy} THEN '' ELSE concat('bytes=', "
        "1000 + event_id % 7000, 'i,') END, "
        "'duration=', event_id % 2000, 'i', "
        "',object_count=8i', "
        "',server_count=', 1 + event_id % 3, 'i')"
    )
    tcpping_fields = (
        f"concat('icmperrors=', event_id % 2, 'i,', {icmp_like})"
    )
    pathlen_fields = (
        "CASE WHEN event_id % 13 = 0 THEN 'probes=1i' "
        "ELSE concat('path_length=', 4 + event_id % 12, '.0') END"
    )
    other_fields = "'value=1i'"
    fields = (
        f"CASE {m} WHEN 0 THEN {icmp_like} "
        f"WHEN 1 THEN {dns_fields} "
        f"WHEN 2 THEN {http_fields} "
        f"WHEN 3 THEN {tcpping_fields} "
        f"WHEN 4 THEN {pathlen_fields} "
        f"ELSE {other_fields} END"
    )
    lines = events.select(
        "event_id",
        F.expr(
            f"concat({mname}, {stream_tag}, ' ', {fields}, ' ', "
            "CAST(event_id * 1000000000 + 987654321 AS STRING))"
        ).alias("value"),
    )
    # materialization barrier + parallelism spread — see
    # sources/amp2.synth_amp2_lines
    n = events.sparkSession.sparkContext.defaultParallelism
    return lines.repartition(n).localCheckpoint()
