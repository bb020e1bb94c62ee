"""amp2 (amplet2) measurement-family ingest: the full 10-family /
13-concrete-type mapping from InfluxDB line protocol to typed relations.

Reference semantics being reproduced (all Scala, re-expressed as
Catalyst expressions — no UDFs anywhere in this module):

- ``Amp2Measurement.createFromLineProtocol`` dispatches on the
  measurement name to one of External / Fastping / Http / Latency /
  Pathlen / Sip / Throughput / Traceroute / Udpstream / Video
  (reference: measurements/amp2/Amp2Measurement.scala:96-113); Latency
  further dispatches on the ``test`` tag to LatencyDns / LatencyIcmp /
  LatencyTcpping (measurements/amp2/Latency.scala:55-59).
- stream key = (measurementName, source, destination, test) ++ the
  type's declared tag sequence, joined with ``--``
  (Amp2Measurement.scala:55-58,66).
- tag accessors throw on missing/unconvertible values and field
  accessors are Option-typed: integer fields carry a trailing ``i``
  dropped before parsing (``getFieldAsLong`` = dropRight(1).toLong),
  doubles parse bare, string fields keep their quotes EXCEPT
  Traceroute.address and Throughput.duration which strip them
  (connectors/influx/LineProtocol.scala:52-79,
  Traceroute.scala address drop(1).dropRight(1),
  Throughput.scala:81). A row whose required tags are missing or
  unconvertible is dropped — the engine analogue of create() throwing /
  returning None.
- ``Direction`` accepts exactly "in"/"out" case-insensitively
  (measurements/amp2/Direction.scala); booleans parse
  case-insensitively ("False" in the real amp2 export).
- ``defaultValue`` (and isLossy = defaultValue.isEmpty) per type:
  external=value, fastping=rtt, http=bytes, latency*=rtt,
  pathlen=length, sip=rtt, throughput=bytes, traceroute=rtt,
  udpstream=rtt, video=playing_time (each type's case class).

Scale shape: everything is one projection + filter over the map-typed
parse — no explode, no shuffle, no Python. The per-family tables are
plain filters on the same relation, so Catalyst prunes the map lookups
each family doesn't use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from streamevmon_spark.sources.measurements import _UNQUOTED

AMP2_SEP = "--"

# per-type declaration mirror: (tag_name, kind) in the case-class tag
# order; kind in {str, long, bool, dir}. Field specs: (name, kind) with
# kind in {long, double, str, str_stripped}.
AMP2_TYPES: dict[str, dict] = {
    "external": {
        "tags": [("command", "str")],
        "fields": [("count", "long"), ("value", "long")],
        "default": "value",
    },
    "fastping": {
        "tags": [("dscp", "str"), ("family", "str"),
                 ("packet_count", "long"), ("packet_rate", "long"),
                 ("packet_size", "long")],
        "fields": [("count", "long"), ("jitter", "long"),
                   ("loss_percent", "double"), ("rtt", "long")],
        "default": "rtt",
    },
    "http": {
        "tags": [("caching", "str")],
        "fields": [("bytes", "long"), ("count", "long"),
                   ("duration", "long"), ("object_count", "long"),
                   ("server_count", "long")],
        "default": "bytes",
    },
    "latency-dns": {
        "measurement": "latency",
        "test": "dns",
        "tags": [("dscp", "str"), ("family", "str"), ("query", "str")],
        "fields": [("count", "long"), ("error_code", "long"),
                   ("error_type", "long"), ("icmpcode", "long"),
                   ("icmptype", "long"), ("loss", "long"),
                   ("rtt", "long")],
        "default": "rtt",
    },
    "latency-icmp": {
        "measurement": "latency",
        "test": "icmp",
        "tags": [("dscp", "str"), ("family", "str"),
                 ("packet_size", "long"), ("random", "bool")],
        "fields": [("count", "long"), ("error_code", "long"),
                   ("error_type", "long"), ("icmpcode", "long"),
                   ("icmptype", "long"), ("loss", "long"),
                   ("rtt", "long")],
        "default": "rtt",
    },
    "latency-tcpping": {
        "measurement": "latency",
        "test": "tcpping",
        "tags": [("dscp", "str"), ("family", "str"),
                 ("packet_size", "long"), ("port", "long"),
                 ("random", "bool")],
        "fields": [("count", "long"), ("error_code", "long"),
                   ("error_type", "long"), ("icmpcode", "long"),
                   ("icmptype", "long"), ("loss", "long"),
                   ("rtt", "long")],
        "default": "rtt",
    },
    "pathlen": {
        "tags": [("dscp", "str"), ("family", "str"),
                 ("packet_size", "long"), ("random", "bool")],
        "fields": [("length", "long")],
        "default": "length",
    },
    "sip": {
        "tags": [("dscp", "str"), ("family", "str"), ("uri", "str")],
        "fields": [("connect_time", "long"), ("count", "long"),
                   ("duration", "long"), ("response_time", "long"),
                   ("rtt", "long"), ("rx_jitter", "long"),
                   ("rx_loss_percent", "double"), ("tx_jitter", "long"),
                   ("tx_loss_percent", "double")],
        "default": "rtt",
    },
    "throughput": {
        "tags": [("direction", "dir"), ("dscp", "str"),
                 ("family", "str"), ("protocol", "str"),
                 ("write_size", "long")],
        "fields": [("bytes", "long"), ("count", "long"),
                   ("duration", "str_stripped"), ("runtime", "double")],
        "default": "bytes",
    },
    "traceroute": {
        "tags": [("dscp", "str"), ("family", "str"), ("hop", "long"),
                 ("packet_size", "long"), ("random", "bool")],
        "fields": [("address", "str_stripped"), ("rtt", "long")],
        "default": "rtt",
    },
    "udpstream": {
        "tags": [("direction", "dir"), ("dscp", "str"),
                 ("family", "str"), ("packet_count", "long"),
                 ("packet_size", "long"), ("packet_spacing", "long")],
        "fields": [("count", "long"), ("jitter", "long"),
                   ("loss", "double"), ("mos", "double"),
                   ("rtt", "long")],
        "default": "rtt",
    },
    "video": {
        "tags": [("requested_quality", "str")],
        "fields": [("actual_quality", "long"), ("count", "long"),
                   ("initial_buffering", "long"),
                   ("playing_time", "long"), ("pre_time", "long"),
                   ("stall_count", "long"), ("stall_time", "long")],
        "default": "playing_time",
    },
}


def _quote_aware_split(src: str, sep: str) -> str:
    """SQL for a quote-parity split with a linear fast path: a string
    containing no '\"' splits identically with the plain (codegen,
    O(len)) split, so the O(len^2) lookahead regex only runs on the
    minority of lines that actually carry quoted values."""
    return (
        f"CASE WHEN NOT contains({src}, '\"') "
        f"THEN split({src}, '{sep}', -1) "
        f"ELSE split({src}, '{sep}{_UNQUOTED}', -1) END"
    )


def line_protocol_maps(lines: DataFrame) -> DataFrame:
    """Line-protocol parse to map-typed columns: (line_id, measurement,
    tags map<string,string>, fields map<string,string>, time). Same
    split/rejection semantics as
    sources.measurements.parse_line_protocol (quote-parity splits,
    3-part lines, all-'=' entry split, ns->ms truncation), but the
    entries stay as maps in one projection — no explode, no shuffle —
    which is the shape typed extraction wants. Each entry is split on
    '=' exactly once (the kv arrays feed both the rejection predicate
    and the map build)."""
    parts = lines.select(
        F.col("event_id").alias("line_id"),
        F.expr(_quote_aware_split("value", " ")).alias("p"),
    ).where(F.size("p") == 3)
    kv_ok = "forall(__KV__, kv -> size(kv) = 2)"
    to_map = (
        "map_from_entries(transform(__KV__, kv -> "
        "struct(kv[0], kv[1])))"
    )
    return (
        parts.select(
            "line_id",
            F.expr(_quote_aware_split("p[0]", ",")).alias("mt"),
            F.expr(_quote_aware_split("p[1]", ",")).alias("fs"),
            F.col("p").getItem(2).cast("long").alias("time_ns"),
        )
        .select(
            "line_id",
            F.col("mt").getItem(0).alias("measurement"),
            F.expr(
                "transform(slice(mt, 2, size(mt) - 1),"
                " e -> split(e, '=', -1))"
            ).alias("tag_kvs"),
            F.expr("transform(fs, e -> split(e, '=', -1))").alias(
                "field_kvs"
            ),
            "time_ns",
        )
        .where(
            F.expr(kv_ok.replace("__KV__", "tag_kvs"))
            & F.expr(kv_ok.replace("__KV__", "field_kvs"))
        )
        .select(
            "line_id",
            "measurement",
            F.expr(to_map.replace("__KV__", "tag_kvs")).alias("tags"),
            F.expr(to_map.replace("__KV__", "field_kvs")).alias(
                "fields"
            ),
            F.expr(
                "timestampadd(MICROSECOND, (time_ns div 1000000) * 1000,"
                " timestamp_ntz'1970-01-01 00:00:00')"
            ).alias("time"),
        )
    )


def _tag_col(name: str, kind: str) -> Column:
    raw = F.element_at(F.col("tags"), F.lit(name))
    if kind == "str":
        return raw
    if kind == "long":
        return F.expr(f"try_cast(element_at(tags, '{name}') AS BIGINT)")
    if kind == "bool":
        low = F.lower(raw)
        return F.when(low.isin("true", "false"), low == "true")
    if kind == "dir":
        low = F.lower(raw)
        return F.when(low.isin("in", "out"), low)
    raise ValueError(kind)


def _field_col(name: str, kind: str) -> Column:
    raw = F.element_at(F.col("fields"), F.lit(name))
    if kind == "long":
        # integer line-protocol fields carry a trailing 'i':
        # getFieldAsLong = dropRight(1).toLong
        return F.expr(
            f"try_cast(substring(element_at(fields, '{name}'), 1, "
            f"length(element_at(fields, '{name}')) - 1) AS BIGINT)"
        )
    if kind == "double":
        return F.expr(
            f"try_cast(element_at(fields, '{name}') AS DOUBLE)"
        )
    if kind == "str":
        return raw
    if kind == "str_stripped":
        return F.expr(
            f"substring(element_at(fields, '{name}'), 2, "
            f"length(element_at(fields, '{name}')) - 2)"
        )
    raise ValueError(kind)


def _tag_str_repr(col: Column, kind: str) -> Column:
    """The Scala toString used inside the stream key: longs in decimal
    (hop=03 -> "3"), booleans lowercase, Direction "in"/"out"."""
    if kind == "bool":
        return F.when(col, "true").otherwise("false")
    return col.cast("string")


def amp2_table(parsed: DataFrame, type_key: str) -> DataFrame:
    """One family's typed relation from ``line_protocol_maps`` output:
    (line_id, subtype, source, destination, test, time, stream,
    <tags...>, <fields...>, default_value, is_lossy). Rows whose
    required tags are missing/unconvertible are dropped (the create()
    -> None / throw analogue)."""
    spec = AMP2_TYPES[type_key]
    mname = spec.get("measurement", type_key)
    # barrier before the many per-column tag/field references (see
    # _no_collapse); keep it above the measurement filter so the
    # filter still prunes rows below the barrier
    sel = parsed.where(F.col("measurement") == mname)
    sel = _no_collapse(sel, "tags", "fields")
    if "test" in spec:
        sel = sel.where(
            F.element_at(F.col("tags"), F.lit("test")) == spec["test"]
        )
    base = {
        "source": _tag_col("source", "str"),
        "destination": _tag_col("destination", "str"),
        "test": _tag_col("test", "str"),
    }
    tag_cols = {n: _tag_col(n, k) for n, k in spec["tags"]}
    field_cols = {n: _field_col(n, k) for n, k in spec["fields"]}
    required = list(base.values()) + list(tag_cols.values())
    valid = required[0].isNotNull()
    for c in required[1:]:
        valid = valid & c.isNotNull()
    stream = F.concat_ws(
        AMP2_SEP,
        F.lit(mname),
        base["source"],
        base["destination"],
        base["test"],
        *[
            _tag_str_repr(tag_cols[n], k)
            for n, k in spec["tags"]
        ],
    )
    default_value = field_cols[spec["default"]].cast("double")
    return sel.where(valid).select(
        "line_id",
        F.lit(type_key).alias("subtype"),
        *[c.alias(n) for n, c in base.items()],
        "time",
        stream.alias("stream"),
        *[tag_cols[n].alias(n) for n, _ in spec["tags"]],
        *[field_cols[n].alias(n) for n, _ in spec["fields"]],
        default_value.alias("default_value"),
        default_value.isNull().alias("is_lossy"),
    )


def _type_cond(spec: dict, mname: str) -> Column:
    cond = F.col("measurement") == mname
    if "test" in spec:
        cond = cond & (
            F.element_at(F.col("tags"), F.lit("test")) == spec["test"]
        )
    return cond


def _type_exprs(spec: dict, mname: str) -> tuple[Column, Column, Column]:
    """(required-tags-valid, stream-key, default-value) for one type —
    the same expressions amp2_table builds, reused by the one-pass
    dispatch."""
    base = {
        "source": _tag_col("source", "str"),
        "destination": _tag_col("destination", "str"),
        "test": _tag_col("test", "str"),
    }
    tag_cols = {n: _tag_col(n, k) for n, k in spec["tags"]}
    required = list(base.values()) + list(tag_cols.values())
    valid = required[0].isNotNull()
    for c in required[1:]:
        valid = valid & c.isNotNull()
    stream = F.concat_ws(
        AMP2_SEP,
        F.lit(mname),
        base["source"],
        base["destination"],
        base["test"],
        *[_tag_str_repr(tag_cols[n], k) for n, k in spec["tags"]],
    )
    default_value = _field_col(
        spec["default"], dict(spec["fields"])[spec["default"]]
    ).cast("double")
    return valid, stream, default_value


def _no_collapse(df: DataFrame, *cols: str) -> DataFrame:
    """Plan barrier: stop CollapseProject from inlining the (expensive)
    construction of ``cols`` into every downstream reference.

    The 13-type dispatch references the tags/fields maps hundreds of
    times; with projection collapse each reference re-evaluates the
    whole map_from_entries(transform(split(...))) tree (higher-order
    functions run interpreted, so codegen subexpression elimination
    never sees them — measured 140 µs/row, ~9x the parse itself).
    Wrapping the column in a nondeterministic-but-constant-true guard
    keeps the projections separate, so each map is built once per row
    and streamed to the consumer — no materialization, unchanged
    values."""
    out = df
    for c in cols:
        out = out.withColumn(
            c, F.when(F.rand(7) > -1.0, F.col(c)).otherwise(F.col(c))
        )
    return out


def amp2_typed(
    lines: DataFrame | None = None, parsed: DataFrame | None = None
) -> DataFrame:
    """The createFromLineProtocol summary over every family: one row per
    accepted line with (line_id, measurement, subtype, stream, time,
    default_value, is_lossy). Lines whose measurement name matches no
    family, whose latency ``test`` is not dns/icmp/tcpping, or whose
    required tags are missing/unconvertible are absent — exactly the
    reference's None/throw set.

    Scale shape: ONE pass over the parsed relation — the 13-type
    dispatch is a chained CASE on (measurement, test) inside a single
    projection (the Catalyst analogue of the reference's match
    statement, Amp2Measurement.scala:96-113), not a 13-branch
    filter+union that would rescan the parse per family. The parsed
    maps sit behind a no-collapse barrier so they are built once per
    row, not once per tag reference. Pass ``parsed`` (a
    line_protocol_maps relation, e.g. materialized once per session)
    to share the parse across the amp2 query family."""
    if parsed is None:
        parsed = _no_collapse(
            line_protocol_maps(lines), "tags", "fields"
        )
    subtype = stream = dval = valid = None
    for type_key, spec in AMP2_TYPES.items():
        mname = spec.get("measurement", type_key)
        cond = _type_cond(spec, mname)
        v, s, d = _type_exprs(spec, mname)
        if subtype is None:
            subtype = F.when(cond, F.lit(type_key))
            stream = F.when(cond, s)
            dval = F.when(cond, d)
            valid = F.when(cond, v)
        else:
            subtype = subtype.when(cond, F.lit(type_key))
            stream = stream.when(cond, s)
            dval = dval.when(cond, d)
            valid = valid.when(cond, v)
    dval = dval.cast("double")
    return (
        parsed.select(
            "line_id",
            "measurement",
            subtype.alias("subtype"),
            stream.alias("stream"),
            "time",
            dval.alias("default_value"),
            dval.isNull().alias("is_lossy"),
            valid.alias("__valid"),
        )
        .where(F.col("subtype").isNotNull() & F.col("__valid"))
        .drop("__valid")
    )


def amp2_latency_union(
    lines: DataFrame | None = None, parsed: DataFrame | None = None
) -> DataFrame:
    """The Latency family with the reference's union column set
    (Amp2Measurement.getColumnNamesLatency: dns + icmp + tcpping column
    union — subtype-specific tags NULL where not applicable)."""
    # ONE pass, like amp2_typed: subtype dispatch is a chained CASE on
    # the test tag; subtype-specific tag columns are NULL where the
    # subtype doesn't declare them (the union column set of
    # Amp2Measurement.getColumnNamesLatency)
    if parsed is None:
        parsed = _no_collapse(
            line_protocol_maps(lines), "tags", "fields"
        )
    keys = ("latency-dns", "latency-icmp", "latency-tcpping")
    specs = {k: AMP2_TYPES[k] for k in keys}
    conds = {k: _type_cond(specs[k], "latency") for k in keys}
    subtype = stream = dval = valid = None
    for k in keys:
        v, s, d = _type_exprs(specs[k], "latency")
        if subtype is None:
            subtype = F.when(conds[k], F.lit(k))
            stream = F.when(conds[k], s)
            dval = F.when(conds[k], d)
            valid = F.when(conds[k], v)
        else:
            subtype = subtype.when(conds[k], F.lit(k))
            stream = stream.when(conds[k], s)
            dval = dval.when(conds[k], d)
            valid = valid.when(conds[k], v)
    dval = dval.cast("double")

    def tag_union(name: str) -> Column:
        col = None
        for k in keys:
            kinds = dict(specs[k]["tags"])
            if name not in kinds:
                continue
            e = _tag_col(name, kinds[name])
            col = (
                F.when(conds[k], e) if col is None
                else col.when(conds[k], e)
            )
        return col

    # field set is identical across the three subtypes
    field_kinds = dict(specs["latency-dns"]["fields"])
    return (
        parsed.select(
            "line_id",
            subtype.alias("subtype"),
            _tag_col("source", "str").alias("source"),
            _tag_col("destination", "str").alias("destination"),
            _tag_col("test", "str").alias("test"),
            "time",
            stream.alias("stream"),
            tag_union("dscp").alias("dscp"),
            tag_union("family").alias("family"),
            tag_union("query").alias("query"),
            tag_union("packet_size").alias("packet_size"),
            tag_union("port").alias("port"),
            tag_union("random").alias("random"),
            *[
                _field_col(n, field_kinds[n]).alias(n)
                for n in ("count", "error_code", "error_type",
                          "icmpcode", "icmptype", "loss", "rtt")
            ],
            dval.alias("default_value"),
            dval.isNull().alias("is_lossy"),
            valid.alias("__valid"),
        )
        .where(F.col("subtype").isNotNull() & F.col("__valid"))
        .drop("__valid")
    )


def synth_amp2_lines(events: DataFrame) -> DataFrame:
    """Deterministic amp2 line-protocol lines derived from the events
    relation, covering all 10 measurement families + the 3 latency
    subtypes, lossy rows (missing default field), an invalid-direction
    class and a missing-required-tag class (both dropped whole), plus
    real-export quirks: capitalized booleans ('False'), zero-padded
    longs ('03'), quoted string fields. Grammar mirrored in closed form
    by the DuckDB oracle (amp2_oracles.py)."""
    m = "event_id % 12"
    mname = (
        f"CASE {m} WHEN 0 THEN 'external' WHEN 1 THEN 'fastping' "
        "WHEN 2 THEN 'http' WHEN 3 THEN 'latency' WHEN 4 THEN 'latency' "
        "WHEN 5 THEN 'latency' WHEN 6 THEN 'pathlen' WHEN 7 THEN 'sip' "
        "WHEN 8 THEN 'throughput' WHEN 9 THEN 'traceroute' "
        "WHEN 10 THEN 'udpstream' ELSE 'video' END"
    )
    test = (
        f"CASE {m} WHEN 0 THEN 'external' WHEN 1 THEN 'fastping' "
        "WHEN 2 THEN 'http' WHEN 3 THEN 'dns' WHEN 4 THEN 'icmp' "
        "WHEN 5 THEN 'tcpping' WHEN 6 THEN 'traceroute' "
        "WHEN 7 THEN 'sip' WHEN 8 THEN 'throughput' "
        "WHEN 9 THEN 'traceroute' WHEN 10 THEN 'udpstream' "
        "ELSE 'youtube' END"
    )
    direction = (
        "CASE WHEN event_id % 37 = 0 THEN 'sideways' "
        "WHEN event_id % 2 = 0 THEN 'in' ELSE 'out' END"
    )
    rnd = "CASE WHEN event_id % 3 = 0 THEN 'False' ELSE 'True' END"
    # the first per-type tag is omitted when event_id % 41 = 0 -> the
    # whole line must be rejected by the typed mapping (create() throws)
    first_tag = (
        "CASE WHEN event_id % 41 = 0 THEN '' ELSE CASE " + m + " "
        "WHEN 0 THEN concat(',command=cmd', event_id % 4) "
        "WHEN 2 THEN ',caching=False' "
        "WHEN 11 THEN concat(',requested_quality=', event_id % 3) "
        "ELSE ',dscp=Default' END END"
    )
    extra_tags = (
        f"CASE {m} "
        "WHEN 1 THEN concat(',family=ipv4,packet_count=60,"
        "packet_rate=', event_id % 8, ',packet_size=64') "
        "WHEN 3 THEN concat(',family=ipv6,query=q', event_id % 5, "
        "'.example.com') "
        f"WHEN 4 THEN concat(',family=ipv4,packet_size=0', "
        "event_id % 9 + 84, ',random=" + "', " + rnd + ")"
        " "
        f"WHEN 5 THEN concat(',family=ipv4,packet_size=84,port=', "
        "443 + event_id % 2, ',random=', " + rnd + ") "
        f"WHEN 6 THEN concat(',family=ipv4,packet_size=60,random=', "
        + rnd + ") "
        "WHEN 7 THEN concat(',family=ipv4,uri=user', event_id % 3, "
        "'@example.com') "
        f"WHEN 8 THEN concat(',direction=', {direction}, "
        "',family=ipv4,protocol=default,write_size=131072') "
        f"WHEN 9 THEN concat(',family=ipv6,hop=0', event_id % 9 + 1, "
        "',packet_size=60,random=', " + rnd + ") "
        f"WHEN 10 THEN concat(',direction=', {direction}, "
        "',family=ipv4,packet_count=21,packet_size=100,"
        "packet_spacing=20000') "
        "ELSE '' END"
    )
    # default-value field present unless event_id % 5 = 0 (lossy rows)
    fields = (
        f"CASE {m} "
        "WHEN 0 THEN concat('count=1i', CASE WHEN event_id % 5 = 0 "
        "THEN '' ELSE concat(',value=', event_id % 100, 'i') END) "
        "WHEN 1 THEN concat('count=1i,jitter=0i,loss_percent=0', "
        "CASE WHEN event_id % 5 = 0 THEN '' ELSE "
        "concat(',rtt=', event_id % 90, 'i') END) "
        "WHEN 2 THEN concat('duration=', event_id % 2000, "
        "'i,count=1i,object_count=8i,server_count=1i', "
        "CASE WHEN event_id % 5 = 0 THEN '' ELSE "
        "concat(',bytes=', event_id % 7000, 'i') END) "
        "WHEN 3 THEN concat('count=1i,loss=0i', "
        "CASE WHEN event_id % 5 = 0 THEN '' ELSE "
        "concat(',rtt=', event_id % 120000, 'i') END) "
        "WHEN 4 THEN concat('count=1i,error_type=0i,error_code=0i,"
        "loss=0i', CASE WHEN event_id % 5 = 0 THEN '' ELSE "
        "concat(',rtt=', event_id % 30000, 'i') END) "
        "WHEN 5 THEN concat('count=1i,icmptype=3i,icmpcode=1i', "
        "CASE WHEN event_id % 5 = 0 THEN '' ELSE "
        "concat(',rtt=', event_id % 25000, 'i') END) "
        "WHEN 6 THEN CASE WHEN event_id % 5 = 0 THEN 'count=1i' ELSE "
        "concat('length=', event_id % 12 + 4, 'i') END "
        "WHEN 7 THEN concat('duration=30000000i,count=1i,"
        "rx_loss_percent=0.06,rx_jitter=173i,response_time=134i,"
        "connect_time=175i,tx_loss_percent=0.19,tx_jitter=125i', "
        "CASE WHEN event_id % 5 = 0 THEN '' ELSE "
        "concat(',rtt=', event_id % 400, 'i') END) "
        "WHEN 8 THEN concat('count=1i,duration=\"10000\",runtime=', "
        "event_id % 50 + 9000, '.5', CASE WHEN event_id % 5 = 0 "
        "THEN '' ELSE concat(',bytes=', event_id % 9999, 'i') END) "
        "WHEN 9 THEN concat('address=\"2001:db8::', event_id % 16, "
        "'\"', CASE WHEN event_id % 5 = 0 THEN '' ELSE "
        "concat(',rtt=', event_id % 50000, 'i') END) "
        "WHEN 10 THEN concat('count=1i,mos=4.4,jitter=0i,loss=0', "
        "CASE WHEN event_id % 5 = 0 THEN '' ELSE "
        "concat(',rtt=', event_id % 200, 'i') END) "
        "ELSE concat('stall_time=0i,count=1i,pre_time=27i,"
        "initial_buffering=774i,actual_quality=4i,stall_count=0i', "
        "CASE WHEN event_id % 5 = 0 THEN '' ELSE "
        "concat(',playing_time=', event_id % 10000, 'i') END) END"
    )
    lines = events.select(
        "event_id",
        F.expr(
            f"concat({mname}, ',source=amp-', event_id % 7, "
            f"',destination=dst-', event_id % 5, ',test=', {test}, "
            f"{first_tag}, {extra_tags}, ' ', {fields}, ' ', "
            "CAST(event_id * 1000000000 + 123456789 AS STRING))"
        ).alias("value"),
    )
    # Materialize at the source: the generator is one giant concat/CASE
    # expression, and without a materialization barrier the parser's
    # quote-aware splits (which reference `value` several times) inline
    # it per reference — projection collapse multiplies the expression
    # tree combinatorially through the 3-level parse + 13-type dispatch
    # and can OOM the codegen layer. This is the "read lines from
    # storage" boundary a real ingest has for free. The repartition
    # spreads the (often single-file) events scan across the cluster so
    # the checkpointed lines — and every parse over them — run at full
    # parallelism, as a many-file ingest would.
    n = events.sparkSession.sparkContext.defaultParallelism
    return lines.repartition(n).localCheckpoint()
