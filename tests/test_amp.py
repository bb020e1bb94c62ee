"""AMP v1 line-protocol ingest tests: worked examples are the REAL
subscription lines from the reference's own seed fixture
(src/test/scala/nz/net/wand/streamevmon/test/SeedData.scala — the
lines its ICMP/DNS/TCPPing/HTTP/TraceroutePathlen create() tests
parse), so the typed extraction is checked against ground truth the
reference itself asserts on, including the export quirks: capitalized
booleans (flag_aa=False), quoted rtts arrays ("[225]" / "[None]"),
'i'-suffixed integers, and lossy lines with whole field groups absent.
"""

from __future__ import annotations

import pytest

from streamevmon_spark.sources import amp as A

# SeedData.scala:59-63 (icmp), :172-175 (dns), :387 (pathlen),
# :417-421 (tcpping), :476-479 (http)
ICMP_LINE = (
    'data_amp_icmp,stream=3 loss=0i,lossrate=0.0,median=225i,'
    'packet_size=520i,results=1i,rtts="[225]" 1563761840000000000'
)
ICMP_LOSSY = (
    'data_amp_icmp,stream=3 loss=1i,lossrate=1.0,packet_size=520i,'
    'results=1i,rtts="[None]" 1574696840000000000'
)
DNS_LINE = (
    'data_amp_dns,stream=1 flag_aa=False,flag_ad=False,flag_cd=False,'
    'flag_qr=True,flag_ra=True,flag_rd=False,flag_tc=False,'
    'lossrate=0.0,opcode=0i,query_len=40i,rcode=0i,requests=1i,'
    'response_size=68i,rtt=35799i,total_additional=1i,total_answer=1i,'
    'total_authority=0i,ttl=0i 1563761841000000000'
)
DNS_LOSSY = (
    'data_amp_dns,stream=1 lossrate=1.0,requests=1i 1573020910000000000'
)
PATHLEN_LINE = (
    'data_amp_traceroute_pathlen,stream=5 path_length=12.0'
    ' 1563761842000000000'
)
TCPPING_LINE = (
    'data_amp_tcpping,stream=9 icmperrors=0i,loss=0i,lossrate=0.0,'
    'median=189i,packet_size=64i,results=1i,rtts="[189]"'
    ' 1564713040000000000'
)
HTTP_LINE = (
    'data_amp_http,stream=17 bytes=62210i,duration=77i,object_count=8i,'
    'server_count=1i 1564713045000000000'
)
HTTP_LOSSY = (
    'data_amp_http,stream=17 object_count=0i,server_count=1i'
    ' 1564713046000000000'
)

ALL_LINES = [ICMP_LINE, ICMP_LOSSY, DNS_LINE, DNS_LOSSY, PATHLEN_LINE,
             TCPPING_LINE, HTTP_LINE, HTTP_LOSSY]


def _tokens(spark, lines):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(lines)], "event_id long, value string"
    )
    return A.amp_tokens(df)


def test_icmp_seed_lines(spark):
    rows = {r.line_id: r for r in
            A.amp_table(_tokens(spark, ALL_LINES), "icmp").collect()}
    assert set(rows) == {0, 1}
    r = rows[0]
    assert (r.stream, r.loss, r.lossrate, r.median, r.packet_size,
            r.results, r.rtts) == ("3", 0, 0.0, 225, 520, 1, "225")
    assert r.default_value == 225.0 and r.is_lossy is False
    assert r.time.isoformat() == "2019-07-22T02:17:20"
    lossy = rows[1]
    assert (lossy.loss, lossy.lossrate, lossy.median, lossy.rtts) == (
        1, 1.0, None, "None")
    assert lossy.default_value is None and lossy.is_lossy is True


def test_dns_seed_lines(spark):
    rows = {r.line_id: r for r in
            A.amp_table(_tokens(spark, ALL_LINES), "dns").collect()}
    assert set(rows) == {2, 3}
    r = rows[2]
    # capitalized booleans parse case-insensitively (Scala toBoolean)
    assert (r.flag_aa, r.flag_qr, r.flag_ra) == (False, True, True)
    assert (r.lossrate, r.opcode, r.requests, r.rtt, r.ttl) == (
        0.0, 0, 1, 35799, 0)
    assert r.is_lossy is False and r.default_value == 35799.0
    lossy = rows[3]
    assert lossy.flag_aa is None and lossy.rtt is None
    assert lossy.requests == 1 and lossy.is_lossy is True


def test_http_tcpping_pathlen_seed_lines(spark):
    toks = _tokens(spark, ALL_LINES)
    http = {r.line_id: r for r in A.amp_table(toks, "http").collect()}
    assert (http[6].bytes, http[6].duration, http[6].is_lossy) == (
        62210, 77, False)
    assert http[7].bytes is None and http[7].is_lossy is True
    tcp = A.amp_table(toks, "tcpping").collect()
    assert len(tcp) == 1 and tcp[0].icmperrors == 0
    assert tcp[0].median == 189 and tcp[0].rtts == "189"
    pl = A.amp_table(toks, "pathlen").collect()
    assert len(pl) == 1 and pl[0].path_length == 12.0
    assert pl[0].is_lossy is False


def test_typed_dispatch_covers_all(spark):
    typed = A.amp_typed(_tokens(spark, ALL_LINES))
    got = {(r.line_id, r.subtype, r.is_lossy) for r in typed.collect()}
    assert got == {
        (0, "icmp", False), (1, "icmp", True), (2, "dns", False),
        (3, "dns", True), (4, "pathlen", False), (5, "tcpping", False),
        (6, "http", False), (7, "http", True),
    }


@pytest.mark.parametrize("line", [
    # stream tag missing -> getNamedField(..).get throws
    'data_amp_icmp loss=0i,lossrate=0.0,median=1i,packet_size=84i,'
    'results=1i,rtts="[1]" 1563761840000000000',
    # required int malformed -> dropRight(1).toInt throws
    'data_amp_icmp,stream=3 loss=0i,lossrate=0.0,median=1i,'
    'packet_size=bigi,results=1i,rtts="[1]" 1563761840000000000',
    # present optional int malformed -> toInt throws
    'data_amp_icmp,stream=3 loss=0i,lossrate=0.0,median=badi,'
    'packet_size=84i,results=1i,rtts="[1]" 1563761840000000000',
    # rtts entry neither None nor int -> toInt throws
    'data_amp_icmp,stream=3 loss=0i,lossrate=0.0,median=1i,'
    'packet_size=84i,results=1i,rtts="[1,x]" 1563761840000000000',
    # rtts missing entirely (required .get)
    'data_amp_icmp,stream=3 loss=0i,lossrate=0.0,median=1i,'
    'packet_size=84i,results=1i 1563761840000000000',
    # invalid boolean -> Scala toBoolean throws
    'data_amp_dns,stream=1 flag_aa=maybe,requests=1i,lossrate=1.0'
    ' 1563761840000000000',
    # non-numeric timestamp -> data.last.toLong throws
    'data_amp_icmp,stream=3 loss=0i,lossrate=0.0,median=1i,'
    'packet_size=84i,results=1i,rtts="[1]" notanumber',
    # unknown measurement -> createMeasurement match falls through
    'data_amp_other,stream=3 value=1i 1563761840000000000',
])
def test_rejected_lines(spark, line):
    assert A.amp_typed(_tokens(spark, [line])).count() == 0


def test_rtts_edge_cases(spark):
    lines = [
        'data_amp_icmp,stream=3 loss=0i,lossrate=0.0,median=1i,'
        'packet_size=84i,results=1i,rtts="[]" 1563761840000000000',
        'data_amp_icmp,stream=3 loss=0i,lossrate=0.0,median=1i,'
        'packet_size=84i,results=1i,rtts="[ 5, None ,7]"'
        ' 1563761840000000000',
    ]
    rows = {r.line_id: r for r in
            A.amp_table(_tokens(spark, lines), "icmp").collect()}
    assert rows[0].rtts == ""          # getRtts: empty -> Seq()
    assert rows[1].rtts == "5;None;7"  # entries are trimmed


def test_rich_icmp_meta_join(spark):
    meta = A.synth_amp_meta(spark, "icmp", n_streams=10)
    base = A.amp_table(_tokens(spark, ALL_LINES), "icmp")
    rich = A.enrich_amp(base, meta)
    rows = rich.collect()
    assert len(rows) == 2  # both ICMP lines have stream 3 < 10
    r = rows[0]
    # RichICMP column order: meta head before base fields
    assert rich.columns[:7] == [
        "line_id", "subtype", "stream", "source", "destination",
        "family", "packet_size_selection"]
    assert r.source == "amphost-3" and r.destination == "ampdst-3"
    # base rows with no meta row are dropped (getMeta -> None)
    small = A.enrich_amp(base, A.synth_amp_meta(spark, "icmp", n_streams=2))
    assert small.count() == 0


def test_rich_join_broadcasts_and_parse_has_no_shuffle(spark):
    toks = _tokens(spark, ALL_LINES)
    plan = A.amp_typed(toks)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # parse+dispatch is map-only
    rich = A.enrich_amp(A.amp_table(toks, "icmp"),
                        A.synth_amp_meta(spark, "icmp"))
    rplan = rich._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in rplan


def test_meta_decl_matches_scala(spark):
    # declared meta column order mirrors the *Meta case classes
    for k, cols in A.AMP_META_COLS.items():
        df = A.synth_amp_meta(spark, k, n_streams=3)
        assert df.columns == ["stream", "source", "destination"] + cols


RICH_ORDERS = {
    # Rich* case-class column order after (line_id, subtype):
    # meta head, then the base measurement's own fields, then time
    # (amp/RichICMP.scala, RichDNS.scala, RichTCPPing.scala,
    # RichHTTP.scala, RichTraceroutePathlen.scala)
    "icmp": ["stream", "source", "destination", "family",
             "packet_size_selection", "loss", "lossrate", "median",
             "packet_size", "results", "rtts", "time"],
    "dns": ["stream", "source", "destination", "instance", "address",
            "query", "query_type", "query_class", "udp_payload_size",
            "recurse", "dnssec", "nsid", "flag_aa", "flag_ad",
            "flag_cd", "flag_qr", "flag_ra", "flag_rd", "flag_tc",
            "lossrate", "opcode", "query_len", "rcode", "requests",
            "response_size", "rtt", "total_additional", "total_answer",
            "total_authority", "ttl", "time"],
    "tcpping": ["stream", "source", "destination", "port", "family",
                "packet_size_selection", "icmperrors", "loss",
                "lossrate", "median", "packet_size", "results", "rtts",
                "time"],
    "http": ["stream", "source", "destination", "max_connections",
             "max_connections_per_server",
             "max_persistent_connections_per_server",
             "pipelining_max_requests", "persist", "pipelining",
             "caching", "bytes", "duration", "object_count",
             "server_count", "time"],
    "pathlen": ["stream", "source", "destination", "family",
                "packet_size_selection", "path_length", "time"],
}


@pytest.mark.parametrize("type_key,meta_key", [
    ("icmp", "icmp"), ("dns", "dns"), ("tcpping", "tcpping"),
    ("http", "http"), ("pathlen", "traceroute"),
])
def test_rich_column_orders_match_scala(spark, type_key, meta_key):
    """enrich_amp over every typed table reproduces the corresponding
    Rich* case class's declared column order (meta head before base
    fields) — pathlen enriches with TracerouteMeta, as
    enrichMeasurement dispatches it (InfluxMeasurementFactory:252)."""
    toks = _tokens(spark, ALL_LINES)
    base = A.amp_table(toks, type_key)
    rich = A.enrich_amp(base, A.synth_amp_meta(spark, meta_key, 20))
    got = [c for c in rich.columns
           if c not in ("line_id", "subtype",
                        "default_value", "is_lossy")]
    assert got == RICH_ORDERS[type_key]
    assert rich.count() > 0
