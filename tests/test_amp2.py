"""amp2 line-protocol ingest tests: worked examples are REAL lines from
the reference's own export fixture (src/test/resources/amp2.lproto.gz,
driven by Amp2MeasurementCreateTest.scala — "be processed without
errors"), so the typed extraction is checked against ground truth the
reference itself parses, including the export quirks: zero-padded long
tags (hop=03), capitalized booleans (random=False), quoted string
fields (duration="10000", address="::"), and 'i'-suffixed integers."""

from __future__ import annotations

import pytest

from streamevmon_spark.sources import amp2 as A

# one real export line per family/subtype (amp2.lproto.gz)
REAL_LINES = [
    'external,command=example1,destination=foo,source=foo,test=external'
    ' count=1i,value=68i 1622329200000000000',
    'fastping,test=fastping,source=foo,packet_count=60,packet_rate=1,'
    'family=ipv4,destination=bar,packet_size=64,dscp=Default'
    ' count=1i,jitter=0i,loss_percent=0,rtt=29i 1622329200000000000',
    'http,caching=False,destination=https://wand.net.nz/,'
    'source=catalyst.amp.wand.net.nz,test=http duration=1829i,count=1i,'
    'object_count=8i,server_count=1i,bytes=66289i 1622329235000000000',
    'latency,destination=ns2.dns.net.nz,dscp=Default,family=ipv6,'
    'query=dns.net.nz,source=canterbury.amp.wand.net.nz,test=dns'
    ' count=0i 1622678406000000000',
    'latency,test=icmp,random=False,source=ns4b.amp.wand.net.nz,'
    'family=ipv4,destination=j.root-servers.net,packet_size=84,'
    'dscp=Default count=1i,error_type=0i,rtt=23884i,loss=0i,'
    'error_code=0i 1622678400000000000',
    'latency,test=tcpping,random=False,source=canterbury.amp.wand.net.nz,'
    'port=443,family=ipv4,destination=v1.lscache1.c.youtube.com,'
    'packet_size=64,dscp=Default count=1i,loss=0i,rtt=37866i'
    ' 1622678414000000000',
    'pathlen,destination=store.steampowered.com,dscp=Default,family=ipv4,'
    'packet_size=60,random=False,source=callplus.amp.wand.net.nz,'
    'test=traceroute length=9i 1622678420000000000',
    'sip,test=sip,source=guest,uri=bar@example.com,family=ipv4,'
    'destination=example.com,dscp=EF duration=30000000i,count=1i,'
    'rx_loss_percent=0.0649772579597141,rx_jitter=173i,response_time=134i,'
    'connect_time=175i,tx_loss_percent=0.1988071570576541,rtt=122i,'
    'tx_jitter=125i 1622687002000000000',
    'throughput,test=throughput,source=foo,direction=in,write_size=131072,'
    'family=ipv4,destination=bar,protocol=default,dscp=Default'
    ' bytes=81925505024i,count=1i,duration="10000",runtime=9991.383'
    ' 1622329290000000000',
    'traceroute,destination=eu-west-1.ec2.amazonaws.com,dscp=Default,'
    'family=ipv6,hop=03,packet_size=60,random=False,'
    'source=lightwire.amp.wand.net.nz,test=traceroute address="::"'
    ' 1622678420000000000',
    'udpstream,test=udpstream,source=foo,packet_count=21,'
    'packet_spacing=20000,direction=in,family=ipv4,destination=bar,'
    'packet_size=100,dscp=Default count=1i,mos=4.409285824,jitter=0i,'
    'rtt=135i,loss=0 1622329350000000000',
    'video,destination=S7SLep244ss,requested_quality=1,source=foo,'
    'test=youtube stall_time=0i,count=1i,pre_time=27i,'
    'initial_buffering=774i,playing_time=9254i,actual_quality=4i,'
    'stall_count=0i 1622329260000000000',
]


def _lines_df(spark, lines):
    return spark.createDataFrame(
        [(i, ln) for i, ln in enumerate(lines)],
        "event_id long, value string",
    )


@pytest.fixture(scope="module")
def typed(spark):
    rows = A.amp2_typed(_lines_df(spark, REAL_LINES)).collect()
    return {r.line_id: r for r in rows}


def test_all_real_export_lines_accepted(typed):
    # the reference test's contract: every export line creates a
    # measurement (Amp2MeasurementCreateTest "processed without errors")
    assert len(typed) == len(REAL_LINES)


def test_subtype_dispatch(typed):
    assert [typed[i].subtype for i in range(len(REAL_LINES))] == [
        "external", "fastping", "http", "latency-dns", "latency-icmp",
        "latency-tcpping", "pathlen", "sip", "throughput", "traceroute",
        "udpstream", "video",
    ]


def test_stream_keys_mirror_reference_tag_order(typed):
    # measurementName--source--destination--test--<declared tag order>;
    # longs decimal (03 -> 3), booleans lowercase, Direction lowercase
    assert typed[0].stream == "external--foo--foo--external--example1"
    assert typed[3].stream == (
        "latency--canterbury.amp.wand.net.nz--ns2.dns.net.nz--dns"
        "--Default--ipv6--dns.net.nz"
    )
    assert typed[9].stream == (
        "traceroute--lightwire.amp.wand.net.nz"
        "--eu-west-1.ec2.amazonaws.com--traceroute"
        "--Default--ipv6--3--60--false"
    )
    assert typed[8].stream == (
        "throughput--foo--bar--throughput"
        "--in--Default--ipv4--default--131072"
    )


def test_default_value_and_lossy(typed):
    # defaultValue per case class; dns line has no rtt field -> lossy,
    # traceroute line has only address -> lossy
    assert typed[0].default_value == 68.0
    assert typed[1].default_value == 29.0
    assert typed[2].default_value == 66289.0
    assert typed[3].default_value is None and typed[3].is_lossy
    assert typed[8].default_value == 81925505024.0
    assert typed[9].default_value is None and typed[9].is_lossy
    assert typed[11].default_value == 9254.0
    assert not typed[0].is_lossy


def test_ns_to_ms_truncation(typed):
    assert str(typed[0].time) == "2021-05-29 23:00:00"


def test_typed_family_table_throughput(spark):
    t = A.amp2_table(
        A.line_protocol_maps(_lines_df(spark, REAL_LINES)), "throughput"
    ).collect()
    assert len(t) == 1
    r = t[0]
    assert r.direction == "in"
    assert r.write_size == 131072
    assert r.bytes == 81925505024
    assert r.duration == "10000"  # quotes stripped (Throughput.scala)
    assert r.runtime == 9991.383


def test_typed_family_table_traceroute_quirks(spark):
    t = A.amp2_table(
        A.line_protocol_maps(_lines_df(spark, REAL_LINES)), "traceroute"
    ).collect()
    assert len(t) == 1
    r = t[0]
    assert r.hop == 3  # hop=03 parses as long 3
    assert r.random is False  # 'False' parses case-insensitively
    assert r.address == "::"  # quotes stripped (Traceroute.scala)
    assert r.rtt is None


def test_latency_union_columns(spark):
    rows = {
        r.subtype: r
        for r in A.amp2_latency_union(_lines_df(spark, REAL_LINES)).collect()
    }
    assert set(rows) == {"latency-dns", "latency-icmp", "latency-tcpping"}
    assert rows["latency-dns"].query == "dns.net.nz"
    assert rows["latency-dns"].packet_size is None
    assert rows["latency-icmp"].packet_size == 84
    assert rows["latency-icmp"].port is None
    assert rows["latency-tcpping"].port == 443
    assert rows["latency-tcpping"].icmpcode is None


def test_rejection_classes(spark):
    bad = [
        # unknown measurement name -> None (Amp2Measurement.scala:96-113)
        'nosuch,source=a,destination=b,test=x count=1i 1000000000',
        # latency with unknown test -> None (Latency.scala:55-59)
        'latency,source=a,destination=b,test=weird,dscp=D,family=ipv4'
        ' count=1i 1000000000',
        # missing required tag (external without command) -> throw
        'external,source=a,destination=b,test=external count=1i'
        ' 1000000000',
        # invalid Direction -> throw (Direction.scala)
        'throughput,source=a,destination=b,test=throughput,'
        'direction=sideways,dscp=D,family=ipv4,protocol=p,'
        'write_size=1 count=1i 1000000000',
        # unconvertible long tag -> throw (getTagAsLong)
        'pathlen,source=a,destination=b,test=traceroute,dscp=D,'
        'family=ipv4,packet_size=big,random=False length=1i 1000000000',
        # malformed: no fields part
        'external,source=a,destination=b,test=x,command=c 1000000000',
    ]
    out = A.amp2_typed(_lines_df(spark, bad)).collect()
    assert out == []


def test_direction_case_insensitive(spark):
    ok = [
        'throughput,source=a,destination=b,test=throughput,direction=OUT,'
        'dscp=D,family=ipv4,protocol=p,write_size=1 bytes=5i 1000000000',
    ]
    rows = A.amp2_typed(_lines_df(spark, ok)).collect()
    assert len(rows) == 1
    assert rows[0].stream == (
        "throughput--a--b--throughput--out--D--ipv4--p--1"
    )


def test_synth_lines_cover_all_subtypes(spark, sf_dir):
    from streamevmon_spark.sources.measurements import load_events

    lines = A.synth_amp2_lines(load_events(spark, sf_dir))
    typed = A.amp2_typed(lines)
    subtypes = {r.subtype for r in typed.select("subtype").distinct().collect()}
    assert subtypes == set(A.AMP2_TYPES)


def test_no_shuffle_in_typed_plan(spark):
    """Scale guard: the whole parse->type->filter pipeline is
    projection + filter + union only — no Exchange anywhere."""
    plan = (
        A.amp2_typed(_lines_df(spark, REAL_LINES))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
