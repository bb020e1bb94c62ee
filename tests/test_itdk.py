"""ITDK lookup family tests (operators/itdk.py).

Mirrors the reference's test strategy (src/test/.../itdk/*Test.scala):
parse real-format fixture files, preprocess, then assert every IP in
the nodes file resolves to its (node, asn) — plus the qualification
rules the binary-search lookups enforce. Cross-engine exactness of the
synthetic dataset is covered by the driver oracles (itdk_oracles.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamevmon_spark.operators import graph as G
from streamevmon_spark.operators import itdk as I

NODES = """# comment line that must be ignored
# another comment
node N1:  1.2.3.4 1.2.3.5 10.0.0.1
node N2:  5.6.7.8
node N3:  9.9.9.9 9.9.9.10
node N7:  200.1.1.1
"""

# N2 has an unrecognized method -> parses with method NULL, invisible to
# the AS lookup but still used by the preprocessor's inverted map.
# N3 has no AS line at all -> asn 0 in the inverted map.
AS = """node.AS N1 11814 refinement
node.AS N2 31655 pony
node.AS N7 8732 interfaces
"""

GEO = """node.geo N1:\tNA\tUS\tTX\tCorsicana\t32.09543\t-96.46887\t23770\t\tddec
node.geo N2:\tSA\tUY\t\tMontevideo\t-34.825\t-56.2\t1324115\t\tddec
node.geo N9:\tbad line with too\tfew\ttabs
not a geo line at all
"""


@pytest.fixture(scope="module")
def itdk_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("itdk")
    (d / "test.nodes").write_text(NODES)
    (d / "test.nodes.as").write_text(AS)
    (d / "test.nodes.geo").write_text(GEO)
    return d


def test_parse_nodes(spark, itdk_files):
    rows = {
        (r.node_id, r.address)
        for r in I.read_itdk_nodes(
            spark, str(itdk_files / "test.nodes")
        ).collect()
    }
    assert rows == {
        (1, "1.2.3.4"), (1, "1.2.3.5"), (1, "10.0.0.1"),
        (2, "5.6.7.8"), (3, "9.9.9.9"), (3, "9.9.9.10"),
        (7, "200.1.1.1"),
    }


def test_parse_as_method_qualification(spark, itdk_files):
    rows = {
        r.node_id: (r.asn, r.method)
        for r in I.read_itdk_as(
            spark, str(itdk_files / "test.nodes.as")
        ).collect()
    }
    # unrecognized method parses to NULL (ItdkAsNumber Try...toOption)
    assert rows == {
        1: (11814, "refinement"),
        2: (31655, None),
        7: (8732, "interfaces"),
    }


def test_parse_geo_qualification_and_nulls(spark, itdk_files):
    rows = {
        r.node_id: r
        for r in I.read_itdk_geo(
            spark, str(itdk_files / "test.nodes.geo")
        ).collect()
    }
    # the malformed N9 line (wrong tab count) and the non-geo line drop
    assert set(rows) == {1, 2}
    assert rows[1].region == "TX"
    assert rows[2].region is None  # empty field -> NULL
    assert rows[1].latitude == pytest.approx(32.09543)
    assert rows[2].longitude == pytest.approx(-56.2)


def test_inverted_map_uses_raw_asn_and_defaults(spark, itdk_files):
    inv = I.itdk_inverted_map(
        I.read_itdk_nodes(spark, str(itdk_files / "test.nodes")),
        I.read_itdk_as(spark, str(itdk_files / "test.nodes.as")),
    )
    by_addr = {r.address: (r.node_id, r.asn) for r in inv.collect()}
    # preprocessor semantics: N2's ASN is used even though its method
    # is unqualified; N3 missing from the AS file -> 0 (Unknown)
    assert by_addr["5.6.7.8"] == (2, 31655)
    assert by_addr["9.9.9.9"] == (3, 0)
    assert by_addr["1.2.3.5"] == (1, 11814)


def test_preprocess_roundtrip_every_ip(spark, itdk_files, tmp_path):
    # AliasLookupTest mirror: every IP in the nodes file must resolve
    out = I.preprocess_itdk(
        spark,
        str(itdk_files / "test.nodes"),
        str(itdk_files / "test.nodes.as"),
        str(tmp_path / "aligned"),
        n_partitions=4,
    )
    lookup = I.read_itdk_lookup(spark, out)
    nodes = I.read_itdk_nodes(spark, str(itdk_files / "test.nodes"))
    found = I.lookup_by_address(nodes.select("address"), lookup)
    assert found.where(F.col("node_id").isNull()).count() == 0
    assert found.count() == nodes.count()
    # and a miss stays NULL
    miss = I.lookup_by_address(
        spark.createDataFrame([("8.8.8.8",)], "address string"), lookup
    ).collect()[0]
    assert miss.node_id is None and miss.asn is None


def test_as_lookup_serves_only_qualified(spark, itdk_files):
    as_df = I.read_itdk_as(spark, str(itdk_files / "test.nodes.as"))
    nodes = spark.createDataFrame([(1,), (2,), (3,)], "node_id int")
    got = {r.node_id: (r.asn, r.method)
           for r in I.as_by_node(nodes, as_df).collect()}
    assert got[1] == (11814, "refinement")
    assert got[2] == (None, None)  # unqualified method -> not served
    assert got[3] == (None, None)  # absent


def test_alias_resolution_merges_shared_node(spark):
    # two hosts whose addresses alias to one ITDK node merge under
    # uid 'N<node>' (Host.uid with itdkNodeId, impl/Host.scala:107-109)
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    hops = spark.createDataFrame(
        [
            (0, 0, 0, "hostA", "1.2.3.4", 100, "hostA", t),
            (0, 0, 1, None, "1.2.3.5", 100, "1.2.3.5 (AS 100)", t),
            (0, 0, 2, None, "5.6.7.8", 200, "5.6.7.8 (AS 200)", t),
            (0, 0, 3, None, None, -1, "(0,0,3)", t),
        ],
        "stream int, path_id int, hop_idx int, hostname string, "
        "address string, asn int, uid string, ts timestamp",
    )
    inv = spark.createDataFrame(
        [("1.2.3.4", 42, 7), ("1.2.3.5", 42, 7)],
        "address string, node_id int, asn int",
    )
    assert I.itdk_contradictions(hops, inv).count() == 0
    mapping = {r.uid: r.merged_uid
               for r in I.resolve_aliases_itdk(hops, inv).collect()}
    assert mapping == {"hostA": "N42", "1.2.3.5 (AS 100)": "N42"}
    v = {r.uid: r for r in I.itdk_vertices(hops, inv).collect()}
    # merged host unions hostnames + addresses, carries node + asn
    assert set(v) == {"N42", "5.6.7.8 (AS 200)", "(0,0,3)"}
    assert v["N42"].hostnames == "hostA"
    assert "1.2.3.4 (AS 100)" in v["N42"].addresses
    assert "1.2.3.5 (AS 100)" in v["N42"].addresses
    assert v["N42"].itdk_asn == 7 and v["N42"].itdk_node_id == 42
    assert v["(0,0,3)"].is_anonymous


def test_contradiction_detected(spark):
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    hops = spark.createDataFrame(
        [
            (0, 0, 0, "h", "1.1.1.1", 1, "h", t),
            (1, 0, 0, "h", "2.2.2.2", 1, "h", t),
        ],
        "stream int, path_id int, hop_idx int, hostname string, "
        "address string, asn int, uid string, ts timestamp",
    )
    inv = spark.createDataFrame(
        [("1.1.1.1", 1, 0), ("2.2.2.2", 2, 0)],
        "address string, node_id int, asn int",
    )
    bad = I.itdk_contradictions(hops, inv).collect()
    assert len(bad) == 1 and bad[0].uid == "h" and bad[0].n_nodes == 2


def test_itdk_merge_reduces_graph(spark, sf_dir):
    # on the synthetic dataset the path-variant backbone addresses and
    # the s/s+6 LAN gateways collapse; edges re-aggregate keep-latest
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hops = G.path_hops(
        G.as_inet_paths(
            G.synth_traceroutes(ev), G.synth_traceroute_meta(ev)
        )
    ).localCheckpoint()
    nodes, as_df, _ = I.synth_itdk(hops)
    inv = I.itdk_inverted_map(nodes, as_df)
    edges = G.topology_edges(hops)
    merged = I.itdk_merged_edges(
        edges, I.resolve_aliases_itdk(hops, inv)
    )
    assert 0 < merged.count() < edges.count()
    # n_seen conserved minus dropped self-loops; last_seen = max
    assert merged.where("src_uid = dst_uid").count() == 0
    v = I.itdk_vertices(hops, inv)
    n_merged_hosts = v.where("itdk_node_id IS NOT NULL").count()
    n_raw_hosts_with_node = (
        I.resolve_aliases_itdk(hops, inv).count()
    )
    assert n_merged_hosts < n_raw_hosts_with_node  # real merges happened


def test_itdk_plans_are_hash_join_shaped(spark, sf_dir):
    # dimension-sized mapping joins must broadcast; nothing in the
    # family may degenerate to a cartesian / nested-loop join
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hops = G.path_hops(
        G.as_inet_paths(
            G.synth_traceroutes(ev), G.synth_traceroute_meta(ev)
        )
    ).localCheckpoint()
    nodes, as_df, geo = I.synth_itdk(hops)
    inv = I.itdk_inverted_map(nodes, as_df)
    for df in (
        I.itdk_vertices(hops, inv),
        I.itdk_merged_edges(
            G.topology_edges(hops), I.resolve_aliases_itdk(hops, inv)
        ),
        I.geo_by_node(I.as_by_node(inv.select("node_id").distinct(),
                                   as_df), geo),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
    v_plan = (
        I.itdk_vertices(hops, inv)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in v_plan
