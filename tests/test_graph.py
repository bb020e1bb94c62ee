"""Topology-graph family tests (operators/graph.py). Cross-engine
exactness for paths/vertices/edges/largest-component/merges/distances/
DOT is covered by the driver oracles (graph_oracles.py); these tests pin
the semantic properties the SQL comparison can't express — component
algebra, merge application, the reference's worked merge examples, and
physical-plan shape (no cartesian joins, broadcast where claimed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamevmon_spark.operators import graph as G


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


@pytest.fixture(scope="module")
def hops(spark, events):
    tr = G.synth_traceroutes(events)
    meta = G.synth_traceroute_meta(events)
    return G.path_hops(G.as_inet_paths(tr, meta))


@pytest.fixture(scope="module")
def edges(hops):
    return G.topology_edges(hops)


def test_path_hop_counts_follow_grammar(events, hops):
    # every measurement contributes exactly n_hops = 5 + stream%3 + path
    per = hops.groupBy("event_id", "stream", "path_id").count()
    bad = per.where(
        F.col("count") != 5 + F.col("stream") % 3 + F.col("path_id")
    ).count()
    assert bad == 0
    assert per.count() == events.count()


def test_uid_hierarchy(hops):
    # hostname > address > anonymous triple (Host.uid,
    # reference impl/Host.scala:106-124)
    named = hops.where(F.col("hostname").isNotNull())
    assert named.where(F.col("uid") != F.col("hostname")).count() == 0
    anon = hops.where(
        F.col("hostname").isNull() & F.col("address").isNull()
    )
    assert anon.where(~F.col("uid").startswith("(")).count() == 0


def test_edges_drop_self_loops_and_keep_latest(hops, edges):
    assert edges.where(F.col("src_uid") == F.col("dst_uid")).count() == 0
    # keep-latest: last_seen equals the max ts over contributing pairs
    assert edges.where(F.col("last_seen").isNull()).count() == 0
    assert (
        edges.groupBy("src_uid", "dst_uid").count().where("count > 1")
    ).count() == 0


def test_connected_components_fixpoint(edges):
    comp = G.connected_components(edges)
    # every endpoint is labelled, labels are reachable uids
    n_nodes = (
        edges.select(F.col("src_uid").alias("u"))
        .union(edges.select("dst_uid"))
        .distinct()
        .count()
    )
    assert comp.count() == n_nodes
    # a component label must itself be a member of the component
    labels = comp.select(F.col("component").alias("uid")).distinct()
    assert labels.join(comp, "uid", "left_anti").count() == 0
    # endpoints of every edge share a component
    c1 = comp.withColumnRenamed("uid", "src_uid").withColumnRenamed(
        "component", "c_src"
    )
    c2 = comp.withColumnRenamed("uid", "dst_uid").withColumnRenamed(
        "component", "c_dst"
    )
    crossed = (
        edges.join(c1, "src_uid").join(c2, "dst_uid")
        .where(F.col("c_src") != F.col("c_dst"))
        .count()
    )
    assert crossed == 0


def test_largest_component_is_largest(hops, edges):
    vertices = G.topology_vertices(hops)
    kept = G.largest_component(vertices, edges)
    comp = G.connected_components(edges)
    sizes = (
        comp.groupBy("component").count().orderBy(F.desc("count")).collect()
    )
    assert kept.count() == sizes[0]["count"]


def test_anon_merge_reference_examples(spark):
    # the three worked examples of GraphPruneParallelAnonymousHost
    # (reference pruning/GraphPruneParallelAnonymousHost.scala:55-111):
    # parallel equal-length anonymous chains merge position-wise;
    # unequal-length chains don't.
    rows = []

    def path(stream, uids):
        for i, u in enumerate(uids):
            rows.append((stream, 0, i, u))

    path(0, ["A", "(0,0,1)", "(0,0,2)", "B"])   # len-2 anon run A..B
    path(1, ["A", "(1,0,1)", "(1,0,2)", "B"])   # parallel len-2 -> merge
    path(2, ["A", "(2,0,1)", "B"])              # len-1: different group
    hops = spark.createDataFrame(
        rows, "stream int, path_id int, hop_idx int, uid string"
    )
    m = G.parallel_anonymous_merges(hops).toPandas()
    merged = set(m["uid"])
    assert merged == {"(0,0,1)", "(0,0,2)", "(1,0,1)", "(1,0,2)"}
    assert set(m["merged_uid"]) == {
        "(0,0,1);(1,0,1)",
        "(0,0,2);(1,0,2)",
    }


def test_apply_merges_relabels_and_rolls_up(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 1, 2)
    edges = spark.createDataFrame(
        [
            ("A", "(0,0,1)", t0, 2),
            ("A", "(1,0,1)", t1, 3),
            ("(0,0,1)", "B", t0, 1),
        ],
        "src_uid string, dst_uid string, last_seen timestamp, "
        "n_seen bigint",
    )
    merges = spark.createDataFrame(
        [
            ("(0,0,1)", "(0,0,1);(1,0,1)", 2),
            ("(1,0,1)", "(0,0,1);(1,0,1)", 2),
        ],
        "uid string, merged_uid string, n_merged int",
    )
    out = {
        (r["src_uid"], r["dst_uid"]): (r["last_seen"], r["n_seen"])
        for r in G.apply_merges(edges, merges).collect()
    }
    # the two parallel A->anon edges collapse, newest lastSeen wins,
    # n_seen sums (UpdateVertex + AddOrUpdateEdge semantics)
    assert out[("A", "(0,0,1);(1,0,1)")] == (t1, 5)
    assert out[("(0,0,1);(1,0,1)", "B")] == (t0, 1)
    assert len(out) == 2


def test_stream_distances_symmetric_quirk(edges, spark, events):
    meta = G.synth_traceroute_meta(events)
    d = G.stream_distances(edges, meta, max_depth=10,
                           reachable_only=False).toPandas()
    # reference quirk: distance = 2 * d(src_a, src_b) -> always even
    vals = d["distance"].dropna()
    assert (vals % 2 == 0).all()
    n = meta.count()
    assert len(d) == n * (n - 1) // 2


def test_stream_distances_reachable_only_matches_non_null(
    edges, spark, events
):
    """The scale path (reachable_only=True) must equal the reference-
    shaped all-pairs output restricted to its non-NULL rows, and its
    plan must contain no cross/nested-loop join — pair generation is
    the BFS relation itself."""
    meta = G.synth_traceroute_meta(events)
    full = G.stream_distances(edges, meta, max_depth=10,
                              reachable_only=False).toPandas()
    cc_df = G.stream_distances(
        edges, meta, max_depth=10, reachable_only=True
    )
    plan = cc_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    cc = cc_df.toPandas()
    key = ["stream_a", "stream_b"]
    exp = (
        full[full["distance"].notna()]
        .sort_values(key, ignore_index=True)
    )
    got = cc.sort_values(key, ignore_index=True)
    assert got.astype("object").equals(exp.astype("object")), (got, exp)


def test_group_events_topological_links_near_streams(spark):
    groups = spark.createDataFrame(
        [("g1", 0), ("g2", 1), ("g3", 5)], "group_id string, stream int"
    )
    dist = spark.createDataFrame(
        [(0, 1, 2), (0, 5, 9)], "stream_a int, stream_b int, distance int"
    )
    out = G.group_events_topological(groups, dist, max_distance=4)
    pairs = {(r["group_a"], r["group_b"]) for r in out.collect()}
    assert pairs == {("g1", "g2"), ("g2", "g1")}


def test_no_cartesian_in_graph_plans(hops, edges):
    # the only intentional cross join is the tiny broadcast meta pair
    # enumeration in stream_distances; the core relations must be
    # hash-aggregate / hash-join shaped.
    for df in (G.topology_vertices(hops), edges):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_all_pairs_guard_raises_above_threshold(
    edges, spark, events, monkeypatch
):
    """All-pairs mode is guarded by a bounded probe (limit(n+1), same
    pattern as _collect_small_sym): above ALL_PAIRS_MAX_STREAMS it
    raises and points at the reachable_only path instead of planning
    an O(n^2) crossJoin."""
    meta = G.synth_traceroute_meta(events)
    monkeypatch.setattr(G, "ALL_PAIRS_MAX_STREAMS", 2)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="reachable_only"):
        G.stream_distances(edges, meta, max_depth=10,
                           reachable_only=False)
    # the scale path is untouched by the guard
    assert G.stream_distances(edges, meta, max_depth=10).count() >= 0
