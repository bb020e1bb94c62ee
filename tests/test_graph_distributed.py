"""Distributed-path verification for the iterative graph algorithms.

connected_components / bfs_distances take a driver-local fast path when
the symmetrized edge list is under SMALL_GRAPH_EDGES (200k) — which
every fixture and the sf0.01 oracle gate is. These tests force the
threshold to 0 so the join-round implementations (the code that runs at
100 TB scale) are certified against the SAME DuckDB oracles / fixpoints
as the driver path."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from streamevmon_spark.operators import graph as G
from tests.oracle_utils import assert_matches_oracle


@pytest.fixture()
def force_distributed(monkeypatch):
    monkeypatch.setattr(G, "SMALL_GRAPH_EDGES", 0)


def test_distributed_components_match_oracle(
    spark, sf_dir, force_distributed
):
    assert_matches_oracle(
        entry._q_graph_largest_component(spark, sf_dir),
        entry.oracle_sql()["graph_largest_component"],
        sf_dir,
    )


def test_distributed_bfs_matches_oracle(spark, sf_dir, force_distributed):
    assert_matches_oracle(
        entry._q_graph_stream_distances(spark, sf_dir),
        entry.oracle_sql()["graph_stream_distances"],
        sf_dir,
    )


def test_distributed_dedup_clusters_match_oracle(
    spark, sf_dir, force_distributed
):
    q = entry._q_docs("dedup", "dedup_clusters", threshold=0.2)
    assert_matches_oracle(
        q(spark, sf_dir), entry.oracle_sql()["dedup_clusters"], sf_dir
    )


def test_both_paths_same_fixpoint(spark, sf_dir, monkeypatch):
    # direct path-vs-path equality on the same relation, no oracle in
    # the middle: the two implementations must agree row-for-row
    _, edges = entry._graph_dims(spark, sf_dir)
    monkeypatch.setattr(G, "SMALL_GRAPH_EDGES", 10**9)
    local = {(r.uid, r.component)
             for r in G.connected_components(edges).collect()}
    monkeypatch.setattr(G, "SMALL_GRAPH_EDGES", 0)
    dist = {(r.uid, r.component)
            for r in G.connected_components(edges).collect()}
    assert local == dist and len(local) > 0
