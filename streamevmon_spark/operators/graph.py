"""Traceroute topology-graph family, re-expressed Spark-first.

The reference builds a mutable JGraphT graph on a single task by folding
a stream of GraphChangeEvents (reference:
events/grouping/graph/building/GraphChangeEvent.scala:41-205) produced
from traceroute paths (building/TracerouteAsInetToGraphChangeEvent.scala
:50-105), with alias resolution (pruning/AliasResolver.scala:79-160),
age pruning (pruning/GraphPruneLastSeenTime.scala:58-86), parallel-
anonymous-host merging (pruning/GraphPruneParallelAnonymousHost.scala
:113-281), stream-distance computation (grouping/DistanceBetweenStreams
.scala:42-88) and DOT export (GraphDotExporter.scala:102-166).

Here the graph IS a pair of DataFrames — a vertex relation keyed by the
reference's Host.uid (impl/Host.scala:106-124) and an edge relation with
AddOrUpdateEdge keep-latest semantics (GraphChangeEvent.scala:125-133) —
so every "graph mutation fold" becomes a distributed aggregation:

- vertex construction + naive alias resolution = groupBy(uid) set-union
  (AliasResolver.resolve's mergedHosts map keyed on uid, :84-87);
- AddOrUpdateEdge replace-on-re-add = groupBy(src,dst).agg(max(ts));
  self-loop drops mirror UpdateVertex (GraphChangeEvent.scala:83-88);
- RemoveOldEdges/GraphPruneLastSeenTime = a filter on last_seen;
- RemoveUnconnectedVertices / keep-largest-component
  (GraphChangeEvent.scala:171-184, GraphPruneLastSeenTime.scala:75-82)
  = distributed connected components by iterative min-label
  propagation (O(diameter) hash-join rounds, co-partitioned on uid —
  no single-task graph object, no driver collect);
- parallel-anonymous merging operates directly on the path rows: a
  maximal run of anonymous hops bounded by identified hosts is grouped
  by (bounding-src, bounding-dst, run length) and merged position-wise
  — reproducing every documented example of the reference algorithm
  (GraphPruneParallelAnonymousHost.scala:55-111) without materializing
  a graph or running AllDirectedPaths;
- stream distance = bounded-depth BFS (frontier joins) instead of A*;
  the roots are the per-stream source/destination hosts
  (DistanceBetweenStreams.scala:58-67).

The sandbox tables carry no traceroute data, so ``synth_traceroutes``
derives a deterministic path table from the events relation with pure
integer arithmetic — the DuckDB oracles rebuild the identical paths,
making the whole family cross-engine hash-checked end-to-end.

At 100 TB scale: path explosion and uid computation are scans (codegen,
no shuffle); vertex/edge aggregation shuffles once on uid / (src,dst);
label propagation and BFS are per-round joins partitioned on the join
key with early termination; nothing ever collects the graph to the
driver except the final query result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamevmon_spark.operators.rollup import EPOCH_NTZ

# ---------------------------------------------------------------------------
# Deterministic synthetic traceroute layer (cross-engine mirrored)
# ---------------------------------------------------------------------------

N_STREAMS = 12

# Hop grammar (mirrored verbatim in graph_oracles.py):
#   stream   = event_id % N_STREAMS
#   path_id  = 1 if (event_id * 7919) % 10 = 0 else 0
#   n_hops   = 5 + stream % 3 + path_id
#   hop 0    = address 10.0.<stream>.1, asn -2 (private LAN)
#   hop n-1  = address 10.9.<stream>.9, asn 64500 + stream % 4
#   middle i = anonymous when (stream*5 + path_id*3 + i) % 4 = 0,
#              else backbone address 10.1.<i>.<path_id> shared across
#              streams, asn 0 (unknown) when i % 5 = 4 else 64496 + i%3
_HOP_EXPR = """
transform(sequence(0, n_hops - 1), i -> CASE
    WHEN i = 0 THEN named_struct(
        'address', concat('10.0.', stream, '.1'), 'asn', -2)
    WHEN i = n_hops - 1 THEN named_struct(
        'address', concat('10.9.', stream, '.9'), 'asn', 64500 + stream % 4)
    WHEN (stream * 5 + path_id * 3 + i) % 4 = 0 THEN named_struct(
        'address', CAST(NULL AS STRING), 'asn', -1)
    ELSE named_struct(
        'address', concat('10.1.', i, '.', path_id),
        'asn', CASE WHEN i % 5 = 4 THEN 0 ELSE 64496 + i % 3 END)
END)
"""


def synth_traceroutes(events: DataFrame) -> DataFrame:
    """Deterministic traceroute measurements derived from the events
    relation (the stand-in for the reference's PostgreSQL traceroute
    tables — connectors/postgres/schema/AsInetPath.scala:37-49). One
    measurement per event; hops is array<struct<address,asn>> with NULL
    addresses for anonymous hops. Pure built-ins, codegen end-to-end."""
    return (
        events.select(
            "event_id",
            "ts",
            F.expr(f"CAST(event_id % {N_STREAMS} AS INT)").alias("stream"),
            F.expr(
                "CAST(CASE WHEN (event_id * 7919) % 10 = 0 "
                "THEN 1 ELSE 0 END AS INT)"
            ).alias("path_id"),
        )
        .withColumn("n_hops", F.expr("5 + stream % 3 + path_id"))
        .withColumn("hops", F.expr(_HOP_EXPR))
        .drop("n_hops")
    )


def synth_traceroute_meta(events: DataFrame) -> DataFrame:
    """Per-stream metadata (TracerouteMeta analogue): source/destination
    hostnames. One row per distinct stream."""
    return (
        events.select(
            F.expr(f"CAST(event_id % {N_STREAMS} AS INT)").alias("stream")
        )
        .distinct()
        .select(
            "stream",
            F.expr("concat('amp-', stream)").alias("source"),
            F.expr("concat('dst-', stream)").alias("destination"),
        )
    )


# ---------------------------------------------------------------------------
# AsInetPath extraction (co-process buffer join => broadcast hash join)
# ---------------------------------------------------------------------------


def as_inet_paths(traceroutes: DataFrame, meta: DataFrame) -> DataFrame:
    """TracerouteAsInetPathExtractor (reference:
    building/TracerouteAsInetPathExtractor.scala:115-155): each
    measurement is paired with its stream's meta. The reference buffers
    measurements until the meta arrives; in batch that buffering IS an
    inner join, and the meta side is a per-stream dimension — broadcast
    hash join, no shuffle of the measurement stream."""
    dim = F.broadcast(meta.select("stream", "source", "destination"))
    return traceroutes.join(dim, "stream", "inner")


_ASN_STR = (
    "CASE WHEN {asn} = -2 THEN 'Private Address' "
    "WHEN {asn} = -1 THEN 'AS Missing' "
    "WHEN {asn} = 0 THEN 'AS Unknown' "
    "ELSE concat('AS ', {asn}) END"
)


def path_hops(paths: DataFrame) -> DataFrame:
    """Long form of pathToHosts (reference:
    building/TracerouteAsInetToGraphChangeEvent.scala:51-76): one row
    per (measurement, hop) with the reference's Host identity rules —
    hop 0 carries meta.source as hostname, the last hop
    meta.destination; anonymous hops (no hostname, no address) are
    identified by the (stream, path_id, hop_idx) triple
    (TracerouteAsInetToGraphChangeEvent.scala:67-69).

    uid follows Host.uid's hierarchy (impl/Host.scala:106-124):
    hostnames > addresses ("addr (AS n)", AsNumber.toString at
    connectors/postgres/schema/AsNumber.scala:48-53) > traceroute-uid
    triple "(stream,path_id,idx)"."""
    exploded = paths.select(
        "event_id",
        "stream",
        "path_id",
        "ts",
        F.posexplode("hops").alias("hop_idx", "hop"),
        F.expr("size(hops)").alias("n_hops"),
    )
    return exploded.select(
        "event_id",
        "stream",
        "path_id",
        "ts",
        "hop_idx",
        F.expr(
            "CASE WHEN hop_idx = 0 THEN concat('amp-', stream) "
            "WHEN hop_idx = n_hops - 1 THEN concat('dst-', stream) "
            "END"
        ).alias("hostname"),
        F.col("hop.address").alias("address"),
        F.col("hop.asn").alias("asn"),
    ).withColumn(
        "uid",
        F.expr(
            "CASE WHEN hostname IS NOT NULL THEN hostname "
            "WHEN address IS NOT NULL THEN concat(address, ' (', "
            + _ASN_STR.format(asn="asn")
            + ", ')') "
            "ELSE concat('(', stream, ',', path_id, ',', hop_idx, ')') END"
        ),
    )


# ---------------------------------------------------------------------------
# Topology construction (vertex/edge relations)
# ---------------------------------------------------------------------------


def topology_vertices(hops: DataFrame) -> DataFrame:
    """Vertex relation keyed by Host.uid. groupBy(uid) set-union IS the
    naive alias resolution of AliasResolver (reference:
    pruning/AliasResolver.scala:84-87: same-uid hosts merge, hostname
    and address sets union — Host.mergeWith, impl/Host.scala:222-259).
    One hash shuffle on uid; all set math is JVM-side."""
    asn_str = _ASN_STR.format(asn="asn")
    return (
        hops.groupBy("uid")
        .agg(
            F.expr(
                "array_join(array_sort(collect_set(hostname)), ';')"
            ).alias("hostnames"),
            F.expr(
                "array_join(array_sort(collect_set(CASE WHEN address IS "
                f"NOT NULL THEN concat(address, ' (', {asn_str}, ')') "
                "END)), ';')"
            ).alias("addresses"),
            F.expr(
                "array_sort(collect_set(CASE WHEN asn > 0 THEN asn END))"
            ).alias("valid_asns"),
            F.expr("CAST(count(*) AS BIGINT)").alias("n_seen"),
            F.max("ts").alias("last_seen"),
        )
        .withColumn(
            "is_anonymous",
            F.expr("hostnames = '' AND addresses = ''"),
        )
    )


def topology_edges(hops: DataFrame) -> DataFrame:
    """Edge relation with AddOrUpdateEdge keep-latest semantics
    (reference: GraphChangeEvent.scala:125-133 — re-adding an edge
    replaces it, so only the newest lastSeen survives:
    impl/EdgeWithLastSeen.scala). Consecutive-hop pairs come from a
    lead() window per measurement (the sliding(2) at
    TracerouteAsInetToGraphChangeEvent.scala:87-101); self-loops are
    dropped like UpdateVertex does (GraphChangeEvent.scala:83-88).
    Shuffles: one window partition on event_id, one groupBy (src,dst).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("event_id").orderBy("hop_idx")
    pairs = hops.select(
        "event_id", "ts", "uid", "hop_idx",
        F.lead("uid").over(w).alias("dst_uid"),
    ).where(F.col("dst_uid").isNotNull() & (F.col("uid") != F.col("dst_uid")))
    return pairs.groupBy(
        F.col("uid").alias("src_uid"), F.col("dst_uid").alias("dst_uid")
    ).agg(
        F.max("ts").alias("last_seen"),
        F.expr("CAST(count(*) AS BIGINT)").alias("n_seen"),
    )


def prune_old_edges(
    edges: DataFrame, current_time: str, prune_age_s: int
) -> DataFrame:
    """RemoveOldEdges / GraphPruneLastSeenTime edge half (reference:
    GraphChangeEvent.scala:151-163, GraphPruneLastSeenTime.scala:61-70):
    drop edges strictly older than current_time − prune_age. Integer-µs
    comparison keeps the predicate timezone-free and cross-engine exact.
    """
    from datetime import datetime, timezone

    cutoff = datetime.fromisoformat(current_time).replace(
        tzinfo=timezone.utc
    )
    min_us = int(cutoff.timestamp() * 1_000_000) - prune_age_s * 1_000_000
    return edges.where(
        F.expr(
            f"datediff(MICROSECOND, {EPOCH_NTZ}, last_seen) >= {min_us}"
        )
    )


def connected_components(
    edges: DataFrame, max_iters: int = 25
) -> DataFrame:
    """Undirected connected components by iterative min-label
    propagation: every node starts labelled with its own uid; each round
    takes the min label over itself and its neighbours; convergence when
    a round changes no label. O(diameter) rounds, each a hash join
    co-partitioned on uid — the distributed replacement for JGraphT's
    ConnectivityInspector (reference: GraphChangeEvent.scala:171-184).
    Returns (uid, component) with component = min uid reachable."""
    sym = (
        edges.select(
            F.col("src_uid").alias("a"), F.col("dst_uid").alias("b")
        )
        .union(
            edges.select(
                F.col("dst_uid").alias("a"), F.col("src_uid").alias("b")
            )
        )
        .distinct()
    )
    small = _collect_small_sym(sym)
    if small is not None:
        # driver-local union-find: same fixpoint (min reachable label)
        # without max_iters join rounds. See SMALL_GRAPH_EDGES.
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for row in small:
            for n in (row.a, row.b):
                if n not in parent:
                    parent[n] = n
            ra, rb = find(row.a), find(row.b)
            if ra != rb:
                # union by min label keeps the exact contract
                lo, hi = min(ra, rb), max(ra, rb)
                parent[hi] = lo
        out_rows = [(n, find(n)) for n in parent]
        uid_t = edges.schema["src_uid"].dataType.simpleString()
        return edges.sparkSession.createDataFrame(
            out_rows, schema=f"uid {uid_t}, component {uid_t}"
        )
    # localCheckpoint truncates lineage each round — iterative DataFrame
    # algorithms otherwise stack O(iters) nested joins into one plan,
    # which blows analysis/codegen long before the data does.
    sym = sym.localCheckpoint()
    labels = (
        sym.select(F.col("a").alias("uid"))
        .distinct()
        .withColumn("component", F.col("uid"))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        neighbor_min = (
            sym.join(labels.withColumnRenamed("uid", "b"), "b")
            .groupBy(F.col("a").alias("uid"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "uid", "left")
            .select(
                "uid",
                F.least(
                    "component", F.coalesce("nbr_min", "component")
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "uid")
            .where(F.expr("n.component != o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def largest_component(
    vertices: DataFrame, edges: DataFrame
) -> DataFrame:
    """RemoveUnconnectedVertices / keep-largest-component (reference:
    GraphChangeEvent.scala:171-184, GraphPruneLastSeenTime.scala:75-82:
    every connected set except the largest is removed). The reference's
    tie-break is JVM set-iteration order; here ties break
    deterministically by (size DESC, component label ASC). Vertices
    with no surviving edge are dropped (they are their own singleton
    component, never the largest in any non-trivial graph)."""
    comp = connected_components(edges)
    sizes = comp.groupBy("component").agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("csize")
    )
    winner = F.broadcast(
        sizes.orderBy(F.desc("csize"), F.asc("component")).limit(1)
    )
    keep = comp.join(
        winner.select("component"), "component"
    ).select("uid")
    return vertices.join(keep, "uid")


# ---------------------------------------------------------------------------
# Parallel anonymous host merging (path-run reinterpretation)
# ---------------------------------------------------------------------------


def parallel_anonymous_merges(hops: DataFrame) -> DataFrame:
    """GraphPruneParallelAnonymousHost, Spark-first (reference:
    pruning/GraphPruneParallelAnonymousHost.scala:113-281). The
    reference walks the built graph: for every identified vertex with
    >1 anonymous parents it climbs to a common ancestor (out-degree>1,
    :153-179), enumerates bounded paths (AllDirectedPaths, :208-223),
    keeps all-anonymous ones (:229-240), groups parallel same-length
    paths by (length, start, end) (:246-253) and merges position-wise
    (:256-265).

    Here the traceroute paths are still rows, so the same groups fall
    out of a window pass: each maximal run of anonymous hops bounded by
    identified hosts on both sides is keyed by (bounding-src uid,
    bounding-dst uid, run length); groups with >1 run merge
    position-wise. This reproduces all three worked examples in the
    reference's documentation (:55-111) — parallel equal-length chains
    merge, unequal-length or unbounded chains don't — without
    materializing a graph. Divergence: the reference also requires the
    common ancestor to have out-degree>1 *in the current graph*, which
    can suppress merges when one of the parallel paths has aged out;
    the path-run form considers all paths present in the input.

    Returns the merge map (uid -> merged_uid): merged_uid is the
    ';'-join of the sorted member uids, mirroring Host.uid for merged
    anonymous hosts (impl/Host.scala:116-118, mergeWith at :237-251).
    One window pass + one groupBy; no joins, no iteration."""
    from pyspark.sql import Window

    shape = (
        hops.select("stream", "path_id", "hop_idx", "uid")
        .withColumn(
            "is_anon", F.expr("uid LIKE '(%'")
        )
        .distinct()
    )
    w = (
        Window.partitionBy("stream", "path_id")
        .orderBy("hop_idx")
    )
    prev = w.rowsBetween(Window.unboundedPreceding, -1)
    nxt = w.rowsBetween(1, Window.unboundedFollowing)
    runs = (
        shape.withColumn(
            "prev_uid",
            F.last(
                F.when(~F.col("is_anon"), F.col("uid")), ignorenulls=True
            ).over(prev),
        )
        .withColumn(
            "prev_idx",
            F.last(
                F.when(~F.col("is_anon"), F.col("hop_idx")),
                ignorenulls=True,
            ).over(prev),
        )
        .withColumn(
            "next_uid",
            F.first(
                F.when(~F.col("is_anon"), F.col("uid")), ignorenulls=True
            ).over(nxt),
        )
        .withColumn(
            "next_idx",
            F.first(
                F.when(~F.col("is_anon"), F.col("hop_idx")),
                ignorenulls=True,
            ).over(nxt),
        )
        .where(
            F.col("is_anon")
            & F.col("prev_uid").isNotNull()
            & F.col("next_uid").isNotNull()
        )
        .select(
            "uid",
            "prev_uid",
            "next_uid",
            F.expr("next_idx - prev_idx - 1").alias("run_len"),
            F.expr("hop_idx - prev_idx - 1").alias("pos_in_run"),
        )
    )
    groups = runs.groupBy(
        "prev_uid", "next_uid", "run_len", "pos_in_run"
    ).agg(
        F.expr("array_sort(collect_set(uid))").alias("members"),
    )
    return (
        groups.where(F.expr("size(members) > 1"))
        .select(
            F.explode("members").alias("uid"),
            F.expr("array_join(members, ';')").alias("merged_uid"),
            F.expr("CAST(size(members) AS INT)").alias("n_merged"),
        )
    )


def apply_merges(edges: DataFrame, merges: DataFrame) -> DataFrame:
    """MergeVertices applied to the edge relation (reference:
    GraphChangeEvent.scala:112-123 via UpdateVertex :65-90): endpoints
    relabel to their merged uid, self-loops drop, duplicate edges keep
    the newest lastSeen. Broadcast the merge map (bounded by the
    anonymous-run population, dimension-sized)."""
    m = F.broadcast(merges.select("uid", "merged_uid"))
    relabeled = (
        edges.join(
            m.withColumnRenamed("uid", "src_uid").withColumnRenamed(
                "merged_uid", "src_m"
            ),
            "src_uid",
            "left",
        )
        .join(
            m.withColumnRenamed("uid", "dst_uid").withColumnRenamed(
                "merged_uid", "dst_m"
            ),
            "dst_uid",
            "left",
        )
        .select(
            F.coalesce("src_m", "src_uid").alias("src_uid"),
            F.coalesce("dst_m", "dst_uid").alias("dst_uid"),
            "last_seen",
            "n_seen",
        )
        .where(F.col("src_uid") != F.col("dst_uid"))
    )
    return relabeled.groupBy("src_uid", "dst_uid").agg(
        F.max("last_seen").alias("last_seen"),
        F.expr("CAST(sum(n_seen) AS BIGINT)").alias("n_seen"),
    )


# ---------------------------------------------------------------------------
# Stream distances (BFS) + topological grouping
# ---------------------------------------------------------------------------


# Below this many (symmetrized, distinct) edges an iterative graph
# algorithm runs on the driver instead of as join rounds. Rationale =
# the broadcast-join rationale: each distributed round costs several
# scheduler round-trips, so a bounded graph (topology graphs are
# bounded by distinct hosts, not by measurement volume) is orders of
# magnitude faster local; anything larger takes the join-round path.
SMALL_GRAPH_EDGES = 200_000


def _collect_small_sym(sym: DataFrame) -> list | None:
    """The symmetrized edge list if it is driver-small, else None.
    limit(n+1) bounds the probe — Spark stops the scan at n+1 rows, so
    a 10^12-edge relation never materializes to answer 'is it small'."""
    probe = sym.limit(SMALL_GRAPH_EDGES + 1).collect()
    return None if len(probe) > SMALL_GRAPH_EDGES else probe


def bfs_distances(
    edges: DataFrame, roots: DataFrame, max_depth: int = 10
) -> DataFrame:
    """Multi-source BFS over the undirected edge relation: returns
    (root, uid, dist) = shortest hop-count ≤ max_depth from each root.
    Frontier-join rounds with a visited set, early exit when the
    frontier drains — the distributed replacement for per-pair
    AStarShortestPath (reference: DistanceBetweenStreams.scala:72-86;
    an undirected view of the graph, :73). Graphs under
    SMALL_GRAPH_EDGES run a driver-local BFS over the collected edge
    list (identical distances — BFS levels are unique), skipping
    max_depth scheduler rounds."""
    sym = (
        edges.select(F.col("src_uid").alias("a"), F.col("dst_uid").alias("b"))
        .union(
            edges.select(
                F.col("dst_uid").alias("a"), F.col("src_uid").alias("b")
            )
        )
        .distinct()
    )
    small = _collect_small_sym(sym)
    if small is not None:
        from collections import deque

        adj: dict = {}
        for r in small:
            adj.setdefault(r.a, []).append(r.b)
        out_rows = []
        for rr in roots.select("root").distinct().collect():
            root = rr.root
            seen = {root: 0}
            dq = deque([root])
            while dq:
                u = dq.popleft()
                du = seen[u]
                if du >= max_depth:
                    continue
                for v in adj.get(u, ()):
                    if v not in seen:
                        seen[v] = du + 1
                        dq.append(v)
            out_rows.extend((root, u, d) for u, d in seen.items())
        uid_t = edges.schema["src_uid"].dataType.simpleString()
        return edges.sparkSession.createDataFrame(
            out_rows, schema=f"root {uid_t}, uid {uid_t}, dist int"
        )
    sym = sym.localCheckpoint()  # truncate lineage: reused every round
    visited = (
        roots.select(F.col("root"), F.col("root").alias("uid"))
        .distinct()
        .withColumn("dist", F.lit(0))
        .localCheckpoint()
    )
    frontier = visited
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(sym, frontier["uid"] == sym["a"])
            .select("root", F.col("b").alias("uid"))
            .distinct()
            .join(
                visited.select("root", "uid"),
                ["root", "uid"],
                "left_anti",
            )
            .withColumn("dist", F.lit(depth))
            .localCheckpoint()
        )
        if nxt.limit(1).count() == 0:
            break
        visited = visited.union(nxt).localCheckpoint()
        frontier = nxt
    return visited


# All-pairs stream_distances emits O(n^2) rows in the stream dimension;
# above this many streams that is a scale bug, not a query — the guard
# raises and points at the reachable_only path (same bounded-probe
# pattern as _collect_small_sym: limit(n+1) stops the scan early).
ALL_PAIRS_MAX_STREAMS = 10_000


def stream_distances(
    edges: DataFrame,
    meta: DataFrame,
    max_depth: int = 10,
    mirror_reference_quirk: bool = True,
    reachable_only: bool = True,
) -> DataFrame:
    """DistanceBetweenStreams for every stream pair (reference:
    grouping/DistanceBetweenStreams.scala:69-87, driven by
    StreamDistanceCache.recalculateAllDistances,
    grouping/StreamDistanceCache.scala). Stream endpoints resolve to
    the hostname-uid vertices (getVertexByName, :48-56).

    The reference computes ``sourcesDistance + destsDistance`` but BOTH
    from getPath(a.source, b.source) (:84-85 — destsDistance repeats
    the source path), so the shipped semantics are 2 × d(src_a, src_b).
    ``mirror_reference_quirk=True`` (default) pins that behaviour;
    False computes d(src_a,src_b) + d(dst_a,dst_b). Unreachable pairs
    (the reference would throw on ``.get``) yield NULL distance.

    ``reachable_only=True`` (the DEFAULT — the scale path, r5): pair
    generation is driven by the BFS distance relation itself
    (equi-joins only — no meta x meta cross join), so work and output
    are proportional to the number of co-reachable pairs instead of
    all O(n^2) stream pairs; pairs whose sources are not connected
    within ``max_depth`` are simply absent. ``reachable_only=False``
    opts back into the reference's exact table (every pair, NULL when
    unreachable — the cache in the reference recomputes exactly that)
    and is guarded: a bounded probe raises above
    ALL_PAIRS_MAX_STREAMS streams instead of planning an O(n^2)
    crossJoin."""
    srcs = meta.select(
        "stream", F.col("source").alias("root")
    )
    dsts = meta.select("stream", F.col("destination").alias("root"))
    roots = srcs.select("root").union(
        srcs.select("root") if mirror_reference_quirk
        else dsts.select("root")
    ).distinct()
    dist = bfs_distances(edges, roots, max_depth)
    if reachable_only:
        d = dist.select("root", "uid", "dist")
        a = meta.select(
            F.col("stream").alias("stream_a"),
            F.col("source").alias("root"),
            F.col("destination").alias("dst_a"),
        )
        b = meta.select(
            F.col("stream").alias("stream_b"),
            F.col("source").alias("uid"),
            F.col("destination").alias("dst_b"),
        )
        src_pairs = (
            d.join(a, "root")
            .join(b, "uid")
            .where(F.col("stream_a") < F.col("stream_b"))
        )
        if mirror_reference_quirk:
            return src_pairs.select(
                "stream_a",
                "stream_b",
                F.expr("CAST(dist + dist AS INT)").alias("distance"),
            )
        dd = dist.select(
            F.col("root").alias("dst_a"),
            F.col("uid").alias("dst_b"),
            F.col("dist").alias("d_dst"),
        )
        return src_pairs.join(dd, ["dst_a", "dst_b"]).select(
            "stream_a",
            "stream_b",
            F.expr("CAST(dist + d_dst AS INT)").alias("distance"),
        )
    probe = meta.select("stream").limit(ALL_PAIRS_MAX_STREAMS + 1).collect()
    if len(probe) > ALL_PAIRS_MAX_STREAMS:
        raise ValueError(
            f"stream_distances: all-pairs mode over more than "
            f"{ALL_PAIRS_MAX_STREAMS} streams is O(n^2) rows — use "
            "reachable_only=True (the default) for the equi-join path"
        )
    m = F.broadcast(meta.select("stream", "source", "destination"))
    pairs = (
        m.alias("a")
        .crossJoin(m.alias("b"))
        .where(F.expr("a.stream < b.stream"))
        .select(
            F.expr("a.stream").alias("stream_a"),
            F.expr("b.stream").alias("stream_b"),
            F.expr("a.source").alias("src_a"),
            F.expr("b.source").alias("src_b"),
            F.expr("a.destination").alias("dst_a"),
            F.expr("b.destination").alias("dst_b"),
        )
    )
    d = dist.select(
        F.col("root"), F.col("uid"), F.col("dist")
    )
    src_d = pairs.join(
        d.withColumnRenamed("root", "src_a")
        .withColumnRenamed("uid", "src_b")
        .withColumnRenamed("dist", "d_src"),
        ["src_a", "src_b"],
        "left",
    )
    if mirror_reference_quirk:
        out = src_d.withColumn(
            "distance", F.expr("CAST(d_src + d_src AS INT)")
        )
    else:
        out = src_d.join(
            d.withColumnRenamed("root", "dst_a")
            .withColumnRenamed("uid", "dst_b")
            .withColumnRenamed("dist", "d_dst"),
            ["dst_a", "dst_b"],
            "left",
        ).withColumn("distance", F.expr("CAST(d_src + d_dst AS INT)"))
    return out.select("stream_a", "stream_b", "distance")


def group_events_topological(
    groups: DataFrame,
    distances: DataFrame,
    max_distance: int,
) -> DataFrame:
    """Topological proximity annotation for event groups. NOTE: the
    reference's TopologicalDistanceGrouper.processElement1 is empty —
    the grouping logic was never implemented (reference:
    grouping/TopologicalDistanceGrouper.scala:71-101 is all comments);
    only the distance-cache recalculation machinery exists. This
    operator implements the documented intent: every pair of event
    groups whose streams are within ``max_distance`` of each other is
    linked. ``groups`` needs (group_id, stream) rows."""
    near = distances.where(
        F.col("distance").isNotNull()
        & (F.col("distance") <= max_distance)
    )
    sym = near.union(
        near.select(
            F.col("stream_b").alias("stream_a"),
            F.col("stream_a").alias("stream_b"),
            "distance",
        )
    )
    a = groups.select(
        F.col("group_id").alias("group_a"), F.col("stream").alias("stream_a")
    )
    b = groups.select(
        F.col("group_id").alias("group_b"), F.col("stream").alias("stream_b")
    )
    return (
        a.join(sym, "stream_a")
        .join(b, "stream_b")
        .where(F.col("group_a") != F.col("group_b"))
        .select("group_a", "group_b", "distance")
    )


# ---------------------------------------------------------------------------
# DOT export
# ---------------------------------------------------------------------------


def graph_dot(vertices: DataFrame, edges: DataFrame) -> DataFrame:
    """Deterministic DOT serialisation of the topology (reference:
    GraphDotExporter.scala:102-166). Vertex attributes mirror the
    reference: style=filled; box shape when any hostname contains
    "amp" (:137-146); fillcolor #FF0000 for named hosts (:148-151),
    AS-hue colour otherwise (:125-133), #FFFFFF when no valid AS. The
    reference indexes AS numbers by unordered-Set iteration
    (:118-123) — nondeterministic; pinned here to ascending-ASN order.
    Java's float32 Color.getHSBColor is reproduced in float64 (both
    engines evaluate the identical expression text, so the gate's
    cross-engine check is exact). Edge ids are epoch-µs lastSeen
    (setEdgeIdProvider(_.lastSeen.toString), :162).

    Returns (kind, line) rows — 'v' vertex lines, 'e' edge lines; the
    AS-index is a window over the distinct-ASN dimension (tiny)."""
    from pyspark.sql import Window

    asn_dim = (
        vertices.select(F.explode("valid_asns").alias("asn"))
        .distinct()
        .withColumn(
            "asn_idx",
            F.row_number().over(Window.orderBy("asn")) - 1,
        )
    )
    n_asns = asn_dim.count()
    primary = vertices.withColumn(
        "primary_asn", F.expr("CASE WHEN size(valid_asns) > 0 THEN valid_asns[0] END")
    )
    colored = primary.join(
        F.broadcast(asn_dim.withColumnRenamed("asn", "primary_asn")),
        "primary_asn",
        "left",
    )
    # Java Color.getHSBColor(h, 0.5, 0.95), h = (0.8*idx/n + 0.1) % 1;
    # HSB→RGB spelled out arm by arm (i = floor(h'), f = h'-i, p/q/t as
    # in java.awt.Color.getHSBColor).
    hsb = f"CAST(asn_idx AS DOUBLE) / {max(n_asns, 1)}.0"
    h6 = f"(((0.8 * ({hsb}) + 0.1) % 1.0) * 6.0)"
    f_ = f"({h6} - floor({h6}))"
    p = f"(0.95 * (1.0 - 0.5))"
    q = f"(0.95 * (1.0 - 0.5 * {f_}))"
    t = f"(0.95 * (1.0 - 0.5 * (1.0 - {f_})))"
    v = "0.95"

    def _hex(x: str) -> str:
        return f"format_string('%02X', CAST(floor({x} * 255.0 + 0.5) AS INT))"

    rgb = (
        f"CASE CAST(floor({h6}) AS INT) "
        f"WHEN 0 THEN concat({_hex(v)}, {_hex(t)}, {_hex(p)}) "
        f"WHEN 1 THEN concat({_hex(q)}, {_hex(v)}, {_hex(p)}) "
        f"WHEN 2 THEN concat({_hex(p)}, {_hex(v)}, {_hex(t)}) "
        f"WHEN 3 THEN concat({_hex(p)}, {_hex(q)}, {_hex(v)}) "
        f"WHEN 4 THEN concat({_hex(t)}, {_hex(p)}, {_hex(v)}) "
        f"ELSE concat({_hex(v)}, {_hex(p)}, {_hex(q)}) END"
    )
    vlines = colored.select(
        F.lit("v").alias("kind"),
        F.expr(
            'concat(\'"\', uid, \'" [style=filled, shape=\', '
            "CASE WHEN hostnames LIKE '%amp%' THEN 'box' ELSE 'oval' END, "
            "', fillcolor=\"', "
            "CASE WHEN hostnames != '' THEN '#FF0000' "
            "WHEN asn_idx IS NULL THEN '#FFFFFF' "
            f"ELSE concat('#', {rgb}) END, "
            "'\"];')"
        ).alias("line"),
    )
    elines = edges.select(
        F.lit("e").alias("kind"),
        F.expr(
            "concat('\"', src_uid, '\" -> \"', dst_uid, '\" [id=\"', "
            f"datediff(MICROSECOND, {EPOCH_NTZ}, last_seen), '\"];')"
        ).alias("line"),
    )
    return vlines.union(elines)
