"""DuckDB oracle SQL for the topology-graph family (operators/graph.py).

Every oracle rebuilds the deterministic synthetic traceroute layer from
the raw ``events`` view with the exact integer grammar of
``graph.synth_traceroutes`` and mirrors each operator in ANSI SQL —
recursive CTEs stand in for the iterative label-propagation /
BFS loops (bounded by the same max depth, so min-over-walks equals the
layered BFS distance).
"""

from __future__ import annotations

N_STREAMS = 12

# Mirrors graph.synth_traceroutes + as_inet_paths + path_hops.
_BASE = f"""
tr AS (
    SELECT event_id, ts,
           CAST(event_id % {N_STREAMS} AS INT) AS stream,
           CAST(CASE WHEN (event_id * 7919) % 10 = 0
                THEN 1 ELSE 0 END AS INT) AS path_id
    FROM events
),
tr2 AS (SELECT *, 5 + stream % 3 + path_id AS n_hops FROM tr),
hop0 AS (
    SELECT event_id, stream, path_id, ts, n_hops,
           unnest(generate_series(0, n_hops - 1)) AS hop_idx
    FROM tr2
),
rawhops AS (
    SELECT event_id, stream, path_id, ts,
        CAST(hop_idx AS INT) AS hop_idx,
        CASE WHEN hop_idx = 0 THEN concat('amp-', stream)
             WHEN hop_idx = n_hops - 1 THEN concat('dst-', stream)
        END AS hostname,
        CASE WHEN hop_idx = 0 THEN concat('10.0.', stream, '.1')
             WHEN hop_idx = n_hops - 1 THEN concat('10.9.', stream, '.9')
             WHEN (stream * 5 + path_id * 3 + hop_idx) % 4 = 0 THEN NULL
             ELSE concat('10.1.', hop_idx, '.', path_id)
        END AS address,
        CAST(CASE WHEN hop_idx = 0 THEN -2
             WHEN hop_idx = n_hops - 1 THEN 64500 + stream % 4
             WHEN (stream * 5 + path_id * 3 + hop_idx) % 4 = 0 THEN -1
             WHEN hop_idx % 5 = 4 THEN 0
             ELSE 64496 + hop_idx % 3
        END AS INT) AS asn
    FROM hop0
),
hops AS (
    SELECT *,
        CASE WHEN hostname IS NOT NULL THEN hostname
             WHEN address IS NOT NULL THEN concat(address, ' (', asn_str,
                ')')
             ELSE concat('(', stream, ',', path_id, ',', hop_idx, ')')
        END AS uid
    FROM (
        SELECT *,
            CASE WHEN asn = -2 THEN 'Private Address'
                 WHEN asn = -1 THEN 'AS Missing'
                 WHEN asn = 0 THEN 'AS Unknown'
                 ELSE concat('AS ', asn) END AS asn_str
        FROM rawhops
    )
),
meta AS (
    SELECT stream, concat('amp-', stream) AS source,
           concat('dst-', stream) AS destination
    FROM (SELECT DISTINCT CAST(event_id % {N_STREAMS} AS INT) AS stream
          FROM events)
)
"""

_VERTICES = """
vertices AS (
    SELECT uid, hostnames, addresses, valid_asns, n_seen, last_seen,
           (hostnames = '' AND addresses = '') AS is_anonymous
    FROM (
        SELECT uid,
            coalesce(array_to_string(list_sort(list(DISTINCT hostname)
                FILTER (WHERE hostname IS NOT NULL)), ';'), '')
                AS hostnames,
            coalesce(array_to_string(list_sort(list(DISTINCT
                CASE WHEN address IS NOT NULL
                     THEN concat(address, ' (', asn_str, ')') END)
                FILTER (WHERE address IS NOT NULL)), ';'), '')
                AS addresses,
            coalesce(list_sort(list(DISTINCT CASE WHEN asn > 0 THEN asn
                END) FILTER (WHERE asn > 0)), []) AS valid_asns,
            CAST(count(*) AS BIGINT) AS n_seen,
            max(ts) AS last_seen
        FROM hops GROUP BY uid
    )
)
"""

_EDGES = """
pairs AS (
    SELECT event_id, ts, uid,
           lead(uid) OVER (PARTITION BY event_id ORDER BY hop_idx)
               AS dst_uid
    FROM hops
),
edges AS (
    SELECT uid AS src_uid, dst_uid, max(ts) AS last_seen,
           CAST(count(*) AS BIGINT) AS n_seen
    FROM pairs
    WHERE dst_uid IS NOT NULL AND uid != dst_uid
    GROUP BY uid, dst_uid
)
"""


def paths_oracle() -> str:
    return (
        "WITH RECURSIVE " + _BASE + """
SELECT event_id, stream, path_id, ts, hop_idx, hostname, address, asn,
       uid
FROM hops
"""
    )


def vertices_oracle() -> str:
    return (
        "WITH RECURSIVE " + _BASE + "," + _VERTICES + """
SELECT uid, hostnames, addresses,
       coalesce(array_to_string(valid_asns, ';'), '') AS valid_asns,
       n_seen, last_seen, is_anonymous
FROM vertices
"""
    )


def edges_oracle() -> str:
    return (
        "WITH RECURSIVE " + _BASE + "," + _EDGES + """
SELECT src_uid, dst_uid, last_seen, n_seen FROM edges
"""
    )


def largest_component_oracle(min_us: int) -> str:
    """Prune-then-keep-largest-component: transitive closure by
    recursive CTE (UNION dedup terminates), component = min reachable
    uid — identical to min-label propagation's fixpoint."""
    return (
        "WITH RECURSIVE " + _BASE + "," + _VERTICES + "," + _EDGES + f"""
, pruned AS (
    SELECT * FROM edges WHERE epoch_us(last_seen) >= {min_us}
),
sym AS (
    SELECT src_uid AS a, dst_uid AS b FROM pruned
    UNION
    SELECT dst_uid, src_uid FROM pruned
),
nodes AS (SELECT DISTINCT a AS uid FROM sym),
reach AS (
    SELECT uid AS root, uid AS node FROM nodes
    UNION
    SELECT r.root, s.b FROM reach r JOIN sym s ON r.node = s.a
),
comp AS (SELECT root AS uid, min(node) AS component FROM reach
         GROUP BY root),
sizes AS (SELECT component, CAST(count(*) AS BIGINT) AS csize FROM comp
          GROUP BY component),
winner AS (SELECT component FROM sizes
           ORDER BY csize DESC, component ASC LIMIT 1)
SELECT v.uid, v.hostnames, v.addresses,
       coalesce(array_to_string(v.valid_asns, ';'), '') AS valid_asns,
       v.n_seen, v.last_seen, v.is_anonymous
FROM vertices v
JOIN comp c ON c.uid = v.uid
WHERE c.component = (SELECT component FROM winner)
"""
    )


def anon_merges_oracle() -> str:
    return (
        "WITH RECURSIVE " + _BASE + "," + _MERGE_MAP + """
SELECT unnest(members) AS uid,
       array_to_string(members, ';') AS merged_uid,
       CAST(len(members) AS INT) AS n_merged
FROM grps WHERE len(members) > 1
"""
    )


def stream_distances_oracle(max_depth: int = 10) -> str:
    """BFS as a depth-capped recursive walk; min(dist) per (root, node)
    equals layered BFS. Mirrors the reference quirk of summing the
    source-to-source distance twice (DistanceBetweenStreams.scala:84-86).
    """
    return (
        "WITH RECURSIVE " + _BASE + "," + _EDGES + f"""
, sym AS (
    SELECT src_uid AS a, dst_uid AS b FROM edges
    UNION
    SELECT dst_uid, src_uid FROM edges
),
seeds AS (SELECT DISTINCT source AS root FROM meta),
walk AS (
    SELECT root, root AS node, 0 AS dist FROM seeds
    UNION
    SELECT w.root, s.b, w.dist + 1 FROM walk w JOIN sym s
        ON w.node = s.a WHERE w.dist < {max_depth}
),
bfs AS (SELECT root, node, min(dist) AS dist FROM walk
        GROUP BY root, node)
SELECT a.stream AS stream_a, b.stream AS stream_b,
       CAST(d.dist + d.dist AS INT) AS distance
FROM meta a
JOIN meta b ON a.stream < b.stream
LEFT JOIN bfs d ON d.root = a.source AND d.node = b.source
"""
    )


def stream_distances_cc_oracle(max_depth: int = 10) -> str:
    """stream_distances with ``reachable_only=True``: pair generation is
    the BFS relation itself (INNER join), so pairs whose sources are not
    connected within ``max_depth`` are absent instead of NULL — the
    scale path's semantics (operators/graph.stream_distances)."""
    return (
        "WITH RECURSIVE " + _BASE + "," + _EDGES + f"""
, sym AS (
    SELECT src_uid AS a, dst_uid AS b FROM edges
    UNION
    SELECT dst_uid, src_uid FROM edges
),
seeds AS (SELECT DISTINCT source AS root FROM meta),
walk AS (
    SELECT root, root AS node, 0 AS dist FROM seeds
    UNION
    SELECT w.root, s.b, w.dist + 1 FROM walk w JOIN sym s
        ON w.node = s.a WHERE w.dist < {max_depth}
),
bfs AS (SELECT root, node, min(dist) AS dist FROM walk
        GROUP BY root, node)
SELECT a.stream AS stream_a, b.stream AS stream_b,
       CAST(d.dist + d.dist AS INT) AS distance
FROM bfs d
JOIN meta a ON d.root = a.source
JOIN meta b ON d.node = b.source
WHERE a.stream < b.stream
"""
    )


_MERGE_MAP = """
shape AS (
    SELECT DISTINCT stream, path_id, hop_idx, uid,
           (uid LIKE '(%') AS is_anon
    FROM hops
),
marked AS (
    SELECT uid, hop_idx, is_anon,
        last_value(CASE WHEN NOT is_anon THEN uid END IGNORE NULLS)
            OVER w1 AS prev_uid,
        last_value(CASE WHEN NOT is_anon THEN hop_idx END IGNORE NULLS)
            OVER w1 AS prev_idx,
        first_value(CASE WHEN NOT is_anon THEN uid END IGNORE NULLS)
            OVER w2 AS next_uid,
        first_value(CASE WHEN NOT is_anon THEN hop_idx END IGNORE NULLS)
            OVER w2 AS next_idx
    FROM shape
    WINDOW w1 AS (PARTITION BY stream, path_id ORDER BY hop_idx
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
    w2 AS (PARTITION BY stream, path_id ORDER BY hop_idx
        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
),
anon_runs AS (
    SELECT uid, prev_uid, next_uid,
           next_idx - prev_idx - 1 AS run_len,
           hop_idx - prev_idx - 1 AS pos_in_run
    FROM marked
    WHERE is_anon AND prev_uid IS NOT NULL AND next_uid IS NOT NULL
),
grps AS (
    SELECT prev_uid, next_uid, run_len, pos_in_run,
           list_sort(list(DISTINCT uid)) AS members
    FROM anon_runs
    GROUP BY prev_uid, next_uid, run_len, pos_in_run
),
merge_map AS (
    SELECT unnest(members) AS uid,
           array_to_string(members, ';') AS merged_uid
    FROM grps WHERE len(members) > 1
)
"""


def merged_edges_oracle() -> str:
    """Mirror of graph.apply_merges(topology_edges, anonymous merges):
    endpoints relabel to their merged uid, self-loops drop, duplicate
    edges keep the newest lastSeen and sum n_seen."""
    return (
        "WITH RECURSIVE " + _BASE + "," + _EDGES + "," + _MERGE_MAP + """
, relabeled AS (
    SELECT coalesce(ms.merged_uid, e.src_uid) AS src_uid,
           coalesce(md.merged_uid, e.dst_uid) AS dst_uid,
           e.last_seen, e.n_seen
    FROM edges e
    LEFT JOIN merge_map ms ON ms.uid = e.src_uid
    LEFT JOIN merge_map md ON md.uid = e.dst_uid
)
SELECT src_uid, dst_uid, max(last_seen) AS last_seen,
       CAST(sum(n_seen) AS BIGINT) AS n_seen
FROM relabeled
WHERE src_uid != dst_uid
GROUP BY src_uid, dst_uid
"""
    )


def topo_group_links_oracle(
    groups_sql: str, stream_expr: str, max_distance: int, max_depth: int
) -> str:
    """Topological event-group linkage: event groups (``groups_sql``
    must yield a group_id column) are assigned to topology streams via
    the portable ``stream_expr`` and every ordered pair of distinct
    groups whose streams lie within ``max_distance`` (reference-quirk
    stream distance, see stream_distances_oracle) is linked."""
    return (
        "WITH RECURSIVE " + _BASE + "," + _EDGES + f"""
, sym AS (
    SELECT src_uid AS a, dst_uid AS b FROM edges
    UNION
    SELECT dst_uid, src_uid FROM edges
),
seeds AS (SELECT DISTINCT source AS root FROM meta),
walk AS (
    SELECT root, root AS node, 0 AS dist FROM seeds
    UNION
    SELECT w.root, s.b, w.dist + 1 FROM walk w JOIN sym s
        ON w.node = s.a WHERE w.dist < {max_depth}
),
bfs AS (SELECT root, node, min(dist) AS dist FROM walk
        GROUP BY root, node),
dists AS (
    SELECT a.stream AS stream_a, b.stream AS stream_b,
           CAST(d.dist + d.dist AS INT) AS distance
    FROM meta a
    JOIN meta b ON a.stream < b.stream
    LEFT JOIN bfs d ON d.root = a.source AND d.node = b.source
),
near AS (
    SELECT * FROM dists
    WHERE distance IS NOT NULL AND distance <= {max_distance}
),
nearsym AS (
    SELECT stream_a, stream_b, distance FROM near
    UNION ALL
    SELECT stream_b, stream_a, distance FROM near
),
egroups AS (
    SELECT group_id, CAST({stream_expr} AS INT) AS stream
    FROM ({groups_sql}) eg
),
links AS (
    SELECT a.group_id AS group_a, b.group_id AS group_b, n.distance
    FROM egroups a
    JOIN nearsym n ON n.stream_a = a.stream
    JOIN egroups b ON b.stream = n.stream_b
    WHERE a.group_id != b.group_id
)
SELECT group_a, CAST(count(*) AS BIGINT) AS n_linked,
       min(distance) AS min_distance
FROM links GROUP BY group_a
"""
    )


def graph_dot_oracle() -> str:
    """Mirror of graph.graph_dot — identical HSB→RGB arithmetic
    (java.awt.Color.getHSBColor in float64), ascending-ASN hue index."""
    h6 = (
        "(((0.8 * (CAST(asn_idx AS DOUBLE) / "
        "greatest((SELECT count(*) FROM asn_dim), 1)) + 0.1) % 1.0) * 6.0)"
    )
    f_ = f"({h6} - floor({h6}))"
    p = "(0.95 * (1.0 - 0.5))"
    q = f"(0.95 * (1.0 - 0.5 * {f_}))"
    t = f"(0.95 * (1.0 - 0.5 * (1.0 - {f_})))"
    v = "0.95"

    def _hex(x: str) -> str:
        return f"printf('%02X', CAST(floor({x} * 255.0 + 0.5) AS INT))"

    rgb = (
        f"CASE CAST(floor({h6}) AS INT) "
        f"WHEN 0 THEN concat({_hex(v)}, {_hex(t)}, {_hex(p)}) "
        f"WHEN 1 THEN concat({_hex(q)}, {_hex(v)}, {_hex(p)}) "
        f"WHEN 2 THEN concat({_hex(p)}, {_hex(v)}, {_hex(t)}) "
        f"WHEN 3 THEN concat({_hex(p)}, {_hex(q)}, {_hex(v)}) "
        f"WHEN 4 THEN concat({_hex(t)}, {_hex(p)}, {_hex(v)}) "
        f"ELSE concat({_hex(v)}, {_hex(p)}, {_hex(q)}) END"
    )
    return (
        "WITH RECURSIVE " + _BASE + "," + _VERTICES + "," + _EDGES + f"""
, asn_dim AS (
    SELECT asn, CAST(row_number() OVER (ORDER BY asn) - 1 AS BIGINT)
        AS asn_idx
    FROM (SELECT DISTINCT unnest(valid_asns) AS asn FROM vertices)
),
colored AS (
    SELECT v.*, d.asn_idx
    FROM vertices v
    LEFT JOIN asn_dim d ON d.asn =
        (CASE WHEN len(v.valid_asns) > 0 THEN v.valid_asns[1] END)
),
vlines AS (
    SELECT 'v' AS kind,
        concat('"', uid, '" [style=filled, shape=',
            CASE WHEN hostnames LIKE '%amp%' THEN 'box' ELSE 'oval' END,
            ', fillcolor="',
            CASE WHEN hostnames != '' THEN '#FF0000'
                 WHEN asn_idx IS NULL THEN '#FFFFFF'
                 ELSE concat('#', {rgb}) END,
            '"];') AS line
    FROM colored
),
elines AS (
    SELECT 'e' AS kind,
        concat('"', src_uid, '" -> "', dst_uid, '" [id="',
               epoch_us(last_seen), '"];') AS line
    FROM edges
)
SELECT * FROM vlines UNION ALL SELECT * FROM elines
"""
    )
