"""DuckDB oracle SQL for the ITDK lookup family (operators/itdk.py).

Each oracle regenerates the synthetic ITDK text files as lines from the
shared hops CTE (graph_oracles._BASE) and RE-PARSES them with SQL string
ops mirroring the Spark parsers — so the parse expressions themselves
are cross-engine hash-checked, not just the downstream joins."""

from __future__ import annotations

from streamevmon_spark.graph_oracles import _BASE, _EDGES

# synthetic node assignment (mirror of itdk._NODE_OF_ADDRESS; DuckDB
# lists are 1-based where Spark arrays are 0-based)
_SYNTH = """
synthnodes AS (
    SELECT node_id, address FROM (
        SELECT address,
            CASE WHEN string_split(address, '.')[2] = '1'
                 THEN 100 + CAST(string_split(address, '.')[3] AS INT)
                 WHEN string_split(address, '.')[2] = '0'
                 THEN 200 + CAST(string_split(address, '.')[3] AS INT) % 6
            END AS node_id
        FROM (SELECT DISTINCT address FROM hops
              WHERE address IS NOT NULL)
    ) WHERE node_id IS NOT NULL
),
node_lines AS (
    SELECT concat('node N', node_id, ':  ', ips) AS value
    FROM (SELECT node_id,
                 array_to_string(list_sort(list(DISTINCT address)), ' ')
                     AS ips
          FROM synthnodes GROUP BY node_id)
),
as_lines AS (
    SELECT concat('node.AS N', node_id, ' ', 64600 + node_id % 10, ' ',
        CASE WHEN node_id % 11 = 5 THEN 'first_hop'
             WHEN node_id % 3 = 0 THEN 'interfaces'
             WHEN node_id % 3 = 1 THEN 'refinement'
             ELSE 'last_hop' END) AS value
    FROM (SELECT DISTINCT node_id FROM synthnodes WHERE node_id % 7 != 3)
),
geo_lines AS (
    SELECT concat('node.geo N', node_id, ':', chr(9),
        ['NA','SA','OC'][node_id % 3 + 1], chr(9),
        ['US','UY','NZ','AU'][node_id % 4 + 1], chr(9),
        CASE WHEN node_id % 3 = 0 THEN ''
             ELSE concat('region-', node_id % 5) END, chr(9),
        concat('city-', node_id), chr(9),
        CAST(node_id % 180 - 90 + 0.5 AS VARCHAR), chr(9),
        CAST((node_id * 7) % 360 - 180 + 0.25 AS VARCHAR), chr(9),
        CAST(1000 + node_id AS VARCHAR), chr(9), chr(9), 'ddec') AS value
    FROM (SELECT DISTINCT node_id FROM synthnodes WHERE node_id % 4 != 3)
),
parsed_nodes AS (
    SELECT node_id, address FROM (
        SELECT CAST(substr(string_split(value, ':  ')[1], 7) AS INT)
                   AS node_id,
               unnest(string_split(string_split(value, ':  ')[2], ' '))
                   AS address
        FROM node_lines
        WHERE value NOT LIKE '#%' AND value LIKE 'node N%'
    ) WHERE address != ''
),
parsed_as AS (
    SELECT CAST(substr(p[2], 2) AS INT) AS node_id,
           CAST(p[3] AS INT) AS asn,
           CASE WHEN len(p) > 3 AND
                     p[4] IN ('interfaces','refinement','last_hop')
                THEN p[4] END AS method
    FROM (SELECT string_split(value, ' ') AS p FROM as_lines
          WHERE value LIKE 'node.AS N%')
),
parsed_geo AS (
    SELECT CAST(substr(p[1], 11, len(p[1]) - 11) AS INT) AS node_id,
           CASE WHEN trim(p[2]) = '' THEN NULL ELSE p[2] END AS continent,
           CASE WHEN trim(p[3]) = '' THEN NULL ELSE p[3] END AS country,
           CASE WHEN trim(p[4]) = '' THEN NULL ELSE p[4] END AS region,
           CASE WHEN trim(p[5]) = '' THEN NULL ELSE p[5] END AS city,
           CAST(p[6] AS FLOAT) AS latitude,
           CAST(p[7] AS FLOAT) AS longitude
    FROM (SELECT string_split(value, chr(9)) AS p FROM geo_lines
          WHERE value LIKE 'node.geo N%')
    WHERE len(p) = 10
),
inverted AS (
    SELECT n.address, n.node_id, coalesce(a.asn, 0) AS asn
    FROM parsed_nodes n
    LEFT JOIN (SELECT node_id, min(asn) AS asn FROM parsed_as
               GROUP BY node_id) a USING (node_id)
)
"""

_MAPPING = """
mapping AS (
    SELECT h.uid, min(i.node_id) AS node_id
    FROM (SELECT DISTINCT uid, address FROM hops
          WHERE address IS NOT NULL) h
    JOIN inverted i USING (address)
    GROUP BY h.uid
)
"""


def lookup_oracle() -> str:
    return (
        "WITH RECURSIVE " + _BASE + "," + _SYNTH + """
SELECT a.address, i.node_id, i.asn
FROM (SELECT DISTINCT address FROM hops WHERE address IS NOT NULL) a
LEFT JOIN inverted i USING (address)
"""
    )


def as_geo_oracle() -> str:
    return (
        "WITH RECURSIVE " + _BASE + "," + _SYNTH + """
SELECT n.node_id, a.asn, a.method, g.continent, g.country, g.region,
       g.city, g.latitude, g.longitude
FROM (SELECT DISTINCT node_id FROM inverted) n
LEFT JOIN (SELECT node_id, asn, method FROM parsed_as
           WHERE method IS NOT NULL) a USING (node_id)
LEFT JOIN parsed_geo g USING (node_id)
"""
    )


def vertices_oracle() -> str:
    return (
        "WITH RECURSIVE " + _BASE + "," + _SYNTH + "," + _MAPPING + """
, relabeled AS (
    SELECT h.*, m.node_id,
           CASE WHEN m.node_id IS NOT NULL
                THEN concat('N', m.node_id) ELSE h.uid END AS new_uid
    FROM hops h LEFT JOIN mapping m ON h.uid = m.uid
),
agg AS (
    SELECT new_uid AS uid,
        coalesce(array_to_string(list_sort(list(DISTINCT hostname)
            FILTER (WHERE hostname IS NOT NULL)), ';'), '')
            AS hostnames,
        coalesce(array_to_string(list_sort(list(DISTINCT
            CASE WHEN address IS NOT NULL
                 THEN concat(address, ' (', asn_str, ')') END)
            FILTER (WHERE address IS NOT NULL)), ';'), '')
            AS addresses,
        coalesce(array_to_string(list_sort(list(DISTINCT
            CASE WHEN asn > 0 THEN asn END)
            FILTER (WHERE asn > 0)), ';'), '') AS valid_asns,
        CAST(count(*) AS BIGINT) AS n_seen,
        max(ts) AS last_seen,
        max(node_id) AS itdk_node_id
    FROM relabeled GROUP BY new_uid
)
SELECT a.uid, a.hostnames, a.addresses, a.valid_asns, a.n_seen,
       a.last_seen, a.itdk_node_id,
       (a.hostnames = '' AND a.addresses = '') AS is_anonymous,
       na.itdk_asn
FROM agg a
LEFT JOIN (SELECT DISTINCT node_id, asn AS itdk_asn FROM inverted) na
    ON a.itdk_node_id = na.node_id
"""
    )


def merged_edges_oracle() -> str:
    return (
        "WITH RECURSIVE " + _BASE + "," + _EDGES + "," + _SYNTH + ","
        + _MAPPING + """
, relabeled AS (
    SELECT CASE WHEN ms.node_id IS NOT NULL
                THEN concat('N', ms.node_id) ELSE e.src_uid END AS src_uid,
           CASE WHEN md.node_id IS NOT NULL
                THEN concat('N', md.node_id) ELSE e.dst_uid END AS dst_uid,
           e.last_seen, e.n_seen
    FROM edges e
    LEFT JOIN mapping ms ON e.src_uid = ms.uid
    LEFT JOIN mapping md ON e.dst_uid = md.uid
)
SELECT src_uid, dst_uid, max(last_seen) AS last_seen,
       CAST(sum(n_seen) AS BIGINT) AS n_seen
FROM relabeled WHERE src_uid != dst_uid
GROUP BY src_uid, dst_uid
"""
    )
