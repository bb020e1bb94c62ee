"""DuckDB oracles for the libtrace-bigdata Flow family
(sources/flow.py).

Each oracle regenerates the expected typed output in closed form from
the SAME generating grammar as ``synth_flow_lines`` — no line-protocol
parsing in SQL — so the gate checks parse(print(x)) == x across every
class: the 3 FlowTypes, the invalid-FlowType and foreign-measurement
rejection classes (dropped whole), Option end_ts / per-side Option
geolocation blocks, quoted strings containing spaces (quote-parity
split coverage), the raw-geohash quirk (quotes preserved) and the
src-unsuffixed / dst-'i'-suffixed geohash_value asymmetry
(Flow.scala:219-229).

All doubles are quarter-integers, so sums in the rollup are exact in
both engines regardless of fold order.
"""

from __future__ import annotations


def _qnum(q: str) -> str:
    """The quarter-integer double value q/4 (exact in both engines)."""
    return f"(({q}) / 4.0)"


# fid = flow id; rejection classes: invalid FlowType (29), foreign
# measurement (31)
_BASE = """
base AS (
    SELECT event_id,
           event_id // 3 AS fid,
           CASE event_id % 3 WHEN 0 THEN 'flow_start'
                WHEN 1 THEN 'flow_interval' ELSE 'flow_end' END AS ftype
    FROM events
    WHERE event_id % 29 != 0 AND event_id % 31 != 0
)
"""

_SRC_GEO = "fid % 5 != 0"
_DST_GEO = "fid % 7 != 0"


def flow_typed_oracle() -> str:
    """Expected ``flow_typed`` over ``synth_flow_lines``."""
    return f"""
WITH {_BASE}
SELECT event_id AS line_id,
       'libtrace-bigdata' AS capture_application,
       concat('cap-', fid % 4) AS capture_host,
       CAST(fid AS VARCHAR) AS stream,
       ftype AS flow_type,
       concat('cat', fid % 6) AS category,
       CASE fid % 3 WHEN 0 THEN 'tcp' WHEN 1 THEN 'udp'
            ELSE 'icmp' END AS protocol,
       make_timestamp((1622329200000 + event_id * 10) * 1000) AS time,
       make_timestamp((1622329200000 + fid * 1000) * 1000)
         AS start_time,
       CASE WHEN event_id % 3 = 2 THEN make_timestamp(
            (1622329200000 + fid * 1000 + event_id % 90000) * 1000)
       END AS end_time,
       CAST({_qnum('event_id % 4800')} AS DOUBLE) AS duration,
       CAST(event_id % 100000 AS INT) AS in_bytes,
       CAST((event_id * 7) % 100000 AS INT) AS out_bytes,
       CAST({_qnum('event_id % 2000')} AS DOUBLE)
         AS time_to_first_byte,
       concat('10.', fid % 32, '.', fid % 250, '.', event_id % 250)
         AS source_ip,
       CAST(1024 + event_id % 60000 AS INT) AS source_port,
       CASE WHEN {_SRC_GEO} THEN concat('City ', fid % 9) END
         AS source_ip_city,
       CASE WHEN {_SRC_GEO} THEN concat('NZ', fid % 5) END
         AS source_ip_country,
       CASE WHEN {_SRC_GEO} THEN concat('"gh', fid % 50, '"') END
         AS source_ip_geohash,
       CASE WHEN {_SRC_GEO} THEN CAST(fid % 1000 AS INT) END
         AS source_ip_geohash_value,
       CASE WHEN {_SRC_GEO} THEN
            CAST({_qnum('fid % 360')} AS DOUBLE) END
         AS source_ip_latitude,
       CASE WHEN {_SRC_GEO} THEN
            CAST({_qnum('event_id % 1440')} AS DOUBLE) END
         AS source_ip_longitude,
       concat('192.168.', fid % 250, '.', event_id % 200)
         AS destination_ip,
       CAST(1024 + (event_id * 3) % 60000 AS INT) AS destination_port,
       CASE WHEN {_DST_GEO} THEN concat('Town ', fid % 11) END
         AS destination_ip_city,
       CASE WHEN {_DST_GEO} THEN concat('AU', fid % 6) END
         AS destination_ip_country,
       CASE WHEN {_DST_GEO} THEN concat('"dh', fid % 40, '"') END
         AS destination_ip_geohash,
       CASE WHEN {_DST_GEO} THEN CAST((fid * 3) % 1000 AS INT) END
         AS destination_ip_geohash_value,
       CASE WHEN {_DST_GEO} THEN
            CAST({_qnum('fid % 300')} AS DOUBLE) END
         AS destination_ip_latitude,
       CASE WHEN {_DST_GEO} THEN
            CAST({_qnum('(event_id * 5) % 1400')} AS DOUBLE) END
         AS destination_ip_longitude,
       CAST({_qnum('event_id % 2000')} AS DOUBLE) AS default_value,
       FALSE AS is_lossy,
       {_SRC_GEO} AS includes_geolocation
FROM base
"""


def flow_rollup_oracle() -> str:
    """Expected ``flow_rollup`` over the typed relation: the same
    per-(capture_host, category, protocol) aggregates in closed form
    (completed-flow byte totals, start-record ttfb sums, counts)."""
    return f"""
WITH {_BASE}
SELECT concat('cap-', fid % 4) AS capture_host,
       concat('cat', fid % 6) AS category,
       CASE fid % 3 WHEN 0 THEN 'tcp' WHEN 1 THEN 'udp'
            ELSE 'icmp' END AS protocol,
       CAST(count(*) AS BIGINT) AS n_records,
       CAST(count(DISTINCT fid) AS BIGINT) AS n_flows,
       CAST(count(*) FILTER (WHERE ftype = 'flow_end') AS BIGINT)
         AS n_ended,
       CAST(sum(CASE WHEN ftype = 'flow_end'
                THEN event_id % 100000 END) AS BIGINT)
         AS in_bytes_total,
       CAST(sum(CASE WHEN ftype = 'flow_end'
                THEN (event_id * 7) % 100000 END) AS BIGINT)
         AS out_bytes_total,
       CAST(sum(CASE WHEN ftype = 'flow_start'
                THEN {_qnum('event_id % 2000')} END) AS DOUBLE)
         AS ttfb_sum,
       CAST(max({_qnum('event_id % 4800')}) AS DOUBLE) AS duration_max
FROM base
GROUP BY 1, 2, 3
"""
