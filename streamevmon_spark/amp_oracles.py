"""DuckDB oracles for the AMP v1 ingest family (sources/amp.py).

Each oracle regenerates the expected typed output in closed form from
the SAME generating grammar as ``synth_amp_lines`` — no SQL string
parsing — so the gate checks parse(print(x)) == x across every
acceptance/rejection class: the 5 line-protocol measurement types, an
unknown-measurement class, missing-stream lines (required .get), a
malformed required int ('badi' -> toInt throws), an invalid DNS
boolean (Scala toBoolean throws), lossy rows (missing default field),
empty / None-holding / space-padded rtts arrays, zero-padded ints,
capitalized booleans, and the ns->ms timestamp truncation.

Reference semantics mirrored (see sources/amp.py docstring):
measurements/traits/InfluxMeasurementFactory.scala:104-189,225-268 and
each amp/* case class; the synthetic grammar is this repo's own.
"""

from __future__ import annotations

# acceptance predicate per line class:
#   - event_id % 41 = 0        -> stream tag missing  -> rejected (all)
#   - m in (0,3), % 53 = 0     -> median='badi'       -> rejected
#   - m = 1, % 37 = 0          -> flag_ra='maybe'     -> rejected
#   - m = 5                    -> unknown measurement -> rejected
_BASE = """
base AS (
    SELECT event_id,
           CAST(event_id % 6 AS INT) AS m,
           CAST(event_id % 500 AS VARCHAR) AS stream,
           event_id % 7 = 0 AS lossy,
           make_timestamp(event_id * 1000000 + 987000) AS time
    FROM events
    WHERE event_id % 41 != 0
      AND NOT (event_id % 6 IN (0, 3) AND event_id % 53 = 0)
      AND NOT (event_id % 6 = 1 AND event_id % 37 = 0)
      AND event_id % 6 != 5
)
"""

_MEAS = (
    "CASE m WHEN 0 THEN 'data_amp_icmp' WHEN 1 THEN 'data_amp_dns' "
    "WHEN 2 THEN 'data_amp_http' WHEN 3 THEN 'data_amp_tcpping' "
    "ELSE 'data_amp_traceroute_pathlen' END"
)

_SUBTYPE = (
    "CASE m WHEN 0 THEN 'icmp' WHEN 1 THEN 'dns' WHEN 2 THEN 'http' "
    "WHEN 3 THEN 'tcpping' ELSE 'pathlen' END"
)

# shared ICMP-like field closed forms (icmp m=0, tcpping m=3)
_MEDIAN = "CASE WHEN lossy THEN NULL ELSE event_id % 250 END"
_RTTS = (
    "CASE WHEN event_id % 11 = 0 THEN '' ELSE concat(event_id % 300, "
    "';', (event_id * 7) % 300, ';None;', (event_id * 13) % 300) END"
)

# per-type default_value / is_lossy for the one-pass summary
_DEFAULT = f"""
CASE m
 WHEN 0 THEN CAST({_MEDIAN} AS DOUBLE)
 WHEN 1 THEN CASE WHEN lossy THEN NULL
             ELSE CAST(event_id % 120000 AS DOUBLE) END
 WHEN 2 THEN CASE WHEN lossy THEN NULL
             ELSE CAST(1000 + event_id % 7000 AS DOUBLE) END
 WHEN 3 THEN CAST({_MEDIAN} AS DOUBLE)
 ELSE CASE WHEN event_id % 13 = 0 THEN NULL
      ELSE CAST(4 + event_id % 12 AS DOUBLE) END
END
"""

_IS_LOSSY = (
    "CASE m WHEN 4 THEN FALSE ELSE lossy END"
)


def amp_typed_oracle() -> str:
    return f"""
WITH {_BASE}
SELECT event_id AS line_id,
       {_MEAS} AS measurement,
       {_SUBTYPE} AS subtype,
       stream,
       time,
       {_DEFAULT} AS default_value,
       {_IS_LOSSY} AS is_lossy
FROM base
ORDER BY line_id
"""


def _icmp_like(table_m: int) -> str:
    """The shared (icmp/tcpping) typed column closed forms."""
    return f"""
SELECT event_id AS line_id,
       stream,
       CASE WHEN lossy THEN 2 ELSE 0 END AS loss,
       CAST(CASE WHEN lossy THEN 0.1 ELSE 0.0 END AS DOUBLE) AS lossrate,
       {_MEDIAN} AS median,
       84 + event_id % 9 AS packet_size,
       CASE WHEN lossy THEN 8 ELSE 10 END AS results,
       {_RTTS} AS rtts,
       time,
       CAST({_MEDIAN} AS DOUBLE) AS default_value,
       lossy AS is_lossy
FROM base WHERE m = {table_m}
"""


def amp_icmp_oracle() -> str:
    return f"""
WITH {_BASE}
SELECT line_id, 'icmp' AS subtype, stream, loss, lossrate, median,
       packet_size, results, rtts, time, default_value, is_lossy
FROM ({_icmp_like(0)})
ORDER BY line_id
"""


def amp_tcpping_oracle() -> str:
    return f"""
WITH {_BASE}
SELECT i.line_id, 'tcpping' AS subtype, i.stream,
       b.event_id % 2 AS icmperrors,
       i.loss, i.lossrate, i.median, i.packet_size, i.results,
       i.rtts, i.time, i.default_value, i.is_lossy
FROM ({_icmp_like(3)}) i JOIN base b ON i.line_id = b.event_id
ORDER BY i.line_id
"""


def amp_dns_oracle() -> str:
    return f"""
WITH {_BASE}
SELECT event_id AS line_id,
       'dns' AS subtype,
       stream,
       event_id % 2 = 0 AS flag_aa,
       CASE WHEN event_id % 3 = 0 THEN NULL ELSE FALSE END AS flag_ad,
       TRUE AS flag_cd,
       TRUE AS flag_qr,
       FALSE AS flag_ra,
       TRUE AS flag_rd,
       CASE WHEN event_id % 4 = 0 THEN NULL ELSE FALSE END AS flag_tc,
       CAST(CASE WHEN lossy THEN 1.0 ELSE 0.0 END AS DOUBLE) AS lossrate,
       event_id % 3 AS opcode,
       30 + event_id % 20 AS query_len,
       event_id % 4 AS rcode,
       1 AS requests,
       CASE WHEN lossy THEN NULL
            ELSE 120 + event_id % 64 END AS response_size,
       CASE WHEN lossy THEN NULL ELSE event_id % 120000 END AS rtt,
       1 AS total_additional,
       1 AS total_answer,
       0 AS total_authority,
       CASE WHEN event_id % 6 = 0 THEN NULL
            ELSE event_id % 3600 END AS ttl,
       time,
       CASE WHEN lossy THEN NULL
            ELSE CAST(event_id % 120000 AS DOUBLE) END AS default_value,
       lossy AS is_lossy
FROM base WHERE m = 1
ORDER BY line_id
"""


# the ICMP meta dim in closed form (mirrors synth_amp_meta('icmp'))
_ICMP_META = """
meta AS (
    SELECT CAST(range AS INT) AS mstream,
           concat('amphost-', range % 5) AS source,
           concat('ampdst-', range % 7) AS destination,
           CASE WHEN range % 2 = 0 THEN 'ipv4' ELSE 'ipv6' END AS family,
           CASE WHEN range % 3 = 0 THEN 'random' ELSE '84' END
               AS packet_size_selection
    FROM range(0, 500)
)
"""


def amp_rich_icmp_oracle() -> str:
    return f"""
WITH {_BASE}, {_ICMP_META}
SELECT i.line_id, 'icmp' AS subtype,
       CAST(m.mstream AS VARCHAR) AS stream,
       m.source, m.destination, m.family, m.packet_size_selection,
       i.loss, i.lossrate, i.median, i.packet_size, i.results,
       i.rtts, i.time, i.default_value, i.is_lossy
FROM ({_icmp_like(0)}) i
JOIN meta m ON CAST(i.stream AS INT) = m.mstream
ORDER BY i.line_id
"""


def amp_http_oracle() -> str:
    return f"""
WITH {_BASE}
SELECT event_id AS line_id,
       'http' AS subtype,
       stream,
       CASE WHEN lossy THEN NULL
            ELSE 1000 + event_id % 7000 END AS bytes,
       event_id % 2000 AS duration,
       8 AS object_count,
       1 + event_id % 3 AS server_count,
       time,
       CASE WHEN lossy THEN NULL
            ELSE CAST(1000 + event_id % 7000 AS DOUBLE) END
           AS default_value,
       lossy AS is_lossy
FROM base WHERE m = 2
ORDER BY line_id
"""


def amp_pathlen_oracle() -> str:
    return f"""
WITH {_BASE}
SELECT event_id AS line_id,
       'pathlen' AS subtype,
       stream,
       CASE WHEN event_id % 13 = 0 THEN NULL
            ELSE CAST(4 + event_id % 12 AS DOUBLE) END AS path_length,
       time,
       CASE WHEN event_id % 13 = 0 THEN NULL
            ELSE CAST(4 + event_id % 12 AS DOUBLE) END AS default_value,
       FALSE AS is_lossy
FROM base WHERE m = 4
ORDER BY line_id
"""
