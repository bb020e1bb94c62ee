"""DuckDB oracles for the amp2 ingest family (sources/amp2.py).

Each oracle regenerates the expected typed output in closed form from
the SAME generating grammar as ``synth_amp2_lines`` — no SQL string
parsing — so the gate checks parse(print(x)) == x across every
acceptance/rejection class: the 10 measurement families and 3 latency
subtypes, lossy rows (missing default field), rejected rows (missing
required tag when event_id % 41 = 0, invalid Direction when
event_id % 37 = 0 on throughput/udpstream), zero-padded long tags,
capitalized booleans, quoted string fields, and the ns->ms timestamp
truncation.

Reference semantics mirrored (see sources/amp2.py docstring):
measurements/amp2/Amp2Measurement.scala:55-113 and each family's case
class; the synthetic grammar is this repo's own.
"""

from __future__ import annotations

# Families whose create() must reject the line outright:
#   - event_id % 41 = 0 drops the first per-type tag -> required tag
#     missing -> None (every family declares at least one tag)
#   - 'sideways' direction (event_id % 37 = 0) is not a Direction ->
#     throw -> dropped, only for the two direction-tagged families
_BASE = """
base AS (
    SELECT event_id,
           CAST(event_id % 12 AS INT) AS m,
           concat('amp-', event_id % 7) AS src,
           concat('dst-', event_id % 5) AS dst,
           event_id % 5 = 0 AS lossy,
           CASE WHEN event_id % 3 = 0 THEN 'false' ELSE 'true' END AS rnd,
           CASE WHEN event_id % 2 = 0 THEN 'in' ELSE 'out' END AS dir,
           make_timestamp(event_id * 1000000 + 123000) AS time
    FROM events
    WHERE event_id % 41 != 0
      AND NOT (event_id % 12 IN (8, 10) AND event_id % 37 = 0)
)
"""

_MEAS = (
    "CASE WHEN m IN (3, 4, 5) THEN 'latency' ELSE CASE m "
    "WHEN 0 THEN 'external' WHEN 1 THEN 'fastping' WHEN 2 THEN 'http' "
    "WHEN 6 THEN 'pathlen' WHEN 7 THEN 'sip' WHEN 8 THEN 'throughput' "
    "WHEN 9 THEN 'traceroute' WHEN 10 THEN 'udpstream' "
    "ELSE 'video' END END"
)

_SUBTYPE = (
    "CASE m WHEN 3 THEN 'latency-dns' WHEN 4 THEN 'latency-icmp' "
    f"WHEN 5 THEN 'latency-tcpping' ELSE {_MEAS} END"
)

_TEST = (
    "CASE m WHEN 0 THEN 'external' WHEN 1 THEN 'fastping' "
    "WHEN 2 THEN 'http' WHEN 3 THEN 'dns' WHEN 4 THEN 'icmp' "
    "WHEN 5 THEN 'tcpping' WHEN 6 THEN 'traceroute' WHEN 7 THEN 'sip' "
    "WHEN 8 THEN 'throughput' WHEN 9 THEN 'traceroute' "
    "WHEN 10 THEN 'udpstream' ELSE 'youtube' END"
)

# the per-family tag segment of the stream key, in each case class's
# declared tag order, '--'-joined; long tags in decimal (hop=03 -> '3'),
# booleans lowercase, Direction lowercase in/out
_TAG_SEG = """
CASE m
 WHEN 0 THEN concat('cmd', event_id % 4)
 WHEN 1 THEN concat('Default--ipv4--60--', event_id % 8, '--64')
 WHEN 2 THEN 'False'
 WHEN 3 THEN concat('Default--ipv6--q', event_id % 5, '.example.com')
 WHEN 4 THEN concat('Default--ipv4--', event_id % 9 + 84, '--', rnd)
 WHEN 5 THEN concat('Default--ipv4--84--', 443 + event_id % 2, '--', rnd)
 WHEN 6 THEN concat('Default--ipv4--60--', rnd)
 WHEN 7 THEN concat('Default--ipv4--user', event_id % 3, '@example.com')
 WHEN 8 THEN concat(dir, '--Default--ipv4--default--131072')
 WHEN 9 THEN concat('Default--ipv6--', event_id % 9 + 1, '--60--', rnd)
 WHEN 10 THEN concat(dir, '--Default--ipv4--21--100--20000')
 ELSE CAST(event_id % 3 AS VARCHAR)
END
"""

_DEFAULT_RAW = """
CASE m
 WHEN 0 THEN event_id % 100
 WHEN 1 THEN event_id % 90
 WHEN 2 THEN event_id % 7000
 WHEN 3 THEN event_id % 120000
 WHEN 4 THEN event_id % 30000
 WHEN 5 THEN event_id % 25000
 WHEN 6 THEN event_id % 12 + 4
 WHEN 7 THEN event_id % 400
 WHEN 8 THEN event_id % 9999
 WHEN 9 THEN event_id % 50000
 WHEN 10 THEN event_id % 200
 ELSE event_id % 10000
END
"""


def amp2_typed_oracle() -> str:
    """Expected ``amp2_typed`` over ``synth_amp2_lines``: one row per
    accepted line with the createFromLineProtocol summary columns."""
    return f"""
WITH {_BASE}
SELECT event_id AS line_id,
       {_MEAS} AS measurement,
       {_SUBTYPE} AS subtype,
       concat_ws('--', {_MEAS}, src, dst, {_TEST}, {_TAG_SEG}) AS stream,
       time,
       CASE WHEN lossy THEN NULL
            ELSE CAST(({_DEFAULT_RAW}) AS DOUBLE) END AS default_value,
       lossy AS is_lossy
FROM base
"""


def amp2_throughput_oracle() -> str:
    """Expected full Throughput family table (all tags + fields typed,
    quoted-string duration stripped, runtime double, Direction
    validated)."""
    return f"""
WITH {_BASE}
SELECT event_id AS line_id,
       'throughput' AS subtype,
       src AS source, dst AS destination, 'throughput' AS test,
       time,
       concat_ws('--', 'throughput', src, dst, 'throughput',
                 dir, 'Default--ipv4--default--131072') AS stream,
       dir AS direction,
       'Default' AS dscp, 'ipv4' AS family, 'default' AS protocol,
       CAST(131072 AS BIGINT) AS write_size,
       CASE WHEN lossy THEN NULL
            ELSE CAST(event_id % 9999 AS BIGINT) END AS bytes,
       CAST(1 AS BIGINT) AS count,
       '10000' AS duration,
       CAST(event_id % 50 + 9000 AS DOUBLE) + 0.5 AS runtime,
       CASE WHEN lossy THEN NULL
            ELSE CAST(event_id % 9999 AS DOUBLE) END AS default_value,
       lossy AS is_lossy
FROM base WHERE m = 8
"""


def amp2_latency_oracle() -> str:
    """Expected Latency union table (dns + icmp + tcpping column union;
    subtype-specific tags/fields NULL where not applicable — reference
    Amp2Measurement.getColumnNames for the latency supertype)."""
    return f"""
WITH {_BASE}
SELECT event_id AS line_id,
       {_SUBTYPE} AS subtype,
       src AS source, dst AS destination, {_TEST} AS test,
       time,
       concat_ws('--', 'latency', src, dst, {_TEST}, {_TAG_SEG})
           AS stream,
       'Default' AS dscp,
       CASE WHEN m = 3 THEN 'ipv6' ELSE 'ipv4' END AS family,
       CASE WHEN m = 3
            THEN concat('q', event_id % 5, '.example.com') END AS query,
       CAST(CASE WHEN m = 4 THEN event_id % 9 + 84
                 WHEN m = 5 THEN 84 END AS BIGINT) AS packet_size,
       CAST(CASE WHEN m = 5 THEN 443 + event_id % 2 END AS BIGINT)
           AS port,
       CASE WHEN m = 3 THEN NULL ELSE event_id % 3 != 0 END AS random,
       CAST(1 AS BIGINT) AS count,
       CAST(CASE WHEN m = 4 THEN 0 END AS BIGINT) AS error_code,
       CAST(CASE WHEN m = 4 THEN 0 END AS BIGINT) AS error_type,
       CAST(CASE WHEN m = 5 THEN 1 END AS BIGINT) AS icmpcode,
       CAST(CASE WHEN m = 5 THEN 3 END AS BIGINT) AS icmptype,
       CAST(CASE WHEN m IN (3, 4) THEN 0 END AS BIGINT) AS loss,
       CASE WHEN lossy THEN NULL
            ELSE CAST(({_DEFAULT_RAW}) AS BIGINT) END AS rtt,
       CASE WHEN lossy THEN NULL
            ELSE CAST(({_DEFAULT_RAW}) AS DOUBLE) END AS default_value,
       lossy AS is_lossy
FROM base WHERE m IN (3, 4, 5)
"""
