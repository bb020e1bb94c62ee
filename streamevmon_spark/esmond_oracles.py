"""DuckDB oracles for the esmond typed-measurement family
(sources/esmond.py).

Each oracle regenerates the expected typed output in closed form from
the SAME generating grammar as ``synth_esmond_entries`` — no JSON
parsing in SQL — so the gate checks parse(print(x)) == x across every
entry class: the 6 concrete measurement types (Simple / Histogram /
Subinterval / PacketTrace / Href / Failure), empty subinterval/trace
arrays, maps missing their payload key (Option -> None), and the
unknown event type ('histogram-rtt') the dispatch must drop whole.

Reference semantics mirrored (see sources/esmond.py docstring):
measurements/esmond/EsmondMeasurement.scala:37-66 and
connectors/esmond/ResponseType.scala:43-67; the synthetic grammar is
this repo's own.

All doubles in the grammar are quarter-integers, so every per-entry
fold (histogram count sum, subinterval val sum, trace rtt sum) is
exact in binary floating point in both engines regardless of fold
order.
"""

from __future__ import annotations

_ETYPE = (
    "CASE event_id % 12 WHEN 0 THEN 'failures' "
    "WHEN 1 THEN 'histogram-owdelay' WHEN 2 THEN 'histogram-ttl' "
    "WHEN 3 THEN 'pscheduler-run-href' WHEN 4 THEN 'packet-trace' "
    "WHEN 5 THEN 'throughput' WHEN 6 THEN 'packet-loss-rate' "
    "WHEN 7 THEN 'packet-count-sent' "
    "WHEN 8 THEN 'time-error-estimates' "
    "WHEN 9 THEN 'throughput-subintervals' "
    "WHEN 10 THEN 'packet-retransmits-subintervals' "
    "ELSE 'histogram-rtt' END"
)

# event_id % 12 = 11 is the unknown event type: ResponseType.fromString
# throws in the reference, so the typed relations never see it.
_BASE = f"""
base AS (
    SELECT event_id,
           CAST(event_id % 12 AS INT) AS m,
           {_ETYPE} AS etype,
           md5(CAST(event_id % 23 AS VARCHAR)) AS meta_key,
           event_id * 30 + 1500000000 AS ts_s
    FROM events
    WHERE event_id % 12 != 11
)
"""

_SUBTYPE = (
    "CASE WHEN m = 0 THEN 'failure' WHEN m IN (1, 2) THEN 'histogram' "
    "WHEN m = 3 THEN 'href' WHEN m = 4 THEN 'packet_trace' "
    "WHEN m IN (5, 6, 7, 8) THEN 'simple' ELSE 'subinterval' END"
)

# Simple's value per arm of the grammar (quarter-integers except the
# integer-string arm m=7); NULL for every other class.
_SIMPLE = (
    "CASE WHEN m = 5 THEN (event_id % 4000) / 4.0 "
    "WHEN m = 6 THEN (event_id % 4) / 4.0 "
    "WHEN m = 7 THEN CAST(event_id % 600 AS DOUBLE) "
    "WHEN m = 8 THEN (event_id % 40) / 4.0 END"
)

# histogram buckets: j in 0..event_id%3, key 40 + (j + event_id%2)*0.5,
# count 1 + (event_id + j) % 5 — keys are distinct per entry, so the
# JSON map has exactly event_id%3 + 1 buckets.
_HIST_SUM = (
    "list_sum(list_transform(range(0, event_id % 3 + 1), "
    "j -> 1 + (event_id + j) % 5))"
)

_SUBI_SUM = (
    "list_sum(list_transform(range(0, event_id % 4 + 1), "
    "j -> ((event_id * 3 + j) % 2000) / 4.0))"
)

# trace hops: j in 1..1+event_id%5; rtt absent when (event_id+j)%3 = 0
# (coalesced to 0 by the engine's fold)
_TRACE_SUM = (
    "list_sum(list_transform(range(1, event_id % 5 + 2), "
    "j -> CASE WHEN (event_id + j) % 3 = 0 THEN 0.0 "
    "ELSE ((event_id * 5 + j * 7) % 800) / 4.0 END))"
)


def esmond_typed_oracle() -> str:
    """Expected ``esmond_typed`` over ``synth_esmond_entries``: one row
    per accepted entry with the EsmondMeasurement.apply summary."""
    return f"""
WITH {_BASE}
SELECT event_id AS entry_id,
       concat('/esmond/perfsonar/archive/', meta_key, '/', etype,
              '/base') AS stream,
       meta_key AS metadata_key,
       etype AS event_type,
       {_SUBTYPE} AS subtype,
       make_timestamp(ts_s * 1000000) AS time,
       CAST({_SIMPLE} AS DOUBLE) AS simple_value,
       CAST({_SIMPLE} AS DOUBLE) AS default_value,
       CASE WHEN m IN (1, 2)
            THEN CAST(event_id % 3 + 1 AS INT) END AS hist_n_buckets,
       CASE WHEN m IN (1, 2)
            THEN CAST({_HIST_SUM} AS BIGINT) END AS hist_count_sum,
       CASE WHEN m IN (9, 10) THEN CAST(
            CASE WHEN event_id % 7 = 0 THEN 0
                 ELSE event_id % 4 + 1 END AS INT) END
         AS n_subintervals,
       CASE WHEN m IN (9, 10) THEN CAST(
            CASE WHEN event_id % 7 = 0 THEN 0.0
                 ELSE {_SUBI_SUM} END AS DOUBLE) END
         AS subinterval_val_sum,
       CASE WHEN m = 4 THEN CAST(
            CASE WHEN event_id % 7 = 0 THEN 0
                 ELSE event_id % 5 + 1 END AS INT) END AS n_hops,
       CASE WHEN m = 4 THEN CAST(
            CASE WHEN event_id % 7 = 0 THEN 0.0
                 ELSE {_TRACE_SUM} END AS DOUBLE) END AS trace_rtt_sum,
       CASE WHEN m = 3 AND event_id % 11 != 0 THEN
            concat('https://ps.example.org/pscheduler/runs/',
                   event_id % 97) END AS href_location,
       CASE WHEN m = 0 AND event_id % 11 != 0 THEN
            concat('Run failed: code ', event_id % 13) END
         AS failure_text,
       FALSE AS is_lossy
FROM base
"""


def esmond_histogram_oracle() -> str:
    """Expected ``esmond_histogram_merged``: per-(stream, bucket) count
    sums over the two histogram event types (histogram-rtt, the unknown
    type, never reaches the typed layer)."""
    return f"""
WITH {_BASE},
ex AS (
    SELECT concat('/esmond/perfsonar/archive/', meta_key, '/', etype,
                  '/base') AS stream,
           unnest(list_transform(range(0, event_id % 3 + 1), j -> {{
               'bucket': CAST(40 + (j + event_id % 2) * 0.5 AS DOUBLE),
               'n': 1 + (event_id + j) % 5}})) AS e
    FROM base
    WHERE m IN (1, 2)
)
SELECT stream,
       e.bucket AS bucket,
       CAST(sum(e.n) AS BIGINT) AS bucket_count
FROM ex
GROUP BY stream, e.bucket
"""
