"""DuckDB oracle SQL builders.

Every relational operator the engine claims is paired with an ANSI-SQL
oracle that DuckDB runs on the same parquet inputs. The transcripts
derivation is shared verbatim (dialect-intersection SQL), so the oracle
checks the full pipeline: raw events → transcripts → operator output.

Determinism contract shared with operators/rollup.py: integer-microsecond
aggregation, epoch-bucket windows, explicitly spelled-out percentile
interpolation — so both engines evaluate the same IEEE operations on the
same exact integers and produce bit-identical doubles.

Column names here MUST match the Spark DataFrames' aliases exactly — the
driver sorts columns by name before value-hashing.
"""

from __future__ import annotations

from streamevmon_spark.data.transcripts import TRANSCRIPTS_SQL
from streamevmon_spark.operators.rollup import TIERS


def with_transcripts(body: str, events_relation: str = "events") -> str:
    """Wrap ``body`` so it can reference a ``transcripts`` relation built
    from the raw events view — identical rows to
    ``data.transcripts.load_transcripts``."""
    inner = TRANSCRIPTS_SQL.format(events=events_relation)
    return f"WITH transcripts AS ({inner})\n{body}"


def transcripts_oracle() -> str:
    return with_transcripts(
        "SELECT conv_id, turn_idx, role, text, tool, ts, value FROM transcripts"
    )


# lat_us: integer microseconds since the previous turn of the same series.
_LAT_CTE = """
lat AS (
    SELECT conv_id, tool, role, ts, turn_idx, value,
        epoch_us(ts) - lag(epoch_us(ts)) OVER (
            PARTITION BY conv_id, tool, role ORDER BY ts, turn_idx
        ) AS lat_us
    FROM transcripts
)
"""


def _pct_from_sorted(arr: str, p: float) -> str:
    """Mirror of rollup._pct_from_sorted in DuckDB syntax (1-based list
    indexing) — same formula, same operand order."""
    idx = f"({p} * (len({arr}) - 1))"
    lo = f"CAST({arr}[CAST(floor({idx}) AS INT) + 1] AS DOUBLE)"
    hi = (
        f"CAST({arr}[least(CAST(floor({idx}) AS INT) + 2, len({arr}))]"
        " AS DOUBLE)"
    )
    return (
        f"CASE WHEN {arr} IS NULL OR len({arr}) = 0 THEN CAST(NULL AS DOUBLE) "
        f"ELSE ({lo} + ({hi} - {lo}) * ({idx} - floor({idx}))) / 1e6 END"
    )


def rollup_oracle(tier: str) -> str:
    secs = TIERS[tier]
    win_us = secs * 1_000_000
    p50 = _pct_from_sorted("lat_arr", 0.5)
    p95 = _pct_from_sorted("lat_arr", 0.95)
    p99 = _pct_from_sorted("lat_arr", 0.99)
    body = f"""
, {_LAT_CTE}
, grouped AS (
    SELECT
        conv_id, tool, role,
        (epoch_us(ts) // {win_us}) * {win_us} AS w_us,
        count(*) AS turn_count,
        CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS lossy_count,
        CAST(sum(lat_us) AS BIGINT) AS lat_sum,
        count(lat_us) AS lat_cnt,
        min(lat_us) AS lat_min_us,
        max(lat_us) AS lat_max_us,
        list_sort(list(lat_us) FILTER (WHERE lat_us IS NOT NULL)) AS lat_arr,
        CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT) AS val_sum,
        count(value) AS val_cnt
    FROM lat
    GROUP BY conv_id, tool, role, (epoch_us(ts) // {win_us}) * {win_us}
)
SELECT
    conv_id, tool, role,
    make_timestamp(w_us) AS window_start,
    make_timestamp(w_us + {win_us}) AS window_end,
    turn_count,
    lossy_count,
    CAST(lat_sum AS DOUBLE) / CAST(lat_cnt AS DOUBLE) / 1e6 AS lat_avg,
    CAST(lat_min_us AS DOUBLE) / 1e6 AS lat_min,
    CAST(lat_max_us AS DOUBLE) / 1e6 AS lat_max,
    {p50} AS lat_p50,
    {p95} AS lat_p95,
    {p99} AS lat_p99,
    CAST(val_sum AS DOUBLE) / CAST(val_cnt AS DOUBLE) / 1e6 AS val_avg,
    CAST(turn_count AS DOUBLE) / {float(secs)} AS activity_rate
FROM grouped
"""
    return with_transcripts(body)


def sketch_exact_stats_oracle(tier: str) -> str:
    """Raw-side twin of sketch_rollup.sketch_exact_stats over the
    incrementally maintained sketch tier: a t-digest's total weight and
    min/max are exact, so this projection is hash-checkable even though
    the centroids are approximate. min/max cast to DOUBLE (exact at
    these magnitudes) for one cross-engine NULL dtype."""
    win_us = TIERS[tier] * 1_000_000
    body = f"""
, {_LAT_CTE}
SELECT conv_id, tool, role,
    make_timestamp((epoch_us(ts) // {win_us}) * {win_us}) AS window_start,
    count(lat_us) AS lat_count,
    CAST(min(lat_us) AS DOUBLE) AS lat_min_us,
    CAST(max(lat_us) AS DOUBLE) AS lat_max_us
FROM lat
GROUP BY conv_id, tool, role, (epoch_us(ts) // {win_us}) * {win_us}
"""
    return with_transcripts(body)


def gapfill_oracle(
    tier: str, method: str, purge_gap_s: int = 600
) -> str:
    """Oracle mirror of operators/gapfill.gap_fill — same integer-µs grid,
    same RANGE-frame LOCF/interp, same spelled-out interpolation."""
    step_us = TIERS[tier] * 1_000_000
    purge_us = purge_gap_s * 1_000_000
    if method == "locf":
        filled = (
            f"CASE WHEN t0 IS NOT NULL AND ts_us - t0 <= {purge_us} "
            "THEN v0 END"
        )
    else:
        filled = (
            f"CASE WHEN t0 IS NOT NULL AND t1 IS NOT NULL "
            f"AND t1 - t0 <= {purge_us} THEN "
            "CASE WHEN t1 = t0 THEN v0 "
            "ELSE v0 + (v1 - v0) * (CAST(ts_us - t0 AS DOUBLE) "
            "/ CAST(t1 - t0 AS DOUBLE)) END END"
        )
    body = f"""
, obs AS (
    SELECT conv_id, tool, role, epoch_us(ts) AS ts_us,
           arg_max(value, turn_idx) AS value
    FROM transcripts WHERE value IS NOT NULL
    GROUP BY conv_id, tool, role, epoch_us(ts)
),
bounds AS (
    SELECT conv_id, tool, role,
           (min(ts_us) // {step_us}) * {step_us} AS lo,
           (max(ts_us) // {step_us}) * {step_us} AS hi
    FROM obs GROUP BY conv_id, tool, role
),
grid AS (
    SELECT conv_id, tool, role, unnest(generate_series(lo, hi, {step_us}))
        AS ts_us, CAST(NULL AS DOUBLE) AS value, 1 AS is_grid
    FROM bounds
),
unioned AS (
    SELECT * FROM grid
    UNION ALL
    SELECT conv_id, tool, role, ts_us, value, 0 AS is_grid FROM obs
),
w AS (
    SELECT conv_id, tool, role, ts_us, is_grid,
        last_value(value IGNORE NULLS) OVER back AS v0,
        last_value(CASE WHEN value IS NOT NULL THEN ts_us END IGNORE NULLS)
            OVER back AS t0,
        first_value(value IGNORE NULLS) OVER fwd AS v1,
        first_value(CASE WHEN value IS NOT NULL THEN ts_us END IGNORE NULLS)
            OVER fwd AS t1
    FROM unioned
    WINDOW back AS (PARTITION BY conv_id, tool, role ORDER BY ts_us
        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    fwd AS (PARTITION BY conv_id, tool, role ORDER BY ts_us
        RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT conv_id, tool, role,
    make_timestamp(ts_us) AS grid_ts,
    {filled} AS value_filled,
    CASE WHEN t0 = ts_us THEN 'obs'
         WHEN ({filled}) IS NOT NULL THEN '{method}'
         ELSE 'none' END AS fill_method
FROM w WHERE is_grid = 1
"""
    return with_transcripts(body)


def chunk_roundtrip_oracle(
    tier: str, method: str, purge_gap_s: int = 600
) -> str:
    """Oracle for the Gorilla+DoD chunk round-trip: encode(gap-filled
    grid) → decode must reproduce the grid bit-exactly, so the oracle is
    the gap-fill oracle projected to its point columns (NaN sentinel in
    the blob maps back to NULL)."""
    inner = gapfill_oracle(tier, method, purge_gap_s)
    return (
        "SELECT conv_id, tool, role, grid_ts, value_filled "
        f"FROM ({inner}) g"
    )


def chunk_table_digest_oracle(
    grid_tier: str, chunk_tier: str, method: str = "interp",
    purge_gap_s: int = 600,
) -> str:
    """Decoded-face digest oracle for the chunk table itself: the
    gap-fill closed form re-bucketed per chunk with the same per-chunk
    aggregates the gate query recomputes by decoding the blobs
    (n_points metadata, decoded count, first/last instant, lossy
    count, µs-quantized value checksum). Hash-equality proves both the
    chunk bucketing/metadata and the Gorilla+DoD blob contents."""
    chunk_us = TIERS[chunk_tier] * 1_000_000
    inner = gapfill_oracle(grid_tier, method, purge_gap_s)
    return f"""
WITH g AS ({inner})
SELECT conv_id, tool, role,
    make_timestamp((epoch_us(grid_ts) // {chunk_us}) * {chunk_us})
        AS chunk_start,
    count(*) AS n_points,
    count(*) AS point_count,
    make_timestamp(min(epoch_us(grid_ts))) AS ts_first,
    make_timestamp(max(epoch_us(grid_ts))) AS ts_last,
    CAST(sum(CASE WHEN value_filled IS NULL THEN 1 ELSE 0 END)
        AS BIGINT) AS lossy_count,
    CAST(sum(CASE WHEN value_filled IS NULL THEN 0
        ELSE CAST(floor(value_filled * 1e6) AS BIGINT) END)
        AS BIGINT) AS val_checksum
FROM g
GROUP BY conv_id, tool, role,
    (epoch_us(grid_ts) // {chunk_us}) * {chunk_us}
"""


def chunk_compact_stats_oracle(
    tier: str, method: str, chunk_tier: str = "1d", purge_gap_s: int = 600
) -> str:
    """Oracle for compacted-chunk metadata: the gap-filled grid
    re-bucketed at the target chunk tier with per-bucket point counts —
    exactly one row per (series, bucket) with the merged n_points."""
    inner = gapfill_oracle(tier, method, purge_gap_s)
    chunk_us = TIERS[chunk_tier] * 1_000_000
    return (
        "SELECT conv_id, tool, role, "
        f"(epoch_us(grid_ts) // {chunk_us}) * {chunk_us} AS chunk_us, "
        "CAST(COUNT(*) AS INTEGER) AS n_points "
        f"FROM ({inner}) g "
        "GROUP BY conv_id, tool, role, "
        f"(epoch_us(grid_ts) // {chunk_us}) * {chunk_us}"
    )


def inter_turn_latency_oracle() -> str:
    body = f"""
, {_LAT_CTE}
SELECT conv_id, tool, role, turn_idx, ts,
    CAST(lat_us AS DOUBLE) / 1e6 AS lat_s
FROM lat
"""
    return with_transcripts(body)


def threshold_oracle(threshold: float = 100.0, severity: int = 100) -> str:
    """SimpleThresholdDetector analogue (stateless predicate)."""
    return with_transcripts(
        "SELECT 'threshold_events' AS event_type, conv_id, tool, role, "
        f"CAST({severity} AS INTEGER) AS severity, ts, "
        "CAST(0 AS BIGINT) AS detection_latency_us, value "
        f"FROM transcripts WHERE value > {threshold}"
    )


def salted_rollup_oracle(tier: str) -> str:
    """The salted two-phase rollup must equal the unsalted rollup on its
    algebraic columns — same oracle, algebraic column subset."""
    return (
        "SELECT conv_id, tool, role, window_start, turn_count, "
        "lossy_count, lat_avg, lat_min, lat_max, val_avg, activity_rate "
        f"FROM ({rollup_oracle(tier)})"
    )


def cascade_oracle(to_tier: str) -> str:
    """A tier cascade (finer rollup re-aggregated) must equal the direct
    rollup of raw data at the coarser tier on all algebraic columns."""
    return (
        "SELECT conv_id, tool, role, window_start, window_end, "
        "turn_count, lossy_count, lat_min, lat_max, activity_rate "
        f"FROM ({rollup_oracle(to_tier)})"
    )


def retention_oracle(tier: str, now_ts: str, horizon_s: int) -> str:
    """Retention filter over the tier rollup: survivors only."""
    return (
        f"SELECT * FROM ({rollup_oracle(tier)}) WHERE window_start >= "
        f"TIMESTAMP '{now_ts}' - INTERVAL {horizon_s} SECOND"
    )


def expired_partitions_oracle(tier: str, now_ts: str, horizon_s: int) -> str:
    return f"""
SELECT CAST(window_start AS DATE) AS day,
       CAST(count(*) AS BIGINT) AS rows_dropped
FROM ({rollup_oracle(tier)})
WHERE window_start < TIMESTAMP '{now_ts}' - INTERVAL {horizon_s} SECOND
GROUP BY CAST(window_start AS DATE)
"""


def stream_rollup_oracle(tier: str) -> str:
    """The streaming continuous aggregate's algebraic columns must equal
    the batch rollup's."""
    return (
        "SELECT conv_id, tool, role, window_start, turn_count, "
        "lossy_count, val_avg, activity_rate "
        f"FROM ({rollup_oracle(tier)})"
    )


def stream_latency_oracle() -> str:
    body = f"""
, {_LAT_CTE}
SELECT conv_id, tool, role, turn_idx, ts, CAST(lat_us AS BIGINT) AS lat_us
FROM lat
"""
    return with_transcripts(body)


def media_metadata_oracle() -> str:
    """DuckDB mirror of multimodal.synth_media → media_metadata."""
    kind = "['image','audio','video'][CAST(doc_id % 3 AS INT) + 1]"
    width = "[320,640,1280][CAST(doc_id % 3 AS INT) + 1]"
    rate = "[8000,16000,44100][CAST(doc_id % 3 AS INT) + 1]"
    return f"""
SELECT doc_id AS media_id,
       {kind} AS kind,
       CAST(octet_length(encode(repeat(text, 4))) AS BIGINT)
           AS payload_bytes,
       md5(repeat(text, 4)) AS payload_md5,
       CAST({width} AS INTEGER) AS width,
       CAST(floor({width} / 2) AS INTEGER) AS height,
       CAST(doc_id % 7 + 1 AS INTEGER) AS n_frames,
       CAST({rate} AS INTEGER) AS sample_rate
FROM documents
"""


# ---------------------------------------------------------------------------
# Source-layer oracles (events table; sources/measurements.py)
# ---------------------------------------------------------------------------


def typed_lossy_stream_ids_oracle(event_type: str = "click") -> str:
    return f"""
WITH typed AS (
    SELECT * FROM events
    WHERE event_type = '{event_type}' AND value IS NOT NULL
),
series AS (SELECT DISTINCT user_id, event_type FROM typed),
ranked AS (
    SELECT user_id, event_type,
           CAST(dense_rank() OVER (ORDER BY user_id, event_type) - 1
                AS INT) AS stream_id
    FROM series
)
SELECT t.event_id, t.ts, t.user_id, t.event_type, t.value, t.props,
       r.stream_id
FROM typed t
JOIN ranked r ON t.user_id = r.user_id AND t.event_type = r.event_type
"""


def history_scan_oracle(start_ts: str, end_ts: str) -> str:
    return f"""
SELECT event_id, ts, user_id, event_type, value, props FROM events
WHERE ts > TIMESTAMP '{start_ts}' AND ts <= TIMESTAMP '{end_ts}'
"""


def parse_tags_oracle() -> str:
    return """
SELECT event_id, ts, user_id, event_type, value, props,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS tag_k
FROM events
"""


def csv_projection_oracle() -> str:
    return """
SELECT event_id,
       concat_ws(',',
           coalesce(CAST(event_id AS VARCHAR), ''),
           coalesce(CAST(epoch_us(ts) // 1000 AS VARCHAR), ''),
           coalesce(CAST(user_id AS VARCHAR), ''),
           coalesce(event_type, ''),
           coalesce(CAST(value AS VARCHAR), '')) AS csv_row
FROM events
"""


def enrich_meta_oracle() -> str:
    return """
SELECT e.event_id, e.ts, e.user_id, e.event_type, e.value, e.props,
       c.c_name, c.c_acctbal, c.c_mktsegment
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
"""


def zip_streams_oracle(type_a: str = "click", type_b: str = "view") -> str:
    return f"""
WITH a AS (
    SELECT CAST(row_number() OVER (ORDER BY ts, event_id) - 1 AS BIGINT)
               AS zip_idx,
           event_id AS a_event_id, ts AS a_ts, value AS a_value
    FROM events WHERE event_type = '{type_a}'
),
b AS (
    SELECT CAST(row_number() OVER (ORDER BY ts, event_id) - 1 AS BIGINT)
               AS zip_idx,
           event_id AS b_event_id, ts AS b_ts, value AS b_value
    FROM events WHERE event_type = '{type_b}'
)
SELECT a.zip_idx, a_event_id, a_ts, a_value, b_event_id, b_ts, b_value
FROM a JOIN b ON a.zip_idx = b.zip_idx
"""


def event_groups_oracle(
    threshold: float = 100.0,
    max_interval_s: int = 10,
    max_duration_s: int = 7200,
) -> str:
    """Temporal session grouping over threshold events — the full
    gaps-and-islands pipeline in DuckDB (operators/event_grouping.py)."""
    from streamevmon_spark.operators.event_grouping import (
        GROUP_EVENTS_ORACLE,
    )

    events_sql = (
        "SELECT 'threshold_events' AS event_type, conv_id, tool, role, "
        "CAST(100 AS INTEGER) AS severity, ts, "
        "CAST(0 AS BIGINT) AS detection_latency_us "
        f"FROM transcripts WHERE value > {threshold}"
    )
    body = GROUP_EVENTS_ORACLE.format(
        events_sql=events_sql,
        interval_us=max_interval_s * 1_000_000,
        duration_us=max_duration_s * 1_000_000,
    )
    # splice into with_transcripts' CTE list (strip the leading WITH)
    spliced = "," + body.strip().removeprefix("WITH")
    return with_transcripts(spliced)


# ---------------------------------------------------------------------------
# Sequential-detector oracles (functions/detectors.py kernels re-derived as
# pure window SQL — independent cross-engine checks of the per-key folds)
# ---------------------------------------------------------------------------


def loss_events_oracle(
    max_history: int = 30,
    loss_count: int = 10,
    consecutive_count: int = 5,
) -> str:
    """LossDetector as window SQL (reference:
    detectors/loss/LossDetector.scala:103-185; kernel
    functions/detectors.loss_events).

    Per series ordered by (ts, turn_idx):
    - new_count / old_count: lossy counts over the last ``max_history``
      rows including / excluding the current row (fixed ROWS frames);
    - new_consecutive: lossy run ending at the row (rn minus the last
      non-lossy rn), capped at the window length;
    - consecutive event whenever the run reaches ``consecutive_count``
      (latency back to the run's first in-window row, via self-join on
      rn - run + 1);
    - ratio event when new_count worsens past ``loss_count`` (latency to
      the NEWEST in-window lossy row — the reference's getOldestLoss
      quirk);
    - severity = run/max_history integer division (0 until all-loss).
    """
    m = max_history
    body = f"""
, base AS (
    SELECT conv_id, tool, role, ts, turn_idx,
        CASE WHEN value IS NULL THEN 1 ELSE 0 END AS lossy,
        epoch_us(ts) AS ts_us,
        row_number() OVER (
            PARTITION BY conv_id, tool, role ORDER BY ts, turn_idx
        ) AS rn
    FROM transcripts
),
w AS (
    SELECT *,
        CAST(sum(lossy) OVER (
            PARTITION BY conv_id, tool, role ORDER BY rn
            ROWS BETWEEN {m - 1} PRECEDING AND CURRENT ROW
        ) AS BIGINT) AS new_count,
        CAST(coalesce(sum(lossy) OVER (
            PARTITION BY conv_id, tool, role ORDER BY rn
            ROWS BETWEEN {m} PRECEDING AND 1 PRECEDING
        ), 0) AS BIGINT) AS old_count,
        max(CASE WHEN lossy = 1 THEN ts_us END) OVER (
            PARTITION BY conv_id, tool, role ORDER BY rn
            ROWS BETWEEN {m - 1} PRECEDING AND CURRENT ROW
        ) AS newest_loss_us,
        max(CASE WHEN lossy = 0 THEN rn END) OVER (
            PARTITION BY conv_id, tool, role ORDER BY rn
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS last_nonlossy_rn,
        least(rn, {m}) AS len_recents
    FROM base
),
runs AS (
    SELECT *,
        CASE WHEN lossy = 1
             THEN least(rn - coalesce(last_nonlossy_rn, 0), len_recents)
             ELSE 0 END AS nc
    FROM w
)
SELECT 'loss_events' AS event_type, r.conv_id, r.tool, r.role,
       CAST(CASE WHEN r.nc = {m} THEN 1 ELSE 0 END AS INTEGER) AS severity,
       r.ts,
       CAST(r.ts_us - s.ts_us AS BIGINT) AS detection_latency_us,
       'Consecutive loss became worse! ' || r.nc || ' in a row.'
           AS description
FROM runs r
JOIN base s
  ON s.conv_id = r.conv_id AND s.tool = r.tool AND s.role = r.role
 AND s.rn = r.rn - r.nc + 1
WHERE {consecutive_count} > 0 AND r.nc >= {consecutive_count}
UNION ALL
SELECT 'loss_events' AS event_type, conv_id, tool, role,
       CAST(CASE WHEN nc = {m} THEN 1 ELSE 0 END AS INTEGER) AS severity,
       ts,
       CAST(ts_us - newest_loss_us AS BIGINT) AS detection_latency_us,
       'Loss ratio became worse! ' || old_count || '/' || len_recents ||
           ' -> ' || new_count || '/' || len_recents AS description
FROM runs
WHERE {loss_count} > 0 AND new_count > old_count
  AND new_count >= {loss_count}
"""
    return with_transcripts(body)


def baseline_events_oracle(
    max_history: int = 50,
    percentile: float = 0.10,
    threshold: float = 25.0,
    purge_s: int = 600,
) -> str:
    """BaselineDetector as window SQL (reference:
    detectors/baseline/BaselineDetector.scala:52-162; kernel
    functions/detectors.baseline_events).

    Reset/segment semantics: a point re-enters the reset branch when it
    is the series' first, its gap from the previous point exceeds the
    purge, or every point since the last such trigger was lossy (the
    kernel's last_obs=None propagation). The first non-lossy point of a
    reset run anchors a segment with recents=[x]; subsequent non-lossy
    points slide a ``max_history`` window over the segment's non-lossy
    values, evaluate the commons-math LEGACY percentile on the sorted
    window, and emit when the change-magnitude severity vs the previous
    evaluation (0.0 initially, carried ACROSS segments) exceeds
    ``threshold`` once the window is full.
    """
    m = max_history
    p = percentile
    purge_us = purge_s * 1_000_000
    arr = "arr"
    pos_p = f"({p} * (len({arr}) + 1) / 100.0)"
    flo = f"CAST(floor({pos_p}) AS INT)"
    result = f"""
        CASE WHEN len({arr}) = 1 THEN CAST({arr}[1] AS DOUBLE)
             WHEN {pos_p} < 1.0 THEN CAST({arr}[1] AS DOUBLE)
             WHEN {pos_p} >= len({arr})
                 THEN CAST({arr}[len({arr})] AS DOUBLE)
             ELSE CAST({arr}[{flo}] AS DOUBLE)
                  + ({pos_p} - floor({pos_p}))
                    * (CAST({arr}[{flo} + 1] AS DOUBLE)
                       - CAST({arr}[{flo}] AS DOUBLE))
        END"""
    sev = """
        CASE WHEN maybe < 1 THEN 1
             WHEN maybe > 100 THEN 100
             ELSE CAST(trunc(maybe) AS INTEGER) END"""
    body = f"""
, base AS (
    SELECT conv_id, tool, role, ts, turn_idx, value,
        CASE WHEN value IS NULL THEN 1 ELSE 0 END AS lossy,
        epoch_us(ts) AS ts_us,
        row_number() OVER (
            PARTITION BY conv_id, tool, role ORDER BY ts, turn_idx
        ) AS rn
    FROM transcripts
),
trig AS (
    SELECT *,
        CASE WHEN lag(ts_us) OVER (
                 PARTITION BY conv_id, tool, role ORDER BY rn
             ) IS NULL
             OR ts_us - lag(ts_us) OVER (
                 PARTITION BY conv_id, tool, role ORDER BY rn
             ) > {purge_us}
             THEN rn END AS r0
    FROM base
),
st AS (
    SELECT *,
        max(r0) OVER (
            PARTITION BY conv_id, tool, role ORDER BY rn
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS t_r,
        max(CASE WHEN lossy = 0 THEN rn END) OVER (
            PARTITION BY conv_id, tool, role ORDER BY rn
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
        ) AS last_nl
    FROM trig
),
seg0 AS (
    SELECT *,
        (last_nl IS NULL OR last_nl < t_r) AS in_reset
    FROM st
),
seg AS (
    SELECT *,
        max(CASE WHEN in_reset AND lossy = 0 THEN rn END) OVER (
            PARTITION BY conv_id, tool, role ORDER BY rn
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS seg_id
    FROM seg0
),
nl AS (
    SELECT * FROM seg
    WHERE lossy = 0 AND seg_id IS NOT NULL
      AND (NOT in_reset OR rn = seg_id)
),
res0 AS (
    SELECT *,
        row_number() OVER (
            PARTITION BY conv_id, tool, role, seg_id ORDER BY rn
        ) AS pos,
        list_sort(list(value) OVER (
            PARTITION BY conv_id, tool, role, seg_id ORDER BY rn
            ROWS BETWEEN {m - 1} PRECEDING AND CURRENT ROW
        )) AS {arr}
    FROM nl
),
res AS (
    SELECT *, {result} AS result
    FROM res0 WHERE pos >= 2
),
chain AS (
    SELECT *,
        coalesce(lag(result) OVER (
            PARTITION BY conv_id, tool, role ORDER BY rn
        ), 0.0) AS last_result
    FROM res
),
mag AS (
    SELECT *,
        greatest(last_result, result) AS mx,
        least(last_result, result) AS mn
    FROM chain
),
sev0 AS (
    SELECT *,
        CASE WHEN (CASE WHEN mn < 0.1 THEN 4.8
                        ELSE exp(-0.17949 * ln(mn) + 1.13489) END) < 1.1
             THEN 1.1
             ELSE (CASE WHEN mn < 0.1 THEN 4.8
                        ELSE exp(-0.17949 * ln(mn) + 1.13489) END)
        END AS basemag
    FROM mag
),
sev1 AS (
    SELECT *,
        CASE WHEN (basemag - 1.0) * mn = 0 THEN CAST('inf' AS DOUBLE)
             ELSE 30.0 * ((mx - mn) / ((basemag - 1.0) * mn)) END AS maybe
    FROM sev0
)
SELECT 'baseline_events' AS event_type, conv_id, tool, role,
       CAST({sev} AS INTEGER) AS severity,
       ts,
       CAST(0 AS BIGINT) AS detection_latency_us,
       'Observed baseline changed from ' || CAST(last_result AS VARCHAR)
           || ' to ' || CAST(result AS VARCHAR) AS description
FROM sev1
WHERE least(pos, {m}) >= {m} AND {sev} > {threshold}
"""
    return with_transcripts(body)


def smokeping_median_oracle(n_max: int = 20, n_pings: int = 20) -> str:
    """DuckDB mirror of synth_rtts -> parse_rtts -> smokeping_projection
    (sources/measurements.py): identical rtts string construction, the
    getRtts parse, and the reference's sorted-middle median with
    floor(x*1000 + 0.5)/1000 rounding."""
    elems = (
        f"list_transform(range(1, event_id % {n_max + 1} + 1), i -> "
        "CASE WHEN (event_id + i) % 11 = 0 THEN 'None' "
        "ELSE CAST((event_id * 7 + i * 13) % 400 AS VARCHAR) END)"
    )
    return f"""
WITH raw AS (
    SELECT event_id,
           -- array_to_string([]) is NULL in DuckDB (Spark array_join
           -- gives ''); coalesce to match
           '"[' || coalesce(array_to_string({elems}, ', '), '') || ']"'
               AS rtts_raw
    FROM events
),
parsed AS (
    SELECT event_id,
        CASE WHEN length(substr(rtts_raw, 3, length(rtts_raw) - 4)) = 0
             THEN CAST([] AS INT[])
             ELSE list_transform(
                 string_split(substr(rtts_raw, 3, length(rtts_raw) - 4), ','),
                 x -> CASE WHEN trim(x) = 'None' THEN NULL
                           ELSE CAST(trim(x) AS INT) END)
        END AS rtts
    FROM raw
),
med AS (
    SELECT event_id, rtts,
        list_sort(list_transform(list_filter(rtts, x -> x IS NOT NULL),
                                 x -> CAST(x AS DOUBLE))) AS s
    FROM parsed
)
SELECT event_id,
    coalesce(array_to_string(list_transform(rtts,
        x -> coalesce(CAST(x AS VARCHAR), 'None')), ';'), '') AS rtts_canon,
    CAST(len(s) AS INT) AS n_results,
    CAST({n_pings} - len(s) AS INT) AS loss,
    CASE WHEN len(s) = 0 THEN CAST(NULL AS DOUBLE)
         ELSE floor((CASE WHEN len(s) % 2 != 0 THEN s[len(s) // 2 + 1]
                          ELSE (s[len(s) // 2] + s[len(s) // 2 + 1]) / 2
                     END) * 1000 + 0.5) / 1000
    END AS median
FROM med
"""


def nab_format_oracle(
    event_threshold: float = 150.0, scaling: str = "continuous"
) -> str:
    """NAB scoring rows over the events table: measurements keyed by
    (event_type AS stream, ts); threshold events (severity 100) inject
    their scaled severity at matching timestamps, everything else 0."""
    score = (
        "coalesce(CAST(sev AS DOUBLE) / 100.0, 0.0)"
        if scaling == "continuous"
        else "CASE WHEN coalesce(sev, 0) > 0 THEN 1.0 ELSE 0.0 END"
    )
    return f"""
WITH m AS (SELECT event_type AS stream, ts, value FROM events),
ev AS (
    SELECT event_type AS stream, ts, max(100) AS sev
    FROM events WHERE value > {event_threshold}
    GROUP BY event_type, ts
)
SELECT m.stream, m.ts, m.value, {score} AS anomaly_score
FROM m LEFT JOIN ev ON ev.stream = m.stream AND ev.ts = m.ts
"""


def single_event_groups_oracle(threshold: float = 100.0) -> str:
    """SingleEventGrouper over threshold events: one singleton group per
    event, anchored at eventTime (latency 0 for threshold events)."""
    return with_transcripts(
        "SELECT ts AS start_time, ts AS end_time, "
        "CAST(1 AS BIGINT) AS member_count, "
        "CAST(100 AS DOUBLE) AS mean_severity, "
        "CAST(0 AS DOUBLE) AS mean_detection_latency_us, "
        "'threshold_events' AS mode_event_type "
        f"FROM transcripts WHERE value > {threshold}"
    )


def event_line_protocol_oracle(threshold: float = 100.0) -> str:
    """Line-protocol serialisation of threshold events — identical
    concat template as operators/detect.event_line_protocol."""
    return with_transcripts(
        "SELECT 'threshold_events' AS event_type, conv_id, tool, role, "
        "'event_type=threshold_events,stream=' || conv_id || '--' || tool "
        "|| '--' || role || ' description=\"\",detection_latency=0i,"
        "severity=100i ' || "
        "CAST(CAST(datediff('millisecond', "
        "TIMESTAMP '1970-01-01 00:00:00', ts) AS BIGINT) * 1000000 "
        "AS VARCHAR) AS line_protocol "
        f"FROM transcripts WHERE value > {threshold}"
    )


def amp2_stream_key_oracle() -> str:
    """Composite amp2 stream key — identical concat over the same parsed
    tag (props JSON ->> k)."""
    return """
SELECT event_id,
       event_type || '--u' || CAST(user_id AS VARCHAR) || '--d' ||
           CAST(user_id % 10 AS VARCHAR) || '--test--' ||
           CAST(CAST(props ->> 'k' AS INT) AS VARCHAR) AS stream,
       ts, value
FROM events
"""


def histogram_merge_oracle(bucket_width: float = 10.0) -> str:
    """Bucket-wise histogram merge per (user_id, event_type) series."""
    return f"""
SELECT user_id, event_type,
       floor(value / {bucket_width}) * {bucket_width} AS bucket,
       CAST(count(*) AS BIGINT) AS bucket_count
FROM events WHERE value IS NOT NULL
GROUP BY user_id, event_type, floor(value / {bucket_width}) * {bucket_width}
"""


def windowed_distdiff_oracle(
    window_s: int = 3600,
    recents_count: int = 20,
    minimum_change: float = 1.05,
    z_threshold: float = 5.0,
    drop_extreme_n: int = 0,
) -> str:
    """WindowedDistDiffDetector as SQL (kernel:
    functions/detectors.windowed_distdiff_events; reference:
    detectors/distdiff/WindowedDistDiffDetector.scala:54-149,
    DistDiffLogic.scala:85-240). The KS-style two-pointer walk — with
    the reference's signed-max quirk (rdiffmax stores the SIGNED rdiff
    whenever |rdiff| exceeds it) and tie-skip (equal runs advance both
    pointers, one depth) — runs as a bounded recursive CTE, one step per
    iteration per (series, window). Only drop_extreme_n=0 is expressible
    here (the gate config); float ops mirror the kernel's order exactly.
    """
    if drop_extreme_n != 0:
        raise ValueError("oracle supports drop_extreme_n=0 only")
    rc = recents_count
    win_us = window_s * 1_000_000
    inv = f"(CAST(1.0 AS DOUBLE) / {rc})"
    md = 2 * rc  # max_depth = len(old) + len(rec)
    sev = """
        CASE WHEN maybe < 1 THEN 1
             WHEN maybe > 100 THEN 100
             ELSE CAST(trunc(maybe) AS INTEGER) END"""
    body = f"""
, nl AS (
    SELECT conv_id, tool, role, value, epoch_us(ts) AS ts_us,
        (epoch_us(ts) // {win_us}) * {win_us} AS w_us,
        row_number() OVER (
            PARTITION BY conv_id, tool, role,
                         (epoch_us(ts) // {win_us}) * {win_us}
            ORDER BY ts, turn_idx
        ) AS rn
    FROM transcripts WHERE value IS NOT NULL
),
g AS (
    SELECT conv_id, tool, role, w_us,
        list_sort(list(value ORDER BY rn) FILTER (WHERE rn <= {rc}))
            AS old,
        list_sort(list(value ORDER BY rn)
                  FILTER (WHERE rn > {rc} AND rn <= {2 * rc})) AS rec,
        min(ts_us) AS t_first,
        max(CASE WHEN rn = {2 * rc} THEN ts_us END) AS t_last
    FROM nl
    GROUP BY conv_id, tool, role, w_us
    HAVING count(*) >= {2 * rc}
),
walk AS (
    SELECT conv_id, tool, role, w_us, old, rec, t_first, t_last,
        0 AS io, 0 AS ir, 0 AS depth,
        -- plain 0.0 binds as DECIMAL(2,1) and silently rounds every
        -- subsequent step to one decimal — must anchor as DOUBLE
        CAST(0.0 AS DOUBLE) AS rdiff, CAST(0.0 AS DOUBLE) AS rmax,
        false AS done, CAST(0.0 AS DOUBLE) AS result
    FROM g
    UNION ALL
    SELECT conv_id, tool, role, w_us, old, rec, t_first, t_last,
        CASE WHEN io >= len(old) OR ir >= len(rec) THEN io
             WHEN old[io + 1] < rec[ir + 1] THEN io + 1
             WHEN old[io + 1] > rec[ir + 1] THEN io
             ELSE len(list_filter(old, x -> x <= old[io + 1])) END AS io,
        CASE WHEN io >= len(old) OR ir >= len(rec) THEN ir
             WHEN old[io + 1] < rec[ir + 1] THEN ir
             WHEN old[io + 1] > rec[ir + 1] THEN ir + 1
             ELSE len(list_filter(rec, x -> x <= rec[ir + 1])) END AS ir,
        CASE WHEN io >= len(old) OR ir >= len(rec) THEN depth
             ELSE depth + 1 END AS depth,
        CASE WHEN io >= len(old) OR ir >= len(rec) THEN rdiff
             WHEN old[io + 1] < rec[ir + 1] THEN rdiff - {inv}
             WHEN old[io + 1] > rec[ir + 1] THEN rdiff + {inv}
             ELSE rdiff END AS rdiff,
        CASE WHEN io >= len(old) OR ir >= len(rec) THEN rmax
             WHEN old[io + 1] < rec[ir + 1] THEN
                 CASE WHEN abs(rdiff - {inv}) > rmax THEN rdiff - {inv}
                      ELSE rmax END
             WHEN old[io + 1] > rec[ir + 1] THEN
                 CASE WHEN abs(rdiff + {inv}) > rmax THEN rdiff + {inv}
                      ELSE rmax END
             ELSE rmax END AS rmax,
        (io >= len(old) OR ir >= len(rec)) AS done,
        CASE WHEN io >= len(old) THEN
                 CASE WHEN abs(rdiff + (-{inv} * ({md} - depth))) > rmax
                      THEN abs(rdiff + (-{inv} * ({md} - depth)))
                      ELSE rmax END
             WHEN ir >= len(rec) THEN
                 CASE WHEN abs(rdiff + ({inv} * ({md} - depth))) > rmax
                      THEN abs(rdiff + ({inv} * ({md} - depth)))
                      ELSE rmax END
             ELSE 0.0 END AS result
    FROM walk WHERE NOT done
),
scored AS (
    SELECT conv_id, tool, role, w_us, old, rec, t_first, t_last,
        result * sqrt(CAST({md} AS DOUBLE) * {md} / ({md} * 2.0)) AS diff,
        list_reduce(old, (x, y) -> x + y) AS old_sum,
        list_reduce(rec, (x, y) -> x + y) AS rec_sum,
        old[len(old)] - old[1] AS old_range,
        rec[len(rec)] - rec[1] AS rec_range
    FROM walk WHERE done
),
gated AS (
    SELECT *,
        old_sum / len(old) AS old_mean,
        rec_sum / len(rec) AS rec_mean
    FROM scored
    WHERE diff >= {z_threshold}
      AND (CASE WHEN old_sum > rec_sum THEN old_sum / rec_sum
                ELSE rec_sum / old_sum END) >= {minimum_change}
      AND abs(old_sum - rec_sum) >= {rc}
),
gated2 AS (
    SELECT * FROM gated
    WHERE NOT (rec_range > 0.25 * old_range
               AND abs(old_mean - rec_mean) < 2 * old_range)
),
mag AS (
    SELECT *,
        greatest(old_mean / 1000.0, rec_mean / 1000.0) AS mx,
        least(old_mean / 1000.0, rec_mean / 1000.0) AS mn
    FROM gated2
),
sev1 AS (
    SELECT *,
        CASE WHEN (CASE WHEN (CASE WHEN mn < 0.1 THEN 4.8
                        ELSE exp(-0.17949 * ln(mn) + 1.13489) END) < 1.1
             THEN 1.1
             ELSE (CASE WHEN mn < 0.1 THEN 4.8
                        ELSE exp(-0.17949 * ln(mn) + 1.13489) END)
             END - 1.0) * mn = 0 THEN CAST('inf' AS DOUBLE)
             ELSE 30.0 * ((mx - mn) /
                 ((CASE WHEN (CASE WHEN mn < 0.1 THEN 4.8
                       ELSE exp(-0.17949 * ln(mn) + 1.13489) END) < 1.1
                   THEN 1.1
                   ELSE (CASE WHEN mn < 0.1 THEN 4.8
                         ELSE exp(-0.17949 * ln(mn) + 1.13489) END)
                   END - 1.0) * mn))
        END AS maybe
    FROM mag
)
SELECT 'windowed_distdiff_events' AS event_type, conv_id, tool, role,
    CAST({sev} AS INTEGER) AS severity,
    make_timestamp(t_last) AS ts,
    CAST(t_last - t_first AS BIGINT) AS detection_latency_us,
    'Distribution has changed. Mean has ' ||
        CASE WHEN old_mean < rec_mean THEN 'increased' ELSE 'decreased'
        END || ' from ' || CAST(old_mean AS VARCHAR) || ' to ' ||
        CAST(rec_mean AS VARCHAR) AS description
FROM sev1
"""
    # the walk CTE is recursive — the whole WITH clause needs the keyword
    return with_transcripts(body).replace(
        "WITH transcripts", "WITH RECURSIVE transcripts", 1
    )


def distdiff_events_oracle(
    recents_count: int = 20,
    minimum_change: float = 1.05,
    z_threshold: float = 5.0,
    drop_extreme_n: int = 0,
    purge_s: int = 1200,
) -> str:
    """Keyed DistDiffDetector as SQL (kernel:
    functions/detectors.distdiff_events; reference:
    detectors/distdiff/DistDiffDetector.scala:54-247):

    - the same reset/segment propagation as the baseline oracle;
    - per tested point (>= 2*rc non-lossy values into its segment),
      recents / long_recents are fixed ROWS frames over the segment's
      non-lossy rows; the KS walk runs in the shared recursive-CTE form;
    - the in-event hysteresis (enter on an EMITTED event, exit at z/2)
      collapses to a closed form: reset points (diff < z/2) partition
      each segment into islands, and exactly the FIRST fully-qualifying
      point of each island emits. Only drop_extreme_n=0 is expressible.
    """
    if drop_extreme_n != 0:
        raise ValueError("oracle supports drop_extreme_n=0 only")
    rc = recents_count
    purge_us = purge_s * 1_000_000
    inv = f"(CAST(1.0 AS DOUBLE) / {rc})"
    md = 2 * rc
    sev = """
        CASE WHEN maybe < 1 THEN 1
             WHEN maybe > 100 THEN 100
             ELSE CAST(trunc(maybe) AS INTEGER) END"""
    body = f"""
, base AS (
    SELECT conv_id, tool, role, ts, turn_idx, value,
        CASE WHEN value IS NULL THEN 1 ELSE 0 END AS lossy,
        epoch_us(ts) AS ts_us,
        row_number() OVER (
            PARTITION BY conv_id, tool, role ORDER BY ts, turn_idx
        ) AS rn
    FROM transcripts
),
trig AS (
    SELECT *,
        CASE WHEN lag(ts_us) OVER (
                 PARTITION BY conv_id, tool, role ORDER BY rn
             ) IS NULL
             OR ts_us - lag(ts_us) OVER (
                 PARTITION BY conv_id, tool, role ORDER BY rn
             ) > {purge_us}
             THEN rn END AS r0
    FROM base
),
st AS (
    SELECT *,
        max(r0) OVER (
            PARTITION BY conv_id, tool, role ORDER BY rn
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS t_r,
        max(CASE WHEN lossy = 0 THEN rn END) OVER (
            PARTITION BY conv_id, tool, role ORDER BY rn
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
        ) AS last_nl
    FROM trig
),
seg0 AS (
    SELECT *, (last_nl IS NULL OR last_nl < t_r) AS in_reset FROM st
),
seg AS (
    SELECT *,
        max(CASE WHEN in_reset AND lossy = 0 THEN rn END) OVER (
            PARTITION BY conv_id, tool, role ORDER BY rn
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS seg_id
    FROM seg0
),
nl AS (
    SELECT * FROM seg
    WHERE lossy = 0 AND seg_id IS NOT NULL
      AND (NOT in_reset OR rn = seg_id)
),
lists AS (
    SELECT conv_id, tool, role, seg_id, rn, ts_us,
        row_number() OVER (
            PARTITION BY conv_id, tool, role, seg_id ORDER BY rn
        ) AS pos,
        list_sort(list(value) OVER (
            PARTITION BY conv_id, tool, role, seg_id ORDER BY rn
            ROWS BETWEEN {rc - 1} PRECEDING AND CURRENT ROW
        )) AS rec,
        list_sort(list(value) OVER (
            PARTITION BY conv_id, tool, role, seg_id ORDER BY rn
            ROWS BETWEEN {2 * rc - 1} PRECEDING AND {rc} PRECEDING
        )) AS old,
        lag(ts_us, {rc}) OVER (
            PARTITION BY conv_id, tool, role, seg_id ORDER BY rn
        ) AS t_oldest
    FROM nl
),
tested AS (SELECT * FROM lists WHERE pos >= {2 * rc}),
walk AS (
    SELECT conv_id, tool, role, seg_id, rn, ts_us, t_oldest, old, rec,
        0 AS io, 0 AS ir, 0 AS depth,
        CAST(0.0 AS DOUBLE) AS rdiff, CAST(0.0 AS DOUBLE) AS rmax,
        false AS done, CAST(0.0 AS DOUBLE) AS result
    FROM tested
    UNION ALL
    SELECT conv_id, tool, role, seg_id, rn, ts_us, t_oldest, old, rec,
        CASE WHEN io >= len(old) OR ir >= len(rec) THEN io
             WHEN old[io + 1] < rec[ir + 1] THEN io + 1
             WHEN old[io + 1] > rec[ir + 1] THEN io
             ELSE len(list_filter(old, x -> x <= old[io + 1])) END AS io,
        CASE WHEN io >= len(old) OR ir >= len(rec) THEN ir
             WHEN old[io + 1] < rec[ir + 1] THEN ir
             WHEN old[io + 1] > rec[ir + 1] THEN ir + 1
             ELSE len(list_filter(rec, x -> x <= rec[ir + 1])) END AS ir,
        CASE WHEN io >= len(old) OR ir >= len(rec) THEN depth
             ELSE depth + 1 END AS depth,
        CASE WHEN io >= len(old) OR ir >= len(rec) THEN rdiff
             WHEN old[io + 1] < rec[ir + 1] THEN rdiff - {inv}
             WHEN old[io + 1] > rec[ir + 1] THEN rdiff + {inv}
             ELSE rdiff END AS rdiff,
        CASE WHEN io >= len(old) OR ir >= len(rec) THEN rmax
             WHEN old[io + 1] < rec[ir + 1] THEN
                 CASE WHEN abs(rdiff - {inv}) > rmax THEN rdiff - {inv}
                      ELSE rmax END
             WHEN old[io + 1] > rec[ir + 1] THEN
                 CASE WHEN abs(rdiff + {inv}) > rmax THEN rdiff + {inv}
                      ELSE rmax END
             ELSE rmax END AS rmax,
        (io >= len(old) OR ir >= len(rec)) AS done,
        CASE WHEN io >= len(old) THEN
                 CASE WHEN abs(rdiff + (-{inv} * ({md} - depth))) > rmax
                      THEN abs(rdiff + (-{inv} * ({md} - depth)))
                      ELSE rmax END
             WHEN ir >= len(rec) THEN
                 CASE WHEN abs(rdiff + ({inv} * ({md} - depth))) > rmax
                      THEN abs(rdiff + ({inv} * ({md} - depth)))
                      ELSE rmax END
             ELSE 0.0 END AS result
    FROM walk WHERE NOT done
),
scored AS (
    SELECT conv_id, tool, role, seg_id, rn, ts_us, t_oldest, old, rec,
        result * sqrt(CAST({md} AS DOUBLE) * {md} / ({md} * 2.0)) AS diff,
        list_reduce(old, (x, y) -> x + y) AS old_sum,
        list_reduce(rec, (x, y) -> x + y) AS rec_sum,
        old[len(old)] - old[1] AS old_range,
        rec[len(rec)] - rec[1] AS rec_range
    FROM walk WHERE done
),
flagged AS (
    SELECT *,
        old_sum / len(old) AS old_mean,
        rec_sum / len(rec) AS rec_mean,
        (diff >= {z_threshold}
         AND (CASE WHEN old_sum > rec_sum THEN old_sum / rec_sum
                   ELSE rec_sum / old_sum END) >= {minimum_change}
         AND abs(old_sum - rec_sum) >= {rc}
         AND NOT (rec_range > 0.25 * old_range
                  AND abs(old_sum / len(old) - rec_sum / len(rec))
                      < 2 * old_range)) AS qualifies,
        (diff < {z_threshold} / 2.0) AS is_reset
    FROM scored
),
islands AS (
    SELECT *,
        CAST(coalesce(sum(CASE WHEN is_reset THEN 1 ELSE 0 END) OVER (
            PARTITION BY conv_id, tool, role, seg_id ORDER BY rn
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
        ), 0) AS BIGINT) AS island
    FROM flagged
),
winners AS (
    SELECT *,
        min(CASE WHEN qualifies THEN rn END) OVER (
            PARTITION BY conv_id, tool, role, seg_id, island
        ) AS first_q
    FROM islands
),
mag AS (
    SELECT *,
        greatest(old_mean / 1000.0, rec_mean / 1000.0) AS mx,
        least(old_mean / 1000.0, rec_mean / 1000.0) AS mn
    FROM winners WHERE qualifies AND rn = first_q
),
sev1 AS (
    SELECT *,
        CASE WHEN (CASE WHEN (CASE WHEN mn < 0.1 THEN 4.8
                        ELSE exp(-0.17949 * ln(mn) + 1.13489) END) < 1.1
             THEN 1.1
             ELSE (CASE WHEN mn < 0.1 THEN 4.8
                        ELSE exp(-0.17949 * ln(mn) + 1.13489) END)
             END - 1.0) * mn = 0 THEN CAST('inf' AS DOUBLE)
             ELSE 30.0 * ((mx - mn) /
                 ((CASE WHEN (CASE WHEN mn < 0.1 THEN 4.8
                       ELSE exp(-0.17949 * ln(mn) + 1.13489) END) < 1.1
                   THEN 1.1
                   ELSE (CASE WHEN mn < 0.1 THEN 4.8
                         ELSE exp(-0.17949 * ln(mn) + 1.13489) END)
                   END - 1.0) * mn))
        END AS maybe
    FROM mag
)
SELECT 'distdiff_events' AS event_type, conv_id, tool, role,
    CAST({sev} AS INTEGER) AS severity,
    make_timestamp(ts_us) AS ts,
    CAST(ts_us - t_oldest AS BIGINT) AS detection_latency_us,
    'Distribution has changed. Mean has ' ||
        CASE WHEN old_mean < rec_mean THEN 'increased' ELSE 'decreased'
        END || ' from ' || CAST(old_mean AS VARCHAR) || ' to ' ||
        CAST(rec_mean AS VARCHAR) AS description
FROM sev1
"""
    return with_transcripts(body).replace(
        "WITH transcripts", "WITH RECURSIVE transcripts", 1
    )


def frequent_event_filter_oracle(
    configs: tuple[tuple[str, int, int, int, int], ...],
    threshold: float = 100.0,
) -> str:
    """Multi-config FrequentEventFilter as window SQL (kernel:
    operators/event_grouping.frequent_event_filter; reference:
    events/FrequentEventFilter.scala:81-276) over threshold events.

    Per config, "triggered" is state-free (count of prior events within
    the interval, strict > via integer-µs RANGE frames), and the
    disable/cooldown latch collapses to a closed form because every
    triggered point refreshes the disable stamp to its own timestamp:
    with t* = the latest triggered point strictly before row i,
    the config is enabled at i's entry iff t* does not exist, or some
    point sits between t* and i and the latest one (timestamps are
    monotone) is past the cooldown; the exit state replaces t* with the
    latest triggered point up to AND including i. Bulk events fire on
    enabled-and-triggered; a row passes through iff every config is
    enabled after processing it. Requires a tie-free (series, ts) order
    (asserted true for the gate data).
    """
    w1_cols = []
    for i, (_n, _c, interval_s, _cd, _sev) in enumerate(configs):
        iv_us = interval_s * 1_000_000
        w1_cols.append(
            f"CAST(coalesce(count(*) OVER (PARTITION BY conv_id, tool, role"
            f" ORDER BY ts_us RANGE BETWEEN UNBOUNDED PRECEDING AND"
            f" {iv_us} PRECEDING), 0) AS BIGINT) AS nback_{i}"
        )
    w2_cols = [
        f"(rn - nback_{i}) > {c} AS trig_{i}"
        for i, (_n, c, _iv, _cd, _sev) in enumerate(configs)
    ]
    w3_cols = []
    for i in range(len(configs)):
        for frame, tag in (
            ("ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING", "x"),
            ("ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW", "i"),
        ):
            w3_cols.append(
                f"max(CASE WHEN trig_{i} THEN rn END) OVER ("
                f"PARTITION BY conv_id, tool, role ORDER BY rn {frame})"
                f" AS t{tag}rn_{i}"
            )
            w3_cols.append(
                f"max(CASE WHEN trig_{i} THEN ts_us END) OVER ("
                f"PARTITION BY conv_id, tool, role ORDER BY rn {frame})"
                f" AS t{tag}ts_{i}"
            )
    w4_cols = []
    for i, (_n, _c, _iv, cooldown_s, _sev) in enumerate(configs):
        cd_us = cooldown_s * 1_000_000
        w4_cols.append(
            f"(txrn_{i} IS NULL OR (rn - 1 > txrn_{i}"
            f" AND lag_ts > txts_{i} + {cd_us})) AS entry_ok_{i}"
        )
        w4_cols.append(
            f"(tirn_{i} IS NULL OR (NOT trig_{i}"
            f" AND tits_{i} < ts_us - {cd_us})) AS after_ok_{i}"
        )
    bulks = []
    for i, (name, c, interval_s, _cd, sev) in enumerate(configs):
        desc = (
            "Frequent events of type threshold_events - configuration "
            f'name "{name} ({c} events in {interval_s} seconds)"'
        )
        bulks.append(
            "SELECT 'bulk_threshold_events' AS event_type, conv_id, tool,"
            f" role, CAST({sev} AS INTEGER) AS severity,"
            " make_timestamp(ts_us) AS ts,"
            f" '{desc}' AS description"
            f" FROM w4 WHERE entry_ok_{i} AND trig_{i}"
        )
    all_after = " AND ".join(f"after_ok_{i}" for i in range(len(configs)))
    body = f"""
, ev AS (
    SELECT conv_id, tool, role, epoch_us(ts) AS ts_us,
        CAST(100 AS INTEGER) AS severity,
        row_number() OVER (
            PARTITION BY conv_id, tool, role ORDER BY epoch_us(ts)
        ) AS rn
    FROM transcripts WHERE value > {threshold}
),
w1 AS (
    SELECT *, lag(ts_us) OVER (
        PARTITION BY conv_id, tool, role ORDER BY rn
    ) AS lag_ts,
    {", ".join(w1_cols)}
    FROM ev
),
w2 AS (SELECT *, {", ".join(w2_cols)} FROM w1),
w3 AS (SELECT *, {", ".join(w3_cols)} FROM w2),
w4 AS (SELECT *, {", ".join(w4_cols)} FROM w3)
{" UNION ALL ".join(bulks)}
UNION ALL
SELECT 'threshold_events' AS event_type, conv_id, tool, role, severity,
       make_timestamp(ts_us) AS ts, '' AS description
FROM w4 WHERE {all_after}
"""
    return with_transcripts(body)


def mode_events_oracle(
    max_history: int = 30,
    min_frequency: int = 6,
    min_prominence: int = 3,
    threshold: float = 7.5,
    purge_s: int = 60,
) -> str:
    """Keyed ModeDetector as SQL (kernel functions/detectors.mode_events;
    reference detectors/mode/ModeDetector.scala:54-448).

    The only sequential state is ``last_event_val``, and every branch
    past the frequency/prominence gates assigns it ``primary_val`` — so
    it collapses to a closed form: L(i) = primary mode at the previous
    *qualifying* point (window full, frequency >= min_frequency,
    prominence >= min_prominence) of the same purge segment. Emission at
    a qualifying point then needs only per-row window state:

    - 2-sig-fig FLOOR bucketing of trunc-toward-zero ints
      (ModeDetector.scala:157-166);
    - top-2 (count, value)-lexicographic modes over the last
      ``max_history`` non-lossy values (secondary count = -2 when the
      window has a single distinct value);
    - the reference's threshold quirks: L<=0 gives a NaN threshold
      (gate passes), L=1 gives +inf (gate always blocks);
    - severity via magnitude-aligned truncation feeding the
      events/Event.scala:144-201 log-curve.

    Purge semantics: the first row of a series and any row arriving more
    than ``purge_s`` after its predecessor reset all state and are
    themselves consumed (never enter the window).
    """
    mh = max_history
    purge_us = purge_s * 1_000_000
    gap = (
        f"lag(ts_us) OVER sw IS NULL OR ts_us - lag(ts_us) OVER sw > {purge_us}"
        if purge_s > 0
        else "lag(ts_us) OVER sw IS NULL"
    )
    # d = decimal digit count of the truncated int; 2-sig-fig FLOOR
    digits = "(1 + CAST(floor(log10(abs(CAST(iv AS DOUBLE)))) AS INT))"
    scaled = f"""
        CASE WHEN iv = 0 THEN 0
             WHEN {digits} <= 2 THEN iv
             ELSE CAST(floor(CAST(iv AS DOUBLE)
                             / trunc(pow(10, {digits} - 2))) AS BIGINT)
                  * CAST(trunc(pow(10, {digits} - 2)) AS BIGINT)
        END"""
    body = f"""
, base AS (
    SELECT conv_id, tool, role, ts, turn_idx, value,
        (value IS NULL) AS lossy,
        epoch_us(ts) AS ts_us,
        row_number() OVER (
            PARTITION BY conv_id, tool, role ORDER BY ts, turn_idx
        ) AS rn
    FROM transcripts
),
rst AS (
    SELECT *, CASE WHEN {gap} THEN rn END AS r0
    FROM base
    WINDOW sw AS (PARTITION BY conv_id, tool, role ORDER BY rn)
),
seg AS (
    SELECT *,
        max(r0) OVER (
            PARTITION BY conv_id, tool, role ORDER BY rn
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS seg_id
    FROM rst
),
hrows AS (
    SELECT conv_id, tool, role, ts, ts_us, rn, seg_id, {scaled} AS s
    FROM (
        SELECT *, CAST(trunc(value) AS BIGINT) AS iv
        FROM seg WHERE NOT lossy AND r0 IS NULL
    )
),
win AS (
    SELECT *,
        row_number() OVER (
            PARTITION BY conv_id, tool, role, seg_id ORDER BY rn
        ) AS pos,
        list(s) OVER (
            PARTITION BY conv_id, tool, role, seg_id ORDER BY rn
            ROWS BETWEEN {mh - 1} PRECEDING AND CURRENT ROW
        ) AS hist
    FROM hrows
),
top2 AS (
    SELECT *,
        list_reverse_sort(list_transform(
            list_distinct(hist),
            v -> {{'c': len(list_filter(hist, x -> x = v)), 'v': v}}
        )) AS cand
    FROM win WHERE pos >= {mh}
),
qpts AS (
    SELECT conv_id, tool, role, ts, ts_us, rn, seg_id, hist,
        cand[1]['v'] AS primary_val,
        cand[1]['c'] AS primary_cnt,
        CASE WHEN len(cand) >= 2 THEN cand[2]['c'] ELSE -2 END AS secondary_cnt
    FROM top2
    WHERE cand[1]['c'] >= {min_frequency}
      AND cand[1]['c']
          - (CASE WHEN len(cand) >= 2 THEN cand[2]['c'] ELSE -2 END)
          >= {min_prominence}
),
lagd AS (
    SELECT *,
        lag(primary_val) OVER (
            PARTITION BY conv_id, tool, role, seg_id ORDER BY rn
        ) AS l_prev
    FROM qpts
),
gated AS (
    SELECT *, CAST(l_prev AS DOUBLE) AS lev
    FROM lagd
    WHERE l_prev IS NOT NULL AND l_prev <> -5 AND primary_val <> l_prev
      AND len(list_filter(hist, x -> x = l_prev)) > 0
),
thr AS (
    SELECT *,
        CASE WHEN lev > 0 THEN
            CASE WHEN ln(lev) = 0 THEN CAST('infinity' AS DOUBLE)
                 ELSE lev / ln(lev) END
        END AS calc
    FROM gated
),
emit AS (
    SELECT * FROM thr
    WHERE NOT coalesce(
        abs(CAST(l_prev - primary_val AS DOUBLE)) <
            (CASE WHEN calc IS NULL THEN CAST(NULL AS DOUBLE)
                  WHEN calc < {threshold} THEN {threshold}
                  ELSE calc END),
        FALSE)
),
mags AS (
    SELECT *,
        CASE WHEN l_prev = 0 THEN 0
             ELSE 1 + CAST(floor(log10(abs(CAST(l_prev AS DOUBLE)))) AS INT)
        END AS om,
        CASE WHEN primary_val = 0 THEN 0
             ELSE 1 + CAST(floor(log10(abs(CAST(primary_val AS DOUBLE)))) AS INT)
        END AS cm
    FROM emit
),
aligned AS (
    SELECT *,
        trunc(CAST(l_prev AS DOUBLE) / q) AS a,
        trunc(CAST(primary_val AS DOUBLE) / q) AS b
    FROM (
        SELECT *, CAST(trunc(pow(10,
            (CASE WHEN om = cm THEN om - 1
                  ELSE greatest(least(om, cm), 1) END) - 1)) AS BIGINT) AS q
        FROM mags
    )
),
curved AS (
    SELECT *,
        CASE WHEN (basemag - 1.0) * mn = 0 THEN CAST('infinity' AS DOUBLE)
             ELSE 30.0 * ((mx - mn) / ((basemag - 1.0) * mn))
        END AS maybe
    FROM (
        SELECT *,
            greatest(
                CASE WHEN mn < 0.1 THEN 4.8
                     ELSE exp(-0.17949 * ln(mn) + 1.13489) END,
                1.1) AS basemag
        FROM (
            SELECT *, greatest(a, b) AS mx, least(a, b) AS mn FROM aligned
        )
    )
)
SELECT 'mode_events' AS event_type, conv_id, tool, role,
    CAST(CASE WHEN maybe < 1 THEN 1
              WHEN maybe > 100 THEN 100
              ELSE trunc(maybe) END AS INTEGER) AS severity,
    ts,
    CAST(0 AS BIGINT) AS detection_latency_us,
    'Mode changed from ' || l_prev || ' to ' || primary_val || '!'
        AS description
FROM curved
"""
    return with_transcripts(body)


def _spike_walk_cte(
    lag: int, threshold: float, influence: float, purge_s: int
) -> str:
    """Recursive-CTE replay of the SpikeDetector state machine (kernel
    functions/detectors.spike_events / spike_details; reference
    detectors/spike/SpikeDetector.scala:113-190 + SmoothedZScore.scala).

    Unlike the other detector oracles, the smoothed z-score is a true
    recurrence — signalled points are written back damped, so every
    filtered value depends on all previous signal decisions. The CTE
    advances every series one point per iteration, carrying exactly the
    kernel's state: the damped window, the running sum / sum-of-squares
    updated in the same IEEE operation order (push, evict, and the exact
    left-fold refresh every 128 ops), and the pre-push mean/std each
    decision and detail record is taken against. Because every float op
    is replayed in kernel order, the emitted mean/std are bit-identical,
    not merely decision-equal.
    """
    purge_us = purge_s * 1_000_000
    inf_r = repr(float(influence))
    one_minus = repr(1.0 - float(influence))
    return f"""
, pts AS (
    SELECT conv_id, tool, role, ts, epoch_us(ts) AS ts_us,
        CAST(value AS DOUBLE) AS value,
        row_number() OVER (
            PARTITION BY conv_id, tool, role ORDER BY ts, turn_idx
        ) AS pos
    FROM transcripts
),
walk AS (
    SELECT conv_id, tool, role, CAST(0 AS BIGINT) AS pos,
        CAST(NULL AS BIGINT) AS last_obs,
        CAST(NULL AS DOUBLE) AS last_val,
        CAST([] AS DOUBLE[]) AS hist,
        CAST(0.0 AS DOUBLE) AS s1, CAST(0.0 AS DOUBLE) AS s2,
        CAST(0 AS INTEGER) AS ops,
        CAST(NULL AS DOUBLE) AS mean, CAST(NULL AS DOUBLE) AS std,
        CAST(NULL AS TIMESTAMP) AS p_ts, CAST(NULL AS DOUBLE) AS x,
        CAST(0 AS INTEGER) AS sig, FALSE AS kept,
        CAST(NULL AS DOUBLE) AS pmean, CAST(NULL AS DOUBLE) AS pstd,
        CAST(NULL AS DOUBLE) AS pval
    FROM (SELECT DISTINCT conv_id, tool, role FROM pts)
    UNION ALL
    SELECT conv_id, tool, role, pos, tus AS last_obs,
        CASE WHEN is_reset THEN x
             WHEN skip THEN w_last_val ELSE x END AS last_val,
        CASE WHEN is_reset THEN CAST([] AS DOUBLE[])
             WHEN skip THEN w_hist ELSE h3 END AS hist,
        CASE WHEN is_reset THEN 0.0 WHEN skip THEN w_s1
             WHEN refresh THEN list_reduce(h3, (a, b) -> a + b)
             ELSE s1b END AS s1,
        CASE WHEN is_reset THEN 0.0 WHEN skip THEN w_s2
             WHEN refresh THEN list_reduce(
                 list_transform(h3, h -> h * h), (a, b) -> a + b)
             ELSE s2b END AS s2,
        CASE WHEN is_reset THEN 0 WHEN skip THEN w_ops
             WHEN refresh THEN 0 ELSE w_ops + 1 END AS ops,
        CASE WHEN is_reset THEN CAST(NULL AS DOUBLE) WHEN skip THEN w_mean
             ELSE (CASE WHEN refresh
                        THEN list_reduce(h3, (a, b) -> a + b)
                        ELSE s1b END) / len(h3) END AS mean,
        CASE WHEN is_reset THEN CAST(NULL AS DOUBLE) WHEN skip THEN w_std
             ELSE sqrt(greatest(
                 (CASE WHEN refresh THEN list_reduce(
                          list_transform(h3, h -> h * h), (a, b) -> a + b)
                       ELSE s2b END) / len(h3)
                 - ((CASE WHEN refresh
                          THEN list_reduce(h3, (a, b) -> a + b)
                          ELSE s1b END) / len(h3))
                   * ((CASE WHEN refresh
                            THEN list_reduce(h3, (a, b) -> a + b)
                            ELSE s1b END) / len(h3)),
                 0.0)) END AS std,
        p_ts, x,
        CASE WHEN is_reset OR skip THEN 0 ELSE sig END AS sig,
        (NOT is_reset AND NOT skip) AS kept,
        w_mean AS pmean, w_std AS pstd, w_last_val AS pval
    FROM (
        SELECT *,
            list_append(w_hist, pushed) AS h2,
            w_s1 + pushed AS s1a,
            w_s2 + pushed * pushed AS s2a,
            (w_ops + 1 >= 128) AS refresh
        FROM (
            SELECT *,
                CASE WHEN sig <> 0
                     THEN {inf_r} * x + {one_minus} * w_hist[len(w_hist)]
                     ELSE x END AS pushed
            FROM (
                SELECT p.conv_id, p.tool, p.role, p.pos, p.ts AS p_ts,
                    p.ts_us AS tus, p.value AS x,
                    w.last_obs AS w_last_obs, w.last_val AS w_last_val,
                    w.hist AS w_hist, w.s1 AS w_s1, w.s2 AS w_s2,
                    w.ops AS w_ops, w.mean AS w_mean, w.std AS w_std,
                    (w.last_obs IS NULL
                     OR p.ts_us - w.last_obs > {purge_us}) AS is_reset,
                    (NOT (w.last_obs IS NULL
                          OR p.ts_us - w.last_obs > {purge_us})
                     AND p.value IS NULL) AS skip,
                    CASE WHEN len(w.hist) >= {lag}
                              AND coalesce(
                                  abs(p.value - w.mean)
                                  > {threshold!r} * w.std, FALSE)
                         THEN CASE WHEN p.value > w.mean THEN 1 ELSE -1 END
                         ELSE 0 END AS sig
                FROM walk w
                JOIN pts p
                  ON p.conv_id = w.conv_id AND p.tool = w.tool
                 AND p.role = w.role AND p.pos = w.pos + 1
            )
        )
    ) stepped
    CROSS JOIN LATERAL (
        SELECT CASE WHEN len(h2) > {lag}
                    THEN list_slice(h2, 2, len(h2)) ELSE h2 END AS h3,
               CASE WHEN len(h2) > {lag} THEN s1a - h2[1] ELSE s1a END AS s1b,
               CASE WHEN len(h2) > {lag} THEN s2a - h2[1] * h2[1]
                    ELSE s2a END AS s2b
    ) ev
)"""


_SEVERITY_SQL = """
    CAST(CASE WHEN maybe < 1 THEN 1
              WHEN maybe > 100 THEN 100
              ELSE trunc(maybe) END AS INTEGER)"""


def spike_events_oracle(
    lag: int = 50,
    threshold: float = 50.0,
    influence: float = 0.01,
    purge_s: int = 60,
) -> str:
    """SpikeDetector events via the recursive spike walk; severity is the
    events/Event.scala:144-201 log-curve over (previous non-lossy value,
    spiking value) — both raw inputs, so it is exact by construction."""
    walk = _spike_walk_cte(lag, threshold, influence, purge_s)
    body = f"""{walk}
, hits AS (
    SELECT conv_id, tool, role, p_ts, sig,
        least(pval, x) AS mn, greatest(pval, x) AS mx
    FROM walk WHERE sig <> 0
),
curved AS (
    SELECT *,
        CASE WHEN (basemag - 1.0) * mn = 0 THEN CAST('infinity' AS DOUBLE)
             ELSE 30.0 * ((mx - mn) / ((basemag - 1.0) * mn))
        END AS maybe
    FROM (
        SELECT *,
            greatest(
                CASE WHEN mn < 0.1 THEN 4.8
                     ELSE exp(-0.17949 * ln(mn) + 1.13489) END,
                1.1) AS basemag
        FROM hits
    )
)
SELECT 'spike_events' AS event_type, conv_id, tool, role,
    {_SEVERITY_SQL} AS severity,
    p_ts AS ts,
    CAST(0 AS BIGINT) AS detection_latency_us,
    CASE WHEN sig > 0 THEN 'Positive' ELSE 'Negative' END AS description
FROM curved
"""
    return with_transcripts(body).replace(
        "WITH transcripts", "WITH RECURSIVE transcripts", 1
    )


def spike_details_oracle(
    lag: int = 50,
    threshold: float = 50.0,
    influence: float = 0.01,
    purge_s: int = 60,
) -> str:
    """SpikeDetector's per-point detail side-output via the recursive
    spike walk: one row per processed non-lossy point with the signal and
    the pre-push mean/std, bit-identical to the kernel because the walk
    replays its float ops in order."""
    walk = _spike_walk_cte(lag, threshold, influence, purge_s)
    body = f"""{walk}
SELECT conv_id, tool, role, p_ts AS ts, x AS value,
    CAST(sig AS INTEGER) AS signal, pmean AS mean, pstd AS std
FROM walk WHERE kept
"""
    return with_transcripts(body).replace(
        "WITH transcripts", "WITH RECURSIVE transcripts", 1
    )


def _np_sum(lst: str) -> str:
    """NumPy pairwise-sum replica for lists of length <= 8: a plain
    left fold below 8 elements, and at exactly 8 the pairwise base case
    ((a1+a2)+(a3+a4))+((a5+a6)+(a7+a8)). The changepoint oracle guards
    max_history <= 8 so these are the only two shapes np.sum takes."""
    tree = (
        f"((({lst}[1]+{lst}[2])+({lst}[3]+{lst}[4]))"
        f"+(({lst}[5]+{lst}[6])+({lst}[7]+{lst}[8])))"
    )
    return (
        f"(CASE WHEN len({lst}) = 0 THEN 0.0 "
        f"WHEN len({lst}) < 8 THEN list_reduce({lst}, (a, b) -> a + b) "
        f"ELSE {tree} END)"
    )


def _np_argmax0(lst: str) -> str:
    """np.argmax (first max, 0-based) over a DuckDB list; assumes the
    list is non-empty."""
    return f"(list_position({lst}, list_aggregate({lst}, 'max')) - 1)"


def _cp_fargmax(lst: str) -> str:
    """ChangepointLogic's filtered argmax: argmax over all but the last
    (oldest) run; 0 for a single-element list."""
    head = f"list_slice({lst}, 1, len({lst}) - 1)"
    return (
        f"(CASE WHEN len({lst}) > 1 THEN {_np_argmax0(head)} ELSE 0 END)"
    )


def _cp_update_levels(
    pfx: str, m: str, v: str, n: str, pr: str, st: str, mh: int
) -> list[str]:
    """SQL levels for one ChangepointProcessor runs_update(y, tus)
    application to run-state lists (m, v, n, pr, st), producing columns
    {pfx}m {pfx}v {pfx}n {pfx}p {pfx}s. Each returned string is a
    SELECT-* wrapper layer; every float op mirrors the kernel's NumPy
    expression order so results are bit-identical."""
    # NormalDistribution.pdf with the zero-variance guard
    sv = f"(CASE WHEN abs({v}[i]) <= 1e-15 THEN y / 100.0 ELSE {v}[i] END)"
    pdf = (
        f"(1.0 / (sqrt(2.0 * pi()) * sqrt({sv})))"
        f" * exp((-((y - {m}[i]) * (y - {m}[i]))) / (2.0 * {sv}))"
    )
    # withPoint with the faked n=0 on the first mean update; new_n = i
    fk = "(CASE WHEN i = 1 THEN 0.0 ELSE CAST(i AS DOUBLE) END)"
    nmean = f"(({m}[i] * {fk} + y) / ({fk} + 1.0))"
    nvar = (
        f"(({v}[i] * CAST(i AS DOUBLE)"
        f" + (y - {nmean}) * (y - {m}[i])) / (CAST(i AS DOUBLE) + 1.0))"
    )
    lvl_a = f"""SELECT *,
        len({m}) AS {pfx}_k,
        list_transform(range(1, len({m}) + 1), i -> {pdf}) AS {pfx}_pdfs"""
    lvl_b = f"""SELECT *,
        list_transform(range(1, {pfx}_k + 1),
            i -> {pfx}_pdfs[i] * {pr}[i]) AS {pfx}_pp"""
    lvl_c = f"""SELECT *,
        CASE WHEN {pfx}_k = 0 THEN 0.0
             ELSE {_np_sum(pfx + "_pp")} * (1.0 / 200.0) END AS {pfx}_rem,
        list_transform(range(1, {pfx}_k + 1), i -> {nmean}) AS {pfx}_um,
        list_transform(range(1, {pfx}_k + 1), i -> {nvar}) AS {pfx}_uv,
        list_transform(range(1, {pfx}_k + 1),
            i -> {pfx}_pp[i] * (1.0 - 1.0 / 200.0)) AS {pfx}_up"""
    # prepend the fresh run; NormalDistribution(0, 1e8).withPoint(y, 1)
    # variance collapses to the constant 5e7 for any finite y
    lvl_d = f"""SELECT *,
        list_prepend(y, {pfx}_um) AS {pfx}_m2,
        list_prepend(CAST(50000000.0 AS DOUBLE), {pfx}_uv) AS {pfx}_v2,
        list_prepend(CAST(1 AS BIGINT),
            range(1, {pfx}_k + 1)) AS {pfx}_n2,
        list_prepend({pfx}_rem, {pfx}_up) AS {pfx}_p2,
        list_prepend(tus, {st}) AS {pfx}_s2"""
    # squash (at most one element past max_history per update):
    # prob[-2] += prob[-1], then drop the last run
    lvl_e = f"""SELECT *,
        CASE WHEN len({pfx}_m2) > {mh}
             THEN list_slice({pfx}_m2, 1, {mh}) ELSE {pfx}_m2 END AS {pfx}m,
        CASE WHEN len({pfx}_m2) > {mh}
             THEN list_slice({pfx}_v2, 1, {mh}) ELSE {pfx}_v2 END AS {pfx}v,
        CASE WHEN len({pfx}_m2) > {mh}
             THEN list_slice({pfx}_n2, 1, {mh}) ELSE {pfx}_n2 END AS {pfx}n,
        CASE WHEN len({pfx}_m2) > {mh}
             THEN list_slice({pfx}_s2, 1, {mh}) ELSE {pfx}_s2 END AS {pfx}s,
        CASE WHEN len({pfx}_m2) > {mh}
             THEN list_append(
                 list_slice({pfx}_p2, 1, len({pfx}_p2) - 2),
                 {pfx}_p2[len({pfx}_p2) - 1] + {pfx}_p2[len({pfx}_p2)])
             ELSE {pfx}_p2 END AS {pfx}_p3"""
    lvl_f = f"""SELECT *, {_np_sum(pfx + "_p3")} AS {pfx}_tot"""
    lvl_g = f"""SELECT *,
        CASE WHEN {pfx}_tot = 0.0
             THEN list_transform(range(1, len({pfx}_p3) + 1),
                 i -> CASE WHEN i = 1 THEN 1.0 ELSE 0.0 END)
             ELSE list_transform({pfx}_p3, x -> x / {pfx}_tot)
        END AS {pfx}p"""
    return [lvl_a, lvl_b, lvl_c, lvl_d, lvl_e, lvl_f, lvl_g]


def changepoint_events_oracle(
    max_history: int = 60,
    trigger_count: int = 40,
    ignore_outlier_normal_count: int = 1,
    purge_s: int = 60,
    minimum_event_interval_s: int = 10,
    severity_threshold: int = 30,
    value_expr: str = "value",
) -> str:
    """Bayesian online changepoint detection as a recursive-CTE replay
    (kernel functions/detectors.changepoint_events; reference
    ChangepointProcessor.scala:240-364 + ChangepointLogic.scala:107-178
    + NormalDistribution.scala:46-94).

    The CTE advances every series one point per iteration carrying the
    full processor state: the run arrays (mean/var/n/prob/start, newest
    first), the frozen 'normal' snapshot, the composite-old pair, the
    anomaly/outlier counters, and the event-interval clock. Each step
    computes runs_update twice — once on the live runs, once on the
    snapshot (used only on outlier rollback) — with every float op in
    the kernel's NumPy order, including np.sum's pairwise base case
    (left fold under 8 elements, tree order at exactly 8); hence the
    ``max_history <= 8`` guard. ``value_expr`` lets the caller apply the
    same value transform the Spark query applies (the demo query embeds
    a level shift).
    """
    if max_history > 8:
        raise ValueError(
            "oracle replays np.sum's <=8-element base case only; "
            "max_history > 8 would need full pairwise summation"
        )
    mh = max_history
    purge_us = purge_s * 1_000_000
    min_iv_us = minimum_event_interval_s * 1_000_000
    gap = (
        f"(w.last_obs IS NULL OR tus - w.last_obs > {purge_us})"
        if purge_s > 0
        else "(w.last_obs IS NULL)"
    )
    empty_d = "CAST([] AS DOUBLE[])"
    empty_b = "CAST([] AS BIGINT[])"

    u1 = _cp_update_levels("u1", "w_rm", "w_rv", "w_rn_", "w_rp", "w_rs", mh)
    u2 = _cp_update_levels("u2", "e_nm", "e_nv", "e_nn_", "e_np_", "e_ns", mh)

    # pdf of y against the POST-update runs (outlier test)
    sv2 = "(CASE WHEN abs(u1v[i]) <= 1e-15 THEN y / 100.0 ELSE u1v[i] END)"
    pdf2 = (
        f"(1.0 / (sqrt(2.0 * pi()) * sqrt({sv2})))"
        f" * exp((-((y - u1m[i]) * (y - u1m[i]))) / (2.0 * {sv2}))"
    )

    # Python negative indexing for start[prev_most_likely]
    pyidx = (
        "(CASE WHEN pml_c >= 0 THEN pml_c + 1"
        " ELSE len(w_rs) + pml_c + 1 END)"
    )

    join_lvl = f"""SELECT
        p.conv_id, p.tool, p.role, p.pos, p.ts AS p_ts, p.ts_us AS tus,
        p.y AS y,
        w.rm AS w_rm, w.rv AS w_rv, w.rn_ AS w_rn_, w.rp AS w_rp,
        w.rs AS w_rs,
        w.nm AS w_nm, w.nv AS w_nv, w.nn_ AS w_nn_, w.np_ AS w_np_,
        w.ns AS w_ns,
        w.co_mean AS w_co_mean, w.co_start AS w_co_start,
        w.ca AS w_ca, w.cno AS w_cno, w.pml AS w_pml,
        w.last_obs AS w_last_obs, w.last_ev AS w_last_ev,
        (p.y IS NULL) AS skipnan,
        (p.y IS NOT NULL AND {gap}) AS is_reset,
        (p.y IS NOT NULL AND NOT {gap}) AS active
    FROM walk w
    JOIN pts p
      ON p.conv_id = w.conv_id AND p.tool = w.tool AND p.role = w.role
     AND p.pos = w.pos + 1"""

    snap_lvl = f"""SELECT *,
        CASE WHEN w_pml >= len(w_rm) THEN len(w_rm) - 1 ELSE w_pml END
            AS pml_c,
        (active AND w_ca = 0) AS snap
    FROM __t"""

    eff_lvl = f"""SELECT *,
        CASE WHEN snap THEN w_rm ELSE w_nm END AS e_nm,
        CASE WHEN snap THEN w_rv ELSE w_nv END AS e_nv,
        CASE WHEN snap THEN w_rn_ ELSE w_nn_ END AS e_nn_,
        CASE WHEN snap THEN w_rp ELSE w_np_ END AS e_np_,
        CASE WHEN snap THEN w_rs ELSE w_ns END AS e_ns,
        CASE WHEN snap THEN
            CASE WHEN len(w_rm) > 0
                 THEN w_rm[{_cp_fargmax("w_rn_")} + 1] ELSE 0.0 END
        ELSE w_co_mean END AS co_mean_e,
        CASE WHEN snap THEN
            CASE WHEN len(w_rm) > 0 THEN w_rs[{pyidx}] ELSE 0 END
        ELSE w_co_start END AS co_start_e
    FROM __t"""

    branch_lvl = f"""SELECT *,
        {_cp_fargmax("u1p")} AS ml,
        list_transform(range(1, len(u1m) + 1), i -> {pdf2}) AS pdfs2
    FROM __t"""

    branch2_lvl = f"""SELECT *,
        (active AND ml <> pml_c) AS anomaly,
        {_cp_fargmax("pdfs2")} AS hp
    FROM __t"""

    branch3_lvl = f"""SELECT *,
        (anomaly AND hp = len(u1m) - 2) AS outlier_path,
        CASE WHEN anomaly THEN w_ca + 1 ELSE 0 END AS ca1
    FROM __t"""

    branch4_lvl = f"""SELECT *,
        (outlier_path
         AND w_cno + 1 > {ignore_outlier_normal_count}) AS rollback,
        CASE WHEN NOT active THEN w_cno
             WHEN anomaly THEN
                 CASE WHEN outlier_path THEN w_cno + 1 ELSE 0 END
             ELSE 0 END AS cno1,
        (active AND NOT (outlier_path
            AND w_cno + 1 > {ignore_outlier_normal_count})
         AND CASE WHEN anomaly THEN w_ca + 1 ELSE 0 END
             > {trigger_count}) AS trigger_,
        u1m[list_position(u1n, 1)] AS new_mean_t
    FROM __t"""

    # change_magnitude_severity(co_mean_e, new_mean_t), inline
    sev_lvl = f"""SELECT *,
        least(co_mean_e, new_mean_t) AS sev_mn,
        greatest(co_mean_e, new_mean_t) AS sev_mx
    FROM __t"""
    sev2_lvl = """SELECT *,
        greatest(
            CASE WHEN sev_mn < 0.1 THEN 4.8
                 ELSE exp(-0.17949 * ln(sev_mn) + 1.13489) END,
            1.1) AS sev_bm
    FROM __t"""
    sev3_lvl = """SELECT *,
        CASE WHEN (sev_bm - 1.0) * sev_mn = 0
             THEN CAST('infinity' AS DOUBLE)
             ELSE 30.0 * ((sev_mx - sev_mn) / ((sev_bm - 1.0) * sev_mn))
        END AS sev_maybe
    FROM __t"""
    sev4_lvl = f"""SELECT *,
        CAST(CASE WHEN sev_maybe < 1 THEN 1
                  WHEN sev_maybe > 100 THEN 100
                  ELSE trunc(sev_maybe) END AS INTEGER) AS sev_t,
        (trigger_ AND CAST(CASE WHEN sev_maybe < 1 THEN 1
                  WHEN sev_maybe > 100 THEN 100
                  ELSE trunc(sev_maybe) END AS INTEGER)
             > {severity_threshold}) AS resetting
    FROM __t"""

    final_lvl = f"""SELECT conv_id, tool, role, pos,
        CASE WHEN skipnan THEN w_rm WHEN is_reset THEN {empty_d}
             WHEN rollback THEN u2m WHEN resetting THEN {empty_d}
             ELSE u1m END AS rm,
        CASE WHEN skipnan THEN w_rv WHEN is_reset THEN {empty_d}
             WHEN rollback THEN u2v WHEN resetting THEN {empty_d}
             ELSE u1v END AS rv,
        CASE WHEN skipnan THEN w_rn_ WHEN is_reset THEN {empty_b}
             WHEN rollback THEN u2n WHEN resetting THEN {empty_b}
             ELSE u1n END AS rn_,
        CASE WHEN skipnan THEN w_rp WHEN is_reset THEN {empty_d}
             WHEN rollback THEN u2p WHEN resetting THEN {empty_d}
             ELSE u1p END AS rp,
        CASE WHEN skipnan THEN w_rs WHEN is_reset THEN {empty_b}
             WHEN rollback THEN u2s WHEN resetting THEN {empty_b}
             ELSE u1s END AS rs,
        CASE WHEN skipnan THEN w_nm WHEN is_reset THEN {empty_d}
             WHEN resetting THEN {empty_d} ELSE e_nm END AS nm,
        CASE WHEN skipnan THEN w_nv WHEN is_reset THEN {empty_d}
             WHEN resetting THEN {empty_d} ELSE e_nv END AS nv,
        CASE WHEN skipnan THEN w_nn_ WHEN is_reset THEN {empty_b}
             WHEN resetting THEN {empty_b} ELSE e_nn_ END AS nn_,
        CASE WHEN skipnan THEN w_np_ WHEN is_reset THEN {empty_d}
             WHEN resetting THEN {empty_d} ELSE e_np_ END AS np_,
        CASE WHEN skipnan THEN w_ns WHEN is_reset THEN {empty_b}
             WHEN resetting THEN {empty_b} ELSE e_ns END AS ns,
        CASE WHEN skipnan THEN w_co_mean
             WHEN is_reset OR resetting THEN 0.0
             ELSE co_mean_e END AS co_mean,
        CASE WHEN skipnan THEN w_co_start
             WHEN is_reset OR resetting THEN 0
             ELSE co_start_e END AS co_start,
        CASE WHEN skipnan THEN w_ca
             WHEN is_reset OR resetting OR rollback THEN 0
             WHEN trigger_ AND NOT resetting THEN 0
             ELSE ca1 END AS ca,
        CASE WHEN skipnan THEN w_cno
             WHEN is_reset OR resetting OR rollback THEN 0
             ELSE cno1 END AS cno,
        CASE WHEN skipnan THEN w_pml
             WHEN is_reset OR resetting THEN 0
             WHEN rollback THEN pml_c
             ELSE ml END AS pml,
        CASE WHEN skipnan THEN w_last_obs ELSE tus END AS last_obs,
        CASE WHEN resetting AND (w_last_ev IS NULL
                 OR tus - w_last_ev > {min_iv_us})
             THEN tus ELSE w_last_ev END AS last_ev,
        (resetting AND (w_last_ev IS NULL
            OR tus - w_last_ev > {min_iv_us})) AS emit,
        p_ts, sev_t AS e_sev,
        tus - co_start_e AS e_lat,
        co_mean_e AS e_old, new_mean_t AS e_new
    FROM __t"""

    levels = (
        [join_lvl, snap_lvl, eff_lvl]
        + u1
        + u2
        + [branch_lvl, branch2_lvl, branch3_lvl, branch4_lvl,
           sev_lvl, sev2_lvl, sev3_lvl, sev4_lvl, final_lvl]
    )
    # nest the levels: innermost first
    rec = levels[0]
    for lvl in levels[1:]:
        if "__t" not in lvl:
            lvl = lvl + "\n    FROM __t"
        rec = lvl.replace("__t", f"(\n{rec}\n)")

    body = f"""
, pts AS (
    SELECT conv_id, tool, role, ts, epoch_us(ts) AS ts_us,
        CAST({value_expr} AS DOUBLE) AS y,
        row_number() OVER (
            PARTITION BY conv_id, tool, role ORDER BY ts, turn_idx
        ) AS pos
    FROM transcripts
),
walk AS (
    SELECT conv_id, tool, role, CAST(0 AS BIGINT) AS pos,
        {empty_d} AS rm, {empty_d} AS rv, {empty_b} AS rn_,
        {empty_d} AS rp, {empty_b} AS rs,
        {empty_d} AS nm, {empty_d} AS nv, {empty_b} AS nn_,
        {empty_d} AS np_, {empty_b} AS ns,
        CAST(0.0 AS DOUBLE) AS co_mean, CAST(0 AS BIGINT) AS co_start,
        CAST(0 AS INTEGER) AS ca, CAST(0 AS INTEGER) AS cno,
        CAST(0 AS INTEGER) AS pml,
        CAST(NULL AS BIGINT) AS last_obs, CAST(NULL AS BIGINT) AS last_ev,
        FALSE AS emit, CAST(NULL AS TIMESTAMP) AS p_ts,
        CAST(NULL AS INTEGER) AS e_sev, CAST(NULL AS BIGINT) AS e_lat,
        CAST(NULL AS DOUBLE) AS e_old, CAST(NULL AS DOUBLE) AS e_new
    FROM (SELECT DISTINCT conv_id, tool, role FROM pts)
    UNION ALL
    {rec}
)
SELECT 'changepoint_events' AS event_type, conv_id, tool, role,
    e_sev AS severity, p_ts AS ts,
    CAST(e_lat AS BIGINT) AS detection_latency_us,
    'Latency ' || (CASE WHEN e_old > e_new THEN 'decreased'
                        ELSE 'increased' END)
        || ' from ' || CAST(trunc(e_old) AS BIGINT)
        || ' to ' || CAST(trunc(e_new) AS BIGINT) AS description
FROM walk WHERE emit
"""
    return with_transcripts(body).replace(
        "WITH transcripts", "WITH RECURSIVE transcripts", 1
    )


def stream_event_groups_oracle(
    threshold: float = 100.0, gap_s: int = 10
) -> str:
    """Per-series session grouping: gaps-and-islands with the session-
    window merge rule (merge while consecutive events are strictly less
    than gap apart; group_end = last event + gap, mirroring Spark's
    session_window.end)."""
    gap_us = gap_s * 1_000_000
    return with_transcripts(f"""
, ev AS (
    SELECT conv_id, tool, role, ts, epoch_us(ts) AS ts_us,
           CAST(floor(value * 1e6) AS BIGINT) AS val_q
    FROM transcripts WHERE value > {threshold}
),
brk AS (
    SELECT *, CASE WHEN ts_us - lag(ts_us) OVER (
            PARTITION BY conv_id, tool, role ORDER BY ts_us
        ) < {gap_us} THEN 0 ELSE 1 END AS is_new
    FROM ev
),
isl AS (
    SELECT *, sum(is_new) OVER (
            PARTITION BY conv_id, tool, role ORDER BY ts_us
            ROWS UNBOUNDED PRECEDING
        ) AS gid
    FROM brk
)
SELECT conv_id, tool, role,
       min(ts) AS group_start,
       max(ts) + INTERVAL '{gap_s} seconds' AS group_end,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(val_q) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1e6
           AS val_avg
FROM isl GROUP BY conv_id, tool, role, gid
""")


def line_protocol_parse_oracle() -> str:
    """Expected output of parse_line_protocol over synth_line_protocol:
    regenerated directly from the generating grammar (no SQL string
    parsing) — the gate therefore checks parse(print(x)) == x,
    including every whole-line rejection class (an entry without '=',
    an '=' inside a quoted value, a wrong space-part count) and the
    ns->ms timestamp truncation."""
    return """
WITH base AS (
    SELECT event_id FROM events
    WHERE event_id % 13 != 0 AND event_id % 17 != 0
      AND event_id % 19 != 0
),
rows_ AS (
    SELECT event_id AS line_id, 'tag' AS kind, 'stream' AS key,
           CAST(event_id % 7 AS VARCHAR) AS val
    FROM base
    UNION ALL
    SELECT event_id, 'tag', 'host',
           concat('"srv, ', event_id % 5, '"')
    FROM base WHERE event_id % 4 = 0
    UNION ALL
    SELECT event_id, 'field', 'count', concat(event_id % 100, 'i')
    FROM base
    UNION ALL
    SELECT event_id, 'field', 'latency',
           concat(event_id % 50, '.', event_id % 4)
    FROM base
    UNION ALL
    SELECT event_id, 'field', 'msg', concat('"ok ', event_id % 2, '"')
    FROM base
)
SELECT line_id, concat('m', line_id % 3) AS measurement, kind,
       "key", val,
       make_timestamp((line_id * 1000 + 123) * 1000) AS time
FROM rows_
"""


def lttb_oracle(n_out: int = 64) -> str:
    """Recursive-CTE replay of the LTTB greedy walk
    (operators/downsample.lttb_select): per big series, bucket the
    interior points with the closed-form bucket id, precompute next-
    bucket average anchors from exact integer sums, then walk buckets
    left-to-right picking the max-triangle-area point via a NOT-EXISTS
    argmax (ties -> smaller (ts, turn_idx)). The area expression is the
    byte-identical operand order of the numpy kernel."""
    B = n_out - 2

    def area(cx: str, cy: str) -> str:
        # abs((px-ax)*(cy-py) - (px-cx)*(ay-py)); px/py from the walk,
        # ax/ay from the anchor relation
        return (
            f"abs((w.sx - a.bx) * (CAST({cy} AS DOUBLE) - w.sy)"
            f" - (w.sx - CAST({cx} AS DOUBLE)) * (a.by_ - w.sy))"
        )

    a_c = area("c.x", "c.y")
    a_c2 = area("c2.x", "c2.y")
    body = f"""
, pts AS (
    SELECT conv_id, tool, role, turn_idx, ts, value,
           epoch_us(ts) AS x,
           CAST(floor(value * 1000000) AS BIGINT) AS y,
           row_number() OVER (
               PARTITION BY conv_id, tool, role ORDER BY ts, turn_idx
           ) - 1 AS i,
           count(*) OVER (PARTITION BY conv_id, tool, role) AS n
    FROM transcripts WHERE value IS NOT NULL
),
small AS (
    SELECT conv_id, tool, role, ts, value FROM pts WHERE n <= {n_out}
),
big AS (SELECT * FROM pts WHERE n > {n_out}),
interior AS (
    SELECT *, (i * {B} + n - 3) // (n - 2) - 1 AS k
    FROM big WHERE i >= 1 AND i <= n - 2
),
buckets AS (
    -- rebased-by-bucket-min anchor averages, the identical operand
    -- order of the numpy kernel: double(min) + double(sum(v - min)) /
    -- double(count). Raw epoch-us sums are exact HUGEINT here but
    -- would wrap int64 in the kernel once a bucket holds ~5000
    -- points; rebasing keeps both engines exact and bit-identical.
    SELECT conv_id, tool, role, k,
           CAST(min(x) AS DOUBLE)
             + CAST(sum(x - minx) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS bx,
           CAST(min(y) AS DOUBLE)
             + CAST(sum(y - miny) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS by_
    FROM (
        SELECT *,
               min(x) OVER (
                   PARTITION BY conv_id, tool, role, k) AS minx,
               min(y) OVER (
                   PARTITION BY conv_id, tool, role, k) AS miny
        FROM interior
    ) GROUP BY conv_id, tool, role, k
),
anchors AS (
    SELECT conv_id, tool, role, k - 1 AS k, bx, by_
    FROM buckets WHERE k >= 1
    UNION ALL
    SELECT conv_id, tool, role, {B} - 1 AS k,
           CAST(x AS DOUBLE) AS bx, CAST(y AS DOUBLE) AS by_
    FROM big WHERE i = n - 1
),
walk AS (
    WITH RECURSIVE w0(conv_id, tool, role, k, ts, value, sx, sy) AS (
        SELECT conv_id, tool, role, -1, ts, value,
               CAST(x AS DOUBLE), CAST(y AS DOUBLE)
        FROM big WHERE i = 0
        UNION ALL
        SELECT c.conv_id, c.tool, c.role, c.k, c.ts, c.value,
               CAST(c.x AS DOUBLE), CAST(c.y AS DOUBLE)
        FROM w0 w
        JOIN interior c ON c.conv_id = w.conv_id AND c.tool = w.tool
             AND c.role = w.role AND c.k = w.k + 1
        JOIN anchors a ON a.conv_id = c.conv_id AND a.tool = c.tool
             AND a.role = c.role AND a.k = c.k
        WHERE NOT EXISTS (
            SELECT 1 FROM interior c2
            WHERE c2.conv_id = c.conv_id AND c2.tool = c.tool
              AND c2.role = c.role AND c2.k = c.k
              AND ({a_c2} > {a_c}
                   OR ({a_c2} = {a_c}
                       AND (c2.ts < c.ts
                            OR (c2.ts = c.ts
                                AND c2.turn_idx < c.turn_idx))))
        )
    )
    SELECT * FROM w0
)
SELECT conv_id, tool, role, ts, value FROM walk
UNION ALL
SELECT conv_id, tool, role, ts, value FROM big WHERE i = n - 1
UNION ALL
SELECT conv_id, tool, role, ts, value FROM small
"""
    return with_transcripts(body)


def m4_oracle(width_us: int = 3_600_000_000) -> str:
    """Mirror of operators/downsample.downsample_m4: per series and
    tumbling ``width_us`` bucket, the DISTINCT point set of the four
    ROW_NUMBER argext picks (first/last by (x, turn_idx); bottom/top by
    (y, x, turn_idx) on the floor(value*1e6) int64 quantization) —
    identical total orders, so both engines pick identical rows."""
    body = f"""
, pts AS (
    SELECT conv_id, tool, role, turn_idx, ts, value,
           epoch_us(ts) AS x,
           CAST(floor(value * 1000000) AS BIGINT) AS y,
           epoch_us(ts) // {width_us} AS bucket
    FROM transcripts WHERE value IS NOT NULL
), r AS (
    SELECT conv_id, tool, role, bucket, ts, value,
        row_number() OVER (PARTITION BY conv_id, tool, role, bucket
            ORDER BY x, turn_idx) AS rf,
        row_number() OVER (PARTITION BY conv_id, tool, role, bucket
            ORDER BY x DESC, turn_idx DESC) AS rl,
        row_number() OVER (PARTITION BY conv_id, tool, role, bucket
            ORDER BY y, x, turn_idx) AS rb,
        row_number() OVER (PARTITION BY conv_id, tool, role, bucket
            ORDER BY y DESC, x, turn_idx) AS rt
    FROM pts
)
SELECT DISTINCT conv_id, tool, role,
    make_timestamp(bucket * {width_us}) AS bucket_start, ts, value
FROM r WHERE rf = 1 OR rl = 1 OR rb = 1 OR rt = 1
"""
    return with_transcripts(body)


def stream_chunks_closed_oracle(tier: str = "1h") -> str:
    """Expected decode of the streaming chunk writer's drained output
    (streaming/chunk_stream.stream_compress_chunks): exactly the
    non-null points whose chunk bucket precedes the series' final
    (open) bucket."""
    chunk_us = TIERS[tier] * 1_000_000
    body = f"""
, pts AS (
    SELECT conv_id, tool, role, epoch_us(ts) AS ts_us, value,
           (epoch_us(ts) // {chunk_us}) * {chunk_us} AS bk
    FROM transcripts WHERE value IS NOT NULL
),
m AS (
    SELECT conv_id, tool, role, max(bk) AS mb
    FROM pts GROUP BY conv_id, tool, role
)
SELECT p.conv_id, p.tool, p.role, p.ts_us, p.value
FROM pts p JOIN m USING (conv_id, tool, role)
WHERE p.bk < m.mb
"""
    return with_transcripts(body)


# ---------------------------------------------------------------------------
# session analytics + counter rate (operators/sessions.py)
# ---------------------------------------------------------------------------

_SESSIONIZE_CTE = """
g AS (
    SELECT conv_id, turn_idx, role, tool, ts, text,
        CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                  OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us}
             THEN 1 ELSE 0 END AS is_new
    FROM transcripts
    WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
),
s AS (
    SELECT *,
        CAST(sum(is_new) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
            AS INT) AS session_idx
    FROM g
)
"""


def session_stats_oracle(gap_s: int = 1800) -> str:
    """Mirror of operators/sessions.session_stats: gaps-and-islands
    sessionization (gap > gap_s splits) + per-session aggregates.
    duration_s is one exact integer-µs/literal division."""
    body = "," + _SESSIONIZE_CTE.format(gap_us=gap_s * 1_000_000) + """
SELECT conv_id, session_idx,
    CAST(count(*) AS BIGINT) AS n_turns,
    min(ts) AS session_start,
    max(ts) AS session_end,
    CAST(max(epoch_us(ts)) - min(epoch_us(ts)) AS DOUBLE) / 1000000.0
        AS duration_s,
    CAST(sum(CASE WHEN tool <> 'none' THEN 1 ELSE 0 END) AS BIGINT)
        AS n_tool_turns
FROM s GROUP BY conv_id, session_idx
"""
    return with_transcripts(body)


def role_transitions_oracle() -> str:
    """Mirror of operators/sessions.role_transitions."""
    body = """
, b AS (
    SELECT coalesce(lag(role) OVER (PARTITION BY conv_id
        ORDER BY ts, turn_idx), 'START') AS prev_role, role
    FROM transcripts
)
SELECT prev_role, role, CAST(count(*) AS BIGINT) AS n
FROM b GROUP BY prev_role, role
"""
    return with_transcripts(body)


def context_growth_oracle(budget_chars: int = 512) -> str:
    """Mirror of operators/sessions.context_growth."""
    body = f"""
, c AS (
    SELECT conv_id, turn_idx,
        CAST(sum(length(text)) OVER (PARTITION BY conv_id ORDER BY turn_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_chars
    FROM transcripts
)
SELECT conv_id,
    CAST(count(*) AS BIGINT) AS n_turns,
    max(cum_chars) AS total_chars,
    min(CASE WHEN cum_chars > {budget_chars} THEN turn_idx END)
        AS first_over_turn
FROM c GROUP BY conv_id
"""
    return with_transcripts(body)


def counter_rate_oracle(tier: str = "1h", wrap: int = 4096) -> str:
    """Mirror of operators/sessions.counter_rate: wrap-around counter
    from the running text-length sum, PromQL-style reset-aware
    increase + rate per tier bucket."""
    win_us = TIERS[tier] * 1_000_000
    body = f"""
, c AS (
    SELECT conv_id, tool, role, ts, turn_idx,
        CAST(sum(length(text)) OVER w AS BIGINT) % {wrap} AS c
    FROM transcripts
    WINDOW w AS (PARTITION BY conv_id, tool, role ORDER BY ts, turn_idx
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
d AS (
    SELECT conv_id, tool, role, ts, c,
        c - lag(c) OVER (PARTITION BY conv_id, tool, role
            ORDER BY ts, turn_idx) AS d
    FROM c
),
a AS (
    SELECT conv_id, tool, role,
        (epoch_us(ts) // {win_us}) * {win_us} AS w_us,
        CASE WHEN d IS NULL THEN 0 WHEN d < 0 THEN c ELSE d END AS inc,
        CASE WHEN d < 0 THEN 1 ELSE 0 END AS is_reset
    FROM d
)
SELECT conv_id, tool, role,
    make_timestamp(w_us) AS bucket_start,
    CAST(sum(inc) AS BIGINT) AS increase,
    CAST(sum(inc) AS DOUBLE) / {float(TIERS[tier])} AS rate_per_s,
    CAST(sum(is_reset) AS BIGINT) AS n_resets
FROM a GROUP BY conv_id, tool, role, w_us
"""
    return with_transcripts(body)


# ---------------------------------------------------------------------------
# HLL distinct sketches (operators/hll.py)
# ---------------------------------------------------------------------------


def _hll_registers_cte(tier: str, key_col: str = "conv_id") -> str:
    from streamevmon_spark.functions.porthash import hex48_sql

    win_us = TIERS[tier] * 1_000_000
    h = hex48_sql(key_col)
    return f"""
hpts AS (
    SELECT (epoch_us(ts) // {win_us}) * {win_us} AS w_us, tool, role,
        CAST({h} % 64 AS INT) AS reg,
        {h} // 64 AS r
    FROM transcripts
),
regs AS (
    SELECT w_us, tool, role, reg,
        max(CASE WHEN r = 0 THEN 43
                 ELSE 43 - length(bin(r)) END) AS max_rank
    FROM hpts GROUP BY w_us, tool, role, reg
)
"""


def hll_distinct_oracle(tier: str = "1h", key_col: str = "conv_id") -> str:
    """Mirror of operators/hll.hll_distinct: m=64 HLL register state
    collapsed to (v_zero, exact scaled harmonic sum, deterministic raw
    estimate, linear-counting argument, estimator selector). ln() is
    deliberately absent from the hashed columns — JVM Math.log and
    libm log differ in the last ulp (measured)."""
    body = "," + _hll_registers_cte(tier, key_col) + """
SELECT make_timestamp(w_us) AS bucket_start, tool, role,
    CAST(64 AS INT) AS m,
    CAST(64 - count(*) AS INT) AS v_zero,
    CAST(sum(1::BIGINT << (43 - max_rank))
         + (64 - count(*)) * 8796093022208 AS BIGINT) AS s_scaled,
    2.5544417086445452e+16
        / CAST(sum(1::BIGINT << (43 - max_rank))
               + (64 - count(*)) * 8796093022208 AS DOUBLE) AS raw_est,
    CASE WHEN 64 - count(*) > 0
         THEN 64.0 / CAST(64 - count(*) AS DOUBLE) END AS lc_arg,
    CASE WHEN 64 - count(*) > 0
              AND 2.5544417086445452e+16
                  / CAST(sum(1::BIGINT << (43 - max_rank))
                         + (64 - count(*)) * 8796093022208 AS DOUBLE)
                  <= 160.0
         THEN 'linear' ELSE 'raw' END AS estimator
FROM regs GROUP BY w_us, tool, role
"""
    return with_transcripts(body)


def smooth_ewma_oracle(alpha: float = 0.3) -> str:
    """Mirror of operators/smooth.smooth_ewma: the sequential EWMA fold
    replayed as a recursive CTE, one recursion step per point, with the
    identical float operand order (alpha * x + omalpha * sm) so the
    doubles match bit-for-bit. Literals are CAST to DOUBLE (DuckDB
    parses bare decimals as DECIMAL) and omalpha is the Python-computed
    1.0 - alpha double, not a SQL subtraction."""
    a = repr(float(alpha))
    om = repr(1.0 - float(alpha))
    body = f"""
, pts AS (
    SELECT conv_id, tool, role, ts, value,
        row_number() OVER (PARTITION BY conv_id, tool, role
            ORDER BY ts, turn_idx) AS k
    FROM transcripts WHERE value IS NOT NULL
),
walk AS (
    SELECT conv_id, tool, role, ts, k, value, value AS sm
    FROM pts WHERE k = 1
    UNION ALL
    SELECT p.conv_id, p.tool, p.role, p.ts, p.k, p.value,
        CAST({a} AS DOUBLE) * p.value + CAST({om} AS DOUBLE) * w.sm AS sm
    FROM walk w JOIN pts p ON p.conv_id = w.conv_id
        AND p.tool = w.tool AND p.role = w.role AND p.k = w.k + 1
)
SELECT conv_id, tool, role, ts, value, sm AS ewma FROM walk
"""
    return with_transcripts(body).replace(
        "WITH transcripts", "WITH RECURSIVE transcripts", 1
    )


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters (operators/cmsketch.py)
# ---------------------------------------------------------------------------


def cm_topk_oracle(
    tier: str = "1h", k: int = 5, key_col: str = "conv_id"
) -> str:
    """Mirror of operators/cmsketch.cm_heavy_hitters: DEPTH=4 x
    WIDTH=256 count-min counters from the portable md5 hash (row i
    salts the key with the literal 'cm<i>|'), point estimate = min over
    rows, top-k per bucket by (est DESC, key). Counters merge by SUM,
    so the 1d-merged gate query shares this oracle at tier='1d' — the
    direct-from-raw computation IS the merge's equality target.

    All-integer surface: counts, min, row_number — no floats to
    disagree on."""
    from streamevmon_spark.functions.porthash import hex48_sql

    win_us = TIERS[tier] * 1_000_000
    depth, width = 4, 256

    def col_sql(i: int) -> str:
        h = hex48_sql(f"'cm{i}|' || {key_col}")
        return f"CAST({h} % {width} AS INT)"

    cells = "\n    UNION ALL\n".join(
        f"    SELECT w_us, {i} AS rw, {col_sql(i)} AS cl, {key_col}"
        f" FROM base"
        for i in range(depth)
    )
    body = f"""
, base AS (
    SELECT (epoch_us(ts) // {win_us}) * {win_us} AS w_us, {key_col}
    FROM transcripts
),
cells AS (
{cells}
),
counters AS (
    SELECT w_us, rw, cl, count(*) AS cnt FROM cells
    GROUP BY w_us, rw, cl
),
exact AS (
    SELECT w_us, {key_col}, count(*) AS exact_cnt FROM base
    GROUP BY w_us, {key_col}
),
kcells AS (
    SELECT DISTINCT w_us, {key_col}, rw, cl FROM cells
),
est AS (
    SELECT kc.w_us, kc.{key_col}, min(ct.cnt) AS est
    FROM kcells kc
    JOIN counters ct
      ON ct.w_us = kc.w_us AND ct.rw = kc.rw AND ct.cl = kc.cl
    GROUP BY kc.w_us, kc.{key_col}
),
ranked AS (
    SELECT e.w_us, e.{key_col}, e.est, x.exact_cnt,
        row_number() OVER (
            PARTITION BY e.w_us ORDER BY e.est DESC, e.{key_col}
        ) AS rank
    FROM est e
    JOIN exact x ON x.w_us = e.w_us AND x.{key_col} = e.{key_col}
)
SELECT make_timestamp(w_us) AS bucket_start, {key_col}, est, exact_cnt,
    CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""
    return with_transcripts(body)


# ---------------------------------------------------------------------------
# Fixed-boundary latency histograms + histogram_quantile (operators/histo.py)
# ---------------------------------------------------------------------------


def hist_quantile_oracle(tier: str = "1h") -> str:
    """Mirror of operators/histo.hist_quantiles: 8-bucket fixed-le
    latency histogram per (tool, role) x tier bucket, p50/p95 by
    histogram_quantile interpolation. The le-index CASE chain and the
    quantile expression are imported from the operator module and
    evaluated VERBATIM — textual identity is the cross-engine
    bit-exactness argument. Counters merge by SUM, so the 1d-merged
    gate query shares this oracle at tier='1d'."""
    from streamevmon_spark.operators.histo import (
        N_BUCKETS,
        le_idx_sql,
        quantile_sql,
    )

    win_us = TIERS[tier] * 1_000_000
    piv_cols = ",\n        ".join(
        f"CAST(sum(CASE WHEN le_idx = {i} THEN cnt ELSE 0 END)"
        f" AS BIGINT) AS c{i}"
        for i in range(N_BUCKETS)
    )
    total = " + ".join(f"c{i}" for i in range(N_BUCKETS))
    c_list = ", ".join(f"c{i}" for i in range(N_BUCKETS))
    body = f"""
, {_LAT_CTE.strip().rstrip()},
hc AS (
    SELECT (epoch_us(ts) // {win_us}) * {win_us} AS w_us, tool, role,
        CAST({le_idx_sql("lat_us")} AS INT) AS le_idx
    FROM lat WHERE lat_us IS NOT NULL
),
counters AS (
    SELECT w_us, tool, role, le_idx, count(*) AS cnt FROM hc
    GROUP BY w_us, tool, role, le_idx
),
piv AS (
    SELECT w_us, tool, role,
        {piv_cols}
    FROM counters GROUP BY w_us, tool, role
),
tot AS (
    SELECT *, CAST({total} AS BIGINT) AS total FROM piv
)
SELECT make_timestamp(w_us) AS bucket_start, tool, role, total,
    {c_list},
    {quantile_sql(0.5)} AS p50_us,
    {quantile_sql(0.95)} AS p95_us
FROM tot
"""
    return with_transcripts(body)


# ---------------------------------------------------------------------------
# Trend / alerting analytics (operators/trend.py)
# ---------------------------------------------------------------------------


def holt_winters_oracle(sf: float = 0.3, tf: float = 0.1) -> str:
    """Mirror of operators/trend.holt_winters: the sequential Holt fold
    (level_1 = x_1, trend_1 = 0.0; level_k = sf*x + omsf*(s+b), trend_k
    = tf*(level_k - s) + omtf*b) replayed as a recursive CTE with the
    identical float operand order. The level expression is repeated
    verbatim inside the trend expression — recomputing the same IEEE
    ops yields the same double, so no lateral alias is needed."""
    a, oa = repr(float(sf)), repr(1.0 - float(sf))
    b, ob = repr(float(tf)), repr(1.0 - float(tf))
    sm_new = (
        f"(CAST({a} AS DOUBLE) * p.value"
        f" + CAST({oa} AS DOUBLE) * (w.sm + w.tr))"
    )
    body = f"""
, pts AS (
    SELECT conv_id, tool, role, ts, value,
        row_number() OVER (PARTITION BY conv_id, tool, role
            ORDER BY ts, turn_idx) AS k
    FROM transcripts WHERE value IS NOT NULL
),
walk AS (
    SELECT conv_id, tool, role, ts, k, value,
        value AS sm, CAST(0.0 AS DOUBLE) AS tr
    FROM pts WHERE k = 1
    UNION ALL
    SELECT p.conv_id, p.tool, p.role, p.ts, p.k, p.value,
        {sm_new} AS sm,
        CAST({b} AS DOUBLE) * ({sm_new} - w.sm)
            + CAST({ob} AS DOUBLE) * w.tr AS tr
    FROM walk w JOIN pts p ON p.conv_id = w.conv_id
        AND p.tool = w.tool AND p.role = w.role AND p.k = w.k + 1
)
SELECT conv_id, tool, role, ts, value, sm AS level, tr AS trend
FROM walk
"""
    return with_transcripts(body).replace(
        "WITH transcripts", "WITH RECURSIVE transcripts", 1
    )


def over_time_oracle(range_s: int = 3600) -> str:
    """Mirror of operators/trend.over_time: one RANGE frame over the
    integer epoch-µs order column; avg divides the exact µs-quantized
    integer sum once (fixed operand order)."""
    range_us = range_s * 1_000_000
    body = f"""
, pts AS (
    SELECT conv_id, tool, role, ts, epoch_us(ts) AS ts_us, value,
        CAST(floor(value * 1e6) AS BIGINT) AS val_q
    FROM transcripts WHERE value IS NOT NULL
)
SELECT conv_id, tool, role, ts, value,
    CAST(count(*) OVER w AS BIGINT) AS n_win,
    CAST(CAST(sum(val_q) OVER w AS BIGINT) AS DOUBLE)
        / CAST(count(*) OVER w AS DOUBLE) / 1e6 AS avg_win,
    min(value) OVER w AS min_win,
    max(value) OVER w AS max_win
FROM pts
WINDOW w AS (PARTITION BY conv_id, tool, role ORDER BY ts_us
    RANGE BETWEEN {range_us} PRECEDING AND CURRENT ROW)
"""
    return with_transcripts(body)


def alerts_for_duration_oracle(
    threshold: float = 100.0, for_s: int = 300
) -> str:
    """Mirror of operators/trend.alerts_for_duration: gaps-and-islands
    over the stable (ts, turn_idx) order; NULL values break a run;
    islands kept when the µs span >= for_s."""
    thr = f"CAST({float(threshold)!r} AS DOUBLE)"
    for_us = for_s * 1_000_000
    body = f"""
, pts AS (
    SELECT conv_id, tool, role, ts, turn_idx, epoch_us(ts) AS ts_us,
        (value IS NOT NULL AND value > {thr}) AS over_thr,
        row_number() OVER (PARTITION BY conv_id, tool, role
            ORDER BY ts, turn_idx) AS rn,
        row_number() OVER (PARTITION BY conv_id, tool, role,
            (value IS NOT NULL AND value > {thr})
            ORDER BY ts, turn_idx) AS rnf
    FROM transcripts
),
runs AS (
    SELECT conv_id, tool, role, rn - rnf AS grp,
        min(ts_us) AS start_us, max(ts_us) AS end_us,
        CAST(count(*) AS BIGINT) AS n_points
    FROM pts WHERE over_thr
    GROUP BY conv_id, tool, role, rn - rnf
    HAVING max(ts_us) - min(ts_us) >= {for_us}
)
SELECT conv_id, tool, role,
    make_timestamp(start_us) AS start_ts,
    make_timestamp(end_us) AS end_ts,
    make_timestamp(start_us + {for_us}) AS fire_ts,
    n_points,
    CAST(end_us - start_us AS DOUBLE) / 1e6 AS duration_s
FROM runs
"""
    return with_transcripts(body)


def mad_outliers_oracle(tier: str = "1h", k: float = 3.0) -> str:
    """Mirror of operators/trend.mad_outliers: exact sorted-array
    medians with the interpolation arithmetic generated by the SAME
    Python formula builder the Spark side uses (trend._median_from_
    sorted) — only the array accessors differ per dialect."""
    from streamevmon_spark.operators.trend import median_sql_duckdb

    win_us = TIERS[tier] * 1_000_000
    med = median_sql_duckdb("varr")
    mad = median_sql_duckdb("darr")
    kd = f"CAST({float(k)!r} AS DOUBLE)"
    body = f"""
, pts AS (
    SELECT conv_id, tool, role,
        (epoch_us(ts) // {win_us}) * {win_us} AS w_us, value
    FROM transcripts WHERE value IS NOT NULL
),
g1 AS (
    SELECT w_us, conv_id, tool, role,
        list_sort(list(value)) AS varr
    FROM pts GROUP BY w_us, conv_id, tool, role
),
g2 AS (
    SELECT *, {med} AS med FROM g1
),
g3 AS (
    SELECT *, list_sort(list_transform(varr, x -> abs(x - med))) AS darr
    FROM g2
)
SELECT make_timestamp(w_us) AS bucket_start, conv_id, tool, role,
    CAST(len(varr) AS BIGINT) AS n,
    med,
    {mad} AS mad,
    CAST(len(list_filter(darr, d -> d > {kd} * ({mad}))) AS BIGINT)
        AS outlier_cnt
FROM g3
"""
    return with_transcripts(body)


def activity_zscore_oracle(
    tier: str = "1h", lookback_buckets: int = 24
) -> str:
    """Mirror of operators/trend.activity_zscore: exact integer window
    sums over the per-tool bucket relation, one fixed-order mean/var/z
    formula, var <= 0 -> NULL."""
    win_us = TIERS[tier] * 1_000_000
    span_us = (lookback_buckets - 1) * win_us
    mean = "(CAST(s1 AS DOUBLE) / CAST(nb AS DOUBLE))"
    var = (
        f"((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * {mean})"
        " / CAST(nb AS DOUBLE))"
    )
    z = (
        f"CASE WHEN {var} <= 0.0 THEN CAST(NULL AS DOUBLE)"
        f" ELSE (CAST(c AS DOUBLE) - {mean}) / sqrt({var}) END"
    )
    body = f"""
, buckets AS (
    SELECT tool, (epoch_us(ts) // {win_us}) * {win_us} AS w_us,
        CAST(count(*) AS BIGINT) AS c
    FROM transcripts GROUP BY tool, (epoch_us(ts) // {win_us}) * {win_us}
),
stats AS (
    SELECT tool, w_us, c,
        CAST(count(*) OVER w AS BIGINT) AS nb,
        CAST(sum(c) OVER w AS BIGINT) AS s1,
        CAST(sum(c * c) OVER w AS BIGINT) AS s2
    FROM buckets
    WINDOW w AS (PARTITION BY tool ORDER BY w_us
        RANGE BETWEEN {span_us} PRECEDING AND CURRENT ROW)
)
SELECT make_timestamp(w_us) AS bucket_start, tool, c, nb,
    {mean} AS mean_c,
    {var} AS var_c,
    {z} AS zscore
FROM stats
"""
    return with_transcripts(body)


# ---------------------------------------------------------------------------
# Tier-routing range reads (operators/tier_router.py)
# ---------------------------------------------------------------------------


def realtime_range_agg_oracle() -> str:
    """Independent-path oracle for operators/tier_router.
    realtime_range_agg: a DIRECT raw range scan + one aggregate —
    no tiers, no stitching — over the same deterministic 13%..87%
    minute-range (integer arithmetic identical to
    tier_router.default_range_us). Hash-equality against the stitched
    multi-tier read is the router's exactness proof, percentiles
    included."""
    p50 = _pct_from_sorted("lat_arr", 0.5)
    p95 = _pct_from_sorted("lat_arr", 0.95)
    p99 = _pct_from_sorted("lat_arr", 0.99)
    body = f"""
, {_LAT_CTE},
b AS (
    SELECT (min(epoch_us(ts)) // 60000000) + 1 AS lo_min,
           (max(epoch_us(ts)) // 60000000) AS hi_min
    FROM transcripts
),
bounds AS (
    SELECT (lo_min + ((hi_min - lo_min) * 13) // 100) * 60000000 AS t0,
           (lo_min + ((hi_min - lo_min) * 87) // 100) * 60000000 AS t1
    FROM b
),
rng AS (
    SELECT l.* FROM lat l, bounds
    WHERE epoch_us(l.ts) >= bounds.t0 AND epoch_us(l.ts) < bounds.t1
),
g AS (
    SELECT conv_id, tool, role,
        count(*) AS turn_count,
        CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS lossy_count,
        CAST(sum(lat_us) AS BIGINT) AS lat_sum,
        count(lat_us) AS lat_cnt,
        min(lat_us) AS lat_min_us,
        max(lat_us) AS lat_max_us,
        list_sort(list(lat_us) FILTER (WHERE lat_us IS NOT NULL))
            AS lat_arr,
        CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT)
            AS val_sum,
        count(value) AS val_cnt
    FROM rng GROUP BY conv_id, tool, role
)
SELECT conv_id, tool, role,
    make_timestamp(bounds.t0) AS range_start,
    make_timestamp(bounds.t1) AS range_end,
    turn_count,
    lossy_count,
    CAST(lat_sum AS DOUBLE) / CAST(lat_cnt AS DOUBLE) / 1e6 AS lat_avg,
    CAST(lat_min_us AS DOUBLE) / 1e6 AS lat_min,
    CAST(lat_max_us AS DOUBLE) / 1e6 AS lat_max,
    {p50} AS lat_p50,
    {p95} AS lat_p95,
    {p99} AS lat_p99,
    CAST(val_sum AS DOUBLE) / CAST(val_cnt AS DOUBLE) / 1e6 AS val_avg,
    CAST(turn_count AS DOUBLE)
        / (CAST(bounds.t1 - bounds.t0 AS DOUBLE) / 1e6) AS activity_rate
FROM g, bounds
"""
    return with_transcripts(body)


def chunk_range_read_oracle() -> str:
    """Independent-path oracle for operators/chunks.chunk_range_read:
    a DIRECT raw range scan + per-series aggregate — no compression,
    no chunk pruning — over the same deterministic 13%..87%
    minute-range (integer arithmetic identical to
    tier_router.default_range_us). Hash-equality proves the Gorilla +
    delta-of-delta round-trip AND the chunk-overlap prune lose
    nothing."""
    body = """
, b AS (
    SELECT (min(epoch_us(ts)) // 60000000) + 1 AS lo_min,
           (max(epoch_us(ts)) // 60000000) AS hi_min
    FROM transcripts
),
bounds AS (
    SELECT (lo_min + ((hi_min - lo_min) * 13) // 100) * 60000000 AS t0,
           (lo_min + ((hi_min - lo_min) * 87) // 100) * 60000000 AS t1
    FROM b
),
rng AS (
    SELECT t.conv_id, t.tool, t.role, epoch_us(t.ts) AS us, t.value
    FROM transcripts t, bounds
    WHERE epoch_us(t.ts) >= bounds.t0 AND epoch_us(t.ts) < bounds.t1
)
SELECT conv_id, tool, role,
    count(*) AS point_count,
    CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS lossy_count,
    CAST(CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT)
            AS DOUBLE)
        / CAST(count(value) AS DOUBLE) / 1e6 AS val_avg,
    min(value) AS val_min,
    max(value) AS val_max,
    make_timestamp(min(us)) AS ts_first,
    make_timestamp(max(us)) AS ts_last
FROM rng GROUP BY conv_id, tool, role
"""
    return with_transcripts(body)


def realtime_range_sketch_oracle() -> str:
    """Exact-face oracle for operators/tier_router.
    realtime_range_sketch: direct raw range scan → per-series count /
    min / max of lat_us (the quantities a t-digest maintains EXACTLY
    through every merge). Same integer range arithmetic as
    default_range_us; min/max as doubles to share one dtype with the
    blob-decoded NULL-when-empty case."""
    body = f"""
, {_LAT_CTE},
b AS (
    SELECT (min(epoch_us(ts)) // 60000000) + 1 AS lo_min,
           (max(epoch_us(ts)) // 60000000) AS hi_min
    FROM transcripts
),
bounds AS (
    SELECT (lo_min + ((hi_min - lo_min) * 13) // 100) * 60000000 AS t0,
           (lo_min + ((hi_min - lo_min) * 87) // 100) * 60000000 AS t1
    FROM b
),
rng AS (
    SELECT l.* FROM lat l, bounds
    WHERE epoch_us(l.ts) >= bounds.t0 AND epoch_us(l.ts) < bounds.t1
)
SELECT conv_id, tool, role,
    make_timestamp(bounds.t0) AS range_start,
    make_timestamp(bounds.t1) AS range_end,
    count(lat_us) AS lat_count,
    CAST(min(lat_us) AS DOUBLE) AS lat_min_us,
    CAST(max(lat_us) AS DOUBLE) AS lat_max_us
FROM rng, bounds
GROUP BY conv_id, tool, role, bounds.t0, bounds.t1
"""
    return with_transcripts(body)


# ---------------------------------------------------------------------------
# Regression / symbolic analytics (operators/regress.py)
# ---------------------------------------------------------------------------


def trend_fit_oracle(tier: str = "1h", horizon_s: int = 600) -> str:
    """Mirror of operators/regress.trend_fit: exact integer sums of
    bucket-rebased ms offsets x against µs-quantized values, DuckDB
    HUGEINT sums cast through BIGINT (loud on overflow, correctly
    rounded to double), then the SAME slope/predict formula text the
    Spark side renders (regress.trend_fit_sql)."""
    from streamevmon_spark.operators.regress import trend_fit_sql

    win_us = TIERS[tier] * 1_000_000
    slope, predict, guard = trend_fit_sql(horizon_s * 1000)
    body = f"""
, pts AS (
    SELECT conv_id, tool, role,
        (epoch_us(ts) // {win_us}) * {win_us} AS w_us,
        (epoch_us(ts) - (epoch_us(ts) // {win_us}) * {win_us}) // 1000
            AS x_ms,
        CAST(floor(value * 1e6) AS BIGINT) AS val_q
    FROM transcripts WHERE value IS NOT NULL
),
g AS (
    SELECT w_us, conv_id, tool, role,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(x_ms) AS BIGINT) AS sx,
        CAST(sum(val_q) AS BIGINT) AS sy,
        CAST(sum(x_ms * x_ms) AS BIGINT) AS sxx,
        CAST(sum(x_ms * val_q) AS BIGINT) AS sxy
    FROM pts GROUP BY w_us, conv_id, tool, role
)
SELECT make_timestamp(w_us) AS bucket_start, conv_id, tool, role, n,
    CASE WHEN {guard} THEN {slope} ELSE CAST(NULL AS DOUBLE) END
        AS slope_per_s,
    CASE WHEN {guard} THEN {predict} ELSE CAST(NULL AS DOUBLE) END
        AS predict
FROM g
"""
    return with_transcripts(body)


def tool_lag_corr_oracle(tier: str = "1h", lag_buckets: int = 1) -> str:
    """Mirror of operators/regress.tool_lag_corr: per-(tool, bucket)
    exact counts, ordered tool pairs joined at the lag offset, Pearson
    r from exact integer sums via the shared formula text
    (regress.pearson_sql)."""
    from streamevmon_spark.operators.regress import pearson_sql

    win_us = TIERS[tier] * 1_000_000
    corr, guard = pearson_sql()
    body = f"""
, buckets AS (
    SELECT tool, epoch_us(ts) // {win_us} AS w_idx,
        CAST(count(*) AS BIGINT) AS c
    FROM transcripts GROUP BY tool, epoch_us(ts) // {win_us}
),
pairs AS (
    SELECT a.tool AS tool_a, b.tool AS tool_b, a.c AS ca, b.c AS cb
    FROM buckets a JOIN buckets b
        ON a.tool < b.tool AND b.w_idx = a.w_idx + {lag_buckets}
),
g AS (
    SELECT tool_a, tool_b,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(ca) AS BIGINT) AS sa,
        CAST(sum(cb) AS BIGINT) AS sb,
        CAST(sum(ca * ca) AS BIGINT) AS saa,
        CAST(sum(cb * cb) AS BIGINT) AS sbb,
        CAST(sum(ca * cb) AS BIGINT) AS sab
    FROM pairs GROUP BY tool_a, tool_b
)
SELECT tool_a, tool_b, CAST({lag_buckets} AS INT) AS lag,
    n AS n_buckets,
    CASE WHEN {guard} THEN {corr} ELSE CAST(NULL AS DOUBLE) END AS corr
FROM g
"""
    return with_transcripts(body)


def sax_symbols_oracle(n_segments: int = 8) -> str:
    """Mirror of operators/regress.sax_symbols: milli-quantized exact
    integer sums, the standard PAA index map k*w // n over the stable
    (ts, turn_idx) order, and the shared mean/var/paa + breakpoint
    formula texts (regress.sax_stats_sql / sax_symbol_sql /
    SAX_Z_SQL)."""
    from streamevmon_spark.operators.regress import (
        SAX_Z_SQL,
        sax_stats_sql,
        sax_symbol_sql,
    )

    mean, var, paa = sax_stats_sql()
    z = SAX_Z_SQL.format(var=var, paa=paa, mean=mean)
    body = f"""
, pts AS (
    SELECT conv_id, tool, role,
        CAST(floor(value * 1e3) AS BIGINT) AS val_q,
        row_number() OVER (PARTITION BY conv_id, tool, role
            ORDER BY ts, turn_idx) - 1 AS k,
        count(*) OVER (PARTITION BY conv_id, tool, role) AS n
    FROM transcripts WHERE value IS NOT NULL
),
segs AS (
    SELECT conv_id, tool, role,
        CAST((k * {n_segments}) // n AS INT) AS seg,
        CAST(max(n) AS BIGINT) AS n_ser,
        CAST(count(*) AS BIGINT) AS cnt,
        CAST(sum(val_q) AS BIGINT) AS ssum,
        CAST(sum(val_q * val_q) AS BIGINT) AS ssqq
    FROM pts
    GROUP BY conv_id, tool, role, CAST((k * {n_segments}) // n AS INT)
),
series AS (
    SELECT conv_id, tool, role,
        CAST(max(n_ser) AS BIGINT) AS n,
        CAST(sum(ssum) AS BIGINT) AS sq,
        CAST(sum(ssqq) AS BIGINT) AS sqq
    FROM segs GROUP BY conv_id, tool, role
)
SELECT s.conv_id, s.tool, s.role, s.seg,
    s.cnt AS n_pts,
    {paa} AS paa,
    {z} AS z,
    {sax_symbol_sql(z)} AS sym
FROM segs s JOIN series USING (conv_id, tool, role)
"""
    return with_transcripts(body)


def seasonal_naive_oracle(
    tier: str = "1h", season_buckets: int = 24, threshold: float = 50.0
) -> str:
    """Mirror of operators/regress.seasonal_naive: bucket averages from
    exact µs-quantized integer sums (identical doubles), inner self-join
    at the season offset on the integer bucket index."""
    win_us = TIERS[tier] * 1_000_000
    thr = f"CAST({float(threshold)!r} AS DOUBLE)"
    body = f"""
, buckets AS (
    SELECT conv_id, tool, role, epoch_us(ts) // {win_us} AS w_idx,
        (CAST(CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT)
            AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1e6) AS bucket_avg
    FROM transcripts WHERE value IS NOT NULL
    GROUP BY conv_id, tool, role, epoch_us(ts) // {win_us}
)
SELECT make_timestamp(cur.w_idx * {win_us}) AS bucket_start,
    cur.conv_id, cur.tool, cur.role,
    cur.bucket_avg AS bucket_avg,
    prev.bucket_avg AS seasonal_avg,
    cur.bucket_avg - prev.bucket_avg AS residual,
    abs(cur.bucket_avg - prev.bucket_avg) > {thr} AS is_anom
FROM buckets cur JOIN buckets prev
    ON cur.conv_id = prev.conv_id AND cur.tool = prev.tool
    AND cur.role = prev.role
    AND cur.w_idx = prev.w_idx + {season_buckets}
"""
    return with_transcripts(body)


def activity_acf_oracle(tier: str = "1h", max_lag: int = 6) -> str:
    """Mirror of operators/regress.activity_acf: per-(tool, bucket)
    exact counts, same-tool pairs at every lag 1..max_lag, Pearson r
    per (tool, lag) via the shared formula text."""
    from streamevmon_spark.operators.regress import pearson_sql

    win_us = TIERS[tier] * 1_000_000
    corr, guard = pearson_sql()
    body = f"""
, buckets AS (
    SELECT tool, epoch_us(ts) // {win_us} AS w_idx,
        CAST(count(*) AS BIGINT) AS c
    FROM transcripts GROUP BY tool, epoch_us(ts) // {win_us}
),
lags AS (
    SELECT unnest(generate_series(1, {max_lag})) AS lag
),
pairs AS (
    SELECT a.tool AS tool, l.lag AS lag, a.c AS ca, b.c AS cb
    FROM buckets a CROSS JOIN lags l JOIN buckets b
        ON b.tool = a.tool AND b.w_idx = a.w_idx + l.lag
),
g AS (
    SELECT tool, lag,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(ca) AS BIGINT) AS sa,
        CAST(sum(cb) AS BIGINT) AS sb,
        CAST(sum(ca * ca) AS BIGINT) AS saa,
        CAST(sum(cb * cb) AS BIGINT) AS sbb,
        CAST(sum(ca * cb) AS BIGINT) AS sab
    FROM pairs GROUP BY tool, lag
)
SELECT tool, CAST(lag AS INT) AS lag, n AS n_buckets,
    CASE WHEN {guard} THEN {corr} ELSE CAST(NULL AS DOUBLE) END AS acf
FROM g
"""
    return with_transcripts(body)


def theilsen_daily_oracle(tier: str = "1h") -> str:
    """Mirror of operators/regress.theilsen_daily: exact hourly bucket
    averages, all same-day pairwise slopes (fixed-order arithmetic),
    exact interpolated median over the sorted slope array via the
    shared trend-module formula builder."""
    from streamevmon_spark.operators.trend import median_sql_duckdb

    win_us = TIERS[tier] * 1_000_000
    buckets_per_day = 86_400_000_000 // win_us
    tier_s = float(TIERS[tier])
    med = median_sql_duckdb("sarr")
    body = f"""
, hourly AS (
    SELECT conv_id, tool, role, epoch_us(ts) // {win_us} AS h_idx,
        (epoch_us(ts) // {win_us}) // {buckets_per_day} AS day_idx,
        (CAST(CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) AS BIGINT)
            AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1e6) AS avg_v
    FROM transcripts WHERE value IS NOT NULL
    GROUP BY conv_id, tool, role, epoch_us(ts) // {win_us}
),
pairs AS (
    SELECT a.conv_id, a.tool, a.role, a.day_idx,
        (b.avg_v - a.avg_v)
            / (CAST(b.h_idx - a.h_idx AS DOUBLE) * {tier_s!r}) AS slope
    FROM hourly a JOIN hourly b
        ON a.conv_id = b.conv_id AND a.tool = b.tool
        AND a.role = b.role AND a.day_idx = b.day_idx
        AND b.h_idx > a.h_idx
),
g AS (
    SELECT conv_id, tool, role, day_idx,
        CAST(count(*) AS BIGINT) AS n_pairs,
        list_sort(list(slope)) AS sarr
    FROM pairs GROUP BY conv_id, tool, role, day_idx
)
SELECT make_timestamp(day_idx * 86400000000) AS day_start,
    conv_id, tool, role, n_pairs,
    {med} AS slope_per_s
FROM g
"""
    return with_transcripts(body)


def topk_series_oracle(tier: str = "1h", k: int = 5) -> str:
    """Mirror of operators/seriesops.topk_series: exact counts, the
    same deterministic total order (c DESC, series key ASC)."""
    win_us = TIERS[tier] * 1_000_000
    body = f"""
, counts AS (
    SELECT (epoch_us(ts) // {win_us}) * {win_us} AS w_us,
        conv_id, tool, role, CAST(count(*) AS BIGINT) AS c
    FROM transcripts
    GROUP BY (epoch_us(ts) // {win_us}) * {win_us}, conv_id, tool, role
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY w_us
        ORDER BY c DESC, conv_id ASC, tool ASC, role ASC) AS rank
    FROM counts
)
SELECT make_timestamp(w_us) AS bucket_start, CAST(rank AS INT) AS rank,
    conv_id, tool, role, c
FROM ranked WHERE rank <= {k}
"""
    return with_transcripts(body)


def series_churn_oracle(tier: str = "1d") -> str:
    """Mirror of operators/seriesops.series_churn: distinct-series
    presence per bucket + first-seen bucket per series."""
    win_us = TIERS[tier] * 1_000_000
    body = f"""
, presence AS (
    SELECT conv_id, tool, role, epoch_us(ts) // {win_us} AS w_idx
    FROM transcripts
    GROUP BY conv_id, tool, role, epoch_us(ts) // {win_us}
),
active AS (
    SELECT w_idx, CAST(count(*) AS BIGINT) AS n_active
    FROM presence GROUP BY w_idx
),
first_seen AS (
    SELECT conv_id, tool, role, min(w_idx) AS first_idx
    FROM presence GROUP BY conv_id, tool, role
),
new_series AS (
    SELECT first_idx, CAST(count(*) AS BIGINT) AS n_new
    FROM first_seen GROUP BY first_idx
)
SELECT make_timestamp(a.w_idx * {win_us}) AS bucket_start,
    a.n_active,
    CAST(coalesce(n.n_new, 0) AS BIGINT) AS n_new
FROM active a LEFT JOIN new_series n ON n.first_idx = a.w_idx
"""
    return with_transcripts(body)
