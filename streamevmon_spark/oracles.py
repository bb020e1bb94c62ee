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


def inter_turn_latency_oracle() -> str:
    body = f"""
, {_LAT_CTE}
SELECT conv_id, tool, role, turn_idx, ts,
    CAST(lat_us AS DOUBLE) / 1e6 AS lat_s
FROM lat
"""
    return with_transcripts(body)
