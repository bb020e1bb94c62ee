"""Tier-routing range reads: answer an arbitrary (minute-aligned) time
range query from the retention tiers instead of raw — interior days
from 1d state, edge hours from 1h state, edge minutes from 1m state —
with EXACT results including percentiles.

This is the read-path half of the continuous-aggregate story (the
write path is operators/rollup.rollup_tiers_cascade_exact and the
stored form plans/cascade_store.py): a dashboard asking for
"latency stats for Jan 3 14:07 .. Jan 27 09:41" should touch
O(days + 48 hours + 120 minutes) of pre-aggregated state, not raw
turns. The reference reads its rolled-up series back per-tier from
InfluxDB retention policies (reference:
influx/InfluxHistoryConnection.scala:45-90 — range scans against a
named retention policy); the router generalizes that to one query
stitched across ALL tiers with a greedy calendar decomposition.

Exactness: every tier's state row carries the mergeable aggregate of
the cascade head — integer sums/counts/min/max AND the sorted
per-window latency array — so the stitched union of disjoint,
exactly-covering segments merges to bit-identical results vs a raw
range scan (the driver oracle computes the raw scan in DuckDB;
hash-equality is the proof). Inter-turn latency is defined over the
FULL series (a range's first point keeps its lag from before the
range), and tier state is built from the same full-series lag, so the
multisets agree by construction.

Scale shape: the decomposition is O(1) driver arithmetic; each segment
filter is a partition-prunable integer range on the tier's window
column; only the 1m/1h edge state (bounded: < 48 h-rows + 120 m-rows
per series) plus the interior day rows are read. Raw is never
touched — at 10^12 turns the range read costs the same whether the
range spans a week or a year of interior days.

Bound derivation for the gate query: the default range is the
13%..87% span of the table's minute range, derived with pure integer
arithmetic replicated verbatim by the oracle's scalar subquery; the
two scalars collected to the driver are manifest-metadata-class
(same budget as plans/manifest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamevmon_spark.operators.rollup import (
    EPOCH_NTZ,
    SERIES_KEY,
    _pct_from_sorted,
    _with_window_and_quant,
    add_inter_turn_latency,
)

MIN_US = 60 * 1_000_000
HOUR_US = 3600 * 1_000_000
DAY_US = 86400 * 1_000_000

_TIER_US = {"1m": MIN_US, "1h": HOUR_US, "1d": DAY_US}


def _ceil_to(x: int, unit: int) -> int:
    return ((x + unit - 1) // unit) * unit


def _floor_to(x: int, unit: int) -> int:
    return (x // unit) * unit


def cover_plan(t0_us: int, t1_us: int) -> list[tuple[str, int, int]]:
    """Greedy calendar decomposition of [t0_us, t1_us) into disjoint,
    tier-aligned segments: 1m ramp up to the first hour boundary, 1h
    ramp up to the first day boundary, interior 1d, then mirrored 1h /
    1m ramps on the right. Bounds must be minute-aligned (the 1m tier
    is the store's finest resolution). Every segment's [lo, hi) is
    aligned to its tier's width; the union is exactly [t0_us, t1_us)
    (property-tested in tests/test_tier_router.py)."""
    if t0_us % MIN_US or t1_us % MIN_US:
        raise ValueError("range bounds must be minute-aligned")
    if not t0_us < t1_us:
        raise ValueError("empty range")
    segs: list[tuple[str, int, int]] = []
    a = min(_ceil_to(t0_us, HOUR_US), t1_us)
    if a > t0_us:
        segs.append(("1m", t0_us, a))
    if a == t1_us:
        return segs
    b = min(_ceil_to(a, DAY_US), _floor_to(t1_us, HOUR_US))
    if b > a:
        segs.append(("1h", a, b))
    c = max(_floor_to(t1_us, DAY_US), b)
    if c > b:
        segs.append(("1d", b, c))
    d = _floor_to(t1_us, HOUR_US)
    if d > c:
        segs.append(("1h", c, d))
    if t1_us > d:
        segs.append(("1m", d, t1_us))
    return segs


def default_range_us(min_us: int, max_us: int) -> tuple[int, int]:
    """The gate query's deterministic minute-aligned range: the
    13%..87% slice of the table's interior minute span. Pure integer
    floor arithmetic — the oracle replays it verbatim in SQL."""
    lo_min = min_us // MIN_US + 1
    hi_min = max_us // MIN_US
    t0 = (lo_min + ((hi_min - lo_min) * 13) // 100) * MIN_US
    t1 = (lo_min + ((hi_min - lo_min) * 87) // 100) * MIN_US
    return t0, t1


def _merge_aggs() -> list:
    """Column objects are created lazily (a module-level list would
    require an active SparkSession at import time)."""
    return [
        F.sum("turn_count").alias("turn_count"),
        F.sum("lossy_count").alias("lossy_count"),
        F.sum("__lat_sum").alias("__lat_sum"),
        F.sum("__lat_cnt").alias("__lat_cnt"),
        F.min("__lat_min").alias("__lat_min"),
        F.max("__lat_max").alias("__lat_max"),
        F.sort_array(F.flatten(F.collect_list("__lat_arr"))).alias(
            "__lat_arr"
        ),
        F.sum("__val_sum").alias("__val_sum"),
        F.sum("__val_cnt").alias("__val_cnt"),
    ]


def _state_1m(transcripts: DataFrame) -> DataFrame:
    """Mergeable 1m state from raw — the cascade head's aggregate spec
    (operators/rollup.rollup_tiers_cascade_exact)."""
    with_lat = _with_window_and_quant(
        add_inter_turn_latency(transcripts), MIN_US
    )
    return with_lat.groupBy(*SERIES_KEY, "__w_us").agg(
        F.count(F.lit(1)).alias("turn_count"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias(
            "lossy_count"
        ),
        F.sum("lat_us").alias("__lat_sum"),
        F.count("lat_us").alias("__lat_cnt"),
        F.min("lat_us").alias("__lat_min"),
        F.max("lat_us").alias("__lat_max"),
        F.sort_array(F.collect_list("lat_us")).alias("__lat_arr"),
        F.sum("__val_q").alias("__val_sum"),
        F.count("__val_q").alias("__val_cnt"),
    )


_STATE_COLS = [
    "turn_count", "lossy_count", "__lat_sum", "__lat_cnt", "__lat_min",
    "__lat_max", "__lat_arr", "__val_sum", "__val_cnt",
]


def realtime_range_agg(
    transcripts: DataFrame,
    t0_us: int | None = None,
    t1_us: int | None = None,
    state_1m: DataFrame | None = None,
    state_1h: DataFrame | None = None,
    state_1d: DataFrame | None = None,
) -> DataFrame:
    """One aggregate row per series over [t0_us, t1_us), stitched from
    tier state along the cover_plan decomposition.

    ``state_1m``/``state_1h``/``state_1d`` let a caller supply STORED
    tier state (plans/cascade_store.py — same mergeable schema): a
    segment whose tier state is provided reads its rows DIRECTLY (a
    range filter on ``__w_us``, no re-aggregation), so with all three
    tiers stored the whole read is filter + one final merge —
    O(interior days + ≤48 h-rows + ≤120 m-rows) per series, raw never
    touched. Missing tiers are derived from the finest state by ONE
    CASE-routed merge (not a per-segment union — each 1m row maps to
    exactly one segment's window, so a single groupBy covers every
    derived segment without rescanning the 1m build per branch). By
    default 1m state is derived in-memory from ``transcripts`` (the
    gate-query form — the stitch semantics are identical either way).
    """
    if t0_us is None or t1_us is None:
        row = transcripts.select(
            F.min(F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)")).alias(
                "mn"
            ),
            F.max(F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)")).alias(
                "mx"
            ),
        ).collect()[0]
        t0_us, t1_us = default_range_us(row.mn, row.mx)
    segs = cover_plan(t0_us, t1_us)
    base = state_1m if state_1m is not None else _state_1m(transcripts)
    stored = {"1m": base, "1h": state_1h, "1d": state_1d}
    sel = [*SERIES_KEY, "__w_us", *_STATE_COLS]
    parts: list[DataFrame] = []
    derived: list[tuple[str, int, int]] = []
    for tier, lo, hi in segs:
        st = stored[tier]
        if st is not None:
            parts.append(
                st.where(
                    (F.col("__w_us") >= F.lit(lo))
                    & (F.col("__w_us") < F.lit(hi))
                ).select(*sel)
            )
        else:
            derived.append((tier, lo, hi))
    if derived:
        # one pass over the finest state: route each row to its
        # segment's window with a chained CASE, merge in one groupBy
        in_any = None
        route = None
        for tier, lo, hi in derived:
            cond = (F.col("__w_us") >= F.lit(lo)) & (
                F.col("__w_us") < F.lit(hi)
            )
            in_any = cond if in_any is None else (in_any | cond)
            win_us = _TIER_US[tier]
            up = F.expr(f"(__w_us div {win_us}) * {win_us}")
            route = (
                F.when(cond, up) if route is None else route.when(cond, up)
            )
        parts.append(
            base.where(in_any)
            .withColumn("__w_route", route)
            .groupBy(*SERIES_KEY, F.col("__w_route").alias("__w_us"))
            .agg(*_merge_aggs())
            .select(*sel)
        )
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    total = unioned.groupBy(*SERIES_KEY).agg(*_merge_aggs())
    span_s = f"(CAST({t1_us} - {t0_us} AS DOUBLE) / 1e6)"
    return total.select(
        *SERIES_KEY,
        F.expr(f"timestampadd(MICROSECOND, {t0_us}, {EPOCH_NTZ})").alias(
            "range_start"
        ),
        F.expr(f"timestampadd(MICROSECOND, {t1_us}, {EPOCH_NTZ})").alias(
            "range_end"
        ),
        "turn_count",
        "lossy_count",
        (
            F.col("__lat_sum").cast("double")
            / F.col("__lat_cnt").cast("double")
            / F.lit(1e6)
        ).alias("lat_avg"),
        (F.col("__lat_min").cast("double") / F.lit(1e6)).alias("lat_min"),
        (F.col("__lat_max").cast("double") / F.lit(1e6)).alias("lat_max"),
        F.expr(_pct_from_sorted("__lat_arr", 0.5)).alias("lat_p50"),
        F.expr(_pct_from_sorted("__lat_arr", 0.95)).alias("lat_p95"),
        F.expr(_pct_from_sorted("__lat_arr", 0.99)).alias("lat_p99"),
        (
            F.col("__val_sum").cast("double")
            / F.col("__val_cnt").cast("double")
            / F.lit(1e6)
        ).alias("val_avg"),
        (F.col("turn_count").cast("double") / F.expr(span_s)).alias(
            "activity_rate"
        ),
    )


def realtime_range_sketch(
    transcripts: DataFrame,
    t0_us: int | None = None,
    t1_us: int | None = None,
    sk_1m: DataFrame | None = None,
    sk_1h: DataFrame | None = None,
    sk_1d: DataFrame | None = None,
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """The SKETCH-faced twin of realtime_range_agg: one t-digest per
    series over [t0_us, t1_us), merged from tier sketch blobs
    (operators/sketch_rollup.py) along the same cover_plan
    decomposition — the production ad-hoc-percentile read at 10^12
    turns, where a hot series' exact latency array for a long range
    does not fit a task (the same motivation as rollup_tier_guarded's
    bounded state).

    Stored tier sketches (``sk_1h``/``sk_1d``) are read directly —
    a range filter on ``window_start_us``, interior days one blob per
    series; segments without stored state fall back to the 1m blobs
    (flat merge — t-digest merging is order-sensitive, so the final
    per-series merge always consumes blobs in canonical sorted-bytes
    order, making the result deterministic for any segment mix).

    Output carries the digest's EXACT face (total weight = lat count,
    vmin/vmax — maintained exactly through every merge) plus the
    approximate quantiles. The driver gate hashes the exact face
    against a raw-range-scan oracle; quantile error is bounded in
    tests/test_tier_router.py.
    """
    import numpy as np
    import pandas as pd

    from streamevmon_spark.operators._partitionwise import (
        group_starts,
        partitionwise_apply,
    )
    from streamevmon_spark.operators.sketch_rollup import sketch_tier

    if t0_us is None or t1_us is None:
        row = transcripts.select(
            F.min(F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)")).alias(
                "mn"
            ),
            F.max(F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)")).alias(
                "mx"
            ),
        ).collect()[0]
        t0_us, t1_us = default_range_us(row.mn, row.mx)
    segs = cover_plan(t0_us, t1_us)
    base = sk_1m if sk_1m is not None else sketch_tier(transcripts, "1m")
    stored = {"1m": base, "1h": sk_1h, "1d": sk_1d}
    sel = [*SERIES_KEY, "latency_tdigest"]
    parts = []
    for tier, lo, hi in segs:
        src = stored[tier]
        if src is None:
            src = base
        parts.append(
            src.where(
                (F.col("window_start_us") >= F.lit(lo))
                & (F.col("window_start_us") < F.lit(hi))
            ).select(*sel)
        )
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)

    qcols = [f"lat_p{int(q * 100)}" for q in quantiles]
    schema = (
        "conv_id string, tool string, role string, lat_count long, "
        "lat_min_us double, lat_max_us double, "
        + ", ".join(f"{c} double" for c in qcols)
    )

    def merge_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        from streamevmon_spark.functions.tdigest import TDigest

        starts = group_starts(pdf, list(SERIES_KEY))
        ends = np.concatenate([starts[1:], [len(pdf)]])
        heads = pdf.iloc[starts]
        col = pdf["latency_tdigest"]
        rows = {
            "conv_id": heads["conv_id"].to_numpy(),
            "tool": heads["tool"].to_numpy(),
            "role": heads["role"].to_numpy(),
        }
        counts, mins, maxs = [], [], []
        qvals: list[list[float]] = [[] for _ in quantiles]
        for s, e in zip(starts, ends):
            blobs = sorted(bytes(b) for b in col.iloc[s:e])
            acc = TDigest.from_bytes(blobs[0])
            for b in blobs[1:]:
                acc = acc.merge(TDigest.from_bytes(b))
            counts.append(int(acc.count))
            if acc.count == 0:
                mins.append(np.nan)
                maxs.append(np.nan)
            else:
                # lat_us ints < 2^52: * 1e6 round inverts the build-time
                # / 1e6 scaling bit-exactly (same face as
                # sketch_exact_stats)
                mins.append(float(round(acc.vmin * 1e6)))
                maxs.append(float(round(acc.vmax * 1e6)))
            for i, q in enumerate(quantiles):
                qvals[i].append(acc.quantile(q))
        rows["lat_count"] = np.asarray(counts, dtype=np.int64)
        rows["lat_min_us"] = np.asarray(mins, dtype=np.float64)
        rows["lat_max_us"] = np.asarray(maxs, dtype=np.float64)
        for c, vals in zip(qcols, qvals):
            rows[c] = np.asarray(vals, dtype=np.float64)
        return pd.DataFrame(rows)

    merged = partitionwise_apply(
        unioned, list(SERIES_KEY), [], merge_batch, schema
    )
    return merged.select(
        *SERIES_KEY,
        F.expr(f"timestampadd(MICROSECOND, {t0_us}, {EPOCH_NTZ})").alias(
            "range_start"
        ),
        F.expr(f"timestampadd(MICROSECOND, {t1_us}, {EPOCH_NTZ})").alias(
            "range_end"
        ),
        "lat_count",
        "lat_min_us",
        "lat_max_us",
        *qcols,
    )
