"""Tiered rollup (continuous aggregates) over transcript series.

The engine's flagship operator family: per-(conv_id, tool, role) series
bucketed into tumbling retention tiers (1m / 1h / 1d), producing turn
counts, inter-turn latency stats + exact percentiles, lossy counts and
per-tool activity rates.

Reference semantics being reproduced:
- tumbling event-time windows keyed per stream
  (reference: runners/unified/schema/TypedStreams.scala:70-72, default 60 s)
- per-key ordered fold for inter-turn deltas
  (reference: detectors/WindowedFunctionWrapper.scala:50-95 — elements
  replayed sorted by time; our stable order is (ts, turn_idx))
- windowed percentile as in BaselineDetector
  (reference: detectors/baseline/BaselineDetector.scala:141)
- lossy-row accounting (reference: detectors/loss/LossDetector.scala:103-109)

Determinism contract (the "exact-match rate = 1.0" requirement):
- Timestamps are TIMESTAMP_NTZ; tumbling windows are pure epoch-bucket
  integer arithmetic (``ts_us div win_us * win_us``) — timezone-free and
  cheaper than calendar truncation at scale.
- Latencies aggregate as INTEGER microseconds: sums/min/max are exact in
  any engine and any reduction order; only the final division by 1e6
  touches floats (identical operands → identical IEEE result everywhere).
- Percentiles use an explicitly spelled-out linear-interpolation formula
  over the sorted array, so any engine evaluating the same formula on the
  same integers produces bit-identical doubles.
- ``value`` doubles are quantized to integer micro-units
  (floor(value*1e6)) before summation — cross-engine/-order exact.

Scale design:
- One shuffle: the lag() window and the groupBy share the series key, so
  Catalyst reuses the exchange. Algebraic aggregates partial map-side.
- The sorted-array percentile holds one window's worth of one series per
  group (bounded, small); at 100 TB the cascade path uses mergeable
  t-digest sketches instead (functions/tdigest.py).
- ``rollup_tier_salted`` defeats hot-conversation skew with an explicit
  two-phase (salt → partial → final) aggregation; the reference never
  solved skew (sources pinned to parallelism 1,
  reference: flink/sources/InfluxAmpSourceFunction.scala:115-117).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SERIES_KEY = ["conv_id", "tool", "role"]

# tier name -> window length in seconds
TIERS: dict[str, int] = {"1m": 60, "1h": 3600, "1d": 86400}

EPOCH_NTZ = "timestamp_ntz'1970-01-01 00:00:00'"


def ts_micros(col: str = "ts") -> Column:
    """tz-free microseconds-since-epoch for a TIMESTAMP_NTZ column."""
    return F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, {col})")


def add_inter_turn_latency(df: DataFrame) -> DataFrame:
    """Add ``lat_us`` (int µs since the previous turn of the same series)
    and ``lat_s`` (seconds, double, derived).

    Stable order (ts, turn_idx): turn_idx is the tiebreaker mandated by
    the per-turn-ordering invariant.
    """
    w = Window.partitionBy(*SERIES_KEY).orderBy("ts", "turn_idx")
    df = df.withColumn("__ts_us", ts_micros("ts"))
    df = df.withColumn("lat_us", F.col("__ts_us") - F.lag("__ts_us").over(w))
    return df.withColumn("lat_s", F.col("lat_us").cast("double") / 1e6).drop(
        "__ts_us"
    )


def add_inter_turn_latency_bucketed(
    df: DataFrame, bucket_s: int = 86400
) -> DataFrame:
    """Skew-proof inter-turn latency: identical output to
    ``add_inter_turn_latency``, but the per-series sort is sharded by
    time bucket so a hot conversation parallelises across buckets
    instead of serialising one executor thread.

    1. lag() within (series, bucket) — the sort unit is one series-bucket
       (bounded rows), not one whole series.
    2. A tiny boundary table (one row per series-bucket: last (ts,
       turn_idx)) is lag()'d per series — thousands of rows, trivially
       fast — and joined back to patch each bucket's first row with the
       previous bucket's last timestamp.

    Exact: buckets partition event time, so rows with equal ts always
    share a bucket and the (ts, turn_idx) order is preserved across the
    patch. The same boundary-injection idea drives the resumable
    pipeline's cross-bucket exactness (plans/pipeline.py).
    """
    bucket_us = bucket_s * 1_000_000
    df = df.withColumn("__ts_us", ts_micros("ts"))
    df = df.withColumn("__b", F.expr(f"__ts_us div {bucket_us}"))
    w_in = Window.partitionBy(*SERIES_KEY, "__b").orderBy("ts", "turn_idx")
    df = df.withColumn("__prev_in", F.lag("__ts_us").over(w_in))

    bounds = df.groupBy(*SERIES_KEY, "__b").agg(
        F.max("__ts_us").alias("__last_ts")
    )
    w_b = Window.partitionBy(*SERIES_KEY).orderBy("__b")
    prev_bounds = bounds.withColumn(
        "__prev_last", F.lag("__last_ts").over(w_b)
    ).select(*SERIES_KEY, "__b", "__prev_last")

    # one row per (series, bucket) — NOT force-broadcast: at 10^9 series
    # x years of days this side scales past any driver budget. The join
    # key extends the lag window's partitioning, so the big side needs no
    # extra exchange; AQE still auto-broadcasts when it fits.
    df = df.join(prev_bounds, [*SERIES_KEY, "__b"], "left")
    lat = F.coalesce(F.col("__prev_in"), F.col("__prev_last"))
    df = df.withColumn("lat_us", F.col("__ts_us") - lat)
    return (
        df.withColumn("lat_s", F.col("lat_us").cast("double") / 1e6)
        .drop("__ts_us", "__b", "__prev_in", "__prev_last")
    )


def _pct_from_sorted(arr: str, p: float) -> str:
    """Linear-interpolation percentile over a pre-sorted bigint array,
    spelled out so the oracle can evaluate the byte-identical formula:
    idx = p*(n-1); lo + (hi-lo)*(idx-floor(idx))."""
    idx = f"({p} * (size({arr}) - 1))"
    lo = f"CAST(element_at({arr}, CAST(floor({idx}) AS INT) + 1) AS DOUBLE)"
    hi = (
        f"CAST(element_at({arr}, least(CAST(floor({idx}) AS INT) + 2, "
        f"size({arr}))) AS DOUBLE)"
    )
    return (
        f"CASE WHEN size({arr}) = 0 THEN CAST(NULL AS DOUBLE) "
        f"ELSE ({lo} + ({hi} - {lo}) * ({idx} - floor({idx}))) / 1e6 END"
    )


def _with_window_and_quant(with_lat: DataFrame, win_us: int) -> DataFrame:
    """Attach the epoch-bucket window start (exact integer division,
    tz-free) and the µs-quantized value column."""
    wstart_us = F.expr(
        f"(datediff(MICROSECOND, {EPOCH_NTZ}, ts) div {win_us}) * {win_us}"
    )
    return with_lat.withColumn("__w_us", wstart_us).withColumn(
        "__val_q", F.floor(F.col("value") * 1e6)
    )


# Windows holding more than this many turns switch their percentile
# state from the exact sorted array to a bounded quantile summary (see
# rollup_tier_guarded). 100k int64 latencies = ~800 KB per group state —
# well inside an executor task; beyond it a hot series' whole day in one
# collect_list is the classic task-OOM at 10^12-turn scale.
DEFAULT_MAX_EXACT_ROWS = 100_000


def rollup_tier(
    df: DataFrame,
    tier: str = "1m",
    max_exact_rows: int | None = DEFAULT_MAX_EXACT_ROWS,
) -> DataFrame:
    """Tiered rollup — the flagship path. Guarded by default: windows
    with more than ``max_exact_rows`` turns are routed to bounded-memory
    percentile state (native quantile summary) instead of the exact
    sorted array — task-OOM prevention on the path users actually run
    at 10^12-turn scale. Pass ``max_exact_rows=None`` for the
    unconditional exact-array plan (bit-identical output whenever no
    window exceeds the bound — which is what the oracle gate checks).
    """
    if max_exact_rows is not None:
        return rollup_tier_guarded(df, tier, max_exact_rows)
    return rollup_tier_exact(df, tier)


def rollup_from_store(
    chunks: DataFrame,
    tier: str = "1m",
    max_exact_rows: int | None = DEFAULT_MAX_EXACT_ROWS,
) -> DataFrame:
    """Rebuild a rollup tier from the COMPRESSED chunk store
    (operators/chunks.py blobs) — the re-aggregation path when raw has
    expired under retention but the store keeps the points (the same
    lifecycle the reference serves with InfluxHistoryConnection range
    scans feeding its windowed aggregations).

    Exactness vs the raw path: the codec round-trip is bit-exact; NaN
    instants (the store's lossy encoding) map back to NULL values, so
    lossy_count and the value aggregates see exactly the raw inputs;
    and with the store's one-point-per-(series, instant) key the
    synthetic turn_idx=0 never decides the latency lag's (ts,
    turn_idx) order — the tier output is bit-identical and the
    raw-path rollup oracle applies verbatim."""
    from streamevmon_spark.operators.chunks import decompress_chunks

    pts = decompress_chunks(chunks).select(
        *SERIES_KEY,
        F.expr(f"timestampadd(MICROSECOND, ts_us, {EPOCH_NTZ})").alias(
            "ts"
        ),
        F.lit(0).alias("turn_idx"),
        F.when(
            F.isnan(F.col("value")), F.lit(None).cast("double")
        ).otherwise(F.col("value")).alias("value"),
    )
    return rollup_tier(pts, tier, max_exact_rows)


def rollup_tier_exact(df: DataFrame, tier: str = "1m") -> DataFrame:
    """Declarative tiered rollup — the exact/correctness path.

    groupBy(series key, epoch-bucket window) with native aggregates only:
    stays inside whole-stage codegen, partial-aggregates map-side, and
    shares its shuffle with the latency lag() window.
    """
    secs = TIERS[tier]
    win_us = secs * 1_000_000
    # bucketed lag: a hot conversation shards across day buckets instead
    # of serialising one task (the unbucketed add_inter_turn_latency is
    # kept for the experiment query only — output is bit-identical)
    with_lat = add_inter_turn_latency_bucketed(df)
    grouped = (
        _with_window_and_quant(with_lat, win_us)
        .groupBy(*SERIES_KEY, "__w_us")
        .agg(
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
    )
    out = grouped.select(
        "conv_id",
        "tool",
        "role",
        F.expr(f"timestampadd(MICROSECOND, __w_us, {EPOCH_NTZ})").alias(
            "window_start"
        ),
        F.expr(
            f"timestampadd(MICROSECOND, __w_us + {win_us}, {EPOCH_NTZ})"
        ).alias("window_end"),
        "turn_count",
        "lossy_count",
        (
            F.col("__lat_sum").cast("double")
            / F.col("__lat_cnt").cast("double")
            / 1e6
        ).alias("lat_avg"),
        (F.col("__lat_min").cast("double") / 1e6).alias("lat_min"),
        (F.col("__lat_max").cast("double") / 1e6).alias("lat_max"),
        F.expr(_pct_from_sorted("__lat_arr", 0.5)).alias("lat_p50"),
        F.expr(_pct_from_sorted("__lat_arr", 0.95)).alias("lat_p95"),
        F.expr(_pct_from_sorted("__lat_arr", 0.99)).alias("lat_p99"),
        (
            F.col("__val_sum").cast("double")
            / F.col("__val_cnt").cast("double")
            / 1e6
        ).alias("val_avg"),
        (
            F.col("turn_count").cast("double") / F.lit(float(secs))
        ).alias("activity_rate"),
    )
    return out


def rollup_tier_salted(
    df: DataFrame, tier: str = "1m", n_salts: int = 16
) -> DataFrame:
    """Skew-resistant two-phase rollup for algebraic aggregates.

    Phase 1 groups by (series key, window, salt) where
    salt = pmod(xxhash64(turn_idx, ts), n_salts) — a hot conversation's
    rows in one window spread over ``n_salts`` reducers. Phase 2 merges
    partials. Counts/sums/min/max merge exactly; integer-µs arithmetic
    makes the result bit-identical to the unsalted path (asserted in
    tests). Holistic aggregates (exact percentiles) are NOT
    salt-mergeable — at scale those ride the t-digest sketch cascade.
    """
    secs = TIERS[tier]
    win_us = secs * 1_000_000
    wstart_us = F.expr(
        f"(datediff(MICROSECOND, {EPOCH_NTZ}, ts) div {win_us}) * {win_us}"
    )
    salted = (
        add_inter_turn_latency_bucketed(df)
        .withColumn("__w_us", wstart_us)
        .withColumn("__val_q", F.floor(F.col("value") * 1e6))
        .withColumn(
            "__salt", F.pmod(F.xxhash64("turn_idx", "ts"), F.lit(n_salts))
        )
    )
    partial = salted.groupBy(*SERIES_KEY, "__w_us", "__salt").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("__lossy"),
        F.sum("lat_us").alias("__lat_sum"),
        F.count("lat_us").alias("__lat_cnt"),
        F.min("lat_us").alias("__lat_min"),
        F.max("lat_us").alias("__lat_max"),
        F.sum("__val_q").alias("__val_sum"),
        F.count("__val_q").alias("__val_cnt"),
    )
    merged = partial.groupBy(*SERIES_KEY, "__w_us").agg(
        F.sum("__cnt").alias("turn_count"),
        F.sum("__lossy").alias("lossy_count"),
        F.sum("__lat_sum").alias("__lat_sum"),
        F.sum("__lat_cnt").alias("__lat_cnt"),
        F.min("__lat_min").alias("__lat_min"),
        F.max("__lat_max").alias("__lat_max"),
        F.sum("__val_sum").alias("__val_sum"),
        F.sum("__val_cnt").alias("__val_cnt"),
    )
    return merged.select(
        "conv_id",
        "tool",
        "role",
        F.expr(f"timestampadd(MICROSECOND, __w_us, {EPOCH_NTZ})").alias(
            "window_start"
        ),
        "turn_count",
        "lossy_count",
        (
            F.col("__lat_sum").cast("double")
            / F.col("__lat_cnt").cast("double")
            / 1e6
        ).alias("lat_avg"),
        (F.col("__lat_min").cast("double") / 1e6).alias("lat_min"),
        (F.col("__lat_max").cast("double") / 1e6).alias("lat_max"),
        (
            F.col("__val_sum").cast("double")
            / F.col("__val_cnt").cast("double")
            / 1e6
        ).alias("val_avg"),
        (
            F.col("turn_count").cast("double") / F.lit(float(secs))
        ).alias("activity_rate"),
    )


def prepare_series_layout(
    df: DataFrame, n_parts: int | None = None, bucket_s: int = 86400
) -> DataFrame:
    """Materialise the Iceberg-table layout in-plan: ONE exchange on
    (series key, day bucket), after which the entire tiered pipeline is
    exchange-free.

    Why this works: the repartition registers
    ``HashPartitioning(conv_id, tool, role, __day)``, and every
    downstream requirement — the per-day lag window
    (``partitionBy(series, __day)``), the boundary aggregation
    (``groupBy(series, __day)``) and every tier aggregation
    (``groupBy(series, __day, window)``, windows nest inside days) — is a
    ClusteredDistribution over a SUPERSET of those expressions, which the
    existing partitioning satisfies. Catalyst therefore inserts no
    further Exchange: one shuffle of raw rows feeds 1m + 1h + 1d.

    Skew: the partition unit is (series, day) — a hot conversation
    spreads across days instead of landing on one reducer; intra-day
    volume is bounded by the series' event rate. This mirrors the target
    physical layout (raw Iceberg table partitioned by days(ts), bucketed
    by conv hash) where a storage-partitioned scan removes even this one
    exchange.
    """
    return _layout_projection(df, bucket_s * 1_000_000, n_parts)[1]


def _layout_projection(
    df: DataFrame, bucket_us: int, n_parts: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """(projected-but-unshuffled frame, repartitioned layout frame).

    The projection selects the rollup's working set BEFORE the exchange —
    never ship the text payload through the shuffle (at 100 TB the text
    column dwarfs the numeric columns; Iceberg's scan would prune it,
    the explicit select guarantees the same through the cache/persist).
    """
    proj = (
        df.select(*SERIES_KEY, "ts", "turn_idx", "value")
        .withColumn("__ts_us", ts_micros("ts"))
        .withColumn("__day", F.expr(f"__ts_us div {bucket_us}"))
    )
    if n_parts:
        return proj, proj.repartition(n_parts, *SERIES_KEY, "__day")
    return proj, proj.repartition(*SERIES_KEY, "__day")


def _add_lat_within_layout(
    pre: DataFrame, raw: DataFrame | None = None
) -> DataFrame:
    """Inter-turn latency over a prepare_series_layout frame — the
    bucketed-lag boundary patch, with every step partition-local.

    ``raw``: the projected-but-UNSHUFFLED frame the layout was built
    from. The boundary aggregation must run on it, not on ``pre``: an
    explicit repartition is a barrier partial aggregation cannot push
    below, so aggregating the repartitioned frame re-shuffles all raw
    rows a second time (column pruning makes the two exchange subtrees
    differ, defeating ReuseExchange — observed in the executed plan).
    From ``raw``, map-side partial aggregation shrinks the boundary
    table to one row per (series, day) BEFORE its (tiny) exchange.
    """
    w_in = Window.partitionBy(*SERIES_KEY, "__day").orderBy("ts", "turn_idx")
    out = pre.withColumn("__prev_in", F.lag("__ts_us").over(w_in))
    bounds = (raw if raw is not None else pre).groupBy(
        *SERIES_KEY, "__day"
    ).agg(F.max("__ts_us").alias("__last_ts"))
    w_b = Window.partitionBy(*SERIES_KEY).orderBy("__day")
    prev_bounds = bounds.withColumn(
        "__prev_last", F.lag("__last_ts").over(w_b)
    ).select(*SERIES_KEY, "__day", "__prev_last")
    # plain join (AQE may broadcast): the (series, day) key matches the
    # layout partitioning, so only the tiny bounds side shuffles; a
    # forced broadcast would grow with #series x #days and OOM the driver
    out = out.join(prev_bounds, [*SERIES_KEY, "__day"], "left")
    return out.withColumn(
        "lat_us",
        F.col("__ts_us") - F.coalesce("__prev_in", "__prev_last"),
    ).drop("__prev_in", "__prev_last")


def prepare_with_latency(
    df: DataFrame, n_parts: int | None = None, bucket_s: int = 86400
) -> DataFrame:
    """The shared pipeline head: series/day layout (one exchange of raw
    rows — the boundary table aggregates map-side from the unshuffled
    projection) + partition-local inter-turn latency. Persist this and
    every tier aggregation runs exchange-free from the cached layout
    (InMemoryRelation preserves the HashPartitioning metadata)."""
    proj, pre = _layout_projection(df, bucket_s * 1_000_000, n_parts)
    return _add_lat_within_layout(pre, raw=proj)


def rollup_tiers_onepass(
    df: DataFrame,
    tiers: tuple[str, ...] = ("1m", "1h", "1d"),
    n_parts: int | None = None,
    prepared: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """All retention tiers from ONE shuffle of the raw table.

    Returns {tier: rollup DataFrame} with the full rollup_tier column set
    (exact percentiles included). Execute the values against a shared
    persisted layout (or in one action via unionByName) and the physical
    plan contains a single raw-data Exchange; every window/groupBy is
    partition-local. The alternative (rollup_tier per tier) shuffles raw
    once per tier; at 100 TB that is the difference between one and three
    petabyte-scale shuffles."""
    pre = (
        prepared
        if prepared is not None
        else prepare_with_latency(df, n_parts)
    )
    out: dict[str, DataFrame] = {}
    for tier in tiers:
        secs = TIERS[tier]
        win_us = secs * 1_000_000
        grouped = (
            pre.withColumn(
                "__w_us", F.expr(f"(__ts_us div {win_us}) * {win_us}")
            )
            .withColumn("__val_q", F.floor(F.col("value") * 1e6))
            .groupBy(*SERIES_KEY, "__day", "__w_us")
            .agg(
                F.count(F.lit(1)).alias("turn_count"),
                F.sum(
                    F.when(F.col("value").isNull(), 1).otherwise(0)
                ).alias("lossy_count"),
                F.sum("lat_us").alias("__lat_sum"),
                F.count("lat_us").alias("__lat_cnt"),
                F.min("lat_us").alias("__lat_min"),
                F.max("lat_us").alias("__lat_max"),
                F.sort_array(F.collect_list("lat_us")).alias("__lat_arr"),
                F.sum("__val_q").alias("__val_sum"),
                F.count("__val_q").alias("__val_cnt"),
            )
        )
        out[tier] = grouped.select(
            "conv_id",
            "tool",
            "role",
            F.expr(f"timestampadd(MICROSECOND, __w_us, {EPOCH_NTZ})").alias(
                "window_start"
            ),
            F.expr(
                f"timestampadd(MICROSECOND, __w_us + {win_us}, {EPOCH_NTZ})"
            ).alias("window_end"),
            "turn_count",
            "lossy_count",
            (
                F.col("__lat_sum").cast("double")
                / F.col("__lat_cnt").cast("double")
                / 1e6
            ).alias("lat_avg"),
            (F.col("__lat_min").cast("double") / 1e6).alias("lat_min"),
            (F.col("__lat_max").cast("double") / 1e6).alias("lat_max"),
            F.expr(_pct_from_sorted("__lat_arr", 0.5)).alias("lat_p50"),
            F.expr(_pct_from_sorted("__lat_arr", 0.95)).alias("lat_p95"),
            F.expr(_pct_from_sorted("__lat_arr", 0.99)).alias("lat_p99"),
            (
                F.col("__val_sum").cast("double")
                / F.col("__val_cnt").cast("double")
                / 1e6
            ).alias("val_avg"),
            (
                F.col("turn_count").cast("double") / F.lit(float(secs))
            ).alias("activity_rate"),
        )
    return out


_RAW_AGG_COLS = [
    "turn_count", "lossy_count", "__lat_sum", "__lat_cnt", "__lat_min",
    "__lat_max", "__lat_arr", "__val_sum", "__val_cnt",
]


def _raw_to_final(raw: DataFrame, secs: int) -> DataFrame:
    """Project internal aggregate state to the public rollup columns."""
    win_us = secs * 1_000_000
    return raw.select(
        "conv_id",
        "tool",
        "role",
        F.expr(f"timestampadd(MICROSECOND, __w_us, {EPOCH_NTZ})").alias(
            "window_start"
        ),
        F.expr(
            f"timestampadd(MICROSECOND, __w_us + {win_us}, {EPOCH_NTZ})"
        ).alias("window_end"),
        "turn_count",
        "lossy_count",
        (
            F.col("__lat_sum").cast("double")
            / F.col("__lat_cnt").cast("double")
            / 1e6
        ).alias("lat_avg"),
        (F.col("__lat_min").cast("double") / 1e6).alias("lat_min"),
        (F.col("__lat_max").cast("double") / 1e6).alias("lat_max"),
        F.expr(_pct_from_sorted("__lat_arr", 0.5)).alias("lat_p50"),
        F.expr(_pct_from_sorted("__lat_arr", 0.95)).alias("lat_p95"),
        F.expr(_pct_from_sorted("__lat_arr", 0.99)).alias("lat_p99"),
        (
            F.col("__val_sum").cast("double")
            / F.col("__val_cnt").cast("double")
            / 1e6
        ).alias("val_avg"),
        (
            F.col("turn_count").cast("double") / F.lit(float(secs))
        ).alias("activity_rate"),
    )


def rollup_tiers_cascade_exact(
    df: DataFrame,
    n_parts: int | None = None,
    persist_intermediate: bool = True,
) -> dict[str, DataFrame]:
    """The production continuous-aggregate topology, EXACT at every tier,
    with the raw table touched exactly once.

    raw → (one exchange into the (series, day) layout, partition-local
    lag) → 1m aggregate carrying mergeable state — integer sums/counts/
    min/max AND the sorted per-window latency array — → 1h derived by
    merging 1m state (``sort_array(flatten(collect_list(arr)))`` is the
    identical multiset of latencies the direct 1h rollup sees, so even
    the percentile columns are bit-exact) → 1d likewise from 1h.

    Versus ``rollup_tiers_onepass`` (which persists the 24M-row layout
    and re-reads it per tier), only the FIRST aggregate ever sees raw
    rows; the persisted intermediate is the small 1m table. This is the
    10^12-turn shape: the stored 1m rollup (with sketch/array state)
    maintains the coarser tiers without rescanning raw, and the exact
    array state can be swapped for t-digest sketches
    (operators/sketch_rollup.py) when windows are too dense to keep
    exact arrays."""
    proj, layout = _layout_projection(df, 86400 * 1_000_000, n_parts)
    pre = _add_lat_within_layout(layout, raw=proj)
    win_us_1m = 60 * 1_000_000
    m1 = (
        pre.withColumn(
            "__w_us", F.expr(f"(__ts_us div {win_us_1m}) * {win_us_1m}")
        )
        .withColumn("__val_q", F.floor(F.col("value") * 1e6))
        .groupBy(*SERIES_KEY, "__day", "__w_us")
        .agg(
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
    )
    if persist_intermediate:
        m1 = m1.persist()

    def merge_up(finer: DataFrame, secs: int) -> DataFrame:
        win_us = secs * 1_000_000
        return (
            finer.withColumn(
                "__w_up", F.expr(f"(__w_us div {win_us}) * {win_us}")
            )
            .groupBy(*SERIES_KEY, "__day", F.col("__w_up").alias("__w_us"))
            .agg(
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
            )
        )

    h1 = merge_up(m1, 3600)
    if persist_intermediate:
        h1 = h1.persist()
    d1 = merge_up(h1, 86400)
    out = {
        "1m": _raw_to_final(m1, 60),
        "1h": _raw_to_final(h1, 3600),
        "1d": _raw_to_final(d1, 86400),
    }
    # expose the persisted state tables so callers can unpersist them
    # (plan-based cache matching would otherwise serve stale-but-
    # identical plans to later pipelines)
    out["_state"] = [m1, h1] if persist_intermediate else []
    return out


def cascade_rollup(finer: DataFrame, from_tier: str, to_tier: str) -> DataFrame:
    """Incremental tier cascade: re-aggregate a finer rollup into a coarser
    tier WITHOUT touching raw data (the continuous-aggregate maintenance
    path — at 10^12 turns you never rescan raw for the 1h/1d tiers).

    Exact for all algebraic columns (counts, min/max). Percentile columns
    cascade via t-digest sketch merge (operators/sketch_rollup.py) with
    tolerance-tested accuracy, mirroring how the reference recomputes
    windowed percentiles per window rather than merging them
    (reference: detectors/baseline/BaselineDetector.scala:135-146).
    """
    secs = TIERS[to_tier]
    win_us = secs * 1_000_000
    wstart_us = F.expr(
        f"(datediff(MICROSECOND, {EPOCH_NTZ}, window_start) div {win_us})"
        f" * {win_us}"
    )
    return (
        finer.groupBy("conv_id", "tool", "role", wstart_us.alias("__w_us"))
        .agg(
            F.sum("turn_count").alias("turn_count"),
            F.sum("lossy_count").alias("lossy_count"),
            F.min("lat_min").alias("lat_min"),
            F.max("lat_max").alias("lat_max"),
        )
        .select(
            "conv_id",
            "tool",
            "role",
            F.expr(f"timestampadd(MICROSECOND, __w_us, {EPOCH_NTZ})").alias(
                "window_start"
            ),
            F.expr(
                f"timestampadd(MICROSECOND, __w_us + {win_us}, {EPOCH_NTZ})"
            ).alias("window_end"),
            "turn_count",
            "lossy_count",
            "lat_min",
            "lat_max",
            (
                F.col("turn_count").cast("double") / F.lit(float(secs))
            ).alias("activity_rate"),
        )
    )


def rollup_tier_guarded(
    df: DataFrame, tier: str = "1m", max_exact_rows: int = 100_000
) -> DataFrame:
    """rollup_tier with a dense-window guard: windows holding more than
    ``max_exact_rows`` turns switch their percentile state from the
    exact sorted array (task-OOM risk: collect_list of a hot series'
    whole day) to Spark's bounded-memory native quantile summary
    (``percentile_approx``, Greenwald-Khanna at accuracy 10000 — rank
    error <= n/10000, far inside the 1% tolerance tests assert).

    Single-pass shape: routing is decided by a pre-count per (series,
    window) computed on the RAW table — no lag() window function, so the
    pre-pass is a plain scan + map-side-combined count (~1 shuffled row
    per window). The dense flag joins back (AQE picks broadcast — the
    flag relation holds only over-bound windows, usually none) and ONE
    groupBy then computes, per group, EITHER the exact sorted array
    (sparse: ``when(flag is null)``) OR the bounded summary (dense:
    ``when(flag)``) — the expensive ordered-lag subtree is evaluated
    exactly once, everything stays JVM-side, and no group ever holds
    both states.

    Sparse windows are bit-identical to the exact path (same aggregates,
    same percentile formula over the same array); dense windows carry
    tolerance-tested approximate percentiles and exact algebraic
    columns. Output schema matches rollup_tier_exact exactly, so when no
    window exceeds the bound the result is hash-identical to the rollup
    oracle.
    """
    secs = TIERS[tier]
    win_us = secs * 1_000_000
    keys = [*SERIES_KEY, "__w_us"]
    with_lat = _with_window_and_quant(
        add_inter_turn_latency_bucketed(df), win_us
    )
    # row count per (series, window) is independent of the lag column,
    # so count the raw relation: scan + partial count, no window function
    wstart = F.expr(
        f"(datediff(MICROSECOND, {EPOCH_NTZ}, ts) div {win_us}) * {win_us}"
    )
    dense_keys = (
        df.withColumn("__w_us", wstart)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__wn"))
        .where(F.col("__wn") > max_exact_rows)
        .select(*keys)
        .withColumn("__dense", F.lit(True))
    )
    flagged = with_lat.join(dense_keys, keys, "left")
    grouped = flagged.groupBy(*SERIES_KEY, F.col("__w_us")).agg(
        F.count(F.lit(1)).alias("turn_count"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias(
            "lossy_count"
        ),
        F.sum("lat_us").alias("__lat_sum"),
        F.count("lat_us").alias("__lat_cnt"),
        F.min("lat_us").alias("__lat_min"),
        F.max("lat_us").alias("__lat_max"),
        # exact state only for sparse windows (collect_list skips the
        # NULLs the CASE produces for dense rows -> empty array, bounded)
        F.sort_array(
            F.collect_list(
                F.when(F.col("__dense").isNull(), F.col("lat_us"))
            )
        ).alias("__lat_arr"),
        # bounded summary only for dense windows (NULL-skipping makes
        # sparse groups pay nothing here)
        F.percentile_approx(
            F.when(F.col("__dense"), F.col("lat_us")),
            F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)),
            F.lit(10_000),
        ).alias("__lat_gk"),
        F.max("__dense").alias("__dense"),
        F.sum("__val_q").alias("__val_sum"),
        F.count("__val_q").alias("__val_cnt"),
    )

    def pct(q: float, i: int) -> Column:
        exact = F.expr(_pct_from_sorted("__lat_arr", q))
        approx = (
            F.element_at("__lat_gk", i).cast("double") / 1e6
        )
        return F.when(F.col("__dense"), approx).otherwise(exact)

    return grouped.select(
        "conv_id",
        "tool",
        "role",
        F.expr(f"timestampadd(MICROSECOND, __w_us, {EPOCH_NTZ})").alias(
            "window_start"
        ),
        F.expr(
            f"timestampadd(MICROSECOND, __w_us + {win_us}, {EPOCH_NTZ})"
        ).alias("window_end"),
        "turn_count",
        "lossy_count",
        (
            F.col("__lat_sum").cast("double")
            / F.col("__lat_cnt").cast("double")
            / 1e6
        ).alias("lat_avg"),
        (F.col("__lat_min").cast("double") / 1e6).alias("lat_min"),
        (F.col("__lat_max").cast("double") / 1e6).alias("lat_max"),
        pct(0.5, 1).alias("lat_p50"),
        pct(0.95, 2).alias("lat_p95"),
        pct(0.99, 3).alias("lat_p99"),
        (
            F.col("__val_sum").cast("double")
            / F.col("__val_cnt").cast("double")
            / 1e6
        ).alias("val_avg"),
        (
            F.col("turn_count").cast("double") / F.lit(float(secs))
        ).alias("activity_rate"),
    )
