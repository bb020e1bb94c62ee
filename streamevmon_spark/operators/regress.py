"""Regression / symbolic per-series analytics: least-squares trend fit
per retention-tier bucket (PromQL ``deriv`` + ``predict_linear``),
cross-tool activity lag correlation, SAX symbolization (PAA segments +
breakpoint alphabet), and seasonal-naive residual anomalies.

These are the forecasting/correlation face of the same continuous-
aggregate machinery the rollup tiers maintain: the reference derives
trend state inside its detectors (the changepoint detector's
incremental mean/variance, reference: detectors/changepoint/
NormalDistribution.scala:40-67; the baseline detector's sliding
percentile window, detectors/baseline/BaselineDetector.scala) — here
the equivalent statistics are exposed as first-class oracle-checked
DataFrame transforms over the transcripts table.

Exactness contract (the discipline every hashed double in this module
follows): all statistics are built from EXACT integer sums — epoch-µs
offsets quantized to ms within the bucket, values µs-quantized via
``floor(value * 1e6)`` — accumulated in DECIMAL(38,0) on the Spark side
and HUGEINT on the DuckDB side (both exact), then cast to DOUBLE once
and combined with a FIXED operand order. The final-formula text is
generated ONCE per statistic by the ``*_sql`` builders below and
rendered verbatim into both engines, so the IEEE ops are bit-identical.

Per-term int64 bounds (asserted by construction, documented here):
``x_ms`` < 8.64e7 (1d tier) and ``|val_q|`` <= 5.61e8 for |value| <=
561 (the input table's documented range; the generator emits < 1000)
give ``x_ms * val_q`` <= 4.9e16 and ``val_q * val_q`` <= 3.2e17 — both
far inside int64. The DECIMAL/HUGEINT *sums* of those terms are exact
at any row count.

Scale shape: every component is one exchange on its natural key.
trend_fit and seasonal_naive group by (series, bucket) — the same key
layout the rollup tiers shuffle on, so AQE reuses/coalesces cleanly
and hot-conversation skew is bounded by the bucket span. sax_symbols
runs two window functions plus two hash aggregations all on the series
key (one exchange, reused). tool_lag_corr aggregates to the tiny
(tool, bucket) relation first — the join input is |tools| x |buckets|,
broadcastable at any raw-table scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamevmon_spark.operators.rollup import (
    EPOCH_NTZ,
    SERIES_KEY,
    TIERS,
)

# ---------------------------------------------------------------------------
# shared fixed-order formula builders (rendered verbatim in BOTH engines)
# ---------------------------------------------------------------------------


def _d(col: str) -> str:
    return f"CAST({col} AS DOUBLE)"


def slope_den_sql(n: str = "n", sx: str = "sx", sxx: str = "sxx") -> str:
    """den = n*Sxx - Sx*Sx on already-exact integer sums cast to double."""
    return f"({_d(n)} * {_d(sxx)} - {_d(sx)} * {_d(sx)})"


def slope_num_sql(
    n: str = "n", sx: str = "sx", sy: str = "sy", sxy: str = "sxy"
) -> str:
    """num = n*Sxy - Sx*Sy (same casting discipline)."""
    return f"({_d(n)} * {_d(sxy)} - {_d(sx)} * {_d(sy)})"


def trend_fit_sql(horizon_ms: int) -> tuple[str, str, str]:
    """(slope_per_s, predict, guard) formula texts over columns
    n/sx/sy/sxx/sxy. slope_q is in µs-quantized value units per ms;
    slope_per_s multiplies by 1e3 (ms->s) then divides the µs
    quantization once; predict evaluates the fit at x = horizon_ms and
    de-quantizes once. Guard: n >= 2 AND den > 0 (den == 0 iff all x
    coincide; it cannot be negative by Cauchy-Schwarz on exact sums)."""
    den = slope_den_sql()
    num = slope_num_sql()
    slope_q = f"({num} / {den})"
    guard = f"(n >= 2 AND {den} > 0.0)"
    slope_per_s = f"({slope_q} * 1e3 / 1e6)"
    intercept_q = f"(({_d('sy')} - {slope_q} * {_d('sx')}) / {_d('n')})"
    predict = (
        f"(({intercept_q} + {slope_q} * CAST({horizon_ms} AS DOUBLE))"
        " / 1e6)"
    )
    return slope_per_s, predict, guard


def pearson_sql() -> tuple[str, str]:
    """(corr, guard) formula texts over columns n/sa/sb/saa/sbb/sab —
    Pearson r from exact integer sums, fixed operand order."""
    va = f"({_d('n')} * {_d('saa')} - {_d('sa')} * {_d('sa')})"
    vb = f"({_d('n')} * {_d('sbb')} - {_d('sb')} * {_d('sb')})"
    num = f"({_d('n')} * {_d('sab')} - {_d('sa')} * {_d('sb')})"
    corr = f"({num} / (sqrt({va}) * sqrt({vb})))"
    guard = f"(n >= 2 AND {va} > 0.0 AND {vb} > 0.0)"
    return corr, guard


# SAX breakpoints for a 4-letter alphabet (standard N(0,1) quartiles,
# fixed literals so both engines compare against identical doubles).
SAX_BREAKPOINTS = (-0.6745, 0.0, 0.6745)


def sax_stats_sql() -> tuple[str, str, str]:
    """(mean, var, paa) formula texts: series mean/variance from exact
    MILLI-quantized integer sums (n/sq/sqq), segment PAA from
    (ssum/cnt). SAX quantizes at 1e3 (not the 1e6 the trend fit uses)
    so the sum of squares stays inside int64 for series up to 2.8e7
    points even at |value| ~ 561 (per-term val_m^2 <= 3.2e11) — the
    alphabet has 4 letters; milli resolution is far below a breakpoint
    width. var divides by n*n (population variance) then de-quantizes
    the squared scale once (1e6)."""
    mean = f"({_d('sq')} / {_d('n')} / 1e3)"
    var = (
        f"((({_d('n')} * {_d('sqq')} - {_d('sq')} * {_d('sq')})"
        f" / ({_d('n')} * {_d('n')})) / 1e6)"
    )
    paa = f"({_d('ssum')} / {_d('cnt')} / 1e3)"
    return mean, var, paa


def sax_symbol_sql(z: str) -> str:
    """Alphabet mapping with fixed literal breakpoints; z is an
    expression yielding identical doubles in both engines."""
    b1, b2, b3 = SAX_BREAKPOINTS
    return (
        f"CASE WHEN {z} < CAST({b1!r} AS DOUBLE) THEN 'a' "
        f"WHEN {z} < CAST({b2!r} AS DOUBLE) THEN 'b' "
        f"WHEN {z} < CAST({b3!r} AS DOUBLE) THEN 'c' "
        "ELSE 'd' END"
    )


# z under a constant series (var <= 0) is defined as 0.0 -> symbol 'c'.
SAX_Z_SQL = (
    "CASE WHEN {var} <= 0.0 THEN CAST(0.0 AS DOUBLE)"
    " ELSE ({paa} - {mean}) / sqrt({var}) END"
)


# ---------------------------------------------------------------------------
# trend fit: deriv + predict_linear per (series, tier bucket)
# ---------------------------------------------------------------------------


def trend_fit(
    transcripts: DataFrame, tier: str = "1h", horizon_s: int = 600
) -> DataFrame:
    """Least-squares fit of value vs time within each (series, tier
    bucket): ``slope_per_s`` is PromQL's ``deriv``; ``predict`` is
    ``predict_linear`` evaluated ``horizon_s`` past the bucket START
    (x = 0 at bucket start, so the horizon is an absolute offset —
    horizon_s > tier span extrapolates past the bucket end). Lossy
    (NULL-value) turns are excluded; buckets with n < 2 or zero time
    spread yield NULL slope/predict but still appear (n is exact)."""
    win_us = TIERS[tier] * 1_000_000
    horizon_ms = horizon_s * 1000
    pts = transcripts.where(F.col("value").isNotNull()).select(
        *SERIES_KEY,
        F.expr(
            f"(datediff(MICROSECOND, {EPOCH_NTZ}, ts) div {win_us})"
            f" * {win_us}"
        ).alias("w_us"),
        F.expr(
            f"(datediff(MICROSECOND, {EPOCH_NTZ}, ts)"
            f" - (datediff(MICROSECOND, {EPOCH_NTZ}, ts) div {win_us})"
            f" * {win_us}) div 1000"
        ).alias("x_ms"),
        F.floor(F.col("value") * 1e6).alias("val_q"),
    )
    dec = "decimal(38,0)"
    g = pts.groupBy("w_us", *SERIES_KEY).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x_ms").cast(dec)).alias("sx"),
        F.sum(F.col("val_q").cast(dec)).alias("sy"),
        F.sum((F.col("x_ms") * F.col("x_ms")).cast(dec)).alias("sxx"),
        F.sum((F.col("x_ms") * F.col("val_q")).cast(dec)).alias("sxy"),
    )
    slope, predict, guard = trend_fit_sql(horizon_ms)
    return g.select(
        F.expr(f"timestampadd(MICROSECOND, w_us, {EPOCH_NTZ})").alias(
            "bucket_start"
        ),
        *SERIES_KEY,
        F.col("n").cast("bigint").alias("n"),
        F.expr(
            f"CASE WHEN {guard} THEN {slope}"
            " ELSE CAST(NULL AS DOUBLE) END"
        ).alias("slope_per_s"),
        F.expr(
            f"CASE WHEN {guard} THEN {predict}"
            " ELSE CAST(NULL AS DOUBLE) END"
        ).alias("predict"),
    )


# ---------------------------------------------------------------------------
# cross-tool activity lag correlation
# ---------------------------------------------------------------------------


def tool_lag_corr(
    transcripts: DataFrame, tier: str = "1h", lag_buckets: int = 1
) -> DataFrame:
    """Pearson correlation between the per-bucket turn COUNTS of every
    ordered tool pair (tool_a < tool_b), with tool_b's series shifted
    ``lag_buckets`` buckets forward (tool_b at bucket t+lag vs tool_a
    at t): does activity in one tool predict activity in another one
    bucket later? Counts are exact ints; only buckets where BOTH tools
    observed turns join (inner join on the bucket index — the sparse
    semantics, stated, deterministic). The joined relation is
    |tools| x |buckets| — tiny at any raw scale."""
    win_us = TIERS[tier] * 1_000_000
    buckets = (
        transcripts.select(
            "tool",
            F.expr(
                f"datediff(MICROSECOND, {EPOCH_NTZ}, ts) div {win_us}"
            ).alias("w_idx"),
        )
        .groupBy("tool", "w_idx")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    pairs = a.join(
        b,
        (F.col("a.tool") < F.col("b.tool"))
        & (F.col("b.w_idx") == F.col("a.w_idx") + F.lit(lag_buckets)),
    ).select(
        F.col("a.tool").alias("tool_a"),
        F.col("b.tool").alias("tool_b"),
        F.col("a.c").alias("ca"),
        F.col("b.c").alias("cb"),
    )
    dec = "decimal(38,0)"
    g = pairs.groupBy("tool_a", "tool_b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("ca").cast(dec)).alias("sa"),
        F.sum(F.col("cb").cast(dec)).alias("sb"),
        F.sum((F.col("ca") * F.col("ca")).cast(dec)).alias("saa"),
        F.sum((F.col("cb") * F.col("cb")).cast(dec)).alias("sbb"),
        F.sum((F.col("ca") * F.col("cb")).cast(dec)).alias("sab"),
    )
    corr, guard = pearson_sql()
    return g.select(
        "tool_a",
        "tool_b",
        F.lit(lag_buckets).cast("int").alias("lag"),
        F.col("n").cast("bigint").alias("n_buckets"),
        F.expr(
            f"CASE WHEN {guard} THEN {corr}"
            " ELSE CAST(NULL AS DOUBLE) END"
        ).alias("corr"),
    )


# ---------------------------------------------------------------------------
# SAX symbolization (PAA + alphabet)
# ---------------------------------------------------------------------------


def sax_symbols(transcripts: DataFrame, n_segments: int = 8) -> DataFrame:
    """SAX per series: z-normalize the series (population mean/std from
    exact integer sums), split its non-lossy points into ``n_segments``
    equal-count segments in stable (ts, turn_idx) order (segment of the
    k-th point, 0-based, is ``k * n_segments div n`` — the standard PAA
    index mapping, exact in integers), average each segment (PAA), and
    map the z-scored PAA onto the 4-letter alphabet at fixed N(0,1)
    quartile breakpoints. Series with n < n_segments emit fewer, still
    well-defined segments. A constant series (var <= 0) symbolizes as
    'c' (z defined 0.0). Values are MILLI-quantized (see sax_stats_sql
    for the int64 bound that buys)."""
    from pyspark.sql import Window

    w_series = Window.partitionBy(*SERIES_KEY)
    w_order = w_series.orderBy("ts", "turn_idx")
    pts = (
        transcripts.where(F.col("value").isNotNull())
        .select(
            *SERIES_KEY,
            "ts",
            "turn_idx",
            F.floor(F.col("value") * 1e3).alias("val_q"),
        )
        .withColumn("k", F.row_number().over(w_order) - 1)
        .withColumn("n", F.count(F.lit(1)).over(w_series))
        .withColumn(
            "seg", F.expr(f"CAST((k * {n_segments}) div n AS INT)")
        )
    )
    dec = "decimal(38,0)"
    segs = pts.groupBy(*SERIES_KEY, "seg").agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("val_q").cast(dec)).alias("ssum"),
        F.sum((F.col("val_q") * F.col("val_q")).cast(dec)).alias("ssqq"),
    )
    series = segs.groupBy(*SERIES_KEY).agg(
        F.max("n").alias("n"),
        F.sum("ssum").alias("sq"),
        F.sum("ssqq").alias("sqq"),
    )
    mean, var, paa = sax_stats_sql()
    z = SAX_Z_SQL.format(var=var, paa=paa, mean=mean)
    joined = segs.drop("n").join(series, on=list(SERIES_KEY))
    return joined.select(
        *SERIES_KEY,
        F.col("seg").cast("int").alias("seg"),
        F.col("cnt").cast("bigint").alias("n_pts"),
        F.expr(paa).alias("paa"),
        F.expr(z).alias("z"),
        F.expr(sax_symbol_sql(z)).alias("sym"),
    )


# ---------------------------------------------------------------------------
# seasonal-naive residual anomalies
# ---------------------------------------------------------------------------


def seasonal_naive(
    transcripts: DataFrame,
    tier: str = "1h",
    season_buckets: int = 24,
    threshold: float = 50.0,
) -> DataFrame:
    """Seasonal-naive forecast residuals: each (series, tier bucket)
    average is compared with the SAME series one season earlier
    (bucket index - season_buckets; 24 x 1h = day-over-day). Bucket
    averages divide exact µs-quantized integer sums once, so both
    engines carry identical doubles into the subtraction. Only buckets
    whose seasonal predecessor exists emit a row (inner join on the
    integer bucket index). is_anom flags |residual| > threshold."""
    win_us = TIERS[tier] * 1_000_000
    dec = "decimal(38,0)"
    avg_sql = "(CAST(sv AS DOUBLE) / CAST(cnt AS DOUBLE) / 1e6)"
    buckets = (
        transcripts.where(F.col("value").isNotNull())
        .select(
            *SERIES_KEY,
            F.expr(
                f"datediff(MICROSECOND, {EPOCH_NTZ}, ts) div {win_us}"
            ).alias("w_idx"),
            F.floor(F.col("value") * 1e6).alias("val_q"),
        )
        .groupBy(*SERIES_KEY, "w_idx")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("val_q").cast(dec)).alias("sv"),
        )
        .select(*SERIES_KEY, "w_idx", F.expr(avg_sql).alias("bucket_avg"))
    )
    cur = buckets.alias("cur")
    prev = buckets.alias("prev")
    thr = f"CAST({float(threshold)!r} AS DOUBLE)"
    joined = cur.join(
        prev,
        [
            F.col(f"cur.{k}") == F.col(f"prev.{k}")
            for k in SERIES_KEY
        ]
        + [
            F.col("cur.w_idx")
            == F.col("prev.w_idx") + F.lit(season_buckets)
        ],
    )
    return joined.select(
        F.expr(
            f"timestampadd(MICROSECOND, cur.w_idx * {win_us},"
            f" {EPOCH_NTZ})"
        ).alias("bucket_start"),
        *[F.col(f"cur.{k}").alias(k) for k in SERIES_KEY],
        F.col("cur.bucket_avg").alias("bucket_avg"),
        F.col("prev.bucket_avg").alias("seasonal_avg"),
        (F.col("cur.bucket_avg") - F.col("prev.bucket_avg")).alias(
            "residual"
        ),
        F.expr(
            f"abs(cur.bucket_avg - prev.bucket_avg) > {thr}"
        ).alias("is_anom"),
    )


# ---------------------------------------------------------------------------
# per-tool activity autocorrelation (ACF at lags 1..K)
# ---------------------------------------------------------------------------


def activity_acf(
    transcripts: DataFrame, tier: str = "1h", max_lag: int = 6
) -> DataFrame:
    """Autocorrelation of each tool's per-bucket turn-count series at
    every lag 1..max_lag — the seasonality detector that motivates
    seasonal_naive's season length. Same exactness machinery as
    tool_lag_corr (integer counts, DECIMAL/HUGEINT sums, the shared
    Pearson formula text); the correlated pairs are the SAME tool's
    buckets at distance k. Note this is the statistician's
    "correlogram over observed pairs": each lag correlates the
    jointly-observed (t, t+k) bucket pairs, with mean/variance
    recomputed per lag (not the fixed-whole-series-mean ACF — stated,
    deterministic, and the form that tolerates missing buckets).
    The lag dimension is a tiny generated relation; the joined input
    is |tools| x |buckets| x max_lag."""
    win_us = TIERS[tier] * 1_000_000
    buckets = (
        transcripts.select(
            "tool",
            F.expr(
                f"datediff(MICROSECOND, {EPOCH_NTZ}, ts) div {win_us}"
            ).alias("w_idx"),
        )
        .groupBy("tool", "w_idx")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    lags = F.explode(
        F.sequence(F.lit(1), F.lit(int(max_lag)))
    ).alias("lag")
    a = buckets.select("tool", "w_idx", "c", lags).alias("a")
    b = buckets.alias("b")
    pairs = a.join(
        b,
        (F.col("a.tool") == F.col("b.tool"))
        & (F.col("b.w_idx") == F.col("a.w_idx") + F.col("a.lag")),
    ).select(
        F.col("a.tool").alias("tool"),
        F.col("a.lag").alias("lag"),
        F.col("a.c").alias("ca"),
        F.col("b.c").alias("cb"),
    )
    dec = "decimal(38,0)"
    g = pairs.groupBy("tool", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("ca").cast(dec)).alias("sa"),
        F.sum(F.col("cb").cast(dec)).alias("sb"),
        F.sum((F.col("ca") * F.col("ca")).cast(dec)).alias("saa"),
        F.sum((F.col("cb") * F.col("cb")).cast(dec)).alias("sbb"),
        F.sum((F.col("ca") * F.col("cb")).cast(dec)).alias("sab"),
    )
    corr, guard = pearson_sql()
    return g.select(
        "tool",
        F.col("lag").cast("int").alias("lag"),
        F.col("n").cast("bigint").alias("n_buckets"),
        F.expr(
            f"CASE WHEN {guard} THEN {corr}"
            " ELSE CAST(NULL AS DOUBLE) END"
        ).alias("acf"),
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust daily slope over hourly averages
# ---------------------------------------------------------------------------


def theilsen_daily(transcripts: DataFrame, tier: str = "1h") -> DataFrame:
    """Theil-Sen robust trend per (series, day): the exact interpolated
    MEDIAN of all pairwise slopes between the day's hourly bucket
    averages — the robust companion to trend_fit's least squares
    (insensitive to up to ~29% outlier hours). Hourly averages divide
    exact µs-quantized integer sums once (identical doubles both
    engines); each pairwise slope is one fixed-order subtraction and
    division; the median reuses the trend-module formula builder
    (operators/trend._median_from_sorted) over the sorted slope array.
    Pair state per (series, day) is bounded at C(24,2) = 276 — constant,
    so the self-join explosion is bounded by 276x the hourly relation,
    NOT by raw row count (the hourly relation is already tiny: one row
    per observed series-hour)."""
    from streamevmon_spark.operators.trend import median_sql_spark

    win_us = TIERS[tier] * 1_000_000
    buckets_per_day = 86_400_000_000 // win_us
    dec = "decimal(38,0)"
    hourly = (
        transcripts.where(F.col("value").isNotNull())
        .select(
            *SERIES_KEY,
            F.expr(
                f"datediff(MICROSECOND, {EPOCH_NTZ}, ts) div {win_us}"
            ).alias("h_idx"),
            F.floor(F.col("value") * 1e6).alias("val_q"),
        )
        .groupBy(*SERIES_KEY, "h_idx")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("val_q").cast(dec)).alias("sv"),
        )
        .select(
            *SERIES_KEY,
            "h_idx",
            F.expr(f"h_idx div {buckets_per_day}").alias("day_idx"),
            F.expr(
                "(CAST(sv AS DOUBLE) / CAST(cnt AS DOUBLE) / 1e6)"
            ).alias("avg_v"),
        )
    )
    a = hourly.alias("a")
    b = hourly.alias("b")
    tier_s = float(TIERS[tier])
    pairs = a.join(
        b,
        [F.col(f"a.{k}") == F.col(f"b.{k}") for k in SERIES_KEY]
        + [
            F.col("a.day_idx") == F.col("b.day_idx"),
            F.col("b.h_idx") > F.col("a.h_idx"),
        ],
    ).select(
        *[F.col(f"a.{k}").alias(k) for k in SERIES_KEY],
        F.col("a.day_idx").alias("day_idx"),
        F.expr(
            "(b.avg_v - a.avg_v)"
            f" / (CAST(b.h_idx - a.h_idx AS DOUBLE) * {tier_s!r})"
        ).alias("slope"),
    )
    g = pairs.groupBy(*SERIES_KEY, "day_idx").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sort_array(F.collect_list("slope")).alias("sarr"),
    )
    med = median_sql_spark("sarr")
    day_us = 86_400_000_000
    return g.select(
        F.expr(
            f"timestampadd(MICROSECOND, day_idx * {day_us}, {EPOCH_NTZ})"
        ).alias("day_start"),
        *SERIES_KEY,
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        F.expr(med).alias("slope_per_s"),
    )
