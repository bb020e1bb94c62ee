"""Visual downsampling of per-series points: LTTB
(Largest-Triangle-Three-Buckets, Steinarsson 2013 — the downsampler
Grafana/time-series UIs use). Complements the tier rollups: rollups
aggregate values per window; LTTB selects the n_out RAW points that
best preserve the visual shape of each series.

Spark-first shape: one exchange into (series)-partitioned layout +
partition-local sort, then a single vectorized Arrow pass per group
(operators/_partitionwise.py — the same kernel harness as the
chunk codec and detector folds). No driver collect; memory per task is
bounded by one series' points, same bound as the percentile rollup.

Cross-engine determinism (oracles.lttb_oracle replays the greedy walk
as a recursive CTE with a NOT-EXISTS argmax):
- x is integer µs (exact in double below 2^53);
- y is floor(value * 1e6) integer quantization (floor of a double is
  exact), and bucket-average anchors are computed REBASED per bucket:
  anchor = double(min) + double(sum(v - min)) / double(count), with
  the identical operand order in both engines. Rebasing bounds the
  integer sum by count * in-bucket span (raw epoch-µs sums would wrap
  int64 silently once a bucket holds ~5000 points); an explicit guard
  asserts the bound so overflow can never pass silently;
- the triangle-area formula is written with the identical operand
  order, so IEEE doubles agree bit-for-bit and both engines pick the
  same argmax (ties -> first point in (ts, turn_idx) order).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamevmon_spark.operators._partitionwise import partitionwise_apply
from streamevmon_spark.operators.rollup import EPOCH_NTZ, SERIES_KEY

_OUT_SCHEMA = (
    "conv_id string, tool string, role string, ts timestamp_ntz, "
    "value double"
)


def _bucket_bounds(m: int, B: int) -> np.ndarray:
    """Interior-offset boundaries: bucket k covers offsets
    [floor(k*m/B), floor((k+1)*m/B)); non-empty for m >= B."""
    k = np.arange(B + 1, dtype=np.int64)
    return (k * m) // B


def lttb_select(
    x: np.ndarray, y: np.ndarray, n_out: int
) -> np.ndarray:
    """Indices of the LTTB-selected points of one series (x int64 µs,
    y int64 quantized values, both sorted by x then tie order).
    Always includes the first and last point."""
    n = x.size
    if n <= n_out:
        return np.arange(n, dtype=np.int64)
    m, B = n - 2, n_out - 2
    bounds = _bucket_bounds(m, B) + 1  # absolute indices into x/y
    xd = x.astype(np.float64)
    yd = y.astype(np.float64)
    # per-bucket anchors: average of the NEXT bucket, last bucket
    # anchored on the final point. Sums are REBASED by the per-bucket
    # minimum so they stay exact in int64 (raw epoch-µs values are
    # ~1.8e15 each and wrap once a bucket holds >~5000 points); the
    # base is added back as double(base) + double(sum)/double(cnt),
    # byte-identical to the oracle SQL. reduceat over all B+1
    # boundaries, keep the first B segments (the trailing
    # [bounds[B], n) segment is the final point, not a bucket).
    cnt = np.diff(bounds)
    base_x = np.minimum.reduceat(x, bounds)[:B]
    base_y = np.minimum.reduceat(y, bounds)[:B]
    span = bounds[0], bounds[B]
    rep_x = np.repeat(base_x, cnt)
    rep_y = np.repeat(base_y, cnt)
    # overflow guard: count * in-bucket span must fit int64 (float
    # compare with margin; the product itself could wrap in int64)
    max_x = np.maximum.reduceat(x, bounds)[:B]
    max_y = np.maximum.reduceat(y, bounds)[:B]
    if (
        cnt.astype(np.float64) * (max_x - base_x).astype(np.float64)
    ).max(initial=0.0) >= 2.0**62 or (
        cnt.astype(np.float64) * (max_y - base_y).astype(np.float64)
    ).max(initial=0.0) >= 2.0**62:
        raise OverflowError(
            "lttb_select: rebased per-bucket sum would exceed int64"
        )
    off = bounds[:B] - span[0]
    sum_x = np.add.reduceat(x[span[0]:span[1]] - rep_x, off)
    sum_y = np.add.reduceat(y[span[0]:span[1]] - rep_y, off)
    ax = np.empty(B, dtype=np.float64)
    ay = np.empty(B, dtype=np.float64)
    ax[: B - 1] = base_x[1:].astype(np.float64) + (
        sum_x[1:].astype(np.float64) / cnt[1:].astype(np.float64)
    )
    ay[: B - 1] = base_y[1:].astype(np.float64) + (
        sum_y[1:].astype(np.float64) / cnt[1:].astype(np.float64)
    )
    ax[B - 1], ay[B - 1] = xd[n - 1], yd[n - 1]

    sel = np.empty(n_out, dtype=np.int64)
    sel[0] = 0
    sel[n_out - 1] = n - 1
    px, py = xd[0], yd[0]
    for k in range(B):
        lo, hi = bounds[k], bounds[k + 1]
        cx, cy = xd[lo:hi], yd[lo:hi]
        # abs((px-ax)*(cy-py) - (px-cx)*(ay-py)); /2 dropped (argmax)
        area = np.abs(
            (px - ax[k]) * (cy - py) - (px - cx) * (ay[k] - py)
        )
        j = lo + int(np.argmax(area))  # first max = tie-break
        sel[k + 1] = j
        px, py = xd[j], yd[j]
    return sel


def downsample_lttb(df: DataFrame, n_out: int = 64) -> DataFrame:
    """LTTB-downsample each (conv_id, tool, role) series of the
    transcripts table to at most ``n_out`` raw points (lossy NULL-value
    turns are dropped first, as in every rollup path). ``n_out >= 3``.

    reference intent: the reference exposes its stored series to
    Grafana dashboards (docs/grafana; InfluxDB retention tiers); LTTB
    is the industry-standard shape-preserving read-side downsample for
    exactly that surface, here as a first-class distributed operator.
    """
    if n_out < 3:
        raise ValueError("n_out must be >= 3")
    pts = df.where(F.col("value").isNotNull()).select(
        *SERIES_KEY,
        "turn_idx",
        "ts",
        "value",
        F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)").alias("x"),
        F.expr("CAST(floor(value * 1000000) AS BIGINT)").alias("y"),
    )
    return partitionwise_apply(
        pts, SERIES_KEY, ["x", "turn_idx"], _lttb_batch_fn(n_out),
        _OUT_SCHEMA,
    )


def _lttb_batch_fn(n_out: int):
    def batch(pdf: pd.DataFrame) -> pd.DataFrame:
        from streamevmon_spark.operators._partitionwise import (
            group_starts,
        )

        outs = []
        starts = group_starts(pdf, SERIES_KEY)
        ends = np.append(starts[1:], len(pdf))
        x = pdf["x"].to_numpy(np.int64)
        y = pdf["y"].to_numpy(np.int64)
        for s, e in zip(starts, ends):
            sel = s + lttb_select(x[s:e], y[s:e], n_out)
            outs.append(
                pdf.iloc[sel][
                    ["conv_id", "tool", "role", "ts", "value"]
                ]
            )
        return pd.concat(outs, ignore_index=True)

    return batch


def downsample_lttb_from_store(
    chunks: DataFrame, n_out: int = 64
) -> DataFrame:
    """LTTB served from the COMPRESSED chunk store
    (operators/chunks.compress_chunks blobs) instead of raw points:
    metadata-level pruning happens on the chunk relation upstream
    (chunk_us / chunk_start, as in chunk_range_read), then blobs
    decode in a vectorized pass and feed the identical LTTB kernel.
    This is the dashboard read path at 10^12 turns — the raw table is
    cold/expired under retention while the store keeps the points.

    Exactness: the codec round-trip is bit-exact, so the decoded
    (x, y) streams equal the raw path's. The store holds ONE point per
    (series, instant) — a time-series store's key — so sorting by x
    alone is the same total order as the raw path's (x, turn_idx)
    tie-break, and the selection is bit-identical to
    ``downsample_lttb`` on the stored points (gate query
    `downsample_lttb_store` hashes against the SAME raw-path oracle;
    NaN instants a gap-filled store uses for beyond-purge grid slots
    are dropped exactly like the raw path's NULL-value turns).
    """
    from streamevmon_spark.operators.chunks import decompress_chunks

    if n_out < 3:
        raise ValueError("n_out must be >= 3")
    pts = (
        decompress_chunks(chunks)
        # the Arrow boundary may map the in-blob NaN lossy sentinel
        # back to NULL, and isnan(NULL) is false — mirror
        # chunk_range_read's defensive predicate so a gap-filled store
        # drops unfilled instants in either representation
        .where(~(F.col("value").isNull() | F.isnan(F.col("value"))))
        .select(
            *SERIES_KEY,
            F.expr(
                f"timestampadd(MICROSECOND, ts_us, {EPOCH_NTZ})"
            ).alias("ts"),
            "value",
            F.col("ts_us").alias("x"),
            F.expr("CAST(floor(value * 1000000) AS BIGINT)").alias("y"),
        )
    )
    return partitionwise_apply(
        pts, SERIES_KEY, ["x"], _lttb_batch_fn(n_out), _OUT_SCHEMA
    )


def downsample_m4(
    df: DataFrame, width_us: int = 3_600_000_000
) -> DataFrame:
    """M4 downsample (Jugel et al., VLDB 2014): per (conv_id, tool,
    role) series and tumbling time bucket of ``width_us`` µs, keep the
    four pixel-exact extremum points — first (min ts), last (max ts),
    bottom (min value), top (max value) — as the distinct point set.
    The canonical error-free line-rendering downsample; complements
    LTTB (shape-greedy, fixed point budget) with a fixed TIME grid.

    reference intent: the same dashboard read surface as LTTB
    (docs/grafana, InfluxDB retention tiers); M4 is what a width-w
    pixel column renders losslessly.

    Spark-first shape: NO Python — four ROW_NUMBER windows over the
    SAME (series, bucket) partitioning (Catalyst plans one exchange +
    per-role sorts), union, distinct. Ties are broken on the total
    order (x, turn_idx) [value ties: (y, x, turn_idx)], mirrored
    textually in oracles.m4_oracle; value comparisons happen on the
    floor(value*1e6) int64 quantization (exact cross-engine), the
    same domain the LTTB kernel uses.
    """
    pts = df.where(F.col("value").isNotNull()).select(
        *SERIES_KEY,
        "turn_idx",
        "ts",
        "value",
        F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)").alias("x"),
        F.expr("CAST(floor(value * 1000000) AS BIGINT)").alias("y"),
    )
    return _m4_over_points(pts, width_us)


def downsample_m4_from_store(
    chunks: DataFrame, width_us: int = 3_600_000_000
) -> DataFrame:
    """M4 served from the compressed chunk store — the same
    decode-then-identical-operator composition as
    ``downsample_lttb_from_store`` (see its docstring for the
    exactness argument). The store's one-point-per-instant key makes
    the turn_idx tie-break unreachable — x is already unique within a
    series — so a constant stands in for it and the four-window pick
    is bit-identical to the raw path over the stored points."""
    from streamevmon_spark.operators.chunks import decompress_chunks

    pts = (
        decompress_chunks(chunks)
        # the Arrow boundary may map the in-blob NaN lossy sentinel
        # back to NULL, and isnan(NULL) is false — mirror
        # chunk_range_read's defensive predicate so a gap-filled store
        # drops unfilled instants in either representation
        .where(~(F.col("value").isNull() | F.isnan(F.col("value"))))
        .select(
            *SERIES_KEY,
            F.lit(0).alias("turn_idx"),
            F.expr(
                f"timestampadd(MICROSECOND, ts_us, {EPOCH_NTZ})"
            ).alias("ts"),
            "value",
            F.col("ts_us").alias("x"),
            F.expr("CAST(floor(value * 1000000) AS BIGINT)").alias("y"),
        )
    )
    return _m4_over_points(pts, width_us)


def _m4_over_points(pts: DataFrame, width_us: int) -> DataFrame:
    from pyspark.sql.window import Window

    pts = pts.withColumn(
        "bucket", F.expr(f"CAST(floor(x / {width_us}) AS BIGINT)")
    )
    part = [*SERIES_KEY, "bucket"]
    orders = {
        "first": [F.col("x").asc(), F.col("turn_idx").asc()],
        "last": [F.col("x").desc(), F.col("turn_idx").desc()],
        "bottom": [F.col("y").asc(), F.col("x").asc(),
                   F.col("turn_idx").asc()],
        "top": [F.col("y").desc(), F.col("x").asc(),
                F.col("turn_idx").asc()],
    }
    picked = None
    for order in orders.values():
        w = Window.partitionBy(*part).orderBy(*order)
        sel = (
            pts.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(*SERIES_KEY, "bucket", "ts", "value")
        )
        picked = sel if picked is None else picked.unionAll(sel)
    return picked.distinct().select(
        *SERIES_KEY,
        F.expr(
            f"timestampadd(MICROSECOND, bucket * {width_us}, "
            f"{EPOCH_NTZ})"
        ).alias("bucket_start"),
        "ts",
        "value",
    )
