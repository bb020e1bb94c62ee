"""LTTB downsampling (operators/downsample.py): hand-computed worked
examples for the kernel, distributed invariants, and the bucket-id
closed form used by both the kernel and the recursive-CTE oracle.
Cross-engine bit-exactness is covered by the driver gate
(downsample_lttb vs oracles.lttb_oracle)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from streamevmon_spark.data.transcripts import load_transcripts
from streamevmon_spark.operators.downsample import (
    _bucket_bounds,
    downsample_lttb,
    downsample_m4,
    lttb_select,
)


def test_lttb_keeps_all_when_small():
    x = np.arange(5, dtype=np.int64)
    y = np.arange(5, dtype=np.int64)
    assert lttb_select(x, y, 5).tolist() == [0, 1, 2, 3, 4]
    assert lttb_select(x, y, 10).tolist() == [0, 1, 2, 3, 4]


def test_lttb_single_bucket_picks_peak():
    # n_out=3 -> one interior bucket anchored on the last point: the
    # spike at index 2 maximizes the triangle area
    x = np.arange(5, dtype=np.int64)
    y = np.array([0, 0, 10, 0, 0], dtype=np.int64)
    assert lttb_select(x, y, 3).tolist() == [0, 2, 4]


def test_lttb_tie_breaks_to_first():
    x = np.arange(5, dtype=np.int64)
    y = np.array([0, 5, 5, 5, 0], dtype=np.int64)  # symmetric plateau
    sel = lttb_select(x, y, 3)
    assert sel.tolist() == [0, 1, 4]  # first max area wins


def test_lttb_two_buckets_worked_example():
    # n=8, n_out=4 -> m=6 interior pts (idx 1..6), B=2 buckets of 3:
    # bucket0 = idx 1-3 (anchor = avg of bucket1 = (5,3)), bucket1 =
    # idx 4-6 (anchor = last point). Bucket0 picks the spike at idx 3
    # (area 36 vs 2/1). Bucket1 areas vs prev=(3,9), anchor=(7,0):
    # |-4(cy-9)+9(3-cx)| -> idx4: 23, idx5: 10, idx6: 5 — the LTTB
    # triangle picks idx 4 (large drop from the spike), not the
    # second bump.
    x = np.arange(8, dtype=np.int64)
    y = np.array([0, 1, 1, 9, 1, 7, 1, 0], dtype=np.int64)
    assert lttb_select(x, y, 4).tolist() == [0, 3, 4, 7]


def test_bucket_bounds_cover_interior_exactly():
    for m, B in [(6, 2), (7, 3), (100, 9), (5, 5)]:
        b = _bucket_bounds(m, B)
        assert b[0] == 0 and b[-1] == m
        assert (np.diff(b) >= 1).all()  # non-empty buckets for m >= B
        # closed-form bucket id (the oracle's formula) agrees with the
        # boundary table for every interior offset
        for o in range(m):
            k_closed = ((o + 1) * B + m - 1) // m - 1
            k_table = int(np.searchsorted(b, o, side="right") - 1)
            assert k_closed == k_table, (m, B, o)


def test_downsample_lttb_invariants(spark, sf_dir):
    df = load_transcripts(spark, sf_dir)
    out = downsample_lttb(df, 16).persist()
    try:
        sizes = out.groupBy("conv_id", "tool", "role").count()
        assert sizes.where("count > 16").count() == 0
        # first and last non-lossy point of every series are kept
        pts = df.where(F.col("value").isNotNull())
        ends = pts.groupBy("conv_id", "tool", "role").agg(
            F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
        )
        joined = ends.join(out, ["conv_id", "tool", "role"])
        n_series = ends.count()
        assert (
            joined.where(F.col("ts") == F.col("first_ts"))
            .select("conv_id", "tool", "role").distinct().count()
            == n_series
        )
        assert (
            joined.where(F.col("ts") == F.col("last_ts"))
            .select("conv_id", "tool", "role").distinct().count()
            == n_series
        )
        # selected rows are a subset of the input rows
        assert out.join(
            pts.select("conv_id", "tool", "role", "ts", "value"),
            ["conv_id", "tool", "role", "ts", "value"],
            "left_anti",
        ).count() == 0
    finally:
        out.unpersist()


def test_downsample_plan_single_exchange(spark, sf_dir):
    df = load_transcripts(spark, sf_dir)
    plan = (
        downsample_lttb(df, 16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one series exchange for the kernel; the transcripts derivation's
    # own conv_id window exchange is upstream of it
    assert plan.count("Exchange") <= 2, plan


def test_n_out_validation(spark, sf_dir):
    with pytest.raises(ValueError):
        downsample_lttb(load_transcripts(spark, sf_dir), 2)


def test_downsample_lttb_from_store_equals_raw(spark, sf_dir):
    """The store-served path (compress → decode → kernel) must select
    exactly the points the raw path selects: the codec round-trip is
    bit-exact and the store keys one point per (series, instant), so
    the x-only sort is the same total order as raw's (x, turn_idx)."""
    import pandas as pd

    from streamevmon_spark.operators.chunks import compress_chunks
    from streamevmon_spark.operators.downsample import (
        downsample_lttb_from_store,
    )
    from streamevmon_spark.operators.rollup import EPOCH_NTZ

    df = load_transcripts(spark, sf_dir)
    pts = df.where(F.col("value").isNotNull()).select(
        "conv_id", "tool", "role",
        F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)").alias("ts_us"),
        "value",
    )
    got = (
        downsample_lttb_from_store(compress_chunks(pts, "1d"), 16)
        .toPandas()
    )
    exp = downsample_lttb(df, 16).toPandas()
    key = ["conv_id", "tool", "role", "ts"]
    got = got.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    got["ts"] = got["ts"].astype("datetime64[us]")
    exp["ts"] = exp["ts"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_downsample_m4_from_store_equals_raw(spark, sf_dir):
    """Store-served M4 must pick exactly the raw path's points: codec
    round-trip is bit-exact and unique instants make the turn_idx
    tie-break unreachable."""
    import pandas as pd

    from streamevmon_spark.operators.chunks import compress_chunks
    from streamevmon_spark.operators.downsample import (
        downsample_m4_from_store,
    )
    from streamevmon_spark.operators.rollup import EPOCH_NTZ

    df = load_transcripts(spark, sf_dir)
    pts = df.where(F.col("value").isNotNull()).select(
        "conv_id", "tool", "role",
        F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)").alias("ts_us"),
        "value",
    )
    got = downsample_m4_from_store(compress_chunks(pts, "1d")).toPandas()
    exp = downsample_m4(df).toPandas()
    key = ["conv_id", "tool", "role", "bucket_start", "ts"]
    got = got.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    for c in ("bucket_start", "ts"):
        got[c] = got[c].astype("datetime64[us]")
        exp[c] = exp[c].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_downsample_m4_invariants(spark, sf_dir):
    df = load_transcripts(spark, sf_dir)
    out = downsample_m4(df).persist()
    try:
        # at most 4 distinct points per (series, bucket)
        per_bucket = out.groupBy(
            "conv_id", "tool", "role", "bucket_start"
        ).count()
        assert per_bucket.where("count > 4").count() == 0
        # the min and max value of every bucket survive exactly
        pts = df.where(F.col("value").isNotNull()).select(
            "conv_id", "tool", "role", "ts", "value"
        )
        win = 3_600_000_000
        bucketed = pts.withColumn(
            "bucket_start",
            F.expr(
                "timestampadd(MICROSECOND, CAST(floor(datediff("
                f"MICROSECOND, timestamp_ntz'1970-01-01', ts) / {win})"
                f" AS BIGINT) * {win}, timestamp_ntz'1970-01-01')"
            ),
        )
        ext = bucketed.groupBy(
            "conv_id", "tool", "role", "bucket_start"
        ).agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
        got = out.groupBy("conv_id", "tool", "role", "bucket_start").agg(
            F.min("value").alias("gmin"), F.max("value").alias("gmax")
        )
        j = ext.join(got, ["conv_id", "tool", "role", "bucket_start"])
        assert j.count() == ext.count()
        assert j.where(
            (F.col("vmin") != F.col("gmin"))
            | (F.col("vmax") != F.col("gmax"))
        ).count() == 0
        # selected rows are a subset of the input rows
        assert out.select(
            "conv_id", "tool", "role", "ts", "value"
        ).join(pts, ["conv_id", "tool", "role", "ts", "value"],
               "left_anti").count() == 0
    finally:
        out.unpersist()


def test_downsample_m4_single_point_exchange(spark, sf_dir):
    # all four argext windows share one (series, bucket) partitioning:
    # Catalyst must plan ONE exchange per branch of the union over the
    # same shuffle (plus the upstream transcripts-derivation exchange
    # and the final distinct); no more
    df = load_transcripts(spark, sf_dir)
    plan = (
        downsample_m4(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") <= 6, plan


def _ref_lttb(x, y, n_out):
    """Arbitrary-precision reference walk (python ints for the rebased
    anchor sums, floats in the kernel's operand order)."""
    n = len(x)
    if n <= n_out:
        return list(range(n))
    m, B = n - 2, n_out - 2
    bounds = [(k * m) // B + 1 for k in range(B + 1)]
    sel = [0]
    px, py = float(x[0]), float(y[0])
    for k in range(B):
        lo, hi = bounds[k], bounds[k + 1]
        if k < B - 1:
            nlo, nhi = bounds[k + 1], bounds[k + 2]
            cnt = nhi - nlo
            bx = min(int(v) for v in x[nlo:nhi])
            by = min(int(v) for v in y[nlo:nhi])
            ax = float(bx) + float(
                sum(int(v) - bx for v in x[nlo:nhi])
            ) / float(cnt)
            ay = float(by) + float(
                sum(int(v) - by for v in y[nlo:nhi])
            ) / float(cnt)
        else:
            ax, ay = float(x[n - 1]), float(y[n - 1])
        best, best_area = lo, -1.0
        for j in range(lo, hi):
            area = abs(
                (px - ax) * (float(y[j]) - py)
                - (px - float(x[j])) * (ay - py)
            )
            if area > best_area:
                best_area, best = area, j
        sel.append(best)
        px, py = float(x[best]), float(y[best])
    sel.append(n - 1)
    return sel


def test_lttb_no_int64_overflow_on_epoch_us():
    # epoch-µs timestamps (~1.7e15) with >5000-point buckets: a raw
    # int64 reduceat sum would wrap silently; the rebased kernel must
    # match an arbitrary-precision reference exactly
    rng = np.random.default_rng(7)
    n = 20_001
    x = 1_700_000_000_000_000 + np.arange(n, dtype=np.int64) * 250_000
    y = rng.integers(0, 5_000_000, size=n).astype(np.int64)
    for n_out in (3, 5, 16):
        got = lttb_select(x, y, n_out).tolist()
        assert got == _ref_lttb(x, y, n_out), n_out


def test_lttb_overflow_guard_raises():
    # adversarial span*count product beyond int64 even after rebasing:
    # the kernel must refuse rather than wrap
    n = 8_192
    x = np.arange(n, dtype=np.int64) * (2**50)
    y = np.zeros(n, dtype=np.int64)
    with pytest.raises(OverflowError):
        lttb_select(x, y, 3)
