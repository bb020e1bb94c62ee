"""Chunk compression round-trip + sketch cascade accuracy."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from streamevmon_spark.data.transcripts import load_transcripts
from streamevmon_spark.operators.chunks import (
    chunk_table,
    compress_chunks,
    decompress_chunks,
)
from streamevmon_spark.operators.rollup import EPOCH_NTZ, rollup_tier
from streamevmon_spark.operators.sketch_rollup import (
    cascade_sketches,
    sketch_quantiles,
    sketch_tier,
)


def test_chunk_roundtrip_exact(spark, sf_dir):
    df = load_transcripts(spark, sf_dir)
    points = df.where(F.col("value").isNotNull()).select(
        "conv_id", "tool", "role",
        F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)").alias("ts_us"),
        "value",
    )
    chunks = compress_chunks(points, "1d")
    back = decompress_chunks(chunks)
    a = points.orderBy("conv_id", "tool", "role", "ts_us").toPandas()
    b = back.orderBy("conv_id", "tool", "role", "ts_us").toPandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b)


def test_chunk_table_counts(spark, sf_dir):
    df = load_transcripts(spark, sf_dir)
    t = chunk_table(df, grid_tier="1h", chunk_tier="1d").toPandas()
    assert (t["n_points"] > 0).all()
    assert t["ts_dod"].map(len).gt(4).all()
    # compression sanity: blob far smaller than 8 bytes/point for the
    # regular 1h grid
    bytes_per_pt = t["ts_dod"].map(len).sum() / t["n_points"].sum()
    assert bytes_per_pt < 4.0


def _points(spark, sf_dir):
    df = load_transcripts(spark, sf_dir)
    return df.where(F.col("value").isNotNull()).select(
        "conv_id", "tool", "role",
        F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)").alias("ts_us"),
        "value",
    )


def _sorted_chunks_pdf(df):
    pdf = df.toPandas().sort_values(
        ["conv_id", "tool", "role", "chunk_us"], ignore_index=True
    )
    pdf["ts_dod"] = pdf["ts_dod"].map(bytes)
    pdf["values_gorilla"] = pdf["values_gorilla"].map(bytes)
    return pdf


def test_compact_finer_chunks_byte_equals_direct_build(spark, sf_dir):
    """Compacting 1h chunk blobs into 1d buckets must reproduce the
    from-scratch 1d chunk build BYTE-identically (same canonical
    sorted-points encoding), so compaction is invisible to readers."""
    from streamevmon_spark.operators.chunks import compact_chunks

    points = _points(spark, sf_dir)
    fine = compress_chunks(points, "1h")
    compacted = _sorted_chunks_pdf(compact_chunks(fine, "1d"))
    direct = _sorted_chunks_pdf(compress_chunks(points, "1d"))
    pd.testing.assert_frame_equal(compacted, direct)


def test_compact_fragmented_appends_byte_equals_direct_build(spark, sf_dir):
    """Two incremental runs each chunk part of a day; compacting the
    union of their (same-bucket, fragmented) blobs equals one full
    build — including the in-bucket point re-sort across fragments."""
    from streamevmon_spark.operators.chunks import compact_chunks

    points = _points(spark, sf_dir)
    odd = points.where(F.col("ts_us") % 2 == 1)
    even = points.where(F.col("ts_us") % 2 == 0)
    frag = compress_chunks(odd, "1d").unionAll(compress_chunks(even, "1d"))
    compacted = _sorted_chunks_pdf(compact_chunks(frag, "1d"))
    direct = _sorted_chunks_pdf(compress_chunks(points, "1d"))
    pd.testing.assert_frame_equal(compacted, direct)


def test_compact_idempotent(spark, sf_dir):
    from streamevmon_spark.operators.chunks import compact_chunks

    fine = compress_chunks(_points(spark, sf_dir), "1h")
    once = compact_chunks(fine, "1d")
    twice = _sorted_chunks_pdf(compact_chunks(once, "1d"))
    pd.testing.assert_frame_equal(twice, _sorted_chunks_pdf(once))


def test_sketch_matches_exact_percentiles(spark, sf_dir):
    df = load_transcripts(spark, sf_dir)
    exact = rollup_tier(df, "1d").select(
        "conv_id", "tool", "role",
        F.expr(
            f"datediff(MICROSECOND, {EPOCH_NTZ}, window_start)"
        ).alias("window_start_us"),
        "lat_p50", "lat_p95",
    ).toPandas()
    sk = sketch_quantiles(sketch_tier(df, "1d"), (0.5, 0.95)).toPandas()
    m = exact.merge(
        sk, on=["conv_id", "tool", "role", "window_start_us"], how="inner"
    )
    ok = m.dropna(subset=["lat_p50", "q50"])
    rel = np.abs(ok["q50"] - ok["lat_p50"]) / np.maximum(ok["lat_p50"], 1e-9)
    assert rel.median() < 0.05
    rel95 = np.abs(ok["q95"] - ok["lat_p95"]) / np.maximum(
        ok["lat_p95"], 1e-9
    )
    assert rel95.median() < 0.1


def test_cascade_sketch_close_to_direct(spark, sf_dir):
    df = load_transcripts(spark, sf_dir)
    via = sketch_quantiles(
        cascade_sketches(sketch_tier(df, "1h"), "1d"), (0.5,)
    ).toPandas()
    direct = sketch_quantiles(sketch_tier(df, "1d"), (0.5,)).toPandas()
    m = via.merge(
        direct,
        on=["conv_id", "tool", "role", "window_start_us"],
        suffixes=("_v", "_d"),
    )
    ok = m.dropna()
    rel = np.abs(ok["q50_v"] - ok["q50_d"]) / np.maximum(ok["q50_d"], 1e-9)
    assert rel.median() < 0.1


def test_chunk_range_read_matches_direct_point_filter(spark, sf_dir):
    from streamevmon_spark.operators.chunks import chunk_range_read
    from streamevmon_spark.operators.tier_router import default_range_us

    df = load_transcripts(spark, sf_dir)
    points = df.select(
        "conv_id", "tool", "role",
        F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)").alias("ts_us"),
        "value",
    )
    row = points.select(
        F.min("ts_us").alias("mn"), F.max("ts_us").alias("mx")
    ).collect()[0]
    t0, t1 = default_range_us(row.mn, row.mx)
    chunks = compress_chunks(points, "1d")
    got = (
        chunk_range_read(chunks, t0, t1)
        .orderBy("conv_id", "tool", "role")
        .toPandas()
    )
    # direct twin: no compression at all, same aggregate over raw points
    rng = points.where((F.col("ts_us") >= t0) & (F.col("ts_us") < t1))
    lossy = F.col("value").isNull()
    exp = (
        rng.groupBy("conv_id", "tool", "role")
        .agg(
            F.count(F.lit(1)).alias("point_count"),
            F.sum(lossy.cast("long")).alias("lossy_count"),
            (F.sum(F.floor(F.col("value") * 1e6)).cast("double")
             / F.count("value").cast("double") / F.lit(1e6)).alias("val_avg"),
            F.min("value").alias("val_min"),
            F.max("value").alias("val_max"),
            F.expr(
                f"timestampadd(MICROSECOND, min(ts_us), {EPOCH_NTZ})"
            ).alias("ts_first"),
            F.expr(
                f"timestampadd(MICROSECOND, max(ts_us), {EPOCH_NTZ})"
            ).alias("ts_last"),
        )
        .orderBy("conv_id", "tool", "role")
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True)
    )


def test_chunk_range_read_prunes_before_decode(spark, sf_dir):
    """The chunk_us range predicates must sit BELOW the decode
    mapInPandas (on the chunk relation), so a stored chunk table only
    ever decodes overlapping chunks."""
    from streamevmon_spark.operators.chunks import chunk_range_read

    df = load_transcripts(spark, sf_dir)
    points = df.select(
        "conv_id", "tool", "role",
        F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)").alias("ts_us"),
        "value",
    )
    chunks = compress_chunks(points, "1d")
    day = 86_400_000_000
    lo = (1_704_067_200_000_000 // day) * day + day  # second day
    plan = chunk_range_read(chunks, lo, lo + day)._jdf.queryExecution() \
        .optimizedPlan().toString()
    # the prune filter references chunk_us, and it appears under (after,
    # in plan text order) the decode MapInPandas node
    decode_at = plan.find("mapInPandas")
    if decode_at == -1:
        decode_at = plan.find("MapInPandas")
    filt_at = plan.find("chunk_us")
    assert decode_at != -1 and filt_at != -1
    assert filt_at > decode_at, plan


def test_compress_chunks_duplicate_instants_raise(spark):
    """The store key is one point per (series, instant): duplicate
    instants without a tie-break column violate the contract and raise
    at encode time (every *_from_store read relies on the invariant)."""
    import pytest as _pytest

    rows = [
        ("c1", "t", "r", 1_000_000, 1.0, 0),
        ("c1", "t", "r", 1_000_000, 2.0, 1),
        ("c1", "t", "r", 2_000_000, 3.0, 2),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, tool string, role string, ts_us long, "
        "value double, turn_idx int",
    )
    with _pytest.raises(Exception, match="duplicate"):
        decompress_chunks(compress_chunks(df, "1d")).collect()


def test_compress_chunks_turn_col_dedup_keeps_max_turn(spark):
    """With turn_col, duplicate instants canonicalize to the max-turn
    row — the arg_max(value, turn_idx) convention of the batch obs
    paths — and unique inputs are untouched."""
    rows = [
        ("c1", "t", "r", 1_000_000, 1.0, 0),
        ("c1", "t", "r", 1_000_000, 2.0, 1),
        ("c1", "t", "r", 2_000_000, 3.0, 2),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, tool string, role string, ts_us long, "
        "value double, turn_idx int",
    )
    out = decompress_chunks(
        compress_chunks(df, "1d", turn_col="turn_idx")
    ).collect()
    assert sorted((r.ts_us, r.value) for r in out) == [
        (1_000_000, 2.0), (2_000_000, 3.0)]
    uniq = df.where("turn_idx != 1")
    out2 = decompress_chunks(compress_chunks(uniq, "1d")).collect()
    assert sorted((r.ts_us, r.value) for r in out2) == [
        (1_000_000, 1.0), (2_000_000, 3.0)]
