"""Compressed chunk columns: Gorilla value blobs + delta-of-delta ts blobs.

``compress_chunks`` packs each (series, chunk-window)'s points into two
BinaryType blobs (north star: "compressed with Gorilla XOR float encoding
plus delta-of-delta timestamp encoding into chunked byte arrays stored as
blob columns"); ``decompress_chunks`` explodes them back to points —
round-trip asserted exactly in tests.

Executed as applyInPandas over (series, chunk) groups: Arrow-batched,
vectorized NumPy bit-packing inside (functions/codecs.py), no per-row
Python. Chunk windows bound group size (a 1d chunk of a 1m grid is ≤1440
points), so executor memory stays flat at any table size — the 2 GB
Arrow group limit can't be hit.

Input contract: (conv_id, tool, role, ts_us long, value double) — raw
observations or a gap-filled grid (operators/gapfill.py). Points are
sorted by ts_us inside each chunk; NaN encodes lossy/unfilled instants
bit-exactly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamevmon_spark.operators.rollup import EPOCH_NTZ, SERIES_KEY, TIERS

CHUNK_SCHEMA = (
    "conv_id string, tool string, role string, chunk_us long, "
    "n_points int, ts_dod binary, values_gorilla binary"
)


def compress_chunks(
    points: DataFrame,
    chunk_tier: str = "1d",
    ts_col: str = "ts_us",
    value_col: str = "value",
) -> DataFrame:
    """points(series key, ts_us, value) → one row per (series, chunk):
    (…, chunk_us, n_points, ts_dod, values_gorilla)."""
    chunk_us = TIERS[chunk_tier] * 1_000_000

    def encode(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        from streamevmon_spark.functions.codecs import dod_encode, gorilla_encode

        pdf = pdf.sort_values("__ts")
        t = pdf["__ts"].to_numpy(np.int64)
        v = pdf["__val"].to_numpy(np.float64)
        return pd.DataFrame(
            {
                "conv_id": [key[0]],
                "tool": [key[1]],
                "role": [key[2]],
                "chunk_us": [key[3]],
                "n_points": [t.size],
                "ts_dod": [dod_encode(t)],
                "values_gorilla": [gorilla_encode(v)],
            }
        )

    prepped = points.select(
        *SERIES_KEY,
        F.col(ts_col).alias("__ts"),
        F.col(value_col).cast("double").alias("__val"),
    ).withColumn("__chunk", F.expr(f"(__ts div {chunk_us}) * {chunk_us}"))
    return prepped.groupBy(*SERIES_KEY, "__chunk").applyInPandas(
        encode, schema=CHUNK_SCHEMA
    )


def decompress_chunks(chunks: DataFrame) -> DataFrame:
    """Inverse of compress_chunks: explode blobs back to
    (series key, ts_us, value) point rows."""

    def decode(pdf_iter):
        import numpy as np  # noqa: F401

        from streamevmon_spark.functions.codecs import dod_decode, gorilla_decode

        for pdf in pdf_iter:
            frames = []
            for r in pdf.itertuples(index=False):
                t = dod_decode(bytes(r.ts_dod))
                v = gorilla_decode(bytes(r.values_gorilla))
                frames.append(
                    pd.DataFrame(
                        {
                            "conv_id": r.conv_id,
                            "tool": r.tool,
                            "role": r.role,
                            "ts_us": t,
                            "value": v,
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    schema = (
        "conv_id string, tool string, role string, ts_us long, value double"
    )
    return chunks.mapInPandas(decode, schema=schema)


def chunk_table(
    df: DataFrame,
    grid_tier: str = "1m",
    chunk_tier: str = "1d",
    method: str = "interp",
    purge_gap_s: int = 600,
) -> DataFrame:
    """End-to-end: transcripts → gap-filled grid → compressed chunk table
    with a decoded-points timestamp column for partition pruning."""
    from streamevmon_spark.operators.gapfill import gap_fill

    grid = gap_fill(df, grid_tier, method=method, purge_gap_s=purge_gap_s)
    points = grid.select(
        *SERIES_KEY,
        F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, grid_ts)").alias("ts_us"),
        F.col("value_filled").alias("value"),
    )
    out = compress_chunks(points, chunk_tier)
    return out.withColumn(
        "chunk_start",
        F.expr(f"timestampadd(MICROSECOND, chunk_us, {EPOCH_NTZ})"),
    )
