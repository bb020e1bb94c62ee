"""Compressed chunk columns: Gorilla value blobs + delta-of-delta ts blobs.

``compress_chunks`` packs each (series, chunk-window)'s points into two
BinaryType blobs (north star: "compressed with Gorilla XOR float encoding
plus delta-of-delta timestamp encoding into chunked byte arrays stored as
blob columns"); ``decompress_chunks`` explodes them back to points —
round-trip asserted exactly in tests.

Execution shape (the scale path): repartition on the full (series,
chunk) key -> sortWithinPartitions -> mapInPandas, with ALL groups of an
Arrow batch encoded in ONE vectorized NumPy pass
(``codecs.gorilla_encode_many`` / ``dod_encode_many``). Python-boundary
crossings are O(partitions); per-group cost is a bytes-slice. Chunk
windows bound group size (a 1d chunk of a 1m grid is <=1440 points), so
executor memory stays flat at any table size.

Input contract: (conv_id, tool, role, ts_us long, value double) — raw
observations or a gap-filled grid (operators/gapfill.py). Points are
sorted by ts_us inside each chunk; NaN encodes lossy/unfilled instants
bit-exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamevmon_spark.operators._partitionwise import (
    group_starts,
    partitionwise_apply,
)
from streamevmon_spark.operators.rollup import EPOCH_NTZ, SERIES_KEY, TIERS

CHUNK_SCHEMA = (
    "conv_id string, tool string, role string, chunk_us long, "
    "n_points int, ts_dod binary, values_gorilla binary"
)

_GROUP_KEYS = [*SERIES_KEY, "__chunk"]


def _encode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    from streamevmon_spark.functions.codecs import (
        dod_encode_many,
        gorilla_encode_many,
    )

    starts = group_starts(pdf, _GROUP_KEYS)
    t = pdf["__ts"].to_numpy(np.int64)
    v = pdf["__val"].to_numpy(np.float64)
    heads = pdf.iloc[starts]
    counts = np.diff(np.concatenate([starts, [len(pdf)]]))
    return pd.DataFrame(
        {
            "conv_id": heads["conv_id"].to_numpy(),
            "tool": heads["tool"].to_numpy(),
            "role": heads["role"].to_numpy(),
            "chunk_us": heads["__chunk"].to_numpy(np.int64),
            "n_points": counts.astype(np.int32),
            "ts_dod": dod_encode_many(t, starts),
            "values_gorilla": gorilla_encode_many(v, starts),
        }
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
    prepped = points.select(
        *SERIES_KEY,
        F.col(ts_col).alias("__ts"),
        F.col(value_col).cast("double").alias("__val"),
    ).withColumn("__chunk", F.expr(f"(__ts div {chunk_us}) * {chunk_us}"))
    return partitionwise_apply(
        prepped, _GROUP_KEYS, ["__ts"], _encode_batch, CHUNK_SCHEMA
    )


def decompress_chunks(chunks: DataFrame) -> DataFrame:
    """Inverse of compress_chunks: explode blobs back to
    (series key, ts_us, value) point rows."""

    def decode(pdf_iter):
        from streamevmon_spark.functions.codecs import (
            dod_decode,
            gorilla_decode,
        )

        for pdf in pdf_iter:
            ts = [dod_decode(bytes(b)) for b in pdf["ts_dod"]]
            vs = [gorilla_decode(bytes(b)) for b in pdf["values_gorilla"]]
            lens = np.array([len(t) for t in ts], dtype=np.int64)
            yield pd.DataFrame(
                {
                    "conv_id": np.repeat(pdf["conv_id"].to_numpy(), lens),
                    "tool": np.repeat(pdf["tool"].to_numpy(), lens),
                    "role": np.repeat(pdf["role"].to_numpy(), lens),
                    "ts_us": np.concatenate(ts) if ts else np.empty(0),
                    "value": np.concatenate(vs) if vs else np.empty(0),
                }
            )

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
