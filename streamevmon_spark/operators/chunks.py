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


def _canonicalize_instants(
    pdf: pd.DataFrame, starts: np.ndarray
) -> tuple[pd.DataFrame, np.ndarray]:
    """Enforce the store's one-point-per-(series, instant) key at
    encode time. Every *_from_store read (LTTB's x-only sort, M4 /
    detect / rollup's synthetic turn_idx=0) relies on this invariant;
    without it a duplicate-instant input would make store-served
    results nondeterministic vs the raw path's (x, turn_idx) order.
    With a ``__turn`` column present (compress_chunks(turn_col=...))
    duplicates resolve to the max-turn row — the same arg_max(value,
    turn_idx) canonicalization the batch obs paths use; without one,
    duplicate instants are a contract violation and raise."""
    counts = np.diff(np.concatenate([starts, [len(pdf)]]))
    gid = np.repeat(np.arange(len(starts)), counts)
    t = pdf["__ts"].to_numpy(np.int64)
    dup_next = np.zeros(len(pdf), dtype=bool)
    if len(pdf) > 1:
        dup_next[:-1] = (gid[1:] == gid[:-1]) & (t[1:] == t[:-1])
    if not dup_next.any():
        return pdf, starts
    if "__turn" not in pdf.columns:
        raise ValueError(
            "compress_chunks: duplicate (series, instant) points — the "
            "chunk store key is one point per instant; canonicalize "
            "(e.g. arg_max(value, turn_idx)) or pass turn_col="
        )
    # rows sorted by (__ts, __turn) asc inside each group: dropping
    # every row whose successor shares its (group, instant) keeps the
    # max-turn row per instant
    pdf = pdf.iloc[np.flatnonzero(~dup_next)].reset_index(drop=True)
    return pdf, group_starts(pdf, _GROUP_KEYS)


def _encode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    from streamevmon_spark.functions.codecs import (
        dod_encode_many,
        gorilla_encode_many,
    )

    starts = group_starts(pdf, _GROUP_KEYS)
    pdf, starts = _canonicalize_instants(pdf, starts)
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
    turn_col: str | None = None,
) -> DataFrame:
    """points(series key, ts_us, value) → one row per (series, chunk):
    (…, chunk_us, n_points, ts_dod, values_gorilla).

    The store key is ONE point per (series, instant) — enforced at
    encode time (see _canonicalize_instants): duplicate instants raise
    unless ``turn_col`` names a tie-break column, in which case the
    max-``turn_col`` row wins (the obs-path arg_max canonicalization).
    """
    chunk_us = TIERS[chunk_tier] * 1_000_000
    cols = [
        *SERIES_KEY,
        F.col(ts_col).alias("__ts"),
        F.col(value_col).cast("double").alias("__val"),
    ]
    sort_keys = ["__ts"]
    if turn_col is not None:
        cols.append(F.col(turn_col).alias("__turn"))
        sort_keys = ["__ts", "__turn"]
    prepped = points.select(*cols).withColumn(
        "__chunk", F.expr(f"(__ts div {chunk_us}) * {chunk_us}")
    )
    return partitionwise_apply(
        prepped, _GROUP_KEYS, sort_keys, _encode_batch, CHUNK_SCHEMA
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


def compact_chunks(
    chunks: DataFrame, chunk_tier: str = "1d"
) -> DataFrame:
    """Compaction (Iceberg rewrite-data-files analogue) for chunk
    tables: merge the many small blobs incremental runs leave inside
    the same (series, target chunk bucket) — fragments of one bucket
    and/or finer-tier chunks — into exactly one blob pair per bucket.

    Scale shape: the shuffle moves COMPRESSED blobs (≪ raw points),
    never decoded rows — repartition on (series, target bucket) →
    sortWithinPartitions → one vectorized decode+concat+re-encode pass
    per Arrow batch, so executor memory is bounded by the target chunk
    size exactly as in compress_chunks. Output blobs are byte-identical
    to a from-scratch ``compress_chunks`` build at the target tier
    (asserted in tests/test_chunks.py), so compaction is idempotent
    and transparent to every chunk reader.
    (reference intent: the buffered rewrite-on-failure sink semantics
    `flink/sinks/influx/InfluxSinkFunction.scala:176-213` extended to
    the north rule's retention/compaction maintenance path)
    """
    chunk_us = TIERS[chunk_tier] * 1_000_000
    prepped = chunks.select(
        *SERIES_KEY,
        F.col("chunk_us").alias("__frag"),
        F.col("ts_dod"),
        F.col("values_gorilla"),
    ).withColumn("__chunk", F.expr(f"(__frag div {chunk_us}) * {chunk_us}"))

    def compact_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        from streamevmon_spark.functions.codecs import (
            dod_decode,
            dod_encode_many,
            gorilla_decode,
            gorilla_encode_many,
        )

        starts = group_starts(pdf, _GROUP_KEYS)
        ts_parts = [dod_decode(bytes(b)) for b in pdf["ts_dod"]]
        vs_parts = [gorilla_decode(bytes(b)) for b in pdf["values_gorilla"]]
        row_lens = np.array([t.size for t in ts_parts], dtype=np.int64)
        pt_offsets = np.concatenate([[0], np.cumsum(row_lens)])
        t_all = (
            np.concatenate(ts_parts) if ts_parts
            else np.empty(0, np.int64)
        )
        v_all = (
            np.concatenate(vs_parts) if vs_parts
            else np.empty(0, np.float64)
        )
        # per-point group id, then a stable in-group ts sort: fragments
        # of one bucket may interleave in time, and the re-encoded blob
        # must be the canonical sorted-points encoding
        row_group = np.zeros(len(pdf), dtype=np.int64)
        row_group[starts] = 1
        row_group = np.cumsum(row_group) - 1
        pt_group = np.repeat(row_group, row_lens)
        order = np.lexsort((t_all, pt_group))
        t_all, v_all = t_all[order], v_all[order]
        pt_starts = pt_offsets[starts]
        heads = pdf.iloc[starts]
        counts = np.diff(np.concatenate([pt_starts, [t_all.size]]))
        return pd.DataFrame(
            {
                "conv_id": heads["conv_id"].to_numpy(),
                "tool": heads["tool"].to_numpy(),
                "role": heads["role"].to_numpy(),
                "chunk_us": heads["__chunk"].to_numpy(np.int64),
                "n_points": counts.astype(np.int32),
                "ts_dod": dod_encode_many(t_all, pt_starts),
                "values_gorilla": gorilla_encode_many(v_all, pt_starts),
            }
        )

    return partitionwise_apply(
        prepped, _GROUP_KEYS, ["__frag"], compact_batch, CHUNK_SCHEMA
    )


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


def chunk_range_read(
    chunks: DataFrame,
    t0_us: int,
    t1_us: int,
    chunk_tier: str = "1d",
) -> DataFrame:
    """Exact per-series aggregate over [t0_us, t1_us) served ENTIRELY
    from the compressed chunk store — the read half of the north rule's
    "Gorilla XOR + delta-of-delta ... stored as blob columns" (the
    write half is compress_chunks/chunk_table). The reference reads its
    stored series back per retention policy for detector replay
    (reference: influx/InfluxHistoryConnection.scala:45-90); here the
    stored form is compressed blobs and the range read must still be
    bit-exact.

    Scale shape: the ONLY rows decoded are chunks whose
    [chunk_us, chunk_us + width) interval overlaps the range — two
    integer range predicates on the chunk_us metadata column, evaluated
    BELOW the decode mapInPandas, so a parquet-backed chunk table
    prunes at row-group/partition level and a year-long store serves a
    one-day range by decoding one chunk per series (plan-shape asserted
    in tests/test_chunks.py). Decode is the existing whole-batch
    vectorized kernel; the point-level [t0, t1) trim after decode only
    pays on the two edge chunks' points.

    Exactness: Gorilla round-trips float64 (incl. the NaN lossy
    sentinel) bit-exactly and delta-of-delta round-trips int64 µs, so
    count/min/max/µs-quantized sums over decoded points equal the same
    aggregates over raw points — the driver oracle recomputes them from
    the raw table in DuckDB and hash-equality is the proof.
    """
    if not t0_us < t1_us:
        raise ValueError("empty range")
    chunk_w = TIERS[chunk_tier] * 1_000_000
    lo_chunk = (t0_us // chunk_w) * chunk_w
    pruned = chunks.where(
        (F.col("chunk_us") >= F.lit(lo_chunk))
        & (F.col("chunk_us") < F.lit(t1_us))
    )
    pts = decompress_chunks(
        pruned.select(
            *SERIES_KEY, "chunk_us", "n_points", "ts_dod", "values_gorilla"
        )
    ).where((F.col("ts_us") >= F.lit(t0_us)) & (F.col("ts_us") < F.lit(t1_us)))
    # NaN is the in-chunk lossy sentinel (raw NULL → NaN at encode).
    # The Arrow boundary in mapInPandas maps float NaN back to NULL,
    # but that is a serializer detail — treat NaN and NULL as the same
    # lossy class so the aggregate is correct either way (Spark orders
    # NaN ABOVE all reals, so a bare max() would otherwise poison any
    # lossy series).
    lossy = F.col("value").isNull() | F.isnan("value")
    val = F.when(~lossy, F.col("value"))
    return pts.groupBy(*SERIES_KEY).agg(
        F.count(F.lit(1)).alias("point_count"),
        F.sum(lossy.cast("long")).alias("lossy_count"),
        (
            F.sum(F.floor(val * 1e6)).cast("double")
            / F.count(val).cast("double")
            / F.lit(1e6)
        ).alias("val_avg"),
        F.min(val).alias("val_min"),
        F.max(val).alias("val_max"),
        F.expr(
            f"timestampadd(MICROSECOND, min(ts_us), {EPOCH_NTZ})"
        ).alias("ts_first"),
        F.expr(
            f"timestampadd(MICROSECOND, max(ts_us), {EPOCH_NTZ})"
        ).alias("ts_last"),
    )
