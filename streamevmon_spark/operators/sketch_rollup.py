"""t-digest sketch columns for rollup tiers + incremental sketch cascade.

The scale path for percentiles: exact sorted-array percentiles
(operators/rollup.py) are correct but holistic — they need every value of
a window in one place. At 10^12 turns the 1h/1d tiers instead MERGE the
1m tier's t-digest sketches (mergeable, bounded size ~ compression), so
coarser tiers never rescan raw data and hot-key salting stays possible
(sketches merge associatively across salt partitions).

Execution shape: partition-wise (operators/_partitionwise.py) — one
Python crossing per Arrow batch, groups segmented with NumPy; a naive
per-group applyInPandas here measured ~1.3 ms/group x 98k (series,
window) groups at sf0.1. Sort within partitions is (keys, window) only;
each digest build sorts its own values (canonical order).

Accuracy is tolerance-tested against the exact percentiles in tests
(FIXTURES.md §2 "latency_tdigest ... quantile-tolerance tested").

Reference analogue: BaselineDetector's windowed percentile over the last
maxHistory values (reference: detectors/baseline/BaselineDetector.scala:135-146)
— unmergeable there; the mergeable sketch is the engine upgrade.
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
from streamevmon_spark.operators.rollup import (
    EPOCH_NTZ,
    SERIES_KEY,
    TIERS,
    add_inter_turn_latency_bucketed,
)

_SKETCH_SCHEMA = (
    "conv_id string, tool string, role string, window_start_us long, "
    "latency_tdigest binary"
)

_GROUP_KEYS = [*SERIES_KEY, "__w_us"]


def _head_frame(pdf: pd.DataFrame, starts: np.ndarray, blobs: list) -> pd.DataFrame:
    heads = pdf.iloc[starts]
    return pd.DataFrame(
        {
            "conv_id": heads["conv_id"].to_numpy(),
            "tool": heads["tool"].to_numpy(),
            "role": heads["role"].to_numpy(),
            "window_start_us": heads["__w_us"].to_numpy(np.int64),
            "latency_tdigest": blobs,
        }
    )


def sketch_tier(df: DataFrame, tier: str = "1m") -> DataFrame:
    """Per (series, tier window): t-digest sketch of inter-turn latency
    seconds → BinaryType column ``latency_tdigest``."""
    win_us = TIERS[tier] * 1_000_000

    def build_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        from streamevmon_spark.functions.tdigest import TDigest

        starts = group_starts(pdf, _GROUP_KEYS)
        ends = np.concatenate([starts[1:], [len(pdf)]])
        lat = pdf["lat_us"].to_numpy(np.float64) / 1e6  # NaN for nulls
        blobs = [
            TDigest.build(lat[s:e]).to_bytes()
            for s, e in zip(starts, ends)
        ]
        return _head_frame(pdf, starts, blobs)

    prepped = (
        # bucketed lag — identical lat_us, hot series shard across days
        add_inter_turn_latency_bucketed(df)
        .withColumn(
            "__w_us",
            F.expr(
                f"(datediff(MICROSECOND, {EPOCH_NTZ}, ts) div {win_us})"
                f" * {win_us}"
            ),
        )
        .select(*SERIES_KEY, "__w_us", "lat_us")
    )
    return partitionwise_apply(
        prepped, _GROUP_KEYS, [], build_batch, _SKETCH_SCHEMA
    )


def cascade_sketches(finer: DataFrame, to_tier: str) -> DataFrame:
    """Merge finer-tier sketches into a coarser tier — the incremental
    continuous-aggregate maintenance path (no raw rescan)."""
    win_us = TIERS[to_tier] * 1_000_000

    def merge_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        from streamevmon_spark.functions.tdigest import TDigest

        starts = group_starts(pdf, _GROUP_KEYS)
        ends = np.concatenate([starts[1:], [len(pdf)]])
        col = pdf["latency_tdigest"]
        out = []
        for s, e in zip(starts, ends):
            # canonical merge order: sorted blobs -> partition-order free
            blobs = sorted(bytes(b) for b in col.iloc[s:e])
            acc = TDigest.from_bytes(blobs[0])
            for b in blobs[1:]:
                acc = acc.merge(TDigest.from_bytes(b))
            out.append(acc.to_bytes())
        return _head_frame(pdf, starts, out)

    coarser = finer.select(
        *SERIES_KEY,
        F.expr(f"(window_start_us div {win_us}) * {win_us}").alias("__w_us"),
        "latency_tdigest",
    )
    return partitionwise_apply(
        coarser, _GROUP_KEYS, [], merge_batch, _SKETCH_SCHEMA
    )


def sketch_exact_stats(sketches: DataFrame) -> DataFrame:
    """Exactly-checkable projection of sketch blobs.

    A t-digest is approximate in its centroids but EXACT in its total
    weight and min/max, so (lat_count, lat_min_us, lat_max_us) decoded
    from the blob must hash-equal the raw-side SQL aggregate — the
    driver-verifiable face of the sketch path (quantile accuracy is
    tolerance-tested in pytest). min/max round-trip exactly: lat_us is
    an integer < 2^52, so ``round(vmin * 1e6)`` inverts the ``/ 1e6``
    build-time scaling bit-exactly. min/max are emitted as doubles
    (exact for these magnitudes) so the NULL-when-empty case has one
    cross-engine dtype."""
    schema = (
        "conv_id string, tool string, role string, window_start_us long, "
        "lat_count long, lat_min_us double, lat_max_us double"
    )

    def decode(pdf_iter):
        from streamevmon_spark.functions.tdigest import TDigest

        for pdf in pdf_iter:
            out = pdf[["conv_id", "tool", "role", "window_start_us"]].copy()
            counts: list[int] = []
            mins: list[float] = []
            maxs: list[float] = []
            for b in pdf["latency_tdigest"]:
                td = TDigest.from_bytes(bytes(b))
                counts.append(int(td.count))
                if td.count == 0:
                    mins.append(np.nan)
                    maxs.append(np.nan)
                else:
                    mins.append(float(round(td.vmin * 1e6)))
                    maxs.append(float(round(td.vmax * 1e6)))
            out["lat_count"] = np.asarray(counts, dtype=np.int64)
            out["lat_min_us"] = np.asarray(mins, dtype=np.float64)
            out["lat_max_us"] = np.asarray(maxs, dtype=np.float64)
            yield out

    return sketches.mapInPandas(decode, schema=schema)


def sketch_quantiles(
    sketches: DataFrame, quantiles: tuple[float, ...] = (0.5, 0.95, 0.99)
) -> DataFrame:
    """Evaluate quantiles out of sketch blobs (read path)."""
    cols = [f"q{int(q * 100)}" for q in quantiles]
    schema = (
        "conv_id string, tool string, role string, window_start_us long, "
        + ", ".join(f"{c} double" for c in cols)
    )

    def evaluate(pdf_iter):
        from streamevmon_spark.functions.tdigest import TDigest

        for pdf in pdf_iter:
            out = pdf[["conv_id", "tool", "role", "window_start_us"]].copy()
            tds = [TDigest.from_bytes(bytes(b)) for b in pdf["latency_tdigest"]]
            for q, c in zip(quantiles, cols):
                out[c] = [td.quantile(q) for td in tds]
            yield out

    return sketches.mapInPandas(evaluate, schema=schema)
