"""Streaming Gorilla/DoD chunk writer: the compressed-store ingest path
as a stateful streaming operator — continuous ingestion closes chunk
buckets as event time passes them and emits each closed bucket as one
encoded blob row, byte-identical to the batch ``compress_chunks`` build
of the same points.

Emission contract (what makes this drainable in append mode, same
design as streaming/rollup_stream.stream_gap_fill): a bucket is CLOSED
— encoded and emitted — exactly when a later-bucket point for the same
series has been seen; the per-series final (open) bucket is never
emitted. So a drained stream equals
``compress_chunks(points restricted to bucket < per-series max
bucket)`` blob-for-blob; the open-bucket tail is the write-ahead state
a restart resumes from (carried across micro-batches as a pickled
blob, the Kryo-checkpointed keyed-state analogue — reference:
flink/sinks/influx/InfluxSinkFunction.scala buffered uncommitted tail).

Limitation (documented, inherent to append mode): a point arriving in
a micro-batch AFTER its bucket was closed cannot retract the emitted
blob; within the watermark/ordering discipline of the file-batch
harness (time-ranged batches) this does not occur. The batch
``compact_chunks`` pass (operators/chunks.py) is the repair path for
genuinely late data: decode+merge+re-encode is reader-transparent.

Scale shape: state per series = the open bucket's points (the same
bound as one batch-kernel group); emitted rows are compressed blobs.
"""

from __future__ import annotations

import pickle
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamevmon_spark.operators.chunks import CHUNK_SCHEMA
from streamevmon_spark.operators.rollup import EPOCH_NTZ, SERIES_KEY, TIERS


def stream_compress_chunks(
    stream: DataFrame, chunk_tier: str = "1d"
) -> DataFrame:
    """Transcripts stream → closed-bucket chunk rows
    (series key, chunk_us, n_points, ts_dod, values_gorilla).
    Lossy (NULL-value) turns are dropped, as in every chunk path."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from streamevmon_spark.session import ensure_workers_can_import

    ensure_workers_can_import(stream.sparkSession)
    chunk_us = TIERS[chunk_tier] * 1_000_000
    pts = stream.where(F.col("value").isNotNull()).select(
        *SERIES_KEY,
        F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)").alias("ts_us"),
        F.col("value").cast("double").alias("value"),
    )

    def fn(key, pdf_iter: Iterator[pd.DataFrame], state):
        from streamevmon_spark.functions.codecs import (
            dod_encode_many,
            gorilla_encode_many,
        )

        if state.exists:
            t_open, v_open = pickle.loads(state.get[0])
        else:
            t_open = np.empty(0, dtype=np.int64)
            v_open = np.empty(0, dtype=np.float64)
        conv_id, tool, role = key
        new = [p for p in pdf_iter if len(p)]
        if new:
            allp = pd.concat(new, ignore_index=True)
            t_new = allp["ts_us"].to_numpy(np.int64)
            v_new = allp["value"].to_numpy(np.float64)
            t_all = np.concatenate([t_open, t_new])
            v_all = np.concatenate([v_open, v_new])
            order = np.argsort(t_all, kind="stable")
            t_all, v_all = t_all[order], v_all[order]
        else:
            t_all, v_all = t_open, v_open
        out = None
        if t_all.size:
            buckets = (t_all // chunk_us) * chunk_us
            last = buckets[-1]
            closed = buckets < last
            n_closed = int(np.count_nonzero(closed))
            if n_closed:
                buckets_c = buckets[:n_closed]
                # group starts of consecutive equal buckets
                starts = np.flatnonzero(
                    np.concatenate(
                        [[True], buckets_c[1:] != buckets_c[:-1]]
                    )
                )
                counts = np.diff(np.concatenate([starts, [n_closed]]))
                out = pd.DataFrame(
                    {
                        "conv_id": conv_id,
                        "tool": tool,
                        "role": role,
                        "chunk_us": buckets_c[starts],
                        "n_points": counts.astype(np.int32),
                        "ts_dod": dod_encode_many(
                            t_all[:n_closed], starts
                        ),
                        "values_gorilla": gorilla_encode_many(
                            v_all[:n_closed], starts
                        ),
                    }
                )
            t_all, v_all = t_all[n_closed:], v_all[n_closed:]
        state.update((pickle.dumps((t_all, v_all), protocol=4),))
        if out is not None:
            yield out

    return pts.groupBy(*SERIES_KEY).applyInPandasWithState(
        fn,
        outputStructType=CHUNK_SCHEMA,
        stateStructType="blob binary",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
