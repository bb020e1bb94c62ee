"""Spark operators running the reference-semantics detectors per series.

``detect(df, detector, **params)`` applies one of the six kernels
(functions/detectors.py) to every (conv_id, tool, role) series and
returns an Event DataFrame mirroring the reference's Event row
(reference: events/Event.scala:63-71): event_type, stream key columns,
severity (0-100), event time, detection latency, description.

Execution: partition-wise (operators/_partitionwise.py) — series are
hash-repartitioned, sorted by the stable (ts, turn_idx) order inside
partitions (the reference replays window elements sorted by time,
WindowedFunctionWrapper.scala:72), and each Arrow batch of complete
series runs the kernels with NumPy inner math. A detector kernel sees
its whole series in one call — the batch analogue of Flink keyed state.

``union_events`` merges detector outputs (the reference unions all
detector streams per sink, runners/unified/YamlDagRunner.scala:259-263).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamevmon_spark.functions.detectors import DETECTORS
from streamevmon_spark.operators._partitionwise import (
    group_starts,
    partitionwise_apply,
)
from streamevmon_spark.operators.rollup import EPOCH_NTZ, SERIES_KEY

EVENT_SCHEMA = (
    "event_type string, conv_id string, tool string, role string, "
    "severity int, ts timestamp_ntz, detection_latency_us long, "
    "description string"
)


def detect(df: DataFrame, detector: str, **params) -> DataFrame:
    """Run one detector over every (conv_id, tool, role) series."""
    if detector not in DETECTORS:
        raise ValueError(
            f"unknown detector {detector!r}; have {sorted(DETECTORS)}"
        )
    # build-time parameter validation (range + cross-parameter
    # constraints) — the reference validates specs before wiring the DAG
    # (reference: runners/unified/YamlDagRunner.scala:160,
    # parameters/HasParameterSpecs.scala); failing here beats failing
    # inside an executor task hours into a 100 TB run
    from streamevmon_spark.functions.params import validated

    params = validated(detector, **params)
    kernel = DETECTORS[detector]

    def run_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        starts = group_starts(pdf, SERIES_KEY)
        ends = np.concatenate([starts[1:], [len(pdf)]])
        ts = pdf["__ts_us"].to_numpy(np.int64)
        vals = pdf["value"].to_numpy(np.float64)
        rows: list[dict] = []
        for s, e in zip(starts, ends):
            head = pdf.iloc[s]
            if detector == "loss":
                evs = kernel(np.isnan(vals[s:e]), ts[s:e], **params)
            else:
                evs = kernel(vals[s:e], ts[s:e], **params)
            for ev in evs:
                rows.append(
                    {
                        "event_type": ev["event_type"],
                        "conv_id": head["conv_id"],
                        "tool": head["tool"],
                        "role": head["role"],
                        "severity": ev["severity"],
                        "ts_us": ev["ts_us"],
                        "detection_latency_us": ev["detection_latency_us"],
                        "description": ev["description"],
                    }
                )
        out = pd.DataFrame(
            rows,
            columns=[
                "event_type", "conv_id", "tool", "role", "severity",
                "ts_us", "detection_latency_us", "description",
            ],
        )
        out["ts"] = pd.to_datetime(out["ts_us"].astype("int64"), unit="us")
        out["severity"] = out["severity"].astype("int32")
        return out[
            ["event_type", "conv_id", "tool", "role", "severity", "ts",
             "detection_latency_us", "description"]
        ]

    prepped = df.select(
        *SERIES_KEY,
        F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)").alias("__ts_us"),
        F.col("turn_idx"),
        F.col("value").cast("double").alias("value"),
    )
    return partitionwise_apply(
        prepped, SERIES_KEY, ["__ts_us", "turn_idx"], run_batch, EVENT_SCHEMA
    )


def detect_from_store(chunks: DataFrame, detector: str, **params) -> DataFrame:
    """Replay COMPRESSED stored history into a detector — the
    reference's InfluxHistoryConnection pattern
    (connectors/influx/InfluxHistoryConnection.scala: stored
    measurements re-enter the detection DAG), here from the Gorilla/DoD
    chunk store (operators/chunks.py) instead of raw when raw is cold
    or expired under retention.

    Exactness vs the raw path: the codec round-trip is bit-exact and
    the store keys one point per (series, instant) — NaN instants are
    the store's lossy encoding and enter the kernels exactly as the
    raw path's NULL-value turns do (both become float64 NaN in the
    Arrow batch), and with unique instants the synthetic turn_idx=0
    never decides an ordering — so the emitted events are
    bit-identical and the raw-path oracles apply verbatim."""
    from streamevmon_spark.operators.chunks import decompress_chunks

    pts = decompress_chunks(chunks).select(
        *SERIES_KEY,
        F.expr(f"timestampadd(MICROSECOND, ts_us, {EPOCH_NTZ})").alias(
            "ts"
        ),
        F.lit(0).alias("turn_idx"),
        "value",
    )
    return detect(pts, detector, **params)


def detect_windowed_distdiff(
    df: DataFrame, window_s: int = 3600, **params
) -> DataFrame:
    """WindowedDistDiffDetector: one distribution-difference test per
    (series, tumbling window) — the window bucket simply joins the group
    key, so the same partition-wise execution applies
    (reference: detectors/distdiff/WindowedDistDiffDetector.scala:54-149;
    window wiring runners/unified/schema/TypedStreams.scala:70-72)."""
    from streamevmon_spark.functions.detectors import (
        windowed_distdiff_events,
    )

    win_us = window_s * 1_000_000

    def run_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = [*SERIES_KEY, "__w_us"]
        starts = group_starts(pdf, keys)
        ends = np.concatenate([starts[1:], [len(pdf)]])
        ts = pdf["__ts_us"].to_numpy(np.int64)
        vals = pdf["value"].to_numpy(np.float64)
        rows: list[dict] = []
        for s, e in zip(starts, ends):
            head = pdf.iloc[s]
            for ev in windowed_distdiff_events(vals[s:e], ts[s:e], **params):
                rows.append(
                    {
                        "event_type": ev["event_type"],
                        "conv_id": head["conv_id"],
                        "tool": head["tool"],
                        "role": head["role"],
                        "severity": ev["severity"],
                        "ts_us": ev["ts_us"],
                        "detection_latency_us": ev["detection_latency_us"],
                        "description": ev["description"],
                    }
                )
        out = pd.DataFrame(
            rows,
            columns=["event_type", "conv_id", "tool", "role", "severity",
                     "ts_us", "detection_latency_us", "description"],
        )
        out["ts"] = pd.to_datetime(out["ts_us"].astype("int64"), unit="us")
        out["severity"] = out["severity"].astype("int32")
        return out[
            ["event_type", "conv_id", "tool", "role", "severity", "ts",
             "detection_latency_us", "description"]
        ]

    prepped = df.select(
        *SERIES_KEY,
        F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)").alias("__ts_us"),
        F.expr(
            f"(datediff(MICROSECOND, {EPOCH_NTZ}, ts) div {win_us})"
            f" * {win_us}"
        ).alias("__w_us"),
        F.col("turn_idx"),
        F.col("value").cast("double").alias("value"),
    )
    return partitionwise_apply(
        prepped, [*SERIES_KEY, "__w_us"], ["__ts_us", "turn_idx"],
        run_batch, EVENT_SCHEMA,
    )


SPIKE_DETAIL_SCHEMA = (
    "conv_id string, tool string, role string, ts timestamp_ntz, "
    "value double, signal int, mean double, std double"
)


def spike_detail_stream(df: DataFrame, **params) -> DataFrame:
    """SpikeDetector's side 'detail' output as a second DataFrame
    (reference: detectors/spike/SpikeDetector.scala:159-169 ctx.output):
    per processed row, the signal decision and the smoothing state it was
    taken against."""
    from streamevmon_spark.functions.detectors import spike_details

    def run_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        starts = group_starts(pdf, SERIES_KEY)
        ends = np.concatenate([starts[1:], [len(pdf)]])
        ts = pdf["__ts_us"].to_numpy(np.int64)
        vals = pdf["value"].to_numpy(np.float64)
        # columnar assembly: one kernel dict-of-arrays per group,
        # key columns repeated per group — no per-row Python objects
        parts: list[dict] = []
        group_rows: list[int] = []
        group_idx: list[int] = []
        for s, e in zip(starts, ends):
            d = spike_details(vals[s:e], ts[s:e], **params)
            parts.append(d)
            group_rows.append(len(d["ts_us"]))
            group_idx.append(s)
        reps = np.asarray(group_rows, dtype=np.int64)
        heads = pdf.iloc[group_idx]

        def col(name: str) -> np.ndarray:
            return np.concatenate(
                [p[name] for p in parts]
            ) if parts else np.empty(0)

        out = pd.DataFrame(
            {
                "conv_id": np.repeat(
                    heads["conv_id"].to_numpy(object), reps
                ),
                "tool": np.repeat(heads["tool"].to_numpy(object), reps),
                "role": np.repeat(heads["role"].to_numpy(object), reps),
                "ts": pd.to_datetime(
                    col("ts_us").astype("int64"), unit="us"
                ),
                "value": col("value"),
                "signal": col("signal").astype("int32"),
                "mean": col("mean"),
                "std": col("std"),
            }
        )
        return out

    prepped = df.select(
        *SERIES_KEY,
        F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)").alias("__ts_us"),
        F.col("turn_idx"),
        F.col("value").cast("double").alias("value"),
    )
    return partitionwise_apply(
        prepped, SERIES_KEY, ["__ts_us", "turn_idx"], run_batch,
        SPIKE_DETAIL_SCHEMA,
    )


def detect_all(df: DataFrame, detectors: list[str] | None = None) -> DataFrame:
    """Run several detectors (default config) and union their events —
    the LatencyTSAllDetectors lifecycle (reference:
    runners/examples/LatencyTSAllDetectors.scala:59-138)."""
    names = detectors or sorted(DETECTORS)
    out = None
    for name in names:
        ev = detect(df, name)
        out = ev if out is None else out.unionByName(ev)
    return out


def union_events(*event_dfs: DataFrame) -> DataFrame:
    out = event_dfs[0]
    for df in event_dfs[1:]:
        out = out.unionByName(df)
    return out


def event_line_protocol(events: DataFrame) -> DataFrame:
    """Event -> InfluxDB line-protocol string (reference:
    events/Event.scala:80-107 toLineProtocol): lexically sorted tag set
    (event_type, stream — our stream key is the amp2-style composite
    conv_id--tool--role), lexically sorted fields (description,
    detection_latency in NANOseconds, severity, the i integer suffix),
    and the epoch-millis-to-nanos timestamp. Pure concat — whole-stage
    codegen, and byte-identical in any engine evaluating the same
    template."""
    lat = (
        F.col("detection_latency_us")
        if "detection_latency_us" in events.columns
        else F.lit(0)
    )
    desc = (
        F.col("description")
        if "description" in events.columns
        else F.lit("")
    )
    ms = F.expr(f"datediff(MILLISECOND, {EPOCH_NTZ}, ts)")
    line = F.concat(
        F.lit("event_type="), F.col("event_type"),
        F.lit(",stream="), F.col("conv_id"), F.lit("--"), F.col("tool"),
        F.lit("--"), F.col("role"),
        F.lit(' description="'), desc,
        F.lit('",detection_latency='), (lat * 1000).cast("string"),
        F.lit("i,severity="), F.col("severity").cast("string"),
        F.lit("i "), (ms * 1_000_000).cast("string"),
    )
    return events.select(
        "event_type", *SERIES_KEY, line.alias("line_protocol")
    )
