"""Per-series exponential smoothing (EWMA) as a first-class transform.

The reference uses exponential smoothing only INSIDE detectors (the
SmoothedZScore influence fold, detectors/spike/SmoothedZScore.scala —
already replicated bit-exactly in functions/detectors.py); dashboards
and downstream features want the smoothed series itself. This exposes
it: sm_1 = x_1, sm_t = alpha * x_t + (1 - alpha) * sm_{t-1} over each
(conv_id, tool, role) series in (ts, turn_idx) order, one output row
per non-lossy point.

Execution: the fold is inherently sequential per series, so it runs in
the partition-wise kernel harness (operators/_partitionwise.py — one
exchange on the series key, whole-series groups per Arrow batch); the
per-point Python loop replays the float ops in a fixed order
(alpha * x + omalpha * sm, two mults then one add), which is exactly
what the DuckDB recursive-CTE oracle replays row-by-row, so the
doubles agree bit-for-bit (same discipline as the spike/changepoint
walks). Cost is O(points) scalar ops per task — bounded by one
series' length, the same bound every detector kernel already carries.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamevmon_spark.operators._partitionwise import (
    group_starts,
    partitionwise_apply,
)
from streamevmon_spark.operators.rollup import SERIES_KEY

_OUT_SCHEMA = (
    "conv_id string, tool string, role string, ts timestamp_ntz, "
    "value double, ewma double"
)


def ewma_fold(x: np.ndarray, alpha: float) -> np.ndarray:
    """Bit-exact sequential EWMA of one series (float64). Plain Python
    floats in the loop: alpha * x + omalpha * sm with fixed operand
    order — the contract the oracle replays."""
    omalpha = 1.0 - alpha
    out = np.empty(x.size, dtype=np.float64)
    sm = 0.0
    for i, xi in enumerate(x.tolist()):
        sm = xi if i == 0 else alpha * xi + omalpha * sm
        out[i] = sm
    return out


def smooth_ewma(transcripts: DataFrame, alpha: float = 0.3) -> DataFrame:
    """EWMA-smoothed value per non-lossy point of each series."""
    pts = transcripts.where(F.col("value").isNotNull()).select(
        *SERIES_KEY, "ts", "turn_idx", "value"
    )

    def batch_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        starts = group_starts(pdf, SERIES_KEY)
        bounds = np.append(starts, len(pdf))
        vals = pdf["value"].to_numpy(dtype=np.float64)
        ew = np.empty(len(pdf), dtype=np.float64)
        for s, e in zip(bounds[:-1], bounds[1:]):
            ew[s:e] = ewma_fold(vals[s:e], alpha)
        out = pdf[["conv_id", "tool", "role", "ts", "value"]].copy()
        out["ewma"] = ew
        return out

    return partitionwise_apply(
        pts,
        group_keys=SERIES_KEY,
        sort_cols=["ts", "turn_idx"],
        batch_fn=batch_fn,
        schema=_OUT_SCHEMA,
    )
