"""Gap-fill: regular-grid LOCF and linear interpolation per series.

Semantics (the reference analogue is the detectors' session-gap reset:
state is dropped when a series is silent longer than inactivityPurgeTime,
reference: detectors/baseline/BaselineDetector.scala:114-122 — we mirror
it as "never fill across a gap longer than ``purge_gap_s``"):

For each series (conv_id, tool, role) and each grid instant g (tier
cadence, epoch-aligned buckets spanning the series' observed range):
- t0/v0 = time/value of the last non-lossy observation at or before g
- t1/v1 = time/value of the first non-lossy observation at or after g
- method='locf':   v = v0                if g - t0 <= purge_gap
- method='interp': v = v0+(v1-v0)*(g-t0)/(t1-t0)
                                         if t1 - t0 <= purge_gap
- otherwise NULL (gap too long / outside observed support)
- an observation exactly on g yields itself under both methods

Two implementations, asserted identical in tests:
- ``gap_fill`` — native window functions (last/first ignoreNulls over
  RANGE frames): stays JVM-side in whole-stage codegen, shuffles once on
  the series key, and is expressible as the DuckDB oracle. Default.
- ``gap_fill_pandas`` — the vectorized pandas/Arrow kernel mandated by
  the north star (applyInPandas + np.searchsorted), the shape used when
  the fill feeds codec blobs (operators/chunks.py).

Determinism: all grid/t0/t1 math is integer µs; the interpolation
formula is spelled identically in Spark and DuckDB (bit-exact doubles).
Duplicate timestamps within a series are canonicalized to the value of
the highest turn_idx (max_by) before filling.

Scale: one shuffle on the series key; the grid is generated with
``sequence()`` per series (no cross join); RANGE-frame windows are
linear per partition. Hot series are bounded by their time span, not
row count, after the max_by pre-aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from streamevmon_spark.operators.rollup import EPOCH_NTZ, SERIES_KEY, TIERS

DEFAULT_PURGE_GAP_S = 600  # reference default inactivityPurgeTime


def _grid_plus_obs(df: DataFrame, step_us: int) -> DataFrame:
    """Union of per-series grid instants and canonicalized observations.

    Each observation row also carries its successor's (ts, value) via
    lead() — computed over the (small) observation set BEFORE the union —
    so the fill pass needs only ONE ascending window over the (large)
    grid+obs union: forward-fill of (value, obs ts, next ts, next value)
    with four last(ignoreNulls) aggregates sharing a single window spec.
    The alternative (a second, descending window pass over the union to
    find the next observation) doubles the sort volume and splits the
    plan into 4 Window nodes.
    """
    obs = (
        df.where(F.col("value").isNotNull())
        .withColumn(
            "ts_us", F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)")
        )
        .groupBy(*SERIES_KEY, "ts_us")
        .agg(F.expr("max_by(value, turn_idx)").alias("value"))
    )
    nxt = Window.partitionBy(*SERIES_KEY).orderBy("ts_us")
    obs = obs.withColumn("next_ts", F.lead("ts_us").over(nxt)).withColumn(
        "next_val", F.lead("value").over(nxt)
    )
    bounds = obs.groupBy(*SERIES_KEY).agg(
        F.expr(f"(min(ts_us) div {step_us}) * {step_us}").alias("__lo"),
        F.expr(f"(max(ts_us) div {step_us}) * {step_us}").alias("__hi"),
    )
    grid = bounds.select(
        *SERIES_KEY,
        F.explode(
            F.sequence("__lo", "__hi", F.lit(step_us).cast("long"))
        ).alias("ts_us"),
        F.lit(None).cast("double").alias("value"),
        F.lit(None).cast("long").alias("next_ts"),
        F.lit(None).cast("double").alias("next_val"),
        F.lit(1).alias("is_grid"),
    )
    return grid.unionByName(obs.withColumn("is_grid", F.lit(0)))


def gap_fill(
    df: DataFrame,
    tier: str = "1m",
    method: str = "locf",
    purge_gap_s: int = DEFAULT_PURGE_GAP_S,
) -> DataFrame:
    """Native gap-fill. Returns one row per (series, grid instant):
    (conv_id, tool, role, grid_ts, value_filled, fill_method)."""
    step_us = TIERS[tier] * 1_000_000
    purge_us = purge_gap_s * 1_000_000
    u = _grid_plus_obs(df, step_us)
    # ONE growing frame (unboundedPreceding → currentRow): incremental,
    # O(n) per series. All four forward-fills share the same window spec
    # so Catalyst emits a single Window node over a single sort. t1/v1
    # (the next observation at-or-after a grid instant g) come from the
    # carried next_ts/next_val of the last observation at-or-before g —
    # exactly "first obs >= g" when no obs sits on g, and handled by the
    # t0 == g case when one does.
    back = (
        Window.partitionBy(*SERIES_KEY)
        .orderBy(F.col("ts_us").asc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn(
        "obs_ts", F.when(F.col("value").isNotNull(), F.col("ts_us"))
    )
    w = u.select(
        *SERIES_KEY,
        "ts_us",
        "is_grid",
        F.last("value", ignorenulls=True).over(back).alias("v0"),
        F.last("obs_ts", ignorenulls=True).over(back).alias("t0"),
        F.last("next_val", ignorenulls=True).over(back).alias("v1"),
        F.last("next_ts", ignorenulls=True).over(back).alias("t1"),
    ).where(F.col("is_grid") == 1)
    on_obs = F.col("t0") == F.col("ts_us")
    if method == "locf":
        filled = F.when(
            F.col("t0").isNotNull()
            & ((F.col("ts_us") - F.col("t0")) <= purge_us),
            F.col("v0"),
        )
    elif method == "interp":
        frac = (F.col("ts_us") - F.col("t0")).cast("double") / (
            F.col("t1") - F.col("t0")
        ).cast("double")
        # t1 >= ts_us excludes the stale carried next_ts that appears for
        # grid instants after the LAST observation (no obs >= g exists)
        filled = F.when(on_obs, F.col("v0")).when(
            F.col("t0").isNotNull()
            & F.col("t1").isNotNull()
            & (F.col("t1") >= F.col("ts_us"))
            & ((F.col("t1") - F.col("t0")) <= purge_us),
            F.col("v0") + (F.col("v1") - F.col("v0")) * frac,
        )
    else:
        raise ValueError(f"unknown gap-fill method {method!r}")
    fill_method = (
        F.when(F.col("t0") == F.col("ts_us"), F.lit("obs"))
        .when(filled.isNotNull(), F.lit(method))
        .otherwise(F.lit("none"))
    )
    return w.select(
        *SERIES_KEY,
        F.expr(f"timestampadd(MICROSECOND, ts_us, {EPOCH_NTZ})").alias(
            "grid_ts"
        ),
        filled.alias("value_filled"),
        fill_method.alias("fill_method"),
    )


def gap_fill_pandas(
    df: DataFrame,
    tier: str = "1m",
    method: str = "locf",
    purge_gap_s: int = DEFAULT_PURGE_GAP_S,
) -> DataFrame:
    """Vectorized pandas/Arrow gap-fill kernel (north-star path),
    executed PARTITION-WISE (operators/_partitionwise.py): series are
    hash-repartitioned and sorted once, then every series in an Arrow
    batch is filled with NumPy searchsorted in one Python crossing.
    The previous per-group applyInPandas paid ~1.3 ms of Arrow exchange
    per (series) group — 4x wall-time vs the native window path at
    sf0.1; this is the same kernel without the per-group tax, and its
    output stays bit-identical (same NumPy ops per series)."""
    import pandas as pd  # local import: executors re-import cheaply

    from streamevmon_spark.operators._partitionwise import (
        group_starts,
        partitionwise_apply,
    )

    step_us = TIERS[tier] * 1_000_000
    purge_us = purge_gap_s * 1_000_000

    def fill_batch(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        starts = group_starts(pdf, SERIES_KEY)
        ends = np.concatenate([starts[1:], [len(pdf)]])
        ts_all = pdf["ts_us"].to_numpy(np.int64)
        val_all = pdf["value"].to_numpy(np.float64)
        keys = pdf[SERIES_KEY].to_numpy()
        out_key_idx: list[int] = []
        out_g: list = []
        out_val: list = []
        out_meth: list = []
        for s, e in zip(starts, ends):
            # rows arrive sorted by (ts_us, turn_idx): keep the last of
            # each duplicate timestamp (highest turn_idx wins), drop NaN
            t_grp = ts_all[s:e]
            v_grp = val_all[s:e]
            keep = ~np.isnan(v_grp)
            t_obs, v_obs = t_grp[keep], v_grp[keep]
            if t_obs.size == 0:
                continue
            last_of_ts = np.r_[t_obs[1:] != t_obs[:-1], True]
            t = t_obs[last_of_ts]
            v = v_obs[last_of_ts]
            lo = (t[0] // step_us) * step_us
            hi = (t[-1] // step_us) * step_us
            g = np.arange(lo, hi + step_us, step_us, dtype=np.int64)
            i0 = np.searchsorted(t, g, side="right") - 1  # last obs <= g
            i1 = np.searchsorted(t, g, side="left")  # first obs >= g
            has0, has1 = i0 >= 0, i1 < t.size
            t0 = np.where(has0, t[np.clip(i0, 0, None)], 0)
            v0 = np.where(has0, v[np.clip(i0, 0, None)], np.nan)
            t1 = np.where(has1, t[np.clip(i1, None, t.size - 1)], 0)
            v1 = np.where(has1, v[np.clip(i1, None, t.size - 1)], np.nan)
            if method == "locf":
                ok = has0 & ((g - t0) <= purge_us)
                out = np.where(ok, v0, np.nan)
            else:
                ok = has0 & has1 & ((t1 - t0) <= purge_us)
                with np.errstate(invalid="ignore", divide="ignore"):
                    frac = (g - t0).astype(np.float64) / (
                        t1 - t0
                    ).astype(np.float64)
                    interp = np.where(t1 == t0, v0, v0 + (v1 - v0) * frac)
                out = np.where(ok, interp, np.nan)
            meth = np.where(
                has0 & (t0 == g), "obs", np.where(ok, method, "none")
            )
            out_key_idx.append(np.full(g.size, s))
            out_g.append(g)
            out_val.append(out)
            out_meth.append(meth)
        if not out_g:
            return pd.DataFrame(
                {
                    "conv_id": pd.Series([], dtype="object"),
                    "tool": pd.Series([], dtype="object"),
                    "role": pd.Series([], dtype="object"),
                    "ts_us": pd.Series([], dtype="int64"),
                    "value_filled": pd.Series([], dtype="float64"),
                    "fill_method": pd.Series([], dtype="object"),
                }
            )
        ki = np.concatenate(out_key_idx)
        return pd.DataFrame(
            {
                "conv_id": keys[ki, 0],
                "tool": keys[ki, 1],
                "role": keys[ki, 2],
                "ts_us": np.concatenate(out_g),
                "value_filled": np.concatenate(out_val),
                "fill_method": np.concatenate(out_meth),
            }
        )

    prepped = df.withColumn(
        "ts_us", F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)")
    ).select(*SERIES_KEY, "ts_us", "turn_idx", "value")
    schema = (
        "conv_id string, tool string, role string, ts_us long, "
        "value_filled double, fill_method string"
    )
    out = partitionwise_apply(
        prepped, SERIES_KEY, ["ts_us", "turn_idx"], fill_batch, schema
    )
    return out.select(
        *SERIES_KEY,
        F.expr(f"timestampadd(MICROSECOND, ts_us, {EPOCH_NTZ})").alias(
            "grid_ts"
        ),
        "value_filled",
        "fill_method",
    )
