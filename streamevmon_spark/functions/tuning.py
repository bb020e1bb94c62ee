"""Deterministic detector parameter sweep — the engine's analogue of the
reference's parameter tuner lifecycle (reference:
parameterTuner/src/main/scala/nz/net/wand/streamevmon/tuner/
ParameterTuner.scala:42-140 — SMAC Bayesian optimisation over the
ParameterSpec search space, scored against NAB labels via
NabAllDetectors + NabScoringFormatSink).

Spark-first shape: the *search driver* is plain Python (tiny — tens of
configs), but every candidate evaluation is a fully distributed
``detect()`` run over the measurement table; the labels join in the
scorer is a DataFrame aggregation, never a driver-side loop over rows.
We deliberately swap SMAC for an exhaustive deterministic grid: the
reference needed a surrogate model because each evaluation replayed NAB
from disk single-threaded; here one evaluation is a short distributed
job and reproducibility of the chosen config matters more than search
efficiency.

Config validation reuses functions/params.validated — the identical
range/constraint specs the reference validates before each SMAC trial
(reference: parameters/HasParameterSpecs.scala).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamevmon_spark.functions.params import validated


def expand_grid(param_grid: dict[str, list]) -> list[dict]:
    """All combinations of the grid, in deterministic (key-sorted,
    value-order-preserving) order."""
    keys = sorted(param_grid)
    return [
        dict(zip(keys, combo))
        for combo in itertools.product(*(param_grid[k] for k in keys))
    ]


def nab_window_score(
    events: DataFrame,
    label_windows: list[tuple[str, str]],
    tp_weight: float = 1.0,
    fp_weight: float = -0.5,
) -> float:
    """NAB-flavoured score: +tp_weight per labelled anomaly window that
    received at least one event, fp_weight per event outside every
    window (the reference scores via the NAB scorer's window TP/FP
    profile, tuner/nab/NabTests.scala). Distributed: one aggregation."""
    if not label_windows:
        raise ValueError("need at least one label window")
    in_any = None
    for start, end in label_windows:
        cond = (F.col("ts") >= F.lit(start).cast("timestamp_ntz")) & (
            F.col("ts") <= F.lit(end).cast("timestamp_ntz")
        )
        in_any = cond if in_any is None else (in_any | cond)
    marked = events.select(in_any.alias("__in"))
    row = marked.agg(
        F.sum(F.when(F.col("__in"), 1).otherwise(0)).alias("tp_events"),
        F.sum(F.when(~F.col("__in"), 1).otherwise(0)).alias("fp_events"),
    ).collect()[0]
    fp = int(row.fp_events or 0)
    # windows detected (any event inside) — driver-side over the tiny
    # window list, each a filtered count pushed to the same cached events
    detected = 0
    for start, end in label_windows:
        n = events.where(
            (F.col("ts") >= F.lit(start).cast("timestamp_ntz"))
            & (F.col("ts") <= F.lit(end).cast("timestamp_ntz"))
        ).limit(1).count()
        detected += 1 if n else 0
    return tp_weight * detected + fp_weight * fp


def grid_search(
    df: DataFrame,
    detector: str,
    param_grid: dict[str, list],
    score_fn,
    **fixed,
) -> list[dict]:
    """Evaluate every validated grid combination of ``detector`` params
    over ``df`` (a transcripts-shaped table) and return
    [{"params": ..., "score": ..., "n_events": ...}, ...] sorted best
    score first (ties broken by grid order — deterministic).

    Invalid combinations (range/constraint violations) are skipped, the
    same behaviour as the reference rejecting configs outside the
    ParameterSpec space before a trial runs.
    """
    from streamevmon_spark.operators.detect import detect

    results: list[dict] = []
    for order, combo in enumerate(expand_grid(param_grid)):
        params = {**fixed, **combo}
        try:
            validated(detector, **params)
        except ValueError:
            continue
        events = detect(df, detector, **params).persist()
        try:
            n_events = events.count()
            score = score_fn(events)
        finally:
            events.unpersist()
        results.append(
            {
                "params": params,
                "score": score,
                "n_events": n_events,
                "__order": order,
            }
        )
    results.sort(key=lambda r: (-r["score"], r["__order"]))
    for r in results:
        del r["__order"]
    return results
