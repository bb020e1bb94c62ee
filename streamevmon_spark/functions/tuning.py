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


def _space_sampler(param_space: dict, rng):
    """Draw one config from the space. Spec per param:
    ("int", lo, hi) | ("float", lo, hi) | ("choice", [values])."""
    p = {}
    for k in sorted(param_space):
        spec = param_space[k]
        if spec[0] == "choice":
            p[k] = spec[1][rng.randrange(len(spec[1]))]
        elif spec[0] == "int":
            p[k] = rng.randint(spec[1], spec[2])
        elif spec[0] == "float":
            p[k] = rng.uniform(spec[1], spec[2])
        else:
            raise ValueError(f"unknown param spec {spec!r} for {k!r}")
    return p


def _normalize(param_space: dict, p: dict) -> tuple:
    """Map a config onto the unit cube for surrogate distances."""
    v = []
    for k in sorted(param_space):
        spec = param_space[k]
        if spec[0] == "choice":
            idx = spec[1].index(p[k])
            v.append(idx / max(1, len(spec[1]) - 1))
        else:
            lo, hi = spec[1], spec[2]
            v.append((p[k] - lo) / (hi - lo) if hi > lo else 0.0)
    return tuple(v)


def smbo_search(
    df: DataFrame,
    detector: str,
    param_space: dict,
    score_fn,
    n_iter: int = 12,
    n_init: int = 4,
    n_candidates: int = 64,
    explore: float = 0.3,
    seed: int = 7,
    **fixed,
) -> list[dict]:
    """Sequential model-based optimisation — the analogue of the
    reference's SMAC loop (reference: parameterTuner/.../
    ParameterTuner.scala:42-140 drives SMACExecutor with run-obj
    QUALITY over the ParameterSpec space, each trial a NAB replay).

    The structure is identical — initial design, surrogate fit on
    evaluated (config, score) pairs, acquisition-maximising next
    config, repeat under a trial budget — but the surrogate is an
    inverse-distance-weighted regressor over the unit-cube-normalized
    space with a nearest-evaluated-distance exploration bonus (a UCB
    acquisition), instead of SMAC's random forest: every piece is
    deterministic under ``seed``, which matters more here than model
    sophistication because each trial is a short fully-distributed
    ``detect()`` job rather than a single-threaded NAB replay. Invalid
    configs (params.validated) are rejected before running, like SMAC
    trials outside the ParameterSpec space.

    Returns the evaluation history sorted best score first (ties by
    evaluation order — deterministic), same contract as grid_search.
    """
    import random

    from streamevmon_spark.operators.detect import detect

    rng = random.Random(seed)
    history: list[dict] = []
    xs: list[tuple] = []
    tried: set = set()

    def try_eval(p: dict) -> bool:
        key = tuple(sorted(p.items()))
        if key in tried:
            return False
        tried.add(key)
        full = {**fixed, **p}
        try:
            validated(detector, **full)
        except ValueError:
            return False
        events = detect(df, detector, **full).persist()
        try:
            n_events = events.count()
            score = score_fn(events)
        finally:
            events.unpersist()
        history.append(
            {"params": full, "score": score, "n_events": n_events,
             "__order": len(history)}
        )
        xs.append(_normalize(param_space, p))
        return True

    attempts = 0
    while len(history) < min(n_init, n_iter) and attempts < n_iter * 50:
        attempts += 1
        try_eval(_space_sampler(param_space, rng))

    while len(history) < n_iter and attempts < n_iter * 50:
        attempts += 1
        cands = [_space_sampler(param_space, rng)
                 for _ in range(n_candidates)]
        scores = [h["score"] for h in history]
        s_range = (max(scores) - min(scores)) or 1.0
        best_c, best_acq = None, None
        for i, c in enumerate(cands):
            x = _normalize(param_space, c)
            dists = [
                sum((a - b) ** 2 for a, b in zip(x, ex)) ** 0.5
                for ex in xs
            ]
            w = [1.0 / (d + 1e-9) for d in dists]
            pred = sum(wi * si for wi, si in zip(w, scores)) / sum(w)
            acq = pred + explore * s_range * min(dists)
            if best_acq is None or acq > best_acq:
                best_c, best_acq = c, acq
        if best_c is None or not try_eval(best_c):
            continue

    results = sorted(history, key=lambda r: (-r["score"], r["__order"]))
    for r in results:
        del r["__order"]
    return results
