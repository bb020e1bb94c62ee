"""Reference-semantics anomaly-detector kernels over per-series arrays.

Each kernel is a faithful re-implementation of one streamevmon detector's
per-key ordered fold, operating on a whole series (values sorted by
(ts, turn_idx)) at once. They are the sequential cores the north star
runs inside vectorized pandas/Arrow UDFs (operators/detect.py) — the
per-point loop is inherent to the algorithms (each step depends on
mutated state), with NumPy doing the inner per-run / per-window math.

Semantics sources (reference: wandnz/streamevmon @ /root/reference):
- severity:    events/Event.scala:144-201 (changeMagnitudeSeverity)
- baseline:    detectors/baseline/BaselineDetector.scala:52-162
- spike:       detectors/spike/SmoothedZScore.scala:48-120,
               detectors/spike/SpikeDetector.scala:113-190
- loss:        detectors/loss/LossDetector.scala:50-193
- mode:        detectors/mode/ModeDetector.scala:54-448
- distdiff:    detectors/distdiff/DistDiffLogic.scala:85-240,
               DistDiffDetector.scala:54-247
- changepoint: detectors/changepoint/ChangepointLogic.scala:43-178,
               NormalDistribution.scala:45-95, ChangepointProcessor.scala:56-449

Shared preamble (every detector): reset on first point or when
ts - last_observed > inactivity purge (session-gap reset); points older
than last_observed are processed but do not advance it; lossy points
(NaN value) are skipped per-detector exactly as the reference does.

Known deliberate divergence: ModeDetector's mode tie-break order is
nondeterministic in the reference (Scala HashMap iteration,
ModeDetector.scala:176-190); we pin (count desc, value desc) so results
are reproducible across partitionings.

Defaults mirror src/main/resources/detectorSettings.yaml.

Events are returned as plain dict rows:
  {idx, event_type, severity, ts_us, detection_latency_us, description}
"""

from __future__ import annotations

import math
from bisect import bisect_left, insort
from collections import deque

import numpy as np


class _RollingMeanStd:
    """O(1)-amortized rolling population mean/std over a bounded window.

    Running sum / sum-of-squares, refreshed by an exact left-fold
    recomputation every 128 updates to keep float drift ~1e-13 relative
    (left fold, not fsum, so the DuckDB oracle can replay the identical
    IEEE operation sequence). The reference
    recomputes mean/std from the whole queue per point
    (SmoothedZScore.scala:104-106) — an O(lag) JVM fold whose rounding
    already differed from the previous np.mean implementation here, so
    signal parity is decision-level, not bit-level; pinned vectors and
    the sf0.01 event sets are asserted unchanged in tests.
    """

    __slots__ = ("q", "s1", "s2", "ops")

    def __init__(self) -> None:
        self.q: deque[float] = deque()
        self.s1 = 0.0
        self.s2 = 0.0
        self.ops = 0

    def reset(self) -> None:
        self.q.clear()
        self.s1 = 0.0
        self.s2 = 0.0
        self.ops = 0

    def push(self, x: float, maxlen: int) -> None:
        self.q.append(x)
        self.s1 += x
        self.s2 += x * x
        if len(self.q) > maxlen:
            old = self.q.popleft()
            self.s1 -= old
            self.s2 -= old * old
        self.ops += 1
        if self.ops >= 128:
            self.ops = 0
            # left-fold recomputation (not fsum): the drift bound is the
            # same O(window * eps), and a left fold is the one summation
            # order every engine can reproduce exactly — the DuckDB
            # oracle replays this refresh with list_reduce(+) so the
            # emitted mean/std floats stay bit-identical cross-engine
            s1 = 0.0
            s2 = 0.0
            for v in self.q:
                s1 += v
                s2 += v * v
            self.s1 = s1
            self.s2 = s2

    def mean_std(self) -> tuple[float, float]:
        n = len(self.q)
        mean = self.s1 / n
        var = self.s2 / n - mean * mean
        return mean, math.sqrt(var if var > 0.0 else 0.0)

__all__ = [
    "change_magnitude_severity",
    "smoothed_zscore",
    "baseline_events",
    "baseline_fold",
    "fresh_baseline_state",
    "spike_events",
    "spike_fold",
    "fresh_spike_state",
    "loss_events",
    "loss_fold",
    "fresh_loss_state",
    "mode_events",
    "mode_fold",
    "fresh_mode_state",
    "distdiff_events",
    "distdiff_fold",
    "fresh_distdiff_state",
    "changepoint_events",
    "changepoint_fold",
    "fresh_changepoint_state",
    "windowed_distdiff_events",
    "windowed_distdiff_fold",
    "fresh_windowed_distdiff_state",
    "DETECTORS",
    "DETECTOR_FOLDS",
]


def change_magnitude_severity(old: float, current: float) -> int:
    """events/Event.scala:144-201 — log-curve change magnitude, 1-100."""
    mx = max(old, current)
    mn = min(old, current)
    if mn < 0.1:
        basemag = 4.8
    else:
        basemag = math.exp(-0.17949 * math.log(mn) + 1.13489)
    if basemag < 1.1:
        basemag = 1.1
    denom = (basemag - 1.0) * mn
    maybe = 30.0 * ((mx - mn) / denom) if denom != 0 else math.inf
    if maybe < 1:
        return 1
    if maybe > 100:
        return 100
    return int(maybe)  # toInt truncates toward zero


# ---------------------------------------------------------------- spike

def smoothed_zscore(
    values: np.ndarray,
    lag: int = 30,
    threshold: float = 5.0,
    influence: float = 0.0,
) -> np.ndarray:
    """detectors/spike/SmoothedZScore.scala:48-120 — returns int8 signals
    (0 none, +1 positive, -1 negative). Population variance; signal
    values are written back damped by ``influence``."""
    v = np.asarray(values, dtype=np.float64)
    n = v.size
    out = np.zeros(n, dtype=np.int8)
    hist: list[float] = []
    last_mean = math.nan
    last_std = math.nan
    for i in range(n):
        x = float(v[i])
        if len(hist) >= lag and abs(x - last_mean) > threshold * last_std:
            hist.append(influence * x + (1.0 - influence) * hist[-1])
            out[i] = 1 if x > last_mean else -1
        else:
            hist.append(x)
        if len(hist) > lag:
            hist.pop(0)
        a = np.asarray(hist)
        last_mean = float(a.mean())
        last_std = float(math.sqrt(np.mean((a - last_mean) ** 2)))
    return out


def fresh_spike_state() -> dict:
    """Externalizable spike-detector state (the reference's checkpointed
    operator state, detectors/spike/SpikeDetector.scala:80-111): the
    smoothed history queue WITH its rolling-sum accumulators and refresh
    counter — carrying s1/s2/ops verbatim means a resumed fold performs
    the identical IEEE op sequence as one uninterrupted pass, so
    streaming micro-batches stay bit-equal to the batch kernel."""
    return {
        "q": [],
        "s1": 0.0,
        "s2": 0.0,
        "ops": 0,
        "last_obs": None,
        "last_val": math.nan,
        "last_mean": math.nan,
        "last_std": math.nan,
    }


def spike_fold(
    values: np.ndarray,
    ts_us: np.ndarray,
    state: dict,
    lag: int = 50,
    threshold: float = 50.0,
    influence: float = 0.01,
    purge_s: int = 60,
) -> list[dict]:
    """Resumable core of ``spike_events``: continues from (and mutates)
    ``state`` — see fresh_spike_state()."""
    v = np.asarray(values, dtype=np.float64)
    t = np.asarray(ts_us, dtype=np.int64)
    purge_us = purge_s * 1_000_000
    events: list[dict] = []
    hist = _RollingMeanStd()
    hist.q.extend(state["q"])
    hist.s1 = state["s1"]
    hist.s2 = state["s2"]
    hist.ops = state["ops"]
    last_obs: int | None = state["last_obs"]
    last_val: float = state["last_val"]
    last_mean = state["last_mean"]
    last_std = state["last_std"]
    for i in range(v.size):
        x, ti = float(v[i]), int(t[i])
        if last_obs is None or ti - last_obs > purge_us:
            last_obs = ti
            last_val = x  # may be NaN (lossy reset)
            hist.reset()
            last_mean = math.nan
            last_std = math.nan
            continue
        if ti - last_obs >= 0:
            last_obs = ti
        if math.isnan(x):
            continue
        signal = 0
        if len(hist.q) >= lag and abs(x - last_mean) > threshold * last_std:
            hist.push(influence * x + (1.0 - influence) * hist.q[-1], lag)
            signal = 1 if x > last_mean else -1
        else:
            hist.push(x, lag)
        last_mean, last_std = hist.mean_std()
        if signal != 0:
            events.append(
                {
                    "idx": i,
                    "event_type": "spike_events",
                    "severity": change_magnitude_severity(last_val, x),
                    "ts_us": ti,
                    "detection_latency_us": 0,
                    "description": "Positive" if signal > 0 else "Negative",
                }
            )
        last_val = x
    state.update(
        q=list(hist.q), s1=hist.s1, s2=hist.s2, ops=hist.ops,
        last_obs=last_obs, last_val=last_val,
        last_mean=last_mean, last_std=last_std,
    )
    return events


def spike_events(
    values: np.ndarray,
    ts_us: np.ndarray,
    lag: int = 50,
    threshold: float = 50.0,
    influence: float = 0.01,
    purge_s: int = 60,
) -> list[dict]:
    """detectors/spike/SpikeDetector.scala:113-190 — SmoothedZScore with
    session-gap reset; severity vs the previous non-lossy value."""
    return spike_fold(
        values, ts_us, fresh_spike_state(),
        lag=lag, threshold=threshold, influence=influence, purge_s=purge_s,
    )


# ------------------------------------------------------------- baseline

def _commons_math_percentile(sorted_vals, p: float) -> float:
    """commons-math3 Percentile LEGACY estimation (p in [0, 100]) — the
    evaluator BaselineDetector instantiates (BaselineDetector.scala:97).
    Accepts any pre-sorted indexable sequence."""
    n = len(sorted_vals)
    if n == 0:
        return math.nan
    if n == 1:
        return float(sorted_vals[0])
    pos = p * (n + 1) / 100.0
    if pos < 1.0:
        return float(sorted_vals[0])
    if pos >= n:
        return float(sorted_vals[-1])
    f = math.floor(pos)
    d = pos - f
    lower = float(sorted_vals[int(f) - 1])
    upper = float(sorted_vals[int(f)])
    return lower + d * (upper - lower)


def fresh_baseline_state() -> dict:
    """Externalizable baseline-detector state (the reference's
    checkpointed keyed state, BaselineDetector.scala:52-74): the
    insertion-order window, its sorted mirror, the purge clock and the
    previous percentile result."""
    return {"recents": [], "srt": [], "last_obs": None, "last_result": 0.0}


def baseline_fold(
    values: np.ndarray,
    ts_us: np.ndarray,
    state: dict,
    max_history: int = 50,
    percentile: float = 0.10,
    threshold: float = 25.0,
    purge_s: int = 600,
) -> list[dict]:
    """Resumable core of ``baseline_events``: continues from (and
    mutates) ``state`` — see fresh_baseline_state()."""
    v = np.asarray(values, dtype=np.float64)
    t = np.asarray(ts_us, dtype=np.int64)
    purge_us = purge_s * 1_000_000
    events: list[dict] = []
    last_obs: int | None = state["last_obs"]
    # insertion-order queue + insort-maintained sorted mirror: O(log h)
    # search + memmove per point instead of a full O(h log h) sort — the
    # sorted array is IDENTICAL to np.sort of the window, so the
    # percentile (and every emitted event) is bit-exact unchanged
    recents: deque[float] = deque(state["recents"])
    srt: list[float] = list(state["srt"])
    last_result = state["last_result"]
    for i in range(v.size):
        x, ti = float(v[i]), int(t[i])
        if last_obs is None or ti - last_obs > purge_us:
            if math.isnan(x):
                last_obs = None
            else:
                last_obs = ti
                recents = deque([x])
                srt = [x]
            continue
        if ti - last_obs >= 0:
            last_obs = ti
        if math.isnan(x):
            continue
        recents.append(x)
        insort(srt, x)
        if len(recents) > max_history:
            old = recents.popleft()
            del srt[bisect_left(srt, old)]
        result = _commons_math_percentile(srt, percentile)
        if len(recents) >= max_history:
            severity = change_magnitude_severity(last_result, result)
            if severity > threshold:
                events.append(
                    {
                        "idx": i,
                        "event_type": "baseline_events",
                        "severity": severity,
                        "ts_us": ti,
                        "detection_latency_us": 0,
                        "description": (
                            f"Observed baseline changed from {last_result}"
                            f" to {result}"
                        ),
                    }
                )
        last_result = result
    state.update(
        recents=list(recents), srt=srt, last_obs=last_obs,
        last_result=last_result,
    )
    return events


def baseline_events(
    values: np.ndarray,
    ts_us: np.ndarray,
    max_history: int = 50,
    percentile: float = 0.10,
    threshold: float = 25.0,
    purge_s: int = 600,
) -> list[dict]:
    """detectors/baseline/BaselineDetector.scala:52-162 — sliding
    percentile baseline; event when the baseline's change magnitude
    exceeds ``threshold``. ``percentile`` is a commons-math percent
    (0.10 => the 0.1th percentile, i.e. a near-minimum baseline)."""
    return baseline_fold(
        values, ts_us, fresh_baseline_state(),
        max_history=max_history, percentile=percentile,
        threshold=threshold, purge_s=purge_s,
    )


# ----------------------------------------------------------------- loss

def loss_events(
    lossy: np.ndarray,
    ts_us: np.ndarray,
    max_history: int = 30,
    loss_count: int = 10,
    consecutive_count: int = 5,
) -> list[dict]:
    """detectors/loss/LossDetector.scala:50-193 — windowed lossy counts;
    an event per measurement that worsens either loss metric. No
    session-gap reset in the reference. Severity reproduces the
    integer-division quirk (ratio.toInt -> 0 until the window is all
    loss)."""
    return loss_fold(
        np.asarray(lossy, dtype=bool),
        np.asarray(ts_us, dtype=np.int64),
        [],
        max_history,
        loss_count,
        consecutive_count,
    )


def loss_fold(
    lz: np.ndarray,
    t: np.ndarray,
    recents: list[tuple[bool, int]],
    max_history: int,
    loss_count: int,
    consecutive_count: int,
) -> list[dict]:
    """The resumable core of loss_events: continues from (and mutates)
    an existing ``recents`` window — the Flink keyed-state analogue the
    streaming path carries across micro-batches
    (streaming/rollup_stream.stream_detect_loss)."""
    events: list[dict] = []
    for i in range(lz.size):
        old_count = sum(1 for is_l, _ in recents if is_l)
        recents.append((bool(lz[i]), int(t[i])))
        if len(recents) > max_history:
            recents.pop(0)
        new_consecutive = 0
        for is_l, _ in reversed(recents):
            if not is_l:
                break
            new_consecutive += 1
        new_count = sum(1 for is_l, _ in recents if is_l)
        severity = int(new_consecutive / max_history)
        if consecutive_count > 0 and new_consecutive >= consecutive_count:
            oldest_consec = [r for r in recents[-new_consecutive:]][0]
            events.append(
                {
                    "idx": i,
                    "event_type": "loss_events",
                    "severity": severity,
                    "ts_us": int(t[i]),
                    "detection_latency_us": int(t[i]) - oldest_consec[1],
                    "description": (
                        f"Consecutive loss became worse! "
                        f"{new_consecutive} in a row."
                    ),
                }
            )
        if loss_count > 0 and new_count > old_count and new_count >= loss_count:
            # reference quirk: getOldestLoss is recents.reverse.find(lossy)
            # (LossDetector.scala:110) — despite the name, that is the
            # NEWEST lossy measurement; reproduced faithfully
            oldest_loss = next(r for r in reversed(recents) if r[0])
            events.append(
                {
                    "idx": i,
                    "event_type": "loss_events",
                    "severity": severity,
                    "ts_us": int(t[i]),
                    "detection_latency_us": int(t[i]) - oldest_loss[1],
                    "description": (
                        f"Loss ratio became worse! {old_count}/"
                        f"{len(recents)} -> {new_count}/{len(recents)}"
                    ),
                }
            )
    return events


# ----------------------------------------------------------------- mode

def _scale_2sf_floor(v: int) -> int:
    """ModeDetector.scala:157-166 — round to 2 significant figures with
    FLOOR (toward -infinity), preserving magnitude."""
    if v == 0:
        return 0
    d = int(math.floor(math.log10(abs(v)))) + 1
    if d <= 2:
        return v
    q = 10 ** (d - 2)
    return (v // q) * q  # python floor-div == BigDecimal FLOOR


def fresh_mode_state() -> dict:
    """Externalizable mode-detector state (ModeDetector.scala:54-120
    checkpointed keyed state): the scaled-value window, its count map,
    the purge clock and the last-event mode."""
    return {"history": [], "counts": {}, "last_obs": None,
            "last_event_val": -5}


def mode_fold(
    values: np.ndarray,
    ts_us: np.ndarray,
    state: dict,
    max_history: int = 30,
    min_frequency: int = 6,
    min_prominence: int = 3,
    threshold: float = 7.5,
    purge_s: int = 60,
) -> list[dict]:
    """Resumable core of ``mode_events``: continues from (and mutates)
    ``state`` — see fresh_mode_state()."""
    v = np.asarray(values, dtype=np.float64)
    t = np.asarray(ts_us, dtype=np.int64)
    purge_us = purge_s * 1_000_000
    events: list[dict] = []
    last_obs: int | None = state["last_obs"]
    # incremental state: scaled-value window + count map maintained by
    # one add/one evict per point (the previous version rebuilt the
    # whole count dict with a log10/pow per element per point); the
    # count map is exact integers, so mode selection is bit-identical
    history: deque[int] = deque(state["history"])
    counts: dict[int, int] = dict(state["counts"])
    UNSET = -5
    primary_val, primary_cnt = -1, -2
    secondary_val, secondary_cnt = -3, -4
    last_event_val = state["last_event_val"]

    for i in range(v.size):
        ti = int(t[i])
        if last_obs is None or (purge_us > 0 and ti - last_obs > purge_us):
            last_obs = ti
            history = deque()
            counts = {}
            primary_val, primary_cnt = -1, -2
            secondary_val, secondary_cnt = -3, -4
            last_event_val = UNSET
            continue
        if ti - last_obs >= 0:
            last_obs = ti
        if math.isnan(v[i]):
            continue
        s = _scale_2sf_floor(int(v[i]))  # Double.toInt truncates to zero
        history.append(s)
        counts[s] = counts.get(s, 0) + 1
        if len(history) > max_history:
            old = history.popleft()
            c = counts[old] - 1
            if c:
                counts[old] = c
            else:
                del counts[old]
        # top-2 by (count, value) desc — single pass, deterministic
        # tie-break pinned as before
        primary_val, primary_cnt = -1, -2
        secondary_val, secondary_cnt = -2, -2
        for val, cnt in counts.items():
            if (cnt, val) > (primary_cnt, primary_val):
                secondary_val, secondary_cnt = primary_val, primary_cnt
                primary_val, primary_cnt = val, cnt
            elif (cnt, val) > (secondary_cnt, secondary_val):
                secondary_val, secondary_cnt = val, cnt
        if len(counts) == 1:
            secondary_val, secondary_cnt = -2, -2

        if len(history) < max_history:
            continue
        if last_event_val == primary_val:
            continue
        if primary_cnt < min_frequency:
            continue
        if primary_cnt - secondary_cnt < min_prominence:
            continue
        if counts.get(last_event_val, 0) == 0:
            last_event_val = primary_val
            continue
        # ModeDetector.scala:371-383 — the raw Scala arithmetic is kept:
        # lastEvent<=0 gives NaN (every comparison false -> gate passes),
        # lastEvent==1 gives Infinity (gate always blocks)
        lev = float(last_event_val)
        if lev > 0:
            lg = math.log(lev)
            calc = lev / lg if lg != 0.0 else math.inf
        else:
            calc = math.nan
        thresh = threshold if calc < threshold else calc
        if abs(last_event_val - primary_val) < thresh:
            last_event_val = primary_val
            continue
        if last_event_val != UNSET:
            old, cur = last_event_val, primary_val

            def magnitude(x: int) -> int:
                return 0 if x == 0 else 1 + int(math.floor(math.log10(abs(x))))

            om, cm = magnitude(old), magnitude(cur)
            scale_factor = om - 1 if om == cm else max(min(om, cm), 1)
            q = int(math.pow(10, scale_factor - 1))
            sev = change_magnitude_severity(
                math.trunc(old / q), math.trunc(cur / q)
            )
            events.append(
                {
                    "idx": i,
                    "event_type": "mode_events",
                    "severity": sev,
                    "ts_us": ti,
                    "detection_latency_us": 0,
                    "description": f"Mode changed from {old} to {cur}!",
                }
            )
        last_event_val = primary_val
    state.update(
        history=list(history), counts=counts, last_obs=last_obs,
        last_event_val=last_event_val,
    )
    return events


def mode_events(
    values: np.ndarray,
    ts_us: np.ndarray,
    max_history: int = 30,
    min_frequency: int = 6,
    min_prominence: int = 3,
    threshold: float = 7.5,
    purge_s: int = 60,
) -> list[dict]:
    """detectors/mode/ModeDetector.scala:54-448 — event when the 2-sig-
    fig-bucketed mode of the last ``max_history`` values changes with
    sufficient frequency, prominence and magnitude."""
    return mode_fold(
        values, ts_us, fresh_mode_state(),
        max_history=max_history, min_frequency=min_frequency,
        min_prominence=min_prominence, threshold=threshold,
        purge_s=purge_s,
    )


# -------------------------------------------------------------- distdiff

def _dist_diff(
    old: list[float], rec: list[float], recents_count: int
) -> float:
    """DistDiffLogic.scala:85-178 — KS-style max running CDF difference,
    with the reference's signed-max quirk reproduced exactly."""
    max_depth = len(old) + len(rec)
    io = ir = 0
    depth = 0
    rdiff = 0.0
    rdiffmax = 0.0
    while True:
        if io >= len(old):
            newrdiff = rdiff + (-1.0 / recents_count * (max_depth - depth))
            result = abs(newrdiff) if abs(newrdiff) > rdiffmax else rdiffmax
            break
        if ir >= len(rec):
            newrdiff = rdiff + (1.0 / recents_count * (max_depth - depth))
            result = abs(newrdiff) if abs(newrdiff) > rdiffmax else rdiffmax
            break
        o, r = old[io], rec[ir]
        if o < r:
            rdiff -= 1.0 / recents_count
            if abs(rdiff) > rdiffmax:
                rdiffmax = rdiff  # signed, as in the reference
            io += 1
            depth += 1
        elif o > r:
            rdiff += 1.0 / recents_count
            if abs(rdiff) > rdiffmax:
                rdiffmax = rdiff
            ir += 1
            depth += 1
        else:
            while io < len(old) and old[io] == o:
                io += 1
            while ir < len(rec) and rec[ir] == r:
                ir += 1
            depth += 1
    wl = max_depth
    return result * math.sqrt(wl * wl / (wl * 2.0))


def fresh_distdiff_state() -> dict:
    """Externalizable distdiff-detector state (DistDiffDetector.scala:
    54-101 checkpointed keyed state): the two adjacent value windows,
    their timestamps, the purge clock and the hysteresis latch."""
    return {"recents": [], "long_recents": [], "times": [],
            "in_event": False, "last_obs": None}


def distdiff_fold(
    values: np.ndarray,
    ts_us: np.ndarray,
    state: dict,
    recents_count: int = 20,
    minimum_change: float = 1.05,
    z_threshold: float = 5.0,
    drop_extreme_n: int = 2,
    purge_s: int = 1200,
) -> list[dict]:
    """Resumable core of ``distdiff_events``: continues from (and
    mutates) ``state`` — see fresh_distdiff_state()."""
    v = np.asarray(values, dtype=np.float64)
    t = np.asarray(ts_us, dtype=np.int64)
    purge_us = purge_s * 1_000_000
    events: list[dict] = []
    last_obs: int | None = state["last_obs"]
    recents: list[float] = list(state["recents"])
    long_recents: list[float] = list(state["long_recents"])
    times: list[int] = list(state["times"])
    in_event = state["in_event"]
    for i in range(v.size):
        x, ti = float(v[i]), int(t[i])
        if last_obs is None or ti - last_obs > purge_us:
            if math.isnan(x):
                last_obs = None
            else:
                last_obs = ti
                recents = [x]
                long_recents = []
                times = [ti]
                in_event = False
            continue
        if ti - last_obs >= 0:
            last_obs = ti
        if math.isnan(x):
            continue
        recents.append(x)
        if len(recents) > recents_count:
            long_recents.append(recents.pop(0))
        if len(long_recents) > recents_count:
            long_recents.pop(0)
        times.append(ti)
        if len(times) > recents_count + 1:
            times.pop(0)
        if len(long_recents) < recents_count:
            continue
        if drop_extreme_n:
            old = sorted(long_recents)[drop_extreme_n:-drop_extreme_n]
            rec = sorted(recents)[drop_extreme_n:-drop_extreme_n]
        else:
            old = sorted(long_recents)
            rec = sorted(recents)
        diff = _dist_diff(old, rec, recents_count)
        severity = None
        if not in_event and diff >= z_threshold:
            old_sum, rec_sum = sum(old), sum(rec)
            old_range = max(old) - min(old)
            rec_range = max(rec) - min(rec)
            # Scala Double division: x/0.0 is ±Inf and 0.0/0.0 is NaN
            # (DistDiffDetector.scala:176) — Python raises instead, so
            # mirror IEEE-754 explicitly for the zero-sum edge
            hi, lo = (
                (old_sum, rec_sum) if old_sum > rec_sum
                else (rec_sum, old_sum)
            )
            if lo != 0.0:
                change = hi / lo
            elif hi == 0.0:
                change = math.nan
            else:
                change = math.copysign(math.inf, hi)
            if not (
                change < minimum_change
                or abs(old_sum - rec_sum) < recents_count
            ):
                old_mean = old_sum / len(old)
                rec_mean = rec_sum / len(rec)
                if not (
                    rec_range > 0.25 * old_range
                    and abs(old_mean - rec_mean) < 2 * old_range
                ):
                    severity = change_magnitude_severity(
                        old_mean / 1000.0, rec_mean / 1000.0
                    )
        if severity is not None:
            old_mean = sum(old) / len(old)
            rec_mean = sum(rec) / len(rec)
            direction = "increased" if old_mean < rec_mean else "decreased"
            events.append(
                {
                    "idx": i,
                    "event_type": "distdiff_events",
                    "severity": severity,
                    "ts_us": ti,
                    "detection_latency_us": ti - times[0],
                    "description": (
                        f"Distribution has changed. Mean has {direction}"
                        f" from {old_mean} to {rec_mean}"
                    ),
                }
            )
            in_event = True
        if diff < z_threshold / 2.0:
            in_event = False
    state.update(
        recents=recents, long_recents=long_recents, times=times,
        in_event=in_event, last_obs=last_obs,
    )
    return events


def distdiff_events(
    values: np.ndarray,
    ts_us: np.ndarray,
    recents_count: int = 20,
    minimum_change: float = 1.05,
    z_threshold: float = 5.0,
    drop_extreme_n: int = 2,
    purge_s: int = 1200,
) -> list[dict]:
    """DistDiffDetector.scala:54-247 — distribution difference between
    the last ``recents_count`` values and the previous ``recents_count``,
    with in-event hysteresis (exit at z/2)."""
    return distdiff_fold(
        values, ts_us, fresh_distdiff_state(),
        recents_count=recents_count, minimum_change=minimum_change,
        z_threshold=z_threshold, drop_extreme_n=drop_extreme_n,
        purge_s=purge_s,
    )


# ----------------------------------------------------------- changepoint

_TOL = 1e-15


def _cp_pdf(mean: np.ndarray, var: np.ndarray, y: float) -> np.ndarray:
    """NormalDistribution.scala:61-79 (zero-variance guard included)."""
    safe_var = np.where(np.abs(var) <= _TOL, y / 100.0, var)
    a = 1.0 / (math.sqrt(2.0 * math.pi) * np.sqrt(safe_var))
    return a * np.exp(-((y - mean) * (y - mean)) / (2.0 * safe_var))


def _cp_with_point(
    mean: np.ndarray, var: np.ndarray, y: float, new_n: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """NormalDistribution.scala:81-94 — incremental mean/variance with the
    reference's faked n=0 for the first mean update. Vectorized over runs;
    pinned against DistributionTest.scala:43-80 in tests."""
    fake_n = np.where(new_n == 1, 0, new_n).astype(np.float64)
    new_mean = (mean * fake_n + y) / (fake_n + 1.0)
    diff = (y - new_mean) * (y - mean)
    new_var = (var * new_n + diff) / (new_n + 1.0)
    return new_mean, new_var


def fresh_changepoint_state() -> dict:
    """Externalizable changepoint-detector state (the reference's
    checkpointed keyed state, ChangepointProcessor.scala:56-130): the
    Bayesian run arrays (newest first), the frozen pre-anomaly snapshot
    used for outlier rollback, the composite-old baseline, the anomaly
    counters and the purge/event clocks. Arrays are stored as plain
    Python lists so the state pickles engine-neutrally; np.asarray of a
    list round-trips float64 bit-exactly."""
    return {
        "mean": [], "var": [], "n": [], "prob": [], "start": [],
        "normal": None, "composite_old": None,
        "consecutive_anomalies": 0,
        "consecutive_normal_after_outlier": 0,
        "prev_most_likely": 0,
        "last_event_time": None,
        "last_obs": None,
    }


def changepoint_fold(
    values: np.ndarray,
    ts_us: np.ndarray,
    state: dict,
    max_history: int = 60,
    trigger_count: int = 40,
    ignore_outlier_normal_count: int = 1,
    purge_s: int = 60,
    minimum_event_interval_s: int = 10,
    severity_threshold: int = 30,
) -> list[dict]:
    """Resumable core of ``changepoint_events``: continues from (and
    mutates) ``state`` — see fresh_changepoint_state()."""
    v = np.asarray(values, dtype=np.float64)
    t = np.asarray(ts_us, dtype=np.int64)
    purge_us = purge_s * 1_000_000
    min_interval_us = minimum_event_interval_s * 1_000_000
    events: list[dict] = []

    # run arrays, index 0 = newest
    mean = np.asarray(state["mean"], dtype=np.float64)
    var = np.asarray(state["var"], dtype=np.float64)
    n = np.asarray(state["n"], dtype=np.int64)
    prob = np.asarray(state["prob"], dtype=np.float64)
    start = np.asarray(state["start"], dtype=np.int64)

    def runs_update(y: float, ti: int):
        nonlocal mean, var, n, prob, start
        k = mean.size
        if k:
            pdfs = _cp_pdf(mean, var, y)
            remaining = float(np.sum(pdfs * prob) * (1.0 / 200.0))
            new_n = np.arange(k) + 1
            new_mean, new_var = _cp_with_point(mean, var, y, new_n)
            new_prob = pdfs * prob * (1.0 - 1.0 / 200.0)
            mean, var, prob = new_mean, new_var, new_prob
            n = new_n
        else:
            remaining = 0.0
        # prepend fresh run: initial NormalDistribution(0, 1e8).withPoint(y, 1)
        mean = np.concatenate([[y], mean])
        var = np.concatenate([[(1e8 * 1 + (y - y) * (y - 0.0)) / 2.0], var])
        n = np.concatenate([[1], n]).astype(np.int64)
        prob = np.concatenate([[remaining], prob])
        start = np.concatenate([[ti], start]).astype(np.int64)
        # squash oldest beyond max_history (iterative pairwise merge ==
        # single fold of the tail probabilities onto the cut-off run)
        while mean.size > max_history:
            prob[-2] += prob[-1]
            mean, var, n = mean[:-1], var[:-1], n[:-1]
            prob, start = prob[:-1], start[:-1]
        total = float(prob.sum())
        if total == 0.0:
            prob = np.zeros_like(prob)
            prob[0] = 1.0
        else:
            prob = prob / total

    def filtered_argmax(arr: np.ndarray) -> int:
        if arr.size > 1:
            return int(np.argmax(arr[:-1]))
        return 0

    last_obs: int | None = state["last_obs"]
    # frozen copy of run arrays (tuple of 5 ndarrays) or None
    normal: tuple | None = (
        None if state["normal"] is None else tuple(
            np.asarray(a, dtype=d) for a, d in zip(
                state["normal"],
                (np.float64, np.float64, np.int64, np.float64, np.int64),
            )
        )
    )
    composite_old = (
        None if state["composite_old"] is None
        else tuple(state["composite_old"])
    )  # (mean, start)
    consecutive_anomalies = state["consecutive_anomalies"]
    consecutive_normal_after_outlier = (
        state["consecutive_normal_after_outlier"]
    )
    prev_most_likely = state["prev_most_likely"]
    last_event_time: int | None = state["last_event_time"]

    def reset(ti: int) -> None:
        nonlocal mean, var, n, prob, start, normal, composite_old
        nonlocal consecutive_anomalies, consecutive_normal_after_outlier
        nonlocal prev_most_likely, last_obs
        mean = np.empty(0)
        var = np.empty(0)
        n = np.empty(0, dtype=np.int64)
        prob = np.empty(0)
        start = np.empty(0, dtype=np.int64)
        normal = None
        composite_old = None
        consecutive_anomalies = 0
        consecutive_normal_after_outlier = 0
        prev_most_likely = 0
        last_obs = ti

    for i in range(v.size):
        y, ti = float(v[i]), int(t[i])
        if math.isnan(y):
            continue  # lossy rows are filtered before this detector
        if last_obs is None or (purge_us > 0 and ti - last_obs > purge_us):
            reset(ti)
            continue
        if ti - last_obs >= 0:
            last_obs = ti
        if prev_most_likely >= mean.size:
            prev_most_likely = mean.size - 1
        if consecutive_anomalies == 0:
            normal = (mean.copy(), var.copy(), n.copy(), prob.copy(),
                      start.copy())
            if mean.size:
                big = filtered_argmax(n.astype(np.float64))
                composite_old = (float(mean[big]), int(start[prev_most_likely]))
            else:
                composite_old = (0.0, 0)
        runs_update(y, ti)
        most_likely = filtered_argmax(prob)
        if most_likely != prev_most_likely:
            consecutive_anomalies += 1
            pdfs = _cp_pdf(mean, var, y)
            highest_pdf = filtered_argmax(pdfs)
            if highest_pdf == mean.size - 2:
                consecutive_normal_after_outlier += 1
                if consecutive_normal_after_outlier > ignore_outlier_normal_count:
                    consecutive_anomalies = 0
                    consecutive_normal_after_outlier = 0
                    mean, var, n, prob, start = (
                        normal[0].copy(), normal[1].copy(), normal[2].copy(),
                        normal[3].copy(), normal[4].copy(),
                    )
                    # reference returns here WITHOUT updating
                    # previousMostLikelyIndex (ChangepointProcessor.scala:317)
                    runs_update(y, ti)
                    continue
            else:
                consecutive_normal_after_outlier = 0
        else:
            consecutive_anomalies = 0
            consecutive_normal_after_outlier = 0
        prev_most_likely = most_likely
        if consecutive_anomalies > trigger_count:
            new_idx = int(np.flatnonzero(n == 1)[0])
            new_mean = float(mean[new_idx])
            old_mean, old_start = composite_old
            severity = change_magnitude_severity(old_mean, new_mean)
            if severity > severity_threshold:
                if (
                    last_event_time is None
                    or ti - last_event_time > min_interval_us
                ):
                    last_event_time = ti
                    direction = (
                        "decreased" if old_mean > new_mean else "increased"
                    )
                    events.append(
                        {
                            "idx": i,
                            "event_type": "changepoint_events",
                            "severity": severity,
                            "ts_us": ti,
                            "detection_latency_us": ti - old_start,
                            "description": (
                                f"Latency {direction} from {int(old_mean)}"
                                f" to {int(new_mean)}"
                            ),
                        }
                    )
                reset(ti)
                continue
            consecutive_anomalies = 0
    state.update(
        mean=mean.tolist(), var=var.tolist(), n=n.tolist(),
        prob=prob.tolist(), start=start.tolist(),
        normal=None if normal is None else tuple(
            a.tolist() for a in normal
        ),
        composite_old=composite_old,
        consecutive_anomalies=consecutive_anomalies,
        consecutive_normal_after_outlier=consecutive_normal_after_outlier,
        prev_most_likely=prev_most_likely,
        last_event_time=last_event_time,
        last_obs=last_obs,
    )
    return events


def changepoint_events(
    values: np.ndarray,
    ts_us: np.ndarray,
    max_history: int = 60,
    trigger_count: int = 40,
    ignore_outlier_normal_count: int = 1,
    purge_s: int = 60,
    minimum_event_interval_s: int = 10,
    severity_threshold: int = 30,
) -> list[dict]:
    """Bayesian online changepoint detection (Adams & MacKay style),
    ChangepointProcessor.scala:240-364 + ChangepointLogic.scala:107-178.
    Run state is held in parallel NumPy arrays (newest first); per-point
    updates (pdf, withPoint, squash, normalise) are vectorized over runs.

    NormalDistribution.withPoint quirks reproduced: a run's ``n`` equals
    its positional index after the update (ChangepointLogic.scala:115),
    and the first mean update fakes n=0 (NormalDistribution.scala:81-88).
    """
    return changepoint_fold(
        values, ts_us, fresh_changepoint_state(),
        max_history=max_history, trigger_count=trigger_count,
        ignore_outlier_normal_count=ignore_outlier_normal_count,
        purge_s=purge_s,
        minimum_event_interval_s=minimum_event_interval_s,
        severity_threshold=severity_threshold,
    )


def spike_details(
    values: np.ndarray,
    ts_us: np.ndarray,
    lag: int = 50,
    threshold: float = 50.0,
    influence: float = 0.01,
    purge_s: int = 60,
) -> list[dict]:
    """SpikeDetector's side 'detail' output
    (detectors/spike/SpikeDetector.scala:159-169, SpikeDetail): one
    record per processed non-lossy row with the signal decision and the
    smoothing state (mean/std of the lag window) it was taken against.
    Same state machine as spike_events — indices with signal != 0 are
    exactly the emitted events (asserted in tests).

    Returns a dict of parallel numpy arrays (idx, ts_us, value, signal,
    mean, std) — one detail record per kept point. Columnar because this
    output is per-POINT, not per-event: a dict per row dominated the
    runtime of the detail stream at bench scale."""
    v = np.asarray(values, dtype=np.float64)
    t = np.asarray(ts_us, dtype=np.int64)
    purge_us = purge_s * 1_000_000
    n = v.size
    o_idx = np.empty(n, dtype=np.int64)
    o_signal = np.empty(n, dtype=np.int64)
    o_mean = np.empty(n, dtype=np.float64)
    o_std = np.empty(n, dtype=np.float64)
    k = 0
    last_obs: int | None = None
    hist = _RollingMeanStd()
    last_mean = math.nan
    last_std = math.nan
    for i in range(n):
        x, ti = float(v[i]), int(t[i])
        if last_obs is None or ti - last_obs > purge_us:
            last_obs = ti
            hist.reset()
            last_mean = math.nan
            last_std = math.nan
            continue
        if ti - last_obs >= 0:
            last_obs = ti
        if math.isnan(x):
            continue
        signal = 0
        if len(hist.q) >= lag and abs(x - last_mean) > threshold * last_std:
            hist.push(influence * x + (1.0 - influence) * hist.q[-1], lag)
            signal = 1 if x > last_mean else -1
        else:
            hist.push(x, lag)
        o_idx[k] = i
        o_signal[k] = signal
        o_mean[k] = last_mean
        o_std[k] = last_std
        k += 1
        last_mean, last_std = hist.mean_std()
    kept = o_idx[:k]
    return {
        "idx": kept,
        "ts_us": t[kept],
        "value": v[kept],
        "signal": o_signal[:k],
        "mean": o_mean[:k],
        "std": o_std[:k],
    }


def windowed_distdiff_events(
    values: np.ndarray,
    ts_us: np.ndarray,
    recents_count: int = 20,
    minimum_change: float = 1.05,
    z_threshold: float = 5.0,
    drop_extreme_n: int = 2,
) -> list[dict]:
    """WindowedDistDiffDetector.scala:54-149 — the windowed variant of
    the distribution-difference test: the window's elements sorted by
    time, first ``recents_count`` non-lossy values = 'old', next
    ``recents_count`` = 'recent', one test per window (no hysteresis —
    windows are independent). Severity gates identical to the keyed
    variant (DistDiffLogic.scala:180-240)."""
    v = np.asarray(values, dtype=np.float64)
    t = np.asarray(ts_us, dtype=np.int64)
    keep = ~np.isnan(v)
    v, t = v[keep], t[keep]
    if v.size < 2 * recents_count:
        return []
    old_raw = [float(x) for x in v[:recents_count]]
    rec_raw = [float(x) for x in v[recents_count:2 * recents_count]]
    if drop_extreme_n:
        old = sorted(old_raw)[drop_extreme_n:-drop_extreme_n]
        rec = sorted(rec_raw)[drop_extreme_n:-drop_extreme_n]
    else:
        old = sorted(old_raw)
        rec = sorted(rec_raw)
    diff = _dist_diff(old, rec, recents_count)
    if diff < z_threshold:
        return []
    old_sum, rec_sum = sum(old), sum(rec)
    old_range = max(old) - min(old)
    rec_range = max(rec) - min(rec)
    # Scala Double division: x/0.0 is ±Inf and 0.0/0.0 is NaN
    # (WindowedDistDiffDetector shares DistDiffLogic) — Python raises
    # instead, so mirror IEEE-754 explicitly for the zero-sum edge
    hi, lo = (
        (old_sum, rec_sum) if old_sum > rec_sum else (rec_sum, old_sum)
    )
    if lo != 0.0:
        change = hi / lo
    elif hi == 0.0:
        change = math.nan
    else:
        change = math.copysign(math.inf, hi)
    if change < minimum_change or abs(old_sum - rec_sum) < recents_count:
        return []
    old_mean = old_sum / len(old)
    rec_mean = rec_sum / len(rec)
    if rec_range > 0.25 * old_range and abs(old_mean - rec_mean) < 2 * old_range:
        return []
    severity = change_magnitude_severity(old_mean / 1000.0, rec_mean / 1000.0)
    direction = "increased" if old_mean < rec_mean else "decreased"
    ti = int(t[2 * recents_count - 1])
    return [
        {
            "idx": int(2 * recents_count - 1),
            "event_type": "windowed_distdiff_events",
            "severity": severity,
            "ts_us": ti,
            "detection_latency_us": ti - int(t[0]),
            "description": (
                f"Distribution has changed. Mean has {direction}"
                f" from {old_mean} to {rec_mean}"
            ),
        }
    ]


def fresh_windowed_distdiff_state() -> dict:
    return {"w_us": None, "buf_v": [], "buf_t": [], "done": False}


def windowed_distdiff_fold(
    values: np.ndarray,
    ts_us: np.ndarray,
    state: dict,
    window_s: int = 3600,
    recents_count: int = 20,
    minimum_change: float = 1.05,
    z_threshold: float = 5.0,
    drop_extreme_n: int = 2,
) -> list[dict]:
    """Streaming form of ``windowed_distdiff_events``: tumbling windows
    are independent and the single test per window reads exactly the
    first ``2*recents_count`` non-lossy values, so the carried state is
    just the current window bucket plus that bounded buffer (with a
    done-latch once the window's test has fired). Bit-equal to the
    batch operator when points arrive in (ts, turn_idx) order — the
    same ordering contract as every other fold in DETECTOR_FOLDS
    (reference: detectors/distdiff/WindowedDistDiffDetector.scala:54-149
    run inside Flink's tumbling event-time window,
    runners/unified/schema/TypedStreams.scala:70-72). Event-time is
    assumed ≥ epoch, matching the batch bucketing expression."""
    v = np.asarray(values, dtype=np.float64)
    t = np.asarray(ts_us, dtype=np.int64)
    win_us = int(window_s) * 1_000_000
    need = 2 * recents_count
    out: list[dict] = []
    for i in range(v.size):
        w = (int(t[i]) // win_us) * win_us
        if state["w_us"] != w:
            state["w_us"] = w
            state["buf_v"] = []
            state["buf_t"] = []
            state["done"] = False
        if state["done"] or math.isnan(v[i]):
            continue
        state["buf_v"].append(float(v[i]))
        state["buf_t"].append(int(t[i]))
        if len(state["buf_v"]) == need:
            out.extend(
                windowed_distdiff_events(
                    np.asarray(state["buf_v"], dtype=np.float64),
                    np.asarray(state["buf_t"], dtype=np.int64),
                    recents_count=recents_count,
                    minimum_change=minimum_change,
                    z_threshold=z_threshold,
                    drop_extreme_n=drop_extreme_n,
                )
            )
            state["done"] = True
            state["buf_v"] = []
            state["buf_t"] = []
    return out


DETECTORS = {
    "baseline": baseline_events,
    "spike": spike_events,
    "loss": loss_events,
    "mode": mode_events,
    "distdiff": distdiff_events,
    "changepoint": changepoint_events,
}


def _loss_fold_adapter(values, ts_us, state, **params) -> list[dict]:
    """loss_fold takes the window list directly (typed streaming state);
    adapt it to the (state dict, kw params) fold contract and to the
    NaN-is-lossy value convention the batch path uses."""
    evs = loss_fold(
        np.isnan(np.asarray(values, dtype=np.float64)),
        np.asarray(ts_us, dtype=np.int64),
        state["recents"],
        params.get("max_history", 30),
        params.get("loss_count", 10),
        params.get("consecutive_count", 5),
    )
    return evs


def fresh_loss_state() -> dict:
    return {"recents": []}


# (fresh_state, fold) per detector — every sequential detector is a
# resumable fold, so ALL of them can run as streaming stateful operators
# (streaming/rollup_stream.stream_detect) with bit-exact resume, the
# analogue of the reference's Kryo-checkpointed keyed state
# (reference: detectors/* KeyedProcessFunction state; KryoCodec.scala)
DETECTOR_FOLDS = {
    "baseline": (fresh_baseline_state, baseline_fold),
    "spike": (fresh_spike_state, spike_fold),
    "loss": (fresh_loss_state, _loss_fold_adapter),
    "mode": (fresh_mode_state, mode_fold),
    "distdiff": (fresh_distdiff_state, distdiff_fold),
    "changepoint": (fresh_changepoint_state, changepoint_fold),
    "windowed_distdiff": (
        fresh_windowed_distdiff_state,
        windowed_distdiff_fold,
    ),
}
