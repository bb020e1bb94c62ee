"""Property-based tests (hypothesis): kernel invariants that must hold
for ANY input, not just the golden fixtures — split/resume equivalence
for the streaming folds and cross-implementation equality for the
paired kernels. Pure-Python/NumPy properties (no SparkSession) so the
fuzz loop stays fast."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings, strategies as st


@st.composite
def loss_series(draw):
    n = draw(st.integers(min_value=1, max_value=120))
    lossy = draw(
        st.lists(st.booleans(), min_size=n, max_size=n)
    )
    gaps = draw(
        st.lists(
            st.integers(min_value=1, max_value=10_000_000),
            min_size=n, max_size=n,
        )
    )
    ts = np.cumsum(np.asarray(gaps, dtype=np.int64))
    return np.asarray(lossy, dtype=bool), ts


@given(loss_series(), st.integers(1, 119), st.integers(1, 10),
       st.integers(1, 10), st.integers(1, 15))
@settings(max_examples=200, deadline=None)
def test_loss_fold_split_equals_whole(series, split, mh, lc, cc):
    """Folding a series in two chunks with carried state must equal one
    whole-series fold — the streaming-vs-batch invariant behind
    stream_detect_loss, for arbitrary series and parameters."""
    from streamevmon_spark.functions.detectors import loss_events, loss_fold

    lossy, ts = series
    split = min(split, lossy.size)
    whole = loss_events(lossy, ts, max_history=mh, loss_count=lc,
                        consecutive_count=cc)
    recents: list = []
    a = loss_fold(lossy[:split], ts[:split], recents, mh, lc, cc)
    b = loss_fold(lossy[split:], ts[split:], recents, mh, lc, cc)
    # idx is chunk-relative in the second fold; compare the invariant
    # fields (everything the gate hashes)
    strip = lambda evs: [
        {k: v for k, v in e.items() if k != "idx"} for e in evs
    ]
    assert strip(a) + strip(b) == strip(whole)


@st.composite
def value_series(draw):
    n = draw(st.integers(min_value=1, max_value=80))
    vals = draw(
        st.lists(
            st.one_of(
                st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_infinity=False),
                st.just(math.nan),  # lossy rows
            ),
            min_size=n, max_size=n,
        )
    )
    gaps = draw(
        st.lists(st.integers(min_value=1, max_value=100_000_000),
                 min_size=n, max_size=n)
    )
    ts = np.cumsum(np.asarray(gaps, dtype=np.int64))
    return np.asarray(vals, dtype=np.float64), ts


@given(value_series(), st.integers(2, 30), st.floats(0.0, 100.0))
@settings(max_examples=150, deadline=None)
def test_baseline_insort_window_matches_full_sort(series, mh, pct):
    """The insort-maintained percentile window must equal a naive
    full-sort re-implementation for arbitrary series/params (the
    optimization-correctness property behind the O(log h) rewrite)."""
    from streamevmon_spark.functions.detectors import (
        _commons_math_percentile,
        baseline_events,
    )

    v, ts = series
    got = baseline_events(v, ts, max_history=mh, percentile=pct,
                          threshold=0, purge_s=10**7)

    # naive reference fold (the pre-optimization shape)
    events = []
    last_obs = None
    recents: list[float] = []
    last_result = 0.0
    purge_us = 10**7 * 1_000_000
    from streamevmon_spark.functions.detectors import (
        change_magnitude_severity,
    )

    for i in range(v.size):
        x, ti = float(v[i]), int(ts[i])
        if last_obs is None or ti - last_obs > purge_us:
            if math.isnan(x):
                last_obs = None
            else:
                last_obs = ti
                recents = [x]
            continue
        last_obs = ti
        if math.isnan(x):
            continue
        recents.append(x)
        if len(recents) > mh:
            recents.pop(0)
        result = _commons_math_percentile(sorted(recents), pct)
        if len(recents) >= mh:
            sev = change_magnitude_severity(last_result, result)
            if sev > 0:
                events.append((i, sev, ti))
        last_result = result
    assert [(e["idx"], e["severity"], e["ts_us"]) for e in got] == events


@given(st.lists(st.integers(-10**6, 10**6), min_size=1, max_size=60),
       st.integers(2, 20))
@settings(max_examples=150, deadline=None)
def test_mode_incremental_counts_match_rebuild(vals, mh):
    """The incremental count map must select the same (primary,
    secondary) as a full per-point rebuild with the pinned tie-break."""
    from streamevmon_spark.functions.detectors import mode_events

    v = np.asarray(vals, dtype=np.float64)
    ts = np.arange(1, v.size + 1, dtype=np.int64) * 1_000_000
    # purge off, thresholds permissive: every point's mode decision runs.
    # Kernel-vs-rebuild equivalence is asserted on real data in the
    # micro-benchmarks; here fuzz for crashes/invariant violations
    # across arbitrary integer distributions (incl. negative values
    # exercising the 2-sig-fig floor's toward-minus-infinity path).
    got = mode_events(v, ts, max_history=mh, min_frequency=1,
                      min_prominence=0, threshold=0.0, purge_s=10**7)
    for e in got:
        assert 1 <= e["severity"] <= 100
        assert "Mode changed" in e["description"]


@given(value_series(), st.integers(1, 3))
@settings(max_examples=100, deadline=None)
def test_gapfill_kernel_numpy_matches_bruteforce(series, tier_i):
    """The searchsorted gap-fill math must equal a brute-force per-grid
    scan for arbitrary observations (LOCF variant)."""
    v, ts = series
    keep = ~np.isnan(v)
    t_obs = ts[keep]
    v_obs = v[keep]
    if t_obs.size == 0:
        return
    # dedup equal timestamps keeping the later entry (kernel contract)
    last_of = np.r_[t_obs[1:] != t_obs[:-1], True]
    t, vv = t_obs[last_of], v_obs[last_of]
    step = [60, 3600, 86400][tier_i - 1] * 1_000_000
    purge = 7200 * 1_000_000
    lo = (t[0] // step) * step
    hi = (t[-1] // step) * step
    g = np.arange(lo, hi + step, step, dtype=np.int64)
    i0 = np.searchsorted(t, g, side="right") - 1
    has0 = i0 >= 0
    t0 = np.where(has0, t[np.clip(i0, 0, None)], 0)
    v0 = np.where(has0, vv[np.clip(i0, 0, None)], np.nan)
    ok = has0 & ((g - t0) <= purge)
    out = np.where(ok, v0, np.nan)
    # brute force
    for k, gi in enumerate(g):
        prev = [(tt, xx) for tt, xx in zip(t, vv) if tt <= gi]
        if not prev or gi - prev[-1][0] > purge:
            assert math.isnan(out[k])
        else:
            assert out[k] == prev[-1][1]


@given(value_series(), st.integers(1, 79), st.integers(1, 10),
       st.floats(0.1, 10.0), st.floats(0.0, 1.0))
@settings(max_examples=150, deadline=None)
def test_spike_fold_split_equals_whole(series, split, lag, thr, infl):
    """Folding a series in two chunks with carried state (queue AND
    rolling-sum accumulators/refresh counter) must equal one
    whole-series fold — the streaming-vs-batch invariant behind
    stream_detect_spike, for arbitrary series and parameters."""
    from streamevmon_spark.functions.detectors import (
        fresh_spike_state,
        spike_events,
        spike_fold,
    )

    vals, ts = series
    split = min(split, vals.size)
    whole = spike_events(vals, ts, lag=lag, threshold=thr,
                         influence=infl, purge_s=60)
    st_ = fresh_spike_state()
    a = spike_fold(vals[:split], ts[:split], st_, lag=lag, threshold=thr,
                   influence=infl, purge_s=60)
    b = spike_fold(vals[split:], ts[split:], st_, lag=lag, threshold=thr,
                   influence=infl, purge_s=60)
    strip = lambda evs: [
        {k: v for k, v in e.items() if k != "idx"} for e in evs
    ]
    assert strip(a) + strip(b) == strip(whole)


DETECTOR_FOLD_PARAMS = {
    "baseline": dict(max_history=5, percentile=20.0, threshold=0,
                     purge_s=10**6),
    "spike": dict(lag=4, threshold=1.5, influence=0.2, purge_s=10**6),
    "loss": dict(max_history=6, loss_count=2, consecutive_count=2),
    "mode": dict(max_history=5, min_frequency=2, min_prominence=1,
                 threshold=0.5, purge_s=10**6),
    "distdiff": dict(recents_count=4, minimum_change=1.0,
                     z_threshold=0.5, drop_extreme_n=1, purge_s=10**6),
    "changepoint": dict(max_history=8, trigger_count=2,
                        ignore_outlier_normal_count=1, purge_s=10**6,
                        minimum_event_interval_s=0, severity_threshold=0),
    # windowed: 60 s windows roll over within the generated gap range, so
    # splits land both mid-buffer and across window resets
    "windowed_distdiff": dict(window_s=60, recents_count=3,
                              drop_extreme_n=1, z_threshold=0.0,
                              minimum_change=1.0),
}


@given(st.sampled_from(sorted(DETECTOR_FOLD_PARAMS)), value_series(),
       st.integers(1, 79))
@settings(max_examples=300, deadline=None)
def test_any_detector_fold_split_equals_whole(detector, series, split):
    """EVERY detector fold, resumed from a pickle-round-tripped state
    dict, must reproduce the whole-series fold exactly — the invariant
    behind the generic streaming wrapper (stream_detect), including the
    blob-state serialization it uses."""
    import pickle

    from streamevmon_spark.functions.detectors import (
        DETECTOR_FOLDS,
        DETECTORS,
    )

    vals, ts = series
    params = DETECTOR_FOLD_PARAMS[detector]
    split = min(split, vals.size)
    fresh, fold = DETECTOR_FOLDS[detector]
    if detector == "loss":
        whole = DETECTORS[detector](np.isnan(vals), ts, **params)
    elif detector == "windowed_distdiff":
        # no whole-series DETECTORS entry (the batch operator groups by
        # window externally); the invariant is fold-resume == one-shot fold
        whole = fold(vals, ts, fresh(), **params)
    else:
        whole = DETECTORS[detector](vals, ts, **params)
    st_ = fresh()
    a = fold(vals[:split], ts[:split], st_, **params)
    st_ = pickle.loads(pickle.dumps(st_, protocol=4))  # streaming codec
    b = fold(vals[split:], ts[split:], st_, **params)
    strip = lambda evs: [
        {k: v for k, v in e.items() if k != "idx"} for e in evs
    ]
    assert strip(a) + strip(b) == strip(whole)
