"""WindowedDistDiff + SpikeDetail variant tests (reference:
detectors/distdiff/WindowedDistDiffDetector.scala:54-149,
detectors/spike/SpikeDetector.scala:159-169)."""

from __future__ import annotations

import numpy as np

from streamevmon_spark.functions.detectors import (
    spike_details,
    spike_events,
    windowed_distdiff_events,
)


def _ts(n, step_s=5):
    return np.arange(n, dtype=np.int64) * step_s * 1_000_000


def test_windowed_distdiff_fires_on_level_shift():
    vals = np.concatenate([np.full(20, 1000.0), np.full(20, 5000.0)])
    evs = windowed_distdiff_events(vals, _ts(40), recents_count=20)
    assert len(evs) == 1
    ev = evs[0]
    assert ev["event_type"] == "windowed_distdiff_events"
    assert ev["severity"] > 0
    assert "increased" in ev["description"]
    # detection latency spans back to the window's first element
    assert ev["detection_latency_us"] == _ts(40)[39] - _ts(40)[0]


def test_windowed_distdiff_quiet_on_stable_series():
    vals = np.full(40, 1000.0)
    assert windowed_distdiff_events(vals, _ts(40), recents_count=20) == []


def test_windowed_distdiff_short_window_no_event():
    vals = np.concatenate([np.full(5, 1.0), np.full(5, 100.0)])
    assert windowed_distdiff_events(vals, _ts(10), recents_count=20) == []


def test_spike_details_signals_match_spike_events():
    rng = np.random.RandomState(7)
    vals = rng.normal(100.0, 1.0, 200)
    vals[120] = 200.0  # spike
    ts = _ts(200)
    kw = dict(lag=20, threshold=5.0, influence=0.05, purge_s=3600)
    events = spike_events(vals, ts, **kw)
    details = spike_details(vals, ts, **kw)  # dict of parallel arrays
    signal_idx = sorted(details["idx"][details["signal"] != 0].tolist())
    assert signal_idx == sorted(e["idx"] for e in events)
    assert 120 in signal_idx
    # details carry the smoothing state the decision was taken against
    (pos,) = np.nonzero(details["idx"] == 120)[0]
    assert abs(details["value"][pos] - 200.0) < 1e-9
    assert abs(details["mean"][pos] - 100.0) < 2.0
    assert details["signal"][pos] == 1
