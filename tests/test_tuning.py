"""Parameter-sweep tests: grid expansion, constraint skipping, and an
end-to-end tune that must prefer the config detecting a planted anomaly
without false positives."""

from __future__ import annotations

import datetime as dt

import pytest


def test_expand_grid_deterministic():
    from streamevmon_spark.functions.tuning import expand_grid

    got = expand_grid({"b": [1, 2], "a": [10]})
    assert got == [{"a": 10, "b": 1}, {"a": 10, "b": 2}]


@pytest.fixture(scope="module")
def spiky(spark):
    base = dt.datetime(2024, 5, 1)
    rows = []
    for i in range(120):
        v = 100.0 + (i % 7)  # small deterministic jitter
        if i == 80:
            v = 500.0  # planted anomaly
        rows.append(
            ("conv-1", i, "user", "t", "none", base + dt.timedelta(seconds=i), v)
        )
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp_ntz, value double",
    )


def test_grid_search_prefers_precise_config(spark, spiky):
    from streamevmon_spark.functions.tuning import (
        grid_search,
        nab_window_score,
    )

    windows = [("2024-05-01 00:01:15", "2024-05-01 00:01:25")]
    results = grid_search(
        spiky,
        "spike",
        # threshold 0.5 fires on the jitter too (false positives);
        # threshold 5 fires only on the planted spike
        {"threshold": [0.5, 5.0]},
        lambda ev: nab_window_score(ev, windows),
        lag=10,
        influence=0.0,
        purge_s=86400,
    )
    assert len(results) == 2
    best = results[0]
    assert best["params"]["threshold"] == 5.0
    assert best["n_events"] >= 1
    assert best["score"] > results[1]["score"]


def test_grid_search_skips_constraint_violations(spark, spiky):
    from streamevmon_spark.functions.tuning import grid_search

    results = grid_search(
        spiky,
        "changepoint",
        # trigger_count >= max_history violates the LessThan constraint
        {"trigger_count": [5, 50]},
        lambda ev: 0.0,
        max_history=20,
        purge_s=86400,
    )
    assert [r["params"]["trigger_count"] for r in results] == [5]
