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


def test_smbo_search_deterministic_and_finds_optimum(spark, spiky):
    from streamevmon_spark.functions.tuning import (
        nab_window_score,
        smbo_search,
    )

    windows = [("2024-05-01 00:01:15", "2024-05-01 00:01:25")]
    space = {"threshold": ("float", 0.5, 8.0)}

    def run():
        return smbo_search(
            spiky,
            "spike",
            space,
            lambda ev: nab_window_score(ev, windows),
            n_iter=8,
            n_init=3,
            seed=11,
            lag=10,
            influence=0.0,
            purge_s=86400,
        )

    r1 = run()
    r2 = run()
    # byte-for-byte reproducible under the same seed
    assert [x["params"] for x in r1] == [x["params"] for x in r2]
    assert [x["score"] for x in r1] == [x["score"] for x in r2]
    assert len(r1) == 8
    # the planted spike (only anomaly) is caught by high thresholds
    # without jitter false-positives: the winner must score a clean +1
    best = r1[0]
    assert best["score"] == 1.0
    assert best["params"]["threshold"] > 2.0
    # exploitation happened: at least half the evaluated thresholds in
    # the second phase sit in the high-scoring region
    late = [x["params"]["threshold"] for x in r1[3:]]
    assert sum(t > 2.0 for t in late) >= len(late) // 2


def test_smbo_rejects_invalid_configs(spark, spiky):
    from streamevmon_spark.functions.tuning import (
        nab_window_score,
        smbo_search,
    )

    windows = [("2024-05-01 00:01:15", "2024-05-01 00:01:25")]
    # lag range straddles invalid (<1) values: they must be skipped,
    # never evaluated, and the budget still fills with valid ones
    res = smbo_search(
        spiky,
        "spike",
        {"lag": ("int", -5, 15), "threshold": ("float", 1.0, 6.0)},
        lambda ev: nab_window_score(ev, windows),
        n_iter=5,
        n_init=2,
        seed=3,
        influence=0.0,
        purge_s=86400,
    )
    assert 1 <= len(res) <= 5
    assert all(r["params"]["lag"] >= 1 for r in res)
