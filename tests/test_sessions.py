"""Session analytics (operators/sessions.py) and HLL sketches
(operators/hll.py): hand-computed worked examples, estimator accuracy,
and the mergeability invariant. Cross-engine bit-exactness is covered
by the driver gate (session_stats / role_transitions / context_growth /
counter_rate_1h / hll_distinct_1h / hll_distinct_1d_merged oracles)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from streamevmon_spark.data.transcripts import load_transcripts
from streamevmon_spark.operators.hll import (
    hll_distinct,
    hll_estimate,
    hll_merge_registers,
    hll_registers,
    hll_summary,
)
from streamevmon_spark.operators.sessions import (
    context_growth,
    counter_rate,
    role_transitions,
    session_stats,
    sessionize,
)

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp_ntz, value double"
)


def _t(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, second)


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_sessionize_splits_on_gap(spark):
    rows = [
        ("c1", 0, "user", "aa", "none", _t(0), 1.0),
        ("c1", 1, "assistant", "bb", "none", _t(10), 1.0),
        # 40 min gap > 30 min threshold -> new session
        ("c1", 2, "user", "cc", "exec", _t(50), 1.0),
        ("c2", 0, "user", "dd", "none", _t(0), 1.0),
    ]
    got = {
        (r["conv_id"], r["turn_idx"]): r["session_idx"]
        for r in sessionize(_mk(spark, rows)).collect()
    }
    assert got == {
        ("c1", 0): 0, ("c1", 1): 0, ("c1", 2): 1, ("c2", 0): 0,
    }


def test_session_stats_worked_example(spark):
    rows = [
        ("c1", 0, "user", "aa", "none", _t(0), 1.0),
        ("c1", 1, "assistant", "bb", "exec", _t(10), 1.0),
        ("c1", 2, "user", "cc", "search", _t(50), 1.0),
    ]
    got = {
        r["session_idx"]: r
        for r in session_stats(_mk(spark, rows)).collect()
    }
    assert got[0]["n_turns"] == 2
    assert got[0]["duration_s"] == 600.0
    assert got[0]["n_tool_turns"] == 1
    assert got[1]["n_turns"] == 1
    assert got[1]["duration_s"] == 0.0
    assert got[1]["n_tool_turns"] == 1


def test_role_transitions_counts_and_start(spark):
    rows = [
        ("c1", 0, "user", "aa", "none", _t(0), 1.0),
        ("c1", 1, "assistant", "bb", "none", _t(1), 1.0),
        ("c1", 2, "user", "cc", "none", _t(2), 1.0),
        ("c2", 0, "user", "dd", "none", _t(0), 1.0),
    ]
    got = {
        (r["prev_role"], r["role"]): r["n"]
        for r in role_transitions(_mk(spark, rows)).collect()
    }
    assert got == {
        ("START", "user"): 2,
        ("user", "assistant"): 1,
        ("assistant", "user"): 1,
    }


def test_context_growth_first_over(spark):
    rows = [
        ("c1", 0, "user", "x" * 300, "none", _t(0), 1.0),
        ("c1", 1, "user", "x" * 300, "none", _t(1), 1.0),  # cum 600 > 512
        ("c1", 2, "user", "x" * 300, "none", _t(2), 1.0),
        ("c2", 0, "user", "y" * 10, "none", _t(0), 1.0),
    ]
    got = {r["conv_id"]: r for r in context_growth(_mk(spark, rows)).collect()}
    assert got["c1"]["total_chars"] == 900
    assert got["c1"]["first_over_turn"] == 1
    assert got["c2"]["first_over_turn"] is None


def test_counter_rate_reset_semantics(spark):
    # lengths 3000, 2000, 2000: cum = 3000, 5000 % 4096 = 904 (reset),
    # 2904. adjusted deltas: 0 (first), 904 (reset -> contributes c),
    # 2000. all inside one 1h bucket.
    rows = [
        ("c1", 0, "user", "x" * 3000, "none", _t(0), 1.0),
        ("c1", 1, "user", "x" * 2000, "none", _t(1), 1.0),
        ("c1", 2, "user", "x" * 2000, "none", _t(2), 1.0),
    ]
    [r] = counter_rate(_mk(spark, rows), "1h", wrap=4096).collect()
    assert r["increase"] == 904 + 2000
    assert r["n_resets"] == 1
    assert r["rate_per_s"] == (904 + 2000) / 3600.0


def test_counter_rate_monotone_no_resets(spark):
    rows = [
        ("c1", i, "user", "x" * 10, "none", _t(i), 1.0) for i in range(5)
    ]
    [r] = counter_rate(_mk(spark, rows), "1h", wrap=1 << 40).collect()
    # first sample contributes 0; the rest are plain deltas
    assert r["increase"] == 40
    assert r["n_resets"] == 0


def test_hll_merge_equals_direct(spark, sf_dir):
    """max-merge of 1h register state == direct 1d registers from raw
    (the property the gate row hll_distinct_1d_merged hash-proves
    against DuckDB; here proved Spark-vs-Spark at sf0.001)."""
    t = load_transcripts(spark, sf_dir)
    merged = hll_summary(hll_merge_registers(hll_registers(t, "1h")))
    direct = hll_summary(hll_registers(t, "1d"))
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_hll_estimate_accuracy(spark, sf_dir):
    """m=64 HLL (with linear counting at small range) should land
    within ~3 sigma (1.04/sqrt(64) ~ 13%) of the exact distinct count
    per group at this scale."""
    t = load_transcripts(spark, sf_dir)
    est = {
        (r["bucket_start"], r["tool"], r["role"]): r["est"]
        for r in hll_estimate(hll_distinct(t, "1d")).collect()
    }
    exact = {
        (r["bucket_start"], r["tool"], r["role"]): r["n"]
        for r in t.groupBy(
            F.date_trunc("day", "ts").alias("bucket_start"), "tool", "role"
        ).agg(F.countDistinct("conv_id").alias("n")).collect()
    }
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert est[k] == pytest.approx(n, rel=0.40), (k, est[k], n)


def test_hll_registers_bounds(spark, sf_dir):
    regs = hll_registers(load_transcripts(spark, sf_dir), "1d")
    bad = regs.where(
        (F.col("reg") < 0) | (F.col("reg") >= 64)
        | (F.col("max_rank") < 1) | (F.col("max_rank") > 43)
    )
    assert bad.count() == 0


def test_ewma_fold_worked_example():
    import numpy as np

    from streamevmon_spark.operators.smooth import ewma_fold

    x = np.array([10.0, 20.0, 20.0], dtype=np.float64)
    got = ewma_fold(x, 0.3)
    assert got[0] == 10.0
    assert got[1] == 0.3 * 20.0 + 0.7 * 10.0
    assert got[2] == 0.3 * 20.0 + 0.7 * got[1]


def test_smooth_ewma_dataframe(spark):
    from streamevmon_spark.operators.smooth import smooth_ewma

    rows = [
        ("c1", 0, "user", "a", "none", _t(0), 10.0),
        ("c1", 1, "user", "b", "none", _t(1), 20.0),
        ("c1", 2, "user", "c", "none", _t(2), None),  # lossy: dropped
        ("c1", 3, "user", "d", "none", _t(3), 20.0),
    ]
    got = (
        smooth_ewma(_mk(spark, rows), alpha=0.5)
        .orderBy("ts")
        .collect()
    )
    assert [r["ewma"] for r in got] == [10.0, 15.0, 17.5]
