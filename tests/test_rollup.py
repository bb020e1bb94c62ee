"""Rollup tiers vs DuckDB oracle; salted == unsalted; cascade consistency.

Mirrors the reference's golden-value detector tests
(reference: detectors/changepoint/DistributionTest.scala:43-80 pattern:
externally computed expected values, exact match)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamevmon_spark.data.transcripts import generate_transcripts, load_transcripts
from streamevmon_spark.operators.rollup import (
    cascade_rollup,
    rollup_tier,
    rollup_tier_salted,
)
from streamevmon_spark.oracles import inter_turn_latency_oracle, rollup_oracle
from tests.oracle_utils import assert_matches_oracle


@pytest.mark.parametrize("tier", ["1m", "1h", "1d"])
def test_rollup_matches_oracle(spark, sf_dir, tier):
    df = load_transcripts(spark, sf_dir)
    assert_matches_oracle(rollup_tier(df, tier), rollup_oracle(tier), sf_dir)


def test_inter_turn_latency_matches_oracle(spark, sf_dir):
    from streamevmon_spark.operators.rollup import add_inter_turn_latency

    df = add_inter_turn_latency(load_transcripts(spark, sf_dir)).select(
        "conv_id", "tool", "role", "turn_idx", "ts", "lat_s"
    )
    assert_matches_oracle(df, inter_turn_latency_oracle(), sf_dir)


def test_salted_equals_unsalted(spark):
    """Two-phase salted aggregation must be bit-identical on algebraic
    columns, on a heavily skewed input (FIXTURES.md §6)."""
    df = generate_transcripts(
        spark, n_turns=20000, n_convs=10, hot_share=0.5, n_hot=1, seed=7
    )
    plain = (
        rollup_tier(df, "1m")
        .select("conv_id", "tool", "role", "window_start",
                "turn_count", "lossy_count", "val_avg", "activity_rate")
        .orderBy("conv_id", "tool", "role", "window_start")
        .toPandas()
    )
    salted = (
        rollup_tier_salted(df, "1m", n_salts=8)
        .select("conv_id", "tool", "role", "window_start",
                "turn_count", "lossy_count", "val_avg", "activity_rate")
        .orderBy("conv_id", "tool", "role", "window_start")
        .toPandas()
    )
    assert plain["turn_count"].tolist() == salted["turn_count"].tolist()
    assert plain["lossy_count"].tolist() == salted["lossy_count"].tolist()
    assert plain["activity_rate"].tolist() == salted["activity_rate"].tolist()
    import numpy as np

    assert np.allclose(
        plain["val_avg"].to_numpy(dtype=float),
        salted["val_avg"].to_numpy(dtype=float),
        rtol=1e-9, equal_nan=True,
    )


def test_cascade_1m_to_1h_consistent(spark, sf_dir):
    df = load_transcripts(spark, sf_dir)
    r1m = rollup_tier(df, "1m")
    via_cascade = (
        cascade_rollup(r1m, "1m", "1h")
        .select("conv_id", "tool", "role", "window_start",
                "turn_count", "lossy_count", "activity_rate")
        .orderBy("conv_id", "tool", "role", "window_start")
        .toPandas()
    )
    direct = (
        rollup_tier(df, "1h")
        .select("conv_id", "tool", "role", "window_start",
                "turn_count", "lossy_count", "activity_rate")
        .orderBy("conv_id", "tool", "role", "window_start")
        .toPandas()
    )
    assert via_cascade.equals(direct)


def test_single_shuffle_plan(spark, sf_dir):
    """The lag() window and the groupBy must share one exchange on the
    series key — scale guard: no redundant shuffle at 100 TB."""
    df = load_transcripts(spark, sf_dir)
    plan = rollup_tier(df, "1m")._jdf.queryExecution().executedPlan().toString()
    # exchanges: one for row_number (conv_id), one for series key; the
    # groupBy must NOT add a third full exchange of the raw data
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 3, plan
