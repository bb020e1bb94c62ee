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


def test_rollup_from_store_equals_raw(spark, sf_dir):
    """Tier rebuild from the compressed chunk store must equal the
    raw-path rollup bit-for-bit: codec round-trip exact, NaN instants
    map back to NULL (lossy), unique instants make the synthetic
    turn_idx harmless to the latency lag order."""
    import pandas as pd

    from streamevmon_spark.operators.chunks import compress_chunks
    from streamevmon_spark.operators.rollup import (
        EPOCH_NTZ,
        rollup_from_store,
    )

    df = load_transcripts(spark, sf_dir)
    pts = df.select(
        "conv_id", "tool", "role",
        F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)").alias("ts_us"),
        "value",
    )
    got = rollup_from_store(compress_chunks(pts, "1d"), "1m").toPandas()
    exp = rollup_tier(df, "1m").toPandas()
    key = ["conv_id", "tool", "role", "window_start"]
    got = got.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    for c in ("window_start", "window_end"):
        got[c] = got[c].astype("datetime64[us]")
        exp[c] = exp[c].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


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
    plan = (
        rollup_tier(df, "1m", max_exact_rows=None)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # exchanges: one for row_number (conv_id), one for series key; the
    # groupBy must NOT add a third full exchange of the raw data
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 3, plan


def test_guarded_default_evaluates_lag_subtree_once(spark, sf_dir):
    """rollup_tier's default (guarded) plan must contain the SAME number
    of Window operators as the exact plan: the dense-routing pre-count
    is a plain scan + partial count of the raw relation, and the single
    aggregation pass computes both percentile states — the expensive
    ordered-lag subtree is never duplicated."""
    df = load_transcripts(spark, sf_dir)
    exact_plan = (
        rollup_tier(df, "1m", max_exact_rows=None)
        ._jdf.queryExecution().executedPlan().toString()
    )
    guarded_plan = (
        rollup_tier(df, "1m")
        ._jdf.queryExecution().executedPlan().toString()
    )
    n_exact = exact_plan.count("Window [")
    n_guarded = guarded_plan.count("Window [")
    assert n_exact >= 1
    assert n_guarded == n_exact, (n_guarded, n_exact, guarded_plan)


def test_rollup_guarded_dense_window_routed_to_sketch(spark):
    """A window above the row bound must produce tolerance-accurate
    sketch percentiles (never an exact collect_list array), while small
    windows stay bit-identical to rollup_tier."""
    import datetime as dt

    import numpy as np
    from pyspark.sql import functions as F

    from streamevmon_spark.operators.rollup import (
        rollup_tier,
        rollup_tier_guarded,
    )

    n_dense = 50_000
    base = dt.datetime(2024, 3, 1)
    # dense: one (conv, tool, role, 1h window) with 50k turns
    dense = spark.range(n_dense).select(
        F.lit("conv-hot").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.lit("t").alias("text"),
        F.lit("none").alias("tool"),
        (
            F.lit(base)
            + F.make_interval(secs=F.col("id").cast("double") * 0.07)
        ).cast("timestamp_ntz").alias("ts"),
        (F.col("id") % 100).cast("double").alias("value"),
    )
    # sparse: a second series with 10 turns in another window
    sparse = spark.range(10).select(
        F.lit("conv-cold").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.lit("t").alias("text"),
        F.lit("none").alias("tool"),
        (
            F.lit(base + dt.timedelta(days=2))
            + F.make_interval(secs=F.col("id").cast("double") * 10)
        ).cast("timestamp_ntz").alias("ts"),
        F.col("id").cast("double").alias("value"),
    )
    df = dense.unionByName(sparse)
    exact = {
        (r.conv_id, r.window_start): r
        for r in rollup_tier(df, "1h").collect()
    }
    guarded = {
        (r.conv_id, r.window_start): r
        for r in rollup_tier_guarded(df, "1h", max_exact_rows=1000).collect()
    }
    assert set(exact) == set(guarded)
    for k, g in guarded.items():
        e = exact[k]
        # algebraic columns always exact
        for c in ["turn_count", "lossy_count", "lat_avg", "lat_min",
                  "lat_max", "val_avg", "activity_rate"]:
            assert getattr(g, c) == getattr(e, c), (k, c)
        if k[0] == "conv-cold":
            assert g.lat_p95 == e.lat_p95  # sparse path bit-identical
        else:
            # dense path: sketch percentiles within 1% relative of exact
            for c in ["lat_p50", "lat_p95", "lat_p99"]:
                ge, ee = getattr(g, c), getattr(e, c)
                assert ge == ee or abs(ge - ee) <= 0.01 * abs(ee) + 1e-9, (
                    k, c, ge, ee,
                )
