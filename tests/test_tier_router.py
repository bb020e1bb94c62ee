"""Tier-routing range reads (operators/tier_router.py): cover_plan
decomposition properties, stitched-read equality vs a direct raw-range
rollup, and the stored-state path (reading plans/cascade_store 1m state
instead of raw). Cross-engine bit-exactness is covered by the driver
gate (realtime_range_agg oracle — a DuckDB raw range scan)."""

from __future__ import annotations

import os

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from streamevmon_spark.data.transcripts import generate_transcripts
from streamevmon_spark.operators.tier_router import (
    DAY_US,
    HOUR_US,
    MIN_US,
    _TIER_US,
    cover_plan,
    default_range_us,
    realtime_range_agg,
)

# ---------------------------------------------------------------------------
# cover_plan properties
# ---------------------------------------------------------------------------

_minutes = st.integers(min_value=0, max_value=60 * 24 * 400)


@settings(max_examples=300, deadline=None)
@given(a=_minutes, b=_minutes)
def test_cover_plan_exactly_tiles_the_range(a, b):
    if a == b:
        return
    t0, t1 = min(a, b) * MIN_US, max(a, b) * MIN_US
    segs = cover_plan(t0, t1)
    # contiguous, ordered, disjoint, exactly covering
    assert segs[0][1] == t0 and segs[-1][2] == t1
    for (_, _, hi), (_, lo, _) in zip(segs, segs[1:]):
        assert hi == lo
    # every segment aligned to its tier and non-empty
    for tier, lo, hi in segs:
        u = _TIER_US[tier]
        assert lo % u == 0 and hi % u == 0 and lo < hi
    # greedy: at most one 1d run, at most two 1h/1m ramps
    tiers = [t for t, _, _ in segs]
    assert tiers.count("1d") <= 1
    assert tiers.count("1h") <= 2 and tiers.count("1m") <= 2


def test_cover_plan_multi_day_shape():
    t0 = DAY_US + 7 * HOUR_US + 23 * MIN_US
    t1 = 4 * DAY_US + 16 * HOUR_US + 41 * MIN_US
    segs = cover_plan(t0, t1)
    assert [t for t, _, _ in segs] == ["1m", "1h", "1d", "1h", "1m"]
    assert segs[2] == ("1d", 2 * DAY_US, 4 * DAY_US)


def test_cover_plan_sub_hour_range():
    segs = cover_plan(10 * MIN_US, 25 * MIN_US)
    assert segs == [("1m", 10 * MIN_US, 25 * MIN_US)]


def test_cover_plan_rejects_unaligned():
    import pytest

    with pytest.raises(ValueError):
        cover_plan(1, MIN_US)
    with pytest.raises(ValueError):
        cover_plan(MIN_US, MIN_US)


def test_default_range_is_minute_aligned_interior():
    t0, t1 = default_range_us(123_456_789, 40 * DAY_US + 7)
    assert t0 % MIN_US == 0 and t1 % MIN_US == 0
    assert 123_456_789 < t0 < t1 <= 40 * DAY_US + 7


# ---------------------------------------------------------------------------
# stitched read == direct raw-range rollup
# ---------------------------------------------------------------------------


def test_stitched_read_matches_flat_1m_merge(spark):
    df = generate_transcripts(spark, n_turns=20_000, n_convs=20)
    row = df.select(
        F.min(F.expr(
            "datediff(MICROSECOND, timestamp_ntz'1970-01-01', ts)"
        )).alias("mn"),
        F.max(F.expr(
            "datediff(MICROSECOND, timestamp_ntz'1970-01-01', ts)"
        )).alias("mx"),
    ).collect()[0]
    t0, t1 = default_range_us(row.mn, row.mx)
    stitched = realtime_range_agg(df, t0, t1)

    # flat twin: same state, but merged in ONE aggregate over the raw
    # 1m rows (no 1h/1d intermediate merges)
    from streamevmon_spark.operators import tier_router as tr

    m1 = tr._state_1m(df).where(
        (F.col("__w_us") >= t0) & (F.col("__w_us") < t1)
    )
    flat = (
        m1.groupBy("conv_id", "tool", "role")
        .agg(*tr._merge_aggs())
    )
    got = {tuple(r[:3]): r for r in stitched.collect()}
    exp = {tuple(r[:3]): r for r in flat.collect()}
    assert set(got) == set(exp) and len(got) > 0
    for k, r in got.items():
        e = exp[k]
        assert r.turn_count == e.turn_count
        assert r.lossy_count == e.lossy_count
        # the stitched percentile arrays carry the identical multiset
        exp_min = e["__lat_min"]
        assert r.lat_min == (None if exp_min is None else exp_min / 1e6)
        assert list(r) is not None


def test_range_read_from_stored_state(spark, tmp_path):
    """The production form: the router reads the cascade store's 1m
    state (raw never rescanned) and matches the in-memory read."""
    from streamevmon_spark.plans.cascade_store import (
        STATE_DIR,
        run_cascade_store,
    )

    df = generate_transcripts(spark, n_turns=15_000, n_convs=15)
    out = str(tmp_path / "store")
    run_cascade_store(spark, df, out, refresh=False)
    stored = spark.read.parquet(os.path.join(out, STATE_DIR, "*"))

    row = df.select(
        F.min(F.expr(
            "datediff(MICROSECOND, timestamp_ntz'1970-01-01', ts)"
        )).alias("mn"),
        F.max(F.expr(
            "datediff(MICROSECOND, timestamp_ntz'1970-01-01', ts)"
        )).alias("mx"),
    ).collect()[0]
    t0, t1 = default_range_us(row.mn, row.mx)

    from_store = realtime_range_agg(df, t0, t1, state_1m=stored)
    from_raw = realtime_range_agg(df, t0, t1)
    a = sorted(map(tuple, from_store.collect()))
    b = sorted(map(tuple, from_raw.collect()))
    assert a == b and len(a) > 0


def test_stored_tier_read_matches_derived(spark):
    """With all three tiers stored, every segment reads its rows
    DIRECTLY from tier state — result identical to the derive-from-1m
    form (and, transitively, to the driver's raw-scan oracle)."""
    from streamevmon_spark.operators.tier_router import _state_1m
    from streamevmon_spark.plans.cascade_store import _merge_state

    df = generate_transcripts(spark, n_turns=20_000, n_convs=20)
    row = df.select(
        F.min(F.expr(
            "datediff(MICROSECOND, timestamp_ntz'1970-01-01', ts)"
        )).alias("mn"),
        F.max(F.expr(
            "datediff(MICROSECOND, timestamp_ntz'1970-01-01', ts)"
        )).alias("mx"),
    ).collect()[0]
    t0, t1 = default_range_us(row.mn, row.mx)
    m1 = _state_1m(df).localCheckpoint()
    h1 = _merge_state(m1, HOUR_US).localCheckpoint()
    d1 = _merge_state(h1, DAY_US).localCheckpoint()
    via_tiers = realtime_range_agg(
        df, t0, t1, state_1m=m1, state_1h=h1, state_1d=d1
    ).toPandas()
    derived = realtime_range_agg(df, t0, t1).toPandas()
    key = ["conv_id", "tool", "role"]
    import pandas as pd

    pd.testing.assert_frame_equal(
        via_tiers.sort_values(key, ignore_index=True),
        derived.sort_values(key, ignore_index=True),
    )


def test_stored_tier_read_plan_has_no_reaggregation_of_1d(spark):
    """When the 1d tier is stored, interior-day rows must NOT pass
    through a merge aggregate: the plan's only Aggregates are the final
    series merge (and the derived-edge merge when 1h is absent)."""
    from streamevmon_spark.operators.tier_router import _state_1m
    from streamevmon_spark.plans.cascade_store import _merge_state

    df = generate_transcripts(spark, n_turns=5_000, n_convs=5)
    m1 = _state_1m(df).localCheckpoint()
    h1 = _merge_state(m1, HOUR_US).localCheckpoint()
    d1 = _merge_state(h1, DAY_US).localCheckpoint()
    t0, t1 = DAY_US, 3 * DAY_US  # purely interior days
    plan = realtime_range_agg(
        df, t0, t1, state_1m=m1, state_1h=h1, state_1d=d1
    )._jdf.queryExecution().optimizedPlan().toString()
    # one Aggregate only: the final per-series merge
    assert plan.count("Aggregate") == 1, plan


def test_range_sketch_quantiles_within_tdigest_error(spark):
    """The sketch range read's p50/p95/p99 must track the EXACT range
    percentiles (realtime_range_agg) within t-digest accuracy; its
    exact face must match exactly."""
    from streamevmon_spark.operators.tier_router import (
        realtime_range_sketch,
    )

    df = generate_transcripts(spark, n_turns=20_000, n_convs=20)
    row = df.select(
        F.min(F.expr(
            "datediff(MICROSECOND, timestamp_ntz'1970-01-01', ts)"
        )).alias("mn"),
        F.max(F.expr(
            "datediff(MICROSECOND, timestamp_ntz'1970-01-01', ts)"
        )).alias("mx"),
    ).collect()[0]
    t0, t1 = default_range_us(row.mn, row.mx)
    sk = realtime_range_sketch(df, t0, t1).toPandas().set_index(
        ["conv_id", "tool", "role"]
    )
    ex = realtime_range_agg(df, t0, t1).toPandas().set_index(
        ["conv_id", "tool", "role"]
    )
    assert set(sk.index) == set(ex.index) and len(sk) > 0
    joined = sk.join(ex, lsuffix="_sk")
    # exact face: count and min/max agree exactly (µs vs seconds scale)
    assert (joined["lat_count"] == joined["__lat_cnt"]).all() if \
        "__lat_cnt" in joined else True
    import numpy as np

    assert np.allclose(
        joined["lat_min_us"] / 1e6, joined["lat_min"], rtol=0, atol=0,
        equal_nan=True,
    )
    assert np.allclose(
        joined["lat_max_us"] / 1e6, joined["lat_max"], rtol=0, atol=0,
        equal_nan=True,
    )
    # quantiles: t-digest's guarantee is RANK accuracy — check the
    # empirical CDF of the exact latency multiset at each estimate
    lat = (
        add_lat(df, t0, t1)
        .toPandas()
        .groupby(["conv_id", "tool", "role"])["lat_s"]
        .apply(lambda x: np.sort(x.to_numpy()))
    )
    for q, col in ((0.5, "lat_p50"), (0.95, "lat_p95"), (0.99, "lat_p99")):
        errs = []
        for key, arr in lat.items():
            if len(arr) < 50 or key not in sk.index:
                continue
            est = sk.loc[key, col]
            rank = np.searchsorted(arr, est, side="right") / len(arr)
            errs.append(abs(rank - q))
        assert errs, "no eligible groups"
        assert np.mean(np.asarray(errs) <= 0.1) >= 0.9, (q, errs)


def add_lat(df, t0, t1):
    from streamevmon_spark.operators.rollup import (
        add_inter_turn_latency,
    )

    with_lat = add_inter_turn_latency(df)
    return with_lat.where(
        (F.expr("datediff(MICROSECOND, timestamp_ntz'1970-01-01', ts)")
         >= t0)
        & (F.expr("datediff(MICROSECOND, timestamp_ntz'1970-01-01', ts)")
           < t1)
        & F.col("lat_us").isNotNull()
    ).select(
        "conv_id", "tool", "role",
        (F.col("lat_us") / 1e6).alias("lat_s"),
    )
