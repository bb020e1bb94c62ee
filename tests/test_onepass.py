"""Single-shuffle pipeline + exact-cascade tests (operators/rollup.py
rollup_tiers_onepass / rollup_tiers_cascade_exact)."""

from __future__ import annotations

import re

from streamevmon_spark.data.transcripts import load_transcripts
from streamevmon_spark.operators.rollup import (
    rollup_tier,
    rollup_tiers_cascade_exact,
    rollup_tiers_onepass,
)


def _diff(a, b) -> int:
    b = b.select(*a.columns)
    return a.exceptAll(b).count() + b.exceptAll(a).count()


def test_onepass_equals_direct_rollup(spark, sf_dir):
    df = load_transcripts(spark, sf_dir)
    tiers = rollup_tiers_onepass(df)
    for t in ("1m", "1h", "1d"):
        assert _diff(rollup_tier(df, t), tiers[t]) == 0


def test_cascade_exact_equals_direct_rollup(spark, sf_dir):
    """1h/1d derived from the stored 1m state (sorted-array merge) must
    match the direct rollup bit-for-bit — including percentiles."""
    df = load_transcripts(spark, sf_dir)
    tiers = rollup_tiers_cascade_exact(df, persist_intermediate=False)
    for t in ("1m", "1h", "1d"):
        assert _diff(rollup_tier(df, t), tiers[t]) == 0


def test_onepass_single_raw_exchange(spark, sf_dir):
    """The tier aggregations must be partition-local: exactly one
    repartition exchange of raw rows per tier subtree, and NO
    ENSURE_REQUIREMENTS exchange between the lag window and the
    aggregates."""
    df = load_transcripts(spark, sf_dir)
    tiers = rollup_tiers_onepass(df)
    plan = tiers["1h"]._jdf.queryExecution().executedPlan().toString()
    # the explicit layout repartition is present...
    assert "REPARTITION_BY_COL" in plan
    # ...and the only ENSURE_REQUIREMENTS exchanges are for the tiny
    # boundary table (partitioned by the 3 series columns) and the
    # transcripts derivation's conv_id window — never for the tier
    # aggregation keys (which would list 4-5 partitioning expressions).
    for m in re.finditer(
        r"Exchange hashpartitioning\(([^)]*)\), ENSURE_REQUIREMENTS", plan
    ):
        n_keys = len(re.findall(r"#\d+", m.group(1))) - 1  # minus numPartitions
        assert n_keys <= 3, f"unexpected wide exchange: {m.group(1)[:100]}"
