"""Physical-plan assertions: the scale guarantees the docstrings claim
(one raw-data exchange, map-side boundary aggregation, no cartesian
joins) must be visible in the executed plans, so a regression that
re-introduces a second raw shuffle or an all-pairs join fails CI, not a
100 TB run."""

from __future__ import annotations

import re

import pytest


def _executed(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def raw(spark):
    from streamevmon_spark.data.transcripts import generate_transcripts

    df = generate_transcripts(
        spark, n_turns=100_000, n_convs=50, partitions=8
    ).persist()
    df.count()
    return df


def test_layout_pipeline_single_raw_exchange(spark, raw):
    """prepare_with_latency: exactly ONE explicit repartition of working
    rows; the boundary table partial-aggregates BEFORE its exchange."""
    from streamevmon_spark.operators.rollup import prepare_with_latency

    plan = _executed(prepare_with_latency(raw, 8))
    # the one explicit layout exchange (the generator's own round-robin
    # exchanges live INSIDE the InMemoryRelation cache plan, printed but
    # not re-executed — exclude them by cutting at the cache boundary)
    top = plan.split("InMemoryRelation", 1)[0]
    assert len(re.findall(r"REPARTITION_BY_NUM", top)) == 1
    # bounds side: partial max must appear below its exchange
    assert "partial_max" in plan


def test_cascade_tiers_no_extra_exchange_over_layout(spark, raw):
    """1h/1d derived from 1m state must not re-exchange: the groupBy
    keys extend the layout partitioning, so each merge-up stage adds
    hash aggregates but no hashpartitioning exchange beyond the single
    layout repartition and the (tiny) bounds-side exchanges."""
    from streamevmon_spark.operators.rollup import (
        rollup_tiers_cascade_exact,
    )

    tiers = rollup_tiers_cascade_exact(raw, 8, persist_intermediate=False)
    plan = _executed(tiers["1d"])
    top = plan.split("InMemoryRelation", 1)[0]
    # one layout exchange for the working set...
    assert len(re.findall(r"REPARTITION_BY_NUM", top)) == 1
    # ...and the only ENSURE_REQUIREMENTS exchanges are the boundary
    # table's (which carry aggregated, not raw, rows): every such
    # exchange must sit above a partial aggregate or a tiny window
    assert "CartesianProduct" not in plan


def test_dedup_and_similarity_plans_no_cartesian(spark):
    """The banded/LSH candidate generators must never plan a cartesian
    or broadcast-nested-loop join."""
    from streamevmon_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for df in (
        simhash_pairs(docs, max_hamming=6),
        minhash_lsh_pairs(docs, threshold=0.2),
        ngram_jaccard_pairs(docs, threshold=0.2, max_doc_freq=50),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_rollup_filter_pushdown_reaches_scan(spark, sf_dir):
    """A typed+lossy filtered scan must push its predicates into the
    parquet source (PushedFilters), not evaluate them post-scan only."""
    from streamevmon_spark.sources import measurements as M

    ev = M.drop_lossy(
        M.typed_stream(M.load_events(spark, sf_dir), "click")
    )
    plan = ev._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "IsNotNull(value)" in plan
    assert "EqualTo(event_type,click)" in plan


def test_sampling_plans_are_filter_only(spark):
    """sample_hash / sample_stratified must compile to a scan + filter —
    no Exchange anywhere (the reproducibility contract is 'a pure
    predicate over the scan', so a shuffle appearing here is a plan
    regression, not a tuning issue)."""
    from streamevmon_spark.operators.sampling import (
        sample_hash,
        sample_stratified,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for df in (
        sample_hash(docs, 0.2),
        sample_stratified(docs, {"en": 0.5}, 0.1),
    ):
        plan = _executed(df)
        assert "Exchange" not in plan, plan


def test_sample_topk_no_single_stratum_sort(spark):
    """Exact top-k per stratum: phase 1 must partition by (stratum,
    bucket) — i.e. the first window sort key set includes the salt —
    so no task ever sorts a whole stratum."""
    from streamevmon_spark.operators.sampling import (
        sample_topk_per_stratum,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _executed(sample_topk_per_stratum(docs, 5, n_buckets=8))
    # two window stages: the salted local one and the survivors-only
    # global one
    assert plan.count("Window") >= 2
    assert "pmod" in plan  # the salt is part of the first partitioning


def test_dedup_clusters_no_cartesian(spark):
    from streamevmon_spark.operators.dedup import dedup_clusters

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _executed(dedup_clusters(docs, threshold=0.2))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_regress_plans_no_nested_loop(spark, raw):
    """The regression-analytics joins (lag correlation, ACF,
    seasonal-naive, Theil-Sen) must resolve their equi-keys — a
    regression to BroadcastNestedLoopJoin/CartesianProduct would be
    quadratic in the bucket relation at scale. trend_fit must stay a
    pure single-exchange aggregation (no join at all)."""
    from streamevmon_spark.operators.regress import (
        activity_acf,
        seasonal_naive,
        theilsen_daily,
        tool_lag_corr,
        trend_fit,
    )

    for fn in (
        lambda: tool_lag_corr(raw, "1h", 1),
        lambda: activity_acf(raw, "1h", 3),
        lambda: seasonal_naive(raw, "1h"),
        lambda: theilsen_daily(raw, "1h"),
    ):
        plan = _executed(fn())
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    plan = _executed(trend_fit(raw, "1h"))
    assert "Join" not in plan
    top = plan.split("InMemoryRelation", 1)[0]
    assert len(re.findall(r"Exchange hashpartitioning", top)) == 1
