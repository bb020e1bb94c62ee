"""Retention-policy tests (operators/retention.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamevmon_spark.data.transcripts import load_transcripts
from streamevmon_spark.operators.retention import (
    DEFAULT_HORIZONS,
    apply_retention,
    expired_day_partitions,
)
from streamevmon_spark.operators.rollup import rollup_tier


def test_retention_partitions_data_exactly(spark, sf_dir):
    """Survivors + expired rows partition the rollup with no overlap."""
    rolled = rollup_tier(load_transcripts(spark, sf_dir), "1m")
    now, horizons = "2024-01-02 00:00:00", {"1m": 43200}
    kept = apply_retention(rolled, "1m", now, horizons)
    expired = expired_day_partitions(rolled, "1m", now, horizons)
    n_expired = expired.agg(F.sum("rows_dropped")).first()[0] or 0
    assert kept.count() + n_expired == rolled.count()
    cutoff = "2024-01-01 12:00:00"
    assert kept.where(F.col("window_start") < cutoff).count() == 0


def test_none_horizon_keeps_everything(spark, sf_dir):
    rolled = rollup_tier(load_transcripts(spark, sf_dir), "1d")
    assert DEFAULT_HORIZONS["1d"] is None
    kept = apply_retention(rolled, "1d", "2030-01-01 00:00:00")
    assert kept.count() == rolled.count()
    expired = expired_day_partitions(rolled, "1d", "2030-01-01 00:00:00")
    assert expired.count() == 0


def test_retention_predicate_pushdown(spark, sf_dir):
    """The retention filter must reach the scan as a pushed predicate
    when applied over a stored rollup table (partition-prune analogue)."""
    import tempfile

    rolled = rollup_tier(load_transcripts(spark, sf_dir), "1h")
    with tempfile.TemporaryDirectory() as d:
        rolled.write.mode("overwrite").parquet(d)
        stored = spark.read.parquet(d)
        kept = apply_retention(stored, "1h", "2024-01-03 00:00:00",
                               {"1h": 86400})
        plan = kept._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [IsNotNull(window_start)" in plan or \
            "GreaterThanOrEqual(window_start" in plan
