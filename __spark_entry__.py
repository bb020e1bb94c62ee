"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship 1-minute rollup on sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator with its
DuckDB oracle. Operators live in ``streamevmon_spark/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from streamevmon_spark import oracles  # noqa: E402
from streamevmon_spark.data.transcripts import load_transcripts  # noqa: E402
from streamevmon_spark.operators import rollup as R  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: per-(conv_id, tool, role) 1-minute rollup with turn
    counts, exact inter-turn latency percentiles and activity rates."""
    df = load_transcripts(spark, "/root/testdata/sf0.001")
    return R.rollup_tier(df, "1m")


def _q_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_transcripts(spark, sf_dir)


def _q_rollup(tier: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        return R.rollup_tier(load_transcripts(spark, sf_dir), tier)

    return q


def _q_inter_turn_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.add_inter_turn_latency(load_transcripts(spark, sf_dir)).select(
        "conv_id", "tool", "role", "turn_idx", "ts", "lat_s"
    )


def _q_gapfill(method: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from streamevmon_spark.operators.gapfill import gap_fill

        return gap_fill(
            load_transcripts(spark, sf_dir), "1h", method=method,
            purge_gap_s=7200,
        )

    return q


def _q_chunk_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed chunk blobs (Gorilla + delta-of-delta) — not SQL-
    expressible; driver records rows-only. Round-trip exactness is
    asserted in tests/test_chunks.py."""
    from streamevmon_spark.operators.chunks import chunk_table

    return chunk_table(
        load_transcripts(spark, sf_dir), grid_tier="1h", chunk_tier="1d"
    )


def _q_sketch_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-digest latency sketches per 1h window — rows-only check;
    quantile accuracy asserted in tests/test_chunks.py."""
    from streamevmon_spark.operators.sketch_rollup import sketch_tier

    return sketch_tier(load_transcripts(spark, sf_dir), "1h")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "transcripts": _q_transcripts,
        "rollup_1m": _q_rollup("1m"),
        "rollup_1h": _q_rollup("1h"),
        "rollup_1d": _q_rollup("1d"),
        "inter_turn_latency": _q_inter_turn_latency,
        "gapfill_locf_1h": _q_gapfill("locf"),
        "gapfill_interp_1h": _q_gapfill("interp"),
        "chunk_table": _q_chunk_table,
        "sketch_1h": _q_sketch_1h,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "transcripts": oracles.transcripts_oracle(),
        "rollup_1m": oracles.rollup_oracle("1m"),
        "rollup_1h": oracles.rollup_oracle("1h"),
        "rollup_1d": oracles.rollup_oracle("1d"),
        "inter_turn_latency": oracles.inter_turn_latency_oracle(),
        "gapfill_locf_1h": oracles.gapfill_oracle("1h", "locf", 7200),
        "gapfill_interp_1h": oracles.gapfill_oracle("1h", "interp", 7200),
        # chunk_table / sketch_1h: binary sketch/codec blobs — rows-only
    }
