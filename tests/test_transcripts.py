"""Transcripts derivation + per-turn invariants.

Mirrors the reference's golden-fixture parse tests
(reference: src/test/scala/.../measurements/MeasurementCreateTest.scala)
and the stable-ordering requirement from the north rule."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamevmon_spark.data.transcripts import generate_transcripts, load_transcripts
from streamevmon_spark.oracles import transcripts_oracle
from tests.oracle_utils import assert_matches_oracle


def test_schema(spark, sf_dir):
    df = load_transcripts(spark, sf_dir)
    assert [f.name for f in df.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts", "value",
    ]
    assert dict((f.name, f.dataType.simpleString()) for f in df.schema.fields) == {
        "conv_id": "string", "turn_idx": "int", "role": "string",
        "text": "string", "tool": "string", "ts": "timestamp_ntz",
        "value": "double",
    }


def test_matches_duckdb_oracle(spark, sf_dir):
    df = load_transcripts(spark, sf_dir)
    assert_matches_oracle(df, transcripts_oracle(), sf_dir)


def test_turn_idx_dense_per_conv(spark, sf_dir):
    df = load_transcripts(spark, sf_dir)
    bad = (
        df.groupBy("conv_id")
        .agg(F.count("*").alias("n"), F.max("turn_idx").alias("mx"),
             F.min("turn_idx").alias("mn"),
             F.countDistinct("turn_idx").alias("d"))
        .where((F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1)
               | (F.col("d") != F.col("n")))
        .count()
    )
    assert bad == 0


def test_per_turn_text_equality_under_shuffled_input(spark, sf_dir):
    """Outputs must be invariant under input row order given stable
    (conv_id, turn_idx) sorting — FIXTURES.md §6."""
    a = load_transcripts(spark, sf_dir)
    shuffled = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .repartition(7, F.xxhash64("event_id"))
    )
    shuffled.createOrReplaceTempView("__sem_events_shuffled")
    from streamevmon_spark.data.transcripts import TRANSCRIPTS_SQL

    b = spark.sql(TRANSCRIPTS_SQL.format(events="__sem_events_shuffled"))
    pa = a.orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx", "text").toPandas()
    pb = b.orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx", "text").toPandas()
    assert pa.equals(pb)


def test_generator_deterministic_and_skewed(spark):
    g1 = generate_transcripts(spark, n_turns=5000, n_convs=20, seed=42)
    g2 = generate_transcripts(spark, n_turns=5000, n_convs=20, seed=42)
    p1 = g1.orderBy("conv_id", "turn_idx").toPandas()
    p2 = g2.orderBy("conv_id", "turn_idx").toPandas()
    assert p1.equals(p2)
    counts = (
        g1.groupBy("conv_id").count().orderBy(F.desc("count")).toPandas()
    )
    top2 = counts["count"].iloc[:2].sum()
    assert top2 / counts["count"].sum() > 0.4  # hot-key skew present
    assert p1["value"].isna().sum() > 0  # lossy rows present
