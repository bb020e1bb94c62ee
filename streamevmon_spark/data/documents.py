"""Seeded synthetic documents generator for dedup-at-scale benchmarks.

Pure function of its arguments — every token derives from the row id via
xxhash64 arithmetic (JVM-side, whole-stage codegen, no Python, no driver
data). Documents come in families of ``family_size``: the family head is
original text; within a family, member m keeps the head's token sequence
except position m (an exact-Jaccard near-duplicate), so MinHash/LSH and
exact dedup have a known planted structure at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def generate_documents(
    spark: SparkSession,
    n_docs: int = 100_000,
    vocab: int = 50_000,
    tokens_per_doc: int = 60,
    family_size: int = 5,
    seed: int = 7,
    partitions: int | None = None,
) -> DataFrame:
    """(doc_id, text): near-dup families of ``family_size`` docs."""
    from streamevmon_spark.session import ensure_workers_can_import

    ensure_workers_can_import(spark)
    df = spark.range(
        0,
        n_docs,
        numPartitions=partitions
        or spark.sparkContext.defaultParallelism,
    )
    base = (F.col("id") / family_size).cast("long") * family_size
    member = F.col("id") % family_size
    # token j of the FAMILY HEAD; member m replaces position m with a
    # member-specific token (members > tokens_per_doc are exact dups)
    text = F.expr(
        f"concat_ws(' ', transform(sequence(0, {tokens_per_doc - 1}),"
        f" j -> concat('w', CAST(abs(xxhash64(__base, j, {seed}))"
        f" % {vocab} AS STRING))))"
    )
    df = df.withColumn("__base", base).withColumn("__m", member)
    df = df.withColumn("__head_text", text)
    perturbed = F.expr(
        f"concat_ws(' ', transform(zip_with(split(__head_text, ' '),"
        f" sequence(1, {tokens_per_doc}), (t, j) ->"
        f" CASE WHEN j - 1 = __m AND __m > 0"
        f" THEN concat('p', CAST(abs(xxhash64(id, {seed})) % {vocab}"
        f" AS STRING)) ELSE t END), x -> x))"
    )
    return df.select(
        F.col("id").alias("doc_id"), perturbed.alias("text")
    )
