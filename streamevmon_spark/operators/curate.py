"""Corpus curation: the composed training-data pipeline.

One declarative DataFrame pipeline chaining the training-data operators
the way a 100 TB corpus build would: quality gate → exact dedup (keep
the lowest doc_id of each duplicate text) → language filter →
broadcast-join the embedding vector. Each stage is an operator that is
independently oracle-checked (textstats / dedup / similarity); this
module asserts the COMPOSITION stays declarative (one scan of documents,
predicate pushdown, broadcast for the doc→embedding attach at test
scale; at corpus scale the embedding join becomes a shuffle join on the
shared doc_id ordering / bucketed tables).

The whole pipeline is pure built-in expressions + joins, so it carries a
single DuckDB oracle (oracles via __spark_entry__), making the composed
result — not just the pieces — part of the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from streamevmon_spark.operators.textstats import quality_scores, lang_id


DEFAULT_MIN_TOKENS = 20
DEFAULT_MAX_STOPWORD_RATIO = 0.6
DEFAULT_MIN_DISTINCT_RATIO = 0.3


def curate_corpus(
    docs: DataFrame,
    embeddings: DataFrame | None = None,
    min_tokens: int = DEFAULT_MIN_TOKENS,
    max_stopword_ratio: float = DEFAULT_MAX_STOPWORD_RATIO,
    min_distinct_ratio: float = DEFAULT_MIN_DISTINCT_RATIO,
    lang: str | None = "en",
) -> DataFrame:
    """Curated corpus: one row per surviving document with its quality
    features, predicted language, and (optionally) embedding."""
    q = quality_scores(docs)
    lid = lang_id(docs).select("doc_id", "lang_pred")
    # exact dedup: keep the smallest doc_id per identical text
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    kept = (
        docs.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .select("doc_id", "text")
    )
    out = (
        kept.join(q, "doc_id")
        .join(lid, "doc_id")
        .where(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("stopword_ratio") <= max_stopword_ratio)
            & (F.col("distinct_ratio") >= min_distinct_ratio)
        )
    )
    if lang is not None:
        out = out.where(F.col("lang_pred") == lang)
    out = out.select(
        "doc_id", "text", "n_tokens", "stopword_ratio", "distinct_ratio",
        "lang_pred",
    )
    if embeddings is not None:
        out = out.join(
            embeddings.select(
                F.col("vec_id").alias("doc_id"), "embedding"
            ),
            "doc_id",
            "left",
        )
    return out
