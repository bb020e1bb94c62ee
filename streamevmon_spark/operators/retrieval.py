"""Lexical retrieval over the documents table: inverted-index postings
and BM25 scoring — the query-side primitive a training-data pipeline
uses for targeted corpus search (contamination probes, topic filters,
eval-set retrieval).

Spark-first shape: tokens are exploded ONCE and filtered to the query
terms map-side (predicate on a literal array, pushed below the
shuffle), so the per-term postings shuffle carries only matching
occurrences — at 100 TB the cost is proportional to the query's
posting lists, not the corpus. Corpus statistics (N, avgdl) are a
1-row aggregate broadcast into the scoring join; per-term document
frequencies are a small groupBy broadcast. No UDFs anywhere.

Cross-engine determinism (docs_oracles.bm25_oracle):
- tf / df / dl are integers; avgdl is one double division of two
  integer sums (exact);
- the per-term BM25 contribution uses ``ln`` — a transcendental whose
  JVM intrinsic (HotSpot's vectorized dlog) can differ from glibc/
  DuckDB libm by 1 ULP on some operands (observed: ln(1.6); pinned to
  <= 1 ULP across the BM25 operand family by tests/test_retrieval.py);
- the per-doc score folds per-term contributions in ascending term
  order via an explicit left fold seeded with 0.0 (the dot-product
  discipline of docs_oracles), so the only cross-engine divergence is
  the ~1e-16-relative ln gap;
- the driver gate therefore compares ``quantize_micro(score)`` — an
  exact integer floor to 1e-6 resolution, identical in both engines
  because the pre-quantization values agree to ~1e-13 absolute while
  the quantum is 5e-7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default BM25 parameters (Robertson/Lucene)
K1 = 1.2
B = 0.75

#: quantization scale for gate-facing transcendental-derived doubles
MICRO = 1_000_000


def quantize_micro(col):
    """Round a nonnegative double to 1e-6 by exact integer floor:
    floor(x * 1e6 + 0.5) / 1e6. Both factors are exact given the same
    integer, so two engines whose inputs agree to ~1e-7 absolute (the
    JVM-vs-libm ln gap is ~1e-13 after folding) produce bit-identical
    results. DuckDB mirror: CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)
    / CAST(1000000.0 AS DOUBLE)."""
    return F.floor(
        col * F.lit(float(MICRO)) + F.lit(0.5)
    ).cast("long") / F.lit(float(MICRO))


def quantize_micro_sql(expr: str) -> str:
    """The DuckDB twin of :func:`quantize_micro` over a SQL expr."""
    return (
        f"CAST(floor(({expr}) * 1000000.0 + 0.5) AS BIGINT)"
        f" / CAST(1000000.0 AS DOUBLE)"
    )


def _toks(col: str = "text"):
    return F.split(F.lower(F.col(col)), " ")


def build_postings(docs: DataFrame, terms: list[str]) -> DataFrame:
    """Posting list rows (term, doc_id, tf) for the query ``terms``,
    tf = occurrence count of the term among the doc's lowercase
    whitespace tokens. Map-side filtered before the shuffle."""
    lit_terms = F.array(*[F.lit(t) for t in terms])
    tok = F.explode(_toks()).alias("term")
    return (
        docs.select("doc_id", tok)
        .where(F.array_contains(lit_terms, F.col("term")))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """BM25 score of every document matching >= 1 query term.

    Columns: doc_id, n_terms (matched distinct terms), dl (doc token
    count), score (Lucene BM25: sum over matched terms of
    ln(1 + (N - df + 0.5)/(df + 0.5)) * tf / (tf + k1*(1 - b + b*dl/avgdl))
    folded in ascending term order).
    """
    postings = build_postings(docs, terms)
    dl = docs.select(
        "doc_id", F.size(_toks()).cast("long").alias("dl")
    )
    stats = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(_toks()).cast("long")).cast("long").alias(
            "tok_sum"
        ),
    ).select(
        "n_docs",
        (
            F.col("tok_sum").cast("double")
            / F.col("n_docs").cast("double")
        ).alias("avgdl"),
    )
    df_t = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    # df_t (<= #terms rows) and stats (1 row) broadcast; postings-dl is
    # a doc_id equi-join AQE plans by size (dl is per-doc — never force
    # a broadcast of a corpus-sized relation)
    contrib = (
        postings.join(F.broadcast(df_t), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            "dl",
            F.expr(
                f"ln(1.0D + (CAST(n_docs - df AS DOUBLE) + 0.5D)"
                f" / (CAST(df AS DOUBLE) + 0.5D))"
                f" * (CAST(tf AS DOUBLE)"
                f" / (CAST(tf AS DOUBLE) + {k1}D * (1.0D - {b}D"
                f" + {b}D * (CAST(dl AS DOUBLE) / avgdl))))"
            ).alias("contrib"),
        )
    )
    return (
        contrib.groupBy("doc_id", "dl")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.array_sort(
                F.collect_list(F.struct("term", "contrib"))
            ).alias("__arr"),
        )
        .select(
            "doc_id",
            "n_terms",
            "dl",
            F.expr(
                "aggregate(__arr, CAST(0.0 AS DOUBLE),"
                " (acc, s) -> acc + s.contrib)"
            ).alias("score"),
        )
    )
