"""Text-analysis operators over the documents table — the text half of a
large-scale training-data pipeline: token counting, quality scoring,
language ID, document fingerprinting.

All operators are pure built-in-function DataFrame pipelines (no UDFs,
whole-stage codegen end-to-end) and each has a DuckDB oracle
(oracles.py) evaluating the same arithmetic — counts and ratios are
integer-derived so doubles match bit-exactly.

Input contract: documents(doc_id, text, lang, source, n_chars).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# language marker stopwords for the n-gram/stopword language heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "de": ("der", "die", "und", "das", "nicht", "ist"),
    "fr": ("le", "la", "et", "les", "des", "est"),
}

STOPWORDS = LANG_MARKERS["en"]

# BPE-ish token regex: alpha runs, digit runs, or single other non-space
TOKEN_REGEX = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def _tokens(col: str = "text"):
    return F.split(F.col(col), " ")


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count + char count."""
    return docs.select(
        "doc_id",
        F.size(_tokens()).cast("long").alias("ws_tokens"),
        F.size(F.expr(f"regexp_extract_all(text, '{TOKEN_REGEX}', 0)"))
        .cast("long")
        .alias("regex_tokens"),
        F.length("text").cast("long").alias("chars"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Heuristic quality features: length, mean token length, stopword
    ratio, punctuation ratio, distinct-token ratio."""
    toks = _tokens()
    n_tok = F.size(toks).cast("long")
    n_chars = F.length("text").cast("long")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.array_intersect(toks, stop_arr)) \
        .cast("long")  # distinct stopwords present
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))
                       ).cast("long")
    n_punct = (
        n_chars - F.length(F.regexp_replace("text", "[^a-zA-Z0-9 ]", ""))
    ).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_chars.alias("n_chars_m"),
        (
            (n_chars - (n_tok - 1)).cast("double") / n_tok.cast("double")
        ).alias("mean_token_len"),
        (stop_hits.cast("double") / n_tok.cast("double")).alias(
            "stopword_ratio"
        ),
        (n_punct.cast("double") / n_chars.cast("double")).alias(
            "punct_ratio"
        ),
        (n_distinct.cast("double") / n_tok.cast("double")).alias(
            "distinct_ratio"
        ),
        n_stop.alias("distinct_stopwords"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-stopword language heuristic: score each language by the
    number of its marker words present (distinct), predict the argmax
    (ties broken by the fixed language order en, de, fr)."""
    toks = F.array_distinct(_tokens())
    scores = {
        lang: F.size(
            F.array_intersect(toks, F.array(*[F.lit(m) for m in markers]))
        ).cast("long")
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = (
        F.when(scores["en"] == best, F.lit("en"))
        .when(scores["de"] == best, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    return docs.select(
        "doc_id",
        scores["en"].alias("score_en"),
        scores["de"].alias("score_de"),
        scores["fr"].alias("score_fr"),
        pred.alias("lang_pred"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Document fingerprints: (a) canonical md5 of whitespace-normalized
    lowercase text; (b) winnowing-style minimum 3-gram shingle hash
    (functions/porthash.py hex32 — identical in the DuckDB oracle)."""
    from streamevmon_spark.functions.porthash import hex32_sql

    canon = "lower(text)"
    # split bound to a lambda variable => evaluated once per row (see
    # operators/dedup._shingles)
    shingle = (
        "transform(array(split(text, ' ')), ts ->"
        " transform(sequence(0, greatest(size(ts) - 3, 0)),"
        " j -> concat_ws(' ', slice(ts, j + 1, 3))))[0]"
    )
    min_shingle_hash = (
        f"array_min(transform({shingle}, s -> {hex32_sql('s')}))"
    )
    return docs.select(
        "doc_id",
        F.expr(f"md5({canon})").alias("canonical_md5"),
        F.expr(min_shingle_hash).cast("long").alias("min_shingle_hash"),
    )


def unigram_logprob(docs: DataFrame) -> DataFrame:
    """Perplexity-proxy quality score (the CCNet/Wikipedia-LM filter
    idea with the corpus itself as the language model): per document,
    the mean negative log-probability of its tokens under the corpus
    unigram distribution — high values = tokens rare in the corpus =
    unusual/noisy text.

    Columns: doc_id, dl (token count), nll (mean -ln p(token), nats).

    Spark-first: one explode -> (doc, term) counts, a corpus term-count
    aggregate joined back on term (hash equi-join, AQE-sized), and a
    1-row total broadcast. Per-doc summation folds per-term
    contributions in ascending term order seeded with 0.0 (the
    docs_oracles fold discipline) so the double sum is deterministic;
    the JVM ln intrinsic may differ from libm by 1 ULP
    (tests/test_retrieval.py pins the bound), so the driver gate
    compares nll quantized to 1e-6 (retrieval.quantize_micro) against
    docs_oracles.unigram_logprob_oracle.
    """
    pairs = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), " ")).alias(
                "term"
            ),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    corpus = pairs.groupBy("term").agg(
        F.sum("tf").cast("long").alias("ctf")
    )
    total = corpus.agg(
        F.sum("ctf").cast("long").alias("t_total")
    )
    contrib = (
        pairs.join(corpus, "term")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "term",
            "tf",
            F.expr(
                "CAST(tf AS DOUBLE) * (-ln(CAST(ctf AS DOUBLE)"
                " / CAST(t_total AS DOUBLE)))"
            ).alias("contrib"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("dl"),
            F.array_sort(
                F.collect_list(F.struct("term", "contrib"))
            ).alias("__arr"),
        )
        .select(
            "doc_id",
            "dl",
            (
                F.expr(
                    "aggregate(__arr, CAST(0.0 AS DOUBLE),"
                    " (acc, s) -> acc + s.contrib)"
                )
                / F.col("dl").cast("double")
            ).alias("nll"),
        )
    )
