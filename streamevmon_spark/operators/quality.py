"""Corpus-quality filtering operators over the documents table — the
rule-based quality half of a large-scale training-data pipeline,
mirroring the published Gopher/MassiveText rules (Rae et al. 2021,
"Scaling Language Models", Appendix A) and C4-style span dedup
(Raffel et al. 2020), re-expressed as pure built-in DataFrame algebra.

Three operators, each with a DuckDB oracle (docs_oracles.py):

- ``gopher_flags``      per-doc boolean rule flags + composite keep:
  word-count bounds, mean-word-length bounds, symbol-to-word ratio,
  alphabetic-word ratio, minimum distinct stopwords. Map-only (no
  shuffle); every ratio is integer-derived -> bit-exact cross-engine.
- ``gram_repetition``   per-doc n-gram repetition features (top-2-gram
  share, duplicate-3-gram fraction) — the MassiveText repetition
  rules. explode -> two keyed aggregations; the shuffle carries one row
  per distinct (doc, gram), collapsed map-side exactly like the minhash
  shingle path (operators/dedup.py).
- ``block_dedup_stats`` corpus-level duplicate-block statistics:
  consecutive ``block_tokens``-token blocks are hashed and counted
  across the whole corpus (the C4 "three-sentence span" analogue), then
  re-joined to score each doc's duplicated-block fraction. Shuffles are
  keyed by md5-derived block hashes -> uniform dispersion, no salting
  needed; AQE handles residual skew from a pathological corpus-wide
  repeated block.

Scale notes (100 TB): ``gopher_flags`` is embarrassingly parallel
(projection only — WholeStageCodegen end-to-end). The gram/block
operators explode to O(tokens) rows but aggregate partially map-side
before the exchange (each doc's rows are generated inside one
partition), so shuffle volume is bounded by distinct grams/blocks per
doc, not corpus token count. No driver collect anywhere.

Input contract: documents(doc_id, text, lang, source, n_chars);
tokenization is single-space split, identical to operators/textstats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Gopher-style rule defaults, tuned so the synthetic corpus (10-99
# words/doc, ~1.5 distinct stopwords/doc) splits nontrivially; the
# published MassiveText values (50..100k words, mean len 3..10, etc.)
# are reachable by passing them explicitly.
GOPHER_DEFAULTS = dict(
    min_words=20,
    max_words=90,
    min_mean_word_len=3.0,
    max_mean_word_len=10.0,
    max_symbol_ratio=0.1,
    min_alpha_word_ratio=0.8,
    min_stopwords=2,
)

# the stopword set for the "contains at least N stopwords" rule — the
# same markers the lang-id heuristic uses (textstats.STOPWORDS is the
# en set)
from streamevmon_spark.operators.textstats import STOPWORDS  # noqa: E402


def _bound_tokens(body: str) -> str:
    """Bind the split-token array to a lambda variable so split() is
    evaluated once per row (see operators/dedup._shingles_sql)."""
    return f"transform(array(split(text, ' ')), ts -> {body})[0]"


def gopher_flags(
    docs: DataFrame,
    min_words: int = GOPHER_DEFAULTS["min_words"],
    max_words: int = GOPHER_DEFAULTS["max_words"],
    min_mean_word_len: float = GOPHER_DEFAULTS["min_mean_word_len"],
    max_mean_word_len: float = GOPHER_DEFAULTS["max_mean_word_len"],
    max_symbol_ratio: float = GOPHER_DEFAULTS["max_symbol_ratio"],
    min_alpha_word_ratio: float = GOPHER_DEFAULTS["min_alpha_word_ratio"],
    min_stopwords: int = GOPHER_DEFAULTS["min_stopwords"],
) -> DataFrame:
    """Gopher rule flags per document + the composite ``keep``.

    Rules (MassiveText quality filtering, Rae et al. 2021 App. A1.1):
    word count in [min,max]; mean word length in [min,max]; symbol-to-
    word ratio ('#' chars and '...' occurrences) <= max; fraction of
    words containing an alphabetic character >= min; at least
    ``min_stopwords`` distinct stopwords present. Line-shape rules
    (bullet/ellipsis line fractions) are N/A for the single-line
    synthetic corpus and intentionally omitted.

    All ratios are one double division of integer-valued counts, so the
    DuckDB oracle matches bit-exactly.
    """
    n_words = F.size(F.split(F.col("text"), " ")).cast("long")
    n_chars = F.length("text").cast("long")
    # mean word length over single-space-joined words
    mean_len = (n_chars - (n_words - 1)).cast("double") / n_words.cast(
        "double"
    )
    n_hash = n_chars - F.length(F.regexp_replace("text", "#", ""))
    n_ellipsis = (
        n_chars - F.length(F.regexp_replace("text", r"\.\.\.", ""))
    ) / F.lit(3)
    symbol_ratio = (n_hash + n_ellipsis).cast("double") / n_words.cast(
        "double"
    )
    alpha_words = F.size(
        F.expr(
            _bound_tokens("filter(ts, t -> t rlike '[a-zA-Z]')")
        )
    ).cast("long")
    alpha_ratio = alpha_words.cast("double") / n_words.cast("double")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(
        F.array_intersect(F.split(F.col("text"), " "), stop_arr)
    ).cast("long")

    f_words = (n_words >= min_words) & (n_words <= max_words)
    f_mean = (mean_len >= min_mean_word_len) & (
        mean_len <= max_mean_word_len
    )
    f_symbol = symbol_ratio <= max_symbol_ratio
    f_alpha = alpha_ratio >= min_alpha_word_ratio
    f_stop = n_stop >= min_stopwords
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_ratio.alias("alpha_word_ratio"),
        n_stop.alias("distinct_stopwords"),
        f_words.alias("flag_word_count"),
        f_mean.alias("flag_mean_word_len"),
        f_symbol.alias("flag_symbol_ratio"),
        f_alpha.alias("flag_alpha_words"),
        f_stop.alias("flag_stopwords"),
        (f_words & f_mean & f_symbol & f_alpha & f_stop).alias("keep"),
    )


def gram_repetition(docs: DataFrame) -> DataFrame:
    """MassiveText repetition features per doc: the fraction of 2-gram
    occurrences taken by the single most frequent 2-gram, and the
    fraction of 3-gram occurrences that are repeats of an earlier one
    (1 - distinct/total, computed in integers then divided once).

    Single-pass shape: the text is scanned and split ONCE — both gram
    sizes explode from one bound token array as (n, gram) rows — then
    three keyed aggregations, each collapsing map-side:
    (doc, n, gram) counts -> (doc, n) totals -> one wide row per doc.
    No join; shuffle volume is one row per distinct (doc, n, gram)."""
    both = _bound_tokens(
        "concat("
        "transform(sequence(0, greatest(size(ts) - 2, 0)),"
        " j -> struct(2 as n, concat_ws(' ', slice(ts, j + 1, 2)) as gram)),"
        "transform(sequence(0, greatest(size(ts) - 3, 0)),"
        " j -> struct(3 as n, concat_ws(' ', slice(ts, j + 1, 3)) as gram))"
        ")"
    )
    grams = docs.select(
        "doc_id", F.explode(F.expr(both)).alias("t")
    ).select("doc_id", "t.n", "t.gram")
    per_gram = grams.groupBy("doc_id", "n", "gram").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    per_n = per_gram.groupBy("doc_id", "n").agg(
        F.sum("cnt").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.max("cnt").cast("long").alias("top"),
    )

    def pick(col: str, n: int):
        return F.max(F.when(F.col("n") == n, F.col(col)))

    return per_n.groupBy("doc_id").agg(
        pick("total", 2).alias("total_2gram"),
        pick("top", 2).alias("top_2gram_count"),
        pick("total", 3).alias("total_3gram"),
        pick("n_distinct", 3).alias("distinct_3gram"),
        (
            pick("top", 2).cast("double") / pick("total", 2).cast("double")
        ).alias("top_2gram_share"),
        (
            (pick("total", 3) - pick("n_distinct", 3)).cast("double")
            / pick("total", 3).cast("double")
        ).alias("dup_3gram_frac"),
    )


def _blocks_sql(block_tokens: int) -> str:
    """SQL for the consecutive ``block_tokens``-token block array (last
    block truncated)."""
    return _bound_tokens(
        f"transform(sequence(0, (size(ts) - 1) div {block_tokens}),"
        f" b -> concat_ws(' ', slice(ts, b * {block_tokens} + 1,"
        f" {block_tokens})))"
    )


def block_dedup_stats(
    docs: DataFrame, block_tokens: int = 16
) -> DataFrame:
    """Corpus-level duplicate-block statistics per document (the C4
    span-dedup analogue at block granularity): every consecutive
    ``block_tokens``-token block is md5-hashed; a block occurrence is a
    duplicate when its hash occurs more than once in the WHOLE corpus
    (including repeats within one doc). Returns per doc: block count,
    duplicated-block count, duplicated fraction.

    Shape: explode blocks -> corpus-wide count per block hash (hash-
    keyed shuffle, uniform dispersion) -> broadcast-free equi-join back
    on the same key -> per-doc aggregation. At 100 TB this is two
    shuffles of one row per block occurrence — the same budget as the
    exact-dedup hash groupBy, with no pairwise blow-up.
    """
    blocks = docs.select(
        "doc_id",
        F.explode(F.expr(_blocks_sql(block_tokens))).alias("block"),
    ).select("doc_id", F.md5("block").alias("block_md5"))
    corpus = blocks.groupBy("block_md5").agg(
        F.count(F.lit(1)).cast("long").alias("corpus_count")
    )
    return (
        blocks.join(corpus, "block_md5")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.sum(
                F.when(F.col("corpus_count") > 1, 1).otherwise(0)
            )
            .cast("long")
            .alias("dup_blocks"),
        )
        .select(
            "doc_id",
            "n_blocks",
            "dup_blocks",
            (
                F.col("dup_blocks").cast("double")
                / F.col("n_blocks").cast("double")
            ).alias("dup_block_frac"),
        )
    )
