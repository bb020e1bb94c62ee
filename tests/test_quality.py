"""Corpus-quality operators (operators/quality.py): Gopher rule flags,
n-gram repetition features, corpus-wide duplicate-block stats — worked
examples with hand-computed expectations plus physical-plan scale
guards. Cross-engine bit-exactness vs docs_oracles is covered by the
driver gate (quality_gopher / gram_repetition / block_dedup)."""

from __future__ import annotations

import pytest

from streamevmon_spark.operators import quality as Q


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_gopher_word_count_and_stopword_rules(spark):
    short = "the and of to a in is word"  # 8 words, many stopwords
    good = " ".join(["the", "and"] + ["word%d" % i for i in range(28)])
    nostop = " ".join("tok%d" % i for i in range(30))
    rows = {
        r.doc_id: r
        for r in Q.gopher_flags(_docs(spark, [short, good, nostop])).collect()
    }
    assert rows[0].n_words == 8
    assert not rows[0].flag_word_count  # below min_words=20
    assert rows[0].flag_stopwords  # 7 distinct stopwords
    assert rows[1].keep  # 30 words, 2 stopwords, clean
    assert rows[2].flag_word_count and not rows[2].flag_stopwords
    assert not rows[2].keep


def test_gopher_symbol_and_alpha_rules(spark):
    # 20 words incl. 2 stopwords; 3 '#' + one '...' over 20 words
    # -> symbol ratio 4/20 = 0.2 > 0.1
    symb = "the a " + " ".join("w%d" % i for i in range(15)) + " ##...#"
    # 20 words, 15 numeric-only tokens -> alpha ratio 5/20 = 0.25
    nums = "the a w1 w2 w3 " + " ".join(str(i) for i in range(15))
    rows = {
        r.doc_id: r
        for r in Q.gopher_flags(_docs(spark, [symb, nums])).collect()
    }
    assert rows[0].n_words == 18  # '##...#' is one token
    assert rows[0].symbol_ratio == pytest.approx(4 / 18)
    assert not rows[0].flag_symbol_ratio
    assert rows[1].alpha_word_ratio == pytest.approx(5 / 20)
    assert not rows[1].flag_alpha_words


def test_gopher_mean_word_len_bounds(spark):
    tiny = " ".join(["a"] * 25)  # mean len 1 < 3
    rows = Q.gopher_flags(_docs(spark, [tiny])).collect()
    assert rows[0].mean_word_len == 1.0
    assert not rows[0].flag_mean_word_len and not rows[0].keep


def test_gram_repetition_worked_example(spark):
    # tokens a b a b a: 2-grams [ab, ba, ab, ba] -> total 4, top 2;
    # 3-grams [aba, bab, aba] -> total 3, distinct 2 -> dup frac 1/3
    r = Q.gram_repetition(_docs(spark, ["a b a b a"])).collect()[0]
    assert (r.total_2gram, r.top_2gram_count) == (4, 2)
    assert r.top_2gram_share == pytest.approx(0.5)
    assert (r.total_3gram, r.distinct_3gram) == (3, 2)
    assert r.dup_3gram_frac == pytest.approx(1 / 3)


def test_gram_repetition_all_unique(spark):
    r = Q.gram_repetition(
        _docs(spark, [" ".join("t%d" % i for i in range(10))])
    ).collect()[0]
    assert r.top_2gram_share == pytest.approx(1 / 9)
    assert r.dup_3gram_frac == 0.0


def test_block_dedup_cross_doc_and_within_doc(spark):
    blk = " ".join("b%d" % i for i in range(16))
    other = " ".join("x%d" % i for i in range(16))
    docs = _docs(
        spark,
        [
            blk + " " + other,  # doc0: [blk, other]
            blk + " " + blk,  # doc1: [blk, blk] (within-doc repeat)
            other + " tail",  # doc2: [other, 'tail']
        ],
    )
    rows = {r.doc_id: r for r in Q.block_dedup_stats(docs).collect()}
    # blk occurs 3x, other 2x, 'tail' 1x in the corpus
    assert (rows[0].n_blocks, rows[0].dup_blocks) == (2, 2)
    assert (rows[1].n_blocks, rows[1].dup_blocks) == (2, 2)
    assert (rows[2].n_blocks, rows[2].dup_blocks) == (2, 1)
    assert rows[2].dup_block_frac == pytest.approx(0.5)


def test_block_dedup_truncated_last_block(spark):
    r = Q.block_dedup_stats(
        _docs(spark, [" ".join("w%d" % i for i in range(20))])
    ).collect()[0]
    assert r.n_blocks == 2  # 16 + truncated 4
    assert r.dup_blocks == 0


def test_gopher_plan_is_map_only(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        Q.gopher_flags(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_gram_and_block_plans_have_no_cartesian(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for df in (Q.gram_repetition(docs), Q.block_dedup_stats(docs)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoop" not in plan, plan
