"""Corpus-assembly operator properties (operators/corpus.py).
Cross-engine exactness is the driver oracle's job; these pin the
invariants SQL comparison can't express."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_split_disjoint_exhaustive_deterministic(spark, docs):
    from streamevmon_spark.operators.corpus import split_corpus

    s = split_corpus(docs).toPandas()
    assert len(s) == docs.count()
    assert s["doc_id"].is_unique
    assert set(s["split"]) <= {"train", "val", "test"}
    # 90/5/5 within sampling tolerance on 100 docs
    frac = (s["split"] == "train").mean()
    assert 0.75 <= frac <= 1.0
    s2 = split_corpus(docs).toPandas().sort_values("doc_id")
    assert list(s.sort_values("doc_id")["split"]) == list(s2["split"])


def test_vocabulary_ranks_and_counts(spark, docs):
    from streamevmon_spark.operators.corpus import vocabulary

    v = vocabulary(docs, top_k=10).toPandas().sort_values("rank")
    assert list(v["rank"]) == list(range(1, len(v) + 1))
    # counts non-increasing along ranks; lexical tie-break
    prev = None
    for _, row in v.iterrows():
        if prev is not None:
            assert row["cnt"] <= prev["cnt"]
            if row["cnt"] == prev["cnt"]:
                assert row["token"] > prev["token"]
        prev = row


def test_contamination_bounds_and_dup_detection(spark, docs):
    from streamevmon_spark.operators.corpus import contamination

    c = contamination(docs).toPandas()
    # benchmark docs never appear as train rows
    assert not any(c["doc_id"] % 10 == 0)
    assert ((c["contamination_ratio"] >= 0)
            & (c["contamination_ratio"] <= 1)).all()
    # a train doc whose text equals a benchmark doc's text must be
    # fully contaminated
    bench_texts = {
        r.text for r in docs.where("doc_id % 10 = 0").collect()
    }
    dup_train = [
        r.doc_id
        for r in docs.where("doc_id % 10 != 0").collect()
        if r.text in bench_texts
    ]
    if dup_train:
        sub = c[c["doc_id"].isin(dup_train)]
        assert (sub["contamination_ratio"] == 1.0).all()


def test_pack_sequences_greedy_invariants(spark, docs):
    from streamevmon_spark.operators.corpus import pack_sequences

    L = 64
    p = (
        pack_sequences(docs, seq_len=L, n_shards=4)
        .toPandas()
        .sort_values(["shard", "doc_id"])
    )
    assert len(p) == docs.count()
    for (shard, pack), grp in p.groupby(["shard", "pack_id"]):
        total = grp["n_tokens"].sum()
        # a pack exceeds seq_len only when it is a single long doc
        assert total <= L or len(grp) == 1
        # offsets are the running prefix sum in doc_id order
        grp = grp.sort_values("doc_id")
        run = 0
        for _, row in grp.iterrows():
            assert row["offset_tokens"] == run
            run += row["n_tokens"]
    # pack ids contiguous from 0 within each shard
    for shard, grp in p.groupby("shard"):
        ids = sorted(grp["pack_id"].unique())
        assert ids == list(range(len(ids)))
    # greedy = never start a new pack when the doc would have fit
    for shard, grp in p.groupby("shard"):
        grp = grp.sort_values("doc_id").reset_index(drop=True)
        for i in range(1, len(grp)):
            prev, cur = grp.iloc[i - 1], grp.iloc[i]
            if cur["pack_id"] != prev["pack_id"]:
                fill = prev["offset_tokens"] + prev["n_tokens"]
                assert fill > 0 and fill + cur["n_tokens"] > L
