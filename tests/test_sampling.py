"""Sampling / normalization / dedup-cluster property tests. Cross-engine
exactness is the driver oracle's job (docs_oracles.py); these pin the
semantic invariants the SQL comparison can't express: sample
mergeability, exact-top-k equivalence to the naive single-window form,
normalization idempotence, and cluster-label fixpoint properties.
"""

from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_sample_hash_deterministic_and_mergeable(spark, docs):
    from streamevmon_spark.operators.sampling import sample_hash

    a = {r.doc_id for r in sample_hash(docs, 0.05).select("doc_id").collect()}
    b = {r.doc_id for r in sample_hash(docs, 0.2).select("doc_id").collect()}
    # same seed: the smaller rate is a strict subset of the larger — the
    # property that lets a 100 TB pipeline grow a sample without rescan
    assert a <= b
    assert len(b) > len(a) > 0
    # re-run is byte-identical (no RNG anywhere)
    a2 = {r.doc_id for r in sample_hash(docs, 0.05).select("doc_id").collect()}
    assert a == a2


def test_sample_stratified_rates_apply_per_stratum(spark, docs):
    from streamevmon_spark.operators.sampling import (
        sample_hash,
        sample_stratified,
    )

    out = sample_stratified(
        docs, rates={"en": 1.0}, default_rate=0.0
    )
    langs = {r.lang for r in out.select("lang").distinct().collect()}
    assert langs == {"en"}
    # rate 1.0 keeps every en doc
    assert out.count() == docs.where(F.col("lang") == "en").count()
    # a uniform rate equals plain sample_hash
    uni = sample_stratified(docs, rates={}, default_rate=0.3)
    plain = sample_hash(docs, 0.3)
    assert sorted(r.doc_id for r in uni.collect()) == sorted(
        r.doc_id for r in plain.collect()
    )


def test_sample_topk_matches_naive_single_window(spark, docs):
    from streamevmon_spark.operators.sampling import (
        _sample_key,
        sample_topk_per_stratum,
    )

    k = 7
    got = sample_topk_per_stratum(docs, k, n_buckets=5).select(
        "doc_id", "lang", "rank"
    )
    # naive reference: one window per stratum (the shape we avoid at
    # scale) must produce the identical ranked set
    w = Window.partitionBy("lang").orderBy("sample_key", "doc_id")
    naive = (
        docs.withColumn("sample_key", _sample_key("s1"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "lang", "rank")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, naive.collect())
    )
    # exactly k per stratum whenever the stratum has >= k docs
    counts = {r.lang: r["c"] for r in got.groupBy("lang").agg(
        F.count("*").alias("c")).collect()}
    for lang, c in counts.items():
        n = docs.where(F.col("lang") == lang).count()
        assert c == min(k, n)


def test_text_normalize_idempotent(spark, docs):
    from streamevmon_spark.operators.sampling import text_normalize

    once = text_normalize(docs)
    # renormalizing the normalized text is the identity
    again = text_normalize(
        once.select("doc_id", F.col("norm_text").alias("text"))
    )
    joined = (
        once.select("doc_id", F.col("norm_md5").alias("m1"))
        .join(again.select("doc_id", F.col("norm_md5").alias("m2")), "doc_id")
    )
    assert joined.where(F.col("m1") != F.col("m2")).count() == 0
    # norm_tokens is 0 only when the text is empty after normalization
    bad = once.where(
        (F.col("norm_tokens") == 0) & (F.length("norm_text") > 0)
    )
    assert bad.count() == 0


def test_dedup_clusters_fixpoint_properties(spark, docs):
    from streamevmon_spark.operators.dedup import (
        dedup_clusters,
        minhash_lsh_pairs,
    )

    labels = dedup_clusters(docs, threshold=0.2)
    lab = {r.doc_id: r.cluster_id for r in labels.collect()}
    # total: every doc labelled exactly once
    assert len(lab) == docs.count()
    # cluster_id is a member of its own cluster and is the min member
    by_cluster: dict[int, list[int]] = {}
    for d, c in lab.items():
        by_cluster.setdefault(c, []).append(d)
    for c, members in by_cluster.items():
        assert c == min(members)
    # every near-dup pair is in the same cluster (edges never straddle)
    pairs = minhash_lsh_pairs(docs, threshold=0.2).collect()
    assert len(pairs) > 0
    for p in pairs:
        assert lab[p.doc_a] == lab[p.doc_b]
    # canonical flag marks exactly one doc per cluster
    canon = [r.doc_id for r in labels.where("is_canonical").collect()]
    assert sorted(canon) == sorted(by_cluster)
