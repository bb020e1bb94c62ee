"""Training-data pipeline operator tests: dedup families, similarity
search, text analysis. Cross-engine exactness is covered by the driver
oracle (docs_oracles.py); these tests pin semantic properties the SQL
comparison can't express (LSH recall, family agreement, hash mirrors).
"""

from __future__ import annotations

import pytest

pytestmark = []


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_hex32_python_mirror_matches_sql(spark):
    from streamevmon_spark.functions.porthash import hex32, hex32_sql

    h1 = hex32_sql("'hello'")
    h2 = hex32_sql("'x y z'")
    rows = spark.sql(f"SELECT {h1} AS h, {h2} AS h2").collect()
    assert rows[0]["h"] == hex32("hello")
    assert rows[0]["h2"] == hex32("x y z")


def test_exact_dedup_partitions_docs(spark, docs):
    from streamevmon_spark.operators.dedup import exact_dedup

    d = exact_dedup(docs).toPandas()
    assert d["dup_count"].sum() == docs.count()
    # keep_doc_id is a real doc and unique per hash
    assert d["text_md5"].is_unique


def test_minhash_candidates_subset_of_jaccard_with_recall(spark, docs):
    from streamevmon_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    exact = ngram_jaccard_pairs(docs, threshold=0.2).toPandas()
    lsh = minhash_lsh_pairs(docs, threshold=0.2).toPandas()
    e = {(r.doc_a, r.doc_b) for r in exact.itertuples()}
    l_ = {(r.doc_a, r.doc_b) for r in lsh.itertuples()}
    assert l_ <= e, "LSH-verified pairs must be a subset of exact pairs"
    if e:
        recall = len(l_) / len(e)
        assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_minhash_band_local_verify_identical_to_global(spark, docs):
    """The band-local applyInPandas verify path (no global candidate
    relation, no verify joins) must produce the EXACT same verified-pair
    relation as the settled global mode — same pairs, bit-identical
    jaccard doubles (both compute one IEEE-754 division ni/(sa+sb-ni))."""
    from streamevmon_spark.operators.dedup import minhash_lsh_pairs

    g = minhash_lsh_pairs(docs, threshold=0.2).toPandas()
    b = minhash_lsh_pairs(
        docs, threshold=0.2, verify_mode="band_local"
    ).toPandas()
    gset = {(r.doc_a, r.doc_b, r.jaccard) for r in g.itertuples()}
    bset = {(r.doc_a, r.doc_b, r.jaccard) for r in b.itertuples()}
    assert gset, "fixture must yield at least one near-dup pair"
    assert bset == gset

    with pytest.raises(ValueError):
        minhash_lsh_pairs(docs, verify_mode="nope")


def test_minhash_band_local_salted_identical(spark, docs):
    """Triangle salting (bucket_budget) must not change the verified
    relation: a tiny budget forces EVERY bucket through the salted
    cell path (g > 1), and the output must still be bit-identical to
    the unsalted band-local and global modes — the hot-bucket split is
    a pure execution-shape change."""
    from streamevmon_spark.operators.dedup import minhash_lsh_pairs

    g = minhash_lsh_pairs(docs, threshold=0.2).toPandas()
    for budget in (1, 2, 1_000_000):
        s = minhash_lsh_pairs(
            docs, threshold=0.2, verify_mode="band_local",
            bucket_budget=budget,
        ).toPandas()
        gset = {(r.doc_a, r.doc_b, r.jaccard) for r in g.itertuples()}
        sset = {(r.doc_a, r.doc_b, r.jaccard) for r in s.itertuples()}
        assert sset == gset, f"budget={budget}"


def test_simhash_exact_dups_have_zero_hamming(spark, docs):
    from pyspark.sql import functions as F

    from streamevmon_spark.operators.dedup import simhash_fingerprints

    # duplicate a doc under a new id: identical text -> identical simhash
    dup = docs.limit(1).withColumn("doc_id", F.lit(999_999))
    fp = simhash_fingerprints(docs.unionByName(dup)).toPandas()
    orig_id = docs.limit(1).collect()[0]["doc_id"]
    a = fp.loc[fp.doc_id == orig_id, "simhash"].iloc[0]
    b = fp.loc[fp.doc_id == 999_999, "simhash"].iloc[0]
    assert a == b


def test_ann_lsh_recall_vs_bruteforce(spark, embs):
    from streamevmon_spark.operators.similarity import (
        cosine_topk,
        lsh_ann_topk,
    )

    exact = cosine_topk(embs, n_queries=10, k=5).toPandas()
    approx = lsh_ann_topk(embs, n_queries=10, k=5).toPandas()
    e = {(r.query_id, r.vec_id) for r in exact.itertuples()}
    a = {(r.query_id, r.vec_id) for r in approx.itertuples()}
    recall = len(e & a) / len(e)
    assert recall >= 0.3, f"ANN recall vs brute force too low: {recall}"
    # each approx neighbour's cosine must equal the exact cosine (same
    # deterministic fold), so joined rows agree bit-exactly
    m = exact.merge(approx, on=["query_id", "vec_id"], suffixes=("_e", "_a"))
    assert (m["cosine_e"] == m["cosine_a"]).all()


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_simhash_pairs_banded_matches_allpairs_no_cartesian(spark, docs):
    """Pigeonhole banding must be exactly equivalent to the all-pairs
    Hamming join, with no theta/cartesian join in the physical plan."""
    import itertools

    from streamevmon_spark.operators.dedup import (
        simhash_fingerprints,
        simhash_pairs,
    )

    out = simhash_pairs(docs, max_hamming=6)
    plan = _physical_plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    got = {(r.doc_a, r.doc_b, r.hamming) for r in out.collect()}
    fp = {r.doc_id: r.simhash for r in simhash_fingerprints(docs).collect()}
    want = set()
    for a, b in itertools.combinations(sorted(fp), 2):
        h = bin(fp[a] ^ fp[b]).count("1")
        if h <= 6:
            want.add((a, b, h))
    assert got == want


def test_embedding_neardup_lsh_matches_exact_no_cartesian(spark, embs):
    """LSH-candidate near-dup must reproduce the exact blocked kernel's
    pair set at the gate parameters (deterministic hyperplanes), with an
    equi-join — never a cross join — generating candidates."""
    from streamevmon_spark.operators.similarity import (
        embedding_neardup_lsh,
        embedding_neardup_pairs,
    )

    lsh = embedding_neardup_lsh(
        embs, threshold=0.4, n_tables=24, bits_per_table=3
    )
    plan = _physical_plan(lsh)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    got = {(r.vec_a, r.vec_b): r.cosine for r in lsh.collect()}
    want = {
        (r.vec_a, r.vec_b): r.cosine
        for r in embedding_neardup_pairs(embs, threshold=0.4).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k]  # bit-exact same fold


def test_lang_id_marks_english(spark, docs):
    from streamevmon_spark.operators.textstats import lang_id

    out = lang_id(docs).toPandas()
    # documents are English word soup containing 'the'/'a' markers
    assert (out["lang_pred"] == "en").mean() > 0.9


def test_quality_scores_ranges(spark, docs):
    from streamevmon_spark.operators.textstats import quality_scores

    q = quality_scores(docs).toPandas()
    for c in ("stopword_ratio", "punct_ratio", "distinct_ratio"):
        assert (q[c] >= 0).all() and (q[c] <= 1).all(), c
    assert (q["mean_token_len"] > 0).all()


def test_fingerprints_detect_canonical_duplicates(spark, docs):
    from pyspark.sql import functions as F

    from streamevmon_spark.operators.textstats import fingerprints

    # same text upper-cased -> same canonical md5 (case-normalized)
    dup = docs.limit(1).select(
        F.lit(999_999).alias("doc_id"),
        F.upper(F.col("text")).alias("text"),
        "lang", "source", "n_chars",
    )
    fp = fingerprints(docs.unionByName(dup)).toPandas()
    orig_id = docs.limit(1).collect()[0]["doc_id"]
    a = fp.loc[fp.doc_id == orig_id, "canonical_md5"].iloc[0]
    b = fp.loc[fp.doc_id == 999_999, "canonical_md5"].iloc[0]
    assert a == b


def test_ann_ivf_recall_and_plan(spark, embs):
    """IVF probes its n_probe best cells: recall vs brute force is
    tolerance-checked, every emitted cosine is bit-equal to the exact
    fold, each corpus vector lands in exactly ONE cell, and the
    candidate join is an equi/broadcast join — never a cartesian."""
    from streamevmon_spark.operators.similarity import (
        cosine_topk,
        ivf_ann_topk,
    )

    exact = cosine_topk(embs, n_queries=10, k=5).toPandas()
    approx_df = ivf_ann_topk(embs, n_queries=10, k=5)
    plan = approx_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    approx = approx_df.toPandas()
    e = {(r.query_id, r.vec_id) for r in exact.itertuples()}
    a = {(r.query_id, r.vec_id) for r in approx.itertuples()}
    recall = len(e & a) / len(e)
    assert recall >= 0.3, f"IVF recall vs brute force too low: {recall}"
    m = exact.merge(approx, on=["query_id", "vec_id"], suffixes=("_e", "_a"))
    assert (m["cosine_e"] == m["cosine_a"]).all()
    # trained (default) cells must not lose recall vs the untrained
    # seeded directions at equal n_probe
    un = ivf_ann_topk(embs, n_queries=10, k=5, train_iters=0).toPandas()
    u = {(r.query_id, r.vec_id) for r in un.itertuples()}
    assert len(e & a) >= len(e & u), (
        f"training reduced recall: {len(e & a)} < {len(e & u)}"
    )


def test_ivf_trainers_bit_identical(spark, embs):
    """The distributed trainer and the NumPy oracle twin must produce
    bit-identical centroids: every cross-row reduction in both is
    integer-exact (2^20 grid, int argmax-dot, int column sums), and the
    float renormalize step is shared driver-side Python."""
    import numpy as np

    from streamevmon_spark.operators.similarity import (
        train_ivf_centroids,
        train_ivf_centroids_numpy,
    )

    c_spark = train_ivf_centroids(embs, n_cells=8, n_iter=3)
    X = np.stack(embs.toPandas()["embedding"].to_numpy())
    c_np = train_ivf_centroids_numpy(X, n_cells=8, n_iter=3)
    assert c_spark == c_np
    # training moved the centroids off the seeded init
    from streamevmon_spark.operators.similarity import _ivf_centroids

    assert c_spark != [
        [round(u * (1 << 20)) / (1 << 20) for u in c]
        for c in _ivf_centroids(64, 8)
    ]


def test_generated_documents_planted_families(spark):
    """Synthetic dedup-bench corpus: deterministic, with near-dup
    families of 5 whose members differ from the head in exactly one
    token (family head = member 0)."""
    from streamevmon_spark.data.documents import generate_documents
    from streamevmon_spark.operators.dedup import ngram_jaccard_pairs

    docs = generate_documents(spark, 100)
    rows = {r.doc_id: r.text for r in docs.collect()}
    again = {r.doc_id: r.text for r in generate_documents(spark, 100).collect()}
    assert rows == again
    for fam in range(0, 100, 5):
        head = rows[fam].split(" ")
        for m in range(1, 5):
            member = rows[fam + m].split(" ")
            assert len(member) == len(head)
            diffs = sum(1 for a, b in zip(head, member) if a != b)
            assert diffs == 1
    # near-dup detection finds the planted pairs at a high threshold
    pairs = ngram_jaccard_pairs(docs, threshold=0.5).collect()
    same_family = [p for p in pairs if p.doc_a // 5 == p.doc_b // 5]
    assert len(same_family) >= 100 * 4 // 5  # most intra-family pairs


def test_cosine_topk_guard(spark, monkeypatch):
    """Brute-force cosine_topk refuses corpora above the bounded-probe
    threshold and points at the ANN paths."""
    from streamevmon_spark.operators import similarity as S

    vecs = spark.range(10).selectExpr(
        "id AS vec_id", "array(1.0, 0.0) AS embedding"
    )
    monkeypatch.setattr(S, "BRUTE_FORCE_MAX_ROWS", 5)
    with pytest.raises(ValueError, match="lsh_ann_topk"):
        S.cosine_topk(vecs, n_queries=2, k=2)
    monkeypatch.setattr(S, "BRUTE_FORCE_MAX_ROWS", 1000)
    assert S.cosine_topk(vecs, n_queries=2, k=2).count() > 0


def test_minhash_band_local_hashed_identical(spark, docs):
    """The opt-in hashed-shingle exchange (xxhash64 per shingle — the
    band exchange carries 8 bytes/shingle instead of strings) must
    produce the identical verified relation at any collision-free
    scale, alone and combined with triangle salting."""
    from streamevmon_spark.operators.dedup import minhash_lsh_pairs

    g = {(r.doc_a, r.doc_b, r.jaccard)
         for r in minhash_lsh_pairs(docs, threshold=0.2).collect()}
    h = {(r.doc_a, r.doc_b, r.jaccard)
         for r in minhash_lsh_pairs(
             docs, threshold=0.2, verify_mode="band_local",
             hash_shingles=True).collect()}
    hb = {(r.doc_a, r.doc_b, r.jaccard)
          for r in minhash_lsh_pairs(
              docs, threshold=0.2, verify_mode="band_local",
              hash_shingles=True, bucket_budget=2).collect()}
    assert h == g and hb == g and g
