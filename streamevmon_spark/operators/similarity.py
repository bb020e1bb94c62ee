"""Similarity search over the embeddings table (embedding: array<float>).

- ``cosine_topk``: brute-force exact cosine top-k — the correctness
  baseline. The dot product is a zip_with/aggregate fold over DOUBLES in
  ascending index order; the DuckDB oracle evaluates the identical
  left-to-right chain, so cosines match bit-exactly.
- ``embedding_neardup_pairs``: all pairs above a cosine threshold
  (embedding-space near-duplicate detection for dedup pipelines).
- ``lsh_ann_topk``: the scale path — random-hyperplane LSH: sign-bit
  sketches from deterministic pseudo-random hyperplanes (seeded from
  functions/porthash.hex32), candidates = vectors sharing a bucket in
  any of ``n_tables`` tables, exact cosine re-rank inside candidates.
  At 10^9 vectors this is a bucket-join (shuffle on bucket key) instead
  of an O(n^2) cross join; recall is tolerance-tested against
  ``cosine_topk`` in tests (rows-only driver check).

Scale notes: top-k uses a window rank per query partitioned by query id
(bounded k per query); the pairwise baseline is only ever run on the
query x corpus cross, broadcast-joining the (small) query set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from streamevmon_spark.functions.porthash import hex32


def _dot(a: str, b: str) -> F.Column:
    """Ascending-index double dot product (deterministic fold order)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) ->"
        " CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def with_norm(vecs: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return vecs.withColumn("__norm", F.sqrt(_dot(vec_col, vec_col)))


def cosine_topk(
    vecs: DataFrame,
    n_queries: int = 10,
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbours (by cosine) of the first ``n_queries``
    vectors (vec_id < n_queries) over the whole corpus (self excluded).
    Deterministic tie-break: higher cosine first, then lower vec_id."""
    v = with_norm(vecs)
    q = v.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("__norm").alias("q_norm"),
    )
    joined = v.crossJoin(F.broadcast(q)).where(
        F.col("vec_id") != F.col("query_id")
    )
    cos = (_dot("q_emb", "embedding") / (F.col("q_norm") * F.col("__norm"))
           ).alias("cosine")
    scored = joined.select("query_id", "vec_id", cos)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", F.col("rank").cast("int"))
    )


def embedding_neardup_pairs(
    vecs: DataFrame, threshold: float = 0.9
) -> DataFrame:
    """All vector pairs with cosine >= threshold (near-dup candidates)."""
    v = with_norm(vecs)
    a = v.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("__norm").alias("norm_a"),
    )
    b = v.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("__norm").alias("norm_b"),
    )
    cos = (_dot("emb_a", "emb_b") / (F.col("norm_a") * F.col("norm_b"))
           ).alias("cosine")
    return (
        a.crossJoin(b)
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos)
        .where(F.col("cosine") >= threshold)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 1) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from the portable hash:
    component j of plane p = hex32(f"{seed}:{p}:{j}") mapped to [-1, 1]."""
    return [
        [
            (hex32(f"{seed}:{p}:{j}") / float(1 << 31)) - 1.0
            for j in range(dim)
        ]
        for p in range(n_planes)
    ]


def lsh_ann_topk(
    vecs: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_tables: int = 16,
    bits_per_table: int = 4,
    dim: int = 64,
    seed: int = 1,
) -> DataFrame:
    """Random-hyperplane LSH ANN: bucket by sign-bit sketch per table,
    exact cosine re-rank within candidate buckets."""
    planes = _hyperplanes(dim, n_tables * bits_per_table, seed)

    def bucket_expr(table: int) -> F.Column:
        acc = None
        for r in range(bits_per_table):
            p = planes[table * bits_per_table + r]
            arr = "array(" + ",".join(f"{x}D" for x in p) + ")"
            bit = (
                F.when(F.expr(
                    f"aggregate(zip_with(embedding, {arr}, (x, y) ->"
                    " CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE),"
                    " (acc, v) -> acc + v)"
                ) > 0, F.lit(1 << r)).otherwise(F.lit(0))
            )
            acc = bit if acc is None else acc + bit
        return F.concat_ws("_", F.lit(table), acc.cast("string"))

    v = with_norm(vecs)
    buckets = v.select(
        "vec_id", "embedding", "__norm",
        F.explode(
            F.array(*[bucket_expr(t) for t in range(n_tables)])
        ).alias("bucket"),
    )
    q = buckets.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("__norm").alias("q_norm"),
        "bucket",
    )
    cand = (
        buckets.join(F.broadcast(q), "bucket")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "q_emb", "q_norm", "vec_id", "embedding",
                "__norm")
        .dropDuplicates(["query_id", "vec_id"])
    )
    cos = (_dot("q_emb", "embedding") / (F.col("q_norm") * F.col("__norm"))
           ).alias("cosine")
    scored = cand.select("query_id", "vec_id", cos)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", F.col("rank").cast("int"))
    )
