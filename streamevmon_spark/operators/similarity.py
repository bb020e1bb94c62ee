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

# module-level so PySpark can resolve the (stringified, due to the
# __future__ import) pandas type hints on pandas_udf signatures
import pandas as pd
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


# Brute-force cosine_topk scans the WHOLE corpus per query batch;
# above this many rows that is an ANN problem, not a scan — the guard
# raises and points at lsh_ann_topk / ivf_ann_topk (bounded probe:
# count of a limit(n+1) relation stops the scan early, nothing
# collects to the driver).
BRUTE_FORCE_MAX_ROWS = 10_000_000


def cosine_topk(
    vecs: DataFrame,
    n_queries: int = 10,
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbours (by cosine) of the first ``n_queries``
    vectors (vec_id < n_queries) over the whole corpus (self excluded).
    Deterministic tie-break: higher cosine first, then lower vec_id.

    This is the documented exact BASELINE (one broadcast of the tiny
    query side + a linear corpus scan — no shuffle); the scale paths
    are ``lsh_ann_topk`` / ``ivf_ann_topk``, and corpora above
    BRUTE_FORCE_MAX_ROWS are rejected rather than silently scanned."""
    if vecs.limit(BRUTE_FORCE_MAX_ROWS + 1).count() > BRUTE_FORCE_MAX_ROWS:
        raise ValueError(
            f"cosine_topk: corpus exceeds {BRUTE_FORCE_MAX_ROWS} rows — "
            "brute force is the baseline, not the scale path; use "
            "lsh_ann_topk or ivf_ann_topk"
        )
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
    vecs: DataFrame, threshold: float = 0.9, block_size: int = 1024
) -> DataFrame:
    """All vector pairs with cosine >= threshold (near-dup candidates).

    Blocked all-pairs kernel: vectors are packed into blocks of
    ``block_size`` by ``vec_id``, the (upper-triangular) block pairs are
    joined, and each block pair's full cosine matrix is computed in one
    Arrow-batched NumPy kernel. This is the GEMM-shaped scale path —
    replication factor sqrt(P) instead of an O(n^2) row cross join, and
    ~d vectorized ops per block pair instead of an interpreted
    per-element SQL fold per row pair (measured >10x on 2k x 64 floats).

    Bit-exactness with the SQL/DuckDB left-fold oracle: the kernel
    accumulates the dot products dimension-by-dimension in ascending
    index order (C += outer(A[:,k], B[:,k]) for k = 0..d-1) in float64,
    which performs the identical sequence of IEEE-754 additions as
    ``aggregate(zip_with(...), 0.0D, +)``; norms likewise; the final
    ``C / outer(na, nb)`` is the same two-op divide as
    ``dot / (norm_a * norm_b)``.
    """
    import pandas as pd

    v = vecs.select(
        "vec_id",
        "embedding",
        (F.col("vec_id") / block_size).cast("long").alias("blk"),
    )
    packed = v.groupBy("blk").agg(
        F.collect_list(F.struct("vec_id", "embedding")).alias("rows")
    )
    a = packed.select(
        F.col("blk").alias("blk_a"), F.col("rows").alias("rows_a")
    )
    b = packed.select(
        F.col("blk").alias("blk_b"), F.col("rows").alias("rows_b")
    )
    pairs = a.join(b, F.col("blk_a") <= F.col("blk_b"))

    def kernel(pdf_iter):
        import numpy as np

        def unpack(rows):
            ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
            mat = np.array(
                [np.asarray(r["embedding"], dtype=np.float64) for r in rows]
            )
            return ids, mat

        def fold_norms(m):
            acc = np.zeros(m.shape[0])
            for k in range(m.shape[1]):
                acc += m[:, k] * m[:, k]
            return np.sqrt(acc)

        for pdf in pdf_iter:
            out = []
            for _, row in pdf.iterrows():
                ids_a, mat_a = unpack(row["rows_a"])
                ids_b, mat_b = unpack(row["rows_b"])
                cross = np.zeros((len(ids_a), len(ids_b)))
                for k in range(mat_a.shape[1]):
                    cross += np.outer(mat_a[:, k], mat_b[:, k])
                cos = cross / np.outer(fold_norms(mat_a), fold_norms(mat_b))
                mask = (ids_a[:, None] < ids_b[None, :]) & (cos >= threshold)
                ia, ib = np.nonzero(mask)
                out.append(
                    pd.DataFrame(
                        {
                            "vec_a": ids_a[ia],
                            "vec_b": ids_b[ib],
                            "cosine": cos[ia, ib],
                        }
                    )
                )
            yield (
                pd.concat(out)
                if out
                else pd.DataFrame(
                    {"vec_a": [], "vec_b": [], "cosine": []}
                ).astype({"vec_a": "int64", "vec_b": "int64"})
            )

    return pairs.mapInPandas(
        kernel, "vec_a long, vec_b long, cosine double"
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


def _bucket_exprs(
    n_tables: int, bits_per_table: int, dim: int, seed: int
) -> list[F.Column]:
    """One LSH bucket-key column per table: ``bits_per_table`` sign bits
    from deterministic hyperplanes, prefixed with the table index."""
    planes = _hyperplanes(dim, n_tables * bits_per_table, seed)
    out = []
    for table in range(n_tables):
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
        out.append(F.concat_ws("_", F.lit(table), acc.cast("string")))
    return out


def embedding_neardup_lsh(
    vecs: DataFrame,
    threshold: float = 0.9,
    n_tables: int = 16,
    bits_per_table: int = 4,
    dim: int = 64,
    seed: int = 1,
) -> DataFrame:
    """Near-duplicate pairs (cosine >= threshold) via hyperplane-LSH
    candidate generation + exact verification — the 100 TB path.

    Candidates = pairs of vectors sharing at least one of ``n_tables``
    LSH buckets (equi-join on the bucket key, never a cross join); each
    candidate is then verified with the exact ascending-index float64
    fold cosine (the same JVM-side aggregate/zip_with expression as
    cosine_topk — whole-stage codegen, no Arrow transfer of the
    candidate embeddings; a pandas-UDF verify measured 11.4 s vs ~2 s
    at sf0.1 purely from shipping two float arrays per candidate to
    Python). Bit-exact vs the all-pairs oracle on every pair it emits;
    at threshold 0.9 the probability that a qualifying pair shares NO
    bucket over 16 tables x 4 bits is < 1e-5 (and recall vs the exact
    blocked kernel is tolerance-tested in tests/test_trainingdata.py).
    Cost: one bucket-key shuffle + O(candidates) verify, vs the blocked
    all-pairs kernel's O((n/block)^2) block joins.
    """
    v = with_norm(vecs)
    buckets = v.select(
        "vec_id",
        F.explode(
            F.array(*_bucket_exprs(n_tables, bits_per_table, dim, seed))
        ).alias("bucket"),
    ).localCheckpoint()  # 72 hyperplane dot products per vector — both
    # sides of the self-join (probe + broadcast build) would otherwise
    # recompute them; the materialized relation is n_tables rows/vector
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(b, F.col("a.bucket") == F.col("b.bucket"))
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
        )
        .distinct()
    )
    ea = v.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("__norm").alias("norm_a"),
    )
    eb = v.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("__norm").alias("norm_b"),
    )

    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            (
                _dot("emb_a", "emb_b")
                / (F.col("norm_a") * F.col("norm_b"))
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def _ivf_centroids(
    dim: int, n_cells: int, seed: int = 2
) -> list[list[float]]:
    """Deterministic unit-norm coarse-quantizer centroids.

    Production IVF trains centroids offline (k-means over a sample) and
    ships them to the job as constants; the engine's contract is the
    same — centroids are inputs, not data-dependent reductions — which
    keeps the cell assignment free of any cross-row float-summation
    order and therefore bit-exactly mirrorable in the DuckDB oracle.
    Here they are seeded pseudo-random directions from the portable
    hash (normalized in plain Python so both engines receive identical
    double literals)."""
    import math

    out = []
    for c in range(n_cells):
        raw = [
            (hex32(f"ivf:{seed}:{c}:{j}") / float(1 << 31)) - 1.0
            for j in range(dim)
        ]
        nrm = math.sqrt(sum(x * x for x in raw))
        out.append([x / nrm for x in raw])
    return out


_IVF_Q = 1 << 20  # quantization grid for integer-exact k-means


def _quantize_expr(col: str = "embedding") -> F.Column:
    """Per-element quantization to the 2^20 integer grid. x * 2^20 is
    a power-of-two scale (exact for float32 inputs cast to double) and
    floor(v + 0.5) is the tie-stable rounding both engines and NumPy
    evaluate identically — never round() (HALF_UP vs banker's ties)."""
    return F.expr(
        f"transform({col}, x -> CAST(floor(CAST(x AS DOUBLE) "
        f"* {float(_IVF_Q)!r} + 0.5) AS BIGINT))"
    )


def _normalize_requantize(sums: list[int], prev: list[int]) -> list[int]:
    """Shared driver-side Lloyd update step: new centroid = the cell's
    integer sum vector renormalized to unit L2 and requantized to the
    2^20 grid. The norm is computed over arbitrary-precision Python
    ints (sum of squares exceeds 2^53, so a float accumulation would be
    order-dependent); the one float division + floor is elementwise and
    IEEE-deterministic. Empty cells keep their previous centroid."""
    import math

    norm2 = sum(int(s) * int(s) for s in sums)
    if norm2 == 0:
        return list(prev)
    nrm = math.sqrt(norm2)
    return [
        int(math.floor((int(s) / nrm) * float(_IVF_Q) + 0.5))
        for s in sums
    ]


def _init_quantized(dim: int, n_cells: int, seed: int) -> list[list[int]]:
    import math

    return [
        [int(math.floor(u * float(_IVF_Q) + 0.5)) for u in c]
        for c in _ivf_centroids(dim, n_cells, seed)
    ]


def _int_cell_expr(cents_q: list[list[int]]) -> F.Column:
    """argmax-dot cell assignment over integer-quantized vectors: every
    dot term is <= 2^40 and the 64-term sum <= 2^46, so the fold is
    exact in int64 AND in any engine's double path — assignment is
    engine-order-free by construction. Ties break to the lowest cell
    (struct (d, -c) sorted DESC, field-by-field)."""
    structs = []
    for c, p in enumerate(cents_q):
        arr = "array(" + ",".join(f"{x}L" for x in p) + ")"
        dot = F.expr(
            f"aggregate(zip_with(__xq, {arr}, (x, y) -> x * y), 0L,"
            " (acc, v) -> acc + v)"
        )
        structs.append(F.struct(dot.alias("d"), F.lit(-c).alias("nc")))
    return (-F.sort_array(F.array(*structs), False)[0]["nc"]).alias(
        "cell"
    )


def train_ivf_centroids(
    vecs: DataFrame,
    n_cells: int = 16,
    n_iter: int = 2,
    dim: int = 64,
    seed: int = 2,
) -> list[list[float]]:
    """Distributed spherical k-means (Lloyd) for the IVF coarse
    quantizer, engineered so every cross-row reduction happens in the
    INTEGER domain: embeddings are quantized to a 2^20 grid, cell
    assignment is an exact integer argmax-dot, and the per-cell update
    is 64 integer column sums (map-side partial aggregation — the
    shuffle carries n_cells x (dim+1) longs per partition, nothing
    else). Only the tiny (n_cells x dim) model state ever reaches the
    driver, where the renormalize/requantize step runs in shared plain
    Python — so the trained centroids are bit-identical to the NumPy
    twin (``train_ivf_centroids_numpy``) the DuckDB oracle embeds.

    At 100 TB the same job trains on a deterministic hash-sample of the
    corpus (operators/sampling.hash_sample) — the aggregation shape is
    unchanged; reference parity: the parameter-tuning loop of
    parameterTuner (SMBO) is the reference's analogous train-then-run
    lifecycle."""
    xq = vecs.select(_quantize_expr().alias("__xq")).localCheckpoint()
    cents = _init_quantized(dim, n_cells, seed)
    sum_cols = [
        F.sum(F.element_at(F.col("__xq"), i + 1)).alias(f"s{i}")
        for i in range(dim)
    ]
    for _ in range(n_iter):
        rows = (
            xq.select(_int_cell_expr(cents), "__xq")
            .groupBy("cell")
            .agg(F.count("*").alias("n"), *sum_cols)
            .collect()
        )
        by_cell = {r["cell"]: r for r in rows}
        cents = [
            _normalize_requantize(
                [by_cell[c][f"s{i}"] for i in range(dim)], cents[c]
            )
            if c in by_cell
            else cents[c]
            for c in range(n_cells)
        ]
    return [[x / float(_IVF_Q) for x in c] for c in cents]


def train_ivf_centroids_numpy(
    embeddings,
    n_cells: int = 16,
    n_iter: int = 2,
    dim: int = 64,
    seed: int = 2,
) -> list[list[float]]:
    """The oracle-side twin of ``train_ivf_centroids``: the same
    integer-exact Lloyd iterations over a local array (or a parquet
    path), sharing ``_normalize_requantize`` and the quantization
    formula, so both trainers produce bit-identical centroids for the
    same input regardless of engine or iteration order."""
    import numpy as np

    if isinstance(embeddings, str):
        import pyarrow.parquet as pq

        tbl = pq.read_table(embeddings, columns=["embedding"])
        X = np.stack(tbl.column("embedding").to_numpy(zero_copy_only=False))
    else:
        X = np.asarray(embeddings)
    XQ = np.floor(X.astype(np.float64) * float(_IVF_Q) + 0.5).astype(
        np.int64
    )
    cents = np.asarray(_init_quantized(dim, n_cells, seed), np.int64)
    for _ in range(n_iter):
        assign = np.argmax(XQ @ cents.T, axis=1)  # first max = lowest c
        sums = np.zeros((n_cells, dim), np.int64)
        np.add.at(sums, assign, XQ)
        counts = np.bincount(assign, minlength=n_cells)
        cents = np.asarray(
            [
                _normalize_requantize(
                    sums[c].tolist(), cents[c].tolist()
                )
                if counts[c]
                else cents[c].tolist()
                for c in range(n_cells)
            ],
            np.int64,
        )
    return [[x / float(_IVF_Q) for x in c] for c in cents.tolist()]


def _cell_scores(cents: list[list[float]]) -> F.Column:
    """array<struct<d,nc>> of (dot(embedding, centroid_c), -c) — sorted
    descending this orders cells by similarity with ascending-cell
    tie-break (struct comparison is field-by-field in both engines)."""
    structs = []
    for c, p in enumerate(cents):
        arr = "array(" + ",".join(f"{x!r}D" for x in p) + ")"
        dot = F.expr(
            f"aggregate(zip_with(embedding, {arr}, (x, y) ->"
            " CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE),"
            " (acc, v) -> acc + v)"
        )
        structs.append(F.struct(dot.alias("d"), F.lit(-c).alias("nc")))
    return F.array(*structs)


def ivf_ann_topk(
    vecs: DataFrame,
    n_queries: int = 10,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    dim: int = 64,
    seed: int = 2,
    train_iters: int = 2,
) -> DataFrame:
    """IVF (inverted-file) ANN: every corpus vector is assigned to its
    single most-similar coarse cell; a query probes its ``n_probe``
    nearest cells and exact-cosine re-ranks only those cells' vectors.

    ``train_iters`` > 0 (the default) first TRAINS the coarse quantizer
    with that many distributed integer-exact k-means iterations
    (``train_ivf_centroids``); 0 falls back to the seeded untrained
    directions. Trained cells track the data distribution, so equal
    n_probe recovers more true neighbours per candidate scanned.

    The 100 TB shape: the corpus is partitioned once by cell id (an
    equi-join key, never a cross join), each vector appears in exactly
    ONE cell (no dedup step, unlike multi-table LSH), and the probe
    fan-out is a broadcast of n_queries x n_probe rows. Candidate cost
    is n_probe/n_cells of the corpus per query. Recall is
    tolerance-tested against ``cosine_topk``; every emitted cosine is
    bit-exact vs the DuckDB mirror (centroid literals shared)."""
    v = with_norm(vecs)
    if train_iters > 0:
        cents = train_ivf_centroids(vecs, n_cells, train_iters, dim, seed)
    else:
        cents = _ivf_centroids(dim, n_cells, seed)
    cells = _cell_scores(cents)
    sorted_cells = F.sort_array(cells, False)
    corpus = v.select(
        "vec_id", "embedding", "__norm",
        (-sorted_cells[0]["nc"]).alias("cell"),
    )
    q = corpus.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("__norm").alias("q_norm"),
        F.explode(
            F.transform(
                F.slice(sorted_cells, 1, n_probe), lambda s: -s["nc"]
            )
        ).alias("cell"),
    )
    cand = corpus.join(F.broadcast(q), "cell").where(
        F.col("vec_id") != F.col("query_id")
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
    v = with_norm(vecs)
    buckets = v.select(
        "vec_id", "embedding", "__norm",
        F.explode(
            F.array(*_bucket_exprs(n_tables, bits_per_table, dim, seed))
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
