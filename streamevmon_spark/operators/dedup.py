"""Deduplication operators over the documents table — the dedup half of
a large-scale training-data pipeline.

Four families, each with a DuckDB oracle (oracles.py):

- ``exact_dedup``       hash-groupBy on md5(text); keeps min doc_id.
- ``ngram_jaccard_pairs`` exact word-3-gram Jaccard similarity for every
  candidate pair sharing a shingle (shingle-join, not O(n^2)).
- ``minhash_lsh_pairs`` MinHash signatures (k portable hash functions,
  functions/porthash.py) -> LSH banding -> candidate pairs -> exact
  Jaccard verify. The 100 TB path: cost is O(docs x shingles x k) plus a
  band-key shuffle; no pairwise blow-up outside a band bucket.
- ``simhash_fingerprints`` / ``simhash_pairs`` 32-bit SimHash over
  tokens; near-dup pairs by Hamming distance (bit_count of xor).

Embedding-cosine near-dup lives in operators/similarity.py.

Scale notes: every step is shuffle-on-key DataFrame algebra (explode ->
groupBy / join). Shingle and band keys are integers/strings with good
dispersion (md5-derived), so no skew salting is needed; AQE handles any
residual band-bucket skew. The pairwise verify only ever runs on
LSH-candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamevmon_spark.functions.porthash import hex32_sql

MINHASH_K = 8  # hash functions
MINHASH_BAND_ROWS = 2  # rows per LSH band -> 4 bands


def exact_dedup(docs: DataFrame) -> DataFrame:
    """One row per distinct text: md5 hash, kept (min) doc_id, dup count."""
    return (
        docs.select("doc_id", F.md5("text").alias("text_md5"))
        .groupBy("text_md5")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).cast("long").alias("dup_count"),
        )
    )


def _shingles_sql(n: int = 3) -> str:
    """SQL text of the distinct word n-gram shingle array for the text
    column. The greatest() guard keeps sequence() ascending for docs
    shorter than n words (such a doc yields one truncated shingle).

    The token array is bound to a lambda variable (``transform(array(
    split(..)), ts -> ..)[0]``) so ``split`` is evaluated ONCE per row no
    matter how Catalyst rewrites the surrounding plan — inlining it into
    the inner lambda would re-split the text for every shingle position
    (measured 4-5x slower on 300-char docs)."""
    return (
        f"array_distinct(transform(array(split(text, ' ')), ts ->"
        f" transform(sequence(0, greatest(size(ts) - {n}, 0)),"
        f" j -> concat_ws(' ', slice(ts, j + 1, {n}))))[0])"
    )


def _shingles(n: int = 3):
    return F.expr(_shingles_sql(n))


def _doc_shingles(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.explode(_shingles()).alias("shingle")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.2,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact Jaccard over distinct word-3-gram shingles for every pair of
    docs sharing at least one shingle; keep pairs >= threshold.

    ``max_doc_freq``: when set, shingles appearing in more than this many
    documents are dropped BEFORE the self-join (standard near-dup
    practice — a stopword-heavy 3-gram shared by millions of docs would
    otherwise explode the join bucket quadratically). Jaccard is then
    computed over the filtered shingle sets on both sides (numerator and
    denominator), i.e. the capped semantics are self-consistent and the
    DuckDB oracle applies the identical cap.
    """
    # Materialize the exploded shingle relation before the self-join —
    # the inverted-index build a production near-dup pass does anyway.
    # Without it both join sides recompute the shingling lambda chain
    # (measured: capped variant 3.4 s -> 1.2 s at sf0.1). localCheckpoint
    # is partition-distributed executor storage, not a driver collect.
    sh = _doc_shingles(docs).localCheckpoint()
    if max_doc_freq is not None:
        # document frequency per shingle; keep the rare ones only. One
        # extra groupBy on the shingle key — linear, and it shrinks every
        # downstream shuffle.
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") <= max_doc_freq)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle").localCheckpoint()
        sizes = sh.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles")
        )
    else:
        # per-doc shingle counts straight from the array — a map-side
        # projection, not an explode + groupBy shuffle
        sizes = docs.select(
            "doc_id", F.size(_shingles()).cast("long").alias("n_shingles")
        )
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("size_a")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("size_b")
    )
    # plain equi-joins: the size tables are one row per doc (NOT
    # broadcastable at 10^9 docs); AQE still auto-broadcasts them when
    # they fit under the threshold at small scale.
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter").cast("double")
                / (
                    F.col("size_a") + F.col("size_b") - F.col("n_inter")
                ).cast("double")
            ).alias("jaccard"),
        )
    )
    return out.where(F.col("jaccard") >= threshold)


def minhash_signatures(docs: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """Per-doc MinHash signature: mh_i = min over shingles of
    hex32(i || ':' || shingle).

    Computed as explode + groupBy with map-side partial aggregation:
    each doc's shingles collapse to one signature row before the
    exchange, so the shuffle carries ~1 row per document — not a
    full-shingle-corpus shuffle — and the md5 stays inside whole-stage
    codegen."""
    # Shape note (measured, sf0.1): explode + groupBy beats a fully
    # map-side array_min(transform(...)) rewrite ~10x. Nested lambda
    # transforms evaluate interpreted per element, while the flat
    # explode rows keep md5 inside whole-stage codegen; and the groupBy
    # is NOT a full-corpus shuffle at scale — hash partial aggregation
    # collapses each doc's shingles to one signature row map-side, so
    # the exchange carries ~1 row per document.
    sh = _doc_shingles(docs)
    aggs = [
        F.min(F.expr(hex32_sql(f"concat('{i}:', shingle)"))).alias(f"mh{i}")
        for i in range(k)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def _band_key_exprs(k: int, band_rows: int) -> list:
    """One concat_ws band-key column expression per LSH band."""
    n_bands = k // band_rows
    return [
        F.concat_ws(
            "_",
            F.lit(b),
            *[F.col(f"mh{b * band_rows + r}") for r in range(band_rows)],
        )
        for b in range(n_bands)
    ]


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.2,
    k: int = MINHASH_K,
    band_rows: int = MINHASH_BAND_ROWS,
    verify_mode: str = "global",
    bucket_budget: int | None = None,
    hash_shingles: bool = False,
) -> DataFrame:
    """LSH candidate generation + exact Jaccard verification.

    ``verify_mode``:

    - ``"global"`` (default): banded self-join emits a global distinct
      candidate-pair relation, verified by two joins back onto the
      pre-bucketed shingle-array relation. The settled r3/r4 strategy
      (measured A/Bs in the comments below).
    - ``"band_local"``: the shingle set travels WITH the band row, so
      each band bucket verifies its own pairs in an Arrow-batched
      ``applyInPandas`` kernel — no global candidate relation, no
      verify joins, no candidate-sized sort; the only post-bucket work
      is a distinct over ALREADY-VERIFIED pairs (tiny at real
      thresholds). Cost moved to the band exchange, which now carries
      ``n_bands`` copies of each doc's shingle set. Output is
      row-identical to ``"global"`` (pytest-pinned).

    ``bucket_budget`` (band_local only): triangle-salt any band bucket
    larger than this many docs so no single Arrow run carries an
    unbounded O(B^2) verify — the hot-bucket task-budget guard (see
    _minhash_lsh_pairs_band_local). None = no salting (buckets map to
    one run each, the pre-r5 behaviour).
    """
    if verify_mode == "band_local":
        return _minhash_lsh_pairs_band_local(
            docs, threshold, k, band_rows, bucket_budget, hash_shingles
        )
    if verify_mode != "global":
        raise ValueError(f"unknown verify_mode: {verify_mode!r}")
    sig = minhash_signatures(docs, k)
    bands = sig.select(
        "doc_id",
        F.explode(F.array(*_band_key_exprs(k, band_rows))).alias(
            "band_key"
        ),
    ).localCheckpoint()  # n_bands rows/doc; both sides of the self-join
    # would otherwise recompute the whole shingle->signature subtree
    # (measured ~2x the stage cost at sf0.1)
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(b, F.col("a.band_key") == F.col("b.band_key"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    # Exact-Jaccard verification on CANDIDATES ONLY (the whole point of
    # LSH): join each candidate pair to the two docs' distinct-shingle
    # arrays and intersect. At 100 TB the candidate set is tiny relative
    # to the co-shingle pair blow-up a full shingle self-join would
    # enumerate, so this is two shuffle joins on doc_id instead of an
    # O(sum bucket^2) pair expansion + groupBy.
    #
    # Join-strategy notes, measured at 2M docs on this box (r3 + r4):
    # - the shingle-array relation is materialized ONCE, hash-
    #   partitioned AND sorted on doc_id (r4): the localCheckpoint
    #   preserves both through the rename projections (alias-aware
    #   output partitioning/ordering), so NEITHER corpus-sized array
    #   side is ever exchanged or sorted at join time — the r3 profile
    #   showed one big SortMergeJoin sort of this relation as the flat
    #   ~110 s memory-bandwidth wall at 2M docs. At 100 TB the same
    #   layout comes from a bucketBy(doc_id).sortBy(doc_id) table
    #   write, amortized across every verify pass.
    # - the FIRST join hashes the ids-only candidate side
    #   (shuffle_hash) — a bounded per-partition build; the streamed
    #   pre-partitioned array side needs no exchange at all.
    # - the SECOND join stays SortMergeJoin deliberately: its sorted
    #   side (b_sets) comes pre-sorted from the checkpoint, so the only
    #   sort left is the CANDIDATES-sized intermediate (doc ids +
    #   sh_a) — corpus-size-independent. Hashing it instead would put
    #   shingle arrays on a build side, which OOMs small heaps
    #   (an 8 GB child died in the r3 A/B; SMJ spills instead). An
    #   exploded (doc, shingle)-row verify was also measured:
    #   memory-safe but ~2-4x slower — its two tokens-sized shuffles
    #   dominate regardless of candidate count.
    # AQE must be off while the checkpoint materializes: under AQE the
    # captured LogicalRDD reports UnknownPartitioning (the adaptive
    # plan's partitioning isn't final at capture time), which would
    # silently re-introduce both corpus-sized exchanges+sorts. Verified
    # by plan inspection; the consuming joins still run under AQE.
    sess = docs.sparkSession
    n_part = sess.sparkContext.defaultParallelism
    aqe_was = sess.conf.get("spark.sql.adaptive.enabled", "true")
    sess.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        sets_ = (
            docs.select("doc_id", _shingles().alias("sh_arr"))
            .repartition(n_part, "doc_id")
            .sortWithinPartitions("doc_id")
            .localCheckpoint()
        )
    finally:
        sess.conf.set("spark.sql.adaptive.enabled", aqe_was)
    a_sets = sets_.select(
        F.col("doc_id").alias("doc_a"), F.col("sh_arr").alias("sh_a")
    )
    b_sets = sets_.select(
        F.col("doc_id").alias("doc_b"), F.col("sh_arr").alias("sh_b")
    )
    verified = (
        cand.hint("shuffle_hash").join(a_sets, "doc_a")
        .join(b_sets, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
            .alias("ni"),
            F.size("sh_a").cast("long").alias("sa"),
            F.size("sh_b").cast("long").alias("sb"),
        )
        .select(
            "doc_a",
            "doc_b",
            "ni",
            (
                F.col("ni").cast("double")
                / (F.col("sa") + F.col("sb") - F.col("ni")).cast("double")
            ).alias("jaccard"),
        )
    )
    # ni > 0 guard: band collisions between docs sharing ZERO shingles
    # (hash-collision candidates) must not pass a threshold of 0.0 — the
    # contract is "near-dup pairs share at least one shingle".
    return verified.where(
        (F.col("jaccard") >= threshold) & (F.col("ni") > 0)
    ).drop("ni")


def _minhash_lsh_pairs_band_local(
    docs: DataFrame,
    threshold: float,
    k: int,
    band_rows: int,
    bucket_budget: int | None = None,
    hash_shingles: bool = False,
) -> DataFrame:
    """Band-local exact-Jaccard verification (the structural
    alternative the r3 scaling diagnosis pointed at: remove the global
    candidate relation entirely).

    One exploded-shingle scan feeds ONE aggregation producing, per doc,
    the k MinHash values AND the distinct-shingle set (collect_list of
    the already-distinct exploded shingles — map-side partial
    aggregation keeps the exchange at ~1 row/doc). Band keys explode
    map-side with the set attached; ONE repartition(band_key) +
    sortWithinPartitions makes every bucket a contiguous run, and a
    ``mapInArrow`` kernel verifies all intra-bucket pairs in one pass
    per Arrow batch — NOT one Python call per bucket (an earlier
    applyInPandas form paid ~1.6 M per-group invocations at 2M docs;
    the run-boundary kernel is the same semantics at batch granularity).
    Inside the kernel the batch's shingle strings are dictionary-encoded
    ONCE (Arrow C++, exact string equality — no hashing, no collisions)
    and intersections run on int32 code arrays via numpy. A pair
    colliding in j bands is verified j times (bounded by n_bands) and
    deduped AFTER the threshold filter, when the relation is
    verified-pairs-sized.

    Exactness: jaccard = ni/(sa+sb-ni) on Python ints is one
    correctly-rounded IEEE-754 double division — bit-identical to the
    global mode's Spark-side double division and to the DuckDB oracle.
    The ni > 0 hash-collision guard matches the global mode.
    """
    sh = _doc_shingles(docs)
    aggs = [
        F.min(F.expr(hex32_sql(f"concat('{i}:', shingle)"))).alias(f"mh{i}")
        for i in range(k)
    ]
    # hash_shingles (opt-in, the 100 TB exchange shape): ship each
    # doc's shingle set as xxhash64 values instead of strings — the
    # band exchange (n_bands copies of every set, the measured
    # single-box wall at 8M docs) carries 8 bytes/shingle instead of a
    # word-3-gram string. Intersection counts on 64-bit hashes equal
    # true counts unless two DIFFERENT shingles of a compared pair
    # collide: P ~ |A||B|/2^64 ~ 1e-15 per pair, ~1e-5 expected wrong
    # pairs across a 10^10-candidate corpus — quantified, documented,
    # and OFF by default (the default stays bit-exact by construction;
    # the Arrow kernel is unchanged — dictionary_encode works on int64
    # exactly as on strings).
    if hash_shingles:
        aggs.append(
            F.collect_list(F.xxhash64("shingle")).alias("sh_arr")
        )
    else:
        aggs.append(F.collect_list("shingle").alias("sh_arr"))
    sig = sh.groupBy("doc_id").agg(*aggs)
    banded = sig.select(
        F.explode(F.array(*_band_key_exprs(k, band_rows))).alias(
            "band_key"
        ),
        "doc_id",
        "sh_arr",
    )
    if bucket_budget is not None:
        # Hot-bucket task budget (r5): a band bucket of B docs verifies
        # O(B^2) pairs in ONE Arrow run — unbounded at 100 TB. Triangle
        # salting bounds it: docs in a bucket larger than the budget
        # get salt s = pmod(hash(doc_id), g) with g = ceil(B/budget),
        # and each doc replicates into the g cells {(min(s,t),
        # max(s,t)) : t in [0, g)}. A pair with salts (s1 <= s2)
        # co-locates in EXACTLY the (s1, s2) cell, where the kernel's
        # salt filter verifies it exactly once — every cell holds
        # ~2B/g docs, so per-task work is budget-bounded while the
        # verified relation stays identical (pytest-pinned vs global).
        sizes = banded.groupBy("band_key").agg(
            F.count("*").alias("__bsz")
        )
        g = f"int(ceil(__bsz / CAST({int(bucket_budget)} AS DOUBLE)))"
        banded = (
            banded.join(sizes, "band_key")
            .withColumn("__g", F.expr(g))
            .withColumn("salt", F.expr("pmod(hash(doc_id), __g)"))
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(0, __g - 1), t -> "
                        "struct(least(t, salt) AS a, "
                        "greatest(t, salt) AS b))"
                    )
                ).alias("__c"),
                "band_key",
                "doc_id",
                "sh_arr",
                "salt",
            )
            .select(
                F.expr(
                    "concat(band_key, ':', __c.a, ':', __c.b)"
                ).alias("band_key"),
                F.col("__c.a").alias("cell_a"),
                F.col("__c.b").alias("cell_b"),
                "salt",
                "doc_id",
                "sh_arr",
            )
        )
    part = banded.repartition("band_key").sortWithinPartitions(
        "band_key", "doc_id"
    )
    pairs = part.mapInArrow(
        _make_band_verifier(threshold),
        "doc_a long, doc_b long, jaccard double",
    )
    # cross-band dedup on verified pairs only; jaccard is identical in
    # every band a pair collides in, so max == the value
    return pairs.groupBy("doc_a", "doc_b").agg(
        F.max("jaccard").alias("jaccard")
    )


def _make_band_verifier(threshold: float):
    """Partition-wise Arrow kernel for band-local verification.

    Input batches arrive sorted by (band_key, doc_id) within the
    partition; buckets are contiguous runs but MAY span Arrow batch
    boundaries, so the trailing (possibly incomplete) run of each batch
    is carried into the next before processing. All per-string work is
    Arrow C++ (list_flatten + dictionary_encode); the Python loop only
    walks run boundaries and candidate pairs, intersecting int32 code
    arrays with numpy (assume_unique holds: shingles are
    array_distinct'ed per doc before collect_list)."""
    import numpy as np
    import pyarrow as pa

    empty = pa.RecordBatch.from_pydict(
        {
            "doc_a": pa.array([], type=pa.int64()),
            "doc_b": pa.array([], type=pa.int64()),
            "jaccard": pa.array([], type=pa.float64()),
        }
    )

    def _process(tbl: "pa.Table") -> "pa.RecordBatch":
        import pyarrow.compute as pc

        if tbl.num_rows == 0:
            return empty
        keys = tbl.column("band_key").combine_chunks()
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        salted = "salt" in tbl.column_names
        if salted:
            salts = tbl.column("salt").to_numpy(zero_copy_only=False)
            cell_a = tbl.column("cell_a").to_numpy(zero_copy_only=False)
            cell_b = tbl.column("cell_b").to_numpy(zero_copy_only=False)
        arr_col = tbl.column("sh_arr").combine_chunks()
        lens = pc.list_value_length(arr_col).to_numpy(
            zero_copy_only=False
        )
        offs = np.empty(len(lens) + 1, dtype=np.int64)
        offs[0] = 0
        np.cumsum(lens, out=offs[1:])
        codes = (
            pc.dictionary_encode(pc.list_flatten(arr_col))
            .indices.to_numpy(zero_copy_only=False)
        )
        # run boundaries over band_key (dictionary codes compare cheap)
        kcodes = pc.dictionary_encode(keys).indices.to_numpy(
            zero_copy_only=False
        )
        bounds = np.flatnonzero(np.diff(kcodes)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(kcodes)]))
        da: list[int] = []
        db: list[int] = []
        jac: list[float] = []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            row_codes = [
                codes[offs[r]: offs[r + 1]] for r in range(s, e)
            ]
            for i in range(m - 1):
                ci = row_codes[i]
                sa = len(ci)
                for j in range(i + 1, m):
                    if salted:
                        # a salted pair belongs to exactly one cell:
                        # (min(salts), max(salts)) — skip it elsewhere
                        si, sj = salts[s + i], salts[s + j]
                        lo, hi = (si, sj) if si <= sj else (sj, si)
                        if lo != cell_a[s] or hi != cell_b[s]:
                            continue
                    cj = row_codes[j]
                    ni = np.intersect1d(
                        ci, cj, assume_unique=True
                    ).size
                    if ni == 0:
                        continue
                    v = ni / (sa + len(cj) - ni)
                    if v >= threshold:
                        da.append(int(ids[s + i]))
                        db.append(int(ids[s + j]))
                        jac.append(v)
        return pa.RecordBatch.from_pydict(
            {
                "doc_a": pa.array(da, type=pa.int64()),
                "doc_b": pa.array(db, type=pa.int64()),
                "jaccard": pa.array(jac, type=pa.float64()),
            }
        )

    def verifier(batches):
        import pyarrow as pa

        pending: "pa.Table | None" = None
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            if pending is not None:
                tbl = pa.concat_tables([pending, tbl]).combine_chunks()
            if tbl.num_rows == 0:
                pending = None
                continue
            keys = tbl.column("band_key")
            last_key = keys[tbl.num_rows - 1]
            # first row of the trailing run: binary search not needed,
            # runs are short — scan back while key == last_key
            cut = tbl.num_rows - 1
            while cut > 0 and keys[cut - 1] == last_key:
                cut -= 1
            if cut == 0:
                # whole table is one run; hold it (next batch may extend)
                pending = tbl
                continue
            yield _process(tbl.slice(0, cut))
            pending = tbl.slice(cut)
        if pending is not None:
            yield _process(pending)

    return verifier


def dedup_clusters(
    docs: DataFrame, threshold: float = 0.2
) -> DataFrame:
    """Near-duplicate CLUSTERS: what a corpus build actually ships.
    Pairwise near-dup relations are not transitive, so "drop one of each
    pair" under-deletes; the standard resolution is connected components
    over the pair graph, keep one canonical doc per component.

    Pipeline: minhash_lsh_pairs (banded candidates + exact-Jaccard
    verify) -> undirected connected components by iterative min-label
    propagation (operators/graph.connected_components — O(diameter)
    co-partitioned hash joins, no driver-side graph) -> left-join back
    onto all docs so singletons become their own cluster.

    Returns (doc_id, cluster_id, is_canonical): cluster_id is the min
    doc_id reachable through near-dup pairs; is_canonical marks the one
    row per cluster a dedup pass would keep. Scale: near-dup clusters in
    real corpora have tiny diameter (dup families are dense), so the
    propagation loop converges in a handful of rounds; each round is a
    shuffle join on doc_id with AQE handling residual skew.
    """
    from streamevmon_spark.operators.graph import connected_components

    pairs = minhash_lsh_pairs(docs, threshold)
    edges = pairs.select(
        F.col("doc_a").alias("src_uid"), F.col("doc_b").alias("dst_uid")
    )
    comp = connected_components(edges).select(
        F.col("uid").alias("doc_id"), "component"
    )
    out = (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("cluster_id"),
        )
    )
    return out.withColumn(
        "is_canonical", F.col("doc_id") == F.col("cluster_id")
    )


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """32-bit SimHash over (non-distinct) tokens: bit b of the
    fingerprint is 1 iff sum over tokens of (+1 if bit b of hex32(token)
    else -1) > 0. Portable arithmetic only (floor-div/mod)."""
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).withColumn("h", F.expr(hex32_sql("token")))
    bit_sums = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when((F.col("h").cast("long") / (1 << b)).cast("long") % 2 == 1, 1)
                .otherwise(-1)
            ).alias(f"s{b}")
            for b in range(32)
        ]
    )
    fp = None
    for b in range(32):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return bit_sums.select("doc_id", fp.cast("long").alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance — banded, never
    all-pairs.

    Pigeonhole banding: split the 32 fingerprint bits into
    ``max_hamming + 1`` contiguous bands. Two fingerprints within Hamming
    distance ``max_hamming`` differ in at most ``max_hamming`` bit
    positions, so at least one band is bit-identical on both sides —
    candidates are exactly the pairs sharing an (band_idx, band_value)
    key, found with an equi-join (shuffle on band key), then verified
    with an exact ``bit_count(xor)`` on the candidate set only. No
    theta/cartesian join anywhere: cost is O(sum over band-buckets of
    bucket^2) with 2^(32/(h+1))-way dispersion per band, the same shape
    as MinHash LSH banding above.
    """
    fp = simhash_fingerprints(docs)
    n_bands = max_hamming + 1
    # contiguous bit ranges covering [0, 32): first (32 % n_bands) bands
    # get one extra bit
    base, extra = divmod(32, n_bands)
    bands = []
    start = 0
    for i in range(n_bands):
        width = base + (1 if i < extra else 0)
        mask = (1 << width) - 1
        bands.append(
            F.concat_ws(
                "_",
                F.lit(i),
                (
                    F.shiftright(F.col("simhash"), start)
                    .bitwiseAND(F.lit(mask))
                ).cast("string"),
            )
        )
        start += width
    banded = fp.select(
        "doc_id", "simhash", F.explode(F.array(*bands)).alias("band_key")
    ).localCheckpoint()  # see minhash_lsh_pairs: stop the self-join
    # re-running the token->fingerprint aggregation once per side
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, F.col("a.band_key") == F.col("b.band_key"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return cand
