"""Corpus assembly operators: split, vocabulary, contamination,
sequence packing — the last mile of a training-data pipeline after
dedup/quality/sampling have chosen the documents.

All four are deterministic (portable-hash keyed or doc_id ordered) so
each carries a bit-exact DuckDB oracle; none holds corpus-sized state
on the driver.

Scale shapes:
- ``split_corpus``: pure filter-free projection (a CASE over the hash
  key) — embarrassingly parallel.
- ``vocabulary``: token groupBy (map-side partial agg) then global
  top-k via ``orderBy().limit(k)`` — Spark executes TakeOrdered as
  per-partition heaps merged on the driver, O(k) driver memory, never
  a global sort.
- ``contamination``: shingle equi-join between the (small) benchmark
  side and the corpus — broadcast when the benchmark fits, shuffle
  join otherwise; AQE decides. Optional document-frequency cap like
  ngram_jaccard.
- ``pack_sequences``: greedy packing is inherently sequential, so it
  is sharded: a deterministic hash shard per document, greedy fold in
  doc_id order WITHIN each shard (partition-wise Arrow kernel), pack
  key = (shard, pack_in_shard). Shards scale the sequential step the
  same way the reference's keyBy scales its per-stream folds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamevmon_spark.functions.porthash import hex32_sql

HASH_SPACE = 1 << 32


def split_corpus(
    docs: DataFrame,
    ratios: dict[str, float] | None = None,
    seed: str = "split1",
) -> DataFrame:
    """Deterministic train/val/test assignment: the hash key falls into
    consecutive ratio bands (band edges in insertion order). Same seed
    => same split across runs and engines; disjoint and exhaustive by
    construction."""
    ratios = ratios or {"train": 0.9, "val": 0.05, "test": 0.05}
    if abs(sum(ratios.values()) - 1.0) > 1e-9:
        raise ValueError(f"ratios must sum to 1, got {ratios}")
    key = F.expr(
        hex32_sql(f"concat('{seed}', ':', CAST(doc_id AS STRING))")
    ).cast("long")
    edges = []
    acc = 0.0
    for name, r in ratios.items():
        acc += r
        edges.append((name, int(acc * HASH_SPACE)))
    expr = None
    for name, hi in edges[:-1]:
        cond = key < hi
        expr = (
            F.when(cond, name) if expr is None else expr.when(cond, name)
        )
    expr = (
        expr.otherwise(edges[-1][0])
        if expr is not None
        else F.lit(edges[-1][0])
    )
    return docs.select(
        "doc_id", key.alias("split_key"), expr.alias("split")
    )


def vocabulary(docs: DataFrame, top_k: int = 100) -> DataFrame:
    """Top-k corpus vocabulary by whitespace-token frequency, ties
    broken lexically. The global order is materialized only over the k
    survivors (TakeOrdered merge), then ranked driver-light with a
    window over k rows."""
    from pyspark.sql import Window

    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    topk = counts.orderBy(F.desc("cnt"), F.asc("token")).limit(top_k)
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    return topk.withColumn(
        "rank", F.row_number().over(w).cast("int")
    )


def _shingle_col(n: int = 3):
    from streamevmon_spark.operators.dedup import _shingles

    return _shingles(n)


def contamination(
    docs: DataFrame,
    benchmark_pred: str = "doc_id % 10 = 0",
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Benchmark-contamination report: for every train document, how
    many of its distinct word-3-gram shingles also appear in the
    benchmark set (`benchmark_pred` selects benchmark rows; default:
    every 10th doc_id). Emits per-train-doc counts and the ratio a
    decontamination filter would threshold on.

    ``max_doc_freq`` drops ubiquitous shingles from BOTH sides before
    the join (same cap semantics as ngram_jaccard_pairs) so one
    stopword 3-gram cannot fan a train doc into millions of benchmark
    rows."""
    sh = docs.select(
        "doc_id",
        F.expr(benchmark_pred).alias("is_bench"),
        F.explode(_shingle_col()).alias("shingle"),
    )
    if max_doc_freq is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") <= max_doc_freq)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle")
    train = sh.where(~F.col("is_bench")).select("doc_id", "shingle")
    bench = sh.where(F.col("is_bench")).select("shingle").distinct()
    sizes = train.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles")
    )
    hits = (
        train.join(bench, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_contaminated"))
    )
    return (
        sizes.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_contaminated", F.lit(0).cast("long")).alias(
                "n_contaminated"
            ),
        )
        .withColumn(
            "contamination_ratio",
            F.col("n_contaminated").cast("double")
            / F.col("n_shingles").cast("double"),
        )
    )


PACK_SCHEMA = (
    "doc_id long, shard int, pack_id long, offset_tokens long, "
    "n_tokens long"
)


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 512,
    n_shards: int = 8,
    seed: str = "pack1",
) -> DataFrame:
    """Greedy sequence packing: concatenate documents (in doc_id order)
    into packs of at most ``seq_len`` whitespace tokens; a document
    that would overflow the current pack starts the next one. Documents
    longer than seq_len get a pack of their own (never split — the
    contract a loss-masking trainer wants).

    Sharded to scale the sequential fold: shard = hash(doc_id) mod
    n_shards, greedy runs independently per shard in a partition-wise
    Arrow kernel sorted by doc_id. Emits (doc_id, shard, pack_id,
    offset_tokens, n_tokens); pack_id is shard-local.
    """
    from streamevmon_spark.operators._partitionwise import (
        group_starts,
        partitionwise_apply,
    )

    prepped = docs.select(
        "doc_id",
        F.expr(
            "CAST(("
            + hex32_sql(f"concat('{seed}', ':', CAST(doc_id AS STRING))")
            + f") % {n_shards} AS INT)"
        ).alias("shard"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        starts = group_starts(pdf, ["shard"])
        ends = np.concatenate([starts[1:], [len(pdf)]])
        toks = pdf["n_tokens"].to_numpy(np.int64)
        pack = np.empty(len(pdf), np.int64)
        off = np.empty(len(pdf), np.int64)
        for s, e in zip(starts, ends):
            p, fill = 0, 0
            for i in range(s, e):
                t = toks[i]
                if fill > 0 and fill + t > seq_len:
                    p, fill = p + 1, 0
                pack[i] = p
                off[i] = fill
                fill += t
        out = pdf[["doc_id", "shard", "n_tokens"]].copy()
        out["pack_id"] = pack
        out["offset_tokens"] = off
        return out[
            ["doc_id", "shard", "pack_id", "offset_tokens", "n_tokens"]
        ]

    return partitionwise_apply(
        prepped, ["shard"], ["doc_id"], kernel, PACK_SCHEMA
    )
