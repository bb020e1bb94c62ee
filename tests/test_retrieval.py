"""BM25 retrieval (operators/retrieval.py) and PII scrubbing
(operators/scrub.py): worked examples, the ln cross-engine pin, and
plan-shape checks. Cross-engine bit-exactness is covered by the driver
gate (bm25_scores / pii_scrub oracles)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from streamevmon_spark.operators.retrieval import bm25_scores
from streamevmon_spark.operators.scrub import pii_scrub


def _mk_docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )


def test_bm25_worked_example(spark):
    docs = _mk_docs(
        spark,
        [
            "hash join beats sort join",          # dl=5, tf(hash)=1
            "hash hash table scan",                # dl=4, tf(hash)=2 tf(table)=1 tf(scan)=1
            "nothing relevant here at all today",  # dl=6, no match
        ],
    )
    out = {
        r["doc_id"]: r
        for r in bm25_scores(docs, ["hash", "table"]).collect()
    }
    assert set(out) == {0, 1}
    assert out[0]["n_terms"] == 1 and out[1]["n_terms"] == 2
    n, avgdl, k1, b = 3, 15.0 / 3.0, 1.2, 0.75

    def contrib(tf, df, dl):
        idf = math.log(1.0 + (float(n - df) + 0.5) / (float(df) + 0.5))
        return idf * (
            float(tf)
            / (float(tf) + k1 * (1.0 - b + b * (float(dl) / avgdl)))
        )

    # scores agree with the local recomputation up to the JVM-vs-libm
    # ln gap (<= 1 ULP per contribution; observed live on ln(1.6) for
    # doc 0's idf operand) — the gate compares the 1e-6-quantized
    # projection, which this gap cannot move
    assert math.isclose(
        out[0]["score"], 0.0 + contrib(1, 2, 5), rel_tol=1e-13
    )
    assert math.isclose(
        out[1]["score"],
        0.0 + contrib(2, 2, 4) + contrib(1, 1, 4),
        rel_tol=1e-13,
    )


def test_bm25_ln_within_1ulp_of_libm(spark):
    # the transcendental hazard, pinned: HotSpot's ln intrinsic may
    # differ from CPython/glibc (= DuckDB) libm, but by at most 1 ULP
    # on the idf operand shapes BM25 produces. ln(1.6) (n=3, df=2) is
    # a known-divergent operand — which is exactly why the gate
    # projection quantizes scores to 1e-6 instead of comparing raw
    # doubles.
    vals = [
        1.0 + (float(n - df) + 0.5) / (float(df) + 0.5)
        for n in (1, 2, 3, 10, 1000, 10_000, 1_000_000)
        for df in (1, 2, 3, 7, 500, 9999)
        if df <= n
    ]
    got = (
        spark.createDataFrame([(v,) for v in vals], "v double")
        .select(F.expr("ln(v)").alias("l"))
        .collect()
    )
    for row, v in zip(got, vals):
        assert abs(row["l"] - math.log(v)) <= math.ulp(math.log(v)), v


def test_quantize_micro_cross_engine(spark):
    # the quantizer itself is bit-identical across engines on values
    # separated by more than the quantum, including values 1 JVM-ln-ULP
    # apart (they land in the same 1e-6 cell)
    import duckdb

    from streamevmon_spark.operators.retrieval import (
        quantize_micro,
        quantize_micro_sql,
    )

    vals = [0.0, 0.2136380132935162, 0.21363801329351617,
            1.5, 3.9999994, 17.123456789, 123456.654321]
    got = (
        spark.createDataFrame([(v,) for v in vals], "v double")
        .select(quantize_micro(F.col("v")).alias("q"))
        .collect()
    )
    exp = duckdb.sql(
        "SELECT " + quantize_micro_sql("v") + " AS q FROM (SELECT "
        "unnest(" + str(vals) + "::DOUBLE[]) AS v)"
    ).fetchall()
    for g, e in zip(got, exp):
        assert g["q"] == e[0], (g["q"].hex(), e[0].hex())
    # the two 1-ULP-apart ln-derived values collapsed to one cell
    assert got[1]["q"] == got[2]["q"]


def test_pii_scrub_worked_example(spark):
    docs = _mk_docs(
        spark,
        [
            "mail bob.smith+x@corp.example.com now",
            "card 4111 1111-1111 1111 ssn 123-45-6789",
            "from 10.0.200.77 call +14155551234",
            "clean text with no identifiers",
        ],
    )
    out = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert out[0]["scrubbed"] == "mail <EMAIL> now"
    assert out[0]["n_email"] == 1
    assert out[1]["scrubbed"] == "card <CARD> ssn <SSN>"
    assert out[1]["n_card"] == 1 and out[1]["n_ssn"] == 1
    assert out[2]["scrubbed"] == "from <IP> call <PHONE>"
    assert out[2]["n_ipv4"] == 1 and out[2]["n_phone"] == 1
    assert out[3]["scrubbed"] == "clean text with no identifiers"
    assert all(
        out[3][c] == 0
        for c in ("n_email", "n_card", "n_ssn", "n_ipv4", "n_phone")
    )


def test_pii_scrub_idempotent(spark):
    docs = _mk_docs(spark, ["mail a@b.org ip 1.2.3.4 tel +12345678"])
    once = pii_scrub(docs)
    twice = pii_scrub(
        once.select(
            "doc_id",
            F.col("scrubbed").alias("text"),
        )
    )
    r1, r2 = once.collect()[0], twice.collect()[0]
    assert r1["scrubbed"] == r2["scrubbed"]
    assert all(
        r2[c] == 0
        for c in ("n_email", "n_card", "n_ssn", "n_ipv4", "n_phone")
    )


def test_pii_scrub_plan_map_only(spark):
    docs = _mk_docs(spark, ["x"])
    plan = (
        pii_scrub(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
