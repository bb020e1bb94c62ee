"""t-digest: determinism, mergeability, serialization, quantile accuracy."""

from __future__ import annotations

import numpy as np

from streamevmon_spark.functions.tdigest import TDigest

RNG = np.random.default_rng(42)


def test_quantile_accuracy_vs_exact():
    a = RNG.normal(100.0, 15.0, 50_000)
    td = TDigest.build(a)
    for q in (0.01, 0.05, 0.5, 0.95, 0.99):
        exact = np.quantile(a, q)
        est = td.quantile(q)
        spread = np.quantile(a, 0.99) - np.quantile(a, 0.01)
        assert abs(est - exact) < 0.01 * spread, (q, est, exact)


def test_merge_equals_build_on_union_distribution():
    a, b = RNG.exponential(5.0, 20_000), RNG.exponential(5.0, 20_000)
    merged = TDigest.build(a).merge(TDigest.build(b))
    full = np.concatenate([a, b])
    assert merged.count == 40_000
    for q in (0.5, 0.95, 0.99):
        assert abs(merged.quantile(q) - np.quantile(full, q)) < 0.05 * (
            np.quantile(full, 0.99) - np.quantile(full, 0.01)
        ) + 1e-9


def test_partition_order_independence():
    """The salted/partitioned property: merging per-partition sketches in
    any order yields identical bytes when inputs are the same multiset."""
    a = RNG.uniform(0, 1000, 9_000)
    parts = np.array_split(a, 9)
    d1 = TDigest.build(np.concatenate(parts))
    # note: build sorts, so build(concat(any permutation)) is identical
    d2 = TDigest.build(np.concatenate(parts[::-1]))
    assert d1.to_bytes() == d2.to_bytes()


def test_serialization_roundtrip():
    td = TDigest.build(RNG.normal(0, 1, 5_000))
    rt = TDigest.from_bytes(td.to_bytes())
    assert rt.count == td.count
    assert np.array_equal(rt.means, td.means)
    assert np.array_equal(rt.weights, td.weights)
    for q in (0.1, 0.5, 0.9):
        assert rt.quantile(q) == td.quantile(q)


def test_empty_and_single():
    assert np.isnan(TDigest.build(np.array([])).quantile(0.5))
    td = TDigest.build(np.array([7.0]))
    assert td.quantile(0.5) == 7.0
    rt = TDigest.from_bytes(td.to_bytes())
    assert rt.quantile(0.99) == 7.0
