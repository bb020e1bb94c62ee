"""Codec round-trip vectors (FIXTURES.md §3) — pure NumPy, no Spark."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from streamevmon_spark.functions.codecs import (
    dod_decode,
    dod_encode,
    gorilla_decode,
    gorilla_encode,
)


def _rt_f(a):
    return gorilla_decode(gorilla_encode(np.asarray(a, dtype=np.float64)))


def _rt_t(a):
    return dod_decode(dod_encode(np.asarray(a, dtype=np.int64)))


def test_gorilla_edge_vectors():
    cases = [
        [],
        [0.0],
        [1.5, 1.5, 1.5, 1.5],                      # XOR=0 path
        [1.0, -1.0, 2.0, -2.0],                    # alternating signs
        [5e-324, 2.2250738585072014e-308, 1.0],    # denormals
        [1.7976931348623157e308, -1.7976931348623157e308],
        [12.0, 12.0000001, 12.0000002, 24.0, 12.0],
        list(np.linspace(0, 1, 100)),               # window-reuse runs
    ]
    for c in cases:
        got = _rt_f(c)
        assert got.tolist() == list(np.asarray(c, dtype=np.float64)), c


def test_gorilla_nan_bit_preserved():
    a = np.array([1.0, np.nan, 2.0, np.nan], dtype=np.float64)
    got = _rt_f(a)
    assert np.array_equal(
        got.view(np.uint64), a.view(np.uint64)
    )  # bit-exact incl. NaN payloads


def test_gorilla_compresses_constant_series():
    a = np.full(10_000, 42.5)
    blob = gorilla_encode(a)
    assert len(blob) < 4 + 8 + 10_000 // 8 + 16  # ~1 bit per repeat


def test_dod_edge_vectors():
    cases = [
        [],
        [0],
        [1_704_067_200_000_000],
        [0, 60_000_000, 120_000_000, 180_000_000],  # dod=0 path
        [0, 1, 3, 6, 10],                            # growing deltas
        [100, 90, 85, 200],                          # out-of-order input
        [0, 10**15, 2 * 10**15 + 7],                 # huge jumps
        [-5, -3, -1, 0, 2],                          # negatives
    ]
    for c in cases:
        assert _rt_t(c).tolist() == c, c


def test_dod_compresses_regular_cadence():
    ts = np.arange(0, 10_000) * 60_000_000 + 1_704_067_200_000_000
    blob = dod_encode(ts)
    assert len(blob) < 4 + 16 + 10_000 // 8 + 16  # ~1 bit per regular step


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=False, allow_infinity=True, width=64), max_size=80
    )
)
def test_gorilla_property_roundtrip(xs):
    a = np.asarray(xs, dtype=np.float64)
    assert np.array_equal(
        gorilla_decode(gorilla_encode(a)).view(np.uint64), a.view(np.uint64)
    )


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**62), max_value=2**62), max_size=80
    )
)
def test_dod_property_roundtrip(xs):
    assert _rt_t(xs).tolist() == xs


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(allow_nan=True, allow_infinity=True, width=64),
            max_size=40,
        ),
        min_size=1, max_size=6,
    )
)
def test_gorilla_encode_many_equals_per_group(groups):
    """The batched encoder's per-group blobs (word-scatter packing +
    byte-aligned group slicing) must equal encoding each group alone."""
    from streamevmon_spark.functions.codecs import gorilla_encode_many

    flat = np.concatenate(
        [np.asarray(g, dtype=np.float64) for g in groups]
    ) if any(len(g) for g in groups) else np.empty(0)
    starts = np.cumsum([0] + [len(g) for g in groups[:-1]]).astype(np.int64)
    many = gorilla_encode_many(flat, starts)
    for g, blob in zip(groups, many):
        assert blob == gorilla_encode(np.asarray(g, dtype=np.float64))


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.lists(
            st.integers(min_value=-(2**62), max_value=2**62), max_size=40
        ),
        min_size=1, max_size=6,
    )
)
def test_dod_encode_many_equals_per_group(groups):
    from streamevmon_spark.functions.codecs import dod_encode_many

    flat = np.concatenate(
        [np.asarray(g, dtype=np.int64) for g in groups]
    ) if any(len(g) for g in groups) else np.empty(0, dtype=np.int64)
    starts = np.cumsum([0] + [len(g) for g in groups[:-1]]).astype(np.int64)
    many = dod_encode_many(flat, starts)
    for g, blob in zip(groups, many):
        assert blob == dod_encode(np.asarray(g, dtype=np.int64))
