"""Deterministic merging t-digest sketch (Dunning & Ertl) in NumPy.

Mergeable percentile sketches let the 1h/1d tiers aggregate 1m-tier
sketches incrementally instead of rescanning raw data — the scale path
for percentiles at 10^12 turns (exact sorted-array percentiles stay the
correctness path at test scale; see operators/rollup.py).

Determinism: inputs are sorted before clustering and merges concatenate
centroid lists in sorted order, so build(merge(a,b)) is a pure function
of the multiset of values — independent of partition order. That is the
property that lets salted/partitioned execution produce identical blobs.

Serialization: little-endian [uint32 n_centroids | float64 count, min,
max | float64 means[n] | float64 weights[n]] — a BinaryType column.

Analogous role in the reference: the windowed commons-math3 Percentile
(reference: detectors/baseline/BaselineDetector.scala:135-146), which is
exact but unmergeable — the engine upgrade is the mergeable sketch.
"""

from __future__ import annotations

import struct

import numpy as np

DEFAULT_COMPRESSION = 100.0


def _k_scale(q: np.ndarray, delta: float) -> np.ndarray:
    # k1 scale function: delta/(2*pi) * asin(2q-1)
    return (delta / (2.0 * np.pi)) * np.arcsin(2.0 * q - 1.0)


def _cluster(
    means: np.ndarray, weights: np.ndarray, delta: float
) -> tuple[np.ndarray, np.ndarray]:
    """Greedy left-to-right merge of (sorted-by-mean) weighted points into
    centroids bounded by the k1 scale function. Deterministic.

    Scalar math.asin in the loop (identical IEEE results to np.arcsin on
    float64 scalars) — the loop runs per input point, so array-allocating
    per-point k-scale evaluation would dominate sketch builds."""
    from math import asin, pi

    total = float(weights.sum())
    c = delta / (2.0 * pi)
    out_means: list[float] = []
    out_weights: list[float] = []
    cum = 0.0  # weight before current centroid
    cur_w = float(weights[0])
    cur_sum = float(means[0]) * cur_w
    m = means.tolist()
    ws = weights.tolist()
    for i in range(1, len(m)):
        w = ws[i]
        q0 = cum / total
        q1 = (cum + cur_w + w) / total
        if c * (asin(2.0 * q1 - 1.0) - asin(2.0 * q0 - 1.0)) <= 1.0:
            cur_w += w
            cur_sum += m[i] * w
        else:
            out_means.append(cur_sum / cur_w)
            out_weights.append(cur_w)
            cum += cur_w
            cur_w = w
            cur_sum = m[i] * w
    out_means.append(cur_sum / cur_w)
    out_weights.append(cur_w)
    return np.asarray(out_means), np.asarray(out_weights)


class TDigest:
    __slots__ = ("means", "weights", "count", "vmin", "vmax", "delta")

    def __init__(
        self,
        means: np.ndarray,
        weights: np.ndarray,
        count: float,
        vmin: float,
        vmax: float,
        delta: float = DEFAULT_COMPRESSION,
    ) -> None:
        self.means = means
        self.weights = weights
        self.count = count
        self.vmin = vmin
        self.vmax = vmax
        self.delta = delta

    @classmethod
    def build(
        cls, values: np.ndarray, delta: float = DEFAULT_COMPRESSION
    ) -> "TDigest":
        a = np.asarray(values, dtype=np.float64)
        a = a[~np.isnan(a)]
        if a.size == 0:
            return cls(np.empty(0), np.empty(0), 0.0, np.nan, np.nan, delta)
        a = np.sort(a)  # determinism: canonical order
        m, w = _cluster(a, np.ones_like(a), delta)
        return cls(m, w, float(a.size), float(a[0]), float(a[-1]), delta)

    def merge(self, other: "TDigest") -> "TDigest":
        if self.count == 0:
            return other
        if other.count == 0:
            return self
        means = np.concatenate([self.means, other.means])
        weights = np.concatenate([self.weights, other.weights])
        order = np.argsort(means, kind="stable")
        m, w = _cluster(means[order], weights[order], self.delta)
        return TDigest(
            m,
            w,
            self.count + other.count,
            min(self.vmin, other.vmin),
            max(self.vmax, other.vmax),
            self.delta,
        )

    def quantile(self, q: float) -> float:
        if self.count == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        target = q * self.count
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if target <= cum[0]:
            return float(self.vmin + (self.means[0] - self.vmin) * max(
                0.0, target / cum[0] if cum[0] > 0 else 0.0
            ))
        if target >= cum[-1]:
            span = self.count - cum[-1]
            frac = (target - cum[-1]) / span if span > 0 else 0.0
            return float(
                self.means[-1] + (self.vmax - self.means[-1]) * min(1.0, frac)
            )
        i = int(np.searchsorted(cum, target) - 1)
        frac = (target - cum[i]) / (cum[i + 1] - cum[i])
        return float(self.means[i] + (self.means[i + 1] - self.means[i]) * frac)

    def to_bytes(self) -> bytes:
        n = self.means.size
        head = struct.pack("<Iddd", n, self.count, self.vmin, self.vmax)
        return (
            head
            + self.means.astype("<f8").tobytes()
            + self.weights.astype("<f8").tobytes()
        )

    @classmethod
    def from_bytes(
        cls, blob: bytes, delta: float = DEFAULT_COMPRESSION
    ) -> "TDigest":
        n, count, vmin, vmax = struct.unpack_from("<Iddd", blob, 0)
        off = struct.calcsize("<Iddd")
        means = np.frombuffer(blob, dtype="<f8", count=n, offset=off).copy()
        weights = np.frombuffer(
            blob, dtype="<f8", count=n, offset=off + 8 * n
        ).copy()
        return cls(means, weights, count, vmin, vmax, delta)
