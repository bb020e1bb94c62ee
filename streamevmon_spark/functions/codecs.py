"""Gorilla XOR float codec + delta-of-delta timestamp codec.

Pure-NumPy bit-packing producing compact ``bytes`` blobs for the rollup
tables' chunk columns (north rule: "Gorilla XOR float encoding plus
delta-of-delta timestamp encoding into chunked byte arrays stored as
blob columns"). Used per (series, window-chunk) inside applyInPandas —
never per-row Python.

Format (self-contained, versionless — the chunk tables record codec ids):

Gorilla XOR (values, float64):
- header: uint32 count (little-endian)
- first value: 64 raw bits
- each next value v: x = bits(v) XOR bits(prev)
  - x == 0         -> bit 0
  - else bit 1, then:
    - fits in previous (leading, length) window -> bit 0 + length bits
    - else bit 1 + 5 bits leading-zero count (capped 31) + 6 bits
      (meaningful-length - 1) + meaningful bits
  NaNs are bit-preserved (quiet-NaN payloads round-trip exactly).

Delta-of-delta (timestamps, int64 microseconds):
- header: uint32 count
- first ts: 64 raw bits; second: delta as 64 raw bits
- each next dod = (t[i]-t[i-1]) - (t[i-1]-t[i-2]), zig-zag varied width:
  - dod == 0              -> bit 0
  - |dod| < 2^6           -> 10  + 7-bit zig-zag
  - |dod| < 2^12          -> 110 + 13-bit zig-zag
  - |dod| < 2^24          -> 1110 + 25-bit zig-zag
  - else                  -> 1111 + 64-bit zig-zag

The XOR-of-equal-values == 0 fast path and window-reuse follow the
Gorilla paper (Pelkonen et al., VLDB 2015); the reference repo has no
codec layer — this is the TSDB-compression piece of the north star.
"""

from __future__ import annotations

import numpy as np


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, width: int) -> None:
        self.acc = (self.acc << width) | (value & ((1 << width) - 1))
        self.nbits += width
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def getvalue(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes(
                [(self.acc << (8 - self.nbits)) & 0xFF]
            )
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, width: int) -> int:
        out = 0
        pos = self.pos
        data = self.data
        for _ in range(width):
            byte = data[pos >> 3]
            out = (out << 1) | ((byte >> (7 - (pos & 7))) & 1)
            pos += 1
        self.pos = pos
        return out


def _as_i64(u: int) -> int:
    """Map an unsigned 64-bit value to its int64 two's-complement twin."""
    return u - (1 << 64) if u >= (1 << 63) else u


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else (v << 1)


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def gorilla_encode(values: np.ndarray) -> bytes:
    """Encode a float64 array into a Gorilla-XOR blob."""
    a = np.ascontiguousarray(values, dtype=np.float64)
    n = a.size
    out = _BitWriter()
    if n == 0:
        return (0).to_bytes(4, "little")
    bits = a.view(np.uint64)
    out.write(int(bits[0]), 64)
    prev_lead, prev_len = 65, 0  # invalid window forces re-emit first time
    # vectorized XOR stream; the emission loop is per-element but cheap
    xors = bits[1:] ^ bits[:-1]
    for x in map(int, xors):
        if x == 0:
            out.write(0, 1)
        else:
            lead = min(_clz64(x), 31)
            trail = _ctz64(x)
            mlen = 64 - lead - trail
            out.write(1, 1)
            if prev_len and lead >= prev_lead and (
                64 - prev_lead - prev_len
            ) <= trail:
                out.write(0, 1)
                out.write(x >> (64 - prev_lead - prev_len), prev_len)
            else:
                out.write(1, 1)
                out.write(lead, 5)
                out.write(mlen - 1, 6)
                out.write(x >> trail, mlen)
                prev_lead, prev_len = lead, mlen
    return n.to_bytes(4, "little") + out.getvalue()


def gorilla_decode(blob: bytes) -> np.ndarray:
    n = int.from_bytes(blob[:4], "little")
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    r = _BitReader(blob[4:])
    cur = r.read(64)
    out[0] = cur
    lead, mlen = 0, 0
    for i in range(1, n):
        if r.read(1):
            if r.read(1):
                lead = r.read(5)
                mlen = r.read(6) + 1
            bits = r.read(mlen)
            cur ^= bits << (64 - lead - mlen)
        out[i] = cur
    return out.view(np.float64)


def dod_encode(ts_us: np.ndarray) -> bytes:
    """Encode an int64 microsecond-timestamp array (monotone not required
    but typical) into a delta-of-delta blob."""
    a = np.ascontiguousarray(ts_us, dtype=np.int64)
    n = a.size
    out = _BitWriter()
    if n == 0:
        return (0).to_bytes(4, "little")
    # int64-wraparound (mod 2^64) delta arithmetic: total for any inputs;
    # signed interpretation only for compact zig-zag widths
    M = 1 << 64
    vals = [int(x) & (M - 1) for x in a]
    out.write(vals[0], 64)
    if n == 1:
        return n.to_bytes(4, "little") + out.getvalue()
    deltas = [(b - c) % M for b, c in zip(vals[1:], vals[:-1])]
    out.write(deltas[0], 64)
    dods = [_as_i64((b - c) % M) for b, c in zip(deltas[1:], deltas[:-1])]
    for d in dods:
        if d == 0:
            out.write(0, 1)
        else:
            z = _zigzag(d)
            if z < (1 << 7):
                out.write(0b10, 2)
                out.write(z, 7)
            elif z < (1 << 13):
                out.write(0b110, 3)
                out.write(z, 13)
            elif z < (1 << 25):
                out.write(0b1110, 4)
                out.write(z, 25)
            else:
                out.write(0b1111, 4)
                out.write(z, 64)
    return n.to_bytes(4, "little") + out.getvalue()


def dod_decode(blob: bytes) -> np.ndarray:
    n = int.from_bytes(blob[:4], "little")
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    r = _BitReader(blob[4:])
    M = 1 << 64
    cur = r.read(64)  # unsigned mod-2^64 accumulation
    out[0] = _as_i64(cur)
    if n == 1:
        return out
    delta = r.read(64)
    cur = (cur + delta) % M
    out[1] = _as_i64(cur)
    for i in range(2, n):
        tag = r.read(1)
        if tag == 0:
            dod = 0
        else:
            if r.read(1) == 0:
                dod = _unzigzag(r.read(7))
            elif r.read(1) == 0:
                dod = _unzigzag(r.read(13))
            elif r.read(1) == 0:
                dod = _unzigzag(r.read(25))
            else:
                dod = _unzigzag(r.read(64))
        delta = (delta + dod) % M
        cur = (cur + delta) % M
        out[i] = _as_i64(cur)
    return out


def _clz64(x: int) -> int:
    return 64 - x.bit_length()


def _ctz64(x: int) -> int:
    return (x & -x).bit_length() - 1
