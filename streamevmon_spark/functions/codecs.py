"""Gorilla XOR float codec + delta-of-delta timestamp codec, vectorized.

Pure-NumPy bit-packing producing compact ``bytes`` blobs for the rollup
tables' chunk columns (north rule: "Gorilla XOR float encoding plus
delta-of-delta timestamp encoding into chunked byte arrays stored as
blob columns"). The encoders are FULLY vectorized — no per-element
Python — so they satisfy the "no per-row Python" contract even inside
mapInPandas over millions of grid points, and the ``*_encode_many``
entry points encode every (series, chunk) group of an Arrow batch in
one NumPy pass (per-group Python cost is one bytes-slice).

Format (self-contained, versionless — the chunk tables record codec ids):

Gorilla XOR (values, float64):
- header: uint32 count (little-endian)
- first value: 64 raw bits
- each next value v: x = bits(v) XOR bits(prev)
  - x == 0         -> bit 0
  - else bit 1, then:
    - fits in the previously emitted (leading, length) window
                   -> bit 0 + length bits
    - else bit 1 + 5 bits leading-zero count (capped 31) + 6 bits
      (meaningful-length - 1) + meaningful bits
  NaNs are bit-preserved (quiet-NaN payloads round-trip exactly).

Window policy (encoder choice; any policy yields a valid stream): the
nonzero XORs of a blob are cut into blocks of ``_BLOCK`` consecutive
values; each block emits one shared window covering the whole block
(min leading / min trailing zeros over the block) and the rest of the
block reuses it. This replaces the classic greedy stateful scan —
which is inherently sequential — with closed-form NumPy (min.reduceat
per block), trading ≤ a few % of compression for a fully parallel
encoder. The decoder is the standard Gorilla state machine either way.

Delta-of-delta (timestamps, int64 microseconds):
- header: uint32 count
- first ts: 64 raw bits; second: delta as 64 raw bits
- each next dod = (t[i]-t[i-1]) - (t[i-1]-t[i-2]), zig-zag varied width:
  - dod == 0              -> bit 0
  - zz < 2^7              -> 10  + 7-bit zig-zag
  - zz < 2^13             -> 110 + 13-bit zig-zag
  - zz < 2^25             -> 1110 + 25-bit zig-zag
  - else                  -> 1111 + 64-bit zig-zag
Stateless per element -> fully vectorized with np.select.

The XOR-of-equal-values == 0 fast path and window-reuse follow the
Gorilla paper (Pelkonen et al., VLDB 2015); the reference repo has no
codec layer — this is the TSDB-compression piece of the north star.
"""

from __future__ import annotations

import numpy as np

_BLOCK = 32  # nonzero-XORs per shared Gorilla window

_U64 = np.uint64
_ONE = _U64(1)


def _bit_length_u32(v: np.ndarray) -> np.ndarray:
    """Exact bit_length for values < 2^32 held in uint64 arrays.

    frexp on float64 is exact for integers < 2^53, and its exponent IS
    the bit length — no log2 rounding hazards at powers of two.
    """
    _, e = np.frexp(v.astype(np.float64))
    return e.astype(np.int64)


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    hi = (x >> _U64(32)).astype(np.uint64)
    lo = (x & _U64(0xFFFFFFFF)).astype(np.uint64)
    return np.where(hi > 0, 32 + _bit_length_u32(hi), _bit_length_u32(lo))


def _clz64(x) -> np.ndarray | int:
    if np.isscalar(x) or np.ndim(x) == 0:  # scalar compat shim
        return 64 - int(x).bit_length()
    return 64 - _bit_length_u64(x)


def _ctz64(x) -> np.ndarray | int:
    if np.isscalar(x) or np.ndim(x) == 0:
        v = int(x)
        return (v & -v).bit_length() - 1
    low = x & (~x + _ONE)  # lowest set bit (uint64 wraparound negate)
    return _bit_length_u64(low) - 1


def _pack_fields(
    vals: np.ndarray, widths: np.ndarray, group_ends_f: np.ndarray
) -> tuple[bytes, np.ndarray]:
    """Pack variable-width big-endian-bit fields into one byte buffer.

    ``group_ends_f`` are exclusive field indices per group; every group
    is padded to a byte boundary (zero bits), so the returned byte
    offsets slice cleanly. Returns (buffer, byte_ends per group).
    """
    nf = len(vals)
    widths = widths.astype(np.int64)
    cum = np.concatenate([[0], np.cumsum(widths)])
    gb_start = cum[np.concatenate([[0], group_ends_f[:-1]])]
    gb_end = cum[group_ends_f]
    bits_per_group = gb_end - gb_start
    pad = (-bits_per_group) % 8
    if nf == 0 or cum[-1] == 0 and pad.sum() == 0:
        return b"", np.zeros(len(group_ends_f), dtype=np.int64)
    # splice one pad field after each group
    pvals = np.zeros(len(group_ends_f), dtype=np.uint64)
    vals2 = np.insert(vals.astype(np.uint64), group_ends_f, pvals)
    widths2 = np.insert(widths, group_ends_f, pad)
    ends2 = np.cumsum(widths2)
    total = int(ends2[-1])
    # mask values to their width (width 64 -> full mask)
    w2 = widths2.astype(np.uint64)
    mask = np.where(
        w2 >= _U64(64), _U64(0xFFFFFFFFFFFFFFFF), (_ONE << w2) - _ONE
    )
    vals2 &= mask
    # word-scatter packing: each field lands in at most two uint64
    # words of the output stream (bit 63 of word 0 = first stream bit),
    # OR-accumulated with ufunc.at. All temporaries are O(n_fields),
    # NOT O(total_bits) — the previous flat bit-array expansion
    # allocated several total_bits-sized arrays, which at ~55 bits/value
    # dominated encode wall time (fresh-page faults scale with bytes
    # touched, and 100 TB runs care about memory bandwidth regardless)
    keep = widths2 > 0
    v = vals2[keep]
    w = widths2[keep]
    s = (ends2[keep] - w).astype(np.int64)  # start bit of each field
    wi = s >> 6
    end_in = (s & 63) + w  # end bit within the first word (1..127)
    spill = end_in > 64
    sh1 = np.clip(64 - end_in, 0, 63).astype(np.uint64)
    rs1 = np.clip(end_in - 64, 0, 63).astype(np.uint64)
    part1 = np.where(spill, v >> rs1, v << sh1)
    n_words = (total + 63) // 64
    words = np.zeros(n_words, dtype=np.uint64)
    np.bitwise_or.at(words, wi, part1)
    if spill.any():
        sh2 = (np.uint64(128) - end_in[spill].astype(np.uint64))
        np.bitwise_or.at(words, wi[spill] + 1, v[spill] << sh2)
    buf = words.astype(">u8").tobytes()[: total // 8]
    # per-group byte ends: groups are byte-aligned by construction
    fcount = np.diff(np.concatenate([[0], group_ends_f]))
    ends_with_pad = np.cumsum(fcount + 1)
    byte_ends = ends2[ends_with_pad - 1] // 8
    return buf, byte_ends.astype(np.int64)


def _group_ids(n: int, starts: np.ndarray) -> np.ndarray:
    lens = np.diff(np.concatenate([starts, [n]]))
    return np.repeat(np.arange(len(starts)), lens)


def gorilla_encode_many(
    values: np.ndarray, group_starts: np.ndarray
) -> list[bytes]:
    """Encode ``len(group_starts)`` float64 series laid end-to-end in
    ``values`` (group g = values[starts[g]:starts[g+1]]) into one blob
    each — a single vectorized pass over all groups."""
    a = np.ascontiguousarray(values, dtype=np.float64)
    n = a.size
    starts = np.asarray(group_starts, dtype=np.int64)
    ng = len(starts)
    if ng == 0:
        return []
    if n == 0:
        return [(0).to_bytes(4, "little")] * ng
    bits = a.view(np.uint64)
    gid = _group_ids(n, starts)
    is_start = np.zeros(n, dtype=bool)
    is_start[starts[starts < n]] = True  # empty trailing group -> no row

    x = np.empty(n, dtype=np.uint64)
    x[0] = 0
    x[1:] = bits[1:] ^ bits[:-1]
    x[is_start] = 0  # no XOR across blob boundaries

    nz = np.flatnonzero((x != 0) & ~is_start)
    # per-element field slots: slot1 = control (+inline), slot2 = payload
    v1 = np.zeros(n, dtype=np.uint64)
    w1 = np.zeros(n, dtype=np.int64)
    v2 = np.zeros(n, dtype=np.uint64)
    w2 = np.zeros(n, dtype=np.int64)
    v1[is_start] = bits[is_start]
    w1[is_start] = 64
    zero = ~is_start
    zero[nz] = False
    w1[zero] = 1  # control bit 0, value 0

    if nz.size:
        xs = x[nz]
        lead = np.minimum(64 - _bit_length_u64(xs), 31).astype(np.int64)
        low = xs & (~xs + _ONE)
        trail = (_bit_length_u64(low) - 1).astype(np.int64)
        # blocks of _BLOCK nonzeros, never spanning groups
        g_nz = gid[nz]
        new_g = np.empty(nz.size, dtype=bool)
        new_g[0] = True
        new_g[1:] = g_nz[1:] != g_nz[:-1]
        first_rank = np.maximum.accumulate(
            np.where(new_g, np.arange(nz.size), 0)
        )
        rank = np.arange(nz.size) - first_rank
        head = new_g | (rank % _BLOCK == 0)
        block_starts = np.flatnonzero(head)
        blk = np.cumsum(head) - 1
        lead_b = np.minimum.reduceat(lead, block_starts)[blk]
        trail_b = np.minimum.reduceat(trail, block_starts)[blk]
        mlen_b = 64 - lead_b - trail_b
        payload = xs >> trail_b.astype(np.uint64)
        # head: '11' + 5b lead + 6b (mlen-1)   (13-bit control field)
        # rest: '10'                           (2-bit control field)
        ctrl_head = (
            _U64(0b11 << 11)
            | (lead_b.astype(np.uint64) << _U64(6))
            | (mlen_b - 1).astype(np.uint64)
        )
        v1[nz] = np.where(head, ctrl_head, _U64(0b10))
        w1[nz] = np.where(head, 13, 2)
        v2[nz] = payload
        w2[nz] = mlen_b

    vals = np.column_stack([v1, v2]).reshape(-1)
    widths = np.column_stack([w1, w2]).reshape(-1)
    ends_f = np.concatenate([starts[1:] * 2, [2 * n]])
    buf, byte_ends = _pack_fields(vals, widths, ends_f)
    counts = np.diff(np.concatenate([starts, [n]]))
    out = []
    off = 0
    for g in range(ng):
        out.append(
            int(counts[g]).to_bytes(4, "little") + buf[off : byte_ends[g]]
        )
        off = int(byte_ends[g])
    return out


def gorilla_encode(values: np.ndarray) -> bytes:
    """Encode a float64 array into a Gorilla-XOR blob."""
    return gorilla_encode_many(values, np.array([0], dtype=np.int64))[0]


def dod_encode_many(
    ts_us: np.ndarray, group_starts: np.ndarray
) -> list[bytes]:
    """Delta-of-delta encode int64 timestamp series laid end-to-end."""
    a = np.ascontiguousarray(ts_us, dtype=np.int64)
    n = a.size
    starts = np.asarray(group_starts, dtype=np.int64)
    ng = len(starts)
    if ng == 0:
        return []
    if n == 0:
        return [(0).to_bytes(4, "little")] * ng
    u = a.view(np.uint64)
    pos = np.arange(n, dtype=np.int64) - np.repeat(starts, np.diff(
        np.concatenate([starts, [n]])
    ))
    delta = np.zeros(n, dtype=np.uint64)
    delta[1:] = u[1:] - u[:-1]  # uint64 wraparound == mod 2^64
    dod = np.zeros(n, dtype=np.uint64)
    dod[1:] = delta[1:] - delta[:-1]

    d = dod.view(np.int64)
    z = ((d << 1) ^ (d >> 63)).view(np.uint64)  # zig-zag, wraparound-safe

    v1 = np.zeros(n, dtype=np.uint64)
    w1 = np.zeros(n, dtype=np.int64)
    v2 = np.zeros(n, dtype=np.uint64)
    w2 = np.zeros(n, dtype=np.int64)
    # first element: raw 64-bit ts; second: raw 64-bit delta
    first = pos == 0
    second = pos == 1
    v1[first] = u[first]
    w1[first] = 64
    v1[second] = delta[second]
    w1[second] = 64
    rest = pos >= 2
    zr = z  # classify widths
    c0 = rest & (d == 0)
    c7 = rest & (d != 0) & (zr < _U64(1 << 7))
    c13 = rest & (d != 0) & ~c7 & (zr < _U64(1 << 13))
    c25 = rest & (d != 0) & ~c7 & ~c13 & (zr < _U64(1 << 25))
    c64 = rest & (d != 0) & ~c7 & ~c13 & ~c25
    w1[c0] = 1
    v1[c7] = (_U64(0b10) << _U64(7)) | zr[c7]
    w1[c7] = 9
    v1[c13] = (_U64(0b110) << _U64(13)) | zr[c13]
    w1[c13] = 16
    v1[c25] = (_U64(0b1110) << _U64(25)) | zr[c25]
    w1[c25] = 29
    v1[c64] = _U64(0b1111)
    w1[c64] = 4
    v2[c64] = zr[c64]
    w2[c64] = 64

    vals = np.column_stack([v1, v2]).reshape(-1)
    widths = np.column_stack([w1, w2]).reshape(-1)
    ends_f = np.concatenate([starts[1:] * 2, [2 * n]])
    buf, byte_ends = _pack_fields(vals, widths, ends_f)
    counts = np.diff(np.concatenate([starts, [n]]))
    out = []
    off = 0
    for g in range(ng):
        out.append(
            int(counts[g]).to_bytes(4, "little") + buf[off : byte_ends[g]]
        )
        off = int(byte_ends[g])
    return out


def dod_encode(ts_us: np.ndarray) -> bytes:
    """Encode an int64 microsecond-timestamp array into a d-o-d blob."""
    return dod_encode_many(ts_us, np.array([0], dtype=np.int64))[0]


class _BitReader:
    """Bit cursor over big-endian uint64 words: each read() touches at
    most two Python ints — O(1) per field, not O(width) per bit (the
    per-bit loop dominated decode wall time)."""

    __slots__ = ("words", "pos")

    def __init__(self, data: bytes) -> None:
        npad = (-len(data)) % 8
        if npad:
            data = data + b"\x00" * npad
        # one C pass; .tolist() -> Python ints so the hot loop does
        # native int shifts with no numpy scalar boxing
        self.words = np.frombuffer(data, dtype=">u8").tolist()
        self.pos = 0

    def read(self, width: int) -> int:
        p = self.pos
        self.pos = p + width
        wi = p >> 6
        off = p & 63
        end = off + width
        if end <= 64:
            return (self.words[wi] >> (64 - end)) & ((1 << width) - 1)
        hi_bits = 64 - off
        lo_bits = width - hi_bits
        hi = self.words[wi] & ((1 << hi_bits) - 1)
        return (hi << lo_bits) | (self.words[wi + 1] >> (64 - lo_bits))


def _as_i64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


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
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
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
