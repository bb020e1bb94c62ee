"""Cross-engine deterministic hashing expressed in portable SQL.

MinHash/SimHash need a hash function that Spark (the implementation) and
DuckDB (the correctness oracle) compute IDENTICALLY. Engine-native hashes
differ (xxhash64 vs DuckDB hash), so we derive a 32-bit integer from the
md5 hex digest — md5 is bit-identical everywhere — using only md5 /
substr / instr / arithmetic, which behave identically in both dialects
(1-based substr, 1-based instr).

hex32(expr) = int(first 8 hex chars of md5(expr)), in [0, 2^32).
"""

from __future__ import annotations

_POW16 = [16 ** (8 - i) for i in range(1, 9)]


def hex32_sql(arg_sql: str) -> str:
    """SQL computing the 32-bit integer of md5(arg_sql)'s first 8 hex
    chars. Valid in both Spark SQL and DuckDB."""
    # the CAST to BIGINT must happen BEFORE the multiply: Spark 4 runs in
    # ANSI mode and the int32 product would overflow (instr is INT)
    terms = [
        f"(CAST(instr('0123456789abcdef', substr(md5({arg_sql}), {i}, 1))"
        f" AS BIGINT) - 1) * {_POW16[i - 1]}"
        for i in range(1, 9)
    ]
    return "(" + " + ".join(terms) + ")"


def hex32(value: str) -> int:
    """Python mirror (for tests)."""
    import hashlib

    return int(hashlib.md5(value.encode()).hexdigest()[:8], 16)


_POW16_48 = [16 ** (12 - i) for i in range(1, 13)]


def hex48_sql(arg_sql: str) -> str:
    """SQL computing the 48-bit integer of md5(arg_sql)'s first 12 hex
    chars. Valid in both Spark SQL and DuckDB. 48 bits (< 2^53) so the
    value is exact even if an engine routes it through a double."""
    terms = [
        f"(CAST(instr('0123456789abcdef', substr(md5({arg_sql}), {i}, 1))"
        f" AS BIGINT) - 1) * {_POW16_48[i - 1]}"
        for i in range(1, 13)
    ]
    return "(" + " + ".join(terms) + ")"


def hex48(value: str) -> int:
    """Python mirror (for tests)."""
    import hashlib

    return int(hashlib.md5(value.encode()).hexdigest()[:12], 16)
