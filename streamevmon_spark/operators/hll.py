"""HyperLogLog distinct-count sketches per retention tier.

Continuous aggregates need a *mergeable* distinct count (distinct
conversations per (tool, role) per hour/day): exact COUNT(DISTINCT) is
not mergeable across tiers, so the store keeps HLL register state the
same way it keeps t-digest state for percentiles
(functions/tdigest.py). This is the classic Flajolet et al. 2007
HyperLogLog, built entirely from relational primitives so it runs
map-side-combinable in Spark AND replays exactly in the DuckDB oracle:

- hash: 48-bit md5-derived portable hash (functions/porthash.hex48_sql
  — bit-identical in both engines; engine-native hashes differ);
- m = 64 registers (p = 6): register = hash % 64, remainder r =
  hash div 64 (42 bits), rank = 43 - bitlength(r) (rank 43 when
  r = 0), computed via length(bin(r)) which both dialects print
  unpadded;
- register state per group = max(rank) — a plain hash aggregate on
  (bucket, tool, role, register), mergeable by max, which is exactly
  how the 1d tier is maintained from 1h state (hll_merge_registers);
- the harmonic sum is kept EXACT by scaling: S = sum over the 64
  registers of 2^(43 - M_j) (absent registers contribute 2^43), an
  int64 <= 64 * 2^43 = 2^49 — no floating-point accumulation order to
  disagree on;
- raw_est = (0.709 * 4096.0) * 2^43 / S as a double: exact-double
  operands, fixed operand order, one correctly-rounded division —
  bit-identical cross-engine. alpha_64 = 0.709 per the paper.

The small-range (linear counting) branch needs ln(m / V); measured on
this box, JVM Math.log and DuckDB's libm log differ in the last ulp
for some arguments, so the hashed gate output deliberately excludes
any ln() result: it emits the exact state (v_zero, s_scaled), the
deterministic raw_est, the exact lc_arg = m / V, and the estimator
selector. ``hll_estimate`` applies ln() Spark-side for human
consumption (tested for accuracy in pytest, not hash-gated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamevmon_spark.functions.porthash import hex48_sql
from streamevmon_spark.operators.rollup import EPOCH_NTZ, TIERS

#: number of registers (2^p, p = 6)
M = 64
#: remainder width in bits (48-bit hash minus 6 register bits)
REM_BITS = 42
#: alpha_64 from Flajolet et al. 2007 (m = 64 -> 0.709)
ALPHA = 0.709
#: 2^REM_BITS scale factor keeping the harmonic sum integral
SCALE = 1 << (REM_BITS + 1)  # 2^43: rank ranges 1..43


def hll_registers(
    transcripts: DataFrame, tier: str = "1h", key_col: str = "conv_id"
) -> DataFrame:
    """Per-(bucket, tool, role, register) max rank — the mergeable HLL
    state. One hash aggregate (map-side combinable: max) after the
    codegen'd hash/register/rank projection; no window functions, no
    Python."""
    win_us = TIERS[tier] * 1_000_000
    h = hex48_sql(key_col)
    return (
        transcripts.select(
            F.expr(
                f"(datediff(MICROSECOND, {EPOCH_NTZ}, ts) div {win_us})"
                f" * {win_us}"
            ).alias("w_us"),
            "tool",
            "role",
            F.expr(f"{h} % {M}").cast("int").alias("reg"),
            F.expr(f"{h} div {M}").alias("r"),
        )
        .withColumn(
            "rank",
            F.when(F.col("r") == 0, F.lit(REM_BITS + 1))
            .otherwise(F.lit(REM_BITS + 1) - F.length(F.expr("bin(r)")))
            .cast("int"),
        )
        .groupBy("w_us", "tool", "role", "reg")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_merge_registers(
    registers: DataFrame, from_tier: str = "1h", to_tier: str = "1d"
) -> DataFrame:
    """Merge fine-tier register state into a coarser tier: re-bucket
    and take max per register. max(max) == max, so the merged state is
    bit-identical to computing the coarse tier from raw — the
    mergeability property the continuous-aggregate store relies on
    (proved hash-exact by the hll_distinct_1d_merged gate query)."""
    to_us = TIERS[to_tier] * 1_000_000
    assert TIERS[to_tier] % TIERS[from_tier] == 0
    return (
        registers.withColumn(
            "w_us", F.expr(f"(w_us div {to_us}) * {to_us}")
        )
        .groupBy("w_us", "tool", "role", "reg")
        .agg(F.max("max_rank").alias("max_rank"))
    )


def hll_summary(registers: DataFrame) -> DataFrame:
    """Collapse register state into the hash-gated sketch summary:
    exact integer state + deterministic raw estimate (see module
    docstring for why ln() is excluded)."""
    return (
        registers.groupBy("w_us", "tool", "role")
        .agg(
            F.count(F.lit(1)).alias("n_present"),
            F.sum(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT),"
                    f" {REM_BITS + 1} - max_rank)"
                )
            ).alias("s_present"),
        )
        .select(
            F.expr(f"timestampadd(MICROSECOND, w_us, {EPOCH_NTZ})").alias(
                "bucket_start"
            ),
            "tool",
            "role",
            F.lit(M).cast("int").alias("m"),
            (F.lit(M) - F.col("n_present")).cast("int").alias("v_zero"),
            (
                F.col("s_present")
                + (F.lit(M).cast("long") - F.col("n_present"))
                * F.lit(SCALE).cast("long")
            ).alias("s_scaled"),
        )
        .withColumn(
            "raw_est",
            F.lit(ALPHA * (M * M) * float(SCALE))
            / F.col("s_scaled").cast("double"),
        )
        .withColumn(
            "lc_arg",
            F.when(
                F.col("v_zero") > 0,
                F.lit(float(M)) / F.col("v_zero").cast("double"),
            ),
        )
        .withColumn(
            "estimator",
            F.when(
                (F.col("v_zero") > 0)
                & (F.col("raw_est") <= F.lit(2.5 * M)),
                F.lit("linear"),
            ).otherwise(F.lit("raw")),
        )
    )


def hll_distinct(
    transcripts: DataFrame, tier: str = "1h", key_col: str = "conv_id"
) -> DataFrame:
    """Gate query: HLL sketch summary of distinct ``key_col`` per
    (tool, role) and tier bucket, computed from raw."""
    return hll_summary(hll_registers(transcripts, tier, key_col))


def hll_estimate(summary: DataFrame) -> DataFrame:
    """Human-facing cardinality estimate (applies ln(); NOT hash-gated
    — see module docstring). linear counting when the raw estimate is
    small and empty registers remain, else the raw HLL estimate."""
    return summary.withColumn(
        "est",
        F.when(
            F.col("estimator") == "linear",
            F.lit(float(M)) * F.log(F.col("lc_arg")),
        ).otherwise(F.col("raw_est")),
    )
