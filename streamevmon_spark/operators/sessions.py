"""Conversation-session analytics over the transcripts table.

The reference's session-gap semantics live in its gap-reset windows
(reference: flink/ZippedMeasurementSourceFunction + the detectors'
inactivityPurgeTime, e.g. detectors/mode/ModeDetector.scala:72-85 —
state resets when a series goes quiet); this module lifts the same
"inactivity gap splits the stream" rule into first-class relational
operators over transcripts, plus the counter-rate semantics every
time-series engine needs (PromQL ``increase``/``rate`` with
counter-reset detection — public semantics, re-expressed relationally).

All four operators are one shuffle on the conversation/series key —
the same partitioning every rollup already uses, so Catalyst reuses
the exchange when they're composed — followed by window functions that
stay inside whole-stage codegen. No Python in the loop, no driver
state, memory bounded by one conversation per task.

Cross-engine determinism: outputs are integers, strings, timestamps,
or single-division doubles (exact integer operands), so the DuckDB
oracles (oracles.sessionize_oracle etc.) hash-match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from streamevmon_spark.operators.rollup import (
    EPOCH_NTZ,
    SERIES_KEY,
    TIERS,
    ts_micros,
)

#: inactivity gap that closes a session, in seconds
DEFAULT_SESSION_GAP_S = 1800


def _conv_window() -> Window:
    return Window.partitionBy("conv_id").orderBy("ts", "turn_idx")


def sessionize(
    transcripts: DataFrame, gap_s: int = DEFAULT_SESSION_GAP_S
) -> DataFrame:
    """Assign a 0-based ``session_idx`` per conversation: a new session
    starts at the first turn and whenever the inter-turn gap exceeds
    ``gap_s``. Classic gaps-and-islands — a lag + a running sum over
    the (conv_id) window, both codegen'd."""
    w = _conv_window()
    gap_us = gap_s * 1_000_000
    is_new = F.when(
        F.lag(ts_micros()).over(w).isNull()
        | (ts_micros() - F.lag(ts_micros()).over(w) > F.lit(gap_us)),
        1,
    ).otherwise(0)
    return transcripts.withColumn(
        "session_idx",
        (
            F.sum(is_new).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - 1
        ).cast("int"),
    )


def session_stats(
    transcripts: DataFrame, gap_s: int = DEFAULT_SESSION_GAP_S
) -> DataFrame:
    """Per-(conv_id, session_idx) aggregates: turn count, bounds,
    duration, tool-turn count. ``duration_s`` is one exact division of
    an integer µs span — deterministic cross-engine."""
    s = sessionize(transcripts, gap_s)
    return s.groupBy("conv_id", "session_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (
            (F.max(ts_micros()) - F.min(ts_micros())).cast("double")
            / F.lit(1_000_000.0)
        ).alias("duration_s"),
        F.sum(
            F.when(F.col("tool") != "none", 1).otherwise(0)
        ).cast("long").alias("n_tool_turns"),
    )


def role_transitions(transcripts: DataFrame) -> DataFrame:
    """The conversation's role-transition matrix: counts of
    (prev_role -> role) bigrams in (ts, turn_idx) order per
    conversation, with the synthetic 'START' state for first turns.
    One window pass + a tiny hash aggregate (<= |roles|^2 rows)."""
    w = _conv_window()
    return (
        transcripts.withColumn(
            "prev_role", F.coalesce(F.lag("role").over(w), F.lit("START"))
        )
        .groupBy("prev_role", "role")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def context_growth(
    transcripts: DataFrame, budget_chars: int = 512
) -> DataFrame:
    """Context-window growth per conversation: running prompt size
    (cumulative text chars in turn order) and the first turn where it
    exceeds ``budget_chars`` — the "when would this conversation blow
    the context budget" question a transcript pipeline asks before
    packing. NULL first_over_turn == never exceeds."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    cum = F.sum(F.length("text")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    turns = transcripts.withColumn("cum_chars", cum.cast("long"))
    return turns.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.max("cum_chars").alias("total_chars"),
        F.min(
            F.when(
                F.col("cum_chars") > F.lit(budget_chars), F.col("turn_idx")
            )
        ).alias("first_over_turn"),
    )


def counter_rate(
    transcripts: DataFrame,
    tier: str = "1h",
    wrap: int = 4096,
) -> DataFrame:
    """PromQL-style ``increase``/``rate`` with counter-reset detection,
    per (conv_id, tool, role) series and tumbling tier window.

    The counter under test is derived deterministically from the data
    itself: running sum of text length per series, wrapped modulo
    ``wrap`` so resets genuinely occur. Reset rule (public PromQL
    semantics): a negative delta means the counter restarted from 0,
    so that sample contributes its absolute value; the windowed
    ``increase`` is the sum of adjusted deltas and ``rate_per_s`` is
    one exact integer/literal division.

    Plan: one exchange on the series key; the cumulative counter, the
    lag-delta and the bucket assignment are all window/codegen
    expressions over that single partitioning; the final aggregate is
    a map-side-combinable hash aggregate.
    """
    win_us = TIERS[tier] * 1_000_000
    w = Window.partitionBy(*SERIES_KEY).orderBy("ts", "turn_idx")
    cum = F.sum(F.length("text")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = transcripts.withColumn("c", (cum % F.lit(wrap)).cast("long"))
    d = c.withColumn("d", F.col("c") - F.lag("c").over(w))
    adj = d.withColumn(
        "inc",
        F.when(F.col("d").isNull(), F.lit(0).cast("long"))
        .when(F.col("d") < 0, F.col("c"))
        .otherwise(F.col("d")),
    ).withColumn(
        "w_us",
        F.expr(
            f"(datediff(MICROSECOND, {EPOCH_NTZ}, ts) div {win_us})"
            f" * {win_us}"
        ),
    )
    return adj.groupBy(*SERIES_KEY, "w_us").agg(
        F.sum("inc").cast("long").alias("increase"),
        F.sum(F.when(F.col("d") < 0, 1).otherwise(0))
        .cast("long")
        .alias("n_resets"),
    ).select(
        *SERIES_KEY,
        F.expr(f"timestampadd(MICROSECOND, w_us, {EPOCH_NTZ})").alias(
            "bucket_start"
        ),
        "increase",
        (F.col("increase").cast("double") / F.lit(float(TIERS[tier])))
        .alias("rate_per_s"),
        "n_resets",
    )
