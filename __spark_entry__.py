"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship 1-minute rollup on sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator with its
DuckDB oracle. Operators live in ``streamevmon_spark/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from streamevmon_spark import (  # noqa: E402
    amp2_oracles,
    amp_oracles,
    docs_oracles,
    esmond_oracles,
    flow_oracles,
    graph_oracles,
    itdk_oracles,
    oracles,
)
from streamevmon_spark.data.transcripts import load_transcripts  # noqa: E402
from streamevmon_spark.operators import rollup as R  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: per-(conv_id, tool, role) 1-minute rollup with turn
    counts, inter-turn latency percentiles and activity rates. Runs the
    guarded default (operators/rollup.rollup_tier): exact percentiles for
    every window under the density bound, bounded-memory quantile state
    above it — the task-OOM protection is on by default."""
    df = load_transcripts(spark, "/root/testdata/sf0.001")
    return R.rollup_tier(df, "1m")


def _q_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_transcripts(spark, sf_dir)


def _q_rollup(tier: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        return R.rollup_tier(load_transcripts(spark, sf_dir), tier)

    return q


def _q_inter_turn_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.add_inter_turn_latency(load_transcripts(spark, sf_dir)).select(
        "conv_id", "tool", "role", "turn_idx", "ts", "lat_s"
    )


def _q_gapfill(method: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from streamevmon_spark.operators.gapfill import gap_fill

        return gap_fill(
            load_transcripts(spark, sf_dir), "1h", method=method,
            purge_gap_s=7200,
        )

    return q


def _q_chunk_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed chunk blobs (Gorilla + delta-of-delta), projected to
    their decoded-face digest (r5: previously rows-only): per chunk,
    the stored n_points metadata PLUS point count / first / last /
    lossy count / µs-quantized value checksum recomputed by decoding
    the blob. The oracle regenerates the same per-chunk aggregates
    from the gap-fill closed form, so both the bucketing metadata and
    the blob contents are hash-checked."""
    from pyspark.sql import functions as F

    from streamevmon_spark.operators.chunks import (
        chunk_table,
        decompress_chunks,
    )

    chunks = chunk_table(
        load_transcripts(spark, sf_dir), grid_tier="1h", chunk_tier="1d"
    ).localCheckpoint()
    pts = decompress_chunks(
        chunks.select("conv_id", "tool", "role", "ts_dod", "values_gorilla")
    )
    day_us = 86400 * 1_000_000
    decoded = (
        pts.withColumn("chunk_us", F.expr(f"(ts_us div {day_us}) * {day_us}"))
        .groupBy("conv_id", "tool", "role", "chunk_us")
        .agg(
            F.count("*").alias("point_count"),
            F.expr(
                f"timestampadd(MICROSECOND, min(ts_us), {R.EPOCH_NTZ})"
            ).alias("ts_first"),
            F.expr(
                f"timestampadd(MICROSECOND, max(ts_us), {R.EPOCH_NTZ})"
            ).alias("ts_last"),
            # the Arrow boundary may map the in-blob NaN lossy sentinel
            # back to NULL — and isnan(NULL) is false — so both forms
            # count as lossy (the chunk_range_read defensive predicate)
            F.expr(
                "CAST(sum(CASE WHEN value IS NULL OR isnan(value) "
                "THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("lossy_count"),
            F.expr(
                "CAST(sum(CASE WHEN value IS NULL OR isnan(value) "
                "THEN 0 ELSE "
                "CAST(floor(value * 1e6) AS BIGINT) END) AS BIGINT)"
            ).alias("val_checksum"),
        )
    )
    return (
        chunks.select("conv_id", "tool", "role", "chunk_us", "n_points")
        .join(decoded, ["conv_id", "tool", "role", "chunk_us"])
        .select(
            "conv_id",
            "tool",
            "role",
            F.expr(
                f"timestampadd(MICROSECOND, chunk_us, {R.EPOCH_NTZ})"
            ).alias("chunk_start"),
            F.col("n_points").cast("long").alias("n_points"),
            "point_count",
            "ts_first",
            "ts_last",
            "lossy_count",
            "val_checksum",
        )
    )


def _q_chunk_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gorilla+DoD codec round-trip elevated to the driver gate: compress
    the gap-filled grid into blobs, decode the blobs back, and the result
    must hash-equal the gap-fill oracle (NaN sentinel → NULL)."""
    from pyspark.sql import functions as F

    from streamevmon_spark.operators.chunks import (
        chunk_table,
        decompress_chunks,
    )

    chunks = chunk_table(
        load_transcripts(spark, sf_dir), grid_tier="1h", chunk_tier="1d",
        method="interp", purge_gap_s=7200,
    )
    pts = decompress_chunks(
        chunks.select("conv_id", "tool", "role", "ts_dod", "values_gorilla")
    )
    return pts.select(
        "conv_id",
        "tool",
        "role",
        F.expr(f"timestampadd(MICROSECOND, ts_us, {R.EPOCH_NTZ})").alias(
            "grid_ts"
        ),
        F.when(F.isnan("value"), F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("value_filled"),
    )


_FINE_CHUNKS_CACHE: dict = {}


def _fine_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 1h chunk blobs consumed by BOTH compaction gate queries,
    built once per session (localCheckpoint): the queries verify the
    COMPACTION arithmetic; the chunk build itself is already covered by
    chunk_table/chunk_roundtrip, so rebuilding it per query would just
    double-bill the codec."""
    from streamevmon_spark.operators.chunks import chunk_table

    key = (spark.sparkContext.applicationId, sf_dir, "fine_chunks")
    if key not in _FINE_CHUNKS_CACHE:
        _FINE_CHUNKS_CACHE[key] = chunk_table(
            load_transcripts(spark, sf_dir), grid_tier="1h",
            chunk_tier="1h", method="interp", purge_gap_s=7200,
        ).select(
            "conv_id", "tool", "role", "chunk_us", "n_points",
            "ts_dod", "values_gorilla",
        ).localCheckpoint()
    return _FINE_CHUNKS_CACHE[key]


def _q_chunk_compact_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Compaction correctness elevated to the gate: build FINE (1h)
    chunk blobs, compact them into 1d buckets (blob-level shuffle,
    decode+concat+re-encode), decode the compacted blobs — must still
    hash-equal the batch gap-fill oracle. Compaction is the Iceberg
    rewrite-data-files analogue for the chunked byte-array tables."""
    from pyspark.sql import functions as F

    from streamevmon_spark.operators.chunks import (
        compact_chunks,
        decompress_chunks,
    )

    compacted = compact_chunks(_fine_chunks(spark, sf_dir), "1d")
    pts = decompress_chunks(
        compacted.select(
            "conv_id", "tool", "role", "ts_dod", "values_gorilla"
        )
    )
    return pts.select(
        "conv_id",
        "tool",
        "role",
        F.expr(f"timestampadd(MICROSECOND, ts_us, {R.EPOCH_NTZ})").alias(
            "grid_ts"
        ),
        F.when(F.isnan("value"), F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("value_filled"),
    )


def _q_chunk_compact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compacted-chunk metadata (one row per series×1d bucket with its
    point count) — hash-checked against the gap-fill oracle re-bucketed
    in SQL, so the merge arithmetic itself is driver-verified without
    decoding blobs."""
    from streamevmon_spark.operators.chunks import compact_chunks

    return compact_chunks(_fine_chunks(spark, sf_dir), "1d").select(
        "conv_id", "tool", "role", "chunk_us", "n_points"
    )


def _cascade_store_dir(sf_dir: str) -> str:
    import hashlib
    import tempfile

    h = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    return os.path.join(
        tempfile.gettempdir(), f"semon_cascade_store_{h}"
    )


def _q_cascade_incremental(tier: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Incremental continuous-aggregate maintenance
        (plans/cascade_store.py): ingest in two phases (first 6 of the
        60 h snapshot buckets, then the rest), refreshing ONLY the
        coarse-tier day-partitions overlapped by each phase's new
        snapshot ranges from the stored mergeable 1m state — the raw
        table is never rescanned for 1h/1d. The result must hash-equal
        the full-rebuild rollup oracle (reference lifecycle:
        flink/sources/InfluxAmpSourceFunction.scala:130-159,257-275 —
        catch-up from checkpointed offsets, then continuous maintain).
        """
        from streamevmon_spark.data.transcripts import load_transcripts
        from streamevmon_spark.plans import cascade_store as C
        from streamevmon_spark.plans.manifest import load_manifest

        out = _cascade_store_dir(sf_dir)
        df = load_transcripts(spark, sf_dir)
        m = load_manifest(out)
        if m is None or not all(
            p.status == "done" for p in m.partitions
        ):
            C.run_cascade_store(
                spark, df, out, input_path=sf_dir, stop_after=6
            )
        # second call ingests the remaining snapshots; with the store
        # already complete (the twin gate query ran first) both the
        # bucket loop and the refresh are watermark no-ops
        C.run_cascade_store(spark, df, out, input_path=sf_dir)
        return C.read_cascade(spark, out, tier)

    return q


def _q_stream_cascade(tier: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Streaming continuous-aggregate maintenance
        (streaming/cascade_stream.py): micro-batches of arriving turns
        are folded into mergeable 1m state and the 1h/1d tiers are
        refreshed per epoch via the shared watermark machinery — the
        reference's subscribe-phase lifecycle
        (flink/sources/InfluxAmpSourceFunction.scala:179-230). Drained
        result must hash-equal the full-rebuild rollup oracle. The
        store is shared by the 1h/1d twins; a second drain over the
        same checkpoint is a no-op."""
        import hashlib
        import tempfile

        from streamevmon_spark.plans import cascade_store as C
        from streamevmon_spark.streaming import rollup_stream as S
        from streamevmon_spark.streaming.cascade_stream import (
            stream_cascade_store,
        )

        path = _stream_input(spark, sf_dir)
        h = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
        out = os.path.join(
            tempfile.gettempdir(), f"semon_stream_cascade_{h}"
        )
        stream_cascade_store(
            spark,
            S.stream_transcripts(spark, path, max_files_per_trigger=1),
            out,
        )
        return C.read_cascade(spark, out, tier)

    return q


def _q_sketch_incremental(tier: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Incrementally maintained t-digest sketch tier (north rule:
        'latency percentiles via t-digest sketches ... maintained
        incrementally per tier'): same two-phase snapshot ingest as the
        cascade_incremental twins, with the sketch day-partitions
        refreshed by canonical blob merge of per-bucket 1m sketches
        derived from stored state — raw turns never rescanned. The
        output is the sketch's EXACT face (a t-digest's total weight
        and min/max are exact): hash-checked against the raw-side SQL
        aggregate; quantile accuracy + bit-equality to the batch sketch
        twin are pytest-asserted (tests/test_cascade_store.py)."""
        from pyspark.sql import functions as F

        from streamevmon_spark.operators.sketch_rollup import (
            sketch_exact_stats,
        )
        from streamevmon_spark.plans import cascade_store as C
        from streamevmon_spark.plans.manifest import load_manifest

        out = _cascade_store_dir(sf_dir)
        df = load_transcripts(spark, sf_dir)
        m = load_manifest(out)
        if m is None or not all(
            p.status == "done" for p in m.partitions
        ):
            C.run_cascade_store(
                spark, df, out, input_path=sf_dir, stop_after=6,
                sketches=True,
            )
        C.run_cascade_store(
            spark, df, out, input_path=sf_dir, sketches=True
        )
        return sketch_exact_stats(
            C.read_sketch_cascade(spark, out, tier)
        ).select(
            "conv_id",
            "tool",
            "role",
            F.expr(
                f"timestampadd(MICROSECOND, window_start_us,"
                f" {R.EPOCH_NTZ})"
            ).alias("window_start"),
            "lat_count",
            "lat_min_us",
            "lat_max_us",
        )

    return q


def _q_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB downsample to 64 points per series (operators/downsample) —
    the read-side shape-preserving selection for dashboard rendering."""
    from streamevmon_spark.operators.downsample import downsample_lttb

    return downsample_lttb(load_transcripts(spark, sf_dir), 64)


def _q_downsample_lttb_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB served from the compressed chunk store: raw non-null points
    → Gorilla/DoD blobs → decode → identical LTTB kernel. Bit-equal to
    the raw path (codec round-trip is exact; the store keys one point
    per instant), so it hashes against the SAME recursive-CTE oracle
    as `downsample_lttb`."""
    from pyspark.sql import functions as F

    from streamevmon_spark.operators.chunks import compress_chunks
    from streamevmon_spark.operators.downsample import (
        downsample_lttb_from_store,
    )
    from streamevmon_spark.operators.rollup import EPOCH_NTZ

    pts = (
        load_transcripts(spark, sf_dir)
        .where(F.col("value").isNotNull())
        .select(
            "conv_id", "tool", "role",
            F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)").alias(
                "ts_us"
            ),
            "value",
        )
    )
    return downsample_lttb_from_store(compress_chunks(pts, "1d"), 64)


def _q_trend_fit_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares trend per (series, 1h bucket): PromQL deriv +
    predict_linear from exact integer sums (operators/regress.trend_fit)."""
    from streamevmon_spark.operators.regress import trend_fit

    return trend_fit(load_transcripts(spark, sf_dir), "1h", horizon_s=600)


def _q_tool_lag_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-tool activity lag correlation at 1h, lag 1 bucket
    (operators/regress.tool_lag_corr): Pearson r over exact per-bucket
    counts for every ordered tool pair."""
    from streamevmon_spark.operators.regress import tool_lag_corr

    return tool_lag_corr(load_transcripts(spark, sf_dir), "1h", lag_buckets=1)


def _q_sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization, 8 PAA segments over a 4-letter alphabet
    (operators/regress.sax_symbols): z-normalized segment averages from
    exact milli-quantized integer sums mapped at fixed N(0,1)
    quartile breakpoints."""
    from streamevmon_spark.operators.regress import sax_symbols

    return sax_symbols(load_transcripts(spark, sf_dir), n_segments=8)


def _q_activity_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tool activity autocorrelation at lags 1..6 over hourly
    bucket counts (operators/regress.activity_acf) — the seasonality
    detector behind seasonal_naive's season length."""
    from streamevmon_spark.operators.regress import activity_acf

    return activity_acf(load_transcripts(spark, sf_dir), "1h", max_lag=6)


def _q_theilsen_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust daily slope per series: exact interpolated
    median of all same-day pairwise slopes between hourly averages
    (operators/regress.theilsen_daily)."""
    from streamevmon_spark.operators.regress import theilsen_daily

    return theilsen_daily(load_transcripts(spark, sf_dir), "1h")


def _q_topk_series_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 busiest series per 1h bucket (operators/seriesops.
    topk_series) — the PromQL topk() read face with a deterministic
    count-then-key total order."""
    from streamevmon_spark.operators.seriesops import topk_series

    return topk_series(load_transcripts(spark, sf_dir), "1h", k=5)


def _q_series_churn_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily series churn: active vs first-seen series counts
    (operators/seriesops.series_churn) — the cardinality-explosion
    early warning."""
    from streamevmon_spark.operators.seriesops import series_churn

    return series_churn(load_transcripts(spark, sf_dir), "1d")


def _q_seasonal_naive_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive residuals: each (series, 1h bucket) average vs the
    same series 24 buckets earlier (operators/regress.seasonal_naive) —
    day-over-day anomaly flags on exact bucket averages."""
    from streamevmon_spark.operators.regress import seasonal_naive

    return seasonal_naive(
        load_transcripts(spark, sf_dir), "1h", season_buckets=24,
        threshold=50.0,
    )


BM25_TERMS = ["hash", "scan", "table", "value"]

#: deterministic PII augmentation (identical expression mirrored in the
#: DuckDB oracle): every doc gains an email + an IPv4; docs with even
#: ids gain an SSN + a card; ids % 3 == 0 gain a phone number
PII_AUG = (
    "concat(text, ' reach u', CAST(doc_id AS STRING),"
    " '@mail.example.org',"
    " CASE WHEN doc_id % 2 = 0 THEN"
    " ' ssn 123-45-6789 card 4111 1111 1111 1111' ELSE '' END,"
    " CASE WHEN doc_id % 3 = 0 THEN"
    " concat(' call +1415555', CAST(doc_id % 10000 AS STRING))"
    " ELSE '' END,"
    " ' host 10.0.', CAST(doc_id % 256 AS STRING), '.77')"
)
PII_AUG_DUCK = PII_AUG.replace("AS STRING", "AS VARCHAR")


def _q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval scores for a fixed query-term set
    (operators/retrieval.bm25_scores) — map-side-filtered postings,
    broadcast term stats, ascending-term-fold score. The gate
    projection quantizes the score to 1e-6 (exact integer floor in
    both engines) because the JVM ln intrinsic and libm ln can differ
    by 1 ULP (tests/test_retrieval.py pins the bound)."""
    from pyspark.sql import functions as FF

    from streamevmon_spark.operators.retrieval import (
        bm25_scores,
        quantize_micro,
    )

    out = bm25_scores(_docs(spark, sf_dir), BM25_TERMS)
    return out.withColumn("score", quantize_micro(FF.col("score")))


def _q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram mean NLL quality score
    (operators/textstats.unigram_logprob), nll quantized to 1e-6 for
    the gate (same ln-ULP rationale as _q_bm25)."""
    from pyspark.sql import functions as FF

    from streamevmon_spark.operators.retrieval import quantize_micro
    from streamevmon_spark.operators.textstats import unigram_logprob

    out = unigram_logprob(_docs(spark, sf_dir))
    return out.withColumn("nll", quantize_micro(FF.col("nll")))


def _q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction counts + scrubbed text (operators/scrub.pii_scrub)
    over deterministically PII-augmented documents (the raw synthetic
    corpus contains none) — map-only regex chain in the Java/RE2
    dialect intersection."""
    from pyspark.sql import functions as FF

    from streamevmon_spark.operators.scrub import pii_scrub

    docs = _docs(spark, sf_dir).withColumn("text", FF.expr(PII_AUG))
    return pii_scrub(docs)


def _q_rollup_store_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup tier rebuilt from the compressed chunk store (ALL turns,
    lossy ones as NaN instants) — the re-aggregation path after raw
    expires under retention; hashes against the SAME oracle as the
    raw-path rollup_1m."""
    from pyspark.sql import functions as F

    from streamevmon_spark.operators.chunks import compress_chunks
    from streamevmon_spark.operators.rollup import EPOCH_NTZ, rollup_from_store

    pts = load_transcripts(spark, sf_dir).select(
        "conv_id", "tool", "role",
        F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)").alias("ts_us"),
        "value",
    )
    return rollup_from_store(compress_chunks(pts, "1d"), "1m")


def _q_detect_spike_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detector replay from the compressed store — the reference's
    InfluxHistoryConnection pattern (stored measurements re-enter the
    detection DAG): ALL turns (lossy ones as the store's NaN encoding)
    → Gorilla/DoD blobs → decode → spike detector, hashing against the
    SAME oracle as the raw-path detect_spike."""
    from pyspark.sql import functions as F

    from streamevmon_spark.operators.chunks import compress_chunks
    from streamevmon_spark.operators.detect import detect_from_store
    from streamevmon_spark.operators.rollup import EPOCH_NTZ

    pts = load_transcripts(spark, sf_dir).select(
        "conv_id", "tool", "role",
        F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)").alias("ts_us"),
        "value",
    )
    return detect_from_store(
        compress_chunks(pts, "1d"), "spike",
        lag=5, threshold=2.0, influence=0.1, purge_s=86400,
    )


def _q_downsample_m4_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 served from the compressed chunk store (decode → identical
    four-window pick; see _q_downsample_lttb_store for the exactness
    argument) — hashes against the SAME oracle as the raw path."""
    from pyspark.sql import functions as F

    from streamevmon_spark.operators.chunks import compress_chunks
    from streamevmon_spark.operators.downsample import (
        downsample_m4_from_store,
    )
    from streamevmon_spark.operators.rollup import EPOCH_NTZ

    pts = (
        load_transcripts(spark, sf_dir)
        .where(F.col("value").isNotNull())
        .select(
            "conv_id", "tool", "role",
            F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)").alias(
                "ts_us"
            ),
            "value",
        )
    )
    return downsample_m4_from_store(compress_chunks(pts, "1d"))


def _q_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 downsample (first/last/bottom/top per series x 1h bucket,
    operators/downsample.downsample_m4) — the pixel-exact fixed-grid
    companion to LTTB's fixed point budget; pure window functions."""
    from streamevmon_spark.operators.downsample import downsample_m4

    return downsample_m4(load_transcripts(spark, sf_dir))


def _q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization (inactivity > 30m splits) +
    per-session aggregates (operators/sessions.session_stats) — the
    relational lift of the reference detectors' inactivityPurgeTime
    session-reset rule."""
    from streamevmon_spark.operators.sessions import session_stats

    return session_stats(load_transcripts(spark, sf_dir))


def _q_role_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Role-transition matrix: (prev_role -> role) bigram counts in
    turn order with a START state (operators/sessions.role_transitions)."""
    from streamevmon_spark.operators.sessions import role_transitions

    return role_transitions(load_transcripts(spark, sf_dir))


def _q_context_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window growth per conversation: cumulative prompt chars
    and the first turn exceeding the budget
    (operators/sessions.context_growth)."""
    from streamevmon_spark.operators.sessions import context_growth

    return context_growth(load_transcripts(spark, sf_dir))


def _q_counter_rate_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL-style increase/rate with counter-reset detection over a
    deterministic wrap-around counter, per series x 1h bucket
    (operators/sessions.counter_rate)."""
    from streamevmon_spark.operators.sessions import counter_rate

    return counter_rate(load_transcripts(spark, sf_dir), "1h")


_CM_KC_CACHE: dict = {}


def _cm_key_counts_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 1h key_counts relation, built from ONE raw scan per session
    and localCheckpointed (it is bounded: buckets x conversations) —
    both cm gate queries derive counters, candidates and exact counts
    from it with zero further raw scans."""
    from streamevmon_spark.operators.cmsketch import key_counts

    key = (spark.sparkContext.applicationId, sf_dir, "cm_kc_1h")
    if key not in _CM_KC_CACHE:
        _CM_KC_CACHE[key] = key_counts(
            load_transcripts(spark, sf_dir), "1h"
        ).localCheckpoint()
    return _CM_KC_CACHE[key]


def _q_cm_topk_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters: top-5 conversations per 1h
    bucket by sketch estimate (operators/cmsketch.cm_heavy_hitters) —
    the bounded-state answer to the hot-conversation skew question,
    exact count alongside. All-integer hashed surface."""
    from streamevmon_spark.operators.cmsketch import cm_heavy_hitters

    return cm_heavy_hitters(
        tier="1h", k=5, counts=_cm_key_counts_shared(spark, sf_dir)
    )


def _q_cm_topk_1d_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability proof as a gate row: 1d heavy hitters computed from
    SUM-merged 1h counter state (operators/cmsketch.cm_merge_counters),
    hash-equal to the oracle's direct from-raw 1d computation."""
    from streamevmon_spark.operators.cmsketch import (
        cm_counters,
        cm_heavy_hitters,
        cm_merge_counters,
    )

    kc = _cm_key_counts_shared(spark, sf_dir)
    merged = cm_merge_counters(cm_counters(counts=kc), "1h", "1d")
    return cm_heavy_hitters(
        tier="1h", k=5, counters=merged, to_tier="1d", counts=kc
    )


def _q_realtime_range_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tier-routing range read (operators/tier_router.realtime_range_agg):
    the 13%..87% minute-range answered by stitching 1d interior + 1h/1m
    edge tier state — raw never rescanned past the 1m build — vs the
    oracle's direct raw range scan; percentiles included in the hash."""
    from streamevmon_spark.operators.tier_router import realtime_range_agg

    return realtime_range_agg(load_transcripts(spark, sf_dir))


def _q_realtime_range_agg_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stored-tier form of the range read: all three tier states are
    materialized (1m → 1h → 1d hierarchical merges, the cascade store's
    exact schema) and the router reads each segment DIRECTLY from its
    tier — interior days are single stored rows, no re-aggregation.
    Same raw-range-scan oracle as realtime_range_agg: two engine paths,
    one truth."""
    from streamevmon_spark.operators.tier_router import (
        DAY_US,
        HOUR_US,
        _state_1m,
        realtime_range_agg,
    )
    from streamevmon_spark.plans.cascade_store import _merge_state

    t = load_transcripts(spark, sf_dir)
    # materialize each tier once (the stored-parquet analogue) — without
    # this the 1m build would re-execute under every tier branch
    m1 = _state_1m(t).localCheckpoint()
    h1 = _merge_state(m1, HOUR_US).localCheckpoint()
    d1 = _merge_state(h1, DAY_US)
    return realtime_range_agg(t, state_1m=m1, state_1h=h1, state_1d=d1)


def _q_range_agg_from_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Store-backed range read (plans/cascade_store.range_agg_from_
    store): ingest the cascade store if needed, lazily upgrade the
    mergeable state_1h/state_1d face, then answer the default range
    from STORED tier rows only — raw is never opened on the read path.
    Same raw-range-scan oracle as realtime_range_agg."""
    from streamevmon_spark.plans import cascade_store as C
    from streamevmon_spark.plans.manifest import load_manifest

    out = _cascade_store_dir(sf_dir)
    m = load_manifest(out)
    if m is None or not all(p.status == "done" for p in m.partitions):
        C.run_cascade_store(
            spark, load_transcripts(spark, sf_dir), out, input_path=sf_dir
        )
    C.refresh_state_cascade(spark, out)
    return C.range_agg_from_store(spark, out)


def _q_realtime_range_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-faced range read (operators/tier_router.
    realtime_range_sketch): t-digest blobs merged along the cover_plan
    — the gate hashes the digest's EXACT face (total weight, min/max
    round-tripped through the blob) against a direct raw range scan;
    quantile error is bounded in pytest."""
    from streamevmon_spark.operators.tier_router import (
        realtime_range_sketch,
    )

    out = realtime_range_sketch(load_transcripts(spark, sf_dir))
    return out.select(
        "conv_id", "tool", "role", "range_start", "range_end",
        "lat_count", "lat_min_us", "lat_max_us",
    )


def _q_chunk_range_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range read served from the COMPRESSED store
    (operators/chunks.chunk_range_read): raw points → Gorilla+DoD chunk
    blobs → metadata-pruned decode of only range-overlapping chunks →
    per-series aggregate, vs the oracle's direct raw range scan.
    Bit-exact codec round-trip is what makes the hash match."""
    from pyspark.sql import functions as F

    from streamevmon_spark.operators.chunks import (
        chunk_range_read,
        compress_chunks,
    )
    from streamevmon_spark.operators.rollup import EPOCH_NTZ, SERIES_KEY
    from streamevmon_spark.operators.tier_router import default_range_us

    t = load_transcripts(spark, sf_dir)
    pts = t.select(
        *SERIES_KEY,
        F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)").alias("ts_us"),
        "value",
    )
    row = pts.select(
        F.min("ts_us").alias("mn"), F.max("ts_us").alias("mx")
    ).collect()[0]
    t0, t1 = default_range_us(row.mn, row.mx)
    return chunk_range_read(compress_chunks(pts, "1d"), t0, t1)


def _q_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters level+trend smoothing per series
    (operators/trend.holt_winters) — the double-exponential companion
    to smooth_ewma; sequential fold in the partition-wise kernel,
    bit-exact vs the recursive-CTE oracle."""
    from streamevmon_spark.operators.trend import holt_winters

    return holt_winters(load_transcripts(spark, sf_dir), sf=0.3, tf=0.1)


def _q_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1h *_over_time aggregates per point
    (operators/trend.over_time): one RANGE frame over integer epoch-µs,
    exact count/min/max + µs-quantized average."""
    from streamevmon_spark.operators.trend import over_time

    return over_time(load_transcripts(spark, sf_dir), range_s=3600)


def _q_alerts_for_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prometheus-style for-duration threshold alerts
    (operators/trend.alerts_for_duration): maximal over-threshold runs
    per series kept when they span >= 300 s; pure integer
    gaps-and-islands."""
    from streamevmon_spark.operators.trend import alerts_for_duration

    return alerts_for_duration(
        load_transcripts(spark, sf_dir), threshold=100.0, for_s=300
    )


def _q_mad_outliers_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier scoring per (series, 1h bucket)
    (operators/trend.mad_outliers): exact interpolated median + MAD
    from sorted arrays, |x-med| > 3*MAD count — formula text generated
    once and rendered per dialect."""
    from streamevmon_spark.operators.trend import mad_outliers

    return mad_outliers(load_transcripts(spark, sf_dir), "1h", k=3.0)


def _q_activity_zscore_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tool activity z-score vs the trailing 24h
    (operators/trend.activity_zscore): exact integer window sums, one
    fixed-order mean/var/z formula."""
    from streamevmon_spark.operators.trend import activity_zscore

    return activity_zscore(
        load_transcripts(spark, sf_dir), "1h", lookback_buckets=24
    )


def _q_hist_quantile_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prometheus-style fixed-le latency histogram per (tool, role) x 1h
    bucket + histogram_quantile p50/p95 (operators/histo.hist_quantiles)
    — the bounded-state companion to the exact sorted-array percentiles;
    8 integer counters per series-bucket regardless of row count. The
    quantile expression is ONE SQL string evaluated verbatim by both
    engines."""
    from streamevmon_spark.operators.histo import hist_quantiles

    return hist_quantiles(load_transcripts(spark, sf_dir), "1h")


def _q_hist_quantile_1d_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability proof as a gate row: 1d histogram summary computed
    from SUM-merged 1h counter state (operators/histo.hist_merge_counters),
    hash-equal to the oracle's direct from-raw 1d computation."""
    from streamevmon_spark.operators.histo import (
        hist_counters,
        hist_merge_counters,
        hist_summary,
    )

    t = load_transcripts(spark, sf_dir)
    merged = hist_merge_counters(hist_counters(t, "1h"), "1h", "1d")
    return hist_summary(merged)


def _q_hll_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct-conversation sketches per (tool, role) x 1h bucket
    (operators/hll.hll_distinct) — exact integer register state +
    deterministic raw estimate, portable-hash based."""
    from streamevmon_spark.operators.hll import hll_distinct

    return hll_distinct(load_transcripts(spark, sf_dir), "1h")


def _q_hll_1d_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability proof as a gate row: 1d HLL summaries produced by
    MERGING stored 1h register state (max per register), hash-equal to
    the oracle's direct from-raw 1d computation
    (operators/hll.hll_merge_registers)."""
    from streamevmon_spark.operators.hll import (
        hll_merge_registers,
        hll_registers,
        hll_summary,
    )

    regs_1h = hll_registers(load_transcripts(spark, sf_dir), "1h")
    return hll_summary(hll_merge_registers(regs_1h, "1h", "1d"))


def _q_hll_incremental(tier: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Incrementally maintained HLL distinct-conversation tier —
        the store's third mergeable sketch face
        (plans/cascade_store.refresh_hll_cascade): same two-phase
        snapshot ingest as the cascade_incremental twins, with the HLL
        day-partitions refreshed by max-merge of per-bucket 1m register
        state derived from stored exact state — raw turns never
        rescanned. The collapsed summary must hash-equal the DIRECT
        from-raw computation (oracles.hll_distinct_oracle)."""
        from streamevmon_spark.operators.hll import hll_summary
        from streamevmon_spark.plans import cascade_store as C
        from streamevmon_spark.plans.manifest import load_manifest

        out = _cascade_store_dir(sf_dir)
        df = load_transcripts(spark, sf_dir)
        m = load_manifest(out)
        if m is None or not all(
            p.status == "done" for p in m.partitions
        ):
            C.run_cascade_store(
                spark, df, out, input_path=sf_dir, stop_after=6,
                hll=True,
            )
        C.run_cascade_store(spark, df, out, input_path=sf_dir, hll=True)
        return hll_summary(C.read_hll_cascade(spark, out, tier))

    return q


def _q_smooth_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series EWMA smoothing (operators/smooth.smooth_ewma) — the
    sequential fold kernel vs the recursive-CTE replay, bit-exact."""
    from streamevmon_spark.operators.smooth import smooth_ewma

    return smooth_ewma(load_transcripts(spark, sf_dir), alpha=0.3)


def _q_sketch_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-digest latency sketches per 1h window, projected to the
    sketch's EXACT face (total weight + min/max are exact through the
    blob round-trip) so the batch sketch build is hash-checked against
    the raw-side SQL aggregate — r5: previously rows-only; quantile
    accuracy stays pytest-asserted (tests/test_tdigest.py)."""
    from pyspark.sql import functions as F

    from streamevmon_spark.operators.sketch_rollup import (
        sketch_exact_stats,
        sketch_tier,
    )

    return sketch_exact_stats(
        sketch_tier(load_transcripts(spark, sf_dir), "1h")
    ).select(
        "conv_id",
        "tool",
        "role",
        F.expr(
            f"timestampadd(MICROSECOND, window_start_us, {R.EPOCH_NTZ})"
        ).alias("window_start"),
        "lat_count",
        "lat_min_us",
        "lat_max_us",
    )


def _q_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamevmon_spark.operators.event_grouping import threshold_events

    return threshold_events(load_transcripts(spark, sf_dir), threshold=100.0)


def _q_event_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamevmon_spark.operators.event_grouping import (
        group_events_temporal,
        threshold_events,
    )

    ev = threshold_events(load_transcripts(spark, sf_dir), threshold=100.0)
    return group_events_temporal(ev, max_interval_s=10, max_duration_s=7200)


def _q_detect(detector: str, **kw):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from streamevmon_spark.operators.detect import detect

        return detect(load_transcripts(spark, sf_dir), detector, **kw)

    return q


def _q_detect_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changepoint demo: the Bayesian model starts at variance 1e8
    (reference NormalDistribution.scala:46), so it reacts to changes on
    the reference's microsecond-latency scale — embed a deterministic
    level shift at that scale into each series."""
    from pyspark.sql import functions as F

    from streamevmon_spark.operators.detect import detect

    df = load_transcripts(spark, sf_dir).withColumn(
        "value",
        F.when(F.col("turn_idx") < 8, F.lit(10000.0) + F.col("value"))
        .otherwise(F.lit(40000.0) + F.col("value")),
    )
    return detect(
        df, "changepoint", max_history=8, trigger_count=2,
        minimum_event_interval_s=0, severity_threshold=20, purge_s=86400,
    )


def _q_windowed_distdiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamevmon_spark.operators.detect import detect_windowed_distdiff

    return detect_windowed_distdiff(
        load_transcripts(spark, sf_dir), window_s=7 * 86400,
        recents_count=4, drop_extreme_n=0, z_threshold=0.5,
        minimum_change=1.02,
    )


def _q_spike_details(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamevmon_spark.operators.detect import spike_detail_stream

    return spike_detail_stream(
        load_transcripts(spark, sf_dir), lag=5, threshold=2.0,
        influence=0.1, purge_s=86400,
    )


def _q_frequent_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamevmon_spark.operators.event_grouping import (
        frequent_event_filter,
        threshold_events,
    )

    ev = threshold_events(load_transcripts(spark, sf_dir), threshold=100.0)
    # sparse per-series events at test scale — scaled-down tiers so the
    # trigger/cooldown machinery actually exercises (default YAML tiers
    # never fire on this data)
    return frequent_event_filter(
        ev,
        configs=(
            ("small", 1, 3600, 7200, 25),
            ("medium", 2, 14400, 28800, 50),
            ("large", 3, 86400, 86400, 75),
        ),
    )


def _q_onepass(tier: str):
    """Single-shuffle tiered pipeline (operators/rollup.rollup_tiers_onepass)
    — full rollup columns, so the standard tier oracle applies."""

    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        return R.rollup_tiers_onepass(load_transcripts(spark, sf_dir))[tier]

    return q


def _q_cascade_exact(tier: str):
    """Continuous-aggregate cascade with EXACT percentiles at every tier
    (1h/1d derived from stored 1m state by sorted-array merge, raw
    scanned once) — must equal the direct tier rollup bit-for-bit."""

    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        tiers = R.rollup_tiers_cascade_exact(
            load_transcripts(spark, sf_dir), persist_intermediate=False
        )
        return tiers[tier]

    return q


def _q_rollup_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.rollup_tier_salted(load_transcripts(spark, sf_dir), "1m")


def _q_rollup_guarded(tier: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        return R.rollup_tier_guarded(
            load_transcripts(spark, sf_dir), tier, max_exact_rows=100_000
        )

    return q


def _q_cascade(from_tier: str, to_tier: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = load_transcripts(spark, sf_dir)
        return R.cascade_rollup(R.rollup_tier(df, from_tier),
                                from_tier, to_tier)

    return q


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamevmon_spark.sources.measurements import load_events

    return load_events(spark, sf_dir)


def _q_source_typed_lossy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamevmon_spark.sources import measurements as M

    return M.assign_stream_ids(
        M.drop_lossy(M.typed_stream(_events(spark, sf_dir), "click"))
    )


def _q_history_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamevmon_spark.sources.measurements import history_scan

    return history_scan(
        _events(spark, sf_dir), "2024-01-01 06:00:00", "2024-01-02 00:00:00"
    )


def _q_parse_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamevmon_spark.sources.measurements import parse_tags

    return parse_tags(_events(spark, sf_dir))


def _q_amp2_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamevmon_spark.sources.measurements import amp2_stream_key

    return amp2_stream_key(_events(spark, sf_dir))


def _q_histogram_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamevmon_spark.sources.measurements import histogram_merge

    return histogram_merge(_events(spark, sf_dir), bucket_width=10.0)


def _q_csv_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamevmon_spark.sources.measurements import csv_projection

    return csv_projection(_events(spark, sf_dir))


def _q_smokeping(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamevmon_spark.sources.measurements import (
        parse_rtts,
        smokeping_projection,
        synth_rtts,
    )

    return smokeping_projection(parse_rtts(synth_rtts(_events(spark, sf_dir))))


def _q_nab_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from streamevmon_spark.sources.measurements import nab_scoring_format

    ev = _events(spark, sf_dir)
    meas = ev.select(
        F.col("event_type").alias("stream"), "ts", "value"
    )
    events = ev.where(F.col("value") > 150.0).select(
        F.col("event_type").alias("stream"),
        "ts",
        F.lit(100).cast("int").alias("severity"),
    )
    return nab_scoring_format(meas, events, scaling="continuous")


def _q_single_event_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamevmon_spark.operators.event_grouping import (
        group_events_single,
        threshold_events,
    )

    ev = threshold_events(load_transcripts(spark, sf_dir), threshold=100.0)
    return group_events_single(ev)


def _q_event_line_protocol(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from streamevmon_spark.operators.detect import event_line_protocol
    from streamevmon_spark.operators.event_grouping import threshold_events

    ev = threshold_events(
        load_transcripts(spark, sf_dir), threshold=100.0
    ).withColumn("description", F.lit(""))
    return event_line_protocol(ev)


def _q_enrich_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamevmon_spark.operators.enrich import enrich_broadcast

    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return enrich_broadcast(
        _events(spark, sf_dir), customer, "user_id", "c_custkey",
        ["c_name", "c_acctbal", "c_mktsegment"],
    )


def _q_zip_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamevmon_spark.operators.enrich import zip_streams
    from streamevmon_spark.sources.measurements import typed_stream

    ev = _events(spark, sf_dir).select("event_id", "ts", "value",
                                       "event_type")
    a = typed_stream(ev, "click").drop("event_type")
    b = typed_stream(ev, "view").drop("event_type")
    return zip_streams(a, b, ["ts", "event_id"])


RETENTION_NOW = "2024-01-03 00:00:00"
RETENTION_HORIZON_S = 86400


def _q_retention_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamevmon_spark.operators.retention import apply_retention

    rolled = R.rollup_tier(load_transcripts(spark, sf_dir), "1m")
    return apply_retention(
        rolled, "1m", RETENTION_NOW, {"1m": RETENTION_HORIZON_S}
    )


def _q_retention_expired(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamevmon_spark.operators.retention import expired_day_partitions

    rolled = R.rollup_tier(load_transcripts(spark, sf_dir), "1m")
    return expired_day_partitions(
        rolled, "1m", RETENTION_NOW, {"1m": RETENTION_HORIZON_S}
    )


def _stream_input(spark: SparkSession, sf_dir: str) -> str:
    from streamevmon_spark.streaming.rollup_stream import (
        materialize_transcripts,
        stream_input_dir,
    )

    return materialize_transcripts(
        spark, sf_dir, stream_input_dir(sf_dir), n_files=4
    )


def _q_stream_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from streamevmon_spark.streaming import rollup_stream as S

    path = _stream_input(spark, sf_dir)
    name = f"q_sr_{uuid.uuid4().hex[:8]}"
    S.run_available_now(
        S.stream_rollup(S.stream_transcripts(spark, path), "1m"), name
    )
    return spark.table(name)


def _q_stream_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from streamevmon_spark.streaming import rollup_stream as S

    path = _stream_input(spark, sf_dir)
    name = f"q_sl_{uuid.uuid4().hex[:8]}"
    S.run_available_now(
        S.stream_inter_turn_latency(
            S.stream_transcripts(spark, path, max_files_per_trigger=1)
        ),
        name,
        output_mode="append",
    )
    return spark.table(name)


def _q_stream_detect_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from streamevmon_spark.streaming import rollup_stream as S

    path = _stream_input(spark, sf_dir)
    name = f"q_sdl_{uuid.uuid4().hex[:8]}"
    S.run_available_now(
        S.stream_detect_loss(
            S.stream_transcripts(spark, path, max_files_per_trigger=1),
            max_history=30, loss_count=3, consecutive_count=2,
        ),
        name,
        output_mode="append",
    )
    return spark.table(name)


def _q_stream_detect_spike(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from streamevmon_spark.streaming import rollup_stream as S

    path = _stream_input(spark, sf_dir)
    name = f"q_sds_{uuid.uuid4().hex[:8]}"
    S.run_available_now(
        S.stream_detect_spike(
            S.stream_transcripts(spark, path, max_files_per_trigger=1),
            lag=5, threshold=2.0, influence=0.1, purge_s=86400,
        ),
        name,
        output_mode="append",
    )
    return spark.table(name)


def _q_stream_detect_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from streamevmon_spark.streaming import rollup_stream as S

    path = _stream_input(spark, sf_dir)
    name = f"q_sdm_{uuid.uuid4().hex[:8]}"
    S.run_available_now(
        S.stream_detect(
            S.stream_transcripts(spark, path, max_files_per_trigger=1),
            "mode", max_history=5, min_frequency=1, min_prominence=0,
            threshold=0.1, purge_s=86400,
        ),
        name,
        output_mode="append",
    )
    return spark.table(name)


def _q_stream_event_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from streamevmon_spark.streaming import rollup_stream as S

    path = _stream_input(spark, sf_dir)
    name = f"q_seg_{uuid.uuid4().hex[:8]}"
    S.run_available_now(
        S.stream_event_groups(
            S.stream_transcripts(spark, path, max_files_per_trigger=1),
            threshold=100.0, gap_s=10,
        ),
        name,
    )
    return spark.table(name)


def _q_stream_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming LOCF gap-fill drained over time-ranged micro-batches;
    must hash-equal the BATCH gap_fill oracle (same tier and purge)."""
    import uuid

    from streamevmon_spark.streaming import rollup_stream as S

    path = _stream_input(spark, sf_dir)
    out = f"/tmp/q_sgf_{uuid.uuid4().hex[:8]}"
    S.run_available_now_to_parquet(
        S.stream_gap_fill(
            S.stream_transcripts(spark, path, max_files_per_trigger=1),
            tier="1h", purge_gap_s=7200,
        ),
        out,
    )
    return spark.read.parquet(out)


def _q_stream_gapfill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming LINEAR-INTERPOLATION gap-fill drained over time-ranged
    micro-batches (streaming/rollup_stream.stream_gap_fill,
    method='interp'): emission waits for the right bracket, so append
    mode needs no retraction; must hash-equal the BATCH gap_fill
    interp oracle (same tier and purge)."""
    import uuid

    from streamevmon_spark.streaming import rollup_stream as S

    path = _stream_input(spark, sf_dir)
    out = f"/tmp/q_sgfi_{uuid.uuid4().hex[:8]}"
    S.run_available_now_to_parquet(
        S.stream_gap_fill(
            S.stream_transcripts(spark, path, max_files_per_trigger=1),
            tier="1h", purge_gap_s=7200, method="interp",
        ),
        out,
    )
    return spark.read.parquet(out)


def _q_stream_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Gorilla/DoD chunk writer drained over time-ranged
    micro-batches, then decoded: closed-bucket blobs must decode to
    exactly the non-null points whose 1h bucket precedes the series'
    final bucket (the open tail is held as state, never emitted)."""
    import uuid

    from streamevmon_spark.operators.chunks import decompress_chunks
    from streamevmon_spark.streaming import rollup_stream as S
    from streamevmon_spark.streaming.chunk_stream import (
        stream_compress_chunks,
    )

    path = _stream_input(spark, sf_dir)
    out = f"/tmp/q_scc_{uuid.uuid4().hex[:8]}"
    S.run_available_now_to_parquet(
        stream_compress_chunks(
            S.stream_transcripts(spark, path, max_files_per_trigger=1),
            chunk_tier="1h",
        ),
        out,
    )
    return decompress_chunks(
        spark.read.parquet(out).select(
            "conv_id", "tool", "role", "ts_dod", "values_gorilla"
        )
    )


def _q_flows_dag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The YamlDagRunner analogue end-to-end: a declarative flows spec
    (two detectors over one transcripts source, one union sink, plus a
    deliberately-dead source whose path does not exist — exercising the
    reference's Lazy dead-source elimination inside the gate) built by
    plans/flows.build_flows; oracle = UNION ALL of the two detectors'
    oracles."""
    from streamevmon_spark.plans.flows import build_flows

    spec = {
        "sources": [
            {"name": "turns", "type": "transcripts"},
            {"name": "unused", "type": "parquet",
             "path": "/nonexistent/never-read"},
        ],
        "detectors": [
            {"type": "loss", "sources": [{"name": "turns"}],
             "sinks": ["all_events"],
             "config": {"loss_count": 3, "consecutive_count": 2}},
            {"type": "spike", "sources": [{"name": "turns"}],
             "sinks": ["all_events"],
             "config": {"lag": 5, "threshold": 2.0, "influence": 0.1,
                        "purge_s": 86400}},
        ],
        "sinks": [{"name": "all_events", "type": "union"}],
    }
    return build_flows(spark, spec, sf_dir)["all_events"]


def _q_stream_detect_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from streamevmon_spark.streaming import rollup_stream as S

    path = _stream_input(spark, sf_dir)
    name = f"q_sdb_{uuid.uuid4().hex[:8]}"
    S.run_available_now(
        S.stream_detect(
            S.stream_transcripts(spark, path, max_files_per_trigger=1),
            "baseline", max_history=5, percentile=0.1, threshold=10,
            purge_s=86400,
        ),
        name,
        output_mode="append",
    )
    return spark.table(name)


def _q_stream_detect_distdiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from streamevmon_spark.streaming import rollup_stream as S

    path = _stream_input(spark, sf_dir)
    name = f"q_sdd_{uuid.uuid4().hex[:8]}"
    S.run_available_now(
        S.stream_detect(
            S.stream_transcripts(spark, path, max_files_per_trigger=1),
            "distdiff", recents_count=4, drop_extreme_n=0,
            z_threshold=0.5, minimum_change=1.05, purge_s=86400,
        ),
        name,
        output_mode="append",
    )
    return spark.table(name)


def _q_stream_detect_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generic pickled-blob-state streaming wrapper running the
    Bayesian changepoint kernel (level shift embedded as in
    _q_detect_changepoint); carried run arrays keep drained streaming
    output bit-equal to the batch kernel and its recursive-CTE oracle."""
    import uuid

    from pyspark.sql import functions as F

    from streamevmon_spark.streaming import rollup_stream as S

    path = _stream_input(spark, sf_dir)
    name = f"q_sdc_{uuid.uuid4().hex[:8]}"
    shifted = S.stream_transcripts(
        spark, path, max_files_per_trigger=1
    ).withColumn(
        "value",
        F.when(F.col("turn_idx") < 8, F.lit(10000.0) + F.col("value"))
        .otherwise(F.lit(40000.0) + F.col("value")),
    )
    S.run_available_now(
        S.stream_detect(
            shifted, "changepoint", max_history=8, trigger_count=2,
            minimum_event_interval_s=0, severity_threshold=20,
            purge_s=86400,
        ),
        name,
        output_mode="append",
    )
    return spark.table(name)


def _q_stream_detect_windowed_distdiff(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The windowed (per-tumbling-window, no-hysteresis) distribution
    test as a streaming stateful operator: the carried state is the
    current window bucket plus the bounded first-2n buffer, so drained
    streaming output equals the batch detect_windowed_distdiff and its
    window-replay oracle bit for bit (reference:
    detectors/distdiff/WindowedDistDiffDetector.scala:54-149)."""
    import uuid

    from streamevmon_spark.streaming import rollup_stream as S

    path = _stream_input(spark, sf_dir)
    name = f"q_swd_{uuid.uuid4().hex[:8]}"
    S.run_available_now(
        S.stream_detect(
            S.stream_transcripts(spark, path, max_files_per_trigger=1),
            "windowed_distdiff", window_s=7 * 86400, recents_count=4,
            drop_extreme_n=0, z_threshold=0.5, minimum_change=1.02,
        ),
        name,
        output_mode="append",
    )
    return spark.table(name)


def _q_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment: every click event carries the latest
    error state (ts + value) for the same user as of the click time —
    single-shuffle union+window as-of join, checked against DuckDB's
    native ASOF JOIN."""
    from pyspark.sql import functions as F

    from streamevmon_spark.operators.enrich import asof_enrich
    from streamevmon_spark.sources.measurements import load_events

    ev = load_events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("value").alias("err_value")
    )
    return asof_enrich(
        clicks, errors, ["user_id"], fact_ts="ts", dim_ts="ts",
        payload_cols=["err_value"], dim_ts_out="err_ts",
    ).withColumnRenamed("asof_err_value", "err_value")


def _q_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamevmon_spark.operators.curate import curate_corpus
    from streamevmon_spark.operators.similarity import _dot

    from pyspark.sql import functions as F

    out = curate_corpus(_docs(spark, sf_dir), _embs(spark, sf_dir))
    return out.select(
        "doc_id", "text", "n_tokens", "stopword_ratio", "distinct_ratio",
        "lang_pred",
        F.sqrt(_dot("embedding", "embedding")).alias("emb_norm"),
    )


def _q_gapfill_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vectorized pandas/Arrow gap-fill kernel — must equal the
    native-window implementation's oracle bit-for-bit (kernel parity
    elevated to the driver gate). interp drops lossy-only support rows,
    matching gap_fill's obs definition."""
    from streamevmon_spark.operators.gapfill import gap_fill_pandas

    return gap_fill_pandas(
        load_transcripts(spark, sf_dir), "1h", method="interp",
        purge_gap_s=7200,
    )


def _q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamevmon_spark.operators.multimodal import (
        media_metadata,
        synth_media,
    )

    return media_metadata(synth_media(_docs(spark, sf_dir)))


def _q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamevmon_spark.operators.multimodal import (
        decode_features,
        synth_media,
    )

    return decode_features(synth_media(_docs(spark, sf_dir)), fake=True)


def _q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling at a second parameterization (512-byte frames,
    every 3rd) projected to scalar digests — r5: previously rows-only
    with raw binary frames; now hash-checked like media_frame_digests
    but exercising different chunking/stride arithmetic."""
    from pyspark.sql import functions as F

    from streamevmon_spark.operators.multimodal import (
        frame_sample,
        synth_media,
    )

    frames = frame_sample(
        synth_media(_docs(spark, sf_dir)), frame_bytes=512, every_n=3
    )
    return frames.select(
        "media_id",
        "frame_idx",
        F.octet_length("frame").cast("int").alias("frame_bytes"),
        F.md5("frame").alias("frame_md5"),
    )


def _q_media_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode over a deterministic generated-BMP corpus —
    the non-fake decode path (feature-detected Pillow, pure-NumPy BMP
    fallback in this sandbox), hash-checked against the closed-form
    pixel-statistics oracle (no image bytes on the oracle side)."""
    from streamevmon_spark.operators.multimodal import (
        decode_image,
        synth_bmp_media,
    )

    return decode_image(synth_bmp_media(_docs(spark, sf_dir)))


def _q_frame_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from streamevmon_spark.operators.multimodal import (
        frame_sample,
        synth_media,
    )

    frames = frame_sample(synth_media(_docs(spark, sf_dir)))
    return frames.select(
        "media_id",
        "frame_idx",
        F.octet_length("frame").cast("int").alias("frame_bytes"),
        F.md5("frame").alias("frame_md5"),
    )


# 1-hour retention against the sf0.01 span makes the prune actually cut
# the graph (47/75 edges survive), so the largest-component oracle
# exercises real component competition, not a trivially-whole graph
GRAPH_PRUNE_NOW = "2024-01-31 00:00:00"
GRAPH_PRUNE_AGE_S = 3600


# The hops relation is the shared dimension every graph query builds
# on. Materialize it once per (session, sf_dir) — the exact analogue of
# a real deployment keeping the topology table as a materialized view —
# so the 9 graph queries don't re-derive the synth->paths->hops chain.
_HOPS_CACHE: dict = {}


def _graph_hops(spark: SparkSession, sf_dir: str):
    from streamevmon_spark.operators import graph as G

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _HOPS_CACHE:
        ev = _events(spark, sf_dir)
        tr = G.synth_traceroutes(ev)
        # meta is bounded by distinct streams; it feeds both sides of
        # the stream-pair cross join, so materialize it once as well
        meta = G.synth_traceroute_meta(ev).localCheckpoint()
        hops = G.path_hops(G.as_inet_paths(tr, meta)).localCheckpoint()
        _HOPS_CACHE[key] = (hops, meta)
    return _HOPS_CACHE[key]


def _graph_dims(spark: SparkSession, sf_dir: str):
    """(vertices, edges) — the two per-host dimension aggregates over
    hops, materialized once per session like the hops relation itself
    (both are bounded by distinct hosts, not measurement volume)."""
    from streamevmon_spark.operators import graph as G

    key = (spark.sparkContext.applicationId, sf_dir, "dims")
    if key not in _HOPS_CACHE:
        hops, _ = _graph_hops(spark, sf_dir)
        _HOPS_CACHE[key] = (
            G.topology_vertices(hops).localCheckpoint(),
            G.topology_edges(hops).localCheckpoint(),
        )
    return _HOPS_CACHE[key]


def _stringify_asns(df: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    return df.withColumn(
        "valid_asns",
        F.expr(
            "array_join(transform(valid_asns, x -> CAST(x AS STRING)), ';')"
        ),
    )


def _q_graph_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    hops, _ = _graph_hops(spark, sf_dir)
    return hops


def _q_graph_vertices(spark: SparkSession, sf_dir: str) -> DataFrame:
    vertices, _ = _graph_dims(spark, sf_dir)
    return _stringify_asns(vertices)


def _q_graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, edges = _graph_dims(spark, sf_dir)
    return edges


def _q_graph_largest_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamevmon_spark.operators import graph as G

    vertices, edges = _graph_dims(spark, sf_dir)
    pruned = G.prune_old_edges(edges, GRAPH_PRUNE_NOW, GRAPH_PRUNE_AGE_S)
    return _stringify_asns(G.largest_component(vertices, pruned))


def _q_graph_anon_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamevmon_spark.operators import graph as G

    hops, _ = _graph_hops(spark, sf_dir)
    return G.parallel_anonymous_merges(hops)


def _q_graph_stream_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamevmon_spark.operators import graph as G

    _, meta = _graph_hops(spark, sf_dir)
    _, edges = _graph_dims(spark, sf_dir)
    # explicit all-pairs opt-in (r5: reachable_only became the
    # default); the reference-shaped table with NULL unreachable pairs
    return G.stream_distances(edges, meta, max_depth=10,
                              reachable_only=False)


def _q_graph_stream_distances_cc(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """stream_distances on the scale path (reachable_only=True): pair
    generation driven by the BFS relation via equi-joins — no meta x
    meta cross join, work proportional to co-reachable pairs."""
    from streamevmon_spark.operators import graph as G

    _, meta = _graph_hops(spark, sf_dir)
    _, edges = _graph_dims(spark, sf_dir)
    return G.stream_distances(edges, meta, max_depth=10,
                              reachable_only=True)


def _q_graph_merged_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamevmon_spark.operators import graph as G

    hops, _ = _graph_hops(spark, sf_dir)
    _, edges = _graph_dims(spark, sf_dir)
    return G.apply_merges(edges, G.parallel_anonymous_merges(hops))


_AMP2_LINES_CACHE: dict = {}


def _amp2_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synth line-protocol input, materialized once per session: the
    generator itself localCheckpoints (see sources/amp2), so this cache
    only avoids re-materializing it per gate query."""
    from streamevmon_spark.sources import amp2 as A

    key = (spark.sparkContext.applicationId, sf_dir, "amp2_lines")
    if key not in _AMP2_LINES_CACHE:
        _AMP2_LINES_CACHE[key] = A.synth_amp2_lines(_events(spark, sf_dir))
    return _AMP2_LINES_CACHE[key]


def _esmond_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synth esmond time-series entries, materialized once per session
    (the generator localCheckpoints, see sources/esmond)."""
    from streamevmon_spark.sources import esmond as E

    key = (spark.sparkContext.applicationId, sf_dir, "esmond_entries")
    if key not in _AMP2_LINES_CACHE:
        _AMP2_LINES_CACHE[key] = E.synth_esmond_entries(
            _events(spark, sf_dir)
        )
    return _AMP2_LINES_CACHE[key]


def _q_esmond_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EsmondMeasurement.apply over all 6 concrete esmond types: REST
    base-URI stream ids, per-class payload summaries, unknown event
    types dropped whole (the reference throws)."""
    from streamevmon_spark.sources import esmond as E

    return E.esmond_typed(_esmond_entries(spark, sf_dir))


def _q_esmond_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream bucket-wise histogram merge over the typed Histogram
    entries (keys string->double, counts summed)."""
    from streamevmon_spark.sources import esmond as E

    return E.esmond_histogram_merged(_esmond_entries(spark, sf_dir))


def _flow_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synth flow_statistics line-protocol input, materialized once per
    session (the generator localCheckpoints, see sources/flow)."""
    from streamevmon_spark.sources import flow as FL

    key = (spark.sparkContext.applicationId, sf_dir, "flow_lines")
    if key not in _AMP2_LINES_CACHE:
        _AMP2_LINES_CACHE[key] = FL.synth_flow_lines(
            _events(spark, sf_dir)
        )
    return _AMP2_LINES_CACHE[key]


def _flow_typed_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 29-field typed Flow relation, parsed once per session and
    localCheckpointed — flow_typed and flow_rollup both consume it
    (same session-share trick as the amp2 family)."""
    from streamevmon_spark.sources import flow as FL

    key = (spark.sparkContext.applicationId, sf_dir, "flow_typed")
    if key not in _AMP2_LINES_CACHE:
        _AMP2_LINES_CACHE[key] = FL.flow_typed(
            _flow_lines(spark, sf_dir)
        ).localCheckpoint()
    return _AMP2_LINES_CACHE[key]


def _q_flow_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """libtrace-bigdata Flow.create over flow_statistics line protocol:
    the full 29-field typed relation incl. Option geolocation blocks
    and the reference's parse quirks."""
    return _flow_typed_shared(spark, sf_dir)


def _q_flow_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(capture_host, category, protocol) flow statistics over the
    typed Flow relation."""
    from streamevmon_spark.sources import flow as FL

    return FL.flow_rollup(_flow_typed_shared(spark, sf_dir))


def _amp2_parsed_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """line_protocol_maps output (line_id, measurement, tags, fields,
    time), parsed ONCE per session and localCheckpointed — the whole
    amp2 query family extracts from this one materialized parse (the
    checkpoint is also a physical no-collapse barrier, so the map
    builds can never be re-inlined per tag reference)."""
    from streamevmon_spark.sources import amp2 as A

    key = (spark.sparkContext.applicationId, sf_dir, "amp2_parsed")
    if key not in _AMP2_LINES_CACHE:
        _AMP2_LINES_CACHE[key] = A.line_protocol_maps(
            _amp2_lines(spark, sf_dir)
        ).localCheckpoint()
    return _AMP2_LINES_CACHE[key]


def _q_amp2_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full amp2 createFromLineProtocol: 10 families / 13 concrete
    types from line protocol, with per-type required-tag rejection,
    Direction validation and defaultValue/isLossy derivation."""
    from streamevmon_spark.sources import amp2 as A

    return A.amp2_typed(parsed=_amp2_parsed_shared(spark, sf_dir))


def _q_amp2_throughput(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One family's fully-typed relation (throughput: Direction tag,
    quoted-string duration stripped, double runtime, 'i'-suffixed
    longs)."""
    from streamevmon_spark.sources import amp2 as A

    return A.amp2_table(_amp2_parsed_shared(spark, sf_dir), "throughput")


def _q_amp2_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The latency supertype union (dns + icmp + tcpping column union,
    subtype-specific columns NULL where absent)."""
    from streamevmon_spark.sources import amp2 as A

    return A.amp2_latency_union(
        parsed=_amp2_parsed_shared(spark, sf_dir)
    )


def _amp_tokens_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMP v1 flat splitLineProtocol tokens (line_id, measurement, kvs,
    time), parsed ONCE per session and localCheckpointed — the whole
    AMP v1 family extracts from this one materialized parse (same
    session-share trick as the amp2 family)."""
    from streamevmon_spark.sources import amp as AM

    key = (spark.sparkContext.applicationId, sf_dir, "amp_tokens")
    if key not in _AMP2_LINES_CACHE:
        lines = AM.synth_amp_lines(_events(spark, sf_dir))
        _AMP2_LINES_CACHE[key] = AM.amp_tokens(lines).localCheckpoint()
    return _AMP2_LINES_CACHE[key]


def _q_amp_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMP v1 createMeasurement over all 5 line-protocol types (ICMP /
    DNS / HTTP / TCPPing / TraceroutePathlen): one-pass dispatch on
    the measurement name with per-type required-field rejection and
    defaultValue/isLossy derivation (reference
    measurements/traits/InfluxMeasurementFactory.scala:225-241)."""
    from streamevmon_spark.sources import amp as AM

    return AM.amp_typed(_amp_tokens_shared(spark, sf_dir))


def _q_amp_icmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fully-typed AMP ICMP relation incl. the getRtts array parse
    (';'-canon scalar), trailing-'i' ints and the loss-based isLossy
    (reference measurements/amp/ICMP.scala)."""
    from streamevmon_spark.sources import amp as AM

    return AM.amp_table(_amp_tokens_shared(spark, sf_dir), "icmp")


def _q_amp_dns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fully-typed AMP DNS relation: 7 Scala-toBoolean flags (the
    invalid-boolean line-rejection class included), 11 optional ints,
    lossrate-based isLossy (reference measurements/amp/DNS.scala)."""
    from streamevmon_spark.sources import amp as AM

    return AM.amp_table(_amp_tokens_shared(spark, sf_dir), "dns")


def _q_amp_tcpping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fully-typed AMP TCPPing relation (ICMP-shaped + icmperrors;
    reference measurements/amp/TCPPing.scala)."""
    from streamevmon_spark.sources import amp as AM

    return AM.amp_table(_amp_tokens_shared(spark, sf_dir), "tcpping")


def _q_amp_http(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fully-typed AMP HTTP relation (two required ints, byte-
    emptiness isLossy; reference measurements/amp/HTTP.scala)."""
    from streamevmon_spark.sources import amp as AM

    return AM.amp_table(_amp_tokens_shared(spark, sf_dir), "http")


def _q_amp_pathlen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fully-typed AMP TraceroutePathlen relation (bare-double
    field, constant-false isLossy; reference
    measurements/amp/TraceroutePathlen.scala)."""
    from streamevmon_spark.sources import amp as AM

    return AM.amp_table(_amp_tokens_shared(spark, sf_dir), "pathlen")


def _q_amp_rich_icmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RichICMP: the typed ICMP relation broadcast-enriched with the
    Postgres ICMPMeta dim (meta columns before base fields, stream
    re-keyed from meta — reference measurements/amp/RichICMP.scala,
    InfluxMeasurementFactory.enrichMeasurement:243-268)."""
    from streamevmon_spark.sources import amp as AM

    base = AM.amp_table(_amp_tokens_shared(spark, sf_dir), "icmp")
    return AM.enrich_amp(base, AM.synth_amp_meta(spark, "icmp"))


# topological linkage: groups whose streams are within this quirk-metric
# distance (2 x src-src hops) are linked; 6 keeps direct-backbone
# neighbours and cuts anon-detour streams, so the filter is selective
GRAPH_TOPO_MAX_DISTANCE = 6


def _q_graph_topo_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from streamevmon_spark.functions.porthash import hex32_sql
    from streamevmon_spark.operators import graph as G
    from streamevmon_spark.operators.event_grouping import (
        group_events_temporal,
        threshold_events,
    )

    _, meta = _graph_hops(spark, sf_dir)
    _, edges = _graph_dims(spark, sf_dir)
    dist = G.stream_distances(edges, meta, max_depth=10,
                              reachable_only=False)
    ev = threshold_events(load_transcripts(spark, sf_dir), threshold=100.0)
    groups = group_events_temporal(
        ev, max_interval_s=10, max_duration_s=7200
    )
    g2s = groups.select(
        "group_id",
        F.expr(
            f"CAST(({hex32_sql('group_id')}) % {G.N_STREAMS} AS INT)"
        ).alias("stream"),
    ).localCheckpoint()  # tiny (one row per group); the links relation
    # self-joins it, and without materialization Spark recomputes the
    # whole grouping subtree once per join side
    links = G.group_events_topological(
        g2s, dist, max_distance=GRAPH_TOPO_MAX_DISTANCE
    )
    # the link relation is quadratic per near-stream pair; the gate
    # checks its per-group profile (cardinality + nearest distance),
    # which pins the same join without materializing all pairs
    return links.groupBy("group_a").agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n_linked"),
        F.min("distance").alias("min_distance"),
    )


def _q_graph_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamevmon_spark.operators import graph as G

    vertices, edges = _graph_dims(spark, sf_dir)
    return G.graph_dot(vertices, edges)


def _itdk_synth(spark: SparkSession, sf_dir: str):
    """The synthetic ITDK tables (nodes, as, geo) — generated-as-lines,
    re-parsed by the real parsers, built once per session (generating
    each line relation scans the hop table once)."""
    from streamevmon_spark.operators import itdk as I

    key = (spark.sparkContext.applicationId, sf_dir, "itdk_synth")
    if key not in _HOPS_CACHE:
        hops, _ = _graph_hops(spark, sf_dir)
        _HOPS_CACHE[key] = I.synth_itdk(hops)
    return _HOPS_CACHE[key]


def _itdk_inverted(spark: SparkSession, sf_dir: str):
    """The synthetic ITDK inverted map (address -> node, asn),
    materialized once per session (it feeds three queries and both
    sides of the vertex relabel)."""
    from streamevmon_spark.operators import itdk as I

    key = (spark.sparkContext.applicationId, sf_dir, "itdk")
    if key not in _HOPS_CACHE:
        nodes, as_df, _geo = _itdk_synth(spark, sf_dir)
        _HOPS_CACHE[key] = I.itdk_inverted_map(
            nodes, as_df
        ).localCheckpoint()
    return _HOPS_CACHE[key]


def _q_line_protocol(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamevmon_spark.sources import measurements as M

    key = (spark.sparkContext.applicationId, sf_dir, "lp_lines")
    if key not in _AMP2_LINES_CACHE:
        # the generator localCheckpoints itself (sources/measurements);
        # the cache avoids re-materializing per gate query
        _AMP2_LINES_CACHE[key] = M.synth_line_protocol(_events(spark, sf_dir))
    return M.parse_line_protocol(_AMP2_LINES_CACHE[key])


def _q_itdk_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from streamevmon_spark.operators import itdk as I

    hops, _ = _graph_hops(spark, sf_dir)
    addrs = (
        hops.where(F.col("address").isNotNull())
        .select("address")
        .distinct()
    )
    return I.lookup_by_address(addrs, _itdk_inverted(spark, sf_dir))


def _q_itdk_as_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamevmon_spark.operators import itdk as I

    _nodes, as_df, geo = _itdk_synth(spark, sf_dir)
    node_ids = _itdk_inverted(spark, sf_dir).select("node_id").distinct()
    return I.geo_by_node(I.as_by_node(node_ids, as_df), geo)


def _q_itdk_vertices(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamevmon_spark.operators import itdk as I

    hops, _ = _graph_hops(spark, sf_dir)
    return _stringify_asns(
        I.itdk_vertices(hops, _itdk_inverted(spark, sf_dir))
    )


def _q_itdk_merged_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamevmon_spark.operators import itdk as I

    hops, _ = _graph_hops(spark, sf_dir)
    _, edges = _graph_dims(spark, sf_dir)
    mapping = I.resolve_aliases_itdk(hops, _itdk_inverted(spark, sf_dir))
    return I.itdk_merged_edges(edges, mapping)


def _graph_topo_links_oracle() -> str:
    from streamevmon_spark.functions.porthash import hex32_sql
    from streamevmon_spark.operators.graph import N_STREAMS

    groups_sql = oracles.event_groups_oracle(100.0, 10, 7200)
    stream_expr = f"({hex32_sql('group_id')}) % {N_STREAMS}"
    return graph_oracles.topo_group_links_oracle(
        groups_sql, stream_expr, GRAPH_TOPO_MAX_DISTANCE, 10
    )


def _graph_prune_min_us() -> int:
    from datetime import datetime, timezone

    cutoff = datetime.fromisoformat(GRAPH_PRUNE_NOW).replace(
        tzinfo=timezone.utc
    )
    return (
        int(cutoff.timestamp() * 1_000_000) - GRAPH_PRUNE_AGE_S * 1_000_000
    )


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamevmon_spark.session import ensure_workers_can_import

    ensure_workers_can_import(spark)
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from streamevmon_spark.session import ensure_workers_can_import

    ensure_workers_can_import(spark)
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _q_docs(op_module: str, fn: str, **kw):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        import importlib

        mod = importlib.import_module(f"streamevmon_spark.operators.{op_module}")
        return getattr(mod, fn)(_docs(spark, sf_dir), **kw)

    return q


def _q_embs(fn: str, **kw):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from streamevmon_spark.operators import similarity

        return getattr(similarity, fn)(_embs(spark, sf_dir), **kw)

    return q


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDERING CONTRACT: the driver's CORRECTNESS gate checks exactly the
    # first 50 entries. STANDING RULE (r2+r3 lesson): every query with no
    # driver CORRECTNESS record ever — including everything added this
    # round — goes at the FRONT; r0N-green rows fill the window behind
    # them, most-stale first. r5 state: positions 1-14 are the never
    # -checked set (the 3 r4 1d twins, the 9-query AMP v1 family +
    # decode-real, and the re-oracled ex-rows-only trio); the union of
    # r01..r05 driver records then covers every registered query.
    return {
        # --- r5 FRONT: the only 3 of the r4 surface with no driver
        # CORRECTNESS record ever (r4 verdict task #1) — the 1d
        # tier-parameter twins that sat just past the r4 window
        "sketch_incremental_1d": _q_sketch_incremental("1d"),
        "cascade_incremental_1d": _q_cascade_incremental("1d"),
        "stream_cascade_1d": _q_stream_cascade("1d"),
        # --- new r5: the AMP v1 typed measurement family (r4 verdict
        # task #2) — ICMP / DNS / HTTP / TCPPing / TraceroutePathlen
        # from flat splitLineProtocol tokens + RichICMP meta enrichment
        "amp_typed": _q_amp_typed,
        "amp_icmp": _q_amp_icmp,
        "amp_dns": _q_amp_dns,
        "amp_tcpping": _q_amp_tcpping,
        "amp_rich_icmp": _q_amp_rich_icmp,
        "amp_http": _q_amp_http,
        "amp_pathlen": _q_amp_pathlen,
        # --- new r5: real image decode over a generated-BMP corpus
        # (r4 verdict task #6) + the former rows-only trio, whose new
        # digest oracles need a driver record (r4 verdict task #5)
        "media_decode_real": _q_media_decode_real,
        "chunk_table": _q_chunk_table,
        "sketch_1h": _q_sketch_1h,
        "media_frame_sample": _q_frame_sample,
        # --- never driver-checked: r3 additions that sat past the
        # window (2) + every r4 addition ------------------------------
        # newest r4: streaming linear-interpolation gap-fill (append
        # mode, right-bracket-gated emission; batch-interp oracle)
        "stream_gapfill_interp_1h": _q_stream_gapfill_interp,
        # newest r4: LTTB + M4 served from the compressed chunk store —
        # decode is bit-exact, so the raw-path oracles apply verbatim
        "downsample_lttb_store": _q_downsample_lttb_store,
        "downsample_m4_store": _q_downsample_m4_store,
        # newest r4: detector replay + tier rebuild from the compressed
        # store (the reference's InfluxHistoryConnection pattern;
        # raw-path oracles verbatim)
        "detect_spike_store": _q_detect_spike_store,
        "rollup_1m_store": _q_rollup_store_1m,
        # newest r4: band-local LSH verification (applyInPandas verify
        # inside each band bucket — no global candidate relation; same
        # oracle as dedup_minhash_lsh, pinned row-identical)
        "dedup_minhash_lsh_bandlocal": _q_docs(
            "dedup", "minhash_lsh_pairs", threshold=0.2,
            verify_mode="band_local",
        ),
        # new r5: the hot-bucket triangle-salting path (bucket_budget=2
        # forces EVERY bucket through salted cells at sf0.01) and the
        # hashed-exchange path — both pinned row-identical to the same
        # oracle as the string/unsalted modes
        "dedup_minhash_lsh_salted": _q_docs(
            "dedup", "minhash_lsh_pairs", threshold=0.2,
            verify_mode="band_local", bucket_budget=2,
        ),
        "dedup_minhash_lsh_hashed": _q_docs(
            "dedup", "minhash_lsh_pairs", threshold=0.2,
            verify_mode="band_local", hash_shingles=True,
        ),
        # newest r4: regression/symbolic analytics (operators/regress)
        "trend_fit_1h": _q_trend_fit_1h,
        "tool_lag_corr": _q_tool_lag_corr,
        "sax_symbols": _q_sax_symbols,
        "seasonal_naive_1h": _q_seasonal_naive_1h,
        "activity_acf": _q_activity_acf,
        "theilsen_daily": _q_theilsen_daily,
        "topk_series_1h": _q_topk_series_1h,
        "series_churn_1d": _q_series_churn_1d,
        "downsample_lttb": _q_downsample_lttb,
        "stream_chunks_closed": _q_stream_chunks,
        # new r4 (late): count-min sketch heavy hitters — the store's
        # third mergeable sketch face (exact/t-digest/HLL/CM); the 1d
        # row is computed from SUM-merged 1h counter state
        "cm_topk_1h": _q_cm_topk_1h,
        "cm_topk_1d_merged": _q_cm_topk_1d_merged,
        # new r4 (late): fixed-le latency histograms + histogram_quantile
        # — the store's fourth mergeable sketch face; the 1d row is
        # computed from SUM-merged 1h counter state
        "hist_quantile_1h": _q_hist_quantile_1h,
        "hist_quantile_1d_merged": _q_hist_quantile_1d_merged,
        # new r4 (late): trend/alerting analytics — Holt-Winters
        # smoothing, trailing range-frame over_time aggregates,
        # for-duration threshold alerts, MAD robust outliers, per-tool
        # activity z-scores (operators/trend.py)
        # new r4 (late): tier-routing range read — the continuous-
        # aggregate READ path (interior days from 1d state, edge hours
        # from 1h, edge minutes from 1m; exact incl. percentiles)
        "realtime_range_agg": _q_realtime_range_agg,
        # new r4 (late): range read from the compressed chunk store —
        # only range-overlapping chunks are decoded (metadata prune
        # below the decode mapInPandas)
        "chunk_range_read": _q_chunk_range_read,
        # new r4 (late): same range, answered from STORED 1m/1h/1d tier
        # rows read directly per segment
        "realtime_range_agg_tiers": _q_realtime_range_agg_tiers,
        # new r4 (late): sketch-faced range read — exact face hashed,
        # quantile error pytest-bounded
        "realtime_range_sketch": _q_realtime_range_sketch,
        # new r4 (late): same range answered from the ON-DISK store's
        # mergeable tier faces — raw never opened on the read path
        "range_agg_from_store": _q_range_agg_from_store,
        "holt_winters": _q_holt_winters,
        "over_time_1h": _q_over_time,
        "alerts_for_duration": _q_alerts_for_duration,
        "mad_outliers_1h": _q_mad_outliers_1h,
        "activity_zscore_1h": _q_activity_zscore_1h,
        # new r4: M4 downsample — the fixed-time-grid pixel-exact
        # companion to LTTB (4 window argext picks, one exchange)
        "downsample_m4": _q_downsample_m4,
        # new r4: lexical retrieval (BM25 over map-side-filtered
        # postings) + PII scrubbing (map-only regex chain in the
        # Java/RE2 dialect intersection)
        "bm25_scores": _q_bm25,
        "pii_scrub": _q_pii_scrub,
        "unigram_logprob": _q_unigram_logprob,
        # new r4: manifest-driven incremental 1h/1d cascade refresh —
        # two-phase ingest into mergeable 1m state, day-partition
        # overwrite for new snapshot ranges only, hash-equal to the
        # full-rebuild oracle
        # new r4: incrementally maintained sketch tiers (run first so
        # the two-phase store build exercises the sketch watermark in
        # both phases; the cascade twins below then reuse the store)
        "sketch_incremental_1h": _q_sketch_incremental("1h"),
        "cascade_incremental_1h": _q_cascade_incremental("1h"),
        # new r4: STREAMING continuous-aggregate maintenance — the
        # foreachBatch subscribe-phase twin of the batch store; every
        # micro-batch appends 1m state and refreshes the touched 1h/1d
        # day-partitions (streaming/cascade_stream.py)
        "stream_cascade_1h": _q_stream_cascade("1h"),
        # new r4: perfSONAR esmond typed ingest — 6 concrete measurement
        # classes dispatched from event-type strings, REST-base-URI
        # stream ids, parse(print(x)) == x vs the closed-form oracle
        "esmond_typed": _q_esmond_typed,
        "esmond_histogram": _q_esmond_histogram,
        # new r4: libtrace-bigdata Flow family (flow_statistics line
        # protocol -> 29-field typed relation -> per-capture rollup)
        "flow_typed": _q_flow_typed,
        "flow_rollup": _q_flow_rollup,
        # new r4 (late additions, still in-window): session analytics
        # over the transcripts table + PromQL-style counter rate +
        # mergeable HLL distinct sketches per retention tier
        "session_stats": _q_session_stats,
        "role_transitions": _q_role_transitions,
        "context_growth": _q_context_growth,
        "counter_rate_1h": _q_counter_rate_1h,
        "hll_distinct_1h": _q_hll_1h,
        "hll_distinct_1d_merged": _q_hll_1d_merged,
        "smooth_ewma": _q_smooth_ewma,
        "hll_incremental_1h": _q_hll_incremental("1h"),
        "hll_incremental_1d": _q_hll_incremental("1d"),
        # --- r03-green, kept in-window (most recently changed code) --
        # topology-graph family (reference events/grouping/graph/*):
        # traceroute paths -> vertex/edge relations -> prune + largest
        # component -> parallel-anonymous merges -> stream distances ->
        # DOT export, all cross-engine hash-checked
        "graph_paths": _q_graph_paths,
        "graph_vertices": _q_graph_vertices,
        "graph_edges": _q_graph_edges,
        "graph_largest_component": _q_graph_largest_component,
        "graph_anon_merges": _q_graph_anon_merges,
        "graph_merged_edges": _q_graph_merged_edges,
        "graph_stream_distances": _q_graph_stream_distances,
        "graph_topo_links": _q_graph_topo_links,
        "graph_dot": _q_graph_dot,
        # training-data pipeline: similarity search over embeddings
        "ann_cosine_topk": _q_embs("cosine_topk", n_queries=10, k=5),
        "ann_lsh_topk": _q_embs("lsh_ann_topk", n_queries=10, k=5),
        "ann_ivf_topk": _q_embs("ivf_ann_topk", n_queries=10, k=5),
        "embedding_neardup": _q_embs("embedding_neardup_pairs",
                                     threshold=0.4),
        # hyperplane-LSH candidate generation + exact verify — the scale
        # path (no quadratic block join); params give deterministic 100%
        # recall at this threshold/seed, checked vs the exact oracle
        "embedding_neardup_lsh": _q_embs(
            "embedding_neardup_lsh", threshold=0.4, n_tables=24,
            bits_per_table=3,
        ),
        "dedup_simhash_pairs": _q_docs("dedup", "simhash_pairs",
                                       max_hamming=6),
        # document-frequency-capped variant — the 100 TB shape (drops
        # stopword-heavy shingles before the self-join)
        "dedup_ngram_capped": _q_docs(
            "dedup", "ngram_jaccard_pairs", threshold=0.2, max_doc_freq=50
        ),
        # near-dup CLUSTERS: LSH pairs -> connected components -> one
        # canonical doc per component (pairs alone under-delete because
        # near-dup is not transitive)
        "dedup_clusters": _q_docs("dedup", "dedup_clusters",
                                  threshold=0.2),
        # corpus assembly: split / vocabulary / contamination / packing
        "split_corpus": _q_docs("corpus", "split_corpus"),
        "vocabulary": _q_docs("corpus", "vocabulary", top_k=25),
        "contamination": _q_docs("corpus", "contamination",
                                 max_doc_freq=50),
        "pack_sequences": _q_docs("corpus", "pack_sequences",
                                  seq_len=256, n_shards=8),
        # deterministic (hash-keyed, engine-portable) sampling + text
        # normalization — reproducible corpus curation primitives
        "sample_hash": _q_docs("sampling", "sample_hash", rate=0.2),
        "sample_stratified": _q_docs(
            "sampling", "sample_stratified",
            rates={"en": 0.5, "de": 1.0}, default_rate=0.1,
        ),
        "sample_topk": _q_docs("sampling", "sample_topk_per_stratum",
                               k=25),
        "text_normalize": _q_docs("sampling", "text_normalize"),
        # composed training-data pipeline (quality -> dedup -> lang ->
        # embedding attach), oracle-checked end-to-end
        "curate_corpus": _q_curate,
        "flows_dag": _q_flows_dag,
        # generic streaming wrapper (pickled-blob keyed state, the Kryo
        # analogue): ANY detector fold runs streaming — mode's count map
        # and changepoint's Bayesian run arrays cross micro-batches
        "stream_detect_mode": _q_stream_detect_mode,
        "stream_detect_changepoint": _q_stream_detect_changepoint,
        "stream_event_groups": _q_stream_event_groups,
        "stream_detect_baseline": _q_stream_detect_baseline,
        "stream_detect_distdiff": _q_stream_detect_distdiff,
        "stream_gapfill_locf_1h": _q_stream_gapfill,
        # scalar (md5 + length) projection of the sampled frames so the
        # mapInPandas chunking is hash-checked without raw-blob canon
        "media_frame_digests": _q_frame_digests,
        # --- new r3: last never-driver-checked rows (3) ----------------
        # streaming form of the windowed distribution test (the last
        # detector missing one) + chunk compaction, the Iceberg
        # rewrite-data-files analogue over the Gorilla/DoD blob tables,
        # hash-checked both decoded (roundtrip) and on merged metadata
        "stream_detect_windowed_distdiff": (
            _q_stream_detect_windowed_distdiff
        ),
        "chunk_compact_roundtrip": _q_chunk_compact_roundtrip,
        "chunk_compact_stats": _q_chunk_compact_stats,
        # --- new r3: corpus-quality rule family (operators/quality) ---
        # Gopher/MassiveText rule flags, n-gram repetition features,
        # C4-style corpus-wide duplicate-block stats
        "quality_gopher": _q_docs("quality", "gopher_flags"),
        "gram_repetition": _q_docs("quality", "gram_repetition"),
        "block_dedup": _q_docs("quality", "block_dedup_stats"),
        # one r01-green sentinel holds the last window slot (its decode
        # path changed most recently — Pillow feature detection)
        "media_decode_fake": _q_media_decode,
        # --- new this round: quote-aware line-protocol parse (1) ------
        # reference connectors/influx/LineProtocol.scala — the last
        # 'partial' §2 row; checked as parse(print(x)) == x incl. the
        # whole-line rejection classes and ns->ms truncation
        "line_protocol_parse": _q_line_protocol,
        # --- new this round: ITDK lookup family (4) -------------------
        # reference events/grouping/graph/itdk/* — text parsers +
        # preprocessor join + AS/geo lookups + ITDK alias resolution,
        # all over a deterministic synthesized dataset whose LINES are
        # regenerated and re-parsed by the DuckDB oracle
        "itdk_lookup": _q_itdk_lookup,
        "itdk_as_geo": _q_itdk_as_geo,
        "itdk_vertices": _q_itdk_vertices,
        "itdk_merged_edges": _q_itdk_merged_edges,
        # --- new this round: reachable-only stream distances + the amp2
        # line-protocol ingest family (4) — never driver-checked, so they
        # outrank r01-green rows for the window
        "graph_stream_distances_cc": _q_graph_stream_distances_cc,
        "amp2_typed": _q_amp2_typed,
        "amp2_throughput": _q_amp2_throughput,
        "amp2_latency": _q_amp2_latency,
        # ===== position 50+: r01/r02-green rows (driver record held) ===
        # displaced r01-green rows (untouched pure-builtin transforms;
        # media_frame_sample is rows-only by design — its hash-checked
        # twin media_frame_digests sits inside the window)
        "dedup_simhash": _q_docs("dedup", "simhash_fingerprints"),
        "doc_fingerprints": _q_docs("textstats", "fingerprints"),
        "media_metadata": _q_media_metadata,
        "dedup_exact": _q_docs("dedup", "exact_dedup"),
        "dedup_ngram_jaccard": _q_docs(
            "dedup", "ngram_jaccard_pairs", threshold=0.2
        ),
        "dedup_minhash_lsh": _q_docs(
            "dedup", "minhash_lsh_pairs", threshold=0.2
        ),
        "token_counts": _q_docs("textstats", "token_counts"),
        "quality_scores": _q_docs("textstats", "quality_scores"),
        "lang_id": _q_docs("textstats", "lang_id"),
        "transcripts": _q_transcripts,
        "rollup_1m": _q_rollup("1m"),
        "cascade_exact_1d": _q_cascade_exact("1d"),
        "detect_spike": _q_detect(
            "spike", lag=5, threshold=2.0, influence=0.1, purge_s=86400
        ),
        "event_groups": _q_event_groups,
        "rollup_1h": _q_rollup("1h"),
        "rollup_1d": _q_rollup("1d"),
        "rollup_onepass_1m": _q_onepass("1m"),
        "rollup_onepass_1h": _q_onepass("1h"),
        "rollup_onepass_1d": _q_onepass("1d"),
        "rollup_1m_salted": _q_rollup_salted,
        # dense-window guard: exact below the row bound, t-digest above;
        # no sf0.01 window exceeds the bound, so the exact oracle applies
        # (the dense routing itself is exercised in tests/test_rollup.py)
        "rollup_guarded_1h": _q_rollup_guarded("1h"),
        "cascade_exact_1h": _q_cascade_exact("1h"),
        "cascade_1m_1h": _q_cascade("1m", "1h"),
        "cascade_1h_1d": _q_cascade("1h", "1d"),
        "inter_turn_latency": _q_inter_turn_latency,
        # source layer (typed streams, stream ids, range scan, tags, csv)
        "source_typed_lossy": _q_source_typed_lossy,
        "history_scan": _q_history_scan,
        "parse_tags": _q_parse_tags,
        "amp2_stream_key": _q_amp2_key,
        "histogram_merge": _q_histogram_merge,
        "csv_projection": _q_csv_projection,
        # scalar-function layer: rtts parse + smokeping median (§2.8)
        "smokeping_median": _q_smokeping,
        # NAB lifecycle: filename-keyed scan feeding the scoring format
        "nab_format": _q_nab_format,
        # join-like operators (broadcast enrichment, positional zip)
        "enrich_meta": _q_enrich_meta,
        "zip_streams": _q_zip_streams,
        # point-in-time (as-of) enrichment — union+window, one shuffle
        "asof_enrich": _q_asof_enrich,
        "gapfill_locf_1h": _q_gapfill("locf"),
        "gapfill_interp_1h": _q_gapfill("interp"),
        "gapfill_pandas_interp_1h": _q_gapfill_pandas,
        # codec round-trip as a hard gate check: encode→decode must equal
        # the gap-fill oracle bit-for-bit
        "chunk_roundtrip": _q_chunk_roundtrip,
        # events layer (reference detectors + post-processing)
        "threshold_events": _q_threshold,
        "single_event_groups": _q_single_event_groups,
        "event_line_protocol": _q_event_line_protocol,
        "frequent_event_filter": _q_frequent_filter,
        # sequential detector kernels (reference semantics; pinned-vector
        # tested in tests/test_detectors.py)
        # windows sized to the short per-series histories of the test data
        "detect_baseline": _q_detect(
            "baseline", max_history=5, percentile=0.1, threshold=10,
            purge_s=86400,
        ),
        "detect_loss": _q_detect("loss", loss_count=3, consecutive_count=2),
        "detect_mode": _q_detect(
            "mode", max_history=5, min_frequency=1, min_prominence=0,
            threshold=0.1, purge_s=86400,
        ),
        "detect_distdiff": _q_detect(
            "distdiff", recents_count=4, drop_extreme_n=0, z_threshold=0.5,
            minimum_change=1.05, purge_s=86400,
        ),
        "detect_changepoint": _q_detect_changepoint,
        "detect_windowed_distdiff": _q_windowed_distdiff,
        "spike_details": _q_spike_details,
        # retention (age-out policy per tier)
        "retention_1m": _q_retention_1m,
        "retention_expired_parts": _q_retention_expired,
        # structured streaming (watermarked aggregate + keyed state)
        "stream_rollup_1m": _q_stream_rollup,
        "stream_latency": _q_stream_latency,
        # streaming stateful detector: loss fold state carried across
        # micro-batches (one file per trigger), equal to the batch
        # detector and its window-SQL oracle
        "stream_detect_loss": _q_stream_detect_loss,
        "stream_detect_spike": _q_stream_detect_spike,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "trend_fit_1h": oracles.trend_fit_oracle("1h", horizon_s=600),
        "tool_lag_corr": oracles.tool_lag_corr_oracle("1h", lag_buckets=1),
        "sax_symbols": oracles.sax_symbols_oracle(n_segments=8),
        "seasonal_naive_1h": oracles.seasonal_naive_oracle(
            "1h", season_buckets=24, threshold=50.0
        ),
        "activity_acf": oracles.activity_acf_oracle("1h", max_lag=6),
        "theilsen_daily": oracles.theilsen_daily_oracle("1h"),
        "topk_series_1h": oracles.topk_series_oracle("1h", k=5),
        "series_churn_1d": oracles.series_churn_oracle("1d"),
        "transcripts": oracles.transcripts_oracle(),
        "rollup_1m": oracles.rollup_oracle("1m"),
        "rollup_1m_store": oracles.rollup_oracle("1m"),
        "rollup_1h": oracles.rollup_oracle("1h"),
        "rollup_1d": oracles.rollup_oracle("1d"),
        "rollup_onepass_1m": oracles.rollup_oracle("1m"),
        "rollup_onepass_1h": oracles.rollup_oracle("1h"),
        "rollup_onepass_1d": oracles.rollup_oracle("1d"),
        "rollup_1m_salted": oracles.salted_rollup_oracle("1m"),
        "rollup_guarded_1h": oracles.rollup_oracle("1h"),
        "cascade_exact_1h": oracles.rollup_oracle("1h"),
        "cascade_exact_1d": oracles.rollup_oracle("1d"),
        "cascade_1m_1h": oracles.cascade_oracle("1h"),
        "cascade_1h_1d": oracles.cascade_oracle("1d"),
        # incremental refresh must equal the full rebuild exactly, so
        # the full-rebuild rollup oracle IS its oracle
        "cascade_incremental_1h": oracles.rollup_oracle("1h"),
        "stream_cascade_1h": oracles.rollup_oracle("1h"),
        "stream_cascade_1d": oracles.rollup_oracle("1d"),
        "cascade_incremental_1d": oracles.rollup_oracle("1d"),
        # the sketch tier's exact face (total weight + min/max) vs the
        # raw-side aggregate; centroid accuracy is pytest-tolerance
        "sketch_incremental_1h": oracles.sketch_exact_stats_oracle("1h"),
        "sketch_incremental_1d": oracles.sketch_exact_stats_oracle("1d"),
        "esmond_typed": esmond_oracles.esmond_typed_oracle(),
        "esmond_histogram": esmond_oracles.esmond_histogram_oracle(),
        "flow_typed": flow_oracles.flow_typed_oracle(),
        "flow_rollup": flow_oracles.flow_rollup_oracle(),
        "inter_turn_latency": oracles.inter_turn_latency_oracle(),
        "source_typed_lossy": oracles.typed_lossy_stream_ids_oracle("click"),
        "history_scan": oracles.history_scan_oracle(
            "2024-01-01 06:00:00", "2024-01-02 00:00:00"
        ),
        "parse_tags": oracles.parse_tags_oracle(),
        "amp2_stream_key": oracles.amp2_stream_key_oracle(),
        "histogram_merge": oracles.histogram_merge_oracle(10.0),
        "csv_projection": oracles.csv_projection_oracle(),
        "smokeping_median": oracles.smokeping_median_oracle(),
        "nab_format": oracles.nab_format_oracle(150.0, "continuous"),
        "single_event_groups": oracles.single_event_groups_oracle(100.0),
        "event_line_protocol": oracles.event_line_protocol_oracle(100.0),
        "enrich_meta": oracles.enrich_meta_oracle(),
        "zip_streams": oracles.zip_streams_oracle("click", "view"),
        # DuckDB's native ASOF JOIN is the independent as-of semantics
        "asof_enrich": """
            SELECT c.user_id, c.ts, c.event_id,
                   e.ts AS err_ts, e.value AS err_value
            FROM (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'click') c
            ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                            WHERE event_type = 'error') e
              ON c.user_id = e.user_id AND c.ts >= e.ts
        """,
        "gapfill_locf_1h": oracles.gapfill_oracle("1h", "locf", 7200),
        "gapfill_interp_1h": oracles.gapfill_oracle("1h", "interp", 7200),
        "gapfill_pandas_interp_1h": oracles.gapfill_oracle(
            "1h", "interp", 7200
        ),
        "chunk_roundtrip": oracles.chunk_roundtrip_oracle(
            "1h", "interp", 7200
        ),
        # r5: the former rows-only trio, now oracle-checked via digest
        # projections (decoded-face chunk digest / sketch exact face /
        # frame md5s at a second parameterization)
        "chunk_table": oracles.chunk_table_digest_oracle("1h", "1d"),
        "sketch_1h": oracles.sketch_exact_stats_oracle("1h"),
        "media_frame_sample": docs_oracles.media_frame_digests_oracle(
            frame_bytes=512, every_n=3
        ),
        # compaction decodes to the same grid, so the same oracle; the
        # stats twin hash-checks the merged per-bucket metadata
        "chunk_compact_roundtrip": oracles.chunk_roundtrip_oracle(
            "1h", "interp", 7200
        ),
        "chunk_compact_stats": oracles.chunk_compact_stats_oracle(
            "1h", "interp", chunk_tier="1d", purge_gap_s=7200
        ),
        "threshold_events": oracles.threshold_oracle(100.0),
        "event_groups": oracles.event_groups_oracle(100.0, 10, 7200),
        # chunk_table / sketch_1h: binary sketch/codec blobs — rows-only
        # (their hash-checked twins are chunk_roundtrip / the exact
        # rollup oracles); every detector below has a recursive-CTE
        # oracle replaying the kernel's float ops bit-exactly
        "detect_changepoint": oracles.changepoint_events_oracle(
            max_history=8, trigger_count=2, minimum_event_interval_s=0,
            severity_threshold=20, purge_s=86400,
            value_expr=(
                "(CASE WHEN turn_idx < 8 THEN 10000.0 + value"
                " ELSE 40000.0 + value END)"
            ),
        ),
        "frequent_event_filter": oracles.frequent_event_filter_oracle(
            configs=(
                ("small", 1, 3600, 7200, 25),
                ("medium", 2, 14400, 28800, 50),
                ("large", 3, 86400, 86400, 75),
            ),
            threshold=100.0,
        ),
        # loss + baseline folds ARE window-SQL-expressible — full oracles:
        "detect_loss": oracles.loss_events_oracle(
            max_history=30, loss_count=3, consecutive_count=2
        ),
        "detect_baseline": oracles.baseline_events_oracle(
            max_history=5, percentile=0.1, threshold=10, purge_s=86400
        ),
        "detect_spike": oracles.spike_events_oracle(
            lag=5, threshold=2.0, influence=0.1, purge_s=86400
        ),
        "detect_spike_store": oracles.spike_events_oracle(
            lag=5, threshold=2.0, influence=0.1, purge_s=86400
        ),
        "spike_details": oracles.spike_details_oracle(
            lag=5, threshold=2.0, influence=0.1, purge_s=86400
        ),
        "detect_mode": oracles.mode_events_oracle(
            max_history=5, min_frequency=1, min_prominence=0,
            threshold=0.1, purge_s=86400,
        ),
        "detect_distdiff": oracles.distdiff_events_oracle(
            recents_count=4, drop_extreme_n=0, z_threshold=0.5,
            minimum_change=1.05, purge_s=86400,
        ),
        "detect_windowed_distdiff": oracles.windowed_distdiff_oracle(
            window_s=7 * 86400, recents_count=4, drop_extreme_n=0,
            z_threshold=0.5, minimum_change=1.02,
        ),
        "retention_1m": oracles.retention_oracle(
            "1m", RETENTION_NOW, RETENTION_HORIZON_S
        ),
        "retention_expired_parts": oracles.expired_partitions_oracle(
            "1m", RETENTION_NOW, RETENTION_HORIZON_S
        ),
        "stream_rollup_1m": oracles.stream_rollup_oracle("1m"),
        "stream_latency": oracles.stream_latency_oracle(),
        "stream_detect_loss": oracles.loss_events_oracle(
            max_history=30, loss_count=3, consecutive_count=2
        ),
        # the streaming spike fold carries its rolling-sum accumulators
        # across micro-batches, so it stays bit-equal to the batch
        # kernel's recursive-CTE oracle
        "stream_detect_spike": oracles.spike_events_oracle(
            lag=5, threshold=2.0, influence=0.1, purge_s=86400
        ),
        # generic blob-state streaming wrapper: same fold, same oracle
        "stream_detect_mode": oracles.mode_events_oracle(
            max_history=5, min_frequency=1, min_prominence=0,
            threshold=0.1, purge_s=86400,
        ),
        "stream_detect_changepoint": oracles.changepoint_events_oracle(
            max_history=8, trigger_count=2, minimum_event_interval_s=0,
            severity_threshold=20, purge_s=86400,
            value_expr=(
                "(CASE WHEN turn_idx < 8 THEN 10000.0 + value"
                " ELSE 40000.0 + value END)"
            ),
        ),
        "stream_detect_windowed_distdiff": (
            oracles.windowed_distdiff_oracle(
                window_s=7 * 86400, recents_count=4, drop_extreme_n=0,
                z_threshold=0.5, minimum_change=1.02,
            )
        ),
        "downsample_lttb": oracles.lttb_oracle(64),
        "downsample_lttb_store": oracles.lttb_oracle(64),
        "downsample_m4": oracles.m4_oracle(),
        "downsample_m4_store": oracles.m4_oracle(),
        "session_stats": oracles.session_stats_oracle(1800),
        "role_transitions": oracles.role_transitions_oracle(),
        "context_growth": oracles.context_growth_oracle(512),
        "counter_rate_1h": oracles.counter_rate_oracle("1h", 4096),
        "hll_distinct_1h": oracles.hll_distinct_oracle("1h"),
        # the merged query's oracle is the DIRECT from-raw 1d sketch:
        # hash-equality IS the mergeability proof (max of maxes == max)
        "hll_distinct_1d_merged": oracles.hll_distinct_oracle("1d"),
        "cm_topk_1h": oracles.cm_topk_oracle("1h", 5),
        # direct from-raw 1d computation — hash-equality proves the
        # SUM-merge (sum of sums == sum)
        "cm_topk_1d_merged": oracles.cm_topk_oracle("1d", 5),
        "hist_quantile_1h": oracles.hist_quantile_oracle("1h"),
        # direct from-raw 1d computation — hash-equality proves the
        # SUM-merge (sum of sums == sum)
        "hist_quantile_1d_merged": oracles.hist_quantile_oracle("1d"),
        # direct raw-range-scan oracle: a different computation path
        # than the stitched tier read it checks
        "realtime_range_agg": oracles.realtime_range_agg_oracle(),
        # direct raw-range-scan oracle; the Spark side answered from
        # decoded Gorilla/DoD blobs
        "chunk_range_read": oracles.chunk_range_read_oracle(),
        # same direct raw-range-scan oracle as realtime_range_agg — the
        # Spark side reads stored tier rows instead
        "realtime_range_agg_tiers": oracles.realtime_range_agg_oracle(),
        # exact-face oracle: count/min/max of lat_us over the raw range
        "realtime_range_sketch": oracles.realtime_range_sketch_oracle(),
        # store-backed read, same raw-scan oracle (third engine path)
        "range_agg_from_store": oracles.realtime_range_agg_oracle(),
        "holt_winters": oracles.holt_winters_oracle(0.3, 0.1),
        "over_time_1h": oracles.over_time_oracle(3600),
        "alerts_for_duration": oracles.alerts_for_duration_oracle(
            100.0, 300
        ),
        "mad_outliers_1h": oracles.mad_outliers_oracle("1h", 3.0),
        "activity_zscore_1h": oracles.activity_zscore_oracle("1h", 24),
        "smooth_ewma": oracles.smooth_ewma_oracle(0.3),
        "hll_incremental_1h": oracles.hll_distinct_oracle("1h"),
        "hll_incremental_1d": oracles.hll_distinct_oracle("1d"),
        "bm25_scores": docs_oracles.bm25_oracle(BM25_TERMS),
        "pii_scrub": docs_oracles.pii_scrub_oracle(PII_AUG_DUCK),
        "unigram_logprob": docs_oracles.unigram_logprob_oracle(),
        "stream_chunks_closed": oracles.stream_chunks_closed_oracle("1h"),
        "flows_dag": (
            "SELECT * FROM ("
            + oracles.loss_events_oracle(
                max_history=30, loss_count=3, consecutive_count=2
            )
            + ") UNION ALL SELECT * FROM ("
            + oracles.spike_events_oracle(
                lag=5, threshold=2.0, influence=0.1, purge_s=86400
            )
            + ")"
        ),
        "stream_gapfill_locf_1h": oracles.gapfill_oracle(
            "1h", "locf", 7200
        ),
        "stream_gapfill_interp_1h": oracles.gapfill_oracle(
            "1h", "interp", 7200
        ),
        "stream_event_groups": oracles.stream_event_groups_oracle(
            threshold=100.0, gap_s=10
        ),
        "stream_detect_baseline": oracles.baseline_events_oracle(
            max_history=5, percentile=0.1, threshold=10, purge_s=86400
        ),
        "stream_detect_distdiff": oracles.distdiff_events_oracle(
            recents_count=4, drop_extreme_n=0, z_threshold=0.5,
            minimum_change=1.05, purge_s=86400,
        ),
        "media_metadata": oracles.media_metadata_oracle(),
        # byte-level fake decode re-derived from the ASCII text column;
        # media_frame_sample stays rows-only (raw binary column), its
        # digest twin below is the hash-checked variant
        "media_decode_fake": docs_oracles.media_decode_oracle(),
        "media_frame_digests": docs_oracles.media_frame_digests_oracle(),
        "media_decode_real": docs_oracles.media_decode_real_oracle(),
        # corpus-quality rule family (operators/quality.py)
        "quality_gopher": docs_oracles.gopher_flags_oracle(),
        "gram_repetition": docs_oracles.gram_repetition_oracle(),
        "block_dedup": docs_oracles.block_dedup_oracle(),
        "token_counts": docs_oracles.token_counts_oracle(),
        "quality_scores": docs_oracles.quality_scores_oracle(),
        "lang_id": docs_oracles.lang_id_oracle(),
        "doc_fingerprints": docs_oracles.fingerprints_oracle(),
        "dedup_exact": docs_oracles.exact_dedup_oracle(),
        "dedup_ngram_jaccard": docs_oracles.ngram_jaccard_oracle(0.2),
        "dedup_ngram_capped": docs_oracles.ngram_jaccard_capped_oracle(
            0.2, 50
        ),
        "dedup_minhash_lsh": docs_oracles.minhash_lsh_oracle(0.2),
        "dedup_minhash_lsh_salted": docs_oracles.minhash_lsh_oracle(0.2),
        "dedup_minhash_lsh_hashed": docs_oracles.minhash_lsh_oracle(0.2),
        "dedup_minhash_lsh_bandlocal": docs_oracles.minhash_lsh_oracle(0.2),
        "dedup_simhash": docs_oracles.simhash_oracle(),
        "dedup_simhash_pairs": docs_oracles.simhash_pairs_oracle(6),
        "dedup_clusters": docs_oracles.dedup_clusters_oracle(0.2),
        "sample_hash": docs_oracles.sample_hash_oracle(0.2),
        "sample_stratified": docs_oracles.sample_stratified_oracle(
            {"en": 0.5, "de": 1.0}, 0.1
        ),
        "sample_topk": docs_oracles.sample_topk_oracle(25),
        "text_normalize": docs_oracles.text_normalize_oracle(),
        "split_corpus": docs_oracles.split_corpus_oracle(),
        "vocabulary": docs_oracles.vocabulary_oracle(25),
        "contamination": docs_oracles.contamination_oracle(
            max_doc_freq=50
        ),
        "pack_sequences": docs_oracles.pack_sequences_oracle(
            seq_len=256, n_shards=8
        ),
        "ann_cosine_topk": docs_oracles.cosine_topk_oracle(10, 5),
        "embedding_neardup": docs_oracles.embedding_neardup_oracle(0.4),
        "embedding_neardup_lsh": docs_oracles.embedding_neardup_oracle(0.4),
        "curate_corpus": docs_oracles.curate_corpus_oracle(),
        # full mirror incl. the deterministic hyperplane literals — the
        # scale-path ANN is oracle-checked end-to-end, not just recall-
        # tested
        "ann_lsh_topk": docs_oracles.lsh_ann_topk_oracle(10, 5),
        # same discipline for the IVF path: centroid literals mirrored,
        # so the inverted-file ANN is oracle-checked end-to-end too
        "ann_ivf_topk": docs_oracles.ivf_ann_topk_oracle(10, 5),
        "graph_paths": graph_oracles.paths_oracle(),
        "graph_vertices": graph_oracles.vertices_oracle(),
        "graph_edges": graph_oracles.edges_oracle(),
        "graph_largest_component": graph_oracles.largest_component_oracle(
            _graph_prune_min_us()
        ),
        "graph_anon_merges": graph_oracles.anon_merges_oracle(),
        "graph_merged_edges": graph_oracles.merged_edges_oracle(),
        "graph_stream_distances": graph_oracles.stream_distances_oracle(10),
        "graph_stream_distances_cc":
            graph_oracles.stream_distances_cc_oracle(10),
        "amp_typed": amp_oracles.amp_typed_oracle(),
        "amp_icmp": amp_oracles.amp_icmp_oracle(),
        "amp_dns": amp_oracles.amp_dns_oracle(),
        "amp_tcpping": amp_oracles.amp_tcpping_oracle(),
        "amp_rich_icmp": amp_oracles.amp_rich_icmp_oracle(),
        "amp_http": amp_oracles.amp_http_oracle(),
        "amp_pathlen": amp_oracles.amp_pathlen_oracle(),
        "amp2_typed": amp2_oracles.amp2_typed_oracle(),
        "amp2_throughput": amp2_oracles.amp2_throughput_oracle(),
        "amp2_latency": amp2_oracles.amp2_latency_oracle(),
        "graph_topo_links": _graph_topo_links_oracle(),
        "graph_dot": graph_oracles.graph_dot_oracle(),
        "line_protocol_parse": oracles.line_protocol_parse_oracle(),
        "itdk_lookup": itdk_oracles.lookup_oracle(),
        "itdk_as_geo": itdk_oracles.as_geo_oracle(),
        "itdk_vertices": itdk_oracles.vertices_oracle(),
        "itdk_merged_edges": itdk_oracles.merged_edges_oracle(),
    }
