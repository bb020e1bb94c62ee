"""Structured Streaming tests: streaming results must equal the batch
engine's on the same input — including state carried across
micro-batches (the analogue of the reference's snapshot/restore harness
tests, reference: checkpointing/NoDependencyCheckpointingTests.scala)."""

from __future__ import annotations

import os
import uuid

from pyspark.sql import functions as F

from streamevmon_spark.data.transcripts import load_transcripts
from streamevmon_spark.operators.rollup import add_inter_turn_latency, rollup_tier
from streamevmon_spark.streaming import rollup_stream as S


def _input_dir(spark, sf_dir, tmp_path_factory=None):
    return S.materialize_transcripts(
        spark, sf_dir, S.stream_input_dir(sf_dir), n_files=4
    )


def _sorted_pdf(df, cols):
    return (
        df.select(*cols)
        .toPandas()
        .sort_values(cols, ignore_index=True)
    )


def test_stream_rollup_equals_batch(spark, sf_dir):
    path = _input_dir(spark, sf_dir)
    name = f"sr_{uuid.uuid4().hex[:8]}"
    S.run_available_now(
        S.stream_rollup(S.stream_transcripts(spark, path), "1m"), name
    )
    got = spark.table(name)
    exp = rollup_tier(load_transcripts(spark, sf_dir), "1m").select(
        "conv_id", "tool", "role", "window_start", "turn_count",
        "lossy_count", "val_avg", "activity_rate",
    )
    cols = exp.columns
    import pandas as pd

    pd.testing.assert_frame_equal(_sorted_pdf(got, cols), _sorted_pdf(exp, cols))


def test_stream_latency_state_across_microbatches(spark, sf_dir):
    path = _input_dir(spark, sf_dir)
    name = f"sl_{uuid.uuid4().hex[:8]}"
    # one file per trigger => 4 micro-batches; state must carry latencies
    # across batch boundaries exactly
    S.run_available_now(
        S.stream_inter_turn_latency(
            S.stream_transcripts(spark, path, max_files_per_trigger=1)
        ),
        name,
        output_mode="append",
    )
    got = spark.table(name)
    assert got.count() == load_transcripts(spark, sf_dir).count()
    exp = add_inter_turn_latency(load_transcripts(spark, sf_dir)).select(
        "conv_id", "tool", "role", "turn_idx", "ts", "lat_us"
    )
    cols = ["conv_id", "tool", "role", "turn_idx", "ts", "lat_us"]
    import pandas as pd

    g, x = _sorted_pdf(got, cols), _sorted_pdf(exp, cols)
    g["lat_us"] = g["lat_us"].astype("float64")
    x["lat_us"] = x["lat_us"].astype("float64")
    pd.testing.assert_frame_equal(g, x)
    # cross-boundary evidence: some latencies must span micro-batch edges
    n_batches = 4
    assert g["lat_us"].notna().sum() > 0
    assert n_batches > 1


def test_stream_detect_spike_equals_batch(spark, sf_dir):
    """Drained streaming spike events equal the batch detector's: the
    history queue AND its rolling-sum accumulators cross micro-batch
    boundaries, so the resumed fold is the identical IEEE op sequence."""
    from streamevmon_spark.operators.detect import detect

    path = _input_dir(spark, sf_dir)
    name = f"ss_{uuid.uuid4().hex[:8]}"
    kw = dict(lag=5, threshold=2.0, influence=0.1, purge_s=86400)
    S.run_available_now(
        S.stream_detect_spike(
            S.stream_transcripts(spark, path, max_files_per_trigger=1),
            **kw,
        ),
        name,
        output_mode="append",
    )
    got = spark.table(name)
    exp = detect(load_transcripts(spark, sf_dir), "spike", **kw)
    cols = ["event_type", "conv_id", "tool", "role", "severity", "ts",
            "detection_latency_us", "description"]
    import pandas as pd

    g, x = _sorted_pdf(got, cols), _sorted_pdf(exp, cols)
    assert len(x) > 0
    pd.testing.assert_frame_equal(
        g.astype({"severity": "int64"}), x.astype({"severity": "int64"})
    )


def _assert_stream_equals_batch(spark, sf_dir, detector, shift=False, **kw):
    from streamevmon_spark.operators.detect import detect

    path = _input_dir(spark, sf_dir)
    name = f"sg_{uuid.uuid4().hex[:8]}"
    stream_in = S.stream_transcripts(spark, path, max_files_per_trigger=1)
    batch_in = load_transcripts(spark, sf_dir)
    if shift:
        shifted = (
            F.when(F.col("turn_idx") < 8, F.lit(10000.0) + F.col("value"))
            .otherwise(F.lit(40000.0) + F.col("value"))
        )
        stream_in = stream_in.withColumn("value", shifted)
        batch_in = batch_in.withColumn("value", shifted)
    S.run_available_now(
        S.stream_detect(stream_in, detector, **kw), name,
        output_mode="append",
    )
    got = spark.table(name)
    exp = detect(batch_in, detector, **kw)
    cols = ["event_type", "conv_id", "tool", "role", "severity", "ts",
            "detection_latency_us", "description"]
    import pandas as pd

    g, x = _sorted_pdf(got, cols), _sorted_pdf(exp, cols)
    assert len(x) > 0
    pd.testing.assert_frame_equal(
        g.astype({"severity": "int64"}), x.astype({"severity": "int64"})
    )


def test_stream_detect_generic_mode_equals_batch(spark, sf_dir):
    """The generic pickled-state streaming wrapper must equal the batch
    detector — mode's count-map state crosses micro-batches."""
    _assert_stream_equals_batch(
        spark, sf_dir, "mode", max_history=5, min_frequency=1,
        min_prominence=0, threshold=0.1, purge_s=10**6,
    )


def test_stream_detect_windowed_distdiff_equals_batch(spark, sf_dir):
    """The per-tumbling-window distribution test as a streaming fold:
    window-bucket + bounded first-2n buffer state crosses micro-batches
    and drained output equals the batch detect_windowed_distdiff."""
    import pandas as pd

    from streamevmon_spark.operators.detect import detect_windowed_distdiff

    kw = dict(window_s=7 * 86400, recents_count=4, drop_extreme_n=0,
              z_threshold=0.5, minimum_change=1.02)
    # embed a level shift so windows whose first 2n values straddle
    # turn_idx 8 actually fire at test scale (same trick as changepoint)
    shifted = (
        F.when(F.col("turn_idx") < 8, F.lit(100.0) + F.col("value"))
        .otherwise(F.lit(40000.0) + F.col("value"))
    )
    path = _input_dir(spark, sf_dir)
    name = f"swd_{uuid.uuid4().hex[:8]}"
    S.run_available_now(
        S.stream_detect(
            S.stream_transcripts(
                spark, path, max_files_per_trigger=1
            ).withColumn("value", shifted),
            "windowed_distdiff", **kw,
        ),
        name,
        output_mode="append",
    )
    got = spark.table(name)
    exp = detect_windowed_distdiff(
        load_transcripts(spark, sf_dir).withColumn("value", shifted), **kw
    )
    cols = ["event_type", "conv_id", "tool", "role", "severity", "ts",
            "detection_latency_us", "description"]
    g, x = _sorted_pdf(got, cols), _sorted_pdf(exp, cols)
    assert len(x) > 0
    pd.testing.assert_frame_equal(
        g.astype({"severity": "int64"}), x.astype({"severity": "int64"})
    )


def test_stream_detect_generic_changepoint_equals_batch(spark, sf_dir):
    """Bayesian run arrays + rollback snapshot cross micro-batches via
    the pickled blob state; drained output equals the batch kernel."""
    _assert_stream_equals_batch(
        spark, sf_dir, "changepoint", shift=True, max_history=8,
        trigger_count=2, minimum_event_interval_s=0,
        severity_threshold=20, purge_s=10**6,
    )


def test_stream_rollup_sink_checkpoint_resume(spark, sf_dir, tmp_path):
    """Kill-and-restart semantics via Spark's streaming checkpoint: run
    the sink job on half the input files, then drop in the rest and
    restart with the SAME checkpoint — only the new files are
    processed (restored source offsets + window state), and the final
    sink equals the batch engine's rollup of the whole input."""
    import shutil

    import pandas as pd

    src = _input_dir(spark, sf_dir)
    staged = tmp_path / "staged_in"
    staged.mkdir()
    parts = sorted(
        f for f in os.listdir(src)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    half = len(parts) // 2
    for f in parts[:half]:
        shutil.copy2(os.path.join(src, f), staged / f)
    out = str(tmp_path / "sink_out")
    ckpt = str(tmp_path / "ckpt")
    S.stream_rollup_to_sink(spark, str(staged), out, ckpt, tier="1m")
    n_first = spark.read.parquet(out).count()
    for f in parts[half:]:
        shutil.copy2(os.path.join(src, f), staged / f)
    S.stream_rollup_to_sink(spark, str(staged), out, ckpt, tier="1m")

    got = spark.read.parquet(out)
    exp = rollup_tier(load_transcripts(spark, sf_dir), "1m").select(
        "conv_id", "tool", "role", "window_start", "turn_count",
        "lossy_count", "val_avg", "activity_rate",
    )
    cols = exp.columns
    assert n_first < exp.count()  # first run really was partial
    pd.testing.assert_frame_equal(_sorted_pdf(got, cols), _sorted_pdf(exp, cols))


def test_stream_event_groups_merge_across_micro_batches(spark):
    """With a 1-hour gap, sessions definitely span the 4 time-ranged
    input files (1 per micro-batch) — the session-window state must
    merge them into the same groups a batch gaps-and-islands pass
    produces."""
    import uuid

    import pandas as pd

    from streamevmon_spark.data.transcripts import load_transcripts
    from streamevmon_spark.streaming import rollup_stream as S

    sf_dir = "/root/testdata/sf0.001"
    path = S.materialize_transcripts(
        spark, sf_dir, S.stream_input_dir(sf_dir)
    )
    name = f"t_seg_{uuid.uuid4().hex[:8]}"
    gap_s = 3600
    S.run_available_now(
        S.stream_event_groups(
            S.stream_transcripts(spark, path, max_files_per_trigger=1),
            threshold=0.0, gap_s=gap_s,
        ),
        name,
    )
    got = (
        spark.table(name)
        .toPandas()
        .sort_values(["conv_id", "tool", "role", "group_start"])
        .reset_index(drop=True)
    )
    # batch reference: per-series gaps-and-islands in pandas
    ev = (
        load_transcripts(spark, sf_dir)
        .where("value > 0.0")
        .select("conv_id", "tool", "role", "ts", "value")
        .toPandas()
        .sort_values(["conv_id", "tool", "role", "ts"])
    )
    rows = []
    for key, grp in ev.groupby(["conv_id", "tool", "role"]):
        ts_us = grp["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        vq = (grp["value"] * 1e6).apply(int).to_numpy()
        start = 0
        for i in range(1, len(grp) + 1):
            if i == len(grp) or ts_us[i] - ts_us[i - 1] >= gap_s * 1_000_000:
                seg_v = vq[start:i]
                rows.append(
                    (*key,
                     pd.Timestamp(ts_us[start], unit="us"),
                     pd.Timestamp(ts_us[i - 1] + gap_s * 1_000_000,
                                  unit="us"),
                     i - start,
                     seg_v.sum() / len(seg_v) / 1e6)
                )
                start = i
    exp = pd.DataFrame(
        rows, columns=["conv_id", "tool", "role", "group_start",
                       "group_end", "n_events", "val_avg"]
    ).sort_values(["conv_id", "tool", "role", "group_start"]).reset_index(
        drop=True
    )
    # a session must span micro-batch files for this test to mean
    # anything: with 4 time-ranged files and hour-long gaps there are
    # far fewer groups than events
    assert len(exp) < len(ev)
    got["group_start"] = got["group_start"].astype("datetime64[us]")
    got["group_end"] = got["group_end"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_stream_gap_fill_equals_batch(spark):
    """Streaming LOCF gap-fill drained over 4 time-ranged micro-batches
    must equal the batch operator row-for-row — including 'none' rows
    beyond the purge gap and 'obs' rows on grid instants."""
    import uuid

    from streamevmon_spark.data.transcripts import load_transcripts
    from streamevmon_spark.operators.gapfill import gap_fill
    from streamevmon_spark.streaming import rollup_stream as S

    sf_dir = "/root/testdata/sf0.001"
    path = S.materialize_transcripts(
        spark, sf_dir, S.stream_input_dir(sf_dir)
    )
    name = f"t_sgf_{uuid.uuid4().hex[:8]}"
    S.run_available_now(
        S.stream_gap_fill(
            S.stream_transcripts(spark, path, max_files_per_trigger=1),
            tier="1m", purge_gap_s=600,
        ),
        name,
        output_mode="append",
    )
    got = spark.table(name).toPandas()
    exp = gap_fill(
        load_transcripts(spark, sf_dir), "1m", method="locf",
        purge_gap_s=600,
    ).toPandas()
    key = ["conv_id", "tool", "role", "grid_ts"]
    got = got.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    assert len(got) == len(exp)
    # the interesting rows actually occur
    assert (got["fill_method"] == "none").any()
    assert (got["fill_method"] == "locf").any()
    # 'obs' rows need an observation exactly on a grid instant, which
    # µs-precision synthetic timestamps never hit — covered by the
    # sf0.01 gate query instead
    import pandas as pd

    got["grid_ts"] = got["grid_ts"].astype("datetime64[us]")
    exp["grid_ts"] = exp["grid_ts"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_stream_gap_fill_interp_equals_batch(spark):
    """Streaming linear-interpolation gap-fill must equal the batch
    interp operator row-for-row. The interesting structural property:
    a grid point between two observations is only emitted once the
    RIGHT bracket has arrived (possibly a later micro-batch), with the
    left bracket carried as state — so append mode needs no
    retraction and the values still match batch bit-for-bit."""
    import uuid

    import pandas as pd

    from streamevmon_spark.data.transcripts import load_transcripts
    from streamevmon_spark.operators.gapfill import gap_fill

    sf_dir = "/root/testdata/sf0.001"
    path = S.materialize_transcripts(
        spark, sf_dir, S.stream_input_dir(sf_dir)
    )
    name = f"t_sgfi_{uuid.uuid4().hex[:8]}"
    S.run_available_now(
        S.stream_gap_fill(
            S.stream_transcripts(spark, path, max_files_per_trigger=1),
            tier="1m", purge_gap_s=600, method="interp",
        ),
        name,
        output_mode="append",
    )
    got = spark.table(name).toPandas()
    exp = gap_fill(
        load_transcripts(spark, sf_dir), "1m", method="interp",
        purge_gap_s=600,
    ).toPandas()
    key = ["conv_id", "tool", "role", "grid_ts"]
    got = got.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["fill_method"] == "none").any()
    assert (got["fill_method"] == "interp").any()
    got["grid_ts"] = got["grid_ts"].astype("datetime64[us]")
    exp["grid_ts"] = exp["grid_ts"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_stream_compress_chunks_equals_batch_closed_buckets(spark):
    """Streaming chunk writer drained over time-ranged micro-batches:
    every CLOSED (series, bucket) blob must be byte-identical to the
    batch compress_chunks build of the same points; the per-series open
    (final) bucket is held back as state, never emitted."""
    import pandas as pd

    from streamevmon_spark.data.transcripts import load_transcripts
    from streamevmon_spark.operators.chunks import compress_chunks
    from streamevmon_spark.streaming.chunk_stream import (
        stream_compress_chunks,
    )

    sf_dir = "/root/testdata/sf0.001"
    path = S.materialize_transcripts(
        spark, sf_dir, S.stream_input_dir(sf_dir)
    )
    name = f"t_scc_{uuid.uuid4().hex[:8]}"
    S.run_available_now(
        stream_compress_chunks(
            S.stream_transcripts(spark, path, max_files_per_trigger=1),
            chunk_tier="1h",
        ),
        name,
        output_mode="append",
    )
    got = spark.table(name).toPandas()

    df = load_transcripts(spark, sf_dir)
    pts = df.where(F.col("value").isNotNull()).select(
        "conv_id", "tool", "role",
        F.expr(
            "datediff(MICROSECOND, timestamp_ntz'1970-01-01', ts)"
        ).alias("ts_us"),
        "value",
    )
    chunk_us = 3600 * 1_000_000
    closed = pts.withColumn(
        "__b", F.expr(f"(ts_us div {chunk_us}) * {chunk_us}")
    ).withColumn(
        "__maxb",
        F.expr(
            "max(__b) over (partition by conv_id, tool, role)"
        ),
    ).where(F.col("__b") < F.col("__maxb")).drop("__b", "__maxb")
    exp = compress_chunks(closed, "1h").toPandas()

    key = ["conv_id", "tool", "role", "chunk_us"]
    got = got.sort_values(key, ignore_index=True)
    exp = exp.sort_values(key, ignore_index=True)
    got["ts_dod"] = got["ts_dod"].map(bytes)
    got["values_gorilla"] = got["values_gorilla"].map(bytes)
    exp["ts_dod"] = exp["ts_dod"].map(bytes)
    exp["values_gorilla"] = exp["values_gorilla"].map(bytes)
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, exp)
