"""Detector-kernel tests mirroring the reference's algorithm golden-value
strategy (SURVEY.md §5 layer 2): pinned vectors from the reference's own
test suite, plus behavioral normal->anomalous series in the style of its
checkpointing harness tests
(reference: src/test/scala/.../checkpointing/NoDependencyCheckpointingTests.scala:44-210).
"""

from __future__ import annotations

import numpy as np
import pytest

from streamevmon_spark.functions.detectors import (
    _commons_math_percentile,
    _cp_pdf,
    _cp_with_point,
    _dist_diff,
    _scale_2sf_floor,
    baseline_events,
    change_magnitude_severity,
    changepoint_events,
    distdiff_events,
    loss_events,
    mode_events,
    smoothed_zscore,
    spike_events,
)

US = 1_000_000


def ts(n, step_s=1.0, start=1_700_000_000):
    return (np.arange(n) * step_s * US + start * US).astype(np.int64)


# --- pinned vector from the reference's own test suite -----------------
# reference: detectors/spike/SmoothedZScoreTest.scala:37-61 (the original
# StackOverflow smoothed-z-score dataset)
SZS_INPUT = [
    1, 1, 1.1, 1, 0.9, 1, 1, 1.1, 1, 0.9, 1, 1.1, 1, 1, 0.9, 1, 1, 1.1, 1,
    1, 1, 1, 1.1, 0.9, 1, 1.1, 1, 1, 0.9, 1, 1.1, 1, 1, 1.1, 1, 0.8, 0.9, 1,
    1.2, 0.9, 1, 1, 1.1, 1.2, 1, 1.5, 1, 3, 2, 5, 3, 2, 1, 1, 1, 0.9, 1, 1,
    3, 2.6, 4, 3, 3.2, 2, 1, 1, 0.8, 4, 4, 2, 2.5, 1, 1, 1,
]
SZS_EXPECTED = [
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 1,
    1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 0, 0, 0, 1, 1, 1, 1, 0,
    0, 0,
]


def test_smoothed_zscore_pinned_reference_vector():
    got = smoothed_zscore(
        np.array(SZS_INPUT), lag=30, threshold=5.0, influence=0.0
    )
    assert got.tolist() == SZS_EXPECTED


# reference: detectors/changepoint/DistributionTest.scala:43-80 —
# externally computed means/variances/pdfs, pinned to 1e-15 tolerance
def test_normal_distribution_pinned_reference_values():
    mean, var = np.array([0.0]), np.array([1e8])
    assert _cp_pdf(mean, var, 0.0)[0] == pytest.approx(
        0.00003989422804014325, abs=1e-15
    )
    assert _cp_pdf(mean, var, 1.0)[0] == pytest.approx(
        0.0000398942278406721, abs=1e-15
    )
    to_add = [1.0, 0.5, -1.0, 2.0, -3.0, 4.0, -5.0]
    exp_mean = [1.0, 2.5 / 3, 0.375, 0.7, 1.0 / 12, 9.0 / 14, -1.0 / 16]
    exp_var = [5e7, 3.333333338888889e7, 2.5000000671875e7, 2.000000096e7,
               1.6666669368055558e7, 1.4285718479591837e7,
               1.2500007152343752e7]
    exp_pdf = [0.00005641895835477566, 0.00006909882980789,
               0.00007978845438478, 0.00008920620346597,
               0.00009772049199778, 0.00010555019017665,
               0.00011283787933200]
    for i, (x, em, ev, ep) in enumerate(
        zip(to_add, exp_mean, exp_var, exp_pdf), start=1
    ):
        mean, var = _cp_with_point(mean, var, x, np.array([i]))
        assert mean[0] == pytest.approx(em, abs=1e-15)
        assert var[0] == pytest.approx(ev, abs=1e-7)
        # the reference evaluates each step's pdf at the fixed point 1.0
        assert _cp_pdf(mean, var, 1.0)[0] == pytest.approx(ep, abs=1e-13)


def test_change_magnitude_severity_anchor_points():
    # the formula's own calibration examples (events/Event.scala:150-160):
    # points near the baseline curve score around 30 (rough fit: 24-42)
    for old, new in [(3, 9), (8, 16), (100, 130), (300, 350), (400, 450)]:
        assert 20 <= change_magnitude_severity(old, new) <= 45
    assert change_magnitude_severity(5, 5) == 1  # no change -> floor
    assert change_magnitude_severity(1, 1000) == 100  # huge change -> cap
    assert change_magnitude_severity(9, 3) == change_magnitude_severity(3, 9)


def test_commons_math_percentile_legacy():
    v = np.array([1.0, 2.0, 3.0, 4.0])
    # LEGACY: pos = p/100*(n+1)
    assert _commons_math_percentile(v, 50.0) == 2.5
    assert _commons_math_percentile(v, 0.1) == 1.0  # pos < 1 -> min
    assert _commons_math_percentile(v, 99.0) == 4.0  # pos >= n -> max
    assert _commons_math_percentile(np.array([7.0]), 50.0) == 7.0


def test_scale_2sf_floor():
    assert _scale_2sf_floor(0) == 0
    assert _scale_2sf_floor(99) == 99
    assert _scale_2sf_floor(1234) == 1200
    assert _scale_2sf_floor(-1234) == -1300  # FLOOR rounds toward -inf
    assert _scale_2sf_floor(105) == 100


def test_baseline_detects_shift():
    # 100 values ~50, then a sustained 3x shift; 1s cadence, no gaps
    v = np.concatenate([np.full(100, 50.0) + np.sin(np.arange(100)),
                        np.full(100, 150.0) + np.sin(np.arange(100))])
    evs = baseline_events(v, ts(200), max_history=50, percentile=0.10,
                          threshold=25, purge_s=600)
    assert evs, "expected a baseline event on a 3x shift"
    assert all(e["event_type"] == "baseline_events" for e in evs)
    assert 25 < evs[0]["severity"] <= 100
    # the event lands shortly after the shift point
    assert 100 <= evs[0]["idx"] < 160


def test_baseline_session_gap_resets():
    v = np.concatenate([np.full(100, 50.0), np.full(100, 150.0)])
    t = ts(200).copy()
    t[100:] += 3600 * US  # 1h silence before the shift
    evs = baseline_events(v, t, purge_s=600)
    assert evs == []  # state purged; shift invisible


def test_spike_detects_spike_and_pinned_path():
    rng = np.random.default_rng(7)
    v = 50 + rng.normal(0, 0.5, 200)
    v[120] = 500.0  # single spike
    evs = spike_events(v, ts(200), lag=50, threshold=10, influence=0.0,
                       purge_s=600)
    assert [e["idx"] for e in evs] == [120]
    assert evs[0]["description"] == "Positive"


def test_loss_events_consecutive_and_ratio():
    lossy = np.zeros(60, dtype=bool)
    lossy[30:45] = True  # 15 consecutive losses
    evs = loss_events(lossy, ts(60))
    consec = [e for e in evs if "Consecutive" in e["description"]]
    ratio = [e for e in evs if "ratio" in e["description"]]
    # consecutive events start when run length hits 5 and fire per point
    assert consec[0]["idx"] == 34
    assert len(consec) == 11  # idx 34..44
    # ratio events once >= 10 lossy in window and worsening
    assert ratio[0]["idx"] == 39
    # detection latency of first consecutive event spans back to idx 30
    assert consec[0]["detection_latency_us"] == 4 * US


def test_mode_detects_mode_change():
    # 30 points at 100 (mode locks in), then 31 points at 900
    v = np.concatenate([[0.0], np.full(31, 100.0), np.full(40, 900.0)])
    evs = mode_events(v, ts(72), purge_s=3600)
    assert len(evs) == 1
    assert "Mode changed from 100 to 900" in evs[0]["description"]


def test_distdiff_detects_distribution_shift():
    rng = np.random.default_rng(3)
    a = 100 + rng.normal(0, 1.0, 40)
    b = 300 + rng.normal(0, 1.0, 40)
    evs = distdiff_events(np.concatenate([a, b]), ts(80), purge_s=3600)
    assert evs, "expected a distdiff event on a 3x distribution shift"
    assert 40 <= evs[0]["idx"] < 70
    # hysteresis: only one event for a single sustained shift
    assert len(evs) == 1


def test_changepoint_detects_level_shift():
    # the reference harness pattern: ~steady, then sustained change
    rng = np.random.default_rng(11)
    a = 1000 + rng.normal(0, 5, 120)
    b = 3000 + rng.normal(0, 5, 120)
    evs = changepoint_events(
        np.concatenate([a, b]), ts(240), purge_s=86400
    )
    assert len(evs) == 1
    assert evs[0]["event_type"] == "changepoint_events"
    # fires after the trigger count (40) past the shift at idx 120
    assert 160 <= evs[0]["idx"] <= 170
    assert "increased" in evs[0]["description"]


def test_changepoint_outlier_rollback():
    rng = np.random.default_rng(13)
    v = 1000 + rng.normal(0, 5, 200)
    v[100] = 5000.0  # lone outlier must NOT fire
    evs = changepoint_events(v, ts(200), purge_s=86400)
    assert evs == []



def test_detect_operator_runs_and_is_partition_invariant(spark):
    from pyspark.sql import functions as F

    from streamevmon_spark.data.transcripts import generate_transcripts
    from streamevmon_spark.operators.detect import detect

    df = generate_transcripts(spark, n_turns=4000, n_convs=6, seed=1)
    # inject a loss burst (15 consecutive lossy turns per series)
    df = df.withColumn(
        "value",
        F.when(
            (F.col("turn_idx") >= 100) & (F.col("turn_idx") < 115),
            F.lit(None).cast("double"),
        ).otherwise(F.col("value")),
    )
    # turn_idx 100-115 of a conversation lands scattered across its
    # (tool, role) sub-series, so use sensitive thresholds
    kw = {"loss_count": 2, "consecutive_count": 2}
    ev1 = detect(df, "loss", **kw).toPandas().sort_values(
        ["conv_id", "tool", "role", "ts", "description"], ignore_index=True
    )
    ev2 = (
        detect(df.repartition(7), "loss", **kw)
        .toPandas()
        .sort_values(
            ["conv_id", "tool", "role", "ts", "description"],
            ignore_index=True,
        )
    )
    assert len(ev1) > 0
    assert ev1.equals(ev2), "detector output must not depend on partitioning"


def test_detect_from_store_equals_raw(spark, sf_dir):
    """Detector replay from the compressed chunk store must emit
    exactly the raw-path events — for a value detector (spike) AND the
    loss detector, whose lossy turns ride the store as NaN instants."""
    from pyspark.sql import functions as F

    from streamevmon_spark.data.transcripts import load_transcripts
    from streamevmon_spark.operators.chunks import compress_chunks
    from streamevmon_spark.operators.detect import detect, detect_from_store
    from streamevmon_spark.operators.rollup import EPOCH_NTZ

    df = load_transcripts(spark, sf_dir)
    pts = df.select(
        "conv_id", "tool", "role",
        F.expr(f"datediff(MICROSECOND, {EPOCH_NTZ}, ts)").alias("ts_us"),
        "value",
    )
    chunks = compress_chunks(pts, "1d").localCheckpoint()
    key = ["conv_id", "tool", "role", "ts", "description"]
    for det, kw in (
        ("spike", dict(lag=5, threshold=2.0, influence=0.1,
                       purge_s=86400)),
        ("loss", dict(loss_count=2, consecutive_count=2)),
    ):
        got = (
            detect_from_store(chunks, det, **kw)
            .toPandas().sort_values(key, ignore_index=True)
        )
        exp = (
            detect(df, det, **kw)
            .toPandas().sort_values(key, ignore_index=True)
        )
        assert len(exp) > 0, det
        assert got.equals(exp), f"{det}: store replay != raw"


def test_mode_oracle_matches_spark(spark, sf_dir):
    """The mode detector's closed-form SQL oracle (hysteresis = primary
    mode at the previous qualifying point) matches the sequential kernel
    on real data, event-for-event."""
    from streamevmon_spark import oracles
    from streamevmon_spark.data.transcripts import load_transcripts
    from streamevmon_spark.operators.detect import detect

    from .oracle_utils import assert_matches_oracle

    kw = dict(
        max_history=5, min_frequency=1, min_prominence=0,
        threshold=0.1, purge_s=86400,
    )
    got = detect(load_transcripts(spark, sf_dir), "mode", **kw)
    assert_matches_oracle(got, oracles.mode_events_oracle(**kw), sf_dir)


def test_spike_oracles_match_spark_bit_exact(spark, sf_dir):
    """The recursive-CTE spike walk replays the kernel's float ops in
    order, so events AND the per-point detail stream (mean/std floats
    included) are bit-identical, not merely decision-equal."""
    from streamevmon_spark import oracles
    from streamevmon_spark.data.transcripts import load_transcripts
    from streamevmon_spark.operators.detect import detect, spike_detail_stream

    from .oracle_utils import assert_matches_oracle

    kw = dict(lag=5, threshold=2.0, influence=0.1, purge_s=86400)
    tx = load_transcripts(spark, sf_dir)
    assert_matches_oracle(
        detect(tx, "spike", **kw), oracles.spike_events_oracle(**kw), sf_dir
    )
    assert_matches_oracle(
        spike_detail_stream(tx, **kw),
        oracles.spike_details_oracle(**kw),
        sf_dir,
    )


def test_changepoint_oracle_matches_spark(spark, sf_dir):
    """The Bayesian changepoint recursive-CTE oracle replays the kernel's
    run-array updates (pdf, withPoint, squash, normalise — including
    np.sum's pairwise base case at exactly 8 elements) bit-exactly on
    real data with the gate query's level-shift transform."""
    from pyspark.sql import functions as F

    from streamevmon_spark import oracles
    from streamevmon_spark.data.transcripts import load_transcripts
    from streamevmon_spark.operators.detect import detect

    from .oracle_utils import assert_matches_oracle

    # purge_s=0 (gap purge disabled — sf0.001 inter-turn gaps exceed any
    # sane purge) also exercises the oracle's no-purge reset branch;
    # ignore_outlier_normal_count=5 lets anomaly cascades survive the
    # outlier-rollback heuristic long enough to trigger on short series
    kw = dict(
        max_history=8, trigger_count=2, ignore_outlier_normal_count=5,
        minimum_event_interval_s=0, severity_threshold=20, purge_s=0,
    )
    df = load_transcripts(spark, sf_dir).withColumn(
        "value",
        F.when(F.col("turn_idx") < 4, F.lit(10000.0) + F.col("value"))
        .otherwise(F.lit(40000.0) + F.col("value")),
    )
    got = detect(df, "changepoint", **kw)
    assert got.count() > 0
    assert_matches_oracle(
        got,
        oracles.changepoint_events_oracle(
            value_expr=(
                "(CASE WHEN turn_idx < 4 THEN 10000.0 + value"
                " ELSE 40000.0 + value END)"
            ),
            **kw,
        ),
        sf_dir,
    )


def test_changepoint_oracle_branch_coverage_synthetic():
    """Kernel vs oracle on a hand-built series that provably exercises
    every state-machine branch (verified by line tracing when the series
    was designed): NaN skip, purge reset, outlier increment, outlier
    ROLLBACK to the frozen normal snapshot, cno reset, an emitted event,
    a suppressed emit inside minimum_event_interval, a low-severity
    trigger, the zero-variance pdf guard, and max_history squash."""
    import duckdb
    import numpy as np
    import pandas as pd

    from streamevmon_spark import oracles
    from streamevmon_spark.functions.detectors import changepoint_events

    vals: list[float] = []
    ts_s: list[int] = []
    t = 0

    def add(v: float, dt: int = 1) -> None:
        nonlocal t
        t += dt
        vals.append(v)
        ts_s.append(t)

    # short baseline then a single outlier spike -> rollback path
    for i in range(3):
        add(1000.0 + (i % 3))
    add(50000.0)
    for i in range(8):
        add(1000.0 + (i % 2))
    add(float("nan"))
    # constant stretch (zero-variance pdf guard)
    for _ in range(6):
        add(1000.0)
    # small level shift -> trigger, severity below threshold
    for _ in range(10):
        add(1100.0)
    # big level shift -> emitted event
    for _ in range(10):
        add(9000.0)
    # second big shift within min interval -> suppressed emit + reset
    for _ in range(10):
        add(40000.0)
    # purge gap, then another shift -> fresh event after purge
    add(2000.0, dt=120)
    for i in range(8):
        add(2000.0 + (i % 2))
    for _ in range(8):
        add(12000.0)

    kw = dict(
        max_history=8, trigger_count=4, ignore_outlier_normal_count=1,
        purge_s=60, minimum_event_interval_s=10, severity_threshold=30,
    )
    ts_us = np.array(ts_s, dtype=np.int64) * 1_000_000
    evs = changepoint_events(np.array(vals), ts_us, **kw)
    kernel = pd.DataFrame(
        [
            {
                "event_type": e["event_type"],
                "conv_id": "conv-0001",
                "tool": "none",
                "role": "user",
                "severity": e["severity"],
                "ts": pd.Timestamp(e["ts_us"], unit="us"),
                "detection_latency_us": e["detection_latency_us"],
                "description": e["description"],
            }
            for e in evs
        ]
    )
    assert len(kernel) == 2  # one emitted, one suppressed, one post-purge

    # events-shaped frame that TRANSCRIPTS_SQL maps onto the same series:
    # user_id=1 -> conv-0001, 'click' -> (user, none); event_id stays off
    # the %37==0 lossy mask so NaN placement is controlled by `value`
    events = pd.DataFrame(
        {
            "event_id": [i * 37 + 1 for i in range(len(vals))],
            "user_id": 1,
            "event_type": "click",
            "value": [None if np.isnan(v) else v for v in vals],
            "ts": pd.to_datetime(np.asarray(ts_us), unit="us"),
        }
    )
    con = duckdb.connect()
    con.register("events", events)
    got = con.execute(oracles.changepoint_events_oracle(**kw)).fetchdf()
    got = got.sort_values("ts", ignore_index=True)[list(kernel.columns)]
    casts = {
        "severity": "int64",
        "detection_latency_us": "int64",
        "ts": "datetime64[us]",
    }
    pd.testing.assert_frame_equal(got.astype(casts), kernel.astype(casts))
