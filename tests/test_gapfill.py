"""Gap-fill: native-vs-oracle exactness, native-vs-pandas equivalence,
session-gap reset semantics (FIXTURES.md §2; reference
detectors/baseline/BaselineDetector.scala:114-122 purge semantics)."""

from __future__ import annotations

import pandas as pd
import pytest

from streamevmon_spark.data.transcripts import load_transcripts
from streamevmon_spark.operators.gapfill import gap_fill, gap_fill_pandas
from streamevmon_spark.oracles import gapfill_oracle
from tests.oracle_utils import assert_matches_oracle


@pytest.mark.parametrize("method", ["locf", "interp"])
def test_gapfill_matches_oracle(spark, sf_dir, method):
    df = load_transcripts(spark, sf_dir)
    got = gap_fill(df, "1h", method=method, purge_gap_s=7200)
    assert_matches_oracle(
        got, gapfill_oracle("1h", method, purge_gap_s=7200), sf_dir
    )


@pytest.mark.parametrize("method", ["locf", "interp"])
def test_pandas_kernel_equals_native(spark, sf_dir, method):
    df = load_transcripts(spark, sf_dir)
    a = (
        gap_fill(df, "1h", method=method, purge_gap_s=7200)
        .orderBy("conv_id", "tool", "role", "grid_ts")
        .toPandas()
    )
    b = (
        gap_fill_pandas(df, "1h", method=method, purge_gap_s=7200)
        .orderBy("conv_id", "tool", "role", "grid_ts")
        .toPandas()
    )
    pd.testing.assert_frame_equal(a, b)


def test_session_gap_reset(spark):
    """No fill across gaps longer than purge_gap_s — the inactivity-purge
    analogue. Series: obs at t=0s and t=10000s, 1m grid, purge=600s."""
    rows = [
        ("c", 0, "user", "x", "none", "1970-01-01 00:00:00", 1.0),
        ("c", 1, "user", "x", "none", "1970-01-01 02:46:40", 5.0),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string, value double"
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["f"]).col("ts").cast("timestamp_ntz"))
    out = (
        gap_fill(df, "1m", method="locf", purge_gap_s=600)
        .orderBy("grid_ts")
        .toPandas()
    )
    # grid minutes 0..166 (bucket-aligned; the 10000 s obs is off-grid);
    # LOCF holds for minutes 0..10 (600 s), then the long gap stays unfilled
    filled = out[out["value_filled"].notna()]
    assert filled["grid_ts"].max() == pd.Timestamp("1970-01-01 00:10:00")
    assert len(filled) == 11
    assert out.iloc[0]["fill_method"] == "obs"  # t=0 obs is on-grid
    assert (out["fill_method"] == "none").sum() == len(out) - 11
