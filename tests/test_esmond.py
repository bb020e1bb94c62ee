"""esmond typed-measurement family tests (sources/esmond.py) — the
engine's analogue of the reference's esmond connector/measurement
coverage (reference: measurements/esmond/EsmondMeasurement.scala:37-66,
connectors/esmond/ResponseType.scala:43-67)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamevmon_spark.sources import esmond as E


@pytest.fixture(scope="module")
def entries(spark, sf_dir):
    from streamevmon_spark.sources.measurements import load_events

    return E.synth_esmond_entries(load_events(spark, sf_dir))


@pytest.fixture(scope="module")
def typed(entries):
    return E.esmond_typed(entries).cache()


def test_unknown_event_type_dropped_whole(entries, typed):
    # 'histogram-rtt' is not a ResponseType: the reference throws, the
    # engine drops the row — nothing of the m=11 class survives
    n_unknown = entries.where(
        F.col("event_type") == "histogram-rtt"
    ).count()
    assert n_unknown > 0
    assert typed.where(F.col("event_type") == "histogram-rtt").count() == 0
    assert typed.count() == entries.count() - n_unknown


def test_all_six_classes_present_and_disjoint(typed):
    subtypes = {
        r[0] for r in typed.select("subtype").distinct().collect()
    }
    assert subtypes == {
        "simple", "histogram", "subinterval", "packet_trace", "href",
        "failure",
    }
    # per-class summary columns are NULL outside their class
    assert typed.where(
        (F.col("subtype") != "simple")
        & F.col("simple_value").isNotNull()
    ).count() == 0
    assert typed.where(
        (F.col("subtype") != "histogram")
        & F.col("hist_count_sum").isNotNull()
    ).count() == 0


def test_stream_id_is_rest_base_uri(typed):
    # stream = base-URI; metadataKey = path segment 4
    # (EsmondMeasurement.scala:46-49, schema/EventType.scala:47)
    bad = typed.where(
        ~F.col("stream").startswith("/esmond/perfsonar/archive/")
        | (F.expr("split(stream, '/')[4]") != F.col("metadata_key"))
        | ~F.col("stream").endswith(
            F.concat(F.lit("/"), F.col("event_type"), F.lit("/base"))
        )
    ).count()
    assert bad == 0


def test_option_payloads_map_to_null(typed):
    # href/failure maps missing their key -> NULL (Scala Option.None)
    hrefs = typed.where(F.col("subtype") == "href")
    assert hrefs.where(F.col("href_location").isNull()).count() > 0
    assert (
        hrefs.where(
            F.col("href_location").isNotNull()
            & ~F.col("href_location").startswith("https://")
        ).count()
        == 0
    )
    fails = typed.where(F.col("subtype") == "failure")
    assert fails.where(F.col("failure_text").isNull()).count() > 0
    # esmond measurements are never lossy (EsmondMeasurement.scala:36-38)
    assert typed.where(F.col("is_lossy")).count() == 0


def test_histogram_merge_consistent_with_typed(entries, typed):
    # bucket-wise merged counts must re-aggregate to the per-entry
    # count sums of the typed relation, stream by stream
    merged = E.esmond_histogram_merged(entries)
    per_stream_merged = merged.groupBy("stream").agg(
        F.sum("bucket_count").alias("total")
    )
    per_stream_typed = (
        typed.where(F.col("subtype") == "histogram")
        .groupBy("stream")
        .agg(F.sum("hist_count_sum").alias("total"))
    )
    assert (
        per_stream_merged.exceptAll(per_stream_typed).count() == 0
        and per_stream_typed.exceptAll(per_stream_merged).count() == 0
    )


def test_typed_plan_has_no_shuffle(entries):
    # the 6-class dispatch is one projection over the entry relation —
    # no exchange anywhere in the typed summary
    plan = E.esmond_typed(entries)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
