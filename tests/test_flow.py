"""libtrace-bigdata Flow family tests (sources/flow.py) — the engine's
analogue of the reference's Flow.create coverage
(reference: measurements/bigdata/Flow.scala:155-236)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamevmon_spark.sources import flow as FL


@pytest.fixture(scope="module")
def lines(spark, sf_dir):
    from streamevmon_spark.sources.measurements import load_events

    return FL.synth_flow_lines(load_events(spark, sf_dir))


@pytest.fixture(scope="module")
def typed(lines):
    return FL.flow_typed(lines).cache()


def test_rejection_classes_dropped_whole(lines, typed, spark, sf_dir):
    from streamevmon_spark.sources.measurements import load_events

    ev = load_events(spark, sf_dir)
    n_total = ev.count()
    n_rejected = ev.where(
        (F.col("event_id") % 29 == 0) | (F.col("event_id") % 31 == 0)
    ).count()
    assert typed.count() == n_total - n_rejected
    # FlowType.withName throws on anything outside the 3-value enum
    types = {r[0] for r in typed.select("flow_type").distinct().collect()}
    assert types == set(FL.FLOW_TYPES)


def test_option_fields(typed):
    # end_ts only on flow_end records (Flow.scala:208 Option[Instant])
    assert typed.where(
        (F.col("flow_type") != "flow_end")
        & F.col("end_time").isNotNull()
    ).count() == 0
    assert typed.where(
        (F.col("flow_type") == "flow_end") & F.col("end_time").isNull()
    ).count() == 0
    # the two sides' geolocation blocks are independently optional,
    # and includesGeolocation is keyed on the SOURCE geohash
    # (Flow.scala:122)
    assert typed.where(
        F.col("includes_geolocation")
        != F.col("source_ip_geohash").isNotNull()
    ).count() == 0
    both = typed.where(
        F.col("source_ip_geohash").isNull()
        & F.col("destination_ip_geohash").isNotNull()
    )
    assert both.count() > 0


def test_geohash_parse_quirks(typed):
    # geohash is kept RAW — quotes preserved (Flow.scala:219-221 parses
    # it without the quote strip applied to city/country)
    gh = typed.where(F.col("source_ip_geohash").isNotNull())
    assert gh.where(
        ~F.col("source_ip_geohash").startswith('"')
        | ~F.col("source_ip_geohash").endswith('"')
    ).count() == 0
    # city IS quote-stripped (and contains a space — quote-parity
    # split coverage)
    assert gh.where(
        F.col("source_ip_city").contains('"')
        | ~F.col("source_ip_city").startswith("City ")
    ).count() == 0
    # both geohash_value sides parse to non-null ints despite the
    # suffix asymmetry (src bare, dst 'i'-suffixed)
    assert gh.where(F.col("source_ip_geohash_value").isNull()).count() == 0
    dst = typed.where(F.col("destination_ip_geohash").isNotNull())
    assert (
        dst.where(F.col("destination_ip_geohash_value").isNull()).count()
        == 0
    )


def test_default_value_is_ttfb_and_never_lossy(typed):
    # Flow.scala:118-120
    assert typed.where(
        F.col("default_value") != F.col("time_to_first_byte")
    ).count() == 0
    assert typed.where(F.col("is_lossy")).count() == 0


def test_rollup_totals_consistent(typed):
    roll = FL.flow_rollup(typed)
    total = roll.agg(F.sum("n_records")).collect()[0][0]
    assert total == typed.count()
    ended = roll.agg(F.sum("n_ended")).collect()[0][0]
    assert ended == typed.where(F.col("flow_type") == "flow_end").count()
