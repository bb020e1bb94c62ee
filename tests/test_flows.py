"""Flows-DAG runner tests (plans/flows.py — the YamlDagRunner analogue).
Cross-engine exactness of a composed flow is the driver gate's job
(`flows_dag` query); these pin the runner semantics: YAML parsing, lazy
dead-source elimination, build-time validation, source-ref filters, and
sink post-processing equivalence."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


SF = "/root/testdata/sf0.001"

LOSS = {
    "type": "loss",
    "sources": [{"name": "turns"}],
    "sinks": ["out"],
    "config": {"loss_count": 3, "consecutive_count": 2},
}


def _spec(**over):
    spec = {
        "sources": [{"name": "turns", "type": "transcripts"}],
        "detectors": [dict(LOSS)],
        "sinks": [{"name": "out", "type": "union"}],
    }
    spec.update(over)
    return spec


def test_yaml_text_round_trips(spark):
    import yaml

    from streamevmon_spark.plans.flows import build_flows

    spec = _spec()
    from_dict = build_flows(spark, spec, SF)["out"]
    from_yaml = build_flows(spark, yaml.safe_dump(spec), SF)["out"]
    assert sorted(map(tuple, from_dict.collect())) == sorted(
        map(tuple, from_yaml.collect())
    )


def test_dead_source_never_constructed(spark):
    """A declared-but-unreferenced source may point at a nonexistent
    path and the flow still builds AND executes — the reference wraps
    sources in Lazy for exactly this (YamlDagRunner.scala:95-137)."""
    from streamevmon_spark.plans.flows import build_flows

    spec = _spec(
        sources=[
            {"name": "turns", "type": "transcripts"},
            {"name": "ghost", "type": "parquet", "path": "/no/such/path"},
        ]
    )
    out = build_flows(spark, spec, SF)["out"]
    assert out.count() > 0


def test_build_time_validation(spark):
    from streamevmon_spark.plans.flows import build_flows

    bad_source = _spec()
    bad_source["detectors"][0]["sources"] = [{"name": "nope"}]
    with pytest.raises(ValueError, match="unknown source"):
        build_flows(spark, bad_source, SF)

    bad_sink = _spec()
    bad_sink["detectors"][0]["sinks"] = ["nope"]
    with pytest.raises(ValueError, match="unknown sink"):
        build_flows(spark, bad_sink, SF)

    bad_param = _spec()
    bad_param["detectors"][0]["config"] = {"loss_count": -1}
    with pytest.raises(ValueError):
        build_flows(spark, bad_param, SF)["out"]

    no_sources = _spec()
    no_sources["detectors"][0]["sources"] = []
    with pytest.raises(ValueError, match="no sources"):
        build_flows(spark, no_sources, SF)

    missing_sources = _spec()
    del missing_sources["detectors"][0]["sources"]
    with pytest.raises(ValueError, match="no sources"):
        build_flows(spark, missing_sources, SF)


def test_source_ref_filters_apply(spark):
    """tool= restricts to the typed sub-stream; filter_lossy drops
    NULL-value turns — equivalent to composing by hand."""
    from streamevmon_spark.data.transcripts import load_transcripts
    from streamevmon_spark.operators.detect import detect
    from streamevmon_spark.plans.flows import build_flows

    raw = load_transcripts(spark, SF)
    a_tool = raw.select("tool").first().tool
    spec = _spec()
    spec["detectors"][0]["sources"] = [
        {"name": "turns", "tool": a_tool, "filter_lossy": True}
    ]
    got = build_flows(spark, spec, SF)["out"]
    hand = detect(
        raw.where(F.col("tool") == a_tool).where(
            F.col("value").isNotNull()
        ),
        "loss",
        loss_count=3,
        consecutive_count=2,
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, hand.collect())
    )


def test_grouped_sink_equals_grouping_pipeline(spark):
    from streamevmon_spark.operators.detect import detect
    from streamevmon_spark.operators.event_grouping import (
        group_events_temporal,
    )
    from streamevmon_spark.data.transcripts import load_transcripts
    from streamevmon_spark.plans.flows import build_flows

    spec = _spec(sinks=[{"name": "out", "type": "grouped",
                         "config": {"max_interval_s": 60}}])
    got = build_flows(spark, spec, SF)["out"]
    hand = group_events_temporal(
        detect(load_transcripts(spark, SF), "loss", loss_count=3,
               consecutive_count=2),
        max_interval_s=60,
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, hand.collect())
    )


def test_shipped_default_flows_yaml_builds_and_runs(spark):
    """conf/flows.yaml (the reference's shipped default DAG mapped to
    the transcripts model) must parse, validate and execute end-to-end
    — a user's first `run_flows.py` invocation cannot fail on the
    example we ship."""
    import os

    from streamevmon_spark.plans.flows import build_flows

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "conf", "flows.yaml",
    )
    with open(path) as fh:
        sinks = build_flows(spark, fh.read(), SF)
    assert set(sinks) == {"all_events", "grouped"}
    for df in sinks.values():
        assert df.count() >= 0  # executes without error
