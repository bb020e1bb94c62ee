"""Flows-DAG runner: the Spark analogue of the reference's PRIMARY
entrypoint — YamlDagRunner wiring a declarative flows.yaml of sources →
detectors → sinks into an executing pipeline (reference:
runners/unified/YamlDagRunner.scala:56-292, schema grammar
runners/unified/schema/DetectorInstance.scala:55-97 /
DetectorSchema.scala, documented in CONFIGURING_FLOWS.md).

A spec is a plain dict (or YAML text when PyYAML is importable):

    sources:
      - name: turns
        type: transcripts            # the sf_dir transcripts table
    detectors:
      - type: loss                   # any functions/detectors kernel
        sources:
          - name: turns
            tool: search             # optional typed sub-stream filter
                                     #   (the datatype-pick analogue)
            filter_lossy: true       # drop NULL-value turns first
        sinks: [all_events]
        config: {max_history: 30}    # validated against ParameterSpec
    sinks:
      - name: all_events
        type: union                  # unionByName of event streams
      - name: grouped
        type: grouped                # + temporal grouping pipeline
        config: {max_interval_s: 10, max_duration_s: 7200}
    frequent_filter:                 # optional FrequentEventFilter
      configs: [[small, 1, 3600, 7200, 25]]

Reference-parity choices:

- **Lazy sources / dead-source elimination** (YamlDagRunner.scala:95-137
  wraps every source in ``Lazy``): a declared source that no detector
  references is never even *constructed* here — its path may not exist
  and the build still succeeds (tested). Referenced-but-unused columns
  are then pruned by Catalyst for free.
- **Build-time parameter validation** (:160): ``operators/detect.detect``
  runs every config through ``functions/params.validated`` before any
  job is submitted, so a bad flows file fails in milliseconds, not
  hours into a 100 TB run.
- **Post-processing** (:234-287): an optional FrequentEventFilter per
  detector output, then per-sink union; ``grouped`` sinks additionally
  run the SingleEventGrouper → TemporalEventGrouper pipeline the
  reference appends to Influx sinks (EventGrouperFlinkHelper.scala:36-53).
- **Execution**: returns one DataFrame per sink — the logical plans ARE
  the DAG; Spark actions (write/collect) are the env.execute() analogue
  and stay with the caller.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamevmon_spark.data.transcripts import load_transcripts
from streamevmon_spark.operators.detect import detect, union_events


def parse_flows(spec) -> dict:
    """Accept a dict as-is, or YAML/JSON text when the parser exists."""
    if isinstance(spec, dict):
        return spec
    try:
        import yaml

        return yaml.safe_load(spec)
    except ImportError:  # pragma: no cover - container has PyYAML
        import json

        return json.loads(spec)


def _validate(spec: dict) -> None:
    src_names = [s["name"] for s in spec.get("sources", [])]
    sink_names = [s["name"] for s in spec.get("sinks", [])]
    if len(set(src_names)) != len(src_names):
        raise ValueError(f"duplicate source names: {src_names}")
    if len(set(sink_names)) != len(sink_names):
        raise ValueError(f"duplicate sink names: {sink_names}")
    for det in spec.get("detectors", []):
        if not det.get("sources"):
            raise ValueError(
                f"detector {det.get('type')!r} has no sources — every "
                "detector needs at least one source reference"
            )
        for ref in det.get("sources", []):
            if ref["name"] not in src_names:
                raise ValueError(
                    f"detector {det['type']!r} references unknown "
                    f"source {ref['name']!r}"
                )
        for snk in det.get("sinks", []):
            if snk not in sink_names:
                raise ValueError(
                    f"detector {det['type']!r} references unknown "
                    f"sink {snk!r}"
                )


def build_flows(
    spark: SparkSession, spec, sf_dir: str
) -> dict[str, DataFrame]:
    """Wire the flows DAG; returns {sink_name: event DataFrame}."""
    spec = parse_flows(spec)
    _validate(spec)

    # Lazy source build: construct only what a detector references.
    referenced = {
        ref["name"]
        for det in spec.get("detectors", [])
        for ref in det.get("sources", [])
    }
    sources: dict[str, DataFrame] = {}
    for s in spec.get("sources", []):
        if s["name"] not in referenced:
            continue  # dead-source elimination (Lazy analogue)
        stype = s.get("type", "transcripts")
        if stype == "transcripts":
            sources[s["name"]] = load_transcripts(spark, sf_dir)
        elif stype == "parquet":
            sources[s["name"]] = spark.read.parquet(s["path"])
        else:
            raise ValueError(f"unknown source type {stype!r}")

    ff = spec.get("frequent_filter")
    per_sink: dict[str, list[DataFrame]] = {
        s["name"]: [] for s in spec.get("sinks", [])
    }
    for det in spec.get("detectors", []):
        streams = []
        for ref in det.get("sources", []):
            df = sources[ref["name"]]
            if ref.get("tool") is not None:
                # typed sub-stream: the classTag/datatype pick analogue —
                # a plain predicate, pushed into the scan by Catalyst
                df = df.where(F.col("tool") == ref["tool"])
            if ref.get("filter_lossy"):
                df = df.where(F.col("value").isNotNull())
            streams.append(df)
        inp = streams[0]
        for extra in streams[1:]:
            inp = inp.unionByName(extra)
        events = detect(inp, det["type"], **det.get("config", {}))
        if ff:
            from streamevmon_spark.operators.event_grouping import (
                frequent_event_filter,
            )

            events = frequent_event_filter(
                events,
                configs=tuple(
                    tuple(c) for c in ff.get("configs", [])
                ) or None,
            )
        for snk in det.get("sinks", []):
            per_sink[snk].append(events)

    out: dict[str, DataFrame] = {}
    for s in spec.get("sinks", []):
        name = s["name"]
        if not per_sink[name]:
            continue  # sink with no producers: dead, like unused sources
        unioned = union_events(*per_sink[name])
        if s.get("type", "union") == "grouped":
            from streamevmon_spark.operators.event_grouping import (
                group_events_temporal,
            )

            cfg = s.get("config", {})
            out[name] = group_events_temporal(
                unioned,
                max_interval_s=cfg.get("max_interval_s", 10),
                max_duration_s=cfg.get("max_duration_s", 7200),
            )
        else:
            out[name] = unioned
    return out
