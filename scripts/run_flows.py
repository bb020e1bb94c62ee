#!/usr/bin/env python
"""spark-submit entrypoint for declarative flows-DAG pipelines.

The reference's primary entrypoint is YamlDagRunner over a flows.yaml
(sources → detectors → sinks). This is the drop-in launch path for a
user switching from the reference:

    spark-submit --py-files streamevmon_spark.zip \\
        scripts/run_flows.py \\
        --flows conf/flows.yaml --input /data/transcripts_parquet \\
        --output /data/events

Local smoke (no cluster):

    python scripts/run_flows.py --flows conf/flows.yaml \\
        --input /root/testdata/sf0.001 --output /tmp/events

Each sink in the spec lands at <output>/<sink_name>/ as parquet; one
JSON line of per-sink row counts prints on completion. See
plans/flows.py for the spec grammar (YAML or JSON; the reference's
CONFIGURING_FLOWS.md grammar mapped to the transcripts data model).

Live mode (``--live``) is the long-running production composition the
reference runs as YamlDagRunner's source->store lifecycle
(runners/unified/YamlDagRunner.scala; catch-up + subscribe,
flink/sources/InfluxAmpSourceFunction.scala:130-159): a
SubscriptionListener accepts HTTP-framed transcript-wire pushes on a
TCP port, lands each transmission as one text batch, and a periodic
availableNow drain maintains the on-disk cascade store (1m state +
1h/1d continuous aggregates + manifest snapshots) with checkpoint
recovery — kill the process at any point and the next run resumes
from the stream checkpoint + manifest, byte-equal to the batch
rebuild (tests/test_live_pipeline.py):

    python scripts/run_flows.py --live --port 8086 \\
        --landing /data/landing --output /data/store
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def drain_live(spark, landing_dir: str, out_dir: str,
               max_files_per_trigger: int = 1) -> dict:
    """One availableNow drain of the landing dir into the cascade
    store (checkpointed under <out_dir>/_stream_ckpt — repeated calls,
    including after a crash, resume exactly). Returns a small summary
    of the store after the drain."""
    from streamevmon_spark.plans.manifest import load_manifest
    from streamevmon_spark.streaming.cascade_stream import (
        stream_cascade_store,
    )
    from streamevmon_spark.streaming.live_sources import read_push_stream

    stream_cascade_store(
        spark,
        read_push_stream(spark, landing_dir, max_files_per_trigger),
        out_dir,
    )
    m = load_manifest(out_dir)
    return {
        "snapshots": 0 if m is None else len(m.partitions),
        "rows_in": 0 if m is None else sum(
            p.rows_in for p in m.partitions
        ),
    }


def run_live(args) -> None:
    from streamevmon_spark.plans.cascade_store import read_cascade
    from streamevmon_spark.session import build_spark
    from streamevmon_spark.streaming.live_sources import (
        SubscriptionListener,
    )

    spark = build_spark(app_name="streamevmon-live", master=args.master)
    listener = SubscriptionListener(args.landing, port=args.port)
    listener.start()
    print(json.dumps({"listening": listener.port,
                      "landing": args.landing, "store": args.output}),
          flush=True)
    try:
        while True:
            summary = drain_live(spark, args.landing, args.output,
                                 args.max_files_per_trigger)
            print(json.dumps({"drain": summary}), flush=True)
            if args.max_drains and summary["snapshots"] >= args.max_drains:
                break
            time.sleep(args.interval)
    except KeyboardInterrupt:
        pass
    finally:
        listener.stop()
    # tier-routed read surface on shutdown: the store answers from its
    # continuous aggregates; raw is never rescanned
    counts = {
        tier: read_cascade(spark, args.output, tier).count()
        for tier in ("1h", "1d")
    }
    print(json.dumps({"store_rows": counts}), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--flows", help="flows spec file (YAML or JSON)")
    ap.add_argument("--input", help="sf_dir / transcripts parquet dir")
    ap.add_argument("--output", required=True,
                    help="output root (batch: sink subdirs; live: the "
                         "cascade store)")
    ap.add_argument("--master", default=None,
                    help="override master (default: env/local)")
    ap.add_argument("--live", action="store_true",
                    help="run the push-subscription -> cascade-store "
                         "loop instead of a batch flows DAG")
    ap.add_argument("--landing", default=None,
                    help="live: landing dir for pushed batches")
    ap.add_argument("--port", type=int, default=0,
                    help="live: TCP port (0 = ephemeral)")
    ap.add_argument("--interval", type=float, default=5.0,
                    help="live: seconds between drains")
    ap.add_argument("--max-files-per-trigger", type=int, default=1)
    ap.add_argument("--max-drains", type=int, default=0,
                    help="live: stop once this many snapshots exist "
                         "(0 = run until interrupted)")
    args = ap.parse_args()

    if args.live:
        if not args.landing:
            ap.error("--live requires --landing")
        run_live(args)
        return
    if not args.flows or not args.input:
        ap.error("batch mode requires --flows and --input")

    from streamevmon_spark.plans.flows import build_flows, parse_flows
    from streamevmon_spark.session import build_spark

    with open(args.flows) as fh:
        spec = parse_flows(fh.read())
    spark = build_spark(app_name="streamevmon-flows", master=args.master)
    sinks = build_flows(spark, spec, args.input)
    counts: dict[str, int] = {}
    for name, df in sinks.items():
        dest = os.path.join(args.output, name)
        df.write.mode("overwrite").parquet(dest)
        counts[name] = spark.read.parquet(dest).count()
    print(json.dumps({"sinks": counts, "output": args.output}))


if __name__ == "__main__":
    main()
