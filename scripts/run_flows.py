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
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--flows", required=True,
                    help="flows spec file (YAML or JSON)")
    ap.add_argument("--input", required=True,
                    help="sf_dir / transcripts parquet directory")
    ap.add_argument("--output", required=True,
                    help="output root; each sink writes a subdir")
    ap.add_argument("--master", default=None,
                    help="override master (default: env/local)")
    args = ap.parse_args()

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
