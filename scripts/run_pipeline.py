#!/usr/bin/env python
"""spark-submit entrypoint for the tiered rollup pipeline.

The north rule's launch mode:

    spark-submit --py-files streamevmon_spark.zip \\
        scripts/run_pipeline.py \\
        --input /data/transcripts_parquet --output /data/rollups \\
        --tiers 1m,1h,1d --n-parts 256 [--resume]

Local smoke (no cluster):

    python scripts/run_pipeline.py --generate 100000 --output /tmp/rollups

Runs the resumable bucketed pipeline (plans/pipeline.py): per-bucket
idempotent writes, checkpoint-manifest lineage + per-partition
throughput/skew metrics, resume skips completed buckets. Prints one
JSON line of run metrics on completion.

Packaging: `python scripts/run_pipeline.py --make-zip` writes
streamevmon_spark.zip next to the package for --py-files.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def make_zip() -> str:
    import zipfile

    import streamevmon_spark

    pkg_dir = os.path.dirname(os.path.abspath(streamevmon_spark.__file__))
    zip_path = os.path.join(os.path.dirname(pkg_dir), "streamevmon_spark.zip")
    with zipfile.ZipFile(zip_path, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(
                        full,
                        os.path.relpath(full, os.path.dirname(pkg_dir)),
                    )
    return zip_path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="transcripts parquet dir")
    ap.add_argument("--generate", type=int, default=0,
                    help="generate N synthetic turns instead of --input")
    ap.add_argument("--output", required=False, default="/tmp/rollup_out")
    ap.add_argument("--tiers", default="1m,1h,1d")
    ap.add_argument("--n-parts", type=int, default=None)
    ap.add_argument("--bucket", default="1d",
                    help="pipeline bucket / resume granularity")
    ap.add_argument("--resume", action="store_true",
                    help="informational: resume is automatic — an existing "
                         "manifest at --output skips its done buckets")
    ap.add_argument("--cascade", action="store_true",
                    help="derive 1h/1d from the 1m mergeable state per "
                         "bucket (one raw scan per bucket) instead of "
                         "one raw scan per tier; identical output")
    ap.add_argument("--make-zip", action="store_true")
    ap.add_argument("--maintain", action="store_true",
                    help="run retention expiry + small-file compaction "
                         "over --output instead of processing buckets")
    ap.add_argument("--retention", default="1m=2592000,1h=15552000",
                    help="tier=seconds[,tier=seconds...]; omitted tiers "
                         "are kept forever")
    ap.add_argument("--compact-files", type=int, default=1,
                    help="target parquet files per partition dir")
    args = ap.parse_args()

    if args.make_zip:
        print(make_zip())
        return

    if args.maintain:
        import time as _time

        from streamevmon_spark.plans.maintenance import run_maintenance
        from streamevmon_spark.session import build_spark as _build

        spark = _build(app_name="transcript-rollup-maintenance")
        ret = {
            kv.split("=")[0]: int(kv.split("=")[1])
            for kv in args.retention.split(",") if kv
        }
        res = run_maintenance(
            spark, args.output, now_us=int(_time.time() * 1_000_000),
            retention_s=ret, compact_target_files=args.compact_files,
        )
        print(json.dumps(res))
        spark.stop()
        return

    from streamevmon_spark.plans.pipeline import run_pipeline
    from streamevmon_spark.session import build_spark

    spark = build_spark(app_name="transcript-rollup-pipeline")
    if args.generate:
        from streamevmon_spark.data.transcripts import generate_transcripts

        df = generate_transcripts(spark, n_turns=args.generate)
    elif args.input:
        df = spark.read.parquet(args.input)
    else:
        ap.error("one of --input / --generate is required")

    manifest = run_pipeline(
        spark,
        df,
        args.output,
        tiers=tuple(args.tiers.split(",")),
        cascade=args.cascade,
    )
    done = [p for p in manifest.partitions if p.status == "done"]
    print(json.dumps({
        "buckets_done": len(done),
        "rows_in": sum(p.rows_in for p in done),
        "rows_out": {
            t: sum(p.rows_out.get(t, 0) for p in done)
            for t in args.tiers.split(",")
        },
        "wall_s_per_bucket": [round(p.wall_s, 3) for p in done],
        "manifest": os.path.join(args.output, "manifest.json"),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
