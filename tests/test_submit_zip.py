"""--py-files packaging proof: the engine runs from the zip alone.

The north rule's launch mode is ``spark-submit --py-files
streamevmon_spark.zip scripts/run_pipeline.py ...``. This test is the
CI stand-in for that submit: it builds the zip with the launcher's own
packager, then runs a child interpreter whose ONLY import path for the
engine is the zip (cwd=/tmp, repo dir stripped from sys.path), and in
it generates transcripts, runs the 1m rollup AND a pandas-UDF path
(gap-fill — closures must unpickle on executor workers), printing a
deterministic checksum. The parent computes the same checksum from the
normal on-disk package; equality proves the zip ships everything the
cluster run needs (no data files, no __file__-relative reads, no
zip-hostile imports).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys
# the zip must be the ONLY way to reach the engine
sys.path = [p for p in sys.path if not p.rstrip("/").endswith("repo")]
sys.path.insert(0, os.environ["ENGINE_ZIP"])
import streamevmon_spark
assert os.environ["ENGINE_ZIP"] in streamevmon_spark.__file__, (
    "engine not imported from the zip: " + streamevmon_spark.__file__
)
from streamevmon_spark.session import build_spark
from streamevmon_spark.data.transcripts import generate_transcripts
from streamevmon_spark.operators import rollup as R
from streamevmon_spark.operators.gapfill import gap_fill

spark = build_spark(app_name="pyfiles-smoke", master="local[2]",
                    shuffle_partitions=4)
df = generate_transcripts(spark, n_turns=5000)
r = R.rollup_tier(df, "1m")
a = r.selectExpr(
    "count(*) c", "sum(turn_count) tc",
    "sum(cast(lat_p50 as bigint)) p50"
).collect()[0]
g = gap_fill(df, "1h", method="interp")
b = g.selectExpr(
    "count(*) c",
    "sum(cast(fill_method = 'interp' as int)) f",
    "sum(cast(value_filled * 1000 as bigint)) v"
).collect()[0]
print("CHECKSUM " + json.dumps(
    [a.c, a.tc, a.p50, b.c, b.f, b.v], sort_keys=True))
spark.stop()
"""


def test_engine_runs_from_pyfiles_zip(spark):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from run_pipeline import make_zip

    zip_path = make_zip()
    assert os.path.isfile(zip_path)

    env = dict(os.environ)
    env["ENGINE_ZIP"] = zip_path
    env["SPARK_GRAFT_CPUS"] = "2"
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [sys.executable, "-c", CHILD],
        cwd="/tmp", env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    line = [ln for ln in out.stdout.splitlines()
            if ln.startswith("CHECKSUM ")][0]
    child = json.loads(line[len("CHECKSUM "):])

    # same numbers from the on-disk package in the session under test
    from streamevmon_spark.data.transcripts import generate_transcripts
    from streamevmon_spark.operators import rollup as R
    from streamevmon_spark.operators.gapfill import gap_fill

    df = generate_transcripts(spark, n_turns=5000)
    r = R.rollup_tier(df, "1m")
    a = r.selectExpr(
        "count(*) c", "sum(turn_count) tc",
        "sum(cast(lat_p50 as bigint)) p50"
    ).collect()[0]
    g = gap_fill(df, "1h", method="interp")
    b = g.selectExpr(
        "count(*) c",
        "sum(cast(fill_method = 'interp' as int)) f",
        "sum(cast(value_filled * 1000 as bigint)) v"
    ).collect()[0]
    assert child == [a.c, a.tc, a.p50, b.c, b.f, b.v]
