"""Driver-gate simulation (the verify skill's recipe, resumable).

Runs entry() + every queries() entry against oracle_sql() at sf0.01
from a non-repo cwd with a hostile (non-UTC) session timezone, writing
one result line per query to the output file as it goes, so a partial
run is still evidence and a re-run can --skip-done.

Usage: python scripts/gate_sim.py OUT.txt [--skip-done] [--only q1,q2]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir("/tmp")

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as e  # noqa: E402

SF = "/root/testdata/sf0.01"


def canon(p: pd.DataFrame) -> pd.DataFrame:
    p = p.reindex(sorted(p.columns), axis=1)
    for c in p.columns:
        if pd.api.types.is_datetime64_any_dtype(p[c]):
            p[c] = (
                pd.to_datetime(p[c])
                .dt.tz_localize(None)
                .astype("datetime64[us]")
            )
    return p.sort_values(list(p.columns), ignore_index=True)


def main() -> None:
    out_path = sys.argv[1]
    skip_done = "--skip-done" in sys.argv
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    done = set()
    if skip_done and os.path.exists(out_path):
        with open(out_path) as f:
            done = {
                ln.split(":")[0]
                for ln in f
                if ":" in ln and "ERROR" not in ln and "False" not in ln
            }
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    mode = "a" if skip_done else "w"
    with open(out_path, mode, buffering=1) as out:
        if not done and only is None:
            out.write(f"entry rows: {e.entry(spark).count()}\n")
        qs, os_ = e.queries(), e.oracle_sql()
        n_bad = 0
        for name, fn in qs.items():
            if name in done or (only is not None and name not in only):
                continue
            try:
                got = canon(fn(spark, SF).toPandas())
                if name not in os_:
                    out.write(f"{name}: rows={len(got)} (rows-only)\n")
                    continue
                exp = canon(con.execute(os_[name]).fetchdf())
                hg = hashlib.md5(
                    got.to_csv(index=False).encode()
                ).hexdigest()
                he = hashlib.md5(
                    exp.to_csv(index=False).encode()
                ).hexdigest()
                ok = hg == he
                n_bad += 0 if ok else 1
                out.write(
                    f"{name}: rows={len(got)}/{len(exp)} exact={ok}\n"
                )
            except Exception as ex:  # noqa: BLE001
                n_bad += 1
                out.write(
                    f"{name}: ERROR {type(ex).__name__}: "
                    f"{str(ex)[:300]}\n"
                )
        out.write(f"FAILURES: {n_bad}\n")


if __name__ == "__main__":
    main()
