"""Compare a Spark DataFrame against a DuckDB oracle query — the same
check the driver's correctness gate performs (row count + schema-shape +
order-insensitive value equality)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).fetchdf()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df.sort_values(list(df.columns), ignore_index=True)


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str) -> None:
    got = _canon(spark_df.toPandas())
    exp = _canon(run_oracle(oracle_sql, sf_dir))
    assert list(got.columns) == list(exp.columns), (
        f"columns differ: {list(got.columns)} vs {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"row count {len(got)} vs {len(exp)}"
    for c in got.columns:
        g, e = got[c], exp[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(e):
            ga = g.astype(float).to_numpy()
            ea = e.astype(float).to_numpy()
            for i, (x, y) in enumerate(zip(ga, ea)):
                ok = (math.isnan(x) and math.isnan(y)) or x == y or (
                    abs(x - y) <= 1e-9 * max(1.0, abs(x), abs(y))
                )
                assert ok, f"col {c} row {i}: {x} != {y}"
        else:
            pd.testing.assert_series_equal(
                g.astype(str), e.astype(str), check_names=False
            )
