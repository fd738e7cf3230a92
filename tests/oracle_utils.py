"""Local mirror of the driver's Spark-vs-DuckDB comparison.

Runs a corpus query on Spark and its oracle SQL on DuckDB over the same
parquet dir, then compares row count + column names + order-insensitive
values. Floats are compared exactly after the query's own rounding —
if exact equality fails here, the driver's value-hash will fail too,
so tests assert bitwise equality of the rounded values.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from gpssbzd_spark.sources.tables import TABLES, table_path


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
            )
        return con.execute(sql).df()
    finally:
        con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Canonical value forms so Spark/DuckDB dtype spelling doesn't matter.
    def canon(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<NULL>"
        if pd.isna(v):
            return "<NULL>"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return f"{v:.6f}"
            return f"{v:.6f}"
        if isinstance(v, bool):
            return str(bool(v))
        return str(v)

    out = df.apply(lambda col: col.map(canon))
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df, oracle_pdf: pd.DataFrame, name: str) -> None:
    spark_pdf = spark_df.toPandas()
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs oracle {len(oracle_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    )
    a = _normalize(spark_pdf)
    b = _normalize(oracle_pdf)
    if not a.equals(b):
        diff_mask = (a != b).any(axis=1)
        sample = pd.concat(
            [a[diff_mask].head(5).add_suffix("_spark"), b[diff_mask].head(5).add_suffix("_oracle")],
            axis=1,
        )
        raise AssertionError(f"{name}: value mismatch on {int(diff_mask.sum())} rows\n{sample}")
