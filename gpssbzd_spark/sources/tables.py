"""Parquet-first typed access to the engine's fixture tables.

The reference reads everything as headered all-string CSV and casts on use
(``Parallel/Pattern Extraction.scala:38-45``); our hot path is Parquet with
real types so Catalyst gets stats-based pruning and predicate pushdown at
the source (SURVEY.md §1.4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that a planner should always broadcast in a join
# against a fact table. Used by queries to attach explicit broadcast hints
# (Catalyst auto-broadcasts below the threshold, but at 100 TB the fact side
# estimate can poison the choice — make it explicit for known-small dims).
SMALL_DIMS = frozenset({"region", "nation", "supplier", "customer", "part"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; column pruning/pushdown happen at the scan.

    ``events.ts`` is INT64 TIMESTAMP(NANOS) on disk, which Spark's parquet
    reader rejects ([PARQUET_TYPE_ILLEGAL]); read it as epoch-nanos long
    (``spark.sql.legacy.parquet.nanosAsLong``) and convert to a
    microsecond TimestampType with exact integer division.
    """
    if name == "events":
        # scope the legacy flag to THIS read: left set globally, any
        # other nanos-timestamp parquet in the session would silently
        # come back as a bigint (with no conversion) instead of failing
        # loudly — a confusing type mismatch far from the cause
        key = "spark.sql.legacy.parquet.nanosAsLong"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, "true")
        try:
            df = spark.read.parquet(table_path(sf_dir, name))
            if dict(df.dtypes).get("ts") == "bigint":
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view for the spark.sql path."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
