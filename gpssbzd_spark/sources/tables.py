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


def _scoped_conf(spark: SparkSession, key: str, value: str):
    """Set a session conf for one read, restoring the prior value after.

    Left set globally, these reader flags would silently change how every
    OTHER parquet in the session is decoded — a confusing type mismatch
    far from the cause — so every use is scoped to a single scan.
    """
    import contextlib

    @contextlib.contextmanager
    def _cm():
        prev = spark.conf.get(key, None)
        spark.conf.set(key, value)
        try:
            yield
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)

    return _cm()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; column pruning/pushdown happen at the scan.

    Timestamp normalization: every timestamp column comes out as
    TimestampType (LTZ), never TIMESTAMP_NTZ, whatever the parquet
    physical type is. The fixtures have shipped both INT64
    TIMESTAMP(NANOS) (rejected by the reader without
    ``nanosAsLong``) and plain ``timestamp[us]`` with
    isAdjustedToUTC=false (inferred as TIMESTAMP_NTZ, which
    ``unix_millis``/``unix_micros`` and interval arithmetic reject).
    Disabling ``inferTimestampNTZ`` AT THE SCAN makes the reader emit
    LTZ directly — unlike a post-hoc ``cast``, this keeps timestamp
    predicates pushdown-eligible. Engine sessions pin the session
    timezone to UTC (conf.py) so LTZ values equal the naive values an
    ANSI oracle (DuckDB) computes on the same files.
    """
    # (tz pin lives in session.py:70; the driver's session is UTC too —
    # its recorded plans show unix_timestamp(..., Some(UTC)).)
    with _scoped_conf(spark, "spark.sql.parquet.inferTimestampNTZ.enabled", "false"):
        if name == "events":
            with _scoped_conf(spark, "spark.sql.legacy.parquet.nanosAsLong", "true"):
                df = spark.read.parquet(table_path(sf_dir, name))
                if dict(df.dtypes).get("ts") == "bigint":
                    df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        else:
            df = spark.read.parquet(table_path(sf_dir, name))
    # Safety net: if a future Spark ignores the flag for some physical
    # type, normalize loudly-typed NTZ columns here (costs pushdown on
    # those columns only, never wrong results).
    for col_name, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col_name, F.col(col_name).cast("timestamp"))
    return df


def widen_small_input(
    df: DataFrame, key: str | None = None, target: int | None = None
) -> DataFrame:
    """Partition-count floor for expensive narrow chains (Python
    kernels, regex scoring): when the upstream scan yielded fewer
    partitions than the session's parallelism, repartition up to it —
    otherwise return ``df`` unchanged.

    Why (guide §2 — scale-adaptive partitioning, measured r14): a
    single-row-group parquet file scans as ONE split however many cores
    the session has, and every narrow operator after it inherits that
    layout — so a per-doc Arrow kernel runs on 1-2 of 32 cores until
    the first exchange (profiled: the MinHash signature pin spent
    1.2 s wall on 2 tasks with the other 30 cores idle). At real scale
    the scan is already wide and this is a planning-time no-op — the
    added exchange exists exactly when the input is small enough for
    the shuffle to be trivial.

    ``key`` hash-partitions on that column (deterministic, no
    sort-before-repartition pass); with distinct keys ≥ 20× the target
    this spreads evenly (guide §2.5). Without ``key``: round-robin.
    """
    sc = df.sparkSession.sparkContext
    tgt = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= tgt:
        return df
    return df.repartition(tgt, F.col(key)) if key else df.repartition(tgt)


def keyed_repartition(df: DataFrame, *cols: str) -> DataFrame:
    """Hash-repartition by ``cols`` with an EXPLICIT scale-adaptive
    count instead of ``repartition(*cols)``.

    Why (profiled r14): a count-less ``repartition(col)`` is an
    AQE-coalescible exchange — on a small shuffle (≤ the 1 MB
    ``minPartitionSize``) AQE merges it to ONE task, and a CPU-dense
    per-row stage downstream (e.g. a ``mapInPandas`` sessionize kernel)
    serializes on one Python worker (profiled: 2.1 s wall / 0.26 s cpu
    single-task stage in st_stateful_sessionize at sf0.1). A
    user-specified count is exempt from coalescing; this one scales
    with the input: never below the session's parallelism, never below
    the upstream partition count (so a genuinely wide input keeps its
    width instead of being squeezed to core count)."""
    sc = df.sparkSession.sparkContext
    tgt = max(sc.defaultParallelism, df.rdd.getNumPartitions())
    return df.repartition(tgt, *[F.col(c) for c in cols])


def local_rows(spark: SparkSession, rows: list, schema) -> DataFrame:
    """Literal table via pandas + Arrow instead of a Python-list
    ``createDataFrame``.

    Why (profiled r14): a list-of-tuples ``createDataFrame``
    parallelizes the rows into ``defaultParallelism`` PICKLED slices,
    and every later action over the result pays one Python-worker round
    trip per slice — ~0.7 s warm for a 40-row parameter table at
    local[32], repeated for EVERY job that touches it. Routed through
    pandas, the rows land as Arrow batches the JVM serves directly
    (~35 ms warm, no Python workers). Rows and schema are identical;
    only the transport changes. For non-null scalar literals only —
    ``None`` cells in numeric columns would become NaN on the pandas
    path where the list path yields NULL.
    """
    import pandas as pd

    if not rows:
        return spark.createDataFrame([], schema)
    assert not any(v is None for r in rows for v in r), (
        "local_rows is for fully-non-null literal tables"
    )
    return spark.createDataFrame(pd.DataFrame(rows), schema)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view for the spark.sql path."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
