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
    with the input: never below the upstream partition count (so a
    genuinely wide input keeps its width instead of being squeezed to
    core count).

    r15 (VERDICT r14 #1): the floor is CAPPED at
    ``min(defaultParallelism, max(8, 4×upstream))`` instead of a flat
    ``defaultParallelism``. Rationale, measured: on a narrow fixture
    input (1-5 scan splits) the flat floor pinned every downstream
    window/kernel stage to 32 tasks; under an induced 32-process
    co-tenant load (the degraded-host regime the r14 driver capture
    hit) the capped width beat the flat pin in EVERY interleaved
    round (pe_pipeline_segments min-of-3: 3.90/3.32/3.62 vs
    6.16/3.61/3.86; plans/r15/ab_pins_underload.json) while idle and
    batch-twin (sessionize/funnel) A/Bs read within noise of the flat
    pin — and both beat the un-pinned form everywhere. At real scale
    and at ≤8 cores the formula is IDENTICAL to the flat pin (wide
    input → upstream wins the outer max; 8 cores → min(8, ·) = 8), so
    the 100 TB no-op property is preserved by construction."""
    sc = df.sparkSession.sparkContext
    up = df.rdd.getNumPartitions()
    tgt = max(up, min(sc.defaultParallelism, max(8, 4 * up)))
    return df.repartition(tgt, *[F.col(c) for c in cols])


# Ceiling for size-conditional localCheckpoint pins (pushdown fences /
# multi-consumer materializations): above this many SOURCE bytes the pin
# is skipped — re-computing the fenced chain per consumer branch costs
# two scans' CPU, while an eager localCheckpoint of a corpus-sized
# projection costs executor block storage ≈ the projection size
# (non-replicated, held until GC) — the trade inverts at scale
# (guide §5; VERDICT r14 #4). Local default 2 GiB: far above every
# fixture (pins always fire at sf0.001-0.1, keeping the measured r14
# behavior), far below any at-scale corpus. Production override:
# SPARK_GRAFT_PIN_MAX_BYTES.
PIN_MAX_BYTES = int(os.environ.get("SPARK_GRAFT_PIN_MAX_BYTES", str(2 << 30)))


def source_bytes(df: DataFrame) -> int | None:
    """Best-effort byte size of ``df``'s file inputs.

    Sum of the scan's input file sizes (exact for the fixture parquet
    scans), falling back to Catalyst's optimized-plan size estimate.
    ``None`` when neither is available — callers must treat unknown as
    LARGE (skipping a pin is always correct; an unbounded eager
    materialization is not).
    """
    try:
        files = df.inputFiles()
        if files:
            total = 0
            for f in files:
                p = f[7:] if f.startswith("file:///") else f
                p = "/" + p.lstrip("/")
                total += os.path.getsize(p)
            return total
    except Exception:  # noqa: BLE001 — fall through to the estimate
        pass
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # noqa: BLE001
        return None


def pin_if_small(df: DataFrame, max_bytes: int | None = None) -> tuple[DataFrame, bool]:
    """``df.localCheckpoint()`` when the source bytes are under
    ``max_bytes`` (default :data:`PIN_MAX_BYTES`), else ``df`` unchanged.

    Returns ``(df, pinned)`` so callers with an at-scale alternative
    (e.g. a narrower fence + join-back) can branch on the outcome.
    Unknown size counts as large — see :func:`source_bytes`.
    """
    limit = PIN_MAX_BYTES if max_bytes is None else max_bytes
    size = source_bytes(df)
    if size is not None and size <= limit:
        return df.localCheckpoint(), True
    return df, False


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
