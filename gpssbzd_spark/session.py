"""SparkSession factory with scale-ready defaults.

Replaces the reference's hand-tuned session configs
(``Parallel/Trajectory Clustering.py:15-23``: 400 shuffle partitions,
12-core/30g executors) with AQE-driven runtime tuning: adaptive
coalescing sizes post-shuffle partitions, skew-join splitting replaces
the reference's driver-side bin-packing for join/agg skew (SURVEY.md §4).

On a real cluster only ``master``/memory change; the SQL configs below are
the scale-relevant ones and hold from local[32] to 1000 executors.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_session(
    app_name: str = "gpssbzd_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    - AQE on: runtime partition coalescing + skew-join splitting stand in
      for the reference's manual ``repartition(200)`` / bin-packing.
    - Arrow on: all pandas-UDF boundaries (trajectory distance, DBSCAN,
      text ops) move data in columnar batches.
    - UTC session timezone: deterministic timestamp semantics and parity
      with the DuckDB oracle (naive-UTC timestamps).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # local mode: the driver JVM IS the executor; the stock 1g heap
        # (and its matching 1g netty direct-memory cap) OOMs on wide
        # shuffle fetch fan-in at local[32]. Only applies at JVM launch;
        # harmless when the session already exists.
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalescing only merges DOWN from the initial partition
        # count — it never raises it — so the initial count, not
        # shuffle.partitions, is what must scale with the cluster:
        # start wide and let AQE shrink to fit. 8× cores locally;
        # override with SPARK_GRAFT_INITIAL_PARTITIONS on a real
        # cluster (rule of thumb: ≥ 2-3× total cluster cores).
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            os.environ.get(
                "SPARK_GRAFT_INITIAL_PARTITIONS", str(shuffle_partitions * 8)
            ),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # r15 (guide §2, profiled): cached/persisted subtrees are
        # planned WITHOUT AQE by default (the conf below defaults to
        # false purely to keep a cached plan's output partitioning
        # stable for downstream reuse), so every `.persist()` in a
        # query path materialized its build shuffle at the static
        # initialPartitionNum — the 256-row unigram vocab cache ran
        # TWO 256-task stages for ~2 KB of shuffle (profiled; the
        # same class as the r14 batch-6 localCheckpoint finding).
        # With AQE on for cached plans the build coalesces by bytes
        # locally and keeps full width at scale — the same adaptivity
        # every uncached exchange already gets; no consumer here
        # depends on a cached plan's physical partitioning.
        # Interleaved A/B (3 rounds, min-of-3): tx_unigram_logprob
        # 1.19→0.65 s, tx_bigram −0.1 s, tc_components/neardup_
        # clusters within noise (plans/r15/ab_cachedaqe.json).
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Python-worker allocator hygiene (PERF_NOTES #14): large
        # numpy temporaries in Arrow-UDF kernels are served by fresh
        # anonymous mmaps whenever they exceed glibc's dynamic mmap
        # threshold, and first-touch population of such mappings under
        # a syscall-intercepting sandbox costs seconds-to-tens-of-
        # seconds of SYSTEM time, nondeterministically — the r12
        # bimodal-stall class. Raising the threshold to 1 GiB and
        # disabling trim keeps every kernel allocation on the brk
        # heap, where freed pages stay mapped and are reused across
        # batches: the population cost is paid once per worker
        # lifetime. Worker RSS then holds its high-water mark — sized
        # fine for reused workers (the hot kernels are additionally
        # scratch-buffered, see dedup._simhash_scratch). Executor env
        # vars reach Python workers in every deploy mode.
        .config("spark.executorEnv.MALLOC_MMAP_THRESHOLD_", "1073741824")
        .config("spark.executorEnv.MALLOC_TRIM_THRESHOLD_", "1073741824")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
