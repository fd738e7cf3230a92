"""Sinks. Parquet-first, partitioned layout.

Replaces the reference's per-line output directories written one at a time
from a driver thread pool (``Parallel/Pattern Extraction.scala:255-256``
``repartition(1).write.csv`` per line) with a single
``partitionBy("linenumber")`` write — one job, no driver fan-out, and at
100 TB no single-partition bottleneck (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = (),
    fmt: str = "parquet",
    mode: str = "overwrite",
    target_files: int | None = None,
    options: dict[str, str] | None = None,
) -> None:
    """Write ``df``, optionally hive-partitioned by ``partition_cols``.

    ``target_files`` is the §2.1 S7 file-layout control, expressing both
    of the reference's hand-rolled layouts under one knob
    (``Parallel/Pattern Extraction.scala:127`` ``repartition(1)`` per
    line; ``:256`` ``repartition(200)`` fan-out):

    - without partition_cols: ``coalesce(target_files)`` — shrink to ≤ N
      output files without a shuffle. coalesce is a no-op when the plan
      already has fewer partitions, which is the semantics wanted (the
      knob BOUNDS files; to fan out instead, repartition upstream).
      Deliberately NOT inspecting ``df.rdd.getNumPartitions()`` to pick
      coalesce-vs-repartition: under AQE that materializes the final
      physical plan, executing every upstream shuffle once just to read
      a partition count, and then the write re-runs the whole query;
    - with partition_cols: ``repartition(target_files, *partition_cols)``
      — every partition value's rows land in one task, so each hive dir
      gets ONE file (the reference's repartition(1)-per-line layout)
      while total write tasks stay bounded at ``target_files``; without
      it, every task writes a file into every value's dir — the
      small-files explosion at scale.

    ``options`` passes format options through (e.g. for CSV sinks the
    §2.1 S5 surface: ``{"header": "true", "delimiter": "|"}`` — the
    reference writes header CSV per line,
    ``Parallel/Pattern Extraction.scala:255-256``).
    """
    if target_files is not None:
        if partition_cols:
            df = df.repartition(target_files, *[F.col(c) for c in partition_cols])
        else:
            df = df.coalesce(target_files)
    writer = df.write.mode(mode)
    if options:
        writer = writer.options(**options)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    getattr(writer, fmt)(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    n_buckets: int,
    sort_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a BUCKETED catalog table — the co-located-join
    layout for keys that are joined repeatedly.

    Hive-style bucketing hashes ``bucket_cols`` into ``n_buckets`` files
    per partition at WRITE time; two tables bucketed the same way join
    with NO exchange on either side (Spark trusts the stored
    distribution), turning the 100 TB fact-fact join from
    shuffle-both-sides into a zipped per-bucket merge. ``sort_cols``
    additionally pre-sorts within buckets so the sort-merge join skips
    its sorts too. The reference re-shuffles its biggest join every run
    (`Parallel/Pattern Extraction.scala` repartitions per stage); a
    bucketed layout pays that shuffle once at ingest.

    Requires a catalog (``saveAsTable``) — path-based writes cannot
    carry bucket metadata; local tests use the default in-memory
    catalog + spark-warehouse dir.
    """
    writer = (
        df.write.mode(mode)
        .format(fmt)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
