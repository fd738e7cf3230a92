"""Sinks. Parquet-first, partitioned layout.

Replaces the reference's per-line output directories written one at a time
from a driver thread pool (``Parallel/Pattern Extraction.scala:255-256``
``repartition(1).write.csv`` per line) with a single
``partitionBy("linenumber")`` write — one job, no driver fan-out, and at
100 TB no single-partition bottleneck (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = (),
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    getattr(writer, fmt)(path)
