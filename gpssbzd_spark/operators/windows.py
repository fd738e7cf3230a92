"""Window-function toolkit (SURVEY.md §2.5 W1-W6).

These are the workhorses of the reference: every stage partitions by
vehicle (and/or pattern/cluster), orders by time, and derives lag/lead
state, running-sum segment ids, fills, and top-1-per-group picks. Each
helper is a thin, tested composition of built-in window exprs — one
shuffle per distinct (partitionBy) set, re-sorted within partitions by
the window exec (no global orderBy needed; the reference's global sorts
before windows are a perf bug we drop, SURVEY.md §4).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def _window(partition_by: Sequence[str], order_by: Sequence[str | Column]) -> WindowSpec:
    return Window.partitionBy(*partition_by).orderBy(*order_by)


def with_prev_next(
    df: DataFrame,
    cols: Sequence[str],
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    prev_prefix: str = "prev_",
    next_prefix: str = "next_",
    include_prev: bool = True,
    include_next: bool = True,
) -> DataFrame:
    """lag/lead of each col over one window (W1) — single shuffle.

    Mirrors the reference's blocks of 6 consecutive lag/lead withColumns
    (``Parallel/Pattern Extraction.scala:161-166``, ``Standalone/Blind
    Zone Detection.scala:79-81``) as one select.
    """
    w = _window(partition_by, order_by)
    out = list(df.columns)
    for c in cols:
        if include_prev:
            out.append(F.lag(c, 1).over(w).alias(f"{prev_prefix}{c}"))
        if include_next:
            out.append(F.lead(c, 1).over(w).alias(f"{next_prefix}{c}"))
    return df.select(*out)


def segment_id(
    start_flag: Column,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    one_based: bool = True,
) -> Column:
    """Running sum of a 0/1 start flag → monotone segment id (W2).

    The reference's pattern segmentation: ``sum(change_marker) over
    (partition by id order by t rows unbounded preceding) + 1`` →
    ``patternID`` (``Standalone/Pattern Extraction.scala:170-172``).
    """
    w = _window(partition_by, order_by).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    seg = F.sum(start_flag).over(w)
    return (seg + 1) if one_based else seg


def forward_fill(
    col: Column,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
) -> Column:
    """Last non-null value at-or-before the current row (W4).

    Canonical Spark idiom, as in ``Parallel/Pattern
    Extraction.scala:117-122`` (``filled_direction``).
    """
    w = _window(partition_by, order_by).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return F.last(col, ignorenulls=True).over(w)


def backward_fill(
    col: Column,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    skip_current: bool = False,
) -> Column:
    """First non-null value at-or-after the current row (W5).

    ``skip_current=True`` gives the reference's strict next-non-null
    (``first(c, ignoreNulls) over rowsBetween(1, unboundedFollowing)``,
    ``Parallel/Pattern Extraction.scala:217-228``).
    """
    start = 1 if skip_current else Window.currentRow
    w = _window(partition_by, order_by).rowsBetween(start, Window.unboundedFollowing)
    return F.first(col, ignorenulls=True).over(w)


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int = 1,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """Top-k rows per group via row_number (W3/O2), generalizing the
    reference's max-speed-point pick (``Standalone/Blind Zone
    Detection.scala:105-109``).

    ``order_by`` MUST end in a unique tie-break key (an id column):
    row_number over a tied ordering picks whichever row arrives first
    in the partition, so the survivor changes across runs, task
    retries, and AQE re-plans. Every in-repo caller passes one (e.g.
    the blind-zone pick orders by speed DESC, ts, lng, lat).
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)
