"""Aggregation idioms (SURVEY.md §2.4).

The reference's two recurring non-trivial shapes:

- A2 "does ANY row in the group satisfy pred" —
  ``max(when(pred,1).otherwise(0))`` (``Standalone/Pattern
  Extraction.scala:104-118``).
- A3 "do ALL subgroups satisfy" — per-subgroup flag then per-group
  ``min`` (``Standalone/Blind Zone Detection.scala:112-143``).

Both are partial-aggregable (map-side combine) — a single shuffle each,
which is what makes them safe at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def any_flag(pred: Column) -> Column:
    """0/1 aggregate: 1 iff any row in the group satisfies ``pred``."""
    return F.max(F.when(pred, 1).otherwise(0))


def group_any(
    df: DataFrame, group_by: Sequence[str], pred: Column, flag_name: str = "flag"
) -> DataFrame:
    return df.groupBy(*group_by).agg(any_flag(pred).alias(flag_name))


def group_all_subgroups(
    df: DataFrame,
    group_by: Sequence[str],
    subgroup_by: Sequence[str],
    pred: Column,
    flag_name: str = "flag",
) -> DataFrame:
    """1 iff EVERY subgroup of the group has ≥1 row satisfying ``pred``.

    Two chained groupBys (cascaded aggregate A3); both stages combine
    map-side.
    """
    sub = df.groupBy(*group_by, *subgroup_by).agg(any_flag(pred).alias("_sub_flag"))
    return sub.groupBy(*group_by).agg(F.min("_sub_flag").alias(flag_name))
