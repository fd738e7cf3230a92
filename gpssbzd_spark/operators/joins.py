"""Join operators (SURVEY.md §2.3).

The reference's two non-standard join shapes, done Spark-first:

- J5 (collect → broadcast → isin): the reference pulls distinct keys to
  the driver and broadcasts a Scala set (``Parallel/Pattern
  Extraction.scala:47-50,144-145``). That driver round-trip caps at
  driver memory and serializes the job graph; a ``left_semi`` join is
  the same semantics, stays distributed, and Catalyst broadcasts the
  key side automatically when small.
- J4 (self theta-join pair generator): all unordered trajectory pairs
  per line (``Parallel/Trajectory Clustering.py:232-245``). Equi-join on
  the group key with a ``<`` residual; the O(n²)-per-group blowup is the
  workload's dominant cost, so skew is handled by AQE skew-join plus the
  caller-visible salting knob in ``plans/trajectory_clustering.py``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def semi_join_keys(df: DataFrame, keys: DataFrame, on: Sequence[str]) -> DataFrame:
    """Keep rows of ``df`` whose key appears in ``keys`` (EXISTS)."""
    return df.join(keys.select(*on).distinct(), on=list(on), how="left_semi")


def anti_join_keys(df: DataFrame, keys: DataFrame, on: Sequence[str]) -> DataFrame:
    """Keep rows of ``df`` whose key does NOT appear in ``keys``."""
    return df.join(keys.select(*on).distinct(), on=list(on), how="left_anti")


def pair_join(
    df: DataFrame,
    group_key: str,
    item_key: str,
    payload: Sequence[str],
    left_suffix: str = "_1",
    right_suffix: str = "_2",
) -> DataFrame:
    """All unordered item pairs within each group (J4).

    Returns one row per pair with ``item_key{left_suffix}``,
    ``item_key{right_suffix}`` and suffixed payload columns. The
    ``itemL < itemR`` residual keeps each unordered pair once.
    """
    cols = [group_key, item_key, *payload]
    left = df.select(
        F.col(group_key),
        *[F.col(c).alias(f"{c}{left_suffix}") for c in [item_key, *payload]],
    )
    right = df.select(
        F.col(group_key),
        *[F.col(c).alias(f"{c}{right_suffix}") for c in [item_key, *payload]],
    )
    cond = F.col(f"{item_key}{left_suffix}") < F.col(f"{item_key}{right_suffix}")
    return left.join(right, on=group_key, how="inner").filter(cond)
