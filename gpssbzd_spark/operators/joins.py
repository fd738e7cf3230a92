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
from pyspark.sql.window import Window


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


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    time_col: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """As-of (point-in-time) join: for each ``left`` row, attach the
    ``value_cols`` of the latest ``right`` row with the same ``on`` key
    and ``right.time_col <= left.time_col`` (backward, inclusive —
    DuckDB ``ASOF LEFT JOIN … ON l.k = r.k AND l.t >= r.t`` semantics).

    Absent from the reference (SURVEY.md §2.3 notes the shape is faked
    with lag/lead); a first-class operator here because training-data
    and market-data pipelines lean on it.

    Spark-first plan: NOT a range theta-join (which Catalyst can only
    run as a broadcast nested loop or an exploding sort-merge with a
    residual). Instead: union both sides with a side tag, one window
    per key ordered by (t, tag, right payload) — right rows sort before
    left rows at equal t — and forward-fill the right payload with
    ``last(ignorenulls)``; then keep only left rows. ONE shuffle total
    (the window's), linear in |left| + |right|, per-key skew handled
    the same way any window op is. Duplicate right (key, t) rows are
    disambiguated by the window order itself — the payload-greatest row
    sorts last, so ``last`` picks it — which keeps the plan free of the
    pre-dedup groupBy (and its second exchange) an aggregate-based
    tie-break would cost.
    """
    lcols = [c for c in left.columns]
    rtypes = {f.name: f.dataType for f in right.schema}
    tagged_r = right.select(
        F.col(on),
        F.col(time_col),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        *[F.lit(None).alias(f"_l_{c}") for c in lcols if c not in (on, time_col)],
    )
    tagged_l = left.select(
        F.col(on),
        F.col(time_col),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(rtypes[c]).alias(f"_r_{c}") for c in value_cols],
        *[F.col(c).alias(f"_l_{c}") for c in lcols if c not in (on, time_col)],
    )
    w = (
        Window.partitionBy(on)
        .orderBy(time_col, "_side", *[f"_r_{c}" for c in value_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged_r.unionByName(tagged_l).select(
        F.col(on),
        F.col(time_col),
        F.col("_side"),
        *[F.col(f"_l_{c}").alias(c) for c in lcols if c not in (on, time_col)],
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")


def range_join_broadcast(
    facts: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    how: str = "inner",
) -> DataFrame:
    """Range (interval-containment) join: each fact row pairs with every
    interval where ``lo <= value < hi``. ``intervals`` must be small
    (a banding/tier dimension): the plan is an explicit
    ``broadcast()`` nested-loop join — the correct physical strategy
    when one side is tiny, and the only non-exploding one Catalyst has
    for pure theta predicates. For large interval sets, bucket both
    sides to a common grid first and equi-join on the bucket id.
    """
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return facts.join(F.broadcast(intervals), on=cond, how=how)


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    time_col: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Forward as-of join: for each ``left`` row, attach the
    ``value_cols`` of the EARLIEST ``right`` row with the same ``on``
    key and ``right.time_col >= left.time_col`` (inclusive — DuckDB
    ``ASOF LEFT JOIN … ON l.k = r.k AND l.t <= r.t``).

    Mirror of :func:`asof_join_backward`: left rows sort before right
    rows at equal t, the fill runs over ``(currentRow,
    unboundedFollowing)`` with ``first(ignorenulls)``, and duplicate
    right (key, t) ties resolve to the payload-least row via the window
    order — still one shuffle, no join node.
    """
    lcols = [c for c in left.columns]
    rtypes = {f.name: f.dataType for f in right.schema}
    tagged_l = left.select(
        F.col(on),
        F.col(time_col),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(rtypes[c]).alias(f"_r_{c}") for c in value_cols],
        *[F.col(c).alias(f"_l_{c}") for c in lcols if c not in (on, time_col)],
    )
    tagged_r = right.select(
        F.col(on),
        F.col(time_col),
        F.lit(1).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        *[F.lit(None).alias(f"_l_{c}") for c in lcols if c not in (on, time_col)],
    )
    w = (
        Window.partitionBy(on)
        .orderBy(time_col, "_side", *[f"_r_{c}" for c in value_cols])
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = tagged_l.unionByName(tagged_r).select(
        F.col(on),
        F.col(time_col),
        F.col("_side"),
        *[F.col(f"_l_{c}").alias(c) for c in lcols if c not in (on, time_col)],
        *[
            F.first(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("_side") == 0).drop("_side")
