"""Pivot / unpivot — wide↔long reshaping (extension surface).

The reference renders its per-cluster summaries long (one row per
(cluster, metric) — `Parallel/Blind Zone Detection.scala:75-104`); an
analytics engine also needs the wide form (one column per category) and
the inverse. Both are single-shuffle shapes when done right:

- **pivot**: REQUIRE the category values up front. Spark's
  ``pivot(col)`` without values runs an extra eager distinct job over
  the full table just to learn the column list — at 100 TB that is a
  second scan before the real one, and a high-cardinality category
  explodes the schema. With declared values it is one groupBy whose
  partial aggregation combines map-side, same cost as A7.
- **unpivot**: ``df.unpivot`` (SQL ``stack``) is a zero-shuffle
  row-local explode — each input row emits one row per measure. The
  long output is bigger than the wide input by ×len(measures); do it
  AFTER filters, not before.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pivot_wide(
    df: DataFrame,
    group_by: Sequence[str],
    pivot_col: str,
    pivot_values: Sequence[str],
    aggs: dict[str, Column],
) -> DataFrame:
    """One output column per (agg, pivot value): ``<agg>_<value>``.

    ``pivot_values`` is mandatory by design (see module docstring).
    ``aggs`` maps a name suffix to an aggregate over the rows of that
    cell, e.g. ``{"n": F.count(F.lit(1)), "sum_price":
    F.sum("o_totalprice")}`` (``count("*")`` is rejected inside Pivot).
    Spark's naming: ONE aggregate → columns are the bare pivot values
    (``O``, ``F``); several → ``<value>_<name>`` (``O_n``,
    ``O_sum_price``). Empty cells are NULL even for counts — coalesce
    downstream if 0 is wanted.
    """
    named = [
        agg.alias(name) for name, agg in aggs.items()
    ]
    return (
        df.groupBy(*group_by)
        .pivot(pivot_col, list(pivot_values))
        .agg(*named)
    )


def unpivot_long(
    df: DataFrame,
    ids: Sequence[str],
    measures: Sequence[str],
    var_name: str = "metric",
    value_name: str = "value",
) -> DataFrame:
    """Wide → long: one row per (id, measure). Row-local, no shuffle;
    measures are cast to a common type by Spark (use a uniform numeric
    type upstream to avoid surprise strings)."""
    return df.unpivot(
        list(ids), list(measures), var_name, value_name
    )
