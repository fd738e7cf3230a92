"""Mergeable sketches: the 100-TB answer to "how many distinct".

The reference's distinct counts are exact (`Parallel/Blind Zone
Detection.scala:75-88` counts distinct vehicles per cluster) — fine at
one city-day, but an exact global distinct over 100 TB shuffles every
key once, and a DAILY rollup must rescan history. The warehouse-scale
pattern is a MERGEABLE sketch (HyperLogLog, Flajolet et al. / Heule et
al. "HLL++" — the algorithm behind Spark's datasketches-backed
``hll_sketch_agg``):

- build one small fixed-size sketch per fine-grained group
  (partial-aggregable: map-side combine, one narrow shuffle);
- PERSIST the sketches, not the keys;
- any coarser rollup — daily→monthly, (flag,status)→flag, per-file →
  global — is ``hll_union_agg`` over the stored binaries, never a
  rescan of raw data.

Error is ~1.04/sqrt(2^lgConfigK) relative standard deviation: lgK=14
⇒ 0.8% rsd for a 16 KB sketch, independent of cardinality. The
estimate step is exact-deterministic for fixed input (no rng), but the
binary format is engine-specific — no DuckDB twin, so the corpus row
is rows-only and the accuracy bound is pinned by pytest against the
exact count (tests/test_operators.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LG_CONFIG_K = 14  # 16 KB sketches, ~0.8% rsd


def hll_partial(
    df: DataFrame,
    group_by: Sequence[str],
    col: str,
    sketch_name: str = "hll",
    lg_config_k: int = LG_CONFIG_K,
) -> DataFrame:
    """Per-group HLL sketch of ``col`` — the storable partial. One
    shuffle of (group, 16 KB) pairs regardless of input size."""
    return df.groupBy(*group_by).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lg_config_k)).alias(sketch_name)
    )


def hll_rollup(
    partials: DataFrame,
    group_by: Sequence[str],
    sketch_name: str = "hll",
) -> DataFrame:
    """Merge stored partials to a coarser grouping without touching raw
    data. ``allowDifferentLgConfigK=True``: unioning sketches built at
    different precisions degrades to the coarser one instead of
    failing — what happens in practice when a pipeline's lgK config
    changed mid-history."""
    return partials.groupBy(*group_by).agg(
        F.hll_union_agg(F.col(sketch_name), allowDifferentLgConfigK=True).alias(
            sketch_name
        )
    )


def hll_estimate(df: DataFrame, sketch_name: str = "hll", out: str = "approx_nd") -> DataFrame:
    """Replace the sketch column with its cardinality estimate."""
    return df.withColumn(out, F.hll_sketch_estimate(F.col(sketch_name))).drop(
        sketch_name
    )
