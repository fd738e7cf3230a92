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

from pyspark.sql import Column, DataFrame
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


def hll_overlap(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    sketch_name: str = "hll",
) -> DataFrame:
    """Estimated overlap of two keyed sketch tables WITHOUT touching
    raw data: for each key present on both sides,
    ``overlap ≈ |A| + |B| − |A∪B|`` (inclusion-exclusion over HLL
    estimates — HLL cannot intersect directly, but it unions exactly).
    The audience-overlap / cross-segment-reach question answered from
    stored KB-size sketches; error compounds to a few σ of the union's
    rsd, so it is a ranking/reach signal, not an exact join count
    (bound pinned in tests/test_operators.py). Clamped at 0 (the
    estimator can go slightly negative on near-disjoint sets)."""
    a = left.select(*on, F.col(sketch_name).alias("_a"))
    b = right.select(*on, F.col(sketch_name).alias("_b"))
    est_a = F.hll_sketch_estimate(F.col("_a"))
    est_b = F.hll_sketch_estimate(F.col("_b"))
    est_u = F.hll_sketch_estimate(F.hll_union(F.col("_a"), F.col("_b")))
    return (
        a.join(b, list(on))
        .select(
            *on,
            est_a.alias("n_left"),
            est_b.alias("n_right"),
            F.greatest(F.lit(0).cast("long"), est_a + est_b - est_u).alias(
                "n_overlap_est"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Mergeable fixed-bin histograms: the quantile counterpart of the HLL
# rollup above. `percentile_approx` (SURVEY §2.4 A4) answers one group
# at one granularity; a warehouse rollup wants per-fine-group partials
# it can MERGE to any coarser level (daily→monthly, (flag,status)→flag)
# without rescanning raw data. A fixed-bin count histogram is the
# simplest mergeable quantile sketch: the partial is `bins` longs, the
# merge is an elementwise sum (both fully partial-aggregable — map-side
# combine, one narrow shuffle of (group, bins·8 B) rows), and — unlike
# HLL binaries or t-digest centroids — the whole pipeline is
# deterministic integer arithmetic, so the DuckDB oracle can replay it
# exactly (corpus `a12_hist_quantile_rollup`). Error is bounded by the
# bin width: the estimate returned for quantile q is the LOWER EDGE of
# the first bin whose cumulative count reaches rank ceil(q·total).
# ---------------------------------------------------------------------------


def hist_bin(col: Column, lo: float, hi: float, bins: int) -> Column:
    """0-based bin index of ``col`` in ``bins`` equal-width bins over
    [lo, hi); out-of-range values clamp to the edge bins, NULL stays
    NULL (excluded from every count)."""
    w = (hi - lo) / bins
    raw = F.floor((col - F.lit(float(lo))) / F.lit(w))
    clamped = F.least(F.lit(bins - 1), F.greatest(F.lit(0), raw)).cast("int")
    # least/greatest IGNORE null args (they return the extreme of the
    # non-null ones), so without the guard a NULL value would land in
    # bin 0 instead of being excluded
    return F.when(col.isNotNull(), clamped)


def hist_partial(
    df: DataFrame,
    group_by: Sequence[str],
    col: str,
    lo: float,
    hi: float,
    bins: int,
    name: str = "hist",
) -> DataFrame:
    """Per-group bin-count array — the storable partial.

    Two-phase sparse count: groupBy (group, bin) count — one narrow
    partial-aggregated shuffle of at most bins rows per group — then
    densify the ≤bins (bin, count) entries per group into the fixed
    array via map lookup. The obvious one-pass alternative (`bins`
    separate `count(when(bin==i))` aggregate expressions) evaluates
    every bin predicate against every row — bins× the aggregate work
    — and a 110-wide agg falls out of whole-stage codegen: measured
    ~6× slower at sf0.1.

    A group with NO non-null values is absent from the output (as in
    a SQL GROUP BY over the non-null rows), not an all-zero array."""
    b = hist_bin(F.col(col), lo, hi, bins)
    sparse = (
        df.select(*group_by, b.alias("_bin"))
        .filter(F.col("_bin").isNotNull())
        .groupBy(*group_by, "_bin")
        .agg(F.count("*").alias("_c"))
    )
    as_map = sparse.groupBy(*group_by).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_bin"), F.col("_c")))
        ).alias("_m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(bins - 1)),
        lambda i: F.coalesce(F.element_at(F.col("_m"), i), F.lit(0).cast("long")),
    )
    return as_map.select(*group_by, dense.alias(name))


def hist_rollup(
    partials: DataFrame,
    group_by: Sequence[str],
    bins: int,
    name: str = "hist",
) -> DataFrame:
    """Merge stored partials to a coarser grouping: elementwise sum of
    the count arrays, never a rescan of raw data."""
    sums = [F.sum(F.element_at(F.col(name), i + 1)) for i in range(bins)]
    return partials.groupBy(*group_by).agg(F.array(*sums).alias(name))


def hist_quantile(
    hist_col: Column, q: float, lo: float, hi: float, bins: int
) -> Column:
    """Quantile estimate from a bin-count array: the lower edge of the
    first bin whose cumulative count reaches rank ceil(q·total).
    NULL for an all-empty histogram. Pure JVM expression (no UDF); the
    O(bins²) running-sum transform is over `bins` elements per GROUP
    row, not per input row."""
    w = (hi - lo) / bins
    zero = F.lit(0).cast("long")
    total = F.aggregate(hist_col, zero, lambda a, x: a + x)
    target = F.greatest(F.lit(1).cast("long"), F.ceil(F.lit(float(q)) * total))
    cum = F.transform(
        F.sequence(F.lit(1), F.lit(bins)),
        lambda i: F.aggregate(F.slice(hist_col, 1, i), zero, lambda a, x: a + x),
    )
    idx0 = F.size(F.filter(cum, lambda c: c < target))
    est = F.lit(float(lo)) + idx0.cast("double") * F.lit(w)
    return F.when(total > 0, est)


def hist_quantile_sql(
    table: str,
    group_expr: str,
    fine_expr: str,
    col: str,
    quantiles: dict[str, float],
    lo: float,
    hi: float,
    bins: int,
) -> str:
    """ANSI-SQL twin of partial→rollup→quantile for the DuckDB oracle:
    identical bin assignment, identical rank rule, identical lower-edge
    arithmetic (bin width embedded at full repr precision)."""
    w = repr((hi - lo) / bins)
    qcols = ",\n       ".join(
        f"ROUND({repr(float(lo))} + MIN(CASE WHEN cum >= "
        f"GREATEST(1, CEIL({repr(float(q))} * total)) THEN bin END) * {w}, 6)"
        f" AS {alias}"
        for alias, q in quantiles.items()
    )
    return f"""
    WITH binned AS (
      SELECT {group_expr} AS grp, {fine_expr} AS fine,
             CAST(LEAST({bins - 1}, GREATEST(0,
               FLOOR(({col} - {repr(float(lo))}) / {w}))) AS INT) AS bin
      FROM {table} WHERE {col} IS NOT NULL
    ), fine_counts AS (
      SELECT grp, fine, bin, COUNT(*) AS c FROM binned GROUP BY grp, fine, bin
    ), merged AS (
      SELECT grp, bin, SUM(c) AS c FROM fine_counts GROUP BY grp, bin
    ), cum AS (
      SELECT grp, bin, c,
             SUM(c) OVER (PARTITION BY grp ORDER BY bin) AS cum,
             SUM(c) OVER (PARTITION BY grp) AS total
      FROM merged
    )
    SELECT grp, CAST(MAX(total) AS BIGINT) AS n_values,
       {qcols}
    FROM cum GROUP BY grp
    """
