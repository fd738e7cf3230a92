"""Column profiling — the data-quality pass a pipeline runs before
trusting a new drop of data.

One row per profiled numeric column: row/null/distinct counts, min,
max, rounded mean. The whole profile is ONE aggregate pass over one
scan — profiling 100 TB costs one read, not one read per column.
Counts/min/max/mean partial-aggregate to scalars; the exact distinct
counts add Spark's multi-distinct Expand (one input row fans out per
distinct-agg), and their shuffle carries each column's DISTINCT
VALUES — exact-distinct cost, not a one-row shuffle. At scales where
that matters, pass ``distinct="approx"``: every distinct count becomes
an ``approx_count_distinct`` HLL sketch (fixed-size partials, a
one-row shuffle, ~2% standard error — the 100 TB call is one
argument; ``tests/test_operators.py`` pins |approx−exact| on the
fixtures). The oracle keeps the exact form. Long format (column name
as a row key) so downstream
checks join/diff profiles across data drops without schema churn.

Exact metrics are engine-portable as-is; the mean is rounded because
double summation order differs across engines (same policy as the
corpus aggregates). The DuckDB oracle replays the profile via a
UNION ALL over the same expressions (corpus `dp_profile_numeric`).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_numeric(
    df: DataFrame,
    cols: Sequence[str],
    round_to: int = 4,
    distinct: str = "exact",
) -> DataFrame:
    """Profile ``cols`` (numeric) in one aggregate pass; returns one
    row per column: (column, n_rows, n_nulls, n_distinct, min_value,
    max_value, avg_value).

    ``distinct``: ``"exact"`` (countDistinct — the oracle default) or
    ``"approx"`` (approx_count_distinct HLL, rsd 2% — the setting for
    100 TB scans, where exact distinct shuffles every distinct value
    per column while the sketch shuffles fixed-size partials)."""
    assert cols, "profile_numeric needs at least one column"
    assert distinct in ("exact", "approx"), distinct
    nd = (
        F.countDistinct
        if distinct == "exact"
        else lambda c: F.approx_count_distinct(c, rsd=0.02)
    )
    # partition-count floor on the projected columns (guide §2, r14):
    # the multi-distinct plan EXPANDs each input row once per distinct
    # aggregate before the partial agg, and the fixture scan is ~5
    # splits — the expand+partial stage profiled 2.6 s cpu over 5
    # tasks (576 ms wall) at sf0.1. Projecting first keeps the added
    # exchange narrow; no-op on wide inputs. (The downstream distinct
    # MERGE stage is AQE-coalesced by bytes — at real scale that
    # shuffle is large enough to fan out on its own.)
    from gpssbzd_spark.sources.tables import widen_small_input

    df = widen_small_input(df.select(*cols))
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"_rows_{c}"),
            F.count(F.when(F.col(c).isNull(), True)).alias(f"_nulls_{c}"),
            nd(F.col(c)).alias(f"_nd_{c}"),
            F.min(F.col(c)).cast("double").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("double").alias(f"_max_{c}"),
            F.round(F.avg(F.col(c)), round_to).alias(f"_avg_{c}"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"_rows_{c}").alias("n_rows"),
                F.col(f"_nulls_{c}").alias("n_nulls"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
                F.col(f"_avg_{c}").alias("avg_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select("r.*")


def profile_numeric_sql(
    table: str, cols: Sequence[str], round_to: int = 4
) -> str:
    """DuckDB twin of :func:`profile_numeric` (one scan per column in
    SQL form — the oracle runs at fixture scale where that is fine)."""
    parts = [
        f"""
    SELECT '{c}' AS column,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(CASE WHEN {c} IS NULL THEN 1 END) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(MIN({c}) AS DOUBLE) AS min_value,
           CAST(MAX({c}) AS DOUBLE) AS max_value,
           ROUND(AVG({c}), {round_to}) AS avg_value
    FROM {table}"""
        for c in cols
    ]
    return " UNION ALL ".join(parts)


def profile_correlation(
    df: DataFrame, cols: Sequence[str], round_to: int = 4
) -> DataFrame:
    """All-pairs Pearson correlation of ``cols`` in ONE aggregate pass:
    n·(n−1)/2 ``corr()`` aggregates ride a single scan (corr partials
    are constant-size moment tuples, so the shuffle is one row however
    wide the input), then explode to long format (col_a, col_b,
    correlation) for joins/diffs across data drops — the pairwise
    companion to :func:`profile_numeric`'s per-column stats. Pairs are
    emitted once with col_a < col_b in ``cols`` order."""
    cols = list(cols)
    assert len(cols) >= 2, "profile_correlation needs at least two columns"
    pairs = [
        (a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]
    ]
    wide = df.agg(
        *[
            F.round(F.corr(a, b), round_to).alias(f"_c_{i}")
            for i, (a, b) in enumerate(pairs)
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col(f"_c_{i}").alias("correlation"),
            )
            for i, (a, b) in enumerate(pairs)
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select("r.*")


def profile_correlation_sql(
    table: str, cols: Sequence[str], round_to: int = 4
) -> str:
    """DuckDB twin of :func:`profile_correlation`."""
    cols = list(cols)
    parts = [
        f"""
    SELECT '{a}' AS col_a, '{b}' AS col_b,
           ROUND(corr({a}, {b}), {round_to}) AS correlation
    FROM {table}"""
        for i, a in enumerate(cols)
        for b in cols[i + 1 :]
    ]
    return " UNION ALL ".join(parts)


_PSI_FLOOR = 1e-6


def drift_psi(
    df_a: DataFrame,
    df_b: DataFrame,
    specs: dict[str, tuple[float, float, int]],
    round_to: int = 4,
) -> DataFrame:
    """Population Stability Index per column between two data drops —
    the standard drift gate a training pipeline runs before trusting a
    new snapshot (PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted).

    ``specs`` maps column → (lo, hi, n_bins): values bucket into n_bins
    fixed-width bins over [lo, hi) with clamping (everything below lo
    in bin 0, above hi in the last bin — drift OUT of the expected
    range must move mass, not vanish), nulls excluded. PSI =
    Σ (p_i − q_i)·ln(p_i / q_i) with both shares floored at 1e-6 so
    empty bins contribute a large-but-finite term.

    Scale shape: ONE scan per side — every column's bucket rides a
    single explode (array of (column, bucket) structs), one
    partial-aggregated groupBy per side, then the per-bin join and the
    per-column rollup move only (columns × bins) rows. Deterministic
    fixed-bin arithmetic; the DuckDB oracle replays it exactly
    (corpus ``dp_drift_psi``)."""
    assert specs, "drift_psi needs at least one column spec"

    def entries(df: DataFrame):
        structs = []
        for c, (lo, hi, n) in specs.items():
            w = (hi - lo) / n
            b = F.least(
                F.greatest(
                    F.floor((F.col(c) - F.lit(lo)) / F.lit(w)).cast("int"),
                    F.lit(0),
                ),
                F.lit(n - 1),
            )
            structs.append(
                F.struct(
                    F.lit(c).alias("column"),
                    F.when(F.col(c).isNotNull(), b).alias("bucket"),
                )
            )
        return (
            df.select(F.explode(F.array(*structs)).alias("e"))
            .select("e.*")
            .filter(F.col("bucket").isNotNull())
            .groupBy("column", "bucket")
            .agg(F.count("*").alias("n"))
        )

    a = entries(df_a).withColumnRenamed("n", "n_a")
    b = entries(df_b).withColumnRenamed("n", "n_b")
    both = a.join(b, ["column", "bucket"], "full_outer").select(
        "column",
        "bucket",
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
    )
    tot = both.groupBy("column").agg(
        F.sum("n_a").alias("t_a"), F.sum("n_b").alias("t_b")
    )
    p = F.greatest(F.col("n_a") / F.col("t_a"), F.lit(_PSI_FLOOR))
    q = F.greatest(F.col("n_b") / F.col("t_b"), F.lit(_PSI_FLOOR))
    return (
        both.join(F.broadcast(tot), "column")
        .select("column", ((p - q) * F.log(p / q)).alias("_term"))
        .groupBy("column")
        .agg(F.round(F.sum("_term"), round_to).alias("psi"))
    )


def drift_psi_sql(
    table_a: str,
    table_b: str,
    specs: dict[str, tuple[float, float, int]],
    round_to: int = 4,
) -> str:
    """DuckDB twin of :func:`drift_psi` (same clamped fixed bins, same
    1e-6 floor, same ln)."""

    def side(table: str) -> str:
        parts = []
        for c, (lo, hi, n) in specs.items():
            w = (hi - lo) / n
            parts.append(
                f"""
      SELECT '{c}' AS col,
             LEAST(GREATEST(CAST(FLOOR(({c} - {lo}) / {w}) AS INT), 0),
                   {n - 1}) AS bucket
      FROM {table} WHERE {c} IS NOT NULL"""
            )
        return " UNION ALL ".join(parts)

    return f"""
    WITH ea AS ({side(table_a)}
    ), eb AS ({side(table_b)}
    ), ca AS (
      SELECT col, bucket, COUNT(*) AS n_a FROM ea GROUP BY col, bucket
    ), cb AS (
      SELECT col, bucket, COUNT(*) AS n_b FROM eb GROUP BY col, bucket
    ), both_sides AS (
      SELECT COALESCE(ca.col, cb.col) AS col,
             COALESCE(ca.bucket, cb.bucket) AS bucket,
             COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b
      FROM ca FULL OUTER JOIN cb
        ON ca.col = cb.col AND ca.bucket = cb.bucket
    ), tot AS (
      SELECT col, SUM(n_a) AS t_a, SUM(n_b) AS t_b
      FROM both_sides GROUP BY col
    )
    SELECT b.col AS column,
           ROUND(SUM(
             (GREATEST(n_a / t_a, {_PSI_FLOOR}) -
              GREATEST(n_b / t_b, {_PSI_FLOOR})) *
             ln(GREATEST(n_a / t_a, {_PSI_FLOOR}) /
                GREATEST(n_b / t_b, {_PSI_FLOOR}))
           ), {round_to}) AS psi
    FROM both_sides b JOIN tot t ON b.col = t.col
    GROUP BY b.col
    """


def outliers_mad(
    df: DataFrame,
    cols: Sequence[str],
    k: float = 3.0,
    round_to: int = 4,
    percentile: str = "exact",
) -> DataFrame:
    """Robust outlier profile per column: median, MAD (median absolute
    deviation), and how many rows sit further than ``k`` scaled MADs
    from the median (1.4826·MAD ≈ σ under normality — the robust
    z-score; mean/stddev-based rules break down when the outliers
    themselves inflate the spread). One row per column: (column,
    median_value, mad, n_outliers, outlier_frac).

    Cost is THREE scans by construction — MAD needs the median and the
    outlier count needs both — each a one-pass multi-column aggregate
    with only two scalar collects (one row each) between passes.

    ``percentile``: ``"exact"`` (Spark ``percentile`` — the oracle
    default, bit-comparable to DuckDB ``median``) or ``"approx"``
    (``approx_percentile`` accuracy 10000, i.e. ≤0.01% rank error — the
    100 TB setting: exact percentile buffers EVERY value of the column
    in one aggregation buffer, which is an executor memory wall at
    scale, while the approx sketch keeps fixed-size partials). Same
    one-argument scale switch as profile_numeric's ``distinct``;
    ``tests/test_operators.py`` pins |approx−exact| on the fixtures."""
    assert cols, "outliers_mad needs at least one column"
    assert percentile in ("exact", "approx"), percentile
    cols = list(cols)
    if percentile == "exact":
        med = lambda c: F.percentile(c, F.lit(0.5))  # noqa: E731
    else:
        med = lambda c: F.approx_percentile(  # noqa: E731
            c, F.lit(0.5), F.lit(10000)
        )
    # r14 (guide §2.6/§5, profiled): a global exact percentile ends in
    # ONE single-task merge of every map task's value buffer — with all
    # columns fused into one agg, that serial tail is Σ(per-column
    # merge) and the two blocking passes ran back to back (median pass
    # 0.7 s map + 1.0 s merge, MAD pass 0.5 s + 1.3 s at sf0.1). Two
    # changes, same results:
    # - pin the projected columns once (widened — the source scan is
    #   1-3 splits), so the three passes read the in-memory rows
    #   instead of re-scanning + re-deriving per pass. r15 (guide §5,
    #   VERDICT r14 #4): the pin is SIZE-CONDITIONAL — an eager
    #   localCheckpoint of every numeric column of a 100 TB corpus
    #   would cost executor block storage ≈ the projection to save two
    #   column-pruned re-scans; past PIN_MAX_BYTES the passes re-scan
    #   (the documented three-scan cost), results identical either way;
    # - per-column aggregation jobs submitted CONCURRENTLY from a
    #   driver thread pool: independent jobs back-fill the executors,
    #   so each pass's wall is the slowest column's merge, not the sum
    #   (the scheduler interleaves them; FIFO is fine at this width).
    from concurrent.futures import ThreadPoolExecutor

    from gpssbzd_spark.sources.tables import pin_if_small, widen_small_input

    proj, _ = pin_if_small(widen_small_input(df.select(*cols)))

    def _one_med(c: str) -> float:
        return proj.agg(med(F.col(c)).alias("m")).collect()[0]["m"]

    with ThreadPoolExecutor(max_workers=len(cols)) as pool:
        meds = dict(zip(cols, pool.map(_one_med, cols)))

        def _one_mad(c: str) -> float:
            return proj.agg(
                med(F.abs(F.col(c) - F.lit(meds[c]))).alias("m")
            ).collect()[0]["m"]

        mads = dict(zip(cols, pool.map(_one_mad, cols)))
    df = proj
    aggs = []
    for c in cols:
        bound = k * 1.4826 * (mads[c] or 0.0)
        aggs += [
            F.count(F.col(c)).alias(f"_n_{c}"),
            F.count(
                F.when(F.abs(F.col(c) - F.lit(meds[c])) > F.lit(bound), True)
            ).alias(f"_o_{c}"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.round(F.lit(meds[c]), round_to).alias("median_value"),
                F.round(F.lit(mads[c]), round_to).alias("mad"),
                F.col(f"_o_{c}").cast("long").alias("n_outliers"),
                F.round(
                    F.col(f"_o_{c}") / F.nullif(F.col(f"_n_{c}"), F.lit(0)),
                    round_to,
                ).alias("outlier_frac"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select("r.*")


def outliers_mad_sql(
    table: str, cols: Sequence[str], k: float = 3.0, round_to: int = 4
) -> str:
    """DuckDB twin of :func:`outliers_mad` (same exact medians, same
    1.4826 scale, same strict > bound)."""
    parts = []
    for c in cols:
        parts.append(
            f"""
    SELECT '{c}' AS column,
           ROUND(m.med, {round_to}) AS median_value,
           ROUND(d.mad, {round_to}) AS mad,
           CAST(COUNT(CASE WHEN abs(t.{c} - m.med) > {k} * 1.4826 * d.mad
                      THEN 1 END) AS BIGINT) AS n_outliers,
           ROUND(COUNT(CASE WHEN abs(t.{c} - m.med) > {k} * 1.4826 * d.mad
                      THEN 1 END)
                 / CAST(NULLIF(COUNT(t.{c}), 0) AS DOUBLE),
                 {round_to}) AS outlier_frac
    FROM {table} t,
         (SELECT median({c}) AS med FROM {table}) m,
         (SELECT median(abs({c} - (SELECT median({c}) FROM {table}))) AS mad
          FROM {table}) d
    GROUP BY m.med, d.mad"""
        )
    return " UNION ALL ".join(parts)
