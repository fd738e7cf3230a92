"""Time-bucket resampling with gap-fill — the hypertable-rollup shape.

Irregular event streams (GPS pings, telemetry) are consumed as REGULAR
series: fixed-width buckets per key, with silent intervals present as
rows rather than absent — a monitoring chart or downstream model needs
the gap to EXIST to see it (the reference's whole blind-zone premise is
that the interesting signal is where data is missing; its stage 1
reconstructs gaps per vehicle via lag()). This operator generalizes
that: per-key bucketed aggregates plus a dense bucket spine, optionally
forward-filled (TimescaleDB's ``time_bucket_gapfill`` /
``locf`` semantics, built from Spark primitives).

Scale shape: one groupBy (key, bucket) aggregate — partial-aggregated,
the shuffle carries one row per non-empty bucket; gap rows are then
generated IN-LINE by a lead() window over that aggregate (each bucket
explodes ``sequence(bucket .. next_bucket-1)``, so a gap's rows spawn
from the bucket preceding it — never a driver loop, never a global
calendar cross join, never a spine×data self-join, and the aggregate
is consumed exactly once so nothing needs persisting). The fill
windows share the lead window's (key) partitioning. Buckets are
epoch-integer arithmetic end-to-end so the DuckDB oracle replays them
bit-identically.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def time_bucket(ts_col: Column, bucket_secs: int) -> Column:
    """Floor ``ts_col`` to its bucket start (timestamp)."""
    idx = F.floor(F.unix_timestamp(ts_col) / bucket_secs)
    return F.timestamp_seconds(idx * bucket_secs)


def time_bucket_gapfill(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    bucket_secs: int,
    aggs: dict[str, Column],
    fill: str = "null",
) -> DataFrame:
    """Per-key fixed-width bucket rollup with a DENSE bucket axis.

    ``aggs`` maps output name → aggregate expression (evaluated per
    (key, bucket)); buckets between a key's first and last event that
    hold no rows appear with NULL aggregates, then per ``fill``:

    - ``'null'`` — left as NULL (gap visible as a hole);
    - ``'prev'`` — forward-filled from the key's last non-empty bucket
      (TimescaleDB ``locf``);
    - ``'zero'`` — coalesced to 0 (count-like series);
    - ``'linear'`` — interpolated between the bracketing non-null
      buckets, weighted by bucket distance (TimescaleDB
      ``interpolate``); NULL where no bracket exists (before the first
      / after the last non-null value). Both directions come from TWO
      opposite-frame windows over the SAME (key, bucket) sort — one
      sort, no extra shuffle.

    Sub-second precision note: Spark's ``unix_timestamp`` truncates to
    whole seconds while the oracle's ``epoch()`` keeps the fraction;
    ``floor(t / bucket_secs)`` agrees anyway for t >= 0 because bucket
    boundaries sit on integer seconds and truncation never crosses one.
    Pre-1970 timestamps (negative epochs) would break that equivalence
    — out of scope for event data.

    Also emits ``is_gap`` (boolean: the bucket had no input rows) so a
    blind-zone-style consumer can find silent intervals directly.
    Returns one row per (key, bucket) of each key's [min, max] bucket
    range, ``bucket`` as a timestamp column. Null timestamps are not
    activity and are excluded.
    """
    assert fill in ("null", "prev", "zero", "linear"), fill
    keys = list(key_cols)
    idx = F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_secs).cast("long")
    bucketed = (
        df.filter(F.col(ts_col).isNotNull())
        .withColumn("_bidx", idx)
        .groupBy(*keys, "_bidx")
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
    )
    out_cols = list(aggs)
    # gap rows spawn from the non-empty bucket PRECEDING the gap: each
    # bucket explodes sequence(self .. next-1), a generated index !=
    # its source bucket is a gap and carries NULL aggregates. The
    # aggregate is consumed exactly once (the old spine-groupBy +
    # left-join shape consumed it twice and needed a persist that
    # leaked cached partitions for the session lifetime — ADVICE r5).
    w_lead = Window.partitionBy(*keys).orderBy("_bidx")
    dense = (
        bucketed.withColumn("_next", F.lead("_bidx").over(w_lead))
        .withColumn(
            "_sbidx",
            F.explode(
                F.sequence(
                    F.col("_bidx"),
                    F.coalesce(F.col("_next") - 1, F.col("_bidx")),
                )
            ),
        )
        .select(
            *keys,
            F.col("_sbidx").alias("_out_bidx"),
            (F.col("_sbidx") != F.col("_bidx")).alias("is_gap"),
            *[
                F.when(F.col("_sbidx") == F.col("_bidx"), F.col(c)).alias(c)
                for c in out_cols
            ],
        )
        .withColumnRenamed("_out_bidx", "_bidx")
    )

    if fill == "prev":
        w = (
            Window.partitionBy(*keys)
            .orderBy("_bidx")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        dense = dense.select(
            *keys,
            "_bidx",
            "is_gap",
            *[
                F.last(c, ignorenulls=True).over(w).alias(c)
                for c in out_cols
            ],
        )
    elif fill == "zero":
        dense = dense.select(
            *keys,
            "_bidx",
            "is_gap",
            *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in out_cols],
        )
    elif fill == "linear":
        w_back = (
            Window.partitionBy(*keys)
            .orderBy("_bidx")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w_fwd = (
            Window.partitionBy(*keys)
            .orderBy("_bidx")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        filled_cols = []
        for c in out_cols:
            nn_bidx = F.when(F.col(c).isNotNull(), F.col("_bidx"))
            pv = F.last(c, ignorenulls=True).over(w_back).cast("double")
            pb = F.last(nn_bidx, ignorenulls=True).over(w_back)
            nv = F.first(c, ignorenulls=True).over(w_fwd).cast("double")
            nb = F.first(nn_bidx, ignorenulls=True).over(w_fwd)
            interp = pv + (nv - pv) * (
                (F.col("_bidx") - pb).cast("double")
                / (nb - pb).cast("double")
            )
            filled_cols.append(
                F.when(F.col(c).isNotNull(), F.col(c).cast("double"))
                .otherwise(
                    F.when(pv.isNotNull() & nv.isNotNull(), interp)
                )
                .alias(c)
            )
        dense = dense.select(*keys, "_bidx", "is_gap", *filled_cols)
    else:
        dense = dense.select(*keys, "_bidx", "is_gap", *out_cols)

    return dense.select(
        *keys,
        F.timestamp_seconds(F.col("_bidx") * bucket_secs).alias("bucket"),
        "is_gap",
        *out_cols,
    )


def time_bucket_gapfill_sql(
    table: str,
    ts_col: str,
    key_cols: Sequence[str],
    bucket_secs: int,
    agg_sql: dict[str, str],
    fill: str = "null",
) -> str:
    """DuckDB twin of :func:`time_bucket_gapfill`: same epoch-integer
    buckets, same per-key dense spine via generate_series, same fill
    rules. ``agg_sql`` maps output name → aggregate SQL over the table's
    columns. The bucket is emitted as a VARCHAR timestamp (engines
    disagree on tz-awareness through the pandas bridge; strings don't)."""
    assert fill in ("null", "prev", "zero", "linear"), fill
    keys = ", ".join(key_cols)
    aggs = ", ".join(f"{sql} AS {name}" for name, sql in agg_sql.items())
    names = list(agg_sql)
    base = f"""
    WITH src AS (
      SELECT *, CAST(FLOOR(epoch({ts_col}) / {bucket_secs}) AS BIGINT) AS _bidx
      FROM {table} WHERE {ts_col} IS NOT NULL
    ), bucketed AS (
      SELECT {keys}, _bidx, {aggs}, COUNT(*) AS _n_rows
      FROM src GROUP BY {keys}, _bidx
    ), spine AS (
      SELECT {keys}, unnest(generate_series(MIN(_bidx), MAX(_bidx))) AS _bidx
      FROM bucketed GROUP BY {keys}
    ), dense AS (
      SELECT {keys}, s._bidx AS _bidx, b._n_rows IS NULL AS is_gap,
             {", ".join(f"b.{n} AS {n}" for n in names)}
      FROM spine s LEFT JOIN bucketed b USING ({keys}, _bidx)
    )"""
    bucket_expr = (
        f"CAST(CAST(to_timestamp(_bidx * {bucket_secs}) AS TIMESTAMP) "
        "AS VARCHAR) AS bucket"
    )
    if fill == "prev":
        filled = ", ".join(
            f"last_value({n} IGNORE NULLS) OVER "
            f"(PARTITION BY {keys} ORDER BY _bidx "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS {n}"
            for n in names
        )
    elif fill == "zero":
        filled = ", ".join(f"COALESCE({n}, 0) AS {n}" for n in names)
    elif fill == "linear":
        # mirror the Spark expression SHAPE exactly (same casts, same
        # association order) so the doubles agree bit-for-bit
        wback = (
            f"(PARTITION BY {keys} ORDER BY _bidx "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        )
        wfwd = (
            f"(PARTITION BY {keys} ORDER BY _bidx "
            "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)"
        )
        parts = []
        for n in names:
            pv = f"CAST(last_value({n} IGNORE NULLS) OVER {wback} AS DOUBLE)"
            pb = (
                f"last_value(CASE WHEN {n} IS NOT NULL THEN _bidx END "
                f"IGNORE NULLS) OVER {wback}"
            )
            nv = f"CAST(first_value({n} IGNORE NULLS) OVER {wfwd} AS DOUBLE)"
            nb = (
                f"first_value(CASE WHEN {n} IS NOT NULL THEN _bidx END "
                f"IGNORE NULLS) OVER {wfwd}"
            )
            parts.append(
                f"CASE WHEN {n} IS NOT NULL THEN CAST({n} AS DOUBLE) "
                f"WHEN {pv} IS NOT NULL AND {nv} IS NOT NULL THEN "
                f"{pv} + ({nv} - {pv}) * "
                f"(CAST(_bidx - {pb} AS DOUBLE) / CAST({nb} - {pb} AS DOUBLE)) "
                f"END AS {n}"
            )
        filled = ", ".join(parts)
    else:
        filled = ", ".join(names)
    return f"""{base}
    SELECT {keys}, {bucket_expr}, is_gap, {filled}
    FROM dense
    """
