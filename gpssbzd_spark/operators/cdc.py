"""Upsert merge and snapshot diff — the mutation surface of a
batch-immutable engine (extension).

The reference's pipelines are read-only over a day of data; a
production deployment also has to APPLY changes: merge a late-arriving
correction batch into the table (upsert), and derive what changed
between two snapshots (CDC — the feed that keeps downstream marts and
caches incremental instead of full-refresh).

Shapes, and why upsert is NOT a full outer join here:

- **upsert**: the textbook formulation (full outer join, update side
  wins) cannot broadcast — Spark has no broadcast-hash full outer
  join, so it always plans as a sort-merge join that SHUFFLES THE
  BASE. For a correction batch against a 100 TB base that is the
  whole cost. The scalable formulation is anti-join + union: base
  rows whose key is absent from the updates (one broadcastable
  left-anti join — zero base shuffle) unioned with the update rows.
  With an order-column gate it becomes two broadcast passes over the
  base (left outer to pick surviving base rows, derived beaten-key
  anti join on the updates) — two scans, still zero shuffles, which
  beats one full-base shuffle both in IO amplification and in skew
  exposure. On a lakehouse this is MERGE INTO's copy-on-write plan;
  pair with partition pruning on the write so only touched files
  rewrite.
- **snapshot diff**: genuinely needs both sides of every key (an
  insert is invisible to an anti-join formulation's output contract
  here), so it IS a full outer join: null-side tells insert/delete,
  null-safe value comparison tells update vs unchanged. Emitting only
  changed rows keeps the output proportional to churn, not table
  size. Both snapshots are the same size by nature, so the shuffle is
  symmetric and unavoidable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    order_col: str | None = None,
) -> DataFrame:
    """Apply ``updates`` to ``base`` by key: matched rows are replaced
    by the update row, unmatched update rows are appended, everything
    else passes through. Both sides must share the schema.

    ``order_col`` makes the merge REPLAY-SAFE (MERGE INTO's ``WHEN
    MATCHED AND u.ord >= b.ord``): a matched update wins only if its
    order value (event time, version) is >= the base row's, so applying
    change batches out of order — late files, at-least-once redelivery
    — can never regress a key to an older row. A NULL order value on
    either side keeps the base row (the conservative read of an
    unorderable pair). Without ``order_col`` the update side wins
    unconditionally (arrival order).

    Plan shape (the reason this is not a full outer join — see module
    docstring): without ``order_col``, ONE left-anti join, which
    broadcasts when ``updates`` is broadcastable and never shuffles
    ``base``. With ``order_col``, a left-outer pass picks the
    surviving base rows and the beaten update keys derived from it
    feed a second anti join over ``updates`` — two base scans, still
    zero base shuffles (tests/test_operators.py gates both plans
    shuffle-free under a broadcast update side).
    """
    cols = base.columns
    assert updates.columns == cols, "merge_upsert requires identical schemas"
    keys = list(keys)
    if order_col is None:
        kept = base.join(updates, keys, "left_anti")
        return kept.unionByName(updates)

    u = updates.select(
        [F.col(k) for k in keys]
        + [F.col(order_col).alias("_u_ord"), F.lit(1).alias("_u_exists")]
    )
    joined = base.join(u, keys, "left")
    # one shared, null-safe verdict so base-kept and update-beaten
    # partition every matched key exactly once (a NULL comparison must
    # not keep BOTH rows)
    u_wins = F.coalesce(F.col("_u_ord") >= F.col(order_col), F.lit(False))
    matched = F.col("_u_exists").isNotNull()
    kept_base = joined.filter(~matched | ~u_wins).select(*cols)
    # no distinct on the beaten keys: left-anti only tests existence,
    # and a distinct here would be the plan's ONLY shuffle
    beaten_keys = joined.filter(matched & ~u_wins).select(*keys)
    emit_updates = updates.join(F.broadcast(beaten_keys), keys, "left_anti")
    return kept_base.unionByName(emit_updates)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Change rows between two snapshots: the NEW row values (old
    values for deletes) plus ``op`` ∈ insert/update/delete. Unchanged
    rows are dropped, so output size tracks churn. Value comparison is
    null-safe per column (a NULL→value transition is an update, not a
    no-op)."""
    cols = old.columns
    assert new.columns == cols, "snapshot_diff requires identical schemas"
    o = old.select([F.col(c).alias(f"_o_{c}") for c in cols])
    cond = [F.col(f"_o_{k}") == F.col(k) for k in keys]
    joined = new.join(o, cond, "full_outer")
    new_exists = F.col(keys[0]).isNotNull()
    old_exists = F.col(f"_o_{keys[0]}").isNotNull()
    value_cols = [c for c in cols if c not in keys]
    changed = F.lit(False)
    for c in value_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.col(f"_o_{c}"))
    op = (
        F.when(new_exists & ~old_exists, F.lit("insert"))
        .when(old_exists & ~new_exists, F.lit("delete"))
        .when(changed, F.lit("update"))
    )  # unchanged → NULL → filtered
    out_cols = [
        F.coalesce(F.col(c), F.col(f"_o_{c}")).alias(c) if c in keys
        else F.when(old_exists & ~new_exists, F.col(f"_o_{c}"))
        .otherwise(F.col(c))
        .alias(c)
        for c in cols
    ]
    return (
        joined.select(*out_cols, op.alias(op_col))
        .filter(F.col(op_col).isNotNull())
    )


def scd2_history(
    df: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str],
    ts_col: str,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a stack of keyed
    snapshots: rows ``(keys…, value_cols…, valid_from, valid_to,
    is_current)`` — one row per RUN of consecutive snapshots whose
    values are unchanged, ``valid_from`` the run's first snapshot time,
    ``valid_to`` the next run's ``valid_from`` (exclusive; NULL on the
    current run). This is the third leg of the CDC surface beside
    :func:`merge_upsert` (apply changes) and :func:`snapshot_diff`
    (derive changes): dimension tables need WHEN each value held, not
    just the latest value — every "as of" join against a dimension
    (j7's as-of shape) presupposes exactly this table.

    Change detection is null-safe per column (NULL→value and
    value→NULL are changes; NULL→NULL is not), so nullable attributes
    track correctly. Duplicate (key, ts) snapshots are rejected by the
    caller's contract (version stamps are unique per key).

    Scale shape: ONE exchange on the key — the lag() change flags, the
    running-sum run ids, and the valid_to lead() all share the same
    ``partitionBy(keys)`` sort, and the per-run collapse groups on
    (keys, run) which that partitioning already co-locates. No joins,
    nothing driver-side; output rows track the number of VALUE CHANGES,
    not the number of snapshots.
    """
    keys = list(keys)
    value_cols = list(value_cols)
    w = Window.partitionBy(*keys).orderBy(ts_col)
    changed = F.lit(False)
    for c in value_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    runs = df.select(
        *keys,
        *value_cols,
        F.col(ts_col),
        F.sum(F.when(changed, 1).otherwise(0)).over(w).alias("_run"),
    )
    collapsed = runs.groupBy(*keys, "_run", *value_cols).agg(
        F.min(ts_col).alias("valid_from")
    )
    w2 = Window.partitionBy(*keys).orderBy("valid_from")
    return (
        collapsed.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("_run")
    )


def scd2_history_sql(
    snapshot_sql: str,
    keys: Sequence[str],
    value_cols: Sequence[str],
    ts_col: str,
) -> str:
    """DuckDB twin of :func:`scd2_history` over any snapshot query with
    the same (keys, value_cols, ts) columns — same null-safe change
    flags (IS DISTINCT FROM), same run collapse, same lead()."""
    k = ", ".join(keys)
    v = ", ".join(value_cols)
    chg = " OR ".join(
        f"{c} IS DISTINCT FROM lag({c}) OVER w" for c in value_cols
    )
    return f"""
    WITH snaps AS ({snapshot_sql}
    ), chg AS (
      SELECT {k}, {v}, {ts_col},
             CASE WHEN {chg} THEN 1 ELSE 0 END AS _chg
      FROM snaps
      WINDOW w AS (PARTITION BY {k} ORDER BY {ts_col})
    ), flagged AS (
      SELECT {k}, {v}, {ts_col},
             SUM(_chg) OVER (PARTITION BY {k} ORDER BY {ts_col}
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS _run
      FROM chg
    ), collapsed AS (
      SELECT {k}, _run, {v}, MIN({ts_col}) AS valid_from
      FROM flagged GROUP BY {k}, _run, {v}
    )
    SELECT {k}, {v}, valid_from,
           lead(valid_from) OVER (PARTITION BY {k} ORDER BY valid_from)
             AS valid_to,
           lead(valid_from) OVER (PARTITION BY {k} ORDER BY valid_from)
             IS NULL AS is_current
    FROM collapsed
    """
