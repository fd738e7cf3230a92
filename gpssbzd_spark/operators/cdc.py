"""Upsert merge and snapshot diff — the mutation surface of a
batch-immutable engine (extension).

The reference's pipelines are read-only over a day of data; a
production deployment also has to APPLY changes: merge a late-arriving
correction batch into the table (upsert), and derive what changed
between two snapshots (CDC — the feed that keeps downstream marts and
caches incremental instead of full-refresh).

Both are one full-outer-join shapes, no driver state:

- **upsert**: full outer join base↔updates on the key; update rows
  take the updates side, unmatched base rows pass through, unmatched
  update rows are inserts. On a lakehouse this is MERGE INTO's
  copy-on-write plan; expressed declaratively Catalyst broadcasts the
  updates side when it is small (the common case: a correction batch
  against a 100 TB base), so the base is never shuffled — only
  rewritten files' partitions are touched when paired with partition
  pruning on the write.
- **snapshot diff**: full outer join old↔new; null-side tells
  insert/delete, value comparison (null-safe) tells update vs
  unchanged. Emitting only changed rows keeps the output proportional
  to churn, not table size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
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
    — can never regress a key to an older row. Without it the update
    side wins unconditionally (arrival order)."""
    cols = base.columns
    assert updates.columns == cols, "merge_upsert requires identical schemas"
    u = updates.select([F.col(c).alias(f"_u_{c}") for c in cols])
    cond = [F.col(k) == F.col(f"_u_{k}") for k in keys]
    joined = base.join(u, cond, "full_outer")
    # the update side's key columns are non-null iff it exists for the
    # joined row (definition of the join condition)
    u_exists = F.col(f"_u_{keys[0]}").isNotNull()
    if order_col is not None:
        u_wins = u_exists & (
            F.col(keys[0]).isNull()
            | (F.col(f"_u_{order_col}") >= F.col(order_col))
        )
    else:
        u_wins = u_exists
    picked = [
        F.when(u_wins, F.col(f"_u_{c}")).otherwise(F.col(c)).alias(c)
        for c in cols
    ]
    return joined.select(*picked)


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
