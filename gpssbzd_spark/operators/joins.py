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
from pyspark.sql import types as T
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

    NULL semantics (DuckDB ASOF parity):

    - the whole right payload is filled as ONE struct — a matched right
      row whose payload is NULL still attaches (the struct wrapper is
      non-null for every right row), instead of ``last(ignorenulls)``
      per column skipping it and stitching stale values from OLDER
      right rows (with multiple value_cols, even from different rows);
    - rows with a NULL key or NULL timestamp never match: they bypass
      the window entirely (left rows come back with NULL ``asof_*``;
      right rows are dropped), matching equality-join semantics instead
      of the window's NULL-groups-together partitioning.
    """
    return _asof_join(left, right, on, time_col, value_cols, direction="backward")


def _asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    time_col: str,
    value_cols: Sequence[str],
    direction: str,
) -> DataFrame:
    backward = direction == "backward"
    passthrough = [c for c in left.columns if c not in (on, time_col)]
    rtypes = {f.name: f.dataType for f in right.schema}
    payload_type = T.StructType(
        [T.StructField(c, rtypes[c]) for c in value_cols]
    )

    # NULL key/time rows can never match under join semantics; route
    # them around the window (they'd otherwise pair NULL with NULL, and
    # a NULL-ts left row would sort to an end and grab a fill)
    matchable = F.col(on).isNotNull() & F.col(time_col).isNotNull()
    r = right.filter(matchable)
    l_good = left.filter(matchable)
    l_bypass = left.filter(~matchable).select(
        F.col(on),
        F.col(time_col),
        *[F.col(c) for c in passthrough],
        *[F.lit(None).cast(rtypes[c]).alias(f"asof_{c}") for c in value_cols],
    )

    # right rows sort adjacent to left rows at equal t on the fill side
    r_tag, l_tag = (0, 1) if backward else (1, 0)
    tagged_r = r.select(
        F.col(on),
        F.col(time_col),
        F.lit(r_tag).alias("_side"),
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("_r"),
        *[F.lit(None).alias(f"_l_{c}") for c in passthrough],
    )
    tagged_l = l_good.select(
        F.col(on),
        F.col(time_col),
        F.lit(l_tag).alias("_side"),
        F.lit(None).cast(payload_type).alias("_r"),
        *[F.col(c).alias(f"_l_{c}") for c in passthrough],
    )
    # duplicate right (key, t) tie-break via the window order: backward
    # `last` must land on the payload-greatest row (NULL fields first so
    # real values win); forward `first` on the payload-least (NULL
    # fields last, or a NULL field would beat every real value)
    if backward:
        order_payload = [F.col("_r").getField(c).asc_nulls_first() for c in value_cols]
        w = Window.partitionBy(on).orderBy(
            time_col, "_side", *order_payload
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        fill = F.last("_r", ignorenulls=True).over(w)
    else:
        order_payload = [F.col("_r").getField(c).asc_nulls_last() for c in value_cols]
        w = Window.partitionBy(on).orderBy(
            time_col, "_side", *order_payload
        ).rowsBetween(Window.currentRow, Window.unboundedFollowing)
        fill = F.first("_r", ignorenulls=True).over(w)
    filled = (
        tagged_r.unionByName(tagged_l)
        .select(
            F.col(on),
            F.col(time_col),
            F.col("_side"),
            *[F.col(f"_l_{c}").alias(c) for c in passthrough],
            fill.alias("_rf"),
        )
        .filter(F.col("_side") == l_tag)
        .select(
            F.col(on),
            F.col(time_col),
            *[F.col(c) for c in passthrough],
            *[F.col("_rf").getField(c).alias(f"asof_{c}") for c in value_cols],
        )
    )
    return filled.unionByName(l_bypass)


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
    order — still one shuffle, no join node. Same NULL semantics as the
    backward variant (struct-atomic payload, NULL key/time bypass).
    """
    return _asof_join(left, right, on, time_col, value_cols, direction="forward")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_bounds: tuple[str, str],
    right_bounds: tuple[str, str],
    bucket_secs: int,
    suffix: str = "_r",
) -> DataFrame:
    """Interval×interval overlap join per key: one output row for every
    (left, right) pair sharing a key whose time intervals intersect
    (``ls <= re AND rs <= le`` — closed bounds). The temporal-join
    shape :func:`range_join_broadcast` (point-in-interval, tiny dim)
    does not cover: BOTH sides are fact-sized interval sets
    (session×session concurrency, downtime×incident attribution,
    shift×event rostering).

    Scale shape — the bin-bucketing pattern, not a theta join: each
    interval explodes into its covered ``bucket_secs`` buckets, the
    sides equi-join on (keys…, bucket) — a plain shuffled hash join —
    and a pair that shares several buckets is kept once via the
    OVERLAP-DEFINING bucket (the bucket of the later start:
    ``bucket(greatest(ls, rs))`` is always covered by both intervals,
    so exactly one of the shared buckets emits the pair — no
    ``distinct`` re-shuffle pass at all). A naive theta join is a
    per-key cross product; this plan's cost is
    O(intervals · buckets-per-interval + true pairs). Size
    ``bucket_secs`` near the typical interval length: too small
    explodes many buckets per interval, too large piles unrelated
    intervals into one bucket (degenerating toward per-key
    cross-product within the bucket).

    Right-side columns keep their names unless they collide, which
    takes ``suffix``. Open intervals / NULL bounds drop (an unbounded
    interval has no bucket cover — clamp upstream if needed).
    """
    keys = list(keys)
    ls, le = left_bounds
    rs, re_ = right_bounds

    def buckets(s: str, e: str):
        return F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(s)) / bucket_secs),
                F.floor(F.unix_timestamp(F.col(e)) / bucket_secs),
            )
        )

    l_ex = (
        left.filter(F.col(ls).isNotNull() & F.col(le).isNotNull())
        .filter(F.col(ls) <= F.col(le))
        .withColumn("_bkt", buckets(ls, le))
    )
    rcols = {
        c: (c + suffix if c in left.columns and c not in keys else c)
        for c in right.columns
    }
    r = right.select(
        *[F.col(c).alias(a) for c, a in rcols.items()]
    )
    rs2, re2 = rcols[rs], rcols[re_]
    r_ex = (
        r.filter(F.col(rs2).isNotNull() & F.col(re2).isNotNull())
        .filter(F.col(rs2) <= F.col(re2))
        .withColumn("_bkt", buckets(rs2, re2))
    )
    later_start = F.greatest(F.col(ls), F.col(rs2))
    emit_bucket = F.floor(F.unix_timestamp(later_start) / bucket_secs)
    return (
        l_ex.join(r_ex, keys + ["_bkt"])
        .filter((F.col(ls) <= F.col(re2)) & (F.col(rs2) <= F.col(le)))
        .filter(F.col("_bkt") == emit_bucket)
        .drop("_bkt")
    )
