"""Ordered-funnel analysis over an event stream.

The classic product-analytics question — "of the users who did step 1,
how many went on to do step 2 AFTER it, then step 3 after that?" — is
an ordered-sequence match, not a set intersection: a purchase BEFORE
the click must not count. The reference has no funnel surface (its
events are GPS pings); this is §2.11-style extension machinery built
from the same groupBy/join primitives (SURVEY §2.3 J3 / §2.4 A1).

Semantics (the standard strict-order funnel, per user):

- ``t1`` = earliest event of step-1 type;
- ``t_k`` (k>1) = earliest event of step-k type strictly AFTER
  ``t_{k-1}``;
- optional ``within`` seconds: ``t_k`` must also satisfy
  ``t_k - t1 <= within`` (conversion window anchored at step 1);
- ``steps_completed`` = largest k with ``t_k`` non-null. A user with
  no step-1 event does not appear.

Scale shape: events are filtered to the funnel's event types before
anything else (predicate reaches the scan), then every step is a
per-user windowed conditional min over ONE hash partitioning:
``t_k = min(ts where type=step_k and ts > t_{k-1}) over (partition by
user)``. Step k's condition references step k-1's column, so the
steps are successive Window operators over the SAME partitioning —
one scan, one exchange, no sorts (unbounded frames), and the final
per-user collapse reuses the partitioning. The obvious alternative
(per-step min-aggregate joined to the previous step's per-user
table) replays the scan per consumer of each intermediate — measured
7 scans of the events for a 3-step funnel. Nothing collects, nothing
is quadratic, no Python boundary.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_times(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: float | None = None,
) -> DataFrame:
    """Per-user funnel timestamps: (user, t1..tk, steps_completed).

    ``steps`` are event-type values in funnel order (duplicates
    allowed: ['view','view'] means a second view after the first).
    """
    assert len(steps) >= 1, "funnel needs at least one step"
    ev = events.select(
        F.col(user_col).alias("_user"),
        F.col(ts_col).alias("_ts"),
        F.col(type_col).alias("_type"),
    ).filter(F.col("_type").isin(list(steps)))

    w = Window.partitionBy("_user")
    cur = ev.withColumn(
        "t1", F.min(F.when(F.col("_type") == steps[0], F.col("_ts"))).over(w)
    )
    for k in range(2, len(steps) + 1):
        cond = (F.col("_type") == steps[k - 1]) & (
            F.col("_ts") > F.col(f"t{k - 1}")
        )
        if within is not None:
            cond = cond & (
                F.col("_ts").cast("double") - F.col("t1").cast("double")
                <= float(within)
            )
        # t_{k-1} must already be a materialized column (windows cannot
        # nest), hence the sequential withColumn chain — each one is a
        # Window operator over the SAME user partitioning
        cur = cur.withColumn(f"t{k}", F.min(F.when(cond, F.col("_ts"))).over(w))

    tcols = [f"t{k}" for k in range(1, len(steps) + 1)]
    per_user = (
        cur.groupBy("_user")
        .agg(*[F.max(c).alias(c) for c in tcols])  # constant within user
        .filter(F.col("t1").isNotNull())
    )
    completed = F.lit(1)
    for k in range(2, len(steps) + 1):
        completed = F.when(F.col(f"t{k}").isNotNull(), k).otherwise(completed)
    return per_user.withColumn("steps_completed", completed).withColumnRenamed(
        "_user", user_col
    )


def retention_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention: users grouped by the period of their FIRST
    event, tracked across subsequent periods of activity — the other
    standard product-analytics rollup next to :func:`funnel_counts`.

    Returns one row per (cohort, age) that had any activity:
    ``cohort`` (first-activity period start, date), ``age`` (whole
    periods since the cohort period), ``n_active`` (distinct users of
    that cohort active at that age), ``retention`` (n_active /
    cohort size, 4 dp). age=0 always exists and has retention 1.0.

    ``period`` is 'day' or 'week' (date_trunc granularity; weeks start
    Monday in both Spark and DuckDB, so the oracle agrees). Null
    timestamps are not activity and null users are not users — both are
    filtered before everything (a null user could otherwise enter
    cohort sizes via groupBy's null-key group yet never match the
    activity×cohort equi-join, deflating that cohort's retention and
    breaking the age=0 retention==1.0 invariant).

    Scale shape: one groupBy(user) for first-activity, one
    (user, period) distinct — both keyed on user so the exchange is
    shared — then the activity×cohort join on user co-partitions with
    them, and the final (cohort, age) count is a narrow rollup over
    one row per user-period. Cohort sizes ride the same first-activity
    table (no extra scan) and broadcast onto the matrix.
    """
    assert period in ("day", "week"), period
    ev = events.filter(
        F.col(ts_col).isNotNull() & F.col(user_col).isNotNull()
    ).select(
        F.col(user_col).alias("_user"),
        F.date_trunc(period, F.col(ts_col)).cast("date").alias("_period"),
    )
    firsts = ev.groupBy("_user").agg(F.min("_period").alias("cohort"))
    activity = ev.distinct()
    days_per = 7 if period == "week" else 1
    matrix = (
        activity.join(firsts, "_user")
        .select(
            "cohort",
            # explicit FLOOR on both engines: DuckDB's double->INT cast
            # ROUNDS while Spark's truncates, so a bare /7 cast would
            # disagree on non-multiple-of-7 day gaps
            F.floor(F.datediff(F.col("_period"), F.col("cohort")) / days_per)
            .cast("int")
            .alias("age"),
        )
        .groupBy("cohort", "age")
        .agg(F.count("*").cast("long").alias("n_active"))
    )
    sizes = firsts.groupBy("cohort").agg(
        F.count("*").cast("long").alias("_cohort_size")
    )
    return (
        matrix.join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "age",
            "n_active",
            F.round(
                F.col("n_active").cast("double") / F.col("_cohort_size"), 4
            ).alias("retention"),
        )
    )


def retention_matrix_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> str:
    """DuckDB twin of :func:`retention_matrix` (same trunc, same whole-
    period age arithmetic, same rounding)."""
    days_per = 7 if period == "week" else 1
    return f"""
    WITH ev AS (
      SELECT {user_col} AS u, CAST(date_trunc('{period}', {ts_col}) AS DATE) AS p
      FROM {table} WHERE {ts_col} IS NOT NULL AND {user_col} IS NOT NULL
    ), firsts AS (
      SELECT u, MIN(p) AS cohort FROM ev GROUP BY u
    ), activity AS (
      SELECT DISTINCT u, p FROM ev
    ), matrix AS (
      SELECT cohort,
             CAST(FLOOR(date_diff('day', cohort, p) / {days_per}.0) AS INT)
               AS age,
             CAST(COUNT(*) AS BIGINT) AS n_active
      FROM activity JOIN firsts USING (u)
      GROUP BY cohort, age
    ), sizes AS (
      SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_size
      FROM firsts GROUP BY cohort
    )
    SELECT cohort, age, n_active,
           ROUND(CAST(n_active AS DOUBLE) / cohort_size, 4) AS retention
    FROM matrix JOIN sizes USING (cohort)
    """


def transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order event-transition counts: for every consecutive
    (event, next event) pair within a user's timeline, how often does
    type A lead to type B — the Markov-chain view of user paths that
    complements the funnel (which fixes the path) and retention (which
    ignores it). ``prob`` is row-normalized per source type.

    One lead() window per user (same exchange shape as sessionization)
    then a narrow (from, to) count; ``tiebreak_col`` makes the
    ordering — hence the counts — deterministic under equal
    timestamps. A user's last event has no successor and drops out."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    pairs = (
        events.filter(F.col(ts_col).isNotNull())
        .withColumn("_next", F.lead(type_col).over(w))
        .filter(F.col("_next").isNotNull())
        .groupBy(F.col(type_col).alias("from_type"), F.col("_next").alias("to_type"))
        .agg(F.count("*").alias("n_transitions"))
    )
    per_src = Window.partitionBy("from_type")
    raw = F.col("n_transitions").cast("double") / F.sum("n_transitions").over(
        per_src
    )
    # floor-scale, not round(x, 4): count ratios are exact rationals
    # that regularly land on decimal ties (1/32 = .03125) where engine
    # rounding rules disagree; floor of the identical double cannot
    return pairs.select(
        "from_type",
        "to_type",
        "n_transitions",
        (F.floor(raw * 10000 + 0.5) / 10000.0).alias("prob"),
    )


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: float | None = None,
) -> DataFrame:
    """Funnel summary: one row per step with the number of users whose
    furthest step is >= it, plus the conversion rate from step 1.
    The per-user table collapses to len(steps) rows via a conditional
    count — no second scan of the events."""
    times = funnel_times(events, steps, user_col, ts_col, type_col, within)
    aggs = [
        F.count(F.when(F.col("steps_completed") >= k, True)).alias(f"_n{k}")
        for k in range(1, len(steps) + 1)
    ]
    wide = times.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(k).alias("step"),
                F.lit(steps[k - 1]).alias("event_type"),
                F.col(f"_n{k}").alias("n_users"),
                F.round(
                    F.col(f"_n{k}").cast("double")
                    / F.nullif(F.col("_n1"), F.lit(0)).cast("double"),
                    4,
                ).alias("conversion"),
            )
            for k in range(1, len(steps) + 1)
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select(
        "r.step", "r.event_type", "r.n_users", "r.conversion"
    )
