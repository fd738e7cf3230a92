"""Window-function corpus (SURVEY.md §2.5) over orders/events.

Every window here carries a unique tie-break key in its ORDER BY —
without one, lag/lead/row_number are nondeterministic across engines and
the value-hash cannot match.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from gpssbzd_spark.corpus import query
from gpssbzd_spark.operators.windows import (
    backward_fill,
    forward_fill,
    segment_id,
    top_k_per_group,
    with_prev_next,
)
from gpssbzd_spark.sources.tables import load_table


@query(
    "w1_lag_lead",
    oracle="""
    SELECT o_orderkey,
           ROUND(lag(o_totalprice, 1) OVER w, 2) AS prev_o_totalprice,
           ROUND(lead(o_totalprice, 1) OVER w, 2) AS next_o_totalprice
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    note="W1: lag/lead prev/next state per partition (PPE:161-166, SBZ:79-81)",
)
def w1_lag_lead(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    out = with_prev_next(
        o,
        cols=["o_totalprice"],
        partition_by=["o_custkey"],
        order_by=["o_orderdate", "o_orderkey"],
    )
    return out.select(
        "o_orderkey",
        F.round("prev_o_totalprice", 2).alias("prev_o_totalprice"),
        F.round("next_o_totalprice", 2).alias("next_o_totalprice"),
    )


@query(
    "w2_running_sum",
    oracle="""
    SELECT o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
    FROM orders
    """,
    note="W2/W6: running sum with explicit row frame (SPE:128-129 patternID)",
)
def w2_running_sum(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey", F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend")
    )


@query(
    "w3_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 2
    """,
    note="W3/O2: top-k per group via row_number (SBZ:105-109 max-speed point)",
)
def w3_topk_per_group(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    top = top_k_per_group(
        o,
        partition_by=["o_custkey"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=2,
    )
    return top.select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))


@query(
    "w4_forward_fill",
    oracle="""
    SELECT event_id,
           ROUND(last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS value_ffill
    FROM (SELECT event_id, user_id, CASE WHEN value >= 5.0 THEN value END AS v
          FROM events)
    """,
    note="W4: forward fill = last(ignorenulls) over unboundedPreceding..current "
    "(PPE:117-122 filled_direction)",
    tier=2,
)
def w4_forward_fill(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    v = F.when(F.col("value") >= 5.0, F.col("value"))
    filled = forward_fill(v, partition_by=["user_id"], order_by=["event_id"])
    return ev.select("event_id", F.round(filled, 2).alias("value_ffill"))


@query(
    "w5_backward_fill",
    oracle="""
    SELECT event_id,
           ROUND(first_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 2) AS next_big
    FROM (SELECT event_id, user_id, CASE WHEN value >= 5.0 THEN value END AS v
          FROM events)
    """,
    note="W5: strict next-non-null = first(ignorenulls) over 1..following "
    "(PPE:217-228 pattern bound fill)",
    tier=2,
)
def w5_backward_fill(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    v = F.when(F.col("value") >= 5.0, F.col("value"))
    nxt = backward_fill(v, partition_by=["user_id"], order_by=["event_id"], skip_current=True)
    return ev.select("event_id", F.round(nxt, 2).alias("next_big"))


@query(
    "w45_bidirectional_fill",
    oracle="""
    SELECT event_id,
           ROUND(last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS value_ffill,
           ROUND(first_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 2) AS next_big
    FROM (SELECT event_id, user_id, CASE WHEN value >= 5.0 THEN value END AS v
          FROM events)
    """,
    note="W4+W5 merged driver row: forward fill (last ignorenulls, "
    "unboundedPreceding..current) and strict backward fill (first "
    "ignorenulls, 1..unboundedFollowing) over one pass — both fills share "
    "the (user_id × event_id) sort so Catalyst plans a single Window "
    "node (frees a driver-window slot; the single-direction originals "
    "remain tier-2/pytest)",
)
def w45_bidirectional_fill(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    v = F.when(F.col("value") >= 5.0, F.col("value"))
    filled = forward_fill(v, partition_by=["user_id"], order_by=["event_id"])
    nxt = backward_fill(v, partition_by=["user_id"], order_by=["event_id"], skip_current=True)
    return ev.select(
        "event_id",
        F.round(filled, 2).alias("value_ffill"),
        F.round(nxt, 2).alias("next_big"),
    )


@query(
    "w6_ranking_set",
    oracle="""
    SELECT o_orderkey,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER w AS quartile,
           ROUND(percent_rank() OVER w, 6) AS pct_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
    """,
    note="ranking set beyond the reference's row_number (SURVEY §2.5 'absent')",
)
def w6_ranking_set(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


@query(
    "w7_sessionize_gap",
    oracle="""
    SELECT event_id,
           CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1 AS BIGINT)
             AS session_id
    FROM (
      SELECT event_id, user_id, ts,
             CASE WHEN date_diff('second',
                    lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                    ts) > 1800
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    )
    """,
    note="W1+W2 composed: gap-threshold sessionization — the exact shape of "
    "the reference's pattern segmentation (SPE:128-129, 170-172): lag gap → "
    "start flag → running sum = segment id",
)
def w7_sessionize_gap(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts", 1).over(w))
    flagged = ev.withColumn("is_new", F.when(gap > 1800, 1).otherwise(0))
    sid = segment_id(
        F.col("is_new"), partition_by=["user_id"], order_by=[F.col("ts"), F.col("event_id")]
    )
    return flagged.select("event_id", sid.cast("long").alias("session_id"))


@query(
    "w8_range_frame_trailing",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT)
             AS order_day,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate)
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2)
             AS trailing_30d_spend
    FROM orders
    """,
    note="W8 (extension): RANGE frame — trailing-30-day spend per "
    "customer. SURVEY §2.5 lists range frames absent from the "
    "reference; exposed because value-based frames are the natural "
    "form of time-decayed rollups. The frame includes ALL peers of "
    "the current order-day, so the result is deterministic without a "
    "tie-break key (unlike ROWS frames).",
)
def w8_range_frame_trailing(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    day = F.datediff("o_orderdate", F.lit("1970-01-01").cast("date")).cast("bigint")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("order_day"))
        .rangeBetween(-30, Window.currentRow)
    )
    return o.withColumn("order_day", day).select(
        "o_orderkey",
        "o_custkey",
        "order_day",
        F.round(F.sum("o_totalprice").over(w), 2).alias("trailing_30d_spend"),
    )
