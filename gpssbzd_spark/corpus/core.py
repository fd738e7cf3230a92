"""Relational core: scans, filters, joins, aggregates, set ops, scalar fns.

Each query name is prefixed by the SURVEY.md §2 operator id it exercises.
All float outputs are rounded (both sides) so the driver's value-hash is
stable across Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gpssbzd_spark.corpus import query
from gpssbzd_spark.functions.geo import haversine_m, haversine_sql, register_sql_fns
from gpssbzd_spark.operators.aggregates import any_flag, group_all_subgroups
from gpssbzd_spark.operators.joins import (
    anti_join_keys,
    asof_join_backward,
    asof_join_forward,
    pair_join,
    range_join_broadcast,
    semi_join_keys,
)
from gpssbzd_spark.sources.tables import load_table, local_rows


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# §2.1/2.2 scans, projections, filters
# --------------------------------------------------------------------------


@query(
    "p1_scan_project_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 2) AS price,
           CAST(floor(l_quantity) AS INTEGER) AS qty_int,
           CAST(l_orderkey AS VARCHAR) AS key_str
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1995-06-01 00:00:00'
    """,
    note="P1/P4/P12: projection + pushdown filter reach the parquet scan; "
    "numeric/string casts ride the same projection (P12 — the reference "
    "casts stringly CSV on use)",
)
def p1_scan_project_filter(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") < F.lit("1995-06-01 00:00:00").cast("timestamp"))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 2).alias("price"),
            F.col("l_quantity").cast("int").alias("qty_int"),
            F.col("l_orderkey").cast("string").alias("key_str"),
        )
    )


@query(
    "p5_filter_in_list",
    oracle="""
    SELECT o_orderkey, o_orderpriority
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
    note="P5: IN-list filter (reference: broadcast isin, PPE:47-50)",
)
def p5_filter_in_list(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority")
    )


@query(
    "p7_filter_compound_bool",
    oracle="""
    SELECT l_orderkey, l_linenumber
    FROM lineitem
    WHERE (l_returnflag = 'R' AND l_quantity > 45)
       OR (l_linestatus = 'O' AND l_discount < 0.02)
       OR (l_tax IS NULL)
    """,
    note="P7/P13: 3-way OR with null-safe branch (SPE:157-161)",
    tier=2,
)
def p7_filter_compound_bool(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    cond = (
        ((F.col("l_returnflag") == "R") & (F.col("l_quantity") > 45))
        | ((F.col("l_linestatus") == "O") & (F.col("l_discount") < 0.02))
        | F.col("l_tax").isNull()
    )
    return li.filter(cond).select("l_orderkey", "l_linenumber")


@query(
    "p8_sql_string_filter",
    oracle="""
    SELECT o_orderkey, o_orderstatus
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 100000
    """,
    note="P8: SQL-string predicate path (SPE:117 filter(\"cond1 = 1 AND ...\"))",
    tier=2,
)
def p8_sql_string_filter(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .filter("o_orderstatus = 'F' AND o_totalprice > 100000")
        .select("o_orderkey", "o_orderstatus")
    )


@query(
    "p10_distinct_projection",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    note="P9/P10: distinct over a column subset (PPE:81 dropDuplicates)",
    tier=2,
)
def p10_distinct_projection(spark, sf_dir):
    return _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "p9_dedup_keep_first",
    oracle="""
    SELECT c_nationkey, c_mktsegment, MIN(c_custkey) AS first_custkey
    FROM customer GROUP BY c_nationkey, c_mktsegment
    """,
    note="P9: deterministic dedup-on-subset — keep lowest key per dup group "
    "(dropDuplicates keeps an arbitrary row; ours pins the survivor)",
)
def p9_dedup_keep_first(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.min("c_custkey").alias("first_custkey")
    )


@query(
    "p7_filter_distinct",
    oracle="""
    WITH seeded AS (
      SELECT l_returnflag, l_linestatus, l_quantity, l_extendedprice,
             l_discount, l_tax
      FROM lineitem
      UNION ALL
      SELECT l_returnflag, l_linestatus, l_quantity, l_extendedprice,
             l_discount, NULL
      FROM lineitem WHERE l_orderkey % 101 = 0
    )
    SELECT DISTINCT l_returnflag, l_linestatus,
           CAST(floor(l_quantity) AS INTEGER) AS qty
    FROM seeded
    WHERE ((l_returnflag = 'R' AND l_quantity > 45)
           OR (l_linestatus = 'O' AND l_discount < 0.02)
           OR (l_tax IS NULL))
      AND l_extendedprice > 5000 AND l_discount <= 0.08
    """,
    note="P7+P8+P10 merged (driver-window diagnostic): native compound "
    "boolean filter (3-way OR with null-safe branch, SPE:157-161) chained "
    "with a SQL-string predicate (SPE:117) and a distinct projection over "
    "a column subset (PPE:81) — Catalyst folds both filters into one "
    "pushed-down conjunction. The fixture has no NULL l_tax, so the "
    "IS NULL branch is exercised via deterministically seeded rows; the "
    "oracle floors the qty cast (DuckDB int-cast rounds, Spark's "
    "truncates)",
)
def p7_filter_distinct(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
    )
    seeded = li.unionByName(
        li.filter(F.col("l_orderkey") % 101 == 0).withColumn(
            "l_tax", F.lit(None).cast("double")
        )
    )
    cond = (
        ((F.col("l_returnflag") == "R") & (F.col("l_quantity") > 45))
        | ((F.col("l_linestatus") == "O") & (F.col("l_discount") < 0.02))
        | F.col("l_tax").isNull()
    )
    return (
        seeded.filter(cond)
        .filter("l_extendedprice > 5000 AND l_discount <= 0.08")
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("l_quantity").cast("int").alias("qty"),
        )
        .distinct()
    )


@query(
    "p13_null_handling",
    oracle="""
    WITH seeded AS (
      SELECT event_id, value FROM events
      UNION ALL
      SELECT event_id + 10000000, NULL FROM events WHERE event_id % 7 = 0
      UNION ALL
      SELECT event_id + 20000000, 0.0 FROM events WHERE event_id % 11 = 0
    )
    SELECT event_id,
           ROUND(COALESCE(NULLIF(value, 0.0), -1.0), 2) AS value_filled,
           (value IS NULL OR value = 0.0) AS was_nullish
    FROM seeded
    """,
    note="P13/P14: nullif/coalesce/literal null handling. The fixture's "
    "value column carries no NULLs or zeros, which made the NULL paths "
    "vacuously green — the query seeds NULL and 0.0 rows via a "
    "deterministic self-union so every branch is exercised on both "
    "engines",
)
def p13_null_handling(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select("event_id", "value")
    seeded = ev.unionByName(
        ev.filter(F.col("event_id") % 7 == 0).select(
            (F.col("event_id") + 10_000_000).alias("event_id"),
            F.lit(None).cast("double").alias("value"),
        )
    ).unionByName(
        ev.filter(F.col("event_id") % 11 == 0).select(
            (F.col("event_id") + 20_000_000).alias("event_id"),
            F.lit(0.0).alias("value"),
        )
    )
    nullish = F.nullif(F.col("value"), F.lit(0.0))
    return seeded.select(
        "event_id",
        F.round(F.coalesce(nullish, F.lit(-1.0)), 2).alias("value_filled"),
        (F.col("value").isNull() | (F.col("value") == 0.0)).alias("was_nullish"),
    )


@query(
    "p12_cast_types",
    oracle="""
    SELECT l_orderkey,
           CAST(floor(l_quantity) AS INTEGER) AS qty_int,
           CAST(l_orderkey AS VARCHAR) AS key_str,
           CAST(ROUND(l_extendedprice, 0) AS BIGINT) AS price_long
    FROM lineitem
    """,
    note="P12: numeric/string casts (reference casts stringly CSV on use). "
    "Oracle floors before the int cast: DuckDB CAST(double AS INTEGER) "
    "rounds-to-nearest while Spark's truncates — whole-valued fixture "
    "quantities masked the divergence",
    tier=2,
)
def p12_cast_types(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.round("l_extendedprice", 0).cast("long").alias("price_long"),
    )


# --------------------------------------------------------------------------
# §2.3 joins
# --------------------------------------------------------------------------


@query(
    "j1_join_inner",
    oracle="""
    SELECT o.o_orderkey, c.c_name, ROUND(o.o_totalprice, 2) AS totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    """,
    note="J1: inner equi-join, dim filter pushed below the join",
)
def j1_join_inner(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_name", F.round("o_totalprice", 2).alias("totalprice")
    )


@query(
    "j2_join_left_broadcast_dim",
    oracle="""
    SELECT c.c_custkey, n.n_name, r.r_name
    FROM customer c
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    note="J2: left join chain onto small dims — explicit broadcast hints "
    "(reference joins bus_line without one, PPE:101-115)",
)
def j2_join_left_broadcast_dim(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .select("c_custkey", "n_name", "r_name")
    )


@query(
    "j3_join_left_attach_agg",
    oracle="""
    SELECT o.o_orderkey, COALESCE(s.n_items, 0) AS n_items
    FROM orders o
    LEFT JOIN (
      SELECT l_orderkey, COUNT(*) AS n_items FROM lineitem GROUP BY l_orderkey
    ) s ON o.o_orderkey = s.l_orderkey
    """,
    note="J3: left join computed labels back onto rows (PTC:326)",
)
def j3_join_left_attach_agg(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_orderkey").agg(F.count("*").alias("n_items"))
    return (
        o.join(counts, o.o_orderkey == counts.l_orderkey, "left")
        .select("o_orderkey", F.coalesce("n_items", F.lit(0)).alias("n_items"))
    )


@query(
    "j4_self_theta_pair_join",
    oracle="""
    SELECT a.s_nationkey AS nationkey,
           a.s_suppkey AS s_suppkey_1, b.s_suppkey AS s_suppkey_2,
           ROUND(ABS(a.s_acctbal - b.s_acctbal), 2) AS bal_gap
    FROM supplier a JOIN supplier b
      ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
    """,
    note="J4: self theta-join pair generator (equi + '<' residual) — the "
    "trajectory-pair shape, PTC:232-245",
)
def j4_self_theta_pair_join(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier").withColumnRenamed("s_nationkey", "nationkey")
    pairs = pair_join(s, "nationkey", "s_suppkey", payload=["s_acctbal"])
    return pairs.select(
        "nationkey",
        "s_suppkey_1",
        "s_suppkey_2",
        F.round(F.abs(F.col("s_acctbal_1") - F.col("s_acctbal_2")), 2).alias("bal_gap"),
    )


@query(
    "j5_semi_join",
    oracle="""
    SELECT l_orderkey, l_linenumber FROM lineitem
    WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 200000)
    """,
    note="J5: left_semi replaces the reference's collect+broadcast+isin "
    "driver round-trip (PPE:47-50) — stays distributed at 100 TB",
    tier=2,
)
def j5_semi_join(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    big = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 200000)
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    return semi_join_keys(li, big, on=["l_orderkey"]).select("l_orderkey", "l_linenumber")


@query(
    "j6_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
    """,
    note="left_anti (NOT EXISTS) — absent in reference, required surface; "
    "the subtracted side is filtered so the result is non-empty at every "
    "SF (the r01 all-customers variant anti-joined to zero rows, proving "
    "only that the plan compiled)",
    tier=2,
)
def j6_anti_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return anti_join_keys(c, o, on=["c_custkey"]).select("c_custkey", "c_name")


@query(
    "j5_semi_anti_join",
    oracle="""
    SELECT c_custkey, 'semi' AS side FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    UNION ALL
    SELECT c_custkey, 'anti' AS side FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
    """,
    note="J5+J6 merged (driver-window diagnostic): left_semi and left_anti "
    "against the same filtered key set, tag-unioned so both sides are "
    "provably non-empty and every customer lands on exactly one side. "
    "left_semi replaces the reference's collect+broadcast+isin round-trip "
    "(PPE:47-50); the threshold keeps the anti side non-vacuous at sf0.01. "
    "Oracle uses EXISTS/NOT EXISTS, the forms whose NULL-key semantics "
    "match left_semi/left_anti (NOT IN would return zero rows if the "
    "subtracted key column ever carried a NULL)",
)
def j5_semi_anti_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    keys = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    semi = semi_join_keys(c, keys, on=["c_custkey"]).select(
        "c_custkey", F.lit("semi").alias("side")
    )
    anti = anti_join_keys(c, keys, on=["c_custkey"]).select(
        "c_custkey", F.lit("anti").alias("side")
    )
    return semi.unionByName(anti)


@query(
    "j7_asof_join_backward",
    oracle="""
    WITH r AS (
      SELECT user_id, ts, MAX(value) AS value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT l.event_id, l.user_id, epoch_ms(l.ts) AS ts_ms,
           ROUND(r.value, 4) AS asof_value
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    note="J7 (extension): point-in-time join — latest purchase value "
    "at-or-before each click, per user; Spark side is the union+window "
    "forward-fill plan (one shuffle, no range explosion) vs DuckDB's "
    "native ASOF LEFT JOIN",
)
def j7_asof_join_backward(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join_backward(
        clicks, purchases, on="user_id", time_col="ts", value_cols=["value"]
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.round("asof_value", 4).alias("asof_value"),
    )


@query(
    "j7b_asof_join_forward",
    oracle="""
    WITH r AS (
      SELECT user_id, ts, MIN(value) AS value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT l.event_id, l.user_id, epoch_ms(l.ts) AS ts_ms,
           ROUND(r.value, 4) AS next_value
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts
    """,
    note="J7 forward variant: earliest purchase value at-or-after each "
    "click, per user — same union+window plan, fill direction reversed",
    tier=2,
)
def j7b_asof_join_forward(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join_forward(
        clicks, purchases, on="user_id", time_col="ts", value_cols=["value"]
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.round("asof_value", 4).alias("next_value"),
    )


@query(
    "j8_range_join_broadcast",
    oracle="""
    WITH tiers(tier, lo, hi) AS (
      VALUES ('low', 0.0, 100.0), ('mid', 100.0, 250.0),
             ('high', 250.0, 500.0)
    )
    SELECT t.tier, e.event_type,
           COUNT(*) AS n_events,
           ROUND(AVG(e.value), 4) AS avg_value
    FROM events e JOIN tiers t ON e.value >= t.lo AND e.value < t.hi
    GROUP BY t.tier, e.event_type
    """,
    note="J8 (extension): interval-containment join against a tiny tier "
    "dimension — explicit broadcast nested-loop (the only non-exploding "
    "physical strategy for a pure theta predicate; at 100 TB the facts "
    "side streams past the broadcast intervals)",
)
def j8_range_join_broadcast(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    tiers = local_rows(
        spark,
        [("low", 0.0, 100.0), ("mid", 100.0, 250.0), ("high", 250.0, 500.0)],
        "tier string, lo double, hi double",
    )
    joined = range_join_broadcast(ev, tiers, value_col="value")
    return joined.groupBy("tier", "event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '1998-01-01'
      AND l.l_shipdate > DATE '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey ASC
    LIMIT 10
    """,
    note="TPC-H Q3 shape (shipping priority): a 3-way star join with "
    "per-table filters pushed below the joins, revenue rollup, global "
    "top-10 (TakeOrderedAndProject, no full sort). Catalyst broadcasts "
    "the filtered customer/orders sides under AQE; the fact side never "
    "shuffles twice. Deterministic under ties via the orderkey "
    "tiebreak. Fully oracled.",
    tier=2,
)
def q3_shipping_priority(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("date")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("date")
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1998-01-01'
    GROUP BY n.n_name
    """,
    note="TPC-H Q5 shape (local supplier volume): the 6-table join "
    "graph — region→nation→supplier chained onto "
    "customer→orders→lineitem with the 'local' c_nationkey = "
    "s_nationkey residual — revenue per nation. The dims broadcast "
    "down the chain; the two fact joins shuffle once each on their "
    "keys. Fully oracled.",
    tier=2,
)
def q5_local_supplier_volume(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 180
    )
    SELECT c.c_name, o.o_orderkey,
           ROUND(o.o_totalprice, 2) AS o_totalprice,
           CAST(SUM(l.l_quantity) AS BIGINT) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
    ORDER BY total_qty DESC, o.o_orderkey ASC
    LIMIT 20
    """,
    note="TPC-H Q18 shape (large-volume customers): a HAVING-filtered "
    "aggregate feeding a SEMI JOIN back onto the join graph — the "
    "qualify-then-enrich composition (aggregate once, qualify keys, "
    "never re-aggregate on the enrich side). The reference's "
    "collect+isin tactic for exactly this shape is replaced by the "
    "broadcastable left-semi join (SURVEY §2.3 J5). Deterministic "
    "top-20 via the orderkey tiebreak. Fully oracled.",
    tier=2,
)
def q18_large_volume_customers(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 180)
        .select("l_orderkey")
    )
    return (
        o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
        .agg(F.sum("l_quantity").cast("long").alias("total_qty"))
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


@query(
    "q4_order_priority_checking",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    """,
    note="TPC-H Q4 shape (order priority checking): correlated EXISTS "
    "under aggregation — orders in a quarter having at least one "
    "lineitem shipped >60 days after the order date, counted per "
    "priority. The EXISTS is a LEFT SEMI join on the order key with "
    "the shipdate>orderdate+60d residual evaluated inside the hash "
    "join (one probe per lineitem, each order emitted at most once — "
    "no distinct, no subquery re-scan); the date-range filter pushes "
    "to the orders scan. The synthetic lineitem has no "
    "commitdate/receiptdate, so lateness is shipdate vs order date — "
    "same shape, available columns. Fully oracled.",
    tier=2,
)
def q4_order_priority_checking(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("date"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


@query(
    "q21_suppliers_who_kept_waiting",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey AND n.n_nationkey < 13
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate
                                            + INTERVAL 60 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name ASC
    LIMIT 100
    """,
    note="TPC-H Q21 shape (suppliers who kept orders waiting): the "
    "EXISTS + NOT EXISTS anti-join chain — late lineitems on "
    "completed orders, kept when ANOTHER supplier shipped the same "
    "order (LEFT SEMI self-join on the order key, suppkey<>suppkey "
    "residual) and no OTHER supplier was late on it (LEFT ANTI on the "
    "late set, same key and residual). Both self-joins are keyed on "
    "the order key, so per-order fanout bounds the probe; the 'late' "
    "set is computed once and reused for the anti side, and the "
    "nation dim broadcasts. Lateness is shipdate vs orderdate+60d "
    "(the synthetic lineitem has no receipt/commit dates — same "
    "shape, available columns); deterministic top-100 via the s_name "
    "tiebreak. Fully oracled.",
    tier=2,
)
def q21_suppliers_who_kept_waiting(spark, sf_dir):
    o_f = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = (
        li.join(o_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(
        F.col("l_orderkey").alias("_k2"), F.col("l_suppkey").alias("_s2")
    )
    multi = late.join(
        others,
        (F.col("l_orderkey") == F.col("_k2"))
        & (F.col("l_suppkey") != F.col("_s2")),
        "left_semi",
    )
    late_others = late.select(
        F.col("l_orderkey").alias("_k3"), F.col("l_suppkey").alias("_s3")
    )
    sole = multi.join(
        late_others,
        (F.col("l_orderkey") == F.col("_k3"))
        & (F.col("l_suppkey") != F.col("_s3")),
        "left_anti",
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 13)
    return (
        sole.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c LEFT JOIN orders o
            ON c.c_custkey = o.o_custkey
           AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey) per_cust
    GROUP BY c_count
    """,
    note="TPC-H Q13 shape (customer distribution): LEFT OUTER join "
    "with the predicate INSIDE the join condition (a WHERE would "
    "silently drop the zero-order customers the query exists to "
    "count), then two-level aggregation — per-customer order count "
    "including zeros, re-aggregated into a count-of-counts histogram. "
    "COUNT(o_orderkey) counts the non-null probe side, so unmatched "
    "customers land in the c_count=0 bucket. The second agg's input "
    "is one row per customer — the re-shuffle is small by "
    "construction. Fully oracled.",
    tier=2,
)
def q13_customer_distribution(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH th AS (
      SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_thresh
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p.p_brand,
           ROUND(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT))
                 / 700.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN th ON th.l_partkey = l.l_partkey
    WHERE p.p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
      AND p.p_size <= 15
      AND l.l_quantity < th.qty_thresh
    GROUP BY p.p_brand
    """,
    note="TPC-H Q17 shape (small-quantity-order revenue): a "
    "CORRELATED SCALAR subquery per group — each lineitem compares "
    "its quantity against 0.2x the mean quantity of ITS part — "
    "decorrelated into a per-part aggregate joined back on the part "
    "key. The qualifying-part dim (brand+size filtered) BROADCASTS "
    "and semi-joins lineitem BEFORE the threshold agg, so the "
    "per-part averages are computed only over qualifying parts' "
    "lineitems (the correlation key makes the restriction lossless), "
    "not the whole fact table. Quantities are integer-valued, so the "
    "0.2x-mean threshold compare is exact across engines. Per-brand "
    "output; fully oracled.",
    tier=2,
)
def q17_small_quantity_revenue(spark, sf_dir):
    p = (
        _t(spark, sf_dir, "part")
        .filter(
            F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
            & (F.col("p_size") <= 15)
        )
        .select("p_partkey", "p_brand")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    li_q = li.join(
        F.broadcast(p.select(F.col("p_partkey").alias("l_partkey"))),
        "l_partkey",
        "left_semi",
    )
    th = li_q.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        li_q.join(th, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand")
        .agg(
            # exact integer cents (ADVICE r8): the bigint cent SUM is
            # summation-order independent, and ROUND(S/700.0, 2) can
            # never land on a half boundary (2S = 7(2k+1) has no
            # integer solution — even vs odd), so both engines round
            # the bit-identical quotient the same way
            F.round(
                F.sum(
                    F.round(F.col("l_extendedprice") * 100, 0).cast(
                        "bigint"
                    )
                )
                / 700.0,
                2,
            ).alias("avg_yearly")
        )
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
    WITH eligible AS (
      SELECT c_custkey, c_nationkey, c_acctbal FROM customer
      WHERE c_nationkey < 7
    ),
    avg_bal AS (
      SELECT SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT))
             / (100.0 * COUNT(*)) AS a
      FROM eligible WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
           SUM(CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT)) / 100.0
             AS totacctbal
    FROM eligible c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_nationkey
    """,
    note="TPC-H Q22 shape (global sales opportunity): a GLOBAL scalar "
    "subquery (mean positive balance over the eligible countries) "
    "gating the fact side via a broadcast one-row cross join — no "
    "re-scan, no driver collect — composed with a NOT EXISTS "
    "anti-join against a filtered orders set, grouped per country. "
    "Every fixture customer has SOME order, so the anti side is "
    "scoped to urgent orders (customers with above-average balance "
    "and no urgent order) — same decorrelation, non-degenerate "
    "result. The nation code stands in for the reference query's "
    "phone prefix (the fixture has no phone column). Fully oracled.",
    tier=2,
)
def q22_global_sales_opportunity(spark, sf_dir):
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") < 7)
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )
    # threshold from EXACT integer cents (ADVICE r8, upgrading the r7
    # cent-rounding): SUM(bigint cents) / (100.0 · n) is one float
    # division from order-independent integers, so both engines derive
    # the bit-identical threshold — no half-cent-edge caveat at all
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.round(F.col("c_acctbal") * 100, 0).cast("bigint"))
            / (F.lit(100.0) * F.count("*"))
        ).alias("_a")
    )
    urgent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_a"))
        .join(urgent, "c_custkey", "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            # exact integer cents, not ROUND over a raw double SUM
            # (ADVICE r8: the latter can flip at a half-cent boundary
            # between engines)
            (
                F.sum(F.round(F.col("c_acctbal") * 100, 0).cast("bigint"))
                / 100.0
            ).alias("totacctbal"),
        )
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH eu AS (
      SELECT s.s_suppkey, s.s_acctbal, s.s_name, n.n_name
      FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    offers AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    po AS (
      SELECT o.l_partkey, o.l_suppkey, o.cost
      FROM offers o
      JOIN eu ON eu.s_suppkey = o.l_suppkey
      WHERE o.l_partkey IN (
        SELECT p_partkey FROM part
        WHERE p_size <= 15 AND p_type = 'ECONOMY'
      )
    )
    SELECT eu.s_acctbal, eu.s_name, eu.n_name, po.l_partkey AS p_partkey,
           p.p_brand, ROUND(po.cost, 4) AS supply_cost
    FROM po
    JOIN eu ON eu.s_suppkey = po.l_suppkey
    JOIN part p ON p.p_partkey = po.l_partkey
    WHERE po.cost = (
      SELECT MIN(po2.cost) FROM po po2 WHERE po2.l_partkey = po.l_partkey
    )
    ORDER BY eu.s_acctbal DESC, eu.n_name, eu.s_name, p_partkey
    LIMIT 100
    """,
    note="TPC-H Q2 shape (minimum-cost supplier): the CORRELATED scalar "
    "MIN subquery over a dim-filtered join — for each qualifying part, "
    "the cheapest regional supply offer, then the rows ACHIEVING that "
    "minimum (ties included) with supplier/nation attributes, ordered "
    "with LIMIT. Decorrelated into a per-part MIN aggregate joined "
    "back on the correlation key; the region->nation->supplier chain "
    "broadcasts (5/30/100 rows), and the part dim restriction "
    "semi-joins the offer fact BEFORE both the MIN and the equality "
    "probe (lossless: partkey is the correlation key). The fixture has "
    "no partsupp table, so pair-level offers derive from lineitem as "
    "MIN unit price per (part, supplier) — MIN is order-insensitive "
    "and division is IEEE-exact, so the cost==min equality compare is "
    "deterministic across engines (unlike a SUM). ORDER BY carries the "
    "(s_name, partkey) unique tie-break. Fully oracled.",
    tier=2,
)
def q2_min_cost_supplier(spark, sf_dir):
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").join(
                    F.broadcast(region),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    offers = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
    )
    parts = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "ECONOMY")
    )
    po = offers.join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey")).join(
        F.broadcast(parts.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    # one row per QUALIFYING part (the semi-join above already restricted
    # po), so the min-cost probe side broadcasts instead of shuffling the
    # pair-level offers a second time
    min_cost = po.groupBy("l_partkey").agg(F.min("cost").alias("_min_cost"))
    return (
        po.join(F.broadcast(min_cost), "l_partkey")
        .filter(F.col("cost") == F.col("_min_cost"))
        .join(
            F.broadcast(parts.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            "p_brand",
            F.round("cost", 4).alias("supply_cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@query(
    "q11_important_stock",
    oracle="""
    WITH nat_supply AS (
      SELECT l.l_partkey,
             l.l_extendedprice * (1.0 - l.l_discount) AS value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'AFRICA'
    ),
    grp AS (
      SELECT l_partkey,
             SUM(CAST(ROUND(value * 100.0, 0) AS BIGINT)) AS part_cents
      FROM nat_supply GROUP BY l_partkey
    ),
    threshold AS (
      SELECT SUM(part_cents) * 0.001 AS t FROM grp
    )
    SELECT g.l_partkey AS ps_partkey,
           g.part_cents / 100.0 AS part_value
    FROM grp g, threshold
    WHERE g.part_cents > threshold.t
    """,
    note="TPC-H Q11 shape (important stock identification): per-part "
    "value of a nation-filtered supply fact, kept only where the "
    "part's share exceeds a FRACTION OF THE GLOBAL TOTAL over the "
    "same filtered set — the uncorrelated scalar-aggregate HAVING. "
    "The scalar total reuses the per-group sums (one pass over the "
    "fact, a second tiny agg over the groups) and broadcasts back as "
    "a one-row cross join — no re-scan of lineitem, no driver "
    "collect. Values are summed as EXACT integer cents (per-row cent "
    "rounding of identical doubles, then bigint SUM — "
    "order-independent), so summation-order ulp drift cannot flip a "
    "boundary part on either engine. The fixture has no partsupp, "
    "so value = discounted extended price from lineitem restricted to "
    "one region's suppliers. Fully oracled.",
    tier=2,
)
def q11_important_stock(spark, sf_dir):
    nat = _t(spark, sf_dir, "nation").join(
        F.broadcast(
            _t(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
        ),
        F.col("n_regionkey") == F.col("r_regionkey"),
        "left_semi",
    )
    sup = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias(
            "value"
        ),
    )
    grp = (
        li.join(
            F.broadcast(sup.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey")
        .agg(
            F.sum(F.round(F.col("value") * 100.0, 0).cast("long")).alias(
                "part_cents"
            )
        )
    )
    threshold = grp.agg((F.sum("part_cents") * 0.001).alias("_t"))
    return (
        grp.crossJoin(F.broadcast(threshold))
        .filter(F.col("part_cents") > F.col("_t"))
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            (F.col("part_cents") / 100.0).alias("part_value"),
        )
    )


@query(
    "j10_interval_overlap",
    oracle="""
    SELECT l.user_id, l.event_id AS view_id, r.event_id AS purchase_id
    FROM (SELECT user_id, event_id, ts AS ls,
                 ts + INTERVAL 7200 SECOND AS le
          FROM events WHERE event_type = 'view') l
    JOIN (SELECT user_id, event_id, ts AS rs,
                 ts + INTERVAL 3600 SECOND AS re
          FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ls <= r.re AND r.rs <= l.le
    """,
    note="J10 (extension, operators/joins.py interval_overlap_join): "
    "interval×interval overlap join per key — both sides fact-sized "
    "(2 h view windows × 1 h purchase windows per user), the "
    "temporal shape j8's point-in-broadcast-interval cannot express. "
    "Bin-bucketing plan: both sides explode into 3600 s buckets, "
    "equi-join on (user, bucket), and each true pair is emitted "
    "exactly once via its overlap-defining bucket (the later start's "
    "bucket — covered by both sides by definition), so there is NO "
    "distinct re-shuffle. Cost O(intervals·buckets + true pairs) vs "
    "the oracle's per-key cross product. Fully oracled (DuckDB theta "
    "join).",
    tier=2,
)
def j10_interval_overlap(spark, sf_dir):
    from gpssbzd_spark.operators.joins import interval_overlap_join

    ev = _t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("ls"),
        (F.col("ts") + F.expr("INTERVAL 7200 SECONDS")).alias("le"),
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("rs"),
        (F.col("ts") + F.expr("INTERVAL 3600 SECONDS")).alias("re"),
    )
    out = interval_overlap_join(
        views, buys, ["user_id"], ("ls", "le"), ("rs", "re"), bucket_secs=3600
    )
    return out.select("user_id", "view_id", "purchase_id")


# --------------------------------------------------------------------------
# §2.4 aggregations
# --------------------------------------------------------------------------


@query(
    "a8_rollup_grouping",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           GROUPING(o_orderpriority, o_orderstatus) AS gid,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
    note="A1+A6+A8 merged (driver-window diagnostic): hierarchical ROLLUP "
    "with grouping_id — SURVEY §2.4 lists grouping sets absent from the "
    "reference; one pass produces (priority, status), (priority), and "
    "grand-total rows, map-side partial agg intact. gid disambiguates "
    "rolled-up NULLs from data NULLs on both engines (same SQL-standard "
    "bitmask). The exact countDistinct rides the rollup: per-group rows "
    "are A1 (PBZ:102-104 vehicles/cluster), the grand-total row is A6's "
    "global distinct count (SBZ:58 total-vehicle N).",
)
def a8_rollup_grouping(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(
        F.grouping_id().alias("gid"),
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


@query(
    "a13_cube_grouping_sets",
    oracle="""
    SELECT 'cube' AS src, o_orderpriority, o_orderstatus,
           GROUPING(o_orderpriority, o_orderstatus) AS gid,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    UNION ALL
    SELECT 'gsets' AS src, o_orderpriority, o_orderstatus,
           GROUPING(o_orderpriority, o_orderstatus) AS gid,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
    """,
    note="A13 (extension): CUBE + arbitrary GROUPING SETS — closes the "
    "rest of SURVEY §2.4's absent list next to a8's ROLLUP. The cube "
    "half runs the DataFrame .cube() API (all four grouping combos in "
    "one pass, map-side partial agg per grouping via Spark's Expand); "
    "the gsets half runs SQL GROUP BY GROUPING SETS for the "
    "non-hierarchical subset ((priority),(status)) a rollup/cube cannot "
    "express. gid disambiguates rolled-up NULLs from data NULLs on both "
    "engines (same SQL-standard bitmask as a8). a2-family rotation "
    "alternate.",
    tier=2,
)
def a13_cube_grouping_sets(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    cube = o.cube("o_orderpriority", "o_orderstatus").agg(
        F.grouping_id().alias("gid"),
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )
    o.createOrReplaceTempView("_a13_orders")
    gsets = spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               grouping_id() AS gid,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS sum_price
        FROM _a13_orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
        """
    )
    return cube.withColumn("src", F.lit("cube")).unionByName(
        gsets.withColumn("src", F.lit("gsets"))
    ).select("src", "o_orderpriority", "o_orderstatus", "gid", "n_orders", "sum_price")


@query(
    "a1_count_distinct_group",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
    note="A1: exact countDistinct per group (PBZ:102-104 vehicles/cluster)",
    tier=2,
)
def a1_count_distinct_group(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


@query(
    "a9_hll_mergeable_rollup",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders_exact,
           1 AS within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
    note="A9 (extension, operators/sketches.py): mergeable HyperLogLog "
    "distinct-count rollup — per-(returnflag,status) 16 KB sketches of "
    "l_orderkey built with hll_sketch_agg (map-side partial, one narrow "
    "shuffle), then hll_union_agg merges the STORED sketches to the "
    "returnflag level without rescanning raw data: the pattern that "
    "turns a 100 TB daily->monthly distinct rollup into a KB-scale "
    "merge. WITHIN-BOUND oracle (VERDICT r8 #4): sketch binaries are "
    "engine-specific, so the driver row hash-checks the exact distinct "
    "count per returnflag plus a flag that the MERGED-sketch estimate "
    "lands within 5% (~3σ at lgK=12) of it — the union/estimate path "
    "runs inside the checked plan; the 3-sigma pin stays in "
    "tests/test_operators.py.",
    tier=2,
)
def a9_hll_mergeable_rollup(spark, sf_dir):
    from gpssbzd_spark.operators.sketches import (
        hll_estimate,
        hll_partial,
        hll_rollup,
    )

    li = _t(spark, sf_dir, "lineitem")
    partials = hll_partial(li, ["l_returnflag", "l_linestatus"], "l_orderkey")
    merged = hll_rollup(partials, ["l_returnflag"])
    est = hll_estimate(merged)
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders_exact")
    )
    return exact.join(est, "l_returnflag").select(
        "l_returnflag",
        "n_orders_exact",
        (
            F.abs(
                F.col("approx_nd").cast("double")
                - F.col("n_orders_exact").cast("double")
            )
            <= 0.05 * F.col("n_orders_exact").cast("double")
        )
        .cast("int")
        .alias("within_5pct"),
    )


_HIST_LO, _HIST_HI, _HIST_BINS = 0.0, 110000.0, 110


def _hist_oracle() -> str:
    from gpssbzd_spark.operators.sketches import hist_quantile_sql

    return hist_quantile_sql(
        "lineitem",
        "l_returnflag",
        "l_linestatus",
        "l_extendedprice",
        {"p50_est": 0.5, "p95_est": 0.95},
        _HIST_LO,
        _HIST_HI,
        _HIST_BINS,
    )


@query(
    "a12_hist_quantile_rollup",
    oracle=_hist_oracle(),
    note="A12 (extension, operators/sketches.py): mergeable fixed-bin "
    "histogram quantile rollup — per-(returnflag,status) 110-bin count "
    "arrays (partial-aggregable: map-side combine, shuffle carries "
    "(group, 880 B) rows), merged to the returnflag level by "
    "elementwise sum WITHOUT rescanning raw data, then p50/p95 read "
    "off the merged counts (lower edge of the first bin reaching rank "
    "ceil(q*total)). The deterministic-integer twin of a9's HLL rollup "
    "for quantiles: unlike percentile_approx or t-digest the whole "
    "pipeline is exact integer arithmetic, so the DuckDB oracle "
    "replays bin assignment, merge, and rank rule verbatim. Error "
    "bound = one bin width (1000 on this domain), pinned vs exact "
    "percentiles in tests/test_operators.py.",
    tier=2,
)
def a12_hist_quantile_rollup(spark, sf_dir):
    from gpssbzd_spark.operators.sketches import (
        hist_partial,
        hist_quantile,
        hist_rollup,
    )

    li = _t(spark, sf_dir, "lineitem")
    partials = hist_partial(
        li,
        ["l_returnflag", "l_linestatus"],
        "l_extendedprice",
        _HIST_LO,
        _HIST_HI,
        _HIST_BINS,
    )
    merged = hist_rollup(partials, ["l_returnflag"], _HIST_BINS)
    h = F.col("hist")
    total = F.aggregate(h, F.lit(0).cast("long"), lambda a, x: a + x)
    return merged.select(
        F.col("l_returnflag").alias("grp"),
        total.alias("n_values"),
        F.round(
            hist_quantile(h, 0.5, _HIST_LO, _HIST_HI, _HIST_BINS), 6
        ).alias("p50_est"),
        F.round(
            hist_quantile(h, 0.95, _HIST_LO, _HIST_HI, _HIST_BINS), 6
        ).alias("p95_est"),
    )


_FUNNEL_STEPS = ("view", "click", "purchase")
_FUNNEL_WITHIN = 604800.0  # 7 days


_FUNNEL_CTES = f"""
    s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = '{_FUNNEL_STEPS[0]}' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = '{_FUNNEL_STEPS[1]}' AND e.ts > s1.t1
        AND epoch(e.ts) - epoch(s1.t1) <= {_FUNNEL_WITHIN}
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 USING (user_id) JOIN s1 USING (user_id)
      WHERE e.event_type = '{_FUNNEL_STEPS[2]}' AND e.ts > s2.t2
        AND epoch(e.ts) - epoch(s1.t1) <= {_FUNNEL_WITHIN}
      GROUP BY e.user_id
    )"""


def _funnel_users_oracle() -> str:
    return f"""
    WITH {_FUNNEL_CTES}
    SELECT s1.user_id, s1.t1, s2.t2, s3.t3,
           CASE WHEN s3.t3 IS NOT NULL THEN 3
                WHEN s2.t2 IS NOT NULL THEN 2
                ELSE 1 END AS steps_completed
    FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
    """


def _funnel_steps_oracle() -> str:
    return f"""
    WITH {_FUNNEL_CTES}, n AS (
      SELECT (SELECT COUNT(*) FROM s1) AS n1,
             (SELECT COUNT(*) FROM s2) AS n2,
             (SELECT COUNT(*) FROM s3) AS n3
    )
    SELECT 1 AS step, '{_FUNNEL_STEPS[0]}' AS event_type,
           n1 AS n_users, ROUND(CAST(n1 AS DOUBLE) / NULLIF(n1, 0), 4)
             AS conversion FROM n
    UNION ALL
    SELECT 2, '{_FUNNEL_STEPS[1]}', n2,
           ROUND(CAST(n2 AS DOUBLE) / NULLIF(n1, 0), 4) FROM n
    UNION ALL
    SELECT 3, '{_FUNNEL_STEPS[2]}', n3,
           ROUND(CAST(n3 AS DOUBLE) / NULLIF(n1, 0), 4) FROM n
    """


@query(
    "ev_funnel_users",
    oracle=_funnel_users_oracle(),
    note="ordered-funnel analysis (extension, operators/funnel.py): "
    "per-user strict-order view->click->purchase conversion with a "
    "7-day window anchored at step 1 — t_k is the earliest step-k "
    "event strictly after t_{k-1}; a purchase BEFORE the click does "
    "not count. A2/A3's cascaded conditional aggregation generalized "
    "to event sequences. Events are filtered to the funnel's types at "
    "the scan; every step is a per-user windowed conditional min over "
    "ONE hash partitioning (successive Window ops, no sorts), so the "
    "whole funnel is one scan + one exchange. a2 rotation alternate",
    tier=2,
)
def ev_funnel_users(spark, sf_dir):
    from gpssbzd_spark.operators.funnel import funnel_times

    ev = _t(spark, sf_dir, "events")
    return funnel_times(ev, _FUNNEL_STEPS, within=_FUNNEL_WITHIN)


@query(
    "ev_funnel_steps",
    oracle=_funnel_steps_oracle(),
    note="funnel summary (operators/funnel.py funnel_counts): per-step "
    "users-reaching counts + conversion from step 1, collapsed from "
    "the per-user table by conditional counts in ONE pass (no second "
    "events scan) and exploded from a literal struct array — the "
    "3-row funnel chart a dashboard consumes. a2 rotation alternate",
    tier=2,
)
def ev_funnel_steps(spark, sf_dir):
    from gpssbzd_spark.operators.funnel import funnel_counts

    ev = _t(spark, sf_dir, "events")
    return funnel_counts(ev, _FUNNEL_STEPS, within=_FUNNEL_WITHIN)


_GAPFILL_BUCKET = 14400  # 4 h


def _gapfill_oracle() -> str:
    from gpssbzd_spark.operators.timeseries import time_bucket_gapfill_sql

    inner = time_bucket_gapfill_sql(
        "(SELECT * FROM events WHERE user_id % 19 = 0)",
        "ts",
        ["event_type"],
        _GAPFILL_BUCKET,
        {"sum_value": "ROUND(SUM(value), 2)"},
        fill="prev",
    )
    return inner


@query(
    "ts_bucket_gapfill",
    oracle=_gapfill_oracle(),
    note="time-bucket resampling with gap-fill (extension, operators/"
    "timeseries.py): per-type 4 h rollups over a sparse event slice "
    "with the DENSE bucket spine materialized — silent intervals "
    "emitted as is_gap rows and forward-filled (TimescaleDB "
    "time_bucket_gapfill/locf semantics; the reference's blind-zone "
    "premise — the signal is where data is MISSING — generalized). "
    "One partial-agg pass; the spine explodes per key from that "
    "aggregate (no driver calendar); epoch-integer buckets replay "
    "bit-identically in the oracle. st rotation alternate",
    tier=2,
)
def ts_bucket_gapfill(spark, sf_dir):
    from gpssbzd_spark.operators.timeseries import time_bucket_gapfill

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") % 19 == 0)
    out = time_bucket_gapfill(
        ev,
        "ts",
        ["event_type"],
        _GAPFILL_BUCKET,
        {"sum_value": F.round(F.sum("value"), 2)},
        fill="prev",
    )
    return out.withColumn("bucket", F.col("bucket").cast("string"))


def _interp_oracle() -> str:
    from gpssbzd_spark.operators.timeseries import time_bucket_gapfill_sql

    inner = time_bucket_gapfill_sql(
        "(SELECT * FROM events WHERE user_id % 19 = 0)",
        "ts",
        ["event_type"],
        _GAPFILL_BUCKET,
        # round BEFORE interpolating: an unrounded AVG's last ulp is
        # summation-order-dependent across engines, and interpolation
        # carries that ulp onto gap rows where it can flip the final
        # rounding (3 of 882 rows at sf0.01 without this)
        {"avg_value": "ROUND(AVG(value), 4)"},
        fill="linear",
    )
    # FLOOR(x*1000 + 0.5)/1000, not ROUND(x, 3): interpolation midpoints
    # of 4-decimal inputs land on exact .0005 ties where Spark's
    # HALF_UP and DuckDB's rounding disagree; floor of the identical
    # double is deterministic on both engines
    return (
        "SELECT event_type, bucket, is_gap, "
        "FLOOR(avg_value * 1000 + 0.5) / 1000.0 AS avg_value "
        f"FROM ({inner})"
    )


@query(
    "ts_bucket_interpolate",
    oracle=_interp_oracle(),
    note="linear interpolation across gap buckets (operators/"
    "timeseries.py fill='linear' — TimescaleDB interpolate): each "
    "empty bucket gets the distance-weighted blend of its bracketing "
    "non-null buckets, NULL outside the bracketed range. Two "
    "opposite-frame windows over ONE (key, bucket) sort; the oracle "
    "mirrors the expression shape (same casts, same association "
    "order) so the doubles agree bit-for-bit before the final "
    "rounding. st rotation alternate",
    tier=2,
)
def ts_bucket_interpolate(spark, sf_dir):
    from gpssbzd_spark.operators.timeseries import time_bucket_gapfill

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") % 19 == 0)
    out = time_bucket_gapfill(
        ev,
        "ts",
        ["event_type"],
        _GAPFILL_BUCKET,
        {"avg_value": F.round(F.avg("value"), 4)},
        fill="linear",
    )
    return out.select(
        "event_type",
        F.col("bucket").cast("string").alias("bucket"),
        "is_gap",
        (F.floor(F.col("avg_value") * 1000 + 0.5) / 1000.0).alias("avg_value"),
    )


_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _profile_oracle() -> str:
    from gpssbzd_spark.operators.profile import profile_numeric_sql

    return profile_numeric_sql("lineitem", _PROFILE_COLS)


@query(
    "dp_profile_numeric",
    oracle=_profile_oracle(),
    note="column profiling (extension, operators/profile.py): "
    "row/null/distinct counts + min/max/rounded-mean for four lineitem "
    "measures in ONE aggregate pass over one scan — one read for the "
    "whole profile, not a pass per column. Counts/min/max/mean "
    "partial-aggregate to scalars; the exact distincts ride Spark's "
    "multi-distinct Expand and shuffle each column's distinct values "
    "(swap to approx_count_distinct at scales where that matters — "
    "the docstring spells out the trade). Long format so data-drop "
    "profiles join/diff without schema churn. p7 rotation alternate",
    tier=2,
)
def dp_profile_numeric(spark, sf_dir):
    from gpssbzd_spark.operators.profile import profile_numeric

    li = _t(spark, sf_dir, "lineitem")
    return profile_numeric(li, _PROFILE_COLS)


_PSI_SPECS = {
    "l_quantity": (1.0, 51.0, 10),
    "l_discount": (0.0, 0.11, 11),
    "l_extendedprice": (900.0, 105000.0, 20),
}
_PSI_B_FILTER = "l_orderkey % 3 = 0 AND l_discount <= 0.05"


def _drift_psi_oracle() -> str:
    from gpssbzd_spark.operators.profile import drift_psi_sql

    return drift_psi_sql(
        "lineitem",
        f"(SELECT * FROM lineitem WHERE {_PSI_B_FILTER})",
        _PSI_SPECS,
    )


@query(
    "dp_drift_psi",
    oracle=_drift_psi_oracle(),
    note="distribution drift detection (extension, operators/profile.py "
    "drift_psi): Population Stability Index per column between two data "
    "drops over clamped fixed-width bins — the drift gate a training "
    "pipeline runs before trusting a new snapshot (PSI<0.1 stable, "
    ">0.25 shifted). Drop B filters low discounts so l_discount "
    "genuinely drifts while l_quantity stays stable. ONE scan per side "
    "(every column's bucket rides a single explode), per-bin join and "
    "rollup move only columns*bins rows. Fully oracled (same bins, "
    "same 1e-6 floor, same ln).",
    tier=2,
)
def dp_drift_psi(spark, sf_dir):
    from gpssbzd_spark.operators.profile import drift_psi

    li = _t(spark, sf_dir, "lineitem")
    b = li.filter(F.expr(_PSI_B_FILTER))
    return drift_psi(li, b, _PSI_SPECS)


_OUTLIER_SRC = (
    "(SELECT l_quantity, l_discount, "
    "l_extendedprice * (CASE WHEN l_orderkey % 97 = 0 THEN 50 ELSE 1 END) "
    "AS spiked_price FROM lineitem)"
)


def _outliers_oracle() -> str:
    from gpssbzd_spark.operators.profile import outliers_mad_sql

    return outliers_mad_sql(
        _OUTLIER_SRC, ["l_quantity", "l_discount", "spiked_price"]
    )


@query(
    "dp_outliers_mad",
    oracle=_outliers_oracle(),
    note="robust outlier profile (extension, operators/profile.py "
    "outliers_mad): per-column median, MAD, and the count/fraction of "
    "rows beyond 3 scaled MADs (1.4826·MAD ≈ σ) — the robust z-score "
    "that survives the outliers inflating the spread, unlike "
    "mean/stddev rules. Three one-pass multi-column aggregates with "
    "two one-row collects between them; exact percentiles keep the "
    "oracle bit-comparable, and percentile='approx' is the one-argument "
    "100 TB swap (approx_percentile sketch, accuracy-pinned in "
    "tests/test_operators.py). The profiled set includes a deliberately "
    "spiked price "
    "(50x on ~1% of orders) so the detection path is exercised with "
    "n_outliers > 0, beside untouched uniform columns at 0. Fully "
    "oracled.",
    tier=2,
)
def dp_outliers_mad(spark, sf_dir):
    from gpssbzd_spark.operators.profile import outliers_mad

    li = _t(spark, sf_dir, "lineitem").select(
        "l_quantity",
        "l_discount",
        (
            F.col("l_extendedprice")
            * F.when(F.col("l_orderkey") % 97 == 0, 50).otherwise(1)
        ).alias("spiked_price"),
    )
    return outliers_mad(li, ["l_quantity", "l_discount", "spiked_price"])


def _profile_corr_oracle() -> str:
    from gpssbzd_spark.operators.profile import profile_correlation_sql

    return profile_correlation_sql("lineitem", _PROFILE_COLS)


@query(
    "dp_profile_correlation",
    oracle=_profile_corr_oracle(),
    note="pairwise column profiling (extension, operators/profile.py "
    "profile_correlation): all-pairs Pearson correlation of the four "
    "lineitem measures in ONE aggregate pass — corr partials are "
    "constant-size moment tuples, so 6 pairwise correlations cost one "
    "scan and a one-row shuffle. Long format beside dp_profile_numeric "
    "so drop-over-drop drift checks join on (col_a, col_b). Fully "
    "oracled (DuckDB corr, 4 dp).",
    tier=2,
)
def dp_profile_correlation(spark, sf_dir):
    from gpssbzd_spark.operators.profile import profile_correlation

    li = _t(spark, sf_dir, "lineitem")
    return profile_correlation(li, _PROFILE_COLS)


@query(
    "ev_transition_matrix",
    oracle="""
    WITH pairs AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events WHERE ts IS NOT NULL
    ), counts AS (
      SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
      FROM pairs WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n_transitions,
           FLOOR(CAST(n_transitions AS DOUBLE)
                 / SUM(n_transitions) OVER (PARTITION BY from_type)
                 * 10000 + 0.5) / 10000.0
             AS prob
    FROM counts
    """,
    note="first-order event-transition matrix (operators/funnel.py "
    "transition_matrix): consecutive (event, next) pairs per user — "
    "the Markov-chain path view beside the funnel and retention. One "
    "lead() window per user (event_id tie-break makes equal-timestamp "
    "ordering deterministic) then a narrow (from,to) count with "
    "row-normalized probabilities. a2 rotation alternate",
    tier=2,
)
def ev_transition_matrix(spark, sf_dir):
    from gpssbzd_spark.operators.funnel import transition_matrix

    ev = _t(spark, sf_dir, "events")
    return transition_matrix(ev)


def _retention_oracle() -> str:
    from gpssbzd_spark.operators.funnel import retention_matrix_sql

    inner = retention_matrix_sql("events", "user_id", "ts", period="day")
    # DATE comes back from DuckDB's pandas bridge as midnight
    # timestamps but from Spark as dates — compare as ISO strings
    return (
        "SELECT CAST(cohort AS VARCHAR) AS cohort, age, n_active, "
        f"retention FROM ({inner})"
    )


@query(
    "ev_retention_matrix",
    oracle=_retention_oracle(),
    note="cohort retention analysis (extension, operators/funnel.py): "
    "users bucketed by first-activity day, distinct-active counts per "
    "(cohort, age) with retention = share of the cohort still active — "
    "the standard product-analytics rollup next to the funnel. One "
    "groupBy(user) + one (user, period) distinct sharing the same "
    "exchange, a co-partitioned join, then a narrow (cohort, age) "
    "rollup; cohort sizes broadcast. a2 rotation alternate",
    tier=2,
)
def ev_retention_matrix(spark, sf_dir):
    from gpssbzd_spark.operators.funnel import retention_matrix

    ev = _t(spark, sf_dir, "events")
    out = retention_matrix(ev, period="day")
    return out.withColumn("cohort", F.col("cohort").cast("string"))


@query(
    "a2_conditional_agg",
    oracle="""
    SELECT l_returnflag,
           MAX(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END) AS has_bulk,
           CAST(COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS BIGINT) AS n_discounted
    FROM lineitem GROUP BY l_returnflag
    """,
    note="A2: max(when(pred,1)) 'any row satisfies' + count_if (SPE:104-118)",
    tier=2,
)
def a2_conditional_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        any_flag(F.col("l_quantity") > 45).alias("has_bulk"),
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
    )


@query(
    "a3_cascaded_agg",
    oracle="""
    SELECT c_nationkey, MIN(sub_flag) AS all_active
    FROM (
      SELECT c_nationkey, c_custkey,
             MAX(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END) AS sub_flag
      FROM customer GROUP BY c_nationkey, c_custkey
    ) GROUP BY c_nationkey
    """,
    note="A3: two-level cascaded agg — 'do ALL subgroups satisfy' "
    "(SBZ:112-143 signal escalation)",
    tier=2,
)
def a3_cascaded_agg(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return group_all_subgroups(
        c,
        group_by=["c_nationkey"],
        subgroup_by=["c_custkey"],
        pred=F.col("c_acctbal") > 0,
        flag_name="all_active",
    )


@query(
    "a2_cascaded_conditional",
    oracle="""
    SELECT o_orderpriority,
           MIN(has_big) AS all_cust_have_big,
           MAX(has_big) AS any_cust_has_big,
           CAST(COUNT(CASE WHEN has_big = 1 THEN 1 END) AS BIGINT)
             AS n_custs_with_big,
           CAST(SUM(n_orders) AS BIGINT) AS n_orders
    FROM (
      SELECT o_orderpriority, o_custkey,
             MAX(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END) AS has_big,
             COUNT(*) AS n_orders
      FROM orders GROUP BY o_orderpriority, o_custkey
    ) GROUP BY o_orderpriority
    """,
    note="A2+A3 merged (driver-window diagnostic): inner conditional agg "
    "per (priority, customer) — max(when(pred,1)) 'any row satisfies' "
    "(SPE:104-118) — cascaded into an outer 'do ALL / does ANY subgroup "
    "satisfy' + count_if rollup, the exact two-level escalation shape of "
    "the blind-zone signal cascade (SBZ:112-143)",
)
def a2_cascaded_conditional(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    inner = o.groupBy("o_orderpriority", "o_custkey").agg(
        any_flag(F.col("o_totalprice") > 300000).alias("has_big"),
        F.count("*").alias("n_inner"),
    )
    return inner.groupBy("o_orderpriority").agg(
        F.min("has_big").alias("all_cust_have_big"),
        F.max("has_big").alias("any_cust_has_big"),
        F.count_if(F.col("has_big") == 1).alias("n_custs_with_big"),
        F.sum("n_inner").alias("n_orders"),
    )


@query(
    "a4_percentile_exact",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price
    FROM lineitem GROUP BY l_returnflag
    """,
    note="A4: exact interpolated percentile (reference uses percentile_approx "
    "for the per-vehicle gap threshold, PPE:124; exact keeps the oracle tight "
    "— approx variant benchmarked separately)",
)
def a4_percentile_exact(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", 0.95), 4).alias("p95_price")
    )


@query(
    "a5_collect_list_ordered",
    oracle="""
    SELECT l_orderkey,
           string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS lines
    FROM lineitem GROUP BY l_orderkey
    """,
    note="A5: ORDER-SENSITIVE collect_list — reference relies on incidental "
    "input order (PTC:143-145); ours imposes sort_array explicitly",
)
def a5_collect_list_ordered(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    arr = F.sort_array(F.collect_list("l_linenumber"))
    return li.groupBy("l_orderkey").agg(
        F.array_join(F.transform(arr, lambda x: x.cast("string")), ",").alias("lines")
    )


@query(
    "a6_global_distinct_count",
    oracle="""
    SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    """,
    note="A6: global distinct count (SBZ:58 total-vehicle count N)",
    tier=2,
)
def a6_global_distinct_count(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


@query(
    "a7_tpch_q1_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    note="A7: multi-aggregate single pass (TPC-H Q1 shape)",
)
def a7_tpch_q1_rollup(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# §2.6 sorts / top-k, §2.7 set ops
# --------------------------------------------------------------------------


@query(
    "o1_global_topk",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    note="O1/O2: global top-k with deterministic tie-break "
    "(TakeOrderedAndProject — no full sort at scale)",
)
def o1_global_topk(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
    )


@query(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    note="§2.7: union + distinct (replaces reference's filesystem-level "
    "union of per-line output dirs, PPE:255-256)",
    tier=2,
)
def set_union_distinct(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    INTERSECT
    SELECT o_custkey AS custkey FROM orders
    """,
    tier=2,
)
def set_intersect(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return c.intersect(o)


@query(
    "set_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_totalprice > 400000
    """,
    note="EXCEPT against a filtered subtrahend — non-empty at sf0.01 (the "
    "r01 all-orders variant subtracted to zero rows)",
    tier=2,
)
def set_except(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    # subtract = EXCEPT DISTINCT, matching the oracle; exceptAll+distinct
    # would re-emit a key whose left multiplicity exceeds its right one
    return c.subtract(o)


@query(
    "set_ops_tagged",
    oracle="""
    SELECT 'union' AS op, nationkey AS key FROM (
      SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
      UNION
      SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
    )
    UNION ALL
    SELECT 'intersect' AS op, custkey AS key FROM (
      SELECT c_custkey AS custkey FROM customer
      INTERSECT
      SELECT o_custkey AS custkey FROM orders
    )
    UNION ALL
    SELECT 'except' AS op, custkey AS key FROM (
      SELECT c_custkey AS custkey FROM customer
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_totalprice > 400000
    )
    """,
    note="§2.7 merged (driver-window diagnostic): union-distinct, "
    "intersect, and except in one tag-union — union replaces the "
    "reference's filesystem-level union of per-line output dirs "
    "(PPE:255-256); the except subtrahend is filtered so all three "
    "branches are non-empty at sf0.01",
)
def set_ops_tagged(spark, sf_dir):
    c_nat = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("bigint").alias("key")
    )
    s_nat = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("bigint").alias("key")
    )
    c_keys = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("key"))
    o_keys = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("key"))
    o_big = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("key"))
    )
    u = c_nat.unionByName(s_nat).distinct().select(F.lit("union").alias("op"), "key")
    i = c_keys.intersect(o_keys).select(F.lit("intersect").alias("op"), "key")
    # subtract = EXCEPT DISTINCT, matching the oracle; exceptAll+distinct
    # would re-emit a key whose left multiplicity exceeds its right one
    e = c_keys.subtract(o_big).select(F.lit("except").alias("op"), "key")
    return u.unionByName(i).unionByName(e)


# --------------------------------------------------------------------------
# §2.8 scalar functions
# --------------------------------------------------------------------------


@query(
    "f1_datetime_parts",
    oracle="""
    SELECT o_orderkey,
           CAST(date_part('year', o_orderdate) AS INTEGER) AS order_year,
           CAST(date_part('month', o_orderdate) AS INTEGER) AS order_month,
           CAST(date_part('day', o_orderdate) AS INTEGER) AS order_day,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date_str,
           CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch
    FROM orders
    """,
    note="F1: datetime extraction + formatting + unix epoch (PPE:68, SBZ:84)",
)
def f1_datetime_parts(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
        F.unix_timestamp("o_orderdate").alias("order_epoch"),
    )


@query(
    "f1_timestamp_arithmetic",
    oracle="""
    SELECT event_id,
           epoch_ms(ts) AS ts_ms,
           epoch_ms(ts + INTERVAL 90 SECOND) AS ts_plus_90s_ms,
           CAST(date_diff('second', TIMESTAMP '2024-01-01 00:00:00', ts) AS BIGINT)
             AS secs_since_epoch0
    FROM events
    """,
    note="F1: timestamp ± seconds arithmetic (SPE:133-136 gap bounds); "
    "epoch-ms output sidesteps ns-vs-us parquet precision",
)
def f1_timestamp_arithmetic(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    t0 = F.lit("2024-01-01 00:00:00").cast("timestamp")
    return ev.select(
        "event_id",
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        F.unix_millis(F.col("ts") + F.expr("INTERVAL 90 SECONDS")).alias("ts_plus_90s_ms"),
        (F.unix_timestamp("ts") - F.unix_timestamp(t0)).alias("secs_since_epoch0"),
    )


@query(
    "f2_string_fns",
    oracle="""
    SELECT c_custkey,
           concat_ws('_', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_key,
           upper(c_name) AS name_upper,
           substring(c_name, 1, 8) AS name_prefix,
           CAST(length(c_name) AS INTEGER) AS name_len,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS custkey_padded
    FROM customer
    """,
    note="F2: concat_ws composite key (PTC:227-228) + zero-padded ids",
    tier=2,
)
def f2_string_fns(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat_ws("_", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")).alias(
            "seg_key"
        ),
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("custkey_padded"),
    )


@query(
    "f2_string_case",
    oracle="""
    SELECT c_custkey,
           concat_ws('_', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_key,
           upper(c_name) AS name_upper,
           substring(c_name, 1, 8) AS name_prefix,
           CAST(length(c_name) AS INTEGER) AS name_len,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS custkey_padded,
           CASE WHEN c_acctbal >= 5000 THEN 'high'
                WHEN c_acctbal >= 0 THEN 'mid'
                ELSE 'neg' END AS bal_band
    FROM customer
    """,
    note="F2+F4 merged (driver-window diagnostic): concat_ws composite key "
    "(PTC:227-228), case transforms, zero-padded ids, plus a multi-branch "
    "CASE WHEN band (SPE:82-102 gap classification) in the same projection",
)
def f2_string_case(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat_ws("_", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")).alias(
            "seg_key"
        ),
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("custkey_padded"),
        F.when(F.col("c_acctbal") >= 5000, "high")
        .when(F.col("c_acctbal") >= 0, "mid")
        .otherwise("neg")
        .alias("bal_band"),
    )


_HAVERSINE_ORACLE = haversine_sql(
    "22.5 + (c_custkey % 100) * 0.001",
    "113.8 + (c_nationkey % 50) * 0.002",
    "22.5",
    "113.8",
)


@query(
    "f3_haversine_native",
    oracle=f"""
    SELECT c_custkey,
           ROUND({_HAVERSINE_ORACLE}, 2) AS dist_m
    FROM customer
    """,
    note="F3: native-column haversine (no UDF, codegen-able) — same formula "
    "as the reference's fastHaversine UDF (PPE:56-65), R=6371000 m",
    tier=2,
)
def f3_haversine_native(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    lat1 = F.lit(22.5) + (F.col("c_custkey") % 100) * 0.001
    lng1 = F.lit(113.8) + (F.col("c_nationkey") % 50) * 0.002
    return c.select(
        "c_custkey",
        F.round(haversine_m(lat1, lng1, F.lit(22.5), F.lit(113.8)), 2).alias("dist_m"),
    )


@query(
    "f3b_haversine_sql_registered",
    oracle=f"""
    SELECT c_custkey,
           ROUND({_HAVERSINE_ORACLE}, 2) AS dist_m
    FROM customer
    WHERE {_HAVERSINE_ORACLE} < 8000
    """,
    note="U2: SQL-string parity for the registered haversine — the "
    "reference registers fastHaversine as a Scala UDF for expr() strings "
    "(Parallel/Pattern Extraction.scala:56-65, called at :103,111); here "
    "it is a CREATE TEMPORARY FUNCTION SQL scalar function that Catalyst "
    "inlines into codegen, called via expr() in both select and filter",
    tier=2,
)
def f3b_haversine_sql_registered(spark, sf_dir):
    register_sql_fns(spark)
    c = _t(spark, sf_dir, "customer")
    call = (
        "fast_haversine(22.5 + (c_custkey % 100) * 0.001, "
        "113.8 + (c_nationkey % 50) * 0.002, 22.5, 113.8)"
    )
    return (
        c.filter(F.expr(f"{call} < 8000"))
        .select("c_custkey", F.expr(f"ROUND({call}, 2)").alias("dist_m"))
    )


@query(
    "f3_haversine_native_and_sql",
    oracle=f"""
    SELECT c_custkey,
           ROUND({_HAVERSINE_ORACLE}, 2) AS dist_m,
           ROUND({_HAVERSINE_ORACLE}, 2) AS dist_m_sql
    FROM customer
    WHERE {_HAVERSINE_ORACLE} < 8000
    """,
    note="F3+U2 merged driver row: the native-column haversine and the "
    "SQL-registered fast_haversine (CREATE TEMPORARY FUNCTION, inlined by "
    "Catalyst into the same codegen) side by side on each row, with the "
    "registered form also driving the filter — one CORRECTNESS row "
    "covering both function surfaces (frees a driver-window slot; the "
    "single-surface originals remain tier-2/pytest)",
)
def f3_haversine_native_and_sql(spark, sf_dir):
    register_sql_fns(spark)
    c = _t(spark, sf_dir, "customer")
    lat1 = F.lit(22.5) + (F.col("c_custkey") % 100) * 0.001
    lng1 = F.lit(113.8) + (F.col("c_nationkey") % 50) * 0.002
    call = (
        "fast_haversine(22.5 + (c_custkey % 100) * 0.001, "
        "113.8 + (c_nationkey % 50) * 0.002, 22.5, 113.8)"
    )
    return (
        c.filter(F.expr(f"{call} < 8000"))
        .select(
            "c_custkey",
            F.round(haversine_m(lat1, lng1, F.lit(22.5), F.lit(113.8)), 2).alias("dist_m"),
            F.expr(f"ROUND({call}, 2)").alias("dist_m_sql"),
        )
    )


@query(
    "f4_case_when",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity >= 40 THEN 'bulk'
                WHEN l_quantity >= 20 THEN 'mid'
                ELSE 'small' END AS qty_band,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS is_return
    FROM lineitem
    """,
    note="F4/P3: multi-branch CASE WHEN (SPE:82-102 gap classification)",
    tier=2,
)
def f4_case_when(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") >= 40, "bulk")
        .when(F.col("l_quantity") >= 20, "mid")
        .otherwise("small")
        .alias("qty_band"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("is_return"),
    )


@query(
    "f5_json_extract",
    oracle="""
    SELECT event_id,
           CAST(floor(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE))
                AS INTEGER) AS prop_k
    FROM events
    """,
    note="§2.11 F5: from_json/get_json_object over events.props "
    "(engine extension — reference has no JSON surface). The cast goes "
    "try_cast→double→floor→int on BOTH engines: Spark 4 runs ANSI-on, "
    "so a direct string→int cast would CRASH on a non-integral k while "
    "DuckDB rounds it — try_cast nulls malformed values and floor pins "
    "one truncation rule",
    tier=2,
)
def f5_json_extract(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.floor(F.get_json_object("props", "$.k").try_cast("double"))
        .cast("int")
        .alias("prop_k"),
    )


@query(
    "f5_array_struct_math",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           ROUND(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * x),
                                'sum'), 4) AS sq_norm
    FROM embeddings
    """,
    note="F5: native array math — transform + aggregate on array<float> "
    "(no Python boundary; the trajectory-array shape, PTC:143)",
)
def f5_array_struct_math(spark, sf_dir):
    em = _t(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double") * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return em.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(sq, 4).alias("sq_norm"),
    )


# --------------------------------------------------------------------------
# §2.4 approximate-sketch variants — the 100 TB path for A1/A4
# --------------------------------------------------------------------------


@query(
    "a4_percentile_approx",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95_exact,
           1 AS within_1pct
    FROM lineitem GROUP BY l_returnflag
    """,
    note="A4 as the reference actually computes it (percentile_approx, "
    "PPE:124): partial-aggregable KLL-style sketch, one shuffle of sketch "
    "state instead of the full sort exact percentile needs. WITHIN-BOUND "
    "oracle (VERDICT r8 #4): the sketch estimate is engine-specific, so "
    "the driver row hash-checks the exact p95 (SQL-replayable) plus a "
    "flag that the approx sits within 1% of it — at accuracy=10000 the "
    "rank error is ≤ n/10000, far inside that margin (the tight bound "
    "stays pytest-pinned). Both values compute in one grouped pass.",
    tier=2,
)
def a4_percentile_approx(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", 0.95), 4).alias("p95_exact"),
        (
            F.abs(
                F.percentile_approx("l_extendedprice", 0.95, 10000)
                - F.percentile("l_extendedprice", 0.95)
            )
            <= 0.01 * F.percentile("l_extendedprice", 0.95)
        )
        .cast("int")
        .alias("within_1pct"),
    )


@query(
    "a1_approx_count_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders_exact,
           1 AS within_3rsd
    FROM lineitem GROUP BY l_returnflag
    """,
    note="A1 at scale: HyperLogLog++ countDistinct — fixed-size sketch per "
    "group vs the exact variant's per-key dedup shuffle. WITHIN-BOUND "
    "oracle (VERDICT r8 #4): sketch registers are engine-specific, so "
    "the driver row hash-checks the exact distinct count plus a flag "
    "that the HLL estimate lands within 3×rsd (rsd=0.01) of it; the "
    "tight relative-error pin stays in pytest.",
    tier=2,
)
def a1_approx_count_distinct(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders_exact"),
        (
            F.abs(
                F.approx_count_distinct("l_orderkey", rsd=0.01).cast(
                    "double"
                )
                - F.countDistinct("l_orderkey").cast("double")
            )
            <= 0.03 * F.countDistinct("l_orderkey").cast("double")
        )
        .cast("int")
        .alias("within_3rsd"),
    )


# --------------------------------------------------------------------------
# §2.1 CSV source/sink family — driver evidence for S1-S3, S5-S7
# --------------------------------------------------------------------------


@query(
    "s_csv_roundtrip",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey,
           ROUND(s_acctbal, 2) AS s_acctbal
    FROM supplier
    """,
    note="S1-S3 + S5-S7 in one driver row, matching the reference's "
    "CSV-first I/O (Parallel/Pattern Extraction.scala:38-45,255-256): "
    "write supplier to a header CSV with a custom '|' delimiter under "
    "the S7 target_files knob (writers.py), read it back through the "
    "declared-StructType typed scan (csv.py — never inferSchema), and "
    "oracle the round-trip against the parquet original. Values "
    "survive bit-exactly: Spark prints doubles shortest-roundtrip, so "
    "parse(write(x)) == x; rounding happens AFTER the round-trip on "
    "both engines",
)
def s_csv_roundtrip(spark, sf_dir):
    import os

    from pyspark.sql import types as T

    from gpssbzd_spark.sources.csv import read_csv
    from gpssbzd_spark.sources.writers import write_partitioned

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".cache",
        "csv_roundtrip",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    sup = _t(spark, sf_dir, "supplier")
    write_partitioned(
        sup,
        out_dir,
        fmt="csv",
        target_files=2,
        options={"header": "true", "delimiter": "|"},
    )
    schema = T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    )
    back = read_csv(spark, out_dir, schema, delimiter="|", header=True)
    return back.select(
        "s_suppkey",
        "s_name",
        "s_nationkey",
        F.round("s_acctbal", 2).alias("s_acctbal"),
    )


@query(
    "s_jsonl_roundtrip",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment,
           ROUND(c_acctbal, 2) AS c_acctbal
    FROM customer
    """,
    note="JSONL source round-trip (sources/jsonl.py — §2.11 extension: "
    "training corpora ship as JSON-lines; the reference is CSV-only): "
    "write customer to JSONL under the S7 target_files knob, read it "
    "back through the declared-StructType PERMISSIVE scan (never "
    "inferSchema — inference is a second full pass at 100 TB), oracle "
    "vs the parquet original. Doubles survive bit-exactly (shortest-"
    "roundtrip printing); rounding happens AFTER the round-trip on both "
    "engines. Corrupt-line quarantine is pinned in tests/"
    "test_sources.py. Rotation alternate of s_csv_roundtrip",
    tier=2,
)
def s_jsonl_roundtrip(spark, sf_dir):
    import os

    from pyspark.sql import types as T

    from gpssbzd_spark.sources.jsonl import read_jsonl
    from gpssbzd_spark.sources.writers import write_partitioned

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".cache",
        "jsonl_roundtrip",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )
    write_partitioned(cust, out_dir, fmt="json", target_files=2)
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_mktsegment", T.StringType()),
            T.StructField("c_acctbal", T.DoubleType()),
        ]
    )
    back = read_jsonl(spark, out_dir, schema)
    return back.select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("c_acctbal"),
    )


@query(
    "s_orc_roundtrip",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority,
           ROUND(o_totalprice, 2) AS o_totalprice
    FROM orders
    """,
    note="ORC source round-trip (§2.1 S-family, third format beside "
    "CSV/JSONL — ORC ships in Spark core, no extra package): write "
    "orders to ORC under the S7 target_files knob, read it back "
    "through a DECLARED schema (spark.read.schema(...).orc — never "
    "inferSchema, same contract as every other source), oracle vs the "
    "parquet original. ORC stores doubles natively, so values survive "
    "bit-exactly and the rounding happens after the round-trip on "
    "both engines. Rotation alternate of s_csv_roundtrip",
    tier=2,
)
def s_orc_roundtrip(spark, sf_dir):
    import os

    from pyspark.sql import types as T

    from gpssbzd_spark.sources.writers import write_partitioned

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".cache",
        "orc_roundtrip",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    write_partitioned(orders, out_dir, fmt="orc", target_files=2)
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_orderpriority", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
        ]
    )
    back = spark.read.schema(schema).orc(out_dir)
    return back.select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )


@query(
    "s_partitioned_pruned_scan",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) / 100.0
             AS sum_price
    FROM lineitem WHERE l_returnflag = 'R'
    GROUP BY l_returnflag
    """,
    note="S-family partition-layout round-trip with DIRECTORY PRUNING "
    "(§2.1 S7): lineitem hive-partitioned by l_returnflag via "
    "write_partitioned (one file per partition dir under the "
    "target_files bound), read back and filtered to one flag — the "
    "filter must land in PartitionFilters so the scan touches ONE "
    "directory of the three (plan-gated in tests/test_plans.py; at "
    "100 TB this is the difference between scanning a day and "
    "scanning the lake). Aggregate oracled against the unpartitioned "
    "original in exact integer cents. Rotation alternate of "
    "s_csv_roundtrip",
    tier=2,
)
def s_partitioned_pruned_scan(spark, sf_dir):
    import os

    from gpssbzd_spark.sources.writers import write_partitioned

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".cache",
        "partitioned_lineitem",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_returnflag"
    )
    write_partitioned(
        li, out_dir, partition_cols=("l_returnflag",), target_files=2
    )
    back = spark.read.parquet(out_dir)
    return (
        back.filter(F.col("l_returnflag") == "R")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            (
                F.sum(
                    F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
                )
                / 100.0
            ).alias("sum_price"),
        )
    )


@query(
    "j9_salted_join",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_mktsegment AS segment
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
    note="J1's skew-hardened twin (operators/skew.py salted_join): the "
    "big side salted by a deterministic hash mod 8, the dim replicated "
    "across the salt space, joined on (key, salt) — identical rows to "
    "the plain equi-join (this oracle IS the plain join), which is the "
    "whole point: salting spreads a hot key over n_salt tasks without "
    "changing semantics, for the joins AQE skew-splitting cannot touch "
    "(stream-static, storage-bucketed). Rotation alternate of "
    "j1_join_inner",
    tier=2,
)
def j9_salted_join(spark, sf_dir):
    from gpssbzd_spark.operators.skew import salted_join

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id")
    dim = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    return salted_join(ev, dim, ["user_id"], n_salt=8).select(
        "event_id", "user_id", "segment"
    )


@query(
    "a10_pivot_wide",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n_O,
           CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n_F,
           CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS n_P,
           ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2)
             AS price_O,
           ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2)
             AS price_F,
           ROUND(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2)
             AS price_P
    FROM orders GROUP BY o_orderpriority
    """,
    note="A10 (extension, operators/reshape.py pivot_wide): long->wide "
    "pivot with DECLARED category values — pivot without them runs an "
    "eager full-table distinct just to learn the columns (a second "
    "100 TB scan) and an unbounded category set explodes the schema; "
    "declared, it is one groupBy with map-side partial agg, same cost "
    "as A7. Empty cells: count coalesced to 0, sum left NULL, matching "
    "the conditional-aggregation form the oracle uses (which is also "
    "what Catalyst lowers pivot to). a2 rotation alternate",
    tier=2,
)
def a10_pivot_wide(spark, sf_dir):
    from gpssbzd_spark.operators.reshape import pivot_wide

    o = _t(spark, sf_dir, "orders")
    wide = pivot_wide(
        o,
        ["o_orderpriority"],
        "o_orderstatus",
        ["O", "F", "P"],
        # count(*) is disallowed inside Pivot — count(lit(1)) is the
        # same aggregate without the star resolution
        {"n": F.count(F.lit(1)), "price": F.round(F.sum("o_totalprice"), 2)},
    )
    return wide.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(f"{v}_n"), F.lit(0)).cast("long").alias(f"n_{v}")
            for v in ("O", "F", "P")
        ],
        *[F.col(f"{v}_price").alias(f"price_{v}") for v in ("O", "F", "P")],
    )


@query(
    "a11_unpivot_long",
    oracle="""
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value
    FROM part
    """,
    note="A11 (extension, operators/reshape.py unpivot_long): wide->long "
    "unpivot (SQL stack) — one output row per (id, measure), row-local "
    "and shuffle-free (the oracle's UNION ALL form would scan twice; "
    "stack scans once). Measures pre-cast to a common double so the "
    "value column type is explicit. a2 rotation alternate",
    tier=2,
)
def a11_unpivot_long(spark, sf_dir):
    from gpssbzd_spark.operators.reshape import unpivot_long

    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        "p_retailprice",
    )
    return unpivot_long(p, ["p_partkey"], ["p_size", "p_retailprice"])


_MERGE_BASE_SQL = """
  SELECT c_custkey, c_name, c_mktsegment, ROUND(c_acctbal, 2) AS c_acctbal
  FROM customer
"""

_MERGE_UPDATES_SQL = """
  SELECT c_custkey, c_name, 'UPDATED' AS c_mktsegment,
         ROUND(c_acctbal + 1000, 2) AS c_acctbal
  FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT c_custkey + 1000000, 'NEW-' || CAST(c_custkey AS VARCHAR),
         'INSERTED', 0.0
  FROM customer WHERE c_custkey % 97 = 0
"""


@query(
    "p15_merge_upsert",
    oracle=f"""
    WITH base AS ({_MERGE_BASE_SQL}), upd AS ({_MERGE_UPDATES_SQL})
    SELECT COALESCE(u.c_custkey, b.c_custkey) AS c_custkey,
           CASE WHEN u.c_custkey IS NOT NULL THEN u.c_name
                ELSE b.c_name END AS c_name,
           CASE WHEN u.c_custkey IS NOT NULL THEN u.c_mktsegment
                ELSE b.c_mktsegment END AS c_mktsegment,
           CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal
                ELSE b.c_acctbal END AS c_acctbal
    FROM base b FULL OUTER JOIN upd u ON b.c_custkey = u.c_custkey
    """,
    note="P15 (extension, operators/cdc.py merge_upsert): apply a "
    "correction batch to a table by key — MERGE INTO's copy-on-write "
    "plan as one full outer join where the update side wins. A small "
    "update batch broadcasts, so the 100 TB base is never shuffled; "
    "the updates here are derived deterministically from the base "
    "(10%-of-keys updates + synthetic inserts) so both engines build "
    "the identical input. p rotation alternate",
    tier=2,
)
def p15_merge_upsert(spark, sf_dir):
    from gpssbzd_spark.operators.cdc import merge_upsert

    base = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("c_acctbal"),
    )
    cust = _t(spark, sf_dir, "customer")
    upd_existing = cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        "c_name",
        F.lit("UPDATED").alias("c_mktsegment"),
        F.round(F.col("c_acctbal") + 1000, 2).alias("c_acctbal"),
    )
    upd_new = cust.filter(F.col("c_custkey") % 97 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.concat(F.lit("NEW-"), F.col("c_custkey").cast("string")).alias("c_name"),
        F.lit("INSERTED").alias("c_mktsegment"),
        F.lit(0.0).alias("c_acctbal"),
    )
    return merge_upsert(base, upd_existing.unionByName(upd_new), ["c_custkey"])


_DIFF_OLD_SQL = """
  SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 2) AS o_totalprice
  FROM orders
"""

_DIFF_NEW_SQL = """
  SELECT o_orderkey, o_orderstatus,
         ROUND(o_totalprice + CASE WHEN o_orderkey % 7 = 0 THEN 10 ELSE 0 END,
               2) AS o_totalprice
  FROM orders WHERE o_orderkey % 13 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000, 'N', 1.0
  FROM orders WHERE o_orderkey % 101 = 0
"""


@query(
    "p16_snapshot_diff",
    oracle=f"""
    WITH old AS ({_DIFF_OLD_SQL}), new AS ({_DIFF_NEW_SQL})
    SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey,
           CASE WHEN n.o_orderkey IS NULL THEN o.o_orderstatus
                ELSE n.o_orderstatus END AS o_orderstatus,
           CASE WHEN n.o_orderkey IS NULL THEN o.o_totalprice
                ELSE n.o_totalprice END AS o_totalprice,
           CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS op
    FROM new n FULL OUTER JOIN old o ON n.o_orderkey = o.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR n.o_orderstatus IS DISTINCT FROM o.o_orderstatus
       OR n.o_totalprice IS DISTINCT FROM o.o_totalprice
    """,
    note="P16 (extension, operators/cdc.py snapshot_diff): CDC between "
    "two snapshots — full outer join on the key, null-side decides "
    "insert/delete, null-safe value comparison decides update vs "
    "unchanged, unchanged rows dropped so output tracks CHURN, not "
    "table size. The new snapshot is derived deterministically from "
    "the old (deletes at %13, +10 price updates at %7, synthetic "
    "inserts at %101) so both engines diff identical inputs. p "
    "rotation alternate",
    tier=2,
)
def p16_snapshot_diff(spark, sf_dir):
    from gpssbzd_spark.operators.cdc import snapshot_diff

    o = _t(spark, sf_dir, "orders")
    old = o.select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    new_mut = o.filter(F.col("o_orderkey") % 13 != 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.round(
            F.col("o_totalprice")
            + F.when(F.col("o_orderkey") % 7 == 0, 10).otherwise(0),
            2,
        ).alias("o_totalprice"),
    )
    new_ins = o.filter(F.col("o_orderkey") % 101 == 0).select(
        (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"),
        F.lit(1.0).alias("o_totalprice"),
    )
    return snapshot_diff(old, new_mut.unionByName(new_ins), ["o_orderkey"])


_SCD2_SNAP_SQL = """
      SELECT user_id, snap_day, state FROM (
        SELECT user_id,
               CAST(date_trunc('day', ts) AS DATE) AS snap_day,
               event_type AS state,
               row_number() OVER (
                 PARTITION BY user_id, date_trunc('day', ts)
                 ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
      ) WHERE rn = 1
"""


def _scd2_oracle() -> str:
    from gpssbzd_spark.operators.cdc import scd2_history_sql

    inner = scd2_history_sql(
        _SCD2_SNAP_SQL, ["user_id"], ["state"], "snap_day"
    )
    # validity bounds as VARCHAR dates: engines disagree on whether a
    # DATE survives the pandas bridge as date or midnight timestamp
    return f"""
    SELECT user_id, state,
           CAST(CAST(valid_from AS DATE) AS VARCHAR) AS valid_from,
           CAST(CAST(valid_to AS DATE) AS VARCHAR) AS valid_to,
           is_current
    FROM ({inner})
    """


@query(
    "p17_scd2_history",
    oracle=_scd2_oracle(),
    note="P17 (extension, operators/cdc.py scd2_history): type-2 "
    "slowly-changing-dimension history — the third CDC leg beside "
    "merge_upsert (p15) and snapshot_diff (p16). Daily per-user state "
    "snapshots (last event_type of the day, deterministic by ts + "
    "event_id tiebreak) collapse into validity runs: one row per value "
    "change with valid_from / exclusive valid_to / is_current, the "
    "table every as-of join (j7) presupposes. Null-safe change flags; "
    "ONE exchange on the key shared by the lag flags, run ids, collapse "
    "and the valid_to lead. Full DuckDB oracle (IS DISTINCT FROM twin). "
    "p7 rotation alternate.",
    tier=2,
)
def p17_scd2_history(spark, sf_dir):
    from gpssbzd_spark.operators.cdc import scd2_history

    ev = _t(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    wd = Window.partitionBy(
        "user_id", F.date_trunc("day", F.col("ts"))
    ).orderBy(F.col("ts").desc(), F.col("event_id").desc())
    snaps = (
        ev.withColumn("_rn", F.row_number().over(wd))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            F.date_trunc("day", F.col("ts")).cast("date").alias("snap_day"),
            F.col("event_type").alias("state"),
        )
    )
    out = scd2_history(snaps, ["user_id"], ["state"], "snap_day")
    return out.select(
        "user_id",
        "state",
        F.col("valid_from").cast("string").alias("valid_from"),
        F.col("valid_to").cast("string").alias("valid_to"),
        "is_current",
    )
