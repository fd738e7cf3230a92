"""As-of and range join operators (SURVEY.md §2.3 extension surface).

Oracle coverage lives in test_corpus_oracle (j7/j8 vs DuckDB, including
DuckDB's native ASOF LEFT JOIN); here: constructed edge cases — ties,
no-match rows, duplicate right timestamps — and the physical-plan
contracts (as-of is ONE shuffle and zero join nodes; range join is a
broadcast nested loop, never a cartesian product).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gpssbzd_spark.operators.joins import (
    asof_join_backward,
    asof_join_forward,
    range_join_broadcast,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            ("a", _ts("2026-01-01 10:00:00"), 1),  # before any right row
            ("a", _ts("2026-01-01 10:05:00"), 2),  # exact tie with right
            ("a", _ts("2026-01-01 10:30:00"), 3),  # after both right rows
            ("b", _ts("2026-01-01 09:00:00"), 4),  # key with no right rows
        ],
        "k string, t timestamp, row_id int",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2026-01-01 10:05:00"), 50.0),
            ("a", _ts("2026-01-01 10:05:00"), 40.0),  # duplicate ts: max wins
            ("a", _ts("2026-01-01 10:20:00"), 60.0),
        ],
        "k string, t timestamp, v double",
    )
    out = {
        r["row_id"]: r["asof_v"]
        for r in asof_join_backward(
            left, right, on="k", time_col="t", value_cols=["v"]
        ).collect()
    }
    assert out[1] is None  # nothing at-or-before
    assert out[2] == 50.0  # inclusive match at equal ts; max wins the dup
    assert out[3] == 60.0  # latest preceding, not first
    assert out[4] is None  # key absent from right


def test_asof_forward_semantics(spark):
    left = spark.createDataFrame(
        [
            ("a", _ts("2026-01-01 10:00:00"), 1),  # before both right rows
            ("a", _ts("2026-01-01 10:05:00"), 2),  # exact tie with right
            ("a", _ts("2026-01-01 10:30:00"), 3),  # after all right rows
        ],
        "k string, t timestamp, row_id int",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2026-01-01 10:05:00"), 50.0),
            ("a", _ts("2026-01-01 10:05:00"), 40.0),  # duplicate ts: min wins
            ("a", _ts("2026-01-01 10:20:00"), 60.0),
        ],
        "k string, t timestamp, v double",
    )
    out = {
        r["row_id"]: r["asof_v"]
        for r in asof_join_forward(
            left, right, on="k", time_col="t", value_cols=["v"]
        ).collect()
    }
    assert out[1] == 40.0  # earliest at-or-after; min wins the dup
    assert out[2] == 40.0  # inclusive match at equal ts
    assert out[3] is None  # nothing at-or-after


def test_asof_null_payload_attaches_not_stale(spark):
    """DuckDB ASOF parity: a matched right row whose payload is NULL must
    attach its NULL — not be skipped in favor of a stale older value.
    With multiple value_cols the attached values must come from ONE
    right row (struct-atomic fill)."""
    left = spark.createDataFrame(
        [("a", _ts("2026-01-01 10:30:00"), 1)],
        "k string, t timestamp, row_id int",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2026-01-01 10:00:00"), 7.0, 70.0),
            ("a", _ts("2026-01-01 10:20:00"), None, 80.0),  # latest: v NULL
        ],
        "k string, t timestamp, v double, u double",
    )
    row = asof_join_backward(
        left, right, on="k", time_col="t", value_cols=["v", "u"]
    ).first()
    assert row["asof_v"] is None  # the matched row's NULL, not stale 7.0
    assert row["asof_u"] == 80.0  # same right row


def test_asof_null_key_and_ts_rows_bypass(spark):
    """NULL keys never match (equality-join semantics, not NULL-groups-
    together window partitioning); NULL-ts left rows match nothing."""
    left = spark.createDataFrame(
        [
            (None, _ts("2026-01-01 10:30:00"), 1),
            ("a", None, 2),
            ("a", _ts("2026-01-01 10:30:00"), 3),
        ],
        "k string, t timestamp, row_id int",
    )
    right = spark.createDataFrame(
        [
            (None, _ts("2026-01-01 10:00:00"), 1.0),  # NULL-key right row
            ("a", None, 2.0),                          # NULL-ts right row
            ("a", _ts("2026-01-01 10:00:00"), 3.0),
        ],
        "k string, t timestamp, v double",
    )
    for fn in (asof_join_backward, asof_join_forward):
        out = {
            r["row_id"]: r["asof_v"]
            for r in fn(left, right, on="k", time_col="t", value_cols=["v"]).collect()
        }
        assert len(out) == 3  # every left row exactly once
        assert out[1] is None, fn.__name__  # NULL key matches nothing
        assert out[2] is None, fn.__name__  # NULL ts matches nothing
    assert asof_join_backward(
        left, right, on="k", time_col="t", value_cols=["v"]
    ).filter("row_id = 3").first()["asof_v"] == 3.0


def test_asof_plan_one_shuffle_no_join(spark):
    left = spark.range(100).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 60).alias("t"),
        F.col("id").alias("row_id"),
    )
    right = spark.range(30).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 97).alias("t"),
        (F.col("id") * 1.5).alias("v"),
    )
    df = asof_join_backward(left, right, on="k", time_col="t", value_cols=["v"])
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "Join" not in plan, plan  # union+window, not a range theta-join
    assert "CartesianProduct" not in plan
    # the ONE-shuffle contract, pinned: the window's key-hash exchange is
    # the only exchange in the plan (the NULL-key bypass branch is a
    # shuffle-free filter union)
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_range_join_is_broadcast_nested_loop(spark):
    facts = spark.range(1000).select(F.col("id"), (F.col("id") % 97.0).alias("value"))
    tiers = spark.createDataFrame(
        [("lo", 0.0, 50.0), ("hi", 50.0, 100.0)], "tier string, lo double, hi double"
    )
    df = range_join_broadcast(facts, tiers, value_col="value")
    assert df.count() == 1000  # tiers partition the domain: exactly one each
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_range_join_boundary_semantics(spark):
    facts = spark.createDataFrame(
        [(1, 0.0), (2, 50.0), (3, 100.0)], "id long, value double"
    )
    tiers = spark.createDataFrame(
        [("lo", 0.0, 50.0), ("hi", 50.0, 100.0)], "tier string, lo double, hi double"
    )
    got = {
        r["id"]: r["tier"]
        for r in range_join_broadcast(facts, tiers, value_col="value").collect()
    }
    assert got == {1: "lo", 2: "hi"}  # [lo, hi): 100.0 falls out entirely
