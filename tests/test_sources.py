"""Source/sink layer tests (SURVEY.md §2.1 S1-S7).

CSV scans with declared schemas are exercised end-to-end by the GPS
pipeline tests; here we cover the sink side — partitioned parquet (the
engine's replacement for the reference's per-line directory convention)
and the CSV sink kept for reference-format interchange — plus the
ingest-time timestamp normalization edge (2- vs 4-digit years,
SURVEY.md §7 hard-list d).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from gpssbzd_spark.sources.csv import parse_ping_time, read_csv, GPS_SCHEMA
from gpssbzd_spark.sources.tables import load_table
from gpssbzd_spark.sources.writers import write_partitioned

SF = "/root/testdata/sf0.001"


def test_partitioned_parquet_write_replaces_per_line_dirs(spark, tmp_path):
    """One partitionBy write = the reference's N per-line dirs
    (PPE:255-256), and reading one partition back prunes at the source."""
    out = str(tmp_path / "by_flag")
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )
    write_partitioned(li, out, partition_cols=("l_returnflag",))

    flags = {r.l_returnflag for r in li.select("l_returnflag").distinct().collect()}
    assert {d.split("=")[1] for d in os.listdir(out) if d.startswith("l_returnflag=")} == flags

    back = spark.read.parquet(out).filter(F.col("l_returnflag") == "R")
    back.collect()
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the filter must land in PartitionFilters (dir pruning), not a scan filter
    assert "PartitionFilters: [" in plan
    assert "isnotnull(l_returnflag" in plan.split("PartitionFilters: [", 1)[1][:200]
    assert back.count() == li.filter(F.col("l_returnflag") == "R").count()


def test_csv_sink_header_overwrite_roundtrip(spark, tmp_path):
    """S5/S6: headered CSV out, overwrite mode, typed read back in."""
    out = str(tmp_path / "csv_out")
    n = load_table(spark, SF, "nation")
    for _ in range(2):  # second write exercises overwrite
        n.write.mode("overwrite").option("header", True).csv(out)
    back = (
        spark.read.option("header", True)
        .schema("n_nationkey long, n_name string, n_regionkey long, n_comment string")
        .csv(out)
    )
    assert sorted(r.n_name for r in back.collect()) == sorted(
        r.n_name for r in n.collect()
    )


def test_layout_control_coalesce_single_file(spark, tmp_path):
    """S7: explicit output-file-count control (reference repartition(1));
    ours uses coalesce, and only for small presentation outputs."""
    out = str(tmp_path / "single")
    load_table(spark, SF, "region").coalesce(1).write.parquet(out)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == 1


def test_layout_control_target_files_knob(spark, tmp_path):
    """S7 via the writer API: target_files bounds output file count both
    unpartitioned (coalesce) and per hive dir (one file per partition
    value — the reference's repartition(1)-per-line layout under one
    knob, PPE:127,256)."""
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    flat = str(tmp_path / "flat")
    write_partitioned(li.repartition(8), flat, target_files=2)
    files = [f for f in os.listdir(flat) if f.endswith(".parquet")]
    assert len(files) == 2

    by_flag = str(tmp_path / "by_flag_bounded")
    write_partitioned(
        li, by_flag, partition_cols=("l_returnflag",), target_files=4
    )
    dirs = [d for d in os.listdir(by_flag) if d.startswith("l_returnflag=")]
    assert len(dirs) >= 2
    for d in dirs:
        files = [
            f for f in os.listdir(os.path.join(by_flag, d)) if f.endswith(".parquet")
        ]
        assert len(files) == 1, f"{d} got {len(files)} files"
    # values round-trip, partition pruning intact
    back = spark.read.parquet(by_flag).filter(F.col("l_returnflag") == "R")
    assert back.count() == li.filter("l_returnflag = 'R'").count()


def test_ping_time_parses_two_and_four_digit_years(spark):
    df = spark.createDataFrame(
        [("19-02-01 05:26:15",), ("2019-02-01 05:26:15",), ("garbage",)],
        "t string",
    ).select(parse_ping_time(F.col("t")).alias("ts"))
    got = [r.ts.isoformat() if r.ts else None for r in df.collect()]
    assert got == ["2019-02-01T05:26:15", "2019-02-01T05:26:15", None]


def test_csv_scan_declared_schema_never_infers(spark, tmp_path):
    """S1: a malformed numeric lands as null under the declared schema
    (PERMISSIVE), instead of silently flipping the whole column to
    string as inferSchema would."""
    p = str(tmp_path / "gps.csv")
    with open(p, "w") as f:
        f.write("id,linenumber,opath,lng,lat,t\n")
        f.write("001,L1,seg1,113.9,22.6,19-02-01 05:26:15\n")
        f.write("002,L1,seg1,not_a_number,22.7,19-02-01 05:27:15\n")
    df = read_csv(spark, p, GPS_SCHEMA)
    rows = {r.id: r for r in df.collect()}
    assert rows["001"].lng == 113.9
    assert rows["002"].lng is None
    assert dict(df.dtypes)["lng"] == "double"


def test_load_table_normalizes_ntz_and_nanos_timestamps(spark, tmp_path):
    """The fixtures have shipped events.ts as INT64 TIMESTAMP(NANOS) in
    one round and timestamp[us] isAdjustedToUTC=false (→ TIMESTAMP_NTZ)
    in another; either way load_table must yield TimestampType (LTZ)
    with unix_millis usable and values equal to the naive on-disk
    values under the UTC session (r3 regression: four queries died on
    DATATYPE_MISMATCH for unix_micros(TIMESTAMP_NTZ))."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = pd.to_datetime(["2024-01-01 00:00:00", "2024-06-15 12:34:56"])
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            # no timezone → isAdjustedToUTC=false → Spark infers NTZ
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    d = tmp_path / "sfX"
    d.mkdir()
    pq.write_table(table, str(d / "events.parquet"))

    df = load_table(spark, str(d), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = {
        r["event_id"]: r["ms"]
        for r in df.select("event_id", F.unix_millis("ts").alias("ms")).collect()
    }
    assert got == {1: 1704067200000, 2: 1718454896000}


def test_bucketed_tables_join_without_exchange(spark):
    """Two tables bucketed the same way on the join key must sort-merge
    join with ZERO Exchange nodes — the co-located fact-fact join that
    pays its shuffle once at ingest instead of every query (SURVEY §4;
    the 100 TB reason write_bucketed exists). Broadcast is disabled for
    the probe so the planner cannot sidestep the bucketed path."""
    from gpssbzd_spark.sources.tables import load_table
    from gpssbzd_spark.sources.writers import write_bucketed

    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(orders, "t_orders_b", ("o_orderkey",), 8,
                   sort_cols=("o_orderkey",))
    write_bucketed(li, "t_lineitem_b", ("l_orderkey",), 8,
                   sort_cols=("l_orderkey",))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("t_orders_b")
        b = spark.table("t_lineitem_b")
        joined = a.join(b, a.o_orderkey == b.l_orderkey).select(
            "o_orderkey", "l_quantity", "o_totalprice"
        )
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # the shuffle-once-at-ingest claim: results match the plain join
        n_plain = orders.join(
            li, orders.o_orderkey == li.l_orderkey
        ).count()
        assert joined.count() == n_plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_jsonl_declared_schema_and_corrupt_quarantine(spark, tmp_path):
    """read_jsonl types rows from the declared schema without inference,
    parses only projected fields, and (keep_corrupt=True) quarantines a
    malformed line in _corrupt_record instead of failing the scan."""
    from pyspark.sql import types as T

    from gpssbzd_spark.sources.jsonl import CORRUPT_COL, read_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello", "extra": 9}\n'
        '{"doc_id": 2, "text": "world"}\n'
        "this line is not json at all\n"
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    rows = read_jsonl(spark, str(p), schema).orderBy("doc_id").collect()
    assert [r.doc_id for r in rows] == [None, 1, 2]  # bad line nulled, kept
    assert rows[1].text == "hello"

    kept = read_jsonl(spark, str(p), schema, keep_corrupt=True)
    bad = kept.filter(F.col(CORRUPT_COL).isNotNull()).collect()
    assert len(bad) == 1 and bad[0][CORRUPT_COL].startswith("this line")


def test_parse_json_col_typed_struct_and_null_on_malformed(spark):
    from gpssbzd_spark.sources.jsonl import parse_json_col

    df = spark.createDataFrame(
        [(1, '{"k": 3.5, "tag": "a"}'), (2, "{broken")],
        "id long, props string",
    )
    out = (
        df.select(
            "id", parse_json_col(F.col("props"), "k double, tag string").alias("p")
        )
        .orderBy("id")
        .collect()
    )
    assert out[0].p.k == 3.5 and out[0].p.tag == "a"
    assert out[1].p is None or out[1].p.k is None  # malformed -> null, no crash


def test_incremental_read_manifest_lifecycle(spark, tmp_path):
    """incremental_read (sources/incremental.py): first batch sees all
    landed files; after commit only newly-landed files are read; an
    uncommitted batch is re-seen (at-least-once); nothing-new returns
    an empty frame under a declared schema; a mutated landed file
    raises."""
    import pyspark.sql.types as T
    import pytest as _pytest

    from gpssbzd_spark.sources.incremental import incremental_read

    landing = str(tmp_path / "landing")
    manifest = str(tmp_path / "manifest")
    schema = T.StructType([T.StructField("id", T.LongType())])

    spark.range(0, 10).coalesce(1).write.parquet(landing)  # batch 1

    df1, new1, commit1 = incremental_read(spark, landing, manifest, schema=schema)
    assert df1.count() == 10 and len(new1) == 1

    # crash before commit: the same files appear again
    df1b, new1b, _ = incremental_read(spark, landing, manifest, schema=schema)
    assert [f.path for f in new1b] == [f.path for f in new1]

    assert commit1() is not None

    # batch 2 lands; only it is read now
    spark.range(100, 105).coalesce(1).write.mode("append").parquet(landing)
    df2, new2, commit2 = incremental_read(spark, landing, manifest, schema=schema)
    assert df2.count() == 5
    assert set(f.path for f in new2).isdisjoint(f.path for f in new1)
    commit2()

    # nothing new: empty frame with the declared schema, no-op commit
    df3, new3, commit3 = incremental_read(spark, landing, manifest, schema=schema)
    assert df3.count() == 0 and new3 == [] and commit3() is None

    # total processed across batches == full directory, exactly once
    assert df1.count() + df2.count() == spark.read.parquet(landing).count()

    # immutability violation: shrink a processed file in place
    victim = new2[0].path.removeprefix("file:")
    with open(victim, "wb") as fh:
        fh.write(b"x")
    with _pytest.raises(ValueError, match="immutable"):
        incremental_read(spark, landing, manifest, schema=schema)


def test_incremental_read_with_upsert_sink_is_effectively_exactly_once(
    spark, tmp_path
):
    """The documented pairing: at-least-once incremental batches into an
    idempotent merge_upsert sink. A crash after processing but BEFORE
    commit() replays the batch; the keyed upsert absorbs the replay, so
    the final table equals processing every landed row exactly once."""
    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    from gpssbzd_spark.operators.cdc import merge_upsert
    from gpssbzd_spark.sources.incremental import incremental_read

    landing = str(tmp_path / "landing")
    manifest = str(tmp_path / "manifest")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.LongType())]
    )

    spark.range(0, 10).select("id", (F.col("id") * 10).alias("v")).coalesce(
        1
    ).write.parquet(landing)

    state = spark.createDataFrame([], schema)

    # batch 1 processed, then "crash" before commit
    df1, _, _commit_never_called = incremental_read(
        spark, landing, manifest, schema=schema
    )
    state = merge_upsert(state, df1, ["id"])

    # restart: same files replay; this run commits
    df1b, _, commit = incremental_read(spark, landing, manifest, schema=schema)
    state = merge_upsert(state, df1b, ["id"])
    commit()

    # batch 2 lands with an update for id=3 and new ids
    spark.createDataFrame([(3, 999), (20, 200)], schema).coalesce(
        1
    ).write.mode("append").parquet(landing)
    df2, _, commit2 = incremental_read(spark, landing, manifest, schema=schema)
    state = merge_upsert(state, df2, ["id"])
    commit2()

    got = {r.id: r.v for r in state.collect()}
    expected = {i: i * 10 for i in range(10)} | {3: 999, 20: 200}
    assert got == expected


def test_compact_landing_rewrites_processed_parts(spark, tmp_path):
    """compact_landing (VERDICT r5 #8): N small processed parts fold
    into target_files parquet; a re-ingest sees NO duplicates (the
    compacted outputs are recorded before they become visible);
    unprocessed files are untouched; repeated rounds converge; and the
    archival content of the landing dir is preserved exactly."""
    import pyspark.sql.types as T

    from gpssbzd_spark.sources.incremental import (
        compact_landing,
        incremental_read,
        list_landed,
    )

    landing = str(tmp_path / "landing")
    manifest = str(tmp_path / "manifest")
    schema = T.StructType([T.StructField("id", T.LongType())])

    # 6 tiny single-row-group parts land and are ingested+committed
    for lo in range(0, 60, 10):
        spark.range(lo, lo + 10).coalesce(1).write.mode("append").parquet(landing)
    df1, new1, commit1 = incremental_read(spark, landing, manifest, schema=schema)
    assert len(new1) == 6 and df1.count() == 60
    commit1()

    # one more file lands but is NOT ingested: compaction must not touch it
    spark.range(100, 105).coalesce(1).write.mode("append").parquet(landing)

    res = compact_landing(spark, landing, manifest, target_files=1)
    assert res.n_input_files == 6 and len(res.outputs) == 1
    assert res.manifest_part is not None

    listed = list_landed(spark, landing)
    names = [f.path.rsplit("/", 1)[1] for f in listed]
    assert sum(n.startswith("compact-") for n in names) == 1
    assert len(listed) == 2  # compacted + the unprocessed newcomer

    # archival content preserved exactly (compacted + pending file)
    assert sorted(
        r.id for r in spark.read.parquet(landing).collect()
    ) == sorted(list(range(60)) + [100, 101, 102, 103, 104])

    # re-ingest: ONLY the unprocessed newcomer appears — the compacted
    # file was recorded before it became visible
    df2, new2, commit2 = incremental_read(spark, landing, manifest, schema=schema)
    assert len(new2) == 1 and df2.count() == 5
    assert sorted(r.id for r in df2.collect()) == [100, 101, 102, 103, 104]
    commit2()

    # second round: compacted file + newcomer converge to ONE file
    res2 = compact_landing(spark, landing, manifest, target_files=1)
    assert res2.n_input_files == 2 and len(res2.outputs) == 1
    assert len(list_landed(spark, landing)) == 1
    assert spark.read.parquet(landing).count() == 65

    # nothing to do below min_files
    res3 = compact_landing(spark, landing, manifest, target_files=1)
    assert res3.manifest_part is None and res3.n_input_files == 0

    # and the manifest still gates correctly: nothing new to ingest
    df3, new3, _ = incremental_read(spark, landing, manifest, schema=schema)
    assert new3 == [] and df3.count() == 0


def test_compact_landing_recovers_from_crash_between_publish_and_delete(
    spark, tmp_path
):
    """The intent-record crash contract: simulate a crash AFTER the
    manifest commit + publish but BEFORE victim deletion (originals and
    compacted copy coexist, both recorded). Recovery on the next call
    must delete the victims instead of re-compacting both copies into
    duplicated content — and ingest never sees a duplicate row at any
    point in between."""
    import json as _json
    import os as _os

    import pyspark.sql.types as T

    from gpssbzd_spark.sources.incremental import (
        compact_landing,
        incremental_read,
    )

    landing = str(tmp_path / "landing")
    manifest = str(tmp_path / "manifest")
    schema = T.StructType([T.StructField("id", T.LongType())])

    for lo in range(0, 30, 10):
        spark.range(lo, lo + 10).coalesce(1).write.mode("append").parquet(landing)
    df1, _, commit1 = incremental_read(spark, landing, manifest, schema=schema)
    assert df1.count() == 30
    commit1()

    res = compact_landing(spark, landing, manifest, target_files=1)
    assert res.n_input_files == 3

    # reconstruct the crash window: resurrect the victims beside the
    # published output and restore the intent file — exactly the state
    # a crash between publish and delete leaves behind
    out_path = res.outputs[0].removeprefix("file:")
    victims = []
    for lo in range(200, 230, 10):
        spark.range(lo, lo + 10).coalesce(1).write.mode("append").parquet(landing)
    df2, new2, commit2 = incremental_read(spark, landing, manifest, schema=schema)
    commit2()
    victims = [f.path for f in new2]
    cid = "deadbeefdeadbeef"
    staged_hidden = f"{landing}/.compact-{cid}-00000.parquet"
    staged_visible = f"{landing}/compact-{cid}-00000.parquet"
    # stage a copy of the victims' content under the hidden name, as a
    # crashed run would have
    import shutil as _shutil

    spark.read.parquet(*victims).coalesce(1).write.parquet(str(tmp_path / "st"))
    part = next(
        p for p in _os.listdir(tmp_path / "st") if p.startswith("part-")
    )
    _shutil.copy(tmp_path / "st" / part, staged_hidden)
    intent = {
        "victims": victims,
        "outputs": [
            {
                "hidden": f"file:{staged_hidden}",
                "visible": f"file:{staged_visible}",
                "size": _os.path.getsize(staged_hidden),
            }
        ],
    }
    with open(f"{manifest}/.compact-{cid}.intent", "w") as fh:
        fh.write(_json.dumps(intent))

    # next compaction call first RECOVERS (publishes the staged file,
    # records it, deletes the victims, drops the intent) and then runs
    # a fresh round over the now-consistent state — which folds the two
    # compacted files into one. Had recovery NOT deleted the victims,
    # the fresh round would have re-compacted original + copy and
    # duplicated their content (caught by the exact-content assert).
    res2 = compact_landing(spark, landing, manifest, target_files=1)
    assert res2.n_input_files == 2
    assert not _os.path.exists(staged_hidden)
    for v in victims:
        assert not _os.path.exists(v.removeprefix("file:"))
    assert not _os.path.exists(f"{manifest}/.compact-{cid}.intent")

    # content exactly once, and nothing new for ingest
    assert sorted(r.id for r in spark.read.parquet(landing).collect()) == (
        sorted(list(range(30)) + list(range(200, 230)))
    )
    df3, new3, _ = incremental_read(spark, landing, manifest, schema=schema)
    assert new3 == [] and df3.count() == 0
