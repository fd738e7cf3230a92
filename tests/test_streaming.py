"""Batch/stream parity tests (SURVEY.md §5.5): the same window/dedup/
sessionize definition run (a) on the static events table and (b) through
Structured Streaming with an availableNow drain must agree — the
streaming analogue of the reference's standalone-vs-parallel
differential methodology.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from gpssbzd_spark.sources.tables import load_table
from gpssbzd_spark.streaming import (
    dedup_within_watermark,
    enrich_with_dim,
    read_parquet_stream,
    run_to_memory_sink,
    session_window_agg,
    streaming_gap_sessionize,
    tumbling_window_agg,
)

SF = "/root/testdata/sf0.001"
EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Static events rewritten as a 3-file parquet dir, file boundaries
    on disjoint time ranges and mtimes increasing with time range — so
    maxFilesPerTrigger=1 yields micro-batches in event-time order and
    cross-batch state is genuinely exercised."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    ev = load_table(spark, SF, "events").orderBy("ts")
    pdf = ev.toPandas().sort_values("ts").reset_index(drop=True)
    n = len(pdf)
    cuts = [0, n // 3, 2 * n // 3, n]
    now = time.time()
    for i in range(3):
        part = pdf.iloc[cuts[i] : cuts[i + 1]]
        path = os.path.join(out, f"part-{i}.parquet")
        # micros, not pandas' default nanos: the streaming reader has a
        # declared TimestampType schema and NANOS parquet would be illegal
        part.to_parquet(
            path, index=False, coerce_timestamps="us", allow_truncated_timestamps=True
        )
        os.utime(path, (now + i, now + i))
    return out


def _drain(df, name, mode):
    return run_to_memory_sink(df, query_name=name, output_mode=mode)


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_window_batch_stream_parity(spark, events_dir):
    batch = tumbling_window_agg(
        load_table(spark, SF, "events"),
        ts_col="ts",
        duration="1 hour",
        keys=["event_type"],
        aggs=[F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s")],
    )
    stream = tumbling_window_agg(
        read_parquet_stream(spark, events_dir, EVENTS_SCHEMA, max_files_per_trigger=1),
        ts_col="ts",
        duration="1 hour",
        keys=["event_type"],
        aggs=[F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s")],
        watermark="1 minute",
    )
    got = _drain(stream, "tumbling_parity", "complete")
    cols = ("window_start", "event_type", "n", "s")
    assert _rows(got, *cols) == _rows(batch, *cols)


def test_windowed_histogram_batch_stream_parity(spark, events_dir):
    """windowed_histogram (the streaming half of drift monitoring):
    the streamed per-window bucket counts must equal the batch twin's
    — same clamped fixed bins, null values excluded on both paths."""
    from gpssbzd_spark.streaming.windows import windowed_histogram

    kw = dict(
        ts_col="ts", value_col="value", duration="1 hour",
        lo=0.0, hi=500.0, n_bins=10,
    )
    batch = windowed_histogram(load_table(spark, SF, "events"), **kw)
    stream = windowed_histogram(
        read_parquet_stream(spark, events_dir, EVENTS_SCHEMA, max_files_per_trigger=1),
        watermark="1 minute",
        **kw,
    )
    got = _drain(stream, "hist_parity", "complete")
    cols = ("window_start", "bucket", "n")
    assert _rows(got, *cols) == _rows(batch, *cols)


def test_windowed_drift_psi_batch_stream_parity(spark, events_dir):
    """windowed_drift_psi (the composed drift monitor): the streamed
    per-closed-window PSI must equal the batch twin's. Chained
    stateful aggregations only support APPEND output, which emits a
    window once the watermark passes its end — so the comparison set
    is exactly the batch windows with window_end <= final watermark
    (max event ts − delay); the still-open tail windows are expected
    to be withheld, not lost."""
    from gpssbzd_spark.streaming.windows import windowed_drift_psi

    kw = dict(
        ts_col="ts", value_col="value", duration="1 hour",
        lo=0.0, hi=500.0, n_bins=10, ref_counts=[1.0] * 10,
    )
    ev = load_table(spark, SF, "events")
    batch = windowed_drift_psi(ev, **kw)
    stream = windowed_drift_psi(
        read_parquet_stream(spark, events_dir, EVENTS_SCHEMA, max_files_per_trigger=1),
        watermark="1 minute",
        **kw,
    )
    got = _drain(stream, "drift_psi_parity", "append")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    wm = max_ts - __import__("datetime").timedelta(minutes=1)
    expected = batch.filter(F.col("window_end") <= F.lit(wm))
    cols = ("window_start", "window_end", "n_rows", "psi")
    got_rows = _rows(got, *cols)
    assert got_rows == _rows(expected, *cols)
    assert len(got_rows) > 10  # the drain genuinely closed windows


def test_windowed_drift_psi_semantics(spark):
    """PSI semantics through the windowed monitor: a window matching
    the reference scores ~0; a window with all mass in one bin vs a
    uniform reference scores far above the 0.25 'shifted' gate; bins
    the window never observed contribute their floor term (mass
    leaving a bin must raise PSI, not vanish)."""
    from gpssbzd_spark.streaming.windows import windowed_drift_psi

    rows = []
    # window 0: 100 rows uniform over 10 bins (values 5,15,...,95)
    for i in range(100):
        rows.append(("2024-01-01 00:30:00", float((i % 10) * 10 + 5)))
    # window 1: 100 rows all in bin 0
    for _ in range(100):
        rows.append(("2024-01-01 01:30:00", 5.0))
    df = spark.createDataFrame(rows, "ts string, value double").select(
        F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    out = {
        r.window_start.hour: r
        for r in windowed_drift_psi(
            df, "ts", "value", "1 hour", 0.0, 100.0, 10, [1.0] * 10
        ).collect()
    }
    assert out[0].psi == 0.0
    assert out[1].psi > 0.25  # 'shifted' by any PSI rulebook
    # 9 unobserved bins each contribute (1e-6 - 0.1)*ln(1e-6/0.1); the
    # observed bin (1.0 - 0.1)*ln(1.0/0.1) — pin the closed form
    import math

    expect = 9 * (1e-6 - 0.1) * math.log(1e-6 / 0.1) + 0.9 * math.log(10.0)
    assert abs(out[1].psi - round(expect, 4)) < 1e-9
    assert out[0].n_rows == 100 and out[1].n_rows == 100


def test_windowed_drift_psi_matches_batch_gate(spark):
    """Cross-operator consistency: with ONE window spanning all rows
    and the reference set to the other drop's histogram counts, the
    streaming monitor's PSI must equal operators/profile.drift_psi on
    the same two drops (same bins, same floor, same arithmetic) — the
    composed monitor IS the batch gate, windowed."""
    from gpssbzd_spark.operators.profile import drift_psi
    from gpssbzd_spark.streaming.windows import windowed_drift_psi

    a = spark.range(0, 2000).select(
        F.lit("2024-01-01 00:10:00").cast("timestamp").alias("ts"),
        ((F.col("id") % 37) * 2.7).alias("x"),
    )
    b = spark.range(0, 1500).select(((F.col("id") % 23) * 4.1).alias("x"))
    lo, hi, n = 0.0, 100.0, 10
    batch = drift_psi(a, b, {"x": (lo, hi, n)}).collect()[0].psi

    # reference = b's clamped histogram over the same bins
    w = (hi - lo) / n
    bucket = F.least(
        F.greatest(F.floor((F.col("x") - lo) / w).cast("int"), F.lit(0)),
        F.lit(n - 1),
    )
    counts = {
        r.b: r.n
        for r in b.groupBy(bucket.alias("b")).agg(F.count("*").alias("n")).collect()
    }
    ref = [float(counts.get(i, 0)) for i in range(n)]
    got = windowed_drift_psi(
        a, "ts", "x", "1 hour", lo, hi, n, ref_counts=ref
    ).collect()
    assert len(got) == 1
    assert got[0].psi == batch
    assert got[0].n_rows == 2000


def test_session_window_batch_stream_parity(spark, events_dir):
    batch = session_window_agg(
        load_table(spark, SF, "events"), ts_col="ts", gap="30 minutes",
        keys=["user_id"], aggs=[F.count("*").alias("n")],
    )
    stream = session_window_agg(
        read_parquet_stream(spark, events_dir, EVENTS_SCHEMA, max_files_per_trigger=1),
        ts_col="ts", gap="30 minutes",
        keys=["user_id"], aggs=[F.count("*").alias("n")],
        watermark="1 minute",
    )
    got = _drain(stream, "session_parity", "complete")
    cols = ("user_id", "session_start", "session_end", "n")
    assert _rows(got, *cols) == _rows(batch, *cols)


def test_session_window_requires_watermark_on_stream(spark, events_dir):
    stream = read_parquet_stream(spark, events_dir, EVENTS_SCHEMA)
    with pytest.raises(ValueError, match="watermark"):
        session_window_agg(stream, ts_col="ts", gap="30 minutes")


def test_streaming_dedup_within_watermark(spark, events_dir):
    """Re-delivered event_ids within the watermark are dropped; batch
    twin is plain dropDuplicates."""
    stream = read_parquet_stream(spark, events_dir, EVENTS_SCHEMA)
    dup = stream.union(stream)  # every event delivered twice
    deduped = dedup_within_watermark(dup, ["event_id"], ts_col="ts", delay="10 minutes")
    got = _drain(deduped, "dedup_parity", "append")
    n_unique = load_table(spark, SF, "events").count()
    assert got.count() == n_unique
    assert got.select("event_id").distinct().count() == n_unique


def test_enrich_dim_batch_stream_parity(spark, events_dir):
    """Stream-static join: the same enrich_with_dim call over the static
    events table and over the 3-file stream must attach identical dim
    attributes (the join is stateless, so parity holds per micro-batch)."""
    dim = load_table(spark, SF, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    cols = ("event_id", "user_id", "segment")
    batch = enrich_with_dim(
        load_table(spark, SF, "events"), dim, on=["user_id"]
    ).select(*cols)
    stream = enrich_with_dim(
        read_parquet_stream(spark, events_dir, EVENTS_SCHEMA, max_files_per_trigger=1),
        dim,
        on=["user_id"],
    ).select(*cols)
    got = _drain(stream, "enrich_dim_parity", "append")
    assert _rows(got, *cols) == _rows(batch, *cols)


def test_stateful_gap_sessionize_batch_stream_parity(spark, events_dir):
    """applyInPandasWithState must carry (last_ts, segment) across
    micro-batches: with 3 time-ordered files at maxFilesPerTrigger=1,
    any state loss shows up as segment ids resetting per batch."""
    batch = streaming_gap_sessionize(
        load_table(spark, SF, "events"), gap_seconds=1800.0
    )
    stream = streaming_gap_sessionize(
        read_parquet_stream(spark, events_dir, EVENTS_SCHEMA, max_files_per_trigger=1),
        gap_seconds=1800.0,
    )
    got = _drain(stream, "gap_sessionize_parity", "append")
    cols = ("user_id", "ts", "segment_id")
    assert _rows(got, *cols) == _rows(batch, *cols)


def test_stateful_sessionize_matches_window_formulation(spark):
    """The stateful kernel and the lag+running-sum window (the w7 corpus
    shape / reference pattern segmentation) assign identical segments."""
    from pyspark.sql import Window

    ev = load_table(spark, SF, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts", 1).over(w))
    wsum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    windowed = ev.withColumn(
        "is_new", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    ).select("user_id", "ts", F.sum("is_new").over(wsum).alias("segment_id"))
    stateful = streaming_gap_sessionize(ev, gap_seconds=1800.0)
    cols = ("user_id", "ts", "segment_id")
    assert _rows(stateful, *cols) == _rows(windowed, *cols)


def test_sliding_window_corpus_aggregates_sum_not_avg():
    """Pins the st_sliding_window rounding-tie decision: an AVG of
    2-decimal inputs over small per-window counts lands on the x.xx5
    rounding boundary so often that last-ulp summation-order differences
    between Spark and the DuckDB oracle flip round() either way — the
    corpus entry therefore aggregates SUM (a safe 1e-10 from any
    boundary). A change back to avg would reintroduce the flake
    silently; this fails it loudly."""
    from gpssbzd_spark import corpus

    corpus._load_all()
    q = corpus.CORPUS["st_sliding_window"]
    import inspect

    src = inspect.getsource(q.fn)
    assert "sum" in src and 'alias("sum_value")' in src
    assert "avg" not in src.replace("# sum, not avg", "")
    assert "AVG" not in (q.oracle or "")


def test_stateful_sessionize_keeps_null_keys(spark):
    """Spark's groupBy keeps NULL grouping keys; the batch sessionizer's
    pandas groupby must too (dropna=False), and the chunk-tail carry must
    detect a NaN tail — r01 dropped null-key rows depending on where in
    the Arrow chunk they landed."""
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 8, 0, 0)
    rows = [
        (None, t0),
        (None, t0 + dt.timedelta(hours=2)),  # gap > 30 min → new segment
        (7, t0),
        (7, t0 + dt.timedelta(minutes=5)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = streaming_gap_sessionize(ev, gap_seconds=1800.0)
    got = [
        (r["user_id"], r["segment_id"])
        for r in out.orderBy(F.col("user_id").asc_nulls_first(), "ts").collect()
    ]
    # all 4 rows survive; null key sessionizes as its own group
    assert got == [(None, 1), (None, 2), (7, 1), (7, 1)]


def test_parquet_sink_checkpoint_resumes_incrementally(spark, tmp_path):
    """The production sink pattern: availableNow + checkpoint. Run 1
    drains the files present; new files land; run 2 must process ONLY
    the new files (the checkpoint's source log carries the high-water
    mark) and the sink directory accumulates exactly one copy of every
    input row."""
    from gpssbzd_spark.streaming import write_parquet_stream

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    ev = load_table(spark, SF, "events").orderBy("event_id").limit(600).toPandas()
    ev.iloc[:400].to_parquet(
        os.path.join(src, "a.parquet"), index=False,
        coerce_timestamps="us", allow_truncated_timestamps=True,
    )

    def run():
        stream = read_parquet_stream(spark, src, EVENTS_SCHEMA)
        agg = stream.select("event_id", "user_id", "value")
        write_parquet_stream(agg, sink, ckpt)

    run()
    first = spark.read.parquet(sink)
    assert first.count() == 400

    ev.iloc[400:].to_parquet(
        os.path.join(src, "b.parquet"), index=False,
        coerce_timestamps="us", allow_truncated_timestamps=True,
    )
    run()
    out = spark.read.parquet(sink)
    assert out.count() == 600  # 400 + 200, no reprocessing of a.parquet
    assert out.select("event_id").distinct().count() == 600


def test_stream_stream_interval_join_batch_stream_parity(spark, events_dir):
    """Stream-stream interval join: the same stream_stream_interval_join
    call over static events (twice) and over TWO 3-file streams of the
    same dir must pair identical (error, follow-up) events. With
    maxFilesPerTrigger=1 the sides' micro-batches interleave, so
    cross-batch pairs (error in file 0, follow-up in file 1) only
    appear if both sides' join state is genuinely buffered until the
    watermark passes — state loss or premature eviction drops them."""
    from gpssbzd_spark.streaming.windows import stream_stream_interval_join

    cols = ("err_event", "follow_event", "user_id")

    def build(left, right):
        j = stream_stream_interval_join(
            left.filter(F.col("event_type") == "error"),
            right,
            on=["user_id"],
            max_delay="2 hours",
            watermark="10 hours",
        )
        return j.select(
            F.col("l.event_id").alias("err_event"),
            F.col("r.event_id").alias("follow_event"),
            F.col("l.user_id").alias("user_id"),
        )

    ev = load_table(spark, SF, "events")
    batch = build(ev, ev)
    stream = build(
        read_parquet_stream(spark, events_dir, EVENTS_SCHEMA, max_files_per_trigger=1),
        read_parquet_stream(spark, events_dir, EVENTS_SCHEMA, max_files_per_trigger=1),
    )
    got = _drain(stream, "stream_stream_join_parity", "append")
    rows = _rows(got, *cols)
    assert rows == _rows(batch, *cols)
    # the fixture's files split on time boundaries, so at least one pair
    # must genuinely cross a micro-batch boundary for the state claim
    assert rows, "no joined rows at all — fixture too sparse"


def test_upsert_sink_last_write_wins_and_incremental(spark, tmp_path):
    """The foreachBatch upsert sink (streaming/sources.py
    upsert_parquet_sink): the target holds exactly one row per key —
    the latest by ts — across (1) multiple interleaved micro-batches of
    one run (maxFilesPerTrigger=1 forces per-file batches whose merges
    compound), and (2) a second checkpointed run over late-arriving
    files that must update existing keys without reprocessing old
    ones."""
    from gpssbzd_spark.streaming.sources import upsert_parquet_sink

    src = str(tmp_path / "src")
    target = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    ev = (
        load_table(spark, SF, "events")
        .orderBy("event_id")
        .limit(600)
        .select("event_id", "ts", "user_id", "value")
        .toPandas()
    )
    for i, sl in enumerate((ev.iloc[:200], ev.iloc[200:400])):
        sl.to_parquet(
            os.path.join(src, f"f{i}.parquet"), index=False,
            coerce_timestamps="us", allow_truncated_timestamps=True,
        )

    schema = "event_id long, ts timestamp, user_id long, value double"

    def run():
        stream = read_parquet_stream(
            spark, src, schema, max_files_per_trigger=1
        )
        upsert_parquet_sink(
            stream, target, ckpt, keys=["user_id"], order_col="ts"
        )

    def expected(pdf):
        latest = pdf.sort_values(["user_id", "ts", "event_id"]).groupby(
            "user_id", as_index=False
        ).last()
        return {
            (r.user_id): (r.ts, r.value) for r in latest.itertuples()
        }

    run()
    got = {
        r.user_id: (r.ts, r.value)
        for r in spark.read.parquet(target).collect()
    }
    # ties on (user_id, ts) resolve by row_number order — the fixture
    # has unique (user_id, ts) pairs in this slice, so last() matches
    assert got == expected(ev.iloc[:400])
    assert len(got) == ev.iloc[:400]["user_id"].nunique()

    # late file: only the new rows are merged (checkpoint high-water)
    ev.iloc[400:].to_parquet(
        os.path.join(src, "f2.parquet"), index=False,
        coerce_timestamps="us", allow_truncated_timestamps=True,
    )
    run()
    got2 = {
        r.user_id: (r.ts, r.value)
        for r in spark.read.parquet(target).collect()
    }
    assert got2 == expected(ev)


def test_stateful_funnel_batch_stream_parity(spark, events_dir):
    """streaming_funnel: cross-micro-batch state (3 time-ordered files
    at maxFilesPerTrigger=1) must converge to the batch funnel — the
    LAST emission per user (max steps_completed; earlier emissions are
    prefixes since set steps are immutable) equals funnel_times."""
    from gpssbzd_spark.operators.funnel import funnel_times
    from gpssbzd_spark.streaming import streaming_funnel

    steps = ["view", "click", "purchase"]
    stream = streaming_funnel(
        read_parquet_stream(spark, events_dir, EVENTS_SCHEMA, max_files_per_trigger=1),
        steps,
        within=604800.0,
    )
    got = _drain(stream, "funnel_parity", "append")
    rows = got.collect()
    assert len(rows) > 0
    last = {}
    for r in rows:
        cur = last.get(r.user_id)
        if cur is None or r.steps_completed > cur.steps_completed:
            last[r.user_id] = r
        elif r.steps_completed == cur.steps_completed:
            # same progress must mean the identical row (immutability)
            assert (r.t1, r.t2, r.t3) == (cur.t1, cur.t2, cur.t3)
    batch = {
        r.user_id: (r.t1, r.t2, r.t3, r.steps_completed)
        for r in funnel_times(
            load_table(spark, SF, "events"), steps, within=604800.0
        ).collect()
    }
    got_final = {
        u: (r.t1, r.t2, r.t3, r.steps_completed) for u, r in last.items()
    }
    assert got_final == batch


def test_streaming_funnel_null_ts_and_string_key(spark):
    """ADVICE r5: (1) a null-ts event of a step type must be ignored,
    not become INT64_MIN in the kernel's epoch cast (funnel_times
    ignores null ts via F.min; the kernel must match); (2) key types
    follow the input — a string user key must survive the pandas/Arrow
    boundary instead of hitting a hardcoded 'long' output schema."""
    from datetime import datetime

    from gpssbzd_spark.streaming import streaming_funnel

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        ("alice", t(0), "view"),
        ("alice", None, "click"),  # null ts: must NOT set t2
        ("alice", t(10), "click"),
        ("bob", None, "view"),  # bob's ONLY view has null ts: never enters
        ("bob", t(5), "click"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_type string"
    )
    out = {
        r.user_id: (r.t1, r.t2, r.steps_completed)
        for r in streaming_funnel(ev, ["view", "click"]).collect()
    }
    assert out == {"alice": (t(0), t(10), 2)}


def test_incremental_dedup_batch_stream_parity(spark, tmp_path):
    """Ingest-time dedup against the persisted signature index must
    agree between the batch twin (dropDuplicates) and a true 3-file
    stream (dedup_within_watermark): the row-local signer and the
    stream-static band join are stateless, so every match event a
    batch run finds must surface from the stream exactly once."""
    import os
    import time as _time

    from gpssbzd_spark.dataprep.dedup import (
        incremental_neardup_flags_stateless,
        minhash_signatures_portable,
    )

    d = load_table(spark, SF, "documents").select("doc_id", "text")
    hist = d.filter(F.col("doc_id") % 3 != 0)
    delta = d.filter(F.col("doc_id") % 3 == 0).unionByName(
        hist.filter(F.col("doc_id") % 10 == 1).withColumn(
            "doc_id", F.col("doc_id") + 1000000
        )
    )
    # the delta needs an event-time column for the stream's bounded
    # dedup; synthesize one MONOTONE in doc_id (the file-split key) so
    # no row can fall behind the advancing watermark at ANY fixture
    # size — a cyclic ts (doc_id % N) would start dropping file-2 rows
    # as late the moment ids outgrow the watermark delay
    delta_ts = delta.withColumn(
        "ts", F.timestamp_seconds(1700000000 + F.col("doc_id"))
    )
    index_sigs = minhash_signatures_portable(hist).localCheckpoint()

    batch = (
        incremental_neardup_flags_stateless(delta_ts, index_sigs)
        .dropDuplicates(["delta_id", "index_id"])
    )
    expect = {
        (r.delta_id, r.index_id, r.n_agree) for r in batch.collect()
    }
    assert expect  # seeded twins guarantee matches

    out = str(tmp_path / "delta_stream")
    os.makedirs(out)
    pdf = delta_ts.toPandas().sort_values("doc_id").reset_index(drop=True)
    n = len(pdf)
    cuts = [0, n // 3, 2 * n // 3, n]
    now = _time.time()
    for i in range(3):
        p = os.path.join(out, f"part-{i}.parquet")
        pdf.iloc[cuts[i]:cuts[i + 1]].to_parquet(
            p, index=False, coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
        os.utime(p, (now + i, now + i))

    stream = read_parquet_stream(
        spark, out, "doc_id long, text string, ts timestamp",
        max_files_per_trigger=1,
    )
    flags = incremental_neardup_flags_stateless(
        stream, index_sigs, carry_cols=("ts",)
    )
    deduped = dedup_within_watermark(
        flags, ["delta_id", "index_id"], ts_col="ts", delay="10 minutes"
    ).select("delta_id", "index_id", "n_agree")
    got = {
        (r.delta_id, r.index_id, r.n_agree)
        for r in _drain(deduped, "incr_dedup_parity", "append").collect()
    }
    assert got == expect


def test_streaming_ingest_loop_matches_batch_post_state(spark, tmp_path):
    """The r11 composed ingest loop, driven by a TRUE file stream: a
    foreachBatch sink runs match → accept → land-accepted →
    sig_index_ingest per microbatch (one landed file per trigger, so
    'days' arrive in order), with the stream's checkpoint playing the
    pickup-manifest role. The post-state — accepted ids + persisted
    index signatures — must equal the batch loop's
    (dp_pipeline_ingest_e2e semantics): day-1 all accepted into the
    index, day-2's seeded copies rejected against it."""
    import os

    from gpssbzd_spark.dataprep.dedup import (
        incremental_neardup_matches,
        minhash_signatures_portable,
    )
    from gpssbzd_spark.dataprep.sigindex import (
        sig_index_ingest,
        sig_index_read,
    )

    d = load_table(spark, SF, "documents").select("doc_id", "text")
    day1 = d.filter(F.col("doc_id") % 3 != 0)
    day2 = d.filter(F.col("doc_id") % 3 == 0).unionByName(
        day1.filter(F.col("doc_id") % 10 == 1).withColumn(
            "doc_id", F.col("doc_id") + 1000000
        )
    )

    # batch reference post-state
    idx1 = minhash_signatures_portable(day1).localCheckpoint()
    matched = (
        incremental_neardup_matches(
            minhash_signatures_portable(day2), idx1
        )
        .select(F.col("delta_id").alias("doc_id"))
        .distinct()
    )
    accepted_ref = day1.unionByName(day2.join(matched, "doc_id", "left_anti"))
    expect_ids = {r.doc_id for r in accepted_ref.select("doc_id").collect()}
    expect_sigs = {
        tuple(r)
        for r in minhash_signatures_portable(accepted_ref).collect()
    }

    # stream: land day1 and day2 as one file each, drain with
    # maxFilesPerTrigger=1 so the microbatches arrive day-by-day
    import time as _time

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    now = _time.time()
    for i, ddf in enumerate((day1, day2)):
        p = os.path.join(landing, f"day-{i}.parquet")
        ddf.toPandas().to_parquet(p, index=False)
        os.utime(p, (now + i, now + i))
    index_dir = str(tmp_path / "sigidx")
    accepted_root = str(tmp_path / "accepted")

    def ingest_batch(batch_df, batch_id):
        index_sigs = sig_index_read(spark, index_dir)
        accepted = batch_df
        if index_sigs is not None:
            hits = (
                incremental_neardup_matches(
                    minhash_signatures_portable(batch_df), index_sigs
                )
                .select(F.col("delta_id").alias("doc_id"))
                .distinct()
            )
            accepted = batch_df.join(hits, "doc_id", "left_anti")
        adir = os.path.join(accepted_root, f"batch-{batch_id}")
        accepted.write.mode("overwrite").parquet(adir)
        sig_index_ingest(spark, adir, index_dir)

    stream = read_parquet_stream(
        spark, landing, "doc_id long, text string", max_files_per_trigger=1
    )
    q = (
        stream.writeStream.foreachBatch(ingest_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got_ids = {
        r.doc_id
        for r in spark.read.parquet(accepted_root + "/batch-*")
        .select("doc_id")
        .collect()
    }
    got_sigs = {tuple(r) for r in sig_index_read(spark, index_dir).collect()}
    assert got_ids == expect_ids
    assert got_sigs == expect_sigs
    # the seeded copies really were rejected by the streamed loop
    assert not any(i >= 1000000 for i in got_ids)
