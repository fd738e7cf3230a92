"""Streaming-surface corpus (SURVEY.md §2.9 — engine extension; the
reference is batch-only).

The window builders in ``gpssbzd_spark.streaming.windows`` take batch
or streaming input with identical semantics, so the driver's DuckDB
oracle can check them on the static ``events`` table; true unbounded
execution (watermarks, state stores, availableNow drains) is covered by
``tests/test_streaming.py`` parity tests, which the oracle cannot see.

Timestamp care: gap/session comparisons use exact epoch-microsecond
arithmetic on both sides — DuckDB's ``date_diff('second', …)`` counts
boundary crossings, not elapsed time, and would drift on sub-second
timestamps.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gpssbzd_spark.corpus import query
from gpssbzd_spark.sources.tables import load_table
from gpssbzd_spark.streaming.stateful import streaming_gap_sessionize
from gpssbzd_spark.streaming.windows import (
    enrich_with_dim,
    session_window_agg,
    sliding_window_agg,
    stream_stream_interval_join,
    tumbling_window_agg,
)


@query(
    "st_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    note="tumbling event-time window (F.window 1h) — one shuffle on "
    "(window, key), map-side partial agg; streaming twin drops late rows "
    "past the watermark",
)
def st_tumbling_window(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return tumbling_window_agg(
        ev,
        ts_col="ts",
        duration="1 hour",
        keys=["event_type"],
        aggs=[
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        ],
    )


@query(
    "st_sliding_window",
    oracle="""
    SELECT ws AS window_start,
           ws + INTERVAL '1 hour' AS window_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM (
      SELECT value,
             time_bucket(INTERVAL '30 minutes', ts)
               - o.k * INTERVAL '30 minutes' AS ws
      FROM events CROSS JOIN (VALUES (0), (1)) o(k)
    )
    GROUP BY ws
    """,
    note="sliding window 1h/30m (each event in 2 windows) — Spark fans out "
    "inside the window exec; oracle replicates via an explicit 2-offset "
    "cross join. Tier 2 as st_tumbling_window's rotation alternate: the "
    "two share the windowed-agg driver slot round-robin (corpus "
    "ROTATION_GROUPS) so streaming keeps 4 driver rows while both "
    "window shapes earn driver evidence over rounds",
    tier=2,
)
def st_sliding_window(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return sliding_window_agg(
        ev,
        ts_col="ts",
        duration="1 hour",
        slide="30 minutes",
        aggs=[
            F.count("*").alias("n_events"),
            # sum, not avg: an average of 2-decimal inputs over small
            # counts ties at the rounding boundary (x.xx5) so often that
            # Spark-vs-oracle double rounding diverges; sums of 2-decimal
            # inputs stay a safe 1e-10 from any boundary
            F.round(F.sum("value"), 2).alias("sum_value"),
        ],
    )


@query(
    "st_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events
    FROM sess
    GROUP BY user_id, sid
    """,
    note="session window, 30 min gap (F.session_window) — session = "
    "[min ts, max ts + gap); Spark MERGES an event exactly gap after "
    "the previous one (a new session needs diff STRICTLY > gap), so "
    "the oracle's is_new uses > not >= — the >= variant diverges on "
    "any two events exactly 1800 s apart. Oracle is the "
    "lag+running-sum sessionization, the same shape as the reference's "
    "pattern segmentation (SPE:128-129)",
)
def st_session_window(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return session_window_agg(
        ev,
        ts_col="ts",
        gap="30 minutes",
        keys=["user_id"],
        aggs=[F.count("*").alias("n_events")],
    ).select("user_id", "session_start", "session_end", "n_events")


@query(
    "st_enrich_dim",
    oracle="""
    SELECT e.event_id, e.user_id, e.event_type,
           c.c_mktsegment AS segment,
           CAST(c.c_nationkey AS INTEGER) AS nationkey
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    """,
    note="stream-static enrichment join (events × customer dim, "
    "broadcast) — the most common production streaming shape; the "
    "builder runs identically on batch input (checked here against the "
    "oracle) and streaming input (batch/stream parity in "
    "tests/test_streaming.py)",
)
def st_enrich_dim(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nationkey"),
    )
    return enrich_with_dim(ev, dim, on=["user_id"], how="left").select(
        "event_id", "user_id", "event_type", "segment", "nationkey"
    )


@query(
    "st_stateful_sessionize",
    oracle="""
    WITH g AS (
      SELECT user_id, ts,
             (epoch_us(ts) - epoch_us(lag(ts) OVER w)) AS gap_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    )
    SELECT user_id, ts,
           COALESCE(gap_us, 0) / 1000000.0 AS gap_s,
           CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 1800 * 1000000
                         THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY ts
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS INT) AS segment_id
    FROM g
    """,
    note="custom stateful operator (applyInPandasWithState): per-key gap "
    "segmentation, the streaming form of the reference's patternID "
    "(SPE:104-172); batch path runs the SAME kernel via applyInPandas, so "
    "this oracle checks the kernel the stream executes — cross-batch state "
    "is covered by tests/test_streaming.py parity",
)
def st_stateful_sessionize(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return streaming_gap_sessionize(ev, gap_seconds=1800.0)


@query(
    "st_stream_stream_join",
    oracle="""
    SELECT l.event_id AS err_event, r.event_id AS follow_event,
           l.user_id,
           ROUND(r.value, 4) AS follow_value
    FROM events l JOIN events r
      ON l.user_id = r.user_id
     AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL '2 hours'
    WHERE l.event_type = 'error'
    """,
    note="stream-stream event-time interval join: for every error "
    "event, the same user's follow-up events within 2 hours "
    "(streaming/windows.py stream_stream_interval_join — watermarks on "
    "BOTH sides bound the join state to watermark+interval at 100 TB; "
    "batch twin is the identical range-predicate equi-join, checked "
    "here; true cross-micro-batch pairing is pinned by the "
    "tests/test_streaming.py parity test). Rotation alternate of "
    "st_enrich_dim: the two streaming joins share one driver slot",
    tier=2,
)
def st_stream_stream_join(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error")
    joined = stream_stream_interval_join(
        errors, ev, on=["user_id"], max_delay="2 hours"
    )
    return joined.select(
        F.col("l.event_id").alias("err_event"),
        F.col("r.event_id").alias("follow_event"),
        F.col("l.user_id").alias("user_id"),
        F.round(F.col("r.value"), 4).alias("follow_value"),
    )


@query(
    "st_dedup_within_watermark",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
    note="streaming dedup surface (streaming/windows.py "
    "dedup_within_watermark): at-least-once sources re-deliver, and the "
    "watermarked dropDuplicatesWithinWatermark bounds the dedup state "
    "that a plain streaming dropDuplicates would grow forever. The "
    "batch twin checked here is dropDuplicates on the key subset, "
    "projected TO that subset so the result is engine-deterministic "
    "(which non-key row survives is not part of the contract); the "
    "true streaming behavior is pinned by "
    "tests/test_streaming.py::test_streaming_dedup_within_watermark. "
    "st rotation alternate",
    tier=2,
)
def st_dedup_within_watermark(spark, sf_dir):
    from gpssbzd_spark.streaming.windows import dedup_within_watermark

    ev = load_table(spark, sf_dir, "events")
    out = dedup_within_watermark(
        ev, subset=["user_id", "event_type"], ts_col="ts", delay="1 hour"
    )
    return out.select("user_id", "event_type")


@query(
    "st_upsert_state",
    oracle="""
    SELECT user_id, event_id, ts, ROUND(value, 2) AS value
    FROM (
      SELECT user_id, event_id, ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    note="the keyed state a foreachBatch upsert sink materializes "
    "(streaming/sources.py upsert_parquet_sink): one row per key, "
    "latest by event time with a deterministic tie-break — computed "
    "here in batch form (latest-per-key window) because the oracle "
    "cannot drive micro-batches; the true incremental path (per-batch "
    "collapse -> replay-safe order_col merge -> staged atomic swap, "
    "surviving out-of-order files and redelivery) is pinned by "
    "tests/test_streaming.py::test_upsert_sink_last_write_wins_and_"
    "incremental. st_enrich rotation alternate",
    tier=2,
)
def st_upsert_state(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", F.round("value", 2).alias("value"))
    )


def _stateful_funnel_oracle() -> str:
    from gpssbzd_spark.corpus import core as _core

    return _core._funnel_users_oracle()


@query(
    "st_funnel_stateful",
    oracle=_stateful_funnel_oracle(),
    note="custom stateful streaming funnel (applyInPandasWithState, "
    "streaming/stateful.py streaming_funnel): per-user strict-order "
    "view->click->purchase with one nullable epoch-us of state per "
    "step — each t_k is immutable once set under the per-key "
    "event-time ordering contract, so micro-batches only fill in "
    "missing steps (K vectorized min-over-filter passes, no per-row "
    "Python). Batch path runs the SAME kernel over key-sorted "
    "partitions, so this oracle checks the kernel the stream "
    "executes; cross-micro-batch state is pinned by "
    "tests/test_streaming.py parity. st rotation alternate",
    tier=2,
)
def st_funnel_stateful(spark, sf_dir):
    from gpssbzd_spark.streaming import streaming_funnel

    ev = load_table(spark, sf_dir, "events")
    return streaming_funnel(
        ev, ("view", "click", "purchase"), within=604800.0
    )


@query(
    "st_drift_histogram",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour'
             AS window_end,
           LEAST(GREATEST(CAST(FLOOR((value - 0.0) / 50.0) AS INT), 0), 9)
             AS bucket,
           COUNT(*) AS n
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2, 3
    """,
    note="streaming drift monitoring (streaming/windows.py "
    "windowed_histogram): per-tumbling-window clamped fixed-bin value "
    "histogram — the same bins as the batch drift gate dp_drift_psi, "
    "so a monitor diffs each closed window against a reference "
    "distribution (PSI or any distance) without re-reading history. "
    "One shuffle on (window, bucket), map-side partial counts, state "
    "bounded by windows x bins; the streaming twin drops late rows "
    "past the watermark. Batch twin fully oracled. st rotation "
    "alternate",
    tier=2,
)
def st_drift_histogram(spark, sf_dir):
    from gpssbzd_spark.streaming.windows import windowed_histogram

    ev = load_table(spark, sf_dir, "events")
    return windowed_histogram(
        ev, "ts", "value", "1 hour", lo=0.0, hi=500.0, n_bins=10
    )


@query(
    "st_drift_psi",
    oracle="""
    WITH hist AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS ws,
             LEAST(GREATEST(CAST(FLOOR((value - 0.0) / 50.0) AS INT), 0), 9)
               AS bucket,
             COUNT(*) AS n
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ), tot AS (
      SELECT ws, SUM(n) AS total FROM hist GROUP BY ws
    ), grid AS (
      SELECT t.ws, t.total, r.range AS bucket FROM tot t, range(10) r
    ), fullh AS (
      SELECT g.ws, g.total, g.bucket, COALESCE(h.n, 0) AS n
      FROM grid g LEFT JOIN hist h ON h.ws = g.ws AND h.bucket = g.bucket
    )
    SELECT ws AS window_start,
           ws + INTERVAL '1 hour' AS window_end,
           CAST(MAX(total) AS BIGINT) AS n_rows,
           ROUND(SUM((GREATEST(n / CAST(total AS DOUBLE), 1e-6) - 0.1)
                 * ln(GREATEST(n / CAST(total AS DOUBLE), 1e-6) / 0.1)),
                 4) AS psi
    FROM fullh GROUP BY ws
    """,
    note="composed streaming drift monitor (streaming/windows.py "
    "windowed_drift_psi): per-closed-window PSI of the value histogram "
    "against a fixed reference distribution — windowed_histogram (the "
    "streaming half) composed with the batch drift gate's arithmetic "
    "(operators/profile.drift_psi: same clamped bins, same 1e-6 floor, "
    "same sum((p-q)*ln(p/q))), closing VERDICT r6 missing #3. The "
    "n_bins reference counts fold into the plan as literals (no "
    "reference join to re-plan per micro-batch); unobserved bins still "
    "contribute their floor term via a full-grid expansion in pure "
    "higher-order column expressions (map_from_entries/transform/"
    "zip_with/aggregate — no UDF). Two chained event-time aggregations "
    "(multiple stateful operators, append mode, window_time "
    "re-windowing); batch twin takes the identical plan and is fully "
    "oracled here against a DuckDB grid replay; stream/batch parity "
    "pinned in tests/test_streaming.py. st rotation alternate",
    tier=2,
)
def st_drift_psi(spark, sf_dir):
    from gpssbzd_spark.streaming.windows import windowed_drift_psi

    ev = load_table(spark, sf_dir, "events")
    # uniform reference over the 10 bins: every window is scored for
    # deviation from the flat profile (q_i = 0.1 exactly on both sides)
    return windowed_drift_psi(
        ev, "ts", "value", "1 hour", lo=0.0, hi=500.0, n_bins=10,
        ref_counts=[1.0] * 10,
    )


def _st_incremental_dedup_oracle() -> str:
    from gpssbzd_spark.corpus.dataprep import (
        _INCR_DELTA_SQL,
        _INCR_INDEX_SQL,
    )
    from gpssbzd_spark.dataprep.dedup import incremental_neardup_sql

    return incremental_neardup_sql(_INCR_INDEX_SQL, _INCR_DELTA_SQL)


@query(
    "st_incremental_dedup",
    oracle=_st_incremental_dedup_oracle(),
    note="STREAMING ingest-time dedup against the persisted signature "
    "index (dataprep/dedup.py incremental_neardup_flags_stateless): "
    "the row-local signer (array_min(transform) per permutation — "
    "aggregation-free, so an append-mode micro-batch can run it) "
    "band-joins the static index stream-side; a pair matching k bands "
    "emits k rows and the only stateful operator is the caller's "
    "bounded dedup — dropDuplicates here on the batch twin, "
    "dedup_within_watermark on a true stream (parity pinned in "
    "tests/test_streaming.py). Same md5 family and split as "
    "dd_incremental_neardup, so the identical DuckDB oracle replays "
    "the whole path — proving the row-local signer emits "
    "bit-identical signatures to the exploded batch signer. st "
    "rotation alternate",
    tier=2,
)
def st_incremental_dedup(spark, sf_dir):
    from gpssbzd_spark.dataprep.dedup import (
        incremental_neardup_flags_stateless,
        minhash_signatures_portable,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    hist = d.filter(F.col("doc_id") % 3 != 0)
    delta = d.filter(F.col("doc_id") % 3 == 0).unionByName(
        d.filter((F.col("doc_id") % 3 != 0) & (F.col("doc_id") % 10 == 1))
        .withColumn("doc_id", F.col("doc_id") + 1000000)
    )
    index_sigs = minhash_signatures_portable(hist)
    flags = incremental_neardup_flags_stateless(delta, index_sigs)
    return flags.dropDuplicates(["delta_id", "index_id"])
