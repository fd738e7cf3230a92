"""Event-time window aggregations — one definition, batch AND stream.

Each builder takes any DataFrame (static or streaming) and returns the
windowed aggregate; on a streaming input add `.withWatermark` upstream
(see :func:`with_watermark`) so state is bounded and late data is
handled. At 100 TB/day these are the workhorse rollups: the tumbling
agg is a single shuffle on (window, keys) with partial aggregation
map-side, and the state store only ever holds open windows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """Watermark for streaming inputs; no-op on batch DataFrames."""
    return df.withWatermark(ts_col, delay) if df.isStreaming else df


def enrich_with_dim(
    df: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join — attach dimension attributes to
    an event stream (the most common production streaming shape:
    events × user/device/product table).

    Works identically on batch and streaming input: a stream-static
    join is stateless (each micro-batch joins against the CURRENT
    static table — Spark re-plans the static side per batch, so slowly
    changing dims pick up updates between batches without restarts).
    The dim side gets an explicit broadcast hint: a stream side can
    never be re-sorted for a sort-merge join, and a shuffled-hash join
    of every micro-batch against a large dim would rebuild the hash
    relation per batch — broadcast-once is the 100 TB shape for any
    dim that fits (for bigger dims, pre-bucket the static side).
    Inner and left joins are the streaming-supported modes for a
    stream-left join; right/full would need the stream on the
    state-store side and are rejected by Spark itself.
    """
    return df.join(F.broadcast(dim), on=list(on), how=how)


def _agged(grouped, aggs: Sequence[Column]) -> DataFrame:
    return grouped.agg(*aggs)


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Non-overlapping event-time buckets: `F.window(ts, duration)`.

    Emits (window_start, window_end, *keys, aggs…). Late rows beyond the
    watermark are dropped by the state store in streaming mode.
    """
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    aggs = list(aggs) if aggs else [F.count("*").alias("n_events")]
    w = F.window(F.col(ts_col), duration)
    out = df.groupBy(w.alias("w"), *[F.col(k) for k in keys]).agg(*aggs)
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *keys,
        *[c for c in out.columns if c not in ("w", *keys)],
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows: each row lands in duration/slide windows.

    Fan-out happens inside WindowExec (no explode of the input), so the
    shuffle volume is rows × (duration/slide) — keep the ratio small at
    scale or pre-aggregate into tumbling panes first.
    """
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    aggs = list(aggs) if aggs else [F.count("*").alias("n_events")]
    w = F.window(F.col(ts_col), duration, slide)
    out = df.groupBy(w.alias("w"), *[F.col(k) for k in keys]).agg(*aggs)
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *keys,
        *[c for c in out.columns if c not in ("w", *keys)],
    )


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based sessions: `F.session_window(ts, gap)` — the streaming
    twin of the GPS pattern segmentation (a new pattern starts when the
    inter-ping gap exceeds a threshold, `Standalone/Pattern
    Extraction.scala:104-129`); here the gap closes a session instead.

    Session = [min(ts), max(ts)+gap). Streaming mode REQUIRES a
    watermark (Spark enforces it — session state must expire).
    """
    if df.isStreaming:
        if not watermark:
            raise ValueError("session_window_agg on a stream needs a watermark")
        df = df.withWatermark(ts_col, watermark)
    aggs = list(aggs) if aggs else [F.count("*").alias("n_events")]
    w = F.session_window(F.col(ts_col), gap)
    out = df.groupBy(w.alias("w"), *[F.col(k) for k in keys]).agg(*aggs)
    return out.select(
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        *keys,
        *[c for c in out.columns if c not in ("w", *keys)],
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "10 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
    strict_lower: bool = True,
) -> DataFrame:
    """Event-time stream-stream interval join: pair each left row with
    right rows of the same keys whose timestamp falls in
    ``(left_ts, left_ts + max_delay]`` (lower bound inclusive when
    ``strict_lower=False``).

    One definition, batch AND stream (the module's contract): on
    streaming inputs both sides are watermarked — REQUIRED by Spark for
    stream-stream joins, since the time-range condition plus watermark
    is what lets the state store evict rows older than
    ``watermark + max_delay`` instead of buffering both streams forever
    (the 100 TB concern: unbounded join state). Inner joins emit rows as
    soon as both sides match; outer variants additionally wait for the
    watermark before emitting nulls. On batch inputs the watermark is a
    no-op and Catalyst plans a plain range-predicate equi-join — the
    parity pytest drives both and the corpus oracle checks the batch
    twin against DuckDB.
    """
    lw = with_watermark(left, left_ts, watermark).alias("l")
    rw = with_watermark(right, right_ts, watermark).alias("r")
    cond = None
    for k in on:
        eq = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = eq if cond is None else cond & eq
    lo = F.col(f"r.{right_ts}") > F.col(f"l.{left_ts}")
    if not strict_lower:
        lo = F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}")
    hi = F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(
        f"INTERVAL {max_delay}"
    )
    return lw.join(rw, cond & lo & hi, how)


def dedup_within_watermark(
    df: DataFrame, subset: Sequence[str], ts_col: str, delay: str
) -> DataFrame:
    """Streaming dedup with bounded state: drops re-deliveries of the
    same key arriving within the watermark delay (at-least-once source →
    effectively-once pipeline). Batch twin: plain dropDuplicates."""
    if not df.isStreaming:
        return df.dropDuplicates(list(subset))
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(list(subset))


def _clamped_bucket(value_col: str, lo: float, hi: float, n_bins: int) -> Column:
    """Clamped fixed-width bin index — the shared bin arithmetic of
    windowed_histogram / windowed_drift_psi and the batch drift gate
    (operators/profile.drift_psi): below-range mass in bin 0,
    above-range in the last bin."""
    w = (hi - lo) / n_bins
    return F.least(
        F.greatest(
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(w)).cast("int"),
            F.lit(0),
        ),
        F.lit(n_bins - 1),
    )


def windowed_drift_psi(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    duration: str,
    lo: float,
    hi: float,
    n_bins: int,
    ref_counts: Sequence[float],
    round_to: int = 4,
    watermark: str | None = None,
) -> DataFrame:
    """Per-closed-window drift monitor: PSI of each tumbling window's
    value histogram against a fixed reference distribution — the
    composition of :func:`windowed_histogram` (the streaming half)
    with the batch drift gate's arithmetic
    (``operators/profile.drift_psi``: same clamped fixed-width bins,
    same 1e-6 share floor, same Σ (p−q)·ln(p/q)). Emits
    (window_start, window_end, n_rows, psi) — one row per closed
    window, PSI < 0.1 stable / > 0.25 shifted, so an alerting sink
    just filters ``psi > threshold``.

    ``ref_counts`` is the reference histogram, one count (or share)
    per bucket 0..n_bins-1 — e.g. the profile of the training drop the
    model was fit on. It is n_bins scalars by construction, so it is
    folded into the PLAN as literals: no reference join, no second
    input, and in streaming mode no stream-static join to re-plan per
    micro-batch. Bins the window never observed still contribute their
    (floor − q)·ln(floor/q) mass exactly like the batch gate's
    full-outer join — the per-window bucket map is expanded to the
    full 0..n_bins-1 grid with higher-order expressions before the
    fold, so mass drifting ENTIRELY out of a bin raises PSI instead of
    silently vanishing.

    Scale shape: two chained event-time aggregations — the histogram's
    (window, bucket) shuffle with map-side partials, then a
    (windows × bins)-row rollup into one map per window (bounded:
    n_bins entries each). Streaming mode chains them with
    ``window_time`` re-windowing (multiple stateful operators, append
    mode); the PSI fold itself is pure column expressions
    (map_from_entries / transform / zip_with / aggregate) — JVM-side,
    no UDF, no state beyond the open windows. Batch input takes the
    identical plan minus watermarks (the module's one-definition
    contract); the corpus twin ``st_drift_psi`` oracles it against a
    DuckDB replay with epoch window arithmetic."""
    assert len(ref_counts) == n_bins, (len(ref_counts), n_bins)
    floor = 1e-6  # operators/profile._PSI_FLOOR — keep the gates identical
    ref_total = float(sum(ref_counts))
    assert ref_total > 0, "reference histogram is empty"
    q = [max(c / ref_total, floor) for c in ref_counts]

    # first aggregation: the windowed histogram, KEEPING the window
    # struct — extracting w.start/w.end would strip the event-time
    # watermark metadata that the chained aggregation needs in
    # streaming mode (same bins as windowed_histogram by construction)
    src = df.filter(F.col(value_col).isNotNull())
    if watermark is not None and df.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    hist = src.groupBy(
        F.window(F.col(ts_col), duration).alias("w"),
        _clamped_bucket(value_col, lo, hi, n_bins).alias("bucket"),
    ).agg(F.count("*").alias("n"))
    # chained aggregation: window_time(w) (= w.end − 1µs, carrying the
    # event-time tag) re-windowed by the same duration reproduces the
    # source window — the multiple-stateful-operator contract; on
    # batch input it is the same pure expression
    per_w = (
        hist.groupBy(
            F.window(F.window_time(F.col("w")), duration).alias("w")
        )
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("bucket", "n"))
            ).alias("m"),
            F.sum("n").alias("total"),
        )
    )
    counts = F.transform(
        F.sequence(F.lit(0), F.lit(n_bins - 1)),
        lambda i: F.coalesce(F.element_at(F.col("m"), i), F.lit(0)).cast(
            "double"
        ),
    )
    qarr = F.array(*[F.lit(v) for v in q])
    terms = F.zip_with(
        counts,
        qarr,
        lambda n, qv: (
            F.greatest(n / F.col("total"), F.lit(floor)) - qv
        )
        * F.log(F.greatest(n / F.col("total"), F.lit(floor)) / qv),
    )
    return per_w.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        F.col("total").cast("long").alias("n_rows"),
        F.round(
            F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t), round_to
        ).alias("psi"),
    )


def windowed_histogram(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    duration: str,
    lo: float,
    hi: float,
    n_bins: int,
    watermark: str | None = None,
) -> DataFrame:
    """Per-tumbling-window value histogram: (window_start, window_end,
    bucket, n) with the same clamped fixed-width bins as the batch
    drift gate (``operators/profile.drift_psi`` — below-range mass in
    bin 0, above-range in the last bin, nulls excluded). This is the
    STREAMING half of drift monitoring: a monitor diffs each closed
    window's histogram against a reference distribution (PSI or any
    distance) without ever re-reading history — the window aggregate
    is one shuffle on (window, bucket) with map-side partial counts
    and bounded state (windows × bins rows per open window). Works on
    a batch frame identically (the oracle twin replays it with epoch
    arithmetic)."""
    bucket = _clamped_bucket(value_col, lo, hi, n_bins)
    src = df.filter(F.col(value_col).isNotNull())
    if watermark is not None and df.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.window(F.col(ts_col), duration).alias("w"),
            bucket.alias("bucket"),
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "bucket",
            "n",
        )
    )
