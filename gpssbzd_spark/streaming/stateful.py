"""Custom stateful streaming operator: gap-based segment assignment.

This is the streaming re-expression of the reference's pattern
segmentation (`Standalone/Pattern Extraction.scala:104-172`: a new
`patternID` starts where the inter-ping gap exceeds a threshold). The
batch version is a lag+running-sum window (`corpus/windows.py::
w7_sessionize_gap`); unbounded input needs per-key state instead —
``applyInPandasWithState`` keeps (last event time, running segment id)
per key across micro-batches, which no built-in streaming operator
expresses (`session_window` merges rows into one session row; this
operator labels and EMITS every row, preserving row-level downstream
processing exactly like the reference's per-ping patternID).

Scale notes: state per key is 3 scalars → the state store stays tiny
even at 10^8 keys; rows are processed in Arrow batches per key; the
shuffle is the same hash-by-key exchange the batch window needs.
Ordering contract: rows WITHIN a micro-batch are sorted here; ACROSS
batches the source must deliver in event-time order per key (true for
replayed daily files; for out-of-order sources put a watermark +
sorting buffer upstream).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, ts timestamp, gap_s double, segment_id int"
)
STATE_SCHEMA = "last_ts_us long, segment_id int"

_US = 1_000_000


def _segmenter(gap_seconds: float):
    gap_us_threshold = int(round(gap_seconds * _US))

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_us, seg = state.get
        else:
            last_us, seg = None, 0

        # A key whose micro-batch data exceeds one Arrow batch arrives
        # as MULTIPLE chunks in shuffle order — sorting each chunk
        # independently while last_ts carries across them would compute
        # garbage gaps. Concatenate first, sort once; state size is
        # unchanged (still 3 scalars) and the per-key batch data was
        # already resident for the group handoff.
        chunks = [p for p in pdfs if len(p)]
        if len(chunks) > 1:
            merged: list[pd.DataFrame] = [pd.concat(chunks, ignore_index=True)]
        else:
            merged = chunks

        for pdf in merged:
            pdf = pdf.sort_values("ts")
            # integer epoch-µs, not float seconds: time arithmetic stays
            # exact and matches SQL epoch_us() bit-for-bit
            epoch_us = (
                pdf["ts"].values.astype("datetime64[ns]").astype("int64") // 1000
            )
            n = len(epoch_us)
            if n == 0:
                continue
            # the recurrence is diff + cumsum with a scalar carry-in
            # (last_ts, seg) — vectorized, no per-row Python
            gaps_us = np.empty(n, dtype=np.int64)
            gaps_us[1:] = epoch_us[1:] - epoch_us[:-1]
            gaps_us[0] = 0 if last_us is None else epoch_us[0] - last_us
            starts = gaps_us > gap_us_threshold
            if last_us is None:
                starts[0] = True
            segs = seg + np.cumsum(starts.astype(np.int64))
            seg = int(segs[-1])
            last_us = int(epoch_us[-1])
            yield pd.DataFrame(
                {
                    "user_id": key[0],
                    "ts": pdf["ts"].values,
                    "gap_s": gaps_us / _US,
                    "segment_id": segs,
                }
            )

        state.update((last_us, seg))

    return fn


def streaming_gap_sessionize(
    df: DataFrame,
    gap_seconds: float = 1800.0,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Label every row with a per-key segment id that increments when
    the gap since the key's previous event exceeds ``gap_seconds``.

    Works on streaming input (stateful, exactly the semantics above)
    and on batch input (falls back to one state-free pass per key —
    same code path, so batch/stream parity is structural).
    """
    grouped = df.select(
        df[key_col].alias("user_id"), df[ts_col].alias("ts")
    ).groupBy("user_id")
    if df.isStreaming:
        return grouped.applyInPandasWithState(
            _segmenter(gap_seconds),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    # Batch twin via the same per-key kernel, but over mapInPandas on
    # key-sorted partitions instead of applyInPandas: applyInPandas
    # round-trips ONE Arrow batch per GROUP, and with many small groups
    # (sessionization keys are users) the per-group dispatch dominated
    # the stage ~10× over the actual kernel work. Here the shuffle is
    # the same hash-by-key exchange, but each partition streams through
    # Python as whole Arrow chunks; groups are contiguous after the
    # within-partition sort, and a chunk-boundary carry keeps a key
    # split across chunks intact. The kernel call per group is
    # unchanged — stream/batch parity stays structural.
    seg_fn = _segmenter(gap_seconds)
    base = df.select(df[key_col].alias("user_id"), df[ts_col].alias("ts"))

    def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
        key = (pdf["user_id"].iloc[0],)
        return pd.concat(
            list(seg_fn(key, iter([pdf]), _NullState())), ignore_index=True
        )

    def map_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        leftover: pd.DataFrame | None = None
        for pdf in batches:
            if leftover is not None:
                pdf = pd.concat([leftover, pdf], ignore_index=True)
                leftover = None
            if len(pdf) == 0:
                continue
            vals = pdf["user_id"].values
            # the last key's rows are the contiguous tail (sorted by key);
            # a nullable key column surfaces as NaN here and NaN != NaN,
            # so the null tail needs an isna mask or it is never detected
            tail_mask = (
                pd.isna(vals) if pd.isna(vals[-1]) else vals == vals[-1]
            )
            cut = len(vals) - int(np.count_nonzero(tail_mask))
            leftover = pdf.iloc[cut:]
            head = pdf.iloc[:cut]
            if len(head):
                # dropna=False: Spark's groupBy keeps null keys (and the
                # streaming twin sees them as a real group) — pandas'
                # default would silently drop null-key rows mid-chunk
                yield pd.concat(
                    [
                        run_group(g)
                        for _, g in head.groupby(
                            "user_id", sort=False, dropna=False
                        )
                    ],
                    ignore_index=True,
                )
        if leftover is not None and len(leftover):
            yield run_group(leftover)

    from gpssbzd_spark.sources.tables import keyed_repartition

    # r14 (guide §2): count-less repartition is AQE-coalescible — at
    # small shuffle sizes the sessionize kernel ran on ONE Python
    # worker (2.1 s wall / 0.26 s cpu single-task stage at sf0.1)
    return (
        keyed_repartition(base, "user_id")
        .sortWithinPartitions("user_id", "ts")
        .mapInPandas(map_fn, OUTPUT_SCHEMA)
    )


class _NullState:
    """Stand-in GroupState for the batch path (state dies with the group)."""

    exists = False
    get = (None, 0)

    def update(self, value) -> None:  # noqa: D401 - interface parity
        pass


# ---------------------------------------------------------------------------
# Stateful streaming funnel — the unbounded form of
# operators/funnel.funnel_times. Batch computes t_k = min(step-k events
# strictly after t_{k-1}) by windows over the closed dataset; a stream
# needs per-user state. Key insight making the incremental form EXACT:
# under the same per-key event-time ordering contract as the
# sessionizer above, each t_k is IMMUTABLE once set (later batches only
# carry later timestamps, and t_k is an earliest-qualifying time), so
# the state is one nullable epoch-µs per step and each micro-batch
# only fills in still-missing steps. Per batch the update is K
# vectorized min-over-filter passes — no per-row Python.
#
# Emission: one row per user per micro-batch in which that user had
# events — the user's CURRENT (t1..tK, steps_completed). Downstream
# keeps the latest row per user (steps_completed is non-decreasing and
# set t_k never change), e.g. via streaming/sources.upsert_to_table;
# the batch path emits exactly one final row per user.
# ---------------------------------------------------------------------------


def _funnel_state_schema(n_steps: int) -> str:
    return ", ".join(f"t{k + 1}_us long" for k in range(n_steps))


def _funnel_output_schema(n_steps: int, key_type: str = "long") -> str:
    ts_cols = ", ".join(f"t{k + 1} timestamp" for k in range(n_steps))
    return f"user_id {key_type}, {ts_cols}, steps_completed int"


def _funnel_kernel(steps: Sequence[str], within: float | None):
    K = len(steps)
    within_us = None if within is None else int(round(within * _US))

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        t_us: list[int | None] = (
            [v for v in state.get] if state.exists else [None] * K
        )
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            state.update(tuple(t_us))
            return
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
        # drop null timestamps BEFORE the epoch cast: NaT.astype(int64) is
        # INT64_MIN, which would poison the min() below with a garbage
        # negative epoch — funnel_times ignores null ts via F.min, and the
        # kernel must match (base select also filters, this is the
        # kernel-level guarantee for direct callers)
        valid = pdf["ts"].notna().values
        if not valid.all():
            pdf = pdf[valid]
        ets = pdf["ts"].values.astype("datetime64[ns]").astype("int64") // 1000
        types = pdf["event_type"].values

        for k in range(K):
            if t_us[k] is not None:
                continue  # immutable once set (ordering contract)
            if k > 0 and t_us[k - 1] is None:
                break  # later steps cannot qualify either
            mask = types == steps[k]
            if k > 0:
                mask = mask & (ets > t_us[k - 1])
                if within_us is not None:
                    mask = mask & (ets - t_us[0] <= within_us)
            if mask.any():
                t_us[k] = int(ets[mask].min())

        state.update(tuple(t_us))
        completed = 1 if t_us[0] is not None else 0
        for k in range(1, K):
            if t_us[k] is not None:
                completed = k + 1
        if t_us[0] is None:
            return  # user has not entered the funnel: nothing to emit
        out = {"user_id": key[0]}
        for k in range(K):
            out[f"t{k + 1}"] = (
                pd.Timestamp(t_us[k], unit="us") if t_us[k] is not None else pd.NaT
            )
        out["steps_completed"] = np.int32(completed)
        yield pd.DataFrame([out])

    return fn


def streaming_funnel(
    df: DataFrame,
    steps: Sequence[str],
    within: float | None = None,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user strict-order funnel over unbounded input (see module
    comment). Streaming input runs ``applyInPandasWithState`` (state =
    one nullable epoch-µs per step); batch input runs the SAME kernel
    once per user over key-sorted partitions, emitting one final row
    per user that entered the funnel — identical semantics to
    ``operators.funnel.funnel_times`` (checked against its oracle in
    the corpus and against the native path in tests)."""
    K = len(steps)
    assert K >= 1, "funnel needs at least one step"
    base = (
        df.select(
            df[key_col].alias("user_id"),
            df[ts_col].alias("ts"),
            df[type_col].alias("event_type"),
        )
        .filter(F.col("event_type").isin(list(steps)))
        .filter(F.col("ts").isNotNull())
    )
    kernel = _funnel_kernel(steps, within)
    # key type follows the input (string/int/... keys all work, matching
    # the type-generic funnel_times) instead of a hardcoded long
    key_type = df.schema[key_col].dataType.simpleString()
    out_schema = _funnel_output_schema(K, key_type)

    if df.isStreaming:
        return base.groupBy("user_id").applyInPandasWithState(
            kernel,
            outputStructType=out_schema,
            stateStructType=_funnel_state_schema(K),
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    # batch path: same kernel, one call per contiguous key group over
    # key-sorted partitions (same chunk-boundary carry rationale as
    # streaming_gap_sessionize's batch twin)
    def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
        key = (pdf["user_id"].iloc[0],)
        frames = list(kernel(key, iter([pdf]), _NullState2(K)))
        return (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame()
        )

    def map_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        leftover: pd.DataFrame | None = None
        for pdf in batches:
            if leftover is not None:
                pdf = pd.concat([leftover, pdf], ignore_index=True)
                leftover = None
            if len(pdf) == 0:
                continue
            vals = pdf["user_id"].values
            tail_mask = (
                pd.isna(vals) if pd.isna(vals[-1]) else vals == vals[-1]
            )
            cut = len(vals) - int(np.count_nonzero(tail_mask))
            leftover = pdf.iloc[cut:]
            head = pdf.iloc[:cut]
            if len(head):
                frames = [
                    run_group(g)
                    for _, g in head.groupby("user_id", sort=False, dropna=False)
                ]
                frames = [f for f in frames if len(f)]
                if frames:
                    yield pd.concat(frames, ignore_index=True)
        if leftover is not None and len(leftover):
            final = run_group(leftover)
            if len(final):
                yield final

    from gpssbzd_spark.sources.tables import keyed_repartition

    # r14: same AQE-coalesce fix as the sessionize batch twin above
    return (
        keyed_repartition(base, "user_id")
        .sortWithinPartitions("user_id", "ts")
        .mapInPandas(map_fn, out_schema)
    )


class _NullState2:
    """Stand-in GroupState for the funnel's batch path."""

    exists = False

    def __init__(self, n_steps: int) -> None:
        self.get = tuple([None] * n_steps)

    def update(self, value) -> None:  # noqa: D401 - interface parity
        pass
