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

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
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

        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            # integer epoch-µs, not float seconds: time arithmetic stays
            # exact and matches SQL epoch_us() bit-for-bit
            epoch_us = (
                pdf["ts"].values.astype("datetime64[ns]").astype("int64") // 1000
            )
            gaps, segs = [], []
            for t in epoch_us:
                t = int(t)
                gap_us = 0 if last_us is None else t - last_us
                if last_us is None or gap_us > gap_us_threshold:
                    seg += 1
                gaps.append(gap_us / _US)
                segs.append(seg)
                last_us = t
            yield pd.DataFrame(
                {
                    "user_id": key[0],
                    "ts": pdf["ts"].values,
                    "gap_s": gaps,
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

    # batch twin via the same per-key kernel (applyInPandas, no state)
    seg_fn = _segmenter(gap_seconds)

    def batch_fn(key: tuple[Any, ...], pdf: pd.DataFrame) -> pd.DataFrame:
        out = list(seg_fn(key, iter([pdf]), _NullState()))
        return pd.concat(out, ignore_index=True)

    return grouped.applyInPandas(batch_fn, OUTPUT_SCHEMA)


class _NullState:
    """Stand-in GroupState for the batch path (state dies with the group)."""

    exists = False
    get = (None, 0)

    def update(self, value) -> None:  # noqa: D401 - interface parity
        pass
