"""Structured Streaming surface (SURVEY.md §2.9).

The reference is batch-only — all three GPS stages close over one day
of data (`Parallel/Pattern Extraction.scala:12-33` reads a finished
HDFS directory; no watermarks or state stores exist anywhere in
`/root/reference`). This package is the engine EXTENSION the north star
requires: the same operator semantics exposed over unbounded input.

Design rule: every streaming op has a batch twin built from the same
column expressions, so batch/stream parity is testable (the streaming
analogue of the reference's standalone-vs-parallel differential
methodology, SURVEY.md §5).
"""

from gpssbzd_spark.streaming.windows import (
    dedup_within_watermark,
    enrich_with_dim,
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
    windowed_drift_psi,
    windowed_histogram,
    with_watermark,
)
from gpssbzd_spark.streaming.sources import (
    read_parquet_stream,
    run_to_memory_sink,
    write_parquet_stream,
)
from gpssbzd_spark.streaming.stateful import (
    streaming_funnel,
    streaming_gap_sessionize,
)

__all__ = [
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "dedup_within_watermark",
    "enrich_with_dim",
    "windowed_histogram",
    "windowed_drift_psi",
    "with_watermark",
    "read_parquet_stream",
    "run_to_memory_sink",
    "write_parquet_stream",
    "streaming_funnel",
    "streaming_gap_sessionize",
]
