"""Streaming sources/sinks.

The engine's streaming unit of ingest is a directory of parquet files
with a declared schema — the streaming twin of the batch
``sources.tables.load_table``. (File source is also what a 100 TB
backfill replays: `maxFilesPerTrigger` paces reprocessing without a
separate batch path.) Kafka/JSON sources would slot in here behind the
same declared-schema rule; they are not wired because the container
has no broker to test against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Open a parquet directory as an unbounded stream.

    A declared schema is mandatory (streaming readers cannot infer, and
    the engine never infers on the hot path anyway — SURVEY.md §1.4).
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def write_parquet_stream(
    df: DataFrame,
    path: str,
    checkpoint_dir: str,
    partition_by: list[str] | None = None,
    output_mode: str = "append",
    await_termination: bool = True,
):
    """Drain all currently-available input through the streaming plan
    into a parquet directory — the PRODUCTION sink counterpart of
    :func:`run_to_memory_sink`.

    ``trigger(availableNow=True)`` + a durable ``checkpointLocation``
    is the scheduled-incremental pattern: each invocation processes
    exactly the files that arrived since the previous run (the
    checkpoint's file-source log carries the high-water mark), writes
    executor-side with no driver collection, and exits. Re-running
    after new files land consumes ONLY the new files — pinned by
    tests/test_streaming.py. A long-lived ``trigger(processingTime=…)``
    deployment differs only in the trigger.

    Note the parquet sink is append-only (streaming file sinks cannot
    rewrite partitions); dedup/compaction over the sink directory is a
    downstream batch concern (`sources.writers`).
    """
    w = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    q = w.start()
    if await_termination:
        q.awaitTermination()
    return q


def run_to_memory_sink(
    df: DataFrame,
    query_name: str,
    output_mode: str = "append",
) -> DataFrame:
    """Drain all currently-available input through the streaming plan
    into an in-memory table and return it as a DataFrame.

    TEST-SCALE ONLY: the memory sink collects every output row into the
    driver. It exists here for parity tests and interactive inspection.
    ``trigger(availableNow=True)`` itself IS the production pattern for
    scheduled incremental jobs (a cron'd run consumes only new files,
    checkpoint carries state between runs) — but production runs pair it
    with a distributed sink (``.format("parquet")``/``foreachBatch``),
    never this memory sink.
    """
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(query_name)
