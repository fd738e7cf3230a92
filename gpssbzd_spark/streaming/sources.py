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


def upsert_parquet_sink(
    df: DataFrame,
    target_path: str,
    checkpoint_dir: str,
    keys: list[str],
    order_col: str | None = None,
    await_termination: bool = True,
):
    """Maintain a last-write-wins keyed TABLE from a stream — the
    ``foreachBatch`` upsert pattern that the append-only parquet sink
    cannot express (streaming file sinks never rewrite rows).

    Each micro-batch is first collapsed to one row per key (latest by
    ``order_col``, else an arbitrary-but-deterministic max-struct pick)
    and then merged into the target via
    :func:`gpssbzd_spark.operators.cdc.merge_upsert` — the micro-batch
    side is tiny relative to the accumulated state, so Catalyst
    broadcasts it and the state table is never shuffled. The new state
    is staged to ``<target>._staging`` and swapped in only after the
    write succeeds, so a mid-write failure leaves the previous state
    intact and the checkpoint replays the batch (foreachBatch is
    at-least-once; the per-key collapse + full-row replace makes the
    merge idempotent, upgrading the STATE to effectively-once).

    On a lakehouse this is MERGE INTO against a table format with
    transactional swap; plain parquet needs the staging-dir dance. The
    rewrite cost is O(state), the lakehouse cost is O(touched files) —
    same plan shape, different commit protocol.
    """
    import os
    import shutil

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gpssbzd_spark.operators.cdc import merge_upsert

    spark = df.sparkSession
    cols = df.columns
    staging = target_path.rstrip("/") + "._staging"

    def apply_batch(batch: DataFrame, _batch_id: int) -> None:
        if order_col is not None:
            rest = [c for c in cols if c not in keys and c != order_col]
            # struct tie-break: equal order_col values within one batch
            # must resolve deterministically or a replay could flip rows
            order = [F.col(order_col).desc()]
            if rest:
                order.append(F.struct(*rest).desc())
            w = Window.partitionBy(*keys).orderBy(*order)
            latest = (
                batch.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        else:
            agg = F.max(F.struct(*[F.col(c) for c in cols if c not in keys]))
            latest = (
                batch.groupBy(*keys)
                .agg(agg.alias("_s"))
                .select(*keys, "_s.*")
                .select(*cols)
            )
        if os.path.exists(target_path):
            base = spark.read.parquet(target_path).select(*cols)
            # order_col makes the merge replay-safe: a late-arriving
            # batch with OLDER event times cannot regress keys that a
            # previous batch already advanced
            state = merge_upsert(
                base, F.broadcast(latest), keys, order_col=order_col
            )
        else:
            state = latest
        state.write.mode("overwrite").parquet(staging)
        if os.path.exists(target_path):
            shutil.rmtree(target_path)
        os.rename(staging, target_path)

    q = (
        df.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q
