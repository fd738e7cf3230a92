"""Manifest-based incremental batch ingestion.

A 100 TB landing directory receives new files continuously; a daily
batch job that re-reads the whole directory is O(history), and the
reference's answer — manually pointing each run at fresh paths
(`Parallel/Trajectory Clustering.py:48` reads a hand-consolidated
file from a different namenode) — does not survive automation. The
warehouse pattern (Databricks Auto Loader, Hive-style landing zones)
is a PROCESSED-FILE MANIFEST: list the directory, subtract the files
already recorded, read only the remainder, and record them once the
batch COMMITS — exactly-once per file without any scan of old data.

This complements the Structured Streaming path
(`streaming/sources.py` availableNow + checkpoint): streaming owns
its file log inside an opaque checkpoint tied to one query; this
manifest is plain JSONL the caller owns — inspectable, replayable,
shareable across different batch jobs over the same landing dir.

Design constraints honored for scale:

- listing + manifest I/O go through the Hadoop FileSystem API of the
  live session (works for HDFS/S3A/local URIs alike), driver-side,
  O(files in dir) — never touches file CONTENTS;
- the manifest is a DIRECTORY of append-only JSONL parts: a commit
  writes ONE new part via create-temp + atomic rename, so a crash
  mid-commit leaves either the old manifest or the new one, never a
  torn file, and concurrent readers see a consistent prefix;
- files are assumed immutable once landed (the universal landing-zone
  contract); a path re-appearing with a different size is surfaced as
  an error rather than silently reprocessed or skipped.
"""

from __future__ import annotations

import json
import uuid
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class LandedFile:
    path: str
    size: int
    mtime_ms: int


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, jpath, jpath.getFileSystem(spark._jsc.hadoopConfiguration())


def list_landed(
    spark: SparkSession, landing_dir: str, glob: str = "*.parquet"
) -> list[LandedFile]:
    """Driver-side listing of the landing dir via Hadoop FS (no data
    read). Hidden files (`_`/`.` prefixes — Spark's own markers) are
    skipped. Sorted by path for determinism."""
    jvm, _, fs = _fs(spark, landing_dir)
    pattern = jvm.org.apache.hadoop.fs.Path(landing_dir.rstrip("/") + "/" + glob)
    statuses = fs.globStatus(pattern)
    out: list[LandedFile] = []
    for st in statuses or []:
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        out.append(
            LandedFile(
                path=st.getPath().toString(),
                size=int(st.getLen()),
                mtime_ms=int(st.getModificationTime()),
            )
        )
    return sorted(out, key=lambda f: f.path)


def read_manifest(spark: SparkSession, manifest_dir: str) -> dict[str, int]:
    """path → recorded size for every committed part (missing dir =
    empty manifest)."""
    _, jdir, fs = _fs(spark, manifest_dir)
    if not fs.exists(jdir):
        return {}
    parts = []
    for st in fs.listStatus(jdir):
        name = st.getPath().getName()
        if name.endswith(".jsonl") and not name.startswith("."):
            parts.append(st.getPath().toString())
    if not parts:
        return {}
    seen: dict[str, int] = {}
    # the manifest is metadata (one short line per processed file);
    # spark.read.text keeps the read FS-agnostic without hand-rolled
    # py4j stream plumbing
    for row in spark.read.text(parts).collect():
        line = row.value.strip()
        if line:
            rec = json.loads(line)
            seen[rec["path"]] = int(rec["size"])
    return seen


def _append_manifest_part(
    spark: SparkSession, manifest_dir: str, files: list[LandedFile]
) -> str:
    jvm, jdir, fs = _fs(spark, manifest_dir)
    fs.mkdirs(jdir)
    part = f"part-{uuid.uuid4().hex}.jsonl"
    tmp = jvm.org.apache.hadoop.fs.Path(manifest_dir.rstrip("/") + "/." + part)
    final = jvm.org.apache.hadoop.fs.Path(manifest_dir.rstrip("/") + "/" + part)
    payload = "".join(
        json.dumps({"path": f.path, "size": f.size, "mtime_ms": f.mtime_ms}) + "\n"
        for f in files
    ).encode("utf-8")
    stream = fs.create(tmp, True)
    try:
        stream.write(payload)
    finally:
        stream.close()
    if not fs.rename(tmp, final):
        raise OSError(f"manifest commit rename failed: {tmp} -> {final}")
    return final.toString()


def incremental_read(
    spark: SparkSession,
    landing_dir: str,
    manifest_dir: str,
    fmt: str = "parquet",
    glob: str = "*.parquet",
    schema=None,
) -> tuple[DataFrame | None, list[LandedFile], Callable[[], str | None]]:
    """Read only files not yet recorded in the manifest.

    Returns ``(df, new_files, commit)``:

    - ``df`` — a DataFrame over exactly the unprocessed files (``None``
      when there is nothing new and no ``schema`` was given to build an
      empty frame from);
    - ``new_files`` — what ``df`` covers, in deterministic path order;
    - ``commit()`` — call AFTER the batch's outputs are durably
      written: appends one atomic manifest part recording
      ``new_files`` and returns its path (``None`` if there was
      nothing to record). Crash before commit ⇒ the next run sees the
      same files again (at-least-once into an idempotent sink —
      pair with `operators/cdc.merge_upsert` or an overwrite-by-
      partition write for effective exactly-once).

    A landed path whose size differs from its manifest record violates
    the immutability contract and raises instead of guessing.
    """
    landed = list_landed(spark, landing_dir, glob)
    seen = read_manifest(spark, manifest_dir)
    for f in landed:
        if f.path in seen and seen[f.path] != f.size:
            raise ValueError(
                f"landed file changed size after being processed: {f.path} "
                f"(recorded {seen[f.path]}, now {f.size}) — landing files "
                "must be immutable"
            )
    new_files = [f for f in landed if f.path not in seen]

    if not new_files:
        if schema is None:
            return None, [], lambda: None
        empty = spark.createDataFrame([], schema)
        return empty, [], lambda: None

    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.load([f.path for f in new_files])

    def commit() -> str | None:
        return _append_manifest_part(spark, manifest_dir, new_files)

    return df, new_files, commit
