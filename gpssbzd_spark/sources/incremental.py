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

import hashlib
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


@dataclass(frozen=True)
class CompactionResult:
    n_input_files: int
    outputs: list[str]
    manifest_part: str | None


def compact_landing(
    spark: SparkSession,
    landing_dir: str,
    manifest_dir: str,
    fmt: str = "parquet",
    glob: str = "*.parquet",
    target_files: int = 1,
    min_files: int = 2,
) -> CompactionResult:
    """Rewrite accumulated PROCESSED landing files into
    ``target_files``-sized parquet with an atomic manifest update
    (VERDICT r5 #8). A landing dir receives many small files; after
    ingestion they are dead weight — O(files) listings, tiny-file
    reads for any archival scan. Compaction folds them into a few
    large parquet files without ever letting a manifest-driven reader
    observe a partial state or re-ingest processed content:

    1. victims = landed ∩ manifest (UNPROCESSED files are never
       touched — they still owe the ingest an appearance);
    2. the rewrite lands under HIDDEN names (``.``-prefixed — invisible
       to :func:`list_landed`), so a crash mid-write leaves harmless
       orphans;
    3. ONE atomic manifest part records the final (visible) output
       paths+sizes BEFORE anything becomes visible — so when an output
       appears it is already "processed" and can never be re-ingested;
    4. hidden outputs rename to their visible names, then the victims
       are deleted. A crash between 3 and the deletes leaves victims +
       outputs coexisting — both recorded, neither re-ingested, and the
       retry converges (see below).

    Crash recovery is via an INTENT record (same create-temp + atomic
    rename as manifest parts): after staging, one
    ``.compact-<id>.intent`` file in the manifest dir captures the
    victim list and the staged outputs (names + sizes). Every
    ``compact_landing`` call first COMPLETES any pending intent —
    commit-manifest-if-missing, publish, delete victims, drop the
    intent (each step idempotent) — and sweeps intent-less hidden
    staging orphans (their content still lives in the victims). Only
    then does a fresh round run over the now-consistent state. Without
    the intent, a crash between publish and victim-delete would leave
    originals + compacted copy both recorded, and the NEXT round would
    fold both into its victim set and duplicate their content.
    Previously compacted files are victims like any other once
    ``min_files`` of them accumulate, so repeated rounds converge to
    ``target_files`` files. No-op (``manifest_part=None``) when fewer
    than ``min_files`` victims exist.
    """
    jvm, jland, fs = _fs(spark, landing_dir)
    # FS-qualified roots so recorded paths compare equal to
    # list_landed's (a bare local path would record '/x' while the
    # listing yields 'file:/x' — the compacted output would then look
    # NEW to the next ingest and re-ingest processed content)
    root = fs.makeQualified(jland).toString().rstrip("/")
    mroot = (
        fs.makeQualified(jvm.org.apache.hadoop.fs.Path(manifest_dir))
        .toString()
        .rstrip("/")
    )

    def jp(p: str):
        return jvm.org.apache.hadoop.fs.Path(p)

    _recover_compactions(spark, landing_dir, manifest_dir)

    landed = list_landed(spark, landing_dir, glob)
    seen = read_manifest(spark, manifest_dir)
    victims = [f for f in landed if f.path in seen]
    if len(victims) < min_files:
        return CompactionResult(0, [], None)

    cid = hashlib.sha256(
        "\n".join(f.path for f in victims).encode()
    ).hexdigest()[:16]

    # stage the rewrite under hidden names (invisible to list_landed)
    tmp_dir = f"{root}/.compact-tmp-{cid}"
    (
        spark.read.format(fmt)
        .load([f.path for f in victims])
        .repartition(target_files)
        .write.format(fmt)
        .mode("overwrite")
        .save(tmp_dir)
    )
    parts = sorted(
        st.getPath().toString()
        for st in fs.listStatus(jp(tmp_dir))
        if st.getPath().getName().startswith("part-")
    )
    staged: list[dict] = []
    for i, p in enumerate(parts):
        hidden = f"{root}/.compact-{cid}-{i:05d}.parquet"
        if not fs.rename(jp(p), jp(hidden)):
            raise OSError(f"compaction stage rename failed: {p}")
        staged.append(
            {
                "hidden": hidden,
                "visible": f"{root}/compact-{cid}-{i:05d}.parquet",
                "size": int(fs.getFileStatus(jp(hidden)).getLen()),
            }
        )
    fs.delete(jp(tmp_dir), True)
    if not staged:
        raise OSError(f"compaction produced no output files (id {cid})")

    # atomic intent: from here on, any retry completes this round
    intent = {"victims": [f.path for f in victims], "outputs": staged}
    ipath = f"{mroot}/.compact-{cid}.intent"
    itmp = jp(f"{mroot}/..compact-{cid}.intent.tmp")
    fs.mkdirs(jp(mroot))
    stream = fs.create(itmp, True)
    try:
        stream.write(json.dumps(intent).encode("utf-8"))
    finally:
        stream.close()
    if not fs.rename(itmp, jp(ipath)):
        raise OSError(f"compaction intent rename failed: {ipath}")

    part = _complete_intent(spark, fs, jp, intent, ipath)
    return CompactionResult(
        len(victims), [s["visible"] for s in staged], part
    )


def _complete_intent(spark, fs, jp, intent: dict, ipath: str) -> str | None:
    """Finish a compaction round from its intent record; every step is
    idempotent so this can run after a crash at any point."""
    manifest_dir = ipath.rsplit("/", 1)[0]
    seen = read_manifest(spark, manifest_dir)
    part = None
    missing = [o for o in intent["outputs"] if o["visible"] not in seen]
    if missing:
        # record the FINAL names before anything becomes visible
        part = _append_manifest_part(
            spark,
            manifest_dir,
            [
                LandedFile(path=o["visible"], size=o["size"], mtime_ms=0)
                for o in intent["outputs"]
            ],
        )
    for o in intent["outputs"]:
        if fs.exists(jp(o["hidden"])) and not fs.rename(
            jp(o["hidden"]), jp(o["visible"])
        ):
            raise OSError(f"compaction publish rename failed: {o['hidden']}")
        if not fs.exists(jp(o["visible"])):
            raise OSError(f"compaction output lost: {o['visible']}")
    for path in intent["victims"]:
        if fs.exists(jp(path)):
            fs.delete(jp(path), False)
    fs.delete(jp(ipath), False)
    return part


def _recover_compactions(
    spark: SparkSession, landing_dir: str, manifest_dir: str
) -> int:
    """Complete pending compaction intents and sweep intent-less hidden
    staging orphans. Returns the number of intents completed."""
    jvm, jdir, fs = _fs(spark, manifest_dir)

    def jp(p: str):
        return jvm.org.apache.hadoop.fs.Path(p)

    done = 0
    intent_ids = set()
    if fs.exists(jdir):
        for st in fs.listStatus(jdir):
            name = st.getPath().getName()
            if name.startswith(".compact-") and name.endswith(".intent"):
                ipath = st.getPath().toString()
                stream = fs.open(st.getPath())
                try:
                    raw = bytes(
                        stream.readAllBytes()
                        if hasattr(stream, "readAllBytes")
                        else _read_stream(stream)
                    )
                finally:
                    stream.close()
                intent = json.loads(raw.decode("utf-8"))
                intent_ids.add(name[len(".compact-") : -len(".intent")])
                _complete_intent(spark, fs, jp, intent, ipath)
                done += 1
    # hidden staging files with no intent: content still in victims
    _, ldir, lfs = _fs(spark, landing_dir)
    if lfs.exists(ldir):
        for st in lfs.listStatus(ldir):
            name = st.getPath().getName()
            if name.startswith(".compact-") and name.split("-")[1].split(".")[
                0
            ] not in intent_ids:
                lfs.delete(st.getPath(), True)
    return done


def _read_stream(stream) -> bytes:
    out = bytearray()
    while True:
        b = stream.read()
        if b < 0:
            return bytes(out)
        out.append(b)
