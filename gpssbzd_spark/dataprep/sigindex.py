"""Persisted MinHash signature-index MAINTENANCE (VERDICT r9 #5).

:func:`~gpssbzd_spark.dataprep.dedup.incremental_neardup_matches`
detects a delta's near-dups against a persisted signature index, but a
daily ingest loop only closes if accepted deltas GROW that index. This
module owns the growth: exactly-once pickup of newly-landed document
files, signing of ONLY those files, and a crash-safe append of the new
signature rows into the persisted layout — the existing index is never
read, re-signed, or rewritten, so append cost is O(delta), not
O(index) (SCALING.md family ``sigindex_append`` measures the curve;
the corpus query ``dd_incremental_index_append`` proves incremental
append ≡ re-signing from scratch against a DuckDB oracle).

Layout under ``index_dir``::

    sigs/batch-<cid>/...parquet   one dir per committed ingest batch,
                                  narrow rows (id, h0..h{n-1}) from
                                  minhash_signatures_portable
    manifest/*.jsonl              append-only manifest parts (the same
                                  create-temp + atomic-rename pattern
                                  as sources/incremental.py), each
                                  recording ONE batch: its dir AND the
                                  landed files it covers

ONE commit point — the index manifest part — makes the ingest
crash-safe without a second (landing) manifest to race against:

1. new files = landing listing MINUS the files covered by committed
   batches (the manifest is the single source of truth for "signed";
   a landed path re-appearing with a different size violates the
   immutability contract and raises);
2. the batch dir name is ``batch-<sha256(paths+sizes)[:16]>`` and the
   parquet write is mode=overwrite: a retry that selects the same
   remainder recomputes the same cid and overwrites the same dir;
3. the manifest part commits LAST. Crash BEFORE it: the batch dir is
   an invisible orphan (readers load only committed dirs) and the
   next ingest re-selects the same files — if MORE files landed in
   between, the retry's remainder (and cid) simply grows to cover
   them; the stale orphan can never be committed and is swept. Crash
   AFTER it: the ingest is complete — there is no second step to
   lose. No interleaving can commit one covered file twice, so
   duplicate signature rows cannot enter the index.

Single-writer per index_dir (the same assumption as
``compact_landing``); concurrent readers always see a committed
prefix.
"""

from __future__ import annotations

import hashlib
import json
import uuid

from pyspark.sql import DataFrame, SparkSession

from gpssbzd_spark.dataprep.dedup import minhash_signatures_portable
from gpssbzd_spark.sources.incremental import _fs, list_landed


def _paths(index_dir: str) -> tuple[str, str]:
    root = index_dir.rstrip("/")
    return f"{root}/sigs", f"{root}/manifest"


def _read_index_manifest(
    spark: SparkSession, manifest_dir: str
) -> tuple[dict[str, int], set[str]]:
    """(covered landed-file path → recorded size, committed batch
    dirs). Missing dir = empty index."""
    _, jdir, fs = _fs(spark, manifest_dir)
    if not fs.exists(jdir):
        return {}, set()
    parts = [
        st.getPath().toString()
        for st in fs.listStatus(jdir)
        if st.getPath().getName().endswith(".jsonl")
        and not st.getPath().getName().startswith(".")
    ]
    covered: dict[str, int] = {}
    batches: set[str] = set()
    if not parts:
        return covered, batches
    for row in spark.read.text(parts).collect():
        line = row.value.strip()
        if not line:
            continue
        rec = json.loads(line)
        if "batch" not in rec:  # foreign/older record shape: ignore
            continue
        batches.add(rec["batch"])
        for f in rec.get("files", []):
            covered[f["path"]] = int(f["size"])
    return covered, batches


def _commit_batch(
    spark: SparkSession, manifest_dir: str, batch_dir: str, files
) -> None:
    """Atomically append ONE manifest part recording the batch — the
    ingest's single commit point (create hidden temp, write, rename)."""
    jvm, jdir, fs = _fs(spark, manifest_dir)
    fs.mkdirs(jdir)
    part = f"part-{uuid.uuid4().hex}.jsonl"
    root = manifest_dir.rstrip("/")
    tmp = jvm.org.apache.hadoop.fs.Path(f"{root}/.{part}")
    final = jvm.org.apache.hadoop.fs.Path(f"{root}/{part}")
    payload = (
        json.dumps(
            {
                "batch": batch_dir,
                "files": [{"path": f.path, "size": f.size} for f in files],
            }
        )
        + "\n"
    ).encode("utf-8")
    stream = fs.create(tmp, True)
    try:
        stream.write(payload)
    finally:
        stream.close()
    if not fs.rename(tmp, final):
        raise OSError(f"index manifest commit rename failed: {tmp} -> {final}")


def sig_index_ingest(
    spark: SparkSession,
    landing_dir: str,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_n: int = 3,
    fmt: str = "parquet",
    glob: str = "*.parquet",
) -> str | None:
    """Sign newly-landed document files into the index. Returns the
    committed batch dir, or ``None`` when nothing new had landed.

    O(delta): lists the landing dir (metadata only), subtracts the
    manifest-covered files, signs the remainder, writes one batch dir,
    commits one manifest part. The existing ``sigs/`` content is never
    touched. See the module docstring for the crash analysis.
    """
    sigs_dir, manifest_dir = _paths(index_dir)
    landed = list_landed(spark, landing_dir, glob)
    covered, committed = _read_index_manifest(spark, manifest_dir)
    for f in landed:
        if f.path in covered and covered[f.path] != f.size:
            raise ValueError(
                f"landed file changed size after being signed: {f.path} "
                f"(recorded {covered[f.path]}, now {f.size}) — landing "
                "files must be immutable"
            )
    new_files = [f for f in landed if f.path not in covered]
    if not new_files:
        return None
    cid = hashlib.sha256(
        "\n".join(f"{f.path}\t{f.size}" for f in new_files).encode()
    ).hexdigest()[:16]
    batch_dir = f"{sigs_dir}/batch-{cid}"
    _sweep_orphans(spark, sigs_dir, committed, keep=batch_dir)
    reader = spark.read.format(fmt)
    sigs = minhash_signatures_portable(
        reader.load([f.path for f in new_files]).select(id_col, text_col),
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        shingle_n=shingle_n,
    )
    # idempotent by construction: a crashed retry over the same
    # remainder recomputes the same cid and overwrites the same dir
    sigs.write.mode("overwrite").parquet(batch_dir)
    _commit_batch(spark, manifest_dir, batch_dir, new_files)
    return batch_dir


def _sweep_orphans(
    spark: SparkSession, sigs_dir: str, committed: set[str], keep: str
) -> None:
    """Delete uncommitted batch dirs (crash-before-commit leftovers
    whose file set has since changed — they can never be committed).
    The dir about to be (re)written is kept; committed dirs are data."""
    _, jdir, fs = _fs(spark, sigs_dir)
    if not fs.exists(jdir):
        return
    # compare by dir NAME: the listing yields FS-qualified paths
    # (file:/…) while the manifest records the caller's spelling — a
    # full-path compare would mistake every committed batch for an
    # orphan and delete the index (the cid names are unique per batch)
    committed_names = {c.rstrip("/").rsplit("/", 1)[-1] for c in committed}
    keep_name = keep.rstrip("/").rsplit("/", 1)[-1]
    for st in fs.listStatus(jdir):
        name = st.getPath().getName()
        if (
            name.startswith("batch-")
            and name not in committed_names
            and name != keep_name
        ):
            fs.delete(st.getPath(), True)


def sig_index_read(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """The persisted signature rows across every COMMITTED batch —
    ``None`` when the index has no committed batches yet. Uncommitted
    (crashed) batch dirs are invisible: only manifest-recorded dirs
    load."""
    _, manifest_dir = _paths(index_dir)
    _, batches = _read_index_manifest(spark, manifest_dir)
    if not batches:
        return None
    return spark.read.parquet(*sorted(batches))


def sig_index_match(
    spark: SparkSession,
    index_dir: str,
    delta_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_n: int = 3,
    bands: int = 4,
    min_agree: int = 6,
) -> DataFrame | None:
    """The daily-loop read half: near-dup match events of ``delta_docs``
    against the PERSISTED index (``None`` if the index is empty).
    Composes :func:`sig_index_read` with
    :func:`~gpssbzd_spark.dataprep.dedup.incremental_neardup_matches`
    — sign the delta only, band-join the stored signature rows. Pass
    the SAME ``num_hashes``/``shingle_n`` the index was ingested with
    (signatures from different shingle grids never agree)."""
    from gpssbzd_spark.dataprep.dedup import incremental_neardup_matches

    index_sigs = sig_index_read(spark, index_dir)
    if index_sigs is None:
        return None
    delta_sigs = minhash_signatures_portable(
        delta_docs.select(id_col, text_col),
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        shingle_n=shingle_n,
    )
    return incremental_neardup_matches(
        delta_sigs,
        index_sigs,
        id_col=id_col,
        num_hashes=num_hashes,
        bands=bands,
        min_agree=min_agree,
    )
