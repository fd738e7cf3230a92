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
                                  create-temp + atomic-rename parts as
                                  sources/incremental.py) recording
                                  committed batch dirs
    landing_manifest/*.jsonl      processed-file manifest for the
                                  landing dir (exactly-once pickup via
                                  sources.incremental.incremental_read)

Crash safety, step by step (mirrors ``compact_landing``'s reasoning):

1. ``incremental_read`` lists the landing dir and subtracts its
   manifest — the batch is exactly the not-yet-processed files;
2. the batch dir name is ``batch-<sha256(paths)[:16]>``: a retry after
   a crash re-selects the SAME files (landing manifest not yet
   committed) and therefore OVERWRITES the same dir — the parquet
   write is idempotent;
3. the index manifest part commits AFTER the parquet write: readers
   load only recorded dirs, so a half-written batch dir from a crash
   is invisible until its retry commits. A crash between the index
   commit and the landing commit re-appends a duplicate RECORD of the
   same dir on retry — reads dedupe records by path, and the dir
   content is byte-stable (same files, same signer), so no duplicate
   rows can enter;
4. the landing manifest commits LAST — only after the signatures are
   durably recorded may the inputs be considered processed.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession

from gpssbzd_spark.dataprep.dedup import minhash_signatures_portable
from gpssbzd_spark.sources.incremental import (
    LandedFile,
    _append_manifest_part,
    incremental_read,
    read_manifest,
)


def _paths(index_dir: str) -> tuple[str, str, str]:
    root = index_dir.rstrip("/")
    return (
        f"{root}/sigs",
        f"{root}/manifest",
        f"{root}/landing_manifest",
    )


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

    O(delta): lists the landing dir (manifest subtraction — metadata
    only), signs the new files, writes one batch dir, appends two
    manifest parts. The existing ``sigs/`` content is untouched.
    """
    sigs_dir, manifest_dir, landing_manifest = _paths(index_dir)
    df, new_files, commit_landing = incremental_read(
        spark, landing_dir, landing_manifest, fmt=fmt, glob=glob
    )
    if df is None or not new_files:
        return None
    cid = hashlib.sha256(
        "\n".join(f.path for f in new_files).encode()
    ).hexdigest()[:16]
    batch_dir = f"{sigs_dir}/batch-{cid}"
    sigs = minhash_signatures_portable(
        df.select(id_col, text_col),
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        shingle_n=shingle_n,
    )
    # idempotent by construction: a crashed retry recomputes the same
    # cid from the same unprocessed files and overwrites the same dir
    sigs.write.mode("overwrite").parquet(batch_dir)
    _append_manifest_part(
        spark,
        manifest_dir,
        [LandedFile(path=batch_dir, size=0, mtime_ms=0)],
    )
    commit_landing()
    return batch_dir


def sig_index_read(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """The persisted signature rows across every COMMITTED batch —
    ``None`` when the index has no committed batches yet. Uncommitted
    (crashed) batch dirs are invisible: only manifest-recorded dirs
    load. Duplicate manifest records of one dir (crash between the
    index and landing commits, see module docstring step 3) dedupe by
    path here."""
    _, manifest_dir, _ = _paths(index_dir)
    recorded = read_manifest(spark, manifest_dir)
    if not recorded:
        return None
    return spark.read.parquet(*sorted(set(recorded)))


def sig_index_match(
    spark: SparkSession,
    index_dir: str,
    delta_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    min_agree: int = 6,
) -> DataFrame | None:
    """The daily-loop read half: near-dup match events of ``delta_docs``
    against the PERSISTED index (``None`` if the index is empty).
    Composes :func:`sig_index_read` with
    :func:`~gpssbzd_spark.dataprep.dedup.incremental_neardup_matches`
    — sign the delta only, band-join the stored signature rows."""
    from gpssbzd_spark.dataprep.dedup import incremental_neardup_matches

    index_sigs = sig_index_read(spark, index_dir)
    if index_sigs is None:
        return None
    delta_sigs = minhash_signatures_portable(
        delta_docs.select(id_col, text_col),
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
    )
    return incremental_neardup_matches(
        delta_sigs,
        index_sigs,
        id_col=id_col,
        num_hashes=num_hashes,
        bands=bands,
        min_agree=min_agree,
    )
