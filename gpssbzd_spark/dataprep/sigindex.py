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

from pyspark.sql import DataFrame, SparkSession

from gpssbzd_spark.dataprep import manifest
from gpssbzd_spark.dataprep.dedup import minhash_signatures_portable
from gpssbzd_spark.sources.incremental import list_landed


def _paths(index_dir: str) -> tuple[str, str]:
    root = index_dir.rstrip("/")
    return f"{root}/sigs", f"{root}/manifest"


def _read_index_manifest(
    spark: SparkSession, manifest_dir: str
) -> tuple[dict[str, int], set[str]]:
    """(covered landed-file path → recorded size, committed batch
    dirs). Missing dir = empty index.

    Compaction supersedence (r13, VERDICT r12 #4): a record carrying
    ``replaces`` folds the listed batch dirs — readers drop them and
    consult only the compacted dir (shared machinery:
    :func:`~gpssbzd_spark.dataprep.manifest.resolve_supersedence`,
    chained compactions resolved over ALL records). Matching is by
    batch-dir NAME — the cid names are unique per batch, while
    full-path spellings can differ between the writer's argument and
    an FS-qualified listing (same reasoning as ``_sweep_orphans``).
    File coverage survives folding because every compaction record
    carries the full covered-files ledger of the records it folds."""
    records = [
        rec
        for _, rec in manifest.read_parts(manifest_dir, spark=spark)
        if "batch" in rec  # foreign/older record shape: ignore
    ]
    surviving = manifest.resolve_supersedence(
        records,
        ident=lambda r: manifest.basename(r["batch"]),
        replaced_ids=lambda r: [
            manifest.basename(d) for d in (r.get("replaces") or ())
        ],
    )
    covered: dict[str, int] = {}
    batches: set[str] = set()
    for rec in surviving:
        batches.add(rec["batch"])
        for f in rec.get("files", []):
            covered[f["path"]] = int(f["size"])
    return covered, batches


def _commit_batch(
    spark: SparkSession,
    manifest_dir: str,
    batch_dir: str,
    files,
    replaces: list[str] | None = None,
) -> None:
    """Atomically append ONE manifest part recording the batch — the
    ingest's single commit point (shared machinery:
    :func:`~gpssbzd_spark.dataprep.manifest.write_part`, Hadoop-FS
    backend so the index can live on any Spark-supported filesystem).
    ``files`` is either the landed-file objects of a fresh ingest or
    the ``(path, size)`` items of the coverage ledger a compaction
    carries forward; ``replaces`` marks a compaction record."""
    record = {
        "batch": batch_dir,
        "files": [
            {"path": p, "size": s}
            for p, s in (
                files.items()
                if isinstance(files, dict)
                else ((f.path, f.size) for f in files)
            )
        ],
    }
    if replaces:
        record["replaces"] = sorted(replaces)
    manifest.write_part(manifest_dir, record, spark=spark)


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
    # r14 (guide §6, output sizing): the signing path's partition-count
    # floor (widen_small_input inside minhash_signatures_portable)
    # computes wide, but writing a tiny delta batch at session
    # parallelism left 32 ~10-row files per batch dir — and every later
    # sig_index_read paid the fragmented listing/scan (bench row
    # 0.28 → 1.04 s). Signatures are narrower than the landed text by
    # construction, so the landing's own file count is a sound ceiling
    # for the batch's file count: big deltas keep big-delta layouts,
    # fixture deltas collapse back to one file.
    sigs = sigs.coalesce(max(1, len(new_files)))
    # idempotent by construction: a crashed retry over the same
    # remainder recomputes the same cid and overwrites the same dir
    sigs.write.mode("overwrite").parquet(batch_dir)
    _commit_batch(spark, manifest_dir, batch_dir, new_files)
    return batch_dir


def sig_index_compact(
    spark: SparkSession, index_dir: str, min_batches: int = 2
) -> str | None:
    """Fold ALL committed batch dirs into ONE — the LSM-style
    maintenance step the ANN indexes got in r12 (``ivf_index_compact``
    / ``lsh_index_compact``), transplanted to the signature index
    (VERDICT r12 missing #1): a daily ingest commits one ``batch-*``
    dir per day forever, and after enough days every
    :func:`sig_index_read` pays the small-file LISTING cost the r12
    capture documented (PERF_NOTES #11: 14/8/16 s of pure listing).
    Compaction restores O(1) dirs without changing a single signature
    row.

    Content-identical by construction: the compacted dir is the union
    of the folded dirs' PERSISTED rows — nothing is re-signed.
    Crash-safety is the ingest recipe re-used end-to-end:

    - the compacted dir name is ``batch-compact-<sha256(folded
      dirs)[:16]>`` and the write is mode=overwrite, so a retry over
      the same committed set recomputes the same cid and overwrites
      the same dir;
    - ONE manifest part carrying ``replaces=[folded dirs]`` AND the
      full covered-files ledger is the single commit point. Crash
      BEFORE it: the compact dir is an uncommitted ``batch-*`` orphan
      — invisible to readers and swept by the next ingest's
      ``_sweep_orphans``. Crash AFTER it: compaction is complete and
      the folded dirs are deleted post-commit (best-effort; whatever a
      crash mid-delete leaves behind is unreferenced garbage the next
      ingest's sweep collects, since it no longer appears in the
      committed set);
    - a re-run after the commit sees ONE committed batch and returns
      ``None`` (fewer than ``min_batches``) — idempotent, and a later
      compaction over {compact, new days} chains correctly because
      supersedence is resolved over ALL records
      (:func:`_read_index_manifest`).

    Returns the committed compact dir, or ``None`` when fewer than
    ``min_batches`` batches exist."""
    sigs_dir, manifest_dir = _paths(index_dir)
    covered, batches = _read_index_manifest(spark, manifest_dir)
    if len(batches) < min_batches:
        return None
    folded = sorted(batches)
    cid = hashlib.sha256(
        "\n".join(d.rstrip("/").rsplit("/", 1)[-1] for d in folded).encode()
    ).hexdigest()[:16]
    compact_dir = f"{sigs_dir}/batch-compact-{cid}"
    # r14 (guide §6): bound the fold's file count at one file per
    # folded batch — the fold's raison d'être is fewer dirs/files, and
    # without the bound the output inherits the input's total file
    # count (a fold over fragmented legacy batches stayed fragmented)
    spark.read.parquet(*folded).coalesce(max(1, len(folded))).write.mode(
        "overwrite"
    ).parquet(compact_dir)
    _commit_batch(spark, manifest_dir, compact_dir, covered, replaces=folded)
    # post-commit GC (ADVICE r13): the folded dirs are unreferenced
    # once the replaces record lands — delete them now; previously an
    # index that stopped ingesting retained the pre-compaction data
    # forever (the next ingest's sweep is skipped on the no-new-files
    # early return). Best-effort: a crash mid-delete leaves orphans
    # the next ingest's sweep collects.
    manifest.delete_dirs(folded, spark=spark)
    return compact_dir


def _sweep_orphans(
    spark: SparkSession, sigs_dir: str, committed: set[str], keep: str
) -> None:
    """Delete uncommitted batch dirs (crash-before-commit leftovers
    whose file set has since changed — they can never be committed).
    The dir about to be (re)written is kept; committed dirs are data.
    Shared machinery (:func:`~gpssbzd_spark.dataprep.manifest.
    sweep_orphan_dirs`): matching is by dir NAME — the listing yields
    FS-qualified paths (file:/…) while the manifest records the
    caller's spelling, and a full-path compare would mistake every
    committed batch for an orphan and delete the index (the cid names
    are unique per batch)."""
    manifest.sweep_orphan_dirs(
        sigs_dir,
        {manifest.basename(c) for c in committed},
        keep_names={manifest.basename(keep)},
        prefix="batch-",
        spark=spark,
    )


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
