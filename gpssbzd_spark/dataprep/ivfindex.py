"""Persisted IVF index MAINTENANCE (VERDICT r10 next-round #7).

:func:`~gpssbzd_spark.dataprep.similarity.build_ivf_index` builds the
inverted-file ANN index once; this module lets it GROW the way the
signature index does (``sigindex.py``): new vectors are assigned with
the FROZEN codebook and appended as their own cid-partitioned batch
directory — the existing index is never read, re-assigned, or
rewritten, so append cost is O(delta), not O(index) (SCALING.md family
``ivf_append`` measures the curve; the corpus query
``sim_topk_ivf_append`` proves incremental append ≡ re-assigning the
grown corpus from scratch, which holds exactly because assignment is a
deterministic function of (vector, codebook)).

Layout under ``index_dir``::

    codebook.json               the frozen (n_centroids × dim) codebook
    batches/<batch_id>/cid=N/…  one cid-partitioned dir per committed
                                batch (batch 'init' is the build)
    manifest/part-*.jsonl       append-only manifest parts, each
                                committing ONE batch: its dir, row
                                count, mean assignment cosine, and the
                                staleness stats below

ONE commit point — the manifest part — makes the append crash-safe:
the batch parquet writes first under its caller-keyed ``batch_id``
(a retry overwrites the same dir with the same deterministic
assignment), the manifest part commits last, and readers
(:func:`ivf_index_read`, :func:`ivf_index_query`) load ONLY committed
dirs, so a crash between the two leaves an invisible, retry-
overwritable orphan. Single-writer per index_dir, same as sigindex.

**Codebook staleness** (the check a frozen-codebook index needs): at
init the manifest records the per-cell assignment SHARES of the build
corpus. Each append computes its batch's ``drift_fraction`` — the
total-variation distance between the batch's cell shares and the
init's, i.e. literally the FRACTION OF ASSIGNMENTS that would have to
move cells for the batch to look like the build distribution.
Same-distribution data keeps it at sampling noise; distribution shift
concentrates the batch into cells the codebook fit for other data and
pushes it toward 1 — ``stale`` flags when it crosses
``stale_threshold``, the signal to re-run k-means and rebuild into a
NEW index_dir (re-bucketing is the one maintenance step that cannot
be incremental). Chosen over an assignment-cosine floor because in
high dimensions nearest-centroid cosine is a weak, noisy statistic
(measured on the fixture: a genuinely shifted cloud moved it not at
all, while cell occupancy separated cleanly). Drift semantics are
pytest-pinned (concentrated shifted batch flags, in-distribution
batch does not); per-batch ``mean_sim`` also lands in the manifest
for monitoring.

The manifest uses local-filesystem atomic renames (``os.replace``) —
the same single-commit-point shape as ``sigindex.py``'s Hadoop-FS
parts; a cloud deployment swaps in its catalog/metastore transaction.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gpssbzd_spark.dataprep import manifest
from gpssbzd_spark.sources.tables import local_rows
from gpssbzd_spark.dataprep.similarity import (
    _nearest_centroids_udf,
    _norm,
    build_ivf_index,
    cosine_from_parts,
    probe_centroid_ids,
)


def _manifest_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "manifest")


def _commit_manifest_part(index_dir: str, record: dict) -> str:
    """Atomically append one manifest part — the single commit point
    (shared machinery: :func:`~gpssbzd_spark.dataprep.manifest.
    write_part`)."""
    return manifest.write_part(_manifest_dir(index_dir), record)


def _apply_compactions(records: list[dict]) -> list[dict]:
    """Resolve compaction records: a record carrying ``replaces``
    supersedes the listed batch_ids — readers see the compacted batch
    and never consult the folded dirs again. Shared machinery
    (:func:`~gpssbzd_spark.dataprep.manifest.resolve_supersedence`,
    chained compactions resolved over ALL records)."""
    return manifest.resolve_supersedence(
        records, ident=lambda r: r["batch_id"]
    )


def _raw_manifest_records(index_dir: str) -> list[dict]:
    """Every committed manifest record, compaction supersedence NOT
    applied — the idempotency dedupe must see folded batch_ids too (a
    retry of a day a later compaction already folded must return its
    committed record, never re-append its rows). One record per
    batch_id (every commit path is idempotent by id, so duplicates
    describe the same rows)."""
    records = manifest.dedupe_records(
        manifest.read_parts(_manifest_dir(index_dir)),
        ident=lambda r: r["batch_id"],
    )
    return sorted(records, key=lambda r: (r["seq"], r["batch_id"]))


def ivf_index_batches(index_dir: str) -> list[dict]:
    """Committed batch records, init first then appends in commit
    order (ties broken by batch_id for determinism); compaction
    records supersede the batches they folded."""
    return sorted(
        _apply_compactions(_raw_manifest_records(index_dir)),
        key=lambda r: (r["seq"], r["batch_id"]),
    )


def ivf_index_codebook(index_dir: str) -> np.ndarray:
    with open(os.path.join(index_dir, "codebook.json")) as fh:
        return np.array(json.load(fh), dtype=np.float64)


def _assignment_sims(
    assigned: DataFrame, cents: np.ndarray, vec_col: str
) -> DataFrame:
    """Attach ``_sim`` — the cosine between each row's vector and its
    assigned centroid — via a broadcast join against the (tiny)
    codebook table; pure JVM scoring (the assignment UDF already ran)."""
    spark = assigned.sparkSession
    cent_rows = [(int(i), [float(x) for x in c]) for i, c in enumerate(cents)]
    cent_df = local_rows(
        spark,
        cent_rows,
        T.StructType(
            [
                T.StructField("cid", T.IntegerType()),
                T.StructField("_cent", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    sim = cosine_from_parts(
        F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.col("_cent"),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        F.col("_norm_e"),
        _norm(F.col("_cent")),
    )
    return assigned.join(F.broadcast(cent_df), "cid").withColumn("_sim", sim)


def _assign(
    embeddings: DataFrame, cents: np.ndarray, id_col: str, vec_col: str
) -> DataFrame:
    """(id, vec, _norm_e, cid) — the index row shape, assignment via
    the frozen codebook (deterministic, so retry-overwrite and the
    append ≡ rebuild oracle both hold)."""
    assign = _nearest_centroids_udf(cents, 1)
    return embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        _norm(F.col(vec_col)).alias("_norm_e"),
        F.element_at(assign(F.col(vec_col)), 1).alias("cid"),
    )


def _write_batch(index: DataFrame, index_dir: str, batch_id: str) -> str:
    batch_dir = os.path.join(index_dir, "batches", batch_id)
    index.repartition("cid").write.mode("overwrite").partitionBy(
        "cid"
    ).parquet(batch_dir)
    return batch_dir


def ivf_index_init(
    spark: SparkSession,
    index_dir: str,
    embeddings: DataFrame,
    dim: int,
    n_centroids: int = 16,
    iters: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Build the growable index: k-means codebook + the ``init`` batch
    + the staleness floor. Returns the codebook. Idempotent per
    index_dir (raises if already initialized — rebuild means a NEW
    index_dir, never an in-place mutation readers could half-see)."""
    if ivf_index_batches(index_dir):
        raise ValueError(
            f"IVF index at {index_dir} is already initialized — "
            "a codebook rebuild writes a NEW index_dir"
        )
    index, cents = build_ivf_index(
        embeddings, dim, n_centroids, iters, seed, id_col, vec_col
    )
    os.makedirs(index_dir, exist_ok=True)
    with open(os.path.join(index_dir, "codebook.json"), "w") as fh:
        json.dump(cents.tolist(), fh)
    batch_dir = _write_batch(index, index_dir, "init")
    persisted = spark.read.option("basePath", batch_dir).parquet(batch_dir)
    scored = _assignment_sims(persisted, cents, vec_col)
    counts = {
        int(r["cid"]): r["cnt"]
        for r in scored.groupBy("cid").agg(F.count("*").alias("cnt")).collect()
    }
    n = sum(counts.values())
    mean_sim = scored.agg(F.avg("_sim")).head()[0]
    _commit_manifest_part(
        index_dir,
        {
            "seq": 0,
            "batch_id": "init",
            "dir": batch_dir,
            "n": n,
            "mean_sim": mean_sim,
            # per-cell assignment shares — the staleness reference
            "shares": {str(c): cnt / n for c, cnt in counts.items()},
        },
    )
    return cents


def ivf_index_append(
    spark: SparkSession,
    index_dir: str,
    new_embeddings: DataFrame,
    batch_id: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stale_threshold: float = 0.5,
) -> dict:
    """Append ``new_embeddings`` as one committed batch: assign with
    the FROZEN codebook, write ONLY the new rows (O(delta) — the
    existing batches are never read), measure the batch's
    ``drift_fraction`` against the init floor, commit one manifest
    part. Returns the committed record (with ``stale`` evaluated
    against ``stale_threshold``). ``batch_id`` is the caller's ingest
    key — a crashed retry with the same id overwrites the same dir and
    re-commits idempotently (the manifest dedupes by batch_id)."""
    batches = ivf_index_batches(index_dir)
    if not batches:
        raise ValueError(
            f"IVF index at {index_dir} has no init batch — run "
            "ivf_index_init first"
        )
    if batch_id == "init":
        # the build's reserved id (its record has no drift_fraction) —
        # a collision would otherwise die with a bare KeyError on the
        # idempotent-retry path (r11 review)
        raise ValueError(
            "ivf_index_append: batch_id 'init' is reserved for the build"
        )
    # dedupe against RAW records: a batch a later compaction folded
    # must still short-circuit its retry (its rows live on inside the
    # compacted batch — re-appending would duplicate them)
    for b in _raw_manifest_records(index_dir):
        if b["batch_id"] == batch_id:
            return {**b, "stale": b.get("drift_fraction", 0.0) > stale_threshold}
    cents = ivf_index_codebook(index_dir)
    # the staleness reference: the FIRST surviving record carrying
    # shares (the init record, or the compaction record that carried
    # them forward) — taken explicitly (ADVICE r12): merging across
    # several carriers would silently blend two different staleness
    # references if a future partial compaction ever left more than
    # one alive
    carrier = next((b for b in batches if "shares" in b), None)
    assert carrier is not None, (
        f"IVF index at {index_dir} lost its staleness reference shares"
    )
    ref_shares = {int(c): s for c, s in carrier["shares"].items()}
    index = _assign(new_embeddings, cents, id_col, vec_col)
    batch_dir = _write_batch(index, index_dir, batch_id)
    persisted = spark.read.option("basePath", batch_dir).parquet(batch_dir)
    scored = _assignment_sims(persisted, cents, vec_col)
    counts = {
        int(r["cid"]): r["cnt"]
        for r in scored.groupBy("cid").agg(F.count("*").alias("cnt")).collect()
    }
    n = sum(counts.values())
    mean_sim = scored.agg(F.avg("_sim")).head()[0]
    # total-variation distance of cell shares: the fraction of this
    # batch's assignments that would have to move cells to match the
    # build distribution — the "assignment drift fraction"
    drift = 0.5 * sum(
        abs(counts.get(c, 0) / max(n, 1) - ref_shares.get(c, 0.0))
        for c in set(counts) | set(ref_shares)
    )
    record = {
        "seq": batches[-1]["seq"] + 1,
        "batch_id": batch_id,
        "dir": batch_dir,
        "n": n,
        "mean_sim": mean_sim,
        "drift_fraction": drift,
    }
    _commit_manifest_part(index_dir, record)
    return {**record, "stale": record["drift_fraction"] > stale_threshold}


def ivf_index_compact(
    spark: SparkSession,
    index_dir: str,
    batch_id: str,
    min_batches: int = 2,
) -> dict | None:
    """Fold ALL committed batches into ONE cid-partitioned batch dir
    (the LSM-style maintenance step a daily-append index needs: after
    N days the index holds N batch dirs and every query unions N
    probed reads — compaction restores O(1) dirs without changing a
    single row). Content-identical by construction: the compacted
    batch is the union of the folded batches' PERSISTED rows
    (no re-assignment — the codebook never re-runs), rewritten
    partitioned by cid.

    Crash-safety is the append recipe: the compacted parquet writes
    first under the caller-keyed ``batch_id`` (idempotent retry), and
    ONE manifest part carrying ``replaces=[folded batch ids]`` is the
    single commit point — readers apply the supersedence rule
    (:func:`_apply_compactions`), so a crash between the two leaves an
    invisible orphan and the folded dirs are never consulted again
    after the commit (unreferenced garbage, lazily deletable). Returns
    the committed record, or None when fewer than ``min_batches``
    batches exist (nothing to fold)."""
    batches = ivf_index_batches(index_dir)
    if not batches:
        raise ValueError(
            f"IVF index at {index_dir} has no committed batches"
        )
    if batch_id == "init":
        raise ValueError(
            "ivf_index_compact: batch_id 'init' is reserved for the build"
        )
    for b in _raw_manifest_records(index_dir):
        if b["batch_id"] == batch_id:
            return b  # idempotent retry after a committed compaction
    if len(batches) < min_batches:
        return None
    merged = ivf_index_read(spark, index_dir)
    batch_dir = _write_batch(merged, index_dir, batch_id)
    n = spark.read.parquet(batch_dir).count()
    record = {
        "seq": batches[-1]["seq"] + 1,
        "batch_id": batch_id,
        "dir": batch_dir,
        "n": n,
        "replaces": [b["batch_id"] for b in batches],
    }
    # the codebook-staleness REFERENCE (the build's per-cell shares)
    # must survive compaction — later appends read it from the first
    # surviving record
    for b in batches:
        if "shares" in b:
            record["shares"] = b["shares"]
            break
    _commit_manifest_part(index_dir, record)
    # post-commit GC (ADVICE r13): the folded dirs are unreferenced
    # once the replaces record lands — delete them now instead of
    # retaining ~2× the index per compaction; best-effort (a crash
    # mid-delete leaves unreferenced partials the next fold collects)
    manifest.delete_dirs(b["dir"] for b in batches)
    return record


def ivf_index_read(spark: SparkSession, index_dir: str) -> DataFrame:
    """All committed batches as one index DataFrame (the
    :func:`~gpssbzd_spark.dataprep.similarity.ivf_query` input shape).
    Uncommitted (crashed) batch dirs are invisible."""
    batches = ivf_index_batches(index_dir)
    assert batches, f"IVF index at {index_dir} has no committed batches"
    parts = [
        spark.read.option("basePath", b["dir"]).parquet(b["dir"])
        for b in batches
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def ivf_index_query(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Pruned serving over the GROWABLE index: driver-side codebook
    consult (:func:`probe_centroid_ids`), then read only the probed
    cid directories of each committed batch (missing = empty inverted
    list in that batch, skipped), scored through the shared pure-JVM
    literal-probe tail (:func:`~gpssbzd_spark.dataprep.similarity.
    literal_probe_topk` — no pandas UDF in the serving plan)."""
    from gpssbzd_spark.dataprep.similarity import (
        empty_topk,
        literal_probe_topk,
    )

    cents = ivf_index_codebook(index_dir)
    rows = queries.select(query_id_col, query_vec_col).collect()
    if not rows:
        return empty_topk(
            spark,
            queries.schema[query_id_col].dataType,
            ivf_index_read(spark, index_dir).schema[id_col].dataType,
            query_id_col,
            id_col,
        )
    qv = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    probed = probe_centroid_ids(cents, qv, n_probe)
    cids = sorted({int(c) for row in probed for c in row})
    parts = []
    for b in ivf_index_batches(index_dir):
        dirs = [
            os.path.join(b["dir"], f"cid={c}")
            for c in cids
            if os.path.isdir(os.path.join(b["dir"], f"cid={c}"))
        ]
        if dirs:
            parts.append(
                spark.read.option("basePath", b["dir"]).parquet(*dirs)
            )
    assert parts, (
        f"no probed centroid {cids} has data in any committed batch "
        f"under {index_dir}"
    )
    index = parts[0]
    for p in parts[1:]:
        index = index.unionByName(p)
    return literal_probe_topk(
        index,
        rows,
        probed,
        queries.schema[query_id_col].dataType,
        k,
        id_col,
        vec_col,
        query_id_col,
        query_vec_col,
    )
