"""Persisted hyperplane-LSH ANN index (the LSH half of the
persisted-serving story; sibling of the IVF layout in
``corpus/dataprep.py`` / ``dataprep/ivfindex.py``).

:func:`~gpssbzd_spark.dataprep.similarity.lsh_topk` recomputes every
vector's table buckets in-plan on every call — right for a one-shot
query, wasteful for steady-state serving. Here the bucketed index
persists ONCE, laid out so a query touches only its own buckets:

    index_dir/
      params.json                (dim, n_planes, n_tables, seed) — the
                                 plane family is DERIVED, not stored:
                                 seeded Gaussians reproduce bit-exactly
      index/tbl=T/bucket=B/…     one partition dir per (table, bucket),
                                 rows (vec_id, embedding, _norm_e)

Serving (:func:`lsh_index_query`) mirrors ``ivf_query_pruned``: the
query batch's buckets — base plus the 1-bit multi-probe fan-out — are
computed DRIVER-side with the same float64 matmul+sign kernel as the
executor UDF (:func:`~gpssbzd_spark.dataprep.similarity.
hyperplane_buckets_all`; same ``RandomState(seed+t)`` planes, same
``>= 0`` sign, same bit order), only the existing probed
``tbl=/bucket=`` directories are handed to the reader (a bucket no
vector hashed into writes no directory — skipping it is semantically
identical), and the (query, probe-set) batch joins as a LITERAL
broadcast side — the serving plan is pure JVM. Results are
bit-identical to ``lsh_topk`` over the same corpus (parity pinned in
tests/test_lshindex.py): same candidate dedup-before-scoring, same
fold expressions, same rank tie-break.

At 100 TB: ``n_tables × 2^n_planes`` partition directories (tunable;
8×256 = 2,048 default) each holding ``N/2^n_planes`` vectors — query
cost is governed by bucket occupancy, so a deployment grows
``n_planes`` with log₂(corpus) exactly like the blocked-dedup family
(SCALING.md ``embedding_blocked``) to keep per-bucket lists constant.
Local-filesystem directory checks stand in for the manifest lookup, as
in the IVF path.

MAINTENANCE (VERDICT r11 #4 — the ivfindex recipe transplanted): the
index GROWS by appending (tbl, bucket)-partitioned batch directories
under ``batches/<batch_id>/``, each committed by ONE atomic manifest
part (``manifest/part-*.jsonl``) — new vectors are bucketed with the
FROZEN plane family (derived from the persisted seed, so append is
deterministic and append ≡ rebuild exactly), the existing layout is
never read or rewritten (O(delta)), retries with the same ``batch_id``
overwrite the same dir and re-commit idempotently, and a crash between
the parquet write and the manifest part leaves an invisible orphan.
Simpler than IVF's append in exactly one way: the plane family is
data-INDEPENDENT (seeded Gaussians, not a fitted codebook), so there
is no staleness metric to track — a distribution shift changes bucket
OCCUPANCY but never the correctness of an assignment. The build's
``index/`` dir doubles as the implicit ``init`` batch (synthesized
into the batch list for pre-manifest indexes), so serving reads
init + every committed append uniformly.
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
    _norm,
    hyperplane_buckets_all,
    hyperplane_family,
)


def query_buckets(
    params: dict, query_vecs: np.ndarray, probes: int = 1
) -> list[list[tuple[int, int]]]:
    """Driver-side bucket consult: per query, the (table, bucket)
    probe set — base bucket per table plus every ``probes``-bit flip,
    matching lsh_topk's multi-probe fan-out exactly."""
    proj, weights = hyperplane_family(
        params["dim"], params["n_planes"], params["n_tables"], params["seed"]
    )
    v = np.asarray(query_vecs, dtype=np.float64)
    bits = (v @ proj) >= 0  # (n, T·P)
    b = bits.reshape(len(v), params["n_tables"], params["n_planes"]).astype(
        np.int64
    )
    base = (b * weights).sum(axis=2)  # (n, T)
    n_planes = params["n_planes"]
    out: list[list[tuple[int, int]]] = []
    for row in base:
        cells: set[tuple[int, int]] = set()
        for t, bb in enumerate(row):
            cells.add((t, int(bb)))
            if probes >= 1:
                for i in range(n_planes):
                    cells.add((t, int(bb) ^ (1 << i)))
            if probes >= 2:
                for i in range(n_planes):
                    for j in range(i + 1, n_planes):
                        cells.add((t, int(bb) ^ (1 << i) ^ (1 << j)))
        out.append(sorted(cells))
    return out


def _bucket_rows(
    embeddings: DataFrame,
    dim: int,
    n_planes: int,
    n_tables: int,
    seed: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, vec, _norm_e, tbl, bucket) — the index row shape, one row
    per (vector, table), bucketed by the seeded plane family (pure
    function of (vector, params) ⇒ retry-overwrite and append ≡
    rebuild both hold)."""
    buckets = hyperplane_buckets_all(dim, n_planes, n_tables, seed)
    return embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        _norm(F.col(vec_col)).alias("_norm_e"),
        F.posexplode(buckets(F.col(vec_col))).alias("tbl", "bucket"),
    )


def lsh_index_build(
    spark: SparkSession,
    index_dir: str,
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Bucket the corpus once and persist it partitioned by
    (tbl, bucket); params.json written LAST is the commit marker
    (readers require it, so a crashed build is invisible). The
    ``index/`` dir is the growable index's ``init`` batch —
    :func:`lsh_index_append` adds more.

    Retry-safe by construction (ADVICE r12, high): the ``init``
    manifest record commits BEFORE params.json, so a crash in the gap
    leaves a manifest-bearing dir whose callers (they all gate on
    params.json) will re-run the build. The init record therefore
    lives at a FIXED path (``manifest/part-init.jsonl``,
    ``os.replace`` overwrite) — a retried or repeated build rewrites
    the one record instead of appending a second, which would double
    every init row in :func:`lsh_index_batches`. Rebuilding over an
    index that already committed appends/compactions raises (same
    rule as ``ivf_index_init``): overwriting ``index/`` while keeping
    grown batches is an in-place mutation readers could half-see — a
    plane-family rebuild means a NEW index_dir."""
    for r in _raw_manifest_records(index_dir):
        if r["batch_id"] != "init":
            raise ValueError(
                f"LSH index at {index_dir} already has committed "
                "batches — a rebuild writes a NEW index_dir"
            )
    rows = _bucket_rows(
        embeddings, dim, n_planes, n_tables, seed, id_col, vec_col
    )
    rows.repartition("tbl", "bucket").write.mode("overwrite").partitionBy(
        "tbl", "bucket"
    ).parquet(os.path.join(index_dir, "index"))
    n = spark.read.parquet(os.path.join(index_dir, "index")).count()
    params = {
        "dim": dim,
        "n_planes": n_planes,
        "n_tables": n_tables,
        "seed": seed,
    }
    os.makedirs(index_dir, exist_ok=True)
    _commit_manifest_part(
        index_dir,
        {
            "seq": 0,
            "batch_id": "init",
            "dir": os.path.join(index_dir, "index"),
            "n": n,
        },
        fixed_name="part-init.jsonl",
    )
    tmp = os.path.join(index_dir, ".params.tmp")
    with open(tmp, "w") as fh:
        json.dump(params, fh)
    os.replace(tmp, os.path.join(index_dir, "params.json"))
    return params


def lsh_index_params(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "params.json")) as fh:
        return json.load(fh)


def _manifest_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "manifest")


def _commit_manifest_part(
    index_dir: str, record: dict, fixed_name: str | None = None
) -> str:
    """Atomically append one manifest part — the single commit point
    (shared machinery: :func:`~gpssbzd_spark.dataprep.manifest.
    write_part`). ``fixed_name`` pins the part's filename so a retried
    commit of the same logical record OVERWRITES instead of appending
    a duplicate — used by the build's ``init`` record, whose retry
    path (crash before params.json) re-runs the whole build."""
    return manifest.write_part(
        _manifest_dir(index_dir), record, fixed_name=fixed_name
    )


def _raw_manifest_records(index_dir: str) -> list[dict]:
    """Every committed record, compaction supersedence NOT applied —
    the idempotency dedupe must see folded batch_ids too. A
    pre-manifest index (params.json + ``index/`` but no manifest — the
    pre-r12 layout) synthesizes its init record, so old persisted
    indexes stay readable. One record per batch_id via the shared
    dedupe — duplicates (e.g. a legacy uuid-named init part beside the
    fixed-path one after a rebuild) describe the same rows and must
    not double them; the fixed-path ``part-init.jsonl`` record wins
    its id (ADVICE r13: it is the deliberately-rewritten one, so a
    rebuild's fresh ``n`` survives instead of an os.listdir-order
    coin flip)."""
    parts_records = list(
        manifest.read_parts(_manifest_dir(index_dir))
    )
    known = {r["batch_id"] for _, r in parts_records} | {
        bid for _, r in parts_records for bid in (r.get("replaces") or [])
    }
    # synthesize ONLY when no record mentions init at all — once a
    # compaction record lists init in its replaces, resurrecting a
    # synthetic init would double its rows
    if "init" not in known and os.path.exists(
        os.path.join(index_dir, "params.json")
    ):
        parts_records.append(
            (
                "part-init.jsonl",
                {
                    "seq": 0,
                    "batch_id": "init",
                    "dir": os.path.join(index_dir, "index"),
                    "n": None,
                },
            )
        )
    records = manifest.dedupe_records(
        parts_records,
        ident=lambda r: r["batch_id"],
        prefer_parts=("part-init.jsonl",),
    )
    return sorted(records, key=lambda r: (r["seq"], r["batch_id"]))


def lsh_index_batches(index_dir: str) -> list[dict]:
    """Committed batch records, init first then appends in commit
    order (ties broken by batch_id); compaction records supersede the
    batches they folded (shared machinery, chained compactions
    resolved over ALL records)."""
    return sorted(
        manifest.resolve_supersedence(
            _raw_manifest_records(index_dir),
            ident=lambda r: r["batch_id"],
        ),
        key=lambda r: (r["seq"], r["batch_id"]),
    )


def lsh_index_append(
    spark: SparkSession,
    index_dir: str,
    new_embeddings: DataFrame,
    batch_id: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Append ``new_embeddings`` as one committed batch: bucket with
    the FROZEN seeded plane family, write ONLY the new rows under
    ``batches/<batch_id>/`` (O(delta) — existing batches are never
    read), commit one manifest part. ``batch_id`` is the caller's
    ingest key — a crashed retry with the same id overwrites the same
    dir and re-commits idempotently (the manifest dedupes by
    batch_id). No staleness metric: the plane family is
    data-independent, so assignments never go stale (bucket occupancy
    shifts under drift, correctness does not — the one way this is
    simpler than :func:`~gpssbzd_spark.dataprep.ivfindex.
    ivf_index_append`)."""
    params_path = os.path.join(index_dir, "params.json")
    if not os.path.exists(params_path):
        raise ValueError(
            f"LSH index at {index_dir} has no committed build — run "
            "lsh_index_build first"
        )
    if batch_id == "init":
        raise ValueError(
            "lsh_index_append: batch_id 'init' is reserved for the build"
        )
    batches = lsh_index_batches(index_dir)
    # dedupe against RAW records: a batch a later compaction folded
    # must still short-circuit its retry (its rows live on inside the
    # compacted batch — re-appending would duplicate them)
    for b in _raw_manifest_records(index_dir):
        if b["batch_id"] == batch_id:
            return b
    params = lsh_index_params(index_dir)
    rows = _bucket_rows(
        new_embeddings,
        params["dim"],
        params["n_planes"],
        params["n_tables"],
        params["seed"],
        id_col,
        vec_col,
    )
    batch_dir = os.path.join(index_dir, "batches", batch_id)
    rows.repartition("tbl", "bucket").write.mode("overwrite").partitionBy(
        "tbl", "bucket"
    ).parquet(batch_dir)
    n = spark.read.parquet(batch_dir).count()
    record = {
        "seq": batches[-1]["seq"] + 1,
        "batch_id": batch_id,
        "dir": batch_dir,
        "n": n,
    }
    _commit_manifest_part(index_dir, record)
    return record


def lsh_index_read(spark: SparkSession, index_dir: str) -> DataFrame:
    """All committed batches as one (id, vec, _norm_e, tbl, bucket)
    DataFrame. Uncommitted (crashed) batch dirs are invisible."""
    batches = lsh_index_batches(index_dir)
    assert batches, f"LSH index at {index_dir} has no committed batches"
    parts = [
        spark.read.option("basePath", b["dir"]).parquet(b["dir"])
        for b in batches
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def lsh_index_compact(
    spark: SparkSession,
    index_dir: str,
    batch_id: str,
    min_batches: int = 2,
) -> dict | None:
    """Fold ALL committed batches into ONE (tbl, bucket)-partitioned
    batch dir — the LSM-style maintenance step a daily-append index
    needs (after N days every probe unions N per-batch reads;
    compaction restores O(1) dirs per probed cell without changing a
    single row). Content-identical by construction: the compacted
    batch is the union of the folded batches' PERSISTED rows (planes
    never re-run), rewritten partitioned by (tbl, bucket). Same
    crash-safety recipe as :func:`~gpssbzd_spark.dataprep.ivfindex.
    ivf_index_compact`: parquet first under the caller-keyed
    ``batch_id`` (idempotent retry), ONE manifest part carrying
    ``replaces`` as the single commit point; folded dirs become
    unreferenced garbage, lazily deletable. Returns the committed
    record, or None when fewer than ``min_batches`` exist."""
    batches = lsh_index_batches(index_dir)
    if not batches:
        raise ValueError(
            f"LSH index at {index_dir} has no committed batches"
        )
    if batch_id == "init":
        raise ValueError(
            "lsh_index_compact: batch_id 'init' is reserved for the build"
        )
    for b in _raw_manifest_records(index_dir):
        if b["batch_id"] == batch_id:
            return b  # idempotent retry after a committed compaction
    if len(batches) < min_batches:
        return None
    merged = lsh_index_read(spark, index_dir)
    batch_dir = os.path.join(index_dir, "batches", batch_id)
    merged.repartition("tbl", "bucket").write.mode("overwrite").partitionBy(
        "tbl", "bucket"
    ).parquet(batch_dir)
    n = spark.read.parquet(batch_dir).count()
    record = {
        "seq": batches[-1]["seq"] + 1,
        "batch_id": batch_id,
        "dir": batch_dir,
        "n": n,
        "replaces": [b["batch_id"] for b in batches],
    }
    _commit_manifest_part(index_dir, record)
    # post-commit GC (ADVICE r13): folded dirs — the build's index/
    # dir included — are unreferenced once the replaces record lands;
    # readers resolve the manifest first (lsh_index_query's empty path
    # included), so deleting them is safe and halves retained storage
    manifest.delete_dirs(b["dir"] for b in batches)
    return record


def lsh_index_query(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 10,
    probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Probe the persisted index: read ONLY the query batch's probed
    (tbl, bucket) directories, join the literal probe batch, dedup
    candidates per (query, vector), score, top-k — bit-identical to
    :func:`~gpssbzd_spark.dataprep.similarity.lsh_topk` over the same
    corpus, with zero Python in the plan."""
    params = lsh_index_params(index_dir)
    rows = queries.select(query_id_col, query_vec_col).collect()
    if not rows:
        from gpssbzd_spark.dataprep.similarity import empty_topk

        # schema from the first COMMITTED batch (the build's index/
        # dir may be post-compaction garbage — only manifest-resolved
        # dirs are guaranteed to exist)
        root = lsh_index_batches(index_dir)[0]["dir"]
        return empty_topk(
            spark,
            queries.schema[query_id_col].dataType,
            spark.read.option("basePath", root)
            .parquet(root)
            .schema[id_col]
            .dataType,
            query_id_col,
            id_col,
        )
    qv = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    probe_sets = query_buckets(params, qv, probes)
    wanted = sorted({cell for cells in probe_sets for cell in cells})
    # probe EVERY committed batch (init + appends): a cell a batch has
    # no vectors in writes no directory there — skipping it is
    # semantically identical; only existing probed dirs are read
    parts = []
    for b in lsh_index_batches(index_dir):
        dirs = [
            os.path.join(b["dir"], f"tbl={t}", f"bucket={bb}")
            for t, bb in wanted
            if os.path.isdir(os.path.join(b["dir"], f"tbl={t}", f"bucket={bb}"))
        ]
        if dirs:
            parts.append(
                spark.read.option("basePath", b["dir"]).parquet(*dirs)
            )
    assert parts, (
        f"lsh_index_query: none of {len(wanted)} probed (tbl, bucket) "
        f"cells exists in any committed batch under {index_dir} — "
        "empty or mismatched index"
    )
    index = parts[0]
    for p in parts[1:]:
        index = index.unionByName(p)
    probe_rows = [
        (
            r[0],
            [float(x) for x in r[1]],
            [[int(t), int(b)] for t, b in probe_sets[i]],
        )
        for i, r in enumerate(rows)
    ]
    schema = T.StructType(
        [
            T.StructField(query_id_col, queries.schema[query_id_col].dataType),
            T.StructField(query_vec_col, T.ArrayType(T.DoubleType())),
            T.StructField(
                "_cells", T.ArrayType(T.ArrayType(T.IntegerType()))
            ),
        ]
    )
    q_probe = (
        local_rows(spark, probe_rows, schema)
        .select(
            F.col(query_id_col),
            F.col(query_vec_col),
            _norm(F.col(query_vec_col)).alias("_norm_q"),
            F.explode("_cells").alias("_cell"),
        )
        .select(
            query_id_col,
            query_vec_col,
            "_norm_q",
            F.col("_cell")[0].alias("tbl"),
            F.col("_cell")[1].alias("bucket"),
        )
    )
    from gpssbzd_spark.dataprep.similarity import _score_and_topk

    cands = (
        index.join(F.broadcast(q_probe), ["tbl", "bucket"])
        .select(
            query_id_col, id_col, vec_col, query_vec_col, "_norm_e", "_norm_q"
        )
        .dropDuplicates([query_id_col, id_col])
    )
    return _score_and_topk(
        cands, k, id_col, vec_col, query_id_col, query_vec_col
    )
