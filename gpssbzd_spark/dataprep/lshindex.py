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
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
    (readers require it, so a crashed build is invisible)."""
    buckets = hyperplane_buckets_all(dim, n_planes, n_tables, seed)
    rows = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        _norm(F.col(vec_col)).alias("_norm_e"),
        F.posexplode(buckets(F.col(vec_col))).alias("tbl", "bucket"),
    )
    rows.repartition("tbl", "bucket").write.mode("overwrite").partitionBy(
        "tbl", "bucket"
    ).parquet(os.path.join(index_dir, "index"))
    params = {
        "dim": dim,
        "n_planes": n_planes,
        "n_tables": n_tables,
        "seed": seed,
    }
    os.makedirs(index_dir, exist_ok=True)
    tmp = os.path.join(index_dir, ".params.tmp")
    with open(tmp, "w") as fh:
        json.dump(params, fh)
    os.replace(tmp, os.path.join(index_dir, "params.json"))
    return params


def lsh_index_params(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "params.json")) as fh:
        return json.load(fh)


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
    root = os.path.join(index_dir, "index")
    if not rows:
        from gpssbzd_spark.dataprep.similarity import empty_topk

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
    dirs = [
        os.path.join(root, f"tbl={t}", f"bucket={b}")
        for t, b in wanted
        if os.path.isdir(os.path.join(root, f"tbl={t}", f"bucket={b}"))
    ]
    assert dirs, (
        f"lsh_index_query: none of {len(wanted)} probed (tbl, bucket) "
        f"cells exists under {root} — empty or mismatched index"
    )
    index = spark.read.option("basePath", root).parquet(*dirs)
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
        spark.createDataFrame(probe_rows, schema)
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
