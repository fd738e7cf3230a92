"""Similarity search over embedding columns (array<float>).

Two paths, both pure DataFrame ops:

- **Brute force** (the correctness baseline): broadcast the query set,
  native dot-product/norm via ``zip_with`` + ``aggregate`` (JVM-side,
  no Python), top-k per query via row_number. Cost O(N·Q) — right when
  Q is small; at 100 TB the scan is embarrassingly parallel and never
  shuffles the big side (queries are broadcast, top-k is a
  partial TakeOrdered).
- **Random-hyperplane LSH** (the scale path): sign-pattern of ``p``
  fixed hyperplanes → bucket id; candidates only join within a bucket,
  turning all-pairs into per-bucket joins. Hyperplanes are
  deterministic (seeded numpy) and evaluated natively as constant
  arrays — no Python at query time. Single-table sign-LSH has low
  recall for moderate-similarity neighbors (collision probability
  ``(1-θ/π)^p`` decays fast), so recall is amplified the standard two
  ways, both tunable:

  - **OR-amplification** (``n_tables`` independent plane sets — the
    same construction as MinHash banding in ``dedup.py``): the index
    side stores ``n_tables`` bucket ids per vector.
  - **Multi-probe** (``probes`` > 0): each query additionally checks
    the buckets at Hamming distance ≤ ``probes`` bit-flips of its own
    bucket — near-miss sign flips are the dominant recall loss, and
    probing them costs query-side fan-out instead of index size.

  Cost model at 100 TB: index = N·n_tables rows (bucket, vec_id),
  query fan-out = Q·n_tables·(1+p·probes) bucket lookups, each a
  shuffle-free broadcast-join probe when Q is small.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity_col(a: Column, b: Column) -> Column:
    """Native cosine similarity of two array<float/double> columns."""
    denom = _norm(a) * _norm(b)
    return F.when(denom > 0, _dot(a, b) / denom).otherwise(F.lit(0.0))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Output: (query_id, vec_id, cos_sim, rank). Self-matches (same id)
    are not excluded — filter upstream if needed.
    """
    joined = embeddings.crossJoin(F.broadcast(queries))
    sim = cosine_similarity_col(F.col(vec_col), F.col(query_vec_col))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col)
    )
    return (
        joined.select(query_id_col, id_col, sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_bucket(
    vec_col: Column, dim: int, n_planes: int = 12, seed: int = 42
) -> Column:
    """LSH bucket id: sign pattern of `n_planes` random hyperplanes,
    evaluated natively against constant literal arrays."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit = (_dot(vec_col, plane) >= 0).cast("long")
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 8,
    probes: int = 1,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: candidates restricted to LSH-bucket matches
    across ``n_tables`` tables, with ``probes``-bit multi-probe on the
    query side. Recall < 1 by construction; the pytest suite measures
    it against :func:`brute_force_topk`.

    Join shape: index side explodes to ``n_tables`` (table, bucket)
    rows per vector; the (small) query side explodes further to its
    probe set and is broadcast, so the big side never shuffles.
    Duplicate candidate pairs from different tables are deduped BEFORE
    scoring so each pair's cosine is computed once.
    """
    emb_b = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        hyperplane_bucket(
                            F.col(vec_col), dim, n_planes, seed + t
                        ).alias("bucket"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("_tb"),
    ).select(id_col, vec_col, "_tb.tbl", "_tb.bucket")

    def probe_set(t: int) -> list[Column]:
        base = hyperplane_bucket(F.col(query_vec_col), dim, n_planes, seed + t)
        out = [base]
        if probes >= 1:
            out += [base.bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)]
        if probes >= 2:
            out += [
                base.bitwiseXOR(F.lit((1 << i) | (1 << j)))
                for i in range(n_planes)
                for j in range(i + 1, n_planes)
            ]
        return [F.struct(F.lit(t).alias("tbl"), b.alias("bucket")) for b in out]

    q_b = queries.select(
        F.col(query_id_col),
        F.col(query_vec_col),
        F.explode(
            F.array(*[s for t in range(n_tables) for s in probe_set(t)])
        ).alias("_tb"),
    ).select(query_id_col, query_vec_col, "_tb.tbl", "_tb.bucket")

    cands = (
        emb_b.join(F.broadcast(q_b), ["tbl", "bucket"])
        .select(query_id_col, id_col, vec_col, query_vec_col)
        .dropDuplicates([query_id_col, id_col])
    )
    sim = cosine_similarity_col(F.col(vec_col), F.col(query_vec_col))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col)
    )
    return (
        cands.select(query_id_col, id_col, sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
