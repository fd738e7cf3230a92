"""Persisted hyperplane-LSH index (dataprep/lshindex.py): bit parity
with the in-plan lsh_topk, probed-directory-only scans, missing-bucket
skips, and driver/executor bucket-kernel agreement."""

from __future__ import annotations

import os
import shutil

import numpy as np
from pyspark.sql import functions as F

from gpssbzd_spark.dataprep.lshindex import (
    lsh_index_build,
    lsh_index_params,
    lsh_index_query,
    query_buckets,
)
from gpssbzd_spark.dataprep.similarity import hyperplane_buckets_all, lsh_topk
from gpssbzd_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _setup(spark, tmp_path, n_planes=8, n_tables=8):
    em = load_table(spark, SF, "embeddings")
    index_dir = str(tmp_path / "lsh")
    lsh_index_build(
        spark, index_dir, em, dim=64, n_planes=n_planes, n_tables=n_tables
    )
    q = em.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return em, index_dir, q


def test_persisted_query_matches_in_plan_lsh_topk(spark, tmp_path):
    """The persisted probe must return byte-identical (query, vec,
    cos, rank) rows to lsh_topk over the same corpus — the driver-side
    bucket consult, directory pruning, and literal-probe scoring must
    not perturb anything."""
    em, index_dir, q = _setup(spark, tmp_path)
    got = sorted(
        map(tuple, lsh_index_query(spark, index_dir, q, k=5, probes=1).collect())
    )
    ref = sorted(
        map(
            tuple,
            lsh_topk(em, q, dim=64, k=5, n_planes=8, n_tables=8, probes=1).collect(),
        )
    )
    assert got == ref and len(got) > 0


def test_driver_bucket_kernel_matches_executor_udf(spark, tmp_path):
    """query_buckets' base buckets must equal hyperplane_buckets_all's
    per-table values for the same vectors (same planes, sign, order)."""
    em = load_table(spark, SF, "embeddings")
    sample = em.filter(F.col("vec_id") < 25)
    udf = hyperplane_buckets_all(64, 8, 8, seed=42)
    ref = {
        r.vec_id: list(r.b)
        for r in sample.select("vec_id", udf("embedding").alias("b")).collect()
    }
    rows = sample.select("vec_id", "embedding").collect()
    qv = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    params = {"dim": 64, "n_planes": 8, "n_tables": 8, "seed": 42}
    probe = query_buckets(params, qv, probes=0)
    for i, r in enumerate(rows):
        base = {t: b for t, b in probe[i]}
        assert [base[t] for t in range(8)] == ref[r.vec_id]


def test_persisted_query_scans_only_probed_cells(spark, tmp_path):
    em, index_dir, q = _setup(spark, tmp_path)
    q3 = q.filter(F.col("query_id") < 3)
    rows = q3.collect()
    qv = np.stack([np.asarray(r.query_vec, dtype=np.float64) for r in rows])
    probed = {
        cell
        for cells in query_buckets(lsh_index_params(index_dir), qv, 1)
        for cell in cells
    }
    out = lsh_index_query(spark, index_dir, q3, k=5, probes=1)
    index_files = [f for f in out.inputFiles() if "tbl=" in f]
    assert index_files
    for f in index_files:
        t = int(f.split("tbl=")[1].split("/")[0])
        b = int(f.split("bucket=")[1].split("/")[0])
        assert (t, b) in probed, f"scanned unprobed cell: {f}"
    # non-vacuous: unprobed cells exist on disk
    root = os.path.join(index_dir, "index")
    on_disk = {
        (int(td.split("=")[1]), int(bd.split("=")[1]))
        for td in os.listdir(root)
        if td.startswith("tbl=")
        for bd in os.listdir(os.path.join(root, td))
        if bd.startswith("bucket=")
    }
    assert on_disk - probed


def test_missing_probed_bucket_is_skipped(spark, tmp_path):
    """A probed bucket no corpus vector hashed into has no directory —
    the reader must skip it (it contributes no candidates), and
    deleting a populated probed cell must not crash the query (its
    candidates just vanish from that table's view)."""
    em, index_dir, q = _setup(spark, tmp_path)
    q1 = q.filter(F.col("query_id") == 0)
    rows = q1.collect()
    qv = np.stack([np.asarray(r.query_vec, dtype=np.float64) for r in rows])
    probed = query_buckets(lsh_index_params(index_dir), qv, 1)[0]
    root = os.path.join(index_dir, "index")
    existing = [
        (t, b)
        for t, b in probed
        if os.path.isdir(os.path.join(root, f"tbl={t}", f"bucket={b}"))
    ]
    assert len(existing) < len(probed), (
        "every probed cell exists — the skip path is vacuous here"
    )
    before = lsh_index_query(spark, index_dir, q1, k=5, probes=1).collect()
    assert before
    t, b = existing[0]
    shutil.rmtree(os.path.join(root, f"tbl={t}", f"bucket={b}"))
    after = lsh_index_query(spark, index_dir, q1, k=5, probes=1).collect()
    assert all(1 <= r.rank <= 5 for r in after)


def test_query_against_missing_index_fails_loudly(spark, tmp_path):
    em = load_table(spark, SF, "embeddings")
    q = em.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    import pytest

    with pytest.raises(FileNotFoundError):
        lsh_index_query(spark, str(tmp_path / "nope"), q, k=5)


def test_empty_query_batch_returns_empty_topk(spark, tmp_path):
    """r11 review: an empty serving batch must return an empty frame
    with the standard top-k schema on ALL THREE persisted paths —
    parity with the in-plan twins' len==0 pandas branches, not an
    np.stack crash."""
    import json

    import numpy as _np

    from gpssbzd_spark.dataprep.ivfindex import (
        ivf_index_init,
        ivf_index_query,
    )
    from gpssbzd_spark.dataprep.similarity import ivf_query_pruned

    em = load_table(spark, SF, "embeddings")
    none = em.filter("vec_id < 0").select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    # LSH persisted
    lsh_dir = str(tmp_path / "lsh")
    lsh_index_build(spark, lsh_dir, em, dim=64, n_planes=6, n_tables=2)
    out = lsh_index_query(spark, lsh_dir, none, k=5)
    assert out.columns == ["query_id", "vec_id", "cos_sim", "rank"]
    assert out.count() == 0
    # growable IVF
    ivf_dir = str(tmp_path / "ivf")
    ivf_index_init(spark, ivf_dir, em, dim=64, n_centroids=4, iters=1)
    out = ivf_index_query(spark, ivf_dir, none, k=5)
    assert out.columns == ["query_id", "vec_id", "cos_sim", "rank"]
    assert out.count() == 0
    # monolithic pruned IVF
    from gpssbzd_spark.dataprep.similarity import build_ivf_index

    index, cents = build_ivf_index(em, dim=64, n_centroids=4, iters=1)
    mono = str(tmp_path / "mono")
    index.write.partitionBy("cid").parquet(mono)
    out = ivf_query_pruned(mono, cents, none, k=5)
    assert out.columns == ["query_id", "vec_id", "cos_sim", "rank"]
    assert out.count() == 0
