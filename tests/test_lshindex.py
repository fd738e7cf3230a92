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


# ---------------------------------------------------------------------------
# Growable index maintenance (VERDICT r11 #4 — the ivfindex recipe)
# ---------------------------------------------------------------------------


def _setup_split(spark, tmp_path):
    em = load_table(spark, SF, "embeddings")
    a = em.filter(F.col("vec_id") % 3 != 0)
    b = em.filter(F.col("vec_id") % 3 == 0)
    index_dir = str(tmp_path / "lsh")
    lsh_index_build(spark, index_dir, a, dim=64, n_planes=8, n_tables=4)
    return em, a, b, index_dir


def test_lsh_append_equals_rebuild_with_frozen_planes(spark, tmp_path):
    """build(A) + append(B) must hold exactly the (vec, tbl, bucket)
    rows build-from-scratch(A ∪ B) would hold — bucketing is a pure
    function of (vector, seeded planes), so the grown index is
    indistinguishable from a rebuild."""
    from gpssbzd_spark.dataprep.lshindex import (
        lsh_index_append,
        lsh_index_read,
    )

    em, a, b, index_dir = _setup_split(spark, tmp_path)
    lsh_index_append(spark, index_dir, b, "b1")
    grown = {
        (r.vec_id, r.tbl, r.bucket)
        for r in lsh_index_read(spark, index_dir)
        .select("vec_id", "tbl", "bucket")
        .collect()
    }
    rebuild_dir = str(tmp_path / "rebuild")
    lsh_index_build(spark, rebuild_dir, em, dim=64, n_planes=8, n_tables=4)
    rebuilt = {
        (r.vec_id, r.tbl, r.bucket)
        for r in lsh_index_read(spark, rebuild_dir)
        .select("vec_id", "tbl", "bucket")
        .collect()
    }
    assert grown == rebuilt and len(grown) == em.count() * 4


def test_lsh_append_idempotent_and_orphan_invisible(spark, tmp_path):
    """Same crash/retry contract as ivfindex: a re-append with the
    same batch_id returns the committed record without duplicating
    rows, and a batch dir written WITHOUT its manifest part (crash
    before commit) is invisible to readers until the retry commits."""
    import os as _os

    from gpssbzd_spark.dataprep.lshindex import (
        _bucket_rows,
        lsh_index_append,
        lsh_index_batches,
        lsh_index_read,
    )

    em, a, b, index_dir = _setup_split(spark, tmp_path)
    n_init = lsh_index_read(spark, index_dir).count()
    # orphan: the parquet lands but no manifest part commits it
    orphan_dir = _os.path.join(index_dir, "batches", "orphan")
    _bucket_rows(b, 64, 8, 4, 42, "vec_id", "embedding").write.mode(
        "overwrite"
    ).partitionBy("tbl", "bucket").parquet(orphan_dir)
    assert lsh_index_read(spark, index_dir).count() == n_init
    # the retry with the same id overwrites and commits normally
    r1 = lsh_index_append(spark, index_dir, b, "orphan")
    n_grown = lsh_index_read(spark, index_dir).count()
    assert n_grown == em.count() * 4
    r2 = lsh_index_append(spark, index_dir, b, "orphan")
    assert r2["batch_id"] == r1["batch_id"] and r2["n"] == r1["n"]
    assert lsh_index_read(spark, index_dir).count() == n_grown
    assert [x["batch_id"] for x in lsh_index_batches(index_dir)] == [
        "init",
        "orphan",
    ]


def test_lsh_append_requires_build_and_reserves_init(spark, tmp_path):
    import pytest as _pytest

    from gpssbzd_spark.dataprep.lshindex import lsh_index_append

    em = load_table(spark, SF, "embeddings")
    with _pytest.raises(ValueError, match="no committed build"):
        lsh_index_append(spark, str(tmp_path / "nope"), em, "b1")
    _, _, b, index_dir = _setup_split(spark, tmp_path)
    with _pytest.raises(ValueError, match="reserved"):
        lsh_index_append(spark, index_dir, b, "init")


def test_lsh_grown_query_matches_in_plan_over_grown_corpus(spark, tmp_path):
    """Serving over build(A) + append(B) must be bit-identical to the
    in-plan lsh_topk over A ∪ B — the multi-batch probed read is
    invisible to results."""
    from gpssbzd_spark.dataprep.lshindex import lsh_index_append

    em, a, b, index_dir = _setup_split(spark, tmp_path)
    lsh_index_append(spark, index_dir, b, "b1")
    q = em.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = sorted(
        map(
            tuple,
            lsh_index_query(spark, index_dir, q, k=5, probes=1).collect(),
        )
    )
    ref = sorted(
        map(
            tuple,
            lsh_topk(
                em, q, dim=64, k=5, n_planes=8, n_tables=4, probes=1
            ).collect(),
        )
    )
    assert got == ref and len(got) > 0


def test_lsh_pre_manifest_index_stays_readable(spark, tmp_path):
    """Back-compat: a pre-r12 index (params.json + index/, no
    manifest) synthesizes its init batch record, so old persisted
    indexes serve unchanged — and can even be grown."""
    import shutil as _shutil

    from gpssbzd_spark.dataprep.lshindex import (
        lsh_index_append,
        lsh_index_batches,
        lsh_index_read,
    )

    em, a, b, index_dir = _setup_split(spark, tmp_path)
    _shutil.rmtree(os.path.join(index_dir, "manifest"))
    batches = lsh_index_batches(index_dir)
    assert [x["batch_id"] for x in batches] == ["init"]
    assert lsh_index_read(spark, index_dir).count() == a.count() * 4
    lsh_index_append(spark, index_dir, b, "b1")
    assert lsh_index_read(spark, index_dir).count() == em.count() * 4


def test_lsh_compaction_folds_batches_content_identical(spark, tmp_path):
    """lsh_index_compact (r12): build + append fold into one batch,
    content-identical, serving unchanged (bit-parity with in-plan
    lsh_topk over the grown corpus), synthesized-init resurrection
    guarded for pre-manifest indexes, folded ids idempotent."""
    import shutil as _shutil

    from gpssbzd_spark.dataprep.lshindex import (
        lsh_index_append,
        lsh_index_batches,
        lsh_index_compact,
        lsh_index_read,
    )

    em, a, b, index_dir = _setup_split(spark, tmp_path)
    # exercise the pre-manifest synthesis path through compaction too
    _shutil.rmtree(os.path.join(index_dir, "manifest"))
    lsh_index_append(spark, index_dir, b, "d1")
    before = {
        (r.vec_id, r.tbl, r.bucket)
        for r in lsh_index_read(spark, index_dir)
        .select("vec_id", "tbl", "bucket")
        .collect()
    }
    rec = lsh_index_compact(spark, index_dir, "c1")
    assert sorted(rec["replaces"]) == ["d1", "init"]
    assert [x["batch_id"] for x in lsh_index_batches(index_dir)] == ["c1"]
    after = {
        (r.vec_id, r.tbl, r.bucket)
        for r in lsh_index_read(spark, index_dir)
        .select("vec_id", "tbl", "bucket")
        .collect()
    }
    assert after == before, "compaction changed index content"
    # serving parity over the compacted index
    q = em.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = sorted(
        map(tuple, lsh_index_query(spark, index_dir, q, k=5, probes=1).collect())
    )
    ref = sorted(
        map(
            tuple,
            lsh_topk(em, q, dim=64, k=5, n_planes=8, n_tables=4, probes=1).collect(),
        )
    )
    assert got == ref and len(got) > 0
    # folded-id retry no-ops; compaction retry no-ops
    assert lsh_index_append(spark, index_dir, b, "d1")["batch_id"] == "d1"
    assert lsh_index_compact(spark, index_dir, "c1")["batch_id"] == "c1"
    assert lsh_index_read(spark, index_dir).count() == len(before)


def test_lsh_build_retry_does_not_double_init_rows(spark, tmp_path):
    """ADVICE r12 (high): the init manifest part commits BEFORE
    params.json, so a crash in the gap makes every caller (they gate
    on params.json) re-run the whole build. The retry must OVERWRITE
    the single fixed-path init record, not append a second one that
    doubles every read/query's init rows — and a full rebuild over a
    committed plain build (valid pre-r12) must stay single-init too."""
    from gpssbzd_spark.dataprep.lshindex import (
        lsh_index_batches,
        lsh_index_read,
    )

    em, a, b, index_dir = _setup_split(spark, tmp_path)
    base = lsh_index_read(spark, index_dir).count()
    assert base == a.count() * 4

    # crash window: init manifest committed, params.json never landed
    os.remove(os.path.join(index_dir, "params.json"))
    lsh_index_build(spark, index_dir, a, dim=64, n_planes=8, n_tables=4)
    assert [x["batch_id"] for x in lsh_index_batches(index_dir)] == ["init"]
    assert lsh_index_read(spark, index_dir).count() == base

    # full rebuild over the committed build (no appends): still one init
    lsh_index_build(spark, index_dir, a, dim=64, n_planes=8, n_tables=4)
    assert [x["batch_id"] for x in lsh_index_batches(index_dir)] == ["init"]
    assert lsh_index_read(spark, index_dir).count() == base


def test_lsh_rebuild_over_grown_index_raises(spark, tmp_path):
    """Once appends/compactions are committed, an in-place rebuild
    would overwrite index/ while readers still union the grown
    batches — same rule as ivf_index_init: rebuild means a NEW dir."""
    import pytest as _pytest

    from gpssbzd_spark.dataprep.lshindex import lsh_index_append

    em, a, b, index_dir = _setup_split(spark, tmp_path)
    lsh_index_append(spark, index_dir, b, "b1")
    with _pytest.raises(ValueError, match="NEW index_dir"):
        lsh_index_build(spark, index_dir, a, dim=64, n_planes=8, n_tables=4)


def test_lsh_legacy_uuid_init_part_is_deduped(spark, tmp_path):
    """A pre-fix index carries a uuid-named init part; a rebuild adds
    the fixed-path one. Readers must count init ONCE (dedupe by
    batch_id — both records describe the same rewritten dir)."""
    import json as _json
    import uuid as _uuid

    from gpssbzd_spark.dataprep.lshindex import (
        lsh_index_batches,
        lsh_index_read,
    )

    em, a, b, index_dir = _setup_split(spark, tmp_path)
    base = lsh_index_read(spark, index_dir).count()
    # simulate the legacy layout: copy the init record to a uuid part
    mdir = os.path.join(index_dir, "manifest")
    with open(os.path.join(mdir, "part-init.jsonl")) as fh:
        rec = fh.read()
    with open(
        os.path.join(mdir, f"part-{_uuid.uuid4().hex}.jsonl"), "w"
    ) as fh:
        fh.write(rec)
    assert [x["batch_id"] for x in lsh_index_batches(index_dir)] == ["init"]
    assert lsh_index_read(spark, index_dir).count() == base


def test_relational_bucket_derivation_matches_kernel(spark):
    """hyperplane_buckets_relational (r13 — the codegen-safe verify
    path) must reproduce the Arrow kernel's (id, tbl, bucket) rows
    exactly over the fixture corpus: same seeded family, same sign
    rule; dot summation order differs only within float rounding of
    zero, which real embeddings never sit on."""
    from gpssbzd_spark.dataprep.similarity import (
        hyperplane_buckets_all,
        hyperplane_buckets_relational,
    )

    em = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    got = {
        (r.vec_id, r.tbl, r.bucket)
        for r in hyperplane_buckets_relational(
            em, dim=64, n_planes=6, n_tables=4, seed=42
        ).collect()
    }
    kernel = hyperplane_buckets_all(64, 6, 4, 42)
    want = {
        (r.vec_id, r.tbl, r.bucket)
        for r in em.select(
            "vec_id",
            F.posexplode(kernel(F.col("embedding"))).alias("tbl", "bucket"),
        ).collect()
    }
    assert got == want and len(got) == em.count() * 4
