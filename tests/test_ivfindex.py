"""IVF index maintenance (dataprep/ivfindex.py): append ≡ rebuild,
crash/retry idempotency, codebook-staleness drift semantics, and the
pruned multi-batch query path. Mirrors tests/test_sigindex.py for the
similarity-search half of the ingest loop (VERDICT r10 #7)."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from gpssbzd_spark.dataprep.ivfindex import (
    ivf_index_append,
    ivf_index_batches,
    ivf_index_codebook,
    ivf_index_init,
    ivf_index_query,
    ivf_index_read,
)
from gpssbzd_spark.dataprep.similarity import (
    brute_force_topk,
    build_ivf_index,
    ivf_query,
)
from gpssbzd_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _em(spark):
    return load_table(spark, SF, "embeddings")


def _init(spark, tmp_path, frac_pred):
    index_dir = str(tmp_path / "ivf")
    cents = ivf_index_init(
        spark, index_dir, _em(spark).filter(frac_pred), dim=64,
        n_centroids=8, iters=2,
    )
    return index_dir, cents


def test_append_equals_rebuild_with_frozen_codebook(spark, tmp_path):
    """The core maintenance invariant: init(A) + append(B) must hold
    exactly the rows build-from-scratch(A ∪ B) would hold under the
    SAME codebook — assignment is a pure function of (vector,
    codebook), so the grown index is indistinguishable from a rebuild
    that skips the k-means step."""
    em = _em(spark)
    a = em.filter(F.col("vec_id") % 3 != 0)
    b = em.filter(F.col("vec_id") % 3 == 0)
    index_dir, cents = _init(spark, tmp_path, F.col("vec_id") % 3 != 0)
    ivf_index_append(spark, index_dir, b, "b1")
    grown = {
        (r.vec_id, r.cid)
        for r in ivf_index_read(spark, index_dir).select("vec_id", "cid").collect()
    }
    from gpssbzd_spark.dataprep.ivfindex import _assign

    rebuilt = {
        (r.vec_id, r.cid)
        for r in _assign(em, cents, "vec_id", "embedding")
        .select("vec_id", "cid")
        .collect()
    }
    assert grown == rebuilt


def test_append_is_idempotent_by_batch_id(spark, tmp_path):
    """A crashed retry re-appends with the same batch_id: the second
    call must return the committed record without duplicating rows."""
    em = _em(spark)
    b = em.filter(F.col("vec_id") % 3 == 0)
    index_dir, _ = _init(spark, tmp_path, F.col("vec_id") % 3 != 0)
    r1 = ivf_index_append(spark, index_dir, b, "b1")
    n_after_first = ivf_index_read(spark, index_dir).count()
    r2 = ivf_index_append(spark, index_dir, b, "b1")
    assert r2["batch_id"] == r1["batch_id"] and r2["n"] == r1["n"]
    assert ivf_index_read(spark, index_dir).count() == n_after_first
    assert len(ivf_index_batches(index_dir)) == 2  # init + one append


def test_uncommitted_batch_dir_is_invisible(spark, tmp_path):
    """Crash BEFORE the manifest commit: the batch parquet exists but
    readers must not see it (the manifest is the source of truth)."""
    em = _em(spark)
    index_dir, cents = _init(spark, tmp_path, F.col("vec_id") % 3 != 0)
    n_committed = ivf_index_read(spark, index_dir).count()
    # simulate the crash: write the batch dir directly, skip the commit
    from gpssbzd_spark.dataprep.ivfindex import _assign, _write_batch

    _write_batch(
        _assign(
            em.filter(F.col("vec_id") % 3 == 0), cents, "vec_id", "embedding"
        ),
        index_dir,
        "orphan",
    )
    assert ivf_index_read(spark, index_dir).count() == n_committed
    # the retry with the same id overwrites and commits normally
    ivf_index_append(
        spark, index_dir, em.filter(F.col("vec_id") % 3 == 0), "orphan"
    )
    assert ivf_index_read(spark, index_dir).count() == em.count()


def test_init_refuses_reinit(spark, tmp_path):
    index_dir, _ = _init(spark, tmp_path, F.col("vec_id") % 3 != 0)
    with pytest.raises(ValueError, match="already initialized"):
        ivf_index_init(spark, index_dir, _em(spark), dim=64, n_centroids=8)


def test_append_requires_init(spark, tmp_path):
    with pytest.raises(ValueError, match="no init batch"):
        ivf_index_append(spark, str(tmp_path / "nope"), _em(spark), "b1")


def test_drift_fraction_flags_distribution_shift(spark, tmp_path):
    """Codebook-staleness semantics: drift_fraction is the total-
    variation distance between the batch's and the build's per-cell
    assignment shares — an append drawn from the SAME distribution
    stays at sampling noise; a CONCENTRATED shifted batch (every
    vector identical → one cell) pushes it toward 1 − max_share and
    flags stale."""
    em = _em(spark)
    index_dir, _ = _init(spark, tmp_path, F.col("vec_id") % 3 != 0)
    same = ivf_index_append(
        spark, index_dir, em.filter(F.col("vec_id") % 3 == 0), "same-dist"
    )
    assert 0.0 <= same["drift_fraction"] <= 0.35, same
    assert not same["stale"]
    # shifted batch: one repeated vector — all of it lands in a single
    # cell, the occupancy shape the codebook never saw
    one = em.filter(F.col("vec_id") == 0).select("embedding")
    shifted = (
        em.filter(F.col("vec_id") % 3 == 0)
        .select((F.col("vec_id") + 100000).alias("vec_id"))
        .crossJoin(F.broadcast(one))
    )
    rec = ivf_index_append(spark, index_dir, shifted, "shifted")
    assert rec["drift_fraction"] >= 0.5, rec
    assert rec["stale"]


def test_grown_index_query_matches_monolithic_and_keeps_recall(
    spark, tmp_path
):
    """ivf_index_query (pruned, multi-batch) must return the same
    neighbors as ivf_query over the full read of the same grown index,
    and keep brute-force recall like the monolithic IVF does."""
    em = _em(spark)
    index_dir, cents = _init(spark, tmp_path, F.col("vec_id") % 3 != 0)
    ivf_index_append(
        spark, index_dir, em.filter(F.col("vec_id") % 3 == 0), "b1"
    )
    q = em.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    pruned = sorted(
        map(
            tuple,
            ivf_index_query(spark, index_dir, q, k=5, n_probe=3).collect(),
        )
    )
    full = sorted(
        map(
            tuple,
            ivf_query(
                ivf_index_read(spark, index_dir), cents, q, k=5, n_probe=3
            ).collect(),
        )
    )
    assert pruned == full
    truth = {
        (r.query_id, r.vec_id) for r in brute_force_topk(em, q, k=5).collect()
    }
    got = {(r[0], r[1]) for r in pruned}
    assert len(truth & got) / len(truth) >= 0.5
    # probed-only scan: every index file read carries a probed cid
    probed_q = ivf_index_query(spark, index_dir, q, k=5, n_probe=3)
    qv = np.stack(
        [np.asarray(r.query_vec, dtype=np.float64) for r in q.collect()]
    )
    from gpssbzd_spark.dataprep.similarity import probe_centroid_ids

    want = {int(c) for row in probe_centroid_ids(cents, qv, 3) for c in row}
    for f in probed_q.inputFiles():
        if "cid=" in f:
            assert int(f.split("cid=")[1].split("/")[0]) in want, f


def test_batches_ordering_and_manifest_fields(spark, tmp_path):
    em = _em(spark)
    index_dir, _ = _init(spark, tmp_path, F.col("vec_id") % 3 != 0)
    ivf_index_append(spark, index_dir, em.filter(F.col("vec_id") % 3 == 0), "b1")
    batches = ivf_index_batches(index_dir)
    assert [b["batch_id"] for b in batches] == ["init", "b1"]
    assert "shares" in batches[0] and batches[0]["n"] > 0
    assert abs(sum(batches[0]["shares"].values()) - 1.0) < 1e-9
    assert "drift_fraction" in batches[1]
    assert os.path.isdir(batches[1]["dir"])


def test_compaction_folds_batches_content_identical(spark, tmp_path):
    """ivf_index_compact (r12): init + 2 appends fold into ONE batch
    whose row content is identical to the pre-compaction read; later
    appends keep working (seq continues, staleness reference carried
    forward), folded batch_ids stay idempotent, and an orphan compacted
    dir (crash before the manifest part) is invisible."""
    em = _em(spark)
    index_dir, cents = _init(spark, tmp_path, F.col("vec_id") % 3 == 1)
    ivf_index_append(spark, index_dir, em.filter(F.col("vec_id") % 3 == 2), "d1")
    ivf_index_append(spark, index_dir, em.filter(F.col("vec_id") % 3 == 0), "d2")
    before = {
        (r.vec_id, r.cid)
        for r in ivf_index_read(spark, index_dir).select("vec_id", "cid").collect()
    }
    from gpssbzd_spark.dataprep.ivfindex import ivf_index_compact

    rec = ivf_index_compact(spark, index_dir, "c1")
    assert sorted(rec["replaces"]) == ["d1", "d2", "init"]
    assert "shares" in rec, "staleness reference lost in compaction"
    batches = ivf_index_batches(index_dir)
    assert [b["batch_id"] for b in batches] == ["c1"]
    after = {
        (r.vec_id, r.cid)
        for r in ivf_index_read(spark, index_dir).select("vec_id", "cid").collect()
    }
    assert after == before
    # retry of the compaction AND of a folded day both no-op
    assert ivf_index_compact(spark, index_dir, "c1")["batch_id"] == "c1"
    r = ivf_index_append(spark, index_dir, em.filter(F.col("vec_id") % 3 == 2), "d1")
    assert r["batch_id"] == "d1"
    assert ivf_index_read(spark, index_dir).count() == len(before)
    # a later append still works against the compacted index
    delta = em.filter(F.col("vec_id") % 3 == 0).select(
        (F.col("vec_id") + 500000).alias("vec_id"), "embedding"
    )
    ivf_index_append(spark, index_dir, delta, "d3")
    assert ivf_index_read(spark, index_dir).count() == len(before) + delta.count()
    # min_batches guard: a single-batch index has nothing to fold...
    solo_dir = str(tmp_path / "solo")
    ivf_index_init(spark, solo_dir, em, dim=64, n_centroids=8, iters=1)
    from gpssbzd_spark.dataprep.ivfindex import ivf_index_compact as c

    assert c(spark, solo_dir, "c1") is None


# ---------------------------------------------------------------------------
# Ingest-loop kill-points around ANN maintenance (r13, VERDICT r12 #5)
# ---------------------------------------------------------------------------


def test_killpoint_between_ivf_and_lsh_append_converges(spark, tmp_path):
    """The day body grows IVF then LSH from one accepted delta
    (corpus/dataprep.py dp_pipeline_ingest_e2e step 4b), with the
    pickup commit LAST. Kill between the two append commits, then
    replay the whole day body (what a retry before the pickup commit
    does): the IVF append must short-circuit on its committed
    batch_id, the LSH append must complete, and BOTH indexes must
    equal their build-from-scratch twins — no interleaving can
    duplicate or drop a day's vectors."""
    from gpssbzd_spark.dataprep.lshindex import (
        lsh_index_append,
        lsh_index_build,
        lsh_index_read,
    )

    em = _em(spark)
    day1 = em.filter(F.col("vec_id") % 3 != 0)
    day2 = em.filter(F.col("vec_id") % 3 == 0)
    ivf_dir = str(tmp_path / "ivf")
    lsh_dir = str(tmp_path / "lsh")
    cents = ivf_index_init(
        spark, ivf_dir, day1, dim=64, n_centroids=8, iters=2
    )
    lsh_index_build(spark, lsh_dir, day1, dim=64, n_planes=6, n_tables=4)

    # day2 body, killed between the two ANN commits:
    ivf_rec = ivf_index_append(spark, ivf_dir, day2, "day2")
    assert ivf_rec["batch_id"] == "day2"
    # --- kill: lsh_index_append never runs, pickup commit never lands

    # retry replays the WHOLE day body against identical state
    r = ivf_index_append(spark, ivf_dir, day2, "day2")
    assert r["batch_id"] == "day2", "retry must dedupe, not re-append"
    lsh_index_append(spark, lsh_dir, day2, "day2")

    from gpssbzd_spark.dataprep.ivfindex import _assign

    grown_ivf = {
        (r.vec_id, r.cid)
        for r in ivf_index_read(spark, ivf_dir)
        .select("vec_id", "cid")
        .collect()
    }
    rebuilt_ivf = {
        (r.vec_id, r.cid)
        for r in _assign(em, cents, "vec_id", "embedding")
        .select("vec_id", "cid")
        .collect()
    }
    assert grown_ivf == rebuilt_ivf
    assert (
        lsh_index_read(spark, lsh_dir).count() == em.count() * 4
    ), "LSH rows after the replayed day must be exactly (corpus × tables)"
    ids = (
        lsh_index_read(spark, lsh_dir)
        .groupBy("vec_id", "tbl")
        .count()
        .filter(F.col("count") > 1)
    )
    assert ids.count() == 0, "duplicate LSH rows entered the index"


def test_killpoint_mid_compaction_stale_replaces_converges(
    spark, tmp_path, monkeypatch
):
    """Kill between the compacted parquet write and its manifest
    commit, let ANOTHER day land, then retry the compaction with the
    SAME maintenance key: the retry must fold the GROWN committed set
    (overwriting the stale orphan dir), its committed ``replaces``
    must cover every folded batch, and a late retry of a folded day
    must still no-op — the r11-review crash-window class, proven for
    both ANN indexes."""
    import gpssbzd_spark.dataprep.ivfindex as ivfmod
    import gpssbzd_spark.dataprep.lshindex as lshmod

    em = _em(spark)
    a = em.filter(F.col("vec_id") % 3 == 1)
    b = em.filter(F.col("vec_id") % 3 == 2)
    c = em.filter(F.col("vec_id") % 3 == 0)

    # --- IVF ---
    ivf_dir = str(tmp_path / "ivf")
    ivf_index_init(spark, ivf_dir, a, dim=64, n_centroids=8, iters=2)
    ivf_index_append(spark, ivf_dir, b, "d1")
    before = ivf_index_read(spark, ivf_dir).count()

    real_commit = ivfmod._commit_manifest_part

    def crash(*args, **kwargs):
        raise RuntimeError("injected crash before compaction commit")

    monkeypatch.setattr(ivfmod, "_commit_manifest_part", crash)
    with pytest.raises(RuntimeError):
        ivfmod.ivf_index_compact(spark, ivf_dir, "c1")
    monkeypatch.setattr(ivfmod, "_commit_manifest_part", real_commit)
    # stale orphan: compact dir exists, no record — readers unchanged
    assert [x["batch_id"] for x in ivf_index_batches(ivf_dir)] == [
        "init",
        "d1",
    ]
    assert ivf_index_read(spark, ivf_dir).count() == before

    # another day lands before the retry
    ivf_index_append(spark, ivf_dir, c, "d2")
    rec = ivfmod.ivf_index_compact(spark, ivf_dir, "c1")
    assert sorted(rec["replaces"]) == ["d1", "d2", "init"]
    assert [x["batch_id"] for x in ivf_index_batches(ivf_dir)] == ["c1"]
    assert ivf_index_read(spark, ivf_dir).count() == em.count()
    # late retry of a folded day still no-ops
    r = ivf_index_append(spark, ivf_dir, b, "d1")
    assert r["batch_id"] == "d1"
    assert ivf_index_read(spark, ivf_dir).count() == em.count()

    # --- LSH (same interleaving) ---
    from gpssbzd_spark.dataprep.lshindex import (
        lsh_index_append,
        lsh_index_batches,
        lsh_index_build,
        lsh_index_read,
    )

    lsh_dir = str(tmp_path / "lsh")
    lsh_index_build(spark, lsh_dir, a, dim=64, n_planes=6, n_tables=4)
    lsh_index_append(spark, lsh_dir, b, "d1")
    real_lsh_commit = lshmod._commit_manifest_part
    monkeypatch.setattr(lshmod, "_commit_manifest_part", crash)
    with pytest.raises(RuntimeError):
        lshmod.lsh_index_compact(spark, lsh_dir, "c1")
    monkeypatch.setattr(lshmod, "_commit_manifest_part", real_lsh_commit)
    assert [x["batch_id"] for x in lsh_index_batches(lsh_dir)] == [
        "init",
        "d1",
    ]
    lsh_index_append(spark, lsh_dir, c, "d2")
    rec = lshmod.lsh_index_compact(spark, lsh_dir, "c1")
    assert sorted(rec["replaces"]) == ["d1", "d2", "init"]
    assert [x["batch_id"] for x in lsh_index_batches(lsh_dir)] == ["c1"]
    assert lsh_index_read(spark, lsh_dir).count() == em.count() * 4
    r = lsh_index_append(spark, lsh_dir, b, "d1")
    assert r["batch_id"] == "d1"
    assert lsh_index_read(spark, lsh_dir).count() == em.count() * 4
