"""Cadence-driven index maintenance for the composed daily-ingest loop
(dataprep/ingest.py — VERDICT r13 #5): the compact_every_n_days knob,
and the one crash interleaving r13's kill-point tests did not cover —
a kill BETWEEN the signature fold and the ANN folds."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gpssbzd_spark.dataprep.ingest import (
    compact_indexes,
    maybe_compact_indexes,
)
from gpssbzd_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _grown_indexes(spark, tmp_path):
    """A two-day state for all three indexes: 2 committed sig batches,
    init+append for IVF and LSH."""
    from gpssbzd_spark.dataprep.ivfindex import (
        ivf_index_append,
        ivf_index_init,
    )
    from gpssbzd_spark.dataprep.lshindex import (
        lsh_index_append,
        lsh_index_build,
    )
    from gpssbzd_spark.dataprep.sigindex import sig_index_ingest

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    em = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    sig_dir = str(tmp_path / "sig")
    ivf_dir = str(tmp_path / "ivf")
    lsh_dir = str(tmp_path / "lsh")
    for day, pred in (("day1", "doc_id % 3 != 0"), ("day2", "doc_id % 3 = 0")):
        landing = str(tmp_path / "landing" / day)
        docs.filter(pred).write.mode("overwrite").parquet(landing)
        assert sig_index_ingest(spark, landing, sig_dir) is not None
    ivf_index_init(
        spark,
        ivf_dir,
        em.filter("vec_id % 3 != 0"),
        dim=64,
        n_centroids=8,
        iters=1,
    )
    ivf_index_append(spark, ivf_dir, em.filter("vec_id % 3 = 0"), "day2")
    lsh_index_build(
        spark,
        lsh_dir,
        em.filter("vec_id % 3 != 0"),
        dim=64,
        n_planes=6,
        n_tables=4,
    )
    lsh_index_append(spark, lsh_dir, em.filter("vec_id % 3 = 0"), "day2")
    return sig_dir, ivf_dir, lsh_dir


def _sig_rows(spark, sig_dir):
    from gpssbzd_spark.dataprep.sigindex import sig_index_read

    return {
        tuple(r) for r in sig_index_read(spark, sig_dir).collect()
    }


def _sig_batches(spark, sig_dir):
    from gpssbzd_spark.dataprep.sigindex import (
        _paths,
        _read_index_manifest,
    )

    return _read_index_manifest(spark, _paths(sig_dir)[1])[1]


def test_killpoint_between_sig_fold_and_ann_folds_converges(
    spark, tmp_path, monkeypatch
):
    """compact_indexes folds sig → IVF → LSH, each its own commit
    point. Kill after the sig fold commits (the interleaving VERDICT
    r13 #5 named as untested): the sig index must already be folded
    and content-identical, the ANN indexes untouched; the retry —
    what the day body's re-run does, since the pickup commit never
    landed — must no-op the sig fold and complete both ANN folds,
    with all three read-backs content-identical to the pre-fold
    state."""
    import gpssbzd_spark.dataprep.ivfindex as ivfmod
    from gpssbzd_spark.dataprep.ivfindex import ivf_index_batches, ivf_index_read
    from gpssbzd_spark.dataprep.lshindex import lsh_index_batches, lsh_index_read

    sig_dir, ivf_dir, lsh_dir = _grown_indexes(spark, tmp_path)
    sig_before = _sig_rows(spark, sig_dir)
    ivf_before = {
        tuple(r)
        for r in ivf_index_read(spark, ivf_dir).select("vec_id", "cid").collect()
    }
    lsh_before = {
        tuple(r)
        for r in lsh_index_read(spark, lsh_dir)
        .select("vec_id", "tbl", "bucket")
        .collect()
    }
    assert len(_sig_batches(spark, sig_dir)) == 2
    assert len(ivf_index_batches(ivf_dir)) == 2
    assert len(lsh_index_batches(lsh_dir)) == 2

    real_ivf_compact = ivfmod.ivf_index_compact

    def killed(*a, **kw):
        raise RuntimeError("killed between sig fold and ANN folds")

    monkeypatch.setattr(ivfmod, "ivf_index_compact", killed)
    with pytest.raises(RuntimeError, match="killed between"):
        compact_indexes(
            spark,
            sig_index_dir=sig_dir,
            ivf_index_dir=ivf_dir,
            lsh_index_dir=lsh_dir,
            batch_id="fold-d2",
        )
    # crashed state: sig folded and content-identical, ANN untouched
    assert len(_sig_batches(spark, sig_dir)) == 1
    assert _sig_rows(spark, sig_dir) == sig_before
    assert len(ivf_index_batches(ivf_dir)) == 2
    assert len(lsh_index_batches(lsh_dir)) == 2

    # retry (the day body re-runs): sig no-ops, ANN folds complete
    monkeypatch.setattr(ivfmod, "ivf_index_compact", real_ivf_compact)
    out = compact_indexes(
        spark,
        sig_index_dir=sig_dir,
        ivf_index_dir=ivf_dir,
        lsh_index_dir=lsh_dir,
        batch_id="fold-d2",
    )
    assert out["sig"] is None  # already one batch — nothing to fold
    assert out["ivf"]["batch_id"] == "fold-d2"
    assert out["lsh"]["batch_id"] == "fold-d2"
    assert len(ivf_index_batches(ivf_dir)) == 1
    assert len(lsh_index_batches(lsh_dir)) == 1
    assert _sig_rows(spark, sig_dir) == sig_before
    assert {
        tuple(r)
        for r in ivf_index_read(spark, ivf_dir).select("vec_id", "cid").collect()
    } == ivf_before
    assert {
        tuple(r)
        for r in lsh_index_read(spark, lsh_dir)
        .select("vec_id", "tbl", "bucket")
        .collect()
    } == lsh_before
    # the fold is idempotent: a late retry returns the committed
    # records and changes nothing
    again = compact_indexes(
        spark,
        sig_index_dir=sig_dir,
        ivf_index_dir=ivf_dir,
        lsh_index_dir=lsh_dir,
        batch_id="fold-d2",
    )
    assert again["sig"] is None
    assert again["ivf"]["batch_id"] == "fold-d2"
    assert again["lsh"]["batch_id"] == "fold-d2"
    assert len(ivf_index_batches(ivf_dir)) == 1


def test_post_compaction_gc_reclaims_folded_dirs(spark, tmp_path):
    """ADVICE r13: once the ``replaces`` record lands the folded dirs
    are unreferenced — the compactions must delete them (previously an
    index that stopped ingesting retained ~2× storage forever), and
    the read-backs must be unaffected."""
    from gpssbzd_spark.dataprep.ivfindex import ivf_index_read
    from gpssbzd_spark.dataprep.lshindex import lsh_index_read

    sig_dir, ivf_dir, lsh_dir = _grown_indexes(spark, tmp_path)
    sig_before = _sig_rows(spark, sig_dir)
    n_ivf = ivf_index_read(spark, ivf_dir).count()
    n_lsh = lsh_index_read(spark, lsh_dir).count()
    compact_indexes(
        spark,
        sig_index_dir=sig_dir,
        ivf_index_dir=ivf_dir,
        lsh_index_dir=lsh_dir,
        batch_id="fold-d2",
    )
    # exactly the surviving dirs remain on disk
    sig_dirs = [
        d
        for d in os.listdir(os.path.join(sig_dir, "sigs"))
        if d.startswith("batch-")
    ]
    assert len(sig_dirs) == 1 and sig_dirs[0].startswith("batch-compact-")
    assert sorted(os.listdir(os.path.join(ivf_dir, "batches"))) == ["fold-d2"]
    assert sorted(os.listdir(os.path.join(lsh_dir, "batches"))) == ["fold-d2"]
    assert not os.path.exists(os.path.join(lsh_dir, "index"))
    assert _sig_rows(spark, sig_dir) == sig_before
    assert ivf_index_read(spark, ivf_dir).count() == n_ivf
    assert lsh_index_read(spark, lsh_dir).count() == n_lsh


def test_maybe_compact_cadence_gating(spark, tmp_path):
    """The knob: disabled (None/0) and off-cadence days never fold;
    the cadence day folds with the default fold-d<ordinal> key."""
    from gpssbzd_spark.dataprep.ivfindex import ivf_index_batches
    from gpssbzd_spark.dataprep.lshindex import lsh_index_batches

    sig_dir, ivf_dir, lsh_dir = _grown_indexes(spark, tmp_path)
    kw = dict(
        sig_index_dir=sig_dir, ivf_index_dir=ivf_dir, lsh_index_dir=lsh_dir
    )
    assert maybe_compact_indexes(spark, 2, None, **kw) is None
    assert maybe_compact_indexes(spark, 2, 0, **kw) is None
    assert maybe_compact_indexes(spark, 1, 2, **kw) is None
    assert len(_sig_batches(spark, sig_dir)) == 2
    out = maybe_compact_indexes(spark, 2, 2, **kw)
    assert out["ivf"]["batch_id"] == "fold-d2"
    assert out["lsh"]["batch_id"] == "fold-d2"
    assert len(_sig_batches(spark, sig_dir)) == 1
    assert len(ivf_index_batches(ivf_dir)) == 1
    assert len(lsh_index_batches(lsh_dir)) == 1
