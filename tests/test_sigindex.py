"""Persisted signature-index maintenance tests (dataprep/sigindex.py,
VERDICT r9 #5): append-equals-scratch, exactly-once pickup, idempotent
crash retry, and invisibility of uncommitted batches. The corpus query
``dd_incremental_index_append`` additionally proves append ≡ scratch
against the DuckDB oracle (tests/test_corpus_oracle.py sweeps it)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from gpssbzd_spark.dataprep.dedup import minhash_signatures_portable
from gpssbzd_spark.dataprep.sigindex import (
    sig_index_ingest,
    sig_index_match,
    sig_index_read,
)
from gpssbzd_spark.sources import load_table
from tests.conftest import ORACLE_SF_DIR


def _docs(spark):
    return load_table(spark, ORACLE_SF_DIR, "documents").select(
        "doc_id", "text"
    )


def _frames_equal(a, b) -> bool:
    return (
        a.count() == b.count()
        and a.exceptAll(b).count() == 0
        and b.exceptAll(a).count() == 0
    )


def test_two_appends_equal_scratch_signing(spark, tmp_path):
    """The oracle property in-process: ingesting two disjoint landings
    yields exactly the signature rows of signing everything at once."""
    d = _docs(spark)
    l1, l2 = str(tmp_path / "l1"), str(tmp_path / "l2")
    d.filter(F.col("doc_id") % 3 != 0).write.parquet(l1)
    d.filter(F.col("doc_id") % 3 == 0).write.parquet(l2)
    idx = str(tmp_path / "index")
    b1 = sig_index_ingest(spark, l1, idx)
    b2 = sig_index_ingest(spark, l2, idx)
    assert b1 and b2 and b1 != b2
    assert _frames_equal(
        sig_index_read(spark, idx), minhash_signatures_portable(d)
    )


def test_ingest_is_noop_when_nothing_new(spark, tmp_path):
    d = _docs(spark).limit(50)
    land = str(tmp_path / "land")
    d.write.parquet(land)
    idx = str(tmp_path / "index")
    assert sig_index_ingest(spark, land, idx) is not None
    n = sig_index_read(spark, idx).count()
    assert sig_index_ingest(spark, land, idx) is None
    assert sig_index_read(spark, idx).count() == n


def test_empty_index_reads_none(spark, tmp_path):
    assert sig_index_read(spark, str(tmp_path / "nothing")) is None
    assert (
        sig_index_match(
            spark, str(tmp_path / "nothing"), _docs(spark).limit(5)
        )
        is None
    )


def test_uncommitted_batch_dir_is_invisible(spark, tmp_path):
    """A batch dir that exists on disk but has no manifest record (a
    crash between the parquet write and the index commit) must not be
    readable — readers load only committed dirs."""
    d = _docs(spark).limit(50)
    land = str(tmp_path / "land")
    d.write.parquet(land)
    idx = str(tmp_path / "index")
    sig_index_ingest(spark, land, idx)
    n = sig_index_read(spark, idx).count()
    # simulate the crashed writer: a real signature parquet dir, no record
    minhash_signatures_portable(
        _docs(spark).filter(F.col("doc_id") % 7 == 0)
    ).write.parquet(os.path.join(idx, "sigs", "batch-deadbeef00000000"))
    assert sig_index_read(spark, idx).count() == n


def test_retry_after_crash_before_commit_is_idempotent(spark, tmp_path):
    """Crash AFTER the batch parquet write but BEFORE the manifest
    commit: the retry re-selects the same files, recomputes the same
    content-keyed cid, overwrites the same dir, and commits once —
    the read equals from-scratch signing with no duplicate rows."""
    d = _docs(spark).limit(80)
    land = str(tmp_path / "land")
    d.write.parquet(land)
    idx = str(tmp_path / "index")
    b1 = sig_index_ingest(spark, land, idx)
    rows = sorted(map(tuple, sig_index_read(spark, idx).collect()))
    # simulate the crash: un-commit the batch (manifest part removed,
    # batch dir left behind as an orphan)
    for part in glob.glob(os.path.join(idx, "manifest", "*.jsonl")):
        os.remove(part)
    assert sig_index_read(spark, idx) is None  # orphan invisible
    b2 = sig_index_ingest(spark, land, idx)
    assert b2 == b1, "retry must overwrite the SAME content-keyed dir"
    after = sig_index_read(spark, idx)
    assert sorted(map(tuple, after.collect())) == rows


def test_crash_then_new_arrival_cannot_duplicate_rows(spark, tmp_path):
    """The r10 review's race: crash before the commit, then MORE files
    land before the retry. The retry's remainder (and cid) grows to
    cover old + new in ONE batch; the stale orphan can never be
    committed and is swept — append must still equal from-scratch
    signing of everything, with zero duplicate ids."""
    d = _docs(spark)
    land = str(tmp_path / "land")
    a = d.filter(F.col("doc_id") % 3 == 1)
    a.write.parquet(os.path.join(land, "a.parquet"))
    idx = str(tmp_path / "index")
    b1 = sig_index_ingest(spark, land, idx)
    # crash before commit …
    for part in glob.glob(os.path.join(idx, "manifest", "*.jsonl")):
        os.remove(part)
    # … and a NEW file lands before the retry
    b = d.filter(F.col("doc_id") % 3 == 2)
    b.write.parquet(os.path.join(land, "b.parquet"))
    b2 = sig_index_ingest(spark, land, idx)
    assert b2 is not None and b2 != b1
    assert not os.path.exists(b1), "stale orphan batch must be swept"
    got = sig_index_read(spark, idx)
    both = d.filter(F.col("doc_id") % 3 != 0)
    assert _frames_equal(got, minhash_signatures_portable(both))
    ids = got.groupBy("doc_id").count().filter(F.col("count") > 1)
    assert ids.count() == 0, "duplicate signature rows entered the index"


def test_match_against_persisted_index(spark, tmp_path):
    """The daily loop end-to-end: ingest a corpus, then match a delta
    containing exact copies of indexed docs — every seeded copy must
    surface with full signature agreement (identical text signs
    identically in every permutation)."""
    d = _docs(spark)
    land = str(tmp_path / "land")
    hist = d.filter(F.col("doc_id") % 3 != 0)
    hist.write.parquet(land)
    idx = str(tmp_path / "index")
    sig_index_ingest(spark, land, idx)
    seeded = hist.filter(F.col("doc_id") % 10 == 1).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    matches = sig_index_match(spark, idx, seeded)
    hits = {
        r.delta_id
        for r in matches.filter(F.col("n_agree") == 8).collect()
    }
    expect = {r.doc_id for r in seeded.select("doc_id").collect()}
    # a seeded doc can miss only if it produced no shingles; the
    # fixture's min text length makes that impossible
    assert expect <= hits


def test_ingest_touches_only_delta_data(spark, tmp_path):
    """Behavioral O(delta) pin beside the measured ladder
    (SCALING.md `sigindex_append`): before day 2's ingest, overwrite
    every byte of day 1's landed parquet AND of the committed batch's
    parquet with same-size garbage. The ingest must still succeed and
    its batch must equal signing day 2 alone — proof that it reads
    neither prior landings nor the existing index (metadata listing
    only), i.e. the append really is O(delta), not O(index)."""
    d = _docs(spark)
    land = str(tmp_path / "land")
    day1 = d.filter(F.col("doc_id") % 3 != 0)
    day1.write.parquet(land)
    idx = str(tmp_path / "index")
    b1 = sig_index_ingest(spark, land, idx)
    assert b1 is not None

    day1_parts = set(glob.glob(os.path.join(land, "part-*.parquet")))
    day2 = d.filter(F.col("doc_id") % 3 == 0)
    day2.write.mode("append").parquet(land)

    def clobber(path):
        size = os.path.getsize(path)
        with open(path, "wb") as fh:  # same size: the immutability
            fh.write(b"\x00" * size)  # check must still pass

    for p in day1_parts:
        clobber(p)
    for p in glob.glob(os.path.join(b1.replace("file:", ""), "part-*.parquet")):
        clobber(p)

    b2 = sig_index_ingest(spark, land, idx)
    assert b2 is not None and b2 != b1
    got = spark.read.parquet(b2)
    assert _frames_equal(got, minhash_signatures_portable(day2))


# ---------------------------------------------------------------------------
# LSM-style compaction (r13, VERDICT r12 missing #1 / next-round #4)
# ---------------------------------------------------------------------------


def test_compact_folds_batches_content_identical(spark, tmp_path):
    """Two daily ingests + compact must leave exactly ONE committed
    batch whose rows equal from-scratch signing — and the coverage
    ledger must survive the fold (re-ingesting either landing is a
    no-op), or a compacted index would re-sign history."""
    from gpssbzd_spark.dataprep.sigindex import (
        _paths,
        _read_index_manifest,
        sig_index_compact,
    )

    d = _docs(spark)
    l1, l2 = str(tmp_path / "l1"), str(tmp_path / "l2")
    d.filter(F.col("doc_id") % 3 != 0).write.parquet(l1)
    d.filter(F.col("doc_id") % 3 == 0).write.parquet(l2)
    idx = str(tmp_path / "index")
    sig_index_ingest(spark, l1, idx)
    sig_index_ingest(spark, l2, idx)
    before = sorted(map(tuple, sig_index_read(spark, idx).collect()))

    cdir = sig_index_compact(spark, idx)
    assert cdir is not None
    _, manifest_dir = _paths(idx)
    covered, batches = _read_index_manifest(spark, manifest_dir)
    assert batches == {cdir}, "compaction must leave ONE committed batch"
    assert sorted(map(tuple, sig_index_read(spark, idx).collect())) == before
    assert _frames_equal(
        sig_index_read(spark, idx), minhash_signatures_portable(d)
    )
    # coverage ledger carried forward: both landings remain covered
    assert sig_index_ingest(spark, l1, idx) is None
    assert sig_index_ingest(spark, l2, idx) is None
    # idempotent re-run: one batch < min_batches → no-op
    assert sig_index_compact(spark, idx) is None


def test_compact_crash_before_commit_is_invisible_and_retries(
    spark, tmp_path, monkeypatch
):
    """Kill-point: crash between the compacted parquet write and the
    manifest commit. Readers must still see the ORIGINAL batches (the
    compact dir is an uncommitted orphan), and the retry must converge
    onto the same content-keyed dir."""
    import gpssbzd_spark.dataprep.sigindex as sigmod

    d = _docs(spark)
    l1, l2 = str(tmp_path / "l1"), str(tmp_path / "l2")
    d.filter(F.col("doc_id") % 4 == 0).write.parquet(l1)
    d.filter(F.col("doc_id") % 4 == 1).write.parquet(l2)
    idx = str(tmp_path / "index")
    sig_index_ingest(spark, l1, idx)
    sig_index_ingest(spark, l2, idx)
    before = sorted(map(tuple, sig_index_read(spark, idx).collect()))

    real_commit = sigmod._commit_batch

    def crash(*a, **k):
        raise RuntimeError("injected crash before compaction commit")

    monkeypatch.setattr(sigmod, "_commit_batch", crash)
    try:
        sigmod.sig_index_compact(spark, idx)
    except RuntimeError:
        pass
    monkeypatch.setattr(sigmod, "_commit_batch", real_commit)

    _, batches = sigmod._read_index_manifest(spark, sigmod._paths(idx)[1])
    assert len(batches) == 2, "uncommitted compaction must be invisible"
    assert sorted(map(tuple, sig_index_read(spark, idx).collect())) == before

    cdir = sigmod.sig_index_compact(spark, idx)
    assert cdir is not None
    assert sorted(map(tuple, sig_index_read(spark, idx).collect())) == before


def test_compact_chains_and_folded_dirs_are_swept(spark, tmp_path):
    """Chained compaction over {previous compact, newer days} must
    resolve supersedence across ALL records (an earlier compaction
    record's replaces still applies after it is itself folded), and
    the next ingest's orphan sweep must collect the unreferenced
    folded dirs."""
    from gpssbzd_spark.dataprep.sigindex import sig_index_compact

    d = _docs(spark)
    lands = []
    for i, pred in enumerate(
        (F.col("doc_id") % 3 == 0, F.col("doc_id") % 3 == 1,
         F.col("doc_id") % 3 == 2)
    ):
        land = str(tmp_path / f"l{i}")
        d.filter(pred).write.parquet(land)
        lands.append(land)
    idx = str(tmp_path / "index")
    b0 = sig_index_ingest(spark, lands[0], idx)
    sig_index_ingest(spark, lands[1], idx)
    c1 = sig_index_compact(spark, idx)
    b2 = sig_index_ingest(spark, lands[2], idx)
    c2 = sig_index_compact(spark, idx)
    assert c1 and b2 and c2 and c1 != c2
    assert _frames_equal(
        sig_index_read(spark, idx), minhash_signatures_portable(d)
    )
    # all three landings stay covered through two folds
    for land in lands:
        assert sig_index_ingest(spark, land, idx) is None
    # a later ingest sweeps the unreferenced folded dirs (b0, c1 …)
    extra = str(tmp_path / "extra")
    d.limit(7).withColumn(
        "doc_id", F.col("doc_id") + 5000000
    ).write.parquet(extra)
    sig_index_ingest(spark, extra, idx)
    assert not os.path.exists(b0), "folded day dir must be swept"
    assert not os.path.exists(c1), "folded compact dir must be swept"
    assert _frames_equal(
        sig_index_read(spark, idx),
        minhash_signatures_portable(
            d.unionByName(
                d.limit(7).withColumn(
                    "doc_id", F.col("doc_id") + 5000000
                )
            )
        ),
    )
