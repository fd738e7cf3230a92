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


def test_retry_after_crash_before_landing_commit_is_idempotent(
    spark, tmp_path
):
    """Crash AFTER the index manifest commit but BEFORE the landing
    commit: the retry re-selects the same files, recomputes the same
    content-keyed cid, overwrites the same dir, and appends a duplicate
    RECORD — reads must dedupe to the identical row set."""
    d = _docs(spark).limit(80)
    land = str(tmp_path / "land")
    d.write.parquet(land)
    idx = str(tmp_path / "index")
    b1 = sig_index_ingest(spark, land, idx)
    before = sig_index_read(spark, idx)
    n, rows = before.count(), before.collect()
    # simulate the crash: forget that the landing files were processed
    for part in glob.glob(
        os.path.join(idx, "landing_manifest", "*.jsonl")
    ):
        os.remove(part)
    b2 = sig_index_ingest(spark, land, idx)
    assert b2 == b1, "retry must overwrite the SAME content-keyed dir"
    # duplicate manifest records of one dir exist now; reads dedupe
    after = sig_index_read(spark, idx)
    assert after.count() == n
    assert sorted(map(tuple, after.collect())) == sorted(map(tuple, rows))


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
