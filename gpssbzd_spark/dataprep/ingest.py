"""Composed daily-ingest maintenance: cadence-driven compaction of the
three persisted indexes (VERDICT r13 next-round #5).

A daily ingest loop grows one batch per day in each persisted index
(signature / IVF / LSH); without maintenance, read fan-out and listing
cost grow O(days) (PERF_NOTES #11). Each index has its own LSM-style
fold (``sig_index_compact`` / ``ivf_index_compact`` /
``lsh_index_compact``), each with a single manifest commit point — this
module adds the LOOP-side recipe: run the folds on an every-N-days
cadence, INSIDE the day body BEFORE the day's pickup commit, so every
crash interleaving heals the same way the rest of the day body does:

- the pickup commit is the day's outermost commit point; a crash
  anywhere before it re-runs the whole day against identical state;
- each fold already committed on the failed attempt no-ops on the
  retry (the sig fold sees one batch and returns ``None``; the ANN
  folds return their committed record by ``batch_id``);
- each fold NOT yet committed simply runs now — including the
  previously-untested interleaving of a crash BETWEEN the signature
  fold and the ANN folds (kill-point-tested in
  tests/test_ingestloop.py).

At 100 TB the cadence bounds steady-state read cost: probe fan-out and
dir listings stay O(1) instead of O(days), at a fold cost of one
read+write of the index every N days (SCALING.md families
``sigindex_compact`` / ``ivf_compact`` / ``lsh_compact`` measure the
curve).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def compact_indexes(
    spark: SparkSession,
    *,
    sig_index_dir: str | None = None,
    ivf_index_dir: str | None = None,
    lsh_index_dir: str | None = None,
    batch_id: str,
) -> dict:
    """Fold all committed batches of each given index, in the FIXED
    order signature → IVF → LSH (fixed so the crash interleavings are
    enumerable and each has a kill-point test). Each fold is its own
    single-commit-point operation and idempotent under ``batch_id``
    retry, so this composition needs no commit point of its own — run
    it before the day's pickup commit and every partial execution
    heals on the day's re-run. Returns per-index fold results
    (``None`` where an index had fewer than 2 batches or was not
    given)."""
    out: dict = {"sig": None, "ivf": None, "lsh": None}
    if sig_index_dir is not None:
        from gpssbzd_spark.dataprep.sigindex import sig_index_compact

        out["sig"] = sig_index_compact(spark, sig_index_dir)
    if ivf_index_dir is not None:
        from gpssbzd_spark.dataprep.ivfindex import ivf_index_compact

        out["ivf"] = ivf_index_compact(spark, ivf_index_dir, batch_id)
    if lsh_index_dir is not None:
        from gpssbzd_spark.dataprep.lshindex import lsh_index_compact

        out["lsh"] = lsh_index_compact(spark, lsh_index_dir, batch_id)
    return out


def maybe_compact_indexes(
    spark: SparkSession,
    day_ordinal: int,
    compact_every_n_days: int | None,
    *,
    sig_index_dir: str | None = None,
    ivf_index_dir: str | None = None,
    lsh_index_dir: str | None = None,
    batch_id: str | None = None,
) -> dict | None:
    """The loop-facing cadence knob: fold every ``compact_every_n_days``
    days (1-based ``day_ordinal``; ``None``/0 disables — appends
    accumulate until an explicit :func:`compact_indexes`). The ANN
    folds are keyed ``fold-d<ordinal>`` by default, so a retried day
    reuses its committed fold and a later cadence day chains a new
    one (supersedence resolves over all records)."""
    if not compact_every_n_days:
        return None
    if day_ordinal % compact_every_n_days != 0:
        return None
    return compact_indexes(
        spark,
        sig_index_dir=sig_index_dir,
        ivf_index_dir=ivf_index_dir,
        lsh_index_dir=lsh_index_dir,
        batch_id=batch_id or f"fold-d{day_ordinal}",
    )
