"""Scale-stress gates (VERDICT r5 #2): the plan asserts in
tests/test_plans.py say the banded dedup paths have the SHAPE that
scales; these tests MEASURE it. ``dataprep/scalegen.py`` inflates the
fixtures K× in rows with the duplicate rate held constant, so a banded
implementation must grow ~linearly in rows (exponent ≲ 1.3 over
K=4→16; fixed per-job overhead biases the slope DOWN, so the gate has
headroom for noise) while an all-pairs implementation would show ~2
(candidate space K²). The full curve lives in SCALING.md
(``python scaling.py``); this gate runs the banded families at the
small oracle scale to keep suite time bounded.
"""

from __future__ import annotations

import math
import time

import pytest

from tests.conftest import ORACLE_SF_DIR


def _measure(fn, inp, K, repeats=2):
    """MIN wall time of fn(inp, K) materialized via a noop write — min,
    not mean: one co-tenant spike would fake a superlinear slope."""
    runs = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn(inp, K).write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    return min(runs)


def _exponent(spark, table, inflate, fn, lo=4, hi=16):
    from gpssbzd_spark.sources import load_table

    base = load_table(spark, ORACLE_SF_DIR, table)
    times = {}
    for K in (lo, hi):
        inp = inflate(base, K).persist()
        inp.count()  # inflation materialized OUTSIDE the timed section
        # one untimed warm pass so codegen/broadcast setup for this
        # plan shape doesn't land in the first timed K
        fn(inp, K).write.format("noop").mode("overwrite").save()
        times[K] = _measure(fn, inp, K)
        inp.unpersist()
        spark.catalog.clearCache()
    return math.log(times[hi] / times[lo]) / math.log(hi / lo), times


def test_scalegen_preserves_structure_exactly(spark):
    """The inflation contract the exponents rely on: K× rows with the
    within-replica pair structure replicated VERBATIM (the character
    cipher is a shingle bijection) and zero cross-replica leakage."""
    from gpssbzd_spark.dataprep.dedup import minhash_lsh_portable
    from gpssbzd_spark.dataprep.scalegen import inflate_documents
    from gpssbzd_spark.sources import load_table

    d = load_table(spark, ORACLE_SF_DIR, "documents")
    base_pairs = minhash_lsh_portable(d).count()
    assert base_pairs > 0
    for K in (2, 4):
        got = minhash_lsh_portable(inflate_documents(d, K)).count()
        assert got == K * base_pairs, (K, got, base_pairs)


@pytest.mark.parametrize(
    "family",
    [
        "minhash_portable",
        "simhash_portable",
        "simhash_portable_128",
        "embedding_blocked",
    ],
)
def test_banded_families_scale_linearly(spark, family):
    """Runtime exponent over K=4→16 < 1.3 for every banded/blocked
    family — the empirical half of the 100 TB claim."""
    import scaling as harness

    table, inflate, fn = harness.families(ORACLE_SF_DIR)[family][:3]
    exp, times = _exponent(spark, table, inflate, fn)
    assert exp < 1.3, (family, exp, times)


def test_cc_and_event_families_scale_linearly(spark):
    """Connected components over the pair graph and the funnel scan:
    both must be ~linear in input rows as well (CC's graph grows K×
    by construction; the funnel is one scan + one exchange)."""
    import scaling as harness

    for family in ("neardup_cc", "funnel"):
        table, inflate, fn = harness.families(ORACLE_SF_DIR)[family][:3]
        exp, times = _exponent(spark, table, inflate, fn)
        assert exp < 1.3, (family, exp, times)


def test_composite_families_scale_linearly(spark):
    """VERDICT r8 #6: the non-dedup heavy hitters — the flagship
    pretraining pipeline and the forced-SMJ TPC-H Q9 star — must hold
    the same ~linear gate (their sf0.1 K=16 octaves live in
    SCALING.md: 0.487 / 0.415)."""
    import scaling as harness

    # pass the SAME fixture the inflation uses — the multi-table ops load
    # their second input from it (a cross-fixture hybrid would gate a
    # different family than the one SCALING.md records)
    for family in (
        "pretrain_e2e",
        "tpch_q9_smj",
        "incremental_neardup",
        "sigindex_append",
        # r11 maintenance composites: the full day-cycle ingest loop
        # and the growable IVF index's append path — both must stay
        # linear in DELTA size while their persisted index grows
        "ingest_day_cycle",
        "ivf_append",
        # r11 skew fallback: one line past the matrix budget, routed
        # through the eps-graph path; trajectory count grows ~sqrt(K)
        # so the line's pair count (its work unit) grows ~Kx — the
        # gate pins that the fallback adds nothing on top of it
        "dbscan_skewed_line",
        # r12: the LSH maintenance twin — O(delta) batch appends
        # against a strictly-growing (tbl, bucket)-partitioned index
        "lsh_append",
    ):
        table, inflate, fn = harness.families(ORACLE_SF_DIR)[family][:3]
        exp, times = _exponent(spark, table, inflate, fn)
        assert exp < 1.3, (family, exp, times)


@pytest.mark.parametrize(
    "family",
    [
        "decontam_ngram",
        "ivf_query_persisted",
        "tfidf_terms",
        "token_budget_cap",
        "multimodal_features",
        # r11-late / r12 families under the same ceiling: the gram
        # explode + two gram-keyed moves, the posting-list build, and
        # the cluster-blocked pair pipeline (hierarchical assignment
        # from n_clusters ≥ 64, i.e. K ≥ 4 at the ladder setting — the
        # K=4→16 gate octave runs the two-level path)
        "repeated_spans",
        "bm25_topk",
        "semdedup",
    ],
)
def test_query_side_families_scale_gently(spark, family):
    """r10 additions, one gate per family so a failure names its own
    family instead of aborting the rest: decontamination (train side
    K×, eval fixed and broadcast — only the gram scan grows), the ANN
    steady-state probe of a persisted cid-partitioned IVF index
    (codebook grown in step: constant list size, fixed n_probe —
    should be near-flat), the TF-IDF double shuffle ((doc,term) pairs
    AND vocabulary both grow), the token-budget quota window (one
    exchange; cells sit inside fixed per-job overhead, so this pins
    'no visible superlinear term'), and the mapInPandas multimodal
    seam (single stage, zero shuffles). The gate pins only the 100 TB
    disqualifier (superlinearity), same ceiling as the others."""
    import scaling as harness

    table, inflate, fn = harness.families(ORACLE_SF_DIR)[family][:3]
    exp, times = _exponent(spark, table, inflate, fn)
    assert exp < 1.3, (family, exp, times)


@pytest.mark.parametrize(
    "family", ["sigindex_compact", "ivf_compact", "lsh_compact"]
)
def test_compaction_folds_scale_linearly(spark, family):
    """r14 (VERDICT r13 #3): the LSM folds read and rewrite the whole
    index, so their cost must be ~linear in index size — that measured
    curve is what the compact_every_n_days guidance trades against the
    O(days) read fan-out it removes. Bespoke loop (not _exponent): the
    fold is DESTRUCTIVE, so each timed run re-inflates first — the
    pristine-index rebuild is the inflate wrapper's side effect,
    outside the timed section, exactly as in scaling.py's main loop."""
    import scaling as harness

    table, inflate, fn = harness.families(ORACLE_SF_DIR)[family][:3]
    from gpssbzd_spark.sources import load_table

    base = load_table(spark, ORACLE_SF_DIR, table)
    times = {}
    for K in (4, 16):
        runs = []
        for i in range(3):
            inp = inflate(base, K)  # rebuilds the pristine index
            inp.count()
            t0 = time.perf_counter()
            fn(inp, K).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        # first run per K absorbs plan-compile warmup; min of the rest
        times[K] = min(runs[1:])
        spark.catalog.clearCache()
    exp = math.log(times[16] / times[4]) / math.log(16 / 4)
    assert exp < 1.3, (family, exp, times)


def test_inflate_embeddings_is_per_replica_isometry(spark):
    """The scaling exponents for the embedding families are only
    meaningful if the inflation preserves within-replica geometry
    EXACTLY: every replica's transform (dimension roll + sign mask) is
    orthogonal, so norms and pairwise within-replica cosines must equal
    the originals to float precision, while cross-replica cosines of
    the SAME vector collapse toward 0 (no self-match leakage)."""
    import math

    from pyspark.sql import functions as F

    from gpssbzd_spark.dataprep.scalegen import ID_STRIDE, inflate_embeddings
    from gpssbzd_spark.sources import load_table
    from tests.conftest import ORACLE_SF_DIR

    base = load_table(spark, ORACLE_SF_DIR, "embeddings").limit(40)
    inflated = inflate_embeddings(base, 4)

    def vecs(df):
        return {r.vec_id: r.embedding for r in df.collect()}

    orig = vecs(base)
    infl = vecs(inflated)
    assert len(infl) == 4 * len(orig)

    def norm(v):
        return math.sqrt(sum(x * x for x in v))

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b)) / (norm(a) * norm(b))

    ids = sorted(orig)[:6]
    for rep in range(4):
        for i in ids:
            assert norm(infl[i + rep * ID_STRIDE]) == pytest.approx(
                norm(orig[i]), rel=1e-6
            )
        # within-replica pairwise cosines preserved
        for a, b in zip(ids, ids[1:]):
            assert cos(
                infl[a + rep * ID_STRIDE], infl[b + rep * ID_STRIDE]
            ) == pytest.approx(cos(orig[a], orig[b]), abs=1e-6)
    # the same vector across replicas must NOT stay similar
    crosses = [
        abs(cos(infl[i], infl[i + rep * ID_STRIDE]))
        for i in ids
        for rep in (1, 2, 3)
    ]
    assert max(crosses) < 0.9 and sum(crosses) / len(crosses) < 0.35


def test_scalegen_replicates_repeated_span_structure(spark):
    """The repeated_spans ladder's inflation contract: the per-replica
    character cipher is a token bijection, so the cross-doc repeated
    6-gram structure replicates VERBATIM per replica and never leaks
    across replicas — the span output must grow exactly K× (the
    measured ladder's out column shows exactly this: 529 · K at every
    K)."""
    from gpssbzd_spark.dataprep.dedup import repeated_spans
    from gpssbzd_spark.dataprep.scalegen import inflate_documents
    from gpssbzd_spark.sources import load_table

    d = load_table(spark, ORACLE_SF_DIR, "documents")
    base = repeated_spans(d, n=6, min_docs=2).count()
    assert base > 0
    for K in (2, 4):
        got = repeated_spans(inflate_documents(d, K), n=6, min_docs=2).count()
        assert got == K * base, (K, got, base)
