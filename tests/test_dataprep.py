"""Property/quality tests for the dataprep extension operators
(SURVEY.md §2.11): dedup recall+precision, similarity-search recall,
text-analysis invariants, multimodal plumbing.

These cover the guarantees the corpus notes point at ("recall asserted
in pytest", "stability-under-edit is property-tested"): the DuckDB
oracle can check exact SQL-expressible results, but LSH recall and
fingerprint robustness are statistical properties that need reference
implementations (brute force / plain Python) to compare against.
"""

from __future__ import annotations

import importlib.util

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from gpssbzd_spark.dataprep.dedup import (
    char_shingles,
    embedding_cosine_pairs,
    exact_dedup,
    hamming64,
    minhash_dedup_pairs,
    simhash64,
    simhash_near_pairs,
)
from gpssbzd_spark.dataprep.multimodal import (
    extract_features,
    media_from_binary,
    resize_images,
    sample_frames,
)
from gpssbzd_spark.dataprep.similarity import brute_force_topk, ivf_topk, lsh_topk
from gpssbzd_spark.dataprep.text import doc_fingerprint, language_id
from gpssbzd_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


def test_exact_dedup_keeps_min_id_per_text(spark):
    df = spark.createDataFrame(
        [(1, "aaa"), (2, "aaa"), (3, "bbb"), (4, "aaa"), (5, "bbb"), (6, "c")],
        "doc_id long, text string",
    )
    got = {r.doc_id for r in exact_dedup(df).collect()}
    assert got == {1, 3, 6}


def test_passage_dedup_drops_cross_doc_boilerplate(spark):
    """Seeded boilerplate scenario: a 4-token license block appears in
    three docs. The (doc_id, chunk_idx)-first occurrence survives, the
    other copies vanish from their docs' reassembled text, a doc that
    IS only the boilerplate disappears entirely, and a unique doc
    passes through byte-identical."""
    from gpssbzd_spark.dataprep.dedup import passage_dedup

    boiler = "all rights reserved worldwide"
    df = spark.createDataFrame(
        [
            (1, boiler + " alpha beta gamma delta"),     # owns the block
            (2, "epsilon zeta eta theta " + boiler),     # loses the block
            (3, boiler),                                 # nothing survives
            (4, "iota kappa lambda mu"),                 # untouched
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in passage_dedup(df, passage_tokens=4).collect()}
    assert set(out) == {1, 2, 4}  # doc 3 fully deduped away
    assert out[1].clean_text == boiler + " alpha beta gamma delta"
    assert out[1].n_kept == 2 and out[1].n_dropped == 0
    assert out[2].clean_text == "epsilon zeta eta theta"
    assert out[2].n_kept == 1 and out[2].n_dropped == 1
    assert out[4].clean_text == "iota kappa lambda mu"
    assert out[4].n_kept == 1 and out[4].n_dropped == 0


def test_passage_dedup_first_occurrence_is_total_order(spark):
    """Within one doc a repeated passage keeps only its first
    position, and across docs the smaller doc_id wins regardless of
    row order in the input."""
    from gpssbzd_spark.dataprep.dedup import passage_dedup

    rows = [(9, "x y z w x y z w"), (2, "x y z w tail one two three")]
    for perm in (rows, rows[::-1]):
        df = spark.createDataFrame(perm, "doc_id long, text string")
        out = {
            r.doc_id: r for r in passage_dedup(df, passage_tokens=4).collect()
        }
        # doc 2 owns "x y z w" (smaller id); doc 9's two copies both drop
        assert set(out) == {2}
        assert out[2].clean_text == "x y z w tail one two three"
        assert out[2].n_dropped == 0


def test_embedding_cosine_pairs_exact_and_blocked(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], "x"),
            (2, [0.99, 0.14], "x"),   # cos(1,2) ≈ 0.990
            (3, [0.0, 1.0], "x"),     # orthogonal to 1
            (4, [1.0, 0.01], "y"),    # near-dup of 1 but other block
            (5, [0.0, 0.0], "x"),     # zero norm → dropped
        ],
        "vec_id long, embedding array<float>, blk string",
    )
    exact = embedding_cosine_pairs(df, threshold=0.9)
    got = {(r.id_a, r.id_b) for r in exact.collect()}
    assert got == {(1, 2), (1, 4), (2, 4)}
    # cos_sim of an identical direction is 1.0 after normalization
    self_sim = embedding_cosine_pairs(
        spark.createDataFrame(
            [(1, [3.0, 4.0]), (2, [6.0, 8.0])], "vec_id long, embedding array<float>"
        ),
        threshold=0.9,
    ).head()
    assert self_sim.cos_sim == pytest.approx(1.0)
    # blocking: cross-block near-dup (1,4) is not considered
    blocked = embedding_cosine_pairs(df, threshold=0.9, block_col="blk")
    assert {(r.id_a, r.id_b) for r in blocked.collect()} == {(1, 2)}


def test_embedding_blocked_recall_vs_unblocked_oracle(spark):
    """The LSH-bucketed corpus entry (dd_embedding_cosine_blocked) must be
    a strict subset of the exact unblocked pairs (precision 1.0 by
    construction — same threshold, same kernel) and keep recall of the
    high-cosine tail: near-dups agree on most hyperplane signs, so
    6-plane blocking should retain the large majority of >= 0.4 pairs
    on the fixture embeddings."""
    from gpssbzd_spark.corpus.dataprep import (
        _dd_embedding_cosine_blocked_raw,
        dd_embedding_cosine_pairs,
    )

    exact = {
        (r.id_a, r.id_b): r.cos_sim
        for r in dd_embedding_cosine_pairs(spark, SF).collect()
    }
    blocked = {
        (r.id_a, r.id_b): r.cos_sim
        for r in _dd_embedding_cosine_blocked_raw(spark, SF).collect()
    }
    assert blocked, "blocked variant found no pairs at all"
    assert set(blocked) <= set(exact), "blocked emitted a pair the oracle lacks"
    recall = len(blocked) / len(exact)
    assert recall >= 0.3, f"blocked recall collapsed: {recall:.3f}"
    # the strongest near-dups must survive blocking: every exact pair in
    # the top cosine decile should be found
    top = sorted(exact.values(), reverse=True)
    cutoff = top[max(0, len(top) // 10 - 1)]
    strong = {p for p, s in exact.items() if s >= cutoff}
    strong_recall = len(strong & set(blocked)) / len(strong)
    assert strong_recall >= 0.6, f"high-cosine recall too low: {strong_recall:.3f}"


def test_char_shingles_basic(spark):
    row = (
        spark.range(1)
        .select(char_shingles(F.lit("Spark SQL"), k=5).alias("sh"))
        .head()
    )
    assert "spark" in row.sh and "k sql" in row.sh
    # short text → empty, never null
    short = spark.range(1).select(char_shingles(F.lit("abc"), k=5).alias("sh")).head()
    assert short.sh == []


def _jaccard(a: str, b: str, k: int = 5) -> float:
    sa = {a.lower()[i : i + k] for i in range(len(a) - k + 1)}
    sb = {b.lower()[i : i + k] for i in range(len(b) - k + 1)}
    return len(sa & sb) / len(sa | sb)


def test_minhash_lsh_recall_and_precision(spark):
    """LSH candidates + exact verify must find every true near-dup pair
    (recall 1.0 at these band settings on this corpus) and report only
    pairs whose true Jaccard clears the threshold (precision 1.0 by
    construction — the verify step is exact)."""
    base = (
        "the quick brown fox jumps over the lazy dog while the band plays "
        "a slow waltz in the warm evening air of the city park"
    )
    docs = [
        (0, base),
        (1, base.replace("slow", "fast")),  # near-dup of 0
        (2, base.replace("dog", "cat").replace("park", "lot")),  # near-dup of 0
        (3, "completely different text about spark shuffles and parquet io"),
        (4, "completely different text about spark shuffles and parquet io!"),
        (5, "nothing in common with anything else here at all frankly"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    thr = 0.6
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_dedup_pairs(
            df, k=5, num_perm=64, bands=32, threshold=thr
        ).collect()
    }
    truth = {
        (a, b): _jaccard(ta, tb)
        for a, ta in docs
        for b, tb in docs
        if a < b and _jaccard(ta, tb) >= thr
    }
    assert set(got) == set(truth)  # recall (banding found them) + precision
    for pair, jac in truth.items():
        assert got[pair] == pytest.approx(jac, abs=1e-9)  # exact verify


def test_simhash_similar_texts_close_in_hamming(spark):
    df = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog near the river bank"),
            (1, "the quick brown fox jumps over the lazy cat near the river bank"),
            (2, "parquet columnar storage with predicate pushdown and codegen"),
        ],
        "doc_id long, text string",
    )
    h = {r.doc_id: r.h for r in df.select("doc_id", simhash64(F.col("text")).alias("h")).collect()}
    dist = {
        (a, b): spark.range(1)
        .select(hamming64(F.lit(h[a]), F.lit(h[b])).alias("d"))
        .head()
        .d
        for a, b in [(0, 1), (0, 2)]
    }
    assert dist[(0, 1)] < dist[(0, 2)]
    assert dist[(0, 1)] <= 16  # one-token edit flips few bits


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


def test_simhash_near_pairs_complete_vs_brute_force(spark):
    """The pigeonhole banded join must find EXACTLY the pairs a brute
    all-pairs hamming comparison finds at the same threshold (recall
    AND precision 1.0 — the banding is a complete cover for
    max_hamming < bands, not an approximation)."""
    d = load_table(spark, SF, "documents").limit(120)
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_pairs(
            d, max_hamming=3, bands=4
        ).collect()
    }
    sh = d.select(F.col("doc_id"), simhash64(F.col("text")).alias("sh"))
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    brute = {
        (r.id_a, r.id_b): r.h
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("h", hamming64(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("h") <= 3)
        .collect()
    }
    assert got == brute


def test_brute_force_topk_self_is_rank_one(spark):
    em = load_table(spark, SF, "embeddings")
    q = em.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    top1 = (
        brute_force_topk(em, q, k=1)
        .select("query_id", "vec_id")
        .collect()
    )
    assert all(r.query_id == r.vec_id for r in top1)  # cos(v, v) = 1


def test_lsh_topk_recall_vs_brute_force(spark):
    """Multi-table + multi-probe ANN must recover most of the true
    top-k. 8 planes × 8 tables × 1-bit probes on this corpus (true
    neighbors down to cos≈0.3) gives per-pair collision ≥ ~0.6 at the
    tail and ~1.0 near the top; assert ≥ 0.5 overall recall and that
    every hit it returns is scored identically to brute force."""
    em = load_table(spark, SF, "embeddings")
    q = em.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    k = 10
    truth = {
        (r.query_id, r.vec_id): round(r.cos_sim, 6)
        for r in brute_force_topk(em, q, k=k).collect()
    }
    approx = {
        (r.query_id, r.vec_id): round(r.cos_sim, 6)
        for r in lsh_topk(em, q, dim=64, k=k, n_planes=8, n_tables=8, probes=1).collect()
    }
    hits = set(truth) & set(approx)
    assert len(hits) / len(truth) >= 0.5
    # self-neighbor (cos=1) collides in every table — never missed
    assert all((i, i) in approx for i in range(20))
    assert all(truth[p] == approx[p] for p in hits)  # same scoring kernel


def test_ivf_topk_recall_vs_brute_force(spark):
    """IVF (coarse k-means + n_probe inverted lists) must recover most
    of the true top-k while scanning only ~n_probe/n_centroids of the
    corpus; like the LSH test, hits must score identically to brute
    force (same cosine kernel), and the self-neighbor is never missed
    (a vector's own list is always its nearest centroid's)."""
    em = load_table(spark, SF, "embeddings")
    q = em.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    k = 10
    truth = {
        (r.query_id, r.vec_id): round(r.cos_sim, 6)
        for r in brute_force_topk(em, q, k=k).collect()
    }
    approx = {
        (r.query_id, r.vec_id): round(r.cos_sim, 6)
        for r in ivf_topk(
            em, q, dim=64, k=k, n_centroids=8, n_probe=3, iters=2
        ).collect()
    }
    hits = set(truth) & set(approx)
    assert len(hits) / len(truth) >= 0.5
    assert all((i, i) in approx for i in range(20))
    assert all(truth[p] == approx[p] for p in hits)


def test_ivf_persisted_index_query_matches_combined(spark):
    """The build/query split (persist the index to parquet, probe it
    cold) must return byte-identical neighbors to the one-shot
    ivf_topk: same codebook seed, same assignment, same scoring — the
    parquet round-trip and partition-discovered cid must not perturb
    anything (VERDICT r4 next-round #8)."""
    from gpssbzd_spark.corpus import dataprep as cdp

    df = cdp.sim_topk_ivf_build(spark, SF)  # fresh index for this gen
    # the build query's own verification flags must all be green
    rows = df.collect()
    assert rows and all(
        r.cid_agree == 1 and r.norm_agree == 1 and r.cid_in_range == 1
        for r in rows
    )
    # raw-neighbor parity: the persisted probe path must return
    # byte-identical neighbors to the one-shot ivf_topk (the corpus
    # queries themselves return rank-grid projections, which would
    # compare trivially)
    split = sorted(map(tuple, cdp._sim_topk_ivf_query_raw(spark, SF).collect()))
    combined = sorted(map(tuple, cdp._sim_topk_ivf_raw(spark, SF).collect()))
    assert split == combined


def test_ivf_query_pruned_matches_full_read(spark):
    """ADVICE r10: the probed-directory serving path must return the
    same (query_id, vec_id, cos_sim, rank) rows as ivf_query over the
    FULL-listing read of the same persisted index — coverage rests on
    the driver-side codebook consult (probe_centroid_ids) selecting
    bit-identically to the executor kernel, which this pins end to
    end. rows_out alone cannot witness it (any probed partition with
    ≥k candidates keeps the count)."""
    import json
    import os

    import numpy as np

    from gpssbzd_spark.corpus import dataprep as cdp
    from gpssbzd_spark.dataprep.similarity import ivf_query, ivf_query_pruned

    cdp.sim_topk_ivf_build(spark, SF)  # fresh index for this generation
    cache = cdp._ivf_cache_dir(SF)
    with open(os.path.join(cache, "codebook.json")) as f:
        cents = np.array(json.load(f), dtype=np.float64)
    em = load_table(spark, SF, "embeddings")
    q = em.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    path = os.path.join(cache, "index")
    pruned = sorted(
        map(tuple, ivf_query_pruned(path, cents, q, k=5, n_probe=4).collect())
    )
    full = sorted(
        map(
            tuple,
            ivf_query(spark.read.parquet(path), cents, q, k=5, n_probe=4).collect(),
        )
    )
    assert pruned == full


def test_ivf_query_pruned_scans_only_probed_directories(spark):
    """The pruned read's input files must all live under probed cid
    directories, and at least one NON-probed directory must exist on
    disk (otherwise the pruning claim is vacuous at this fixture)."""
    import json
    import os

    import numpy as np

    from gpssbzd_spark.corpus import dataprep as cdp
    from gpssbzd_spark.dataprep.similarity import (
        ivf_query_pruned,
        probe_centroid_ids,
    )

    cdp.sim_topk_ivf_build(spark, SF)
    cache = cdp._ivf_cache_dir(SF)
    with open(os.path.join(cache, "codebook.json")) as f:
        cents = np.array(json.load(f), dtype=np.float64)
    em = load_table(spark, SF, "embeddings")
    q = em.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    qv = np.stack(
        [np.asarray(r.query_vec, dtype=np.float64) for r in q.collect()]
    )
    probed = {int(c) for row in probe_centroid_ids(cents, qv, 2) for c in row}
    path = os.path.join(cache, "index")
    on_disk = {
        int(d.split("=")[1])
        for d in os.listdir(path)
        if d.startswith("cid=")
    }
    assert on_disk - probed, "fixture probes every directory — gate vacuous"
    out = ivf_query_pruned(path, cents, q, k=5, n_probe=2)
    # inputFiles spans the whole plan (index scan + the query-side
    # embeddings scan) — only the index files carry a cid= segment
    index_files = [f for f in out.inputFiles() if "cid=" in f]
    assert index_files
    for f in index_files:
        cid = int(f.split("cid=")[1].split("/")[0])
        assert cid in probed, f"scanned unprobed partition: {f}"


def test_ivf_query_pruned_skips_empty_centroid_directories(spark, tmp_path):
    """ADVICE r10 (medium): a k-means centroid with zero assigned
    vectors writes NO partition directory; if it lands in a query's
    probe set the pruned read must skip it (an empty inverted list
    contributes no candidates) instead of throwing PATH_NOT_FOUND.
    Forced here by deleting a probed directory from a copied index —
    the query must still return k neighbors from the remaining lists,
    exactly the rows the surviving partitions contribute."""
    import json
    import os
    import shutil

    import numpy as np

    from gpssbzd_spark.corpus import dataprep as cdp
    from gpssbzd_spark.dataprep.similarity import (
        ivf_query_pruned,
        probe_centroid_ids,
    )

    cdp.sim_topk_ivf_build(spark, SF)
    cache = cdp._ivf_cache_dir(SF)
    with open(os.path.join(cache, "codebook.json")) as f:
        cents = np.array(json.load(f), dtype=np.float64)
    em = load_table(spark, SF, "embeddings")
    q = em.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    qv = np.stack(
        [np.asarray(r.query_vec, dtype=np.float64) for r in q.collect()]
    )
    probed = sorted(
        {int(c) for row in probe_centroid_ids(cents, qv, 4) for c in row}
    )
    assert len(probed) >= 2
    victim = probed[-1]  # drop the least-preferred probed list
    path = str(tmp_path / "index")
    shutil.copytree(os.path.join(cache, "index"), path)
    shutil.rmtree(os.path.join(path, f"cid={victim}"))
    out = ivf_query_pruned(path, cents, q, k=5, n_probe=4).collect()
    assert {r.query_id for r in out} == {0, 1, 2}
    assert all(1 <= r.rank <= 5 for r in out)
    # and none of the returned neighbors came from the deleted list
    surviving = spark.read.option("basePath", path).parquet(path)
    alive = {r.vec_id for r in surviving.select("vec_id").collect()}
    assert all(r.vec_id in alive for r in out)


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def test_language_id_rules(spark):
    rows = spark.createDataFrame(
        [
            ("the cat is in the house and that is fine", "en"),
            ("der hund ist mit der katze auf ein boot", "de"),
            ("le chat est dans la maison et les chiens", "fr"),
            ("el perro y el gato es una familia para en casa", "es"),
            ("这是一个完全中文的句子没有任何空格", "zh"),
            ("zzz qqq xxx", "und"),
        ],
        "text string, expect string",
    ).select(language_id(F.col("text")).alias("got"), "expect")
    assert all(r.got == r.expect for r in rows.collect())


def test_fingerprint_stable_under_small_edit_distinct_for_different(spark):
    a = (
        "winnowing selects the minimum hash in each sliding window so that "
        "documents sharing long runs of text share fingerprint minima even "
        "when unrelated regions differ substantially between the copies"
    )
    b = a.replace("substantially", "substantiallg")  # 1-char edit
    c = "short unrelated text with nothing shared"
    df = spark.createDataFrame([(0, a), (1, b), (2, c)], "i long, t string")
    fp = {
        r.i: r.fp
        for r in df.select("i", doc_fingerprint(F.col("t")).alias("fp")).collect()
    }
    assert fp[0] != fp[2]
    # 1-char edit changes ≤ a few window minima; winnowing hashes the set,
    # so equality is not guaranteed — but the shingle sets must overlap
    # heavily. Assert the designed robustness at the minima level instead:
    sh = df.select(
        "i",
        F.transform(char_shingles(F.col("t"), 7), lambda s: F.xxhash64(s)).alias("h"),
    )
    mins = {r.i: set(r.h) for r in sh.collect()}
    inter = len(mins[0] & mins[1]) / len(mins[0] | mins[1])
    assert inter > 0.8


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


def test_media_feature_extraction_shapes(spark):
    df = spark.createDataFrame(
        [(1, b"abc"), (2, b"defgh"), (3, None)], "media_id long, blob binary"
    )
    media = media_from_binary(df, "media_id", "blob", kind="image", mime="img/x")
    feats = extract_features(media, decode="fake").collect()
    by_id = {r.media_id: r for r in feats}
    assert by_id[1].n_bytes == 3 and by_id[2].n_bytes == 5 and by_id[3].n_bytes == 0
    assert all(len(r.feature) == 8 for r in feats)
    assert all(0.0 <= x < 1.0 for r in feats for x in r.feature)
    # deterministic: same bytes → same features
    again = {r.media_id: r.feature for r in extract_features(media, decode="fake").collect()}
    assert again == {r.media_id: r.feature for r in feats}


_HAS_PIL = importlib.util.find_spec("PIL") is not None


@pytest.mark.skipif(_HAS_PIL, reason="Pillow present: real decode active")
def test_media_real_decode_contract_without_pillow(spark):
    """No Pillow ⇒ decode='real' raises NotImplementedError naming the
    dependency, and decode='auto' falls back to the stdlib HEADER
    kernel — non-container bytes degrade to zeros per-row (the fake
    sha stub stays exclusive to decode='fake')."""
    df = spark.createDataFrame([(1, b"x")], "media_id long, blob binary")
    media = media_from_binary(df, "media_id", "blob", kind="image", mime="img/x")
    with pytest.raises(NotImplementedError, match="Pillow"):
        extract_features(media, decode="real")
    auto = {r.media_id: r.feature for r in extract_features(media, decode="auto").collect()}
    assert auto == {1: [0.0] * 8}


@pytest.mark.skipif(not _HAS_PIL, reason="Pillow not installed")
def test_media_real_decode_with_pillow(spark):
    """Pillow present ⇒ the real kernels decode an actual PNG: features
    carry true dimensions, resize re-encodes at the target size, and a
    corrupt blob degrades per-row instead of failing the batch."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (10, 4), color=(255, 0, 0)).save(buf, format="PNG")
    png = buf.getvalue()
    df = spark.createDataFrame(
        [(1, png), (2, b"not-an-image")], "media_id long, blob binary"
    )
    media = media_from_binary(df, "media_id", "blob", kind="image", mime="image/jpeg")
    feats = {r.media_id: r.feature for r in extract_features(media, decode="real").collect()}
    assert feats[1][:3] == [10.0, 4.0, 3.0]  # width, height, channels
    assert feats[2] == [0.0] * 8  # corrupt blob → zero vector, no crash
    out = {r.media_id: r for r in resize_images(media, 6, 5, decode="real").collect()}
    resized = Image.open(io.BytesIO(out[1].content))
    assert resized.size == (6, 5)
    # re-encoded rows are PNG and must SAY so; pass-through rows keep
    # their original bytes AND original metadata (ADVICE r4)
    assert out[1].meta.mime == "image/png"
    assert (out[1].meta.width, out[1].meta.height) == (6, 5)
    assert out[2].content == b"not-an-image"  # undecodable passes through
    assert out[2].meta.mime == "image/jpeg"
    assert out[2].meta.width is None


def test_resize_images_retags_meta_and_passes_nonimages(spark):
    df = spark.createDataFrame(
        [(1, b"image-bytes"), (2, None)], "media_id long, blob binary"
    )
    img = media_from_binary(df, "media_id", "blob", kind="image", mime="image/png")
    aud = media_from_binary(
        spark.createDataFrame([(3, b"pcm")], "media_id long, blob binary"),
        "media_id",
        "blob",
        kind="audio",
        mime="audio/wav",
    )
    out = {r.media_id: r for r in resize_images(img.union(aud), 64, 64).collect()}
    assert len(out[1].content) == 64 * 64 // 64
    assert (out[1].meta.width, out[1].meta.height) == (64, 64)
    assert out[2].content is None  # null blob stays null
    assert out[3].content == b"pcm"  # non-image passes through untouched
    assert out[3].meta.width is None
    # deterministic: same bytes → same fake thumbnail
    again = {r.media_id: r for r in resize_images(img, 64, 64).collect()}
    assert again[1].content == out[1].content
    if not _HAS_PIL:
        with pytest.raises(NotImplementedError, match="Pillow"):
            resize_images(img, 64, 64, decode="real")


def test_decode_selection_seam_both_ways(monkeypatch):
    """The auto/real/fake selection logic, pinned WITHOUT needing
    Pillow either way (monkeypatched availability — VERDICT r4
    next-round #7): auto degrades to fake exactly when Pillow is
    absent, real fails loudly naming the dependency, fake never
    consults the import."""
    from gpssbzd_spark.dataprep import multimodal as mm

    monkeypatch.setattr(mm, "_pil_available", lambda: True)
    assert mm._resolve_decode("auto", "t") == "real"
    assert mm._resolve_decode("real", "t") == "real"
    assert mm._resolve_decode("fake", "t") == "fake"

    monkeypatch.setattr(mm, "_pil_available", lambda: False)
    assert mm._resolve_decode("auto", "t") == "fake"
    assert mm._resolve_decode("fake", "t") == "fake"
    with pytest.raises(NotImplementedError, match="Pillow"):
        mm._resolve_decode("real", "t")


def test_sample_frames_explodes_video_only(spark):
    meta_t = (
        "struct<kind:string,mime:string,width:int,height:int,duration_ms:long>"
    )
    media = spark.createDataFrame(
        [
            Row(media_id=1, content=b"v", meta=Row(kind="video", mime="v/mp4",
                width=None, height=None, duration_ms=3500)),
            Row(media_id=2, content=b"a", meta=Row(kind="audio", mime="a/wav",
                width=None, height=None, duration_ms=9000)),
            Row(media_id=3, content=b"v", meta=Row(kind="video", mime="v/mp4",
                width=None, height=None, duration_ms=None)),
        ],
        f"media_id long, content binary, meta {meta_t}",
    )
    frames = sample_frames(media, every_ms=1000, max_frames=16).collect()
    assert {(r.media_id, r.frame_ms) for r in frames} == {
        (1, 0), (1, 1000), (1, 2000), (1, 3000)
    }


def test_simhash_banding_excludes_tokenless_docs(spark):
    """1 000 empty/whitespace docs all simhash to 0 — before the guard
    they would put 1 000 rows in the same (block, 0) bucket on every
    band and the candidate join degenerated to O(N²) content-free
    matches. The guard filters them before banding: output pairs never
    touch a token-less doc, and real near-dups are still found."""
    rows = [(i, "   " if i % 2 else "") for i in range(1000)]
    rows += [
        (2001, "the quick brown fox jumps over the lazy dog"),
        (2002, "the quick brown fox jumps over the lazy cat"),
        (2003, "completely unrelated text about spark query engines"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = simhash_near_pairs(d, max_hamming=10, bands=16).collect()
    ids = {i for r in pairs for i in (r.id_a, r.id_b)}
    assert all(i >= 2001 for i in ids), f"empty docs leaked into pairs: {ids}"
    assert (2001, 2002) in {(r.id_a, r.id_b) for r in pairs}


def test_png_decoder_full_filter_set_and_color_types():
    """The stdlib PNG decoder must invert every scanline filter (0
    None, 1 Sub, 2 Up, 3 Average, 4 Paeth) and the 8-bit color types
    0/2/4/6 exactly — real-world encoders emit all of them. Encode a
    random image with a different filter per row by applying the spec
    forward, decode, compare byte-for-byte."""
    import struct
    import zlib

    import numpy as np

    from gpssbzd_spark.dataprep.multimodal import (
        _decode_png_pixels,
        _png_chunk,
    )

    rng = np.random.default_rng(7)

    def encode(img, filters):
        h, w, c = img.shape
        stride = w * c
        flat = img.reshape(h, stride).astype(int)
        out = bytearray()
        prior = np.zeros(stride, dtype=int)
        for y in range(h):
            cur, filt = flat[y], filters[y % len(filters)]
            out.append(filt)
            for i in range(stride):
                a = cur[i - c] if i >= c else 0
                b = prior[i]
                cc = prior[i - c] if i >= c else 0
                if filt == 0:
                    v = cur[i]
                elif filt == 1:
                    v = (cur[i] - a) % 256
                elif filt == 2:
                    v = (cur[i] - b) % 256
                elif filt == 3:
                    v = (cur[i] - (a + b) // 2) % 256
                else:
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
                    v = (cur[i] - pred) % 256
                out.append(v)
            prior = cur
        ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
        ihdr = _png_chunk(
            b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        )
        idat = _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        return b"\x89PNG\r\n\x1a\n" + ihdr + idat + _png_chunk(b"IEND", b"")

    for channels in (1, 2, 3, 4):
        img = rng.integers(0, 256, size=(6, 5, channels), dtype=np.uint8)
        dec = _decode_png_pixels(encode(img, [0, 1, 2, 3, 4]))
        assert dec is not None and (dec == img).all(), channels
    assert _decode_png_pixels(b"not a png") is None


def test_png_video_roundtrip_kernel_exact():
    """synth_png_video_bytes → sample-table walk → per-frame PNG
    decode → integer-moment stats must reproduce the arithmetic
    prediction EXACTLY (the cross-engine contract behind
    mm_video_pixel_roundtrip), and metadata-only MP4s must keep
    degrading to zero pixel stats."""
    import math

    from gpssbzd_spark.dataprep.multimodal import (
        _decode_video_frames,
        _parse_mp4_meta,
        _parse_mp4_video_samples,
        _real_video_features,
        synth_mp4_bytes,
        synth_png_video_bytes,
    )

    for mid in (0, 3, 17, 254, 9999):
        blob = synth_png_video_bytes(mid)
        n_f = mid % 6 + 2
        w, h = (mid % 8 + 1) * 8, (mid % 5 + 1) * 8
        assert _parse_mp4_meta(blob) == {
            "duration_ms": n_f * 40, "timescale": 1000,
            "width": w, "height": h, "n_frames": n_f,
        }
        fourcc, samples = _parse_mp4_video_samples(blob)
        assert fourcc == "png " and len(samples) == n_f
        frames = _decode_video_frames(blob)
        assert len(frames) == n_f and frames[0].shape == (h, w, 3)
        for f, fr in enumerate(frames):
            exp = [(mid + 3 * f) % 256, (mid * 7 + 5 * f) % 256,
                   (mid * 13 + 11 * f) % 256]
            assert (fr.reshape(-1, 3) == exp).all(), (mid, f)
        feats = _real_video_features(blob)
        s1 = w * h * sum(
            (mid + 3 * f) % 256 + (mid * 7 + 5 * f) % 256
            + (mid * 13 + 11 * f) % 256 for f in range(n_f))
        s2 = w * h * sum(
            ((mid + 3 * f) % 256) ** 2 + ((mid * 7 + 5 * f) % 256) ** 2
            + ((mid * 13 + 11 * f) % 256) ** 2 for f in range(n_f))
        n = w * h * 3 * n_f
        mu = s1 / n
        assert feats[6] == mu
        assert feats[7] == math.sqrt(max(0.0, s2 / n - mu * mu))
    # metadata-only container: parseable moov, no sample table
    f = _real_video_features(synth_mp4_bytes(11))
    assert f[6] == 0.0 and f[7] == 0.0
    assert _parse_mp4_video_samples(synth_mp4_bytes(11)) is None


def test_extract_frames_emits_raw_png_samples(spark):
    """extract_frames slices the container's PNG samples out verbatim
    (byte-identical to the encoder's), strides to max_frames, stamps
    idx·duration/n timestamps, and emits nothing for non-video rows or
    metadata-only containers (per-row degradation)."""
    from pyspark.sql import functions as F

    from gpssbzd_spark.dataprep.multimodal import (
        _parse_mp4_video_samples,
        extract_frames,
        synth_media,
        synth_png_video,
        synth_png_video_bytes,
    )

    ids = spark.range(0, 12).select(F.col("id").alias("media_id"))
    rows = extract_frames(synth_png_video(ids), max_frames=8).collect()
    by_media: dict[int, list] = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    for mid in range(12):
        n_f = mid % 6 + 2
        got = sorted(by_media[mid], key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in got] == list(range(n_f))
        assert [r.frame_ms for r in got] == [i * 40 for i in range(n_f)]
        _, samples = _parse_mp4_video_samples(synth_png_video_bytes(mid))
        assert [bytes(r.content) for r in got] == samples
    # stride: a 6-frame video at max_frames=3 takes every 2nd frame
    strided = extract_frames(
        synth_png_video(ids.filter(F.col("media_id") == 4)), max_frames=3
    ).collect()
    assert sorted(r.frame_idx for r in strided) == [0, 2, 4]
    # degradation: synth_media's videos are metadata-only; images and
    # audio are not videos — no frames from any of them
    assert extract_frames(synth_media(ids)).count() == 0


def test_decode_video_frames_equals_extract_frames_composition(spark):
    """VERDICT r8 #8: the two PNG-codec pixel paths — the driver-side
    `_decode_video_frames` kernel and the distributed `extract_frames`
    → `_decode_png_pixels` composition — share the sample table but
    not the stride/decode code; assert frame-for-frame array equality
    across max_frames settings so the stride arithmetic can never
    silently diverge between them."""
    from pyspark.sql import functions as F

    from gpssbzd_spark.dataprep.multimodal import (
        _decode_png_pixels,
        _decode_video_frames,
        extract_frames,
        synth_png_video,
        synth_png_video_bytes,
    )

    ids = spark.range(0, 10).select(F.col("id").alias("media_id"))
    for max_frames in (8, 3, 1):
        rows = extract_frames(synth_png_video(ids), max_frames=max_frames)
        by_media: dict[int, list] = {}
        for r in rows.collect():
            by_media.setdefault(r.media_id, []).append(r)
        for mid in range(10):
            kernel = _decode_video_frames(
                synth_png_video_bytes(mid), max_frames=max_frames
            )
            got = sorted(by_media[mid], key=lambda r: r.frame_idx)
            assert len(kernel) == len(got), (mid, max_frames)
            for arr, row in zip(kernel, got):
                composed = _decode_png_pixels(bytes(row.content))
                assert composed is not None
                assert arr.shape == composed[:, :, :3].shape
                assert (arr == composed[:, :, :3]).all(), (
                    mid, max_frames, row.frame_idx,
                )


def test_png_codec_video_gray_alpha_normalizes_to_rgb():
    """ADVICE r8: a gray+alpha (PNG color type 4) sample must come out
    of `_decode_video_frames` as the (h, w, 3) RGB contract frame —
    luma replicated across the three channels, alpha dropped — not as
    a 2-channel array; same for pure grayscale (type 0)."""
    import zlib

    import numpy as np

    from gpssbzd_spark.dataprep.multimodal import (
        _decode_video_frames,
        _png_chunk,
        _png_video_from_frames,
    )

    def png(w, h, ctype, px_bytes_per_row):
        import struct as _s

        ihdr = _png_chunk(
            b"IHDR", _s.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        )
        idat = _png_chunk(
            b"IDAT", zlib.compress((b"\x00" + px_bytes_per_row) * h)
        )
        return b"\x89PNG\r\n\x1a\n" + ihdr + idat + _png_chunk(b"IEND", b"")

    w, h = 6, 4
    gray_alpha = png(w, h, 4, bytes([200, 128]) * w)  # luma 200, alpha 128
    gray = png(w, h, 0, bytes([77]) * w)
    blob = _png_video_from_frames([gray_alpha, gray], w, h)
    frames = _decode_video_frames(blob)
    assert [f.shape for f in frames] == [(h, w, 3), (h, w, 3)]
    assert (frames[0] == np.full((h, w, 3), 200, dtype=np.uint8)).all()
    assert (frames[1] == np.full((h, w, 3), 77, dtype=np.uint8)).all()


def test_header_image_features_png_pixels_are_real():
    """Without Pillow, PNG mean/std must still be REAL (stdlib decode
    + Pillow's exact integer luma): a solid-color synth PNG's mean is
    luma(r,g,b)/255 and its std is 0."""
    from gpssbzd_spark.dataprep.multimodal import (
        _header_image_features,
        synth_png_bytes,
    )

    for mid in (0, 5, 42, 1001):
        r, g, b = (mid % 256), (mid * 7 % 256), (mid * 13 % 256)
        luma = (19595 * r + 38470 * g + 7471 * b + 0x8000) >> 16
        feats = _header_image_features(synth_png_bytes(mid))
        # np.mean's pairwise summation can drift a last ulp from the
        # analytic value; the cross-env contract is that Pillow and
        # stdlib environments run the SAME np ops on the SAME array
        assert abs(feats[3] - luma / 255.0) < 1e-12, mid
        assert feats[4] < 1e-9, mid


def test_simhash_defaults_use_minimal_pigeonhole_cover():
    """The banding band count must stay at the MINIMUM the pigeonhole
    cover allows for the default max_hamming: spurious candidates grow
    as bands * n^2 / 2^(64/bands), so every band beyond the cover
    multiplies a quadratic term. bands=8 (8-bit band space) measured
    441 s at the K=64 inflation vs a ~linear curve at bands=4 — the
    fixed-band-space knee only appears past the K=16 octave the gate
    test can afford to run."""
    import inspect

    from gpssbzd_spark.dataprep.dedup import (
        simhash_near_pairs,
        simhash_portable,
        simhash_portable_sql,
    )

    for fn in (simhash_near_pairs, simhash_portable, simhash_portable_sql):
        p = inspect.signature(fn).parameters
        bands, max_hamming = p["bands"].default, p["max_hamming"].default
        assert bands > max_hamming, fn.__name__  # cover holds at all
        # minimal even divisor of 64 that still covers max_hamming
        minimal = next(
            b
            for b in (2, 4, 8, 16, 32)
            if b > max_hamming and 64 % b == 0
        )
        assert bands == minimal, (fn.__name__, bands, minimal)


def test_simhash_portable_128_bits(spark):
    """VERDICT r8 #5: the 128-bit variant — (a) guaranteed recall:
    exact-dup twins fingerprint identically in all four lanes, so
    every seeded pair comes out at hamming 0; (b) the band space
    actually grows: bands=4 at 128 bits slices 32-bit band values
    (~4.3e9-way), vs 16-bit at 64 bits — the 1e9+-doc band-saturation
    mitigation; (c) precision: every emitted pair's recomputed
    128-bit hamming clears the threshold (verify is exact by
    construction, checked here through an independent collect)."""
    from gpssbzd_spark.dataprep.dedup import (
        _simhash_lane_params,
        simhash_portable,
    )

    n_lanes, bands_per_lane, bits_per_band = _simhash_lane_params(
        128, 4, 3
    )
    assert (n_lanes, bands_per_lane, bits_per_band) == (4, 1, 32)

    d = load_table(spark, SF, "documents").select("doc_id", "text")
    seeded = d.unionByName(
        d.filter(F.col("doc_id") % 10 == 0).withColumn(
            "doc_id", F.col("doc_id") + 1000000
        )
    )
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_portable(seeded, bits=128).collect()
    }
    twins = [
        (r.doc_id, r.doc_id + 1000000)
        for r in d.filter(F.col("doc_id") % 10 == 0).collect()
    ]
    assert twins
    for pair in twins:
        assert got.get(pair) == 0, pair
    assert all(h <= 3 for h in got.values())


def test_token_budget_cap_properties(spark):
    """token_budget_cap: (a) every kept group's token total fits the
    budget; (b) a smaller budget keeps a PREFIX of a larger budget's
    selection (monotonicity — shrinking quotas never churns
    survivors); (c) under-budget groups pass through whole; (d) the
    selection is repartition-invariant (pure function of id+salt)."""
    from gpssbzd_spark.dataprep.splits import token_budget_cap

    d = (
        load_table(spark, SF, "documents")
        .select(
            "doc_id",
            "source",
            F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias(
                "n_tokens"
            ),
        )
    )
    big = token_budget_cap(d, ["source"], "doc_id", "n_tokens", 600)
    small = token_budget_cap(d, ["source"], "doc_id", "n_tokens", 300)
    tot = {
        r.source: r.s
        for r in big.groupBy("source").agg(F.sum("n_tokens").alias("s")).collect()
    }
    assert tot and all(v <= 600 for v in tot.values())
    big_ids = {r.doc_id for r in big.select("doc_id").collect()}
    small_ids = {r.doc_id for r in small.select("doc_id").collect()}
    assert small_ids and small_ids < big_ids  # strict: 300 binds harder
    # under-budget groups pass whole (budget above any source's total)
    huge = token_budget_cap(d, ["source"], "doc_id", "n_tokens", 10**9)
    assert huge.count() == d.count()
    # repartition invariance
    rep = token_budget_cap(
        d.repartition(7, "doc_id"), ["source"], "doc_id", "n_tokens", 600
    )
    assert {r.doc_id for r in rep.select("doc_id").collect()} == big_ids


def test_decontaminate_semantic_drops_only_true_neighbors(spark):
    """decontaminate_semantic: every DROPPED train vector has an eval
    vector within the threshold by EXACT quantized cosine (precision
    1.0 — the verify stage is exact), and at least one vector drops on
    the fixture split (non-vacuous)."""
    from gpssbzd_spark.dataprep.decontam import decontaminate_semantic

    em = load_table(spark, SF, "embeddings")
    eval_df = em.filter(F.col("vec_id") % 17 == 0)
    train = em.filter(F.col("vec_id") % 17 != 0)
    kept = {
        r.vec_id
        for r in decontaminate_semantic(train, eval_df)
        .select("vec_id")
        .collect()
    }
    train_ids = {r.vec_id for r in train.select("vec_id").collect()}
    dropped = train_ids - kept
    assert dropped, "fixture split should contaminate at least one vector"
    # exact quantized-cosine check on the dropped set (small by design)
    import numpy as np

    vecs = {
        r.vec_id: np.round(np.array(r.embedding, dtype=np.float64) * 1000)
        for r in em.collect()
    }
    eval_ids = [i for i in vecs if i % 17 == 0]
    for d_id in dropped:
        q = vecs[d_id]
        best = max(
            float(q @ vecs[e] / (np.linalg.norm(q) * np.linalg.norm(vecs[e])))
            for e in eval_ids
        )
        assert best >= 0.4, (d_id, best)


def test_minhash_signers_agree_with_python_reference(spark):
    """Three independent implementations of the portable signature —
    the exploded batch signer, the row-local streaming signer
    (array_min over per-permutation transforms), and a pure-Python md5
    reference — must produce byte-identical signatures on a corpus
    covering unicode, repeated tokens, whitespace runs, punctuation,
    and minimum-length docs. Guards the exact bug class found while
    building the row-local signer: pyspark dispatches higher-order
    lambdas on ARITY, so a carelessly-bound loop variable silently
    turns the permutation constant into the array index."""
    import hashlib

    from gpssbzd_spark.dataprep.dedup import (
        minhash_signatures_portable,
        minhash_signatures_rowlocal,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the the the the the repeated token document here",
        "  leading   and  trailing   whitespace   runs  ",
        "exactly three word", "ünïcodé tökens ärë fïne everywhere",
        "punct, heavy! doc? with; colons: and (parens) too yes",
        "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )

    def py_reference(text):
        toks = [t for t in text.lower().strip().split() if t]
        if len(toks) < 3:
            return None
        shingles = sorted({" ".join(toks[i:i + 3])
                           for i in range(len(toks) - 2)})
        return tuple(
            min(
                hashlib.md5(f"mh{i}|{s}".encode()).hexdigest()[:8]
                for s in shingles
            )
            for i in range(8)
        )

    expect = {
        i: py_reference(t)
        for i, t in enumerate(texts)
        if py_reference(t) is not None
    }
    batch = {
        r.doc_id: tuple(r[f"h{i}"] for i in range(8))
        for r in minhash_signatures_portable(df).collect()
    }
    rowlocal = {
        r.doc_id: tuple(r[f"h{i}"] for i in range(8))
        for r in minhash_signatures_rowlocal(df)
        .select("doc_id", *[f"h{i}" for i in range(8)])
        .collect()
    }
    assert batch == expect
    assert rowlocal == expect


def test_incremental_neardup_index_contract(spark):
    """Incremental dedup against a persisted signature index: (a) a
    delta that contains EXACT copies of indexed docs matches every
    copy to its original with full agreement (8/8 — identical shingle
    sets give identical mins in every permutation); (b) the signature
    index round-trips parquet byte-exactly, so matching against the
    RE-READ index equals matching against the in-memory one; (c) the
    agreement estimate tracks exact Jaccard: every reported match's
    true shingle Jaccard clears a loose floor (estimator unbiasedness,
    loose to stay flake-free at num_hashes=8)."""
    import os
    import tempfile

    from gpssbzd_spark.dataprep.dedup import (
        _portable_shingles,
        incremental_neardup_matches,
        minhash_signatures_portable,
    )

    d = load_table(spark, SF, "documents").select("doc_id", "text")
    hist = d.filter(F.col("doc_id") % 3 != 0)
    copies = (
        hist.filter(F.col("doc_id") % 10 == 1)
        .withColumn("doc_id", F.col("doc_id") + 1000000)
    )
    index_sigs = minhash_signatures_portable(hist)
    delta_sigs = minhash_signatures_portable(copies)

    with tempfile.TemporaryDirectory() as tmp:
        p = os.path.join(tmp, "sig_index")
        index_sigs.write.parquet(p)
        reread = spark.read.parquet(p)
        got = {
            (r.delta_id, r.index_id): r.n_agree
            for r in incremental_neardup_matches(delta_sigs, reread).collect()
        }
    twins = [r.doc_id for r in hist.filter(F.col("doc_id") % 10 == 1).collect()]
    assert twins
    for t in twins:
        assert got.get((t + 1000000, t)) == 8, t
    mem = {
        (r.delta_id, r.index_id): r.n_agree
        for r in incremental_neardup_matches(delta_sigs, index_sigs).collect()
    }
    assert got == mem  # parquet round-trip changes nothing

    # estimator quality on the organic delta split
    delta = d.filter(F.col("doc_id") % 3 == 0)
    matches = incremental_neardup_matches(
        minhash_signatures_portable(delta), index_sigs
    ).collect()
    if matches:
        sh = {
            r.doc_id: set(r.sh)
            for r in d.select(
                "doc_id", _portable_shingles(F.col("text"), 3).alias("sh")
            ).collect()
        }
        for m in matches:
            a, b = sh[m.delta_id], sh[m.index_id]
            jac = len(a & b) / len(a | b)
            assert jac >= 0.35, (m.delta_id, m.index_id, m.n_agree, jac)


def test_ivf_seed_sample_filters_below_take_ordered(spark):
    """The k-means seed scan must hash-filter BELOW the TakeOrdered so
    seeding a 100 TB corpus moves ~64·n_centroids rows, not the corpus;
    and the sampled seeds must still fill the codebook."""
    from gpssbzd_spark.dataprep.similarity import _seed_sample

    em = load_table(spark, SF, "embeddings")
    n = em.count()
    k = max(1, n // 128)  # force p = n // (64·k) ≈ 2 > 1 at any sf
    df = _seed_sample(em, k, seed=42, id_col="vec_id", vec_col="embedding")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "pmod" in plan and "Filter" in plan, plan
    # the filter is below (after, in print order) the TakeOrdered node
    assert plan.index("TakeOrderedAndProject") < plan.index("pmod"), plan
    assert len(df.collect()) == k


def test_media_real_audio_decode_stdlib(spark):
    """The audio real path needs NO native deps (stdlib wave + numpy),
    so unlike the Pillow image path it runs in this container: under
    decode='auto' audio rows get true WAV features (duration, channels,
    rate, width, normalized RMS/peak) while a corrupt blob degrades
    per-row to zeros; image rows in the same batch keep the fake
    kernel when Pillow is absent (per-kind dispatch)."""
    import io as _io
    import wave as _wave

    import numpy as _np

    def wav(nch, rate, samples):
        buf = _io.BytesIO()
        w = _wave.open(buf, "wb")
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(_np.asarray(samples, dtype=_np.int16).tobytes())
        w.close()
        return buf.getvalue()

    # 8000 frames at 8 kHz mono => exactly 1000 ms; constant amplitude
    # 16384 => rms == peak == 0.5 exactly (power of two: no float fuzz)
    a1 = wav(1, 8000, [16384] * 8000)
    audio = spark.createDataFrame(
        [(1, a1), (2, b"not-a-wav")], "media_id long, blob binary"
    )
    media = media_from_binary(audio, "media_id", "blob", kind="audio", mime="audio/wav")
    feats = {
        r.media_id: r.feature
        for r in extract_features(media, decode="auto").collect()
    }
    assert feats[1][:4] == [1000.0, 1.0, 8000.0, 2.0]
    assert feats[1][4] == pytest.approx(0.5) and feats[1][5] == pytest.approx(0.5)
    assert feats[2] == [0.0] * 8  # corrupt blob → zeros, no crash

    # mixed batch: image rows still dispatch to their own kernel
    img = media_from_binary(
        spark.createDataFrame([(3, b"img-bytes")], "media_id long, blob binary"),
        "media_id", "blob", kind="image", mime="image/png",
    )
    mixed = {
        r.media_id: r.feature
        for r in extract_features(media.union(img), decode="auto").collect()
    }
    assert mixed[1] == feats[1]
    if not _HAS_PIL:
        # without Pillow, auto image rows run the HEADER kernel:
        # unrecognized bytes degrade to zeros (not the fake sha stub)
        assert mixed[3] == [0.0] * 8


def _mp4_fixture(
    timescale=1000, duration=5000, width=640, height=360, n_frames=120,
    mvhd_ver=0,
):
    """Minimal valid MP4: ftyp + moov(mvhd, trak(tkhd, mdia/minf/stbl/
    stsz)) built by hand — byte-level ground truth for the stdlib
    parser, independent of any codec library."""
    import struct as _s

    def box(t, payload):
        return _s.pack(">I", 8 + len(payload)) + t + payload

    if mvhd_ver == 1:
        mvhd = bytes([1, 0, 0, 0]) + b"\x00" * 16 + _s.pack(
            ">IQ", timescale, duration
        )
    else:
        mvhd = bytes(4) + b"\x00" * 8 + _s.pack(">II", timescale, duration)
    tkhd = (
        bytes(4) + b"\x00" * 20 + b"\x00" * 16 + b"\x00" * 36
        + _s.pack(">II", width << 16, height << 16)
    )
    stsz = bytes(4) + _s.pack(">II", 0, n_frames)
    trak = box(b"tkhd", tkhd) + box(
        b"mdia", box(b"minf", box(b"stbl", box(b"stsz", stsz)))
    )
    moov = box(b"mvhd", mvhd) + box(b"trak", trak)
    return (
        box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
        + box(b"moov", moov)
        + box(b"mdat", b"\x00" * 32)
    )


def test_media_image_header_metadata_stdlib(spark):
    """Without Pillow, decode='auto' image rows still report REAL
    dims+channels from container headers (PNG IHDR / JPEG SOF / GIF
    descriptor — pure stdlib, no pixel decode); unrecognized bytes
    degrade per-row to zeros."""
    import struct as _s
    import zlib as _z

    from gpssbzd_spark.dataprep.multimodal import _parse_image_meta

    def png(w, h, color_type=6):
        ihdr = _s.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        chunk = _s.pack(">I", len(ihdr)) + b"IHDR" + ihdr
        chunk += _s.pack(">I", _z.crc32(b"IHDR" + ihdr))
        return b"\x89PNG\r\n\x1a\n" + chunk

    def jpeg(w, h, nf=3):
        sof = _s.pack(">BHH", 8, h, w) + bytes([nf]) + b"\x00" * (3 * nf)
        return (
            b"\xff\xd8"
            + b"\xff\xe0" + _s.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
            + b"\xff\xc0" + _s.pack(">H", 2 + len(sof)) + sof
        )

    gif = b"GIF89a" + _s.pack("<HH", 320, 200) + b"\x00" * 6

    assert _parse_image_meta(png(640, 480)) == {
        "width": 640, "height": 480, "channels": 4,
    }
    assert _parse_image_meta(jpeg(800, 600)) == {
        "width": 800, "height": 600, "channels": 3,
    }
    assert _parse_image_meta(gif) == {
        "width": 320, "height": 200, "channels": 3,
    }
    assert _parse_image_meta(b"not an image at all") is None

    rows = [(1, png(640, 480)), (2, jpeg(800, 600)), (3, gif), (4, b"junk" * 5)]
    media = media_from_binary(
        spark.createDataFrame(rows, "media_id long, blob binary"),
        "media_id", "blob", kind="image", mime="image/png",
    )
    feats = {
        r.media_id: r.feature
        for r in extract_features(media, decode="auto").collect()
    }
    if not _HAS_PIL:
        # header kernel: (w, h, channels, 0, 0, aspect)
        assert feats[1][:3] == [640.0, 480.0, 4.0]
        assert feats[2][:3] == [800.0, 600.0, 3.0]
        assert feats[3][:3] == [320.0, 200.0, 3.0]
        assert feats[4] == [0.0] * 8
    else:
        # Pillow present: full decode path owns images; dims must agree
        assert feats[1][:2] == [640.0, 480.0]


def test_media_real_video_metadata_stdlib(spark):
    """VERDICT r5 #6: video METADATA decode is real via a pure-stdlib
    MP4/moov box parse — duration/dims/frame-count/fps from a
    parseable container, per-row zero degradation for corrupt blobs
    (same contract as audio/image), fake kernel under decode='fake',
    and probe_video_meta feeds REAL durations into sample_frames."""
    from gpssbzd_spark.dataprep.multimodal import (
        _parse_mp4_meta,
        probe_video_meta,
        sample_frames,
    )

    good = _mp4_fixture()
    good_v1 = _mp4_fixture(
        timescale=600, duration=1200, width=320, height=240, n_frames=48,
        mvhd_ver=1,
    )
    # unit: the parser itself, both mvhd versions
    m = _parse_mp4_meta(good)
    assert m == {
        "duration_ms": 5000, "timescale": 1000,
        "width": 640, "height": 360, "n_frames": 120,
    }
    assert _parse_mp4_meta(good_v1)["duration_ms"] == 2000
    assert _parse_mp4_meta(b"not-an-mp4") is None
    assert _parse_mp4_meta(good[:40]) is None  # truncated moov

    vids = spark.createDataFrame(
        [(1, good), (2, b"corrupt-video-blob"), (3, good_v1)],
        "media_id long, blob binary",
    )
    media = media_from_binary(vids, "media_id", "blob", kind="video", mime="video/mp4")

    feats = {
        r.media_id: r.feature
        for r in extract_features(media, decode="auto").collect()
    }
    # (duration_ms, width, height, n_frames, fps, timescale)
    assert feats[1][:6] == [5000.0, 640.0, 360.0, 120.0, 24.0, 1000.0]
    assert feats[3][:4] == [2000.0, 320.0, 240.0, 48.0]
    assert feats[2] == [0.0] * 8  # corrupt → zeros, no crash

    # decode='fake' keeps the deterministic stub (distinct from real)
    fake = {
        r.media_id: r.feature
        for r in extract_features(media, decode="fake").collect()
    }
    assert fake[1] != feats[1]

    # probe fills meta from the container; sample_frames then uses the
    # REAL 5000 ms duration (6 frames at 1000 ms, capped at 16)
    probed = probe_video_meta(media)
    metas = {r.media_id: r.meta for r in probed.collect()}
    assert (metas[1].width, metas[1].height, metas[1].duration_ms) == (640, 360, 5000)
    assert metas[2].duration_ms is None  # unparseable: meta untouched
    frames = sample_frames(probed, every_ms=1000).collect()
    assert sorted(r.frame_ms for r in frames if r.media_id == 1) == [
        0, 1000, 2000, 3000, 4000, 5000,
    ]


def test_video_pixel_decode_import_guard(monkeypatch):
    """VERDICT r6 #6 — the video PIXEL path, one fixture per branch.

    (a) no backend (this container): _video_pixel_backend() is None,
        _decode_video_frames raises NotImplementedError naming both
        optional deps, and _real_video_features fills the pixel slots
        with 0 beside real metadata;
    (b) backend present: frame mean/std land in slots 6–7, computed
        over the decoded frames;
    (c) backend present but the payload breaks the decoder: per-row
        degradation to metadata-only — never a raised batch."""
    import numpy as np

    from gpssbzd_spark.dataprep import multimodal as mm

    good = _mp4_fixture()

    # (a) the container truth: no codec libs baked in
    monkeypatch.setattr(mm, "_VIDEO_BACKEND_CACHE", mm._UNRESOLVED)
    assert mm._video_pixel_backend() is None
    with pytest.raises(NotImplementedError) as ei:
        mm._decode_video_frames(good)
    assert "av" in str(ei.value) and "imageio-ffmpeg" in str(ei.value)
    feats = mm._real_video_features(good)
    assert feats[:6] == [5000.0, 640.0, 360.0, 120.0, 24.0, 1000.0]
    assert feats[6:] == [0.0, 0.0]

    # (b) a backend: two flat frames at 100 and 200 → mean 150, std 50
    monkeypatch.setattr(mm, "_VIDEO_BACKEND_CACHE", "av")
    monkeypatch.setattr(
        mm,
        "_decode_video_frames",
        lambda content, max_frames=8: [
            np.full((4, 4, 3), 100, dtype=np.uint8),
            np.full((4, 4, 3), 200, dtype=np.uint8),
        ],
    )
    feats = mm._real_video_features(good)
    assert feats[:6] == [5000.0, 640.0, 360.0, 120.0, 24.0, 1000.0]
    assert feats[6] == 150.0 and feats[7] == 50.0

    # (c) decoder failure on a parseable container: metadata survives
    def boom(content, max_frames=8):
        raise ValueError("codec choked")

    monkeypatch.setattr(mm, "_decode_video_frames", boom)
    feats = mm._real_video_features(good)
    assert feats[:6] == [5000.0, 640.0, 360.0, 120.0, 24.0, 1000.0]
    assert feats[6:] == [0.0, 0.0]
    # unparseable container still zeroes out entirely
    assert mm._real_video_features(b"corrupt") == [0.0] * 8


def test_bpe_token_count_matches_python_reference(spark):
    """bpe_token_count must equal a plain-Python re count of the same
    lookahead-free pretokenizer pattern (and differ from the whitespace
    count where punctuation splits off)."""
    import re as _re

    from gpssbzd_spark.dataprep.text import BPE_PRETOKEN_RE, bpe_token_count

    texts = [
        "Hello, world! 42 cats",     # 6 pretokens vs 4 ws words
        "  leading and trailing  ",
        "",
        "no-punct words only here",
        None,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.n
        for r in df.select(
            "doc_id", bpe_token_count(F.col("text")).alias("n")
        ).collect()
    }
    pat = _re.compile(BPE_PRETOKEN_RE)
    for i, t in enumerate(texts):
        want = None if t is None else len(pat.findall(t))
        assert got[i] == want, (t, got[i], want)
    assert got[0] == 6


def test_hash_split_deterministic_disjoint_weighted(spark):
    """hash_split's anti-leakage contract: same (id, salt) → same split
    across reruns AND partitionings; every row gets exactly one split;
    realized shares track the weights; a different salt reassigns."""
    from gpssbzd_spark.dataprep.splits import hash_split

    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r.doc_id: r.split for r in hash_split(df, "doc_id", w).collect()}
    b = {
        r.doc_id: r.split
        for r in hash_split(df.repartition(13), "doc_id", w).collect()
    }
    assert a == b  # stable under partitioning / rerun
    assert set(a.values()) == {"train", "val", "test"}
    n = len(a)
    for name, frac in w.items():
        share = sum(1 for s in a.values() if s == name) / n
        assert abs(share - frac) < 0.02, (name, share)
    c = {
        r.doc_id: r.split
        for r in hash_split(df, "doc_id", w, salt="other").collect()
    }
    assert c != a  # salt gives an independent assignment


def test_seeded_shuffle_uniform_deterministic_decorrelated(spark):
    """seeded_shuffle: stable under repartitioning; shard shares are
    near-uniform; the order key is unique and NOT correlated with the
    shard choice (a shard's members must not cluster in key space —
    independent salts); a different salt permutes differently."""
    from gpssbzd_spark.dataprep.splits import seeded_shuffle

    df = spark.range(0, 8000).withColumnRenamed("id", "doc_id")
    rows = seeded_shuffle(df, "doc_id", 8, salt="e0").collect()
    again = {
        r.doc_id: (r.shard, r.shuffle_key)
        for r in seeded_shuffle(df.repartition(13), "doc_id", 8, salt="e0").collect()
    }
    assert {r.doc_id: (r.shard, r.shuffle_key) for r in rows} == again

    n = len(rows)
    for s in range(8):
        share = sum(1 for r in rows if r.shard == s) / n
        assert abs(share - 1 / 8) < 0.02, (s, share)
    keys = [r.shuffle_key for r in rows]
    assert len(set(keys)) == n  # permutation, no collisions at 8k
    # decorrelation: within one shard, the order keys' first hex chars
    # span the whole space (same-prefix clustering would mean the shard
    # bucket leaked into the order key)
    first_chars = {r.shuffle_key[0] for r in rows if r.shard == 0}
    assert len(first_chars) == 16

    other = {
        r.doc_id: r.shuffle_key
        for r in seeded_shuffle(df, "doc_id", 8, salt="e1").collect()
    }
    assert other != {r.doc_id: r.shuffle_key for r in rows}


def test_unigram_logprob_separates_common_from_oov(spark):
    """unigram_logprob: docs made of corpus-frequent tokens outscore
    gibberish (OOV floor), token counts are exact, and zero-token docs
    are dropped."""
    from gpssbzd_spark.dataprep.text import unigram_logprob

    common = "the cat sat on the mat " * 20
    docs = spark.createDataFrame(
        [(1, common), (2, "the cat sat"), (3, "zqx jvw pqzzt"), (4, "   ")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in unigram_logprob(docs, vocab_size=8).collect()}
    assert set(out) == {1, 2, 3}  # whitespace-only doc dropped
    assert out[2].n_tokens == 3
    assert out[3].mean_logprob < out[2].mean_logprob  # OOV scores lower
    assert out[1].mean_logprob > out[3].mean_logprob


def test_deterministic_sample_stable_and_composable(spark):
    """deterministic_sample: stable under repartitioning, monotone in
    fraction with the SAME salt (a 0.2 sample is a subset of the 0.5
    sample — the property that lets a pipeline grow a mixture without
    reshuffling examples), near-independent across salts, and exact at
    the 0/1 edges."""
    from gpssbzd_spark.dataprep.splits import deterministic_sample

    df = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
    s50 = {r.doc_id for r in deterministic_sample(df, "doc_id", 0.5, "s").collect()}
    s20 = {r.doc_id for r in deterministic_sample(df, "doc_id", 0.2, "s").collect()}
    again = {
        r.doc_id
        for r in deterministic_sample(
            df.repartition(7), "doc_id", 0.5, "s"
        ).collect()
    }
    assert s50 == again
    assert s20 <= s50  # same salt → nested samples
    assert abs(len(s50) / 4000 - 0.5) < 0.03
    assert abs(len(s20) / 4000 - 0.2) < 0.03
    assert deterministic_sample(df, "doc_id", 0.0, "s").count() == 0
    assert deterministic_sample(df, "doc_id", 1.0, "s").count() == 4000
    other = {r.doc_id for r in deterministic_sample(df, "doc_id", 0.5, "t").collect()}
    overlap = len(s50 & other) / len(s50)
    assert 0.35 < overlap < 0.65  # independent salts ≈ fraction overlap


def test_cap_per_group_quota_determinism_and_nesting(spark):
    """cap_per_group: every group ends at min(cap, size); the surviving
    set is a pure function of (id, salt) — identical under
    repartitioning; a lower cap keeps a per-group SUBSET of a higher
    cap (prefix-of-ranking monotonicity); under-cap groups pass whole."""
    from gpssbzd_spark.dataprep.splits import cap_per_group

    rows = [(i, f"d{i % 7}") for i in range(700)] + [
        (1000 + i, "tiny") for i in range(3)
    ]
    df = spark.createDataFrame(rows, "doc_id long, grp string")

    c20 = {r.doc_id for r in cap_per_group(df, ["grp"], "doc_id", 20).collect()}
    from collections import Counter

    per = Counter(
        r.grp for r in cap_per_group(df, ["grp"], "doc_id", 20).collect()
    )
    assert all(v == 20 for g, v in per.items() if g != "tiny")
    assert per["tiny"] == 3  # under-cap group passes whole

    # deterministic under repartition
    c20b = {
        r.doc_id
        for r in cap_per_group(df.repartition(13), ["grp"], "doc_id", 20).collect()
    }
    assert c20 == c20b

    # nesting: cap 5 ⊂ cap 20
    c5 = {r.doc_id for r in cap_per_group(df, ["grp"], "doc_id", 5).collect()}
    assert c5 <= c20

    # a different salt picks a (mostly) different quota
    alt = {
        r.doc_id
        for r in cap_per_group(df, ["grp"], "doc_id", 20, salt="other").collect()
    }
    assert alt != c20


def test_stratified_sample_per_stratum_rates_and_nesting(spark):
    """stratified_sample: each stratum is sampled at ITS fraction (the
    bucket hash is shared, only the threshold varies), unknown strata
    fall back to default_fraction, raising one stratum's fraction only
    ADDS rows to that stratum (nested-sample monotonicity), and the
    assignment survives repartitioning."""
    from gpssbzd_spark.dataprep.splits import stratified_sample

    df = spark.createDataFrame(
        [(i, ["en", "zh", "de"][i % 3]) for i in range(6000)],
        "doc_id long, lang string",
    )
    fr = {"en": 0.2, "zh": 0.8}
    kept = stratified_sample(df, "doc_id", "lang", fr, default_fraction=0.0)
    by_lang: dict[str, set[int]] = {"en": set(), "zh": set(), "de": set()}
    for r in kept.collect():
        by_lang[r.lang].add(r.doc_id)
    assert abs(len(by_lang["en"]) / 2000 - 0.2) < 0.04
    assert abs(len(by_lang["zh"]) / 2000 - 0.8) < 0.04
    assert not by_lang["de"]  # default_fraction=0 drops unknown strata

    again = {
        (r.doc_id, r.lang)
        for r in stratified_sample(
            df.repartition(11), "doc_id", "lang", fr, default_fraction=0.0
        ).collect()
    }
    assert again == {
        (i, lang) for lang, ids in by_lang.items() for i in ids
    }

    # monotonicity: en 0.2 → 0.5 is a strict superset on en, identical
    # elsewhere; default_fraction=1.0 keeps every de row
    wider = stratified_sample(
        df, "doc_id", "lang", {"en": 0.5, "zh": 0.8}, default_fraction=1.0
    )
    wide_by: dict[str, set[int]] = {"en": set(), "zh": set(), "de": set()}
    for r in wider.collect():
        wide_by[r.lang].add(r.doc_id)
    assert by_lang["en"] <= wide_by["en"]
    assert wide_by["zh"] == by_lang["zh"]
    assert len(wide_by["de"]) == 2000


def test_scrub_pii_redacts_and_counts(spark):
    """scrub_pii removes emails/phones/IPs and leaves clean text alone;
    pii_counts counts per kind on the original text."""
    from gpssbzd_spark.dataprep.text import pii_counts, scrub_pii

    rows = [
        (1, "mail a.b+c@example.org now"),
        (2, "call +44 (0) 20-7946 0958 today"),
        (3, "host at 192.168.0.1 please"),
        (4, "perfectly clean prose with no identifiers"),
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    out = {
        r.i: r
        for r in df.select(
            "i",
            scrub_pii(F.col("t")).alias("s"),
            *[v.alias(k) for k, v in pii_counts(F.col("t")).items()],
        ).collect()
    }
    assert out[1].s == "mail [PII] now" and out[1].email == 1
    assert "[PII]" in out[2].s and "7946" not in out[2].s and out[2].phone == 1
    assert out[3].s == "host at [PII] please" and out[3].ipv4 == 1
    assert out[4].s == rows[3][1]
    assert (out[4].email, out[4].phone, out[4].ipv4) == (0, 0, 0)


def test_pack_documents_concat_and_chunk_invariants(spark):
    """pack_documents: within a bucket (id order) each doc's offset is
    the sum of its predecessors' tokens, pack_id = offset // budget,
    every pack except a bucket's last is filled past the budget
    boundary by construction, and the assignment is stable under
    repartitioning."""
    from gpssbzd_spark.dataprep.splits import pack_documents

    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97 + 10).alias("n")
    )
    out = pack_documents(df, "doc_id", "n", budget=100, bucket_hex_chars=1)
    rows = out.collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r)
    assert len(by_bucket) > 1
    saw_multi_pack = False
    for rs in by_bucket.values():
        rs.sort(key=lambda r: r.doc_id)
        run = 0
        for r in rs:
            assert r.offset == run, (r.doc_id, r.offset, run)
            assert r.pack_id == r.offset // 100
            run += r.n
        saw_multi_pack |= rs[-1].pack_id > 0
    assert saw_multi_pack  # fixture big enough to cross chunk bounds
    again = pack_documents(
        df.repartition(7), "doc_id", "n", budget=100, bucket_hex_chars=1
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_repetition_features_known_values(spark):
    """dup n-gram fractions on hand-computable docs: 'a b a b c' has
    four 2-grams with one duplicate (0.25) and three distinct 3-grams
    (0.0); sub-n docs yield NULL, perfectly repetitive docs approach 1."""
    from gpssbzd_spark.dataprep.text import repetition_features

    rows = [(1, "a b a b c"), (2, "x"), (3, ""), (4, "spam " * 50)]
    df = spark.createDataFrame(rows, "i long, t string")
    feats = repetition_features(F.col("t"))
    out = {
        r.i: r
        for r in df.select(
            "i", *[v.alias(k) for k, v in feats.items()]
        ).collect()
    }
    assert out[1].dup_2gram_frac == pytest.approx(0.25)
    assert out[1].dup_3gram_frac == pytest.approx(0.0)
    assert out[2].dup_2gram_frac is None and out[3].dup_2gram_frac is None
    assert out[4].dup_2gram_frac == pytest.approx(1 - 1 / 49)


def test_portable_ann_twins_recall_floor(spark, sf_dir):
    """The portable LSH/IVF top-k twins trade recall for cross-engine
    exactness — pin that the trade is bounded: recall@5 vs the exact
    brute-force baseline stays above a floor on the fixture (observed
    0.88 LSH / 0.60 IVF; floors leave slack for fixture regeneration).
    Correctness (candidate set + ranking) is separately hash-compared
    against DuckDB in test_corpus_oracle."""
    from gpssbzd_spark.dataprep.similarity import (
        ann_lsh_portable,
        brute_force_topk,
        ivf_flat_portable,
    )
    from gpssbzd_spark.sources.tables import load_table

    em = load_table(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        F.transform(
            F.col("embedding"), lambda x: x.cast("double") * x.cast("double")
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    emk = em.filter(sq > 0)
    queries = emk.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    truth = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(emk, queries, k=5).collect()
    }
    lsh = {(r.query_id, r.vec_id) for r in ann_lsh_portable(em).collect()}
    ivf = {(r.query_id, r.vec_id) for r in ivf_flat_portable(em).collect()}
    assert len(lsh & truth) / len(truth) >= 0.7
    assert len(ivf & truth) / len(truth) >= 0.4


def test_neardup_clusters_transitive_family(spark):
    """A≈B and B≈C must land in ONE cluster with rep=min id even when
    A and C share no pair (transitivity through the component), and
    neardup_dedup must keep exactly the rep + untouched docs."""
    from gpssbzd_spark.dataprep.dedup import neardup_clusters, neardup_dedup

    docs = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (9, "alone"), (10, "x"), (11, "y")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    out = {
        r.doc_id: (r.cluster_rep, r.cluster_size)
        for r in neardup_clusters(pairs).collect()
    }
    assert out == {1: (1, 3), 2: (1, 3), 3: (1, 3), 10: (10, 2), 11: (10, 2)}
    kept = {r.doc_id for r in neardup_dedup(docs, pairs).collect()}
    assert kept == {1, 9, 10}


def test_neardup_clusters_rep_is_numeric_min(spark):
    """The lpad-20 node key must make the rep the numeric min, not the
    string min ('10' < '9' lexicographically)."""
    from gpssbzd_spark.dataprep.dedup import neardup_clusters

    pairs = spark.createDataFrame([(10, 9)], "id_a long, id_b long")
    out = neardup_clusters(pairs).collect()
    assert {r.cluster_rep for r in out} == {9}


def test_contamination_pairs_and_decontaminate(spark):
    """Known-overlap fixture: a train doc reproducing an eval doc
    verbatim scores coverage 1.0 and is dropped; a doc sharing one
    stray n-gram with a longer eval doc scores low and survives."""
    from gpssbzd_spark.dataprep.decontam import (
        contamination_pairs,
        decontaminate,
    )

    leak = "the quick brown fox jumps over the lazy dog"
    train = spark.createDataFrame(
        [
            (1, leak),  # verbatim leak
            (2, "totally unrelated text about spark partitions and joins"),
            # shares exactly one 5-gram prefix of the eval doc
            (3, "the quick brown fox jumps into a very different river bed"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(100, leak)], "doc_id long, text string")
    pairs = {
        (r.train_id, r.eval_id): (r.n_common, r.eval_coverage)
        for r in contamination_pairs(train, ev, n=5).collect()
    }
    assert pairs[(1, 100)][1] == 1.0
    assert (2, 100) not in pairs
    assert pairs[(3, 100)][0] == 1 and pairs[(3, 100)][1] < 0.5
    kept = {r.doc_id for r in decontaminate(train, ev, n=5, min_coverage=0.5).collect()}
    assert kept == {2, 3}


def test_contamination_join_is_broadcast(spark):
    """The 100 TB contract: the match joins the (tiny) eval gram set by
    BROADCAST — no shuffle of the exploded corpus side."""
    from gpssbzd_spark.dataprep.decontam import contamination_pairs

    train = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    ev = spark.createDataFrame([(2, "a b c d e")], "doc_id long, text string")
    plan = contamination_pairs(train, ev, n=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_chunk_documents_window_semantics(spark):
    """chunk_documents: stride = chunk - overlap, the final short
    window is kept, a doc shorter than one window yields one chunk,
    empty docs yield none, and adjacent chunks share exactly the
    overlap tokens."""
    from gpssbzd_spark.dataprep.splits import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(10))),  # 10 toks
            (2, "a b"),                                  # < one window
            (3, "   "),                                  # empty: dropped
        ],
        "doc_id long, text string",
    )
    out = {}
    for r in chunk_documents(docs, chunk_tokens=4, overlap=2).collect():
        out.setdefault(r.doc_id, []).append((r.chunk_idx, r.n_tokens, r.chunk_text))
    assert 3 not in out
    assert out[2] == [(0, 2, "a b")]
    chunks = sorted(out[1])
    # starts 1,3,5,7,9 -> windows of 4 (last two truncated)
    assert [c[2] for c in chunks] == [
        "w0 w1 w2 w3", "w2 w3 w4 w5", "w4 w5 w6 w7", "w6 w7 w8 w9", "w8 w9",
    ]
    for (_, _, a), (_, _, b) in zip(chunks, chunks[1:]):
        assert a.split()[-2:] == b.split()[:2]  # exact 2-token overlap


def test_synth_media_containers_decode_to_predicted_values(spark):
    """synth_media emits VALID containers whose decoded properties are
    pure functions of the id — the invariant mm_decode_roundtrip's SQL
    oracle relies on — and the pipeline is partition-count invariant
    (same rows at 1 and 7 partitions: no per-batch state leaks)."""
    from gpssbzd_spark.dataprep.multimodal import (
        _header_image_features,
        _parse_mp4_meta,
        _real_audio_features,
        extract_features,
        synth_media,
        synth_mp4_bytes,
        synth_png_bytes,
        synth_wav_bytes,
    )

    # kernel-level: decoded values match the arithmetic prediction
    for i in (0, 7, 49, 123, 6999):
        wav = _real_audio_features(synth_wav_bytes(i))
        assert wav[0] == (i % 50 + 1) * 10.0  # duration_ms
        assert wav[2] == 8000.0 and wav[4] == (i % 8 + 1) / 32.0
        png = _header_image_features(synth_png_bytes(i))
        assert png[0] == (i % 64 + 1) * 4.0
        assert png[1] == (i % 32 + 1) * 4.0 and png[2] == 3.0
        mp4 = _parse_mp4_meta(synth_mp4_bytes(i))
        assert mp4["duration_ms"] == i % 7000 + 500
        assert mp4["width"] == (i % 16 + 1) * 16
        assert mp4["height"] == (i % 9 + 1) * 16
        assert mp4["n_frames"] == (i % 40 + 2) * 5

    # plan-level: partition-count invariance of the full pipeline
    ids = spark.range(0, 60).withColumnRenamed("id", "doc_id")
    rows = {}
    for parts in (1, 7):
        feats = extract_features(
            synth_media(ids.repartition(parts), id_col="doc_id"),
            decode="auto",
        )
        rows[parts] = sorted(
            (r.media_id, r.kind, tuple(r.feature)) for r in feats.collect()
        )
    assert rows[1] == rows[7]
    assert len(rows[1]) == 60


# ---------------------------------------------------------------------------
# SemDeDup (k-means-blocked semantic dedup)
# ---------------------------------------------------------------------------


def test_semdedup_pairs_subset_of_exact_with_identical_scores(spark):
    """Cluster blocking must never manufacture a pair: every SemDeDup
    pair appears in the unblocked exact pair set at the same threshold
    with the SAME cosine (the verify kernel is shared), so precision is
    1.0 by construction and only recall depends on the codebook."""
    from gpssbzd_spark.dataprep.dedup import semantic_dedup_pairs

    em = load_table(spark, SF, "embeddings")
    exact = {
        (r.id_a, r.id_b): r.cos_sim
        for r in embedding_cosine_pairs(em, threshold=0.5).collect()
    }
    sem = {
        (r.id_a, r.id_b): r.cos_sim
        for r in semantic_dedup_pairs(
            em, dim=64, n_clusters=8, threshold=0.5
        ).collect()
    }
    assert set(sem) <= set(exact), "SemDeDup emitted a pair the exact set lacks"
    for p, s in sem.items():
        assert s == exact[p], f"pair {p}: blocked cos {s} != exact {exact[p]}"


def test_semdedup_seeded_recall_and_survivor_rule(spark):
    """Exact copies always share a centroid (identical input ⇒ identical
    argmax), so seeded-duplicate recall through the whole pipeline —
    codebook, assignment, blocked join, verify — is 1.0; and the
    keep-min-id survivor rule must drop every copy while keeping every
    id that has no smaller-id partner in the pair set."""
    from gpssbzd_spark.dataprep.dedup import (
        semantic_dedup,
        semantic_dedup_pairs,
        semdedup_drop_ids,
    )

    em = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    copies = em.filter(F.col("vec_id") % 10 == 0).withColumn(
        "vec_id", F.col("vec_id") + 1_000_000
    )
    seeded = em.unionByName(copies)
    pairs = semantic_dedup_pairs(
        seeded, dim=64, n_clusters=16, threshold=0.95
    ).localCheckpoint()
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    want = {
        (r.vec_id, r.vec_id + 1_000_000)
        for r in em.filter(F.col("vec_id") % 10 == 0).collect()
    }
    assert want <= got, f"missed seeded pairs: {sorted(want - got)[:5]}"
    # survivor rule: survivors == seeded ids minus the distinct id_b set
    surv = {
        r.vec_id
        for r in semantic_dedup(
            seeded, dim=64, n_clusters=16, threshold=0.95
        ).collect()
    }
    drop = {r.vec_id for r in semdedup_drop_ids(pairs).collect()}
    all_ids = {r.vec_id for r in seeded.collect()}
    assert surv == all_ids - drop
    assert not any(v >= 1_000_000 for v in surv), "a seeded copy survived"


def test_semdedup_hierarchical_subset_recall_and_auto(spark):
    """The two-level codebook path (VERDICT r11 #7): precision still
    exact (every hierarchical pair appears in the unblocked exact set
    at the same cosine — the verify kernel is shared), seeded
    exact-copy recall still 1.0 (identical input ⇒ identical (c1, c2)
    argmaxes), and the auto switch picks hierarchical at
    n_clusters ≥ 64."""
    from gpssbzd_spark.dataprep.dedup import semantic_dedup_pairs

    em = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    exact = {
        (r.id_a, r.id_b): r.cos_sim
        for r in embedding_cosine_pairs(em, threshold=0.5).collect()
    }
    sem = {
        (r.id_a, r.id_b): r.cos_sim
        for r in semantic_dedup_pairs(
            em, dim=64, n_clusters=16, threshold=0.5, hierarchical=True
        ).collect()
    }
    assert set(sem) <= set(exact)
    for p, s in sem.items():
        assert s == exact[p]
    # seeded recall through the hierarchical blocking
    copies = em.filter(F.col("vec_id") % 10 == 0).withColumn(
        "vec_id", F.col("vec_id") + 1_000_000
    )
    seeded = em.unionByName(copies)
    got = {
        (r.id_a, r.id_b)
        for r in semantic_dedup_pairs(
            seeded, dim=64, n_clusters=64, threshold=0.95  # auto → 2-level
        ).collect()
    }
    want = {
        (r.vec_id, r.vec_id + 1_000_000)
        for r in em.filter(F.col("vec_id") % 10 == 0).collect()
    }
    assert want <= got, f"missed seeded pairs: {sorted(want - got)[:5]}"


def test_kmeans_2level_cell_ids_well_formed(spark):
    """kmeans_centroids_2level shapes: coarse (C1, d), fine
    (C1, C2, d) with C1·C2 ≥ n_centroids; assignment through the pair
    lands in [0, C1·C2) and identical vectors get identical cells."""
    import numpy as np

    from gpssbzd_spark.dataprep.similarity import (
        _nearest_centroids_udf,
        _nearest_fine_udf,
        kmeans_centroids_2level,
    )

    em = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    coarse, fine = kmeans_centroids_2level(em, dim=64, n_centroids=24)
    c1_n, c2_n = fine.shape[0], fine.shape[1]
    assert coarse.shape == (c1_n, 64) and fine.shape == (c1_n, c2_n, 64)
    assert c1_n * c2_n >= 24
    a1 = _nearest_centroids_udf(coarse, 1)
    a2 = _nearest_fine_udf(fine)
    cells = (
        em.select(
            "vec_id",
            F.element_at(a1(F.col("embedding")), 1).alias("_c1"),
            "embedding",
        )
        .select(
            "vec_id",
            (F.col("_c1") * c2_n + a2(F.col("_c1"), F.col("embedding"))).alias(
                "cell"
            ),
        )
        .collect()
    )
    assert all(0 <= r.cell < c1_n * c2_n for r in cells)
    # determinism: a second pass assigns identically
    again = (
        em.select(
            "vec_id",
            F.element_at(a1(F.col("embedding")), 1).alias("_c1"),
            "embedding",
        )
        .select(
            "vec_id",
            (F.col("_c1") * c2_n + a2(F.col("_c1"), F.col("embedding"))).alias(
                "cell"
            ),
        )
        .collect()
    )
    assert {(r.vec_id, r.cell) for r in cells} == {
        (r.vec_id, r.cell) for r in again
    }
    assert len({r.cell for r in cells}) > 1, "degenerate single-cell codebook"


# ---------------------------------------------------------------------------
# BM25 retrieval
# ---------------------------------------------------------------------------


def test_bm25_topk_matches_hand_computation(spark):
    """BM25 on a tiny corpus vs the formula computed in plain Python:
    same idf form, same length normalization, same rounding."""
    import math

    from gpssbzd_spark.dataprep.text import bm25_topk

    docs = [
        (1, "apple banana apple"),
        (2, "apple cherry"),
        (3, "banana banana banana cherry"),
        (4, "durian elderberry fig"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    k1, b = 1.2, 0.75
    texts = {i: t.split() for i, t in docs}
    n = len(texts)
    avgdl = sum(len(t) for t in texts.values()) / n

    def score(query, d):
        toks = texts[d]
        s = 0.0
        for term in sorted(set(query.split())):
            tf = toks.count(term)
            if tf == 0:
                continue
            dfreq = sum(1 for t in texts.values() if term in t)
            idf = math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
        return round(s, 4)

    got = {
        (r.query_id, r.doc_id): (r.score, r.rank)
        for r in bm25_topk(df, [(7, "apple banana"), (8, "cherry")], k=3).collect()
    }
    expected_q7 = {d: score("apple banana", d) for d in texts}
    want_q7 = sorted(
        ((s, d) for d, s in expected_q7.items() if s > 0),
        key=lambda x: (-x[0], x[1]),
    )[:3]
    for rank, (s, d) in enumerate(want_q7, start=1):
        assert got[(7, d)] == (pytest.approx(s, abs=1e-9), rank)
    # docs with no query term never appear
    assert (8, 1) not in got and (8, 4) not in got
    assert {d for (q, d) in got if q == 8} == {2, 3}


def test_bm25_topk_rejects_empty_queries(spark):
    from gpssbzd_spark.dataprep.text import bm25_topk

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(df, [(1, "   ")], k=3)


def test_bm25_max_df_frac_drops_stopwords(spark):
    """The high-df cap (VERDICT r11 #6): a stopword present in every
    document is dropped from scoring when its df/N exceeds the cap —
    a stopword-ONLY query returns EMPTY instead of scanning the
    corpus, and a mixed query scores as if the stopword were absent."""
    from gpssbzd_spark.dataprep.text import bm25_topk

    docs = [
        (1, "the apple pie"),
        (2, "the cherry tart"),
        (3, "the banana split"),
        (4, "the plain bread"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # 'the' has df/N = 1.0 > 0.5 → dropped under the cap
    assert bm25_topk(df, [(1, "the")], k=3, max_df_frac=0.5).count() == 0
    capped = {
        (r.query_id, r.doc_id): (r.score, r.rank)
        for r in bm25_topk(
            df, [(2, "the apple")], k=3, max_df_frac=0.5
        ).collect()
    }
    pure = {
        (2, r.doc_id): (r.score, r.rank)
        for r in bm25_topk(df, [(2, "apple")], k=3).collect()
    }
    assert capped == pure
    # no cap → the stopword's posting list scores every doc
    assert bm25_topk(df, [(1, "the")], k=10).count() == 4


def test_bm25_sql_twin_reproduces_cap_and_scientific_literals():
    """bm25_topk_sql with max_df_frac + a parameter whose repr is
    e-notation (b=1e-05 — the ADVICE r11 invalid-literal case) runs on
    DuckDB and reproduces the Spark cap bit-identically (the full
    engine-vs-engine parity at defaults lives in the corpus oracle
    row; this pins the PARAMETERIZED twin)."""
    import duckdb

    from gpssbzd_spark.dataprep.text import bm25_topk_sql

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(1, 'the apple pie'), (2, 'the cherry tart'), "
        "(3, 'the banana split'), (4, 'the plain bread')"
        ") t(doc_id, text)"
    )
    sql = bm25_topk_sql([(1, "the")], k=3, b=1e-05, max_df_frac=0.5)
    assert con.execute(sql).fetchall() == []
    mixed = con.execute(
        bm25_topk_sql([(2, "the apple")], k=3, max_df_frac=0.5)
    ).fetchall()
    pure = con.execute(bm25_topk_sql([(2, "apple")], k=3)).fetchall()
    assert mixed == pure and len(mixed) == 1


# ---------------------------------------------------------------------------
# Cross-document repeated spans (ExactSubstr-style)
# ---------------------------------------------------------------------------


def test_repeated_spans_finds_planted_boilerplate(spark):
    """A license-like region planted at DIFFERENT offsets in two docs
    must come back as one maximal span per doc covering exactly the
    planted tokens; unique text must flag nothing."""
    from gpssbzd_spark.dataprep.dedup import repeated_spans

    boiler = "this work is licensed under the creative commons license"  # 9 tokens
    docs = [
        (1, "alpha beta " + boiler + " gamma delta epsilon"),
        (2, "one two three four " + boiler),
        (3, "totally unique words nowhere else repeated at all in any doc"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.span_start, r.span_end, r.span_tokens)
        for r in repeated_spans(df, n=6, min_docs=2).collect()
    }
    # doc 1: boiler occupies tokens 3..11; doc 2: tokens 5..13
    assert got[1] == (3, 11, 9)
    assert got[2] == (5, 13, 9)
    assert 3 not in got


def test_repeated_spans_merges_adjacent_windows(spark):
    """Two docs sharing their ENTIRE text must merge every flagged
    window into one span covering the whole document."""
    from gpssbzd_spark.dataprep.dedup import repeated_spans

    text = "a b c d e f g h i j k l"
    df = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    rows = repeated_spans(df, n=6, min_docs=2).collect()
    assert {(r.doc_id, r.span_start, r.span_end) for r in rows} == {
        (1, 1, 12),
        (2, 1, 12),
    }


def test_strip_repeated_spans_removes_exactly_the_spans(spark):
    """The removal half: flagged tokens disappear, order of the rest is
    preserved, untouched docs pass through with zero removed."""
    from gpssbzd_spark.dataprep.dedup import (
        repeated_spans,
        strip_repeated_spans,
    )

    boiler = "this work is licensed under the creative commons license"
    docs = [
        (1, "Alpha beta " + boiler + " gamma DELTA"),
        (2, "one two three four " + boiler),
        (3, "Totally  UNIQUE words   nowhere else repeated at all in any doc"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    spans = repeated_spans(df, n=6, min_docs=2)
    got = {
        r.doc_id: (r.text, r.n_tokens_removed)
        for r in strip_repeated_spans(df, spans).collect()
    }
    # affected docs rebuild from ORIGINAL-case tokens (span positions
    # are case-independent)
    assert got[1] == ("Alpha beta gamma DELTA", 9)
    assert got[2] == ("one two three four", 9)
    # untouched docs pass through BYTE-identical (case and whitespace)
    assert got[3] == (docs[2][1], 0)
