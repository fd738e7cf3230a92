#!/usr/bin/env python
"""Scale-stress harness (VERDICT r5 #2): measure how each dedup/ANN/
CC/event family's runtime grows when its input grows K× in rows with
the duplicate/near-dup RATE held constant (``dataprep/scalegen.py``).

The plan gates in tests/test_plans.py assert the SHAPE that makes the
100 TB claims plausible (banded equi-joins, broadcasts, no all-pairs);
this harness measures it: for each family, wall time at K ∈ MULTS over
the sf fixture, the fitted log-log slope between the two largest K
("exponent"), and the output row count per K. Banded/blocked families
must come out ~linear in rows (exponent ≲ 1.3 given fixed per-job
overhead biases the slope DOWN at the small end and noise biases it
up at the large end); an all-pairs implementation would show ~2.

Methodology notes:

- the inflated input is persisted and materialized BEFORE the timer
  starts, so the measured cost is the operator, not the synthetic
  fan-out;
- each (family, K) point runs ``--repeats`` times; the MIN is used for
  the exponent (min approximates the machine-idle number; a co-tenant
  spike in one run would otherwise fake a superlinear slope) and the
  median is reported alongside;
- embeddings: the fixture vectors are iid (the pairwise-cosine tail is
  uniform), so at a FIXED bucket count both the true pair population
  and per-bucket occupancy grow quadratically no matter the algorithm
  — exactly the regime where a production deployment scales the
  bucket count with the corpus. The harness therefore holds EXPECTED
  BUCKET OCCUPANCY constant (n_planes = 6 + log2(K), i.e. bucket
  space grows ∝ rows), which is the documented 100 TB setting for
  ``embedding_lsh_portable``/``embedding_lsh_pairs``;
- CC: the pair graph grows K× (structure replicates); the measured
  cost is pairs + components + rep/size labeling end-to-end.

Writes SCALING.json (machine record, merged across runs so a single
family can be re-measured without redoing the ~1 h ladder) and renders
SCALING.md from the merged record; prints one JSON line (driver
record). Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_SCALE_MULTS (default "1,4,16,64" — the K=64 octave runs by
default for every family whose max_k allows it; a custom MULTS list
must leave >= 2 multipliers under each family's cap or the slope is
undefined and the run aborts loudly), SPARK_GRAFT_SCALE_REPEATS
(default 3), SPARK_GRAFT_SCALE_FAMILIES (comma list; default = all).
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _corpus_bm25_queries():
    from gpssbzd_spark.corpus.dataprep import _BM25_QUERIES

    return _BM25_QUERIES


def families(sf_dir: str | None = None):
    """name → (table, inflate_fn, op_fn[, max_k]). Imported lazily so
    the harness can print a clean error without a JVM. ``sf_dir`` is
    the fixture dir the multi-table ops (tpch_q9_smj's orders/dims,
    incremental_neardup's fixed delta) load their SECOND input from —
    callers that inflate from a non-default fixture (the pytest gates
    run at the oracle scale) MUST pass the same dir or the op would
    silently measure a cross-fixture hybrid. ``max_k`` caps
    the multiplier for a family: every family now runs the full K=64
    octave (the event families were capped at 16 through r9 as "flat
    sub-second affairs", but sub-second cells sit inside the fixed
    per-job overhead — the K=64 octave is what resolves their curves
    ABOVE it, the same reasoning that lifted the composite caps in
    r10)."""
    if sf_dir is None:
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from gpssbzd_spark.dataprep.dedup import (
        embedding_lsh_portable,
        exact_dedup,
        minhash_dedup_pairs,
        minhash_lsh_portable,
        neardup_clusters,
        repeated_spans,
        semantic_dedup_pairs,
        simhash_portable,
    )
    from gpssbzd_spark.dataprep.text import bm25_topk
    from gpssbzd_spark.dataprep.scalegen import (
        inflate_documents,
        inflate_embeddings,
        inflate_events,
        inflate_lineitem,
    )
    from gpssbzd_spark.operators.funnel import funnel_times
    from gpssbzd_spark.operators.timeseries import time_bucket_gapfill

    def emb_blocked(df, mult):
        n_planes = 6 + round(math.log2(mult))
        return embedding_lsh_portable(df, n_planes=n_planes)

    return {
        "exact_dedup": (
            "documents",
            inflate_documents,
            lambda d, K: exact_dedup(d),
        ),
        "minhash_portable": (
            "documents",
            inflate_documents,
            lambda d, K: minhash_lsh_portable(d),
        ),
        "minhash_kernel": (
            "documents",
            inflate_documents,
            lambda d, K: minhash_dedup_pairs(
                d, id_col="doc_id", text_col="text", k=5, num_perm=64,
                bands=16, threshold=0.5,
            ),
        ),
        "simhash_portable": (
            "documents",
            inflate_documents,
            lambda d, K: simhash_portable(d),
        ),
        # the 1e9+-doc mitigation (VERDICT r8 #5): same pipeline, 128-bit
        # fingerprints — bands=4 slices 32-bit band values (~4.3e9-way
        # space), so the band-collision population that saturates the
        # 64-bit space at the K=64 octave stays negligible
        "simhash_portable_128": (
            "documents",
            inflate_documents,
            lambda d, K: simhash_portable(d, bits=128),
        ),
        "embedding_blocked": ("embeddings", inflate_embeddings, emb_blocked),
        # r11 late additions. repeated_spans: the gram explode + two
        # gram-keyed moves (frequency rollup, flag join) all grow with
        # token volume — must stay ~linear. bm25: the posting build
        # (explode -> tf groupBy) dominates; the 4-query literal batch
        # is fixed, so the curve is the corpus-side scan+shuffle.
        # semdedup: per-cluster occupancy held constant (n_clusters =
        # 16·K, the IVF codebook rule) so the blocked pair mass grows
        # ~K; the brute centroid-assignment matmul is O(n·C·d) — a
        # quadratic TERM with a BLAS-small constant (the paper's own
        # regime: C « n, brute assignment on accelerators; at extreme
        # scale assign via a hierarchical codebook instead).
        "repeated_spans": (
            "documents",
            inflate_documents,
            lambda d, K: repeated_spans(d, n=6, min_docs=2),
        ),
        "bm25_topk": (
            "documents",
            inflate_documents,
            # the SAME literal batch as the tx_bm25_topk bench row —
            # imported, not copied, so the ladder curve cannot drift
            # from the workload the bench row measures (r11 review)
            lambda d, K: bm25_topk(d, _corpus_bm25_queries(), k=5),
        ),
        "semdedup": (
            "embeddings",
            inflate_embeddings,
            lambda d, K: semantic_dedup_pairs(
                d, dim=64, n_clusters=16 * K, threshold=0.95
            ),
        ),
        "neardup_cc": (
            "documents",
            inflate_documents,
            lambda d, K: neardup_clusters(minhash_lsh_portable(d)),
        ),
        "funnel": (
            "events",
            inflate_events,
            lambda d, K: funnel_times(
                d, ("view", "click", "purchase"), within=604800.0
            ),
        ),
        "gapfill_per_user": (
            "events",
            inflate_events,
            lambda d, K: time_bucket_gapfill(
                d.filter(F.col("user_id") % 19 == 0),
                "ts",
                ["user_id"],
                14400,
                {"sum_value": F.round(F.sum("value"), 2)},
                fill="prev",
            ),
        ),
        # VERDICT r8 #6: scale octaves for the NON-dedup heavy hitters.
        # The flagship pipeline over K× documents (quality gate ->
        # dedup -> quota -> split -> rollup); the banding join and the
        # quota window are its only all-to-all moves, so the curve
        # must stay ~linear like the dedup families it composes.
        "pretrain_e2e": (
            "documents",
            inflate_documents,
            lambda d, K: _pretrain_e2e_op(d),
        ),
        # Incremental dedup with the INDEX side grown K× and the delta
        # fixed: signs the inflated corpus, signs the constant delta,
        # band-joins, verifies agreement — the ingest-time pattern's
        # cost must stay ~linear in index size (a fixed-band-space
        # superlinearity would surface here exactly like the r8
        # SimHash knee).
        "incremental_neardup": (
            "documents",
            inflate_documents,
            lambda d, K: _incremental_neardup_op(d, sf_dir),
        ),
        # The index-MAINTENANCE half (VERDICT r9 #5): append a K×
        # delta's signatures into a PERSISTED index that grows across
        # calls. The op lands the delta, signs ONLY it, commits one
        # batch dir + manifest part, and reads back the committed
        # batch — the existing index is never read or re-signed, so
        # the curve must be linear in DELTA size and flat in index
        # size (the index is strictly larger at every later cell).
        "sigindex_append": (
            "documents",
            inflate_documents,
            lambda d, K: _sigindex_append_op(d, sf_dir),
        ),
        # The FULL daily-ingest cycle (VERDICT r10 #5) as one timed
        # unit over a K× delta: land → manifest pickup → incremental
        # match against the PERSISTED signature index → accept
        # (anti-join) → O(delta) index append → pickup commit →
        # accepted-batch compaction. The index grows across calls like
        # sigindex_append's; linear-in-delta here is the evidence the
        # COMPOSITION adds no superlinear coupling beyond its pieces
        # (match is banded, append never reads the index, compaction
        # folds only this batch's files).
        "ingest_day_cycle": (
            "documents",
            inflate_documents,
            lambda d, K: _ingest_cycle_op(d, sf_dir, K),
        ),
        # IVF index MAINTENANCE (VERDICT r10 #7): append a K× vector
        # delta into a PERSISTED cid-partitioned IVF index that grows
        # across calls — frozen-codebook assignment of ONLY the delta,
        # one batch dir + manifest commit, drift stats, committed-
        # batch read-back. Must be linear in DELTA size and flat in
        # index size (the existing batches are never read).
        "ivf_append": (
            "embeddings",
            inflate_embeddings,
            lambda d, K: _ivf_append_op(d, sf_dir),
        ),
        # LSH index MAINTENANCE (VERDICT r11 #4): append a K× vector
        # delta into a PERSISTED (tbl, bucket)-partitioned hyperplane-
        # LSH index that grows across calls — frozen-seeded-plane
        # bucketing of ONLY the delta, one batch dir + manifest
        # commit, committed-batch read-back. Must be linear in DELTA
        # size and flat in index size (existing batches never read);
        # simpler than ivf_append in that the plane family is
        # data-independent, so there is no staleness stats pass at all.
        "lsh_append": (
            "embeddings",
            inflate_embeddings,
            lambda d, K: _lsh_append_op(d, sf_dir),
        ),
        # Index COMPACTION cost curves (r14, VERDICT r13 #3): the LSM
        # folds behind "compact every N days" — each op folds a
        # PRISTINE 4-batch index holding the K× corpus into one batch
        # (union of persisted rows + one manifest commit + GC of the
        # folded dirs) and reads the folded index back. Expected
        # exponent ~1.0: the fold reads and rewrites the whole index
        # by design — these rows are the measured cost the cadence
        # guidance trades against the O(days) read fan-out the fold
        # removes. The pristine index is (re)built by the inflate
        # wrapper (untimed) from minted rows through the real commit
        # machinery; re-inflation after each repeat is the reset the
        # destructive op needs.
        "sigindex_compact": (
            "documents",
            _sig_compact_inflate,
            _sig_compact_op,
        ),
        "ivf_compact": (
            "embeddings",
            _ivf_compact_inflate,
            _ivf_compact_op,
        ),
        "lsh_compact": (
            "embeddings",
            _lsh_compact_inflate,
            _lsh_compact_op,
        ),
        # ONE skewed line holding every trajectory, forced past the
        # pair-matrix budget at every K (VERDICT r10 #6): auto mode
        # routes it to the distributed eps-graph fallback, where the
        # pair work is a NATIVE self-join — extra shuffles instead of
        # one atomic Arrow group (no OOM, no exception). Trajectory
        # count grows ~√K so the line's PAIR COUNT — the real work
        # unit of a skewed group — grows K×; linear here means the
        # fallback's cost tracks the pair work it cannot avoid
        # (TRACLUS distance is all-pairs by definition) with no
        # superlinear term on top.
        "dbscan_skewed_line": (
            "events",
            inflate_events,
            lambda d, K: _dbscan_skew_op(d, K),
        ),
        # Benchmark decontamination with the TRAIN side grown K× and
        # the eval suite fixed — exactly the production regime (the
        # benchmark suite is a constant; the corpus is what grows). The
        # eval side is gram-exploded, counted, and BROADCAST twice
        # (pair join + anti join), so the only cost that grows is the
        # train-side gram explode + broadcast probe: one linear scan,
        # zero shuffles over the corpus. Replicas i>0 are ciphered, so
        # the contaminated population stays fixture-sized — the curve
        # measures the scan, which is the 100 TB cost.
        "decontam_ngram": (
            "documents",
            inflate_documents,
            lambda d, K: _decontam_op(d, sf_dir),
        ),
        # Per-(doc, term) TF-IDF over the corpus's own statistics — the
        # shuffle-heavy text-analysis representative: explode →
        # (doc,term) partial-agg, df-per-term over a SECOND shuffle
        # dimension, N broadcast from a one-row agg. The ciphered
        # replicas mint replica-local vocabularies, so the term
        # dimension grows ∝ K too — the honest regime (real corpora
        # grow vocabulary with size); both shuffles must stay ~linear
        # in rows.
        "tfidf_terms": (
            "documents",
            inflate_documents,
            lambda d, K: _tfidf_scale_op(d),
        ),
        # The token-budget quota window (dataprep/splits.py
        # token_budget_cap): ONE exchange on the group key, per-group
        # hash-ordered sort + running sum. `source` survives inflation,
        # so the group COUNT stays fixed while every group grows K× —
        # exactly the skewed per-host-cap regime (few heavy sources).
        # All four cells sit inside the fixed per-job overhead, so the
        # slope shows the window adds no VISIBLE superlinear term — it
        # does not resolve the sort's own n log n.
        "token_budget_cap": (
            "documents",
            inflate_documents,
            lambda d, K: _quota_scale_op(d),
        ),
        # ANN steady-state QUERY against a PERSISTED IVF index grown K×
        # with the codebook grown in step (n_centroids ∝ K ⇒ constant
        # per-centroid list size, n_probe fixed ⇒ the probed fraction
        # SHRINKS as the corpus grows). The index build is untimed (it
        # happens once per K inside the inflate wrapper, outside the
        # harness's timed section — a deployment builds once and serves
        # many queries); each timed repeat reads the cid-partitioned
        # parquet and probes it through the DPP-pruned broadcast join
        # the plan gate pins (tests/test_plans.py: dynamicpruning +
        # PartitionFilters on cid). Near-flat here is the evidence that
        # query latency is governed by list size, not corpus size.
        "ivf_query_persisted": (
            "embeddings",
            _ivf_scale_inflate,
            _ivf_query_op,
        ),
        # The multimodal seam: mapInPandas feature extraction over K×
        # binary blobs with the deterministic sha256 kernel — the Arrow
        # plumbing (batching, binary transfer, schema) the real
        # decoders share, measured without the decode constant. Linear
        # here = the Python-worker path itself adds no superlinear
        # term; blobs never transit the driver (single-stage, no
        # shuffle at all).
        "multimodal_features": (
            "documents",
            inflate_documents,
            lambda d, K: _multimodal_scale_op(d),
        ),
        # TPC-H Q9 (the widest star) with the fact side inflated K× and
        # the orderkey join FORCED to sort-merge via the merge hint —
        # the 100 TB plan shape (at fixture scale the default threshold
        # would auto-broadcast orders and measure the wrong join; a
        # session-conf override would distort the other families).
        # Dims stay fixture-sized and broadcast-hinted, as in the
        # corpus query. n log n sort growth keeps the slope near 1.
        "tpch_q9_smj": (
            "lineitem",
            lambda df, K: inflate_lineitem(df, K),
            lambda li, K: _tpch_q9_smj_op(li, sf_dir),
        ),
        # r15 (VERDICT r14 #8): the a4_percentile_exact shape — a
        # global-ish exact percentile whose per-group merge is a
        # single-reducer buffer of every value. The octave validates
        # the r14 "the one-reducer merge share vanishes at real scale"
        # claim with numbers instead of assertion: the wall exponent
        # here plus the per-K map/merge stage decomposition captured by
        # plans/r15/a4_merge_share.py (event-log profile of THIS op at
        # each K) — the map stage grows ~linearly while the merge is
        # bounded by distinct-value count per group, so merge share
        # falls as K grows.
        "percentile_exact": (
            "lineitem",
            lambda df, K: inflate_lineitem(df, K),
            lambda li, K: li.groupBy("l_returnflag").agg(
                F.round(F.percentile("l_extendedprice", 0.95), 4).alias(
                    "p95_price"
                )
            ),
        ),
    }


def _incremental_neardup_op(d, sf_dir):
    from pyspark.sql import functions as F

    from gpssbzd_spark.dataprep.dedup import (
        incremental_neardup_matches,
        minhash_signatures_portable,
    )
    from gpssbzd_spark.sources import load_table

    spark = d.sparkSession
    delta = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 3 == 0)
    )
    index_sigs = minhash_signatures_portable(
        d.select("doc_id", "text").filter(F.col("doc_id") % 3 != 0)
    )
    return incremental_neardup_matches(
        minhash_signatures_portable(delta), index_sigs
    )


def _dbscan_skew_op(d, K):
    """Cluster ONE line that holds every trajectory, past the matrix
    budget (max_group_pairs=1000 < every cell's pair count), so auto
    mode routes it through the eps-graph fallback at every K. The
    trajectory count grows ~√K (ids fold modulo 60·√K), so the skewed
    line's pair count grows ~K×; geometry is the 2 km chain the
    components tests use (sites ≪ eps apart within a site, adjacent
    sites ~4 km < eps=5, far sites ≫ eps), giving km-wide label
    margins while keeping per-site degree bounded."""
    import math

    from pyspark.sql import functions as F

    from gpssbzd_spark.plans.trajectory_clustering import (
        cluster_trajectories,
    )

    spark = d.sparkSession
    n_traj = 60 * math.isqrt(K)
    tid = F.col("user_id") % n_traj
    site = tid % 32
    patterns = d.select(
        tid.cast("string").alias("id"),
        F.lit("0").alias("linenumber"),
        F.lit("1").alias("patternID"),
        (
            F.lit(114.0)
            + site * F.lit(0.0195)
            + ((F.col("event_id") % 97) / 97.0) * 1e-6
        ).alias("lng"),
        (F.lit(22.6) + ((F.col("event_id") % 89) / 89.0) * 1e-6).alias("lat"),
        F.col("ts"),
    )
    params = spark.createDataFrame(
        [("0", 5.0, 2)], "linenumber string, eps float, min_samples int"
    )
    out = cluster_trajectories(
        patterns, params, mode="auto", local_threshold=50,
        max_group_pairs=1000,
    )
    return out.groupBy("cluster").agg(
        F.countDistinct("id", "patternID").alias("n_trajectories")
    )


_INGEST_SCALE: dict = {"root": None, "calls": 0}


def _ingest_cycle_op(d, sf_dir, K=1):
    """One timed DAY CYCLE of the composed ingest loop
    (dp_pipeline_ingest_e2e's body) over the K×-documents delta ``d``:
    land the delta, exactly-once pickup, match against the persisted
    signature index (seeded once from the fixture corpus and strictly
    GROWING across the ladder's calls), accept the non-matching ids,
    append them to the index, grow the persisted IVF and LSH ANN
    indexes with a K× embeddings delta (r12, VERDICT r11 #5 — the
    same-day ANN half; the delta is minted in-op via
    inflate_embeddings, a narrow linear JVM projection whose cost is
    part of a real cycle anyway), commit the pickup, compact the
    accepted batch, and read the compacted batch back. Ids offset per
    call so every cycle is a genuinely new day."""
    import shutil

    from pyspark.sql import functions as F

    from gpssbzd_spark.dataprep.ivfindex import (
        ivf_index_append,
        ivf_index_init,
    )
    from gpssbzd_spark.dataprep.lshindex import (
        lsh_index_append,
        lsh_index_build,
    )
    from gpssbzd_spark.dataprep.scalegen import inflate_embeddings
    from gpssbzd_spark.dataprep.sigindex import (
        sig_index_ingest,
        sig_index_match,
    )
    from gpssbzd_spark.sources import load_table
    from gpssbzd_spark.sources.incremental import (
        _append_manifest_part,
        compact_landing,
        incremental_read,
        list_landed,
    )

    spark = d.sparkSession
    st = _INGEST_SCALE
    if st["root"] is None:
        root = os.path.join(REPO, ".cache", "ingest-scale")
        shutil.rmtree(root, ignore_errors=True)
        st["root"] = root
        seed = os.path.join(root, "landing", "seed")
        load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        ).write.mode("overwrite").parquet(seed)
        sig_index_ingest(spark, seed, os.path.join(root, "index"))
        em_seed = load_table(spark, sf_dir, "embeddings")
        ivf_index_init(
            spark, os.path.join(root, "ivf_index"), em_seed,
            dim=64, n_centroids=16, iters=2,
        )
        lsh_index_build(
            spark, os.path.join(root, "lsh_index"), em_seed,
            dim=64, n_planes=8, n_tables=8,
        )
    st["calls"] += 1
    n = st["calls"]
    root = st["root"]
    index_dir = os.path.join(root, "index")
    landing = os.path.join(root, "landing", f"delta-{n:04d}")
    d.select(
        (F.col("doc_id") + F.lit(n * 10**14)).alias("doc_id"), "text"
    ).write.mode("overwrite").parquet(landing)
    new_docs, _, commit = incremental_read(
        spark, landing, os.path.join(root, "pickup_manifest")
    )
    matches = sig_index_match(spark, index_dir, new_docs)
    accepted = new_docs
    if matches is not None:
        accepted = new_docs.join(
            matches.select(F.col("delta_id").alias("doc_id")).distinct(),
            "doc_id",
            "left_anti",
        )
    adir = os.path.join(root, "accepted", f"delta-{n:04d}")
    accepted.write.mode("overwrite").parquet(adir)
    sig_index_ingest(spark, adir, index_dir)
    # ANN half of the same day: a K× embeddings delta appends into the
    # persisted IVF + LSH indexes before the pickup commit, exactly as
    # the composed corpus row does
    em_delta = inflate_embeddings(
        load_table(spark, sf_dir, "embeddings"), K
    ).select((F.col("vec_id") + F.lit(n * 10**14)).alias("vec_id"), "embedding")
    ivf_index_append(
        spark, os.path.join(root, "ivf_index"), em_delta, f"delta-{n:04d}"
    )
    lsh_index_append(
        spark, os.path.join(root, "lsh_index"), em_delta, f"delta-{n:04d}"
    )
    commit()
    amanifest = os.path.join(root, "accepted_manifest")
    _append_manifest_part(spark, amanifest, list_landed(spark, adir, "*.parquet"))
    compact_landing(spark, adir, amanifest)
    return spark.read.parquet(adir)


_IVFAPP_SCALE: dict = {"root": None, "calls": 0}


def _ivf_append_op(d, sf_dir):
    """One timed APPEND of the K×-embeddings delta ``d`` into a
    persisted growable IVF index (dataprep/ivfindex.py) initialized
    once from the fixture corpus: frozen-codebook assignment of ONLY
    the delta, one cid-partitioned batch dir + manifest commit point,
    drift stats, committed-batch read-back. The index strictly GROWS
    across the ladder's calls while per-call cost must track delta
    size only — the ANN sibling of sigindex_append."""
    import shutil

    from pyspark.sql import functions as F

    from gpssbzd_spark.dataprep.ivfindex import (
        ivf_index_append,
        ivf_index_init,
    )
    from gpssbzd_spark.sources import load_table

    spark = d.sparkSession
    st = _IVFAPP_SCALE
    if st["root"] is None:
        root = os.path.join(REPO, ".cache", "ivfapp-scale")
        shutil.rmtree(root, ignore_errors=True)
        st["root"] = root
        ivf_index_init(
            spark,
            os.path.join(root, "index"),
            load_table(spark, sf_dir, "embeddings"),
            dim=64,
            n_centroids=16,
            iters=2,
        )
    st["calls"] += 1
    n = st["calls"]
    delta = d.select(
        (F.col("vec_id") + F.lit(n * 10**9)).alias("vec_id"), "embedding"
    )
    rec = ivf_index_append(
        spark, os.path.join(st["root"], "index"), delta, f"delta-{n:04d}"
    )
    return spark.read.parquet(rec["dir"])


_LSHAPP_SCALE: dict = {"root": None, "calls": 0}


def _lsh_append_op(d, sf_dir):
    """One timed APPEND of the K×-embeddings delta ``d`` into a
    persisted growable LSH index (dataprep/lshindex.py) built once
    from the fixture corpus: frozen-plane bucketing of ONLY the delta,
    one (tbl, bucket)-partitioned batch dir + manifest commit point,
    committed-batch read-back. The index strictly GROWS across the
    ladder's calls while per-call cost must track delta size only —
    the LSH sibling of ivf_append."""
    import shutil

    from pyspark.sql import functions as F

    from gpssbzd_spark.dataprep.lshindex import (
        lsh_index_append,
        lsh_index_build,
    )
    from gpssbzd_spark.sources import load_table

    spark = d.sparkSession
    st = _LSHAPP_SCALE
    if st["root"] is None:
        root = os.path.join(REPO, ".cache", "lshapp-scale")
        shutil.rmtree(root, ignore_errors=True)
        st["root"] = root
        lsh_index_build(
            spark,
            os.path.join(root, "index"),
            load_table(spark, sf_dir, "embeddings"),
            dim=64,
            n_planes=8,
            n_tables=8,
        )
    st["calls"] += 1
    n = st["calls"]
    delta = d.select(
        (F.col("vec_id") + F.lit(n * 10**9)).alias("vec_id"), "embedding"
    )
    rec = lsh_index_append(
        spark, os.path.join(st["root"], "index"), delta, f"delta-{n:04d}"
    )
    return spark.read.parquet(rec["dir"])


_SIGIDX_SCALE: dict = {"root": None, "calls": 0}


def _sigindex_append_op(d, sf_dir):
    """One timed APPEND of the K×-documents delta ``d`` into a
    persisted signature index (dataprep/sigindex.py) seeded once with
    the fixture corpus: land the delta as parquet, sign ONLY it,
    commit one batch dir + manifest parts, read back the committed
    batch. The index strictly GROWS across the ladder's calls while
    per-call cost must track delta size only — the linearity evidence
    for VERDICT r9 #5. Ids offset per call so every append is a
    genuinely new batch (content-keyed dir names stay unique)."""
    import shutil

    from pyspark.sql import functions as F

    from gpssbzd_spark.dataprep.sigindex import sig_index_ingest
    from gpssbzd_spark.sources import load_table

    spark = d.sparkSession
    st = _SIGIDX_SCALE
    if st["root"] is None:
        root = os.path.join(REPO, ".cache", "sigidx-scale")
        shutil.rmtree(root, ignore_errors=True)
        st["root"] = root
        seed = os.path.join(root, "landing", "seed")
        load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        ).write.mode("overwrite").parquet(seed)
        sig_index_ingest(spark, seed, os.path.join(root, "index"))
    st["calls"] += 1
    n = st["calls"]
    landing = os.path.join(st["root"], "landing", f"delta-{n:04d}")
    d.select(
        (F.col("doc_id") + F.lit(n * 10**14)).alias("doc_id"), "text"
    ).write.mode("overwrite").parquet(landing)
    batch = sig_index_ingest(
        spark, landing, os.path.join(st["root"], "index")
    )
    return spark.read.parquet(batch)


def _mint_sig_index(spark, d, index_dir, n_batches=4):
    """Build a PRISTINE n-batch signature index holding ``d``'s doc
    ids with minted (narrow JVM projection) signature rows, through
    the REAL commit machinery (batch dirs + manifest parts via
    sigindex._commit_batch). The fold under measurement unions
    persisted rows and never re-signs, so minted content exercises
    exactly the measured path while keeping the (untimed) build a
    cheap narrow write instead of a full signing pass — the same
    reasoning as ingest_day_cycle's in-op minted embeddings."""
    import shutil

    from pyspark.sql import functions as F

    from gpssbzd_spark.dataprep.sigindex import _commit_batch, _paths

    shutil.rmtree(index_dir, ignore_errors=True)
    sigs_dir, manifest_dir = _paths(index_dir)
    rows = d.select(
        "doc_id",
        *[
            F.xxhash64(F.col("doc_id"), F.lit(i)).alias(f"h{i}")
            for i in range(8)
        ],
    )
    for b in range(n_batches):
        bdir = f"{sigs_dir}/batch-mint{b}"
        rows.filter(F.pmod(F.col("doc_id"), n_batches) == b).write.mode(
            "overwrite"
        ).parquet(bdir)
        _commit_batch(spark, manifest_dir, bdir, {})


def _mint_ivf_index(spark, em, index_dir, n_batches=4, n_cents=16):
    """PRISTINE n-batch IVF index: real cid-partitioned batch layout +
    manifest records (ivfindex._write_batch/_commit_manifest_part),
    cid minted natively (the fold under measurement unions persisted
    rows — the assignment kernel never runs)."""
    import shutil

    from pyspark.sql import functions as F

    from gpssbzd_spark.dataprep.ivfindex import (
        _commit_manifest_part,
        _write_batch,
    )
    from gpssbzd_spark.dataprep.similarity import _norm

    shutil.rmtree(index_dir, ignore_errors=True)
    rows = em.select(
        "vec_id",
        "embedding",
        _norm(F.col("embedding")).alias("_norm_e"),
        F.pmod(F.xxhash64("vec_id"), F.lit(n_cents)).cast("int").alias("cid"),
    )
    for b in range(n_batches):
        bid = "init" if b == 0 else f"d{b}"
        bdir = _write_batch(
            rows.filter(F.pmod(F.col("vec_id"), n_batches) == b),
            index_dir,
            bid,
        )
        rec = {"seq": b, "batch_id": bid, "dir": bdir, "n": None}
        if b == 0:
            rec["shares"] = {str(c): 1.0 / n_cents for c in range(n_cents)}
        _commit_manifest_part(index_dir, rec)


def _mint_lsh_index(spark, em, index_dir, n_batches=4, n_tables=4,
                    n_planes=6):
    """PRISTINE n-batch LSH index: real (tbl, bucket)-partitioned batch
    layout + manifest records, buckets minted natively (4 tables x 64
    buckets — the composed ingest loop's setting; the fold cost is
    dominated by the many-small-cell rewrite, which this preserves)."""
    import os as _os
    import shutil

    from pyspark.sql import functions as F

    from gpssbzd_spark.dataprep.lshindex import _commit_manifest_part
    from gpssbzd_spark.dataprep.similarity import _norm

    shutil.rmtree(index_dir, ignore_errors=True)
    rows = (
        em.select(
            "vec_id",
            "embedding",
            _norm(F.col("embedding")).alias("_norm_e"),
            F.explode(F.sequence(F.lit(0), F.lit(n_tables - 1))).alias(
                "tbl"
            ),
        )
        .withColumn(
            "bucket",
            F.pmod(
                F.xxhash64("vec_id", "tbl"), F.lit(2**n_planes)
            ).cast("int"),
        )
    )
    for b in range(n_batches):
        bdir = _os.path.join(index_dir, "batches", f"d{b}")
        rows.filter(F.pmod(F.col("vec_id"), n_batches) == b).repartition(
            "tbl", "bucket"
        ).write.mode("overwrite").partitionBy("tbl", "bucket").parquet(bdir)
        _commit_manifest_part(
            index_dir, {"seq": b, "batch_id": f"d{b}", "dir": bdir, "n": None}
        )


_COMPACT_SCALE_ROOT = os.path.join(REPO, ".cache", "compact-scale")


def _sig_compact_inflate(base, K):
    """Inflate + SIDE EFFECT: (re)build the pristine K-keyed signature
    index the op will fold. The harness re-invokes inflate after every
    timed repeat, which is exactly the reset a destructive op needs
    (the fold supersedes and GC-deletes the minted batches)."""
    from gpssbzd_spark.dataprep.scalegen import inflate_documents

    d = inflate_documents(base, K)
    _mint_sig_index(
        d.sparkSession, d, os.path.join(_COMPACT_SCALE_ROOT, f"sig-{K}")
    )
    return d


def _sig_compact_op(d, K):
    from gpssbzd_spark.dataprep.sigindex import (
        sig_index_compact,
        sig_index_read,
    )

    spark = d.sparkSession
    idx = os.path.join(_COMPACT_SCALE_ROOT, f"sig-{K}")
    assert sig_index_compact(spark, idx) is not None
    return sig_index_read(spark, idx)


def _ivf_compact_inflate(base, K):
    from gpssbzd_spark.dataprep.scalegen import inflate_embeddings

    em = inflate_embeddings(base, K)
    _mint_ivf_index(
        em.sparkSession, em, os.path.join(_COMPACT_SCALE_ROOT, f"ivf-{K}")
    )
    return em


def _ivf_compact_op(d, K):
    from gpssbzd_spark.dataprep.ivfindex import (
        ivf_index_compact,
        ivf_index_read,
    )

    spark = d.sparkSession
    idx = os.path.join(_COMPACT_SCALE_ROOT, f"ivf-{K}")
    assert ivf_index_compact(spark, idx, "fold") is not None
    return ivf_index_read(spark, idx)


def _lsh_compact_inflate(base, K):
    from gpssbzd_spark.dataprep.scalegen import inflate_embeddings

    em = inflate_embeddings(base, K)
    _mint_lsh_index(
        em.sparkSession, em, os.path.join(_COMPACT_SCALE_ROOT, f"lsh-{K}")
    )
    return em


def _lsh_compact_op(d, K):
    from gpssbzd_spark.dataprep.lshindex import (
        lsh_index_compact,
        lsh_index_read,
    )

    spark = d.sparkSession
    idx = os.path.join(_COMPACT_SCALE_ROOT, f"lsh-{K}")
    assert lsh_index_compact(spark, idx, "fold") is not None
    return lsh_index_read(spark, idx)


def _decontam_op(train, sf_dir):
    """Full decontamination (pairs + coverage filter + anti-join) of the
    K× train corpus against a FIXED fixture eval slice (doc_id % 17 —
    a benchmark-suite-sized 1/17th, the same eval shape the corpus
    queries use). n=4 grams as in dp_decontaminate_overlap (fixture
    docs average ~54 tokens); min_coverage=0.2 keeps the contaminated
    set non-empty so the anti-join path is exercised, not an
    empty-broadcast fast path."""
    from pyspark.sql import functions as F

    from gpssbzd_spark.dataprep.decontam import decontaminate
    from gpssbzd_spark.sources import load_table

    spark = train.sparkSession
    ev = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 17 == 0)
        .select("doc_id", "text")
    )
    return decontaminate(
        train.select("doc_id", "text"), ev, n=4, min_coverage=0.2
    )


def _tfidf_scale_op(d):
    from gpssbzd_spark.dataprep.text import tfidf_terms

    return tfidf_terms(d.select("doc_id", "text"))


def _quota_scale_op(d):
    """token_budget_cap over the K× corpus: group by the inflation-
    preserved `source`, weight by the fixture's n_chars column (the
    budget unit is caller-defined; chars stand in for tokens here),
    budget fixed — the kept prefix stays fixture-sized while the
    window still sorts and running-sums every row of every group."""
    from gpssbzd_spark.dataprep.splits import token_budget_cap

    return token_budget_cap(
        d.select("doc_id", "source", "n_chars"),
        group_cols=["source"],
        id_col="doc_id",
        token_col="n_chars",
        budget=50_000,
    )


def _multimodal_scale_op(d):
    from pyspark.sql import functions as F

    from gpssbzd_spark.dataprep.multimodal import (
        extract_features,
        media_from_binary,
    )

    media = media_from_binary(
        d.withColumn("blob", F.col("text").cast("binary")),
        id_col="doc_id",
        content_col="blob",
        kind="image",
        mime="application/octet-stream",
    )
    return extract_features(media, decode="fake")


_IVF_SCALE: dict = {"root": None, "built": {}, "last": {}}


def _ivf_scale_key(df, K) -> tuple[str, int]:
    """Cache key for a built index: (source parquet file, K). Keying by
    K alone would let a second fixture (e.g. the pytest gate at oracle
    scale after a programmatic sf0.1 run in the same process) silently
    probe the FIRST fixture's index — the cross-fixture hybrid the
    families() docstring forbids."""
    files = df.inputFiles()
    return (files[0] if files else "<no-file>", K)


def _ivf_scale_lookup(d, K):
    """The op-side build lookup. Prefer the (file, K) key, but once the
    harness's persist MATERIALIZES the input its plan resolves to an
    InMemoryRelation and inputFiles() comes back empty — fall back to
    the key the inflate wrapper recorded for this K (the harness runs
    inflate immediately before the op for the same (family, K), so the
    last-recorded key is the right one; only an interleaved second
    fixture at the SAME K could confuse it, which the harness never
    does)."""
    st = _IVF_SCALE
    key = _ivf_scale_key(d, K)
    if key not in st["built"]:
        if K not in st["last"]:
            raise RuntimeError(
                f"no IVF index built for K={K} in this process — run "
                "the inflate wrapper (_ivf_scale_inflate) first; the "
                "op path only PROBES an index the untimed inflate "
                "half persisted (ADVICE r10)"
            )
        key = st["last"][K]
    return st["built"][key]


def _ivf_scale_inflate(base, K):
    """inflate_embeddings plus a ONCE-PER-(fixture, K) untimed index
    build: the harness calls inflate outside the timed section, so the
    persisted cid-partitioned index + codebook a deployment builds once
    are in place before any timed repeat probes them."""
    from gpssbzd_spark.dataprep.scalegen import inflate_embeddings

    inp = inflate_embeddings(base, K)
    st = _IVF_SCALE
    if st["root"] is None:
        import shutil

        root = os.path.join(REPO, ".cache", "ivf-scale")
        shutil.rmtree(root, ignore_errors=True)
        st["root"] = root
    key = _ivf_scale_key(base, K)
    if key not in st["built"]:
        from gpssbzd_spark.dataprep.similarity import build_ivf_index

        n_index = inp.count()
        # codebook grows with the corpus: constant ~32-vector lists
        # capped at 16 centroids per unit K (sf0.1: 2000 rows/unit ⇒
        # the 16·K cap binds and lists hold ~125 vectors at every K)
        n_cents = int(min(16 * K, max(8, n_index // 32)))
        index, cents = build_ivf_index(
            inp, dim=64, n_centroids=n_cents, iters=2
        )
        path = os.path.join(st["root"], f"idx{len(st['built']):04d}-K{K:04d}")
        # parallelize the (untimed) partitioned write: the inflate
        # expression keeps the tiny fixture scan's single partition, and
        # a one-task dynamic-partition write of up to 16·K cid dirs is
        # minutes of sequential file-open overhead (at real scale the
        # build is distributed exactly this way: cluster by cid first)
        index.repartition("cid").write.mode("overwrite").partitionBy(
            "cid"
        ).parquet(path)
        st["built"][key] = (path, cents)
    st["last"][K] = key
    return inp


def _ivf_query_op(d, K):
    """The timed half: probe the persisted index for this (fixture, K)
    with a FIXED 10-query batch at n_probe=4 through the LIBRARY's
    probed-directory serving path
    (``similarity.ivf_query_pruned`` — driver-side codebook consult,
    read only the probed cid directories; shipped from this harness
    into the library per VERDICT r10 missing #1, so the family now
    measures the code a user actually calls). Neighbor parity of the
    pruned read against the full-listing read of the same index is
    pinned in tests/test_dataprep.py (ADVICE r10: rows_out=50 alone
    is a weak witness — any probed partition yielding ≥5 candidates
    per query keeps it). Queries come from the harness-pinned input
    ``d`` itself (replica 0 keeps the original ids and vectors, so
    vec_id < 10 selects the same 10 fixture vectors at every K)."""
    from pyspark.sql import functions as F

    from gpssbzd_spark.dataprep.similarity import ivf_query_pruned

    path, cents = _ivf_scale_lookup(d, K)
    queries = d.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return ivf_query_pruned(path, cents, queries, k=5, n_probe=4)


def _pretrain_e2e_op(d):
    from gpssbzd_spark.corpus.dataprep import pretrain_e2e_plan

    return pretrain_e2e_plan(d)


def _tpch_q9_smj_op(li, sf_dir):
    from pyspark.sql import functions as F

    from gpssbzd_spark.corpus.tpch import _rev_cents
    from gpssbzd_spark.sources import load_table

    spark = li.sparkSession
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "STANDARD"
    )
    sn = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(
            load_table(spark, sf_dir, "nation").select(
                F.col("n_nationkey").alias("_snk"),
                F.col("n_name").alias("nation"),
            )
        ),
        F.col("s_nationkey") == F.col("_snk"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    return (
        li.join(
            F.broadcast(p.select(F.col("p_partkey").alias("l_partkey"))),
            "l_partkey",
            "left_semi",
        )
        .join(
            F.broadcast(sn.select("s_suppkey", "nation")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            orders.hint("merge"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg((F.sum(_rev_cents()) / 100.0).alias("sum_profit"))
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mults = [
        int(m)
        for m in os.environ.get(
            "SPARK_GRAFT_SCALE_MULTS", "1,4,16,64"
        ).split(",")
    ]
    repeats = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "3"))
    assert len(mults) >= 2 and mults == sorted(mults)
    fam_filter = os.environ.get("SPARK_GRAFT_SCALE_FAMILIES")
    wanted = (
        {f.strip() for f in fam_filter.split(",") if f.strip()}
        if fam_filter
        else None
    )

    from pyspark.sql import functions as F

    from gpssbzd_spark import get_session
    from gpssbzd_spark.sources import load_table

    spark = get_session(app_name="gpssbzd_scaling")
    _warm = F.pandas_udf(lambda s: s, "long")
    spark.range(10_000).groupBy((F.col("id") % 8).alias("k")).count().write.format(
        "noop"
    ).mode("overwrite").save()
    spark.range(1_000).select(_warm("id")).write.format("noop").mode(
        "overwrite"
    ).save()

    results: dict[str, dict] = {}
    for name, spec in families(sf_dir).items():
        if wanted is not None and name not in wanted:
            continue
        table, inflate, op = spec[:3]
        max_k = spec[3] if len(spec) > 3 else None
        fam_mults = [K for K in mults if max_k is None or K <= max_k]
        assert len(fam_mults) >= 2, (
            f"family {name}: SPARK_GRAFT_SCALE_MULTS={mults} leaves "
            f"{fam_mults} under max_k={max_k} — need >= 2 multipliers "
            "to fit a log-log slope"
        )
        base = load_table(spark, sf_dir, table)
        per_mult = {}
        for K in fam_mults:
            inp = inflate(base, K).persist()
            n_in = inp.count()
            runs, n_out = [], None
            for _ in range(repeats):
                t0 = time.perf_counter()
                out = op(inp, K)
                out.write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
                if n_out is None:
                    n_out = out.count()
                # clear derived caches (some ops persist internally) but
                # keep the timed input pinned
                spark.catalog.clearCache()
                inp = inflate(base, K).persist()
                inp.count()
            inp.unpersist()
            per_mult[K] = {
                "rows_in": n_in,
                "rows_out": n_out,
                "sec_min": round(min(runs), 3),
                "sec_median": round(statistics.median(runs), 3),
            }
            print(
                f"scaling: {name} K={K} rows={n_in} out={n_out} "
                f"min={min(runs):.2f}s median={statistics.median(runs):.2f}s",
                file=sys.stderr,
            )
        lo, hi = fam_mults[-2], fam_mults[-1]
        exponent = math.log(
            per_mult[hi]["sec_min"] / per_mult[lo]["sec_min"]
        ) / math.log(hi / lo)
        results[name] = {
            "mults": per_mult,
            "exponent": round(exponent, 3),
            "exponent_pair": [lo, hi],
        }

    if sf_dir.rstrip("/") == "/root/testdata/sf0.1":
        merged = _merge_sidecar(sf_dir, mults, repeats, results)
        _write_md(sf_dir, mults, repeats, merged)
    else:
        # smoke / off-scale runs must NOT clobber the committed sf0.1
        # machine record (the merge keeps prior cells only on sf_dir
        # match, so an sf0.001 smoke used to silently DISCARD the whole
        # committed ladder — round-9 footgun); park them in a sidecar
        merged = results
        with open(os.path.join(REPO, "SCALING_smoke.json"), "w") as fh:
            json.dump(
                {"sf_dir": sf_dir, "mults": mults, "families": results},
                fh,
                indent=1,
                default=str,
            )
    print(
        json.dumps(
            {
                "metric": "scaling_exponents",
                "sf_dir": sf_dir,
                "mults": mults,
                "exponents": {k: v["exponent"] for k, v in merged.items()},
            }
        )
    )
    spark.stop()


def _merge_sidecar(sf_dir, mults, repeats, results) -> dict:
    """Merge this run's families into SCALING.json so a partial run
    (SPARK_GRAFT_SCALE_FAMILIES) refreshes one family's rows without
    discarding the rest of the ladder. Prior cells are kept only when
    sf_dir matches; family order follows :func:`families` so the
    rendered table is stable across partial refreshes."""
    path = os.path.join(REPO, "SCALING.json")
    prior: dict[str, dict] = {}
    if os.path.exists(path):
        with open(path) as fh:
            rec = json.load(fh)
        if rec.get("sf_dir") == sf_dir:
            for fam, r in rec.get("families", {}).items():
                prior[fam] = {
                    "mults": {int(k): v for k, v in r["mults"].items()},
                    "exponent": r["exponent"],
                    "exponent_pair": r["exponent_pair"],
                }
    # CELL-level merge (r14): a partial run over a mult subset (e.g.
    # the K=256 octave extension, SPARK_GRAFT_SCALE_MULTS=64,256)
    # refreshes those cells and takes over the exponent fields without
    # discarding the family's committed smaller-K history; a full-mult
    # run still replaces every cell it re-measures.
    for fam, r in results.items():
        if fam in prior:
            merged_mults = dict(prior[fam]["mults"])
            merged_mults.update(r["mults"])
            prior[fam] = {**r, "mults": merged_mults}
        else:
            prior[fam] = r
    order = list(families().keys())
    merged = {
        fam: prior[fam]
        for fam in sorted(
            prior, key=lambda f: order.index(f) if f in order else 99
        )
    }
    with open(path, "w") as fh:
        json.dump(
            {
                "sf_dir": sf_dir,
                "mults": mults,
                "repeats": repeats,
                "families": merged,
            },
            fh,
            indent=1,
        )
    return merged


def _write_md(sf_dir, mults, repeats, results) -> None:
    # table columns span every measured cell across the merged record
    # (families refreshed on a mult subset keep their history; families
    # without a given K render "—")
    col_mults = sorted({K for r in results.values() for K in r["mults"]})
    lines = [
        "# SCALING — measured scale-up curves",
        "",
        f"Input: `{sf_dir}` tables synthetically inflated K× in rows with",
        "duplicate/near-dup rate held constant (`dataprep/scalegen.py`; the",
        "inflation is materialized+persisted before the timer, so each cell",
        "times the operator only). Exponent = log-log slope of the MIN wall",
        f"time between each family's two largest measured K (min of {repeats}",
        "runs — a co-tenant spike would otherwise fake a superlinear slope).",
        "~1.0 = linear in rows; an all-pairs implementation would show ~2.",
        "",
        "Fixed per-job scheduling overhead (~0.3-1 s on local[32]) inflates",
        "the small-K cells, which biases slopes DOWN at small K — the",
        "largest-pair slope is the honest one and is what",
        "`tests/test_scaling.py` gates (< 1.3 on the banded families).",
        "Every family runs the full K=64 octave (since r10 — the event",
        "families' old K=16 cap left their cells inside that fixed",
        "overhead) so a knee past 16x would show.",
        "",
        "`embedding_blocked` holds expected bucket occupancy constant",
        "(n_planes = 6 + log2 K) — the fixture vectors are iid, so at any",
        "FIXED bucket count the true pair population itself is quadratic;",
        "growing the bucket space with the corpus is the documented",
        "production setting for the hyperplane-LSH families.",
        "",
        "`simhash_portable` bands at the minimal pigeonhole cover (4x16",
        "bits) after the K=64 octave exposed a 441s knee at 8x8-bit",
        "banding (PERF_NOTES #3). The honest asymptote: a FIXED 64-bit",
        "fingerprint caps the band space, so spurious candidates keep a",
        "bands*n^2/2^16 term — negligible through this ladder (~3e6 at",
        "K=64) but real at ~1e9+ docs, where production runs exact-dedup",
        "first (boilerplate collapses the n that matters) and/or widens",
        "the fingerprint to 128 bits; both leave this pipeline's shape",
        "unchanged. The 128-bit path is now MEASURED, not hypothetical:",
        "`simhash_portable_128` (same pipeline, bits=128, 4x32-bit",
        "bands, ~4.3e9-way band space) holds exponent ~0.97 through the",
        "same K=64 octave — the r8 asymptote note's mitigation, shipped",
        "and oracled (dd_simhash_portable128_pairs).",
        "",
        "`pretrain_e2e` is the flagship composite (quality gate ->",
        "dedup -> quota cap -> split -> rollup) over K x documents;",
        "`tpch_q9_smj` inflates the FACT side only and forces the",
        "orderkey join to sort-merge (the 100 TB plan shape — at",
        "fixture scale the default threshold would auto-broadcast",
        "orders and time the wrong join), so the curve measures the",
        "shuffle join + rollup the broadcast-star plan gates cannot.",
        "Since r10 all three run the full K=64 octave (VERDICT r9 #4).",
        "",
        "`sigindex_append` (r10, VERDICT r9 #5) times ONE APPEND of a",
        "K x delta into a persisted signature index that strictly GROWS",
        "across the ladder's calls (seeded with the fixture corpus,",
        "then 3 appends per K cell): land the delta, sign only it,",
        "commit one content-keyed batch dir + manifest part",
        "(dataprep/sigindex.py). Linear-in-K here, with the index",
        "larger at every later cell, is the evidence that append cost",
        "is O(delta) and independent of index size.",
        "",
        "`sigindex_compact` / `ivf_compact` / `lsh_compact` (r14,",
        "VERDICT r13 #3) measure the LSM FOLDS behind the ingest",
        "loop's compact_every_n_days cadence: each cell folds a",
        "pristine 4-batch index holding the K x corpus into one batch",
        "(union of persisted rows, one `replaces` manifest commit, GC",
        "of the folded dirs) and reads it back. The asymptote is ~1.0",
        "by design (the fold reads and rewrites the whole index), but",
        "the MEASURED cells come out near-flat: at ladder sizes (25 MB",
        "of signature rows at K=64) the union+rewrite sits inside",
        "fixed per-job overhead, token_budget_cap-style — i.e. a fold",
        "costs about one day's APPEND, which is the practical cadence",
        "guidance (compact freely; the fan-out it removes costs more",
        "than the fold). lsh_compact's higher constant is the",
        "many-small-cell (tbl, bucket) rewrite, not row volume. The",
        "pristine index is rebuilt untimed between repeats from minted",
        "rows through the real commit machinery (the fold never",
        "re-signs/re-assigns, so minted content exercises exactly the",
        "measured path).",
        "",
        "`decontam_ngram` (r10) grows the TRAIN side K× against a FIXED",
        "eval suite (the production regime: benchmarks are a constant,",
        "the corpus grows). Both joins broadcast the eval side, so the",
        "only growing cost is the train-side gram explode + probe — one",
        "linear scan, zero corpus shuffles; ciphered replicas keep the",
        "contaminated population fixture-sized.",
        "",
        "`tfidf_terms` (r10) is the shuffle-heavy text representative:",
        "both shuffle dimensions grow with K — (doc,term) pairs AND the",
        "term vocabulary (ciphered replicas mint replica-local vocab,",
        "as real corpora do). `token_budget_cap` (r10) is the quota",
        "window: group count fixed (`source` survives inflation), every",
        "group K× heavier, budget fixed, one exchange. Its cells all",
        "sit inside the fixed per-job overhead, so the slope shows the",
        "window adds no VISIBLE superlinear term — it does not resolve",
        "the per-group sort's own n log n.",
        "",
        "`multimodal_features` (r10) is the mapInPandas seam: feature",
        "extraction over K× binary blobs with the deterministic sha256",
        "kernel — the Arrow plumbing the real decoders share, without",
        "the decode constant. Single stage, zero shuffles, blobs never",
        "transit the driver; linear = the Python-worker batching adds",
        "no superlinear term.",
        "",
        "`ivf_query_persisted` (r10) times the ANN steady-state QUERY",
        "against a persisted cid-partitioned IVF index grown K× with",
        "the codebook grown in step (n_centroids ∝ K ⇒ constant list",
        "size; n_probe fixed ⇒ the probed fraction SHRINKS). The build",
        "is untimed (once per K, outside the timer — a deployment",
        "builds once and serves many queries); each timed repeat is the",
        "serving pattern, since r11 the LIBRARY code itself",
        "(`similarity.ivf_query_pruned`): a driver-side codebook",
        "consult (10 vectors × the codebook, the metastore lookup)",
        "selects the probed cid directories, and only THOSE are",
        "scanned + probe-joined + top-k. The generic full-listing +",
        "DPP form remains as `ivf_query` (plan-gated in",
        "tests/test_plans.py); pruned-vs-full neighbor-set parity on",
        "the same index is pinned in tests/test_dataprep.py (rows_out",
        "alone would not witness coverage — any probed partition with",
        "≥5 candidates per query keeps it at 50). Measured through the",
        "library path (r11): exponent −0.08, i.e. FLAT — a 64× corpus",
        "costs the same ~0.6–0.8 s query batch (r10's harness-op",
        "measurement was 0.088; the pure-JVM literal-probe serving",
        "plan removed the remaining pandas round-trip). A generic",
        "full-listing read measured 0.376 on the same index (the gap is",
        "pure partition-dir metadata); an all-pairs/brute design would",
        "show 1.0 by construction.",
        "",
        "`ingest_day_cycle` (r11, ANN-extended r12) is the COMPOSED",
        "daily-ingest loop (dp_pipeline_ingest_e2e's body) per K×",
        "delta: land → manifest pickup → incremental match vs the",
        "persisted signature index → accept anti-join → O(delta) index",
        "append → K× embeddings delta appended into the persisted IVF",
        "AND LSH ANN indexes (VERDICT r11 #5 — minted in-op by",
        "inflate_embeddings, a narrow linear JVM projection) → pickup",
        "commit → accepted-batch compaction. All three indexes",
        "strictly grow across cells; linear-in-delta = the composition",
        "adds no superlinear coupling beyond its separately-measured",
        "pieces (the r11 pre-ANN series measured 1.02 and RESETS at",
        "r12 with the heavier cycle). (The K=1 cell's rows_out=0 is a",
        "real scenario, not a bug: that delta is replica 0 — texts",
        "identical to the seeded index — so the match stage rejects",
        "ALL of it and the cycle ingests an empty accepted batch;",
        "higher-K cells accept the mutated replicas.)",
        "",
        "`ivf_append` (r11) is the ANN sibling of sigindex_append:",
        "frozen-codebook assignment of ONLY the K× vector delta, one",
        "cid-partitioned batch dir + manifest commit, drift stats,",
        "committed-batch read-back — the existing batches are never",
        "read, so the curve must track delta size with the index",
        "strictly larger at every later cell. `lsh_append` (r12) is",
        "its LSH twin (VERDICT r11 #4): frozen-seeded-plane bucketing",
        "of ONLY the delta into one (tbl, bucket)-partitioned batch +",
        "manifest commit — simpler in that the plane family is",
        "data-independent, so there is no staleness stats pass at all.",
        "",
        "`dbscan_skewed_line` (r11) forces ONE line past the pair-",
        "matrix budget at every K (max_group_pairs=1000): auto mode",
        "routes it through the distributed eps-graph fallback — extra",
        "shuffles instead of one atomic Arrow group — which for huge",
        "lines generates candidates through the eps-BANDED spatial",
        "grid (blocked_pair_distances: sound cover of each chord",
        "dilated by eps, exact verify, identical edges), so the",
        "quadratic all-pairs join never materializes. Trajectory count",
        "grows ~√K so the line's candidate work grows ~K× at this",
        "geometry's density; linear here means the fallback adds",
        "nothing on top, i.e. one huge line degrades gracefully",
        "instead of OOMing a single task.",
        "",
        "| family | "
        + " | ".join(f"K={K} s (rows out)" for K in col_mults)
        + " | exponent |",
        "|---|" + "---|" * (len(col_mults) + 1),
    ]
    for name, r in results.items():
        cells = []
        for K in col_mults:
            m = r["mults"].get(K)
            cells.append(
                f"{m['sec_min']} ({m['rows_out']})" if m else "—"
            )
        lo, hi = r["exponent_pair"]
        lines.append(
            f"| {name} | " + " | ".join(cells)
            + f" | {r['exponent']} (K={lo}→{hi}) |"
        )
    lines += [
        "",
        "Regenerate: `python scaling.py` (env `SPARK_GRAFT_SF_DIR`,",
        "`SPARK_GRAFT_SCALE_MULTS`, `SPARK_GRAFT_SCALE_REPEATS`,",
        "`SPARK_GRAFT_SCALE_FAMILIES` to refresh a subset — cells merge",
        "into SCALING.json and this table renders from the merged record).",
        "",
    ]
    with open(os.path.join(REPO, "SCALING.md"), "w") as fh:
        fh.write("\n".join(lines))


if __name__ == "__main__":
    main()
