#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized via a count-ish action (collect on the
already-aggregated/projected result would move rows to the driver; we use
``df.write.format("noop")`` so the measurement is executor-side work only).

Methodology note (round-over-round comparability): BENCH_r02 onward is
the comparable series. r1 numbers are NOT directly comparable — r1 let
later queries silently reuse earlier queries' persisted intermediates
(no clearCache between queries) and ran AQE with 32 initial partitions;
r2 fixed both (cache cleared outside the timed section, AQE
initialPartitionNum=8×cores — the cluster-correct setting, slightly
slower per query at sf0.1). Compare any round r≥2 against r2, not r1.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# Headline set: one per operator family — scan-agg, join, window, pair-join,
# dedup, similarity, text, streaming-twin, stateful, plus the three GPS
# pipeline composites (the product — stage-level regressions must be
# visible round-over-round, not just their pieces). Keep total
# minutes-scale.
HEADLINE = [
    "a7_tpch_q1_rollup",
    "j1_join_inner",
    "j2_join_left_broadcast_dim",
    "j4_self_theta_pair_join",
    "j5_semi_anti_join",
    "j7_asof_join_backward",
    "a8_rollup_grouping",
    "a4_percentile_exact",
    "a4_percentile_approx",
    "w2_running_sum",
    "w3_topk_per_group",
    "w7_sessionize_gap",
    "dd_exact_dup_groups",
    "dd_minhash_lsh_pairs",
    "dd_simhash_near_pairs",
    "dd_embedding_cosine_blocked",
    "tx_doc_features",
    "tx_fingerprint_groups",
    "sim_topk_brute",
    "sim_topk_lsh",
    "sim_topk_ivf",
    "st_tumbling_window",
    "st_stateful_sessionize",
    "bz_pipeline_cascade",
    "pe_pipeline_segments",
    "tc_pipeline_dbscan",
    "tc_pipeline_components",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    from gpssbzd_spark import corpus, get_session

    spark = get_session(app_name="gpssbzd_bench")
    qs = corpus.queries()

    # Warmup: absorb one-time JVM codegen + Python-worker pool startup so
    # the per-query numbers measure executor-side throughput, not session
    # boot. One tiny shuffle + one tiny Arrow UDF round-trip.
    from pyspark.sql import functions as F

    _warm = F.pandas_udf(lambda s: s, "long")

    warm = spark.range(10_000).groupBy((F.col("id") % 8).alias("k")).count()
    warm.write.format("noop").mode("overwrite").save()
    spark.range(1_000).select(_warm("id")).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        # time construction + execution: some pipelines eagerly
        # materialize a reused intermediate (e.g. MinHash prep) at
        # construction, and that work must count
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        # drop caches OUTSIDE the timed section: several queries persist
        # reused intermediates, and without this the later queries run
        # under the accumulated memory pressure of every earlier one —
        # per-query numbers would depend on HEADLINE ordering
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
