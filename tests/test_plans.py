"""Physical-plan quality gates (SURVEY.md §4, §7.8).

Correctness tests prove the operators compute the right rows; these
prove they compute them the way a 100 TB run needs: filters reaching
the parquet scan, column pruning, small dims broadcast instead of
shuffled, partial aggregation before the exchange, and no Python worker
in paths that must stay JVM-side. A regression here is a silent 10-100×
at scale even while every oracle check stays green.

Plans are inspected AFTER an action so AQE has finalized them
(`isFinalPlan=true`); the pre-execution string would show the
pre-adaptive guess.
"""

from __future__ import annotations

import re

from gpssbzd_spark import corpus

corpus._load_all()
SF = "/root/testdata/sf0.001"


def final_plan(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # keep only the AQE-final section; the trailing "== Initial Plan =="
    # echo would double-count nodes
    return plan.split("== Initial Plan ==")[0]


def q(spark, name):
    return corpus.CORPUS[name].fn(spark, SF)


def test_filter_and_projection_reach_parquet_scan(spark):
    # the scan's ReadSchema string is truncated at 100 chars by default,
    # which hides columns once the projection grows past ~4 fields
    spark.conf.set("spark.sql.maxMetadataStringLength", "1000")
    try:
        plan = final_plan(q(spark, "p1_scan_project_filter"))
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "LessThan(l_shipdate" in m.group(1), plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    read_cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    # 16-column lineitem pruned to exactly what the query touches
    assert read_cols == {
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_shipdate",
    }


def test_small_dim_join_is_broadcast_not_shuffled(spark):
    plan = final_plan(q(spark, "j2_join_left_broadcast_dim"))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_semi_join_is_broadcast_left_semi(spark):
    plan = final_plan(q(spark, "j5_semi_join"))
    assert "LeftSemi" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_rollup_agg_is_partial_then_final(spark):
    """Map-side combine: two HashAggregate levels around the exchange,
    and the whole pipeline in whole-stage codegen."""
    plan = final_plan(q(spark, "a7_tpch_q1_rollup"))
    assert len(re.findall(r"HashAggregate", plan)) >= 2, plan
    # whole-stage codegen spans show as "*(n)" stage markers
    assert re.search(r"\*\(\d+\)", plan), plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python anywhere


def test_native_relational_corpus_has_no_python_workers(spark):
    """Everything except the explicitly pandas-UDF-backed operators must
    stay JVM-side: a BatchEvalPython/ArrowEvalPython node in these plans
    means an expression silently fell off the codegen path."""
    pandas_backed = {
        "tc_pipeline_dbscan",      # applyInPandas DBSCAN (by design)
        "dd_simhash_buckets",      # bit-majority pandas_udf (documented)
        "dd_simhash_near_pairs",   # same simhash kernel (by design)
        "dd_minhash_lsh_pairs",    # perm-family + verify numpy kernels
        "dd_neardup_clusters_kernel",  # same kernel feeding the CC step
        "tx_fingerprint_groups",   # winnowing rolling-hash numpy kernel
        "mm_feature_extract",      # mapInPandas media kernel (by design)
        "mm_resize_pipeline",      # mapInPandas resize kernel (by design)
        "st_stateful_sessionize",  # mapInPandas sessionize kernel
        "sim_topk_lsh",            # vectorized hyperplane-bucket kernel
        "dd_embedding_cosine_blocked",  # same bucket kernel (by design)
        "sim_topk_ivf",            # centroid-assignment matmul kernel
        "sim_topk_ivf_build",      # same kernel (index assignment)
        "sim_topk_ivf_query",      # same kernel (query-side probe)
        "sim_topk_ivf_append",     # same kernel (append assignment)
        "sim_topk_lsh_append",     # bucket-kernel re-derivation flags
        "dp_pipeline_ingest_e2e",  # r12 ANN halves: assignment + bucket
                                   # kernels in the day body and the
                                   # post-state re-derivation flags
        # sim_topk_ivf_query_pruned is deliberately ABSENT: the pruned
        # serving path resolves the probe driver-side and injects it as
        # a literal broadcast side, so its plan is pure JVM (the
        # no-EvalPython gate below covers it)
    }
    for name in sorted(corpus.CORPUS):
        if name in pandas_backed:
            continue
        plan = final_plan(q(spark, name))
        assert "EvalPython" not in plan, f"{name} dropped to Python:\n{plan}"


def test_simhash128_signature_kernel_stays_in_codegen(spark):
    """PERF_NOTES #12 (the dd_simhash_portable128_pairs idle-min
    elevation, VERDICT r11 #2): the 128-bit signature kernel's flat
    form put 128 aggregate fields in ONE HashAggregate — past
    spark.sql.codegen.maxFields (100) — so the whole signature stage
    ran interpreted (unstarred aggregates) and its throughput rode JIT
    warmth (4.5 → 6.2 s idle-min on unchanged code). The lane-exploded
    form keeps every codegen unit at 32 sums: EVERY HashAggregate in
    the executed kernel plan must carry the whole-stage-codegen star."""
    import re as _re

    from gpssbzd_spark.dataprep.dedup import _simhash_portable_sigs
    from gpssbzd_spark.sources.tables import load_table as _lt

    d = _lt(spark, SF, "documents").select("doc_id", "text")
    df = _simhash_portable_sigs(d, "text", "doc_id", 4)
    plan = final_plan(df)
    aggs = [l for l in plan.splitlines() if "HashAggregate" in l]
    assert len(aggs) >= 4, plan  # partial+final × two levels
    for line in aggs:
        assert _re.search(r"\*\(\d+\) HashAggregate", line), (
            f"interpreted (non-codegen) aggregate in the simhash "
            f"signature kernel:\n{line}"
        )


def test_brute_force_topk_broadcasts_queries_never_shuffles_corpus(spark):
    plan = final_plan(q(spark, "sim_topk_brute"))
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan


def test_ivf_persisted_query_prunes_index_partitions(spark):
    """The steady-state IVF query must scan ONLY the probed centroids'
    partitions of the persisted cid-partitioned index — Spark's dynamic
    partition pruning against the broadcast probe set. Without DPP the
    'inverted file' reads the whole index every query and the
    n_probe/n_centroids scan-fraction promise is fiction at 100 TB."""
    from gpssbzd_spark.corpus.dataprep import (
        sim_topk_ivf_build,
        sim_topk_ivf_query,
    )

    sf = "/root/testdata/sf0.001"
    sim_topk_ivf_build(spark, sf)  # ensure the index exists for this gen
    plan = final_plan(sim_topk_ivf_query(spark, sf))
    assert "dynamicpruning" in plan.lower(), plan
    assert "PartitionFilters: [isnotnull(cid" in plan, plan


def test_pair_join_shuffles_on_group_key_once(spark):
    """The O(n²)-per-group pair generator must be a single equi-join on
    the group key (broadcast at test scale, shuffled-hash/sort-merge at
    real scale) with the inequality as a residual filter — never a
    cartesian product."""
    plan = final_plan(q(spark, "j4_self_theta_pair_join"))
    assert "CartesianProduct" not in plan, plan
    assert "Join" in plan


def test_exact_dedup_aggregates_before_exchange(spark):
    plan = final_plan(q(spark, "dd_exact_dup_groups"))
    assert len(re.findall(r"HashAggregate", plan)) >= 2, plan


def test_semi_anti_diagnostic_broadcasts_both_sides(spark):
    """The merged semi+anti diagnostic must run both joins as broadcast
    LeftSemi/LeftAnti over the filtered key set — a shuffled key side
    here would mean the filter stopped pruning before the exchange."""
    plan = final_plan(q(spark, "j5_semi_anti_join"))
    assert "LeftSemi" in plan and "LeftAnti" in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_blocked_embedding_pairs_never_cartesian(spark):
    """The 100 TB embedding-dedup path must generate candidates via the
    (table, bucket) equi-join — a CartesianProduct/BroadcastNestedLoop
    node would mean the blocking silently degraded to all-pairs. The
    unblocked oracle twin IS allowed its nested-loop (that's the point
    of keeping both). Gated on the RAW kernel path — the corpus row
    wraps it in seeded-recall scaffolding whose 1-row containment
    cross-join is a benign BroadcastNestedLoopJoin."""
    from gpssbzd_spark.corpus.dataprep import _dd_embedding_cosine_blocked_raw

    plan = final_plan(_dd_embedding_cosine_blocked_raw(spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Join" in plan  # the banded equi-join exists


def test_partitioned_scan_prunes_directories(spark):
    """s_partitioned_pruned_scan's filter must land in PartitionFilters
    (directory pruning — the scan reads one l_returnflag dir of three),
    not as a post-scan data filter."""
    plan = final_plan(q(spark, "s_partitioned_pruned_scan"))
    assert "PartitionFilters: [" in plan, plan
    tail = plan.split("PartitionFilters: [", 1)[1][:220]
    assert "l_returnflag" in tail, tail


def test_r9_new_ops_plan_shapes(spark):
    """Round-9 operators keep the repo's plan contract: the incremental
    dedup's delta-vs-index match and the semantic decontamination's
    pair pipeline candidate-generate through equi-joins (no cartesian,
    no nested-loop, no Python workers), and the token-budget cap is
    one window exchange with zero joins."""
    for name in ("dd_incremental_neardup", "dp_token_budget_cap"):
        plan = final_plan(q(spark, name))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "EvalPython" not in plan, name
    # the semantic decontamination nests embedding_lsh_portable, whose
    # ONE BroadcastNestedLoopJoin is the intended broadcast product
    # with the tiny (n_tables*n_planes)-row literal planes table — the
    # same exception class as q11/q15's one-row scalars; everything
    # else must stay equi-join
    plan = final_plan(q(spark, "dp_decontaminate_semantic"))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
    assert "EvalPython" not in plan
    cap = final_plan(q(spark, "dp_token_budget_cap"))
    assert "Join" not in cap, cap
    assert "Window" in cap, cap


def test_sigindex_match_plan_shape(spark, tmp_path):
    """The persisted-index daily loop (r10, dataprep/sigindex.py): the
    delta-vs-index match must candidate-generate through the banded
    equi-join with zero Python workers and zero nested loops — the same
    contract as the in-memory incremental path — and the index side
    must come from the persisted parquet (a FileScan node), proving the
    corpus is never re-signed at match time."""
    from pyspark.sql import functions as F

    from gpssbzd_spark.dataprep.sigindex import (
        sig_index_ingest,
        sig_index_match,
    )
    from gpssbzd_spark.sources import load_table

    d = load_table(spark, SF, "documents").select("doc_id", "text")
    land = str(tmp_path / "land")
    d.filter(F.col("doc_id") % 3 != 0).write.parquet(land)
    idx = str(tmp_path / "index")
    sig_index_ingest(spark, land, idx)
    matches = sig_index_match(
        spark, idx, d.filter(F.col("doc_id") % 3 == 0)
    )
    spark.conf.set("spark.sql.maxMetadataStringLength", "1000")
    try:
        plan = final_plan(matches)
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "batch-" in plan, plan  # index side scans the persisted files


def test_minhash_candidates_equi_join_not_cartesian(spark):
    """MinHash banding must candidate-generate through the
    (band, band_hash) equi-join; any nested-loop/cartesian node means
    the O(n²) similarity join came back."""
    plan = final_plan(q(spark, "dd_minhash_lsh_pairs"))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_minhash_candidate_widen_is_narrow_gated(spark):
    """r15: the candidate set feeding the prefilter+verify chain is
    widened to half-parallelism, but ONLY when the input scan was
    narrower than the session parallelism (fixture layouts) — on a
    wide input the pin must vanish (guide §2's no-op contract: the sig
    joins lay candidates out through their own exchanges at scale)."""
    import re as _re

    from gpssbzd_spark.dataprep.dedup import minhash_dedup_pairs
    from pyspark.sql import functions as F

    sc = spark.sparkContext
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text body "), (F.col("id") % 7).cast("string")).alias(
            "text"
        ),
    )
    want = max(8, sc.defaultParallelism // 2)

    pat = rf"RoundRobinPartitioning\({want}\), REPARTITION_BY_NUM"

    narrow = docs.coalesce(1)
    plan_narrow = minhash_dedup_pairs(narrow)._jdf.queryExecution().toString()
    assert _re.search(pat, plan_narrow), plan_narrow

    wide = docs.repartition(sc.defaultParallelism * 2)
    plan_wide = minhash_dedup_pairs(wide)._jdf.queryExecution().toString()
    assert not _re.search(pat, plan_wide), plan_wide


def test_enrich_dim_join_is_broadcast(spark):
    """Stream-static enrichment must broadcast the dim side — a
    sort-merge plan here would be impossible on a real stream (the
    stream side can't re-sort) and a shuffled-hash one would rebuild
    the relation every micro-batch."""
    plan = final_plan(q(spark, "st_enrich_dim"))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_streaming_twin_windows_partial_agg(spark):
    """Tumbling-window agg: map-side partial aggregation around one
    exchange, exactly like any groupBy — the window expression must not
    force a pre-shuffle of raw rows."""
    plan = final_plan(q(spark, "st_tumbling_window"))
    assert len(re.findall(r"HashAggregate", plan)) >= 2, plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_window_pipeline_single_sort_per_window(spark):
    """w2 running sum: one exchange on the partition key and one sort —
    the reference's redundant pre-window global orderBy (PPE:69) must
    not reappear (it would show as an extra range-partition Exchange)."""
    plan = final_plan(q(spark, "w2_running_sum"))
    assert "rangepartitioning" not in plan.lower(), plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_stage1_windows_share_one_partitioning(spark):
    """prepare_pings (part 1) keys its vehicle windows on
    (linenumber, id) — the same key extract_patterns (part 2) uses — so
    the stage-1 composite never hash-partitions on bare id. A bare-id
    exchange here means part 1 regressed to the reference's per-id
    windows and the composite pays one extra full-data shuffle."""
    plan = final_plan(q(spark, "pe_pipeline_segments"))
    assert "hashpartitioning(id#" not in plan, (
        "found a bare-id exchange; part-1 windows must key on "
        "(linenumber, id)"
    )


def test_hash_split_is_shuffle_free_and_packing_shuffles_once(spark):
    """The scale contracts of the splits module: hash_split/sample are
    stateless per-row projections (NO exchange — at 100 TB they ride
    the scan), and pack_documents is exactly ONE exchange (the bucket
    hash partitioning its running-sum window needs)."""
    plan_split = final_plan(q(spark, "dp_hash_split"))
    assert "Exchange" not in plan_split, plan_split
    plan_mix = final_plan(q(spark, "dp_weighted_mixture"))
    assert "Exchange" not in plan_mix, plan_mix
    plan_pack = final_plan(q(spark, "dp_sequence_packing"))
    import re as _re

    n_ex = len(_re.findall(r"Exchange hashpartitioning", plan_pack))
    assert n_ex == 1, plan_pack


def test_funnel_is_one_scan_one_exchange(spark):
    """The funnel's windowed-conditional-min formulation must stay one
    events scan + one user-keyed exchange for any step count (the join
    formulation it replaced replayed the scan once per intermediate
    consumer — 7 scans for 3 steps)."""
    plan = final_plan(q(spark, "ev_funnel_users"))
    assert plan.count("FileScan") == 1, plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert "BatchEvalPython" not in plan


def test_hist_rollup_sparse_counts_stay_partial(spark):
    """hist_partial's sparse (group,bin) count must partial-aggregate
    (two HashAggregate levels around its exchange) and never widen into
    the bins-wide aggregate it replaced; the whole pipeline stays
    JVM-side."""
    plan = final_plan(q(spark, "a12_hist_quantile_rollup"))
    assert len(re.findall(r"HashAggregate", plan)) >= 4, plan  # partial+final x2 phases
    assert "BatchEvalPython" not in plan
    assert plan.count("FileScan") == 1, plan


def test_retention_cohort_sizes_broadcast(spark):
    """retention_matrix: one events scan feeding both first-activity and
    activity branches' shared user-keyed exchanges, with cohort sizes
    attached via broadcast (never a shuffled join on the small side)."""
    plan = final_plan(q(spark, "ev_retention_matrix"))
    assert "BroadcastHashJoin" in plan, plan
    assert "BatchEvalPython" not in plan


def test_seeded_shuffle_projection_is_stateless(spark):
    """dp_shard_shuffle: shard + order key are pure per-row projections
    — the only exchange is the bounded oracle-check window's, and there
    is no Python worker."""
    plan = final_plan(q(spark, "dp_shard_shuffle"))
    assert plan.count("FileScan") == 1, plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert "BatchEvalPython" not in plan


def test_unigram_vocab_join_is_broadcast(spark):
    """tx_unigram_logprob: the scoring join must broadcast the V-row
    vocab (the corpus side never shuffles for the join)."""
    plan = final_plan(q(spark, "tx_unigram_logprob"))
    assert "BroadcastHashJoin" in plan, plan
    assert "BatchEvalPython" not in plan


def test_audit_plan_flags_antipatterns_and_passes_clean(spark):
    """plans/audit.py: the plan lint flags row-at-a-time Python UDFs,
    cartesian joins, unpushed filters, and wide scans — and returns no
    findings for the engine's own flagship query."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    from gpssbzd_spark.plans.audit import audit_plan, assert_plan_clean
    from gpssbzd_spark.sources.tables import load_table

    # clean: the TPC-H Q1 rollup (filters pushed, pruned, no Python)
    assert_plan_clean(q(spark, "a7_tpch_q1_rollup"))

    # row-at-a-time Python UDF
    slow = F.udf(lambda x: x + 1, LongType())
    bad_udf = spark.range(10).select(slow("id"))
    kinds = {f.kind for f in audit_plan(bad_udf)}
    assert "python-eval" in kinds

    # cartesian
    bad_join = spark.range(5).crossJoin(spark.range(5))
    assert "cartesian" in {f.kind for f in audit_plan(bad_join)}

    # unpushed filter: wrapping the column in an md5 blocks pushdown
    li = load_table(spark, SF, "lineitem")
    bad_filter = li.filter(F.md5(F.col("l_returnflag").cast("binary")) == "xx")
    assert "unpushed-filter" in {f.kind for f in audit_plan(bad_filter)}

    # wide scan: no projection over a 16-column table
    wide = load_table(spark, SF, "lineitem").filter(F.col("l_quantity") > 0)
    assert "wide-scan" in {f.kind for f in audit_plan(wide)}

    # a deliberate Arrow kernel passes under a declared budget
    arrow = F.pandas_udf(lambda s: s, "long")
    kernel = spark.range(10).select(arrow("id"))
    assert audit_plan(kernel, max_python_stages=1) == []
    assert "python-eval" in {f.kind for f in audit_plan(kernel)}


def test_gapfill_single_aggregate_pass_no_python(spark):
    """ts_bucket_gapfill: the aggregates and the gap sentinel ride ONE
    partial-aggregated pass over one events scan (the spine reuses that
    aggregate — no second scan, no driver calendar), all JVM-side."""
    plan = final_plan(q(spark, "ts_bucket_gapfill"))
    assert plan.count("FileScan") == 1, plan
    assert "BatchEvalPython" not in plan


def test_profile_is_one_pass_one_scan(spark):
    """dp_profile_numeric: all 24 metrics (4 columns x 6) must ride ONE
    aggregate pass over ONE scan — partial+final HashAggregate around a
    single-row exchange, no per-column re-read, no Python."""
    plan = final_plan(q(spark, "dp_profile_numeric"))
    assert plan.count("FileScan") == 1, plan
    assert "BatchEvalPython" not in plan


def test_r6_operators_plan_shapes(spark):
    """Plan gates for the round-6 additions: the bigram scorer's count
    tables broadcast (corpus side never shuffles for scoring), the
    interval-overlap join plans as an equi hash join (never a
    nested-loop/cartesian — the whole point of bucketing), the
    per-group cap needs exactly one exchange (the ranking window), the
    SCD2 collapse shares ONE key exchange across its lag flags, run
    ids, groupBy and valid_to lead, and nothing anywhere drops to a
    Python worker."""
    def exchanges(plan):
        return len(re.findall(r"Exchange hashpartitioning", plan))

    bigram = final_plan(q(spark, "tx_bigram_logprob"))
    assert len(re.findall(r"BroadcastHashJoin", bigram)) >= 3, bigram
    assert "CartesianProduct" not in bigram

    j10 = final_plan(q(spark, "j10_interval_overlap"))
    assert "CartesianProduct" not in j10 and "NestedLoop" not in j10, j10
    # the bucket join itself: an equi join on (key, bucket)
    assert re.search(r"(BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin)", j10)

    cap = final_plan(q(spark, "dp_cap_per_group"))
    assert exchanges(cap) == 1, cap  # the ranking window, nothing else

    scd2 = final_plan(q(spark, "p17_scd2_history"))
    # two partitionings total: the daily-snapshot row_number keys on
    # (user, day); every SCD2 stage after it shares the (user) exchange
    assert exchanges(scd2) <= 2, scd2

    for name in ("tx_bigram_logprob", "j10_interval_overlap",
                 "dp_cap_per_group", "p17_scd2_history", "dp_drift_psi",
                 "dp_outliers_mad", "dp_profile_correlation",
                 "dp_pipeline_pretrain_e2e"):
        assert "EvalPython" not in final_plan(q(spark, name)), name


def test_r7_operators_plan_shapes(spark):
    """Plan gates for the round-7 additions: Q4's EXISTS is a LEFT
    SEMI hash/merge join with the lateness residual INSIDE the join
    (no distinct, no extra aggregate below the rollup); Q21's chain is
    semi+anti keyed joins with no nested-loop anywhere; the windowed
    drift monitor is pure column expressions over its two aggregations
    — no Python stage, no join against the reference (the q literals
    folded into the plan)."""
    q4 = final_plan(q(spark, "q4_order_priority_checking"))
    assert re.search(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin).*LeftSemi", q4), q4
    assert "CartesianProduct" not in q4 and "NestedLoop" not in q4, q4

    q21 = final_plan(q(spark, "q21_suppliers_who_kept_waiting"))
    assert re.search(r"LeftSemi", q21) and re.search(r"LeftAnti", q21), q21
    assert "CartesianProduct" not in q21 and "NestedLoop" not in q21, q21

    drift = final_plan(q(spark, "st_drift_psi"))
    assert "EvalPython" not in drift, drift
    assert "Join" not in drift, drift  # reference folded as literals
    for name in ("q4_order_priority_checking",
                 "q21_suppliers_who_kept_waiting"):
        assert "EvalPython" not in final_plan(q(spark, name)), name


def test_r7_tpch_and_passage_plan_shapes(spark):
    """Plan gates for the second round-7 batch: Q17's qualifying-part
    dim both broadcasts (the enrich join) and drives a LEFT SEMI
    prefilter below the per-part threshold aggregate; Q22's global
    scalar is a broadcast nested-loop over ONE row (the only place a
    nested-loop is the right plan) plus a LEFT ANTI for NOT EXISTS;
    Q13's zero-preserving join stays an OUTER join (a WHERE-style
    rewrite would surface as Inner); passage dedup is pure native
    exprs end-to-end."""
    q17 = final_plan(q(spark, "q17_small_quantity_revenue"))
    assert "BroadcastHashJoin" in q17, q17
    assert re.search(r"LeftSemi", q17), q17
    assert "CartesianProduct" not in q17, q17

    q22 = final_plan(q(spark, "q22_global_sales_opportunity"))
    assert re.search(r"LeftAnti", q22), q22
    assert "BroadcastNestedLoopJoin" in q22, q22  # one-row scalar side

    q13 = final_plan(q(spark, "q13_customer_distribution"))
    assert re.search(r"LeftOuter", q13), q13

    for name in ("q13_customer_distribution", "q17_small_quantity_revenue",
                 "q22_global_sales_opportunity", "dp_passage_dedup"):
        assert "EvalPython" not in final_plan(q(spark, name)), name


def test_pe_pipeline_scans_have_no_unpushed_filters(spark):
    """The pattern-extraction adapter must gate nulls on the BARE
    user_id column so the scan gets a pushed IsNotNull — the derived
    isnotnull(cast(user_id % k as string)) forms Catalyst cannot push
    (found by the repo's own audit_plan self-audit, round 6)."""
    from gpssbzd_spark.plans.audit import audit_plan

    findings = [
        f
        for f in audit_plan(q(spark, "pe_pipeline_segments"), max_python_stages=9)
        if f.kind == "unpushed-filter"
    ]
    assert not findings, findings


def test_r8_tpch_plans_broadcast_stars_no_smj(spark):
    """Round-8 TPC-H batch plan gates: every star query resolves its
    dim joins to broadcasts (zero SortMergeJoin anywhere — a shuffled
    dim join would be a silent 100 TB regression), no accidental
    cartesian products, the one-row scalar broadcasts in q11/q15 are
    the ONLY nested-loop sites, q10 takes its top-20 with
    TakeOrderedAndProject (no global sort), and q6 is pure scan-side
    aggregation: no join operator at all and the date/quantity
    predicates pushed to the parquet scan."""
    stars = (
        "q2_min_cost_supplier",
        "q8_market_share",
        "q10_returned_items",
        "q14_promo_revenue",
        "q16_parts_supplier_counts",
        "q19_discounted_revenue",
        "q20_potential_promotion",
    )
    for name in stars:
        plan = final_plan(q(spark, name))
        assert "SortMergeJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "BroadcastHashJoin" in plan, name
        assert "EvalPython" not in plan, name

    # q7/q9 deliberately carry fact-side joins a 100 TB cluster CANNOT
    # broadcast (lineitem⋈orders on orderkey; q7 additionally ⋈customer
    # on custkey — customer is a scale-growing dim). At fixture scale
    # the default threshold would auto-broadcast orders and silently
    # pin the OPPOSITE plan from the one the query notes claim
    # (ADVICE r8), so gate under autoBroadcastJoinThreshold=-1: every
    # EXPLICITLY hinted dim must still broadcast, and exactly the
    # intended fact-side joins sort-merge.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for name, n_smj in (
            ("q9_product_type_profit", 1),
            ("q7_volume_shipping", 2),
        ):
            plan = final_plan(q(spark, name))
            assert "CartesianProduct" not in plan, name
            assert "BroadcastNestedLoopJoin" not in plan, name
            assert "BroadcastHashJoin" in plan, name
            assert "EvalPython" not in plan, name
            assert plan.count("SortMergeJoin") == n_smj, (name, plan)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    for name in ("q11_important_stock", "q15_top_supplier"):
        plan = final_plan(q(spark, name))
        assert "SortMergeJoin" not in plan, name
        # the broadcast one-row threshold/max — the intended exception
        assert plan.count("BroadcastNestedLoopJoin") <= 1, name

    q10 = final_plan(q(spark, "q10_returned_items"))
    assert "TakeOrderedAndProject" in q10, q10

    spark.conf.set("spark.sql.maxMetadataStringLength", "1000")
    try:
        q6 = final_plan(q(spark, "q6_forecast_revenue"))
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")
    assert "Join" not in q6, q6
    m = re.search(r"PushedFilters: \[([^\]]*)\]", q6)
    assert m and "l_shipdate" in m.group(1) and "l_quantity" in m.group(1), q6


def test_mm_video_pixel_roundtrip_is_single_stage(spark):
    """The PNG-codec video pixel roundtrip keeps the same shape as the
    metadata roundtrip: synth → sample-table walk → per-frame PNG
    decode → project, all inside ONE mapInPandas pipeline — scan pruned
    to doc_id, and the only exchange permitted is synth_media's
    conditional partition-count floor (r14: widen_small_input on the id
    projection — the decode chain otherwise ran one Python worker off
    the 1-split fixture scan; a wide production scan takes the
    zero-exchange path)."""
    spark.conf.set("spark.sql.maxMetadataStringLength", "1000")
    try:
        plan = final_plan(q(spark, "mm_video_pixel_roundtrip"))
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")
    n_ex = len(re.findall(r"Exchange", plan))
    assert n_ex <= 1 and n_ex == len(
        re.findall(r"Exchange hashpartitioning\(doc_id", plan)
    ), plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and {c.split(":")[0] for c in m.group(1).split(",") if c} == {
        "doc_id"
    }, plan


def test_mm_decode_roundtrip_is_single_stage(spark):
    """The multimodal decode roundtrip is synth → decode → project
    inside ONE mapInPandas pipeline: a pruned scan that reads only
    doc_id, and at most synth_media's conditional widen exchange (see
    the video-roundtrip gate above — no-op on wide inputs)."""
    spark.conf.set("spark.sql.maxMetadataStringLength", "1000")
    try:
        plan = final_plan(q(spark, "mm_decode_roundtrip"))
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")
    n_ex = len(re.findall(r"Exchange", plan))
    assert n_ex <= 1 and n_ex == len(
        re.findall(r"Exchange hashpartitioning\(doc_id", plan)
    ), plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and {c.split(":")[0] for c in m.group(1).split(",") if c} == {
        "doc_id"
    }, plan


def test_bm25_plan_broadcasts_stats_no_smj_no_python(spark):
    """BM25's posting-list discipline in the physical plan: the query
    terms, df table, and one-row stats all broadcast (no sort-merge
    join anywhere), the only wide move is the tf/score aggregation
    pair, and the whole path stays JVM-side."""
    from gpssbzd_spark.dataprep.text import bm25_topk
    from gpssbzd_spark.sources import load_table

    d = load_table(spark, SF, "documents")
    df = bm25_topk(d, [(1, "window hash join"), (2, "stream batch")], k=5)
    plan = final_plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
    # the one-row stats side rides a broadcast nested loop, never a
    # shuffled cross
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert not re.search(r"(BatchEvalPython|ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas)", plan), plan


def test_repeated_spans_plan_no_cartesian_no_python(spark):
    """The repeated-span path must be two gram-keyed moves (frequency
    rollup with partial aggregation, flag join) plus the per-doc
    interval-merge window — never a pair join over documents and never
    a Python worker."""
    from gpssbzd_spark.dataprep.dedup import repeated_spans
    from gpssbzd_spark.sources import load_table

    d = load_table(spark, SF, "documents")
    plan = final_plan(repeated_spans(d, n=6, min_docs=2))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # partial agg before the exchange on the gram rollup
    assert "partial_count" in plan or "HashAggregate" in plan, plan
    assert not re.search(r"(BatchEvalPython|ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas)", plan), plan


def test_semdedup_pair_join_is_cid_keyed_equi_join(spark):
    """SemDeDup's pair generation must be an equi-join on the cluster
    id (the n²/C blocked shape), never an unkeyed cross join; the only
    Python in the plan is the one Arrow assignment matmul."""
    from gpssbzd_spark.dataprep.dedup import semantic_dedup_pairs
    from gpssbzd_spark.sources import load_table

    em = load_table(spark, SF, "embeddings")
    plan = final_plan(
        semantic_dedup_pairs(em, dim=64, n_clusters=8, threshold=0.5)
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert re.search(r"_semcid", plan), plan
    # exactly one Arrow pandas UDF evaluation per side of the join
    # lineage (the centroid assignment); no row-at-a-time Python
    assert "BatchEvalPython" not in plan, plan
