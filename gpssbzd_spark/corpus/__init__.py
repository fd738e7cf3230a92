"""Query corpus: named queries + DuckDB oracle SQL (the correctness gate).

Every operator from SURVEY.md §2 has at least one named query here, built
with the engine's DataFrame-first operators, plus an equivalent ANSI-SQL
string the driver runs on DuckDB over the same parquet tables. Column
names/types are aligned on both sides; float outputs are rounded so the
order-insensitive value-hash is stable across engines.
"""

from __future__ import annotations

import glob
import json
import os
import re
from dataclasses import dataclass, field
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    note: str = ""
    tier: int = 0
    seq: int = 0


CORPUS: dict[str, Query] = {}

# The driver's correctness gate compares the FIRST `DRIVER_WINDOW`
# registered queries against their DuckDB oracles; later registrations
# still run under pytest (tests/test_corpus_oracle.py) but get no
# driver CORRECTNESS row. Tier 0 is therefore the curated 50-query
# diagnostic set — exactly one (or one merged) query per SURVEY.md §2
# component — and higher tiers are extra evidence sorted past the cap.
DRIVER_WINDOW = 50


def query(name: str, oracle: str | None = None, note: str = "", tier: int = 0):
    """Register a corpus query. ``oracle=None`` → rows-only check.

    ``tier`` orders the registry the driver sees: tier 0 sorts into the
    driver's correctness window, tier >= 1 past it (stable by
    registration order within a tier).
    """

    def deco(fn):
        assert name not in CORPUS, f"duplicate corpus query {name}"
        CORPUS[name] = Query(
            name=name, fn=fn, oracle=oracle, note=note, tier=tier, seq=len(CORPUS)
        )
        return fn

    return deco


# --------------------------------------------------------------------------
# Driver-window rotation (VERDICT r4 next-round #5)
#
# 31 tier-2 queries carry full oracles but never earned a driver
# CORRECTNESS row because the window composition was static. Each group
# below is one driver slot shared round-robin between a tier-0 ANCHOR
# and same-§2-family tier-2 ALTERNATES (every alternate carries a real
# oracle, so the window's oracle share never degrades). Each round the
# group's pick swaps sort keys with the anchor; everything else keeps
# its static tier. The round key is deterministic: the count of
# driver-committed CORRECTNESS_r*.json files at the repo root + 1
# (overridable via SPARK_GRAFT_ROUND for tests), so the window
# composition differs round-over-round without any code change, and all
# tier-2 oracles eventually earn driver rows.
#
# Merged rows covering TWO §2 components (w45_bidirectional_fill,
# f3_haversine_native_and_sql, f1's pair) do not rotate — no single
# alternate covers both halves of their slot.
# --------------------------------------------------------------------------

ROTATION_GROUPS: list[tuple[str, list[str]]] = [
    ("tc_pipeline_dbscan", ["tc_pipeline_dbscan_general"]),
    ("p7_filter_distinct",
     ["p7_filter_compound_bool", "p10_distinct_projection",
      "p8_sql_string_filter", "p12_cast_types",
      "p15_merge_upsert", "p16_snapshot_diff", "dp_profile_numeric",
      "p17_scd2_history"]),
    ("j5_semi_anti_join", ["j5_semi_join", "j6_anti_join"]),
    ("j8_range_join_broadcast", ["j10_interval_overlap"]),
    ("a7_tpch_q1_rollup",
     ["q3_shipping_priority", "q5_local_supplier_volume",
      "q18_large_volume_customers", "q4_order_priority_checking",
      "q21_suppliers_who_kept_waiting", "q13_customer_distribution",
      "q17_small_quantity_revenue", "q22_global_sales_opportunity",
      "q2_min_cost_supplier", "q11_important_stock",
      "q6_forecast_revenue", "q7_volume_shipping", "q8_market_share",
      "q9_product_type_profit", "q10_returned_items",
      "q14_promo_revenue", "q15_top_supplier",
      "q16_parts_supplier_counts", "q19_discounted_revenue",
      "q20_potential_promotion"]),
    ("a4_percentile_exact",
     ["dp_outliers_mad", "dp_profile_correlation", "dp_drift_psi"]),
    ("a2_cascaded_conditional",
     ["a2_conditional_agg", "a3_cascaded_agg",
      "a1_count_distinct_group", "a6_global_distinct_count",
      "a10_pivot_wide", "a11_unpivot_long",
      "a12_hist_quantile_rollup", "ev_funnel_users",
      "ev_retention_matrix", "ev_funnel_steps",
      "ev_transition_matrix", "a13_cube_grouping_sets"]),
    ("set_ops_tagged",
     ["set_union_distinct", "set_intersect", "set_except"]),
    ("f2_string_case", ["f2_string_fns", "f4_case_when"]),
    ("f5_array_struct_math", ["f5_json_extract"]),
    ("dd_exact_dup_groups",
     ["dd_exact_dedup_survivors", "dp_hash_split", "dp_weighted_mixture",
      "dp_sequence_packing", "dp_stratified_sample", "dp_zorder_cells",
      "dp_shard_shuffle", "dp_chunk_documents", "dp_cap_per_group",
      "dp_pipeline_pretrain_e2e", "dp_passage_dedup", "dd_repeated_spans"]),
    # the portable twins rotate against their kernel counterparts'
    # rows-only slots: alternate rounds give the SAME family hash-match
    # driver evidence (portable md5 family) and kernel-path rows
    ("dd_minhash_lsh_pairs",
     ["dd_minhash_portable_pairs", "dd_neardup_clusters"]),
    ("dd_embedding_cosine_blocked",
     ["dd_embedding_lsh_portable_pairs", "dd_embedding_neardup_clusters",
      "dd_semdedup_pairs"]),
    ("dd_simhash_buckets", ["dd_simhash_portable_pairs"]),
    ("sim_topk_lsh", ["sim_topk_lsh_portable"]),
    ("sim_topk_brute", ["sim_topk_ivf_portable"]),
    ("tx_doc_features",
     ["tx_token_stats", "tx_quality_score", "tx_language_id",
      "dp_pipeline_corpus_clean", "tx_bpe_token_count", "tx_pii_scrub",
      "tx_repetition_filter", "tx_vocab_heavy_hitters",
      "dp_decontaminate_overlap", "tx_unigram_logprob",
      "tx_tfidf_terms", "tx_bigram_logprob", "tx_bm25_topk"]),
    ("j7_asof_join_backward", ["j7b_asof_join_forward"]),
    ("dd_embedding_cosine_pairs", ["sim_cosine_to_centroid"]),
    ("st_tumbling_window",
     ["st_sliding_window", "ts_bucket_gapfill", "ts_bucket_interpolate",
      "st_drift_histogram", "st_drift_psi"]),
    ("st_enrich_dim",
     ["st_stream_stream_join", "st_dedup_within_watermark",
      "st_upsert_state", "st_funnel_stateful", "st_incremental_dedup"]),
    ("j1_join_inner", ["j9_salted_join"]),
    ("s_csv_roundtrip",
     ["s_jsonl_roundtrip", "s_orc_roundtrip", "s_partitioned_pruned_scan"]),
    ("mm_frame_sample",
     ["mm_video_pixel_roundtrip", "mm_frames_to_image_features"]),
]

# Names the global debt-lending pass drains FIRST (VERDICT r7 #4 called
# these out by name: the flagship pipeline deserves a driver hash row,
# and the rows-only kernel queries deserve rows-only driver evidence).
# Order matters — consumed front-to-back before the seq-ordered rest.
DRAIN_PRIORITY: list[str] = [
    "dp_pipeline_pretrain_e2e",
    "mm_decode_roundtrip",
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q21_suppliers_who_kept_waiting",
    "tx_tfidf_terms",
    "a13_cube_grouping_sets",
    "ev_funnel_steps",
    "ts_bucket_interpolate",
    "sim_topk_ivf_build",
    "sim_topk_ivf_query",
    "dd_neardup_clusters_kernel",
    "dd_simhash_near_pairs",
    "a9_hll_mergeable_rollup",
    "mm_feature_extract",
    "sim_topk_ivf",
]

# Max non-grouped tier-0 window slots the debt-lending pass may borrow
# per round (VERDICT r9 #1: 27 debt names vs 24 rotation groups at the
# r10 drain — the group slots alone cannot drain the queue in one
# round). A loan displaces one always-present family row for ONE
# round. r12 raised the cap from 12 to the full lendable pool: at
# N≈182 the STEADY_CADENCE=4 contract demands refreshing ~N/4 ≈ 46 of
# the 50 window slots per round anyway (the steady-state slice is
# exactly that size), so capping debt-round throughput BELOW steady
# throughput only let the historical tail regrow (VERDICT r11 #3: 51
# queries >4 rounds stale, 16 of them un-drainable in one round at
# cap 12). The loan pass still lends only as many slots as the queue
# actually demands — fresh rounds lend nothing.
LEND_CAP = 26

# Steady-state re-proof cadence (VERDICT r9 #7): once the debt is zero,
# every registered query must earn a fresh driver row at least every
# STEADY_CADENCE rounds. The steady-state rotation guarantees it by
# cycling a contiguous slice of ceil(N / STEADY_CADENCE) registry
# positions through the window each round.
STEADY_CADENCE = 4

# Tiered cadence (VERDICT r12 #6 — rotation solvency): at N=185 a flat
# 4-round cadence demands ceil(185/4)=47 of 50 window slots per round;
# a handful more registrations and the contract is arithmetically
# unsatisfiable. The cheapest, longest-stable rows — pure-Catalyst
# relational/function/window queries, hash-green at every driver check
# for many consecutive rounds, zero persisted state — re-prove on a
# relaxed LONG_CADENCE instead, cutting steady demand to
# Σ 1/cadence(n) ≈ 36/round and leaving real headroom for new-query
# debt (asserted by tests/test_registry.py::test_rotation_solvency_
# headroom). Membership is curated, not inferred: only rows whose
# whole history is driver-green and whose plan is a plain Catalyst
# pipeline (no Python kernel, no index/cache state that could rot
# between checks) belong here. Rows with open perf or freshness
# questions must stay on STEADY_CADENCE.
LONG_CADENCE = 8
LONG_CADENCE_NAMES = frozenset({
    # basic projections / filters / dedup / casts
    "p1_scan_project_filter", "p5_filter_in_list",
    "p7_filter_compound_bool", "p8_sql_string_filter",
    "p10_distinct_projection", "p9_dedup_keep_first",
    "p7_filter_distinct", "p13_null_handling", "p12_cast_types",
    # joins (equi / broadcast / semi-anti / asof / range / interval)
    "j1_join_inner", "j2_join_left_broadcast_dim",
    "j3_join_left_attach_agg", "j4_self_theta_pair_join",
    "j5_semi_join", "j6_anti_join", "j5_semi_anti_join",
    "j7_asof_join_backward", "j7b_asof_join_forward",
    "j8_range_join_broadcast", "j10_interval_overlap",
    "j9_salted_join",
    # TPC-H rows (minus the r08-vintage ones: q2/q9/q11/q21 stay on
    # the short cadence until well past their r13 refresh)
    "q3_shipping_priority", "q5_local_supplier_volume",
    "q18_large_volume_customers", "q4_order_priority_checking",
    "q13_customer_distribution", "q17_small_quantity_revenue",
    "q22_global_sales_opportunity", "q6_forecast_revenue",
    "q7_volume_shipping", "q8_market_share", "q10_returned_items",
    "q12_shipmode_priority", "q14_promo_revenue", "q15_top_supplier",
    "q16_parts_supplier_counts", "q19_discounted_revenue",
    "q20_potential_promotion",
    # aggregates / rollups / sketch rollups / reshape
    "a8_rollup_grouping", "a1_count_distinct_group",
    "a9_hll_mergeable_rollup", "a12_hist_quantile_rollup",
    "a2_conditional_agg", "a3_cascaded_agg", "a2_cascaded_conditional",
    "a4_percentile_exact", "a5_collect_list_ordered",
    "a6_global_distinct_count", "a7_tpch_q1_rollup",
    "a4_percentile_approx", "a1_approx_count_distinct",
    "a10_pivot_wide", "a11_unpivot_long",
    # ordering / set ops
    "o1_global_topk", "set_union_distinct", "set_intersect",
    "set_except", "set_ops_tagged",
    # scalar function families
    "f1_datetime_parts", "f1_timestamp_arithmetic", "f2_string_fns",
    "f2_string_case", "f3_haversine_native",
    "f3b_haversine_sql_registered", "f3_haversine_native_and_sql",
    "f4_case_when", "f5_json_extract", "f5_array_struct_math",
    # source round-trips
    "s_csv_roundtrip", "s_jsonl_roundtrip", "s_orc_roundtrip",
    "s_partitioned_pruned_scan",
    # window functions
    "w1_lag_lead", "w2_running_sum", "w3_topk_per_group",
    "w4_forward_fill", "w5_backward_fill", "w45_bidirectional_fill",
    "w6_ranking_set", "w7_sessionize_gap", "w8_range_frame_trailing",
    # CDC / reshape (minus r08-vintage p17_scd2_history)
    "p15_merge_upsert", "p16_snapshot_diff",
    # events / time-series (minus r08-vintage ev_funnel_steps /
    # ts_bucket_interpolate)
    "ev_funnel_users", "ev_transition_matrix", "ev_retention_matrix",
    "ts_bucket_gapfill",
})


def cadence(name: str) -> int:
    """Per-name re-proof cadence: LONG_CADENCE for the curated stable
    tier, STEADY_CADENCE for everything else."""
    return LONG_CADENCE if name in LONG_CADENCE_NAMES else STEADY_CADENCE


# Changed-query ledger (VERDICT r13 next-round #1/#7): name → the round
# in which the query's IMPLEMENTATION (its body, or library code on its
# execution path) or its oracle was materially reshaped. Driver evidence
# from rounds STRICTLY BELOW the recorded round is invalidated — the
# name drops out of the sampled set and re-enters the debt queue, so the
# next window re-proves it like a never-sampled query, regardless of
# cadence tier (a LONG_CADENCE row with a fresh change cannot coast on
# pre-change evidence by construction). Maintained BY HAND as part of
# the end-of-round checklist: whenever a round reshapes code on a
# registered query's path, record {name: that round} here in the same
# commit. Entries whose change round is already covered by newer
# committed evidence are inert and may be pruned.
# Enforcement: tests/test_registry.py::test_changed_queries_reenter_window
# fails if any changed-since-evidence name is missing from the current
# window, and test_changed_in_round_well_formed pins map hygiene.
CHANGED_IN_ROUND: dict[str, int] = {
    # r14 manifest consolidation (dataprep/manifest.py — VERDICT r13
    # #2): every query whose plan runs the sigindex/ivfindex/lshindex
    # commit/read/supersedence machinery
    "dd_incremental_index_append": 14,
    "sim_topk_ivf_append": 14,
    "sim_topk_ivf_grown_query": 14,
    "sim_topk_lsh_append": 14,
    "sim_topk_lsh_persisted_query": 14,
    "sim_topk_index_compact": 14,  # + r13 verify reshape, still unproven
    # r14 ingest-loop cadence compaction (VERDICT r13 #5; + the r13
    # final-day-fold reshape, still unproven by a driver row)
    "dp_pipeline_ingest_e2e": 14,
    # r14 allocation-quiet minhash kernels (VERDICT r13 #4); r15:
    # narrow-gated half-parallelism widening of the LSH candidate set
    # before the prefilter+verify chain (VERDICT r14 #3 — the chain is
    # 87% JVM CPU, not Python-worker-bound; rows proved identical)
    "dd_minhash_lsh_pairs": 15,
    "dd_neardup_clusters_kernel": 15,
    # r14 OPTIMIZATION round: partition-count floors before expensive
    # narrow chains (sources/tables.widen_small_input), fingerprint
    # pin in simhash_near_pairs, pushdown fences in the portable
    # signature paths and pretrain, concurrent per-column aggregation
    # jobs in outliers_mad — results identical (oracle-proved), plans
    # reshaped
    "dd_simhash_near_pairs": 14,
    "dd_simhash_buckets": 14,
    "dp_pipeline_pretrain_e2e": 14,
    "dd_minhash_portable_pairs": 14,
    "dd_neardup_clusters": 14,
    "dd_incremental_neardup": 14,
    "st_incremental_dedup": 14,
    "dd_semdedup_pairs": 14,
    "dd_semdedup_pairs_hier": 14,
    "dp_outliers_mad": 14,
    # r14 optimization: literal parameter tables moved off the
    # Python-pickled-slices createDataFrame path onto pandas+Arrow
    # (sources/tables.local_rows) — same rows/schema, no per-action
    # Python-worker round trips
    "tc_pipeline_components": 14,
    "tc_pipeline_dbscan": 14,
    "tc_pipeline_dbscan_general": 14,
    "j8_range_join_broadcast": 14,
    # same local_rows conversion, dataprep literal tables (LSH planes,
    # IVF centroids/probes, BM25 query terms)
    "dd_embedding_lsh_portable_pairs": 14,
    "dd_embedding_neardup_clusters": 14,
    "sim_topk_ivf_query_pruned": 14,
    "sim_topk_lsh_portable": 14,
    "tx_bm25_topk": 14,
    "tx_bm25_topk_capped": 14,
    "dp_decontaminate_semantic": 14,  # composes embedding_lsh_portable
    # r14 optimization: partition-count floors (widen_small_input)
    # before the twice-consumed gram explode (repeated_spans) and the
    # multi-distinct Expand (profile_numeric) — results identical
    "dd_repeated_spans": 14,
    "dp_profile_numeric": 14,
    # r14 optimization: explicit scale-adaptive count on the batch-twin
    # keyed repartition (sources/tables.keyed_repartition) — the
    # count-less form AQE-coalesced to one task at fixture scale
    "st_stateful_sessionize": 14,
    "st_funnel_stateful": 14,
    # r14 optimization: prepare_pings — explicit (linenumber, id)
    # exchange pin + dedup re-expressed inside that partitioning (run-
    # start detection in (lng, lat, ts) order), dropping two exchanges;
    # rows identical (oracle-proved at sf0.001/sf0.01)
    "pe_pipeline_segments": 14,
    # r14 optimization: partition-count floors in embedding_cosine_pairs
    # and embedding_lsh_portable (widen before the per-vector prep /
    # quantize pin) — results identical
    "dd_embedding_cosine_pairs": 14,
    "dd_embedding_cosine_blocked": 14,
    # r14 optimization: partition-count floor on the synth-media id
    # projection (the whole decode chain ran on one Python worker)
    "mm_decode_roundtrip": 14,
    "mm_frames_to_image_features": 14,
    "mm_video_pixel_roundtrip": 14,
    # r14 optimization: bounded LM vocab/total pins lifted to driver
    # literals (collect + local_rows) — localCheckpoint materializes
    # through the non-AQE RDD path at initialPartitionNum (256-task
    # stages for KBs); values identical
    "tx_unigram_logprob": 14,
    "tx_bigram_logprob": 14,
    # r15 OPTIMIZATION round: keyed_repartition floor capped at
    # min(parallelism, max(8, 4×upstream)) (VERDICT r14 #1 — the
    # capped width beat the flat 32-wide pin in every interleaved
    # round under an induced degraded-host load and ties it idle;
    # identical at real scale and ≤8 cores by construction)
    "pe_pipeline_segments": 15,
    "st_stateful_sessionize": 15,
    "st_funnel_stateful": 15,
    # r15: the two corpus-sized localCheckpoint pins made
    # SIZE-CONDITIONAL (sources/tables.pin_if_small — VERDICT r14 #4);
    # at fixture scale the pins still fire, results proved identical
    # on both paths
    "dp_pipeline_pretrain_e2e": 15,
    "dp_outliers_mad": 15,
    # r15: contamination_pairs — partition floor before the corpus-side
    # n-gram explode + removal of the semantically-redundant
    # size(_grams)>0 filter whose pushdown double-evaluated the gram
    # transform per eval row (rows proved identical; 1.5-2.2× per
    # interleaved round)
    "dp_decontaminate_overlap": 15,
}


def _changed_since(name: str, latest_round: int) -> bool:
    """True when ``name``'s newest committed evidence predates its
    recorded implementation change."""
    return latest_round < CHANGED_IN_ROUND.get(name, 0)

_STATE_CACHE: tuple[int, frozenset[str]] | None = None


def _committed_round_indices(root: str) -> list[int] | None:
    """Round indices of CORRECTNESS files committed to git HEAD, or
    None when git state is unavailable (no repo, no HEAD yet)."""
    import subprocess

    try:
        out = subprocess.run(
            ["git", "-C", root, "ls-tree", "-r", "HEAD", "--name-only"],
            capture_output=True,
            text=True,
            timeout=30,
        )
    except (OSError, subprocess.TimeoutExpired):
        return None
    if out.returncode != 0:
        return None
    idx = []
    for line in out.stdout.splitlines():
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", line.strip())
        if m:
            idx.append(int(m.group(1)))
    return idx


def _window_state() -> tuple[int, frozenset[str]]:
    """One atomic snapshot of (round key, sampled set).

    Round key: SPARK_GRAFT_ROUND env if set, else 1 + the highest round
    index among CORRECTNESS_r*.json files **committed to git HEAD**
    (disk fallback when git is unavailable). The driver writes the
    in-flight round's file to DISK mid-round but only commits it at
    round end, so keying off HEAD keeps the key — and therefore the
    sampled set and the window — identical for every process launched
    anywhere inside a round (ADVICE r8: the disk-glob key shifted when
    the driver wrote the in-flight file mid-round). Corollary: never
    `git add` an in-flight CORRECTNESS/BENCH record from inside the
    round — that is the driver's round-end commit.

    Sampled set: names that earned a NON-ERROR row in any round
    STRICTLY BELOW the key, where a ``no_oracle`` rows-only marker
    only counts while the query STILL has no oracle (VERDICT r9 #1:
    ten r8-era rows-only rows predated their oracles — evidence that
    predates the oracle is stale, so the name re-enters debt until a
    hash row lands). A genuine err row (e.g. r8's sim_topk_ivf_build
    return-shape TypeError) is never evidence. Cached per process."""
    global _STATE_CACHE
    if _STATE_CACHE is None:
        _load_all()
        root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        indexed: list[tuple[int, str]] = []
        for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
            m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
            if m:
                indexed.append((int(m.group(1)), f))
        key: int | None = None
        env = os.environ.get("SPARK_GRAFT_ROUND")
        if env is not None:
            try:
                key = int(env)
            except ValueError:
                key = None
        if key is None:
            committed = _committed_round_indices(root)
            if committed is not None:
                key = 1 + max(committed, default=0)
            else:
                key = 1 + max((i for i, _ in indexed), default=0)
        # evidence validity is shared with _latest_evidence_rounds
        # (clean rows always; a ``no_oracle`` rows-only row only while
        # the query STILL has no oracle), and the changed-query ledger
        # invalidates evidence older than the recorded reshape round
        # (VERDICT r13 #1) so changed queries re-enter debt.
        latest = _latest_evidence_rounds(key)
        names = {n for n, r in latest.items() if not _changed_since(n, r)}
        _STATE_CACHE = (key, frozenset(names))
    return _STATE_CACHE


def _round_key() -> int:
    return _window_state()[0]


_LATEST_CACHE: dict[int, dict[str, int]] = {}


def _latest_evidence_rounds(key: int | None = None) -> dict[str, int]:
    """name → NEWEST round STRICTLY BELOW ``key`` (default: the current
    round key) whose committed CORRECTNESS row still counts as
    evidence — the same validity rule as _window_state (clean rows
    always; a ``no_oracle`` rows-only row only while the query STILL
    has no oracle). Feeds the stale-backfill pass in
    :func:`rotation_swaps` (VERDICT r10 #3: 13 queries' newest driver
    row was r01-vintage because debt rounds suspend the steady-state
    slice — staleness must drain through the debt queue too, not wait
    for the next fully-drained round). Cached PER KEY (ADVICE-style
    r11 review fix: the unkeyed version computed every explicit-key
    window reconstruction against the process-global cutoff, making
    past-round windows non-reproducible)."""
    if key is None:
        key = _round_key()
    if key not in _LATEST_CACHE:
        _load_all()
        root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        latest: dict[str, int] = {}
        for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
            m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
            if not m or int(m.group(1)) >= key:
                continue
            rnd = int(m.group(1))
            try:
                with open(f) as fh:
                    rows = json.load(fh)
            except (OSError, ValueError):
                continue
            for n, row in rows.items():
                err = (row or {}).get("err")
                if not err or (
                    err == "no_oracle"
                    and (n not in CORPUS or CORPUS[n].oracle is None)
                ):
                    latest[n] = max(latest.get(n, 0), rnd)
        _LATEST_CACHE[key] = latest
    return _LATEST_CACHE[key]


def _sampled_names() -> frozenset[str]:
    """Names that earned a driver CORRECTNESS row in any round BEFORE
    the current one (see _window_state for the coherence contract)."""
    return _window_state()[1]


def _steady_swaps(
    key: int, latest: dict[str, int] | None = None
) -> dict[str, str]:
    """Steady-state rotation once ALL debt has drained (VERDICT r9 #7):
    ``ceil(N / STEADY_CADENCE)`` registry names are guaranteed in-window
    each round.

    With the committed-evidence ledger available (``latest`` — the
    real driver path), the refresh set is EARLIEST-DEADLINE-FIRST
    (deadline = latest evidence round + the name's cadence; ties by
    oldest evidence then seq): each round re-proves the most-due
    ceil(N/4), so the cadence bound holds by pigeonhole (Σ 1/cadence
    per-round demand < the refresh capacity, asserted by the solvency
    test) AND any staleness tail left behind by debt rounds drains
    immediately instead of waiting for a seq-tiled slice to wheel
    around to it (VERDICT r12 missing #2: five r07-vintage rows sat 5
    rounds stale while fresh slices rotated past them — the tiled
    slice advances by position, not by need).

    Without a ledger (tests injecting a synthetic ``sampled``), the
    original deterministic tiling runs: a contiguous slice of the
    seq-ordered registry advancing by its own length per round, so
    consecutive slices tile the registry and ANY ``STEADY_CADENCE``
    consecutive rounds cover every registered query.

    Picked members that are tier-0 simply stay in the window (and are
    exempt from vacating); tier>0 picks displace tier-0 rows NOT
    picked, chosen by a rotating offset so no single family row is
    starved between its own appearances."""
    pool = sorted(CORPUS.values(), key=lambda q: q.seq)
    n = len(pool)
    size = min(-(-n // STEADY_CADENCE), DRIVER_WINDOW)  # ceil, capped
    if latest is not None:
        slice_names = [
            q.name
            for q in sorted(
                pool,
                key=lambda q: (
                    latest.get(q.name, 0) + cadence(q.name),
                    latest.get(q.name, 0),
                    q.seq,
                ),
            )
        ][:size]
    else:
        off = ((key - 1) * size) % n
        slice_names = [pool[(off + j) % n].name for j in range(size)]
    incoming = [m for m in slice_names if CORPUS[m].tier > 0]
    in_slice = set(slice_names)
    vacatable = [q.name for q in pool if q.tier == 0 and q.name not in in_slice]
    k = len(incoming)
    assert k <= len(vacatable), (
        f"steady slice needs {k} vacancies but only {len(vacatable)} "
        f"tier-0 rows are outside the slice — DRIVER_WINDOW too small "
        f"for STEADY_CADENCE={STEADY_CADENCE} at N={n}"
    )
    voff = (key * max(k, 1)) % len(vacatable) if vacatable else 0
    vacated = [vacatable[(voff + j) % len(vacatable)] for j in range(k)]
    return dict(zip(vacated, incoming))


def rotation_swaps(
    key: int | None = None, sampled: frozenset[str] | None = None
) -> dict[str, str]:
    """slot name (a tier-0 row leaving the window this round) → pick
    (the name taking its place), for slots whose pick is not the slot
    itself.

    DEBT-AWARE (VERDICT r6 #5): a group whose choices include names
    that never earned a (still-valid) driver CORRECTNESS row
    round-robins among THOSE first, so each indebted group retires one
    debt query per round instead of re-proving sampled ones.

    GLOBAL DEBT LENDING (VERDICT r7 #4): after the per-group pass, any
    group with NO debt of its own lends its window slot to the global
    queue of still-unsampled tier>0 queries (DRAIN_PRIORITY names
    first, then registration order) — so the drain rate is bounded by
    the number of groups, not by one-per-indebted-group, and group-less
    queries (the rows-only kernels, the flagship) earn driver rows too.

    LOAN PASS (VERDICT r9 #1): if the queue outnumbers the free group
    slots, up to LEND_CAP non-grouped tier-0 rows lend their slot for
    the round (rotating which, so no family row is repeatedly the one
    skipped) — the drain capacity per round is #groups +
    min(LEND_CAP, sampled non-anchor tier-0 count): only SAMPLED rows
    may lend, so with several unsampled tier-0 rows the effective loan
    capacity is smaller than the nominal cap (ADVICE r10).

    STALE BACKFILL (VERDICT r10 #3): debt rounds suspend the
    steady-state slice, so evidence can silently age while new
    queries drain (13 rows were r01-vintage by r10). After genuine
    debt, the queue continues with SAMPLED tier>0 names whose newest
    committed row is ≥ STEADY_CADENCE rounds old, oldest evidence
    first — spare drain capacity re-proves the stalest rows instead
    of idling on the group round-robin. Disk-state-only (skipped when
    tests inject a synthetic ``sampled``).

    Once ALL debt drains, the steady-state slice rotation takes over
    (see _steady_swaps): every registered query re-proves within
    STEADY_CADENCE rounds. ``sampled`` overrides the disk state for
    tests."""
    use_disk_staleness = sampled is None
    if key is None:
        key = _round_key()
    if sampled is None:
        sampled = _sampled_names()
    _load_all()
    if all(n in sampled for n in CORPUS):
        return _steady_swaps(
            key, _latest_evidence_rounds(key) if use_disk_staleness else None
        )
    out: dict[str, str] = {}
    used: set[str] = set()
    free: list[tuple[int, str, list[str]]] = []
    latest = _latest_evidence_rounds(key) if use_disk_staleness else {}
    for i, (anchor, alts) in enumerate(ROTATION_GROUPS):
        choices = [anchor] + alts
        unsampled = [c for c in choices if c not in sampled]
        if unsampled:
            pick = unsampled[(key + i) % len(unsampled)]
            used.add(pick)
            if pick != anchor:
                out[anchor] = pick
            continue
        # GROUP-STALE PASS (VERDICT r11 #1): the tier>0 stale-backfill
        # queue below can never re-prove a tier-0 ANCHOR — debt rounds
        # keep swapping anchors out for alternates, so seven anchors
        # sat at r04-vintage evidence by r11. Before lending its slot,
        # a debt-free group re-picks its OWN stalest member (anchor
        # included) once that member's newest committed row is ≥
        # STEADY_CADENCE rounds old — oldest evidence first, seq
        # tie-break, and pick == anchor is simply "the anchor stays in
        # the window this round" (no swap entry needed).
        if use_disk_staleness:
            stalest = min(
                choices,
                key=lambda c: (
                    latest.get(c, 0) + cadence(c),
                    latest.get(c, 0),
                    CORPUS[c].seq,
                ),
            )
            if latest.get(stalest, 0) <= key - cadence(stalest):
                used.add(stalest)
                if stalest != anchor:
                    out[anchor] = stalest
                continue
        free.append((i, anchor, choices))
    # global queue: tier>0 only (tier-0 rows sit in the window already;
    # anchors are tier-0, so a lent pick can never collide with a swap
    # key), minus this round's in-group picks
    debt = [
        n
        for n, q in CORPUS.items()
        if q.tier > 0 and n not in sampled and n not in used
    ]
    # r14: an UNSAMPLED tier-0 anchor whose own group slot went to a
    # different unsampled member this round (``n in out`` ⇔ displaced)
    # has no other path into the window — the queue is otherwise
    # tier>0-only — so it re-enters through the same CHAINED-swap loan
    # mechanism the stale-backfill pass documents below (out[lender] =
    # anchor composes with out[anchor] = member; the window stays 50
    # distinct names). Hit when the changed-query ledger invalidates a
    # tier-0 anchor together with its tier>0 group-mates.
    debt += [
        a
        for a, _ in ROTATION_GROUPS
        if a in out and a not in sampled and a not in used
    ]
    # changed-since-evidence names drain FIRST (VERDICT r13 #1): their
    # newest driver row was captured on pre-change code, so re-proving
    # them is more urgent than first-proving a brand-new registration
    changed = sorted(
        (n for n in debt if n in CHANGED_IN_ROUND),
        key=lambda n: CORPUS[n].seq,
    )
    prio = [n for n in DRAIN_PRIORITY if n in debt and n not in changed]
    queue = changed + prio + sorted(
        (n for n in debt if n not in DRAIN_PRIORITY and n not in changed),
        key=lambda n: CORPUS[n].seq,
    )
    if use_disk_staleness:
        # the queue also hosts STALE tier-0 ANCHORS whose own group
        # slot went to an even-staler member this round (``n in out``
        # ⇔ displaced; a free group's members are ALL fresh by the
        # group-stale pass, so a stale anchor outside ``used`` is
        # necessarily displaced). A loan then re-enters it through a
        # CHAINED swap — out[lender] = anchor composes with the
        # earlier out[anchor] = stalest under _ordered's sequential
        # swap application: lender ends on the alternate's tier>0
        # key (out), anchor on the lender's tier-0 key (in) — the
        # window stays 50 distinct names (pinned in test_registry).
        anchor_names = {a for a, _ in ROTATION_GROUPS}
        queue += sorted(
            (
                n
                for n, q in CORPUS.items()
                if n in sampled
                and n not in used
                and latest.get(n, 0) <= key - cadence(n)
                and (q.tier > 0 or (n in anchor_names and n in out))
            ),
            key=lambda n: (
                latest.get(n, 0) + cadence(n),
                latest.get(n, 0),
                CORPUS[n].seq,
            ),
        )
    qi = 0
    for i, anchor, choices in free:
        if qi < len(queue):
            pick = queue[qi]
            qi += 1
        else:
            # round-robin fallback must skip names already assigned
            # this round: a stale-backfill queue pick may be another
            # free group's alternate, and a duplicate pick would break
            # the one-slot-per-name swap algebra (window ≠ 50)
            options = [c for c in choices if c not in used]
            pick = (
                options[(key + i) % len(options)] if options else anchor
            )
        used.add(pick)
        if pick != anchor:
            out[anchor] = pick
    # loan pass: the queue still holds names and every group slot is
    # spent — borrow up to LEND_CAP non-grouped tier-0 slots
    if qi < len(queue):
        anchors = {a for a, _ in ROTATION_GROUPS}
        # only SAMPLED rows may lend: an unsampled tier-0 row is itself
        # the evidence the window exists to collect — lending its slot
        # would silently drop it while still unproven
        lendable = [
            q.name
            for q in sorted(CORPUS.values(), key=lambda q: q.seq)
            if q.tier == 0 and q.name not in anchors and q.name in sampled
        ]
        # lend at most as many slots as sampled lenders exist: with the
        # cap, the rotating offsets below are distinct by construction
        # (no silent modulo collision can drop a debt pick), and when
        # every tier-0 row is itself unsampled nothing lends — the
        # excess debt waits for the next round (the multi-round drain
        # bound covers that case)
        remaining = queue[qi:][: min(LEND_CAP, len(lendable))]
        loff = (key * max(len(remaining), 1)) % max(len(lendable), 1)
        for j, pick in enumerate(remaining):
            out[lendable[(loff + j) % len(lendable)]] = pick
    return out


def _ordered(
    key: int | None = None, sampled: frozenset[str] | None = None
) -> list[Query]:
    _load_all()
    sort_key = {q.name: (q.tier, q.seq) for q in CORPUS.values()}
    for anchor, pick in rotation_swaps(key, sampled).items():
        sort_key[anchor], sort_key[pick] = sort_key[pick], sort_key[anchor]
    return sorted(CORPUS.values(), key=lambda q: sort_key[q.name])


def window_names(
    key: int | None = None, sampled: frozenset[str] | None = None
) -> list[str]:
    """The driver's correctness window under rotation ``key`` (None →
    the current round / the committed sampled set)."""
    return [q.name for q in _ordered(key, sampled)[:DRIVER_WINDOW]]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.fn for q in _ordered()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in _ordered() if q.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import corpus modules for their registration side effects."""
    global _LOADED
    if _LOADED:
        return
    from gpssbzd_spark.corpus import (  # noqa: F401
        core,
        dataprep,
        pipelines,
        streaming,
        tpch,
        windows,
    )

    _LOADED = True
