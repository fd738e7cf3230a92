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
      "q17_small_quantity_revenue", "q22_global_sales_opportunity"]),
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
      "dp_pipeline_pretrain_e2e", "dp_passage_dedup"]),
    # the portable twins rotate against their kernel counterparts'
    # rows-only slots: alternate rounds give the SAME family hash-match
    # driver evidence (portable md5 family) and kernel-path rows
    ("dd_minhash_lsh_pairs",
     ["dd_minhash_portable_pairs", "dd_neardup_clusters"]),
    ("dd_embedding_cosine_blocked",
     ["dd_embedding_lsh_portable_pairs", "dd_embedding_neardup_clusters"]),
    ("dd_simhash_buckets", ["dd_simhash_portable_pairs"]),
    ("sim_topk_lsh", ["sim_topk_lsh_portable"]),
    ("sim_topk_brute", ["sim_topk_ivf_portable"]),
    ("tx_doc_features",
     ["tx_token_stats", "tx_quality_score", "tx_language_id",
      "dp_pipeline_corpus_clean", "tx_bpe_token_count", "tx_pii_scrub",
      "tx_repetition_filter", "tx_vocab_heavy_hitters",
      "dp_decontaminate_overlap", "tx_unigram_logprob",
      "tx_tfidf_terms", "tx_bigram_logprob"]),
    ("j7_asof_join_backward", ["j7b_asof_join_forward"]),
    ("dd_embedding_cosine_pairs", ["sim_cosine_to_centroid"]),
    ("st_tumbling_window",
     ["st_sliding_window", "ts_bucket_gapfill", "ts_bucket_interpolate",
      "st_drift_histogram", "st_drift_psi"]),
    ("st_enrich_dim",
     ["st_stream_stream_join", "st_dedup_within_watermark",
      "st_upsert_state", "st_funnel_stateful"]),
    ("j1_join_inner", ["j9_salted_join"]),
    ("s_csv_roundtrip", ["s_jsonl_roundtrip"]),
]

_ROUND_KEY_CACHE: int | None = None


def _round_key() -> int:
    """Current round number: SPARK_GRAFT_ROUND env if set, else the
    count of CORRECTNESS_r*.json files committed at the repo root + 1
    (cached per process so one run sees one window even if the driver
    writes this round's file mid-process)."""
    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env is not None:
        try:
            return int(env)
        except ValueError:
            pass
    global _ROUND_KEY_CACHE
    if _ROUND_KEY_CACHE is None:
        root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        _ROUND_KEY_CACHE = 1 + len(
            glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
        )
    return _ROUND_KEY_CACHE


_SAMPLED_CACHE: frozenset[str] | None = None


def _sampled_names() -> frozenset[str]:
    """Names that have EVER earned a driver CORRECTNESS row — the union
    of keys across every committed CORRECTNESS_r*.json at the repo root
    (cached per process, same determinism contract as _round_key: the
    files are committed before the next round starts, so every process
    in one round sees the same set)."""
    global _SAMPLED_CACHE
    if _SAMPLED_CACHE is None:
        root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        names: set[str] = set()
        for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
            try:
                with open(f) as fh:
                    names |= set(json.load(fh))
            except (OSError, ValueError):
                pass
        _SAMPLED_CACHE = frozenset(names)
    return _SAMPLED_CACHE


def rotation_swaps(
    key: int | None = None, sampled: frozenset[str] | None = None
) -> dict[str, str]:
    """anchor → this round's in-window pick, for groups whose pick is
    not the anchor itself.

    DEBT-AWARE (VERDICT r6 next-round #5): a group whose choices
    include names that have never earned a driver CORRECTNESS row
    (per the committed CORRECTNESS_r*.json files) round-robins among
    THOSE first — so every group with rotation debt retires one
    never-sampled query per round instead of re-proving sampled ones.
    Once a group's debt drains, it falls back to the plain staggered
    round-robin over all choices. ``sampled`` overrides the disk state
    for tests."""
    if key is None:
        key = _round_key()
    if sampled is None:
        sampled = _sampled_names()
    out: dict[str, str] = {}
    for i, (anchor, alts) in enumerate(ROTATION_GROUPS):
        choices = [anchor] + alts
        unsampled = [c for c in choices if c not in sampled]
        pool = unsampled if unsampled else choices
        pick = pool[(key + i) % len(pool)]
        if pick != anchor:
            out[anchor] = pick
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
        windows,
    )

    _LOADED = True
