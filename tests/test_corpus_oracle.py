"""Differential tests: every corpus query vs its DuckDB oracle at sf0.001.

This mirrors the driver's CORRECTNESS gate (which runs at sf0.01); tests
run on sf0.001 for speed. Queries without an oracle get a rows-only
sanity check.
"""

from __future__ import annotations

import pytest

from gpssbzd_spark import corpus
from tests.oracle_utils import compare, run_oracle

corpus._load_all()
ALL = sorted(corpus.CORPUS)


@pytest.mark.parametrize("name", ALL)
def test_query_vs_oracle(spark, sf_dir, name):
    q = corpus.CORPUS[name]
    df = q.fn(spark, sf_dir)
    if q.oracle is None:
        # rows-only: runs, has a stable schema, and — VERDICT r8 #1 —
        # every column is driver-canonicalizable: the driver's
        # rows-only check pandas-sorts ALL columns, and a raw
        # array/map/struct column is unhashable there (r8's
        # sim_topk_ivf_build err). Container payloads must be
        # projected/hashed before return.
        from pyspark.sql import types as _T

        for f in df.schema.fields:
            assert not isinstance(
                f.dataType, (_T.ArrayType, _T.MapType, _T.StructType)
            ), (
                f"{name}: rows-only query returns non-canonicalizable "
                f"column {f.name}:{f.dataType.simpleString()} — the "
                "driver's pandas sort_values chokes on containers"
            )
        assert df.count() >= 0
        return
    compare(df, run_oracle(q.oracle, sf_dir), name)


def test_approx_sketches_within_bounds(spark, sf_dir):
    """The approx A1/A4 variants must track their exact twins within the
    sketches' accuracy guarantees (percentile_approx with accuracy=10000
    ≈ 0.01% rank error; HLL++ at rsd=0.01 ⇒ ~3σ = 3%)."""
    from pyspark.sql import functions as F
    from gpssbzd_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    joined = (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", 0.95).alias("exact_p"),
            F.percentile_approx("l_extendedprice", 0.95, 10000).alias("approx_p"),
            F.countDistinct("l_orderkey").alias("exact_n"),
            F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_n"),
        )
        .collect()
    )
    for r in joined:
        assert abs(r.approx_p - r.exact_p) / r.exact_p < 0.01
        assert abs(r.approx_n - r.exact_n) / r.exact_n < 0.03


# Queries whose passing check proves nothing when the result is empty: a
# rows-only pipeline that filters everything out "passes" while testing
# no stage downstream of the filter (r1 shipped pe_pipeline_segments
# green and vacuous at every SF — the demotion rule killed every gap).
_MUST_BE_NONEMPTY = [
    "pe_pipeline_segments",
    "tc_pipeline_dbscan",
    "bz_pipeline_cascade",
    "dd_exact_dup_groups",
    "dd_minhash_lsh_pairs",
    "dd_minhash_portable_pairs",
    "dd_simhash_portable_pairs",
    "dd_embedding_lsh_portable_pairs",
    "sim_topk_lsh_portable",
    "sim_topk_ivf_portable",
    "dd_embedding_cosine_pairs",
    "dd_embedding_cosine_blocked",
    "j5_semi_anti_join",
    "set_ops_tagged",
]


@pytest.mark.parametrize("name", _MUST_BE_NONEMPTY)
def test_diagnostic_queries_are_not_vacuous(spark, name):
    # checked at the oracle scale — where the round driver's correctness
    # gate actually runs (some fixtures legitimately thin out at sf0.001)
    from tests.conftest import ORACLE_SF_DIR

    assert corpus.CORPUS[name].fn(spark, ORACLE_SF_DIR).count() > 0, (
        f"{name} returned an empty result — its green check is vacuous"
    )
