"""Distributed eps-graph DBSCAN (plans/components.py): exact-label
parity with the matrix modes, and the removal of the max_group_pairs
size wall (VERDICT r2 #2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gpssbzd_spark.plans.components import connected_components, dbscan_distributed
from gpssbzd_spark.plans.trajectory_clustering import (
    assemble_trajectories,
    cluster_trajectories,
)


def _labels(df):
    return {
        (r["linenumber"], r["id"], r["patternID"]): r["cluster"]
        for r in df.select("linenumber", "id", "patternID", "cluster")
        .distinct()
        .collect()
    }


def _patterns(spark, rows):
    df = spark.createDataFrame(
        rows,
        "id string, lng double, lat double, t string, patternID string, linenumber string",
    )
    return df.withColumn("ts", F.to_timestamp("t"))


def _add_traj(rows, line, vid, pid, lng0, lat0, dlng, dlat, n=6):
    for i in range(n):
        rows.append(
            (vid, lng0 + i * dlng, lat0 + i * dlat,
             f"2019-02-01 08:{i:02d}:00", str(pid), line)
        )


@pytest.fixture(scope="module")
def patterns(spark):
    """Same shape as test_trajectory_clustering's fixture: two bundles +
    an outlier on LA, a close pair + an all-null degenerate on LB, a
    paramless LC."""
    rows = []
    _add_traj(rows, "LA", "v1", 1, 114.000, 22.600, 0.002, 0.0)
    _add_traj(rows, "LA", "v2", 1, 114.000, 22.6005, 0.002, 0.0)
    _add_traj(rows, "LA", "v3", 1, 114.000, 22.601, 0.002, 0.0)
    _add_traj(rows, "LA", "v1", 2, 114.000, 22.700, 0.002, 0.0)
    _add_traj(rows, "LA", "v2", 2, 114.000, 22.7005, 0.002, 0.0)
    _add_traj(rows, "LA", "v9", 1, 114.100, 22.650, 0.0, 0.002)
    _add_traj(rows, "LB", "v4", 1, 113.900, 22.650, 0.002, 0.0)
    _add_traj(rows, "LB", "v5", 1, 113.900, 22.6502, 0.002, 0.0)
    for i in range(6):
        rows.append(("v7", None, None, f"2019-02-01 08:{i:02d}:00", "1", "LB"))
    _add_traj(rows, "LC", "v6", 1, 113.950, 22.640, 0.002, 0.0)
    return _patterns(spark, rows)


@pytest.fixture(scope="module")
def line_params(spark):
    return spark.createDataFrame(
        [("LA", 1.0, 2), ("LB", 1.0, 2)],
        "linenumber string, eps float, min_samples int",
    )


# ---------------- connected_components primitive ----------------


# driver_max_edges routes: default → bounded driver union-find;
# 0 → forces the iterative hash-min dataflow loop. Both routes must
# produce identical labels on every graph shape.
_CC_ROUTES = pytest.mark.parametrize(
    "max_driver_edges", [2_000_000, 0], ids=["union-find", "dataflow-loop"]
)


@_CC_ROUTES
def test_connected_components_basic(spark, max_driver_edges):
    nodes = spark.createDataFrame(
        [(c,) for c in "abcdefg"], "node string"
    )
    # path a-b-c-d, pair e-f, isolated g
    edges = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("c", "d"), ("f", "e")], "src string, dst string"
    )
    got = {
        r["node"]: r["label"]
        for r in connected_components(
            nodes, edges, driver_max_edges=max_driver_edges
        ).collect()
    }
    assert got == {
        "a": "a", "b": "a", "c": "a", "d": "a", "e": "e", "f": "e", "g": "g"
    }


@_CC_ROUTES
def test_connected_components_long_chain(spark, max_driver_edges):
    # a 40-node path: convergence must be O(log diameter), well under
    # the max_iter backstop, and the final labels all collapse to node 00
    n = 40
    nodes = spark.createDataFrame([(f"{i:02d}",) for i in range(n)], "node string")
    edges = spark.createDataFrame(
        [(f"{i:02d}", f"{i + 1:02d}") for i in range(n - 1)], "src string, dst string"
    )
    got = {
        r["node"]: r["label"]
        for r in connected_components(
            nodes, edges, driver_max_edges=max_driver_edges
        ).collect()
    }
    assert set(got.values()) == {"00"} and len(got) == n


# ---------------- exact parity with the matrix modes ----------------


def test_components_mode_matches_local_exact_labels(spark, patterns, line_params):
    """Not just the same partitions — the SAME integer labels: the
    eps-graph path reproduces dbscan_precomputed's sorted-key visit
    numbering (min-core-key component rank)."""
    a = _labels(cluster_trajectories(patterns, line_params, mode="components"))
    b = _labels(cluster_trajectories(patterns, line_params, mode="local"))
    assert a == b
    # and the structure is the known one (not vacuously equal-empty)
    assert a[("LA", "v9", "1")] == -1
    assert a[("LB", "v7", "1")] == -1
    assert a[("LC", "v6", "1")] is None
    assert a[("LA", "v1", "1")] == a[("LA", "v2", "1")] != -1


def test_border_tie_resolves_like_matrix_dbscan(spark):
    """min_samples=4: X is a border point within eps of exactly one core
    from each of two clusters. The matrix DBSCAN hands X to the
    first-expanded (lowest-numbered) cluster; the distributed border
    min-join must agree exactly."""
    # parallel 2-point segments offset in latitude; pair distance is
    # 2 × great-circle(Δlat) ≈ 0.2224 km per 0.001°; eps=0.5 separates
    # 2-unit (0.445) from 2.5-unit (0.556) offsets
    rows = []
    u = 0.001
    placements = {
        "a1": 0.0, "a2": 0.5, "a3": 1.0, "a4": 1.5,   # cluster A (all core)
        "x0": 3.5,                                     # border: sees a4, b1
        "b1": 5.5, "b2": 6.0, "b3": 6.5, "b4": 7.0,   # cluster B (all core)
    }
    for vid, off in placements.items():
        _add_traj(rows, "L", vid, 1, 114.000, 22.6 + off * u, 0.002, 0.0, n=2)
    patterns = _patterns(spark, rows)
    params = spark.createDataFrame(
        [("L", 0.5, 4)], "linenumber string, eps float, min_samples int"
    )
    got = _labels(cluster_trajectories(patterns, params, mode="components"))
    ref = _labels(cluster_trajectories(patterns, params, mode="local"))
    assert got == ref
    # X is border, attached to cluster 0 (the a-side, expanded first)
    assert got[("L", "x0", "1")] == got[("L", "a1", "1")] == 0
    assert got[("L", "b1", "1")] == 1


def test_auto_routes_oversized_line_past_the_wall(spark, patterns, line_params):
    """An over-budget line (r2: ValueError from the pair-matrix UDF) now
    routes to the eps-graph path in auto mode and labels identically."""
    # LA has 6 trajectories → 15 pairs > max_group_pairs=5 → components;
    # LB has 3 → 3 pairs → stays on the matrix path: a mixed plan
    routed = cluster_trajectories(
        patterns, line_params, mode="auto", local_threshold=2, max_group_pairs=5
    )
    assert _labels(routed) == _labels(
        cluster_trajectories(patterns, line_params, mode="local")
    )
    # the forced pairs mode still fail-fasts (the matrix is atomic)
    with pytest.raises(Exception, match="max_group_pairs"):
        cluster_trajectories(
            patterns, line_params, mode="pairs", max_group_pairs=5
        ).collect()


def test_dbscan_distributed_min_samples_one_singletons(spark):
    """min_samples=1: every node is core; isolated nodes become
    singleton clusters, not noise — matching the matrix semantics."""
    rows = []
    _add_traj(rows, "L", "v1", 1, 114.000, 22.600, 0.002, 0.0, n=2)
    _add_traj(rows, "L", "v2", 1, 114.000, 22.700, 0.002, 0.0, n=2)  # far
    patterns = _patterns(spark, rows)
    params = spark.createDataFrame(
        [("L", 0.5, 1)], "linenumber string, eps float, min_samples int"
    )
    traj = assemble_trajectories(patterns)
    got = {
        (r["id"], r["cluster"])
        for r in dbscan_distributed(traj, {"L": (0.5, 1)}).collect()
    }
    assert got == {("v1", 0), ("v2", 1)}
    ref = _labels(cluster_trajectories(patterns, params, mode="local"))
    assert ref[("L", "v1", "1")] == 0 and ref[("L", "v2", "1")] == 1


def test_corpus_components_query_cross_mode_parity(spark):
    """The driver-facing tc_pipeline_components geometry produces the
    SAME labels through the eps-graph path and the matrix path — the
    oracle parity (vs DuckDB) plus this pin means all three labeling
    implementations agree on the corpus geometry."""
    from gpssbzd_spark.corpus.pipelines import tc_pipeline_components

    sf = "/root/testdata/sf0.001"
    a = _labels(tc_pipeline_components(spark, sf, mode="components"))
    b = _labels(tc_pipeline_components(spark, sf, mode="local"))
    assert a == b and len(a) > 0
    # non-vacuous: at least one real cluster and at least one noise point
    assert any(v == -1 for v in a.values())
    assert any(v is not None and v >= 0 for v in a.values())


def test_dbscan_distributed_routes_agree(spark, patterns, line_params):
    """The bounded driver labeling route and the distributed dataflow
    route must produce identical labels (same visit-order numbering,
    border min-rule, noise) on the same graph."""
    from gpssbzd_spark.plans.trajectory_clustering import _params_lookup

    traj = assemble_trajectories(patterns).drop("points").persist()
    params = _params_lookup(line_params)
    a = sorted(map(tuple, dbscan_distributed(traj, params).collect()))
    b = sorted(
        map(tuple, dbscan_distributed(traj, params, driver_max_rows=0).collect())
    )
    traj.unpersist()
    assert a == b and len(a) > 0


def test_general_dbscan_corpus_point_classes(spark):
    """The oracled general-min_samples corpus row must exhibit ALL
    three DBSCAN point classes with the designed chain-site structure
    (see corpus/pipelines.py _TC_GENERAL_PTS): per line, trajectory
    ordinals r0-5 are cores of cluster 0, r6 is a BORDER adopting
    cluster 0 (its only neighbor r5 is core, its own degree 1 < 4),
    r7-11 are a second core clique, r12-19 are noise. The DuckDB
    hash-match (test_corpus_oracle / driver) proves Spark==SQL; this
    pins that the fixture actually exercises border handling rather
    than degenerating into cliques-only."""
    from gpssbzd_spark.corpus import pipelines as cp

    pdf = cp.tc_pipeline_dbscan_general(
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    for line, grp in pdf.groupby("linenumber"):
        by_r = {
            (int(r["id"]) // 5) * 5 + int(r["patternID"]): r["cluster"]
            for _, r in grp.iterrows()
        }
        chain = {by_r[r] for r in range(0, 6) if r in by_r}
        assert len(chain) == 1 and chain != {-1}, (line, chain)
        if 6 in by_r:
            assert by_r[6] == chain.pop(), (
                f"border lost its chain cluster on line {line}"
            )
            chain = {by_r[6]}
        second = {by_r[r] for r in range(7, 12) if r in by_r}
        assert len(second) == 1 and second != {-1}, (line, second)
        # cluster NUMBERS are the per-line rank of each component's min
        # core key STRING (so "12" < "2" — data-dependent); classes and
        # separation are the invariant, not which gets 0
        assert second != chain, line
        noise = {by_r[r] for r in range(12, 20) if r in by_r}
        assert noise <= {-1}, (line, noise)


def test_auto_fallback_matches_local_on_a_big_skewed_line(spark):
    """VERDICT r10 #6 at real size: ONE line with 80 trajectories
    (3,160 pairs, far past a 500-pair budget) must cluster through the
    auto-mode eps-graph fallback — extra shuffles, no exception — with
    labels IDENTICAL to the local (single-group matrix) mode. Chain
    geometry: 8 sites 2 km apart (within-site ≪ eps, adjacent sites
    ~4 km < eps=5, so the chain is one cluster) plus 8 isolated
    singletons ≫ eps (noise at min_samples=2)."""
    rows = []
    for t in range(72):
        site = t % 8
        _add_traj(
            rows, "L", f"v{t:03d}", 1,
            114.0 + site * 0.0195, 22.6, 0.002, 0.0, n=2,
        )
    for t in range(8):
        _add_traj(
            rows, "L", f"iso{t}", 1,
            130.0 + t * 1.0, 22.6, 0.002, 0.0, n=2,
        )
    patterns = _patterns(spark, rows)
    params = spark.createDataFrame(
        [("L", 5.0, 2)], "linenumber string, eps float, min_samples int"
    )
    routed = cluster_trajectories(
        patterns, params, mode="auto", local_threshold=10, max_group_pairs=500
    )
    local = cluster_trajectories(patterns, params, mode="local")
    got, ref = _labels(routed), _labels(local)
    assert got == ref and len(got) == 80
    # the chain really is one cluster and the singletons really noise
    assert {got[("L", f"v{t:03d}", "1")] for t in range(72)} == {0}
    assert all(got[("L", f"iso{t}", "1")] == -1 for t in range(8))
