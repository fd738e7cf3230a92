"""Stage-2 tests: kernel functions + both execution modes end-to-end."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from gpssbzd_spark.plans.trajectory_clustering import (
    _great_circle_km,
    assemble_trajectories,
    cluster_trajectories,
    dbscan_precomputed,
    native_pair_distance,
    trajectory_distance,
)


# ---------------- kernel: trajectory distance ----------------


def _line(lng0, lat0, dlng, dlat, n=5):
    return np.array([[lng0 + i * dlng, lat0 + i * dlat] for i in range(n)])


def test_distance_identity_zero():
    tr = _line(114.0, 22.6, 0.001, 0.0)
    # identical trajectories: endpoints project onto themselves and the
    # chords are parallel → all three components vanish
    assert trajectory_distance(tr, tr) == pytest.approx(0.0, abs=1e-9)


def test_distance_parallel_offset():
    a = _line(114.0, 22.60, 0.001, 0.0)
    b = _line(114.0, 22.61, 0.001, 0.0)  # ~1.11 km north, parallel
    d = trajectory_distance(a, b)
    # d_h = d_v ≈ 1.11 km (reference duplicates the component), angular ≈ 0
    assert d == pytest.approx(2 * 1.112, rel=0.05)


def test_distance_perpendicular_uses_length():
    a = _line(114.0, 22.6, 0.001, 0.0)
    b = np.array([[114.002, 22.598], [114.002, 22.602]])  # crossing, 90°
    d = trajectory_distance(a, b)
    len_a = sum(_great_circle_km(a[i - 1], a[i]) for i in range(1, len(a)))
    len_b = _great_circle_km(b[0], b[1])
    assert d >= min(len_a, len_b) * 0.99  # angular term dominates


def test_great_circle_known_distance():
    # Shenzhen ~0.01° lng at lat 22.6 ≈ 1.026 km
    d = _great_circle_km(np.array([114.0, 22.6]), np.array([114.01, 22.6]))
    assert d == pytest.approx(1.026, rel=0.01)


# ---------------- kernel: DBSCAN ----------------


def test_dbscan_two_clusters_and_noise():
    # points on a line: {0,1,2} close, {10,11,12} close, {50} isolated
    xs = np.array([0.0, 1.0, 2.0, 10.0, 11.0, 12.0, 50.0])
    dist = np.abs(xs[:, None] - xs[None, :])
    labels = dbscan_precomputed(dist, eps=1.5, min_samples=3)
    assert labels[0] == labels[1] == labels[2] != -1
    assert labels[3] == labels[4] == labels[5] != -1
    assert labels[0] != labels[3]
    assert labels[6] == -1


def test_dbscan_min_samples_counts_self():
    xs = np.array([0.0, 1.0, 100.0])
    dist = np.abs(xs[:, None] - xs[None, :])
    # min_samples=2: {0,1} are core (self + one neighbor)
    labels = dbscan_precomputed(dist, eps=1.5, min_samples=2)
    assert labels[0] == labels[1] != -1 and labels[2] == -1
    # min_samples=3: nobody is core
    labels = dbscan_precomputed(dist, eps=1.5, min_samples=3)
    assert list(labels) == [-1, -1, -1]


# ---------------- end-to-end on a synthetic patterns table ----------------


@pytest.fixture(scope="module")
def patterns(spark):
    """3 lines; LA has two bundles of near-identical trajectories plus an
    outlier; LB has two similar trajectories; LC has no params row."""
    rows = []

    def add_traj(line, vid, pid, lng0, lat0, dlng, dlat, n=6):
        for i in range(n):
            rows.append(
                (vid, lng0 + i * dlng, lat0 + i * dlat, f"2019-02-01 08:{i:02d}:00",
                 str(pid), line)
            )

    # line LA bundle 1: three trajectories within ~100 m of each other
    add_traj("LA", "v1", 1, 114.000, 22.600, 0.002, 0.0)
    add_traj("LA", "v2", 1, 114.000, 22.6005, 0.002, 0.0)
    add_traj("LA", "v3", 1, 114.000, 22.601, 0.002, 0.0)
    # line LA bundle 2: two trajectories far north
    add_traj("LA", "v1", 2, 114.000, 22.700, 0.002, 0.0)
    add_traj("LA", "v2", 2, 114.000, 22.7005, 0.002, 0.0)
    # line LA outlier: perpendicular and far away
    add_traj("LA", "v9", 1, 114.100, 22.650, 0.0, 0.002)
    # line LB: two similar
    add_traj("LB", "v4", 1, 113.900, 22.650, 0.002, 0.0)
    add_traj("LB", "v5", 1, 113.900, 22.6502, 0.002, 0.0)
    # line LB degenerate: all-null coordinates (GPS dropout) — the
    # distance kernel raises on these, and BOTH modes must cap-fill the
    # failure as FAR (noise), not 0 (identical); r01's local mode
    # zero-filled and glued such rows onto every cluster
    for i in range(6):
        rows.append(("v7", None, None, f"2019-02-01 08:{i:02d}:00", "1", "LB"))
    # line LC: has trajectories but no params → label null
    add_traj("LC", "v6", 1, 113.950, 22.640, 0.002, 0.0)
    df = spark.createDataFrame(
        rows, "id string, lng double, lat double, t string, patternID string, linenumber string"
    )
    return df.withColumn("ts", F.to_timestamp("t"))


@pytest.fixture(scope="module")
def line_params(spark):
    return spark.createDataFrame(
        [("LA", 1.0, 2), ("LB", 1.0, 2)],
        "linenumber string, eps float, min_samples int",
    )


def test_assemble_orders_points(spark, patterns):
    traj = assemble_trajectories(patterns)
    row = traj.filter("linenumber = 'LA' AND id = 'v1' AND patternID = '1'").first()
    lngs = [p["lng"] for p in row["points"]]
    assert lngs == sorted(lngs)
    assert len(lngs) == 6


@pytest.mark.parametrize("mode", ["pairs", "local", "auto"])
def test_cluster_modes(spark, patterns, line_params, mode):
    out = cluster_trajectories(patterns, line_params, mode=mode).cache()
    labels = {
        (r["linenumber"], r["id"], r["patternID"]): r["cluster"]
        for r in out.select("linenumber", "id", "patternID", "cluster").distinct().collect()
    }
    # LA bundle 1 clusters together, bundle 2 clusters together, separately
    b1 = {labels[("LA", v, "1")] for v in ("v1", "v2", "v3")}
    b2 = {labels[("LA", v, "2")] for v in ("v1", "v2")}
    assert len(b1) == 1 and -1 not in b1
    assert len(b2) == 1 and -1 not in b2
    assert b1 != b2
    # outlier is noise
    assert labels[("LA", "v9", "1")] == -1
    # LB pair clusters
    assert labels[("LB", "v4", "1")] == labels[("LB", "v5", "1")] != -1
    # LB degenerate all-null trajectory is noise, never glued to a cluster
    assert labels[("LB", "v7", "1")] == -1
    # LC has no params → null label
    assert labels[("LC", "v6", "1")] is None


def test_modes_agree(spark, patterns, line_params):
    a = cluster_trajectories(patterns, line_params, mode="pairs")
    b = cluster_trajectories(patterns, line_params, mode="local")
    pa = {
        (r["linenumber"], r["id"], r["patternID"]): r["cluster"]
        for r in a.select("linenumber", "id", "patternID", "cluster").distinct().collect()
    }
    pb = {
        (r["linenumber"], r["id"], r["patternID"]): r["cluster"]
        for r in b.select("linenumber", "id", "patternID", "cluster").distinct().collect()
    }
    # same noise/cluster structure up to label renumbering
    assert set(pa) == set(pb)
    for k in pa:
        assert (pa[k] == -1) == (pb[k] == -1), k
        assert (pa[k] is None) == (pb[k] is None), k
    # label partitions identical
    from collections import defaultdict

    def partition(p):
        groups = defaultdict(set)
        for k, v in p.items():
            if v is not None and v != -1:
                groups[(k[0], v)].add(k)
        return {frozenset(v) for v in groups.values()}

    assert partition(pa) == partition(pb)


def test_native_distance_matches_kernel(spark):
    """The pairs mode computes the TRACLUS distance as a native column
    expression over per-trajectory scalars; it must agree with the numpy
    kernel to float precision on regular AND degenerate trajectories
    (single point, zero chord, parallel, perpendicular)."""
    rng = np.random.RandomState(7)
    rows = []

    def add(vid, pts):
        for i, (lng, lat) in enumerate(pts):
            rows.append((vid, float(lng), float(lat),
                         f"2019-02-01 08:{i:02d}:00", "1", "L"))

    kernels = {}
    for t in range(5):
        n = int(rng.randint(2, 8))
        pts = np.column_stack(
            (114 + rng.rand(n) * 0.1, 22.6 + rng.rand(n) * 0.1)
        )
        kernels[f"v{t}"] = pts
        add(f"v{t}", pts)
    kernels["vsingle"] = np.array([[114.05, 22.65]])
    add("vsingle", kernels["vsingle"])
    kernels["vzero"] = np.array([[114.02, 22.62], [114.02, 22.62]])
    add("vzero", kernels["vzero"])

    patterns = spark.createDataFrame(
        rows,
        "id string, lng double, lat double, t string, patternID string, linenumber string",
    ).withColumn("ts", F.to_timestamp("t"))
    traj = assemble_trajectories(patterns)

    scalars = ["x0", "y0", "x1", "y1", "len_km", "bad_pts"]
    a = traj.select(F.col("id").alias("id_1"),
                    *[F.col(c).alias(f"{c}_1") for c in scalars])
    b = traj.select(F.col("id").alias("id_2"),
                    *[F.col(c).alias(f"{c}_2") for c in scalars])
    dist = native_pair_distance(
        tuple(F.col(f"{c}_1") for c in ("x0", "y0", "x1", "y1", "len_km")),
        tuple(F.col(f"{c}_2") for c in ("x0", "y0", "x1", "y1", "len_km")),
        extra_bad=F.col("bad_pts_1") | F.col("bad_pts_2"),
    )
    got = {
        (r["id_1"], r["id_2"]): r["d"]
        for r in a.crossJoin(b)
        .filter(F.col("id_1") != F.col("id_2"))
        .select("id_1", "id_2", dist.alias("d"))
        .collect()
    }
    for (i1, i2), d_native in got.items():
        d_kernel = trajectory_distance(kernels[i1], kernels[i2])
        assert d_native == pytest.approx(d_kernel, rel=1e-9, abs=1e-9), (i1, i2)


def test_cross_line_shared_id_pattern_no_duplication(spark, line_params):
    """A vehicle serving two lines in one day reuses its per-vehicle
    patternID counter, so (id, patternID) collides across lines. The
    label join-back must key on (linenumber, id, patternID) — the
    reference joins on (id, patternID) only (PTC:326-330) and duplicates
    every colliding row with both lines' labels."""
    rows = []

    def add_traj(line, vid, pid, lng0, lat0, dlng, dlat, n=6):
        for i in range(n):
            rows.append(
                (vid, lng0 + i * dlng, lat0 + i * dlat,
                 f"2019-02-01 08:{i:02d}:00", str(pid), line)
            )

    # v1/pattern 1 exists on BOTH lines, at different places
    add_traj("LA", "v1", 1, 114.000, 22.600, 0.002, 0.0)
    add_traj("LA", "v2", 1, 114.000, 22.6005, 0.002, 0.0)
    add_traj("LB", "v1", 1, 113.900, 22.650, 0.002, 0.0)
    add_traj("LB", "v5", 1, 113.900, 22.6502, 0.002, 0.0)
    patterns = spark.createDataFrame(
        rows,
        "id string, lng double, lat double, t string, patternID string, linenumber string",
    ).withColumn("ts", F.to_timestamp("t"))

    out = cluster_trajectories(patterns, line_params, mode="pairs").cache()
    # no row duplication: one output row per input ping
    assert out.count() == patterns.count()
    # each line's copy of (v1, 1) got exactly one label, from its own line
    per_line = {
        r["linenumber"]: r["cluster"]
        for r in out.filter("id = 'v1' AND patternID = '1'")
        .select("linenumber", "cluster")
        .distinct()
        .collect()
    }
    assert set(per_line) == {"LA", "LB"}
    assert all(c is not None and c != -1 for c in per_line.values())


def test_auto_mode_mixed_routing_matches_forced_modes(spark, patterns, line_params):
    """local_threshold=2 sends LB (2 trajectories) down the local path
    and LA (6) down the pair path in the SAME plan; the combined result
    must equal the single-mode runs up to label renumbering."""
    mixed = cluster_trajectories(
        patterns, line_params, mode="auto", local_threshold=2
    )
    forced = cluster_trajectories(patterns, line_params, mode="local")
    pm = {
        (r["linenumber"], r["id"], r["patternID"]): r["cluster"]
        for r in mixed.select("linenumber", "id", "patternID", "cluster")
        .distinct()
        .collect()
    }
    pf = {
        (r["linenumber"], r["id"], r["patternID"]): r["cluster"]
        for r in forced.select("linenumber", "id", "patternID", "cluster")
        .distinct()
        .collect()
    }
    assert set(pm) == set(pf)
    from collections import defaultdict

    def partition(p):
        groups = defaultdict(set)
        noise = set()
        for k, v in p.items():
            if v == -1:
                noise.add(k)
            elif v is not None:
                groups[(k[0], v)].add(k)
        return {frozenset(g) for g in groups.values()}, noise

    assert partition(pm) == partition(pf)


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_blocked_pair_distances_edge_parity_random(spark, seed):
    """blocked_pair_distances is a sound eps-band: on random geometry
    (several lines, different eps, degenerate rows) its emitted pairs,
    filtered at eps, must be EXACTLY pair_distances' eps-edge set, with
    identical distances (same native expression)."""
    from gpssbzd_spark.plans.trajectory_clustering import (
        blocked_pair_distances,
        pair_distances,
    )

    rng = np.random.RandomState(seed)
    rows = []
    for line, n_traj, spread in (("L1", 40, 0.05), ("L2", 25, 0.02)):
        for t in range(n_traj):
            lng0 = 114.0 + rng.rand() * spread
            lat0 = 22.6 + rng.rand() * spread
            for i in range(4):
                rows.append(
                    (f"v{t:02d}", lng0 + i * 0.001, lat0 + rng.rand() * 1e-4,
                     f"2019-02-01 08:{i:02d}:00", "1", line)
                )
    # degenerate: null coordinates on L1 — must isolate in both paths
    for i in range(3):
        rows.append(("vnull", None, None, f"2019-02-01 09:{i:02d}:00", "1", "L1"))
    patterns = spark.createDataFrame(
        rows,
        "id string, lng double, lat double, t string, patternID string, "
        "linenumber string",
    ).withColumn("ts", F.to_timestamp("t"))
    traj = assemble_trajectories(patterns).drop("points").persist()
    params_df = spark.createDataFrame(
        [("L1", 1.0, 2), ("L2", 0.5, 2)],
        "linenumber string, eps float, min_samples int",
    )

    def edges(df):
        joined = df.join(
            params_df.select("linenumber", "eps"), "linenumber"
        ).filter(F.col("distance") <= F.col("eps"))
        return {
            (r.linenumber, r.id_1, r.patternID_1, r.id_2, r.patternID_2):
                round(r.distance, 9)
            for r in joined.collect()
        }

    full = edges(pair_distances(traj))
    blocked = edges(blocked_pair_distances(traj, params_df))
    assert blocked == full and len(full) > 10
    traj.unpersist()


def test_blocked_dbscan_labels_match_local(spark, patterns, line_params):
    """dbscan_distributed(blocked=True) — the huge-line route — must
    label the standard fixture identically to the local matrix mode."""
    from gpssbzd_spark.plans.components import dbscan_distributed
    from gpssbzd_spark.plans.trajectory_clustering import _params_lookup

    traj = assemble_trajectories(patterns).drop("points").persist()
    got = sorted(
        map(
            tuple,
            dbscan_distributed(
                traj, _params_lookup(line_params), blocked=True
            ).collect(),
        )
    )
    ref = sorted(
        map(
            tuple,
            dbscan_distributed(traj, _params_lookup(line_params)).collect(),
        )
    )
    assert got == ref and len(got) > 0
    traj.unpersist()


def test_blocked_routes_polar_and_dateline_lines_to_full_pairs(spark):
    """The planar degree grid is unsound past |lat| 85° and across the
    antimeridian (r11 review: a pair at lng ±179.99° is ~2 km apart on
    the sphere but thousands of grid cells apart) — such lines must
    ROUTE to the all-pairs join, so blocked edges equal pair_distances'
    edges on EVERY line. Three lines: polar (lat 87), dateline
    (lng ±179.99 — a real eps-edge the naive grid would silently
    drop), and an ordinary safe one mixed in."""
    from gpssbzd_spark.plans.trajectory_clustering import (
        blocked_pair_distances,
        pair_distances,
    )

    rows = []
    for i in range(3):
        t = f"2019-02-01 08:{i:02d}:00"
        rows += [
            ("v1", 10.0 + i * 0.001, 87.0, t, "1", "P"),
            ("v2", 10.0 + i * 0.001, 87.0005, t, "1", "P"),
            ("w1", 179.99 + i * 0.001, 22.6, t, "1", "D"),
            ("w2", -179.995 + i * 0.001, 22.6001, t, "1", "D"),
            ("u1", 114.0 + i * 0.001, 22.6, t, "1", "S"),
            ("u2", 114.0 + i * 0.001, 22.6005, t, "1", "S"),
        ]
    patterns = spark.createDataFrame(
        rows,
        "id string, lng double, lat double, t string, patternID string, "
        "linenumber string",
    ).withColumn("ts", F.to_timestamp("t"))
    traj = assemble_trajectories(patterns).drop("points").persist()
    params_df = spark.createDataFrame(
        [("P", 1.0, 2), ("D", 20.0, 2), ("S", 1.0, 2)],
        "linenumber string, eps float, min_samples int",
    )

    def edges(df):
        joined = df.join(
            params_df.select("linenumber", "eps"), "linenumber"
        ).filter(F.col("distance") <= F.col("eps"))
        return {
            (r.linenumber, r.id_1, r.id_2): round(r.distance, 9)
            for r in joined.collect()
        }

    full = edges(pair_distances(traj))
    blocked = edges(blocked_pair_distances(traj, params_df))
    assert blocked == full
    # non-vacuous: the dateline pair and the polar pair ARE edges
    assert ("D", "w1", "w2") in full or ("D", "w2", "w1") in full
    assert ("P", "v1", "v2") in full or ("P", "v2", "v1") in full
    traj.unpersist()
