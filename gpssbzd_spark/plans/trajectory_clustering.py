"""Stage 2 — Trajectory Clustering: per-line DBSCAN over trajectory
distances (TRACLUS-style, Lee/Han/Whang SIGMOD'07 components).

Reference behavior (`Parallel/Trajectory Clustering.py`, `Standalone/
Trajectory Clustering.py`) re-expressed Spark-first:

- Trajectories are ordered point arrays per (linenumber, id, patternID).
  The reference's ``collect_list(struct(lng,lat))`` relies on incidental
  input order (PTC:143-145) — an order-sensitivity bug at any scale; we
  collect ``struct(ts,lng,lat)`` and ``array_sort`` before stripping the
  key, so results are partition-count-invariant.
- Two execution modes:
  * ``mode="pairs"`` (default, the scale path — Parallel shape): J4 self
    theta-join generates unordered trajectory pairs per line, an
    Arrow-batched pandas UDF computes pair distances (distributed across
    the cluster), then a per-line ``applyInPandas`` assembles the
    distance matrix and runs DBSCAN. Only O(n²) scalar distances — not
    point arrays — cross into the per-line group.
  * ``mode="local"`` (Standalone shape): one ``applyInPandas`` per line
    does pairs + DBSCAN in a single group. Cheaper for small lines (no
    pair shuffle), used when every line fits an executor.
- Per-line (eps, min_samples) come in as a small DataFrame, collected
  once (O(10²) rows) and closed over by the UDF — same as the
  reference's params_dict (PTC:43-45) but documented as a param table.
- DBSCAN itself is a self-contained numpy implementation (classic
  Ester et al. 1996 on a precomputed matrix) — sklearn is not a
  dependency of this engine.
- Skew: AQE splits the skewed pair join; the DBSCAN group for a line is
  irreducibly single-machine (needs the full matrix) — the guard rail is
  ``max_group_pairs``, which fails fast with the offending line instead
  of OOMing an executor.

The reference computes d_horizontal and d_vertical IDENTICALLY (both
project tr1's endpoints onto tr2's chord — PTC:156-187, STC:90-107).
We replicate that for parity and expose ``corrected=True`` for the
paper's actual perpendicular/parallel decomposition.
"""

from __future__ import annotations

import math
from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# geopy's great_circle (used by the reference) is a mean-earth-radius
# great-circle distance; same formula, R in km.
EARTH_RADIUS_KM = 6371.009

# np.allclose defaults — the native distance expressions replicate the
# numpy kernel's degenerate-chord checks bit-for-bit
_ATOL, _RTOL = 1e-8, 1e-5


def _gc_km_col(lng1: Column, lat1: Column, lng2: Column, lat2: Column) -> Column:
    """Native great-circle km — same formula and R as
    :func:`_great_circle_km`, as a codegen-able column expression."""
    h = (
        F.sin(F.radians(lat2 - lat1) / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
        * F.sin(F.radians(lng2 - lng1) / 2) ** 2
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.least(F.lit(1.0), F.sqrt(h)))


def _great_circle_km(a: np.ndarray, b: np.ndarray) -> float:
    """Great-circle km between (lng, lat) points."""
    lng1, lat1, lng2, lat2 = map(math.radians, (a[0], a[1], b[0], b[1]))
    dlat, dlng = lat2 - lat1, lng2 - lng1
    h = math.sin(dlat / 2) ** 2 + math.cos(lat1) * math.cos(lat2) * math.sin(dlng / 2) ** 2
    return 2 * EARTH_RADIUS_KM * math.asin(min(1.0, math.sqrt(h)))


def _polyline_length_km(tr: np.ndarray) -> float:
    """Vectorized great-circle length of an (n,2) lng/lat polyline.

    One numpy pass over all segments — the per-segment Python-loop
    version was the pair kernel's dominant cost (length is recomputed
    per PAIR, so a 1 200-point trajectory in 100 pairs burned 120 000
    interpreted great-circle calls where two vector ops suffice).
    """
    if len(tr) < 2:
        return 0.0
    lng = np.radians(tr[:, 0])
    lat = np.radians(tr[:, 1])
    h = (
        np.sin(np.diff(lat) / 2) ** 2
        + np.cos(lat[:-1]) * np.cos(lat[1:]) * np.sin(np.diff(lng) / 2) ** 2
    )
    return float(
        2 * EARTH_RADIUS_KM * np.arcsin(np.minimum(1.0, np.sqrt(h))).sum()
    )


def _project_on_chord(p: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Project p onto segment a→b in lng/lat coordinate space (as the
    reference does — planar projection on raw degrees), clamped to the
    segment."""
    if np.allclose(a, b):
        return a
    v = b - a
    t = float(np.dot(p - a, v) / np.dot(v, v))
    if t < 0:
        return a
    if t > 1:
        return b
    return a + t * v


def trajectory_distance(
    tr1: np.ndarray, tr2: np.ndarray, corrected: bool = False
) -> float:
    """TRACLUS-style distance between two (n,2) lng/lat polylines.

    Parity mode (default): d_h and d_v are BOTH the mean distance of
    tr1's endpoints to their projections on tr2's chord (the reference's
    duplication); d_angular per the reference. ``corrected=True``
    replaces the duplicated term with the mean chord-endpoint distance in
    the perpendicular/parallel split of Lee et al.

    Degenerate inputs (empty, or any non-finite/None coordinate) return
    ``inf`` — "cannot be compared" must read as FAR, and both cluster
    modes cap-fill inf accordingly.
    """
    if len(tr1) == 0 or len(tr2) == 0:
        return float("inf")
    tr1 = np.asarray(tr1, dtype=np.float64)
    tr2 = np.asarray(tr2, dtype=np.float64)
    if not (np.isfinite(tr1).all() and np.isfinite(tr2).all()):
        return float("inf")
    a2, b2 = tr2[0], tr2[-1]
    p1, p2 = tr1[0], tr1[-1]
    proj1 = _project_on_chord(p1, a2, b2)
    proj2 = _project_on_chord(p2, a2, b2)
    d1 = _great_circle_km(p1, proj1)
    d2 = _great_circle_km(p2, proj2)
    d_component = (d1 + d2) / 2.0

    if corrected:
        # Perpendicular component (Lee et al. eq. 1): Lehmer mean.
        denom = d1 + d2
        d_perp = (d1 * d1 + d2 * d2) / denom if denom > 0 else 0.0
        d_h, d_v = d_component, d_perp
    else:
        d_h = d_v = d_component

    # Angular component: angle between end-to-end chords.
    v1 = tr1[-1] - tr1[0]
    v2 = b2 - a2
    if np.allclose(v1, 0) or np.allclose(v2, 0):
        theta = 90.0
    else:
        cos_t = float(np.dot(v1, v2) / (np.linalg.norm(v1) * np.linalg.norm(v2)))
        theta = math.degrees(math.acos(max(-1.0, min(1.0, cos_t))))
    len1 = _polyline_length_km(tr1)
    len2 = _polyline_length_km(tr2)
    if 0 < theta <= 90:
        d_angular = min(len1, len2) * math.sin(math.radians(theta))
    elif theta > 90:
        d_angular = max(len1, len2)
    else:
        d_angular = 0.0

    return float(d_h + d_v + d_angular)


def native_pair_distance(
    p1: tuple[Column, Column, Column, Column, Column],
    p2: tuple[Column, Column, Column, Column, Column],
    corrected: bool = False,
    extra_bad: Column | None = None,
) -> Column:
    """:func:`trajectory_distance` as a pure column expression.

    The TRACLUS-style distance depends ONLY on each trajectory's
    endpoints, chord, and polyline length — never on interior points —
    so once those five scalars per trajectory are precomputed
    (:func:`assemble_trajectories` emits them), the whole pair distance
    is native arithmetic: no Python worker in the pair stage, and the
    pair join ships 5 doubles per side instead of the full point arrays
    (~19 KB/row at 1 200-point trajectories — the arrays were the entire
    shuffle payload, and the per-pair Arrow round-trip the entire stage
    cost).

    ``p1``/``p2``: (x0, y0, x1, y1, length_km) with x=lng, y=lat.
    Mirrors the numpy kernel exactly, including np.allclose tolerances
    on the degenerate chord/zero-vector checks and the inf result for
    NULL/NaN endpoints (``extra_bad`` ORs in e.g. an interior-point
    validity flag so degenerate interiors also read as inf/far).
    Differential parity with the kernel is pinned by
    test_modes_agree / test_native_distance_matches_kernel.
    """
    x0_1, y0_1, x1_1, y1_1, len1 = p1
    a_x, a_y, b_x, b_y, len2 = p2  # tr2's chord is a→b

    # endpoint → clamped projection on tr2's chord, planar in degrees
    # (np.allclose(a2, b2) ⇒ the chord is a point ⇒ project to a)
    ident = (F.abs(b_x - a_x) <= _ATOL + _RTOL * F.abs(b_x)) & (
        F.abs(b_y - a_y) <= _ATOL + _RTOL * F.abs(b_y)
    )
    vx, vy = b_x - a_x, b_y - a_y
    vv = vx * vx + vy * vy

    def proj_dist(px: Column, py: Column) -> Column:
        t = ((px - a_x) * vx + (py - a_y) * vy) / vv
        tc = F.greatest(F.lit(0.0), F.least(F.lit(1.0), t))
        projx = F.when(ident, a_x).otherwise(a_x + tc * vx)
        projy = F.when(ident, a_y).otherwise(a_y + tc * vy)
        return _gc_km_col(px, py, projx, projy)

    d1 = proj_dist(x0_1, y0_1)
    d2 = proj_dist(x1_1, y1_1)
    d_component = (d1 + d2) / 2.0
    if corrected:
        denom = d1 + d2
        d_perp = F.when(denom > 0, (d1 * d1 + d2 * d2) / denom).otherwise(0.0)
        d_hv = d_component + d_perp
    else:
        d_hv = d_component + d_component

    # angular: angle between end-to-end chords (np.allclose(v, 0) ⇒ 90°)
    v1x, v1y = x1_1 - x0_1, y1_1 - y0_1
    v1zero = (F.abs(v1x) <= _ATOL) & (F.abs(v1y) <= _ATOL)
    v2zero = (F.abs(vx) <= _ATOL) & (F.abs(vy) <= _ATOL)
    cos_t = (v1x * vx + v1y * vy) / (
        F.sqrt(v1x * v1x + v1y * v1y) * F.sqrt(vv)
    )
    theta = F.degrees(F.acos(F.greatest(F.lit(-1.0), F.least(F.lit(1.0), cos_t))))
    theta_eff = F.when(v1zero | v2zero, F.lit(90.0)).otherwise(theta)
    d_ang = (
        F.when(theta_eff == 0.0, F.lit(0.0))
        .when(theta_eff > 90.0, F.greatest(len1, len2))
        .otherwise(F.least(len1, len2) * F.sin(F.radians(theta_eff)))
    )

    bad = F.lit(False)
    for c in (x0_1, y0_1, x1_1, y1_1, len1, a_x, a_y, b_x, b_y, len2):
        bad = bad | c.isNull() | F.isnan(c)
    if extra_bad is not None:
        bad = bad | extra_bad
    return F.when(bad, F.lit(float("inf"))).otherwise(d_hv + d_ang)


def dbscan_precomputed(dist: np.ndarray, eps: float, min_samples: int) -> np.ndarray:
    """Classic DBSCAN (Ester et al., KDD'96) on a precomputed distance
    matrix. A point's own distance (0) counts toward min_samples, as in
    standard implementations. Noise → −1. Deterministic: points visited
    in index order."""
    n = dist.shape[0]
    labels = np.full(n, -1, dtype=np.int64)
    neighbor_sets = [np.flatnonzero(dist[i] <= eps) for i in range(n)]
    core = np.array([len(nb) >= min_samples for nb in neighbor_sets])
    cluster = 0
    for i in range(n):
        if labels[i] != -1 or not core[i]:
            continue
        labels[i] = cluster
        frontier = list(neighbor_sets[i])
        seen = set(frontier) | {i}
        while frontier:
            j = frontier.pop()
            if labels[j] == -1:
                labels[j] = cluster
                if core[j]:
                    for k in neighbor_sets[j]:
                        if k not in seen:
                            seen.add(k)
                            frontier.append(k)
        cluster += 1
    return labels


# The label join-back key is (linenumber, id, patternID). The reference
# joins labels back on (id, patternID) only (PTC:326-330) — patternID is
# a per-vehicle 1-based counter, so a vehicle serving two lines in one
# day collides across lines and every colliding pattern row picks up
# BOTH lines' labels (duplicated rows, wrong clusters). That is a latent
# reference bug we pin rather than inherit: linenumber rides through the
# DBSCAN output schema and the join.
_CLUSTER_SCHEMA = T.StructType(
    [
        T.StructField("linenumber", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("patternID", T.StringType()),
        T.StructField("cluster", T.IntegerType()),
    ]
)


def assemble_trajectories(patterns: DataFrame, order_col: str = "ts") -> DataFrame:
    """(linenumber, id, patternID) → ordered point arrays.

    One shuffle; ``array_sort`` on a (order, lng, lat) struct imposes the
    explicit time ordering the reference leaves to chance.

    Emits BOTH representations of the polyline:

    - ``points`` (array<struct<lng,lat>>) — the structural form, kept
      for callers that want per-point records;
    - ``lngs``/``lats`` (array<double> each) — the columnar form the
      distance kernels consume: Arrow hands a list<double> to pandas as
      a numpy float array directly, where the struct form arrives as a
      list of per-point dicts that cost an interpreted comprehension
      per pair (at 1 200-point trajectories that unpacking dominated
      the whole pair stage).

    Also emits the per-trajectory scalars the native pair distance
    consumes — endpoints (x0,y0,x1,y1), ``len_km`` (polyline great-
    circle length, computed with a codegen'd lead-window haversine that
    shares the groupBy's hash partitioning: no extra shuffle, no
    Python), and ``bad_pts`` (any NULL/NaN interior coordinate ⇒ the
    kernel would return inf).
    """
    lng_d = F.col("lng").cast("double")
    lat_d = F.col("lat").cast("double")
    w = Window.partitionBy("linenumber", "id", "patternID").orderBy(
        order_col, lng_d, lat_d
    )
    nlng, nlat = F.lead(lng_d).over(w), F.lead(lat_d).over(w)
    seg = F.when(
        nlng.isNotNull(), _gc_km_col(lng_d, lat_d, nlng, nlat)
    ).otherwise(0.0)
    pt = F.struct(
        F.col(order_col).alias("o"),
        lng_d.alias("lng"),
        lat_d.alias("lat"),
    )
    nanish = lambda c: c.isNull() | F.isnan(c)  # noqa: E731
    return (
        patterns.withColumn("_seg_km", seg)
        .groupBy("linenumber", "id", "patternID")
        .agg(
            F.array_sort(F.collect_list(pt)).alias("pts_ordered"),
            F.sum("_seg_km").alias("len_km"),
            F.max(
                (nanish(lng_d) | nanish(lat_d)).cast("int")
            ).alias("_bad"),
        )
        .select(
            "linenumber",
            "id",
            "patternID",
            F.transform(
                "pts_ordered",
                lambda s: F.struct(s["lng"].alias("lng"), s["lat"].alias("lat")),
            ).alias("points"),
            F.transform("pts_ordered", lambda s: s["lng"]).alias("lngs"),
            F.transform("pts_ordered", lambda s: s["lat"]).alias("lats"),
            F.element_at("pts_ordered", 1)["lng"].alias("x0"),
            F.element_at("pts_ordered", 1)["lat"].alias("y0"),
            F.element_at("pts_ordered", -1)["lng"].alias("x1"),
            F.element_at("pts_ordered", -1)["lat"].alias("y1"),
            "len_km",
            (F.col("_bad") == 1).alias("bad_pts"),
        )
    )


def assemble_trajectory_scalars(
    patterns: DataFrame, order_col: str = "ts"
) -> DataFrame:
    """(linenumber, id, patternID) → ONLY the five distance scalars +
    validity flag — no point arrays.

    The eps-graph path (``mode="components"``) never touches a
    trajectory's interior points, so building + persisting the ordered
    arrays that :func:`assemble_trajectories` produces is pure waste
    there (at 1 200-point trajectories the arrays are ~99% of the
    materialized bytes). Endpoints come from native min/max over the
    (order, lng, lat) struct — the same lexicographic ordering
    ``array_sort`` imposes, so x0/y0/x1/y1 are bit-identical to the
    array path (pinned by test_components.py cross-mode parity) — and
    ``len_km`` reuses the identical lead-window segment sum. One
    shuffle, all codegen, rows of six scalars.
    """
    lng_d = F.col("lng").cast("double")
    lat_d = F.col("lat").cast("double")
    w = Window.partitionBy("linenumber", "id", "patternID").orderBy(
        order_col, lng_d, lat_d
    )
    nlng, nlat = F.lead(lng_d).over(w), F.lead(lat_d).over(w)
    seg = F.when(
        nlng.isNotNull(), _gc_km_col(lng_d, lat_d, nlng, nlat)
    ).otherwise(0.0)
    nanish = lambda c: c.isNull() | F.isnan(c)  # noqa: E731
    pt = F.struct(
        F.col(order_col).alias("o"), lng_d.alias("lng"), lat_d.alias("lat")
    )
    return (
        patterns.withColumn("_seg_km", seg)
        .groupBy("linenumber", "id", "patternID")
        .agg(
            F.min(pt).alias("_first"),
            F.max(pt).alias("_last"),
            F.sum("_seg_km").alias("len_km"),
            F.max((nanish(lng_d) | nanish(lat_d)).cast("int")).alias("_bad"),
        )
        .select(
            "linenumber",
            "id",
            "patternID",
            F.col("_first.lng").alias("x0"),
            F.col("_first.lat").alias("y0"),
            F.col("_last.lng").alias("x1"),
            F.col("_last.lat").alias("y1"),
            "len_km",
            (F.col("_bad") == 1).alias("bad_pts"),
        )
    )


def _params_lookup(line_params: DataFrame) -> dict[str, tuple[float, int]]:
    rows = line_params.select("linenumber", "eps", "min_samples").collect()
    return {r["linenumber"]: (float(r["eps"]), int(r["min_samples"])) for r in rows}


def cluster_trajectories(
    patterns: DataFrame,
    line_params: DataFrame,
    mode: str = "auto",
    corrected: bool = False,
    max_group_pairs: int = 50_000_000,
    local_threshold: int = 200,
) -> DataFrame:
    """Full stage 2: patterns → patterns + ``cluster`` label (−1 noise).

    Lines without params are skipped (left out of clustering, label null
    after the join-back) — reference behavior (PTC:267-268).

    ``mode``:

    - ``"auto"`` (default, the scale path): size-aware routing. A per-
      line trajectory count (one cheap agg over the already-assembled
      trajectories) splits lines at ``local_threshold``: small lines run
      the partition-local path (the whole line in one Arrow group, ZERO
      pair-join shuffle), big lines run the distributed pair path. This
      is the Spark-first replacement for the reference's driver-side
      complexity stats → bin-packing → manual repartition (PTC:60-136):
      same idea — group cost is quadratic in line size, so don't treat
      lines uniformly — but expressed as two branches of one plan, no
      collect of data, no hand-built partition map. AQE's skew-join
      splitting cannot help here (a pandas group is atomic), which is
      why the routing is explicit (SURVEY.md §4).
    - ``"pairs"``: force the distributed pair/matrix path for every
      line (raises past ``max_group_pairs`` — the matrix is atomic).
    - ``"local"``: force the partition-local path for every line.
    - ``"components"``: force the distributed eps-graph path (exact
      DBSCAN via core-degree + connected components, no matrix — see
      ``plans/components.py``) for every line. No size limit.

    ``max_group_pairs`` is the per-line matrix budget: in auto mode a
    line whose pair count exceeds it routes to the components path —
    one huge line degrades to the eps-graph's extra shuffles instead
    of an exception or a single-task OOM (r2 raised here — the wall is
    gone; past-the-budget label parity vs local mode is pinned by
    test_auto_routes_oversized_line_past_the_wall and the 80-
    trajectory test_auto_fallback_matches_local_on_a_big_skewed_line,
    and the fallback's cost curve by SCALING.md ``dbscan_skewed_line``,
    VERDICT r10 #6). Only in FORCED pairs mode does the in-UDF
    fail-fast remain, as the explicit-override backstop.
    """
    assert mode in ("auto", "pairs", "local", "components")
    params = _params_lookup(line_params)

    if mode == "components":
        # the eps-graph path needs only the six scalars — skip building
        # (and persisting) the point arrays entirely
        traj = assemble_trajectory_scalars(patterns)
    else:
        traj = assemble_trajectories(patterns)
    traj = traj.filter(F.col("linenumber").isin(*params.keys()) if params else F.lit(False))
    # the pairs path consumes only the per-trajectory scalars; the local
    # path the columnar lngs/lats — never ship the struct points
    if mode != "components":
        traj = traj.drop("points")
    # every mode reads traj from multiple branches (pairs: left+right of
    # the self-join plus the label join-back's lineage; auto: the size
    # count plus both routes). AQE's exchange reuse dedupes the repeated
    # shuffle stages within one action — measured neutral at sf0.1 — but
    # reuse is best-effort plan matching; the GC-scoped checkpoint
    # makes the materialize-once guarantee structural (tiny: one scalar
    # row per trajectory after the drop) without a session persist.
    traj = traj.localCheckpoint()

    if mode == "pairs":
        labels = _cluster_via_pairs(traj, params, corrected, max_group_pairs)
    elif mode == "local":
        labels = _cluster_local(traj, params, corrected)
    elif mode == "components":
        from gpssbzd_spark.plans.components import dbscan_distributed

        labels = dbscan_distributed(traj, params, corrected)
    else:
        sizes = traj.groupBy("linenumber").agg(F.count("*").alias("_n_traj"))
        traj_sized = traj.join(F.broadcast(sizes), "linenumber")
        n = F.col("_n_traj")
        fits_matrix = n * (n - 1) / 2 <= F.lit(float(max_group_pairs))
        small = traj_sized.filter(n <= local_threshold).drop("_n_traj")
        mid = traj_sized.filter((n > local_threshold) & fits_matrix).drop("_n_traj")
        huge = traj_sized.filter((n > local_threshold) & ~fits_matrix).drop("_n_traj")
        labels = _cluster_local(small, params, corrected).unionByName(
            _cluster_via_pairs(mid, params, corrected, max_group_pairs)
        )
        # the eps-graph path runs its component loop EAGERLY at plan-
        # construction time; probe first (one cheap count on the
        # persisted traj) so the common no-oversized-line case stays
        # a single lazy plan
        if huge.limit(1).count() > 0:
            from gpssbzd_spark.plans.components import dbscan_distributed

            # past-the-budget lines take the eps-BANDED candidate
            # generator: the line is huge precisely because its pair
            # count exploded, and the band turns that O(n²) into
            # near-linear for bounded spatial density (same edges —
            # blocked_pair_distances' soundness argument)
            labels = labels.unionByName(
                dbscan_distributed(huge, params, corrected, blocked=True)
            )

    # all three keys: joining on (id, patternID) alone — the reference's
    # PTC:326 shape — duplicates rows when two lines share a vehicle+counter
    return patterns.join(labels, on=["linenumber", "id", "patternID"], how="left")


def pair_distances(traj: DataFrame, corrected: bool = False) -> DataFrame:
    """Unordered per-line trajectory pairs with their TRACLUS distance.

    The distance needs only the 5 per-trajectory scalars (endpoints +
    length) and the validity flag — the pair join ships ~48 bytes per
    side instead of the full point arrays, and the distance itself is
    whole-stage-codegen arithmetic (see :func:`native_pair_distance`).
    Shared by the matrix-assembling pairs mode and the distributed
    eps-graph mode (``plans/components.py``).
    """
    traj = traj.withColumn("traj_id", F.concat_ws("_", "id", "patternID"))
    scalars = ["x0", "y0", "x1", "y1", "len_km", "bad_pts"]
    left = traj.select(
        "linenumber",
        F.col("traj_id").alias("traj_id_1"),
        F.col("id").alias("id_1"),
        F.col("patternID").alias("patternID_1"),
        *[F.col(c).alias(f"{c}_1") for c in scalars],
    )
    right = traj.select(
        "linenumber",
        F.col("traj_id").alias("traj_id_2"),
        F.col("id").alias("id_2"),
        F.col("patternID").alias("patternID_2"),
        *[F.col(c).alias(f"{c}_2") for c in scalars],
    )
    pairs = left.join(right, "linenumber").filter(F.col("traj_id_1") < F.col("traj_id_2"))

    dist_col = native_pair_distance(
        tuple(F.col(f"{c}_1") for c in ("x0", "y0", "x1", "y1", "len_km")),
        tuple(F.col(f"{c}_2") for c in ("x0", "y0", "x1", "y1", "len_km")),
        corrected=corrected,
        extra_bad=F.col("bad_pts_1") | F.col("bad_pts_2"),
    )
    return pairs.select(
        "linenumber",
        "id_1",
        "patternID_1",
        "id_2",
        "patternID_2",
        dist_col.alias("distance"),
    )


def blocked_pair_distances(
    traj: DataFrame,
    params_df: DataFrame,
    corrected: bool = False,
    slack: float = 1.05,
) -> DataFrame:
    """Eps-banded candidate pairs + distance — the subquadratic twin of
    :func:`pair_distances` for the eps-graph consumer.

    :func:`pair_distances` evaluates every per-line pair; distributed,
    but still O(n²) work on one huge line. This generates candidates
    through a SOUND spatial band first, so only near pairs ever reach
    the distance expression. Soundness: in both distance modes
    ``D(t1,t2) ≥ d1`` (uncorrected ``d_hv = d1+d2``; corrected
    ``d_hv = (d1+d2)/2 + (d1²+d2²)/(d1+d2) ≥ d1+d2``), where ``d1`` is
    the great-circle km from t1's START endpoint to its clamped
    projection on t2's chord segment — so ``D ≤ eps`` implies t1.start
    lies within eps km of segment(t2), and a grid cover of
    segment(t2) dilated by eps MUST contain t1.start's cell. Blocking
    therefore yields a candidate SUPERSET of the true eps-edges; the
    exact distance verify keeps the edge set identical (parity pinned
    by tests/test_trajectory_clustering.py). Rows this function does
    not emit are guaranteed ``D > eps`` — downstream (eps-edge
    filtering) sees exactly :func:`pair_distances`\' edges.

    Grid: one cell size per LINE (the equi-join key must be grid-
    consistent within a line): ``s_deg = slack · eps_km /
    (KM_PER_DEG · cos(φ_line))`` where ``φ_line`` is the line\'s max
    |lat| plus an eps margin — the largest degree-extent eps km can
    have on either axis inside the line\'s bounding band, so "within
    eps km" always means "within one cell index" per axis. Index
    side: cells sampled along t2\'s chord at ≤ s steps, dilated ±2
    (one cell for the eps dilation + one for sampling
    discretization); probe side: t1.start\'s cell; join per
    (line, cell), dedup, verify. Cost per trajectory:
    O(chord_len/eps + 25) candidate cells instead of O(n) partners.

    The planar degree grid is unsound in exactly two regimes, and
    lines in them are ROUTED to :func:`pair_distances` instead of
    guessing (r11 review: the original loud-assert handled only the
    polar case and silently DROPPED cross-dateline eps-edges):

    - |lat| beyond 85° — a fixed per-line cell size no longer bounds
      the lng extent of eps km;
    - longitude span beyond 180° — the line straddles the
      antimeridian (a pair at lng ±179.99° is ~2 km apart on the
      sphere but ~7000 grid cells apart in ``floor(lng/s)`` space).

    The routed lines pay the all-pairs join they would have paid
    before blocking existed; edge parity holds for EVERY line either
    way (pinned by the polar/dateline routing test).
    """
    km_per_deg = math.pi * EARTH_RADIUS_KM / 180.0
    t = traj.withColumn(
        "traj_id", F.concat_ws("_", "id", "patternID")
    ).join(params_df.select("linenumber", "eps"), "linenumber")
    # per-line grid constants + safety classification (tiny agg over
    # the scalar table). coalesce: a line whose every trajectory has
    # null coords has no extent at all — grid placement is moot (its
    # rows produce null cells and no candidates, isolating to noise
    # exactly like pair_distances\' inf), and it must not misroute
    line_stats = (
        t.groupBy("linenumber")
        .agg(
            F.coalesce(
                F.max(F.greatest(F.abs(F.col("y0")), F.abs(F.col("y1")))),
                F.lit(0.0),
            ).alias("_maxlat"),
            F.coalesce(
                F.max(F.greatest(F.col("x0"), F.col("x1")))
                - F.min(F.least(F.col("x0"), F.col("x1"))),
                F.lit(0.0),
            ).alias("_lngspan"),
            F.first("eps").alias("_eps"),
        )
        .withColumn(
            "_unsafe",
            (F.col("_maxlat") > 85.0) | (F.col("_lngspan") > 180.0),
        )
        .withColumn(
            "_phi",
            F.least(
                F.lit(85.0),
                F.col("_maxlat") + F.col("_eps") / F.lit(km_per_deg),
            ),
        )
        .withColumn(
            "_s",
            F.lit(slack)
            * F.col("_eps")
            / (F.lit(km_per_deg) * F.cos(F.radians(F.col("_phi")))),
        )
        .select("linenumber", "_s", "_unsafe")
    ).localCheckpoint()  # consumed by three branches below; tiny

    unsafe_lines = line_stats.filter(F.col("_unsafe")).select("linenumber")
    t = t.join(
        F.broadcast(line_stats.filter(~F.col("_unsafe"))), "linenumber"
    )
    scalars = ["x0", "y0", "x1", "y1", "len_km", "bad_pts"]

    # probe side: t1\'s start-endpoint cell
    probe = t.select(
        "linenumber",
        F.col("traj_id").alias("traj_id_1"),
        F.col("id").alias("id_1"),
        F.col("patternID").alias("patternID_1"),
        *[F.col(c).alias(f"{c}_1") for c in scalars],
        F.floor(F.col("x0") / F.col("_s")).alias("_cx"),
        F.floor(F.col("y0") / F.col("_s")).alias("_cy"),
    )

    # index side: cells sampled along t2\'s chord, dilated ±2 cells
    dx, dy = F.col("x1") - F.col("x0"), F.col("y1") - F.col("y0")
    n_steps = F.greatest(
        F.lit(1),
        F.ceil(F.greatest(F.abs(dx), F.abs(dy)) / F.col("_s")).cast("int"),
    )
    k = F.sequence(F.lit(0), n_steps)
    frac = lambda kk: kk.cast("double") / n_steps.cast("double")  # noqa: E731
    samples = F.transform(
        k,
        lambda kk: F.struct(
            F.floor((F.col("x0") + dx * frac(kk)) / F.col("_s")).alias("cx"),
            F.floor((F.col("y0") + dy * frac(kk)) / F.col("_s")).alias("cy"),
        ),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(i).alias("oi"), F.lit(j).alias("oj"))
            for i in range(-2, 3)
            for j in range(-2, 3)
        ]
    )
    dilated = F.array_distinct(
        F.flatten(
            F.transform(
                F.array_distinct(samples),
                lambda c: F.transform(
                    offsets,
                    lambda o: F.struct(
                        (c["cx"] + o["oi"]).alias("cx"),
                        (c["cy"] + o["oj"]).alias("cy"),
                    ),
                ),
            )
        )
    )
    index = t.select(
        "linenumber",
        F.col("traj_id").alias("traj_id_2"),
        F.col("id").alias("id_2"),
        F.col("patternID").alias("patternID_2"),
        *[F.col(c).alias(f"{c}_2") for c in scalars],
        F.explode(dilated).alias("_cell"),
    ).select(
        "*",
        F.col("_cell.cx").alias("_cx"),
        F.col("_cell.cy").alias("_cy"),
    ).drop("_cell")

    pairs = (
        probe.join(index, ["linenumber", "_cx", "_cy"])
        .filter(F.col("traj_id_1") < F.col("traj_id_2"))
        .dropDuplicates(["linenumber", "traj_id_1", "traj_id_2"])
    )
    dist_col = native_pair_distance(
        tuple(F.col(f"{c}_1") for c in ("x0", "y0", "x1", "y1", "len_km")),
        tuple(F.col(f"{c}_2") for c in ("x0", "y0", "x1", "y1", "len_km")),
        corrected=corrected,
        extra_bad=F.col("bad_pts_1") | F.col("bad_pts_2"),
    )
    banded = pairs.select(
        "linenumber",
        "id_1",
        "patternID_1",
        "id_2",
        "patternID_2",
        dist_col.alias("distance"),
    )
    routed = pair_distances(
        traj.join(F.broadcast(unsafe_lines), "linenumber", "left_semi"),
        corrected,
    )
    return banded.unionByName(routed)


def _cluster_via_pairs(
    traj: DataFrame,
    params: dict[str, tuple[float, int]],
    corrected: bool,
    max_group_pairs: int,
) -> DataFrame:
    distances = pair_distances(traj, corrected)

    def run_dbscan(pdf: pd.DataFrame) -> pd.DataFrame:
        line = pdf["linenumber"].iloc[0]
        if line not in params:
            return pd.DataFrame(columns=["linenumber", "id", "patternID", "cluster"])
        if len(pdf) > max_group_pairs:
            raise ValueError(
                f"line {line}: {len(pdf)} pairs exceeds max_group_pairs="
                f"{max_group_pairs}; raise the cap or pre-split the line"
            )
        eps, min_samples = params[line]
        ids1 = pdf[["id_1", "patternID_1"]].rename(
            columns={"id_1": "id", "patternID_1": "patternID"}
        )
        ids2 = pdf[["id_2", "patternID_2"]].rename(
            columns={"id_2": "id", "patternID_2": "patternID"}
        )
        all_ids = pd.concat([ids1, ids2]).drop_duplicates().sort_values(["id", "patternID"])
        keys = list(all_ids.itertuples(index=False, name=None))
        idx = {k: i for i, k in enumerate(keys)}
        n = len(keys)
        dist = np.full((n, n), np.inf)
        np.fill_diagonal(dist, 0.0)
        for row in pdf.itertuples(index=False):
            i = idx[(row.id_1, row.patternID_1)]
            j = idx[(row.id_2, row.patternID_2)]
            # isfinite, not "not isinf": a NaN distance (degenerate
            # kernel output) must read as FAR like inf, never land in
            # the matrix
            if np.isfinite(row.distance):
                dist[i, j] = dist[j, i] = row.distance
        finite = dist[~np.isinf(dist)]
        # the fill must exceed eps even when every real distance is tiny
        # (2×max-finite alone can land INSIDE eps and glue failed pairs
        # into clusters) — anchor it to eps as well
        cap = max(np.max(finite) if finite.size else 0.0, eps * 10)
        dist[np.isinf(dist)] = cap * 2
        labels = dbscan_precomputed(dist, eps, min_samples)
        return pd.DataFrame(
            {
                "linenumber": line,
                "id": [k[0] for k in keys],
                "patternID": [k[1] for k in keys],
                "cluster": labels.astype("int32"),
            }
        )

    return distances.groupBy("linenumber").applyInPandas(run_dbscan, _CLUSTER_SCHEMA)


def _cluster_local(
    traj: DataFrame, params: dict[str, tuple[float, int]], corrected: bool
) -> DataFrame:
    def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
        line = pdf["linenumber"].iloc[0]
        if line not in params:
            return pd.DataFrame(columns=["linenumber", "id", "patternID", "cluster"])
        eps, min_samples = params[line]
        pdf = pdf.sort_values(["id", "patternID"]).reset_index(drop=True)
        trajs = [
            np.column_stack((lngs, lats))
            for lngs, lats in zip(pdf["lngs"], pdf["lats"])
        ]
        n = len(trajs)
        # failed/degenerate distances must read as FAR, not 0: a zero
        # matrix entry means "identical" and would glue an empty
        # trajectory onto every cluster — same cap-fill as pairs mode
        dist = np.full((n, n), np.inf)
        np.fill_diagonal(dist, 0.0)
        for i in range(n):
            for j in range(i + 1, n):
                try:
                    d = trajectory_distance(trajs[i], trajs[j], corrected=corrected)
                except Exception:
                    d = float("inf")
                if math.isfinite(d):
                    dist[i, j] = dist[j, i] = d
        finite = dist[~np.isinf(dist)]
        # same eps anchor as the pairs mode (see run_dbscan)
        cap = max(np.max(finite) if finite.size else 0.0, eps * 10)
        dist[np.isinf(dist)] = cap * 2
        labels = dbscan_precomputed(dist, eps, min_samples)
        return pd.DataFrame(
            {
                "linenumber": line,
                "id": pdf["id"],
                "patternID": pdf["patternID"],
                "cluster": labels.astype("int32"),
            }
        )

    return traj.groupBy("linenumber").applyInPandas(run_group, _CLUSTER_SCHEMA)
