"""Distributed DBSCAN over the eps-graph — the scale path past the
single-machine distance-matrix wall.

The matrix modes in ``plans/trajectory_clustering.py`` assemble one
O(n²) distance matrix per line inside a pandas group, which is atomic:
no executor can hold the matrix for a line whose pair count exceeds
``max_group_pairs`` (the reference hits the same wall — its driver-side
bin-packing, ``Parallel/Trajectory Clustering.py:60-136``, only
REBALANCES lines across partitions, it cannot split one). This module
removes the wall: DBSCAN never needs the matrix, only the eps-graph
(which pairs are within eps), and that graph is exactly what the
already-distributed pair-distance join produces.

Equivalence (exact, not approximate — for every ``min_samples``):

- a node is *core* iff |{neighbors within eps}| + 1 ≥ min_samples —
  a distributed degree count over the eps-edges;
- DBSCAN's clusters are precisely the connected components of the
  core-core eps-subgraph (Ester et al. 1996, Lemma 1/2);
- :func:`dbscan_precomputed` visits points in sorted-key order and
  numbers clusters as founded, so cluster k is the component whose
  minimum core key is the k-th smallest — reproduced by ranking
  components on their min core member;
- a border point is labeled by the first cluster (in number order)
  that expands a core neighbor of it — i.e. the MIN cluster number
  among its core neighbors — reproduced by a min-aggregate join;
- everything else is noise (−1).

Connected components run as iterative hash-min label propagation with
path halving (two joins per round, O(log diameter) rounds — the
classic Shiloach-Vishkin-style dataflow adaptation; cf. the
large-star/small-star formulation of Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14). Each round materializes
one (node, label) table — rows are two short strings, orders of
magnitude smaller than the ping data — and ``localCheckpoint`` truncates
the growing lineage so round t's plan does not replay rounds 0..t-1.
"""

from __future__ import annotations

import contextlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gpssbzd_spark.plans.trajectory_clustering import (
    _CLUSTER_SCHEMA,
    pair_distances,
)

# key separator below every printable char: concat order == tuple order
_SEP = "\x1f"
# nulls in a key column encode to a sentinel that cannot collide with a
# real value (real values never contain \x00). Sorts BELOW real keys —
# pandas sorts None last — a documented (and cornercase) divergence.
_NULL = "\x00"


def _key(*cols: str) -> F.Column:
    return F.concat_ws(
        _SEP, *[F.coalesce(F.col(c), F.lit(_NULL)) for c in cols]
    )


@contextlib.contextmanager
def _scoped_shuffle_width(spark, n_rows: int, rows_per_partition: int = 1_000_000):
    """Scope the shuffle width to a measured row count for an EAGER
    section, restoring the session settings after.

    Both knobs matter: AQE takes its initial width from
    ``coalescePartitions.initialPartitionNum`` when set (the session
    pins it to 8×cores for cluster-correct fan-out), so scoping
    ``shuffle.partitions`` alone is a no-op under AQE. Label/edge
    tables here are orders of magnitude smaller than the ping data —
    pushing each tiny eager round through a cluster-sized 256-way
    shuffle made scheduling overhead 40× the work. At real scale the
    formula (~1M rows/partition, capped at the session setting) keeps
    full parallelism.
    """
    keys = (
        "spark.sql.shuffle.partitions",
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
    )
    prev = {k: spark.conf.get(k, None) for k in keys}
    base = int(prev[keys[0]] or "200")
    width = max(1, min(base, 1 + n_rows // rows_per_partition))
    for k in keys:
        spark.conf.set(k, str(width))
    try:
        yield
    finally:
        for k in keys:
            if prev[k] is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, prev[k])


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    max_iter: int = 50,
    driver_max_edges: int = 2_000_000,
) -> DataFrame:
    """Connected components of an undirected graph.

    ``nodes``: one string column ``node`` (isolated nodes allowed);
    ``edges``: columns ``src``/``dst`` (one direction is enough).
    Returns (node, label) where label is the component's minimum node.

    Size-aware routing, same policy as the clustering modes (SURVEY §4):

    - a graph whose deduped edge count is ≤ ``driver_max_edges`` is
      labeled by a driver-side union-find — the edge list is id pairs
      only (≤ ~64 MB at the cap, the same bounded-collect envelope as
      the params/centroid tables), and one collect replaces ~4 eager
      rounds × 3 shuffles of scheduling overhead that dwarfed the work
      at GPS-line sizes;
    - past the cap, the iterative hash-min + path-halving dataflow loop
      runs (O(log diameter) eager rounds, nothing driver-sized), with
      the shuffle-partition count scoped to the measured edge count
      (~1M edges/partition; a cluster-sized 256-partition shuffle per
      tiny round was 40× overhead) and restored after. The edge table
      is persisted here — before this it was lazily recomputed by
      EVERY round's join.
    """
    spark = nodes.sparkSession
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().persist()
    n_edges = sym.count()

    if n_edges <= driver_max_edges:
        try:
            return _cc_driver_union_find(nodes, sym)
        finally:
            sym.unpersist()

    try:
        with _scoped_shuffle_width(spark, n_edges):
            return _cc_loop(nodes, sym, max_iter)
    finally:
        sym.unpersist()


def _cc_driver_union_find(nodes: DataFrame, sym: DataFrame) -> DataFrame:
    """Union-find over a bounded edge list; returns the same (node,
    min-member label) table as the dataflow loop (pinned by the parity
    tests in tests/test_components.py, which run both routes)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for row in sym.collect():
        a, b = row["src"], row["dst"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by label order so the root IS the min member
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    spark = nodes.sparkSession
    if not parent:
        return nodes.select("node", F.col("node").alias("label"))
    labels = spark.createDataFrame(
        [(k, find(k)) for k in parent], "node string, label string"
    )
    # isolated nodes label themselves; broadcast: labels ≤ 2·edges rows
    return (
        nodes.join(F.broadcast(labels), "node", "left")
        .select("node", F.coalesce("label", "node").alias("label"))
    )


def _cc_loop(nodes: DataFrame, sym: DataFrame, max_iter: int) -> DataFrame:
    labels = nodes.select("node", F.col("node").alias("label")).localCheckpoint()
    for _ in range(max_iter):
        # 1) hash-min: every node offers its label to each neighbor
        nbr_min = (
            sym.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        l1 = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    "label", F.coalesce("nbr_label", "label")
                ).alias("label"),
            )
        )
        # 2) path halving: follow the label one hop (label(label(x)));
        # labels are node ids and only ever decrease, so the lookup
        # against l1 itself contracts chains by half each round
        jump = l1.select(
            F.col("node").alias("label"), F.col("label").alias("label2")
        )
        l2 = (
            l1.join(jump, "label", "left")
            .select("node", F.coalesce("label2", "label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            l2.join(labels.withColumnRenamed("label", "old"), "node")
            .filter(F.col("label") != F.col("old"))
            .limit(1)
            .count()
        )
        labels = l2
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def dbscan_distributed(
    traj: DataFrame,
    params: dict[str, tuple[float, int]],
    corrected: bool = False,
    driver_max_rows: int = 2_000_000,
) -> DataFrame:
    """DBSCAN labels for every trajectory, never materializing a matrix.

    Same contract and output schema as the matrix modes, and EXACTLY
    the same labels (pinned by tests/test_components.py): cluster
    numbers per line follow the sorted-key visit order of
    :func:`dbscan_precomputed`, border ties resolve to the minimum
    cluster number, noise is −1. Lines without params are dropped
    (caller's join-back leaves their label null).

    O(n²)-per-line work still happens — in the pair-distance join,
    which Spark distributes and AQE skew-splits — but no single task
    ever holds more than its share of edges.

    Like :func:`connected_components`, the LABELING stage is
    size-routed: the node/edge tables are id-only (orders smaller than
    the ping data), and when both fit the driver cap the whole
    degree→core→components→rank→border chain runs as one Python pass
    over two collects — at GPS-line sizes the dataflow version's ~6
    eager jobs were pure scheduling overhead. Past the cap the
    distributed dataflow runs under a shuffle width scoped to the
    measured edge count. Both routes produce identical labels
    (tests/test_components.py parametrizes the parity tests over them).

    ``driver_max_rows``: cap on max(nodes, edges) rows for the driver
    route — ~48 bytes/row ⇒ ≤ ~100 MB collected at the default.
    """
    spark = traj.sparkSession
    if not params:
        return spark.createDataFrame([], _CLUSTER_SCHEMA)
    params_df = F.broadcast(
        spark.createDataFrame(
            [(ln, float(e), int(m)) for ln, (e, m) in params.items()],
            "linenumber string, eps double, min_samples int",
        )
    )

    nodes = (
        traj.join(params_df, "linenumber")
        .select(
            "linenumber",
            "id",
            "patternID",
            "min_samples",
            _key("linenumber", "id", "patternID").alias("node"),
        )
    )

    # eps-edges: inf/NaN distances (degenerate trajectories) fail the
    # <= eps predicate — Spark orders NaN above every double — so bad
    # trajectories isolate into noise exactly as the matrix cap-fill does
    dist = pair_distances(traj, corrected)
    edges = (
        dist.join(params_df.select("linenumber", "eps"), "linenumber")
        .filter(F.col("distance") <= F.col("eps"))
        .select(
            _key("linenumber", "id_1", "patternID_1").alias("src"),
            _key("linenumber", "id_2", "patternID_2").alias("dst"),
        )
    )
    # edges/nodes feed degree + core-subgraph + border joins below;
    # materialize once (tiny: ids only, no coordinates)
    edges = edges.persist()
    n_edges = edges.count()
    n_nodes = nodes.count()  # cheap: traj is persisted by the caller
    if max(n_edges, n_nodes) <= driver_max_rows:
        out = _dbscan_labels_driver(spark, nodes.collect(), edges.collect())
    else:
        with _scoped_shuffle_width(spark, n_edges):
            out = _dbscan_labels(nodes, edges)
    edges.unpersist()
    return out


def _dbscan_labels_driver(spark, node_rows, edge_rows) -> DataFrame:
    """The full labeling chain over bounded collected id-tables — one
    Python pass, no Spark jobs until the result DataFrame is consumed.
    Mirrors _dbscan_labels exactly (same visit-order numbering, border
    min-rule, noise −1); parity pinned by tests/test_components.py."""
    from collections import defaultdict

    adj: dict[str, set] = defaultdict(set)
    for r in edge_rows:
        adj[r["src"]].add(r["dst"])
        adj[r["dst"]].add(r["src"])

    is_core = {
        r["node"]: len(adj.get(r["node"], ())) + 1 >= r["min_samples"]
        for r in node_rows
    }
    # components of the core-core subgraph via union-find (min root)
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for n, ok in is_core.items():
        if ok:
            parent[n] = n
    for a, nbrs in adj.items():
        if not is_core.get(a):
            continue
        for b in nbrs:
            if a < b and is_core.get(b):
                ra, rb = find(a), find(b)
                if ra != rb:
                    if ra < rb:
                        parent[rb] = ra
                    else:
                        parent[ra] = rb

    # cluster number = per-line rank of the component's min core key
    by_line: dict[str, set] = defaultdict(set)
    line_of = {r["node"]: r["linenumber"] for r in node_rows}
    for n in parent:
        by_line[line_of[n]].add(find(n))
    cluster_of_root = {
        root: rank
        for line, roots in by_line.items()
        for rank, root in enumerate(sorted(roots))
    }

    out_rows = []
    for r in node_rows:
        n = r["node"]
        if is_core.get(n):
            c = cluster_of_root[find(n)]
        else:
            # border: min cluster among core neighbors, else noise
            cand = [
                cluster_of_root[find(b)] for b in adj.get(n, ()) if is_core.get(b)
            ]
            c = min(cand) if cand else -1
        out_rows.append((r["linenumber"], r["id"], r["patternID"], c))
    return spark.createDataFrame(out_rows, _CLUSTER_SCHEMA)


def _dbscan_labels(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )

    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("_deg")
    )
    nodes = (
        nodes.join(deg, "node", "left")
        .withColumn(
            "is_core",
            F.coalesce(F.col("_deg"), F.lit(0)) + 1 >= F.col("min_samples"),
        )
        .drop("_deg", "min_samples")
        .persist()
    )

    core = nodes.filter("is_core").select("node")
    core_edges = (
        edges.join(core.withColumnRenamed("node", "src"), "src", "left_semi")
        .join(core.withColumnRenamed("node", "dst"), "dst", "left_semi")
    )
    cc = connected_components(core, core_edges)

    # cluster number = rank of the component's min core key within the
    # line (keys are line-prefixed, so label order within a line == the
    # (id, patternID) visit order of the matrix modes)
    ranked = cc.join(nodes.select("node", "linenumber"), "node").withColumn(
        "cluster",
        (
            F.dense_rank().over(
                Window.partitionBy("linenumber").orderBy("label")
            )
            - 1
        ).cast("int"),
    )

    # border: non-core nodes adopt the MIN cluster among core neighbors
    # (== first expanding cluster in dbscan_precomputed's visit order)
    border = (
        sym.join(
            ranked.select(F.col("node").alias("dst"), "cluster"), "dst"
        )
        .groupBy(F.col("src").alias("node"))
        .agg(F.min("cluster").alias("border_cluster"))
    )

    out = (
        nodes.join(ranked.select("node", "cluster"), "node", "left")
        .join(border, "node", "left")
        .select(
            "linenumber",
            "id",
            "patternID",
            F.coalesce(
                F.when(F.col("is_core"), F.col("cluster")),
                F.col("border_cluster"),
                F.lit(-1),
            ).cast("int").alias("cluster"),
        )
    )
    # the CC labeling already ran eagerly; pin the result and release
    # the working tables so callers composing further stages don't
    # accumulate them (ADVICE r2: persist without unpersist leaks)
    out = out.localCheckpoint()
    nodes.unpersist()
    return out
