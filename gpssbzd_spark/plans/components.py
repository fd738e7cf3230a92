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


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 50
) -> DataFrame:
    """Connected components of an undirected graph.

    ``nodes``: one string column ``node`` (isolated nodes allowed);
    ``edges``: columns ``src``/``dst`` (one direction is enough).
    Returns (node, label) where label is the component's minimum node.

    Runs EAGERLY (one small Spark job per round — an action is how the
    driver learns the fixpoint was reached). Rounds are O(log diameter)
    thanks to path halving; ``max_iter`` is a backstop, not a tuning
    knob.
    """
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()

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
    # the CC loop already ran eagerly; pin the result and release the
    # loop's working tables so callers composing further stages don't
    # accumulate them (ADVICE r2: persist without unpersist leaks)
    out = out.localCheckpoint()
    edges.unpersist()
    nodes.unpersist()
    return out
