"""Stage 3 — Blind Zone Detection: qualified-cluster speed analysis with
the 0.5 → 0.75 → 1.0 signal-confidence cascade.

Semantics from `Standalone/Blind Zone Detection.scala:45-165` (the
Parallel variant is the same modulo statement order), as ONE declarative
plan:

- drop DBSCAN noise (cluster = −1);
- keep clusters covering ≥ 75% of distinct vehicles — the global vehicle
  count is joined in as a broadcast single-row aggregate instead of the
  reference's driver-side ``count()`` action (SBZ:58);
- per-segment speed from lead(ts/lat/lng) + native haversine (the
  reference uses a Scala UDF — SBZ:49);
- signal cascade:
  0.5  on each (cluster, id, patternID)'s max-speed point,
  0.75 if EVERY vehicle's max-speed point in the cluster exceeds
       ``speed_floor`` (10 m/s),
  1.0  if EVERY segment in the cluster carries a 0.75,
  then one-step lag propagation to the next row in time.

Scale notes: all three cascade steps are partial-aggregable two-level
aggs joined back per cluster (broadcastable: one row per cluster); the
only wide shuffles are the window over (cluster, id, patternID) and the
qualification agg — both keyed consistently so AQE can reuse exchange.

Determinism: the reference orders the max-speed window by speed DESC
only (SBZ:105); ties make row_number nondeterministic. We add ``ts`` and
coordinates as tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gpssbzd_spark.functions.geo import haversine_m

QUALIFY_FRACTION = 0.75  # cluster must cover ≥75% of vehicles (SBZ:59)
SPEED_FLOOR_MPS = 10.0  # escalation speed bound (SBZ:117)


def with_segment_speed(df: DataFrame) -> DataFrame:
    """Speed (m/s) toward the NEXT ping within (id, patternID)."""
    w = Window.partitionBy("id", "patternID").orderBy("ts")
    nxt_ts = F.lead("ts", 1).over(w)
    nxt_lat = F.lead("lat", 1).over(w)
    nxt_lng = F.lead("lng", 1).over(w)
    time_diff = F.when(
        nxt_ts.isNotNull(), F.unix_timestamp(nxt_ts) - F.unix_timestamp("ts")
    ).otherwise(F.lit(0))
    distance = F.when(
        nxt_lat.isNotNull() & nxt_lng.isNotNull(),
        haversine_m(F.col("lat"), F.col("lng"), nxt_lat, nxt_lng),
    ).otherwise(F.lit(0.0))
    return (
        df.withColumn("_td", time_diff)
        .withColumn("_dist", distance)
        .withColumn(
            "speed",
            F.when(F.col("_td") == 0, F.lit(0.0)).otherwise(F.col("_dist") / F.col("_td")),
        )
        .drop("_td", "_dist")
    )


def detect_blind_zones(
    clusters: DataFrame,
    qualify_fraction: float = QUALIFY_FRACTION,
    speed_floor: float = SPEED_FLOOR_MPS,
) -> DataFrame:
    """clusters (id, linenumber, lng, lat, ts, patternID, cluster) →
    qualified rows + ``speed`` + ``signal`` ∈ {null, 0.5, 0.75, 1.0}."""
    df = clusters.filter(F.col("cluster") != -1)

    # Cluster qualification: ≥ fraction of ALL vehicles. The total is a
    # one-row agg cross-joined (broadcast) — no driver action (SBZ:58-65
    # does .count() on the driver).
    total = df.agg(F.countDistinct("id").alias("_total_ids"))
    qualified = (
        df.groupBy("cluster")
        .agg(F.countDistinct("id").alias("_id_count"))
        .crossJoin(F.broadcast(total))
        .filter(
            F.col("_id_count")
            >= F.floor(F.lit(qualify_fraction) * F.col("_total_ids")).cast("int")
        )
        .select("cluster")
    )
    df = df.join(F.broadcast(qualified), "cluster", "left_semi")

    df = with_segment_speed(df)

    # Step 1: 0.5 on each segment's max-speed point (deterministic ties).
    w_speed = Window.partitionBy("cluster", "id", "patternID").orderBy(
        F.col("speed").desc(), F.col("ts"), F.col("lng"), F.col("lat")
    )
    df = df.withColumn(
        "signal",
        F.when(F.row_number().over(w_speed) == 1, F.lit(0.5)).otherwise(F.lit(None)),
    )
    # the post-speed rows feed the main path plus both cascade
    # aggregates (all_fast, all75) — the checkpoint pins the semi-join +
    # speed window prefix to one materialization (exchange reuse catches
    # most of it; the pin makes it structural). GC-scoped
    # localCheckpoint, not a session persist (the ADVICE r5 leak class)
    df = df.localCheckpoint()

    # Step 2: 0.5 → 0.75 when EVERY vehicle's max-speed point is fast.
    fast_flag = F.max(
        F.when((F.col("signal") == 0.5) & (F.col("speed") > speed_floor), 1).otherwise(0)
    )
    all_fast = (
        df.groupBy("cluster", "id")
        .agg(fast_flag.alias("_has_fast"))
        .groupBy("cluster")
        .agg(F.min("_has_fast").alias("_all_fast"))
    )
    df = (
        df.join(F.broadcast(all_fast), "cluster", "left")
        .withColumn(
            "signal",
            F.when((F.col("signal") == 0.5) & (F.col("_all_fast") == 1), 0.75).otherwise(
                F.col("signal")
            ),
        )
        .drop("_all_fast")
    )

    # Step 3: 0.75 → 1.0 when EVERY segment of the cluster has a 0.75.
    has75 = F.max(F.when(F.col("signal") == 0.75, 1).otherwise(0))
    all75 = (
        df.groupBy("cluster", "id", "patternID")
        .agg(has75.alias("_has_75"))
        .groupBy("cluster")
        .agg(F.min("_has_75").alias("_all_75"))
    )
    df = (
        df.join(F.broadcast(all75), "cluster", "left")
        .withColumn(
            "signal",
            F.when((F.col("signal") == 0.75) & (F.col("_all_75") == 1), 1.0).otherwise(
                F.col("signal")
            ),
        )
        .drop("_all_75")
    )

    # Step 4: one-step propagation to the following row in time (SBZ:153).
    w_time = Window.partitionBy("cluster", "id", "patternID").orderBy("ts")
    prev_signal = F.lag("signal", 1).over(w_time)
    return df.withColumn(
        "signal",
        F.when(F.col("signal").isNull() & prev_signal.isin(0.5, 0.75, 1.0), prev_signal)
        .otherwise(F.col("signal")),
    )
