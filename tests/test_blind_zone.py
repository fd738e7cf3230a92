"""Stage-3 tests: cluster qualification + speed + signal cascade."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gpssbzd_spark.plans.blind_zone import detect_blind_zones, with_segment_speed


def _ping(vid, pid, cluster, t, lng, lat, line="L1"):
    return (vid, line, lng, lat, t, str(pid), cluster)


@pytest.fixture(scope="module")
def clusters(spark):
    """4 vehicles. Cluster 0 covers all 4 (qualified, all fast →
    escalates); cluster 1 covers 1 of 4 (dropped); cluster −1 noise
    (dropped). Fast = ~222 m in 10 s ≈ 22 m/s; slow = ~22 m in 10 s."""
    rows = []
    for i, vid in enumerate(["a", "b", "c", "d"]):
        lat = 22.60 + i * 0.01
        # two segments (patternID 1, 2) in cluster 0, each with a fast hop
        for pid in (1, 2):
            base_lng = 114.0 + pid * 0.05
            rows += [
                _ping(vid, pid, 0, f"2019-02-01 08:{pid}0:00", base_lng, lat),
                _ping(vid, pid, 0, f"2019-02-01 08:{pid}0:10", base_lng + 0.002, lat),
                _ping(vid, pid, 0, f"2019-02-01 08:{pid}0:20", base_lng + 0.0022, lat),
            ]
    # cluster 1: only vehicle a → not qualified (1 < floor(0.75*4)=3)
    rows.append(_ping("a", 9, 1, "2019-02-01 09:00:00", 114.5, 22.9))
    # noise
    rows.append(_ping("b", 9, -1, "2019-02-01 09:10:00", 114.6, 22.9))
    df = spark.createDataFrame(
        rows,
        "id string, linenumber string, lng double, lat double, t string, "
        "patternID string, cluster int",
    )
    return df.withColumn("ts", F.to_timestamp("t"))


def test_qualification_and_noise(spark, clusters):
    out = detect_blind_zones(clusters).cache()
    assert out.filter("cluster = -1").count() == 0
    assert out.filter("cluster = 1").count() == 0
    assert out.filter("cluster = 0").count() == 24


def test_speed_computation(spark, clusters):
    sp = with_segment_speed(clusters.filter("cluster = 0"))
    fast = sp.filter("speed > 15").count()
    # one fast hop (~205 m/10 s) per (vehicle, segment): 4 × 2
    assert fast == 8
    # last ping of each segment has speed 0
    last = sp.filter("t like '%:20'")
    assert last.filter("speed != 0").count() == 0


def test_signal_cascade_full_escalation(spark, clusters):
    out = detect_blind_zones(clusters).cache()
    # every vehicle's max-speed point is fast and every segment has one →
    # the max-speed point of every (id, patternID) escalates 0.5→0.75→1.0,
    # and step-4 propagation copies the escalated value to the next row
    # (8 max-speed points + 8 propagated followers)
    assert out.filter("signal = 1.0").count() == 16
    assert out.filter("signal is not null").count() == 16
    assert set(
        r["signal"] for r in out.select("signal").distinct().collect()
    ) == {None, 1.0}


def test_signal_stops_at_075_when_one_vehicle_slow(spark, clusters):
    # shrink vehicle d's displacement 10× (max speed ~2 m/s) → cluster no
    # longer all-fast → everyone stays at 0.5
    base = F.lit(114.0) + F.col("patternID").cast("int") * 0.05
    slowed = clusters.withColumn(
        "lng",
        F.when(
            F.col("id") == "d", base + (F.col("lng") - base) * 0.1
        ).otherwise(F.col("lng")),
    )
    out = detect_blind_zones(slowed).cache()
    sigs = {r["signal"] for r in out.select("signal").distinct().collect()}
    assert 0.5 in sigs and 0.75 not in sigs and 1.0 not in sigs
