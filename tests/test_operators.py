

def test_salted_join_matches_plain_join_and_spreads_hot_key(spark):
    """salted_join must return exactly the plain join's rows (inner and
    left, including unmatched-left nulls) while carrying a salt column
    through the join key — the declarative fix for a hot key that AQE
    cannot split (stream-static / bucketed joins)."""
    from pyspark.sql import functions as F

    from gpssbzd_spark.operators.skew import salted_join

    # 10k rows of hot key 'A' + a long tail; dim with a few keys
    big = spark.range(0, 10_500).select(
        F.when(F.col("id") < 10_000, "A")
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 97).cast("string")))
        .alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame(
        [("A", 1), ("k3", 2), ("missing", 9)], "k string, attr int"
    )
    for how in ("inner", "left"):
        plain = big.join(small, ["k"], how)
        salted = salted_join(big, small, ["k"], n_salt=8, how=how)
        assert sorted(map(tuple, salted.collect())) == sorted(
            map(tuple, plain.collect())
        ), how
    # determinism: same input → same salt → stable under repartition
    s1 = sorted(map(tuple, salted_join(big, small, ["k"], 8).collect()))
    s2 = sorted(
        map(tuple, salted_join(big.repartition(5), small, ["k"], 8).collect())
    )
    assert s1 == s2
