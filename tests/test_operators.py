

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


def test_hll_sketch_rollup_accuracy_and_merge(spark):
    """The mergeable-sketch contract (operators/sketches.py): per-group
    HLL estimates track exact countDistinct within 3% (lgK=14 => 0.8%
    rsd, ~3 sigma), and MERGING stored partials to a coarser level gives
    the SAME estimate as sketching the coarse level directly — the
    property that lets a 100 TB rollup run over stored KB-size sketches
    instead of raw history."""
    from pyspark.sql import functions as F

    from gpssbzd_spark.operators.sketches import (
        hll_estimate,
        hll_partial,
        hll_rollup,
    )

    # 3 coarse groups x 4 fine subgroups, overlapping member ids so the
    # union is a real dedup (not a sum of disjoint counts)
    df = spark.range(0, 120_000).select(
        (F.col("id") % 3).alias("g"),
        (F.col("id") % 12).alias("sub"),
        (F.col("id") % 40_000).alias("member"),
    )
    partials = hll_partial(df, ["g", "sub"], "member")
    merged = hll_estimate(hll_rollup(partials, ["g"]))
    direct = hll_estimate(hll_partial(df, ["g"], "member"))
    exact = df.groupBy("g").agg(F.countDistinct("member").alias("nd"))

    m = {r.g: r.approx_nd for r in merged.collect()}
    d = {r.g: r.approx_nd for r in direct.collect()}
    e = {r.g: r.nd for r in exact.collect()}
    assert set(m) == set(e) == {0, 1, 2}
    for g in e:
        assert abs(m[g] - e[g]) / e[g] < 0.03, (g, m[g], e[g])
        # merged-from-partials tracks sketched-directly well inside
        # the rsd (the union promotes HLL_4 registers to HLL_8, so the
        # estimates are near-identical, not bit-identical)
        assert abs(m[g] - d[g]) / d[g] < 0.005, (g, m[g], d[g])


def test_hll_overlap_tracks_true_intersection(spark):
    """hll_overlap: inclusion-exclusion over per-key sketches tracks
    the true intersection within a few percent of the UNION size (the
    estimator's natural scale), including a disjoint pair clamped ≥ 0."""
    from pyspark.sql import functions as F

    from gpssbzd_spark.operators.sketches import hll_overlap, hll_partial

    # key 'x': left=0..60k, right=40k..100k -> true overlap 20k, union 100k
    # key 'y': left=0..10k, right=50k..60k -> disjoint, union 20k
    left = spark.range(0, 60_000).select(F.lit("x").alias("k"), "id").unionByName(
        spark.range(0, 10_000).select(F.lit("y").alias("k"), "id")
    )
    right = spark.range(40_000, 100_000).select(
        F.lit("x").alias("k"), "id"
    ).unionByName(spark.range(50_000, 60_000).select(F.lit("y").alias("k"), "id"))
    out = {
        r.k: r
        for r in hll_overlap(
            hll_partial(left, ["k"], "id"), hll_partial(right, ["k"], "id"), ["k"]
        ).collect()
    }
    assert abs(out["x"].n_overlap_est - 20_000) < 0.03 * 100_000
    assert 0 <= out["y"].n_overlap_est < 0.03 * 20_000


def test_hist_quantile_rollup_bound_and_merge(spark):
    """The mergeable-histogram contract (operators/sketches.py): the
    quantile read off merged partials (1) is within ONE BIN WIDTH below
    the exact percentile (the estimate is the containing bin's lower
    edge), and (2) equals binning the coarse level directly —
    merge-then-estimate == estimate-of-merged-data, the property that
    lets a rollup run over stored count arrays instead of raw data."""
    from pyspark.sql import functions as F

    from gpssbzd_spark.operators.sketches import (
        hist_partial,
        hist_quantile,
        hist_rollup,
    )

    lo, hi, bins = 0.0, 1000.0, 50
    w = (hi - lo) / bins
    df = spark.range(0, 60_000).select(
        (F.col("id") % 3).alias("g"),
        (F.col("id") % 12).alias("sub"),
        # skewed-ish but deterministic values in [0, 1000)
        ((F.col("id") * 37 % 1000).cast("double")).alias("v"),
    )
    partials = hist_partial(df, ["g", "sub"], "v", lo, hi, bins)
    merged = hist_rollup(partials, ["g"], bins)
    direct = hist_partial(df, ["g"], "v", lo, hi, bins)

    for q in (0.1, 0.5, 0.95):
        est_m = {
            r.g: r.est
            for r in merged.select(
                "g", hist_quantile(F.col("hist"), q, lo, hi, bins).alias("est")
            ).collect()
        }
        est_d = {
            r.g: r.est
            for r in direct.select(
                "g", hist_quantile(F.col("hist"), q, lo, hi, bins).alias("est")
            ).collect()
        }
        exact = {
            r.g: r.p
            for r in df.groupBy("g").agg(F.percentile("v", q).alias("p")).collect()
        }
        for g in exact:
            assert est_m[g] == est_d[g], (g, q, est_m[g], est_d[g])
            # lower bin edge: est <= exact < est + w
            assert est_m[g] <= exact[g] + 1e-9, (g, q, est_m[g], exact[g])
            assert exact[g] < est_m[g] + w + 1e-9, (g, q, est_m[g], exact[g])


def test_hist_quantile_empty_and_clamp(spark):
    """A group with only NULL values is ABSENT (the sparse count has no
    row for it — same as SQL GROUP BY over non-null rows), NULL values
    never land in a bin, and out-of-range values clamp into the edge
    bins instead of being dropped."""
    from pyspark.sql import functions as F

    from gpssbzd_spark.operators.sketches import (
        hist_partial,
        hist_quantile,
    )

    lo, hi, bins = 0.0, 100.0, 10
    df = spark.createDataFrame(
        [("empty", None), ("clamped", -50.0), ("clamped", 500.0)],
        "g string, v double",
    )
    out = {
        r.g: r.est
        for r in hist_partial(df, ["g"], "v", lo, hi, bins)
        .select("g", hist_quantile(F.col("hist"), 0.5, lo, hi, bins).alias("est"))
        .collect()
    }
    assert "empty" not in out
    # -50 clamps to bin 0 (edge 0.0); rank ceil(0.5*2)=1 → first bin
    assert out["clamped"] == 0.0


def test_funnel_strict_order_and_window(spark):
    """funnel_times/funnel_counts: out-of-order events don't convert
    (purchase before click ignored), the conversion window anchored at
    step 1 excludes late steps, and counts collapse correctly."""
    from datetime import datetime

    from gpssbzd_spark.operators.funnel import funnel_counts, funnel_times

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        # u1 converts fully in order
        (1, t(0), "view"), (1, t(10), "click"), (1, t(20), "purchase"),
        # u2: purchase BEFORE click -> stops at click (step 2)
        (2, t(0), "view"), (2, t(5), "purchase"), (2, t(10), "click"),
        # u3: click at t1+400 exceeds within=300 -> stops at step 1
        (3, t(0), "view"), (3, t(40), "click"),
        # u4 never views -> absent even though it clicks
        (4, t(0), "click"),
        # u5: click exactly AT view time -> strict > excludes it
        (5, t(0), "view"), (5, t(0), "click"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")

    out = {
        r.user_id: r.steps_completed
        for r in funnel_times(ev, ["view", "click", "purchase"]).collect()
    }
    assert out == {1: 3, 2: 2, 3: 2, 5: 1}

    # within=30s: u3's click at +40s no longer counts
    out_w = {
        r.user_id: r.steps_completed
        for r in funnel_times(ev, ["view", "click", "purchase"], within=30).collect()
    }
    assert out_w == {1: 3, 2: 2, 3: 1, 5: 1}

    counts = {
        r.step: (r.event_type, r.n_users, r.conversion)
        for r in funnel_counts(ev, ["view", "click", "purchase"], within=30).collect()
    }
    assert counts == {
        1: ("view", 4, 1.0),
        2: ("click", 2, 0.5),
        3: ("purchase", 1, 0.25),
    }


def test_retention_matrix_weekly_semantics(spark):
    """retention_matrix: cohort = week of first event, age in whole
    weeks, distinct users per cell, retention relative to cohort size,
    age=0 retention exactly 1.0."""
    from datetime import datetime

    from gpssbzd_spark.operators.funnel import retention_matrix

    d = lambda day, h=0: datetime(2024, 1, day, h)  # noqa: E731  (Jan 1 2024 = Monday)
    rows = [
        # cohort wk0: u1 active wk0+wk1, u2 active wk0 only (twice in
        # one week -> still one active count)
        (1, d(2)), (1, d(9)),
        (2, d(3)), (2, d(4)),
        # cohort wk1: u3 active wk1 and wk3 (gap week absent)
        (3, d(8)), (3, d(22)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r.cohort.isoformat(), r.age): (r.n_active, r.retention)
        for r in retention_matrix(ev, period="week").collect()
    }
    assert out == {
        ("2024-01-01", 0): (2, 1.0),
        ("2024-01-01", 1): (1, 0.5),
        ("2024-01-08", 0): (1, 1.0),
        ("2024-01-08", 2): (1, 1.0),
    }


def test_retention_matrix_null_user_excluded(spark):
    """A null user sharing a cohort week must not inflate that cohort's
    size: groupBy would keep the null-key group in `firsts` while the
    activity equi-join drops it, deflating retention and breaking the
    age=0 retention==1.0 invariant (ADVICE r5). Null users are not
    users — filtered with null timestamps."""
    from datetime import datetime

    from gpssbzd_spark.operators.funnel import retention_matrix

    d = lambda day: datetime(2024, 1, day)  # noqa: E731  (Jan 1 2024 = Monday)
    rows = [
        (1, d(2)), (1, d(9)),
        (None, d(3)),  # null user in cohort wk0 — must be ignored
        (2, d(8)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r.cohort.isoformat(), r.age): (r.n_active, r.retention)
        for r in retention_matrix(ev, period="week").collect()
    }
    assert out == {
        ("2024-01-01", 0): (1, 1.0),
        ("2024-01-01", 1): (1, 1.0),
        ("2024-01-08", 0): (1, 1.0),
    }
    assert all(ret == 1.0 for (_, age), (_, ret) in out.items() if age == 0)


def test_interval_overlap_join_semantics(spark):
    """interval_overlap_join: closed-bound overlap pairs per key, each
    TRUE pair emitted exactly once even when the two intervals share
    many buckets (the overlap-defining-bucket trick replaces a distinct
    re-shuffle); non-overlaps and cross-key pairs never appear; the
    result equals the naive theta join on the same input."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from gpssbzd_spark.operators.joins import interval_overlap_join

    t = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame(
        [
            (1, 10, t(0), t(50)),   # long: spans many 5-min buckets
            (1, 11, t(55), t(56)),  # overlaps nothing on key 1
            (2, 12, t(0), t(10)),   # other key
        ],
        "k long, lid long, ls timestamp, le timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, 20, t(5), t(45)),   # overlaps lid=10 across ~9 buckets
            (1, 21, t(50), t(52)),  # touches lid=10 exactly at its end
            (2, 22, t(11), t(12)),  # adjacent but NOT overlapping lid=12
        ],
        "k long, rid long, rs timestamp, re timestamp",
    )
    out = interval_overlap_join(
        left, right, ["k"], ("ls", "le"), ("rs", "re"), bucket_secs=300
    )
    pairs = sorted((r.lid, r.rid) for r in out.collect())
    assert pairs == [(10, 20), (10, 21)]  # exactly once each

    # equivalence vs the naive theta join for a denser random-ish input
    l2 = spark.range(60).select(
        (F.col("id") % 3).alias("k"),
        F.col("id").alias("lid"),
        F.timestamp_seconds(F.col("id") * 137 % 5000).alias("ls"),
        F.timestamp_seconds(F.col("id") * 137 % 5000 + 400).alias("le"),
    )
    r2 = spark.range(60).select(
        (F.col("id") % 3).alias("k"),
        (F.col("id") + 100).alias("rid"),
        F.timestamp_seconds(F.col("id") * 211 % 5000).alias("rs"),
        F.timestamp_seconds(F.col("id") * 211 % 5000 + 250).alias("re"),
    )
    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(
            l2, r2, ["k"], ("ls", "le"), ("rs", "re"), bucket_secs=300
        ).collect()
    )
    naive = sorted(
        (r.lid, r.rid)
        for r in l2.join(r2, "k")
        .filter((F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le")))
        .collect()
    )
    assert got == naive and len(got) > 0


def test_outliers_mad_semantics(spark):
    """outliers_mad: a clean uniform column scores 0 outliers; planted
    far points are counted exactly; MAD is unmoved by the outliers
    themselves (the robustness property that motivates MAD over
    stddev); all-null columns degrade to null stats, not a crash."""
    from pyspark.sql import functions as F

    from gpssbzd_spark.operators.profile import outliers_mad

    base = spark.range(0, 1001).select(
        (F.col("id") % 11).cast("double").alias("clean"),
        F.when(F.col("id") < 3, 1e6)
        .otherwise((F.col("id") % 11).cast("double"))
        .alias("spiked"),
        F.lit(None).cast("double").alias("allnull"),
    )
    out = {r.column: r for r in outliers_mad(base, ["clean", "spiked", "allnull"]).collect()}
    assert out["clean"].n_outliers == 0
    assert out["spiked"].n_outliers == 3  # exactly the planted points
    # robustness: 3 wild points leave median/MAD at the clean values
    assert out["spiked"].median_value == out["clean"].median_value
    assert out["spiked"].mad == out["clean"].mad
    assert out["allnull"].median_value is None
    assert out["allnull"].n_outliers == 0


def test_outliers_mad_approx_accuracy(spark):
    """outliers_mad(percentile="approx"): the 100 TB scale switch
    (approx_percentile sketch instead of exact percentile's
    buffer-every-value aggregate) stays pinned to the exact path —
    median/MAD within the sketch's rank-error bound on a 10k-row
    integer-granular column, and the outlier verdict (count built from
    the approximate center/spread) identical on well-separated data."""
    from pyspark.sql import functions as F

    from gpssbzd_spark.operators.profile import outliers_mad

    base = spark.range(0, 10000).select(
        (F.col("id") % 101).cast("double").alias("x"),
        F.when(F.col("id") < 7, 1e7)
        .otherwise((F.col("id") % 101).cast("double"))
        .alias("spiked"),
    )
    exact = {r.column: r for r in outliers_mad(base, ["x", "spiked"]).collect()}
    approx = {
        r.column: r
        for r in outliers_mad(
            base, ["x", "spiked"], percentile="approx"
        ).collect()
    }
    for c in ("x", "spiked"):
        # accuracy 10000 → ≤0.01% rank error; on the %101 lattice that
        # is at most one lattice step of drift in median or MAD
        assert abs(approx[c].median_value - exact[c].median_value) <= 1.0
        assert abs(approx[c].mad - exact[c].mad) <= 1.0
        assert approx[c].n_outliers == exact[c].n_outliers
    assert approx["spiked"].n_outliers == 7


def test_drift_psi_semantics(spark):
    """drift_psi: identical distributions score 0; a genuine shift
    scores positive; out-of-range values clamp into the edge bins
    (mass moves, never vanishes); nulls are excluded."""
    from pyspark.sql import functions as F

    from gpssbzd_spark.operators.profile import drift_psi

    a = spark.range(0, 1000).select((F.col("id") % 10).cast("double").alias("x"))
    specs = {"x": (0.0, 10.0, 10)}
    same = drift_psi(a, a, specs).collect()[0]
    assert same.psi == 0.0

    # shift: mass collapses into the lower half — strongly positive PSI
    b = a.select(F.floor(F.col("x") / 2).cast("double").alias("x"))
    assert drift_psi(a, b, specs).collect()[0].psi > 0.1

    # clamping: values at 1e6 land in the last bin, not dropped; the
    # PSI vs uniform must see that mass (equal to replacing bin 9)
    c = spark.range(0, 1000).select(
        F.when(F.col("id") % 10 == 9, 1e6)
        .otherwise((F.col("id") % 10).cast("double"))
        .alias("x")
    )
    assert drift_psi(a, c, specs).collect()[0].psi == 0.0  # same bins after clamp

    # nulls excluded: padding one side with nulls changes nothing
    d = a.unionByName(
        spark.range(0, 100).select(F.lit(None).cast("double").alias("x"))
    )
    assert drift_psi(a, d, specs).collect()[0].psi == 0.0


def test_scd2_history_semantics(spark):
    """scd2_history (cdc.py): consecutive unchanged snapshots collapse
    into one validity run; valid_to is the next run's valid_from
    (exclusive) and NULL on the current run; change detection is
    null-safe (NULL→NULL is not a change, NULL→value is)."""
    from datetime import date

    from gpssbzd_spark.operators.cdc import scd2_history

    d = lambda day: date(2024, 1, day)  # noqa: E731
    rows = [
        # u1: A A B B A  -> 3 runs
        (1, d(1), "A"), (1, d(2), "A"), (1, d(3), "B"),
        (1, d(4), "B"), (1, d(5), "A"),
        # u2: NULL NULL X -> 2 runs (NULL->NULL is NOT a change)
        (2, d(1), None), (2, d(2), None), (2, d(3), "X"),
    ]
    df = spark.createDataFrame(rows, "k long, snap date, v string")
    out = {
        (r.k, r.v, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_history(df, ["k"], ["v"], "snap").collect()
    }
    assert out == {
        (1, "A", d(1), d(3), False),
        (1, "A", d(5), None, True),
        (1, "B", d(3), d(5), False),
        (2, None, d(1), d(3), False),
        (2, "X", d(3), None, True),
    }


def test_profile_numeric_approx_tracks_exact(spark):
    """profile_numeric(distinct="approx") — the one-argument 100 TB
    setting (VERDICT r5 #4) — must agree with the exact profile on
    every metric except n_distinct, and its HLL n_distinct must track
    the exact count within 10% (rsd=0.02 ⇒ ~3σ = 6%; 10% is the slack
    for small fixture cardinalities)."""
    from pyspark.sql import functions as F

    from gpssbzd_spark.operators.profile import profile_numeric

    df = spark.range(0, 20_000).select(
        (F.col("id") % 5000).cast("double").alias("a"),
        F.when(F.col("id") % 7 == 0, None)
        .otherwise((F.col("id") % 97).cast("double"))
        .alias("b"),
    )
    exact = {r.column: r for r in profile_numeric(df, ["a", "b"]).collect()}
    approx = {
        r.column: r
        for r in profile_numeric(df, ["a", "b"], distinct="approx").collect()
    }
    for c in ("a", "b"):
        e, p = exact[c], approx[c]
        assert (e.n_rows, e.n_nulls, e.min_value, e.max_value, e.avg_value) == (
            p.n_rows, p.n_nulls, p.min_value, p.max_value, p.avg_value
        )
        assert abs(p.n_distinct - e.n_distinct) <= 0.10 * e.n_distinct, (
            c, p.n_distinct, e.n_distinct
        )


def test_merge_upsert_semantics(spark):
    """merge_upsert: updates replace matched rows, inserts append,
    untouched base rows pass through — and the result has exactly
    base ∪ inserts keys (cdc.py)."""
    from pyspark.sql import functions as F

    from gpssbzd_spark.operators.cdc import merge_upsert

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, v double",
    )
    updates = spark.createDataFrame(
        [(2, "b2", 99.0), (4, "d", 40.0)], "k long, name string, v double"
    )
    got = {r.k: (r.name, r.v) for r in merge_upsert(base, updates, ["k"]).collect()}
    assert got == {
        1: ("a", 10.0),
        2: ("b2", 99.0),  # replaced
        3: ("c", 30.0),
        4: ("d", 40.0),  # inserted
    }
    # the scale contract: a broadcast update batch must produce a plan
    # with NO sort-merge join and NO hash-partition shuffle of the base
    # (anti-join + union formulation; a full-outer formulation cannot
    # broadcast and would shuffle the 100 TB base)
    for oc in (None, "v"):
        plan = merge_upsert(
            base, F.broadcast(updates), ["k"], order_col=oc
        )._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan, oc
        assert "Exchange hashpartitioning" not in plan, oc
        assert "BroadcastHashJoin" in plan, oc


def test_snapshot_diff_churn_only(spark):
    """snapshot_diff: emits insert/update/delete rows only — unchanged
    rows are dropped, null-to-value transitions count as updates, and
    delete rows carry the OLD values (cdc.py)."""
    from gpssbzd_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, "d", 40.0)],
        "k long, name string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 21.0), (4, "D", 40.0), (5, "e", 50.0)],
        "k long, name string, v double",
    )
    got = {r.k: (r.op, r.name, r.v) for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {
        2: ("update", "b", 21.0),  # NULL -> value is a change
        3: ("delete", "c", 30.0),  # old values preserved
        4: ("update", "D", 40.0),
        5: ("insert", "e", 50.0),
    }  # k=1 unchanged -> absent


def test_pivot_unpivot_roundtrip(spark):
    """unpivot_long is row-local (no exchange in the plan) and
    pivot_wide(unpivot(df)) restores the original wide values
    (reshape.py)."""
    from pyspark.sql import functions as F

    from gpssbzd_spark.operators.reshape import pivot_wide, unpivot_long

    wide = spark.createDataFrame(
        [(1, 10.0, 100.0), (2, 20.0, 200.0)], "k long, m1 double, m2 double"
    )
    long = unpivot_long(wide, ["k"], ["m1", "m2"])
    assert "Exchange" not in long._jdf.queryExecution().executedPlan().toString()
    # single aggregate: pivot names columns by bare pivot value
    back = pivot_wide(
        long, ["k"], "metric", ["m1", "m2"], {"v": F.first("value")}
    )
    got = {r.k: (r.m1, r.m2) for r in back.collect()}
    assert got == {1: (10.0, 100.0), 2: (20.0, 200.0)}


def test_merge_upsert_order_col_replay_safe(spark):
    """With order_col, applying an OLD change batch after a newer one
    cannot regress a key (WHEN MATCHED AND u.ord >= b.ord); equal
    order values let the update win (redelivery overwrites with the
    identical row — idempotent)."""
    from gpssbzd_spark.operators.cdc import merge_upsert

    base = spark.createDataFrame(
        [(1, 100, "new"), (2, 50, "mid")], "k long, ver long, v string"
    )
    stale = spark.createDataFrame(
        [(1, 90, "old"), (2, 50, "mid-redelivered"), (3, 10, "ins")],
        "k long, ver long, v string",
    )
    got = {
        r.k: (r.ver, r.v)
        for r in merge_upsert(base, stale, ["k"], order_col="ver").collect()
    }
    assert got == {
        1: (100, "new"),  # stale update rejected
        2: (50, "mid-redelivered"),  # equal version: update wins
        3: (10, "ins"),  # insert unaffected by the gate
    }


def test_scd2_randomized_against_python_reference(spark):
    """150 keys x random snapshot stacks (seeded, with nulls and long
    constant runs): scd2_history must match a direct Python evaluation
    of the run-collapse semantics — null-safe change detection,
    valid_from = run's first snapshot, valid_to = next run's
    valid_from, is_current on the last run."""
    import random
    from datetime import date, timedelta

    from gpssbzd_spark.operators.cdc import scd2_history

    rng = random.Random(7)
    vals = ["A", "B", "C", None]
    base = date(2024, 1, 1)
    rows = []
    per_key: dict[int, list] = {}
    for k in range(150):
        days = sorted(rng.sample(range(60), rng.randint(1, 12)))
        seq = [(base + timedelta(days=d), rng.choice(vals)) for d in days]
        per_key[k] = seq
        rows += [(k, d, v) for d, v in seq]
    rng.shuffle(rows)

    expected = set()
    for k, seq in per_key.items():
        runs = []
        for d, v in seq:  # seq already time-ordered
            if not runs or runs[-1][0] != v:
                runs.append([v, d])
        for i, (v, start) in enumerate(runs):
            nxt = runs[i + 1][1] if i + 1 < len(runs) else None
            expected.add((k, v, start, nxt, nxt is None))

    df = spark.createDataFrame(rows, "k long, snap date, v string")
    got = {
        (r.k, r.v, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_history(df, ["k"], ["v"], "snap").collect()
    }
    assert got == expected


def test_funnel_randomized_against_python_reference(spark):
    """200 users x random event streams (seeded): funnel_times must
    match a direct per-user Python evaluation of the strict-order
    semantics — earliest step-k event strictly after t_{k-1}, within
    the window anchored at t1 — including users with shuffled event
    order and repeated types."""
    import random
    from datetime import datetime, timedelta

    from gpssbzd_spark.operators.funnel import funnel_times

    rng = random.Random(42)
    steps = ["view", "click", "purchase"]
    types = steps + ["error", "signup"]
    base = datetime(2024, 1, 1)
    rows = []
    for u in range(200):
        for _ in range(rng.randint(0, 12)):
            rows.append(
                (u, base + timedelta(seconds=rng.randint(0, 100_000)),
                 rng.choice(types))
            )
    rng.shuffle(rows)
    within = 30_000.0

    # reference implementation: direct semantics, no Spark
    expected = {}
    by_user = {}
    for u, ts, ty in rows:
        by_user.setdefault(u, []).append((ts, ty))
    for u, evs in by_user.items():
        t1 = min((ts for ts, ty in evs if ty == steps[0]), default=None)
        if t1 is None:
            continue
        prev, out = t1, [t1]
        for step in steps[1:]:
            nxt = min(
                (
                    ts
                    for ts, ty in evs
                    if ty == step
                    and ts > prev
                    and (ts - t1).total_seconds() <= within
                ),
                default=None,
            )
            out.append(nxt)
            if nxt is None:
                break
            prev = nxt
        out += [None] * (len(steps) - len(out))
        expected[u] = tuple(out)

    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        r.user_id: (r.t1, r.t2, r.t3)
        for r in funnel_times(ev, steps, within=within).collect()
    }
    assert got == expected


def test_retention_randomized_against_python_reference(spark):
    """Seeded random activity: retention_matrix must reproduce a direct
    Python evaluation — cohort = first active period, one count per
    (cohort, age) of distinct users active then, retention over cohort
    size."""
    import random
    from collections import defaultdict
    from datetime import date, datetime, timedelta

    from gpssbzd_spark.operators.funnel import retention_matrix

    rng = random.Random(7)
    rows = []
    for u in range(150):
        for _ in range(rng.randint(1, 10)):
            rows.append(
                (u, datetime(2024, 1, 1) + timedelta(
                    minutes=rng.randint(0, 60 * 24 * 60)))
            )

    def week_of(dt: datetime) -> date:
        d = dt.date()
        return d - timedelta(days=d.weekday())

    first = {}
    active = defaultdict(set)
    for u, ts in rows:
        w = week_of(ts)
        first[u] = min(first.get(u, w), w)
    for u, ts in rows:
        active[(first[u], (week_of(ts) - first[u]).days // 7)].add(u)
    cohort_sizes = defaultdict(int)
    for u, c in first.items():
        cohort_sizes[c] += 1
    expected = {
        (c, age): (len(users), round(len(users) / cohort_sizes[c], 4))
        for (c, age), users in active.items()
    }

    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.cohort, r.age): (r.n_active, r.retention)
        for r in retention_matrix(ev, period="week").collect()
    }
    assert got == expected


def test_time_bucket_gapfill_modes(spark):
    """time_bucket_gapfill: the dense spine covers [min,max] buckets per
    key, is_gap marks empty buckets, and the three fill modes behave —
    null leaves holes, prev forward-fills (locf), zero coalesces."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from gpssbzd_spark.operators.timeseries import time_bucket_gapfill

    rows = [
        # key 'a': buckets 0, 3 active (gap at 1, 2); key 'b': bucket 1 only
        ("a", datetime(2024, 1, 1, 0, 5), 10.0),
        ("a", datetime(2024, 1, 1, 0, 50), 20.0),
        ("a", datetime(2024, 1, 1, 3, 10), 40.0),
        ("b", datetime(2024, 1, 1, 1, 30), 7.0),
        ("a", None, 999.0),  # null ts excluded
    ]
    ev = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    aggs = {"s": F.sum("v")}

    def run(fill):
        return {
            (r.k, r.bucket.hour): (r.is_gap, r.s)
            for r in time_bucket_gapfill(ev, "ts", ["k"], 3600, aggs, fill).collect()
        }

    null_fill = run("null")
    assert set(null_fill) == {("a", 0), ("a", 1), ("a", 2), ("a", 3), ("b", 1)}
    assert null_fill[("a", 0)] == (False, 30.0)
    assert null_fill[("a", 1)] == (True, None)
    assert null_fill[("a", 3)] == (False, 40.0)
    assert null_fill[("b", 1)] == (False, 7.0)

    prev = run("prev")
    assert prev[("a", 1)] == (True, 30.0)  # locf from bucket 0
    assert prev[("a", 2)] == (True, 30.0)
    assert prev[("a", 3)] == (False, 40.0)

    zero = run("zero")
    assert zero[("a", 1)] == (True, 0.0)
    assert zero[("a", 0)] == (False, 30.0)


def test_time_bucket_gapfill_linear(spark):
    """fill='linear': gap buckets get the distance-weighted blend of
    their bracketing non-null buckets; outside the bracket (before the
    first value) the fill stays NULL."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from gpssbzd_spark.operators.timeseries import time_bucket_gapfill

    rows = [
        ("a", datetime(2024, 1, 1, 1, 5), 10.0),   # bucket 1 -> 10
        ("a", datetime(2024, 1, 1, 4, 10), 40.0),  # bucket 4 -> 40
    ]
    ev = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {
        r.bucket.hour: (r.is_gap, r.s)
        for r in time_bucket_gapfill(
            ev, "ts", ["k"], 3600, {"s": F.sum("v")}, fill="linear"
        ).collect()
    }
    assert out[1] == (False, 10.0)
    assert out[2] == (True, 20.0)   # 10 + (40-10) * 1/3
    assert out[3] == (True, 30.0)
    assert out[4] == (False, 40.0)


def test_funnel_duplicate_step_types(spark):
    """steps may repeat: ['view','view'] means a SECOND view strictly
    after the first — a user with one view stops at step 1."""
    from datetime import datetime

    from gpssbzd_spark.operators.funnel import funnel_times

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        (1, t(0), "view"), (1, t(5), "view"),   # two views -> step 2
        (2, t(0), "view"),                       # one view  -> step 1
        (3, t(0), "view"), (3, t(0), "view"),    # same ts: strict > fails
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {
        r.user_id: r.steps_completed
        for r in funnel_times(ev, ["view", "view"]).collect()
    }
    assert out == {1: 2, 2: 1, 3: 1}


def test_transition_matrix_semantics(spark):
    """transition_matrix: per-user consecutive pairs only (no
    cross-user bleed), deterministic under equal timestamps via the
    tie-break column, last events drop, probs row-normalize."""
    from datetime import datetime

    from gpssbzd_spark.operators.funnel import transition_matrix

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        # u1: a -> b -> a ; u2: b alone (drops) ; u3: equal-ts pair
        (1, 1, t(0), "a"), (2, 1, t(1), "b"), (3, 1, t(2), "a"),
        (4, 2, t(0), "b"),
        (5, 3, t(0), "a"), (6, 3, t(0), "b"),  # same ts: event_id orders
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = {
        (r.from_type, r.to_type): (r.n_transitions, r.prob)
        for r in transition_matrix(ev).collect()
    }
    assert out == {
        ("a", "b"): (2, 1.0),   # u1's a->b and u3's tie-broken a->b
        ("b", "a"): (1, 1.0),   # u1's b->a; u2's lone b emits nothing
    }
