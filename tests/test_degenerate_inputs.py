"""Degenerate-input contracts surfaced by the round-2 adversarial
review: NULL/empty/corrupt rows must degrade per-row (NULL out, drop,
or mark far), never crash a job or silently score as best-quality /
exact-duplicate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from gpssbzd_spark.dataprep.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    sample_frames,
)
from gpssbzd_spark.dataprep.text import (
    doc_fingerprint,
    doc_fingerprint_native,
    language_id,
    quality_features,
)
from gpssbzd_spark.functions.geo import haversine_m, haversine_sql


def test_haversine_never_nan_near_antipodes(spark):
    """FP rounding can push the haversine term past 1.0; unclamped that
    is sqrt(negative) = NaN, and NaN passes every 'distance > x' gate
    because Spark orders NaN above all doubles."""
    df = spark.createDataFrame(
        [(68.4815987990918, -135.281891529838, -68.4815987984282, 44.7181084712934)],
        "lat1 double, lng1 double, lat2 double, lng2 double",
    )
    d_native = df.select(
        haversine_m(F.col("lat1"), F.col("lng1"), F.col("lat2"), F.col("lng2")).alias("d")
    ).first()["d"]
    d_sql = df.selectExpr(
        f"{haversine_sql('lat1', 'lng1', 'lat2', 'lng2')} AS d"
    ).first()["d"]
    import math

    assert math.isfinite(d_native), d_native
    assert math.isfinite(d_sql), d_sql
    assert d_native == pytest.approx(d_sql)
    assert d_native == pytest.approx(2 * 6371000.0 * math.pi / 2, rel=0.01)


def test_quality_features_empty_text_scores_worst_not_best(spark):
    df = spark.createDataFrame(
        [("", ), ("   ",), ("real words here",), (None,)], "text string"
    )
    feats = quality_features(F.col("text"))
    out = {
        r["text"]: r
        for r in df.select("text", *[c.alias(n) for n, c in feats.items()]).collect()
    }
    assert out[""]["n_tokens"] == 0
    assert out["   "]["n_tokens"] == 0
    assert out[""]["type_token_ratio"] is None  # not a perfect 1.0
    assert out["real words here"]["n_tokens"] == 3


def test_language_id_null_text_is_null_not_und(spark):
    df = spark.createDataFrame([(None,), ("xyzzy plugh",)], "text string")
    got = [r["lang"] for r in df.select(language_id(F.col("text")).alias("lang")).collect()]
    assert got[0] is None  # missing doc, not "undetermined language"
    assert got[1] == "und"


def test_fingerprints_null_empty_short_contract(spark):
    """Both fingerprint twins: NULL/empty → NULL; short texts get
    DISTINCT fingerprints per content (not one shared collapse value)."""
    rows = [(None,), ("",), ("ab",), ("cd",), ("a longer realistic document body",)]
    df = spark.createDataFrame(rows, "text string")
    for fp_fn in (doc_fingerprint, doc_fingerprint_native):
        got = [
            r["fp"] for r in df.select(fp_fn(F.col("text")).alias("fp")).collect()
        ]
        assert got[0] is None, fp_fn.__name__
        assert got[1] is None, fp_fn.__name__
        assert got[2] is not None and got[3] is not None, fp_fn.__name__
        assert got[2] != got[3], f"{fp_fn.__name__} collapsed short texts"
        assert got[4] is not None, fp_fn.__name__


def test_sample_frames_negative_duration_drops_row_not_job(spark):
    rows = [
        Row(media_id=1, content=None,
            meta=Row(kind="video", mime="video/mp4", width=None, height=None,
                     duration_ms=3000)),
        Row(media_id=2, content=None,
            meta=Row(kind="video", mime="video/mp4", width=None, height=None,
                     duration_ms=-500)),  # corrupt: would crash sequence()
        Row(media_id=3, content=None,
            meta=Row(kind="video", mime="video/mp4", width=None, height=None,
                     duration_ms=None)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = sample_frames(df, every_ms=1000).groupBy("media_id").count().collect()
    counts = {r["media_id"]: r["count"] for r in got}
    assert counts == {1: 4}  # 0,1000,2000,3000; corrupt + null rows drop


def test_extract_features_tolerates_null_meta(spark):
    rows = [
        Row(media_id=1, content=b"abc",
            meta=Row(kind="image", mime="image/png", width=4, height=4,
                     duration_ms=None)),
        Row(media_id=2, content=b"def", meta=None),  # schema-legal NULL struct
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in extract_features(df, decode="fake").collect()}
    assert len(out) == 2
    assert out[1]["kind"] == "image"
    assert out[2]["kind"] is None  # passed through, not crashed
    assert out[2]["n_bytes"] == 3


def test_new_mutation_and_layout_ops_degrade_on_degenerate_input(spark):
    """r5 ops under empty/null input: empty updates leave the base
    untouched, an empty base makes every update an insert, snapshot
    diff of identical tables is empty, diff against an empty old
    labels everything insert, stratified sampling passes null ids into
    a deterministic bucket instead of crashing, the portable near-dup
    pipelines drop null/empty docs, and zorder values clamp (never
    null) for out-of-range coordinates."""
    from gpssbzd_spark.dataprep.dedup import minhash_lsh_portable, simhash_portable
    from gpssbzd_spark.dataprep.splits import stratified_sample
    from gpssbzd_spark.functions.spatial import zorder_value
    from gpssbzd_spark.operators.cdc import merge_upsert, snapshot_diff

    schema = "k long, v double"
    base = spark.createDataFrame([(1, 1.0), (2, 2.0)], schema)
    empty = spark.createDataFrame([], schema)

    assert sorted(map(tuple, merge_upsert(base, empty, ["k"]).collect())) == [
        (1, 1.0),
        (2, 2.0),
    ]
    assert sorted(map(tuple, merge_upsert(empty, base, ["k"]).collect())) == [
        (1, 1.0),
        (2, 2.0),
    ]
    assert merge_upsert(empty, empty, ["k"]).count() == 0
    assert snapshot_diff(base, base, ["k"]).count() == 0
    ins = snapshot_diff(empty, base, ["k"])
    assert {r.op for r in ins.collect()} == {"insert"} and ins.count() == 2
    assert {r.op for r in snapshot_diff(base, empty, ["k"]).collect()} == {"delete"}

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "one two"), (5, "x")],
        "doc_id long, text string",
    )
    # too short for 3-gram shingles / no tokens: everything drops, no crash
    assert minhash_lsh_portable(docs).count() == 0
    assert simhash_portable(docs).count() == 0

    strat = spark.createDataFrame(
        [(None, "en"), (7, None), (8, "zh")], "doc_id long, lang string"
    )
    out = stratified_sample(
        strat, "doc_id", "lang", {"en": 1.0, "zh": 1.0}, default_fraction=1.0
    )
    # fraction 1.0 everywhere keeps every row, including null id/stratum
    assert out.count() == 3

    z = spark.createDataFrame(
        [(-1000.0, -1000.0), (1000.0, 1000.0)], "lat double, lng double"
    )
    got = [
        r.z
        for r in z.select(
            zorder_value(
                F.col("lat"), F.col("lng"), (22.0, 23.0), (113.0, 114.0)
            ).alias("z")
        ).collect()
    ]
    assert got[0] == 0 and got[1] == (1 << 32) - 1  # clamped to corner cells


def test_funnel_and_retention_degenerate_inputs(spark):
    """Empty events, a single-step funnel, null users/timestamps: each
    degrades to a well-formed (possibly empty) result, never a crash.
    Null-user activity drops at the activity×cohort equi-join (null
    keys never match — the same contract as the DuckDB oracle's
    USING join), so a null user appears in neither output."""
    from gpssbzd_spark.operators.funnel import (
        funnel_counts,
        funnel_times,
        retention_matrix,
    )

    schema = "user_id long, ts timestamp, event_type string"
    empty = spark.createDataFrame([], schema)
    assert funnel_times(empty, ["view", "click"]).count() == 0
    counts = {r.step: r.n_users for r in funnel_counts(empty, ["view"]).collect()}
    assert counts == {1: 0}  # summary row exists even with no users
    assert retention_matrix(empty).count() == 0

    from datetime import datetime

    rows = [
        (1, datetime(2024, 1, 1), "view"),
        (1, None, "click"),            # null ts: excluded from mins
        (None, datetime(2024, 1, 2), "view"),  # null user still grouped
    ]
    ev = spark.createDataFrame(rows, schema)
    single = {r.user_id: r.steps_completed for r in funnel_times(ev, ["view"]).collect()}
    assert single[1] == 1 and None in single  # window partition keeps null user
    ret = retention_matrix(ev, period="day")
    assert ret.filter(F.col("cohort").isNull()).count() == 0  # join drops it
    assert ret.agg(F.sum("n_active")).first()[0] == 1  # only user 1 remains


def test_hll_overlap_disjoint_keys_inner_join(spark):
    """hll_overlap only reports keys present on BOTH sides (inner join
    on the key): a segment with no counterpart yields no row, not a
    null-sketch crash."""
    from gpssbzd_spark.operators.sketches import hll_overlap, hll_partial

    left = spark.createDataFrame([("only_left", 1)], "k string, v long")
    right = spark.createDataFrame([("only_right", 2)], "k string, v long")
    out = hll_overlap(
        hll_partial(left, ["k"], "v"), hll_partial(right, ["k"], "v"), ["k"]
    )
    assert out.count() == 0


def test_incremental_read_empty_landing_dir(spark, tmp_path):
    """A landing dir that does not exist yet (or matches nothing) is an
    empty batch, not an error — the state before the first file lands."""
    import pyspark.sql.types as T

    from gpssbzd_spark.sources.incremental import incremental_read

    schema = T.StructType([T.StructField("id", T.LongType())])
    df, new, commit = incremental_read(
        spark,
        str(tmp_path / "never_created"),
        str(tmp_path / "manifest"),
        schema=schema,
    )
    assert df.count() == 0 and new == [] and commit() is None

    # and with no schema: caller gets None, not an unreadable frame
    df2, new2, commit2 = incremental_read(
        spark, str(tmp_path / "never_created"), str(tmp_path / "manifest")
    )
    assert df2 is None and new2 == [] and commit2() is None


def test_seeded_shuffle_null_id_deterministic(spark):
    """A null id hashes as the empty string (same contract as
    hash_split): deterministic shard + key, not a null-propagated row."""
    from gpssbzd_spark.dataprep.splits import seeded_shuffle

    df = spark.createDataFrame([(None,), (1,)], "doc_id long")
    out = {r.doc_id: (r.shard, r.shuffle_key) for r in
           seeded_shuffle(df, "doc_id", 4).collect()}
    assert out[None][0] is not None and out[None][1] is not None
