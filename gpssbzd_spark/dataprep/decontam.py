"""Benchmark decontamination: n-gram overlap between a training corpus
and a held-out evaluation set (SURVEY.md §2.11 extension surface; not
present in the reference — this is the standard pre-training hygiene
step every LLM data pipeline runs so eval benchmarks are not leaked
into the training set; cf. the n-gram overlap procedures described in
the GPT-3 and PaLM papers).

Scale design (the asymmetry IS the design): the training side is the
100 TB corpus, the eval side is a benchmark suite — MBs, millions of
n-grams at most. So the eval n-gram set is **broadcast** and the train
side never shuffles for the match: scan → per-row n-gram explode →
broadcast hash join → partial-aggregated (train_id, eval_id) counts.
The only shuffle is the final groupBy over *matching* pairs, whose
cardinality is bounded by actual contamination (tiny), not corpus
size. Removing contaminated docs is then a broadcast left-anti join —
again no shuffle of the big side.

N-grams are compared via a fixed-width md5-hex prefix rather than the
raw gram string: 16 hex chars = 64 bits makes accidental collisions
negligible (~1e-19 per pair at 1e9 distinct grams), ships 16 bytes
instead of arbitrary-length text through the join, and is bit-identical
in every engine so the DuckDB oracle replays the exact pipeline
(:func:`contamination_pairs_sql`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gpssbzd_spark.dataprep.dedup import _portable_shingles


def _gram_keys(text_col: Column, n: int) -> Column:
    """Distinct word n-grams of ``text_col`` as 64-bit md5-hex keys."""
    return F.transform(
        _portable_shingles(text_col, n),
        lambda g: F.substring(F.md5(F.concat(F.lit("dc|"), g).cast("binary")), 1, 16),
    )


def contamination_pairs(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
    eval_id_col: str | None = None,
    n: int = 5,
) -> DataFrame:
    """(train_id, eval_id, n_common, eval_coverage) for every train/eval
    doc pair sharing at least one word ``n``-gram.

    ``eval_coverage`` = n_common / |eval doc's distinct n-grams| — the
    fraction of the benchmark item reproduced by the training doc, the
    usual decision signal (a stray idiom shared with a long eval doc is
    noise; 0.8 coverage is a leak).

    The eval side is exploded, deduped per doc, counted, and BROADCAST;
    the train side streams: no shuffle touches the big table. Join keys
    are 64-bit md5 prefixes (see module docstring).
    """
    eval_text = eval_text_col or text_col
    eval_id = eval_id_col or id_col

    # r15 (guide §4.4, native-expr flavor; plan-audited): the old
    # ``.filter(size(_grams) > 0)`` was pushed below the projection, so
    # the whole 4×zip_with gram-transform chain was evaluated TWICE per
    # eval row (once in the pushed filter, again in the projection).
    # The filter was semantically redundant — ``explode`` (not
    # explode_outer) of an empty/null gram array emits no rows, which
    # is exactly what the filter removed — so it is dropped, not moved.
    ev = eval_df.select(
        F.col(eval_id).alias("eval_id"),
        _gram_keys(F.col(eval_text), n).alias("_grams"),
    )
    ev_grams = ev.select(
        "eval_id",
        F.size("_grams").alias("eval_grams"),
        F.explode("_grams").alias("gram"),
    )

    # r15 (guide §2, profiled): the corpus-side tokenize+explode chain
    # inherited the scan's 1-split fixture layout and ran the whole
    # n-gram explode + broadcast-join probe on 1 of 32 cores (the same
    # narrow-chain class batch r14-1 fixed in the dedup family).
    # Partition-count floor; planning-time no-op on wide inputs.
    from gpssbzd_spark.sources.tables import widen_small_input

    tr_grams = widen_small_input(train, key=id_col).select(
        F.col(id_col).alias("train_id"),
        F.explode(_gram_keys(F.col(text_col), n)).alias("gram"),
    )

    hits = tr_grams.join(F.broadcast(ev_grams), "gram")
    return (
        hits.groupBy("train_id", "eval_id", "eval_grams")
        .agg(F.count("*").alias("n_common"))
        .select(
            "train_id",
            "eval_id",
            F.col("n_common").cast("long").alias("n_common"),
            F.round(
                F.col("n_common").cast("double") / F.col("eval_grams"), 4
            ).alias("eval_coverage"),
        )
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_coverage: float = 0.5,
    **kwargs,
) -> DataFrame:
    """Training docs with contaminated rows removed: any train doc whose
    n-gram overlap covers ≥ ``min_coverage`` of SOME eval doc is
    dropped. Broadcast left-anti join — the corpus never shuffles."""
    bad = (
        contamination_pairs(
            train, eval_df, text_col=text_col, id_col=id_col, n=n, **kwargs
        )
        .filter(F.col("eval_coverage") >= min_coverage)
        .select(F.col("train_id").alias(id_col))
        .distinct()
    )
    return train.join(F.broadcast(bad), id_col, "left_anti")


def decontaminate_semantic(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.4,
    n_planes: int = 6,
    n_tables: int = 8,
    scale: int = 1000,
) -> DataFrame:
    """EMBEDDING-SPACE decontamination: drop every train vector whose
    (quantized) cosine against ANY eval vector clears ``threshold`` —
    the semantic sibling of :func:`decontaminate`, catching paraphrased
    or lightly-rewritten benchmark leakage that n-gram overlap misses
    (the eval answer reworded shares few exact 5-grams but stays
    nearest-neighbor-close in embedding space).

    Requires disjoint ``id_col`` values across the two sides (true for
    any split of one corpus). Implementation reuses the fully-oracled
    portable pair pipeline (:func:`~gpssbzd_spark.dataprep.dedup.
    embedding_lsh_portable`) over the tagged union, keeps the pairs
    that CROSS sides, and anti-joins the train side — so the DuckDB
    oracle replays the entire path by composition and precision is
    exact w.r.t. the quantized cosine. Scale shape: eval is a
    benchmark suite (tiny) — its id set broadcasts into the semi
    joins and the final anti join; the train side shuffles once on
    the (table, bucket) banding keys, never all-pairs.
    """
    from gpssbzd_spark.dataprep.dedup import embedding_lsh_portable

    union = train.select(id_col, vec_col).unionByName(
        eval_df.select(id_col, vec_col)
    )
    pairs = embedding_lsh_portable(
        union,
        id_col=id_col,
        vec_col=vec_col,
        dim=dim,
        threshold=threshold,
        n_planes=n_planes,
        n_tables=n_tables,
        scale=scale,
        # consumed twice (the a-side and b-side semi joins) and bounded
        # by actual near-duplication; without pinning the WHOLE pair
        # pipeline — quantize, plane dots, banding, verify — replays
        # per consumer (the repo's pin-iteratively-reused-inputs rule,
        # GC-scoped via localCheckpoint)
    ).localCheckpoint()
    e_ids = eval_df.select(F.col(id_col).alias("_eval_id"))
    cont_a = pairs.join(
        F.broadcast(e_ids), pairs["id_b"] == F.col("_eval_id"), "left_semi"
    ).select(F.col("id_a").alias(id_col))
    cont_b = pairs.join(
        F.broadcast(e_ids), pairs["id_a"] == F.col("_eval_id"), "left_semi"
    ).select(F.col("id_b").alias(id_col))
    contaminated = cont_a.unionByName(cont_b).distinct()
    return train.join(F.broadcast(contaminated), id_col, "left_anti")


def _grams_sql(text_col: str, n: int) -> str:
    """DuckDB expression: distinct word n-gram md5-prefix keys of
    ``text_col`` — the twin of :func:`_gram_keys` (same tokenizer as
    dedup._portable_shingles, same 'dc|' salt)."""
    toks = (
        f"list_filter(regexp_split_to_array(lower(trim({text_col})), '\\s+'),"
        f" x -> x <> '')"
    )
    gram = " || ' ' || ".join(f"t[i + {j}]" for j in range(n))
    return (
        f"(SELECT list_transform(list_distinct(list_transform("
        f"generate_series(1, len(t) - {n - 1}), i -> {gram})),"
        f" g -> substr(md5('dc|' || g), 1, 16))"
        f" FROM (SELECT {toks} AS t) WHERE len(t) >= {n})"
    )


def contamination_pairs_sql(
    train_pred: str,
    eval_pred: str,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> str:
    """DuckDB twin of :func:`contamination_pairs` over one table split
    into train/eval by the given WHERE predicates."""
    grams = _grams_sql(text_col, n)
    return f"""
    WITH ev AS (
      SELECT {id_col} AS eval_id, {grams} AS grams
      FROM {table} WHERE {text_col} IS NOT NULL AND ({eval_pred})
    ), evg AS (
      SELECT eval_id, len(grams) AS eval_grams, unnest(grams) AS gram
      FROM ev WHERE len(grams) > 0
    ), trg AS (
      SELECT {id_col} AS train_id, unnest({grams}) AS gram
      FROM {table} WHERE {text_col} IS NOT NULL AND ({train_pred})
    )
    SELECT train_id, eval_id,
           CAST(COUNT(*) AS BIGINT) AS n_common,
           ROUND(CAST(COUNT(*) AS DOUBLE) / eval_grams, 4) AS eval_coverage
    FROM trg JOIN evg USING (gram)
    GROUP BY train_id, eval_id, eval_grams
    """
