"""Training-data pipeline corpus: dedup, similarity, text analysis
(SURVEY.md §2.11 extension surface) over documents/embeddings.

First slice — exact dedup + text stats + brute-force cosine. The
MinHash/SimHash/LSH family lives in gpssbzd_spark.dataprep and registers
additional queries here as it lands.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gpssbzd_spark.corpus import query
from gpssbzd_spark.sources.tables import load_table


@query(
    "dd_exact_dup_groups",
    oracle="""
    SELECT md5(text) AS text_hash,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           MIN(doc_id) AS canonical_doc_id
    FROM documents
    GROUP BY md5(text)
    HAVING COUNT(*) > 1
    """,
    note="exact dedup: hash-groupBy duplicate groups with deterministic "
    "canonical survivor (min doc_id); at 100 TB the md5 shuffle key keeps "
    "the groupBy balanced",
)
def dd_exact_dup_groups(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text").cast("binary")).alias("text_hash"))
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("canonical_doc_id"))
        .filter(F.col("n_copies") > 1)
    )


@query(
    "dd_exact_dedup_survivors",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts
    FROM documents
    """,
    note="exact dedup cardinality: rows vs distinct text hashes",
)
def dd_exact_dedup_survivors(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(F.md5(F.col("text").cast("binary"))).alias("n_unique_texts"),
    )


@query(
    "tx_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_computed,
           CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')))
                AS BIGINT) AS n_unique_tokens
    FROM documents
    """,
    note="text analysis: whitespace token counting + type counts — native "
    "split/array fns, no Python boundary",
)
def tx_token_stats(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    toks_lower = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_computed"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks_lower)).cast("long").alias("n_unique_tokens"),
    )


@query(
    "tx_quality_score",
    oracle="""
    SELECT doc_id,
           ROUND(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                 / NULLIF(length(text), 0), 4) AS alpha_ratio,
           ROUND(CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE)
                 / NULLIF(length(text), 0), 4) AS punct_ratio,
           (length(text) BETWEEN 100 AND 20000) AS len_ok
    FROM documents
    """,
    note="text quality scoring: alpha/punct ratios + length gate "
    "(regexp_replace is JVM-side, codegen'd)",
)
def tx_quality_score(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    n = F.length("text")
    alpha = F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
    punct = F.length(F.regexp_replace("text", "[^.!?,;:]", ""))
    return d.select(
        "doc_id",
        F.round(alpha.cast("double") / F.nullif(n, F.lit(0)), 4).alias("alpha_ratio"),
        F.round(punct.cast("double") / F.nullif(n, F.lit(0)), 4).alias("punct_ratio"),
        n.between(100, 20000).alias("len_ok"),
    )


@query(
    "sim_cosine_to_centroid",
    oracle="""
    WITH q AS (
      SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM embeddings WHERE vec_id = 0
    )
    SELECT e.vec_id,
           ROUND(list_cosine_similarity(
             list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qv), 4) AS cos_sim
    FROM embeddings e, q
    WHERE e.vec_id <> 0
    """,
    note="similarity search: cosine of every vector vs a query vector — "
    "native zip_with/aggregate dot product, broadcast query side",
)
def sim_cosine_to_centroid(spark, sf_dir):
    em = load_table(spark, sf_dir, "embeddings")
    q = em.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    joined = em.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q))
    dot = F.aggregate(
        F.zip_with("embedding", "qv", lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(F.col(c), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return joined.select(
        "vec_id",
        F.round(dot / (norm("embedding") * norm("qv")), 4).alias("cos_sim"),
    )
