"""Text analysis operators.

- :func:`tokens` — whitespace tokenization (lowercased, distinct opt).
- :func:`language_id` — stopword-overlap heuristic over a small
  per-language function-word list, plus a CJK-codepoint fast path.
  Scores are overlap counts against each list; argmax wins. This is the
  classic cheap lang-id for pipeline routing (not a trained model) and
  is fully expressible in SQL for the oracle.
- :func:`quality_features` — length/alpha/punct/stopword/type-token
  ratios for quality gating.
- :func:`doc_fingerprint` — winnowing-style fingerprint: k-gram
  rolling hashes → sliding-window minima → set hash. Robust to small
  local edits.

``language_id`` / ``quality_features`` are native column expressions
(regex + scalar fns — codegen'd, and SQL-expressible for the oracle).
The fingerprint is a vectorized Arrow kernel: its per-character array
work hits Spark's interpreted higher-order-function path when written
natively (~6 ms/doc vs ~µs/doc measured on the fixture corpus), so
the native formulation is kept only as :func:`doc_fingerprint_native`
for portability and differential testing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gpssbzd_spark.dataprep.dedup import char_shingles
from gpssbzd_spark.sources.tables import local_rows

# Small function-word lists — enough signal to separate the fixture
# languages; deliberately tiny so the SQL oracle can inline them.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "ein"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "pour", "dans"],
    "es": ["el", "la", "los", "y", "de", "un", "una", "es", "para", "en"],
}


def tokens(text_col: Column, distinct: bool = False) -> Column:
    t = F.split(F.lower(F.trim(text_col)), r"\s+")
    return F.array_distinct(t) if distinct else t


# GPT-2-style pretokenizer, simplified to be dialect-portable: letter
# runs, digit runs, and symbol runs, each optionally absorbing one
# leading space (the BPE convention that a token owns its preceding
# space). Deliberately NO lookahead (RE2/DuckDB lacks it) and ASCII
# classes only (a non-BMP char would count differently under Java's
# UTF-16 code units vs RE2's codepoints; the fixture corpus is ASCII).
# Alternation is leftmost-first in both engines, so counts agree.
BPE_PRETOKEN_RE = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+"


def bpe_token_count(text_col: Column) -> Column:
    """Subword-tokenizer-shaped token count: number of BPE pretokenizer
    matches (the unit a GPT-2-family BPE then splits further — the
    standard "how many tokens is this corpus" estimate a training-data
    pipeline budgets with, vs :func:`tokens`' whitespace words).
    Whitespace runs between pretokens are not themselves counted. NULL
    text → NULL."""
    return F.size(F.regexp_extract_all(text_col, F.lit(BPE_PRETOKEN_RE), 0))


def language_id(text_col: Column) -> Column:
    """Best-guess language code: 'zh' if CJK chars dominate, else the
    stopword list with the largest distinct-token overlap ('und' if no
    list matches at all). NULL text propagates as NULL — 'und' means a
    real document whose language could not be determined, not a missing
    one."""
    toks = tokens(text_col, distinct=True)
    cjk = F.length(F.regexp_replace(text_col, r"[^一-鿿]", ""))
    # argmax via array_max over (score, priority, lang) structs — struct
    # ordering is lexicographic, so ties go to the higher-priority (i.e.
    # earlier-listed) language, matching the when-cascade the oracle SQL
    # spells out. One struct per language ⇒ each intersect evaluates
    # once; the cascade form re-evaluated every score inside the nested
    # CASE branches (~6× per row).
    entries = [
        F.struct(
            F.size(
                F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
            ).alias("score"),
            F.lit(len(STOPWORDS) - i).alias("pri"),
            F.lit(lang).alias("lang"),
        )
        for i, (lang, words) in enumerate(STOPWORDS.items())
    ]
    best = F.array_max(F.array(*entries))
    return (
        F.when(text_col.isNull(), F.lit(None).cast("string"))
        .when(cjk * 2 > F.length(text_col), "zh")
        .otherwise(F.when(best["score"] > 0, best["lang"]).otherwise("und"))
    )


def quality_features(text_col: Column) -> dict[str, Column]:
    """Quality-gate feature set; combine/threshold at the call site.

    Empty/whitespace-only text counts ZERO tokens (ratios go NULL via
    the nullif guards): ``split('')`` yields ``['']``, which would score
    degenerate docs n_tokens=1 and a perfect type_token_ratio — the
    best possible quality — instead of the worst."""
    n = F.length(text_col)
    toks = tokens(text_col)
    n_toks = F.when(F.length(F.trim(text_col)) == 0, F.lit(0)).otherwise(
        F.size(toks)
    )
    alpha = F.length(F.regexp_replace(text_col, "[^a-zA-Z]", ""))
    punct = F.length(F.regexp_replace(text_col, r"[^.!?,;:]", ""))
    all_stop = F.array(
        *[F.lit(w) for words in STOPWORDS.values() for w in words]
    )
    stop_hits = F.size(
        F.filter(toks, lambda t: F.array_contains(all_stop, t))
    )
    return {
        "n_chars": n.cast("long"),
        "n_tokens": n_toks.cast("long"),
        "alpha_ratio": alpha.cast("double") / F.nullif(n, F.lit(0)),
        "punct_ratio": punct.cast("double") / F.nullif(n, F.lit(0)),
        "stopword_ratio": stop_hits.cast("double") / F.nullif(n_toks, F.lit(0)),
        "type_token_ratio": F.size(F.array_distinct(toks)).cast("double")
        / F.nullif(n_toks, F.lit(0)),
        "mean_token_len": (n - n_toks + 1).cast("double") / F.nullif(n_toks, F.lit(0)),
    }


def doc_fingerprint_native(
    text_col: Column, k: int = 7, window: int = 4
) -> Column:
    """All-native winnowing fingerprint — portable (zero Python
    workers) differential twin of :func:`doc_fingerprint`; different
    hash family, same invariances.

    Sliding minima are computed as the element-wise least of ``window``
    shifted copies of the hash array — O(window) array passes. The
    obvious ``transform(indices, i -> array_min(slice(hashes, i, w)))``
    formulation re-evaluates the whole ``hashes`` subtree per index
    (lambda bodies embed their argument expressions and HOFs block
    subexpression elimination), which is quadratic in document length —
    at 300-char docs that was ~1000× slower, not a constant factor.
    Even so, every pass is an interpreted higher-order function
    (~µs/element), which is why the hot path is the Arrow kernel.
    """
    hashes = F.transform(char_shingles(text_col, k), lambda s: F.xxhash64(s))
    n = F.size(hashes)
    length = n - window + 1  # windows only where a full one fits
    shifted = [F.slice(hashes, 1 + off, length) for off in range(window)]
    minima_full = shifted[0]
    for s in shifted[1:]:
        minima_full = F.zip_with(minima_full, s, lambda x, y: F.least(x, y))
    minima = (
        F.when(n >= window, minima_full)
        # short text: single window over whatever is there
        .when(n > 0, F.array(F.array_min(hashes)))
        .otherwise(F.array().cast("array<bigint>"))
    )
    fp_main = F.xxhash64(
        F.concat_ws(",", F.transform(F.array_sort(F.array_distinct(minima)),
                                     lambda x: x.cast("string")))
    )
    # contract shared with the Arrow twin: NULL/empty text → NULL (no
    # shared sentinel that would glue all degenerate docs into one
    # near-dup cluster); sub-k text → one whole-text gram, distinct per
    # content (the zero-shingle path previously collapsed every short
    # doc to the hash of an empty array)
    return (
        F.when(text_col.isNull() | (F.length(text_col) == 0), F.lit(None).cast("long"))
        .when(F.length(text_col) < k, F.xxhash64(F.lower(text_col)))
        .otherwise(fp_main)
    )


_FP_BASE = np.uint64(1099511628211)  # FNV-ish odd multiplier, wraps mod 2^64


def doc_fingerprint(text_col: Column, k: int = 7, window: int = 4) -> Column:
    """Winnowing fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03
    shape): polynomial rolling hash of byte k-grams, min of each
    sliding window of ``window`` hashes, then an order-fixed fold of
    the sorted distinct minima. Equal for texts differing only outside
    every window minimum — a cheap near-identity key for clustering
    near-copies.

    One Arrow-batched pandas UDF; everything inside is numpy uint64
    (wrapping) vector ops — k adds per k-gram and ``window`` minimum
    passes, ~µs/doc. The same computation as interpreted Spark
    higher-order functions measured ~6 ms/doc (see
    :func:`doc_fingerprint_native`), which is a CPU-century at
    100 TB scale.
    """
    @F.pandas_udf(T.LongType())
    def fp(texts: pd.Series) -> pd.Series:
        # object-dtype output: NULL/empty text fingerprints to NULL
        # (a 0 sentinel is a reachable hash value AND glues every
        # degenerate doc into one shared "duplicate" cluster)
        out: list = [None] * len(texts)
        pow_k = _FP_BASE ** np.arange(k, dtype=np.uint64)[::-1]
        for i, text in enumerate(texts):
            if not text:
                continue
            b = np.frombuffer(text.lower().encode("utf-8"), dtype=np.uint8).astype(
                np.uint64
            )
            n = len(b) - k + 1
            if n <= 0:
                # short text: hash the whole byte string as one gram
                h = (b * _FP_BASE ** np.arange(len(b), dtype=np.uint64)[::-1]).sum()
                out[i] = int(
                    np.int64(h.astype(np.uint64) * _FP_BASE + np.uint64(len(b)))
                )
                continue
            grams = np.zeros(n, dtype=np.uint64)
            for j in range(k):
                grams += b[j : j + n] * pow_k[j]
            if n >= window:
                m = n - window + 1
                minima = grams[:m].copy()
                for off in range(1, window):
                    np.minimum(minima, grams[off : off + m], out=minima)
            else:
                minima = grams.min(keepdims=True)
            u = np.unique(minima)  # sorted distinct
            acc = (u * _FP_BASE ** np.arange(len(u), dtype=np.uint64)[::-1]).sum()
            out[i] = int(np.int64(acc.astype(np.uint64)))
        return pd.Series(out, dtype="object")

    return fp(text_col)


# PII patterns, dialect-portable by construction: no lookaround (RE2
# lacks it), no unicode classes (Java counts UTF-16 units), just
# character classes + bounded repetition that Java regex (Spark) and
# RE2 (DuckDB) match identically. The phone pattern is deliberately
# aggressive (any +?digit [digits/space/()-]x6+ digit run) — a
# training-data scrubber prefers false redactions over leaked numbers.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\-\s]{6,}[0-9]",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
}


def scrub_pii(
    text_col: Column,
    kinds: tuple[str, ...] = ("email", "phone", "ipv4"),
    token: str = "[PII]",
) -> Column:
    """Redact PII spans with ``token`` — chained global regexp_replace
    in ``kinds`` order (order matters: an email eaten first cannot
    later half-match the phone pattern; mirror the same order in any
    SQL twin). Pure codegen'd string ops: at 100 TB this is a
    stateless per-row projection on the scan, no Python, no shuffle."""
    out = text_col
    for k in kinds:
        out = F.regexp_replace(out, PII_PATTERNS[k], token)
    return out


def pii_counts(text_col: Column) -> dict[str, Column]:
    """Per-kind PII match counts on the ORIGINAL text (counts are
    independent per kind; the scrub chain is not, so count before
    scrubbing)."""
    return {
        k: F.size(F.regexp_extract_all(text_col, F.lit(p), 0))
        for k, p in PII_PATTERNS.items()
    }


def unigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 256,
    round_to: int = 4,
) -> DataFrame:
    """Corpus-trained unigram language-model score per document: the
    mean log10 probability of its tokens under the corpus's own top-V
    unigram distribution (OOV tokens get a half-count floor 0.5/total).
    The cheap stand-in for perplexity-based quality filtering (CCNet /
    Gopher style) when no external LM is available: gibberish and
    boilerplate-free natural text separate on this score.

    Two passes, both scale-shaped: (1) token frequencies via explode →
    partial-agg count (map-side combine absorbs Zipf skew); the top-V
    vocab cut is a TakeOrdered of V rows, deterministic under ties via
    (freq DESC, token ASC); (2) per-doc scoring joins the exploded
    corpus to the BROADCAST V-row vocab — the corpus side never
    shuffles for the join, then one groupBy(doc) mean. Deterministic
    end-to-end; the DuckDB oracle replays it verbatim (corpus
    `tx_unigram_logprob`).

    Returns (id_col, n_tokens, mean_logprob) — docs with zero tokens
    are dropped (no tokens ⇒ no score).
    """
    d = docs.filter(
        F.col(text_col).isNotNull() & (F.length(F.trim(F.col(text_col))) > 0)
    )
    tok = d.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    ).filter(F.col("token") != "")
    # total (1 row) and the top-V vocab (<= vocab_size rows) are freq's
    # ONLY consumers and both are broadcast-bounded: materialize them
    # eagerly off a short-lived persist, then release it before
    # returning — a bare .persist() here leaked cached partitions for
    # the session lifetime (ADVICE r5). r14: the bounded results come
    # back as driver literals (collect + local_rows / lit) instead of
    # localCheckpoints — a checkpoint materializes through the non-AQE
    # RDD path at initialPartitionNum, so the V-row vocab pin ran a
    # 256-task stage for 2 KB (profiled); the collect is the same
    # bounded O(V) driver traffic the broadcast already implied.
    freq = tok.groupBy("token").agg(F.count("*").alias("freq")).persist()
    total_val = freq.agg(F.sum("freq").alias("_total")).collect()[0][0]
    vocab_rows = (
        freq.orderBy(F.col("freq").desc(), F.col("token"))
        .limit(vocab_size)
        .collect()
    )
    freq.unpersist()
    from gpssbzd_spark.sources.tables import local_rows

    vocab = local_rows(
        docs.sparkSession,
        [(r["token"], r["freq"]) for r in vocab_rows],
        "token string, freq bigint",
    )
    scored = (
        tok.join(F.broadcast(vocab), "token", "left")
        .withColumn(
            "_lp",
            F.log10(
                F.coalesce(F.col("freq").cast("double"), F.lit(0.5))
                / F.lit(total_val).cast("bigint")
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg("_lp"), round_to).alias("mean_logprob"),
    )


def unigram_logprob_sql(
    vocab_size: int = 256, round_to: int = 4
) -> str:
    """DuckDB twin of :func:`unigram_logprob` over the `documents`
    view: same tokenizer, same deterministic top-V cut, same OOV
    floor, same log10/avg arithmetic."""
    return f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
      FROM documents
      WHERE text IS NOT NULL AND length(trim(text)) > 0
    ), tok AS (
      SELECT doc_id, token FROM toks WHERE token <> ''
    ), freq AS (
      SELECT token, COUNT(*) AS freq FROM tok GROUP BY token
    ), total AS (
      SELECT SUM(freq) AS total FROM freq
    ), vocab AS (
      SELECT token, freq FROM freq
      ORDER BY freq DESC, token ASC LIMIT {vocab_size}
    )
    SELECT t.doc_id, COUNT(*) AS n_tokens,
           ROUND(AVG(log10(COALESCE(CAST(v.freq AS DOUBLE), 0.5)
                           / (SELECT total FROM total))), {round_to})
             AS mean_logprob
    FROM tok t LEFT JOIN vocab v USING (token)
    GROUP BY t.doc_id
    """


def tfidf_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tf: int = 1,
    min_df: int = 1,
    round_to: int = 4,
) -> DataFrame:
    """Per-(document, term) TF-IDF scores over the corpus's own
    statistics: ``score = tf · log10(N / df)`` with N = docs holding at
    least one token and df = docs containing the term. The classic
    keyword/characteristic-term signal (salient-term extraction,
    simple relevance baselines); ``min_tf``/``min_df`` are integer
    prefilters so a caller bounds the output without a ranking step
    (rank selection composes via the W3 top-k machinery when wanted).

    Scale shape: explode → (doc, token) counts (map-side combine),
    df via a second partial-agg over the term dimension joined back on
    the term key, N broadcast from a one-row aggregate. Deterministic;
    the DuckDB oracle replays it (corpus `tx_tfidf_terms`).
    """
    d = docs.filter(
        F.col(text_col).isNotNull() & (F.length(F.trim(F.col(text_col))) > 0)
    )
    tok = d.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    ).filter(F.col("token") != "")
    tf = (
        tok.groupBy(id_col, "token")
        .agg(F.count("*").alias("tf"))
        # consumed by BOTH the df-per-term rollup and the final join —
        # without pinning, each consumer replays the explode+count.
        # localCheckpoint, not persist: a persist here is registered in
        # the session CacheManager and outlives the query (ADVICE r5
        # leak); a localCheckpoint RDD is released by the ContextCleaner
        # once the returned DataFrame is garbage-collected
        .localCheckpoint()
    )
    df_t = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = d.agg(F.countDistinct(id_col).alias("_n"))
    return (
        tf.filter(F.col("tf") >= min_tf)
        .join(df_t.filter(F.col("df") >= min_df), "token")
        .join(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * F.log10(F.col("_n").cast("double") / F.col("df")),
                round_to,
            ).alias("tfidf"),
        )
    )


def tfidf_terms_sql(
    min_tf: int = 1, min_df: int = 1, round_to: int = 4
) -> str:
    """DuckDB twin of :func:`tfidf_terms` over the `documents` view."""
    return f"""
    WITH d AS (
      SELECT doc_id, text FROM documents
      WHERE text IS NOT NULL AND length(trim(text)) > 0
    ), tok AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS token
      FROM d
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM tok
      WHERE token <> '' GROUP BY doc_id, token
    ), df_t AS (
      SELECT token, COUNT(*) AS df FROM tf GROUP BY token
    ), n AS (
      SELECT COUNT(DISTINCT doc_id) AS _n FROM d
    )
    SELECT tf.doc_id, tf.token, tf.tf, df_t.df,
           ROUND(tf.tf * log10(CAST(n._n AS DOUBLE) / df_t.df), {round_to})
             AS tfidf
    FROM tf JOIN df_t USING (token) CROSS JOIN n
    WHERE tf.tf >= {min_tf} AND df_t.df >= {min_df}
    """


def repetition_features(
    text_col: Column, ns: tuple[int, ...] = (2, 3)
) -> dict[str, Column]:
    """Gopher-style repetition signals: for each n, the fraction of
    word n-grams that are duplicates (1 − distinct/total). Boilerplate,
    keyword-stuffed, and looping documents score high and get filtered
    before training. All native array ops (split → sequence → transform
    → array_distinct): codegen'd, shuffle-free, and expressible 1:1 in
    the SQL oracle. Docs with fewer than n tokens yield NULL (no
    n-grams — NULL keeps them distinguishable from genuinely
    repetition-free docs at 0.0)."""
    toks = tokens(text_col)
    n_toks = F.when(F.length(F.trim(text_col)) == 0, F.lit(0)).otherwise(
        F.size(toks)
    )
    out: dict[str, Column] = {}
    for n in ns:
        count = F.greatest(n_toks - (n - 1), F.lit(0))
        # n-grams as the element-wise concat of n SHIFTED SLICES of the
        # token array, not transform(sequence, i -> concat(get(toks,
        # i+off))): lambda bodies embed their argument expressions and
        # HOFs block subexpression elimination, so the get() form
        # re-tokenizes the document per gram per offset — O(tokens²·n)
        # (same fix as dedup._portable_shingles / the
        # doc_fingerprint_native sliding minima)
        shifted = [F.slice(toks, 1 + off, count) for off in range(n)]
        grams = shifted[0]
        for s in shifted[1:]:
            grams = F.zip_with(grams, s, lambda a, b: F.concat(a, F.lit(" "), b))
        grams = F.when(count > 0, grams)
        out[f"dup_{n}gram_frac"] = (
            F.lit(1.0)
            - F.size(F.array_distinct(grams)).cast("double")
            / F.nullif(count, F.lit(0)).cast("double")
        )
    return out


def bigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 256,
    alpha: float = 0.5,
    round_to: int = 4,
) -> DataFrame:
    """Corpus-trained BIGRAM language-model score per document: the
    mean log10 of the add-α-smoothed conditional P(w₂|w₁) over the
    doc's adjacent token pairs, with tokens outside the corpus's top-V
    vocab mapped to ``<unk>`` — the next step up from
    :func:`unigram_logprob` on the CCNet/Gopher quality-filter ladder:
    a unigram model cannot tell shuffled text from prose; word-ORDER
    likelihood can.

    P(w₂|w₁) = (c(w₁,w₂) + α) / (c(w₁·) + α·(V+1)), where c(w₁·) is
    w₁'s count as a pair left-context (so the distribution sums to 1
    over the V+1 mapped successor types by construction).

    Scale shape: one explode for positions, one lead() window per doc
    (the same (doc) exchange the scorer reuses), bigram/context counts
    partial-aggregate and are BOUNDED by (V+1)² / (V+1) rows — both
    broadcast; the corpus side never shuffles for the scoring joins.
    Deterministic (integer counts, fixed vocab cut) — the DuckDB
    oracle replays it exactly (corpus ``tx_bigram_logprob``).

    Returns (id_col, n_bigrams, mean_logprob); docs with fewer than
    two tokens drop out (no pairs ⇒ no score).
    """
    d = docs.filter(
        F.col(text_col).isNotNull() & (F.length(F.trim(F.col(text_col))) > 0)
    )
    tk = d.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "token"),
    ).filter(F.col("token") != "")
    freq = tk.groupBy("token").agg(F.count("*").alias("freq")).persist()
    # r14: the bounded V-row vocab comes back as a driver literal
    # (collect + local_rows) instead of a localCheckpoint — the
    # checkpoint materializes through the non-AQE RDD path at
    # initialPartitionNum (a 256-task stage for 2 KB, profiled); the
    # collect is the same bounded O(V) traffic the broadcast implied
    vocab_rows = (
        freq.orderBy(F.col("freq").desc(), F.col("token"))
        .limit(vocab_size)
        .select("token")
        .collect()
    )
    freq.unpersist()
    from gpssbzd_spark.sources.tables import local_rows

    vocab = local_rows(
        docs.sparkSession, [(r["token"],) for r in vocab_rows], "token string"
    )
    mapped = (
        tk.join(
            F.broadcast(vocab.withColumn("_in", F.lit(1))), "token", "left"
        )
        .select(
            id_col,
            "pos",
            F.when(F.col("_in").isNotNull(), F.col("token"))
            .otherwise(F.lit("<unk>"))
            .alias("u"),
        )
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    prs = (
        mapped.withColumn("u2", F.lead("u").over(w))
        .filter(F.col("u2").isNotNull())
        .select(id_col, F.col("u").alias("u1"), "u2")
    )
    c12 = prs.groupBy("u1", "u2").agg(F.count("*").alias("c12"))
    c1 = prs.groupBy("u1").agg(F.count("*").alias("c1"))
    denom_types = vocab_size + 1
    lp = F.log10(
        (F.col("c12") + F.lit(alpha))
        / (F.col("c1") + F.lit(alpha * denom_types))
    )
    return (
        prs.join(F.broadcast(c12), ["u1", "u2"])
        .join(F.broadcast(c1), "u1")
        .select(id_col, lp.alias("_lp"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg("_lp"), round_to).alias("mean_logprob"),
        )
    )


def bigram_logprob_sql(
    vocab_size: int = 256, alpha: float = 0.5, round_to: int = 4
) -> str:
    """DuckDB twin of :func:`bigram_logprob` over the `documents` view
    (parallel unnests zip token with its ordinal; same vocab cut, same
    <unk> map, same smoothing arithmetic)."""
    return f"""
    WITH arrs AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
      FROM documents
      WHERE text IS NOT NULL AND length(trim(text)) > 0
    ), toks AS (
      SELECT doc_id,
             unnest(arr) AS token,
             unnest(generate_series(1, len(arr))) AS pos
      FROM arrs
    ), tok AS (
      SELECT doc_id, token, pos FROM toks WHERE token <> ''
    ), freq AS (
      SELECT token, COUNT(*) AS freq FROM tok GROUP BY token
    ), vocab AS (
      SELECT token FROM freq ORDER BY freq DESC, token ASC
      LIMIT {vocab_size}
    ), mapped AS (
      SELECT t.doc_id, t.pos,
             CASE WHEN v.token IS NOT NULL THEN t.token
                  ELSE '<unk>' END AS u
      FROM tok t LEFT JOIN vocab v USING (token)
    ), prs AS (
      SELECT doc_id, u AS u1, u2 FROM (
        SELECT doc_id, u,
               lead(u) OVER (PARTITION BY doc_id ORDER BY pos) AS u2
        FROM mapped
      ) WHERE u2 IS NOT NULL
    ), c12 AS (
      SELECT u1, u2, COUNT(*) AS c12 FROM prs GROUP BY u1, u2
    ), c1 AS (
      SELECT u1, COUNT(*) AS c1 FROM prs GROUP BY u1
    )
    SELECT p.doc_id, COUNT(*) AS n_bigrams,
           ROUND(AVG(log10((b.c12 + {alpha})
                           / (s.c1 + {alpha * (vocab_size + 1)}))),
                 {round_to}) AS mean_logprob
    FROM prs p JOIN c12 b USING (u1, u2) JOIN c1 s USING (u1)
    GROUP BY p.doc_id
    """


# ---------------------------------------------------------------------------
# BM25 retrieval (Robertson–Zaragoza, the Okapi BM25 scorer)
# ---------------------------------------------------------------------------


def _query_terms(queries: "Sequence[tuple[int, str]]") -> list[tuple[int, str]]:
    """(query_id, text) → sorted distinct (query_id, token) rows under
    the SAME rule as :func:`tokens` (lower → trim → split ``\\s+``),
    applied driver-side so the Spark plan and the DuckDB twin inline
    bit-identical literal term sets — tokenization parity by
    construction, not by re-implementation. Queries are a handful of
    strings; tokenizing them on the driver costs nothing and removes
    the one place the two engines could disagree."""
    import re

    out: set[tuple[int, str]] = set()
    for qid, text in queries:
        for t in re.split(r"\s+", (text or "").strip().lower()):
            if t:
                out.add((int(qid), t))
    return sorted(out)


def _sql_double(x: float) -> str:
    """A DuckDB DOUBLE literal for ``x``. ``repr(x)`` round-trips the
    exact float; CAST types it DOUBLE whether repr came out fixed-point
    or scientific (the previous ``repr(x) + 'e0'`` form produced
    invalid SQL like ``1e-05e0`` for values whose repr is already
    e-notation — ADVICE r11)."""
    return f"CAST({x!r} AS DOUBLE)"


def bm25_topk(
    docs: DataFrame,
    queries: "Sequence[tuple[int, str]]",
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
    max_df_frac: float | None = None,
) -> DataFrame:
    """Okapi BM25 top-k document retrieval for a small query batch —
    the standard sparse-retrieval scorer an LLM-data pipeline uses for
    eval-set decontamination sweeps, targeted corpus lookup, and RAG
    baselines (the lexical complement of the embedding top-k family in
    ``dataprep/similarity.py``).

    ``score(q, d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))``
    over the query's distinct terms, with the non-negative idf form
    ``ln(1 + (N−df+0.5)/(df+0.5))``. Output: one row per retrieved
    (query_id, doc_id) with ``score`` (rounded to ``round_to``) and
    ``rank`` (1..k, ordered by rounded score desc then doc id — the
    rounded sort key plus id tie-break keeps the ranking deterministic
    and engine-portable, the same convention as the cosine top-k tails).

    Scale shape (the posting-list discipline):

    - one explode → partial-agg groupBy builds the (doc, term, tf)
      posting rows — the only corpus-wide shuffle;
    - the query term set is BROADCAST and restricts postings to
      candidate rows BEFORE any statistics join, so ``df`` is computed
      for query terms only (never a full-vocabulary rollup) and the
      candidate mass is bounded by the query terms' posting lists;
    - N and avgdl come from one broadcast one-row aggregate; df joins
      back broadcast (≤ #query terms rows);
    - per-query ranking is a window over candidates only. A query made
      of stop-words would drag its full posting lists — ``max_df_frac``
      caps that INSIDE the operator: terms with df/N above the fraction
      are dropped from ``df_t``, and because the scoring join to
      ``df_t`` is inner, the dropped terms' posting rows are eliminated
      at the broadcast hash join BEFORE the per-(query, doc) aggregation
      shuffle (idf ≈ 0 for such terms, so at any plausible cap the
      ranking loses nothing — exactly the pre-drop production BM25
      does, but enforced as a parameter instead of advisory prose).
      Counting df itself is one narrow partial-agg over the candidate
      postings; the cap saves the wide part (score join + groupBy +
      window). A query whose every term exceeds the cap returns empty.

    Docs with no query term score nothing and never appear (standard
    BM25 behavior). Fully SQL-expressible: :func:`bm25_topk_sql` is the
    DuckDB twin (corpus row ``tx_bm25_topk``).
    """
    spark = docs.sparkSession
    qterms = _query_terms(queries)
    if not qterms:
        raise ValueError("bm25_topk: queries tokenized to no terms")
    q = local_rows(
        spark,
        qterms,
        T.StructType(
            [
                T.StructField("query_id", T.LongType()),
                T.StructField("token", T.StringType()),
            ]
        ),
    )
    d = docs.filter(
        F.col(text_col).isNotNull() & (F.length(F.trim(F.col(text_col))) > 0)
    )
    arr = F.filter(tokens(F.col(text_col)), lambda t: t != "")
    base = d.select(F.col(id_col), arr.alias("_toks"))
    stats = base.agg(
        F.count("*").alias("_n"), F.avg(F.size("_toks")).alias("_avgdl")
    )
    tok = base.select(
        id_col, F.size("_toks").alias("dl"), F.explode("_toks").alias("token")
    )
    tf = tok.groupBy(id_col, "dl", "token").agg(F.count("*").alias("tf"))
    qtok = q.select("token").distinct()
    # candidates: postings restricted to query terms — consumed by BOTH
    # the df rollup and the scoring join, so pin (GC-scoped, not a
    # session persist — the repo's reused-input rule)
    cand = tf.join(F.broadcast(qtok), "token").localCheckpoint()
    # tf rows are unique per (doc, term) ⇒ count(*) = document frequency
    df_t = cand.groupBy("token").agg(F.count("*").alias("df"))
    if max_df_frac is not None:
        # cross join to the one-row stats (broadcast, ≤ #query-term
        # rows on the left) — terms above the cap vanish here, and the
        # inner scoring join below then prunes their posting rows too
        df_t = (
            df_t.crossJoin(F.broadcast(stats.select("_n")))
            .filter(F.col("df") <= F.lit(max_df_frac) * F.col("_n"))
            .drop("_n")
        )
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    contrib = idf * (
        (F.col("tf") * F.lit(k1 + 1.0))
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("_avgdl"))
        )
    )
    scored = (
        cand.join(F.broadcast(q), "token")
        .join(F.broadcast(df_t), "token")
        .join(F.broadcast(stats))
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum(contrib), round_to).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def bm25_topk_sql(
    queries: "Sequence[tuple[int, str]]",
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
    max_df_frac: float | None = None,
) -> str:
    """DuckDB twin of :func:`bm25_topk` over the ``documents`` view.
    The query terms are inlined as a VALUES list produced by the SAME
    driver-side tokenization (:func:`_query_terms`); parameter floats
    are emitted via :func:`_sql_double` so DuckDB types them DOUBLE (a
    bare ``1.2`` is DECIMAL there and would score under decimal
    rounding, and a plain ``repr`` breaks for e-notation reprs)."""
    qterms = _query_terms(queries)
    if not qterms:
        raise ValueError("bm25_topk_sql: queries tokenized to no terms")
    values = ", ".join(
        "({}, '{}')".format(qid, t.replace("'", "''")) for qid, t in qterms
    )
    df_cap = (
        ""
        if max_df_frac is None
        else (
            f" HAVING COUNT(*) <= {_sql_double(max_df_frac)}"
            " * (SELECT _n FROM stats)"
        )
    )
    return f"""
    WITH d AS (
      SELECT doc_id, text FROM documents
      WHERE text IS NOT NULL AND length(trim(text)) > 0
    ), base AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         t -> t <> '') AS _toks
      FROM d
    ), stats AS (
      SELECT COUNT(*) AS _n, AVG(len(_toks)) AS _avgdl FROM base
    ), tok AS (
      SELECT doc_id, len(_toks) AS dl, unnest(_toks) AS token FROM base
    ), tf AS (
      SELECT doc_id, dl, token, COUNT(*) AS tf
      FROM tok GROUP BY doc_id, dl, token
    ), q(query_id, token) AS (
      VALUES {values}
    ), qtok AS (
      SELECT DISTINCT token FROM q
    ), cand AS (
      SELECT tf.* FROM tf JOIN qtok USING (token)
    ), df_t AS (
      SELECT token, COUNT(*) AS df FROM cand GROUP BY token{df_cap}
    ), scored AS (
      SELECT q.query_id, cand.doc_id,
             ROUND(SUM(
               ln(1e0 + (stats._n - df_t.df + 0.5e0) / (df_t.df + 0.5e0))
               * (cand.tf * {_sql_double(k1 + 1.0)})
               / (cand.tf + {_sql_double(k1)}
                  * ({_sql_double(1.0 - b)} + {_sql_double(b)}
                     * cand.dl / stats._avgdl))
             ), {round_to}) AS score
      FROM cand JOIN q USING (token) JOIN df_t USING (token)
      CROSS JOIN stats
      GROUP BY q.query_id, cand.doc_id
    ), ranked AS (
      SELECT query_id, doc_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id) AS rank
      FROM scored
    )
    SELECT query_id, doc_id, score, rank FROM ranked WHERE rank <= {k}
    """
