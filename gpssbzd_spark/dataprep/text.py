"""Text analysis operators — all native column expressions (JVM,
codegen-able); no Python worker anywhere in this module.

- :func:`tokens` — whitespace tokenization (lowercased, distinct opt).
- :func:`language_id` — stopword-overlap heuristic over a small
  per-language function-word list, plus a CJK-codepoint fast path.
  Scores are overlap counts against each list; argmax wins. This is the
  classic cheap lang-id for pipeline routing (not a trained model) and
  is fully expressible in SQL for the oracle.
- :func:`quality_features` — length/alpha/punct/stopword/type-token
  ratios for quality gating.
- :func:`doc_fingerprint` — winnowing-style fingerprint: k-shingle
  hashes → sliding-window minima → set hash. Robust to small local
  edits; native ``transform``/``slice``/``array_min``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from gpssbzd_spark.dataprep.dedup import char_shingles

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


def language_id(text_col: Column) -> Column:
    """Best-guess language code: 'zh' if CJK chars dominate, else the
    stopword list with the largest distinct-token overlap ('und' if no
    list matches at all)."""
    toks = tokens(text_col, distinct=True)
    cjk = F.length(F.regexp_replace(text_col, r"[^一-鿿]", ""))
    scores = [
        (lang, F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))))
        for lang, words in STOPWORDS.items()
    ]
    best = F.lit("und")
    best_score = F.lit(0)
    for lang, score in scores:
        is_better = score > best_score
        best = F.when(is_better, lang).otherwise(best)
        best_score = F.when(is_better, score).otherwise(best_score)
    return F.when(cjk * 2 > F.length(text_col), "zh").otherwise(best)


def quality_features(text_col: Column) -> dict[str, Column]:
    """Quality-gate feature set; combine/threshold at the call site."""
    n = F.length(text_col)
    toks = tokens(text_col)
    n_toks = F.size(toks)
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


def doc_fingerprint(
    text_col: Column, k: int = 7, window: int = 4
) -> Column:
    """Winnowing fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03
    shape): hash k-shingles, take the min of each sliding window of
    ``window`` hashes, hash the distinct sorted minima. Equal for texts
    differing only outside every window minimum — a cheap near-identity
    key for clustering near-copies."""
    hashes = F.transform(char_shingles(text_col, k), lambda s: F.xxhash64(s))
    n = F.size(hashes)
    starts = F.when(n >= window, F.sequence(F.lit(1), n - window + 1)).otherwise(
        F.when(n > 0, F.sequence(F.lit(1), F.lit(1))).otherwise(
            F.array().cast("array<int>")
        )
    )
    minima = F.transform(starts, lambda i: F.array_min(F.slice(hashes, i, window)))
    return F.xxhash64(
        F.concat_ws(",", F.transform(F.array_sort(F.array_distinct(minima)),
                                     lambda x: x.cast("string")))
    )
