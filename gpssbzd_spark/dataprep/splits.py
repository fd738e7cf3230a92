"""Deterministic dataset splitting for training pipelines.

``randomSplit`` is the textbook answer and the wrong one for a corpus:
it is nondeterministic across reruns and partitionings, so yesterday's
validation example can be today's training example (leakage). The
standard production construction is a content-keyed HASH split: bucket
each row by a cryptographic hash of its id + salt, map cumulative
weight ranges onto the bucket space, and the assignment is a pure
function of (id, salt) — stable under reruns, repartitioning, engine
version, and even engine CHOICE.

Portability note (this is why md5-hex + string compare, not xxhash):
Spark's ``xxhash64``/``hash`` have no DuckDB twin, but ``md5`` is
bit-identical everywhere. A fixed-length hex prefix of the digest is
uniform over 16^k, and LEXICOGRAPHIC comparison of hex strings equals
numeric comparison of the underlying value — so thresholds are just
zero-padded hex literals and the whole assignment stays in codegen'd
string ops any engine can mirror (no 64-bit integer conversion
dialects). At 100 TB the split is a stateless per-row projection: no
shuffle, no state, fully parallel.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HEX_DIGITS = 8  # 16^8 = 4.3e9 buckets: granularity ~2.3e-10


def _bucket_hex(id_col: Column, salt: str) -> Column:
    return F.substring(
        F.md5(F.concat(F.lit(salt), F.lit("|"), id_col.cast("string"))),
        1,
        _HEX_DIGITS,
    )


def split_thresholds(weights: dict[str, float]) -> list[tuple[str, str]]:
    """(split_name, upper-bound hex threshold) in declaration order;
    the last bound is forced to 'ffffffff…' so rounding never leaves a
    bucket unassigned."""
    total = float(sum(weights.values()))
    assert total > 0, "weights must sum > 0"
    space = 16**_HEX_DIGITS
    out: list[tuple[str, str]] = []
    cum = 0.0
    names = list(weights)
    for name in names:
        cum += weights[name] / total
        bound = min(space, int(round(cum * space)))
        out.append((name, format(bound, f"0{_HEX_DIGITS}x")))
    out[-1] = (names[-1], "f" * _HEX_DIGITS)
    return out


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "split-v1",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a split name, deterministically by id.

    ``weights`` maps split name → relative weight (normalized
    internally), e.g. ``{"train": 0.9, "val": 0.05, "test": 0.05}``.
    Changing ``salt`` produces an independent assignment; keeping it
    fixes every id's split forever (the anti-leakage contract). Null
    ids hash as the string 'None'-less empty via cast — they land in a
    deterministic bucket rather than a null split.
    """
    bucket = _bucket_hex(F.coalesce(F.col(id_col).cast("string"), F.lit("")), salt)
    # reversed + otherwise-chaining builds
    #   when(b <= t1, s1).otherwise(when(b <= t2, s2).otherwise(... s_last))
    # so the FIRST (smallest) matching bound wins — exactly the
    # cumulative-range semantics
    expr = None
    for name, bound in reversed(split_thresholds(weights)):
        lit = F.lit(name)
        if expr is None:
            expr = lit  # last split is the unconditional tail
        else:
            expr = F.when(bucket <= F.lit(bound), lit).otherwise(expr)
    return df.withColumn(out_col, expr)


def hash_split_sql(
    id_expr: str, weights: dict[str, float], salt: str = "split-v1"
) -> str:
    """The DuckDB/ANSI twin of :func:`hash_split`'s assignment CASE —
    used by the corpus oracle so both engines evaluate the identical
    construction."""
    bucket = (
        f"substr(md5('{salt}' || '|' || COALESCE(CAST({id_expr} AS VARCHAR), '')),"
        f" 1, {_HEX_DIGITS})"
    )
    ths = split_thresholds(weights)
    cases = " ".join(
        f"WHEN {bucket} <= '{bound}' THEN '{name}'" for name, bound in ths[:-1]
    )
    return f"CASE {cases} ELSE '{ths[-1][0]}' END"


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = "sample-v1"
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows, keyed by id hash —
    the repeatable alternative to ``df.sample()`` (which draws per
    task attempt: a retried task can emit a DIFFERENT sample mid-job).
    Same id + salt → same keep/drop decision forever, so downstream
    dedup/split stages see a stable corpus. Composing samples with
    different salts is how a weighted dataset MIXTURE is built: union
    per-source samples at their mixture weights, each source keyed by
    its own salt."""
    assert 0.0 <= fraction <= 1.0, fraction
    if fraction >= 1.0:
        # the full-space bound would need one hex digit more than the
        # bucket width (0x100000000) — short-circuit instead
        return df
    bound = format(
        int(round(fraction * 16**_HEX_DIGITS)), f"0{_HEX_DIGITS}x"
    )
    bucket = _bucket_hex(
        F.coalesce(F.col(id_col).cast("string"), F.lit("")), salt
    )
    # strict < so fraction=0 keeps nothing
    return df.filter(bucket < F.lit(bound))


def deterministic_sample_sql(
    id_expr: str, fraction: float, salt: str = "sample-v1"
) -> str:
    """DuckDB/ANSI predicate twin of :func:`deterministic_sample`."""
    if fraction >= 1.0:
        return "TRUE"
    bound = format(
        int(round(fraction * 16**_HEX_DIGITS)), f"0{_HEX_DIGITS}x"
    )
    return (
        f"substr(md5('{salt}' || '|' || COALESCE(CAST({id_expr} AS VARCHAR),"
        f" '')), 1, {_HEX_DIGITS}) < '{bound}'"
    )


def seeded_shuffle(
    df: DataFrame,
    id_col: str,
    num_shards: int,
    salt: str = "shuffle-v1",
    shard_col: str = "shard",
    key_col: str = "shuffle_key",
) -> DataFrame:
    """Deterministic global shuffle into ``num_shards`` shards — the
    reproducible replacement for ``df.orderBy(rand())`` when writing
    training shards (rand() re-draws per task attempt; a retry emits a
    different epoch order). Each row gets

    - ``shard``: a uniform deterministic shard id — literally
      :func:`hash_split` with ``num_shards`` equal weights, so the
      assignment stays in the same portable hex-threshold CASE;
    - ``shuffle_key``: a full md5 hex of (salt#order | id), salted
      independently of the shard bucket. Sorting a shard by it yields a
      uniform deterministic permutation of that shard's rows.

    Both are stateless per-row projections (no shuffle, no state). The
    intended 100 TB write is ``repartition(num_shards, shard)`` +
    ``sortWithinPartitions(shuffle_key)`` — each executor sorts only
    its shard; no global sort, no per-shard window (a
    ``row_number() over (partition by shard)`` would put one whole
    shard on one task — fine for the bounded oracle check in corpus
    `dp_shard_shuffle`, wrong at scale).
    """
    assert num_shards >= 1, num_shards
    weights = {str(i): 1.0 for i in range(num_shards)}
    out = hash_split(df, id_col, weights, salt=salt, out_col=shard_col)
    out = out.withColumn(shard_col, F.col(shard_col).cast("int"))
    order_key = F.md5(
        F.concat(
            F.lit(salt),
            F.lit("#order|"),
            F.coalesce(F.col(id_col).cast("string"), F.lit("")),
        )
    )
    return out.withColumn(key_col, order_key)


def seeded_shuffle_sql(
    id_expr: str, num_shards: int, salt: str = "shuffle-v1"
) -> tuple[str, str]:
    """DuckDB/ANSI twins of :func:`seeded_shuffle`'s two projections:
    (shard_expr, key_expr)."""
    weights = {str(i): 1.0 for i in range(num_shards)}
    shard = f"CAST({hash_split_sql(id_expr, weights, salt=salt)} AS INT)"
    key = (
        f"md5('{salt}' || '#order|' || "
        f"COALESCE(CAST({id_expr} AS VARCHAR), ''))"
    )
    return shard, key


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    salt: str = "strat-v1",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep ``fractions[stratum]``
    of each stratum's rows, keyed by id hash — the repeatable
    alternative to ``df.sampleBy()`` (whose draw is tied to partition
    layout and rng seeds, so a repartition or task retry changes the
    sample). Rebalancing a skewed corpus (downsample the dominant
    language, keep the long tail whole) is the canonical use.

    The keep/drop decision is a pure function of (id, salt): the SAME
    bucket value is compared against a per-stratum threshold, so
    raising one stratum's fraction only ADDS rows to it (nested-sample
    monotonicity — a 10% sample is a subset of the 20% one), and no
    shuffle or state is involved at any scale. Strata not in
    ``fractions`` fall back to ``default_fraction``.
    """
    for k, frac in fractions.items():
        assert 0.0 <= frac <= 1.0, (k, frac)
    assert 0.0 <= default_fraction <= 1.0, default_fraction

    def _bound_lit(frac: float) -> Column:
        if frac >= 1.0:
            # one past the max bucket: strictly-greater than every hex
            # string of width _HEX_DIGITS ('g' > 'f' lexicographically)
            return F.lit("g")
        return F.lit(format(int(round(frac * 16**_HEX_DIGITS)), f"0{_HEX_DIGITS}x"))

    bound = None
    for name, frac in fractions.items():
        cond = F.col(stratum_col) == F.lit(name)
        bound = (
            F.when(cond, _bound_lit(frac))
            if bound is None
            else bound.when(cond, _bound_lit(frac))
        )
    bound = _bound_lit(default_fraction) if bound is None else bound.otherwise(
        _bound_lit(default_fraction)
    )
    bucket = _bucket_hex(
        F.coalesce(F.col(id_col).cast("string"), F.lit("")), salt
    )
    return df.filter(bucket < bound)


def stratified_sample_sql(
    id_expr: str,
    stratum_expr: str,
    fractions: dict[str, float],
    salt: str = "strat-v1",
    default_fraction: float = 0.0,
) -> str:
    """DuckDB/ANSI predicate twin of :func:`stratified_sample`."""

    def _bound(frac: float) -> str:
        if frac >= 1.0:
            return "g"
        return format(int(round(frac * 16**_HEX_DIGITS)), f"0{_HEX_DIGITS}x")

    bucket = (
        f"substr(md5('{salt}' || '|' || COALESCE(CAST({id_expr} AS VARCHAR),"
        f" '')), 1, {_HEX_DIGITS})"
    )
    cases = " ".join(
        f"WHEN {stratum_expr} = '{name}' THEN '{_bound(frac)}'"
        for name, frac in fractions.items()
    )
    return f"{bucket} < (CASE {cases} ELSE '{_bound(default_fraction)}' END)"


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window document chunking — the retrieval/embedding prep
    step (RAG pipelines chunk before embedding so a passage, not a
    whole document, is the retrieval unit). Whitespace tokens are
    sliced into windows of ``chunk_tokens`` advancing by
    ``chunk_tokens - overlap``; the final window may be shorter, and a
    document shorter than one window yields exactly one chunk.
    Empty/whitespace-only docs yield none.

    Returns (id, chunk_idx, n_tokens, chunk_text). Stateless per-row
    array ops (split → sequence of starts → slice → join): no shuffle,
    no Python, output rows ≈ corpus_tokens / stride. Deterministic and
    expressible 1:1 in the SQL oracle (corpus `dp_chunk_documents`)."""
    assert 0 < chunk_tokens, chunk_tokens
    assert 0 <= overlap < chunk_tokens, (overlap, chunk_tokens)
    stride = chunk_tokens - overlap
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda x: x != ""
    )
    base = df.select(
        F.col(id_col), toks.alias("_toks"), F.size(toks).alias("_n")
    ).filter(F.col("_n") > 0)
    starts = F.sequence(F.lit(1), F.col("_n"), F.lit(stride))
    chunk = F.slice(F.col("_toks"), F.col("_start"), chunk_tokens)
    return (
        base.select(
            F.col(id_col),
            F.posexplode(starts).alias("chunk_idx", "_start"),
            "_toks",
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.size(chunk).cast("long").alias("n_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


def chunk_documents_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> str:
    """DuckDB twin of :func:`chunk_documents` (same tokenizer, same
    start grid, same slicing)."""
    stride = chunk_tokens - overlap
    return f"""
    WITH toks AS (
      SELECT {id_col},
             list_filter(regexp_split_to_array(lower(trim({text_col})),
                                               '\\s+'), x -> x <> '') AS t
      FROM {table} WHERE {text_col} IS NOT NULL
    ), nonempty AS (
      SELECT {id_col}, t, len(t) AS n FROM toks WHERE len(t) > 0
    ), chunks AS (
      SELECT {id_col},
             CAST(gs.i AS BIGINT) AS start_pos,
             CAST(ROW_NUMBER() OVER (PARTITION BY {id_col} ORDER BY gs.i) - 1
                  AS BIGINT) AS chunk_idx,
             t[gs.i : LEAST(gs.i + {chunk_tokens} - 1, n)] AS c
      FROM nonempty, LATERAL unnest(generate_series(1, n, {stride}))
        AS gs(i)
    )
    SELECT {id_col}, chunk_idx,
           CAST(len(c) AS BIGINT) AS n_tokens,
           array_to_string(c, ' ') AS chunk_text
    FROM chunks
    """


def pack_documents(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    bucket_hex_chars: int = 2,
    salt: str = "pack-v1",
) -> DataFrame:
    """Concat-and-chunk sequence packing: assign each document a
    (bucket, pack_id, offset) so that concatenating a bucket's docs in
    id order and slicing every ``budget`` tokens yields the packs — the
    standard way pretraining pipelines fill fixed context windows
    without padding waste.

    True bin packing is sequential; the scalable formulation shards the
    corpus into ``16^bucket_hex_chars`` deterministic hash buckets (an
    md5-hex PREFIX kept as a string — engine-portable like
    :func:`hash_split`, no integer-conversion dialects) and runs an
    in-bucket running sum — one window over one shuffle,
    O(corpus/buckets) sequential work per task, fully deterministic
    across reruns. A doc belongs to the pack where its first token
    lands (docs may span pack boundaries, exactly like concat-and-chunk
    training data). At 100 TB raise ``bucket_hex_chars`` so each
    bucket's token mass fits one task comfortably.
    """
    from pyspark.sql import Window

    b = F.substring(
        F.md5(F.concat(F.lit(salt), F.lit("|"), F.col(id_col).cast("string"))),
        1,
        bucket_hex_chars,
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("bucket", b)
    csum = F.sum(F.col(token_col)).over(w)
    offset = (csum - F.col(token_col)).cast("long")
    return out.select(
        "*",
        offset.alias("offset"),
        F.floor(offset / F.lit(float(budget))).cast("long").alias("pack_id"),
    )


def cap_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    id_col: str,
    max_rows: int,
    salt: str = "cap-v1",
) -> DataFrame:
    """Deterministic per-group quota: keep at most ``max_rows`` rows of
    every group, chosen uniformly by id hash — the "cap documents per
    domain" step web-scale corpus curation runs so one giant source
    cannot dominate the mixture (RefinedWeb/C4-style host caps).

    Selection is a pure function of (id, salt): rows rank within their
    group by the same md5 bucket :func:`hash_split` uses (id tiebreak),
    so re-runs, repartitions and task retries keep the SAME rows, and
    groups under the cap pass through whole. One exchange on the group
    key (the ranking window); nothing driver-side at any scale. A
    LOWER cap keeps a subset of a higher cap's selection per group
    (prefix-of-ranking monotonicity) — shrinking quotas never churns
    the surviving set.
    """
    assert max_rows >= 1, max_rows
    bucket = _bucket_hex(
        F.coalesce(F.col(id_col).cast("string"), F.lit("")), salt
    )
    w = Window.partitionBy(*group_cols).orderBy(
        bucket.asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_cap_rn", F.row_number().over(w))
        .filter(F.col("_cap_rn") <= max_rows)
        .drop("_cap_rn")
    )


def token_budget_cap(
    df: DataFrame,
    group_cols: Sequence[str],
    id_col: str,
    token_col: str,
    budget: int,
    salt: str = "cap-v1",
) -> DataFrame:
    """Deterministic per-group TOKEN quota: keep the hash-ordered
    prefix of each group whose RUNNING token total stays within
    ``budget`` — the unit pretraining mixtures are actually budgeted
    in (a source contributes tokens, not documents; one 500k-token doc
    is not one tweet). The first document that would cross the budget
    is dropped along with everything ranked after it, so the kept set
    always fits.

    Same determinism contract as :func:`cap_per_group` (and the same
    salt default, so the two caps rank any group identically): the
    order is a pure function of (id, salt), re-runs/retries keep the
    same rows, a SMALLER budget keeps a prefix of a larger budget's
    selection, and under-budget groups pass through whole. One
    exchange on the group key (the running-sum window); nothing
    driver-side at any scale.
    """
    assert budget >= 1, budget
    bucket = _bucket_hex(
        F.coalesce(F.col(id_col).cast("string"), F.lit("")), salt
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(bucket.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("_cap_cum", F.sum(F.col(token_col)).over(w))
        .filter(F.col("_cap_cum") <= budget)
        .drop("_cap_cum")
    )


def token_budget_cap_sql(
    table: str,
    group_cols: Sequence[str],
    id_col: str,
    token_col: str,
    budget: int,
    salt: str = "cap-v1",
) -> str:
    """DuckDB twin of :func:`token_budget_cap` (same md5 bucket, same
    ranking, same running-sum frame)."""
    k = ", ".join(group_cols)
    bucket = (
        f"substr(md5('{salt}' || '|' || "
        f"COALESCE(CAST({id_col} AS VARCHAR), '')), 1, {_HEX_DIGITS})"
    )
    return f"""
    SELECT * EXCLUDE (_cap_cum) FROM (
      SELECT *, SUM({token_col}) OVER (
        PARTITION BY {k} ORDER BY {bucket} ASC, {id_col} ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cap_cum
      FROM {table}
    ) WHERE _cap_cum <= {budget}
    """


def cap_per_group_sql(
    table: str,
    group_cols: Sequence[str],
    id_col: str,
    max_rows: int,
    salt: str = "cap-v1",
) -> str:
    """DuckDB twin of :func:`cap_per_group` (same md5 bucket, same
    ranking, same tiebreak)."""
    k = ", ".join(group_cols)
    bucket = (
        f"substr(md5('{salt}' || '|' || "
        f"COALESCE(CAST({id_col} AS VARCHAR), '')), 1, {_HEX_DIGITS})"
    )
    return f"""
    SELECT * EXCLUDE (_cap_rn) FROM (
      SELECT *, row_number() OVER (
        PARTITION BY {k} ORDER BY {bucket} ASC, {id_col} ASC) AS _cap_rn
      FROM {table}
    ) WHERE _cap_rn <= {max_rows}
    """
