"""Deduplication operators for a training-data pipeline at 100 TB
(SURVEY.md §2.11 extension surface; not present in the reference).

Design:

- **Exact** dedup is a hash-groupBy: the md5 of the normalized text is
  the shuffle key, so the groupBy stays balanced even when raw doc
  lengths are skewed.
- **MinHash + LSH** near-dedup: the hot path is ONE fused Arrow
  kernel (:func:`shingle_hash_signature`) — codepoint-array shingling
  (stride-tricks window), vectorized polynomial rolling hash, and the
  multiply-shift permutation family ``h_i(x) = a_i·x + b_i (mod
  2^64)`` (odd ``a_i`` ⇒ bijective on the 64-bit ring) as a single
  numpy broadcast. Spark evaluates higher-order lambdas interpreted
  (~µs/element), so the earlier native ``sequence``/``substring``/
  ``xxhash64`` shingle pass was 50% of pipeline wall-clock; the fused
  kernel costs ~ns/element. A fully-native variant
  (:func:`char_shingles` + :func:`minhash_signature_native`) is kept
  for zero-Python-worker environments and differential testing.
  Banding stays native and turns the O(n²) similarity join into
  ``#bands`` equi-joins on (band_id, band_hash) — the only shuffles.
- **SimHash** needs per-bit majority voting across token hashes, which
  has no native columnar form — one Arrow-batched pandas UDF
  (numpy ``unpackbits``), the documented slow path.

Candidate pairs are verified with EXACT shingle-set Jaccard
(``array_intersect``/``array_union`` cardinalities) before being
reported, so LSH tuning only affects recall, never precision.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one deterministic survivor (min id) per exact text."""
    w_key = F.md5(F.col(text_col).cast("binary"))
    survivors = df.groupBy(w_key.alias("_h")).agg(F.min(id_col).alias(id_col))
    return df.join(survivors.select(id_col), id_col, "left_semi")


def passage_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    passage_tokens: int = 8,
) -> DataFrame:
    """Corpus-wide PASSAGE-level exact dedup with document reassembly
    — the sub-document half of C4/RefinedWeb-style cleaning: a
    boilerplate span repeated across many documents (nav text, license
    blocks, quoted passages) survives document-level dedup because the
    surrounding text differs, so it must be removed at passage
    granularity and the documents stitched back together.

    Documents are cut into NON-overlapping ``passage_tokens``-word
    passages (:func:`~gpssbzd_spark.dataprep.splits.chunk_documents`
    with ``overlap=0`` — same tokenizer, same start grid), every
    occurrence of a passage after its first is dropped, and each
    document is reassembled from its surviving passages in order.
    First occurrence = lexicographically smallest ``(doc_id,
    chunk_idx)``, a total order, so the survivor set is deterministic.

    Returns ``(id_col, clean_text, n_kept, n_dropped)``; documents
    whose every passage lost (fully-boilerplate docs) vanish, exactly
    like exact_dedup's non-survivors.

    Scale shape: chunking is stateless per-row array ops (no shuffle);
    the dedup is ONE md5-keyed groupBy whose partial aggregation keeps
    one buffer per DISTINCT passage per map task — the hot key a
    million-fold-repeated boilerplate passage would create is combined
    map-side, so the reduce side sees #distinct rows, not #occurrence
    rows. The winner's text rides in the min-struct (no join back to
    the corpus); reassembly groups the winners by their winning doc —
    two row-count-bounded exchanges total plus the co-keyed totals
    join. Nothing Python, nothing driver-side.
    """
    from .splits import chunk_documents

    chunks = chunk_documents(
        df,
        id_col=id_col,
        text_col=text_col,
        chunk_tokens=passage_tokens,
        overlap=0,
    )
    winners = (
        chunks.groupBy(F.md5(F.col("chunk_text").cast("binary")).alias("_h"))
        .agg(
            F.min(
                F.struct(
                    F.col(id_col), F.col("chunk_idx"), F.col("chunk_text")
                )
            ).alias("_w")
        )
        .select(F.col("_w.*"))
    )
    kept = winners.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("chunk_idx", "chunk_text"))
                ),
                lambda x: x["chunk_text"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    totals = chunks.groupBy(id_col).agg(F.count("*").alias("_n_total"))
    return kept.join(totals, id_col).select(
        id_col,
        "clean_text",
        "n_kept",
        (F.col("_n_total") - F.col("n_kept")).alias("n_dropped"),
    )


def passage_dedup_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    passage_tokens: int = 8,
) -> str:
    """DuckDB twin of :func:`passage_dedup` (same chunk grid via
    :func:`~gpssbzd_spark.dataprep.splits.chunk_documents_sql`, same
    (doc_id, chunk_idx) first-occurrence rule, same reassembly)."""
    from .splits import chunk_documents_sql

    chunks = chunk_documents_sql(
        table=table,
        id_col=id_col,
        text_col=text_col,
        chunk_tokens=passage_tokens,
        overlap=0,
    )
    return f"""
    WITH chunks AS ({chunks}),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY md5(chunk_text) ORDER BY {id_col}, chunk_idx
      ) AS rn FROM chunks
    ),
    kept AS (
      SELECT {id_col},
             string_agg(chunk_text, ' ' ORDER BY chunk_idx) AS clean_text,
             COUNT(*) AS n_kept
      FROM ranked WHERE rn = 1 GROUP BY {id_col}
    ),
    tot AS (SELECT {id_col}, COUNT(*) AS n FROM chunks GROUP BY {id_col})
    SELECT k.{id_col}, k.clean_text, CAST(k.n_kept AS BIGINT) AS n_kept,
           CAST(t.n - k.n_kept AS BIGINT) AS n_dropped
    FROM kept k JOIN tot t USING ({id_col})
    """


def char_shingles(col: Column, k: int = 5) -> Column:
    """Distinct lowercase character k-shingles, natively.

    ``sequence(1, len-k+1)`` + ``substring`` — no UDF; empty/short text
    yields an empty array.
    """
    s = F.lower(col)
    n = F.length(s)
    idx = F.when(n >= k, F.sequence(F.lit(1), n - k + 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(F.transform(idx, lambda i: F.substr(s, i, F.lit(k))))


def minhash_signature_native(
    shingle_col: Column, num_perm: int = 64, seed: int = 42
) -> Column:
    """num_perm-long minhash signature as array<bigint>, all-native.

    Hash family: ``xxhash64(seed ⊕ i, shingle)`` — an independent keyed
    hash per permutation, with no arithmetic that could overflow under
    ANSI mode (the classic a·h+b multiply-shift family wraps mod 2^64,
    which Spark 4's ANSI dialect rejects JVM-side).

    Portable (zero Python workers) but slow in bulk: Spark evaluates
    higher-order functions interpreted (no whole-stage codegen), so the
    num_perm passes cost ~µs/element. Use :func:`minhash_signature`
    (Arrow + numpy) on the hot path; this stays for environments where
    the Python worker is unavailable and as the differential check.
    """
    def perm_min(i: int) -> Column:
        salt = F.lit(seed ^ i)
        # one-arg lambda: transform must not bind the array index
        return F.array_min(F.transform(shingle_col, lambda s: F.xxhash64(salt, s)))

    return F.array(*[perm_min(i) for i in range(num_perm)])


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Multiply-shift permutation family h_i(x) = a_i·x + b_i mod 2^64,
    a_i odd ⇒ bijective on the 64-bit ring. Deterministic per seed."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 2**63 - 1, size=num_perm, dtype=np.uint64) * 2 + 1
    b = rng.randint(0, 2**63 - 1, size=num_perm, dtype=np.uint64)
    return a, b


def _perm_min_fold(h: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """``min over shingles of h·a_i + b_i`` on the uint64 ring — the
    MinHash permutation-family fold — ALLOCATION-QUIET (r14, VERDICT
    r13 #4: the r13 simhash scratch discipline transplanted): the old
    one-shot ``(h[:, None] * a + b).min(axis=0)`` broadcast allocated
    a fresh (n_shingles × num_perm) matrix PER ROW — multi-MB for long
    documents, the exact >mmap-threshold first-touch stall class
    PERF_NOTES #14 diagnosed. Here the product matrix lives in a
    persistent per-worker scratch (``_simhash_scratch`` — the shared
    kernel-scratch arena, historical name) and shingles fold in
    ~``_SIMHASH_CHUNK_TOKENS`` chunks with a running elementwise
    minimum. Bit-identical to the broadcast: multiply/add wrap the
    same ring, and min is associative over chunks (hypothesis-pinned
    in tests/test_kernels_property.py)."""
    num_perm = a.size
    sig = np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    for s in range(0, h.size, _SIMHASH_CHUNK_TOKENS):
        part = h[s : s + _SIMHASH_CHUNK_TOKENS]
        mat = _simhash_scratch(
            "mh_mat", _SIMHASH_CHUNK_TOKENS * num_perm, np.uint64
        )[: part.size * num_perm].reshape(part.size, num_perm)
        np.multiply(part[:, None], a[None, :], out=mat)
        np.add(mat, b[None, :], out=mat)
        np.minimum(sig, mat.min(axis=0), out=sig)
    return sig


def _rolling_shingle_hashes(
    cp: np.ndarray, k: int, base: np.uint64
) -> np.ndarray:
    """Sorted-distinct polynomial k-gram hashes of a codepoint array,
    with the k multiply-add passes running IN PLACE on a per-worker
    scratch row (the old ``h = h * base + w[:, i].astype(uint64)``
    allocated three temporaries per pass per row — the same #14
    allocation class, sub-threshold only by grace of the malloc env
    mitigation). Returns a fresh ``np.unique`` array (the row's OUTPUT
    — a needed allocation, not scratch)."""
    w = np.lib.stride_tricks.sliding_window_view(cp, k)
    n = w.shape[0]
    h = _simhash_scratch("mh_roll", n, np.uint64)[:n]
    h[:] = 0
    for i in range(k):
        np.multiply(h, base, out=h)
        np.add(h, w[:, i], out=h, casting="unsafe")
    return np.unique(h)


def minhash_signature(
    shingle_col: Column, num_perm: int = 64, seed: int = 42, pre_hashed: bool = False
) -> Column:
    """num_perm-long minhash signature as array<bigint>.

    Two-stage split keeps the expensive part vectorized: shingles are
    hashed to 64-bit ints ONCE natively (one interpreted pass over the
    strings; skipped if ``pre_hashed`` — pass an array<bigint> column),
    then one Arrow-batched pandas UDF applies the whole multiply-shift
    family as a single (n_shingles × num_perm) uint64 numpy broadcast
    and takes column minima — ~ns/element instead of the ~µs/element of
    per-permutation interpreted HOF passes. numpy uint64 arithmetic
    wraps mod 2^64 by construction, which is exactly the permutation
    family's ring (no ANSI overflow concerns — the wraparound never
    touches the JVM).
    """
    a_params, b_params = _perm_params(num_perm, seed)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig(base_hashes: pd.Series) -> pd.Series:
        out = []
        for hashes in base_hashes:
            if hashes is None or len(hashes) == 0:
                out.append(None)
                continue
            h = np.asarray(hashes, dtype=np.int64).view(np.uint64)
            out.append(_perm_min_fold(h, a_params, b_params).view(np.int64))
        return pd.Series(out)

    base = (
        F.col(shingle_col) if isinstance(shingle_col, str) else shingle_col
    )
    if not pre_hashed:
        base = F.transform(base, lambda s: F.xxhash64(s))
    return sig(base)


def shingle_hash_signature(
    text_col: Column,
    k: int = 5,
    num_perm: int = 64,
    seed: int = 42,
    bands: int | None = None,
) -> Column:
    """Fused shingle→hash→minhash kernel: one Arrow batch per partition
    computes ``struct<hashes: array<bigint>, signature: array<bigint>>``
    (plus ``band_hashes: array<bigint>`` when ``bands`` is given — the
    LSH band keys folded into the same kernel, so the banding step needs
    no per-band interpreted ``slice``/``concat_ws``/``xxhash64`` pass
    over the signature; a reshape + one vectorized polynomial hash per
    band is ~free next to the shingle work).

    The all-native shingle path (:func:`char_shingles` + ``xxhash64``)
    evaluates interpreted higher-order functions — ~µs per shingle, and
    it was 50% of the whole MinHash pipeline's wall-clock. Here the text
    is decoded to a codepoint array (``utf-32-le`` — char-exact, same
    shingle boundaries as ``substring``), shingled with a stride-tricks
    sliding window, and hashed with a vectorized polynomial rolling hash
    on the uint64 ring (FNV-prime base; k multiply-add passes over all
    windows at once). ``hashes`` comes out SORTED DISTINCT (np.unique),
    which the verify step exploits. The hash family differs from the
    native path's xxhash64 — engine-internal either way; only set
    semantics matter, and both are uniform on 64 bits.

    Empty/short texts yield ``hashes=[]``, ``signature=NULL`` (matching
    :func:`minhash_signature`'s null contract).
    """
    a_params, b_params = _perm_params(num_perm, seed)
    fields = [
        T.StructField("hashes", T.ArrayType(T.LongType())),
        T.StructField("signature", T.ArrayType(T.LongType())),
    ]
    if bands is not None:
        assert num_perm % bands == 0, "num_perm must divide into bands"
        fields.append(T.StructField("band_hashes", T.ArrayType(T.LongType())))
    out_type = T.StructType(fields)
    r = num_perm // bands if bands else 0

    @F.pandas_udf(out_type)
    def prep(texts: pd.Series) -> pd.DataFrame:
        base = np.uint64(1099511628211)  # FNV-1a prime, odd ⇒ mixes the ring
        hashes_out: list = []
        sig_out: list = []
        bh_out: list = []
        for t in texts:
            if t is None:
                hashes_out.append(None)
                sig_out.append(None)
                bh_out.append(None)
                continue
            cp = np.frombuffer(t.lower().encode("utf-32-le"), dtype=np.uint32)
            if cp.size < k:
                hashes_out.append(np.empty(0, dtype=np.int64))
                sig_out.append(None)
                bh_out.append(None)
                continue
            # shingle-hash and permutation folds run on per-worker
            # scratch (VERDICT r13 #4 — the #14 allocation-quiet
            # discipline; bit-identity hypothesis-pinned)
            h = _rolling_shingle_hashes(cp, k, base)
            # unique sorts as uint64; re-sort the int64 VIEW (top-bit
            # values go negative) so the verify merge can searchsorted
            hashes_out.append(np.sort(h.view(np.int64)))
            sig = _perm_min_fold(h, a_params, b_params)
            sig_out.append(sig.view(np.int64))
            if bands is not None:
                seg = sig.reshape(bands, r)
                bh = np.zeros(bands, dtype=np.uint64)
                for j in range(r):
                    bh = bh * base + seg[:, j]
                bh_out.append(bh.view(np.int64))
        cols = {"hashes": hashes_out, "signature": sig_out}
        if bands is not None:
            cols["band_hashes"] = bh_out
        return pd.DataFrame(cols)

    return prep(text_col)


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "signature",
    bands: int = 16,
) -> DataFrame:
    """Banding: docs sharing any band hash become a candidate pair.

    One explode + one self equi-join on (band, band_hash); the join key
    includes the band id so bands never cross-match. Returns distinct
    (id_a, id_b) with id_a < id_b. Rows with a null/empty signature
    (empty text) generate no candidates.
    """
    df = df.filter(F.size(F.col(sig_col)) > 0)
    r = (F.size(F.col(sig_col)) / bands).cast("int")
    band_hashes = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda band: F.struct(
            band.alias("band"),
            F.xxhash64(
                band,
                F.concat_ws(
                    ",",
                    F.transform(
                        F.slice(F.col(sig_col), band * r + 1, r),
                        lambda x: x.cast("string"),
                    ),
                ),
            ).alias("band_hash"),
        ),
    )
    banded = df.select(
        F.col(id_col), F.explode(band_hashes).alias("_bh")
    ).select(id_col, F.col("_bh.band").alias("band"), F.col("_bh.band_hash").alias("band_hash"))
    a = banded.select(F.col(id_col).alias("id_a"), "band", "band_hash")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "band_hash")
    return (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


@F.pandas_udf(T.DoubleType())
def _sig_agreement(a_col: pd.Series, b_col: pd.Series) -> pd.Series:
    """MinHash Jaccard estimate: fraction of agreeing signature slots.

    Signatures are fixed-width, so the whole Arrow batch collapses to a
    single (batch × num_perm) matrix comparison — no per-pair Python.
    The stacked matrices live in per-worker scratch (VERDICT r13 #4:
    ``np.stack`` allocated two fresh (batch × num_perm) matrices per
    Arrow batch — the #14 first-touch stall class at large batches).
    """
    n = len(a_col)
    if n == 0:
        return pd.Series([], dtype=float)
    arrs_a = a_col.to_numpy()
    arrs_b = b_col.to_numpy()
    width = len(arrs_a[0])
    a = _simhash_scratch("agree_a", n * width, np.int64)[: n * width]
    b = _simhash_scratch("agree_b", n * width, np.int64)[: n * width]
    np.concatenate(arrs_a, out=a)
    np.concatenate(arrs_b, out=b)
    eq = _simhash_scratch("agree_eq", n * width, np.bool_)[: n * width]
    np.equal(
        a.reshape(n, width), b.reshape(n, width), out=eq.reshape(n, width)
    )
    return pd.Series(eq.reshape(n, width).mean(axis=1))


@F.pandas_udf(T.DoubleType())
def _sorted_hash_jaccard(a_col: pd.Series, b_col: pd.Series) -> pd.Series:
    """Exact Jaccard of two SORTED-ASCENDING distinct-hash arrays.

    The contract is in the name AND enforced: ``searchsorted`` silently
    returns garbage on unsorted input (the kept native differential path
    — char_shingles + xxhash64 — emits unsorted arrays), so the first
    pair of every Arrow batch is monotonicity-checked — all rows of a
    batch come from the same upstream expression, so one check catches a
    wrong caller without taxing the per-pair hot loop — and violations
    raise instead of mis-scoring. Sorted inputs come from
    :func:`shingle_hash_signature` (np.unique output); ``searchsorted``
    membership beats ``np.intersect1d``'s concat+sort ~3× at the
    ~400-element sizes the candidate pairs carry.
    """
    out = np.zeros(len(a_col))
    checked = False
    for i, (a, b) in enumerate(zip(a_col, b_col)):
        if a is None or b is None or len(a) == 0 or len(b) == 0:
            continue
        a = np.asarray(a, dtype=np.int64)
        b = np.asarray(b, dtype=np.int64)
        if len(b) < len(a):  # probe the smaller side into the larger
            a, b = b, a
        if not checked:
            if np.any(np.diff(a) < 0) or np.any(np.diff(b) < 0):
                raise ValueError(
                    "_sorted_hash_jaccard requires sorted-ascending hash "
                    "arrays (got an unsorted input; sort upstream or use "
                    "array_intersect semantics)"
                )
            checked = True
        idx = np.searchsorted(b, a)
        idx[idx == len(b)] = len(b) - 1
        inter = int(np.count_nonzero(b[idx] == a))
        out[i] = inter / (len(a) + len(b) - inter)
    return pd.Series(out)


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs: MinHash-LSH candidates verified by exact
    Jaccard ≥ threshold. Returns (id_a, id_b, jaccard).

    Shingles are hashed to 64-bit ints once (fused Arrow kernel,
    :func:`shingle_hash_signature`); both the signature and the
    verification run on the hash arrays (set semantics preserved —
    shingle sets are distinct, and a ~2^-64 hash collision is the only
    approximation). Verification is a sorted-merge on numpy arrays: on
    a shared-vocabulary corpus the banding join legitimately emits ~3%
    of all pairs as candidates, so interpreted array_intersect over
    string arrays was the dominant cost of the whole pipeline (~6×
    everything else combined).
    """
    # partition-count floor BEFORE the Arrow kernel (guide §2, r14):
    # the fixture corpus scans as 1-2 splits, so without this the
    # signature kernel ran on 2 of 32 cores (profiled 1.2 s wall,
    # ~0.1 s JVM cpu — all Python worker time); no-op on wide inputs
    from gpssbzd_spark.sources.tables import widen_small_input

    sc = df.sparkSession.sparkContext
    narrow_input = df.rdd.getNumPartitions() < sc.defaultParallelism
    df = widen_small_input(df, key=id_col)
    prepped = df.select(
        F.col(id_col),
        shingle_hash_signature(F.col(text_col), k, num_perm, seed, bands=bands).alias(
            "_p"
        ),
    ).select(
        id_col,
        F.col("_p.hashes").alias("_h"),
        F.col("_p.signature").alias("signature"),
        F.col("_p.band_hashes").alias("_bh"),
    )
    # the prep feeds 6 join branches (band self-join ×2, prefilter ×2,
    # verify ×2) — pin it or the fused shingle+signature kernel reruns
    # per branch (reference tactic kept per SURVEY §4). localCheckpoint,
    # not persist: GC-scoped, released when the result dies instead of
    # living in the session CacheManager (the ADVICE r5 leak class)
    prepped = prepped.localCheckpoint()

    # banding straight off the kernel's band_hashes: posexplode of a
    # 16-element long array — no interpreted slice/concat/xxhash64 pass
    banded = prepped.filter(F.col("_bh").isNotNull()).select(
        F.col(id_col), F.posexplode("_bh").alias("band", "band_hash")
    )
    cands = (
        banded.withColumnsRenamed({id_col: "id_a"})
        .join(banded.withColumnsRenamed({id_col: "id_b"}), ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # r15 (guide §2; supersedes the r2-measured dead end): the
    # prefilter+verify chain below ran at ~5 AQE byte-coalesced tasks
    # and its executor-run is 87% JVM CPU (Arrow conversion + join
    # probe — profiled via TaskMetrics; the Python workers are ~13%,
    # refuting the r2-era worker-pool-saturation reading that killed a
    # 32-wide repartition). Half-parallelism widening of the CANDIDATE
    # set (each task still chains two Python workers, so dp/2 tasks
    # keep ≤ dp worker processes) won EVERY interleaved round on the
    # bench corpus: min-of-3 1.85/1.73/1.58 vs 2.22/2.15/1.86 unpinned
    # and vs 2.04/1.83/1.83 at full dp width
    # (plans/r15/ab_candwidth.json; rows proved identical). Gated on
    # the INPUT scan being narrow — at real scale the sig joins are
    # shuffle joins whose own exchanges lay the candidates out wide,
    # and an extra round-robin pass over billions of candidate ids
    # would be pure waste, so this is fixture-layout repair only,
    # same no-op contract as widen_small_input.
    if narrow_input:
        cands = cands.repartition(max(8, sc.defaultParallelism // 2))

    # Signature-agreement prefilter: on a shared-vocabulary corpus the
    # banding join emits ~3% of ALL pairs as candidates (443k candidates
    # for 256 true pairs at sf0.1 — the template-similarity noise mass
    # sits at ĵ≈0.19–0.44), and shipping every candidate's full
    # shingle-hash arrays (KBs/row) into the exact verify dominated the
    # whole pipeline. The MinHash estimator (fraction of agreeing slots)
    # is one vectorized matrix op over the 512-byte signatures already
    # in hand; the cutoff is threshold − 2σ (σ = √(t(1−t)/num_perm)):
    # P(miss | true j = threshold) ≈ 2.3% — small next to the banding
    # s-curve's own ~36% boundary loss — and ≈ 0.3% one σ above it,
    # while cutting the verify input ~5× on the noise-heavy corpus.
    # Precision is untouched: survivors still get the exact verify.
    sigma = (threshold * (1.0 - threshold) / num_perm) ** 0.5
    sig = prepped.select(F.col(id_col), F.col("signature"))
    survivors = (
        cands.join(
            sig.withColumnsRenamed({id_col: "id_a", "signature": "_s_a"}), "id_a"
        )
        .join(sig.withColumnsRenamed({id_col: "id_b", "signature": "_s_b"}), "id_b")
        .filter(
            _sig_agreement.asNondeterministic()(F.col("_s_a"), F.col("_s_b"))
            >= threshold - 2 * sigma
        )
        .select("id_a", "id_b")
    )

    sh = prepped.select(F.col(id_col), F.col("_h"))
    pairs = (
        survivors.join(sh.withColumnsRenamed({id_col: "id_a", "_h": "_h_a"}), "id_a")
        .join(sh.withColumnsRenamed({id_col: "id_b", "_h": "_h_b"}), "id_b")
    )
    # asNondeterministic stops Catalyst cloning the UDF into the filter
    # (it would score every candidate twice); it is in fact deterministic
    jac = _sorted_hash_jaccard.asNondeterministic()(F.col("_h_a"), F.col("_h_b"))
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    block_col: str | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cos_sim) for
    every unordered pair with cosine similarity ≥ ``threshold``.

    Vectors are L2-normalized ONCE per row (O(n·d) prep), so the
    per-pair kernel is a bare dot product — the shape that matters when
    the pair count dwarfs the row count. Zero-norm vectors are dropped
    (cosine undefined). All arithmetic is native ``zip_with`` /
    ``aggregate`` fold in double precision — no Python boundary.

    ``block_col`` keys the self-join so only same-block rows pair. At
    100 TB the unblocked variant is a nonstarter (O(n²) pairs); pass a
    blocking key — e.g. :func:`gpssbzd_spark.dataprep.similarity.
    hyperplane_bucket` LSH buckets (near-dups agree on most hyperplane
    signs, so bucket-mates capture the high-cosine tail), a coarse
    cluster id, or a shard column. Unblocked stays the oracle-checkable
    exact baseline (SURVEY.md §2.11; pair-join shape = §2.3 J4).
    """
    # r14 (guide §2): partition-count floor before the per-vector prep —
    # the single-split embeddings scan otherwise pins a 1-2-task layout
    # that BOTH self-join sides' normalize chains and the pair-dot
    # stage inherit (profiled 1.4 s wall / 2.1 s cpu over 2 tasks at
    # sf0.1); no-op on wide inputs
    from gpssbzd_spark.sources.tables import widen_small_input

    df = widen_small_input(df, key=id_col)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(F.col("_v"), F.lit(0.0), lambda acc, x: acc + x * x))
    keep = [id_col] + ([block_col] if block_col else [])
    prepped = (
        df.select(*keep, v.alias("_v"))
        .withColumn("_norm", norm)
        .filter(F.col("_norm") > 0)
        .select(*keep, F.transform("_v", lambda x: x / F.col("_norm")).alias("_u"))
    )
    keys = [block_col] if block_col else []
    a = prepped.withColumnsRenamed({id_col: "id_a", "_u": "_u_a"})
    b = prepped.withColumnsRenamed({id_col: "id_b", "_u": "_u_b"})
    dot = F.aggregate(
        F.zip_with("_u_a", "_u_b", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    joined = a.join(b, keys) if keys else a.crossJoin(b)
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", dot)
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def embedding_lsh_pairs(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_planes: int = 6,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """OR-amplified hyperplane-LSH embedding near-dup pairs — the 100 TB
    form of :func:`embedding_cosine_pairs`.

    Single-table sign-LSH blocking has low recall for moderate-cosine
    pairs (collision probability ``(1-θ/π)^n_planes`` — ~6% at cosine
    0.4 with 6 planes), so candidates are generated across ``n_tables``
    independent plane sets (recall ``1-(1-p^k)^T``), the same
    OR-amplification as MinHash banding. Shape mirrors
    :func:`minhash_dedup_pairs`:

    1. one vectorized Arrow kernel computes all table buckets per vector
       (:func:`~gpssbzd_spark.dataprep.similarity.hyperplane_buckets_all`
       — one matmul per batch);
    2. the posexploded (table, bucket, id) rows — NARROW, no vectors —
       self-join per (table, bucket) and dedup to distinct candidate
       pairs, so the shuffle carries ids only;
    3. L2-normalized vectors join back onto the candidates and the
       native ``zip_with`` dot product verifies ``cos >= threshold`` —
       precision 1.0 vs the unblocked exact baseline by construction,
       LSH tuning affects recall only.

    Bucketing uses the RAW vectors (normalization never flips a sign),
    so the bucket kernel and the verify kernel can run in parallel
    branches of the same cached prep.
    """
    from gpssbzd_spark.dataprep.similarity import hyperplane_buckets_all

    buckets = hyperplane_buckets_all(dim, n_planes, n_tables, seed)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(F.col("_v"), F.lit(0.0), lambda acc, x: acc + x * x))
    prepped = (
        df.select(F.col(id_col), v.alias("_v"), buckets(F.col(vec_col)).alias("_bk"))
        .withColumn("_norm", norm)
        .filter(F.col("_norm") > 0)
        .select(
            id_col,
            F.transform("_v", lambda x: x / F.col("_norm")).alias("_u"),
            "_bk",
        )
        # GC-scoped pin (multi-branch consumer), not a session persist
        .localCheckpoint()
    )
    banded = prepped.select(
        F.col(id_col), F.posexplode("_bk").alias("tbl", "bucket")
    )
    a = banded.select(F.col(id_col).alias("id_a"), "tbl", "bucket")
    b = banded.select(F.col(id_col).alias("id_b"), "tbl", "bucket")
    cands = (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    u = prepped.select(F.col(id_col), F.col("_u"))
    dot = F.aggregate(
        F.zip_with("_u_a", "_u_b", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        cands.join(u.withColumnsRenamed({id_col: "id_a", "_u": "_u_a"}), "id_a")
        .join(u.withColumnsRenamed({id_col: "id_b", "_u": "_u_b"}), "id_b")
        .withColumn("cos_sim", dot)
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


# Per-chunk token budget for the simhash bit-vote kernel, plus the
# per-worker scratch buffers that make the kernel ALLOCATION-QUIET:
# PERF_NOTES #14 (the dd_simhash_near_pairs bimodal stall, VERDICT
# r12 #2) traced the 1.27 s ↔ 26.8 s same-session swings to
# first-touch population of >mmap-threshold anonymous mappings inside
# the sandbox — ~28 s of pure SYSTEM time (utime 0.3 s) for one
# ~150 MB (Σtokens × 64 int64) matrix, reproducible with numpy alone,
# and still 3-5 s per batch when "fixed" with per-chunk ~4 MB
# temporaries (every malloc ≥ the dynamic mmap threshold re-rolls the
# dice). The only robust shape is to stop talking to the allocator:
# every large intermediate lives in a module-level buffer allocated
# ONCE per worker process and reused across chunks AND calls, so the
# cost is paid once per worker lifetime instead of per batch. Also
# caps worker RSS at 100 TB batch sizes (working set is CHUNK-bounded
# regardless of Arrow batch size).
_SIMHASH_CHUNK_TOKENS = 1 << 16
_SIMHASH_SCRATCH: dict = {}


def _simhash_scratch(name: str, size: int, dtype) -> np.ndarray:
    """Per-worker reusable buffer: grows monotonically, never shrinks,
    never freed — the allocator is consulted at most a handful of
    times per worker lifetime (see the #14 note above). Historical
    name: since r14 this is the shared scratch arena for ALL the
    dedup kernels — simhash bit-votes AND the minhash permutation
    fold / rolling shingle hash / signature-agreement buffers
    (VERDICT r13 #4)."""
    buf = _SIMHASH_SCRATCH.get(name)
    if buf is None or buf.size < size or buf.dtype != np.dtype(dtype):
        buf = np.empty(max(size, _SIMHASH_CHUNK_TOKENS), dtype=dtype)
        _SIMHASH_SCRATCH[name] = buf
    return buf[:size]


@F.pandas_udf(T.LongType())
def _simhash64_udf(token_arrays: pd.Series) -> pd.Series:
    """64-bit SimHash over pre-hashed token arrays.

    Vectorized across the Arrow batch WITHOUT materializing the
    (Σtokens, 64) bit matrix and WITHOUT per-batch large allocations
    (the #14 stall class — see ``_SIMHASH_SCRATCH``): rows are
    processed in row-aligned chunks of ~``_SIMHASH_CHUNK_TOKENS``
    tokens; per chunk, each of the 64 bit lanes is extracted by
    ``right_shift``/``bitwise_and`` INTO a persistent scratch buffer
    and vote-summed by ``np.add.reduceat`` at the row offsets — no
    per-row Python loop over tokens (the per-row unpackbits/packbits
    version was the whole cost of the simhash stage at 50k docs).
    Votes accumulate in uint64 lanes of 0/1 — wrap-free for any real
    row length — and the majority compare runs signed; the uint8-
    reduceat wrap at 256 tokens and the pre-vectorization uint64-vote
    compare bug (``2s−n > 0`` wrapping for minority bits) are both
    pinned by the hypothesis parity test in
    tests/test_kernels_property.py."""
    n = len(token_arrays)
    if n == 0:
        return pd.Series([], dtype="int64")
    lens = np.fromiter(
        (0 if h is None else len(h) for h in token_arrays), dtype=np.int64, count=n
    )
    out = np.zeros(n, dtype=np.int64)
    nz = lens > 0
    if not nz.any():
        return pd.Series(out)
    nz_lens = lens[nz]
    n_rows = int(nz.sum())
    ends = np.cumsum(nz_lens)  # exclusive row end offsets
    starts = ends - nz_lens
    arrays = [
        np.asarray(h, dtype=np.int64)
        for h in token_arrays
        if h is not None and len(h)
    ]
    votes = _simhash_scratch("votes", n_rows * 64, np.uint64).reshape(
        n_rows, 64
    )
    row = 0
    while row < n_rows:
        # row-aligned chunk: at least one row, at most ~CHUNK tokens
        # (a single oversized row forms its own chunk — correctness
        # never splits a row's votes)
        hi = int(
            np.searchsorted(
                ends, starts[row] + _SIMHASH_CHUNK_TOKENS, side="left"
            )
        )
        hi = max(hi, row + 1)
        m = int(ends[hi - 1] - starts[row])
        flat = _simhash_scratch("flat", m, np.int64)
        np.concatenate(arrays[row:hi], out=flat)
        flat_u = flat.view(np.uint64)
        lane = _simhash_scratch("lane", m, np.uint64)
        offsets = starts[row:hi] - starts[row]
        for b in range(64):
            np.right_shift(flat_u, b, out=lane)
            np.bitwise_and(lane, 1, out=lane)
            # write lane b into the column unpackbits(MSB-first over
            # the little-endian byte view) used for hash bit b —
            # (b//8)*8 + 7 - b%8, an involution — so the packbits
            # pipeline below yields fingerprints bit-identical to the
            # pre-#14 kernel
            votes[row:hi, (b & ~7) + 7 - (b & 7)] = np.add.reduceat(
                lane, offsets
            )
        row = hi
    # majority: bit set iff 2·votes > row length. In-place on the
    # scratch (last use of the raw votes); the compare result and the
    # packed bytes are sub-MB allocations the arena absorbs.
    np.multiply(votes, 2, out=votes)
    sim_bits = votes > nz_lens.astype(np.uint64)[:, None]
    out[nz] = np.packbits(sim_bits, axis=1).view(np.int64).ravel()
    return pd.Series(out)


def simhash64(text_col: Column) -> Column:
    """SimHash of whitespace tokens: tokens hashed natively (xxhash64),
    bit-majority in one Arrow-batched pandas UDF."""
    toks = F.split(F.lower(F.trim(text_col)), r"\s+")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    return _simhash64_udf(hashes)


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit simhashes (native bit_count)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """SimHash near-duplicate pairs: (id_a, id_b, hamming) for every
    pair whose 64-bit simhashes differ in ≤ ``max_hamming`` bits.

    The pigeonhole construction (Manku/Jain/Sarma, WWW'07 shape): split
    the fingerprint into ``bands`` contiguous bit blocks — any pair
    within ``max_hamming < bands`` bit flips must agree EXACTLY on at
    least one block — so candidates come from ``bands`` equi-joins on
    (block_id, block_value) instead of an O(n²) comparison, and the
    exact ``bit_count(xor)`` verify keeps precision at 1.0. Everything
    after the one simhash kernel is native: block extraction is
    shiftright/mask arithmetic, the join is the only shuffle (keyed),
    dedup + verify are codegen'd.

    Token-less documents (empty/whitespace text) are EXCLUDED before
    banding — mirroring minhash's null-signature filter: every such doc
    gets simhash 0, so N of them alone would put N rows in the same
    (block, 0) bucket on all four bands and the candidate join would
    degenerate to O(N²) on content-free matches. The filter is native
    (no second kernel pass) and keeps the bucket-join linear; "empty
    equals empty" dedup belongs to exact dedup, not near-dup.
    """
    assert bands > max_hamming, "pigeonhole needs bands > max_hamming"
    width = 64 // bands
    mask = (1 << width) - 1
    has_tokens = F.trim(F.coalesce(F.col(text_col), F.lit(""))) != ""
    # r14 (guide §4.4/§2.4, profiled): ``sh`` feeds BOTH sides of the
    # band self-join, and without pinning the plan duplicated the whole
    # kernel subtree per side (4 ArrowEvalPython chains re-hashing the
    # corpus). Widen first so the one kernel pass runs at session
    # parallelism (single-row-group inputs scan as 1-2 splits), then
    # pin the 16-byte (id, fingerprint) rows — the decision proxy is
    # what both join sides re-read (guide §8 shape).
    from gpssbzd_spark.sources.tables import widen_small_input

    sh = (
        widen_small_input(df.filter(has_tokens), key=id_col)
        .select(F.col(id_col), simhash64(F.col(text_col)).alias("_sh"))
        .localCheckpoint()
    )
    blocks = F.array(
        *[
            F.struct(
                F.lit(i).alias("block"),
                F.shiftrightunsigned("_sh", i * width)
                .bitwiseAND(F.lit(mask))
                .alias("val"),
            )
            for i in range(bands)
        ]
    )
    banded = sh.select(
        F.col(id_col), F.col("_sh"), F.explode(blocks).alias("_b")
    ).select(
        id_col, "_sh", F.col("_b.block").alias("block"), F.col("_b.val").alias("val")
    )
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("_sh").alias("_sh_a"), "block", "val"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("_sh").alias("_sh_b"), "block", "val"
    )
    # hamming filter BEFORE the dedup: the verify is a cheap native
    # bit_count on rows already in hand, while distinct() is a shuffle —
    # filtering first shrinks that shuffle from every banded candidate
    # (most of which fail the threshold) to just the true near-pairs
    return (
        a.join(b, ["block", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", hamming64(F.col("_sh_a"), F.col("_sh_b")).alias("hamming")
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# Engine-portable MinHash-LSH (full-oracle variant)
# ---------------------------------------------------------------------------

def _portable_tokens(col: Column) -> Column:
    return F.filter(
        F.split(F.lower(F.trim(col)), r"\s+"), lambda x: x != ""
    )


def _portable_shingles(col: Column, n: int = 3) -> Column:
    """Distinct lowercase word n-gram shingles (Broder's original
    document-resemblance unit), natively; <n tokens → empty array.

    Built as the element-wise concat of ``n`` SHIFTED SLICES of the
    token array (``zip_with`` chain), not as
    ``transform(indices, i -> concat(element_at(toks, i+j)...))``:
    lambda bodies embed their argument expressions and higher-order
    functions block subexpression elimination, so the element_at form
    re-evaluates the whole split+filter tokenization per gram PER
    POSITION — O(tokens²·n) per document, measured 13.8s for 5000
    300-char docs at sf0.1 vs ~0.5s for this formulation (same trick
    as text.doc_fingerprint_native's sliding minima)."""
    toks = _portable_tokens(col)
    cnt = F.size(toks)
    length = F.greatest(cnt - (n - 1), F.lit(0))
    shifted = [F.slice(toks, 1 + j, length) for j in range(n)]
    grams = shifted[0]
    for s in shifted[1:]:
        grams = F.zip_with(grams, s, lambda a, b: F.concat(a, F.lit(" "), b))
    # NULL text → empty array (slices of a NULL array are NULL; the old
    # formulation returned [] and callers filter on size(sh) > 0)
    return F.coalesce(F.array_distinct(grams), F.array().cast("array<string>"))


def minhash_lsh_portable(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash-LSH near-dup pairs with an ENGINE-PORTABLE hash family —
    the fully-oracled twin of :func:`minhash_dedup_pairs`.

    The production kernel's multiply-shift / xxhash64 permutations have
    no DuckDB equivalent, so that path is checkable only rows-only.
    This variant draws each permutation as ``min over shingles of
    substr(md5('mh<i>|' || shingle), 1, 8)`` — md5 is bit-identical in
    every engine and a fixed-width hex prefix under lexicographic min
    is a uniform keyed hash — so the ENTIRE pipeline (shingling →
    signatures → banding → candidate join → exact-Jaccard verify) can
    be replayed by the DuckDB oracle and hash-compared
    (:func:`minhash_lsh_portable_sql` builds the identical SQL).

    Same algorithm and plan shape as the kernel path: banded equi-join
    on concatenated signature rows (never all-pairs), candidate pairs
    deduped BEFORE the shingle arrays are re-attached (two hash joins
    by id, so the arrays ship once per verified pair, not once per
    band collision). md5-per-shingle is ~5-10× the kernel's cost — use
    the kernel on the 100 TB hot path; this variant is the correctness
    cross-check and the fallback where Python workers are unavailable.
    """
    assert num_hashes % bands == 0, (num_hashes, bands)
    rows_per_band = num_hashes // bands
    # r14 (guide §2, profiled): the shingle tokenization pin and the
    # exploded-md5 signature map both inherited the scan's 1-split
    # layout (1.5 s + 1.8 s single-task stages at sf0.1); floor the
    # partition count before the per-doc work — no-op on wide inputs
    from gpssbzd_spark.sources.tables import widen_small_input

    df = widen_small_input(df, key=id_col)
    docs = (
        df.select(
            F.col(id_col),
            _portable_shingles(F.col(text_col), shingle_n).alias("sh"),
        )
        # consumed three times (signatures + both verify sides); without
        # pinning, CollapseProject inlines the shingle expression into
        # all consumers and the tokenization runs 3x (8x pre-optimizer
        # for the per-permutation signature projections).
        # localCheckpoint, not persist: a persist here is registered in
        # the session CacheManager and outlives the query (the ADVICE
        # r5 leak class); the checkpointed RDD is released by the
        # ContextCleaner once the result is garbage-collected.
        # r14: the shingle-less filter moved BELOW this pin — as a
        # filter on a derived column it was pushed under the widening
        # exchange, re-running the tokenization single-task on the
        # scan layout (profiled 1.1 s); the pin is the pushdown fence,
        # and size() on materialized arrays is trivial
        .localCheckpoint()
        .filter(F.size("sh") > 0)
    )
    # signatures via explode + min-AGGREGATE, not array_min(transform):
    # higher-order lambdas run interpreted (no codegen), so 8 transforms
    # put num_hashes interpreted md5 evaluations on every shingle —
    # measured ~6s of the portable pipeline's 8.5s at sf0.1. Exploded,
    # the same md5s compile into whole-stage codegen and the mins
    # partial-aggregate map-side; the shuffle carries one signature row
    # per doc. Values are identical (min over rows == min over array),
    # so the SQL twin is untouched.
    ex = docs.select(F.col(id_col), F.explode("sh").alias("s"))
    sig = [
        F.min(
            F.substring(
                F.md5(F.concat(F.lit(f"mh{i}|"), F.col("s")).cast("binary")), 1, 8
            )
        ).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sigs = ex.groupBy(id_col).agg(*sig)
    band_vals = F.array(
        *[
            F.concat_ws(
                "",
                *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)],
            )
            for b in range(bands)
        ]
    )
    banded = sigs.select(
        id_col, F.posexplode(band_vals).alias("band_idx", "band_val")
    )
    cand = (
        banded.alias("l")
        .join(banded.alias("r"), ["band_idx", "band_val"])
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    a = docs.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = docs.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = cand.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter.cast("double") / union
    return (
        pairs.filter(jac >= threshold)
        .select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
    )


def minhash_lsh_portable_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> str:
    """DuckDB twin of :func:`minhash_lsh_portable` — the identical
    pipeline, built from the same parameters."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    toks = (
        f"list_filter(regexp_split_to_array(lower(trim({text_col})), '\\s+'),"
        f" x -> x <> '')"
    )
    gram = " || ' ' || ".join(f"t[i + {j}]" for j in range(shingle_n))
    sh = (
        f"list_distinct(list_transform("
        f"generate_series(1, len(t) - {shingle_n - 1}), i -> {gram}))"
    )
    hashes = ", ".join(
        f"list_aggregate(list_transform(sh, s -> substr(md5('mh{i}|' || s), 1, 8)),"
        f" 'min') AS h{i}"
        for i in range(num_hashes)
    )
    band_exprs = ", ".join(
        "(" + " || ".join(f"h{b * rows_per_band + r}" for r in range(rows_per_band))
        + f") AS b{b}"
        for b in range(bands)
    )
    long_union = " UNION ALL ".join(
        f"SELECT {id_col}, {b} AS band_idx, b{b} AS band_val FROM bands"
        for b in range(bands)
    )
    return f"""
    WITH tok AS (
      SELECT {id_col}, {toks} AS t FROM {table} WHERE {text_col} IS NOT NULL
    ), docs AS (
      SELECT {id_col}, {sh} AS sh FROM tok WHERE len(t) >= {shingle_n}
    ), sigs AS (
      SELECT {id_col}, {hashes} FROM docs
    ), bands AS (
      SELECT {id_col}, {band_exprs} FROM sigs
    ), banded AS ({long_union}
    ), cand AS (
      SELECT DISTINCT l.{id_col} AS id_a, r.{id_col} AS id_b
      FROM banded l JOIN banded r USING (band_idx, band_val)
      WHERE l.{id_col} < r.{id_col}
    ), pairs AS (
      SELECT id_a, id_b, a.sh AS sh_a, b.sh AS sh_b
      FROM cand JOIN docs a ON a.{id_col} = cand.id_a
                JOIN docs b ON b.{id_col} = cand.id_b
    )
    SELECT id_a, id_b,
           ROUND(CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
                 / (len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b))),
                 4) AS jaccard
    FROM pairs
    WHERE CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
          / (len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b)))
          >= {threshold}
    """


def minhash_signatures_portable(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-document portable MinHash signature rows ``(id, h0..h{n-1})``
    — the PERSISTABLE index unit for incremental dedup (write these to
    parquet once; daily deltas band-join against them without
    re-signing the corpus). Same md5-hex-prefix-under-min hash family
    as :func:`minhash_lsh_portable`, same explode + min-aggregate plan
    (codegen'd md5s, map-side partial mins, one signature row per doc
    through the shuffle). Shingle-less docs drop out, as in the pair
    pipeline.

    r14: same partition-count floor as :func:`minhash_lsh_portable` —
    the shingle+md5 signature map is the expensive narrow chain."""
    from gpssbzd_spark.sources.tables import widen_small_input

    df = widen_small_input(df, key=id_col)
    # no explicit shingle-less filter: ``explode`` of an empty array
    # emits no rows, so the filter was semantically redundant — and as
    # a predicate on a derived column it was PUSHED below the widening
    # exchange, re-running the tokenization single-task (r14, the
    # minhash_lsh_portable pushdown trap)
    ex = df.select(
        F.col(id_col),
        F.explode(_portable_shingles(F.col(text_col), shingle_n)).alias("s"),
    )
    sig = [
        F.min(
            F.substring(
                F.md5(F.concat(F.lit(f"mh{i}|"), F.col("s")).cast("binary")),
                1,
                8,
            )
        ).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return ex.groupBy(id_col).agg(*sig)


def _minhash_bands(
    sigs: DataFrame, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    """(id, band_idx, band_val) rows from signature rows — band value =
    the concatenated hex mins of the band's rows, exactly as the pair
    pipeline concatenates them."""
    assert num_hashes % bands == 0, (num_hashes, bands)
    rows_per_band = num_hashes // bands
    band_vals = F.array(
        *[
            F.concat_ws(
                "",
                *[
                    F.col(f"h{b * rows_per_band + r}")
                    for r in range(rows_per_band)
                ],
            )
            for b in range(bands)
        ]
    )
    return sigs.select(
        id_col, F.posexplode(band_vals).alias("band_idx", "band_val")
    )


def incremental_neardup_matches(
    delta_sigs: DataFrame,
    index_sigs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    min_agree: int = 6,
) -> DataFrame:
    """Incremental near-dup check: match a DELTA's signature rows
    against a persisted historical signature INDEX →
    ``(delta_id, index_id, n_agree)`` for every candidate pair whose
    signature agreement clears ``min_agree``.

    This is the ingest-time sibling of the batch pair pipeline (and of
    the persisted-IVF ANN path): the corpus is signed ONCE
    (:func:`minhash_signatures_portable`, stored as one narrow parquet
    row per doc), and each daily delta only signs itself, band-joins
    against the stored bands, and verifies candidates by SIGNATURE
    AGREEMENT — ``n_agree/num_hashes`` is the standard unbiased
    estimate of Jaccard (E[agree_i] = J per permutation), the verify a
    signature-only index can do without storing corpus-sized shingle
    sets. Estimator quality vs exact Jaccard is pytest-pinned; at
    ``num_hashes=8, min_agree=6`` the check targets J ≳ 0.75. Both
    sides use the md5-portable family, so a DuckDB oracle replays the
    whole path (:func:`incremental_neardup_sql`).

    Scale shape: delta bands broadcast-or-shuffle-join the index bands
    on (band_idx, band_val) — never all-pairs, the index never
    re-signs; candidate pairs dedupe BEFORE the signature columns
    re-attach (two hash joins by id)."""
    db = _minhash_bands(delta_sigs, id_col, num_hashes, bands).select(
        F.col(id_col).alias("delta_id"), "band_idx", "band_val"
    )
    ib = _minhash_bands(index_sigs, id_col, num_hashes, bands).select(
        F.col(id_col).alias("index_id"), "band_idx", "band_val"
    )
    cand = db.join(ib, ["band_idx", "band_val"]).select(
        "delta_id", "index_id"
    ).distinct()
    da = delta_sigs.select(
        F.col(id_col).alias("delta_id"),
        *[F.col(f"h{i}").alias(f"da{i}") for i in range(num_hashes)],
    )
    ia = index_sigs.select(
        F.col(id_col).alias("index_id"),
        *[F.col(f"h{i}").alias(f"ia{i}") for i in range(num_hashes)],
    )
    n_agree = sum(
        F.when(F.col(f"da{i}") == F.col(f"ia{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    ).cast("bigint")
    return (
        cand.join(da, "delta_id")
        .join(ia, "index_id")
        .select("delta_id", "index_id", n_agree.alias("n_agree"))
        .filter(F.col("n_agree") >= min_agree)
    )


def minhash_signatures_rowlocal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Row-local (aggregation-free) twin of
    :func:`minhash_signatures_portable` — STREAMING-SAFE: each
    permutation's min is ``array_min(transform(sh, ...))`` computed
    inside the row, so signing runs stateless in an append-mode
    micro-batch (the explode + groupBy form is a stateful aggregation
    a stream cannot run without watermark gymnastics). Interpreted
    higher-order lambdas cost ~8× the batch signer's codegen'd explode
    (the measured trade documented in :func:`minhash_lsh_portable`) —
    per-micro-batch delta volumes make that the right price; the batch
    index is still built with the exploded signer. Signature VALUES
    are identical (min over the array == min over its exploded rows),
    so streams verify against the same persisted index. Keeps all
    input columns and appends h0..h{n-1}; shingle-less docs drop."""
    sh = _portable_shingles(F.col(text_col), shingle_n)
    out = df.withColumn("_sh", sh).filter(F.size("_sh") > 0)

    def perm_hash(i: int):
        # a closure factory, NOT `lambda s, i=i`: pyspark dispatches
        # higher-order lambdas on ARITY, so a two-arg lambda would
        # receive the array INDEX as its second argument and silently
        # shadow the permutation constant
        prefix = f"mh{i}|"
        return lambda s: F.substring(
            F.md5(F.concat(F.lit(prefix), s).cast("binary")), 1, 8
        )

    for i in range(num_hashes):
        out = out.withColumn(
            f"h{i}", F.array_min(F.transform(F.col("_sh"), perm_hash(i)))
        )
    return out.drop("_sh")


def incremental_neardup_flags_stateless(
    docs: DataFrame,
    index_sigs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    min_agree: int = 6,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Streaming-safe incremental near-dup MATCH EVENTS: sign ``docs``
    row-locally, band-explode, stream-static join the persisted index
    bands and signature rows, and emit
    ``(delta_id, [carry_cols...,] index_id, n_agree)`` for every
    (doc, index doc, matching band) whose signature agreement clears
    ``min_agree``. NO distinct and NO aggregation anywhere — a pair
    matching k bands emits k rows, and callers collapse them with
    ``dropDuplicates`` (batch) or
    :func:`~gpssbzd_spark.streaming.windows.dedup_within_watermark`
    (stream) — so the whole plan is append-mode legal: the only
    stateful operator is the caller's bounded dedup. The index side is
    static (signed once by :func:`minhash_signatures_portable`, read
    from parquet) and broadcast-eligible per micro-batch."""
    sigs = minhash_signatures_rowlocal(
        docs, text_col, id_col, num_hashes, shingle_n=3
    )
    rows_per_band = num_hashes // bands
    band_vals = F.array(
        *[
            F.concat_ws(
                "",
                *[
                    F.col(f"h{b * rows_per_band + r}")
                    for r in range(rows_per_band)
                ],
            )
            for b in range(bands)
        ]
    )
    db = sigs.select(
        F.col(id_col).alias("delta_id"),
        *carry_cols,
        *[F.col(f"h{i}").alias(f"da{i}") for i in range(num_hashes)],
        F.posexplode(band_vals).alias("band_idx", "band_val"),
    )
    ib = _minhash_bands(index_sigs, id_col, num_hashes, bands).select(
        F.col(id_col).alias("index_id"), "band_idx", "band_val"
    )
    ia = index_sigs.select(
        F.col(id_col).alias("index_id"),
        *[F.col(f"h{i}").alias(f"ia{i}") for i in range(num_hashes)],
    )
    n_agree = sum(
        F.when(F.col(f"da{i}") == F.col(f"ia{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    ).cast("bigint")
    return (
        db.join(ib, ["band_idx", "band_val"])
        .join(ia, "index_id")
        .select(
            "delta_id",
            *carry_cols,
            "index_id",
            n_agree.alias("n_agree"),
        )
        .filter(F.col("n_agree") >= min_agree)
    )


def _minhash_sigs_sql(
    source_sql: str,
    text_col: str,
    id_col: str,
    num_hashes: int,
    shingle_n: int,
) -> str:
    """DuckDB CTE body: signature rows of ``source_sql`` (a relation
    with ``id_col``/``text_col``), twin of
    :func:`minhash_signatures_portable`."""
    toks = (
        f"list_filter(regexp_split_to_array(lower(trim({text_col})), '\\s+'),"
        f" x -> x <> '')"
    )
    gram = " || ' ' || ".join(f"t[i + {j}]" for j in range(shingle_n))
    sh = (
        f"list_distinct(list_transform("
        f"generate_series(1, len(t) - {shingle_n - 1}), i -> {gram}))"
    )
    hashes = ", ".join(
        f"list_aggregate(list_transform(sh, s -> "
        f"substr(md5('mh{i}|' || s), 1, 8)), 'min') AS h{i}"
        for i in range(num_hashes)
    )
    return f"""
      SELECT {id_col}, {hashes} FROM (
        SELECT {id_col}, {sh} AS sh FROM (
          SELECT {id_col}, {toks} AS t FROM ({source_sql})
          WHERE {text_col} IS NOT NULL
        ) WHERE len(t) >= {shingle_n}
      ) WHERE len(sh) > 0
    """


def incremental_neardup_sql(
    index_sql: str,
    delta_sql: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    min_agree: int = 6,
) -> str:
    """DuckDB twin of sign-index + sign-delta +
    :func:`incremental_neardup_matches` — the identical banding and
    agreement arithmetic over the identical md5 family."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands

    def bands_sql(src: str) -> str:
        unions = " UNION ALL ".join(
            f"SELECT {id_col}, {b} AS band_idx, "
            + " || ".join(
                f"h{b * rows_per_band + r}" for r in range(rows_per_band)
            )
            + f" AS band_val FROM {src}"
            for b in range(bands)
        )
        return unions

    agree = " + ".join(
        f"(CASE WHEN da.h{i} = ia.h{i} THEN 1 ELSE 0 END)"
        for i in range(num_hashes)
    )
    return f"""
    WITH isigs AS ({_minhash_sigs_sql(index_sql, text_col, id_col,
                                      num_hashes, shingle_n)}),
    dsigs AS ({_minhash_sigs_sql(delta_sql, text_col, id_col,
                                 num_hashes, shingle_n)}),
    ibands AS ({bands_sql('isigs')}),
    dbands AS ({bands_sql('dsigs')}),
    cand AS (
      SELECT DISTINCT d.{id_col} AS delta_id, i.{id_col} AS index_id
      FROM dbands d JOIN ibands i USING (band_idx, band_val)
    )
    SELECT delta_id, index_id,
           CAST({agree} AS BIGINT) AS n_agree
    FROM cand
    JOIN dsigs da ON da.{id_col} = cand.delta_id
    JOIN isigs ia ON ia.{id_col} = cand.index_id
    WHERE {agree} >= {min_agree}
    """


def _simhash_lane_params(bits: int, bands: int, max_hamming: int):
    """Shared parameter validation for the portable SimHash pair:
    ``bits`` must split into 32-bit md5 lanes, ``bands`` into equal
    bit-slices aligned to lanes, and the pigeonhole cover must hold."""
    assert bits in (64, 128), bits
    n_lanes = bits // 32
    assert bands % n_lanes == 0 and 32 % (bands // n_lanes) == 0, (
        bits, bands,
    )
    assert max_hamming <= bands - 1, "pigeonhole cover needs hamming < bands"
    bands_per_lane = bands // n_lanes
    bits_per_band = 32 // bands_per_lane
    return n_lanes, bands_per_lane, bits_per_band


def _simhash_portable_sigs(
    df: DataFrame, text_col: str, id_col: str, n_lanes: int
) -> DataFrame:
    """Per-document packed SimHash lane signatures (id, sig0..sigN) for
    the portable md5 family — the signature KERNEL of
    :func:`simhash_portable`, exposed un-checkpointed so the plan gate
    can assert it stays inside whole-stage codegen.

    Tokens carry multiplicity (like the kernel path's simhash64):
    term-frequency-weighted votes separate template-heavy docs that
    share most of their VOCABULARY but not their token distribution —
    set-based votes collide essentially the whole fixture corpus.

    Shape (PERF_NOTES #12): one row per (token row, LANE), then the
    per-bit vote sums group by (id, lane) with 32 aggregate fields per
    codegen unit — NOT by id with n_lanes·32 fields. At 128 bits the
    flat form's 128 sums exceed ``spark.sql.codegen.maxFields`` (100)
    and knocked the ENTIRE signature stage off whole-stage codegen
    into interpreted eval (zero codegen spans; measured as the
    dd_simhash_portable128_pairs idle-min elevation, 4.5 → 6.2 s on
    unchanged code, because interpreted-eval throughput rides JIT
    warmth). The lane explosion keeps every unit at 32 sums, and the
    per-lane packed signatures reassemble in a second, n_lanes-field
    aggregate. Identical signatures by construction — the DuckDB
    oracle replays the flat form and still hash-matches."""
    toks = df.select(
        F.col(id_col),
        F.explode(_portable_tokens(F.col(text_col))).alias("token"),
    )
    h = F.md5(F.concat(F.lit("sh|"), F.col("token")).cast("binary"))
    lane_vals = F.array(
        *[
            F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("bigint")
            for i in range(n_lanes)
        ]
    )
    votes = toks.select(
        id_col, F.posexplode(lane_vals).alias("_lane", "_v")
    )

    def vote_sum(j: int) -> Column:
        bit = F.shiftright(F.col("_v"), j).bitwiseAND(F.lit(1))
        return F.sum(F.when(bit == 1, 1).otherwise(-1)).alias(f"s{j}")

    lane_sums = votes.groupBy(id_col, "_lane").agg(
        *[vote_sum(j) for j in range(32)]
    )
    # strict majority like the kernel (votes*2 > n): ties -> 0
    packed = None
    for j in range(32):
        bit = (
            F.when(F.col(f"s{j}") > 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
        )
        term = F.shiftleft(bit, j)
        packed = term if packed is None else packed + term
    lane_sigs = lane_sums.select(id_col, "_lane", packed.alias("_sig"))
    return lane_sigs.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("_lane") == i, F.col("_sig"))).alias(
                f"sig{i}"
            )
            for i in range(n_lanes)
        ]
    )


def simhash_portable(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 4,
    max_hamming: int = 3,
    bits: int = 64,
) -> DataFrame:
    """``bits``-wide (64 or 128) SimHash near-dup pairs with an
    ENGINE-PORTABLE hash family — the fully-oracled twin of
    :func:`simhash_near_pairs` (whose vectorized kernel family is
    numpy-specific, hence rows-only).

    Per distinct token, the hash is taken as ``bits/32`` 32-bit lanes
    of the md5 hex digest (hex->int via ``conv``/`'0x'||` cast, both
    engines bit-identical; a single signed 64-bit parse could overflow
    on a high bit, 32-bit lanes cannot; one md5 IS 128 bits, so even
    ``bits=128`` needs a single digest per token). Per document, the
    classic Charikar bit-majority: bit j is 1 iff the +1/-1 votes of
    its tokens' j-th bits sum >= 0. Banding is pigeonhole on ``bands``
    equal bit-slices across the lanes, so every pair within
    ``max_hamming <= bands - 1`` is guaranteed a colliding band
    (complete cover, same argument as the kernel path); candidates are
    verified with ``bit_count(xor)`` summed over the lanes. One
    explode + one grouped aggregation + banded equi-joins — no
    all-pairs stage, no Python worker. Token-less docs drop out at the
    explode (the kernel path's degenerate-bucket guard, inherited for
    free). 64 bits matters on a template-heavy corpus: at 32 bits the
    shared-boilerplate majority vote collides essentially everything
    (observed ~18% of ALL pairs under hamming<=3 on the fixture).

    ``bands`` should be the MINIMUM the pigeonhole cover allows
    (``max_hamming + 1``, rounded up to a lane-aligned divisor): the
    verify step makes the output identical for ANY covering band
    count, but spurious candidates scale as
    ``bands * n^2 / 2^(bits/bands)`` — fixed band space is the one
    quadratic term in this pipeline. Measured on the K=64 inflation
    (320k docs, sf0.1): bands=8 at 64 bits (8-bit values, 256-way
    space) hit 441 s with 2 GiB page-allocation stalls in the
    candidate ``distinct``; bands=4 (16-bit values, 65536-way space)
    removes ~512x of the spurious population at the same guaranteed
    recall — the same grow-the-bucket-space-with-the-corpus rule the
    hyperplane-LSH family documents. ``bits=128`` (bands=4 → 32-bit
    band values, ~4.3e9-way space) is the 1e9+-doc mitigation that
    note promises: random-fingerprint collisions stay negligible past
    the 64-bit asymptote.

    :func:`simhash_portable_sql` replays the identical pipeline in
    DuckDB for the cross-engine hash comparison.
    """
    n_lanes, bands_per_lane, bits_per_band = _simhash_lane_params(
        bits, bands, max_hamming
    )
    # one row per doc, n_lanes+1 scalars — but consumed three times
    # (banding + both verify sides), and each consumer would otherwise
    # re-run the token explode + per-bit-sum groupBy upstream (measured
    # 23.5s → 4.5s at sf0.1): the repo's pin-iteratively-reused-inputs
    # rule, GC-scoped via localCheckpoint rather than a session persist
    sigs = _simhash_portable_sigs(df, text_col, id_col, n_lanes).localCheckpoint()
    mask = (1 << bits_per_band) - 1
    band_vals = F.array(
        *[
            F.shiftright(F.col(f"sig{i}"), b * bits_per_band).bitwiseAND(
                F.lit(mask)
            )
            for i in range(n_lanes)
            for b in range(bands_per_lane)
        ]
    )
    banded = sigs.select(
        id_col, F.posexplode(band_vals).alias("band_idx", "band_val")
    )
    cand = (
        banded.alias("l")
        .join(banded.alias("r"), ["band_idx", "band_val"])
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    a = sigs.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"sig{i}").alias(f"sa{i}") for i in range(n_lanes)],
    )
    b = sigs.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"sig{i}").alias(f"sb{i}") for i in range(n_lanes)],
    )
    ham = sum(
        F.bit_count(F.col(f"sa{i}").bitwiseXOR(F.col(f"sb{i}")))
        for i in range(n_lanes)
    ).cast("bigint")
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_portable_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 4,
    max_hamming: int = 3,
    bits: int = 64,
) -> str:
    """DuckDB twin of :func:`simhash_portable`, same parameters."""
    n_lanes, bands_per_lane, bits_per_band = _simhash_lane_params(
        bits, bands, max_hamming
    )
    mask = (1 << bits_per_band) - 1
    hv_exprs = ", ".join(
        f"CAST('0x' || substr(md5('sh|' || token), {1 + 8 * i}, 8) "
        f"AS BIGINT) AS v{i}"
        for i in range(n_lanes)
    )
    sums = ", ".join(
        f"SUM(CASE WHEN (v{i} >> {j}) & 1 = 1 THEN 1 ELSE -1 END)"
        f" AS s{i}_{j}"
        for i in range(n_lanes)
        for j in range(32)
    )

    def pack(i: int) -> str:
        return " + ".join(
            f"(CASE WHEN s{i}_{j} > 0 THEN CAST(1 AS BIGINT) ELSE 0 END"
            f" << {j})"
            for j in range(32)
        )

    sig_exprs = ", ".join(
        f"{pack(i)} AS sig{i}" for i in range(n_lanes)
    )
    band_exprs = ", ".join(
        f"(sig{i} >> {b * bits_per_band}) & {mask}"
        f" AS b{i * bands_per_lane + b}"
        for i in range(n_lanes)
        for b in range(bands_per_lane)
    )
    long_union = " UNION ALL ".join(
        f"SELECT {id_col}, {b} AS band_idx, b{b} AS band_val FROM bander"
        for b in range(n_lanes * bands_per_lane)
    )
    ham = " + ".join(
        f"bit_count(xor(a.sig{i}, b.sig{i}))" for i in range(n_lanes)
    )
    return f"""
    WITH tok AS (
      SELECT {id_col},
             unnest(list_filter(
               regexp_split_to_array(lower(trim({text_col})), '\\s+'),
               x -> x <> '')) AS token
      FROM {table} WHERE {text_col} IS NOT NULL
    ), hv AS (
      SELECT {id_col}, {hv_exprs}
      FROM tok
    ), sums AS (
      SELECT {id_col}, {sums} FROM hv GROUP BY {id_col}
    ), sigs AS (
      SELECT {id_col}, {sig_exprs} FROM sums
    ), bander AS (
      SELECT {id_col}, {band_exprs} FROM sigs
    ), banded AS ({long_union}
    ), cand AS (
      SELECT DISTINCT l.{id_col} AS id_a, r.{id_col} AS id_b
      FROM banded l JOIN banded r USING (band_idx, band_val)
      WHERE l.{id_col} < r.{id_col}
    )
    SELECT id_a, id_b,
           CAST({ham} AS BIGINT) AS hamming
    FROM cand JOIN sigs a ON a.{id_col} = cand.id_a
              JOIN sigs b ON b.{id_col} = cand.id_b
    WHERE {ham} <= {max_hamming}
    """


def _rademacher_signs(
    n_tables: int, n_planes: int, dim: int
) -> list[tuple[int, int, list[int]]]:
    """(table, plane, ±1-vector) triples, deterministically from md5 —
    computable identically in any language, so the Spark side and the
    SQL oracle embed the SAME literals. Rademacher hyperplanes are a
    standard sign-LSH family (Achlioptas-style ±1 projections preserve
    angles like Gaussian ones)."""
    import hashlib

    out = []
    for t in range(n_tables):
        for p in range(n_planes):
            digest = hashlib.md5(f"pl|{t}|{p}".encode()).digest()
            # extend deterministically past 128 bits by re-hashing
            bits: list[int] = []
            block = digest
            while len(bits) < dim:
                for byte in block:
                    for k in range(8):
                        bits.append(1 if (byte >> k) & 1 else -1)
                block = hashlib.md5(block).digest()
            out.append((t, p, bits[:dim]))
    return out


def embedding_lsh_portable(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.4,
    n_planes: int = 6,
    n_tables: int = 8,
    scale: int = 1000,
) -> DataFrame:
    """OR-amplified sign-LSH embedding near-dup pairs with EXACT
    cross-engine arithmetic — the fully-oracled twin of
    :func:`embedding_lsh_pairs` (whose numpy Gaussian planes and
    matmul-order float sums no other engine can replay bit-for-bit).

    Two moves make every stage integer-exact and therefore
    hash-comparable:

    - embeddings quantize to ``round(x·scale)`` BIGINTs once — dot
      products and norms over ints are order-independent and identical
      in any engine (float summation order is not);
    - hyperplanes are ±1 Rademacher vectors derived from md5
      (:func:`_rademacher_signs`), embedded as LITERALS on both sides.

    The pipeline is the relational mirror of the kernel path: a tiny
    planes table (n_tables·n_planes rows) cross-joins the quantized
    vectors (a broadcast, vectors scan once), per-(id, table) bucket =
    the bit-packed dot signs, candidates self-join per (table, bucket),
    and the verify is exact cosine ON THE QUANTIZED ints ≥ threshold.
    Precision 1.0 w.r.t. the quantized cosine by construction; the
    quantization itself perturbs cosine by O(1/scale) — at scale=1000
    that is ±~0.002, documented as this variant's contract. Kernel path
    stays the hot path; this is the cross-check and fallback.
    """
    from gpssbzd_spark.sources.tables import local_rows

    spark = df.sparkSession
    # bit precomputed in Python: shiftleft needs a literal count, and a
    # plain column is cheaper than a CASE over p anyway
    planes = local_rows(
        spark,
        [(t, p, 1 << p, sgn) for t, p, sgn in
         _rademacher_signs(n_tables, n_planes, dim)],
        "t int, p int, bit long, sgn array<bigint>",
    )
    q = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * scale).cast("bigint"),
    )
    sq_norm = F.aggregate(
        F.col("q"), F.lit(0).cast("bigint"), lambda acc, x: acc + x * x
    )
    # r14 (guide §2): widen before the pin — the quantize chain and all
    # three consumers otherwise inherit the 1-2-split scan layout
    # (profiled: the banding + verify stages ran 2 of 32 tasks at
    # sf0.1); no-op on wide inputs
    from gpssbzd_spark.sources.tables import widen_small_input

    # consumed three times (plane dots + both verify sides); pin or
    # each consumer re-quantizes every vector (GC-scoped). The filter
    # sits ABOVE the pin: below it, Catalyst would push the _sq
    # predicate (and the quantize chain it needs) back under the widen
    # exchange and evaluate it on the narrow scan layout — the same
    # pushdown fence the portable minhash paths need.
    vecs = (
        widen_small_input(df.select(F.col(id_col).alias("_id"), q.alias("q")), key="_id")
        .withColumn("_sq", sq_norm)
        .localCheckpoint()
        .filter(F.col("_sq") > 0)
    )
    dot_plane = F.aggregate(
        F.zip_with("q", "sgn", lambda a, s: a * s),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    dots = vecs.join(F.broadcast(planes)).select(
        "_id", "t", "bit", dot_plane.alias("d")
    )
    bucket_bit = F.when(F.col("d") >= 0, F.col("bit")).otherwise(
        F.lit(0).cast("bigint")
    )
    buckets = dots.groupBy("_id", "t").agg(F.sum(bucket_bit).alias("bucket"))
    cand = (
        buckets.alias("l")
        .join(buckets.alias("r"), ["t", "bucket"])
        .filter(F.col("l._id") < F.col("r._id"))
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )
    a = vecs.select(
        F.col("_id").alias("id_a"), F.col("q").alias("qa"), F.col("_sq").alias("sa")
    )
    b = vecs.select(
        F.col("_id").alias("id_b"), F.col("q").alias("qb"), F.col("_sq").alias("sb")
    )
    dot_ab = F.aggregate(
        F.zip_with("qa", "qb", lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    cos = dot_ab.cast("double") / (
        F.sqrt(F.col("sa").cast("double")) * F.sqrt(F.col("sb").cast("double"))
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("cos_sim", cos)
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", F.round("cos_sim", 4).alias("cos_sim"))
    )


# ---------------------------------------------------------------------------
# Near-dup cluster canonicalization (fuzzy dedup, full pipeline)
# ---------------------------------------------------------------------------

def _node_key(col: Column) -> Column:
    """Fixed-width node key: lpad to 20 chars so lexicographic order
    equals numeric order for non-negative integer ids (the min-label
    component rep is then the min NUMERIC id, not '10' < '9')."""
    return F.lpad(col.cast("string"), 20, "0")


def neardup_clusters(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Cluster-level fuzzy dedup: connected components over a near-dup
    pair graph → ``(doc_id, cluster_rep, cluster_size)`` for every doc
    in some cluster (size ≥ 2 by construction; untouched docs are
    implicitly their own singleton).

    This is the step production pipelines (e.g. the fuzzy-dedup stage
    described in the RefinedWeb and SlimPajama reports) run AFTER
    pairwise MinHash/SimHash: near-duplication is transitive in intent
    (A≈B, B≈C ⇒ one family), so survivors must be chosen per connected
    component, not per pair — pairwise keep-min would let B delete C
    while A deletes B, keeping {A} but dropping a family member no
    surviving doc is near. Rep = min id in the component.

    Scale: the pair graph is bounded by actual near-duplication, orders
    of magnitude smaller than the corpus; components are labeled by the
    size-routed machinery of :func:`~gpssbzd_spark.plans.components.
    connected_components` (driver union-find under the cap, hash-min +
    path-halving dataflow loop past it — no size wall). Ids must be
    non-negative integers (or fixed-width strings); see
    :func:`_node_key`.
    """
    from gpssbzd_spark.plans.components import connected_components

    # the pair graph is consumed repeatedly (edges + both endpoint
    # projections, then mapping again for rep/size joins) and is tiny by
    # construction — persist it or the upstream near-dup pipeline that
    # produced it re-runs once per consumer (measured 80s → 8s at sf0.1
    # over the portable MinHash pipeline). GC-scoped localCheckpoint —
    # a session persist here leaked for the session lifetime
    pairs = pairs.localCheckpoint()
    ids = (
        pairs.select(F.col(id_a).alias("id"))
        .unionByName(pairs.select(F.col(id_b).alias("id")))
        .distinct()
    )
    mapping = ids.select("id", _node_key(F.col("id")).alias("node"))
    edges = pairs.select(
        _node_key(F.col(id_a)).alias("src"), _node_key(F.col(id_b)).alias("dst")
    )
    cc = connected_components(mapping.select("node"), edges)
    labeled = cc.join(mapping, "node").select("id", "label")
    # rep and size in ONE pass over the labeled table: the component's
    # label IS its min node key, so min(id) over the label partition is
    # the rep (numeric min for int ids, lexicographic — identical under
    # the fixed-width key — for string ids) and count(*) the size. One
    # exchange on label replaces the old reps-join + sizes-groupBy-join
    # chain (three exchanges) that dominated the tiny-graph wall time.
    w = Window.partitionBy("label")
    return labeled.select(
        F.col("id").alias("doc_id"),
        F.min("id").over(w).alias("cluster_rep"),
        F.count("*").over(w).cast("long").alias("cluster_size"),
    )


def neardup_dedup(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Drop every clustered doc except its component's rep (min id);
    docs in no near-dup pair survive untouched. One anti-join on id —
    the corpus shuffles once, the (small) victim set streams."""
    clusters = neardup_clusters(pairs, id_a=id_a, id_b=id_b)
    victims = clusters.filter(F.col("doc_id") != F.col("cluster_rep")).select(
        F.col("doc_id").alias(id_col)
    )
    return df.join(victims, id_col, "left_anti")


def neardup_clusters_sql(pairs_sql: str) -> str:
    """DuckDB twin of :func:`neardup_clusters`: min-label transitive
    closure (recursive CTE) over the symmetrized pair graph produced by
    ``pairs_sql`` (any query with id_a/id_b columns — e.g.
    :func:`minhash_lsh_portable_sql`), same lpad-20 node keys.

    Dialect trap, pinned here: under ``WITH RECURSIVE``, DuckDB treats
    the top-level ``UNION`` of ANY cte in the block as the
    recursive-union operator and skips its global dedup even when the
    cte never references itself — so ``ids``/``sym`` dedup explicitly
    via ``SELECT DISTINCT`` over ``UNION ALL`` subqueries. ``reach``
    keeps the plain ``UNION``: there the recursive fixpoint semantics
    (dedup across iterations) is exactly what we want."""
    return f"""
    WITH RECURSIVE prs AS ({pairs_sql}
    ), ids AS (
      SELECT DISTINCT id FROM (
        SELECT id_a AS id FROM prs UNION ALL SELECT id_b AS id FROM prs)
    ), nodes AS (
      SELECT id, lpad(CAST(id AS VARCHAR), 20, '0') AS node FROM ids
    ), sym AS (
      SELECT DISTINCT src, dst FROM (
        SELECT lpad(CAST(id_a AS VARCHAR), 20, '0') AS src,
               lpad(CAST(id_b AS VARCHAR), 20, '0') AS dst FROM prs
        UNION ALL
        SELECT lpad(CAST(id_b AS VARCHAR), 20, '0') AS src,
               lpad(CAST(id_a AS VARCHAR), 20, '0') AS dst FROM prs)
    ), reach AS (
      SELECT node, node AS label FROM nodes
      UNION
      SELECT s.dst AS node, r.label FROM reach r JOIN sym s ON r.node = s.src
    ), comp AS (
      SELECT node, min(label) AS label FROM reach GROUP BY node
    ), labeled AS (
      SELECT n.id, c.label FROM nodes n JOIN comp c USING (node)
    ), sizes AS (
      SELECT label, CAST(count(*) AS BIGINT) AS cluster_size
      FROM labeled GROUP BY label
    ), reps AS (
      SELECT node AS label, id AS cluster_rep FROM nodes
    )
    SELECT l.id AS doc_id, r.cluster_rep, s.cluster_size
    FROM labeled l JOIN reps r USING (label) JOIN sizes s USING (label)
    """


def embedding_lsh_portable_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.4,
    n_planes: int = 6,
    n_tables: int = 8,
    scale: int = 1000,
) -> str:
    """DuckDB twin of :func:`embedding_lsh_portable`, embedding the
    SAME md5-derived ±1 plane literals."""
    rows = ", ".join(
        f"({t}, {p}, [{', '.join(str(s) for s in sgn)}]::BIGINT[])"
        for t, p, sgn in _rademacher_signs(n_tables, n_planes, dim)
    )
    return f"""
    WITH planes(t, p, sgn) AS (VALUES {rows}),
    vecs AS (
      SELECT {id_col} AS _id,
             list_transform({vec_col},
               x -> CAST(round(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS q
      FROM {table}
    ), vq AS (
      SELECT _id, q,
             list_sum(list_transform(q, x -> x * x)) AS sq
      FROM vecs
    ), keep AS (
      SELECT * FROM vq WHERE sq > 0
    ), dots AS (
      SELECT _id, t, p,
             list_sum(list_transform(generate_series(1, {dim}),
               j -> q[j] * sgn[j])) AS d
      FROM keep CROSS JOIN planes
    ), buckets AS (
      SELECT _id, t,
             SUM(CASE WHEN d >= 0 THEN (CAST(1 AS BIGINT) << p)
                 ELSE 0 END) AS bucket
      FROM dots GROUP BY _id, t
    ), cand AS (
      SELECT DISTINCT l._id AS id_a, r._id AS id_b
      FROM buckets l JOIN buckets r USING (t, bucket)
      WHERE l._id < r._id
    ), verified AS (
      SELECT id_a, id_b,
             CAST(list_sum(list_transform(generate_series(1, {dim}),
               j -> a.q[j] * b.q[j])) AS DOUBLE)
             / (sqrt(CAST(a.sq AS DOUBLE)) * sqrt(CAST(b.sq AS DOUBLE)))
               AS cos_sim
      FROM cand JOIN keep a ON a._id = cand.id_a
                JOIN keep b ON b._id = cand.id_b
    )
    SELECT id_a, id_b, ROUND(cos_sim, 4) AS cos_sim
    FROM verified WHERE cos_sim >= {threshold}
    """


# ---------------------------------------------------------------------------
# SemDeDup — k-means-cluster-blocked semantic deduplication
# ---------------------------------------------------------------------------


def semantic_dedup_pairs(
    df: DataFrame,
    dim: int,
    n_clusters: int = 16,
    threshold: float = 0.95,
    iters: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hierarchical: bool | None = None,
) -> DataFrame:
    """SemDeDup semantic near-duplicate pairs (Abbas et al. 2023,
    arXiv:2303.09540): block the embedding space with a coarse k-means
    codebook, then compare pairs only WITHIN each cluster — the
    published alternative to hyperplane-LSH blocking
    (:func:`embedding_lsh_pairs`) that concentrates comparisons where
    semantic duplicates actually live instead of relying on random
    projections.

    Composition of existing kernels: the codebook comes from
    :func:`~gpssbzd_spark.dataprep.similarity.kmeans_centroids`
    (deterministic hash-ordered seeding, distributed Lloyd rounds, only
    the C×dim table reaches the driver), assignment is the same one-
    matmul-per-Arrow-batch pandas UDF the IVF index uses, and the
    intra-cluster pair join + exact cosine verify is
    :func:`embedding_cosine_pairs` with the cluster id as ``block_col``
    — so precision vs the unblocked exact baseline is 1.0 by
    construction and the blocking affects recall only (pairs split
    across cluster boundaries are missed; the paper accepts exactly
    this trade).

    Scale shape: per-cluster self-joins cost Σ n_c² ≈ n²/C for balanced
    clusters — grow ``n_clusters`` with the corpus (the IVF codebook
    rule: C ∝ n bounds expected cluster size) so the pair mass stays
    linear per cluster; identical vectors always share a cluster
    (identical input ⇒ identical argmax), so exact-duplicate recall is
    1.0 regardless of C. A pathologically popular cluster degrades to
    that cluster's quadratic term only — cap per-cluster size or
    sub-cluster hot cids when the assignment histogram says so.

    With C ∝ n the flat assignment matmul is itself O(n·C·d) — the
    residual superlinear term PERF_NOTES #10 names (the paper's own
    brute-on-accelerators regime). ``hierarchical`` switches the
    blocking key to a TWO-LEVEL codebook (VERDICT r11 #7,
    :func:`~gpssbzd_spark.dataprep.similarity.kmeans_centroids_2level`:
    √C coarse cells → √C fine cells within the assigned coarse cell),
    making assignment O(n·√C·d). The two-level cells are a DIFFERENT
    (but equally valid) partition of the space than flat k-means, so
    like any blocking change it moves organic recall only — identical
    vectors still collide (identical input ⇒ identical (c1, c2)
    argmaxes ⇒ exact-dup recall stays 1.0) and precision stays exact
    (the verify step is unchanged). Default ``None`` = auto:
    hierarchical once ``n_clusters ≥ 64``, where the √C saving clears
    the second UDF pass's overhead; flat below.

    .. note:: **Behavior change (r12, flagged per ADVICE r12):** the
       ``hierarchical=None`` auto-default silently routes any existing
       caller with ``n_clusters >= 64`` onto the two-level codebook,
       which CHANGES THE EMITTED PAIR SET (blocking changes organic
       recall; exact-dup recall and precision are preserved). Callers
       that need the r11 flat pair set bit-for-bit at large C must
       pass ``hierarchical=False`` explicitly.

    Returns (id_a, id_b, cos_sim) with id_a < id_b, cos_sim ≥
    ``threshold``. Zero-norm vectors are dropped (cosine undefined).
    """
    from gpssbzd_spark.dataprep.similarity import (
        _nearest_centroids_udf,
        _nearest_fine_udf,
        kmeans_centroids,
        kmeans_centroids_2level,
    )

    if hierarchical is None:
        hierarchical = n_clusters >= 64
    # pin the source once (GC-scoped): it feeds the seed sample, the
    # row count, every Lloyd round, and the pair join — the same
    # consumption pattern build_ivf_index pins for (r11 review).
    # r14: widen first (guide §2) — the single-split embeddings scan
    # otherwise pins a 2-partition layout that every Lloyd round and
    # the assignment/verify stages inherit (profiled 0.8 s + 1.6 s
    # 2-task stages at sf0.1); no-op on wide inputs
    from gpssbzd_spark.sources.tables import widen_small_input

    src = widen_small_input(
        df.select(id_col, vec_col), key=id_col
    ).localCheckpoint()
    if hierarchical:
        coarse, fine = kmeans_centroids_2level(
            src, dim, n_centroids=n_clusters, iters=iters, seed=seed,
            id_col=id_col, vec_col=vec_col,
        )
        c2_n = fine.shape[1]
        assign1 = _nearest_centroids_udf(coarse, 1)
        assign2 = _nearest_fine_udf(fine)
        with_c1 = src.select(
            id_col,
            vec_col,
            F.element_at(assign1(F.col(vec_col)), 1).alias("_c1"),
        )
        clustered = with_c1.select(
            id_col,
            vec_col,
            (
                F.col("_c1") * F.lit(int(c2_n))
                + assign2(F.col("_c1"), F.col(vec_col))
            ).alias("_semcid"),
        ).localCheckpoint()
    else:
        cents = kmeans_centroids(
            src, dim, n_centroids=n_clusters, iters=iters, seed=seed,
            id_col=id_col, vec_col=vec_col,
        )
        assign = _nearest_centroids_udf(cents, 1)
        # pin the assignment too: both sides of the blocked self-join
        # consume it, and without the pin the Arrow matmul runs once
        # per side
        clustered = src.select(
            id_col,
            vec_col,
            F.element_at(assign(F.col(vec_col)), 1).alias("_semcid"),
        ).localCheckpoint()
    return embedding_cosine_pairs(
        clustered,
        id_col=id_col,
        vec_col=vec_col,
        threshold=threshold,
        block_col="_semcid",
    )


def semdedup_drop_ids(pairs: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """The ids SemDeDup removes: every vector that has a SMALLER-id
    neighbor at cos ≥ threshold in its cluster (keep-min-id survivor —
    this repo's exact-dedup convention, deterministic and oracle-
    friendly; the paper keeps a per-group exemplar by centroid
    distance, a policy swap on the same pair set)."""
    return pairs.select(F.col("id_b").alias(id_col)).distinct()


def semantic_dedup(
    df: DataFrame,
    dim: int,
    n_clusters: int = 16,
    threshold: float = 0.95,
    iters: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup survivors: ``df`` minus :func:`semdedup_drop_ids` of
    :func:`semantic_dedup_pairs` (left_anti on the id). The drop set is
    ids-only but its SIZE tracks the duplicate rate — on a heavy-dup
    corpus it is a large fraction of the rows — so the join strategy
    is left to Catalyst/AQE (broadcast when it measures small, shuffled
    anti otherwise) rather than force-hinted."""
    pairs = semantic_dedup_pairs(
        df, dim, n_clusters=n_clusters, threshold=threshold, iters=iters,
        seed=seed, id_col=id_col, vec_col=vec_col,
    )
    return df.join(semdedup_drop_ids(pairs, id_col), id_col, "left_anti")


# ---------------------------------------------------------------------------
# Cross-document repeated token spans (ExactSubstr-style, fixed window)
# ---------------------------------------------------------------------------


def repeated_spans(
    docs: DataFrame,
    n: int = 6,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maximal cross-document repeated token spans — the Spark-shaped
    fixed-window form of exact-substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): a
    suffix array finds repeats at every length; at cluster scale the
    standard approximation slides a fixed ``n``-token window instead,
    flags windows whose content occurs in ≥ ``min_docs`` documents, and
    merges overlapping/adjacent flagged windows back into maximal
    spans. Catches boilerplate REGIONS (licenses, headers, templated
    paragraphs) that survive document-level dedup and sit off
    :func:`passage_dedup`'s fixed grid (its passages are
    non-overlapping, so a shared region straddling a passage boundary
    is invisible there; the sliding window finds it at any offset).

    Scale shape: one posexplode builds NARROW (id, start, md5(gram))
    rows — the md5 key bounds the shuffle row width no matter how wide
    the window is; the gram-frequency rollup partial-aggs map-side
    (hot boilerplate grams combine before the exchange) and joins back
    on the hash key — those two gram-keyed moves are the algorithm's
    inherent cost, exactly where ExactSubstr implementations spend
    theirs. Interval merging is one per-doc window pass over flagged
    starts only (running-max-end segmenting), never over all tokens.

    Merge-rule caveat (ADVICE r11): ADJACENT flagged windows
    (``start == prev_max_end + 1``) merge too, so a reported span is a
    superset approximation of true repeated regions — two abutting
    windows repeated with DIFFERENT partner documents concatenate into
    one span that need not occur contiguously in ≥ ``min_docs``
    documents. That is the conservative direction for a dedup
    *candidate* region (over-flag, never under-flag), and both engines
    implement the identical rule (oracle parity unaffected); callers
    needing strictly-witnessed regions should re-verify spans against
    the corpus before acting on them.

    Returns (id, span_start, span_end, span_tokens), token positions
    1-based inclusive, one row per maximal span per document. Fully
    SQL-expressible — :func:`repeated_spans_sql` is the DuckDB twin.
    """
    arr = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    # partition-count floor BEFORE the gram explode (guide §2, r14):
    # `grams` is deliberately recomputed on both consumer branches (see
    # below), and the fixture corpus scans as 1 split — so BOTH md5
    # gram-generation passes ran single-task (profiled 1.08 s + 0.74 s
    # at sf0.1, ~1 s cpu each, 31 cores idle). Widening the narrow
    # (id, tokens) base puts one small exchange under both branches:
    # the plan reuses it (ReusedExchange), and each branch's slice+md5
    # transform runs at session parallelism. No-op on wide inputs.
    from gpssbzd_spark.sources.tables import widen_small_input

    base = (
        docs.filter(
            F.col(text_col).isNotNull()
            & (F.length(F.trim(F.col(text_col))) > 0)
        )
        .select(F.col(id_col), arr.alias("_toks"))
        .filter(F.size("_toks") >= n)
    )
    base = widen_small_input(base, key=id_col)
    gkeys = F.transform(
        F.sequence(F.lit(1), F.size("_toks") - (n - 1)),
        lambda i: F.md5(F.array_join(F.slice("_toks", i, n), " ")),
    )
    grams = base.select(
        id_col, F.posexplode(gkeys).alias("_p0", "_gkey")
    ).select(
        id_col, (F.col("_p0") + 1).alias("start"), "_gkey"
    )
    # grams feeds BOTH the frequency rollup and the flag join, but it
    # is the PRE-aggregation table (~tokens-per-doc rows per doc) —
    # pinning it would materialize the corpus's full gram explosion;
    # recomputing the narrow scan+explode is the cheaper side of the
    # trade at every scale, so this is the one reused input the repo
    # deliberately does NOT checkpoint
    hot = (
        grams.groupBy("_gkey")
        .agg(F.countDistinct(id_col).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("_gkey")
    )
    flagged = grams.join(hot, "_gkey").select(
        id_col, "start", (F.col("start") + (n - 1)).alias("end")
    )
    w = Window.partitionBy(id_col).orderBy("start")
    prev_max_end = F.max("end").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_new = (
        prev_max_end.isNull() | (F.col("start") > prev_max_end + 1)
    ).cast("int")
    seg = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        flagged.withColumn("_seg", seg)
        .groupBy(id_col, "_seg")
        .agg(
            F.min("start").alias("span_start"),
            F.max("end").alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias(
                "span_tokens"
            ),
        )
    )


def repeated_spans_sql(n: int = 6, min_docs: int = 2) -> str:
    """DuckDB twin of :func:`repeated_spans` over the ``documents``
    view (1-based inclusive slices on both engines; grams md5-keyed on
    both so the group keys are bit-identical)."""
    return f"""
    WITH base AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         t -> t <> '') AS _toks
      FROM documents
      WHERE text IS NOT NULL AND length(trim(text)) > 0
    ), sized AS (
      SELECT doc_id, _toks FROM base WHERE len(_toks) >= {n}
    ), grams AS (
      SELECT doc_id, i AS start,
             md5(array_to_string(_toks[i:i+{n - 1}], ' ')) AS _gkey
      FROM sized, unnest(generate_series(1, len(_toks) - {n - 1})) AS t(i)
    ), hot AS (
      SELECT _gkey FROM grams
      GROUP BY _gkey HAVING COUNT(DISTINCT doc_id) >= {min_docs}
    ), flagged AS (
      SELECT g.doc_id, g.start, g.start + {n - 1} AS "end"
      FROM grams g JOIN hot USING (_gkey)
    ), segged AS (
      SELECT doc_id, start, "end",
             SUM(CASE WHEN prev_max_end IS NULL
                      OR start > prev_max_end + 1 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY start
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS _seg
      FROM (
        SELECT doc_id, start, "end",
               MAX("end") OVER (PARTITION BY doc_id ORDER BY start
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS prev_max_end
        FROM flagged
      )
    )
    SELECT doc_id, MIN(start) AS span_start, MAX("end") AS span_end,
           MAX("end") - MIN(start) + 1 AS span_tokens
    FROM segged GROUP BY doc_id, _seg
    """


def strip_repeated_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove the tokens covered by :func:`repeated_spans` from each
    document, keeping everything else in order (the removal half of
    ExactSubstr dedup). Spans aggregate to one small array per affected
    doc and join back on the id; the token filter is a native nested
    higher-order expression (no Python). Documents with NO spans pass
    through with their text byte-identical; affected documents are
    rebuilt from their ORIGINAL-case whitespace tokens (span positions
    are case-independent — lowercasing never changes ``\\s+`` token
    boundaries — so the only lossy normalization on an affected doc is
    whitespace collapsing to single spaces). Output replaces
    ``text_col`` and adds ``n_tokens_removed``."""
    agg = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    arr = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    j = docs.join(agg, id_col, "left").withColumn("_toks", arr)
    idx = F.when(
        F.size("_toks") > 0, F.sequence(F.lit(1), F.size("_toks"))
    ).otherwise(F.array().cast("array<int>"))
    kept = F.filter(
        idx,
        lambda i: ~F.exists(
            "_spans",
            lambda s: (i >= s["span_start"]) & (i <= s["span_end"]),
        ),
    )
    untouched = F.col("_spans").isNull()
    out_cols = [c for c in docs.columns if c != text_col]
    return j.select(
        *out_cols,
        F.when(untouched, F.col(text_col))
        .otherwise(
            F.array_join(
                F.transform(kept, lambda i: F.element_at("_toks", i)), " "
            )
        )
        .alias(text_col),
        F.when(untouched, F.lit(0))
        .otherwise(F.size("_toks") - F.size(kept))
        .alias("n_tokens_removed"),
    )
