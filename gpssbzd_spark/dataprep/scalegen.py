"""Synthetic scale inflation for scale-stress measurement (VERDICT r5
#2): grow the fixture tables K× IN ROWS while holding each family's
duplicate/near-duplicate RATE constant, so a measured runtime curve
over K reveals the algorithmic exponent — banded/blocked families must
grow ~linearly in rows (not pairs) for the 100 TB claims to hold.

Every inflation is a native ``explode(sequence(0, K-1))`` replica
fan-out (no driver loops, no Python workers) with a per-replica
transform chosen so that within-replica structure is preserved EXACTLY
and cross-replica structure vanishes:

- documents: replica 0 is the original corpus; replica i>0 passes the
  text through a per-replica SUBSTITUTION CIPHER on [a-zA-Z0-9]
  (case-consistent, class-preserving, whitespace/punctuation fixed).
  A character bijection commutes with lowercasing and maps every
  token and every character k-shingle bijectively, so token Jaccard,
  shingle Jaccard, text equality, lengths and token boundaries are
  ALL preserved exactly within a replica — exact-dup, MinHash and
  n-gram families replicate verbatim. Across replicas, two ciphered
  shingle sets overlap only by chance (~|A||B|/26^k per doc pair —
  effectively zero). Earlier attempts leaked: a per-token prefix keeps
  long tokens' interior char shingles (~270k cross-replica candidates
  at K=4), and hashing tokens to digit strings inflates frequent
  tokens' shingle mass (~130k within-replica false pairs). Pair count
  grows K×, candidate space per band-bucket grows K× — a banding
  implementation that is O(rows) stays O(rows); an all-pairs
  implementation is caught immediately (K² pairs).
- embeddings: per-replica circular dimension roll + per-(replica,
  dimension) deterministic sign flip. Both are orthogonal transforms
  applied identically to every vector of a replica, so within-replica
  cosines (and every norm) are preserved exactly; across replicas the
  roll misaligns dominant components and the sign mask decorrelates
  what remains, driving cross-replica cosines toward 0. (Sign flips
  alone are NOT enough: mean-dominated vectors put most of their mass
  on a few coordinates, and Σ s_i,d s_j,d μ_d² has heavy tails that
  leak pairs over any positive threshold — measured 4.5× pairs at K=4
  instead of 4×; roll+sign measures exactly K×.)
- events: per-replica user_id/event_id stride offset — K× users with
  identical per-user timelines; funnels, sessionization, retention and
  per-key windows scale in users, the (event_type, bucket) gapfill
  spine stays constant while its input grows K×.

The stride (1e10) sits far above every fixture id, so replica id
spaces never collide and numeric id invariants (min-id reps, id_a <
id_b) hold within and across replicas.
"""

from __future__ import annotations

import random
import string

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ID_STRIDE = 10_000_000_000


def _cipher_pair(rep: int) -> tuple[str, str]:
    """(matching, replace) strings for ``F.translate``: a deterministic
    per-replica permutation of a-z (mirrored onto A-Z so the cipher
    commutes with lowercasing) and of 0-9."""
    rnd = random.Random(0xC0FFEE + rep)
    lower = list(string.ascii_lowercase)
    rnd.shuffle(lower)
    digits = list(string.digits)
    rnd.shuffle(digits)
    matching = string.ascii_lowercase + string.ascii_uppercase + string.digits
    replace = "".join(lower) + "".join(lower).upper() + "".join(digits)
    return matching, replace


def _replicate(df: DataFrame, mult: int) -> DataFrame:
    """K× row fan-out with a ``_rep`` replica index column (0..K-1)."""
    assert mult >= 1, mult
    return df.withColumn(
        "_rep", F.explode(F.sequence(F.lit(0), F.lit(mult - 1)))
    )


def inflate_documents(
    df: DataFrame, mult: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """K× documents, constant near-dup rate (see module docstring)."""
    if mult == 1:
        return df
    r = _replicate(df, mult)
    ciphered = F.col(text_col)
    for i in range(1, mult):
        m, rp = _cipher_pair(i)
        ciphered = F.when(
            F.col("_rep") == i, F.translate(F.col(text_col), m, rp)
        ).otherwise(ciphered)
    return (
        r.withColumn(id_col, F.col(id_col) + F.col("_rep") * F.lit(ID_STRIDE))
        .withColumn(text_col, ciphered)
        .drop("_rep")
    )


def inflate_embeddings(
    df: DataFrame,
    mult: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """K× vectors, norms and within-replica cosines preserved exactly."""
    if mult == 1:
        return df
    r = _replicate(df, mult)
    # v'[d] = sign(rep, d) * v[(d + 7*rep) % dim] — roll then flip; the
    # original x lambda argument is unused because the roll reads the
    # source coordinate by position
    flipped = F.transform(
        F.col(vec_col),
        lambda x, i: (
            F.element_at(
                F.col(vec_col),
                ((i + F.col("_rep") * 7) % dim).cast("int") + 1,
            )
            * F.when(F.xxhash64(F.col("_rep"), i) % 2 == 0, F.lit(1.0))
            .otherwise(F.lit(-1.0))
        ).cast("float"),
    )
    return (
        r.withColumn(id_col, F.col(id_col) + F.col("_rep") * F.lit(ID_STRIDE))
        .withColumn(
            vec_col,
            F.when(F.col("_rep") == 0, F.col(vec_col)).otherwise(flipped),
        )
        .drop("_rep")
    )


def inflate_lineitem(df: DataFrame, mult: int) -> DataFrame:
    """K× lineitem rows with keys UNCHANGED: each replica re-lines the
    same orders, so a fact⋈orders join's probe side and output grow
    exactly K× against a fixture-sized build side — the 'fact table
    grows, dims don't' regime the TPC-H scale octave measures. (An
    orderkey offset would instead DROP all replicas at the inner join;
    inflating orders in lockstep would time the synthetic fan-out of
    the un-timed side inside the op.)"""
    if mult == 1:
        return df
    return _replicate(df, mult).drop("_rep")


def inflate_events(
    df: DataFrame,
    mult: int,
    user_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """K× events as K× users with identical per-user timelines."""
    if mult == 1:
        return df
    r = _replicate(df, mult)
    return (
        r.withColumn(
            user_col, F.col(user_col) + F.col("_rep") * F.lit(ID_STRIDE)
        )
        .withColumn(id_col, F.col(id_col) + F.col("_rep") * F.lit(ID_STRIDE))
        .drop("_rep")
    )
