"""Explicit key-salting for skewed joins.

AQE's skew-join splitting (on in ``session.py``) handles most skew at
runtime by splitting oversized partitions — but it only applies to
sort-merge joins in batch queries. When a hot key must be joined where
AQE cannot re-plan (stream-static joins, storage-bucketed joins whose
distribution is fixed, or an engine without AQE), the classic fix is
explicit salting: widen the hot key space by a factor ``n_salt`` on the
big side and replicate the small side across all salt values, so the
hot key's rows spread over ``n_salt`` tasks instead of one straggler.

Cost model: the small side is replicated ``n_salt``× (choose ``n_salt``
≈ skew factor, not cores), the big side pays one extra int column; the
join stays a plain equi-join on ``keys + [salt]`` — no cartesian, no
custom partitioner, and every engine optimization (codegen, AQE
coalescing) still applies.

Reference parity: the reference's driver-side bin-packing
(``Parallel/Trajectory Clustering.py:60-136``) exists to rebalance
skewed per-line work; salting is the declarative form of the same idea
(SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the big side salted.

    The big side's salt is DETERMINISTIC — ``xxhash64`` over all of its
    columns mod ``n_salt`` — not ``rand()``: a retried task must salt a
    row identically or speculative execution/shuffle retries produce
    duplicate or lost rows. The small side cross-joins a literal
    0..n_salt-1 array (n_salt× replication, still broadcastable when
    small). Output columns match the plain join (salt dropped).

    Supported ``how``: inner / left (the replicated side must be the
    non-preserved one for outer correctness; a right/full join should
    salt the other input instead).
    """
    assert how in ("inner", "left"), how
    assert n_salt >= 1
    salt_b = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salt))
    bs = big.withColumn("_salt", salt_b.cast("int"))
    # generators must be top-level in the projection (no cast wrapper);
    # sequence of int literals already explodes as int
    ss = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    out = bs.join(ss, on + ["_salt"], how)
    return out.drop("_salt")
