"""Property-based checks (SURVEY.md §5.4) on the pure computational
kernels — no SparkSession involved, so hypothesis can drive hundreds of
examples: DBSCAN label semantics and permutation invariance, trajectory
distance invariants, the stateful gap-segmenter's boundary behavior,
and MinHash's statistical accuracy under the multiply-shift family.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gpssbzd_spark.dataprep.dedup import _perm_params
from gpssbzd_spark.plans.trajectory_clustering import (
    _great_circle_km,
    dbscan_precomputed,
    trajectory_distance,
)
from gpssbzd_spark.streaming.stateful import _NullState, _segmenter


# ---------------------------------------------------------------------------
# DBSCAN on a precomputed matrix
# ---------------------------------------------------------------------------


@st.composite
def distance_matrices(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    vals = draw(
        st.lists(
            st.floats(min_value=0.0, max_value=10.0, allow_nan=False),
            min_size=n * n,
            max_size=n * n,
        )
    )
    m = np.array(vals).reshape(n, n)
    m = (m + m.T) / 2  # symmetrize
    np.fill_diagonal(m, 0.0)
    return m


@given(distance_matrices(), st.floats(0.1, 5.0), st.integers(1, 4))
@settings(max_examples=150, deadline=None)
def test_dbscan_label_semantics(dist, eps, min_samples):
    labels = dbscan_precomputed(dist, eps, min_samples)
    n = len(dist)
    assert len(labels) == n and labels.min() >= -1
    neighbor_counts = (dist <= eps).sum(axis=1)  # includes self
    for i in range(n):
        if neighbor_counts[i] >= min_samples:
            assert labels[i] != -1  # a core point is never noise
        if labels[i] == -1:
            # noise is not within eps of any core point
            for j in range(n):
                if i != j and dist[i, j] <= eps:
                    assert neighbor_counts[j] < min_samples


@given(distance_matrices(), st.floats(0.1, 5.0), st.integers(1, 4), st.randoms())
@settings(max_examples=80, deadline=None)
def test_dbscan_partition_is_permutation_invariant(dist, eps, min_samples, rnd):
    """The order-invariant parts of DBSCAN must not depend on point
    order: the noise set, and the partition restricted to CORE points.
    Border points (non-core within eps of a core) are genuinely
    order-dependent in standard DBSCAN — a border point reachable from
    cores in two different clusters is claimed by whichever expands
    first (Ester et al. 1996 §4 notes this ambiguity) — so for them we
    assert only that each lands in a cluster that contains at least one
    of its own eps-adjacent cores, in both orderings."""
    n = len(dist)
    perm = list(range(n))
    rnd.shuffle(perm)
    p = np.array(perm)
    a = dbscan_precomputed(dist, eps, min_samples)
    b_raw = dbscan_precomputed(dist[np.ix_(p, p)], eps, min_samples)
    # relabel b back into original index space
    b = np.empty(n, dtype=b_raw.dtype)
    b[p] = b_raw

    neighbor_counts = (dist <= eps).sum(axis=1)  # includes self
    is_core = neighbor_counts >= min_samples

    # noise set is order-invariant
    assert set(np.flatnonzero(a == -1)) == set(np.flatnonzero(b == -1))

    def core_partition(labels):
        groups: dict[int, set] = {}
        for idx in np.flatnonzero(is_core):
            assert labels[idx] != -1
            groups.setdefault(labels[idx], set()).add(int(idx))
        return {frozenset(g) for g in groups.values()}

    # the partition of core points is order-invariant
    assert core_partition(a) == core_partition(b)

    # each border point joins a cluster containing one of its adjacent cores
    for labels in (a, b):
        for i in range(n):
            if labels[i] != -1 and not is_core[i]:
                adj_core_labels = {
                    labels[j]
                    for j in range(n)
                    if j != i and is_core[j] and dist[i, j] <= eps
                }
                assert labels[i] in adj_core_labels


# ---------------------------------------------------------------------------
# trajectory distance
# ---------------------------------------------------------------------------


coords = st.tuples(
    st.floats(113.7, 114.5, allow_nan=False), st.floats(22.5, 22.8, allow_nan=False)
)


@given(st.lists(coords, min_size=2, max_size=8), st.lists(coords, min_size=2, max_size=8))
@settings(max_examples=150, deadline=None)
def test_trajectory_distance_nonnegative_finite(t1, t2):
    d = trajectory_distance(np.array(t1), np.array(t2))
    assert d >= 0.0 and math.isfinite(d)


@given(st.lists(coords, min_size=2, max_size=8))
@settings(max_examples=80, deadline=None)
def test_trajectory_distance_identity_has_no_offset_terms(t):
    """d(tr, tr): endpoints project onto the own chord at distance 0 and
    the angle is 0, so only degenerate-chord cases can add anything."""
    tr = np.array(t)
    if np.allclose(tr[0], tr[-1]):  # closed loop → chord degenerates
        return
    # 1e-5 km = 1 cm: projection round-off, not a semantic offset
    assert trajectory_distance(tr, tr) == pytest.approx(0.0, abs=1e-5)


def test_great_circle_against_known_pair():
    # Shenzhen North ↔ Futian checkpoint-ish, ~17 km (rough truth)
    d = _great_circle_km(np.array([114.029, 22.610]), np.array([114.063, 22.757]))
    assert 15.0 < d < 19.0


# ---------------------------------------------------------------------------
# stateful gap segmenter kernel
# ---------------------------------------------------------------------------


def _run_segmenter(ts_seconds, gap_seconds, chunks=1):
    fn = _segmenter(gap_seconds)
    ts = pd.Series(pd.to_datetime(np.array(ts_seconds) * 1e9))
    pdfs = np.array_split(pd.DataFrame({"ts": ts}), chunks)
    state = _NullState()

    class _S:  # minimal mutable GroupState stand-in for multi-chunk runs
        exists = False
        get = (None, 0)

        def update(self, v):
            self.exists, self.get = True, v

    state = _S()
    out = []
    for chunk in pdfs:
        if len(chunk):
            out.extend(fn((7,), iter([chunk]), state))
    return pd.concat(out, ignore_index=True) if out else pd.DataFrame()


@given(
    st.lists(st.integers(0, 10_000), min_size=1, max_size=40, unique=True),
    st.integers(1, 1000),
    st.integers(1, 4),
)
@settings(max_examples=120, deadline=None)
def test_segmenter_boundary_and_monotonicity(ts, gap, chunks):
    """Segment ids start at 1, are non-decreasing, increment exactly on
    gap > threshold (strict: gap == threshold does NOT split), and the
    result is identical however the rows are chunked into micro-batches."""
    out = _run_segmenter(sorted(ts), float(gap), chunks=1)
    segs, gaps = out["segment_id"].tolist(), out["gap_s"].tolist()
    assert segs[0] == 1 and gaps[0] == 0.0
    for i in range(1, len(segs)):
        expected = segs[i - 1] + (1 if gaps[i] > gap else 0)
        assert segs[i] == expected

    chunked = _run_segmenter(sorted(ts), float(gap), chunks=chunks)
    pd.testing.assert_frame_equal(out, chunked)


# ---------------------------------------------------------------------------
# MinHash statistical accuracy
# ---------------------------------------------------------------------------


def test_minhash_estimates_jaccard():
    """With 256 perms the signature-agreement estimate must track true
    Jaccard within ~3σ = 3·sqrt(J(1-J)/k) on deterministic inputs."""
    rng = np.random.RandomState(7)
    a_params, b_params = _perm_params(256, seed=42)

    def sig(items):
        h = np.array(list(items), dtype=np.uint64)[:, np.newaxis]
        return (h * a_params + b_params).min(axis=0)

    universe = rng.randint(0, 2**62, size=400, dtype=np.uint64)
    set_a = set(universe[:300])
    for overlap in (60, 150, 240, 300):
        set_b = set(universe[300 - overlap : 600 - overlap][:300])
        true_j = len(set_a & set_b) / len(set_a | set_b)
        est = float((sig(set_a) == sig(set_b)).mean())
        sigma = math.sqrt(true_j * (1 - true_j) / 256) or 1e-3
        assert abs(est - true_j) <= 3.5 * sigma + 1e-9


# ---------------------------------------------------------------------------
# minhash allocation-quiet kernels (VERDICT r13 #4 — the #14 scratch
# discipline transplanted from the simhash kernel; these pins make the
# rewrite bit-identical BY TEST, not by argument)
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**64 - 1),
        min_size=1,
        max_size=400,
    ),
    st.sampled_from([8, 64]),
    st.integers(min_value=0, max_value=2**20),
)
@settings(max_examples=200, deadline=None)
def test_perm_min_fold_matches_broadcast_reference(hashes, num_perm, seed):
    """The scratch-chunked permutation fold must equal the old one-shot
    ``(h[:, None] * a + b).min(axis=0)`` broadcast bit-for-bit for any
    hash multiset — including values past 2^63 (ring wraparound) and
    rows longer than the chunk budget."""
    from gpssbzd_spark.dataprep import dedup

    a, b = _perm_params(num_perm, seed)
    h = np.array(hashes, dtype=np.uint64)
    want = (h[:, np.newaxis] * a[np.newaxis, :] + b[np.newaxis, :]).min(
        axis=0
    )
    got = dedup._perm_min_fold(h, a, b)
    assert np.array_equal(got, want)


def test_perm_min_fold_chunking_is_exact():
    """A row longer than the chunk budget folds across chunk
    boundaries with a running minimum — same result as one shot."""
    from gpssbzd_spark.dataprep import dedup

    a, b = _perm_params(16, 42)
    rng = np.random.RandomState(3)
    h = rng.randint(0, 2**63, size=dedup._SIMHASH_CHUNK_TOKENS + 1000).astype(
        np.uint64
    )
    want = (h[:, np.newaxis] * a + b).min(axis=0)
    assert np.array_equal(dedup._perm_min_fold(h, a, b), want)


@given(
    st.text(max_size=200),
    st.sampled_from([2, 5]),
)
@settings(max_examples=200, deadline=None)
def test_rolling_shingle_hashes_match_reference(text, k):
    """The in-place scratch rolling hash must equal the old
    allocate-per-pass formulation for any text (unicode included)."""
    from gpssbzd_spark.dataprep import dedup

    base = np.uint64(1099511628211)
    cp = np.frombuffer(text.lower().encode("utf-32-le"), dtype=np.uint32)
    if cp.size < k:
        return
    w = np.lib.stride_tricks.sliding_window_view(cp, k)
    h = np.zeros(w.shape[0], dtype=np.uint64)
    for i in range(k):
        h = h * base + w[:, i].astype(np.uint64)
    want = np.unique(h)
    got = dedup._rolling_shingle_hashes(cp, k, base)
    assert np.array_equal(got, want)


def test_minhash_kernel_scratch_buffers_are_reused():
    """Same pin as the simhash one: the minhash fold's large
    intermediates must live in module scratch reused across calls —
    a regression silently reintroduces the per-row >mmap-threshold
    broadcasts behind the #14 stall class."""
    from gpssbzd_spark.dataprep import dedup

    a, b = _perm_params(64, 42)
    dedup._SIMHASH_SCRATCH.clear()
    rng = np.random.RandomState(11)
    h = rng.randint(0, 2**63, size=5000).astype(np.uint64)
    cp = rng.randint(97, 123, size=4000).astype(np.uint32)
    dedup._perm_min_fold(h, a, b)
    dedup._rolling_shingle_hashes(cp, 5, np.uint64(1099511628211))
    bufs1 = {k_: id(v) for k_, v in dedup._SIMHASH_SCRATCH.items()}
    sizes1 = {k_: v.size for k_, v in dedup._SIMHASH_SCRATCH.items()}
    assert {"mh_mat", "mh_roll"} <= set(bufs1)
    dedup._perm_min_fold(h, a, b)
    dedup._rolling_shingle_hashes(cp, 5, np.uint64(1099511628211))
    assert {k_: id(v) for k_, v in dedup._SIMHASH_SCRATCH.items()} == bufs1
    # smaller inputs: buffers never shrink
    dedup._perm_min_fold(h[:10], a, b)
    dedup._rolling_shingle_hashes(cp[:50], 5, np.uint64(1099511628211))
    assert {k_: v.size for k_, v in dedup._SIMHASH_SCRATCH.items()} == sizes1


def test_sig_agreement_matches_stack_reference():
    """The scratch-backed agreement kernel must equal the old
    np.stack formulation."""
    from gpssbzd_spark.dataprep.dedup import _sig_agreement

    rng = np.random.RandomState(5)
    n, width = 37, 64
    a_rows = [rng.randint(-(2**62), 2**62, size=width) for _ in range(n)]
    b_rows = [
        np.where(rng.rand(width) < 0.3, a_rows[i], rng.randint(0, 9, width))
        for i in range(n)
    ]
    got = _sig_agreement.func(
        pd.Series(a_rows, dtype=object), pd.Series(b_rows, dtype=object)
    )
    want = (np.stack(a_rows) == np.stack(b_rows)).mean(axis=1)
    assert np.allclose(got.to_numpy(), want)
    empty = _sig_agreement.func(
        pd.Series([], dtype=object), pd.Series([], dtype=object)
    )
    assert len(empty) == 0


# ---------------------------------------------------------------------------
# simhash batch kernel
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.one_of(
            st.none(),
            st.lists(
                st.integers(min_value=-(2**63), max_value=2**63 - 1),
                max_size=20,
            ),
        ),
        max_size=30,
    )
)
@settings(max_examples=150, deadline=None)
def test_simhash_batch_kernel_matches_per_row_reference(token_arrays):
    """The reduceat-vectorized batch kernel must equal the obvious
    per-row formulation (unpackbits → bit-majority → packbits) for
    every batch shape: empty batch, None rows, empty rows, single-row
    segments, full 64-bit range hashes."""
    from gpssbzd_spark.dataprep.dedup import _simhash64_udf

    kernel = _simhash64_udf.func

    def per_row(hashes):
        if hashes is None or len(hashes) == 0:
            return 0
        h = np.asarray(hashes, dtype=np.int64).view(np.uint64)
        bits = np.unpackbits(h.view(np.uint8).reshape(len(h), 8), axis=1)
        # signed votes: the uint64 formulation wraps for minority bits
        votes = bits.sum(axis=0).astype(np.int64) * 2 - len(h)
        return int(np.packbits((votes > 0).astype(np.uint8)).view(np.int64)[0])

    got = kernel(pd.Series(token_arrays, dtype=object)).tolist()
    want = [per_row(h) for h in token_arrays]
    assert got == want


def test_simhash_kernel_scratch_buffers_are_reused():
    """PERF_NOTES #14: the kernel must stay allocation-quiet — its
    large intermediates live in module-level scratch reused across
    calls (same backing buffer object), growing monotonically and
    never shrinking. A regression here silently reintroduces the
    per-batch >mmap-threshold allocations behind the r12 bimodal
    20x stall."""
    from gpssbzd_spark.dataprep import dedup

    kernel = dedup._simhash64_udf.func
    dedup._SIMHASH_SCRATCH.clear()
    rng = np.random.default_rng(7)
    batch = pd.Series(
        [rng.integers(-2**62, 2**62, size=40).tolist() for _ in range(200)],
        dtype=object,
    )
    kernel(batch)
    bufs1 = {k: id(v) for k, v in dedup._SIMHASH_SCRATCH.items()}
    sizes1 = {k: v.size for k, v in dedup._SIMHASH_SCRATCH.items()}
    assert {"votes", "flat", "lane"} <= set(bufs1)
    # same-shape batch: every buffer object must be reused, not realloc'd
    kernel(batch)
    assert {k: id(v) for k, v in dedup._SIMHASH_SCRATCH.items()} == bufs1
    # smaller batch: buffers never shrink
    kernel(batch.iloc[:10].reset_index(drop=True))
    assert {k: v.size for k, v in dedup._SIMHASH_SCRATCH.items()} == sizes1


def test_simhash_batch_kernel_256_token_row():
    """≥256 tokens on one row: a uint8 reduceat would wrap the vote
    counter exactly at 256 — the regression the int64 cast prevents."""
    from gpssbzd_spark.dataprep.dedup import _simhash64_udf

    row = [-1] * 300  # every bit set in all 300 tokens → majority all 64 bits
    out = _simhash64_udf.func(pd.Series([row, [0] * 300], dtype=object)).tolist()
    assert out == [-1, 0]


# ---------------------------------------------------------------------------
# merge_upsert replay property (operators/cdc.py): with an order column
# whose values are unique per key, folding change batches through the
# merge yields the max-order row per key REGARDLESS of application
# order — the exactly-once-state guarantee the streaming upsert sink
# leans on under out-of-order files and redelivery.
# ---------------------------------------------------------------------------

change_rows = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 1000), st.integers(0, 10**6)),
    min_size=1,
    max_size=24,
).map(
    # unique (key, ver) so ties cannot make the outcome order-dependent
    lambda rows: list({(k, v): (k, v, p) for k, v, p in rows}.values())
)


@given(change_rows, st.integers(1, 4), st.randoms(use_true_random=False))
@settings(max_examples=8, deadline=None)
def test_merge_upsert_fold_is_order_independent(spark, rows, n_batches, rnd):
    from gpssbzd_spark.operators.cdc import merge_upsert

    rnd.shuffle(rows)
    batches = [rows[i::n_batches] for i in range(n_batches)]
    batches = [b for b in batches if b]
    rnd.shuffle(batches)

    def collapse(b):
        # merge_upsert's contract: the caller collapses each batch to
        # one row per key first (upsert_parquet_sink does exactly this)
        best = {}
        for k, v, pld in b:
            if k not in best or v > best[k][1]:
                best[k] = (k, v, pld)
        return list(best.values())

    batches = [collapse(b) for b in batches]
    schema = "k long, ver long, payload long"
    state = spark.createDataFrame(batches[0], schema)
    for b in batches[1:]:
        state = merge_upsert(
            state, spark.createDataFrame(b, schema), ["k"], order_col="ver"
        )
    got = {r.k: (r.ver, r.payload) for r in state.collect()}

    expect: dict[int, tuple[int, int]] = {}
    for k, v, p in rows:
        if k not in expect or v > expect[k][0]:
            expect[k] = (v, p)
    assert got == expect


# ---------------------------------------------------------------------------
# blocked_pair_distances' grid-cover geometry (r11): the soundness of the
# eps-band rests on "any point within R km of a chord segment lands in the
# segment's sampled cell cover dilated +/-2". Proven here as a standalone
# geometric property with the SAME constants the column expressions use
# (cell s = slack*R/(km_per_deg*cos(phi)), sampling step <= s, Chebyshev
# dilation 2), over hypothesis-driven segments, offsets, and latitudes.
# ---------------------------------------------------------------------------

EARTH_RADIUS_KM = 6371.009
_KM_PER_DEG = math.pi * EARTH_RADIUS_KM / 180.0


def _cover_cells(x0, y0, x1, y1, s):
    """Mirror of the Spark cover: cells of <= s-spaced samples along the
    chord, dilated +/-2 in each axis (Chebyshev)."""
    n = max(1, math.ceil(max(abs(x1 - x0), abs(y1 - y0)) / s))
    cells = set()
    for k in range(n + 1):
        t = k / n
        cx = math.floor((x0 + (x1 - x0) * t) / s)
        cy = math.floor((y0 + (y1 - y0) * t) / s)
        for di in range(-2, 3):
            for dj in range(-2, 3):
                cells.add((cx + di, cy + dj))
    return cells


def _gc_km(lng1, lat1, lng2, lat2):
    h = (
        math.sin(math.radians(lat2 - lat1) / 2) ** 2
        + math.cos(math.radians(lat1))
        * math.cos(math.radians(lat2))
        * math.sin(math.radians(lng2 - lng1) / 2) ** 2
    )
    return 2 * EARTH_RADIUS_KM * math.asin(min(1.0, math.sqrt(h)))


@given(
    st.floats(-170.0, 170.0),          # segment origin lng
    st.floats(-80.0, 80.0),            # segment origin lat
    st.floats(-0.2, 0.2),              # chord delta lng (deg)
    st.floats(-0.2, 0.2),              # chord delta lat (deg)
    st.floats(0.0, 1.0),               # where along the segment
    st.floats(0.0, 2 * math.pi),       # offset bearing (planar)
    st.floats(0.0, 1.0),               # offset radius as fraction of R
    st.floats(0.2, 8.0),               # eps km
)
@settings(max_examples=300, deadline=None)
def test_blocked_grid_cover_contains_every_point_within_eps(
    lng0, lat0, dlng, dlat, t, bearing, rfrac, eps
):
    slack = 1.05
    R = eps
    phi = min(85.0, max(abs(lat0), abs(lat0 + dlat)) + R / _KM_PER_DEG)
    s = slack * R / (_KM_PER_DEG * math.cos(math.radians(phi)))
    # a point at planar-degree offset from somewhere on the segment,
    # scaled so its GREAT-CIRCLE distance to that anchor is <= R (the
    # hypothesis offset is shrunk until the gc check passes — the
    # property must hold for EVERY point within R km of the segment)
    ax = lng0 + dlng * t
    ay = lat0 + dlat * t
    # degree offset with the lng axis stretched by 1/cos(lat): up to
    # ~R km in any direction
    off_deg = rfrac * R / _KM_PER_DEG
    qx = ax + math.cos(bearing) * off_deg / max(
        0.05, math.cos(math.radians(ay))
    )
    qy = ay + math.sin(bearing) * off_deg
    if abs(qy) > 85.0:
        return  # outside the guard's domain
    if _gc_km(ax, ay, qx, qy) > R:
        return  # not actually within R of the segment — not our claim
    cover = _cover_cells(lng0, lat0, lng0 + dlng, lat0 + dlat, s)
    cell = (math.floor(qx / s), math.floor(qy / s))
    assert cell in cover, (
        f"point {_gc_km(ax, ay, qx, qy):.4f} km from the segment fell "
        f"outside the dilated cover: cell={cell} s={s:.6f} eps={eps}"
    )
