"""Shared manifest machinery (dataprep/manifest.py) — the ONE
implementation of commit-part write / supersedence / dedupe / orphan
sweep behind all three persisted indexes (VERDICT r13 what's-wrong #1:
three near-copies of crash-critical code is the class that produced
the r12 LSH init-doubling bug). Property tests here cover the
mechanics ONCE; the index modules' own kill-point tests keep covering
their domain recipes."""

from __future__ import annotations

import json
import os

from hypothesis import given, settings
from hypothesis import strategies as st

from gpssbzd_spark.dataprep import manifest


# ---------------------------------------------------------------------------
# supersedence chains (property)
# ---------------------------------------------------------------------------

# a random history: each step either appends a fresh batch or compacts
# a random non-empty subset of the CURRENT frontier into a new batch
@st.composite
def _histories(draw):
    n_steps = draw(st.integers(min_value=1, max_value=12))
    records: list[dict] = []
    frontier: list[str] = []
    next_id = 0
    for _ in range(n_steps):
        compact = frontier and draw(st.booleans())
        bid = f"b{next_id}"
        next_id += 1
        if compact:
            k = draw(st.integers(min_value=1, max_value=len(frontier)))
            folded = draw(
                st.permutations(frontier).map(lambda p, k=k: sorted(p[:k]))
            )
            records.append({"batch_id": bid, "replaces": folded})
            frontier = [b for b in frontier if b not in set(folded)]
        else:
            records.append({"batch_id": bid})
        frontier.append(bid)
    return records, frontier


@settings(max_examples=200, deadline=None)
@given(_histories())
def test_supersedence_chains_resolve_to_the_frontier(hist):
    """For ANY append/compact history — chained compactions, partial
    folds, compactions of compactions — the surviving records are
    exactly the simulated frontier, in input order. This is the rule
    every reader of every index relies on: a replaced batch is never
    consulted again, a never-replaced batch is never dropped."""
    records, frontier = hist
    out = manifest.resolve_supersedence(
        records, ident=lambda r: r["batch_id"]
    )
    assert [r["batch_id"] for r in out] == frontier


@settings(max_examples=100, deadline=None)
@given(_histories(), st.randoms())
def test_supersedence_is_order_insensitive_in_the_replaced_set(hist, rng):
    """Manifest parts list in filesystem order, not commit order — the
    REPLACED SET must come out identical under any record shuffle
    (resolution unions ``replaces`` over ALL records first)."""
    records, frontier = hist
    shuffled = list(records)
    rng.shuffle(shuffled)
    out = manifest.resolve_supersedence(
        shuffled, ident=lambda r: r["batch_id"]
    )
    assert sorted(r["batch_id"] for r in out) == sorted(frontier)


def test_supersedence_with_custom_ident_matches_by_name():
    """The sigindex flavor: records identify batches by DIR, replaces
    lists dir spellings that may differ (FS-qualified vs caller's) —
    matching by basename must still fold them."""
    records = [
        {"batch": "file:/idx/sigs/batch-a", "files": []},
        {"batch": "/idx/sigs/batch-b", "files": []},
        {
            "batch": "/idx/sigs/batch-compact-1",
            "files": [],
            "replaces": ["/idx/sigs/batch-a", "file:/idx/sigs/batch-b"],
        },
    ]
    out = manifest.resolve_supersedence(
        records,
        ident=lambda r: manifest.basename(r["batch"]),
        replaced_ids=lambda r: [
            manifest.basename(d) for d in (r.get("replaces") or ())
        ],
    )
    assert [r["batch"] for r in out] == ["/idx/sigs/batch-compact-1"]


# ---------------------------------------------------------------------------
# dedupe (the r12 init-doubling class)
# ---------------------------------------------------------------------------


def test_dedupe_prefers_fixed_parts_deterministically():
    """Two records for the same batch_id — a legacy uuid-named part
    and the fixed-path ``part-init.jsonl`` rewritten by a rebuild —
    must dedupe to the FIXED part's record in either listing order
    (ADVICE r13: the old first-after-sort tie-break fell through to
    os.listdir order, so the recorded ``n`` was a coin flip)."""
    legacy = ("part-0abc.jsonl", {"batch_id": "init", "n": 10, "seq": 0})
    fixed = ("part-init.jsonl", {"batch_id": "init", "n": 25, "seq": 0})
    for order in ([legacy, fixed], [fixed, legacy]):
        out = manifest.dedupe_records(
            order,
            ident=lambda r: r["batch_id"],
            prefer_parts=("part-init.jsonl",),
        )
        assert out == [{"batch_id": "init", "n": 25, "seq": 0}]


def test_dedupe_without_preference_is_stable_by_part_name():
    a = ("part-aaaa.jsonl", {"batch_id": "d1", "n": 1})
    b = ("part-bbbb.jsonl", {"batch_id": "d1", "n": 2})
    for order in ([a, b], [b, a]):
        out = manifest.dedupe_records(order, ident=lambda r: r["batch_id"])
        assert out == [{"batch_id": "d1", "n": 1}]


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["part-a.jsonl", "part-b.jsonl", "part-c.jsonl"]),
            st.sampled_from(["x", "y", "z"]),
            st.integers(),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_dedupe_yields_one_record_per_ident(entries):
    parts_records = [(p, {"batch_id": i, "v": v}) for p, i, v in entries]
    out = manifest.dedupe_records(parts_records, ident=lambda r: r["batch_id"])
    ids = [r["batch_id"] for r in out]
    assert len(ids) == len(set(ids))
    assert set(ids) == {i for _, i, _ in entries}


# ---------------------------------------------------------------------------
# commit-part write + read (os backend; the crash contract)
# ---------------------------------------------------------------------------


def test_write_part_commit_and_crash_invisibility(tmp_path):
    mdir = str(tmp_path / "manifest")
    manifest.write_part(mdir, {"batch_id": "d1"})
    manifest.write_part(mdir, {"batch_id": "d2"})
    # a crashed mid-write temp and a foreign file must be invisible
    with open(os.path.join(mdir, ".tmp-deadbeef"), "w") as fh:
        fh.write('{"batch_id": "torn"')
    with open(os.path.join(mdir, "notes.txt"), "w") as fh:
        fh.write("not a part")
    got = sorted(
        rec["batch_id"] for _, rec in manifest.read_parts(mdir)
    )
    assert got == ["d1", "d2"]


def test_write_part_fixed_name_overwrites_not_appends(tmp_path):
    mdir = str(tmp_path / "manifest")
    manifest.write_part(
        mdir, {"batch_id": "init", "n": 1}, fixed_name="part-init.jsonl"
    )
    manifest.write_part(
        mdir, {"batch_id": "init", "n": 9}, fixed_name="part-init.jsonl"
    )
    parts = manifest.read_parts(mdir)
    assert len(parts) == 1
    assert parts[0] == ("part-init.jsonl", {"batch_id": "init", "n": 9})


def test_read_parts_missing_dir_is_empty(tmp_path):
    assert manifest.read_parts(str(tmp_path / "nope")) == []


def test_write_part_record_roundtrips_exactly(tmp_path):
    mdir = str(tmp_path / "m")
    rec = {"batch_id": "b", "n": 3, "shares": {"0": 0.5}, "replaces": ["a"]}
    path = manifest.write_part(mdir, rec)
    with open(path) as fh:
        assert json.loads(fh.read()) == rec
    assert manifest.read_parts(mdir)[0][1] == rec


# ---------------------------------------------------------------------------
# orphan sweep + post-compaction GC (os backend)
# ---------------------------------------------------------------------------


def _mkdirs(parent, names):
    for n in names:
        os.makedirs(os.path.join(parent, n), exist_ok=True)
        with open(os.path.join(parent, n, "part-0.parquet"), "w") as fh:
            fh.write("x")


def test_sweep_orphans_deletes_only_uncommitted_prefix_dirs(tmp_path):
    parent = str(tmp_path / "sigs")
    _mkdirs(parent, ["batch-a", "batch-b", "batch-orphan", "other-dir"])
    deleted = manifest.sweep_orphan_dirs(
        parent,
        {"batch-a"},
        keep_names={"batch-b"},
        prefix="batch-",
    )
    assert deleted == ["batch-orphan"]
    assert sorted(os.listdir(parent)) == ["batch-a", "batch-b", "other-dir"]


def test_delete_dirs_best_effort(tmp_path):
    parent = str(tmp_path / "batches")
    _mkdirs(parent, ["d1", "d2"])
    manifest.delete_dirs(
        [os.path.join(parent, "d1"), os.path.join(parent, "missing")]
    )
    assert sorted(os.listdir(parent)) == ["d2"]


# ---------------------------------------------------------------------------
# Hadoop-FS backend (sigindex's path) + cross-module routing
# ---------------------------------------------------------------------------


def test_fs_backend_roundtrip_and_sweep(spark, tmp_path):
    mdir = str(tmp_path / "manifest")
    manifest.write_part(mdir, {"batch": "/idx/sigs/batch-a"}, spark=spark)
    manifest.write_part(mdir, {"batch": "/idx/sigs/batch-b"}, spark=spark)
    got = sorted(
        rec["batch"] for _, rec in manifest.read_parts(mdir, spark=spark)
    )
    assert got == ["/idx/sigs/batch-a", "/idx/sigs/batch-b"]
    assert manifest.read_parts(str(tmp_path / "nope"), spark=spark) == []
    parent = str(tmp_path / "sigs")
    _mkdirs(parent, ["batch-a", "batch-keep", "batch-orphan"])
    deleted = manifest.sweep_orphan_dirs(
        parent,
        {"batch-a"},
        keep_names={"batch-keep"},
        prefix="batch-",
        spark=spark,
    )
    assert deleted == ["batch-orphan"]
    assert sorted(os.listdir(parent)) == ["batch-a", "batch-keep"]
    manifest.delete_dirs([os.path.join(parent, "batch-a")], spark=spark)
    assert sorted(os.listdir(parent)) == ["batch-keep"]


def test_all_three_index_modules_route_through_shared_resolution(
    monkeypatch,
):
    """The consolidation's point: sigindex/ivfindex/lshindex must not
    re-grow private supersedence copies. Count calls into the shared
    resolver from each module's committed-batch reader."""
    import gpssbzd_spark.dataprep.ivfindex as ivfmod
    import gpssbzd_spark.dataprep.lshindex as lshmod
    import gpssbzd_spark.dataprep.sigindex as sigmod

    calls: list[str] = []
    real = manifest.resolve_supersedence

    def counting(records, **kw):
        calls.append("resolve")
        return real(records, **kw)

    monkeypatch.setattr(manifest, "resolve_supersedence", counting)
    ivfmod._apply_compactions([{"batch_id": "a"}])
    assert calls == ["resolve"]
    lshmod.lsh_index_batches("/nonexistent-index-dir")
    assert calls == ["resolve", "resolve"]
    # sigindex resolves inside _read_index_manifest; empty manifest dir
    # short-circuits before the resolver, so feed it one record
    monkeypatch.setattr(
        manifest,
        "read_parts",
        lambda mdir, spark=None: [("p.jsonl", {"batch": "/s/batch-a"})],
    )
    covered, batches = sigmod._read_index_manifest(None, "/any")
    assert calls == ["resolve", "resolve", "resolve"]
    assert batches == {"/s/batch-a"}
