"""Physical-plan lint: the engine's own plan-quality gates, exposed
as a library so USER queries get the same scrutiny.

The repo's test suite guards its built-in operators with plan
assertions (tests/test_plans.py: filters pushed, dims broadcast, no
Python workers). A user composing their own query against the engine
has none of that — and every failure mode is silent at small scale: a
row-at-a-time UDF runs fine on 60k rows and 100× too slow on 100 TB,
a nested-loop join "works" until the build side grows. ``audit_plan``
inspects a DataFrame's executed plan string and returns findings, so
a pipeline can assert `not audit_plan(df)` in its own tests the way
this repo does.

String-based on purpose: the executed-plan text is the one stable,
version-tolerant surface (the py4j node tree changes shape across
Spark versions; the operator names in the text do not).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class Finding:
    kind: str
    detail: str


def _plan_text(df: DataFrame, executed: bool = False) -> str:
    qe = df._jdf.queryExecution()
    plan = (qe.executedPlan() if executed else qe.sparkPlan()).toString()
    # drop the "== Initial Plan ==" echo AQE appends so nodes aren't
    # double-counted
    return plan.split("== Initial Plan ==")[0]


def audit_plan(
    df: DataFrame,
    max_python_stages: int = 0,
    executed: bool = False,
) -> list[Finding]:
    """Lint a DataFrame's physical plan for 100-TB anti-patterns.

    Returns a list of :class:`Finding` (empty = clean):

    - ``python-eval`` — ``BatchEvalPython`` (row-at-a-time Python UDF:
      ~10-100× slower than Arrow-batched) always flags;
      ``ArrowEvalPython``/``MapInPandas``/``FlatMapGroupsInPandas``
      stages flag only past ``max_python_stages`` (a deliberate kernel
      is fine; an accidental one is not);
    - ``cartesian`` — ``CartesianProduct`` or
      ``BroadcastNestedLoopJoin``: row-count products, the classic
      lost-join-key accident;
    - ``unpushed-filter`` — a scan whose DataFilters outnumber its
      PushedFilters: the difference is evaluated after a full read
      instead of pruning at the source (expression shapes like
      ``fn(col) = x`` block pushdown);
    - ``wide-scan`` — a parquet scan reading more than
      ``_WIDE_SCAN_COLS`` columns: usually a missing projection
      upstream of the first select.

    ``executed=True`` inspects the AQE-final plan (requires the query
    to have run); the default pre-execution plan needs no action and
    is what a unit test wants.
    """
    plan = _plan_text(df, executed=executed)
    findings: list[Finding] = []

    n_batch = len(re.findall(r"\bBatchEvalPython\b", plan))
    if n_batch:
        findings.append(
            Finding(
                "python-eval",
                f"{n_batch} BatchEvalPython stage(s): row-at-a-time "
                "Python UDF — rewrite as native columns or a pandas_udf",
            )
        )
    n_arrow = len(
        re.findall(
            r"\b(ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas)\b", plan
        )
    )
    if n_arrow > max_python_stages:
        findings.append(
            Finding(
                "python-eval",
                f"{n_arrow} Arrow/pandas stage(s) exceed the declared "
                f"budget of {max_python_stages}",
            )
        )

    for node in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        if re.search(rf"\b{node}\b", plan):
            findings.append(
                Finding(
                    "cartesian",
                    f"{node}: row-count-product join — check the join "
                    "condition has an equi component",
                )
            )

    # per-scan: every DataFilter predicate should also appear pushed;
    # a scan whose DataFilters outnumber its PushedFilters evaluates
    # the difference AFTER a full read of those rows (expression shapes
    # like fn(col) = x block pushdown). Both fields are extracted from
    # the SAME FileScan node text (they print on one node line), never
    # from two independent whole-plan passes — a plan mixing scan kinds
    # where one prints only one of the fields would misalign a zipped
    # pair and flag the wrong scan
    scan_pairs: list[tuple[int, int]] = []
    for line in plan.splitlines():
        if "FileScan" not in line:
            continue
        md = re.search(r"DataFilters: \[(.*?)\], Format:", line)
        mp = re.search(r"PushedFilters: \[(.*?)\], ReadSchema:", line)
        if md is None and mp is None:
            continue
        scan_pairs.append(
            (
                _top_level_items(md.group(1)) if md else 0,
                _top_level_items(mp.group(1)) if mp else 0,
            )
        )
    for i, (nd, np_) in enumerate(scan_pairs):
        if nd > np_:
            findings.append(
                Finding(
                    "unpushed-filter",
                    f"scan #{i}: {nd - np_} of {nd} filter predicate(s) "
                    "not pushed to the source — rewrite so the bare "
                    "column faces the comparison",
                )
            )

    # the FileScan's bracketed output list is never truncated (unlike
    # ReadSchema, which clips at spark.sql.maxMetadataStringLength)
    for m in re.finditer(r"FileScan \w+ \[([^\]]*)\]", plan):
        ncols = len([c for c in m.group(1).split(",") if c.strip()])
        if ncols > _WIDE_SCAN_COLS:
            findings.append(
                Finding(
                    "wide-scan",
                    f"scan reads {ncols} columns — add a projection so "
                    "column pruning reaches the source",
                )
            )

    return findings


def _top_level_items(s: str) -> int:
    """Count comma-separated items at bracket/paren depth 0 (filter
    expressions contain nested commas)."""
    s = s.strip()
    if not s:
        return 0
    depth, items = 0, 1
    for ch in s:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            items += 1
    return items


_WIDE_SCAN_COLS = 10


def assert_plan_clean(df: DataFrame, **kwargs) -> None:
    """Raise ``AssertionError`` listing every finding — the one-liner
    for user test suites."""
    findings = audit_plan(df, **kwargs)
    assert not findings, "plan audit: " + "; ".join(
        f"[{f.kind}] {f.detail}" for f in findings
    )
