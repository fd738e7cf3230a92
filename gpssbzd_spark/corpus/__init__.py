"""Query corpus: named queries + DuckDB oracle SQL (the correctness gate).

Every operator from SURVEY.md §2 has at least one named query here, built
with the engine's DataFrame-first operators, plus an equivalent ANSI-SQL
string the driver runs on DuckDB over the same parquet tables. Column
names/types are aligned on both sides; float outputs are rounded so the
order-insensitive value-hash is stable across engines.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    note: str = ""
    tier: int = 0
    seq: int = 0


CORPUS: dict[str, Query] = {}

# The driver's correctness gate compares the FIRST `DRIVER_WINDOW`
# registered queries against their DuckDB oracles; later registrations
# still run under pytest (tests/test_corpus_oracle.py) but get no
# driver CORRECTNESS row. Tier 0 is therefore the curated 50-query
# diagnostic set — exactly one (or one merged) query per SURVEY.md §2
# component — and higher tiers are extra evidence sorted past the cap.
DRIVER_WINDOW = 50


def query(name: str, oracle: str | None = None, note: str = "", tier: int = 0):
    """Register a corpus query. ``oracle=None`` → rows-only check.

    ``tier`` orders the registry the driver sees: tier 0 sorts into the
    driver's correctness window, tier >= 1 past it (stable by
    registration order within a tier).
    """

    def deco(fn):
        assert name not in CORPUS, f"duplicate corpus query {name}"
        CORPUS[name] = Query(
            name=name, fn=fn, oracle=oracle, note=note, tier=tier, seq=len(CORPUS)
        )
        return fn

    return deco


def _ordered() -> list[Query]:
    _load_all()
    return sorted(CORPUS.values(), key=lambda q: (q.tier, q.seq))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.fn for q in _ordered()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in _ordered() if q.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import corpus modules for their registration side effects."""
    global _LOADED
    if _LOADED:
        return
    from gpssbzd_spark.corpus import (  # noqa: F401
        core,
        dataprep,
        pipelines,
        streaming,
        windows,
    )

    _LOADED = True
