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


CORPUS: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, note: str = ""):
    """Register a corpus query. ``oracle=None`` → rows-only check."""

    def deco(fn):
        assert name not in CORPUS, f"duplicate corpus query {name}"
        CORPUS[name] = Query(name=name, fn=fn, oracle=oracle, note=note)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: q.fn for name, q in CORPUS.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: q.oracle for name, q in CORPUS.items() if q.oracle is not None}


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
