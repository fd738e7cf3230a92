"""Differential tests: every corpus query vs its DuckDB oracle at sf0.001.

This mirrors the driver's CORRECTNESS gate (which runs at sf0.01); tests
run on sf0.001 for speed. Queries without an oracle get a rows-only
sanity check.
"""

from __future__ import annotations

import pytest

from gpssbzd_spark import corpus
from tests.oracle_utils import compare, run_oracle

corpus._load_all()
ALL = sorted(corpus.CORPUS)


@pytest.mark.parametrize("name", ALL)
def test_query_vs_oracle(spark, sf_dir, name):
    q = corpus.CORPUS[name]
    df = q.fn(spark, sf_dir)
    if q.oracle is None:
        assert df.count() >= 0  # rows-only: runs and has a stable schema
        return
    compare(df, run_oracle(q.oracle, sf_dir), name)
