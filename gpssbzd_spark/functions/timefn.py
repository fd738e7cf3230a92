"""Time column expressions.

Replaces the reference's ``timeDifference`` Scala UDF
(``Parallel/Pattern Extraction.scala:52-54``) with native
``unix_timestamp`` arithmetic — codegen-able, no UDF boundary
(SURVEY.md §2.10 U1).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def time_diff_seconds(t1: Column, t2: Column) -> Column:
    """Absolute difference in seconds between two timestamps."""
    return F.abs(F.unix_timestamp(t1) - F.unix_timestamp(t2))
