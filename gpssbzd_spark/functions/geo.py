"""Geospatial column expressions — native, codegen-able, no UDFs.

The reference wraps haversine in a Scala UDF registered for SQL strings
(``Parallel/Pattern Extraction.scala:56-65``, ``Parallel/Blind Zone
Detection.scala:33-44,51``), which is opaque to whole-stage codegen and
blocks pushdown. Here it is a pure ``pyspark.sql.functions`` trig
expression, so Catalyst folds it into codegen spans and the Python worker
is never involved (SURVEY.md §2.8 F3, §4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371000.0

# ~40 km/h in m/s: the reference's plausibility bound for demoting a
# signal-loss gap when the bus only moved a short distance
# (``Standalone/Pattern Extraction.scala:93``: `11.11*(threshold-1)`).
PLAUSIBLE_SPEED_MPS = 11.11


def haversine_m(lat1: Column, lng1: Column, lat2: Column, lng2: Column) -> Column:
    """Great-circle distance in meters (R=6,371,000 m as in the reference).

    Argument order is (lat, lng) pairs — the reference's ``fastHaversine``
    is called as ``(u.lat, u.lng, b.x, b.y)`` (``Parallel/Pattern
    Extraction.scala:103``), i.e. ``x``=lat, ``y``=lng.
    """
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlng = F.radians(lng2 - lng1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlng / 2) ** 2
    )
    # clamp: rounding can push a to 1+4e-16 for near-antipodal points,
    # making sqrt(1-a) NaN — and a NaN distance PASSES every
    # "distance > threshold" gate (Spark orders NaN above all doubles)
    a = F.least(F.lit(1.0), a)
    return F.lit(2.0 * EARTH_RADIUS_M) * F.atan2(F.sqrt(a), F.sqrt(1 - a))


def register_sql_fns(spark) -> None:
    """Register ``fast_haversine`` for SQL-string use (SURVEY.md §2.10 U2).

    The reference registers a Scala UDF so SQL-string snippets can call
    ``fastHaversine(...)`` inside ``expr()`` / ``spark.sql`` (``Parallel/
    Pattern Extraction.scala:56-65``, called at ``:103,111``). Here it is
    a Spark SQL *scalar function* (``CREATE TEMPORARY FUNCTION ... RETURN
    <expr>``) whose body is the same native trig expression as
    :func:`haversine_m` — Catalyst inlines it into whole-stage codegen
    (constant-folding literal args), so SQL-string parity costs nothing:
    no Python worker, no UDF black box, pushdown preserved. Idempotent
    (CREATE OR REPLACE); call once per session.
    """
    body = haversine_sql("lat1", "lng1", "lat2", "lng2")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION fast_haversine("
        "lat1 DOUBLE, lng1 DOUBLE, lat2 DOUBLE, lng2 DOUBLE) "
        f"RETURNS DOUBLE RETURN {body}"
    )


def haversine_sql(lat1: str, lng1: str, lat2: str, lng2: str) -> str:
    """The same formula as an ANSI-SQL string (for oracles / spark.sql),
    including the same near-antipodal clamp as :func:`haversine_m`."""
    h = (
        f"pow(sin(radians(({lat2}) - ({lat1})) / 2), 2)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * pow(sin(radians(({lng2}) - ({lng1})) / 2), 2)"
    )
    return (
        f"2.0 * {EARTH_RADIUS_M} * atan2("
        f"sqrt(least(1.0, {h})), "
        f"sqrt(1 - least(1.0, {h})))"
    )
