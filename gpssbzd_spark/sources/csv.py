"""CSV ingest with declared schemas — never ``inferSchema`` on the hot path.

Schemas mirror the reference's input tables (SURVEY.md §1.1):

- ``gps`` — raw pings, header ``id,linenumber,opath,lng,lat,t``
  (``Sample Data/gps.csv:1``). Timestamps are 2-digit-year strings
  (``yy-MM-dd HH:mm:ss``); we parse once at ingest to TimestampType
  instead of re-parsing at each use (``Parallel/Pattern
  Extraction.scala:68``, ``Standalone/Pattern Extraction.scala:74``).
- ``bus_line`` — semicolon-delimited route terminals; schema inferred
  from usage since the upstream file is missing
  (``Parallel/Pattern Extraction.scala:42-45,96-103``).
- ``lines95_parameter`` — per-line DBSCAN params, explicitly typed as in
  ``Parallel/Trajectory Clustering.py:36-44``.
- ``patterns`` / ``clusters`` — inter-stage tables, declared schemas from
  ``Parallel/Trajectory Clustering.py:27-34`` and its output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Raw gps file: all strings on disk (stringly-typed CSV), typed at ingest.
GPS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("linenumber", T.StringType()),
        T.StructField("opath", T.StringType()),
        T.StructField("lng", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("t", T.StringType()),
    ]
)

BUS_LINE_SCHEMA = T.StructType(
    [
        T.StructField("existLine_id", T.StringType()),
        T.StructField("x", T.DoubleType()),  # terminal latitude
        T.StructField("y", T.DoubleType()),  # terminal longitude
        T.StructField("direction", T.IntegerType()),  # 1|2|null (null→2)
        T.StructField("position", T.IntegerType()),  # 1 marks terminal stops
    ]
)

LINE_PARAMS_SCHEMA = T.StructType(
    [
        T.StructField("linenumber", T.StringType()),
        T.StructField("eps", T.FloatType()),
        T.StructField("min_samples", T.IntegerType()),
    ]
)

PATTERNS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("lng", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("t", T.StringType()),
        T.StructField("patternID", T.StringType()),
        T.StructField("linenumber", T.StringType()),
    ]
)

CLUSTERS_SCHEMA = T.StructType(
    PATTERNS_SCHEMA.fields + [T.StructField("cluster", T.IntegerType())]
)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    delimiter: str = ",",
    header: bool = True,
) -> DataFrame:
    """Typed CSV scan (S1-S4 in SURVEY.md §2.1)."""
    return (
        spark.read.option("header", header)
        .option("delimiter", delimiter)
        .schema(schema)
        .csv(path)
    )


def parse_ping_time(col, fmts: tuple[str, ...] = ("yy-MM-dd HH:mm:ss", "yyyy-MM-dd HH:mm:ss")):
    """Parse ping time strings that may carry 2- or 4-digit years.

    The reference parses ``yy-MM-dd HH:mm:ss`` at stage 1 and
    ``yyyy-MM-dd HH:mm:ss`` at stages 2-3 (SURVEY.md §2.8 F1); we accept
    both and normalize once at ingest.
    """
    parsed = None
    for fmt in fmts:
        attempt = F.try_to_timestamp(col, F.lit(fmt))
        parsed = attempt if parsed is None else F.coalesce(parsed, attempt)
    return parsed


def read_gps(spark: SparkSession, path: str) -> DataFrame:
    """gps pings with ``t`` normalized to TimestampType as ``ts``."""
    df = read_csv(spark, path, GPS_SCHEMA)
    return df.withColumn("ts", parse_ping_time(F.col("t")))


def read_bus_line(spark: SparkSession, path: str) -> DataFrame:
    """Semicolon-delimited terminals; null direction → 2 as in
    ``Parallel/Pattern Extraction.scala:85-86``."""
    df = read_csv(spark, path, BUS_LINE_SCHEMA, delimiter=";")
    return df.withColumn("direction", F.coalesce(F.col("direction"), F.lit(2)))


def read_line_params(spark: SparkSession, path: str) -> DataFrame:
    """Per-line DBSCAN params. The reference collects these to a driver
    dict (``Parallel/Trajectory Clustering.py:45``); we keep them as a
    broadcastable DataFrame and only materialize a dict at the
    applyInPandas boundary (small: O(10^2) rows). The declared schema
    names the key ``linenumber`` even though the sample header says
    ``new_linenumber`` — header row is skipped, schema names win."""
    return read_csv(spark, path, LINE_PARAMS_SCHEMA)
