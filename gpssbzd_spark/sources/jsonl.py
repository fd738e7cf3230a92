"""JSON-lines ingest with declared schemas — never schema inference on
the hot path (inference re-reads the whole input before the real scan
even starts; at 100 TB that is a second full pass).

The reference has no JSON surface (its I/O is CSV-on-HDFS end-to-end,
``Parallel/Pattern Extraction.scala:38-45,255-256``); this is §2.11
extension surface: training-data corpora ship overwhelmingly as JSONL
(one document object per line), and the ``events.props`` fixture column
embeds JSON strings that need relational access.

Two distinct operations, kept separate on purpose:

- :func:`read_jsonl` — a SOURCE: scan ``*.jsonl``/``*.json`` files into
  typed rows. Column pruning pushes into Jackson (unprojected fields
  are never parsed), and corrupt lines land in a quarantine column
  instead of failing the job (PERMISSIVE +
  ``columnNameOfCorruptRecord``) — at corpus scale a malformed line is
  a certainty, and one bad record must not kill a 1000-executor read.
- :func:`parse_json_col` — a PROJECTION: ``from_json`` over an embedded
  JSON-string column (e.g. ``events.props``) with a declared struct
  schema, for when the payload rides inside an already-columnar table.
  Codegen'd JVM-side parse, no Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Typed JSONL scan. ``keep_corrupt=True`` appends ``_corrupt_record``
    (the raw line for rows that failed to parse; NULL for good rows) so
    callers can route bad lines to a quarantine sink instead of losing
    them silently — PERMISSIVE alone nulls the row out."""
    read_schema = schema
    if keep_corrupt and CORRUPT_COL not in schema.fieldNames():
        read_schema = T.StructType(
            schema.fields + [T.StructField(CORRUPT_COL, T.StringType())]
        )
    return (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .schema(read_schema)
        .json(path)
    )


def parse_json_col(col: Column, schema: T.StructType | str) -> Column:
    """``from_json`` with a declared schema over an embedded JSON-string
    column; malformed payloads yield NULL structs (never a crash)."""
    return F.from_json(col, schema)
