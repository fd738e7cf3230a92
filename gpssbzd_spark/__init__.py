"""gpssbzd_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of UTBigdata/GPSSBZD (a GPS blind-zone detection pipeline for
urban bus fleets), extended with the operator surface a large-scale
training-data pipeline needs (dedup, similarity search, text analysis,
multimodal plumbing, streaming).

Design principles (see SURVEY.md §4, §7):

- DataFrame/SQL declarative plans; Catalyst + AQE pick physical strategy.
- No driver-side thread pools or collect() round-trips: per-line fan-out is
  expressed as one plan grouped/partitioned by key.
- Native column expressions (codegen-able) over UDFs; Arrow-batched
  pandas UDFs only where built-ins can't express the semantics
  (trajectory distance, DBSCAN).
- Parquet-first typed I/O; filters and projections reach the scan.
"""

__version__ = "0.1.0"

from gpssbzd_spark.session import get_session  # noqa: F401
