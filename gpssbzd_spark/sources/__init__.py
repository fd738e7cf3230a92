from gpssbzd_spark.sources.tables import (  # noqa: F401
    TABLES,
    load_table,
    load_tables,
    register_views,
)
from gpssbzd_spark.sources.csv import (  # noqa: F401
    read_csv,
    GPS_SCHEMA,
    BUS_LINE_SCHEMA,
    LINE_PARAMS_SCHEMA,
    PATTERNS_SCHEMA,
    CLUSTERS_SCHEMA,
    read_gps,
    read_bus_line,
    read_line_params,
)
from gpssbzd_spark.sources.writers import write_partitioned  # noqa: F401
