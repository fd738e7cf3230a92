from gpssbzd_spark.functions.geo import haversine_m  # noqa: F401
from gpssbzd_spark.functions.timefn import time_diff_seconds  # noqa: F401
