from gpssbzd_spark.plans.pattern_extraction import (  # noqa: F401
    prepare_pings,
    extract_patterns,
)
from gpssbzd_spark.plans.trajectory_clustering import (  # noqa: F401
    assemble_trajectories,
    cluster_trajectories,
)
from gpssbzd_spark.plans.blind_zone import detect_blind_zones  # noqa: F401
