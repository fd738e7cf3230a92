from gpssbzd_spark.operators.windows import (  # noqa: F401
    forward_fill,
    backward_fill,
    segment_id,
    top_k_per_group,
    with_prev_next,
)
from gpssbzd_spark.operators.joins import (  # noqa: F401
    semi_join_keys,
    anti_join_keys,
    pair_join,
    asof_join_backward,
    asof_join_forward,
    range_join_broadcast,
    interval_overlap_join,
)
from gpssbzd_spark.operators.aggregates import (  # noqa: F401
    group_any,
    group_all_subgroups,
)
from gpssbzd_spark.operators.skew import salted_join  # noqa: F401
from gpssbzd_spark.operators.cdc import (  # noqa: F401
    merge_upsert,
    snapshot_diff,
    scd2_history,
)
from gpssbzd_spark.operators.funnel import (  # noqa: F401
    funnel_counts,
    funnel_times,
    retention_matrix,
    transition_matrix,
)
from gpssbzd_spark.operators.timeseries import (  # noqa: F401
    time_bucket,
    time_bucket_gapfill,
)
from gpssbzd_spark.operators.profile import (  # noqa: F401
    profile_numeric,
    profile_correlation,
    outliers_mad,
    drift_psi,
)
