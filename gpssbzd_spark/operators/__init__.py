from gpssbzd_spark.operators.windows import (  # noqa: F401
    forward_fill,
    backward_fill,
    segment_id,
    top_k_per_group,
    with_prev_next,
)
from gpssbzd_spark.operators.joins import (  # noqa: F401
    semi_join_keys,
    pair_join,
)
from gpssbzd_spark.operators.aggregates import (  # noqa: F401
    group_any,
    group_all_subgroups,
)
