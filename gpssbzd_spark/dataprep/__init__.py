from gpssbzd_spark.dataprep.dedup import (  # noqa: F401
    exact_dedup,
    char_shingles,
    minhash_signature,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    simhash64,
)
from gpssbzd_spark.dataprep.similarity import (  # noqa: F401
    cosine_similarity_col,
    cosine_from_parts,
    brute_force_topk,
    build_ivf_index,
    hyperplane_bucket,
    ivf_query,
    ivf_topk,
    lsh_topk,
)
from gpssbzd_spark.dataprep.text import (  # noqa: F401
    tokens,
    language_id,
    quality_features,
    doc_fingerprint,
)
