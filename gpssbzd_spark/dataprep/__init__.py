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
from gpssbzd_spark.dataprep.dedup import (  # noqa: F401
    embedding_cosine_pairs,
    embedding_lsh_pairs,
    embedding_lsh_portable,
    minhash_lsh_portable,
    neardup_clusters,
    neardup_dedup,
    simhash_near_pairs,
    simhash_portable,
)
from gpssbzd_spark.dataprep.text import (  # noqa: F401
    tokens,
    language_id,
    quality_features,
    doc_fingerprint,
    bpe_token_count,
    tfidf_terms,
    unigram_logprob,
    bigram_logprob,
)
from gpssbzd_spark.dataprep.splits import (  # noqa: F401
    hash_split,
    deterministic_sample,
    stratified_sample,
    seeded_shuffle,
    cap_per_group,
    chunk_documents,
)
from gpssbzd_spark.dataprep.decontam import contamination_pairs  # noqa: F401
from gpssbzd_spark.dataprep.multimodal import (  # noqa: F401
    media_from_binary,
    extract_features,
    extract_frames,
    resize_images,
    sample_frames,
    probe_video_meta,
    synth_media,
    synth_png_video,
)
from gpssbzd_spark.dataprep.scalegen import (  # noqa: F401
    inflate_documents,
    inflate_embeddings,
    inflate_events,
)
