from .text import (  # noqa: F401
    fingerprint,
    language_id,
    quality_score,
    shingles,
    token_count,
)
from .dedup import (  # noqa: F401
    exact_dedup,
    exact_duplicates,
    minhash_dedup_pairs,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_duplicates,
)
from .ann import (  # noqa: F401
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    cosine_topk_lsh,
    embedding_near_duplicates,
    ivf_assign,
    lsh_bucket,
)
from .multimodal import (  # noqa: F401
    attach_media,
    extract_features,
    resize_images,
    sample_frames,
)
from .curation import (  # noqa: F401
    deterministic_sample_n,
    hash_sample,
    stratified_sample,
    top_k_per_group,
)
