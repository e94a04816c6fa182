from noaa_oracle_spark.pipeline.dedup import (
    connected_components,
    exact_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_fingerprints,
)
from noaa_oracle_spark.pipeline.similarity import (
    brute_force_knn,
    embedding_cosine_pairs,
    ivf_knn,
    lsh_bucketed_knn,
)
from noaa_oracle_spark.pipeline.text import (
    document_fingerprint,
    language_id,
    quality_scores,
    token_counts,
)

__all__ = [
    "connected_components",
    "exact_dedup",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "simhash_fingerprints",
    "brute_force_knn",
    "embedding_cosine_pairs",
    "ivf_knn",
    "lsh_bucketed_knn",
    "document_fingerprint",
    "language_id",
    "quality_scores",
    "token_counts",
]
