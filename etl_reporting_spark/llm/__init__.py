from etl_reporting_spark.llm.dedup import (
    exact_dedup_map,
    shingle_docs,
    shingle_arrays,
    minhash_signatures,
    minhash_signatures_rowwise,
    lsh_candidate_pairs,
    jaccard_pairs,
    minhash_near_duplicates,
    simhash_signatures,
)
from etl_reporting_spark.llm.redact import pii_counts, redact_pii, redact_text
from etl_reporting_spark.llm.sampling import (
    deterministic_sample,
    hash_bucket,
    stratified_sample,
    with_hash_split,
)
from etl_reporting_spark.llm.similarity import cosine_topk_bruteforce, cosine_topk_lsh
from etl_reporting_spark.llm.textstats import (
    text_quality,
    language_id,
    document_fingerprint,
    repetition_stats,
)
from etl_reporting_spark.llm.multimodal import (
    with_binary_payload,
    decode_media_metadata,
)

__all__ = [
    "exact_dedup_map",
    "shingle_docs",
    "shingle_arrays",
    "minhash_signatures",
    "minhash_signatures_rowwise",
    "lsh_candidate_pairs",
    "jaccard_pairs",
    "minhash_near_duplicates",
    "simhash_signatures",
    "cosine_topk_bruteforce",
    "cosine_topk_lsh",
    "text_quality",
    "language_id",
    "document_fingerprint",
    "repetition_stats",
    "hash_bucket",
    "with_hash_split",
    "deterministic_sample",
    "stratified_sample",
    "redact_pii",
    "redact_text",
    "pii_counts",
    "with_binary_payload",
    "decode_media_metadata",
]
