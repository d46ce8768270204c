"""Training-data pipeline operators beyond the reference's surface:
text analysis, deduplication, similarity search, multimodal plumbing.

All hot paths are native Catalyst expressions; pandas UDFs appear only
where array-numeric work genuinely beats expression trees (documented
per function)."""

from vldt_spark.functions.text import (
    tokenize_documents,
    token_count,
    text_quality,
    language_score,
    fingerprint,
)
from vldt_spark.functions.dedup import (
    exact_duplicates,
    dedup_exact,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash,
    ngram_jaccard_pairs,
)
from vldt_spark.functions.similarity import (
    cosine_topk_bruteforce,
    lsh_bucketed_topk,
    embedding_near_duplicates,
)

__all__ = [
    "tokenize_documents",
    "token_count",
    "text_quality",
    "language_score",
    "fingerprint",
    "exact_duplicates",
    "dedup_exact",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
    "ngram_jaccard_pairs",
    "cosine_topk_bruteforce",
    "lsh_bucketed_topk",
    "embedding_near_duplicates",
]
