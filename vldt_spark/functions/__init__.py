"""Training-data pipeline operators beyond the reference's surface:
text analysis, deduplication, similarity search, multimodal plumbing.

All hot paths are native Catalyst expressions; pandas UDFs appear only
where array-numeric work genuinely beats expression trees (documented
per function)."""

from vldt_spark.functions.text import (
    tokenize_documents,
    token_count,
    bpe_ish_token_count,
    text_quality,
    classifier_quality_score,
    quality_classifier_filter,
    language_score,
    language_id,
    fingerprint,
    winnowing_fingerprints,
    fingerprint_summary,
)
from vldt_spark.functions.dedup import (
    exact_duplicates,
    paragraph_dedup,
    dedup_exact,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash,
    simhash_near_pairs,
    ngram_jaccard_pairs,
    duplicated_ngram_fraction,
    near_dup_clusters,
    dedup_near,
    contamination_report,
    decontaminate,
)
from vldt_spark.functions.similarity import (
    cosine_topk_bruteforce,
    lsh_bucketed_topk,
    ivf_topk,
    kmeans_centroids,
    embedding_near_duplicates,
)
from vldt_spark.functions.sampling import (
    deterministic_sample,
    stratified_cap,
    split_assign,
    temperature_sample,
    importance_sample,
    mixture_report,
)
from vldt_spark.functions.packing import chunk_layout
from vldt_spark.functions.weburl import (
    parse_urls,
    normalize_url,
    registrable_domain,
    domain_report,
    blocklist_filter,
    url_dedup,
    domain_cap,
)
from vldt_spark.functions.tokens import (
    token_histogram,
    oov_report,
    vocab_coverage,
    token_bigram_topk,
    special_token_violations,
)
from vldt_spark.functions.jpegcodec import encode_jpeg, decode_jpeg
from vldt_spark.functions.bpe import (
    bpe_encode,
    learn_bpe,
    bpe_vocab,
    bpe_encode_ids,
    bpe_decode_ids,
)
from vldt_spark.functions.sessions import sessionize, session_stats
from vldt_spark.functions.multimodal import (
    extract_features,
    parse_media_headers,
    synthesize_header_payloads,
)

__all__ = [
    "tokenize_documents",
    "token_count",
    "text_quality",
    "classifier_quality_score",
    "quality_classifier_filter",
    "language_score",
    "fingerprint",
    "exact_duplicates",
    "dedup_exact",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
    "ngram_jaccard_pairs",
    "duplicated_ngram_fraction",
    "chunk_layout",
    "split_assign",
    "parse_urls",
    "normalize_url",
    "registrable_domain",
    "domain_report",
    "blocklist_filter",
    "url_dedup",
    "domain_cap",
    "token_histogram",
    "oov_report",
    "vocab_coverage",
    "token_bigram_topk",
    "special_token_violations",
    "encode_jpeg",
    "decode_jpeg",
    "bpe_encode",
    "learn_bpe",
    "bpe_vocab",
    "bpe_encode_ids",
    "bpe_decode_ids",
    "contamination_report",
    "decontaminate",
    "cosine_topk_bruteforce",
    "lsh_bucketed_topk",
    "ivf_topk",
    "kmeans_centroids",
    "embedding_near_duplicates",
    "bpe_ish_token_count",
    "language_id",
    "winnowing_fingerprints",
    "fingerprint_summary",
    "simhash_near_pairs",
    "near_dup_clusters",
    "dedup_near",
    "deterministic_sample",
    "stratified_cap",
    "paragraph_dedup",
    "sessionize",
    "session_stats",
    "temperature_sample",
    "importance_sample",
    "mixture_report",
    "extract_features",
    "parse_media_headers",
    "synthesize_header_payloads",
]
