"""LLM-training-data pipeline extensions: dedup, similarity search,
text analysis, multimodal plumbing (BASELINE.json north star)."""

from .dedup import (
    cosine,
    embedding_dedup,
    exact_dedup,
    minhash_dedup,
    minhash_lsh_candidates,
    minhash_signature,
    ngram_jaccard_dedup,
    simhash64,
    simhash_dedup,
    word_shingles,
)
from .llm_inference import deterministic_fake_generate, run_llm_inference
from .similarity import cosine_topk, cosine_topk_pandas, knn_join_exact, knn_join_lsh, srp_bucket
from .text_analysis import (
    analyze_documents,
    bpe_ish_token_count,
    fingerprint64,
    language_id,
    quality_features,
    quality_score,
    token_count,
    winnowing_fingerprints,
)

__all__ = [
    "exact_dedup",
    "minhash_dedup",
    "minhash_signature",
    "minhash_lsh_candidates",
    "simhash64",
    "simhash_dedup",
    "ngram_jaccard_dedup",
    "embedding_dedup",
    "cosine",
    "word_shingles",
    "cosine_topk",
    "cosine_topk_pandas",
    "knn_join_exact",
    "knn_join_lsh",
    "srp_bucket",
    "analyze_documents",
    "run_llm_inference",
    "deterministic_fake_generate",
    "token_count",
    "bpe_ish_token_count",
    "quality_features",
    "quality_score",
    "language_id",
    "fingerprint64",
    "winnowing_fingerprints",
]
