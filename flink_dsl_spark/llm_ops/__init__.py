"""LLM-data-pipeline operators (north-star extension, SURVEY.md §7 /
BASELINE.json): deduplication, similarity search, text analysis,
multimodal columns.  All hot paths are JVM-side built-ins (higher-order
array functions, codegen-friendly); Python appears only in Arrow-batched
Pandas UDFs where genuinely needed (simhash bit-fold, multimodal decode).
"""

from .dedup import (
    cross_corpus_dup_pairs, dedup_against,
    dedup_survivors, dup_clusters, duplicate_spans, exact_dedup,
    line_dedup, ngram_containment_pairs, ngram_jaccard_pairs,
    minhash_lsh_pairs, minhash_signatures, md5_token_hash, simhash_pairs,
    simhash_64, embedding_dup_pairs, embedding_dup_pairs_lsh,
    soft_dedup,
)
from .simsearch import (cosine_topk, cosine_topk_batch,
                        cosine_topk_quantized, hybrid_topk,
                        ivf_ann_topk, lsh_ann_topk,
                        quantize_embeddings, random_projection,
                        rp_signs, rrf_fusion)
from .textstats import (
    bpe_pair_stats, c4_line_filter, chunk_documents, classifier_score,
    corpus_stats, curation_report, decontaminate,
    gopher_quality, gopher_repetition, html_strip, lang_id,
    ngram_lm_fit, ngram_lm_perplexity, ngram_novelty, pii_redact,
    bm25_scores, quality_score, token_stats, fingerprint, top_terms_tfidf,
    vocab_stats,
)
from .unicode_norm import nfc_normalize
from .sketch import (bloom_bitmap, bloom_decontaminate, cms_counts,
                     exact_quantiles, heavy_hitters, hll_estimate,
                     hll_registers, robust_outliers, topk_per_group)
from .bpe import bpe_encode, bpe_train
from .multimodal import (
    with_binary_column, decode_metadata, extract_features, resize_images,
    sample_frames,
)
from .assemble import (cap_per_group, domain_mixture,
                       domain_mixture_epochs,
                       domain_mixture_filter,
                       domain_mixture_temperature,
                       domain_mixture_temperature_weights,
                       temperature_scaled_weights,
                       md5_id_hash, pack_sequences,
                       priority_sample, priority_sample_stratified,
                       seeded_shuffle, shard_corpus, split_dataset,
                       stratified_sample, token_budget_sample)
from .cluster import kmeans, kmeans_assign, kmeans_fit, semdedup

__all__ = [
    "dedup_survivors", "dup_clusters", "exact_dedup",
    "ngram_jaccard_pairs", "ngram_containment_pairs",
    "minhash_lsh_pairs",
    "minhash_signatures", "md5_token_hash", "simhash_pairs", "simhash_64",
    "embedding_dup_pairs", "embedding_dup_pairs_lsh", "cosine_topk",
    "lsh_ann_topk", "ivf_ann_topk", "lang_id",
    "quantize_embeddings", "cosine_topk_quantized",
    "cosine_topk_batch", "rrf_fusion", "hybrid_topk",
    "random_projection", "rp_signs",
    "c4_line_filter", "decontaminate", "gopher_quality",
    "gopher_repetition", "pii_redact",
    "quality_score", "token_stats", "fingerprint",
    "chunk_documents",
    "bm25_scores", "top_terms_tfidf", "with_binary_column",
    "decode_metadata", "sample_frames", "resize_images", "extract_features",
    "md5_id_hash", "pack_sequences", "seeded_shuffle", "split_dataset",
    "stratified_sample",
    "line_dedup", "duplicate_spans", "token_budget_sample",
    "priority_sample", "priority_sample_stratified",
    "cap_per_group",
    "domain_mixture", "domain_mixture_epochs", "domain_mixture_filter",
    "shard_corpus",
    "corpus_stats",
    "cross_corpus_dup_pairs", "dedup_against", "classifier_score",
    "kmeans", "kmeans_assign", "kmeans_fit", "semdedup",
    "ngram_lm_fit", "ngram_lm_perplexity", "html_strip", "vocab_stats",
    "curation_report",
    "bpe_pair_stats", "nfc_normalize", "heavy_hitters",
    "bpe_train", "bpe_encode", "domain_mixture_temperature",
    "domain_mixture_temperature_weights", "temperature_scaled_weights",
    "hll_registers", "hll_estimate", "cms_counts",
    "bloom_bitmap", "bloom_decontaminate",
    "soft_dedup", "ngram_novelty", "exact_quantiles",
    "topk_per_group", "robust_outliers",
]
