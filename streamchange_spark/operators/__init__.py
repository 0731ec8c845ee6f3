"""Spark DataFrame operators: detector scans, retention rollups, gap-fill,
Gorilla compression, dedup / similarity / text analysis."""

from .dedup import (
    cosine_col,
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingle_rows,
    shingles_col,
    simhash,
    simhash_pairs,
    tokens_col,
)
from .detect import (
    capa_anomalies,
    offline_pelt_segments,
    pelt_segments,
    segmentation_with_stats,
    sequential_scores,
    window_segmentor_changepoints,
)
from .gapfill import dense_grid, gapfill
from .gorilla import (
    compress_series,
    compression_ratio,
    decompress_series,
)
from .multimodal import (
    decode_image_features,
    extract_audio_features,
    extract_binary_meta,
    sample_video_frames,
)
from .rollup import (
    TIER_SECONDS,
    retention_filter,
    rollup_all_tiers,
    rollup_hopping,
    rollup_percentiles,
    rollup_raw,
    rollup_tier,
    with_avg,
)
from .corpus import clean_corpus, corpus_features, verdicts_from_features
from .dedup import (
    connected_components,
    contamination_flags,
    dedup_keep_ids,
    lsh_cluster_edges_from_signatures,
    lsh_pairs_from_signatures,
)
from .anomaly import rolling_zscore
from .asof import asof_join
from .sessions import session_stats, sessionize
from .plot_tables import figure_frames, figure_table, figure_table_multivariate
from .similarity import cosine_topk, cosine_topk_gemm, ivf_topk, lsh_ann_pairs
from .sampling import (
    cap_per_group,
    mixture_sample,
    sample_fraction,
    split_bucket_col,
    train_test_split,
    weighted_sample_k,
)
from .textstats import (
    fingerprint,
    lang_id,
    quality_features,
    repetition_features,
    scrub_pii,
    tfidf_topk,
)

__all__ = [
    "cap_per_group",
    "contamination_flags",
    "mixture_sample",
    "repetition_features",
    "train_test_split",
    "split_bucket_col",
    "sample_fraction",
    "TIER_SECONDS",
    "asof_join",
    "rolling_zscore",
    "scrub_pii",
    "session_stats",
    "sessionize",
    "tfidf_topk",
    "weighted_sample_k",
    "cosine_col",
    "clean_corpus",
    "connected_components",
    "corpus_features",
    "verdicts_from_features",
    "lsh_cluster_edges_from_signatures",
    "lsh_pairs_from_signatures",
    "cosine_topk",
    "cosine_topk_gemm",
    "decode_image_features",
    "dedup_keep_ids",
    "embedding_neardup_pairs",
    "exact_dedup",
    "extract_audio_features",
    "extract_binary_meta",
    "figure_frames",
    "figure_table",
    "figure_table_multivariate",
    "fingerprint",
    "lang_id",
    "ivf_topk",
    "lsh_ann_pairs",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "quality_features",
    "sample_video_frames",
    "shingle_rows",
    "shingles_col",
    "simhash",
    "simhash_pairs",
    "tokens_col",
    "capa_anomalies",
    "compress_series",
    "compression_ratio",
    "decompress_series",
    "dense_grid",
    "gapfill",
    "offline_pelt_segments",
    "pelt_segments",
    "retention_filter",
    "rollup_all_tiers",
    "rollup_hopping",
    "rollup_percentiles",
    "rollup_raw",
    "rollup_tier",
    "segmentation_with_stats",
    "sequential_scores",
    "window_segmentor_changepoints",
    "with_avg",
]
