"""Relational + extension operators, composed from Spark built-ins.

The reference delegates its entire downstream operator surface to the host
pipeline (its declared purpose is to feed a Joiner —
`TableStreamingSource.java:49-51`).  This package provides that surface
natively; SURVEY.md §2B is the inventory, one module per family.
"""

from table_streaming_source_spark.operators.joins import asof_join
from table_streaming_source_spark.operators.dedup import (
    connected_components,
    exact_dedup,
    fingerprint,
    minhash_signatures,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from table_streaming_source_spark.operators.similarity import (
    ann_index,
    ann_topk_lsh,
    cosine,
    cosine_topk,
    cosine_pairs_blocked,
    embedding_dedup,
    hyperplane_bucket,
    clear_ann_index_cache,
    ivf_assign,
    kmeans_refine,
    lsh_planes,
)
from table_streaming_source_spark.operators.text import (
    tokenize,
    token_stats,
    quality_score,
    language_id,
    tfidf_top_terms,
)
from table_streaming_source_spark.operators.multimodal import (
    with_content_address,
    decode_media,
    resize_media,
    sample_frames,
)
from table_streaming_source_spark.operators.windows import sessionize

__all__ = [
    "asof_join",
    "connected_components",
    "exact_dedup",
    "fingerprint",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "ann_index",
    "ann_topk_lsh",
    "cosine",
    "cosine_topk",
    "cosine_pairs_blocked",
    "embedding_dedup",
    "hyperplane_bucket",
    "clear_ann_index_cache",
    "ivf_assign",
    "kmeans_refine",
    "lsh_planes",
    "tokenize",
    "token_stats",
    "quality_score",
    "language_id",
    "tfidf_top_terms",
    "with_content_address",
    "decode_media",
    "resize_media",
    "sample_frames",
    "sessionize",
]
