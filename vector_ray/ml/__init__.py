from vector_ray.ml.text import lang_id, quality_score, token_count, doc_fingerprint
from vector_ray.ml.dedup import (
    exact_dedup_docs,
    minhash_lsh_dedup,
    simhash_dedup,
)
from vector_ray.ml.ann import ann_brute_force, ann_lsh, ann_ivf
from vector_ray.ml.multimodal import decode_media, synthesize_media, MEDIA_SCHEMA

__all__ = [
    "lang_id",
    "quality_score",
    "token_count",
    "doc_fingerprint",
    "exact_dedup_docs",
    "minhash_lsh_dedup",
    "simhash_dedup",
    "ann_brute_force",
    "ann_lsh",
    "ann_ivf",
    "decode_media",
    "synthesize_media",
    "MEDIA_SCHEMA",
]
