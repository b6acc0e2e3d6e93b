from pdf_etl_ocr_inference_spark.functions.text import (
    doc_fingerprint,
    language_id,
    normalize_text,
    quality_score,
    token_count,
    tokens,
    word_ngrams,
)
from pdf_etl_ocr_inference_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "doc_fingerprint",
    "language_id",
    "normalize_text",
    "quality_score",
    "token_count",
    "tokens",
    "word_ngrams",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
