"""Scalar function wrappers (SURVEY.md §2.8) + text analysis functions."""

from stockpy_spark.functions.scalar import (
    strip_time_suffix,
    to_date_col,
    nan_to_null,
    normalize_text,
)
from stockpy_spark.functions.text import (
    tokenize,
    token_count,
    char_ngrams,
    quality_features,
    quality_score,
    language_id,
    fingerprint_md5,
    cosine_similarity,
)

__all__ = [
    "strip_time_suffix",
    "to_date_col",
    "nan_to_null",
    "normalize_text",
    "tokenize",
    "token_count",
    "char_ngrams",
    "quality_features",
    "quality_score",
    "language_id",
    "fingerprint_md5",
    "cosine_similarity",
]
