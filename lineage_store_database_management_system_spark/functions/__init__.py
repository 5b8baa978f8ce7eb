from .vectors import cosine_similarity, dot_product, l2_norm
from .text import (
    char_ngrams,
    normalized_text,
    occurrence_count,
    token_count_col,
    word_shingles,
)

__all__ = [
    "char_ngrams",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "normalized_text",
    "occurrence_count",
    "token_count_col",
    "word_shingles",
]
