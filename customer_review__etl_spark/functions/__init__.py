from .text import (
    STOPWORDS,
    clean_tokens,
    doc_fingerprint,
    normalize_text,
    quality_score_cols,
    token_count,
    tokens,
)
from .vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "STOPWORDS",
    "clean_tokens",
    "doc_fingerprint",
    "normalize_text",
    "quality_score_cols",
    "token_count",
    "tokens",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
