"""Text-normalization and text-analysis column expressions.

Re-expresses the reference's scalar workhorse `preprocess_text`
(cleaner.py:118-150, decomposed in SURVEY.md §2.6 as F1-F7) as native
Spark column expressions — JVM-side, whole-stage-codegen'd, no Python in
the hot path. Only Porter stemming (F6) needs Python (see stemmer.py).

Also provides the training-data-pipeline text analyses (language-ID
heuristic, quality scoring, token counting, document fingerprinting)
that run over the `documents` table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The English stopword core used by the reference via
# TfidfVectorizer(stop_words='english') / nltk stopwords
# (cleaner.py:109-116,144). A compact, fixed list keeps the engine
# dependency-free and the oracle SQL expressible.
STOPWORDS = [
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
    "if", "in", "into", "is", "it", "no", "not", "of", "on", "or",
    "such", "that", "the", "their", "then", "there", "these", "they",
    "this", "to", "was", "will", "with",
]

# Minimal per-language marker words for the n-gram/stopword language-ID
# heuristic (public-knowledge approach: score by marker-word hits).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "zh": ["de", "shi", "le", "zai", "he"],
}


def normalize_text(col: Column) -> Column:
    """F1-F3: null-guard → lowercase → strip non-letters.

    Mirrors cleaner.py:128-135 (`re.sub(r'[^a-z\\s]','',text.lower())`).
    """
    return F.regexp_replace(F.lower(F.coalesce(col, F.lit(""))), r"[^a-z\s]", "")


def tokens(col: Column) -> Column:
    """F4: whitespace tokenization of normalized text.

    Post-F3 the alphabet is [a-z ] so whitespace split ≡ word_tokenize
    (cleaner.py:138-141). Leading/trailing/repeated whitespace yields
    empty tokens, which clean_tokens filters.
    """
    return F.split(normalize_text(col), r"\s+")


def clean_tokens(col: Column) -> Column:
    """F4+F5: tokens with stopwords and len<=2 removed (cleaner.py:144-145).

    Higher-order `filter` keeps this JVM-side; no UDF.
    """
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.filter(
        tokens(col),
        lambda t: (F.length(t) > 2) & ~F.array_contains(stop, t),
    )


def token_count(col: Column) -> Column:
    """Whitespace token count of raw text (training-pipeline token stats)."""
    return F.size(F.split(col, " "))


def doc_fingerprint(col: Column) -> Column:
    """Deterministic content fingerprint: md5 of normalized text.

    Used for exact dedup at scale: group/join on a 128-bit digest
    instead of shuffling full document bodies.
    """
    return F.md5(normalize_text(col))


def quality_score_cols(text: Column) -> dict[str, Column]:
    """Document quality signals (length, stopword ratio, mean word len).

    The classic pre-training quality heuristics, all expressed as
    built-in column functions so they run inside codegen.
    """
    toks = F.split(text, " ")
    n_tokens = F.size(toks)
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    mean_word_len = (F.length(text) - n_tokens + 1) / n_tokens
    return {
        "n_chars": F.length(text),
        "n_tokens": n_tokens,
        "stopword_ratio": n_stop.cast("double") / n_tokens,
        "mean_word_len": mean_word_len.cast("double"),
    }


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-word hit counts per language, for the language-ID heuristic."""
    toks = F.split(F.lower(text), " ")
    out: dict[str, Column] = {}
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))
    return out
