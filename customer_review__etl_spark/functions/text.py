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

# The classic NLTK English stopword list (public knowledge), which the
# reference loads via nltk.corpus.stopwords (cleaner.py:56,144).
# Apostrophe entries ("you're", "don't") are omitted: the F3 strip
# (cleaner.py:135) removes non-letters BEFORE tokenization, so such
# tokens can never occur; only letters-only entries are matchable.
# Kept as one shared constant so the DuckDB oracle SQL embeds the
# exact same list (see plans.helpers.sql_stopword_array).
STOPWORDS = [
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves",
    "you", "your", "yours", "yourself", "yourselves",
    "he", "him", "his", "himself", "she", "her", "hers", "herself",
    "it", "its", "itself", "they", "them", "their", "theirs",
    "themselves", "what", "which", "who", "whom", "this", "that",
    "these", "those", "am", "is", "are", "was", "were", "be", "been",
    "being", "have", "has", "had", "having", "do", "does", "did",
    "doing", "a", "an", "the", "and", "but", "if", "or", "because",
    "as", "until", "while", "of", "at", "by", "for", "with", "about",
    "against", "between", "into", "through", "during", "before",
    "after", "above", "below", "to", "from", "up", "down", "in",
    "out", "on", "off", "over", "under", "again", "further", "then",
    "once", "here", "there", "when", "where", "why", "how", "all",
    "any", "both", "each", "few", "more", "most", "other", "some",
    "such", "no", "nor", "not", "only", "own", "same", "so", "than",
    "too", "very", "s", "t", "can", "will", "just", "don", "should",
    "now", "d", "ll", "m", "o", "re", "ve", "y", "ain", "aren",
    "couldn", "didn", "doesn", "hadn", "hasn", "haven", "isn", "ma",
    "mightn", "mustn", "needn", "shan", "shouldn", "wasn", "weren",
    "won", "wouldn",
]

# Minimal per-language marker words for the language-ID heuristic
# (public-knowledge approach: score by marker-word hits). Only
# whitespace-tokenized languages belong here — Chinese is NOT
# whitespace-tokenized, so it is detected by script instead (CJK
# codepoint count, see lang_scores), never by romanized marker words.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
}

# CJK Unified Ideographs block (U+4E00–U+9FFF): one char of this script
# is stronger evidence of zh than any marker-word count.
CJK_RANGE = "一-鿿"


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

    Higher-order `filter` keeps this JVM-side; no UDF. The stopword
    membership test uses `isin`, which Catalyst lowers to a hash-set
    InSet — O(1) per token vs the O(|stopwords|) linear scan of
    array_contains (measured ~3× on the documents table).
    """
    return F.filter(
        tokens(col),
        lambda t: (F.length(t) > 2) & ~t.isin(*STOPWORDS),
    )


def raw_tokens(col: Column) -> Column:
    """Whitespace tokens of raw text, empties removed; NULL ≡ empty.

    Splits on ``\\s+`` and drops empty strings so repeated / leading /
    trailing whitespace never yields phantom tokens (single-space split
    would inflate counts and skew downstream ratios). NULL input
    coalesces to '' → zero tokens, never a NULL array (whose size() is
    engine-dependent).
    """
    return F.filter(
        F.split(F.coalesce(col, F.lit("")), r"\s+"), lambda t: F.length(t) > 0
    )


def token_count(col: Column) -> Column:
    """Whitespace token count of raw text (training-pipeline token stats)."""
    return F.size(raw_tokens(col))


def doc_fingerprint(col: Column) -> Column:
    """Deterministic content fingerprint: md5 of normalized text.

    Used for exact dedup at scale: group/join on a 128-bit digest
    instead of shuffling full document bodies.
    """
    return F.md5(normalize_text(col))


def quality_score_cols(text: Column) -> dict[str, Column]:
    """Document quality signals (length, stopword ratio, mean word len).

    The classic pre-training quality heuristics, all expressed as
    built-in column functions so they run inside codegen. Ratios are
    computed from exact integer sums followed by a single IEEE division
    so the DuckDB oracle twin reproduces them bit-for-bit.
    """
    toks = raw_tokens(F.lower(text))
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    sum_tok_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t).cast("long")
    )
    return {
        "n_chars": F.length(text).cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "stopword_ratio": n_stop.cast("double") / n_tokens.cast("double"),
        "mean_word_len": sum_tok_len.cast("double") / n_tokens.cast("double"),
    }


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language evidence counts for the language-ID heuristic:
    marker-word hits for whitespace-tokenized languages, CJK codepoint
    count for zh (Chinese text has no whitespace token boundaries, so
    marker words structurally cannot fire on it)."""
    toks = raw_tokens(F.lower(text))
    out: dict[str, Column] = {}
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))
    out["zh"] = F.length(
        F.regexp_replace(F.coalesce(text, F.lit("")), f"[^{CJK_RANGE}]", "")
    )
    return out
