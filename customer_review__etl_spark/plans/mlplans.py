"""ML plans (SURVEY.md §2.7): the LDA theme pipeline and RF classifier
as driver-visible queries.

ml01/ml02/ml04 are ⊘ non-SQL-expressible (pyspark.ml estimators) →
rows-only checks, paired with invariant assertions in
tests/test_ml.py (topic ∈ [0,5), theme non-null ⇔ topic ∈ labels,
metrics ∈ [0,1], split exactness). ml03 (the deterministic md5 split,
M6) IS SQL-expressible and gets a full oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ml import pipeline as P
from ..sources import tables
from . import QuerySpec


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.load_parallel(spark, sf_dir, "documents")


def ml01_lda_themes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1-M5: TF-IDF(1,2-grams) → LDA(k=5, seed=42) → argmax topic →
    verbatim theme label (cleaner.py:152-223)."""
    toks = P.with_tokens(_docs(spark, sf_dir))
    _, transformed = P.fit_lda(toks)
    return P.assign_topics(transformed).select("doc_id", "topic", "theme")


def ml02_topic_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4: top-10 terms per topic (cleaner.py:204-208)."""
    toks = P.with_tokens(_docs(spark, sf_dir))
    model, _ = P.fit_lda(toks)
    return P.topic_top_words(model, 10)


def ml03_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6: deterministic content-addressed 80/20 split — md5(doc_id)
    first byte < 0xcd trains. Exactly reproducible in ANSI SQL, unlike
    RNG-based sampleBy (SURVEY §7 risk (e))."""
    return P.md5_split(_docs(spark, sf_dir), "doc_id").select(
        "doc_id", "lang", "split"
    )


def ml04_classifier_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7-M9: unigram TF-IDF → RF(100 trees, seed=42) on the STRATIFIED
    deterministic split (reference parity: cleaner.py:246-248 passes
    stratify=y to train_test_split), predicting `lang`; exact-count
    accuracy + weighted F1."""
    toks = P.stratified_split(
        P.with_tokens(_docs(spark, sf_dir)), "doc_id", "lang"
    )
    _, predictions, _ = P.fit_classifier(toks)
    return P.classification_metrics(predictions)


def ml05_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6, stratified (cleaner.py:246-248 ``stratify=y`` made
    deterministic): within each lang, rank by md5(doc_id) and train the
    first ⌊4n/5⌋ — every class splits 80/20 exact within one row.
    Fully SQL-expressible (window rank + count), so unlike RNG-based
    sampleBy it carries a complete oracle twin."""
    return P.stratified_split(_docs(spark, sf_dir), "doc_id", "lang").select(
        "doc_id", "lang", "split"
    )


SPECS = [
    QuerySpec("ml01_lda_themes", ml01_lda_themes, None),
    QuerySpec("ml02_topic_top_words", ml02_topic_top_words, None),
    QuerySpec(
        "ml03_train_test_split",
        ml03_train_test_split,
        """
        SELECT doc_id, lang,
               CASE WHEN substr(md5(doc_id::VARCHAR), 1, 2) < 'cd'
                    THEN 'train' ELSE 'test' END AS split
        FROM documents
        """,
    ),
    QuerySpec("ml04_classifier_metrics", ml04_classifier_metrics, None),
    QuerySpec(
        "ml05_stratified_split",
        ml05_stratified_split,
        """
        SELECT doc_id, lang,
               CASE WHEN 5 * row_number() OVER (
                            PARTITION BY lang
                            ORDER BY md5(doc_id::VARCHAR), doc_id)
                      <= 4 * count(*) OVER (PARTITION BY lang)
                    THEN 'train' ELSE 'test' END AS split
        FROM documents
        """,
    ),
]
