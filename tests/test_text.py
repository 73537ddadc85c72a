"""Text-chain unit tests on tiny literal DataFrames: null/empty/
whitespace edges, tokenizer consistency, fingerprint stability
(mirrors the reference semantics in cleaner.py:118-150)."""

from __future__ import annotations

from pyspark.sql import functions as F

from customer_review__etl_spark.functions import text as T


def _one(spark, text):
    df = spark.createDataFrame([(text,)], "text STRING")
    return df


def test_normalize_null_guard(spark):
    out = _one(spark, None).select(T.normalize_text(F.col("text")).alias("x"))
    assert out.collect()[0]["x"] == ""


def test_normalize_strips_and_lowercases(spark):
    out = _one(spark, "Hello, WORLD!!1 don't").select(
        T.normalize_text(F.col("text")).alias("x")
    )
    assert out.collect()[0]["x"] == "hello world dont"


def test_clean_tokens_stopwords_and_length(spark):
    out = _one(spark, "the quick brown fox is on it").select(
        T.clean_tokens(F.col("text")).alias("x")
    )
    assert out.collect()[0]["x"] == ["quick", "brown", "fox"]


def test_raw_tokens_whitespace_edges(spark):
    out = _one(spark, "  a\tb   c  ").select(
        T.raw_tokens(F.col("text")).alias("x"),
        T.token_count(F.col("text")).alias("n"),
    )
    row = out.collect()[0]
    assert row["x"] == ["a", "b", "c"]
    assert row["n"] == 3


def test_token_count_empty_and_null(spark):
    df = spark.createDataFrame([("",), (None,), ("   ",)], "text STRING")
    ns = [
        r["n"]
        for r in df.select(
            T.token_count(F.coalesce(F.col("text"), F.lit(""))).alias("n")
        ).collect()
    ]
    assert ns == [0, 0, 0]


def test_fingerprint_normalization_invariance(spark):
    df = spark.createDataFrame(
        [("Hello World!",), ("hello world",)], "text STRING"
    )
    fps = [
        r["f"]
        for r in df.select(T.doc_fingerprint(F.col("text")).alias("f")).collect()
    ]
    assert fps[0] == fps[1]


def test_quality_scores_zero_token_doc(spark):
    cols = T.quality_score_cols(F.col("text"))
    out = _one(spark, "   ").select(
        cols["n_tokens"].alias("n"),
        F.when(cols["n_tokens"] == 0, F.lit(None))
        .otherwise(cols["stopword_ratio"])
        .alias("r"),
    )
    row = out.collect()[0]
    assert row["n"] == 0 and row["r"] is None


def test_lang_scores_count_markers(spark):
    scores = T.lang_scores(F.col("text"))
    out = _one(spark, "the cat and the dog is here").select(
        scores["en"].alias("en"), scores["fr"].alias("fr")
    )
    row = out.collect()[0]
    assert row["en"] == 4  # the, and, the, is
    assert row["fr"] == 0


def test_bpe_pattern_classes(spark):
    from customer_review__etl_spark.plans.textplans import BPE_PATTERN

    df = spark.createDataFrame([("ab12, cd-3 ee",)], "text STRING")
    out = df.select(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(BPE_PATTERN), 0)
        .alias("t")
    ).collect()[0]["t"]
    # letter-run, digit-run, punct-run, space-attached runs
    assert out == ["ab", "12", ",", " cd", "-", "3", " ee"]


def test_lang_id_zh_by_script(spark):
    """Chinese has no whitespace token boundaries — detection must come
    from CJK codepoints, not romanized marker words."""
    scores = T.lang_scores(F.col("text"))
    df = spark.createDataFrame(
        [("这是一个中文句子",), ("the cat and the dog",)], "text STRING"
    )
    rows = df.select(
        scores["zh"].alias("zh"), scores["en"].alias("en")
    ).collect()
    assert rows[0]["zh"] == 8 and rows[0]["en"] == 0
    assert rows[1]["zh"] == 0 and rows[1]["en"] > 0
