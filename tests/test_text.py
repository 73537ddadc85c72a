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


def test_t11_scrubs_cross_doc_chunk(spark, tmp_path):
    """A chunk-aligned 8-token passage shared by two docs is dropped
    from both; doc-unique chunks survive with order preserved."""
    from customer_review__etl_spark.plans import textplans as TP

    boiler = "b1 b2 b3 b4 b5 b6 b7 b8"
    a = boiler + " a9 a10 a11"
    b = boiler + " b9 b10 b11"
    c = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"
    df = spark.createDataFrame(
        [(0, a, "en", "s", 1), (1, b, "en", "s", 1), (2, c, "en", "s", 1)],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    d = str(tmp_path / "t11")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    rows = {r["doc_id"]: r for r in TP.t11_chunk_dedup(spark, d).collect()}
    spark.catalog.clearCache()
    assert rows[0]["cleaned"] == "a9 a10 a11" and rows[0]["n_dropped"] == 1
    assert rows[1]["cleaned"] == "b9 b10 b11" and rows[1]["n_dropped"] == 1
    assert rows[2]["cleaned"] == c and rows[2]["n_dropped"] == 0
    assert rows[2]["n_chunks"] == 2


def test_p14_rates_follow_group_histogram(spark, tmp_path):
    """Under-represented groups keep rate 1.0 (all rows); dominant
    groups are downsampled toward the uniform mixture target."""
    from customer_review__etl_spark.plans import relational as R

    rows = [(i, "x", "big", "s", 1) for i in range(90)] + [
        (100 + i, "y", "small", "s", 1) for i in range(10)
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    d = str(tmp_path / "p14")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = R.p14_weighted_mix(spark, d).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    # budget = 0.4*100 = 40, uniform over 2 groups → 20 per group:
    # 'small' (n=10) keeps everything at rate 1.0; 'big' (n=90) samples
    # at 20/90 — hash-Bernoulli, so expect roughly 20 of 90.
    assert len(by_lang["small"]) == 10
    assert all(r["rate"] == 1.0 for r in by_lang["small"])
    big_rate = by_lang["big"][0]["rate"]
    assert abs(big_rate - 20 / 90) < 1e-12
    assert 8 <= len(by_lang["big"]) <= 35
    # determinism: identical membership on re-run
    again = sorted(r["doc_id"] for r in R.p14_weighted_mix(spark, d).collect())
    assert again == sorted(r["doc_id"] for r in out)


def test_u02_packs_greedily_with_reset(spark, tmp_path):
    """Hand-computed packing: budget 128, one shard. Docs of 60/60/60
    tokens → first two share seq 0 (offsets 0/60), third opens seq 1;
    an oversize 200-token doc gets its own overflowing sequence."""
    from customer_review__etl_spark.plans import relational as R

    def words(n, tag):
        return " ".join(f"{tag}{i}" for i in range(n))

    rows = [
        (0, words(60, "a"), "en", "s", 1),
        (8, words(60, "b"), "en", "s", 1),
        (16, words(60, "c"), "en", "s", 1),
        (24, words(200, "d"), "en", "s", 1),
        (32, words(10, "e"), "en", "s", 1),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    d = str(tmp_path / "u02")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {r["doc_id"]: r for r in R.u02_sequence_pack(spark, d).collect()}
    assert all(r["shard"] == 0 for r in out.values())
    assert (out[0]["seq_id"], out[0]["tok_offset"]) == (0, 0)
    assert (out[8]["seq_id"], out[8]["tok_offset"]) == (0, 60)
    assert (out[16]["seq_id"], out[16]["tok_offset"]) == (1, 0)
    assert (out[24]["seq_id"], out[24]["tok_offset"]) == (2, 0)  # oversize
    assert (out[32]["seq_id"], out[32]["tok_offset"]) == (3, 0)  # after overflow


def test_t18_sliding_chunks_overlap_and_no_shuffle(spark, tmp_path):
    """Neighbor chunks must share WIN-STRIDE tokens, every token must
    appear in some chunk, and the plan must be pure map (the only
    Exchange is the presentation sort's range partitioning)."""
    from customer_review__etl_spark.plans import textplans as TP

    words = " ".join(f"w{i:03d}" for i in range(1, 81))  # 80 tokens
    df = spark.createDataFrame(
        [(1, words, "en", "s", len(words))],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    d = str(tmp_path / "t18")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")

    out = TP.t18_sliding_chunks(spark, d)
    rows = out.collect()
    # 80 tokens, win 32, stride 24 -> 1 + ceil(48/24) = 3 chunks
    assert [r["chunk_id"] for r in rows] == [1, 2, 3]
    assert [r["n_chunk_tokens"] for r in rows] == [32, 32, 32]
    # chunk 2 starts at token 25: md5 check of the reconstruction
    import hashlib

    toks = words.split(" ")
    for r, start in zip(rows, (0, 24, 48)):
        expect = " ".join(toks[start:start + 32])
        assert r["chunk_md5"] == hashlib.md5(expect.encode()).hexdigest()

    plan = out._jdf.queryExecution().executedPlan().toString()
    # no hash/shuffle exchange before the final sort
    assert "hashpartitioning" not in plan
