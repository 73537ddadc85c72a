"""ML-layer invariants at sf0.001 (value parity with sklearn is out of
scope by design — SURVEY §2.7; these pin shapes, ranges, determinism)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from customer_review__etl_spark.ml import pipeline as P
from customer_review__etl_spark.plans import mlplans
from customer_review__etl_spark.sources import tables

from conftest import SF_DIR


@pytest.fixture(scope="module")
def lda_out(spark):
    return mlplans.ml01_lda_themes(spark, SF_DIR).collect()


def test_lda_topics_in_range(lda_out):
    assert len(lda_out) > 0
    assert all(0 <= r["topic"] < P.N_TOPICS for r in lda_out)


def test_lda_theme_labels_verbatim(lda_out):
    for r in lda_out:
        assert r["theme"] == P.THEME_LABELS[r["topic"]]


def test_topic_top_words_shape(spark):
    out = mlplans.ml02_topic_top_words(spark, SF_DIR).collect()
    topics = {r["topic"] for r in out}
    assert topics == set(range(P.N_TOPICS))
    for t in topics:
        ranks = sorted(r["rank"] for r in out if r["topic"] == t)
        assert ranks == list(range(1, 11))
    assert all(r["term"] is not None for r in out)


def test_md5_split_deterministic_and_partitioning(spark):
    docs = tables.load(spark, SF_DIR, "documents")
    s1 = P.md5_split(docs, "doc_id").select("doc_id", "split")
    s2 = P.md5_split(docs, "doc_id").select("doc_id", "split")
    assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s2.collect()))
    counts = dict(
        s1.groupBy("split").count().rdd.map(lambda r: (r["split"], r["count"])).collect()
    )
    total = sum(counts.values())
    assert counts["train"] + counts.get("test", 0) == total
    assert 0.6 < counts["train"] / total < 0.95  # ≈80% at small n


def test_stratified_split_per_class_fraction(spark):
    """Reference stratify=y parity (VERDICT round-3 item #2): every
    lang must split ≈80/20 — within 3 pts, the advisor's done-bar;
    the quota construction is in fact exact within one row."""
    docs = tables.load(spark, SF_DIR, "documents")
    out = P.stratified_split(docs, "doc_id", "lang")
    per = (
        out.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias(
                "n_train"
            ),
        )
        .collect()
    )
    assert len(per) >= 2
    for r in per:
        frac = r["n_train"] / r["n"]
        assert abs(frac - 0.8) <= 0.03, (r["lang"], frac)
        # exact-within-one-row: quota is floor(4n/5)
        assert r["n_train"] == (4 * r["n"]) // 5

    # deterministic: same assignment on re-run
    a = sorted(map(tuple, out.select("doc_id", "split").collect()))
    b = sorted(
        map(
            tuple,
            P.stratified_split(docs, "doc_id", "lang")
            .select("doc_id", "split")
            .collect(),
        )
    )
    assert a == b


def test_classifier_metrics_ranges(spark):
    out = mlplans.ml04_classifier_metrics(spark, SF_DIR).collect()
    assert len(out) == 1
    m = out[0]
    assert 0.0 <= m["accuracy"] <= 1.0
    assert 0.0 <= m["weighted_f1"] <= 1.0
    assert m["n_correct"] <= m["n_test"]
