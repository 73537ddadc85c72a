"""Differential edge-case harness: every documents-only QuerySpec runs
on an adversarial corpus (empty/whitespace/punct/digit/unicode/CJK
rows) through BOTH the Spark plan and its DuckDB oracle twin — the
same comparison the driver does, but on data chosen to break
cross-engine string semantics rather than the driver's benign corpus.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pytest

from customer_review__etl_spark.plans import all_queries

EDGE_DOCS = [
    (0, "plain lowercase words here", "en", "web", 26),
    (1, "", "en", "web", 0),
    (2, "   ", "en", "web", 3),
    (3, "\t\ttabs\tand\nnewlines\n", "en", "web", 20),
    (4, "repeated  double   spaces", "en", "web", 25),
    (5, "PUNCT!!! ... ??? ,,, ;;;", "en", "web", 24),
    (6, "digits 123 456789 0", "en", "web", 19),
    (7, "MiXeD CaSe WoRdS", "en", "web", 16),
    (8, "café naïve résumé über", "fr", "web", 22),
    (9, "这是中文文本没有空格", "zh", "web", 10),
    (10, "the the the the the", "en", "web", 19),  # all stopwords
    (11, "supercalifragilisticexpialidocious", "en", "web", 34),
    (12, "a b c d e f g h i j k l m", "en", "web", 25),  # all len<=2
    (13, "plain lowercase words here", "en", "mirror", 26),  # exact dup of 0
    (14, "plain lowercase words there", "en", "web", 27),  # near dup of 0
]

DOCS_ONLY_QUERIES = [
    "t01_text_chain", "t03_topk_words", "t04_quality_scores",
    "t05_lang_id", "t06_fingerprint", "t07_positional_hash",
    "t08_bpe_token_count",
    "d01_exact_dedup", "d02_minhash_near_dup", "d03_simhash_near_dup",
    "d04_ngram_jaccard",
    "mm01_binary_meta", "mm03_frame_sample",
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_sf")
    spark.createDataFrame(
        EDGE_DOCS, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def _multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows),
        key=lambda t: tuple(str(x) for x in t),
    )


@pytest.mark.parametrize("name", DOCS_ONLY_QUERIES)
def test_edge_corpus_matches_oracle(spark, edge_dir, name):
    spec = all_queries()[name]
    sdf = spec.fn(spark, edge_dir)
    scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{edge_dir}/documents.parquet/*.parquet'"
    )
    cur = con.execute(spec.oracle)
    ocols = [c[0] for c in cur.description]
    orows = cur.fetchall()

    assert sorted(scols) == sorted(ocols)
    assert _multiset(scols, srows) == _multiset(ocols, orows), name
