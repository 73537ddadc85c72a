"""Composed training-data pipelines — the end-to-end flagship a user
of a training-data engine actually runs: dedup → quality gate →
decontamination → deterministic split, as ONE declarative plan.

The reference runs its miniature version of this chain imperatively
(cleaner.py:99-128 dedup+clean, cleaner.py:246-248 split); at corpus
scale the same chain must stay lazy so Catalyst can fuse the narrow
stages (fingerprint, quality metrics, gram arrays all ride the same
scan) and AQE can size the two real shuffles (the fingerprint window
and the contamination gram join).

Every stage reuses the exact semantics of its standalone registry
twin (d01 fingerprint keep-first, t04 quality metrics, dc01 5-gram
overlap vs the doc_id % 13 eval slice, ml03 md5-threshold split), so
the full-chain oracle SQL is the composition of four already-proven
oracle fragments — nothing in the composition is new semantics, only
new plumbing, which is exactly what the oracle should pin.

Scale notes (100 TB manners):
- stages 1-2 are one narrow pass + one shuffle on 128-bit digests
  (bodies never shuffle for dedup);
- the contamination join ships (doc_id, 40-byte gram) pairs, never
  documents, and the eval gram side is distinct-ed but NOT assumed
  broadcastable (a real benchmark suite's gram set can be large);
- the final anti-join and split are digest-keyed and RNG-free, so
  re-running the pipeline after appending new documents reassigns
  nothing (content-addressed splits — the property cleaner.py's
  random_state seed only approximates per-run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import text as T
from ..scratch import run_scratch
from ..sources import sinks, tables
from . import QuerySpec
from .dedupplans import DECON_EVAL_MOD, DECON_NGRAM
from .helpers import (
    sql_normalize,
    sql_raw_tokens,
    sql_stopword_array,
)

PL_MIN_TOKENS = 20       # quality gate: drop very short docs (~10 %)
PL_MAX_STOPWORD = 0.18   # and stopword-stuffed docs (corpus p>99.9)


def _gram_arr(toks_col: str):
    """Distinct contiguous DECON_NGRAM-token grams of a token array —
    the dc01 expression, shared verbatim."""
    w = DECON_NGRAM
    return F.expr(
        f"CASE WHEN size({toks_col}) >= {w} THEN "
        f"array_distinct(transform(sequence(1, size({toks_col}) - {w - 1}), "
        f"i -> concat_ws(' ', slice({toks_col}, i, {w})))) "
        f"ELSE CAST(array() AS array<string>) END"
    )


def pl01_training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data prep over `documents`:

    1. exact dedup — keep the lowest doc_id per normalized-content
       md5 fingerprint (d01);
    2. quality gate — ≥ PL_MIN_TOKENS tokens and stopword ratio
       ≤ PL_MAX_STOPWORD (t04 metrics);
    3. decontamination — drop the eval slice (doc_id % 13 == 0) and
       any surviving doc sharing a contiguous 5-token gram with ANY
       raw eval doc (dc01; the eval gram set comes from the raw
       corpus, not the filtered one — contamination sources don't
       get cleaner because training data did);
    4. split — content-addressed md5 threshold, ≈80/20 (ml03).

    Output: (doc_id, lang, n_tokens, split), ordered by doc_id."""
    docs = tables.load(spark, sf_dir, "documents")
    w = Window.partitionBy("f").orderBy("doc_id")
    kept = (
        docs.select(
            "doc_id",
            "lang",
            "text",
            T.doc_fingerprint(F.col("text")).alias("f"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "text")
    )
    cols = T.quality_score_cols(F.col("text"))
    n_tokens = cols["n_tokens"]
    qf = (
        kept.select(
            "doc_id",
            "lang",
            "text",
            n_tokens.alias("n_tokens"),
            F.when(n_tokens == 0, F.lit(None))
            .otherwise(cols["stopword_ratio"])
            .alias("sr"),
        )
        .filter(
            (F.col("n_tokens") >= PL_MIN_TOKENS)
            & (F.col("sr") <= PL_MAX_STOPWORD)
        )
    )
    eval_grams = (
        docs.filter(F.col("doc_id") % DECON_EVAL_MOD == 0)
        .select(T.raw_tokens(F.lower(F.col("text"))).alias("toks"))
        .select(F.explode(_gram_arr("toks")).alias("g"))
        .distinct()
    )
    train = qf.filter(F.col("doc_id") % DECON_EVAL_MOD != 0)
    contaminated = (
        train.select(
            "doc_id", T.raw_tokens(F.lower(F.col("text"))).alias("toks")
        )
        .select("doc_id", F.explode(_gram_arr("toks")).alias("g"))
        .join(eval_grams, "g")
        .select("doc_id")
        .distinct()
    )
    clean = train.join(contaminated, "doc_id", "left_anti")
    split = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "cd",
        F.lit("train"),
    ).otherwise(F.lit("test"))
    return clean.select(
        "doc_id", "lang", "n_tokens", split.alias("split")
    ).orderBy("doc_id")


_PL01_SQL = f"""
WITH fp AS (
  SELECT doc_id, lang, text,
         md5({sql_normalize('text')}) AS f
  FROM documents),
kept AS (
  SELECT doc_id, lang, text FROM (
    SELECT doc_id, lang, text,
           row_number() OVER (PARTITION BY f ORDER BY doc_id) AS rn
    FROM fp) WHERE rn = 1),
q AS (
  SELECT doc_id, lang, text,
         len(toks)::BIGINT AS n_tokens,
         CASE WHEN len(toks) = 0 THEN NULL ELSE
           len(list_filter(toks, _t -> list_contains(
               {sql_stopword_array()}, _t)))::DOUBLE
           / len(toks)::DOUBLE END AS sr
  FROM (SELECT doc_id, lang, text,
               {sql_raw_tokens("lower(text)")} AS toks
        FROM kept)),
qf AS (
  SELECT * FROM q
  WHERE n_tokens >= {PL_MIN_TOKENS} AND sr <= {PL_MAX_STOPWORD}),
eg AS (
  SELECT DISTINCT _g AS g
  FROM (SELECT CASE WHEN len(toks) >= {DECON_NGRAM} THEN
                 list_distinct(list_transform(
                   range(1, len(toks) - {DECON_NGRAM - 2}),
                   i -> array_to_string(
                     list_slice(toks, i, i + {DECON_NGRAM - 1}), ' ')))
               ELSE [] END AS grams
        FROM (SELECT {sql_raw_tokens("lower(text)")} AS toks
              FROM documents
              WHERE doc_id % {DECON_EVAL_MOD} = 0)),
       UNNEST(grams) AS u(_g)),
tg AS (
  SELECT doc_id, _g AS g
  FROM (SELECT doc_id,
               CASE WHEN len(toks) >= {DECON_NGRAM} THEN
                 list_distinct(list_transform(
                   range(1, len(toks) - {DECON_NGRAM - 2}),
                   i -> array_to_string(
                     list_slice(toks, i, i + {DECON_NGRAM - 1}), ' ')))
               ELSE [] END AS grams
        FROM (SELECT doc_id, {sql_raw_tokens("lower(text)")} AS toks
              FROM qf
              WHERE doc_id % {DECON_EVAL_MOD} <> 0)),
       UNNEST(grams) AS u(_g)),
bad AS (SELECT DISTINCT doc_id FROM tg JOIN eg USING (g))
SELECT doc_id, lang, n_tokens,
       CASE WHEN substr(md5(doc_id::VARCHAR), 1, 2) < 'cd'
            THEN 'train' ELSE 'test' END AS split
FROM qf
WHERE doc_id % {DECON_EVAL_MOD} <> 0
  AND doc_id NOT IN (SELECT doc_id FROM bad)
ORDER BY doc_id
"""


PL02_APPEND_MOD = 5  # v1 corpus = doc_id % 5 != 0; the append adds the rest


def _pl02_features(df: DataFrame) -> DataFrame:
    """The per-doc feature pass both the batch and the incremental
    paths share: token count + content fingerprint (the d01/t04
    primitives) — a pure narrow map."""
    return df.select(
        "doc_id",
        "lang",
        F.size(T.raw_tokens(F.lower(F.col("text")))).cast("long").alias(
            "n_tokens"
        ),
        F.md5(T.normalize_text(F.col("text"))).alias("fingerprint"),
    )


def pl02_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus refresh — the daily-append reality at 100 TB:
    features for the v1 corpus were computed in an earlier run and
    LANDED (scratch parquet standing in for the feature store); when
    the corpus grows, recompute ONLY the net-new documents (anti-join
    against the stored key set — the general form of a manifest diff,
    io15's snapshot model applied to compute) and union with the
    stored results untouched.

    The oracle is the FULL recompute over the grown corpus — equality
    is the correctness property of incremental processing: stored +
    delta ≡ from-scratch. That holds here because the feature pass is
    per-doc (no cross-doc state); corpus-level features (DF counts,
    surprisal) would need merge logic, not a union — documented limit.

    Scale: the stored side is read, never recomputed; the anti-join
    ships only doc_id keys; the delta pass scans only appended files
    (in a manifest layout the anti-join disappears entirely — the
    delta IS the new file set)."""
    docs = tables.load(spark, sf_dir, "documents")
    v1 = docs.filter(F.col("doc_id") % PL02_APPEND_MOD != 0)
    store = run_scratch("pl02_store_")
    feats_v1 = _pl02_features(v1)
    sinks.write_parquet(feats_v1, store)
    stored = spark.read.schema(feats_v1.schema).parquet(store)
    new_docs = docs.join(
        stored.select("doc_id"), "doc_id", "left_anti"
    )
    return (
        stored.unionByName(_pl02_features(new_docs))
        .orderBy("doc_id")
    )


_PL02_SQL = f"""
SELECT doc_id, lang,
       len({sql_raw_tokens('lower(text)')})::BIGINT AS n_tokens,
       md5({sql_normalize('text')}) AS fingerprint
FROM documents
ORDER BY doc_id
"""


SPECS = [
    QuerySpec("pl01_training_pipeline", pl01_training_pipeline, _PL01_SQL),
    QuerySpec(
        "pl02_incremental_refresh", pl02_incremental_refresh, _PL02_SQL
    ),
]
