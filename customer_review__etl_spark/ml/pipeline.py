"""TF-IDF / LDA / RandomForest pipelines (reference cleaner.py:152-273).

Numeric parity with sklearn is explicitly NOT promised (different
algorithms: sklearn's batch variational LDA vs Spark's online VB;
different RF split randomness) — SURVEY.md §2.7. What is preserved:
the exact hyperparameters, the verbatim theme-label map, the pipeline
shapes, and invariants (topic ∈ [0,5), metrics ∈ [0,1]) which the
pytest suite asserts.

Scale notes:
- features stay SparseVector columns (no dense 1000-wide arrays);
- the token column is produced by the native JVM text chain
  (functions.text.clean_tokens) — the Python boundary is only inside
  pyspark.ml's own JVM estimators, so there is no per-row Python;
- train/test split is a deterministic md5-range split (M6): content-
  addressed, reproducible on any cluster size, no sampleBy drift.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.clustering import LDA
from pyspark.ml.feature import IDF, CountVectorizer, NGram, StringIndexer
from pyspark.ml.classification import RandomForestClassifier
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T

SEED = 42
N_TOPICS = 5
LDA_MAX_ITER = 20
VOCAB_SIZE = 1000
MIN_DF = 2.0
MAX_DF = 0.9
N_TREES = 100

# Verbatim topic→theme labels (cleaner.py:211-217) — hard-coded in the
# reference, not learned.
THEME_LABELS = {
    0: "Customer Support Issues",
    1: "Billing & Subscription Problems",
    2: "Service Quality Concerns",
    3: "Account Management Issues",
    4: "Delivery & Product Issues",
}


def with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Native-JVM token column: F1-F5 chain + unigram∪bigram union
    (mirrors TfidfVectorizer ngram_range=(1,2), cleaner.py:176-182)."""
    df = df.withColumn("unigrams", T.clean_tokens(F.col(text_col)))
    ng = NGram(n=2, inputCol="unigrams", outputCol="bigrams")
    return ng.transform(df).withColumn(
        "tokens", F.concat("unigrams", "bigrams")
    )


def fit_lda(df_tokens: DataFrame) -> tuple[PipelineModel, DataFrame]:
    """M1+M2: CountVectorizer+IDF (vocab 1000, minDF 2, maxDF 0.9) →
    LDA(k=5, maxIter=20, seed=42); returns (model, transformed).

    The stages are fitted manually in pipeline order (identical
    estimator params on identical inputs, so the fitted models — and
    every downstream result — are the same as Pipeline.fit's) so the
    LDA input can be persisted: the online LDA optimizer runs maxIter
    sampling jobs over its input, and Pipeline.fit hands it the lazy
    tokenize→CV→IDF chain, re-deriving the whole feature pipeline per
    iteration. Persisting tokens (3 estimator passes) and the tfidf
    vectors (maxIter LDA jobs) bounds the recompute: both are
    per-document rows (tokens ≤ doc length, vectors ≤ vocab 1000
    sparse), MEMORY_AND_DISK so an over-memory corpus spills instead
    of failing."""
    from pyspark import StorageLevel

    toks = df_tokens.persist(StorageLevel.MEMORY_AND_DISK)
    cv = CountVectorizer(
        inputCol="tokens",
        outputCol="tf",
        vocabSize=VOCAB_SIZE,
        minDF=MIN_DF,
        maxDF=MAX_DF,
    ).fit(toks)
    tf = cv.transform(toks)
    idf = IDF(inputCol="tf", outputCol="tfidf").fit(tf)
    feats = idf.transform(tf).persist(StorageLevel.MEMORY_AND_DISK)
    lda = LDA(
        k=N_TOPICS,
        maxIter=LDA_MAX_ITER,
        seed=SEED,
        featuresCol="tfidf",
        topicDistributionCol="topic_dist",
    ).fit(feats)
    model = PipelineModel(stages=[cv, idf, lda])
    transformed = lda.transform(feats)
    # the fit is done; consumers of `transformed` recompute the (one)
    # feature pass lazily — the iterative phase above is what needed
    # the pin
    toks.unpersist()
    feats.unpersist()
    return model, transformed


def assign_topics(transformed: DataFrame) -> DataFrame:
    """M3+M5: argmax over the topic distribution (first max wins, like
    numpy argmax) + verbatim theme label via a broadcast join."""
    arr = vector_to_array(F.col("topic_dist"))
    topic = (
        F.expr(
            "array_position(topic_arr, array_max(topic_arr))"
        ).cast("int") - 1
    )
    labels = transformed.sparkSession.createDataFrame(
        list(THEME_LABELS.items()), "topic INT, theme STRING"
    )
    return (
        transformed.withColumn("topic_arr", arr)
        .withColumn("topic", topic)
        .join(F.broadcast(labels), "topic", "left")
    )


def topic_top_words(model: PipelineModel, n: int = 10) -> DataFrame:
    """M4: describeTopics(n) flattened to (topic, rank, term)."""
    cv_model, _, lda_model = model.stages
    vocab = cv_model.vocabulary
    desc = lda_model.describeTopics(n)
    sess = desc.sparkSession
    vocab_df = sess.createDataFrame(
        [(i, w) for i, w in enumerate(vocab)], "term_idx INT, term STRING"
    )
    exploded = desc.select(
        "topic", F.posexplode("termIndices").alias("rank0", "term_idx")
    )
    return (
        exploded.join(F.broadcast(vocab_df), "term_idx", "left")
        .select(
            "topic",
            (F.col("rank0") + 1).cast("int").alias("rank"),
            "term",
        )
        .orderBy("topic", "rank")
    )


def md5_split(df: DataFrame, key_col: str, train_frac_hex: str = "cd") -> DataFrame:
    """M6 as a deterministic content-addressed split: rows whose
    md5(key) first byte < 0xcd (≈80.1%) train, rest test. Reproducible
    across engines, cluster sizes, and runs — no RNG state."""
    h2 = F.substring(F.md5(F.col(key_col).cast("string")), 1, 2)
    return df.withColumn(
        "split",
        F.when(h2 < F.lit(train_frac_hex), F.lit("train")).otherwise(
            F.lit("test")
        ),
    )


def stratified_split(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    train_num: int = 4,
    train_den: int = 5,
) -> DataFrame:
    """M6 with the reference's ``stratify=y`` parity (cleaner.py:246-248,
    SURVEY §7 risk (e)): rank rows WITHIN each stratum by md5(key) — a
    deterministic pseudo-random permutation — and train the first
    ⌊n·train_num/train_den⌋. Per-stratum train fraction is exact within
    one row, unlike a per-stratum hash THRESHOLD whose binomial drift
    (≈±4 pts at n=100) defeats the point of stratifying. Pure integer
    comparison (rn·den ≤ cnt·num): no float rounding to diverge
    cross-engine.

    Scale (the salted path, round-6 VERDICT ask #3): a naive
    row_number over Window.partitionBy(strata) serializes each stratum
    into ONE sort partition — a dominant-language stratum at corpus
    scale becomes a single straggler task. Instead the within-stratum
    rank is computed exactly in two phases over ordered digest
    BUCKETS (the leading byte of the md5 itself, so bucket order ==
    digest order and the rank is bit-identical to the naive form):
      1. row_number within (stratum, bucket) — 256-way parallel per
         stratum, partitions shrink 256× (more leading bytes widen
         this arbitrarily);
      2. per-(stratum, bucket) counts roll up into exclusive running
         offsets with a window over the TINY aggregate (≤ 256 rows per
         stratum), broadcast-joined back; global rank = offset +
         within-bucket rank. Stratum totals ride the same aggregate,
         so the naive form's second full-data window disappears too.
    The p16 two-phase-ordinal idea applied per stratum; strata counts
    are assumed driver-broadcastable (a label column, not an ID)."""
    from pyspark.sql.window import Window

    h = F.md5(F.col(key_col).cast("string"))
    with_h = df.withColumn("_h", h).withColumn(
        "_bkt", F.substring(F.col("_h"), 1, 2)
    )
    within = F.row_number().over(
        Window.partitionBy(strata_col, "_bkt").orderBy("_h", F.col(key_col))
    )
    per_bucket = with_h.groupBy(strata_col, "_bkt").agg(
        F.count(F.lit(1)).alias("_bn")
    )
    offsets = per_bucket.select(
        F.col(strata_col).alias("_strat"),
        F.col("_bkt").alias("_obkt"),
        F.sum("_bn")
        .over(
            Window.partitionBy(strata_col)
            .orderBy("_bkt")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        .alias("_off"),
        F.sum("_bn").over(Window.partitionBy(strata_col)).alias("_cnt"),
    )
    joined = with_h.withColumn("_rn0", within).join(
        F.broadcast(offsets),
        with_h[strata_col].eqNullSafe(F.col("_strat"))
        & (F.col("_bkt") == F.col("_obkt")),
    )
    rn = F.coalesce(F.col("_off"), F.lit(0)) + F.col("_rn0")
    return joined.withColumn(
        "split",
        F.when(
            rn * F.lit(train_den) <= F.col("_cnt") * F.lit(train_num),
            F.lit("train"),
        ).otherwise(F.lit("test")),
    ).drop("_h", "_bkt", "_rn0", "_strat", "_obkt", "_off", "_cnt")


def fit_classifier(
    df_tokens_split: DataFrame, label_col: str = "lang"
) -> tuple[PipelineModel, DataFrame, DataFrame]:
    """M7+M8: the second, unigram-only TF-IDF (cleaner.py:251-257) +
    RF(numTrees=100, seed=42); fit on train, transform test."""
    # NOTE (r16): unlike fit_lda, this fit is NOT staged-with-persist —
    # an A/B showed the RF's internal BaggedPoint persist already
    # bounds its passes, and persisting the train split shifted
    # CountVectorizer's (inherently arbitrary) vocabulary tie-breaks
    # enough to flip ml10's marginal beats-majority gate on the
    # hostile fuzz corpus. Zero measured win, a real behavior shift:
    # keep Pipeline.fit.
    train = df_tokens_split.filter(F.col("split") == "train")
    test = df_tokens_split.filter(F.col("split") == "test")
    pipe = Pipeline(
        stages=[
            CountVectorizer(
                inputCol="unigrams", outputCol="tf_c", vocabSize=VOCAB_SIZE
            ),
            IDF(inputCol="tf_c", outputCol="features"),
            # handleInvalid="keep": a label that appears only in the
            # test stratum (a 1-doc language: ⌊4·1/5⌋ = 0 train rows)
            # must SCORE, not crash — it indexes to the extra "unseen"
            # class, which no prediction can equal, so it counts as
            # incorrect; known-label indices are unchanged. At corpus
            # scale unseen serving labels are routine, and a scoring
            # pass that aborts on one is a pipeline outage.
            StringIndexer(
                inputCol=label_col,
                outputCol="label",
                stringOrderType="alphabetAsc",
                handleInvalid="keep",
            ),
            RandomForestClassifier(
                numTrees=N_TREES,
                seed=SEED,
                featuresCol="features",
                labelCol="label",
            ),
        ]
    )
    model = pipe.fit(train)
    return model, model.transform(test), train


def classification_metrics(predictions: DataFrame) -> DataFrame:
    """M9: accuracy + weighted F1 from the confusion counts — computed
    with exact integer counts and deterministic divisions (no
    evaluator RNG), returned as a single-row DataFrame."""
    conf = predictions.groupBy("label", "prediction").agg(
        F.count(F.lit(1)).alias("n")
    )
    total = conf.agg(F.sum("n").alias("t")).collect()[0]["t"]
    correct = (
        conf.filter(F.col("label") == F.col("prediction"))
        .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("c"))
        .collect()[0]["c"]
    )
    per_class = (
        conf.groupBy("label")
        .agg(F.sum("n").alias("support"))
        .join(
            conf.groupBy("prediction").agg(F.sum("n").alias("predicted")),
            F.col("label") == F.col("prediction"),
            "left",
        )
        .join(
            conf.filter(F.col("label") == F.col("prediction"))
            .select("label", F.col("n").alias("tp")),
            "label",
            "left",
        )
        .select(
            "label",
            "support",
            F.coalesce("predicted", F.lit(0)).alias("predicted"),
            F.coalesce("tp", F.lit(0)).alias("tp"),
        )
    )
    rows = per_class.collect()
    f1_weighted = 0.0
    for r in rows:
        prec = r["tp"] / r["predicted"] if r["predicted"] else 0.0
        rec = r["tp"] / r["support"] if r["support"] else 0.0
        f1 = 2 * prec * rec / (prec + rec) if (prec + rec) else 0.0
        f1_weighted += f1 * r["support"] / total
    sess = predictions.sparkSession
    return sess.createDataFrame(
        [(total, int(correct), correct / total if total else 0.0, f1_weighted)],
        "n_test BIGINT, n_correct BIGINT, accuracy DOUBLE, weighted_f1 DOUBLE",
    )
