"""pl01 composed training-data pipeline — stage invariants that the
full-chain oracle cannot see in isolation."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR
from customer_review__etl_spark.plans import dedupplans as D
from customer_review__etl_spark.plans import pipelineplans as PL


def test_pl01_stage_invariants(spark):
    out = PL.pl01_training_pipeline(spark, SF_DIR)
    rows = out.collect()
    assert rows, "pipeline filtered out the whole corpus"
    ids = sorted(r["doc_id"] for r in rows)
    # unique output (row order is not part of the contract: the driver's
    # value-hash is order-insensitive and pl01's trailing orderBy was
    # removed in r16 to save the range-partitioning Exchange)
    assert len(ids) == len(set(ids))
    # eval slice never reaches training output
    assert all(i % D.DECON_EVAL_MOD != 0 for i in ids)
    # quality gate applied
    assert all(r["n_tokens"] >= PL.PL_MIN_TOKENS for r in rows)
    # content-addressed split lands near 80/20 and uses both labels
    n_train = sum(1 for r in rows if r["split"] == "train")
    assert {r["split"] for r in rows} <= {"train", "test"}
    assert 0.6 < n_train / len(rows) < 0.95


def test_pl01_is_deterministic_and_append_stable(spark):
    """Content-addressed stages: the same doc keeps its split when the
    pipeline reruns (the property RNG-seeded splits only approximate)."""
    a = {(r["doc_id"], r["split"]) for r in
         PL.pl01_training_pipeline(spark, SF_DIR).collect()}
    b = {(r["doc_id"], r["split"]) for r in
         PL.pl01_training_pipeline(spark, SF_DIR).collect()}
    assert a == b
