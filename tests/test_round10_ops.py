"""Round-10 operator invariants: s10 occupancy-capped ANN (the ml09
migration off s02's convicted-quadratic fixed buckets, round-9 VERDICT
ask #3) and its refined-path oracle coverage."""

from __future__ import annotations

import duckdb

from customer_review__etl_spark.plans import mlplans, simplans

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_s10_equals_s02_below_cap(spark):
    """With every bucket under the shipped cap (sf0.01: ~8/bucket) the
    sentinel sub-key makes s10 bit-identical to s02 — which is exactly
    why ml09's vote semantics survive the migration unchanged at
    oracle-checked scales."""
    s02 = {tuple(r) for r in simplans.s02_ann_lsh(spark, SF01).collect()}
    s10 = {tuple(r) for r in simplans.s10_capped_ann(spark, SF01).collect()}
    assert s10 == s02


def test_s10_refined_path_matches_oracle(spark, monkeypatch):
    """Small cap at sf0.001 forces refinement + multiprobe on the
    DataFrame side AND in the parameterized oracle — the refined path
    gets differential coverage, not just pytest invariants."""
    monkeypatch.setattr(simplans, "S10_BUCKET_CAP", 2)
    sdf = simplans.s10_capped_ann(spark, SF001)
    srows = {(r.q_id, r.n_id, r.cos, r.rn) for r in sdf.collect()}

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM '{SF001}/embeddings.parquet'"
    )
    orows = set(con.execute(simplans._s10_sql(cap=2)).fetchall())
    assert srows, "cap must be small enough to refine yet emit pairs"
    assert srows == orows


def test_s10_stress_cap_keeps_neighbor_recall(spark, monkeypatch):
    """Under a stress cap every bucket refines; multiprobe must keep a
    usable fraction of s02's exact-bucket top-3 edges. Candidates can
    only shrink (refinement splits buckets), so rank-k membership can
    only move toward worse neighbors — recall is the one number that
    matters."""
    s02 = {(r.q_id, r.n_id) for r in simplans.s02_ann_lsh(spark, SF01).collect()}
    monkeypatch.setattr(simplans, "S10_BUCKET_CAP", 3)
    s10 = {(r.q_id, r.n_id)
           for r in simplans.s10_capped_ann(spark, SF01).collect()}
    assert len(s10 & s02) >= 0.5 * len(s02)


def test_ml09_rides_s10_generator(spark):
    """ml09's materialized kNN leg must be the s10 builder (the
    migration is structural, not cosmetic): the scratch kind is
    s10_knn and its pairs equal s10's (q_id, n_id) projection."""
    knn = {(r.q_id, r.n_id)
           for r in mlplans.s10_knn_pairs_m(spark, SF01).collect()}
    s10 = {(r.q_id, r.n_id)
           for r in simplans.s10_capped_ann(spark, SF01).collect()}
    assert knn == s10
