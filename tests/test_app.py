"""End-to-end app assembly test: the full EP2-parity pipeline runs at
sf0.001 and produces readable artifacts with sane metrics."""

from __future__ import annotations

import json

from customer_review__etl_spark.app.pipeline import run_pipeline
from customer_review__etl_spark.sources import sinks

from conftest import SF_DIR


def test_run_pipeline_end_to_end(spark, tmp_path):
    ts = "20240301_120000"
    out = run_pipeline(
        spark,
        SF_DIR,
        str(tmp_path / "out"),
        bucket_url=f"file://{tmp_path}/bucket",
        execution_ts=ts,
    )

    m = out["metrics"]
    assert m["rows_clean"] <= m["rows_raw"]
    assert 0.0 <= m["accuracy"] <= 1.0
    assert 0.0 <= m["weighted_f1"] <= 1.0

    processed = spark.read.parquet(out["processed_path"])
    assert processed.count() == m["rows_clean"]
    assert set(processed.columns) == {
        "doc_id", "lang", "source", "topic", "theme",
    }

    dist = sinks.read_csv(
        spark, out["theme_distribution_path"], "theme STRING, n BIGINT"
    )
    assert dist.count() >= 1

    with open(out["metrics_path"], encoding="utf-8") as f:
        on_disk = json.load(f)
    assert on_disk["accuracy"] == m["accuracy"]

    model = sinks.load_model(out["model_path"])
    assert len(model.stages) == 4

    # S5 publish: reference-DAG key layout, readable back from the store
    loc = out["store_locations"]
    assert loc["processed_data"].endswith(f"data/processed_reviews_{ts}.csv")
    assert loc["metrics"].endswith(f"metrics/model_metrics_{ts}.json")
    assert loc["models"], "model files published"
    assert all(f"models/{ts}/" in u for u in loc["models"])
    published = sinks.read_csv(
        spark,
        loc["processed_data"],
        "doc_id BIGINT, lang STRING, source STRING, topic INT, theme STRING",
    )
    assert published.count() == m["rows_clean"]
