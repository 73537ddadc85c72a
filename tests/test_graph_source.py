"""Dispatch/fallback tests for the optional Neo4j source (S1 origin).
No Neo4j exists in the sandbox, so the neo4j branch is verified up to
the dispatch decision + option construction; the fallback branch is
verified end-to-end against the parquet table."""

from customer_review__etl_spark.sources import graph, tables

from conftest import SF_DIR


def _clear(spark):
    for k in ("url", "labels", "auth.user", "auth.password"):
        spark.conf.unset(f"spark.customer_review.neo4j.{k}")


def test_fallback_reads_parquet_when_unconfigured(spark):
    _clear(spark)
    df = graph.load_graph_table(spark, SF_DIR, "documents")
    assert df.count() == tables.load(spark, SF_DIR, "documents").count()
    assert "doc_id" in df.columns


def test_neo4j_conf_none_without_url(spark):
    _clear(spark)
    assert graph.neo4j_conf(spark) is None


def test_neo4j_conf_builds_options(spark):
    spark.conf.set("spark.customer_review.neo4j.url", "neo4j://db:7687")
    spark.conf.set("spark.customer_review.neo4j.auth.user", "u")
    spark.conf.set("spark.customer_review.neo4j.auth.password", "p")
    try:
        opts = graph.neo4j_conf(spark)
        assert opts == {
            "url": "neo4j://db:7687",
            "labels": "Review",
            "authentication.type": "basic",
            "authentication.basic.username": "u",
            "authentication.basic.password": "p",
        }
    finally:
        _clear(spark)


def test_neo4j_branch_targets_connector_format(spark):
    """With a URL set, dispatch must leave the parquet path: building
    the lazy reader succeeds without the connector jar, and resolving
    it fails with the connector's class name (proof it was selected),
    NOT with a parquet result."""
    spark.conf.set("spark.customer_review.neo4j.url", "neo4j://db:7687")
    try:
        import pytest

        with pytest.raises(Exception, match="neo4j|DataSource|Failed to find"):
            graph.load_graph_table(spark, SF_DIR, "documents").count()
    finally:
        _clear(spark)
