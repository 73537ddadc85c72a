"""Round-7 operator physical assertions: partition pruning (io13)."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_DIR
from customer_review__etl_spark.plans import ioplans
from customer_review__etl_spark.sources import tables


def test_io13_plan_carries_partition_filter(spark):
    """The filter on the Hive partition column must become a
    PartitionFilters entry on io13's scan (directory-level pruning)."""
    df = ioplans.io13_partition_pruned_read(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1][:200]
    assert "event_type" in pf


def test_partition_pruned_scan_never_opens_other_directories(spark, tmp_path):
    """Physical proof on a fresh layout: after CORRUPTING every parquet
    file in the non-matching partition directories, the pruned
    aggregate still returns the correct answer — a scan that opened
    any pruned directory would throw on the garbage bytes. (inputFiles
    can't prove this: it lists the relation's files BEFORE partition
    pruning.)"""
    import pathlib

    out = tmp_path / "hive_events"
    src = (
        tables.load(spark, SF_DIR, "events")
        .select("event_id", "event_type", "value")
        .filter(F.col("event_type").isNotNull())
    )
    expected = src.filter(
        F.col("event_type") == ioplans.IO13_TYPE
    ).count()
    src.write.partitionBy("event_type").mode("overwrite").parquet(str(out))

    corrupted = 0
    for pdir in pathlib.Path(out).glob("event_type=*"):
        if pdir.name == f"event_type={ioplans.IO13_TYPE}":
            continue
        for f in pdir.glob("*.parquet"):
            f.write_bytes(b"not a parquet file")
            corrupted += 1
    assert corrupted > 0, "fixture produced only one partition"

    got = (
        spark.read.schema("event_id BIGINT, value DOUBLE, event_type STRING")
        .parquet(str(out))
        .filter(F.col("event_type") == ioplans.IO13_TYPE)
        .count()
    )
    assert got == expected and expected > 0
